package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Round-14 statistical-testing layer: the exact nonparametric /
  * contingency screens an analyst runs BEFORE trusting a segment
  * comparison — two-sample Kolmogorov–Smirnov distance, chi-square
  * independence, week-over-week total-variation drift, Theil–Sen
  * robust trend, and exact average precision.
  *
  * Determinism posture (every operator here is oracled): all test
  * statistics are exact rationals rendered in scaled-integer fixed
  * point via truncating `div` over BIGINT (or DECIMAL(38,0) where the
  * cross products exceed 2⁶³ — `div` on decimals is integral division
  * in Spark and `//` on HUGEINT truncates in DuckDB, identical on the
  * non-negative operands used here). No transcendentals: the
  * statistics are emitted raw, and significance thresholds are the
  * caller's lookup — the operator's job is the exact statistic.
  */
object Stats {

  /** Fixed point: 1.0 == 2²⁰. The repo-wide scale for unit-interval
    * scores (jaccard_fp, coherence, isotonic fits). */
  private val FpOne = 1048576L

  /** Exact two-sample KOLMOGOROV–SMIRNOV distance between market
    * segments' order-total distributions — the distribution-equality
    * screen (Kolmogorov 1933; Smirnov 1939) behind A/B sanity checks
    * and drift monitors. Three fixed segment pairs are compared; for
    * each, D = max_v |F_A(v) − F_B(v)| over the pooled support, kept
    * exact as |c_A·n_B − c_B·n_A| with the division deferred to one
    * final fixed-point render (ks_fp = ⌊2²⁰·num/(n_A·n_B)⌋), plus the
    * cent value attaining the max (earliest tie-break) — the location
    * a drilldown starts from.
    *
    * Scale shape: one orders scan (customer side broadcast) fans out
    * through a ≤6-row broadcast pair map; per-pair per-value side
    * counts collapse map-side BEFORE the ECDF windows, so the window
    * input is |distinct values| rows per pair, never the fact table.
    * Headroom: d_num = |c_A·n_B − c_B·n_A| ≤ n_A·n_B stays BIGINT to
    * n_A·n_B < 2⁶³ (≈3×10⁹ per side); the ks_fp render multiplies by
    * 2²⁰ so it rides DECIMAL(38,0) ⟷ HUGEINT unconditionally. */
  def profileKsDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ecdf = segPairEcdf(spark, dir)
      .withColumn("dnum", abs($"cuma" * $"nb" - $"cumb" * $"na"))
    ecdf
      .withColumn("rn", row_number().over(
        Window.partitionBy($"pair_id").orderBy($"dnum".desc, $"cents")))
      .filter($"rn" === 1)
      .select($"pair_id", $"na".as("n_a"), $"nb".as("n_b"),
        $"dnum".as("d_num"),
        expr(s"CAST((CAST(dnum AS DECIMAL(38,0)) * $FpOne) " +
          "div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)").as("ks_fp"),
        $"cents".as("at_cents"))
      .orderBy($"pair_id")
  }

  /** The pooled-support ECDF frame every two-sample screen here reads:
    * per fixed segment pair and distinct order-total cent value, the
    * side counts (ca, cb), inclusive cumulative counts (cuma, cumb)
    * along the value order, and side totals (na, nb). Shared by
    * [[profileKsDistance]] (max deviation), [[profileMannwhitneyU]]
    * (rank-sum), and [[profileCvmDistance]] (integrated squared
    * deviation) — the three classic nonparametric comparisons are one
    * decorated frame apart.
    *
    * Scale shape: one orders scan (customer side broadcast) fans out
    * through a ≤6-row broadcast pair map; per-pair per-value side
    * counts collapse map-side BEFORE the ECDF windows, so the window
    * input is |distinct values| rows per pair, never the fact table. */
  private def segPairEcdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairMap = Seq(
      (1L, "BUILDING", "MACHINERY"),
      (2L, "FURNITURE", "HOUSEHOLD"),
      (3L, "AUTOMOBILE", "BUILDING")
    ).toDF("pair_id", "seg_a", "seg_b")
    // (pair, side, segment) rows — a segment may serve both sides of
    // different pairs, so the fan-out is a small broadcast join, not a
    // filter.
    val sides = pairMap.select($"pair_id", lit("a").as("side"), $"seg_a".as("seg"))
      .unionAll(pairMap.select($"pair_id", lit("b").as("side"), $"seg_b".as("seg")))
    val vals = Tables.orders(spark, dir)
      .select($"o_custkey", (Tables.dec2($"o_totalprice") * 100).cast("long").as("cents"))
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .join(broadcast(sides), $"c_mktsegment" === $"seg")
    // Map-side collapse to (pair, value) with per-side counts.
    val byV = vals.groupBy($"pair_id", $"cents")
      .agg(sum(when($"side" === "a", 1L).otherwise(0L)).as("ca"),
        sum(when($"side" === "b", 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy($"pair_id").orderBy($"cents")
    byV
      .withColumn("cuma", sum($"ca").over(w))
      .withColumn("cumb", sum($"cb").over(w))
      .withColumn("na", sum($"ca").over(Window.partitionBy($"pair_id")))
      .withColumn("nb", sum($"cb").over(Window.partitionBy($"pair_id")))
  }

  /** Exact MANN–WHITNEY U / Wilcoxon rank-sum (Wilcoxon 1945; Mann &
    * Whitney 1947) between the same segment pairs the KS screen
    * compares — the LOCATION-shift test next to KS's shape test, and
    * the one with the ROC identity: U_A/(n_A·n_B) IS the probability a
    * random A-value exceeds a random B-value, i.e. the AUC. Kept exact
    * with ties and with no rank pass at all: from the per-value side
    * counts, each value v contributes ca(v)·(2·cumb_excl(v) + cb(v))
    * to the DOUBLED statistic u2_a = 2·U_A (wins count 2, ties 1 — the
    * ½-tie convention with the halving deferred so everything stays
    * integral). u2_b rides along via the complement identity
    * u2_a + u2_b = 2·n_A·n_B (a StatsSpec law), and auc_fp =
    * ⌊2²⁰·u2_a/(2·n_A·n_B)⌋ renders the effect size.
    *
    * Scale shape: rides [[segPairEcdf]] — map-side collapse to the
    * value domain, windows over |distinct values| rows per pair, one
    * final aggregate. No global rank is ever materialized (the
    * count-based form replaces the rank-sum), so nothing here sorts
    * the fact table. Headroom: ca and cumb are cast to DECIMAL(38,0) ⟷
    * HUGEINT BEFORE the per-value multiply (not just the sum), so no
    * intermediate ever sits in 64 bits — the decimal tier is
    * unconditional on both engines even under heavy ties. */
  def profileMannwhitneyU(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    segPairEcdf(spark, dir)
      .withColumn("term",
        $"ca".cast("decimal(38,0)") *
          (($"cumb".cast("decimal(38,0)") - $"cb") * 2L + $"cb"))
      .groupBy($"pair_id")
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        sum($"term").as("u2"))
      .select($"pair_id", $"n_a", $"n_b",
        $"u2".cast("long").as("u2_a"),
        expr("CAST(2 * CAST(n_a AS DECIMAL(38,0)) * n_b - u2 AS BIGINT)")
          .as("u2_b"),
        expr(s"CAST((u2 * $FpOne) div " +
          "(2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("auc_fp"))
      .orderBy($"pair_id")
  }

  /** Exact two-sample CRAMÉR–VON MISES statistic (Cramér 1928; von
    * Mises 1931; two-sample form Anderson 1962) over the same segment
    * pairs — the INTEGRATED squared ECDF deviation that sees
    * distributed small differences KS's single max misses. The
    * statistic T₂ = n_A·n_B/(n_A+n_B)² · Σ_v (F_A−F_B)²·(c_v/(n_A+n_B))
    * is cleared to one integer numerator Σ_v (ca+cb)·(cuma·n_B −
    * cumb·n_A)² and ONE truncating division: cvm_fp =
    * ⌊2²⁰·num/(n_A·n_B·(n_A+n_B)²)⌋. The squared deviations cross 2⁶³
    * at fixture scale already, so the accumulation is DECIMAL(38,0) ⟷
    * HUGEINT throughout (holds to ~10⁷ rows per side; past that the
    * same clearing runs at a coarser value grid).
    *
    * Scale shape: rides [[segPairEcdf]] — the quadratic term is
    * per-value-domain-row arithmetic, one final aggregate per pair. */
  /** Exact two-sample ANDERSON–DARLING statistic (Anderson & Darling
    * 1952; two-sample form Pettitt 1976; the right-continuous tie
    * handling of Scholz & Stephens 1987) over the same segment pairs —
    * the TAIL-WEIGHTED third screen completing the two-sample family:
    * KS sees the max ECDF deviation, CvM the integrated square, AD
    * re-weights each value's squared deviation by 1/(H·(1−H)) so tail
    * differences count. With d_v = cuma·n_B − cumb·n_A (the same
    * cleared deviation CvM squares) and B_v the pooled cumulative:
    * A² = (1/(n_A·n_B)) · Σ_{B_v < n} c_v·d_v² / (B_v·(n−B_v)).
    * Each value's term is ONE truncating 2²⁰-scaled division
    * (replayable on both engines — positive operands, so Spark `div`
    * ≡ DuckDB `//`); the accumulation and the final normalization
    * ride DECIMAL(38,0) ⟷ HUGEINT (the squared deviations cross 2⁶³).
    * Headroom bound (the Mann–Whitney discipline): the per-value
    * numerator 2²⁰·(ca+cb)·d² with |d| ≤ n_A·n_B stays under 10³⁸ to
    * ~n_A·n_B ≈ 10⁸·5 per pair — roughly sf1-scale segments; past
    * that Spark's DECIMAL(38,0) overflows (null / ANSI error) before
    * DuckDB's HUGEINT cap (~1.7×10³⁸), and the same clearing must run
    * on a coarser value grid first (the CvM caveat applies here too).
    *
    * Scale shape: rides [[segPairEcdf]] — per-value-domain-row
    * arithmetic, one final aggregate per pair; no rank pass ever
    * touches the fact rows. */
  def profileAndersonDarling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    segPairEcdf(spark, dir)
      .withColumn("n", $"na" + $"nb")
      .withColumn("bu", $"cuma" + $"cumb")
      .filter($"bu" < $"n")
      .withColumn("d", $"cuma".cast("decimal(38,0)") * $"nb" -
        $"cumb".cast("decimal(38,0)") * $"na")
      .withColumn("t", expr(s"($FpOne * (ca + cb) * d * d) div " +
        "(CAST(bu AS DECIMAL(38,0)) * (n - bu))"))
      .groupBy($"pair_id")
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        count(lit(1)).as("n_support"),
        sum($"t".cast("decimal(38,0)")).as("ts"))
      .select($"pair_id", $"n_a", $"n_b", $"n_support",
        expr("CAST(ts div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("ad_fp"))
      .orderBy($"pair_id")
  }

  def profileCvmDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    segPairEcdf(spark, dir)
      .withColumn("d", ($"cuma" * $"nb" - $"cumb" * $"na").cast("decimal(38,0)"))
      .withColumn("term", ($"ca" + $"cb").cast("decimal(38,0)") * $"d" * $"d")
      .groupBy($"pair_id")
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        count(lit(1)).as("n_support"), sum($"term").as("num"))
      .select($"pair_id", $"n_a", $"n_b", $"n_support",
        expr(s"CAST((num * $FpOne) div (CAST(n_a AS DECIMAL(38,0)) * n_b " +
          "* (n_a + n_b) * (n_a + n_b)) AS BIGINT)").as("cvm_fp"))
      .orderBy($"pair_id")
  }

  /** WALD–WOLFOWITZ RUNS TEST (1940) on each event type's daily-total
    * sequence — the serial-randomness screen behind "is this metric
    * trending or just noisy": classify each day above/below the type's
    * lower-median daily total, count the RUNS (maximal same-sign
    * stretches) along the day order, and emit the exact cleared
    * deviation from the null expectation E[R] = 1 + 2n₁n₂/(n₁+n₂):
    * dev = R·n − n − 2n₁n₂ (n = n₁+n₂; dev < 0 = fewer runs than
    * chance → clustering/trend, dev > 0 = more → oscillation). No
    * division at all — the caller normalizes against the variance
    * lookup.
    *
    * Scale shape: the log collapses map-side to the (type, day) grain
    * (calendar-bounded); the median election, sign, and lag all run on
    * that bounded frame partitioned by type. */
  def profileRunsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_type", expr("t div 86400000000").as("day"), $"v")
      .groupBy($"event_type", $"day")
      .agg((sum($"v") * 10000).cast("long").as("dv"))
    val wN = Window.partitionBy($"event_type")
    val wV = Window.partitionBy($"event_type").orderBy($"dv", $"day")
    val wD = Window.partitionBy($"event_type").orderBy($"day")
    val med = daily
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(wV))
      .withColumn("med_v",
        min(when($"rn" === expr("(n + 1) div 2"), $"dv")).over(wN))
    med
      .withColumn("s", when($"dv" > $"med_v", 1L).otherwise(0L))
      .withColumn("prev", lag($"s", 1).over(wD))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"s").as("n1"),
        sum(lit(1L) - $"s").as("n2"),
        max($"med_v").as("med_v"),
        (sum(when($"prev".isNull || $"prev" =!= $"s", 1L).otherwise(0L)))
          .as("runs_obs"))
      .select($"event_type", $"n_days", $"n1", $"n2", $"med_v", $"runs_obs",
        ($"runs_obs" * $"n_days" - $"n_days" - $"n1" * $"n2" * 2L)
          .as("dev"))
      .orderBy($"event_type")
  }

  /** Distributed MULTIPLIER BOOTSTRAP confidence bounds (Efron 1979;
    * the weight-multiplier/Poisson-bootstrap variant is the form that
    * runs at data scale — Kleiner et al.'s BLB and production A/B
    * systems resample by per-row WEIGHTS, never by shuffling rows):
    * per event type, B = 64 replicates give each row a deterministic
    * hash-drawn weight w ∈ {0, 1, 2} with ~(¼, ½, ¼) mass (mean 1 —
    * the multiplier-CLT condition), each replicate's mean is one
    * truncating division of its weighted sums, and the p5/p95
    * percentile bounds are exact disc elections (ceil rank, b
    * tie-break) over the 64 replicate means. The point mean and n ride
    * along, so the row reads as estimate ± replayable uncertainty.
    *
    * Scale shape: the 64× fan-out happens MAP-SIDE and collapses to
    * |types|·B partial sums in the same pass (the combiner absorbs
    * it); the shuffle carries |types|·64 rows, the election windows
    * run on 64-row frames. No row is ever resampled across the
    * cluster — that is the entire point of the multiplier form. */
  def evalBootstrapMultiplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reps = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id",
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("b", explode(expr("sequence(0, 63)")))
      // replayable multiplier: h uniform on [0, 1048573); cut at ¼/¾.
      // The inner mod keeps every product under 2⁶³ to id ≈ 7×10¹⁶
      .withColumn("h",
        expr("(((event_id + 1) * (b * 2 + 1)) % 1048573 " +
          "* 2654435761) % 1048573"))
      .withColumn("w", when($"h" < 262143L, 0L)
        .when($"h" < 786430L, 1L).otherwise(2L))
    val byRep = reps.groupBy($"event_type", $"b")
      .agg(sum($"w").as("wsum"), sum($"w" * $"v_fp").as("vsum"),
        sum(lit(1L)).as("n"), sum($"v_fp").as("vtot"))
      .filter($"wsum" > 0)
      .withColumn("m_b", expr("vsum div wsum"))
    val wRank = Window.partitionBy($"event_type").orderBy($"m_b", $"b")
    byRep
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_reps",
        count(lit(1)).over(Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg(max($"n").as("n"), max(expr("vtot div n")).as("mean_fp"),
        max($"n_reps").as("n_replicates"),
        // ceil-rank disc elections over the replicate means
        min(when($"rn" === expr("(n_reps * 5 + 99) div 100"), $"m_b"))
          .as("boot_lo_fp"),
        min(when($"rn" === expr("(n_reps * 95 + 99) div 100"), $"m_b"))
          .as("boot_hi_fp"))
      .orderBy($"event_type")
  }

  /** CHI-SQUARE independence screen over the (order priority ×
    * customer market segment) contingency grid — Pearson's classic
    * (1900), the first question about any pair of categoricals. Kept
    * exact by clearing denominators: (O−E)²/E with E = R·C/N equals
    * (N·O − R·C)²/(N·R·C), so each cell's contribution is one
    * truncating division of exact integers; squares ride DECIMAL(38,0)
    * (⟷ DuckDB HUGEINT) because (N·O−R·C)² overflows 2⁶³ already at
    * sf0.1 row counts. Emits the full observed grid with marginals and
    * per-cell fixed-point contributions — the drilldown a significance
    * verdict needs, not just the scalar.
    *
    * Scale shape: one map-side (priority, segment) count over the scan
    * (customer broadcast); marginals and N are windows over the
    * ≤25-row cell frame. */
  /** The decorated contingency cells shared by [[profileChi2Independence]]
    * and [[profileCramersV]]: observed counts with marginals, N, and
    * the per-cell ⌊2²⁰·(N·O−R·C)²/(N·R·C)⌋ contribution. */
  private def chi2Cells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderpriority")
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority", $"c_mktsegment")
      .agg(count(lit(1)).as("observed"))
      .withColumn("row_total", sum($"observed").over(
        Window.partitionBy($"o_orderpriority")))
      .withColumn("col_total", sum($"observed").over(
        Window.partitionBy($"c_mktsegment")))
      .withColumn("n", sum($"observed").over(Window.partitionBy()))
      .withColumn("dev", ($"n" * $"observed" - $"row_total" * $"col_total")
        .cast("decimal(38,0)"))
      // ⌊2²⁰·(N·O−R·C)²/(N·R·C)⌋ — integral division on decimals
      .withColumn("chi2_cell_fp",
        expr("CAST((dev * dev * 1048576) div " +
          "(CAST(n AS DECIMAL(38,0)) * row_total * col_total) AS BIGINT)"))
  }

  def profileChi2Independence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chi2Cells(spark, dir)
      .select($"o_orderpriority", $"c_mktsegment", $"observed",
        $"row_total", $"col_total", $"chi2_cell_fp")
      .orderBy($"o_orderpriority", $"c_mktsegment")
  }

  /** CRAMÉR'S V effect size — the [0, 1] normalization that makes
    * chi-square statistics comparable across grids of different
    * shapes: V = √(χ²/(N·min(r−1, c−1))), reduced to one exact-integer
    * radicand (χ²_fp·2²⁰ div (N·k)) and one ⌊√·⌋ — floor of a
    * correctly-rounded square root of an exactly-representable BIGINT
    * is engine-identical (the Neyman-sqrt argument). Rides the same
    * [[chi2Cells]] frame as the chi-square screen.
    *
    * Scale shape: identical to profile_chi2_independence plus one
    * ≤25-row final aggregate. */
  def profileCramersV(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chi2Cells(spark, dir)
      .agg(max($"n").as("n"),
        countDistinct($"o_orderpriority").as("r_levels"),
        countDistinct($"c_mktsegment").as("c_levels"),
        sum($"chi2_cell_fp").as("chi2_fp"))
      .select($"n", $"r_levels", $"c_levels", $"chi2_fp",
        expr("CAST(floor(sqrt(CAST((chi2_fp * 1048576) div " +
          "(n * least(r_levels - 1, c_levels - 1)) AS DOUBLE))) AS BIGINT)")
          .as("cramers_v_fp"))
      .orderBy($"n")
  }

  /** Week-over-week TOTAL-VARIATION drift of the event-type mix — the
    * distribution-shift monitor (½Σ|p−q|) a training-data pipeline
    * alarms on, in exact arithmetic where the PSI/KL variants need the
    * banned logarithm. Per week w (epoch-day÷7), TV against week w−1
    * is Σ_type |c_t·T_prev − c'_t·T_w| ⁄ (2·T_w·T_prev), rendered ppm
    * by one truncating division; absent types count zero via a dense
    * (week × type) grid.
    *
    * Scale shape: the log collapses map-side to |weeks|·|types| cells;
    * the dense grid is a broadcast cross of two tiny dimension frames
    * (types bounded by the domain, weeks by the calendar), and the
    * lag/fold are windows over that grid — the raw table never
    * shuffles. */
  def profileTvDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .select(Tables.nsToUs($"ts").as("t"), $"event_type")
      .select(expr("(t div 86400000000) div 7").as("week"), $"event_type")
      .groupBy($"week", $"event_type").agg(count(lit(1)).as("c"))
    val weeks = cells.select($"week").distinct()
    val types = cells.select($"event_type").distinct()
    val dense = weeks.crossJoin(broadcast(types))
      .join(cells, Seq("week", "event_type"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
    val wT = Window.partitionBy($"event_type").orderBy($"week")
    val diffs = dense
      .withColumn("t_w", sum($"c").over(Window.partitionBy($"week")))
      .withColumn("c_prev", lag($"c", 1).over(wT))
      .withColumn("t_prev", lag($"t_w", 1).over(wT))
      .withColumn("w_prev", lag($"week", 1).over(wT))
      // only adjacent calendar weeks drift-compare; a gap restarts
      .filter($"w_prev" === $"week" - 1)
    diffs.groupBy($"week")
      .agg(max($"t_w").as("n_curr"), max($"t_prev").as("n_prev"),
        sum(abs($"c" * $"t_prev" - $"c_prev" * $"t_w")).as("tv_num"))
      .select($"week", $"n_curr", $"n_prev",
        expr("(tv_num * 1000000) div (2 * n_curr * n_prev)").as("tv_ppm"))
      .orderBy($"week")
  }

  /** SPEARMAN RANK CORRELATION between customer balance and order
    * count — the monotone-association screen that survives the
    * outliers Pearson (agg_corr_covar's shape) is dragged by, kept
    * exact: both global ranks come from [[DistributedRank.rankCum]]
    * (the 3-level prefix-sum decomposition — no single-partition sort
    * at any scale), ties broken by custkey (the deterministic
    * row_number variant of Spearman; documented, since average-rank
    * ties would need a division per tie run), and
    * ρ = 1 − 6Σd²/(n(n²−1)) renders as ONE truncating division of the
    * cleared form, computed in DECIMAL(38,0) ⟷ HUGEINT (2²⁰·n³
    * crosses 2⁶³ already at n ≈ 2×10⁴, so BIGINT is never trusted
    * here) and SHIFTED non-negative before dividing: ρ ≥ −1 means
    * 2D − 6Σd² ≥ 0 for D = n(n²−1), so
    * rho_fp = ⌊2²⁰·(2D − 6Σd²)/D⌋ − 2²⁰ — truncating division of
    * non-negative operands is engine-identical, with no dependence on
    * negative-division semantics. DECIMAL(38,0) holds to n ≈ 3×10¹⁰.
    *
    * Scale shape: two DistributedRank passes over the |customers|
    * frame + one global aggregate — every ordered window inside ranks
    * a ≤Fan bucket frame. */
  def evalSpearmanRho(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.customer(spark, dir)
      .select($"c_custkey", (Tables.dec2($"c_acctbal") * 100).cast("long").as("a"))
      .join(Tables.orders(spark, dir).groupBy($"o_custkey")
        .agg(count(lit(1)).as("b")), $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"a", coalesce($"b", lit(0L)).as("b"))
      .withColumn("one", lit(1L))
    val ra = DistributedRank.rankCum(stats, "a", "c_custkey", "one")
      .withColumnRenamed("rnk", "ra").drop("cum", "w_total")
    val rb = DistributedRank.rankCum(ra, "b", "c_custkey", "one")
      .withColumnRenamed("rnk", "rb").drop("cum", "w_total")
    rb.agg(count(lit(1)).as("n"),
        sum(($"ra" - $"rb") * ($"ra" - $"rb")).as("sum_d2"))
      .select($"n", $"sum_d2",
        // D = n(n²−1) in DECIMAL(38,0); dividend shifted by +2²⁰·D so it
        // is provably non-negative, then un-shifted after the division
        expr("CAST((1048576 * (2 * (CAST(n AS DECIMAL(38,0)) " +
          "* (CAST(n AS DECIMAL(38,0)) * n - 1)) " +
          "- 6 * CAST(sum_d2 AS DECIMAL(38,0)))) " +
          "div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1)) " +
          "- 1048576 AS BIGINT)").as("rho_fp"))
      .orderBy($"n")
  }

  val queries: Map[String, QueryFn] = Map(
    "profile_ks_distance" -> (profileKsDistance(_, _)),
    "profile_mannwhitney_u" -> (profileMannwhitneyU(_, _)),
    "profile_cvm_distance" -> (profileCvmDistance(_, _)),
    "profile_anderson_darling" -> (profileAndersonDarling(_, _)),
    "eval_bootstrap_multiplier" -> (evalBootstrapMultiplier(_, _)),
    "profile_runs_test" -> (profileRunsTest(_, _)),
    "profile_chi2_independence" -> (profileChi2Independence(_, _)),
    "profile_cramers_v" -> (profileCramersV(_, _)),
    "eval_spearman_rho" -> (evalSpearmanRho(_, _)),
    "profile_tv_drift" -> (profileTvDrift(_, _))
  )

  /** The DuckDB replay of [[segPairEcdf]] — the CTE prefix the
    * two-sample oracles share (ends with the decorated `e` frame). */
  private val ecdfCte: String =
    """WITH pm AS (SELECT * FROM (VALUES
      |    (1, 'BUILDING', 'MACHINERY'),
      |    (2, 'FURNITURE', 'HOUSEHOLD'),
      |    (3, 'AUTOMOBILE', 'BUILDING')) AS t(pair_id, seg_a, seg_b)),
      |sides AS (SELECT pair_id, 'a' AS side, seg_a AS seg FROM pm
      |  UNION ALL SELECT pair_id, 'b' AS side, seg_b AS seg FROM pm),
      |v AS (SELECT s.pair_id, s.side,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN sides s ON c.c_mktsegment = s.seg),
      |byv AS (SELECT pair_id, cents,
      |    sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
      |  FROM v GROUP BY 1, 2),
      |e AS (SELECT pair_id, cents, ca, cb,
      |    sum(ca) OVER (PARTITION BY pair_id ORDER BY cents) AS cuma,
      |    sum(cb) OVER (PARTITION BY pair_id ORDER BY cents) AS cumb,
      |    sum(ca) OVER (PARTITION BY pair_id) AS na,
      |    sum(cb) OVER (PARTITION BY pair_id) AS nb
      |  FROM byv)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same lower-median election, sign sequence, and lag-based run
    // count — the cleared deviation is pure integer arithmetic
    "profile_runs_test" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4)) * 10000) AS BIGINT)
        |      AS dv
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, day, dv,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dv, day) AS rn
        |  FROM daily),
        |md AS (SELECT event_type, day, dv, n,
        |    min(CASE WHEN rn = (n + 1) // 2 THEN dv END)
        |      OVER (PARTITION BY event_type) AS med_v
        |  FROM m),
        |s AS (SELECT event_type, day, med_v,
        |    CASE WHEN dv > med_v THEN 1 ELSE 0 END AS sg
        |  FROM md),
        |r AS (SELECT event_type, med_v, sg,
        |    lag(sg) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM s)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(sg) AS BIGINT) AS n1,
        |  CAST(sum(1 - sg) AS BIGINT) AS n2,
        |  max(med_v) AS med_v,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> sg THEN 1 ELSE 0
        |    END) AS BIGINT) AS runs_obs,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> sg THEN 1 ELSE 0
        |      END) * count(*) - count(*)
        |    - 2 * sum(sg) * sum(1 - sg) AS BIGINT) AS dev
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the same hash multipliers, weighted sums, truncating replicate
    // means, and ceil-rank elections — engine-identical end to end
    "eval_bootstrap_multiplier" ->
      """WITH base AS (SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |reps AS (SELECT event_type, v_fp, t.b,
        |    (((event_id + 1) * (t.b * 2 + 1)) % 1048573
        |      * 2654435761) % 1048573 AS h
        |  FROM base CROSS JOIN (SELECT unnest(range(0, 64)) AS b) t),
        |w AS (SELECT event_type, b, v_fp,
        |    CASE WHEN h < 262143 THEN 0
        |         WHEN h < 786430 THEN 1 ELSE 2 END AS w
        |  FROM reps),
        |byrep AS (SELECT event_type, b,
        |    CAST(sum(w) AS BIGINT) AS wsum,
        |    CAST(sum(w * v_fp) AS BIGINT) AS vsum,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v_fp) AS BIGINT) AS vtot
        |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
        |m AS (SELECT event_type, b, n, vtot, vsum // wsum AS m_b,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY vsum // wsum, b) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_reps
        |  FROM byrep)
        |SELECT event_type, max(n) AS n,
        |  CAST(max(vtot // n) AS BIGINT) AS mean_fp,
        |  CAST(max(n_reps) AS BIGINT) AS n_replicates,
        |  min(CASE WHEN rn = (n_reps * 5 + 99) // 100 THEN m_b END)
        |    AS boot_lo_fp,
        |  min(CASE WHEN rn = (n_reps * 95 + 99) // 100 THEN m_b END)
        |    AS boot_hi_fp
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same doubled-U term per pooled value; complement identity and the
    // single AUC render truncate identically in HUGEINT
    "profile_mannwhitney_u" -> (ecdfCte +
      """,
        |u AS (SELECT pair_id, max(na) AS n_a, max(nb) AS n_b,
        |    sum(CAST(ca AS HUGEINT)
        |      * ((CAST(cumb AS HUGEINT) - cb) * 2 + cb)) AS u2
        |  FROM e GROUP BY pair_id)
        |SELECT CAST(pair_id AS BIGINT) AS pair_id,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(u2 AS BIGINT) AS u2_a,
        |  CAST(2 * CAST(n_a AS HUGEINT) * n_b - u2 AS BIGINT) AS u2_b,
        |  CAST((u2 * 1048576) // (2 * CAST(n_a AS HUGEINT) * n_b)
        |    AS BIGINT) AS auc_fp
        |FROM u ORDER BY pair_id""".stripMargin),
    // same per-value cleared deviation, squared and re-weighted by the
    // pooled-ECDF denominator — one truncating fixed-point division per
    // value, HUGEINT accumulation, one normalizing division
    "profile_anderson_darling" -> (ecdfCte +
      """,
        |a2 AS (SELECT pair_id, max(na) AS n_a, max(nb) AS n_b,
        |    CAST(count(*) AS BIGINT) AS n_support,
        |    sum((1048576 * CAST(ca + cb AS HUGEINT)
        |      * CAST(cuma * nb - cumb * na AS HUGEINT)
        |      * CAST(cuma * nb - cumb * na AS HUGEINT))
        |      // (CAST(cuma + cumb AS HUGEINT)
        |        * (na + nb - cuma - cumb))) AS ts
        |  FROM e WHERE cuma + cumb < na + nb GROUP BY pair_id)
        |SELECT CAST(pair_id AS BIGINT) AS pair_id,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  n_support,
        |  CAST(ts // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ad_fp
        |FROM a2 ORDER BY pair_id""".stripMargin),
    // same cleared quadratic numerator accumulated in HUGEINT; one
    // truncating division renders the statistic
    "profile_cvm_distance" -> (ecdfCte +
      """,
        |q AS (SELECT pair_id, max(na) AS n_a, max(nb) AS n_b,
        |    CAST(count(*) AS BIGINT) AS n_support,
        |    sum(CAST(ca + cb AS HUGEINT)
        |      * CAST(cuma * nb - cumb * na AS HUGEINT)
        |      * CAST(cuma * nb - cumb * na AS HUGEINT)) AS num
        |  FROM e GROUP BY pair_id)
        |SELECT CAST(pair_id AS BIGINT) AS pair_id,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  n_support,
        |  CAST((num * 1048576) // (CAST(n_a AS HUGEINT) * n_b
        |    * (n_a + n_b) * (n_a + n_b)) AS BIGINT) AS cvm_fp
        |FROM q ORDER BY pair_id""".stripMargin),
    // the division is deferred: the argmax runs on the exact integer
    // |cumA·nB − cumB·nA| and the single ks_fp render truncates the
    // same way on both engines
    "profile_ks_distance" ->
      """WITH pm AS (SELECT * FROM (VALUES
        |    (1, 'BUILDING', 'MACHINERY'),
        |    (2, 'FURNITURE', 'HOUSEHOLD'),
        |    (3, 'AUTOMOBILE', 'BUILDING')) AS t(pair_id, seg_a, seg_b)),
        |sides AS (SELECT pair_id, 'a' AS side, seg_a AS seg FROM pm
        |  UNION ALL SELECT pair_id, 'b' AS side, seg_b AS seg FROM pm),
        |v AS (SELECT s.pair_id, s.side,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN sides s ON c.c_mktsegment = s.seg),
        |byv AS (SELECT pair_id, cents,
        |    sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM v GROUP BY 1, 2),
        |e AS (SELECT pair_id, cents,
        |    sum(ca) OVER (PARTITION BY pair_id ORDER BY cents) AS cuma,
        |    sum(cb) OVER (PARTITION BY pair_id ORDER BY cents) AS cumb,
        |    sum(ca) OVER (PARTITION BY pair_id) AS na,
        |    sum(cb) OVER (PARTITION BY pair_id) AS nb
        |  FROM byv),
        |d AS (SELECT pair_id, cents, na, nb,
        |    abs(cuma * nb - cumb * na) AS dnum,
        |    row_number() OVER (PARTITION BY pair_id
        |      ORDER BY abs(cuma * nb - cumb * na) DESC, cents) AS rn
        |  FROM e)
        |SELECT CAST(pair_id AS BIGINT) AS pair_id,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(dnum AS BIGINT) AS d_num,
        |  CAST((CAST(dnum AS HUGEINT) * 1048576)
        |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_fp,
        |  cents AS at_cents
        |FROM d WHERE rn = 1 ORDER BY pair_id""".stripMargin,
    // denominators cleared: (O−E)²/E == (N·O−R·C)²/(N·R·C); squares in
    // HUGEINT ⟷ DECIMAL(38,0), one truncating division per cell
    "profile_chi2_independence" ->
      """WITH cells AS (SELECT o.o_orderpriority, c.c_mktsegment,
        |    count(*) AS observed
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT o_orderpriority, c_mktsegment, observed,
        |    sum(observed) OVER (PARTITION BY o_orderpriority) AS row_total,
        |    sum(observed) OVER (PARTITION BY c_mktsegment) AS col_total,
        |    sum(observed) OVER () AS n
        |  FROM cells)
        |SELECT o_orderpriority, c_mktsegment,
        |  CAST(observed AS BIGINT) AS observed,
        |  CAST(row_total AS BIGINT) AS row_total,
        |  CAST(col_total AS BIGINT) AS col_total,
        |  CAST((CAST(n * observed - row_total * col_total AS HUGEINT)
        |      * CAST(n * observed - row_total * col_total AS HUGEINT)
        |      * 1048576)
        |    // (CAST(n AS HUGEINT) * row_total * col_total) AS BIGINT)
        |    AS chi2_cell_fp
        |FROM m ORDER BY o_orderpriority, c_mktsegment""".stripMargin,
    // the oracle ranks with plain global row_number (it may sort);
    // same custkey tie-break and cleared-denominator render
    "eval_spearman_rho" ->
      """WITH st AS (SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS a,
        |    coalesce(o.b, 0) AS b
        |  FROM customer LEFT JOIN (SELECT o_custkey,
        |      CAST(count(*) AS BIGINT) AS b FROM orders GROUP BY 1) o
        |    ON c_custkey = o.o_custkey),
        |r AS (SELECT c_custkey,
        |    CAST(row_number() OVER (ORDER BY a, c_custkey) AS BIGINT) AS ra,
        |    CAST(row_number() OVER (ORDER BY b, c_custkey) AS BIGINT) AS rb
        |  FROM st),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2 FROM r)
        |SELECT n, sum_d2,
        |  CAST((1048576 * (2 * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1))
        |      - 6 * CAST(sum_d2 AS HUGEINT)))
        |    // (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1))
        |    - 1048576 AS BIGINT) AS rho_fp
        |FROM s ORDER BY n""".stripMargin,
    // same cleared-denominator cells; the effect size is one exact
    // radicand + floor(sqrt) on both engines
    "profile_cramers_v" ->
      """WITH cells AS (SELECT o.o_orderpriority, c.c_mktsegment,
        |    count(*) AS observed
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT o_orderpriority, c_mktsegment, observed,
        |    sum(observed) OVER (PARTITION BY o_orderpriority) AS row_total,
        |    sum(observed) OVER (PARTITION BY c_mktsegment) AS col_total,
        |    sum(observed) OVER () AS n
        |  FROM cells),
        |cc AS (SELECT o_orderpriority, c_mktsegment, n,
        |    CAST((CAST(n * observed - row_total * col_total AS HUGEINT)
        |        * CAST(n * observed - row_total * col_total AS HUGEINT)
        |        * 1048576)
        |      // (CAST(n AS HUGEINT) * row_total * col_total) AS BIGINT)
        |      AS cell
        |  FROM m)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS r_levels,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS c_levels,
        |  CAST(sum(cell) AS BIGINT) AS chi2_fp,
        |  CAST(floor(sqrt(CAST((sum(cell) * 1048576)
        |    // (max(n) * least(count(DISTINCT o_orderpriority) - 1,
        |         count(DISTINCT c_mktsegment) - 1)) AS DOUBLE)))
        |    AS BIGINT) AS cramers_v_fp
        |FROM cc ORDER BY n""".stripMargin,
    // dense (week × type) grid so absent types count zero on both
    // engines; only adjacent calendar weeks compare
    "profile_tv_drift" ->
      """WITH c0 AS (SELECT (epoch_us(ts) // 86400000000) // 7 AS week,
        |    event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |dense AS (SELECT w.week, t.event_type, coalesce(c0.c, 0) AS c
        |  FROM (SELECT DISTINCT week FROM c0) w
        |  CROSS JOIN (SELECT DISTINCT event_type FROM c0) t
        |  LEFT JOIN c0 ON c0.week = w.week AND c0.event_type = t.event_type),
        |d1 AS (SELECT week, event_type, c,
        |    sum(c) OVER (PARTITION BY week) AS t_w
        |  FROM dense),
        |d AS (SELECT week, event_type, c, t_w,
        |    lag(c) OVER (PARTITION BY event_type ORDER BY week) AS c_prev,
        |    lag(t_w) OVER (PARTITION BY event_type ORDER BY week) AS t_prev,
        |    lag(week) OVER (PARTITION BY event_type ORDER BY week) AS w_prev
        |  FROM d1)
        |SELECT CAST(week AS BIGINT) AS week,
        |  CAST(max(t_w) AS BIGINT) AS n_curr,
        |  CAST(max(t_prev) AS BIGINT) AS n_prev,
        |  CAST(sum(abs(c * t_prev - c_prev * t_w)) * 1000000
        |    // (2 * max(t_w) * max(t_prev)) AS BIGINT) AS tv_ppm
        |FROM d WHERE w_prev = week - 1
        |GROUP BY week ORDER BY week""".stripMargin
  )
}
