package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Aggregation operators (SURVEY.md §2.4).
  *
  * The Hadoop-MR reference class expresses these as map → combine →
  * reduce; in Spark every `groupBy().agg()` compiles to partial+final
  * `HashAggregateExec` — the combiner is automatic, and AQE coalesces
  * post-shuffle partitions. Scale notes per operator in scaladoc.
  */
object Aggregations {

  /** TPC-H Q1 shape: scan + filter + group-agg on lineitem.
    * Map-side partial aggregation means shuffle volume is O(groups), not
    * O(rows) — at 100 TB this is the canonical "combiner" win.
    * Money math in DECIMAL(18,2) (exact ⇒ order-independent ⇒
    * hash-stable vs DuckDB); presented as DOUBLE. */
  def aggGroupbySum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    l.filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(Tables.dec2($"l_quantity")).cast("double").as("sum_qty"),
        sum(Tables.dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(Tables.dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Exact distinct count per group. Spark plans this as Expand +
    * two-phase aggregate — the same two-job pattern MR uses, fused into
    * one DAG. Shuffle key = (group, user) so hot groups don't bottleneck
    * a single reducer. */
  def aggCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  /** HLL approximate distinct — the 100 TB-scale answer to distinct
    * counting: fixed-size sketch, single shuffle of sketches, mergeable.
    * Bench-only (✖ oracle): HLL implementations differ across engines. */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
      .orderBy($"event_type")
  }

  /** Approximate percentiles — the sketch path SCALE.md promises for
    * hot percentile groups: agg_percentile's exact sort-based
    * percentile needs every group value co-resident; the GK
    * (Greenwald–Khanna) summary behind percentile_approx keeps
    * O(accuracy) state per group, merges associatively, and bounds
    * rank error by 1/accuracy — so a group with a billion values costs
    * the same shuffle bytes as one with a thousand. Returned quantiles
    * are actual data values (no interpolation). Bench-only (✖ oracle):
    * the summary is engine-specific, like agg_approx_distinct; the
    * |approx − exact| rank bound is pinned in OperatorsSpec. */
  def aggApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", Tables.dec4($"value").cast("double").as("v"))
      .groupBy($"event_type")
      .agg(
        percentile_approx($"v", lit(0.5), lit(1000)).as("p50"),
        percentile_approx($"v", lit(0.9), lit(1000)).as("p90"),
        percentile_approx($"v", lit(0.99), lit(1000)).as("p99"))
      .orderBy($"event_type")
  }

  /** Rollup subtotals over the region→nation hierarchy (the chained-MR
    * subtotal-jobs pattern, one Expand-based aggregate here). */
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum(Tables.dec2($"c_acctbal")).cast("double").as("acctbal"))
      // Rollup's NULL group labels are presented as '(all)': string NULLs
      // survive exact comparison but get mangled by pandas-style
      // comparators (None vs NaN), and '(' sorts before letters in both
      // engines so the ordering needs no NULLS FIRST alignment either.
      .select(coalesce($"r_name", lit("(all)")).as("r_name"),
        coalesce($"n_name", lit("(all)")).as("n_name"), $"n_cust", $"acctbal")
      .orderBy($"r_name", $"n_name")
  }

  /** Cube over (mktsegment, orderpriority) — all margin combinations.
    * Same Expand machinery as rollup, same '(all)' sentinel treatment
    * for the margin NULLs (see aggRollup), so oracled the same way. */
  def aggCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sentinelMargins(
      Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .cube($"c_mktsegment", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders")))
  }

  /** GROUPING_ID surface over the same cube — the SQL-standard bitmask
    * (leftmost grouping column = most-significant bit, identical
    * convention in Spark and DuckDB, probed before this key existed)
    * that lets a report consumer tell a REAL NULL group from a margin
    * row without sentinel conventions. Emitted next to the '(all)'
    * sentinels so the frame carries both disambiguation schemes.
    *
    * Scale shape: identical to agg_cube — one Expand-based aggregate,
    * margins are |dims| extra group streams, all map-side combinable. */
  def sqlGroupingId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .cube($"c_mktsegment", $"o_orderpriority")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"))
      .select($"gid".cast("long").as("gid"),
        coalesce($"c_mktsegment", lit("(all)")).as("c_mktsegment"),
        coalesce($"o_orderpriority", lit("(all)")).as("o_orderpriority"),
        $"n_orders")
      .orderBy($"gid", $"c_mktsegment", $"o_orderpriority")
  }

  /** Shared margin presentation for the Expand-based aggregates: '(all)'
    * sentinels for the NULL group labels + the total order (rationale in
    * aggRollup). */
  private def sentinelMargins(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(coalesce($"c_mktsegment", lit("(all)")).as("c_mktsegment"),
        coalesce($"o_orderpriority", lit("(all)")).as("o_orderpriority"), $"n_orders")
      .orderBy($"c_mktsegment", $"o_orderpriority")
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * per-(segment, priority) counts, per-segment margins, and the grand
    * total, but NOT per-priority margins (the set a dashboard actually
    * wants — cube would compute and then discard them). One Expand-based
    * aggregate, same sentinel treatment as rollup. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sentinelMargins(
      Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .groupingSets(
          Seq(Seq($"c_mktsegment", $"o_orderpriority"), Seq($"c_mktsegment"), Seq()),
          $"c_mktsegment", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders")))
  }

  /** Word count — THE canonical MR program. explode(split) is a
    * Generate node feeding a partial aggregate: the shuffle carries
    * (word, partial count), not tokens. */
  def aggWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .orderBy($"w")
  }

  /** Numeric histogram of events.value in buckets of 50. floor() on
    * IEEE doubles is engine-independent; bucket presented as BIGINT. */
  def aggHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(floor($"value" / 50).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec4($"value")).cast("double").as("sum_value"))
      .orderBy($"bucket")
  }

  /** Pivot: event counts per user, one column per event type. The
    * value list is explicit — with it Spark skips the extra distinct
    * pass AND the output schema is deterministic (required for the
    * oracle, whose SQL spells the same CASE columns). */
  def aggPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy($"user_id")
  }

  /** Correlated scalar subquery through the SQL interface: parts priced
    * above their brand's average. Exercises Catalyst's subquery
    * decorrelation (RewriteCorrelatedScalarSubquery → aggregate+join).
    * The average is computed as exact-decimal sum / count (a plain AVG
    * over doubles would be partial-sum-order nondeterministic). */
  def sqlCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("part_v")
    spark.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part_v p
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Statistical moments per group (n, sum, mean, sample variance/std)
    * computed scale-safely: the raw Σx and Σx² accumulate in EXACT
    * decimal (order-independent partial aggregation — a plain
    * var_samp() over doubles is partial-sum-order nondeterministic),
    * then the closed-form moments are derived in IEEE double with the
    * identical expression shape on both engines. The two-pass-free
    * var formula (nΣx² − (Σx)²)/(n(n−1)) is exactly what a map-side
    * combinable variance needs at scale. */
  def aggStatsMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nd = $"n".cast("double")
    val sd = $"s".cast("double")
    val qd = $"q".cast("double")
    // greatest(0, ·): nΣx² − (Σx)² is ≥0 mathematically but can round to
    // a tiny negative for constant-valued groups once the exact decimals
    // widen to double — sqrt of that negative is NaN here and an ERROR in
    // DuckDB. n=1 groups (0/0) are mapped to the -1 sentinel on BOTH
    // sides (same posture as the nullable-BIGINT coalesce(-1) rule).
    val variance = greatest(lit(0.0), (nd * qd - sd * sd) / (nd * (nd - lit(1.0))))
    def guarded(c: Column): Column = when($"n" > 1, c).otherwise(lit(-1.0))
    // round(6) on the derived moments: Σx² as a scaled integer exceeds
    // 2^53 at bench scale, where decimal→double conversion may round
    // differently across engines by 1 ulp (correctly-rounded BigDecimal
    // vs int128→double-then-divide); the relative error that survives
    // the closed form is ≤1e-10, which round(6) absorbs. Σx itself
    // stays under 2^53 (4-decimal values), so sum_v/mean_v are exact.
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec4($"value")).as("s"),
        sum(Tables.dec4($"value") * Tables.dec4($"value")).as("q"))
      .select($"event_type", $"n", sd.as("sum_v"), round(sd / nd, 6).as("mean_v"),
        guarded(round(variance, 6)).as("var_samp"),
        guarded(round(sqrt(variance), 6)).as("std_samp"))
      .orderBy($"event_type")
  }

  /** Bivariate exact moments: sample covariance and Pearson correlation
    * between event value and its JSON payload k, per event type — the
    * two-variable extension of [[aggStatsMoments]], and the
    * deterministic replacement for covar_samp()/corr() builtins (whose
    * streaming accumulators are FP-merge-order-dependent and so differ
    * across partitionings AND engines). All five power sums accumulate
    * in exact DECIMAL (order-independent, map-side combinable); the
    * closed forms run in IEEE double with round(6) absorbing the
    * decimal→double widening ulp, and sqrt is IEEE-exact (the one
    * non-arithmetic function both engines round correctly). Degenerate
    * groups (n ≤ 1, or zero variance on either axis) map to the -1.0
    * sentinel on both sides rather than NaN/Inf. */
  def aggCorrCovar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.dec4($"value")
    val y = get_json_object($"props", "$.k").cast("long").cast("decimal(18,0)")
    val nd = $"n".cast("double")
    def d(c: Column): Column = c.cast("double")
    val covNum = nd * d($"sxy") - d($"sx") * d($"sy")
    val varX = nd * d($"sxx") - d($"sx") * d($"sx")
    val varY = nd * d($"syy") - d($"sy") * d($"sy")
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select($"event_type", $"n",
        when($"n" > 1, round(covNum / (nd * (nd - lit(1.0))), 6))
          .otherwise(lit(-1.0)).as("cov_samp"),
        when($"n" > 1 && varX > 0 && varY > 0,
          round(covNum / (sqrt(varX) * sqrt(varY)), 6))
          .otherwise(lit(-1.0)).as("corr"))
      .orderBy($"event_type")
  }

  /** Re-aggregatable distinct-count sketches: per-(type, day) HLL
    * sketches unioned up to a per-type global estimate — the pattern
    * that makes approximate distinct WORK at 100 TB: materialize small
    * daily sketches once, then answer any coarser rollup by register-
    * wise union without touching raw data again (approx_count_distinct
    * must re-scan the corpus for every new grouping). Datasketches HLL
    * union is a register-wise max — commutative and associative — so
    * the final estimate is invariant to partitioning and merge order
    * (asserted in BehavioralSpec), just engine-specific (✖ oracle, like
    * agg_approx_distinct). */
  def aggHllPartitionMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type", $"user_id", Tables.nsToUs($"ts").as("t"))
      .select($"event_type", $"user_id", expr("t div 86400000000").as("day"))
      .groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"))
      .orderBy($"event_type")
  }

  /** ⌊α₆₄·2²⁰⌋ for the raw-HLL estimator at m = 64 registers:
    * α_m = 0.7213/(1 + 1.079/m) = 0.709392…; shared verbatim with the
    * DuckDB oracle (the constant's exactness is irrelevant — only
    * cross-engine identity matters). */
  private[graft] val HllAlphaFp = 743862L

  /** The ρ case chain: first-1-bit position (1-based from the MSB) of
    * the 34-bit register suffix, 35 when the suffix is zero — plain
    * integer comparisons, identical syntax in Spark SQL and DuckDB. */
  private def hllRhoSql: String =
    (1 to 34).map(k => s"WHEN w >= ${1L << (34 - k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 35 END")

  /** HyperLogLog with a fully ENGINE-REPLAYABLE hash — the graded twin
    * of the ✖-by-design `agg_approx_distinct` / `agg_hll_partition_merge`
    * (whose xxhash64-fed sketch buffers no other engine can replay):
    * per event type, each distinct user hashes through two independent
    * QUADRATIC-mod-prime scrambles composed into a 40-bit value —
    * half_a(u) = (q² + q + c_a) mod P with q = ((u+1)·K_a) mod P,
    * P = 1048573 — quadratic because the purely multiplicative map
    * sends consecutive ids to an arithmetic progression mod P whose
    * leading-zero statistics are NOT uniform (measured: one multiply
    * never reached bit 40 on small ids, 124× overestimate; two linear
    * multiplies still skewed +47%; the quadratic lands −2.4% of exact
    * at sf0.1, inside the 1.04/√64 ≈ 13% design σ). The low 6 bits
    * pick one of m = 64 registers, and the register
    * keeps max ρ(suffix) (first-1-bit rank of the 34-bit suffix — the
    * [[hllRhoSql]] case chain). The RAW harmonic estimate is all-BIGINT
    * fixed point: Σ2^−ρ carried as Σ(2⁴⁰ div 2^ρ) with absent
    * registers contributing 2⁴⁰ each, est = ⌊α_fp·m²·2²⁰ / Σ⌋ — no
    * bias/linear-counting corrections (they need ln, banned for oracle
    * parity; the raw-range behavior is the graded contract). Output is
    * the SKETCH ITSELF (one row per occupied register) decorated with
    * the estimate and the exact distinct count, so the key grades
    * bucketing, ρ ranks, register max-merge AND the estimator, and a
    * reader can audit approx-vs-exact per type.
    *
    * Scale shape: one (type, user) distinct shuffle, then registers are
    * a ≤|types|·64-row map-side-combinable aggregate — the sketch
    * merges by register max exactly like production HLL (associative,
    * order-free), which is what makes it a partition-merge replay. The
    * production engine-specific sketches stay as agg_approx_distinct /
    * agg_hll_partition_merge. */
  /** Engine-replayable BLOOM FILTER, graded — completes the sketch
    * family's replayable tier (MinHash/SimHash/LSH/HLL/count-min all
    * have graded twins; the Bloom behind join_bloom_prefilter was the
    * last hold-out, hidden inside Spark's native implementation): one
    * 4096-bit filter per nation over its customer keys, k = 3
    * quadratic-mod-prime hashes (the [[aggHllReplayable]] hash family),
    * the bit array materialized as 128 32-bit words via `bit_or` of
    * shifted ones. Every ordering customer then probes every nation's
    * filter — the join-pruning decision a Bloom exists to make — and
    * the output census is SELF-CERTIFYING: `false_negatives` is
    * emitted and must be zero (the Bloom guarantee), while
    * `false_positives` exhibits the saturation the m/n ratio predicts.
    * The DuckDB oracle replays hashes, words, probes and census
    * bit-for-bit.
    *
    * Scale shape: the filter build is one map-side (nation, word)
    * `bit_or` (≤ |nations|·128 rows — the broadcastable artifact);
    * probes join that tiny frame by (nation, word) and never shuffle
    * the fact side at scale (broadcast hash join). */
  def aggBloomReplayable(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("bloom_cust")
    Tables.orders(spark, dir).createOrReplaceTempView("bloom_ord")
    spark.sql(bloomSql("bloom_cust", "bloom_ord", "div"))
  }

  /** Shared Bloom SQL — `idiv` is `div` (Spark) or `//` (DuckDB). */
  private[graft] def bloomSql(cust: String, ord: String,
      idiv: String): String =
    s"""WITH mem AS (SELECT DISTINCT c_nationkey AS nation,
       |    CAST(c_custkey AS BIGINT) AS k FROM $cust),
       |hs AS (SELECT nation, k,
       |    (CASE i WHEN 1 THEN ((k + 1) * 2654435761) % 1048573
       |            WHEN 2 THEN ((k + 1) * 2246822519) % 1048573
       |            ELSE ((k + 1) * 3266489917) % 1048573 END) % 4096
       |      AS slot
       |  FROM mem CROSS JOIN (VALUES (1), (2), (3)) AS t(i)),
       |words AS (SELECT nation, slot $idiv 32 AS w,
       |    bit_or(CAST(1 AS BIGINT) << CAST(slot % 32 AS INT)) AS wv
       |  FROM hs GROUP BY 1, 2),
       |pk AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS k FROM $ord),
       |probe AS (SELECT n.nation, pk.k
       |  FROM (SELECT DISTINCT nation FROM mem) n CROSS JOIN pk),
       |phs AS (SELECT nation, k,
       |    (CASE i WHEN 1 THEN ((k + 1) * 2654435761) % 1048573
       |            WHEN 2 THEN ((k + 1) * 2246822519) % 1048573
       |            ELSE ((k + 1) * 3266489917) % 1048573 END) % 4096
       |      AS slot
       |  FROM probe CROSS JOIN (VALUES (1), (2), (3)) AS t(i)),
       |hit AS (SELECT p.nation, p.k,
       |    min(CASE WHEN w.wv IS NOT NULL
       |      AND ((w.wv >> CAST(p.slot % 32 AS INT)) & 1) = 1
       |      THEN 1 ELSE 0 END) AS pass
       |  FROM phs p LEFT JOIN words w
       |    ON p.nation = w.nation AND p.slot $idiv 32 = w.w
       |  GROUP BY 1, 2),
       |mk AS (SELECT h.nation, h.k, h.pass,
       |    CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
       |  FROM hit h LEFT JOIN mem m
       |    ON h.nation = m.nation AND h.k = m.k),
       |bits AS (SELECT nation,
       |    CAST(sum(bit_count(wv)) AS BIGINT) AS bits_set
       |  FROM words GROUP BY nation),
       |cen AS (SELECT nation, CAST(count(*) AS BIGINT) AS probes_total,
       |    CAST(sum(pass) AS BIGINT) AS probes_passed,
       |    CAST(sum(CASE WHEN pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS false_positives,
       |    CAST(sum(CASE WHEN pass = 0 AND is_member = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS false_negatives
       |  FROM mk GROUP BY nation),
       |nm AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_members
       |  FROM mem GROUP BY nation)
       |SELECT cen.nation, nm.n_members, bits.bits_set, cen.probes_total,
       |  cen.probes_passed, cen.false_positives, cen.false_negatives
       |FROM cen JOIN nm ON cen.nation = nm.nation
       |JOIN bits ON cen.nation = bits.nation
       |ORDER BY cen.nation""".stripMargin

  /** Exact BITMAP-INDEX words — the roaring/bitmap-index storage tier
    * OLAP engines keep for low-cardinality predicates, graded at word
    * grain: the ordering customers of status 'O' and status 'F' each
    * materialize as packed 32-bit words (`bit_or` of shifted ones on
    * `custkey div 32` — the [[bloomSql]] word idiom, but EXACT: no
    * hashing, the bit position IS the key), and the graded frame is
    * the aligned word table with per-word AND/OR population counts —
    * the intersect/union cardinalities a bitmap index answers without
    * touching rows. Complements agg_kmv_replayable (approximate set
    * ops) with the exact tier.
    *
    * Scale shape: one map-side (status, word) `bit_or` over the
    * distinct membership — the bitmap build is associative and
    * order-free exactly like production bitmap indexes; the set ops
    * align words with one full-outer equi-join of two
    * |keyspace|/32-row frames. One SQL text runs verbatim on both
    * engines. */
  def aggBitmapWords(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("bmw_ord")
    spark.sql(bitmapSql("bmw_ord", "div"))
  }

  /** Shared bitmap SQL — `idiv` is `div` (Spark) or `//` (DuckDB). */
  private[graft] def bitmapSql(ord: String, idiv: String): String =
    s"""WITH mem AS (SELECT DISTINCT o_orderstatus AS st,
       |    CAST(o_custkey AS BIGINT) AS k FROM $ord
       |  WHERE o_orderstatus IN ('O', 'F')),
       |wd AS (SELECT st, k $idiv 32 AS w,
       |    bit_or(CAST(1 AS BIGINT) << CAST(k % 32 AS INT)) AS wv
       |  FROM mem GROUP BY 1, 2),
       |o_ AS (SELECT w, wv FROM wd WHERE st = 'O'),
       |f_ AS (SELECT w, wv FROM wd WHERE st = 'F'),
       |j AS (SELECT coalesce(o_.w, f_.w) AS w,
       |    coalesce(o_.wv, 0) AS wo, coalesce(f_.wv, 0) AS wf
       |  FROM o_ FULL OUTER JOIN f_ ON o_.w = f_.w)
       |SELECT CAST(w AS BIGINT) AS w, CAST(wo AS BIGINT) AS bits_o,
       |  CAST(wf AS BIGINT) AS bits_f,
       |  CAST(bit_count(wo & wf) AS BIGINT) AS n_and,
       |  CAST(bit_count(wo | wf) AS BIGINT) AS n_or
       |FROM j ORDER BY w""".stripMargin

  /** ROARING-STYLE BITMAP CONTAINERS (Chambi–Lemire–Kaser–Godin 2016)
    * — the per-2¹⁶-key container decomposition that makes exact
    * bitmaps affordable over SPARSE keyspaces, where the flat
    * [[aggBitmapWords]] word array would materialize |keyspace|/32
    * words: container id = key div 2¹⁶, and each (set, container)
    * holds only its NON-EMPTY 32-bit words (≤2048 per container),
    * so storage tracks membership, never the key domain — at 10¹²
    * sparse ids the flat tier is 3×10¹⁰ words while containers cost
    * O(members). Graded per container over the status-'O' and
    * status-'F' ORDER-KEY sets (deliberately the sparse TPC-H domain
    * — 1 in 4 keys exists): exact per-side cardinalities and word
    * censuses, the roaring REPRESENTATION DECISION (cardinality ≤4096
    * → 'array' container of sorted shorts; above → packed 'bitmap' —
    * the format's core adaptive choice, decided per container from
    * the same stats), and word-aligned AND/OR population counts. ONE
    * SQL text runs verbatim on both engines. The member key is
    * o_orderkey·5 — a fixed deterministic stride that disperses the
    * fixture's near-dense order keys across a sparse id space (12
    * containers at sf0.1, with per-side cardinalities straddling the
    * 4096 threshold so BOTH representation outcomes are graded);
    * stride dispersal is injective, so every popcount law holds
    * against the undispersed exact sets.
    *
    * Scale shape: build = one map-side (set, container, word) bit_or
    * over the distinct membership (associative, order-free — how
    * roaring unions merge); per-container stats collapse to
    * |containers| rows; set ops align on (container, word) — an
    * equi-join whose key carries the container, so a hot container
    * never skews a single task beyond its ≤2048 words. */
  def aggBitmapContainers(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("bmc_ord")
    spark.sql(bitmapContainerSql("bmc_ord", "div"))
  }

  /** Shared container-bitmap SQL — `idiv` is `div` (Spark) or `//`
    * (DuckDB). */
  private[graft] def bitmapContainerSql(ord: String, idiv: String): String =
    s"""WITH mem AS (SELECT DISTINCT o_orderstatus AS st,
       |    CAST(o_orderkey * 5 AS BIGINT) AS k FROM $ord
       |  WHERE o_orderstatus IN ('O', 'F')),
       |wd AS (SELECT st, k $idiv 65536 AS c, (k % 65536) $idiv 32 AS w,
       |    bit_or(CAST(1 AS BIGINT) << CAST(k % 32 AS INT)) AS wv
       |  FROM mem GROUP BY 1, 2, 3),
       |ct AS (SELECT st, c, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(bit_count(wv)) AS BIGINT) AS card
       |  FROM wd GROUP BY 1, 2),
       |o_ AS (SELECT c, w, wv FROM wd WHERE st = 'O'),
       |f_ AS (SELECT c, w, wv FROM wd WHERE st = 'F'),
       |j AS (SELECT coalesce(o_.c, f_.c) AS c,
       |    coalesce(o_.wv, 0) AS wo, coalesce(f_.wv, 0) AS wf
       |  FROM o_ FULL OUTER JOIN f_ ON o_.c = f_.c AND o_.w = f_.w),
       |ops AS (SELECT c, CAST(sum(bit_count(wo & wf)) AS BIGINT) AS n_and,
       |    CAST(sum(bit_count(wo | wf)) AS BIGINT) AS n_or
       |  FROM j GROUP BY c),
       |co AS (SELECT c, n_words AS words_o, card AS card_o
       |  FROM ct WHERE st = 'O'),
       |cf AS (SELECT c, n_words AS words_f, card AS card_f
       |  FROM ct WHERE st = 'F')
       |SELECT CAST(ops.c AS BIGINT) AS container,
       |  CAST(coalesce(co.card_o, 0) AS BIGINT) AS card_o,
       |  CAST(coalesce(cf.card_f, 0) AS BIGINT) AS card_f,
       |  CAST(coalesce(co.words_o, 0) AS BIGINT) AS words_o,
       |  CAST(coalesce(cf.words_f, 0) AS BIGINT) AS words_f,
       |  CASE WHEN coalesce(co.card_o, 0) = 0 THEN 'empty'
       |       WHEN co.card_o <= 4096 THEN 'array' ELSE 'bitmap'
       |  END AS type_o,
       |  CASE WHEN coalesce(cf.card_f, 0) = 0 THEN 'empty'
       |       WHEN cf.card_f <= 4096 THEN 'array' ELSE 'bitmap'
       |  END AS type_f,
       |  ops.n_and, ops.n_or
       |FROM ops LEFT JOIN co ON ops.c = co.c
       |LEFT JOIN cf ON ops.c = cf.c
       |ORDER BY container""".stripMargin

  /** MERGEABLE QUANTILE SKETCH — the engine-replayable rung of the
    * quantile family that completes the sketch algebra next to the
    * KMV/HLL/CMS/bloom tiers (agg_percentile_sampled covers the
    * sampled twin; t-digest/GK are the float-centroid cousins this
    * fixed-grid form replaces to stay deterministic): a single-level
    * dyadic histogram over order totals at 2¹⁶-cent bucket width.
    * The sketch IS (bucket, count) — bounded by the VALUE DOMAIN
    * (range/2¹⁶ buckets), mergeable by plain count addition
    * (associative and order-free, the production property: per-shard
    * sketches union + sum — StatsSpec pins merge-order invariance
    * against an odd/even shard split), and every quantile answer is a
    * deterministic receipt: for each pct, the target rank
    * r = ⌈n·pct/100⌉, the bracketing bucket (cum_below < r ≤
    * cum_below + in_bucket), and the bucket's [lo, hi] cent bounds —
    * a guaranteed ±2¹⁶-cent value error, which is the honest contract
    * a fixed-grid sketch can certify (StatsSpec pins that the exact
    * percentile_disc falls inside every bracket).
    *
    * Scale shape: the build is ONE map-side-combinable groupBy over
    * the scan (partial aggregation = the per-partition sketch, the
    * shuffle = the merge — Spark's partial/final split IS the sketch
    * algebra); the cumulative walk and quantile election run on the
    * ≤|range/2¹⁶|-row bucket frame (domain-bounded, never data-
    * bounded — the plan-guard allowlist argument). */
  def aggQuantileMergeable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select((Tables.dec2($"o_totalprice") * 100).cast("long").as("v"))
    dyadicQuantiles(spark, dyadicSketch(cents))
  }

  /** The sketch build: (bucket, count) at 2¹⁶-cent width over a `v`
    * cents column. Partial aggregation is the per-partition sketch;
    * the shuffle merge is count addition. */
  private[graft] def dyadicSketch(cents: DataFrame): DataFrame =
    cents.groupBy(expr("v div 65536").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Quantile receipts from a (b, c) sketch frame — shared by the
    * graded key and StatsSpec's merge-order-invariance law. */
  private[graft] def dyadicQuantiles(spark: SparkSession,
      sketch: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nF = sketch.agg(sum($"c").as("n"))
    val cum = sketch
      .withColumn("cum_below", coalesce(sum($"c").over(w), lit(0L)))
      .crossJoin(broadcast(nF))
    val pcts = Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L).toDF("pct")
    cum.crossJoin(broadcast(pcts))
      .withColumn("r", expr("(n * pct + 99) div 100"))
      .filter($"cum_below" < $"r" && $"cum_below" + $"c" >= $"r")
      .select($"pct", $"n", $"r", $"b".as("bucket"), $"cum_below",
        $"c".as("in_bucket"),
        ($"b" * 65536L).as("est_cents_lo"),
        (($"b" + 1L) * 65536L - 1L).as("est_cents_hi"))
      .orderBy($"pct")
  }

  /** RELATIVE-ERROR QUANTILE SKETCH — the heavy-tail rung next to the
    * fixed-grid [[aggQuantileMergeable]] (whose ±2¹⁶-cent ABSOLUTE
    * bracket is useless at the small end of a long-tailed domain): a
    * LOG-SCALE histogram in the KLL/req spirit kept fully
    * engine-replayable — bucket = (bit-length of the cent value,
    * top-4-bits-after-the-leading-bit), i.e. 16 subdivisions per
    * octave, so every bracket guarantees (hi−lo)/lo ≤ 2⁻⁴ = 6.25%
    * RELATIVE error at ANY magnitude. The bucket id bits·16+minor is
    * monotone in the value, the sketch is (bucket, count) — mergeable
    * by plain count addition (StatsSpec pins merge-order invariance
    * against an odd/even shard split) — and each pct row emits the
    * target rank, the bracketing bucket, and the reconstructed
    * [lo, hi] cent bounds (StatsSpec pins that the exact
    * percentile_disc falls inside every bracket — the rank-error
    * receipt).
    *
    * Scale shape: ONE map-side-combinable groupBy over the scan
    * (partial aggregation = the per-partition sketch, the shuffle =
    * the merge); the cumulative walk runs on the ≤ 16·64-row bucket
    * frame — bounded by the VALUE DOMAIN's bit width, never by the
    * data (strictly smaller than the dyadic sketch's frame). */
  def aggQuantileRelerr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.lineitem(spark, dir)
      .select((Tables.dec2($"l_extendedprice") * 100).cast("long").as("v"))
    logQuantiles(spark, logSketch(cents))
  }

  /** The log-scale sketch build: bucket = bits·16 + minor over a `v`
    * cents column (v ≥ 1); shared with StatsSpec's merge law. */
  private[graft] def logSketch(cents: DataFrame): DataFrame =
    cents
      .withColumn("bits", expr("length(bin(v))"))
      .withColumn("sh", expr("CAST(greatest(bits - 5, 0) AS INT)"))
      .groupBy(expr("bits * 16 + (shiftright(v, sh) & 15)").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Quantile receipts from a log-scale (b, c) sketch frame. */
  private[graft] def logQuantiles(spark: SparkSession,
      sketch: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nF = sketch.agg(sum($"c").as("n"))
    val cum = sketch
      .withColumn("cum_below", coalesce(sum($"c").over(w), lit(0L)))
      .crossJoin(broadcast(nF))
    val pcts = Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L).toDF("pct")
    cum.crossJoin(broadcast(pcts))
      .withColumn("r", expr("(n * pct + 99) div 100"))
      .filter($"cum_below" < $"r" && $"cum_below" + $"c" >= $"r")
      .withColumn("bits", expr("b div 16"))
      .withColumn("minor", expr("b % 16"))
      .withColumn("sh", expr("CAST(greatest(bits - 5, 0) AS INT)"))
      .select($"pct", $"n", $"r", $"b".as("bucket"), $"bits", $"minor",
        $"cum_below", $"c".as("in_bucket"),
        expr("CASE WHEN bits < 5 THEN minor " +
          "ELSE shiftleft(16 + minor, sh) END").as("est_cents_lo"),
        expr("CASE WHEN bits < 5 THEN minor " +
          "ELSE shiftleft(16 + minor, sh) + shiftleft(1, sh) - 1 END")
          .as("est_cents_hi"))
      .orderBy($"pct")
  }

  /** HYPOTHETICAL-SET ranking (SQL:2003 `RANK(v) WITHIN GROUP` /
    * Oracle-Postgres hypothetical-set aggregates) — "where WOULD a
    * $1 500.00 order rank in each priority class?", answered WITHOUT
    * sorting anything: the hypothetical rank is 1 + count(< v), the
    * dense rank 1 + count(DISTINCT < v), percent_rank and cume_dist
    * the matching 2²⁰ fixed-point ratios — the counting identity that
    * makes hypothetical-set functions one associative aggregate where
    * the window form pays a per-group sort.
    *
    * Scale shape: one map-side-combinable conditional aggregate over
    * the scan; no window, no sort, output = |priorities| rows. */
  def aggRankHypothetical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = 15000000L // $150 000.00 in cents — mid-range for o_totalprice
    Tables.orders(spark, dir)
      .select($"o_orderpriority",
        (Tables.dec2($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(when($"cents" < v, 1L).otherwise(0L)).as("n_below"),
        countDistinct(when($"cents" < v, $"cents")).as("nd_below"),
        sum(when($"cents" <= v, 1L).otherwise(0L)).as("n_at_or_below"))
      .select($"o_orderpriority", $"n",
        ($"n_below" + 1L).as("h_rank"),
        ($"nd_below" + 1L).as("h_dense_rank"),
        expr("(n_below * 1048576) div n").as("pct_rank_fp"),
        expr("(n_at_or_below * 1048576) div n").as("cume_dist_fp"))
      .orderBy($"o_orderpriority")
  }

  /** Engine-replayable KMV (k-minimum-values / bottom-k θ-sketch,
    * Bar-Yossef et al. 2002; Beyer et al. 2007) — the sketch tier the
    * replayable family still lacked: unlike HLL registers, a KMV
    * sample supports SET OPERATIONS, so this key grades distinct-count
    * estimation AND the Jaccard/intersection estimate between two
    * overlapping sets (clicking vs purchasing users) from one pass.
    * Hash = the replayable multiplicative family mod the Mersenne
    * prime 2³¹−1 (injective on the id domain — no collision term);
    * per set the k = 64 smallest hashes elect θ = max of the sample
    * and est = ⌊(k−1)·M/θ⌋; the UNION sample's members flagged in both
    * sets give ρ, jaccard_fp = ⌊2²⁰·ρ/k⌋ and est_inter =
    * ⌊ρ·est_union/k⌋ (the Beyer merge rule). Sketches smaller than k
    * fall back to the exact count (the standard not-yet-full
    * contract). Exact counts ride along, so the row is SELF-AUDITING:
    * est vs exact exhibits the 1/√k ≈ 12.5% design error.
    *
    * Scale shape: flags collapse the log map-side to one row per
    * user; each k-smallest sample is ORDER BY h LIMIT k — planned as
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    * the driver side of the exchange), never a global sort; everything
    * downstream is a ≤64-row frame. The exact audit columns are one
    * associative aggregate. One SQL text runs verbatim on both
    * engines (`idiv` = div ⟷ //). */
  def aggKmvReplayable(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("kmv_ev")
    spark.sql(kmvSql("kmv_ev", "div"))
  }

  /** Shared KMV SQL — `idiv` is `div` (Spark) or `//` (DuckDB). */
  private[graft] def kmvSql(ev: String, idiv: String): String =
    s"""WITH flags AS (SELECT user_id AS u,
       |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
       |  FROM $ev GROUP BY 1),
       |m AS (SELECT u, in_a, in_b,
       |    ((u + 1) * 2654435761) % 2147483647 AS h
       |  FROM flags WHERE in_a = 1 OR in_b = 1),
       |ra AS (SELECT h FROM m WHERE in_a = 1 ORDER BY h LIMIT 64),
       |rb AS (SELECT h FROM m WHERE in_b = 1 ORDER BY h LIMIT 64),
       |ru AS (SELECT h, in_a, in_b FROM m ORDER BY h LIMIT 64),
       |ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
       |    CAST(sum(in_b) AS BIGINT) AS exact_b,
       |    CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
       |  FROM m),
       |sa AS (SELECT CAST(count(*) AS BIGINT) AS k_a,
       |    CAST(max(h) AS BIGINT) AS theta_a FROM ra),
       |sb AS (SELECT CAST(count(*) AS BIGINT) AS k_b,
       |    CAST(max(h) AS BIGINT) AS theta_b FROM rb),
       |su AS (SELECT CAST(count(*) AS BIGINT) AS k_u,
       |    CAST(max(h) AS BIGINT) AS theta_u,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS rho FROM ru),
       |est AS (SELECT
       |    CASE WHEN sa.k_a < 64 THEN ex.exact_a
       |      ELSE (CAST(63 AS BIGINT) * 2147483647) $idiv sa.theta_a END AS est_a,
       |    CASE WHEN sb.k_b < 64 THEN ex.exact_b
       |      ELSE (CAST(63 AS BIGINT) * 2147483647) $idiv sb.theta_b END AS est_b,
       |    CASE WHEN su.k_u < 64 THEN ex.exact_union
       |      ELSE (CAST(63 AS BIGINT) * 2147483647) $idiv su.theta_u END AS est_union,
       |    sa.theta_a, sb.theta_b, su.theta_u, su.rho, su.k_u,
       |    ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_inter
       |  FROM sa, sb, su, ex)
       |SELECT CAST(64 AS BIGINT) AS k,
       |  CAST(coalesce(theta_a, -1) AS BIGINT) AS theta_a,
       |  CAST(coalesce(theta_b, -1) AS BIGINT) AS theta_b,
       |  CAST(coalesce(theta_u, -1) AS BIGINT) AS theta_u,
       |  CAST(est_a AS BIGINT) AS est_a,
       |  CAST(est_b AS BIGINT) AS est_b,
       |  CAST(est_union AS BIGINT) AS est_union,
       |  CAST(rho AS BIGINT) AS rho,
       |  CAST(CASE WHEN k_u = 0 THEN -1
       |    ELSE (rho * 1048576) $idiv k_u END AS BIGINT) AS jaccard_fp,
       |  CAST(CASE WHEN k_u = 0 THEN -1
       |    ELSE (rho * est_union) $idiv k_u END AS BIGINT) AS est_inter,
       |  exact_a, exact_b, exact_union, exact_inter
       |FROM est ORDER BY k""".stripMargin

  def aggHllReplayable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut, not mark (r19, X6): est and exact both BROADCAST into the
    // final decoration while regs probes the same frame — three
    // consumers racing a lazy persist re-run the events distinct per
    // racer
    val d = graft.PlanOnly.cut(Tables.events(spark, dir)
      .select($"event_type", $"user_id").distinct())
    val regs = d
      .withColumn("q1", expr("((user_id + 1) * 2654435761L) % 1048573"))
      .withColumn("q2", expr("((user_id + 1) * 2246822519L) % 1048573"))
      .withColumn("h",
        expr("((q1 * q1 + q1 + 12345) % 1048573) * 1048576 + " +
          "(q2 * q2 + q2 + 98765) % 1048573"))
      .withColumn("bucket", $"h" % 64)
      .withColumn("w", expr("h div 64"))
      .withColumn("rho", expr(hllRhoSql).cast("long"))
      .groupBy($"event_type", $"bucket")
      .agg(max($"rho").as("r_max"))
    val est = regs.groupBy($"event_type")
      .agg(count(lit(1)).as("n_present"),
        sum(expr("1099511627776L div shiftleft(1L, CAST(r_max AS INT))"))
          .as("inv_present"))
      .select($"event_type",
        ($"inv_present" + (lit(64L) - $"n_present") * 1099511627776L)
          .as("inv_sum_fp"))
      .select($"event_type",
        expr(s"${HllAlphaFp * 4096L * 1048576L}L div inv_sum_fp")
          .as("est_users"))
    val exact = d.groupBy($"event_type").agg(count(lit(1)).as("exact_users"))
    regs.join(broadcast(est), "event_type")
      .join(broadcast(exact), "event_type")
      .select($"event_type", $"bucket", $"r_max", $"est_users", $"exact_users")
      .orderBy($"event_type", $"bucket")
  }

  /** Ordered string aggregation (SQL LISTAGG / string_agg): the
    * denormalized "members as one cell" view reporting layers ask for.
    * Determinism requires imposing the element order explicitly —
    * collect_list order is partition-arrival nondeterministic, so the
    * list is sort_array'd before joining (DuckDB mirrors with
    * string_agg ... ORDER BY). State is the member list: bounded here
    * by nations-per-region; at 100 TB cap pathological groups with a
    * slice() after the sort. */
  def aggStringConcat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        count(lit(1)).as("n_nations"),
        concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"))
      .orderBy($"r_name")
  }

  /** Discrete (inverse-distribution) percentiles per group:
    * percentile_disc returns an ACTUAL data value (smallest v with
    * cume_dist ≥ p), so unlike the interpolated percentile_cont —
    * which needs a round(6) truce across engines (agg_percentile) —
    * the result is bit-exact everywhere. Spark plans WITHIN GROUP
    * inverse-distribution functions as a regular sort-based aggregate;
    * shuffle is O(groups), per-group state is the value multiset
    * (at 100 TB swap in approx_percentile for hot groups — same
    * query shape). */
  def aggPercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", $"value".as("v"))
      .createOrReplaceTempView("ev_disc")
    spark.sql(
      """SELECT event_type,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS p25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS p75,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS p90
        |FROM ev_disc GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Row hashes for the count–min sketch: 4 quadratic-mod-prime
    * scrambles (multiplier, offset) shared verbatim with the oracle. */
  private[graft] val CmKs: Seq[Long] =
    Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  private[graft] val CmCs: Seq[Long] = Seq(12345L, 98765L, 424242L, 777777L)

  /** Row-j column index as a SQL fragment over a decorated `q_j`
    * column — identical syntax on both engines. */
  private def cmColSql(j: Int): String =
    s"(((q_$j * q_$j + q_$j + ${CmCs(j)}) % 1048573) % 256)"

  /** Count–min sketch with a fully ENGINE-REPLAYABLE hash family — the
    * graded twin of the ✖-by-design `agg_heavy_hitters`: Misra–Gries
    * estimates depend on partial-merge order by construction, but CMS
    * is the ORDER-FREE member of the frequent-items family — its
    * counters are plain sums, so any partitioning or merge order
    * yields the identical sketch, which is exactly what makes it
    * oracle-gradeable. d = 4 rows × w = 256 columns; row j's hash is
    * the quadratic-mod-prime scramble col_j(u) = ((q²+q+c_j) mod P)
    * mod 256 with q = ((u+1)·K_j) mod P; every event increments
    * counter (j, col_j(user)); a user's estimate is
    * min_j counter[j][col_j(u)] — one-sided by the CMS guarantee
    * (est ≥ exact, pinned as a law alongside the ε = e/w overcount
    * bound). The graded output is the top-20 users by exact count with
    * exact and estimated counts side by side — sketch, query path and
    * error all hash-graded.
    *
    * Scale shape: the sketch is a 1 024-cell map-side-combinable
    * aggregate (the order-free merge IS the partition-merge property);
    * the probe joins the per-user frame to the broadcast 1 024-row
    * sketch; top-20 is a TakeOrderedAndProject. The MG summary stays
    * as agg_heavy_hitters for the ≤k-state-per-group shape CMS's
    * fixed-width table doesn't give. */
  def aggCountminReplayable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def withQ(df: DataFrame, key: String): DataFrame =
      (0 until 4).foldLeft(df)((d, j) => d.withColumn(s"q_$j",
        expr(s"(($key + 1) * ${CmKs(j)}L) % 1048573")))
    val ev = graft.PlanOnly.mark(
      Tables.events(spark, dir).select($"user_id"))
    val counters = withQ(ev, "user_id")
      .select(explode(array((0 until 4).map(j =>
        struct(lit(j.toLong).as("j"), expr(cmColSql(j)).as("col"))): _*))
        .as("k"))
      .select($"k.j".as("j"), $"k.col".as("col"))
      .groupBy($"j", $"col").agg(count(lit(1)).as("cnt"))
    val users = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_cnt"))
    val probes = withQ(users, "user_id")
      .select($"user_id", $"exact_cnt",
        explode(array((0 until 4).map(j =>
          struct(lit(j.toLong).as("j"), expr(cmColSql(j)).as("col"))): _*))
          .as("k"))
      .select($"user_id", $"exact_cnt", $"k.j".as("j"), $"k.col".as("col"))
    probes.join(broadcast(counters), Seq("j", "col"))
      .groupBy($"user_id", $"exact_cnt").agg(min($"cnt").as("est_cnt"))
      .orderBy($"exact_cnt".desc, $"user_id").limit(20)
      .select($"user_id", $"exact_cnt", $"est_cnt")
      .orderBy($"exact_cnt".desc, $"user_id")
  }

  /** Deterministic-sample percentiles — the graded twin of the
    * ✖-by-design `agg_approx_percentile` (the GK summary's internal
    * sample depends on merge order; a CONTENT-HASH sample does not):
    * keep the ~1/16 of events whose quadratic-scrambled event_id lands
    * in residue 0, then exact percentile_disc over the sample, with
    * the full-data percentiles decorated alongside so the key grades
    * the sampling hash, the sampled quantiles AND exposes the
    * approximation error row by row. percentile_disc returns actual
    * data values (no interpolation arithmetic — cross-engine safe, the
    * agg_percentile_disc precedent).
    *
    * Scale shape: the sample predicate is a scan-level filter (16×
    * data reduction before any shuffle — the point of sample-based
    * quantiles at 100 TB); both percentile passes are per-group sorts
    * over their frames. */
  def aggPercentileSampled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", $"value".as("v"), $"event_id")
      .withColumn("q", expr("((event_id + 1) * 2654435761L) % 1048573"))
      .withColumn("keep", expr("((q * q + q + 7) % 1048573) % 16 = 0"))
      .createOrReplaceTempView("ev_samp")
    spark.sql(
      """SELECT event_type,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sample,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY CASE WHEN keep
        |    THEN v END) AS p50_sample,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY CASE WHEN keep
        |    THEN v END) AS p90_sample,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50_exact,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS p90_exact
        |FROM ev_samp GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Top users per event type via a Misra–Gries frequent-items summary
    * (functions/HeavyHittersAgg): fixed k=8 counters per group, so the
    * shuffle carries ≤8 (item, count) pairs per (group, map task) no
    * matter how many distinct users exist — the sketch answer to "who
    * dominates this key" that an exact count-and-rank can't give at
    * 100 TB cardinalities. ✖ oracle by design (estimates depend on
    * partial-merge order, like every MG summary); the guarantee that
    * IS deterministic — candidate superset + n/(k+1) error bound, and
    * exactness when k ≥ distinct — is pinned in HeavyHittersSpec. */
  def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.HeavyHittersAgg.register(spark)
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(expr("heavy_hitters_agg(user_id)").as("hh"))
      .select($"event_type", posexplode($"hh").as(Seq("r0", "h")))
      .select($"event_type", ($"r0" + 1).cast("long").as("rank"),
        $"h.item".as("user_id"), $"h.est".as("est_count"))
      .orderBy($"event_type", $"rank")
  }

  /** Conditional aggregation via the SQL:2003 FILTER clause — several
    * differently-filtered aggregates over ONE scan of the fact table
    * (the alternative, one query per predicate, re-reads the corpus
    * per metric; at 100 TB the single-pass shape is the only sane
    * one). Catalyst compiles FILTER into the same codegen'd
    * HashAggregate as CASE-WHEN aggregates — map-side combine intact,
    * including for the filtered DISTINCT (planned via Expand). The
    * filtered sum stays in exact decimal with a 0 empty-group
    * sentinel. */
  def aggFilteredConditional(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", $"user_id", Tables.dec4($"value").as("v"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("count(*) FILTER (WHERE v > 75)").as("n_big"),
        expr("CAST(coalesce(sum(v) FILTER (WHERE v > 75), 0) AS DOUBLE)")
          .as("sum_big"),
        expr("count(DISTINCT user_id) FILTER (WHERE v > 75)").as("users_big"))
      .orderBy($"event_type")
  }

  /** Deterministic per-group mode: each user's most frequent event
    * type. `mode()` builtins tie-break arbitrarily (and differently
    * across engines); the count → rank shape makes the tie-break
    * explicit — highest count, then lexicographically first value — so
    * the survivor is unique and partitioning-invariant. At scale: one
    * partial-aggregated groupBy, then a per-user window whose
    * rank-1 filter prunes inside the window operator. */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"user_id").orderBy($"n_events".desc, $"event_type")
    counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("mode_event"), $"n_events")
      .orderBy($"user_id")
  }

  /** Exact WEIGHTED median per group — the quantity-weighted price
    * midpoint (half the shipped units cost less, half more), which the
    * unweighted percentile keys cannot express: per return flag, order
    * lineitems by (price cents, orderkey, linenumber), accumulate
    * quantity weight, and elect the first value whose doubled running
    * weight reaches the total — the 2·cum ≥ W cross-product rule, no
    * division at all. Because the cumulative weight is monotone along
    * the value order, the qualifying set is a suffix and min(value)
    * over it IS the boundary row — so the election is a plain
    * conditional aggregate, not a second window.
    *
    * Scale shape: the fact rows collapse map-side to a per-(flag, cents)
    * HISTOGRAM first (one combinable aggregate), so the cumulative
    * window runs over the value-domain frame — |distinct prices| rows
    * per flag, bounded by the price domain, never by the corpus. The
    * election is grain-invariant: the qualifying rows form a suffix of
    * the (cents, …) order, a row qualifies iff the last row of its
    * cents run qualifies, so min(cents) over qualifying histogram rows
    * ≡ min(cents) over qualifying fact rows (the oracle replays the
    * fact-grain form; the hash-match proves the rewrite). Quantities
    * are integral by data contract (TPC-H) — the BIGINT cast is
    * exact. */
  def aggWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        (Tables.dec2($"l_extendedprice") * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"cents")
      .agg(sum($"qty").as("qw"), count(lit(1)).as("cnt"))
    val wc = Window.partitionBy($"l_returnflag").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("cum_w", sum($"qw").over(wc))
      .withColumn("w_total",
        sum($"qw").over(Window.partitionBy($"l_returnflag")))
      .groupBy($"l_returnflag")
      .agg(sum($"cnt").as("n_lines"), max($"w_total").as("w_total"),
        min(when($"cum_w" * 2 >= $"w_total", $"cents"))
          .as("wmedian_cents"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, QueryFn] = Map(
    "agg_hll_replayable" -> (aggHllReplayable(_, _)),
    "agg_bloom_replayable" -> (aggBloomReplayable(_, _)),
    "agg_kmv_replayable" -> (aggKmvReplayable(_, _)),
    "agg_rank_hypothetical" -> (aggRankHypothetical(_, _)),
    "agg_bitmap_words" -> (aggBitmapWords(_, _)),
    "agg_bitmap_containers" -> (aggBitmapContainers(_, _)),
    "agg_quantile_mergeable" -> (aggQuantileMergeable(_, _)),
    "agg_quantile_relerr" -> (aggQuantileRelerr(_, _)),
    "sql_grouping_id" -> (sqlGroupingId(_, _)),
    "agg_countmin_replayable" -> (aggCountminReplayable(_, _)),
    "agg_percentile_sampled" -> (aggPercentileSampled(_, _)),
    "agg_weighted_median" -> (aggWeightedMedian(_, _)),
    "agg_filtered_conditional" -> (aggFilteredConditional(_, _)),
    "agg_percentile_disc" -> (aggPercentileDisc(_, _)),
    "agg_string_concat" -> (aggStringConcat(_, _)),
    "agg_heavy_hitters" -> (aggHeavyHitters(_, _)),
    "agg_mode" -> (aggMode(_, _)),
    "agg_stats_moments" -> (aggStatsMoments(_, _)),
    "agg_corr_covar" -> (aggCorrCovar(_, _)),
    "agg_hll_partition_merge" -> (aggHllPartitionMerge(_, _)),
    "agg_pivot" -> (aggPivot(_, _)),
    "sql_correlated_subquery" -> (sqlCorrelatedSubquery(_, _)),
    "agg_groupby_sum" -> (aggGroupbySum(_, _)),
    "agg_count_distinct" -> (aggCountDistinct(_, _)),
    "agg_approx_distinct" -> (aggApproxDistinct(_, _)),
    "agg_approx_percentile" -> (aggApproxPercentile(_, _)),
    "agg_rollup" -> (aggRollup(_, _)),
    "agg_cube" -> (aggCube(_, _)),
    "agg_grouping_sets" -> (aggGroupingSets(_, _)),
    "agg_wordcount" -> (aggWordcount(_, _)),
    "agg_histogram" -> (aggHistogram(_, _))
  )

  /** DuckDB replay of [[aggCountminReplayable]] — q decorations, column
    * CASE chain, counters, and the min-probe, all generated from the
    * same [[CmKs]]/[[CmCs]]/[[cmColSql]] source of truth. */
  private def countminOracle: String = {
    val qDefs = (0 until 4)
      .map(j => s"((user_id + 1) * ${CmKs(j)}) % 1048573 AS q_$j")
      .mkString(",\n    ")
    val colCase = "CASE k.j " +
      (0 until 3).map(j => s"WHEN $j THEN ${cmColSql(j)}").mkString(" ") +
      s" ELSE ${cmColSql(3)} END"
    s"""WITH ev AS (SELECT user_id FROM events),
q AS (SELECT user_id,
    $qDefs
  FROM ev),
fan AS (SELECT k.j, $colCase AS col
  FROM q, (VALUES (0), (1), (2), (3)) k(j)),
counters AS (SELECT j, col, CAST(count(*) AS BIGINT) AS cnt
  FROM fan GROUP BY j, col),
users AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM ev GROUP BY user_id),
uq AS (SELECT user_id, exact_cnt,
    $qDefs
  FROM users),
probes AS (SELECT user_id, exact_cnt, k.j, $colCase AS col
  FROM uq, (VALUES (0), (1), (2), (3)) k(j)),
est AS (SELECT p.user_id, p.exact_cnt,
    CAST(min(c.cnt) AS BIGINT) AS est_cnt
  FROM probes p JOIN counters c USING (j, col)
  GROUP BY p.user_id, p.exact_cnt)
SELECT user_id, exact_cnt, est_cnt FROM est
ORDER BY exact_cnt DESC, user_id LIMIT 20"""
  }

  val oracleSql: Map[String, String] = Map(
    "agg_countmin_replayable" -> countminOracle,
    // same scramble + residue sample, exact disc quantiles over sample
    // and full data side by side
    "agg_percentile_sampled" ->
      """WITH s AS (SELECT event_type, value AS v,
        |    ((event_id + 1) * 2654435761) % 1048573 AS q FROM events),
        |k AS (SELECT event_type, v,
        |    ((q * q + q + 7) % 1048573) % 16 = 0 AS keep FROM s)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sample,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY CASE WHEN keep
        |    THEN v END) AS p50_sample,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY CASE WHEN keep
        |    THEN v END) AS p90_sample,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50_exact,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS p90_exact
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same scramble, register pick, ρ case chain (generated from ONE
    // Scala source), max-merge, and fixed-point harmonic estimate
    "agg_bloom_replayable" -> bloomSql("customer", "orders", "//"),
    "agg_kmv_replayable" -> kmvSql("events", "//"),
    "agg_bitmap_words" -> bitmapSql("orders", "//"),
    "agg_bitmap_containers" -> bitmapContainerSql("orders", "//"),
    // the same fixed-grid sketch walked in DuckDB: bucket counts,
    // exclusive cumulative, ceil-rank election, [lo, hi] receipts
    "agg_quantile_mergeable" ->
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS v FROM orders),
        |h AS (SELECT v // 65536 AS b, count(*) AS c FROM v GROUP BY 1),
        |cum AS (SELECT b, c,
        |    coalesce(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS cum_below,
        |    sum(c) OVER () AS n
        |  FROM h),
        |p AS (SELECT CAST(unnest([1, 5, 25, 50, 75, 95, 99]) AS BIGINT)
        |    AS pct)
        |SELECT pct, CAST(n AS BIGINT) AS n,
        |  CAST((n * pct + 99) // 100 AS BIGINT) AS r,
        |  CAST(b AS BIGINT) AS bucket,
        |  CAST(cum_below AS BIGINT) AS cum_below,
        |  CAST(c AS BIGINT) AS in_bucket,
        |  CAST(b * 65536 AS BIGINT) AS est_cents_lo,
        |  CAST((b + 1) * 65536 - 1 AS BIGINT) AS est_cents_hi
        |FROM cum, p
        |WHERE cum_below < (n * pct + 99) // 100
        |  AND cum_below + c >= (n * pct + 99) // 100
        |ORDER BY pct""".stripMargin,
    // the log-scale sketch walked in DuckDB: bit-length + top-4-bit
    // bucket, exclusive cumulative, ceil-rank election, CASE-guarded
    // [lo, hi] reconstruction
    "agg_quantile_relerr" ->
      """WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * 100 AS BIGINT) AS v FROM lineitem),
        |h AS (SELECT length(bin(v)) * 16 +
        |    ((v >> greatest(length(bin(v)) - 5, 0)) & 15) AS b,
        |    count(*) AS c
        |  FROM v GROUP BY 1),
        |cum AS (SELECT b, c,
        |    coalesce(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS cum_below,
        |    sum(c) OVER () AS n
        |  FROM h),
        |p AS (SELECT CAST(unnest([1, 5, 25, 50, 75, 95, 99]) AS BIGINT)
        |    AS pct)
        |SELECT pct, CAST(n AS BIGINT) AS n,
        |  CAST((n * pct + 99) // 100 AS BIGINT) AS r,
        |  CAST(b AS BIGINT) AS bucket,
        |  CAST(b // 16 AS BIGINT) AS bits,
        |  CAST(b % 16 AS BIGINT) AS minor,
        |  CAST(cum_below AS BIGINT) AS cum_below,
        |  CAST(c AS BIGINT) AS in_bucket,
        |  CAST(CASE WHEN b // 16 < 5 THEN b % 16
        |    ELSE (16 + b % 16) << greatest(b // 16 - 5, 0) END AS BIGINT)
        |    AS est_cents_lo,
        |  CAST(CASE WHEN b // 16 < 5 THEN b % 16
        |    ELSE ((16 + b % 16) << greatest(b // 16 - 5, 0))
        |      + (1 << greatest(b // 16 - 5, 0)) - 1 END AS BIGINT)
        |    AS est_cents_hi
        |FROM cum, p
        |WHERE cum_below < (n * pct + 99) // 100
        |  AND cum_below + c >= (n * pct + 99) // 100
        |ORDER BY pct""".stripMargin,
    // same standard bitmask convention (leftmost column = MSB)
    "sql_grouping_id" ->
      """SELECT CAST(grouping_id(c_mktsegment, o_orderpriority) AS BIGINT)
        |    AS gid,
        |  coalesce(c_mktsegment, '(all)') AS c_mktsegment,
        |  coalesce(o_orderpriority, '(all)') AS o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)
        |ORDER BY gid, c_mktsegment, o_orderpriority""".stripMargin,
    // the same counting identity; countDistinct(CASE) ignores the
    // NULL arm on both engines
    "agg_rank_hypothetical" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |a AS (SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN cents < 15000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_below,
        |    CAST(count(DISTINCT CASE WHEN cents < 15000000 THEN cents END)
        |      AS BIGINT) AS nd_below,
        |    CAST(sum(CASE WHEN cents <= 15000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_at_or_below
        |  FROM o GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  n_below + 1 AS h_rank,
        |  nd_below + 1 AS h_dense_rank,
        |  CAST((n_below * 1048576) // n AS BIGINT) AS pct_rank_fp,
        |  CAST((n_at_or_below * 1048576) // n AS BIGINT) AS cume_dist_fp
        |FROM a ORDER BY o_orderpriority""".stripMargin,
    "agg_hll_replayable" -> s"""WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events),
b AS (SELECT event_type,
    ((q1 * q1 + q1 + 12345) % 1048573) * 1048576 +
      (q2 * q2 + q2 + 98765) % 1048573 AS h
  FROM (SELECT event_type,
      ((user_id + 1) * 2654435761) % 1048573 AS q1,
      ((user_id + 1) * 2246822519) % 1048573 AS q2 FROM d)),
c AS (SELECT event_type, h % 64 AS bucket, h // 64 AS w FROM b),
r AS (SELECT event_type, bucket,
    CAST(max($hllRhoSql) AS BIGINT) AS r_max
  FROM c GROUP BY event_type, bucket),
e AS (SELECT event_type, count(*) AS n_present,
    CAST(sum(1099511627776 // (1 << CAST(r_max AS INT))) AS BIGINT)
      AS inv_present
  FROM r GROUP BY event_type),
s AS (SELECT event_type,
    inv_present + (64 - n_present) * 1099511627776 AS inv_sum
  FROM e),
est AS (SELECT event_type,
    CAST(${HllAlphaFp * 4096L * 1048576L} // inv_sum AS BIGINT)
      AS est_users
  FROM s),
x AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
  FROM d GROUP BY event_type)
SELECT r.event_type, r.bucket, r.r_max, est.est_users, x.exact_users
FROM r JOIN est USING (event_type) JOIN x USING (event_type)
ORDER BY r.event_type, r.bucket""",
    // same (cents, orderkey, linenumber) order and 2·cum ≥ W election
    "agg_weighted_median" ->
      """WITH l AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, cents, qty,
        |    sum(qty) OVER (PARTITION BY l_returnflag
        |      ORDER BY cents, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |    sum(qty) OVER (PARTITION BY l_returnflag) AS w_total
        |  FROM l)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(max(w_total) AS BIGINT) AS w_total,
        |  CAST(min(CASE WHEN cum_w * 2 >= w_total THEN cents END)
        |    AS BIGINT) AS wmedian_cents
        |FROM c GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_filtered_conditional" ->
      """WITH e AS (SELECT event_type, user_id,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT event_type, count(*) AS n,
        |  count(*) FILTER (WHERE v > 75) AS n_big,
        |  CAST(coalesce(sum(v) FILTER (WHERE v > 75), 0) AS DOUBLE) AS sum_big,
        |  count(DISTINCT user_id) FILTER (WHERE v > 75) AS users_big
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_string_concat" ->
      """SELECT r.r_name, count(*) AS n_nations,
        |  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    "agg_percentile_disc" ->
      """SELECT event_type,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n_events
        |  FROM events GROUP BY user_id, event_type),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY n_events DESC, event_type) AS rn FROM c)
        |SELECT user_id, event_type AS mode_event, n_events
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "agg_stats_moments" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,4))) AS s,
        |    sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS q
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, CAST(s AS DOUBLE) AS sum_v,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_v,
        |  CASE WHEN n > 1 THEN round(greatest(0.0,
        |    (CAST(n AS DOUBLE) * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) ELSE -1.0 END AS var_samp,
        |  CASE WHEN n > 1 THEN round(sqrt(greatest(0.0,
        |    (CAST(n AS DOUBLE) * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 6) ELSE -1.0 END AS std_samp
        |FROM a ORDER BY event_type""".stripMargin,
    "agg_corr_covar" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,4))) AS sx,
        |    sum(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(18,0))) AS sy,
        |    sum(CAST(value AS DECIMAL(18,4)) * CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(18,0))) AS sxy,
        |    sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS sxx,
        |    sum(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(18,0)) * CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(18,0))) AS syy
        |  FROM events GROUP BY event_type),
        |b AS (SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |  FROM a)
        |SELECT event_type, n,
        |  CASE WHEN n > 1 THEN round(covnum / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
        |       ELSE -1.0 END AS cov_samp,
        |  CASE WHEN n > 1 AND varx > 0 AND vary > 0
        |       THEN round(covnum / (sqrt(varx) * sqrt(vary)), 6)
        |       ELSE -1.0 END AS corr
        |FROM b ORDER BY event_type""".stripMargin,
    "agg_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sql_correlated_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin,
    "agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // agg_approx_distinct: ✖ HLL implementations differ between engines
    "agg_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS r_name, coalesce(n_name, '(all)') AS n_name,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(c_mktsegment, '(all)') AS c_mktsegment,
        |  coalesce(o_orderpriority, '(all)') AS o_orderpriority,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, '(all)') AS c_mktsegment,
        |  coalesce(o_orderpriority, '(all)') AS o_orderpriority,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())
        |ORDER BY 1, 2""".stripMargin,
    "agg_wordcount" ->
      """SELECT w, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w <> '' GROUP BY w ORDER BY w""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
