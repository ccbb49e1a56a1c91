package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Time-dimension operators over the `events` stream table (SURVEY.md
  * §2.14): bar aggregation, slowly-changing-dimension history, and
  * recency-weighted aggregation — the batch shapes a warehouse runs on
  * an append-only event log.
  *
  * All timestamps travel as BIGINT microseconds (`Tables.nsToUs` ⟷
  * DuckDB `epoch_us`) and money-ish values as DECIMAL(18,4), per the
  * determinism rules that keep the oracle hash green.
  */
object Timeseries {

  /** OHLC bars: 6-hour open/high/low/close/volume candles per event
    * type. Open/close are picked by lexicographic min/max over the
    * (t, event_id, v) struct — a single HashAggregate with map-side
    * combine, no window sort; (t, event_id) is unique so the pick is
    * deterministic and equals the row_number()=1 formulation the
    * oracle uses. Shuffle volume is O(bars), not O(events) — the shape
    * that survives a 100 TB event log (a windowed first_value would
    * sort every partition instead). */
  def timeseriesOhlcBars(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("t"), $"event_id",
        Tables.dec4($"value").as("v"))
      .withColumn("bar", expr("t div 21600000000"))
      .groupBy($"event_type", $"bar")
      .agg(
        min(struct($"t", $"event_id", $"v")).getField("v")
          .cast("double").as("open"),
        max($"v").cast("double").as("high"),
        min($"v").cast("double").as("low"),
        max(struct($"t", $"event_id", $"v")).getField("v")
          .cast("double").as("close"),
        sum($"v").cast("double").as("volume"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type", $"bar")
  }

  /** Type-2 slowly-changing-dimension build: each user's event stream
    * becomes versioned validity intervals — valid_from = event time,
    * valid_to = the next event's time (−1 sentinel + is_current flag on
    * the open-ended row; nullable BIGINT sort keys are banned). One
    * window over the user_id shuffle serves row_number and lead —
    * per-user state is bounded, so partitions stay balanced at any
    * event-log size. (user_id, version) is the unique output key. */
  def scd2UserValueHistory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"value".as("v"))
      .select($"user_id", $"event_id",
        row_number().over(w).as("version"),
        $"t".as("valid_from"),
        coalesce(lead($"t", 1).over(w), lit(-1L)).as("valid_to"),
        when(lead($"t", 1).over(w).isNull, 1).otherwise(0).as("is_current"),
        $"v")
      .orderBy($"user_id", $"version")
  }

  /** Linear time-decay weighted aggregate: per event type, value mass
    * weighted by recency — weight = max(0, 30 − age_days), all-integer
    * (exponential decay needs exp(), banned for oracle parity; a
    * 30-day linear ramp is the transcendental-free equivalent).
    * Reference "now" is the corpus max timestamp via a scalar
    * subquery: Catalyst executes it as its own max-aggregation job and
    * folds the result into the main scan's predicate-free projection —
    * two scans total, no per-row recompute, the same cost profile a
    * parameterized `now` would have at 100 TB. Weighted sums stay in
    * exact decimal (weight BIGINT × DECIMAL(18,4)) so partial-merge
    * order can't move the hash. */
  def aggTimeDecayWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .createOrReplaceTempView("ev_decay")
    // inline scalar subquery, NOT a FROM-clause cross join with the
    // 1-row aggregate: the latter plans BroadcastNestedLoopJoin (the
    // corpusMixRebalance trap, caught by PlanRegressionSpec); the
    // subquery runs as its own job and folds in as a literal
    spark.sql(
      """SELECT event_type,
        |  CAST(sum(greatest(0, 30 -
        |    (((SELECT max(t) FROM ev_decay) - t) div 86400000000)) * v)
        |    AS DOUBLE) AS wsum,
        |  CAST(sum(greatest(0, 30 -
        |    (((SELECT max(t) FROM ev_decay) - t) div 86400000000)))
        |    AS BIGINT) AS wtotal,
        |  count(*) AS n
        |FROM ev_decay
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Daily resample + forward fill — the gap-filling shape every
    * timeseries store exposes (`asfreq`/`ffill`, `GAPFILL`,
    * `time_bucket_gapfill`): each user's sparse event log becomes one
    * row per calendar day over the log's global span, carrying the
    * day's closing value where observed and the last prior close
    * otherwise (−1 sentinel before a user's first observation —
    * nullable outputs are banned). Three pieces, all
    * partition-parallel:
    * (1) daily close per (user, day) as ONE aggregate via the OHLC
    * struct-max trick — no window sort over raw events;
    * (2) the dense grid as explode(sequence(min_day, max_day)) against
    * the distinct-user frame, span scalars as inline subqueries (the
    * agg_time_decay_weighted precedent — a FROM-clause 1-row cross
    * join would plan BroadcastNestedLoopJoin);
    * (3) the fill itself as last_value IGNORE NULLS over an
    * unbounded-preceding ROWS frame partitioned by user — O(days) rows
    * per partition no matter how many raw events, so the window state
    * stays bounded at 100 TB. */
  def timeseriesResampleFfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"), $"event_id",
        Tables.dec4($"value").as("v"))
      .withColumn("day", expr("t div 86400000000"))
      .createOrReplaceTempView("ev_resample")
    spark.sql(
      """WITH daily AS (
        |  SELECT user_id, day, max(struct(t, event_id, v)).v AS close
        |  FROM ev_resample GROUP BY user_id, day),
        |grid AS (
        |  SELECT user_id,
        |    explode(sequence((SELECT min(day) FROM ev_resample),
        |                     (SELECT max(day) FROM ev_resample))) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev_resample)),
        |filled AS (
        |  SELECT g.user_id, g.day, d.close,
        |    last_value(d.close, true) OVER (PARTITION BY g.user_id
        |      ORDER BY g.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day,
        |  CAST(coalesce(fv, -1) AS DOUBLE) AS value_ffill,
        |  CAST(CASE WHEN close IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_observed
        |FROM filled
        |ORDER BY user_id, day""".stripMargin)
  }

  /** Point-in-time (as-of) dimension lookup against the SCD2 history —
    * the query the history exists FOR: "what was each user's value
    * version at these snapshot instants?" (weekly boundaries across
    * the fixture's span). The warehouse-textbook plan is a range join
    * probe BETWEEN valid_from AND valid_to; at scale that's a
    * pair-explosion risk, so this composes it as the as-of union
    * trick instead: version rows and probe rows merge into one
    * per-user stream, a single forward-fill window carries the
    * latest version into each probe — one shuffle, O(1) window state,
    * no join at all (the join_asof_nearest discipline applied to SCD2).
    * The oracle keeps the textbook range-join formulation, so the two
    * plans' agreement is itself evidence the rewrite is semantics-
    * preserving. A probe at exactly a version's valid_from takes that
    * version (kind ordering: version rows sort before probes at the
    * same µs). */
  /** BITEMPORAL as-of — the valid-time × transaction-time distinction
    * (SQL:2011 system/application time; Snodgrass) the plain SCD2 keys
    * can't express: facts carry WHEN they were true (valid time = the
    * event timestamp's ingest quartile) and, separately, WHEN the
    * warehouse LEARNED them (transaction time — rows with
    * `event_id % 16 = 7` arrive one batch LATE, the standing
    * late-arrival shard). The graded frame answers "as KNOWN at
    * transaction batch T, what was each user's state for facts VALID
    * in or before batch 1?" for every T — at T = 1 the late shard's
    * batch-1 facts are valid but NOT YET KNOWN, and the frame's
    * divergence between T = 1 and T = 2 IS the bitemporal correction
    * a retroactive report needs (and what an audit replays).
    *
    * Scale shape: tx batch is a pure per-row projection (valid
    * quartile + lateness flag, capped); the whole key is one
    * (tx_t × user) conditional aggregate — map-side-combinable, no
    * windows, no history explosion. */
  def scd2BitemporalAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b1 = 19731L * 86400000000L
    val b2 = 19739L * 86400000000L
    val b3 = 19747L * 86400000000L
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        // null-measure facts are still KNOWN facts: they count, sum 0
        coalesce((Tables.dec4($"value") * 10000).cast("long"), lit(0L))
          .as("v_fp"))
      .withColumn("valid_b", when($"t" < b1, 0L).when($"t" < b2, 1L)
        .when($"t" < b3, 2L).otherwise(3L))
      .withColumn("tx_b", least($"valid_b" +
        when($"event_id" % 16 === 7, 1L).otherwise(0L), lit(3L)))
    val txs = Seq(0L, 1L, 2L, 3L)
    txs.map { txT =>
      e.filter($"tx_b" <= txT && $"valid_b" <= 1L)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_known"),
          sum($"v_fp").as("v_sum_fp"),
          max($"t").as("last_valid_us"))
        .select(lit(txT).as("tx_t"), $"user_id", $"n_known",
          $"v_sum_fp", $"last_valid_us")
    }.reduce(_ unionAll _)
      .orderBy($"tx_t", $"user_id")
  }

  def scd2AsofLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 2024-01-08 / 01-15 / 01-22 / 01-29 00:00 UTC, epoch µs
    val probes = Seq(1704672000000000L, 1705276800000000L,
      1705881600000000L, 1706486400000000L)
    val wv = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val ver = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"user_id", $"t", $"event_id", lit(0).as("kind"),
        struct(row_number().over(wv).as("version"), $"v").as("vs"))
    val grid = ver.select($"user_id").distinct()
      .select($"user_id", explode(array(probes.map(lit(_)): _*)).as("t"),
        lit(Long.MaxValue).as("event_id"), lit(1).as("kind"),
        lit(null).cast(ver.schema("vs").dataType).as("vs"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"t", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ver.unionByName(grid)
      .withColumn("cur", last($"vs", ignoreNulls = true).over(w))
      .filter($"kind" === 1 && $"cur".isNotNull)
      .select($"user_id", $"t".as("probe_us"),
        $"cur.version".cast("long").as("version"),
        $"cur.v".cast("double").as("v"))
      .orderBy($"user_id", $"probe_us")
  }

  /** Change-only SCD2 compression — the textbook type-2 build:
    * scd2_user_value_history versions EVERY event, but a correct
    * dimension history opens a new version only when the tracked
    * value actually changes (consecutive repeats collapse into one
    * validity range). The compression is a lag-filter: keep a row iff
    * it is the user's first or its value differs from the previous
    * row's — then the standard version/valid_from/valid_to window
    * build runs on the compressed stream. Per-user census output
    * (versions kept vs events compressed away) plus range bounds of
    * the current version, so the key grades both the filter and the
    * rebuilt ranges.
    *
    * Scale shape: both windows share one (user_id, time) sort — Spark
    * reuses the exchange+sort; the compare is DECIMAL(18,4)-exact so
    * "changed" is identical cross-engine. */
  def scd2ChangeCompression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .withColumn("prev", lag($"v", 1).over(w))
      .withColumn("keep", $"prev".isNull || $"v" =!= $"prev")
    val kept = e.filter($"keep")
      .withColumn("version", row_number().over(w))
    kept.groupBy($"user_id")
      .agg(
        // cast to long: every counter column in the contract is BIGINT
        // (row_number's int would otherwise leak through max)
        max($"version").cast("long").as("n_versions"),
        min($"t").as("first_from_us"),
        max($"t").as("current_from_us"),
        max(struct($"t", $"event_id", $"v")).as("cur"))
      .join(e.groupBy($"user_id").agg(count(lit(1)).as("n_events")), "user_id")
      .select($"user_id", $"n_events", $"n_versions",
        ($"n_events" - $"n_versions").as("n_compressed"),
        $"first_from_us", $"current_from_us",
        $"cur.v".cast("double").as("current_value"))
      .orderBy($"user_id")
  }

  /** Interval-union coverage — per customer, merge the overlapping
    * order intervals [orderdate, last shipdate] into maximal islands
    * and report how much of the customer's active span is actually
    * covered (n_islands, covered_us, gaps_us). The complement of
    * window_interval_overlap's peak-concurrency sweep: that key asks
    * "how deep do intervals stack", this one "how much time do they
    * blanket" — the uptime / SLA-coverage shape.
    *
    * Plan: the classic merged-intervals rewrite — sort intervals by
    * start within the customer, an island STARTS where the start
    * strictly exceeds the running max of all previous ends (touching
    * intervals merge: coverage has no gap at s == prev_end), island id
    * = running sum of start flags, then one aggregate per island and
    * one per customer. Two window passes + two aggregates over a
    * single (o_custkey) partitioning — Spark reuses the exchange+sort;
    * O(n log n) in the per-key sort, NEVER the O(n²) overlap
    * self-join. All-integer µs endpoints (unix_micros ⟷ epoch_us),
    * ill-formed fixture intervals clamped to end ≥ start exactly as
    * windowIntervalOverlap does. */
  def timeseriesIntervalUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).groupBy($"l_orderkey")
        .agg(max(unix_micros($"l_shipdate".cast("timestamp"))).as("e0")),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("s"),
        greatest($"e0", unix_micros($"o_orderdate".cast("timestamp"))).as("e"))
    val w = Window.partitionBy($"o_custkey").orderBy($"s", $"e", $"o_orderkey")
    val prevMaxE = max($"e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = iv
      .withColumn("new_island",
        when(prevMaxE.isNull || $"s" > prevMaxE, 1L).otherwise(0L))
      .withColumn("island", sum($"new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"o_custkey", $"island")
      .agg(min($"s").as("is"), max($"e").as("ie"))
    islands.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_islands"),
        sum($"ie" - $"is").as("covered_us"),
        min($"is").as("first_us"), max($"ie").as("last_us"))
      .select($"o_custkey".as("c_custkey"), $"n_islands", $"covered_us",
        ($"last_us" - $"first_us" - $"covered_us").as("gaps_us"))
      .orderBy($"c_custkey")
  }

  /** Maximum drawdown per user — the largest peak-to-trough drop of the
    * user's value series in event-time order: running peak via a
    * prefix-max window, drawdown = peak − value, then one aggregate
    * electing max drawdown with the EARLIEST witnessing event as the
    * deterministic tie-break (max over the (dd, −event_id) struct — no
    * second window pass, no self-join). The robustness/financial
    * counterpart of the rolling keys: "how far below its best has this
    * series fallen", the SLA/regression metric a monitoring pipeline
    * tracks per entity.
    *
    * All arithmetic in BIGINT fixed point (value·10⁴): differences and
    * comparisons are exact, so the hash-match is deterministic by
    * construction. Scale shape: one user_id shuffle shared by the
    * window and the aggregate (same partitioning), per-row window
    * state is a single running max. */
  def timeseriesMaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      // NULL values would emit a NULL max_dd_fp here while the oracle's
      // dd = max_dd_fp join drops the user — filter on both sides (the
      // window_rolling_median guard, commit fa40eb1)
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("dd", max($"v_fp").over(w) - $"v_fp")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max($"dd").as("max_dd_fp"),
        (-max(struct($"dd", (-$"event_id").as("neg_id"))).getField("neg_id"))
          .as("at_event_id"))
      .orderBy($"user_id")
  }

  /** Fixed-point EWMA smoothing per user — the recency-weighted state a
    * monitoring/feature pipeline keeps per entity, with α = 1/4 so every
    * step is exact integer arithmetic: s₀ = v₀, sᵢ = (vᵢ + 3·sᵢ₋₁) div 4
    * over BIGINT value·10⁴ fixed point (exponential smoothing without
    * exp/pow, which are banned for oracle parity; values are
    * non-negative so truncating `div` and the oracle's floor `//`
    * agree). The recurrence is inherently sequential per user, so it
    * runs as a SECONDARY-SORT streaming fold ([[sortedUserSeries]]):
    * one user_id shuffle, a partition-local sort, then a one-pass
    * group-wise fold holding O(1) recurrence state per entity — an
    * adversarial hot key streams instead of materializing its whole
    * history in one aggregation buffer (the round-11
    * sort_array+aggregate form's accepted weakness, now closed). The
    * oracle replays the fold as a per-rank recursive CTE. */
  def timeseriesEwmaFixed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sortedUserSeries(spark, dir).mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Long, Long, Long)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long, Long) = {
          val u = buf.head._1
          var n = 0L; var s = 0L; var last = 0L; var first = true
          while (buf.hasNext && buf.head._1 == u) {
            val r = buf.next(); n += 1
            if (first) { s = r._4; first = false }
            else s = (r._4 + 3 * s) / 4 // JVM /: truncates like SQL div
            last = r._4
          }
          (u, n, s, last)
        }
      }
    }.toDF("user_id", "n_events", "ewma_fp", "last_v_fp")
      .orderBy($"user_id")
  }

  /** Sorted per-entity event series shared by the three sequential-
    * recurrence keys (EWMA / Holt / CUSUM): repartition on user_id +
    * partition-local sort on (user_id, t, event_id) makes each user's
    * rows CONTIGUOUS AND ORDERED inside its partition — the classic
    * secondary-sort shape — so the downstream mapPartitions fold keeps
    * only the recurrence registers per entity, never the entity's
    * history. NULL values are filtered on both engines (they would
    * poison the fold Spark-side only — the window_rolling_median
    * guard). */
  private def sortedUserSeries(spark: SparkSession, dir: String)
      : Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", Tables.nsToUs($"ts").as("t"), $"event_id",
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"t", $"event_id")
      .as[(Long, Long, Long, Long)]
  }

  /** THEIL–SEN robust trend per event type — the median-of-pairwise-
    * slopes estimator (Theil 1950; Sen 1968) that survives the outlier
    * days an OLS slope (ml_linreg_sufficient's shape) gets dragged by.
    * The series is the per-(type, day) 4-dp value total; every day
    * pair (i < j) contributes slope_fp = ⌊2²⁰·(yⱼ−yᵢ)/(dⱼ−dᵢ)⌋
    * (negative-safe: div ⟷ // both truncate toward zero, the
    * holt-linear precedent), and the estimate is the LOWER MEDIAN
    * element under the total order (slope_fp, d1, d2) — fully
    * deterministic even among equal slopes.
    *
    * Scale shape: the raw log collapses map-side to |types|·|days|
    * rows; the pair grid is a self-theta-join of that TINY day frame
    * (≈ types·days²/2 rows — days are calendar-bounded, so this never
    * tracks data volume), and the median election is one window over
    * it. The raw table never self-joins. */
  def timeseriesTheilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut (r19): both sides of the pair self-join read this frame and
    // one side broadcasts — without materialization the events scan +
    // daily collapse ran once per side (and raced under load)
    val daily = graft.PlanOnly.cut(Tables.events(spark, dir)
      // an all-NULL (type, day) cell would yield y = NULL and desync the
      // median election (Spark NULLS FIRST vs DuckDB NULLS LAST) — filter
      // NULL values before the aggregate, mirrored in the oracle
      .filter($"value".isNotNull)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .withColumn("day", expr("t div 86400000000"))
      .groupBy($"event_type", $"day")
      .agg((sum($"v") * 10000).cast("long").as("y")))
    val a = daily.select($"event_type", $"day".as("d1"), $"y".as("y1"))
    val b = daily.select($"event_type".as("et2"), $"day".as("d2"), $"y".as("y2"))
    val slopes = a.join(b, $"event_type" === $"et2" && $"d1" < $"d2")
      .select($"event_type", $"d1", $"d2",
        expr("((y2 - y1) * 1048576) div (d2 - d1)").as("slope_fp"))
    val wMed = Window.partitionBy($"event_type")
      .orderBy($"slope_fp", $"d1", $"d2")
    val wCnt = Window.partitionBy($"event_type")
    slopes
      .withColumn("rn", row_number().over(wMed))
      .withColumn("n_pairs", count(lit(1)).over(wCnt))
      .filter($"rn" === expr("(n_pairs + 1) div 2"))
      .select($"event_type", $"n_pairs", $"slope_fp".as("theil_sen_fp"))
      .orderBy($"event_type")
  }

  /** Holt's linear (double-exponential) smoothing per user — the
    * level+trend extension of [[timeseriesEwmaFixed]], α = β = 1/4 in
    * the same BIGINT value·10⁴ fixed point: lᵢ = ⌊(vᵢ + 3(lᵢ₋₁ +
    * bᵢ₋₁))/4⌋, bᵢ = ⌊((lᵢ − lᵢ₋₁) + 3bᵢ₋₁)/4⌋, forecast = l + b.
    * The TREND can be negative — measured before relying on it: both
    * Spark's `div` AND DuckDB's `//` truncate toward zero on negative
    * operands (-5 div 4 = -5 // 4 = -1, and the JVM's `/` likewise), so
    * plain integer division is cross-engine exact on both signs. Same
    * secondary-sort streaming fold as the EWMA (state = the (l, b)
    * registers per entity); oracled by the same per-rank recursive CTE
    * carrying (l, b). */
  def timeseriesHoltLinear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sortedUserSeries(spark, dir).mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Long, Long, Long, Long)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long, Long, Long) = {
          val u = buf.head._1
          var n = 0L; var l = 0L; var b = 0L; var first = true
          while (buf.hasNext && buf.head._1 == u) {
            val r = buf.next(); n += 1
            if (first) { l = r._4; b = 0L; first = false }
            else {
              val lNew = (r._4 + 3L * (l + b)) / 4
              b = (lNew - l + 3L * b) / 4
              l = lNew
            }
          }
          (u, n, l, b, l + b)
        }
      }
    }.toDF("user_id", "n_events", "level_fp", "trend_fp", "forecast_fp")
      .orderBy($"user_id")
  }

  /** L1 MOTIF DISCOVERY per event type (the matrix-profile shape —
    * Yeh/Keogh — at day grain, with the exact L1 metric instead of the
    * sqrt-normalized z-distance): over the dense per-(type, day) 4-dp
    * total series, every length-7 window finds its nearest
    * NON-OVERLAPPING twin (|Δstart| ≥ 7 — the trivial-match exclusion
    * zone) by exact integer L1 distance, earliest-twin tie-break. The
    * emitted (window, twin, distance) profile is what anomaly hunting
    * reads: a window whose nearest twin is FAR is a discord, a pair at
    * distance near zero a motif.
    *
    * Scale shape: the raw log collapses map-side to the calendar-
    * bounded dense grid (the resample idiom); windows are a 7-way
    * explode of that tiny frame, the pair grid joins on (type, offset)
    * with the exclusion predicate — ≈ types·windows²·7 rows where
    * |windows| is calendar-bounded, never data-bounded. */
  def timeseriesMotifL1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .withColumn("day", expr("t div 86400000000"))
      .createOrReplaceTempView("ev_motif")
    spark.sql(
      """WITH daily AS (SELECT event_type, day,
        |    CAST(sum(v) * 10000 AS BIGINT) AS y
        |  FROM ev_motif GROUP BY 1, 2),
        |grid AS (SELECT event_type,
        |    explode(sequence((SELECT min(day) FROM ev_motif),
        |                     (SELECT max(day) FROM ev_motif))) AS day
        |  FROM (SELECT DISTINCT event_type FROM ev_motif)),
        |dense AS (SELECT g.event_type, g.day, coalesce(d.y, 0L) AS y
        |  FROM grid g LEFT JOIN daily d
        |    ON g.event_type = d.event_type AND g.day = d.day),
        |win AS (SELECT event_type, day - i AS d, i, y
        |  FROM (SELECT event_type, day, y, explode(sequence(0, 6)) AS i
        |        FROM dense)),
        |w2 AS (SELECT * FROM win
        |  WHERE d >= (SELECT min(day) FROM ev_motif)
        |    AND d <= (SELECT max(day) FROM ev_motif) - 6),
        |pairs AS (SELECT a.event_type, a.d AS d1, b.d AS d2,
        |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS dist
        |  FROM w2 a JOIN w2 b
        |    ON a.event_type = b.event_type AND a.i = b.i
        |    AND abs(b.d - a.d) >= 7
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT event_type, d1, d2, dist,
        |    row_number() OVER (PARTITION BY event_type, d1
        |      ORDER BY dist, d2) AS rn
        |  FROM pairs)
        |SELECT event_type, CAST(d1 AS BIGINT) AS window_start,
        |  CAST(d2 AS BIGINT) AS motif_match, dist AS l1_dist
        |FROM m WHERE rn = 1
        |ORDER BY event_type, window_start""".stripMargin)
  }

  /** Fixed-gain ALPHA–BETA tracking filter per user (the steady-state
    * Kalman filter every embedded tracker ships; Benedict–Bordner) —
    * position+velocity state over the index-stepped value series with
    * the binary-shift gains α = 1/4, β = 1/16: pred = x + vel,
    * r = vᵢ − pred, x ← pred + ⌊r/4⌋, vel ← vel + ⌊r/16⌋. The residual
    * r is SIGNED — safe because Spark `div`, DuckDB `//` and the JVM's
    * `/` all truncate toward zero (the holt-linear measurement). Emits
    * the final (x, vel) registers and the one-step-ahead forecast.
    *
    * Same secondary-sort streaming fold as [[timeseriesEwmaFixed]]
    * (state = two 8-byte registers per entity, one user_id shuffle);
    * oracled by the same per-rank recursive CTE carrying (x, vel). */
  def timeseriesKalmanAlphaBeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sortedUserSeries(spark, dir).mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Long, Long, Long, Long)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long, Long, Long) = {
          val u = buf.head._1
          var n = 0L; var x = 0L; var vel = 0L; var first = true
          while (buf.hasNext && buf.head._1 == u) {
            val r = buf.next(); n += 1
            if (first) { x = r._4; vel = 0L; first = false }
            else {
              val pred = x + vel
              val res = r._4 - pred
              x = pred + res / 4
              vel = vel + res / 16
            }
          }
          (u, n, x, vel, x + vel)
        }
      }
    }.toDF("user_id", "n_events", "x_fp", "vel_fp", "forecast_fp")
      .orderBy($"user_id")
  }

  /** One-sided CUSUM drift detection per user — the change-point monitor
    * (Page 1954) a pipeline-health dashboard keeps per entity: against a
    * per-user reference level μ = v₀ (the first observed value) and slack
    * K = 0.5, the statistic s₀ = 0, sᵢ = max(0, sᵢ₋₁ + (vᵢ − μ − K))
    * accumulates sustained upward drift and resets on evidence against
    * it. All arithmetic is BIGINT value·10⁴ fixed point (no division at
    * all), so the fold is cross-engine exact. Emits per user the final
    * statistic, its running max, and how many updates landed above the
    * alarm bar H = 20.0 — the "pages since last healthy" triple.
    *
    * Same secondary-sort streaming fold as [[timeseriesEwmaFixed]]:
    * one user_id shuffle, a partition-local sort, and a one-pass
    * group-wise fold holding only the (μ, s, mx, na) registers per
    * entity. Oracle replays the fold as a per-rank recursive CTE
    * carrying the same state. */
  def timeseriesCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sortedUserSeries(spark, dir).mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Long, Long, Long, Long)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long, Long, Long) = {
          val u = buf.head._1
          var n = 0L; var mu = 0L; var s = 0L; var mx = 0L; var na = 0L
          var first = true
          while (buf.hasNext && buf.head._1 == u) {
            val r = buf.next(); n += 1
            if (first) { mu = r._4; first = false }
            else {
              s = math.max(0L, s + (r._4 - mu - 5000L))
              mx = math.max(mx, s)
              if (s > 200000L) na += 1
            }
          }
          (u, n, s, mx, na)
        }
      }
    }.toDF("user_id", "n_events", "cusum_fp", "max_cusum_fp", "n_alarms")
      .orderBy($"user_id")
  }

  /** Triangle-area downsampling per user — the LTTB-family (Steinarsson
    * 2013) visualization reducer: each user's series is cut into 4
    * equal-count rank buckets (4, not 60: the fixture averages ~7
    * events per user, and every bucket must be non-empty for the
    * neighbor anchors to exist — a dashboard over a longer series
    * raises B without touching the plan); the first and last points are always
    * kept, and every interior bucket keeps its visually-dominant point
    * — the one maximizing the doubled triangle area against two FIXED
    * anchors (last raw point of the previous bucket, first raw point of
    * the next). Anchoring on raw neighbors instead of the previously
    * SELECTED point is the parallel-exact variant: the election loses
    * the sequential dependency, so every bucket elects independently —
    * and stays bit-exact, because the area is the integer cross product
    * |Δt·Δv − Δt'·Δv'| over (seconds, value·10⁴) with all deltas
    * bounded well inside BIGINT.
    *
    * Scale shape: ONE user_id shuffle serves the rank windows, the
    * bucket-boundary elections (≤10 rows per user, joined back on the
    * same key), and the per-bucket argmax; no cross-bucket dependency
    * at any point. */
  def timeseriesDownsampleTriangle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = 4
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    // cut, not mark (r19, X6): lastOf/firstOf are per-(user, bucket)
    // frames that BROADCAST into the interior join while the probe
    // reads the same ranked frame — racing futures re-run the event
    // scan + rank window per consumer
    val ranked = graft.PlanOnly.cut(Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v"))
      .withColumn("ts", expr("t div 1000000"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy($"user_id")))
      .withColumn("bkt", expr(s"((rn - 1) * $B) div n")))
    val lastOf = ranked.groupBy($"user_id", $"bkt")
      .agg(max(struct($"rn", $"ts", $"v")).as("p"))
      .select($"user_id", ($"bkt" + 1).as("bkt"),
        $"p.ts".as("ta"), $"p.v".as("va"))
    val firstOf = ranked.groupBy($"user_id", $"bkt")
      .agg(min(struct($"rn", $"ts", $"v")).as("p"))
      .select($"user_id", ($"bkt" - 1).as("bkt"),
        $"p.ts".as("tn"), $"p.v".as("vn"))
    val interior = ranked
      .join(lastOf, Seq("user_id", "bkt"))
      .join(firstOf, Seq("user_id", "bkt"))
      .select($"user_id", $"bkt", $"event_id", $"ts", $"v",
        abs(($"ts" - $"ta") * ($"vn" - $"va") -
          ($"tn" - $"ta") * ($"v" - $"va")).as("area2"))
      .groupBy($"user_id", $"bkt")
      .agg(max(struct($"area2", (-$"ts").as("nt"), (-$"event_id").as("ne"),
        $"v")).as("e"))
      .select($"user_id", $"bkt", (-$"e.ne").as("sel_event_id"),
        (-$"e.nt").as("sel_ts"), $"e.v".as("sel_v_fp"),
        $"e.area2".as("area2"))
    val edges = ranked
      .filter($"rn" === 1 || $"rn" === $"n")
      .select($"user_id",
        when($"rn" === 1, lit(0L)).otherwise(lit(B - 1).cast("long"))
          .as("bkt"),
        $"event_id".as("sel_event_id"), $"ts".as("sel_ts"),
        $"v".as("sel_v_fp"), lit(-1L).as("area2"))
      .distinct() // a single-event user is rank 1 AND n: one row, kept once per bkt
    interior.filter($"bkt" =!= 0 && $"bkt" =!= (B - 1))
      .unionByName(edges)
      .orderBy($"user_id", $"bkt", $"sel_event_id")
  }

  /** Bollinger-band sufficient statistics per event — the trailing
    * volatility envelope a monitoring dashboard draws: over each
    * user's last-10-observations window (ROWS frame, so the window is
    * exact and bounded), n, Σv, and the n·σ numerator
    * ⌊sqrt(n·Σv² − (Σv)²)⌋ — the sample-free-scaled band half-width in
    * value·10⁴ fixed point. The sqrt argument is an exact BIGINT
    * < 2⁵³ (10-row window bounds it), so the ⌊sqrt⌋ is cross-engine
    * identical (the sample_stratified_neyman argument). Mid-band and
    * ±k·σ bands are one integer division away for the caller; emitting
    * the sufficient statistics keeps every row exact.
    *
    * Scale shape: one user_id shuffle, one window sort, three framed
    * aggregates over a 10-row ROWS frame — O(1) state per row. */
  def timeseriesBollingerStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(-9, 0)
    Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s1", sum($"v_fp").over(w))
      .withColumn("s2", sum($"v_fp" * $"v_fp").over(w))
      .select($"event_id", $"user_id", $"t", $"v_fp", $"n_win", $"s1",
        floor(sqrt(($"n_win" * $"s2" - $"s1" * $"s1").cast("double")))
          .cast("long").as("sd_num"))
      .orderBy($"event_id")
  }

  /** Lag-1 autocorrelation sufficient statistics per user — "is this
    * series momentum or noise", reduced to the exact integers a
    * monitoring pipeline can aggregate in one pass: over the (vᵢ₋₁, vᵢ)
    * adjacent pairs of each user's value sequence (value·10⁴ fixed
    * point), emit n and the five sums (Σx, Σy, Σxy, Σx², Σy²) plus the
    * Pearson numerator n·Σxy − Σx·Σy and both denominator factors
    * n·Σx² − (Σx)², n·Σy² − (Σy)². The final r = num/√(denx·deny) is
    * deliberately left to the caller — the ml_linreg_sufficient
    * posture: sufficient statistics are exact, an IEEE quotient is not
    * guaranteed identical cross-engine.
    *
    * Scale shape: one user_id shuffle — the lag window pairs adjacent
    * events in place, then the sums partial-aggregate map-side; users
    * with a single event carry no pairs and drop out (both engines
    * agree by construction). */
  def timeseriesAutocorrStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", Tables.nsToUs($"ts").as("t"), $"event_id",
        (Tables.dec4($"value") * 10000).cast("long").as("y"))
      .withColumn("x", lag($"y", 1).over(w))
      .filter($"x".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"user_id", $"n_pairs", $"sx", $"sy", $"sxy",
        ($"n_pairs" * $"sxy" - $"sx" * $"sy").as("num_fp"),
        ($"n_pairs" * $"sxx" - $"sx" * $"sx").as("den_x"),
        ($"n_pairs" * $"syy" - $"sy" * $"sy").as("den_y"))
      .orderBy($"user_id")
  }

  /** Seasonal-naive forecast backtest per user — the baseline every
    * forecasting system must beat, and the eval loop that prices it:
    * each user's end-of-day value is "forecast" by their value 7 days
    * earlier (the weekly-seasonality naive), and the backtest reports
    * forecast count, summed absolute error, and MAE — all in BIGINT
    * value·10⁴ fixed point (|v−f| and the one truncating div are
    * cross-engine exact). End-of-day value = argmax (t, event_id) via
    * the max-struct election.
    *
    * Scale shape: ONE hash partitioning on (user_id, day) serves both
    * the daily collapse and the self equi-join on day−7 (the join is
    * key-shifted but same-width); the per-user error aggregate
    * partial-aggregates map-side. The daily frame is persisted across
    * its two join sides. */
  def timeseriesForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut, not mark (r19, X6): the day−7 self-join reads this frame on
    // both sides and one side BROADCASTS at fixture scale — the racing
    // future re-runs the event scan + daily collapse
    val daily = graft.PlanOnly.cut(Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("day", expr("t div 86400000000"))
      .groupBy($"user_id", $"day")
      .agg(max(struct($"t", $"event_id", $"v_fp")).getField("v_fp")
        .as("v_fp")))
    val prev = daily.select($"user_id", ($"day" + 7).as("day"),
      $"v_fp".as("f_fp"))
    daily.join(prev, Seq("user_id", "day"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_forecasts"),
        sum(abs($"v_fp" - $"f_fp")).as("sae_fp"))
      .withColumn("mae_fp", expr("sae_fp div n_forecasts"))
      .orderBy($"user_id")
  }

  /** CDC apply into an SCD2 dimension — the warehouse MERGE every
    * change-data-capture feed runs: a standing type-2 history (built
    * from the first 4/5 of the event-time span and MATERIALIZED to
    * parquet — the stored dimension) receives the trailing 1/5 as a
    * delta batch. Apply = close each user's open row at the user's
    * first delta timestamp, then append the delta rows as new versions
    * continuing the user's version counter. The graded hash-match IS
    * the CDC invariant: apply(standing, delta) ≡ rebuild(full log) —
    * the oracle rebuilds from scratch and tags provenance by
    * valid_from < cut (the text_index_delta_merge merge≡rebuild
    * shape, applied to dimension maintenance).
    *
    * Scale shape: both the history windows and the apply joins key on
    * user_id — one shuffle partitioning serves all stages; the two
    * per-user apply frames (first delta t, standing max version) are
    * entity-scale and broadcast. Maintenance reads the standing
    * dimension + the delta batch, never the full source log. */
  def scd2CdcApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"value".as("v"))
    val cutDf = ev.agg(expr("min(t) + ((max(t) - min(t)) * 4) div 5")
      .as("cut"))
    val tagged = ev.crossJoin(broadcast(cutDf))
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    def history(df: DataFrame): DataFrame = df
      .select($"user_id", $"event_id",
        row_number().over(w).cast("long").as("version"),
        $"t".as("valid_from"),
        coalesce(lead($"t", 1).over(w), lit(-1L)).as("valid_to"),
        when(lead($"t", 1).over(w).isNull, 1).otherwise(0).as("is_current"),
        $"v")
    val standingDir = Tables.scratch("scd2_standing")
    val standingFrame = history(tagged.filter($"t" < $"cut").drop("cut"))
    val standing = graft.PlanOnly.roundTrip(standingFrame) {
      standingFrame.write.mode("overwrite").parquet(standingDir)
      spark.read.schema(standingFrame.schema).parquet(standingDir)
    }
    // the delta batch is carved ONCE (lineage cut): both its consumers
    // (first-delta frame, delta history) read the materialized carve
    // instead of re-scanning the full event log — the apply truly
    // touches standing + delta only
    val delta = graft.PlanOnly.cut(tagged.filter($"t" >= $"cut").drop("cut"))
    val firstDelta = delta.groupBy($"user_id")
      .agg(min(struct($"t", $"event_id")).getField("t").as("first_t"))
    val baseVer = standing.groupBy($"user_id")
      .agg(max($"version").as("max_ver"))
    val closed = standing.join(broadcast(firstDelta), Seq("user_id"), "left")
      .select($"user_id", $"event_id", $"version", $"valid_from",
        when($"is_current" === 1 && $"first_t".isNotNull, $"first_t")
          .otherwise($"valid_to").as("valid_to"),
        when($"is_current" === 1 && $"first_t".isNotNull, 0)
          .otherwise($"is_current").as("is_current"),
        $"v", lit("standing").as("origin"))
    val appended = history(delta)
      .join(broadcast(baseVer), Seq("user_id"), "left")
      .select($"user_id", $"event_id",
        ($"version" + coalesce($"max_ver", lit(0L))).as("version"),
        $"valid_from", $"valid_to", $"is_current", $"v",
        lit("delta").as("origin"))
    closed.unionByName(appended)
      .orderBy($"user_id", $"version")
  }

  /** Weekly SEASONAL PROFILE per event type — the decomposition step a
    * forecasting pipeline runs before any model (and the STL stand-in
    * that needs no transcendentals): per (event_type, weekday) the
    * exact event count, 4-dp fixed-point value sum and mean, and the
    * weekday's DEVIATION from the type's overall mean — the additive
    * seasonal index. Weekday = (epoch_day + 4) % 7 (day 0 = Thursday),
    * identical integer arithmetic on both engines; means are
    * truncating BIGINT divisions of the 4-dp sums (the determinism
    * rule for ratios).
    *
    * Scale shape: one map-side-combinable (type, weekday) aggregate
    * over the raw log (≤ types×7 rows out); the overall-mean
    * decoration is a window over that tiny frame. No per-event
    * window. */
  def timeseriesSeasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byWd = Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("ts_us"),
        Tables.dec4($"value").as("v"))
      .select($"event_type",
        expr("((ts_us DIV 86400000000) + 4) % 7").as("weekday"), $"v")
      .groupBy($"event_type", $"weekday")
      .agg(count(lit(1)).as("n"),
        (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"))
    val wType = Window.partitionBy($"event_type")
    byWd
      .withColumn("mean_fp", expr("v_sum_4dp div n"))
      .withColumn("type_sum_fp", sum($"v_sum_4dp").over(wType))
      .withColumn("type_n", sum($"n").over(wType))
      .select($"event_type", $"weekday", $"n", $"v_sum_4dp", $"mean_fp",
        expr("mean_fp - (type_sum_fp div type_n)").as("seasonal_dev_fp"))
      .orderBy($"event_type", $"weekday")
  }

  /** Exact OFFLINE CHANGEPOINT election per event type — binary
    * segmentation's first split (Scott–Knott / the offline twin of the
    * online [[timeseriesCusum]]): over the per-day value series, every
    * day boundary is a candidate changepoint scored by the
    * variance-reduction objective ΣL²/nL + ΣR²/nR (maximizing it
    * minimizes the two-segment SSE — the same prefix-sum histogram
    * scan as [[Multimodal.mlGbdtStumpBoost]], with time as the
    * feature), computed EXACTLY: 4-dp fixed-point daily sums, squares
    * in DECIMAL(38,0) ⟷ HUGEINT (prefix sums pass 10²⁰), truncating
    * integer division for the score and the segment means. The elected
    * split plus both segment means per type, tie-broken by the
    * earliest day.
    *
    * Scale shape: the raw log collapses to a (type, day) daily frame
    * in one map-side aggregate; prefix sums and the election are
    * windows over that tiny frame partitioned by type — no per-event
    * window, no corpus-scale sort. */
  def timeseriesChangepointBinary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("ts_us"),
        Tables.dec4($"value").as("v"))
      .groupBy($"event_type", expr("ts_us DIV 86400000000").as("day"))
      .agg((sum($"v") * lit(10000)).cast("long").as("y"))
      .createOrReplaceTempView("chg_daily")
    spark.sql(
      """WITH p AS (SELECT event_type, day, y,
        |    sum(y) OVER w AS sl, count(*) OVER w AS nl,
        |    sum(y) OVER (PARTITION BY event_type) AS st,
        |    count(*) OVER (PARTITION BY event_type) AS nt
        |  FROM chg_daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, day, nl, sl, nt - nl AS nr, st - sl AS sr,
        |    (CAST(sl AS DECIMAL(38,0)) * CAST(sl AS DECIMAL(38,0))) div nl
        |    + (CAST(st - sl AS DECIMAL(38,0)) * CAST(st - sl AS DECIMAL(38,0)))
        |      div (nt - nl) AS score
        |  FROM p WHERE nt - nl > 0),
        |e AS (SELECT event_type, day, nl, nr, sl, sr,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY score DESC, day) AS rn
        |  FROM s)
        |SELECT event_type, day AS split_day, nl AS days_left,
        |  nr AS days_right, sl div nl AS mean_left_4dp,
        |  sr div nr AS mean_right_4dp
        |FROM e WHERE rn = 1 ORDER BY event_type""".stripMargin)
  }

  /** Sentinel for unreachable DP cells in [[timeseriesDtwBand]]: 2⁵⁰ —
    * far above any reachable cost (≤ 24·max|Δavg| ≈ 1.4×10⁸), far
    * below BIGINT overflow even after 24 additive steps. */
  private val DtwInf = 1125899906842624L

  /** Banded DYNAMIC TIME WARPING distance between hour-of-day activity
    * profiles — the elastic similarity measure (Sakoe & Chiba 1978;
    * Itakura 1975) behind shape-based series clustering, in the
    * slope-constrained step pattern whose every move advances the
    * query axis: dp[i][j] = |A_i − B_j| + min(dp[i−1][j], dp[i−1][j−1],
    * dp[i−1][j−2]) inside the |i−j| ≤ 3 Sakoe–Chiba band (cells
    * outside pin to the 2⁵⁰ sentinel), dtw = dp[24][24]. Profiles are
    * the 24 truncating-mean 4-dp-fixed hourly values per event type
    * (absent hours 0); all 10 unordered type pairs are graded. The
    * row-to-row recurrence is the wavefront form both engines replay
    * exactly: Spark folds 23 `transform` steps over the previous row
    * via `aggregate`, DuckDB runs the identical recurrence as a
    * 24-step recursive CTE carrying the row as a LIST — integer
    * arithmetic end to end, so the hash certifies every DP cell on the
    * final row.
    *
    * Scale shape: the log collapses map-side to the |types|·24 profile
    * grid; the DP runs per PAIR on constant 24-length arrays (one
    * projection over a ≤|types|²-row broadcast-joined frame — at scale
    * the pair frame is the metadata-sized model table, never the event
    * log). Band + slope constraint keep the per-pair cost O(24·r)
    * regardless of series count. */
  def timeseriesDtwBand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", Tables.nsToUs($"ts").as("us"),
        Tables.dec4($"value").as("v"))
      .select($"event_type",
        (expr("us div 3600000000") % 24).as("h"), $"v")
      .groupBy($"event_type", $"h")
      .agg((sum($"v") * 10000).cast("long").as("s"),
        count(lit(1)).as("c"))
      .withColumn("avg_fp", expr("s div c"))
    val prof = cells.groupBy($"event_type")
      .agg(map_from_entries(collect_list(struct($"h", $"avg_fp"))).as("m"))
      .select($"event_type",
        expr("transform(sequence(0, 23), h -> coalesce(element_at(m, h), 0L))")
          .as("p"))
    val pairs = prof.select($"event_type".as("type_a"), $"p".as("pa"))
      .join(broadcast(prof.select($"event_type".as("type_b"), $"p".as("pb"))),
        $"type_a" < $"type_b")
    pairs.select($"type_a", $"type_b",
        expr("abs(element_at(pa, 1) - element_at(pb, 1))").as("d11"),
        expr(s"""aggregate(
          sequence(2, 24),
          transform(sequence(1, 24), j ->
            IF(j = 1, abs(element_at(pa, 1) - element_at(pb, 1)),
               ${DtwInf}L)),
          (row, i) -> transform(sequence(1, 24), j ->
            IF(abs(i - j) > 3, ${DtwInf}L,
               least(${DtwInf}L,
                 abs(element_at(pa, CAST(i AS INT))
                   - element_at(pb, CAST(j AS INT)))
                 + least(element_at(row, CAST(j AS INT)),
                     IF(j >= 2, element_at(row, CAST(j AS INT) - 1),
                        ${DtwInf}L),
                     IF(j >= 3, element_at(row, CAST(j AS INT) - 2),
                        ${DtwInf}L))))),
          row -> element_at(row, 24))""").as("dtw_cost"))
      .orderBy($"type_a", $"type_b")
  }

  /** SEASONAL–TREND DECOMPOSITION by moving averages (the classical
    * additive decomposition underlying STL, Cleveland et al. 1990 —
    * here the replayable MA form: LOESS is float-iterative and no
    * other engine replays it): per event type, the daily total series
    * splits into TREND (centered 7-day moving average, full windows
    * only), SEASONAL (per-weekday mean of the detrended series), and
    * the REMAINDER whose per-weekday absolute mass rides along as the
    * decomposition-quality receipt. Detrended values can be negative,
    * so every mean is the NON-NEGATIVE-SHIFT division (the ml_ridge
    * idiom): ⌊(Σx + n·2⁴⁰)/n⌋ − 2⁴⁰ is exact because n·2⁴⁰/n is
    * integral — Spark `div` and DuckDB `//` then agree on every
    * operand. All 4-dp fixed-point BIGINTs.
    *
    * Scale shape: the log collapses map-side to the calendar-bounded
    * (type, day) grain; the MA window and the weekday aggregate run on
    * that bounded frame partitioned by type — never on event rows. */
  def timeseriesStlProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val S = 1099511627776L // 2^40 — the non-negative shift
    val daily = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_type", expr("t div 86400000000").as("day"), $"v")
      .groupBy($"event_type", $"day")
      .agg((sum($"v") * 10000).cast("long").as("dv"))
    val wMa = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("n_win", count(lit(1)).over(wMa))
      .withColumn("trend",
        expr(s"(sum(dv + ${S}L) OVER (PARTITION BY event_type ORDER BY day " +
          s"ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) div 7 - ${S}L"))
      .filter($"n_win" === 7L)
      .select($"event_type", ($"day" % 7).as("weekday"),
        ($"dv" - $"trend").as("det"))
    det.groupBy($"event_type", $"weekday")
      .agg(count(lit(1)).as("n_days"),
        sum($"det").as("sum_det_4dp"),
        sum(abs($"det")).as("abs_det_4dp"))
      .select($"event_type", $"weekday", $"n_days",
        expr(s"((sum_det_4dp + n_days * ${S}L) div n_days) - ${S}L")
          .as("seasonal_4dp"),
        $"sum_det_4dp", $"abs_det_4dp")
      .orderBy($"event_type", $"weekday")
  }

  val queries: Map[String, QueryFn] = Map(
    "timeseries_stl_profile" -> (timeseriesStlProfile(_, _)),
    "timeseries_dtw_band" -> (timeseriesDtwBand(_, _)),
    "timeseries_theil_sen" -> (timeseriesTheilSen(_, _)),
    "timeseries_kalman_alpha_beta" -> (timeseriesKalmanAlphaBeta(_, _)),
    "timeseries_motif_l1" -> (timeseriesMotifL1(_, _)),
    "scd2_bitemporal_asof" -> (scd2BitemporalAsof(_, _)),
    "timeseries_changepoint_binary" -> (timeseriesChangepointBinary(_, _)),
    "timeseries_seasonal_profile" -> (timeseriesSeasonalProfile(_, _)),
    "timeseries_downsample_triangle" -> (timeseriesDownsampleTriangle(_, _)),
    "timeseries_bollinger_stats" -> (timeseriesBollingerStats(_, _)),
    "timeseries_autocorr_stats" -> (timeseriesAutocorrStats(_, _)),
    "timeseries_forecast_backtest" -> (timeseriesForecastBacktest(_, _)),
    "timeseries_cusum" -> (timeseriesCusum(_, _)),
    "timeseries_holt_linear" -> (timeseriesHoltLinear(_, _)),
    "timeseries_ewma_fixed" -> (timeseriesEwmaFixed(_, _)),
    "scd2_cdc_apply" -> (scd2CdcApply(_, _)),
    "timeseries_max_drawdown" -> (timeseriesMaxDrawdown(_, _)),
    "timeseries_interval_union" -> (timeseriesIntervalUnion(_, _)),
    "scd2_change_compression" -> (scd2ChangeCompression(_, _)),
    "scd2_asof_lookup" -> (scd2AsofLookup(_, _)),
    "timeseries_ohlc_bars" -> (timeseriesOhlcBars(_, _)),
    "scd2_user_value_history" -> (scd2UserValueHistory(_, _)),
    "timeseries_resample_ffill" -> (timeseriesResampleFfill(_, _)),
    "agg_time_decay_weighted" -> (aggTimeDecayWeighted(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // same day-grain collapse, 7-row centered MA with the 2^40 shift,
    // full-window filter, and per-weekday shifted means
    "timeseries_stl_profile" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT event_type, day,
        |    CAST(sum(v) * 10000 AS BIGINT) AS dv FROM e GROUP BY 1, 2),
        |m AS (SELECT event_type, day, dv,
        |    count(*) OVER w AS n_win,
        |    (sum(dv + 1099511627776) OVER w) // 7
        |      - 1099511627776 AS trend
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT event_type, day % 7 AS weekday, dv - trend AS det
        |  FROM m WHERE n_win = 7)
        |SELECT event_type, CAST(weekday AS BIGINT) AS weekday,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(((sum(det) + count(*) * 1099511627776) // count(*))
        |    - 1099511627776 AS BIGINT) AS seasonal_4dp,
        |  CAST(sum(det) AS BIGINT) AS sum_det_4dp,
        |  CAST(sum(abs(det)) AS BIGINT) AS abs_det_4dp
        |FROM det GROUP BY event_type, weekday
        |ORDER BY event_type, weekday""".stripMargin,
    // the identical wavefront recurrence as a 24-step recursive CTE
    // carrying the DP row as a LIST — every final-row cell replayed
    "timeseries_dtw_band" ->
      """WITH RECURSIVE
        |cell AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000) % 24 AS h,
        |    CAST(sum(CAST(value AS DECIMAL(18,4)) * 10000) AS BIGINT)
        |      AS s,
        |    count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |hours AS (SELECT unnest(range(0, 24)) AS h),
        |types AS (SELECT DISTINCT event_type FROM events
        |  WHERE value IS NOT NULL),
        |prof AS (SELECT t.event_type,
        |    list(coalesce(cell.s // cell.c, CAST(0 AS BIGINT))
        |      ORDER BY hours.h) AS p
        |  FROM types t CROSS JOIN hours LEFT JOIN cell
        |    ON cell.event_type = t.event_type AND cell.h = hours.h
        |  GROUP BY t.event_type),
        |pairs AS (SELECT a.event_type AS type_a, a.p AS pa,
        |    b.event_type AS type_b, b.p AS pb
        |  FROM prof a JOIN prof b ON a.event_type < b.event_type),
        |dp AS (
        |  SELECT type_a, type_b, pa, pb, 1 AS i,
        |    list_transform(range(1, 25), j -> CASE WHEN j = 1
        |      THEN abs(pa[1] - pb[1])
        |      ELSE CAST(1125899906842624 AS BIGINT) END) AS r
        |  FROM pairs
        |  UNION ALL
        |  SELECT type_a, type_b, pa, pb, i + 1,
        |    list_transform(range(1, 25), j ->
        |      CASE WHEN abs(i + 1 - j) > 3
        |        THEN CAST(1125899906842624 AS BIGINT)
        |        ELSE least(CAST(1125899906842624 AS BIGINT),
        |          abs(pa[i + 1] - pb[j])
        |          + least(r[j],
        |              CASE WHEN j >= 2 THEN r[j - 1]
        |                ELSE CAST(1125899906842624 AS BIGINT) END,
        |              CASE WHEN j >= 3 THEN r[j - 2]
        |                ELSE CAST(1125899906842624 AS BIGINT) END))
        |      END)
        |  FROM dp WHERE i < 24)
        |SELECT type_a, type_b, abs(pa[1] - pb[1]) AS d11,
        |  r[24] AS dtw_cost
        |FROM dp WHERE i = 24 ORDER BY type_a, type_b""".stripMargin,
    // the same tiny day-grain pair grid; slope div ⟷ // truncate
    // toward zero on both signs (the holt-linear measurement), and the
    // lower-median election shares the (slope, d1, d2) total order
    "timeseries_theil_sen" ->
      """WITH e0 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events
        |  WHERE value IS NOT NULL),
        |d AS (SELECT event_type, day, CAST(sum(v) * 10000 AS BIGINT) AS y
        |  FROM e0 GROUP BY 1, 2),
        |s AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
        |    ((b.y - a.y) * 1048576) // (b.day - a.day) AS slope_fp
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (SELECT event_type, slope_fp,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_fp, d1, d2) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_pairs
        |  FROM s)
        |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(slope_fp AS BIGINT) AS theil_sen_fp
        |FROM r WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,
    // same (type, weekday) grid; means and the seasonal index are
    // truncating BIGINT divisions of the 4-dp sums on both engines
    // the same prefix-sum election replayed, HUGEINT for the squares
    "timeseries_changepoint_binary" ->
      """WITH e0 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |d AS (SELECT event_type, day,
        |    CAST(sum(v) * 10000 AS BIGINT) AS y
        |  FROM e0 GROUP BY 1, 2),
        |p AS (SELECT event_type, day, y,
        |    sum(y) OVER w AS sl, count(*) OVER w AS nl,
        |    sum(y) OVER (PARTITION BY event_type) AS st,
        |    count(*) OVER (PARTITION BY event_type) AS nt
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, day, nl, sl, nt - nl AS nr, st - sl AS sr,
        |    (CAST(sl AS HUGEINT) * sl) // nl
        |    + (CAST(st - sl AS HUGEINT) * (st - sl)) // (nt - nl) AS score
        |  FROM p WHERE nt - nl > 0),
        |e AS (SELECT event_type, day, nl, nr, sl, sr,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY score DESC, day) AS rn
        |  FROM s)
        |SELECT event_type, day AS split_day,
        |  CAST(nl AS BIGINT) AS days_left, CAST(nr AS BIGINT) AS days_right,
        |  CAST(sl // nl AS BIGINT) AS mean_left_4dp,
        |  CAST(sr // nr AS BIGINT) AS mean_right_4dp
        |FROM e WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "timeseries_seasonal_profile" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS weekday,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |g AS (SELECT event_type, weekday,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type, weekday, n, v_sum_4dp,
        |  CAST(v_sum_4dp // n AS BIGINT) AS mean_fp,
        |  CAST(v_sum_4dp // n -
        |    (sum(v_sum_4dp) OVER (PARTITION BY event_type) //
        |     sum(n) OVER (PARTITION BY event_type)) AS BIGINT)
        |    AS seasonal_dev_fp
        |FROM g ORDER BY event_type, weekday""".stripMargin,
    // same rank buckets, raw-neighbor anchors, and (area2 desc, ts,
    // event_id) election; edges ride along with the −1 sentinel
    "timeseries_downsample_triangle" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    epoch_us(ts) // 1000000 AS tsec,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT user_id, event_id, t, tsec, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |rb AS (SELECT *, ((rn - 1) * 4) // n AS bkt FROM r),
        |la AS (SELECT user_id, bkt + 1 AS bkt, tsec AS ta, v AS va FROM
        |  (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
        |     ORDER BY rn DESC) AS rr FROM rb) WHERE rr = 1),
        |fi AS (SELECT user_id, bkt - 1 AS bkt, tsec AS tn, v AS vn FROM
        |  (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
        |     ORDER BY rn) AS rr FROM rb) WHERE rr = 1),
        |a AS (SELECT rb.user_id, rb.bkt, rb.event_id, rb.tsec, rb.v,
        |    abs((rb.tsec - la.ta) * (fi.vn - la.va) -
        |        (fi.tn - la.ta) * (rb.v - la.va)) AS area2
        |  FROM rb
        |  JOIN la ON rb.user_id = la.user_id AND rb.bkt = la.bkt
        |  JOIN fi ON rb.user_id = fi.user_id AND rb.bkt = fi.bkt
        |  WHERE rb.bkt <> 0 AND rb.bkt <> 3),
        |sel AS (SELECT user_id, bkt, event_id AS sel_event_id,
        |    tsec AS sel_ts, v AS sel_v_fp, area2 FROM
        |  (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
        |     ORDER BY area2 DESC, tsec, event_id) AS rr FROM a)
        |  WHERE rr = 1),
        |ed AS (SELECT DISTINCT user_id,
        |    CASE WHEN rn = 1 THEN 0 ELSE 3 END AS bkt,
        |    event_id AS sel_event_id, tsec AS sel_ts, v AS sel_v_fp,
        |    CAST(-1 AS BIGINT) AS area2
        |  FROM rb WHERE rn = 1 OR rn = n)
        |SELECT user_id, CAST(bkt AS BIGINT) AS bkt, sel_event_id,
        |  CAST(sel_ts AS BIGINT) AS sel_ts, sel_v_fp,
        |  CAST(area2 AS BIGINT) AS area2
        |FROM (SELECT * FROM sel UNION ALL SELECT * FROM ed)
        |ORDER BY user_id, bkt, sel_event_id""".stripMargin,
    // identical 10-row ROWS frame; ⌊sqrt⌋ of an exact BIGINT < 2⁵³ is
    // engine-identical
    "timeseries_bollinger_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_id, user_id, t, v_fp,
        |    CAST(count(*) OVER w AS BIGINT) AS n_win,
        |    CAST(sum(v_fp) OVER w AS BIGINT) AS s1,
        |    CAST(sum(v_fp * v_fp) OVER w AS BIGINT) AS s2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, t, v_fp, n_win, s1,
        |  CAST(floor(sqrt(CAST(n_win * s2 - s1 * s1 AS DOUBLE)))
        |    AS BIGINT) AS sd_num
        |FROM b ORDER BY event_id""".stripMargin,
    // same lag pairing + sufficient sums; every aggregate CAST BIGINT
    "timeseries_autocorr_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT user_id, y,
        |    lag(y) OVER (PARTITION BY user_id ORDER BY t, event_id) AS x
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
        |    AS num_fp,
        |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
        |    AS den_x,
        |  CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT)
        |    AS den_y
        |FROM p WHERE x IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // end-of-day election replayed as rn=1 over (t desc, event_id
    // desc) ≡ the Spark max-struct; day−7 self-join on the daily frame
    "timeseries_forecast_backtest" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |d0 AS (SELECT user_id, t // 86400000000 AS day, v_fp,
        |    row_number() OVER (PARTITION BY user_id, t // 86400000000
        |      ORDER BY t DESC, event_id DESC) AS rn
        |  FROM e),
        |d AS (SELECT user_id, day, v_fp FROM d0 WHERE rn = 1)
        |SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_forecasts,
        |  CAST(sum(abs(c.v_fp - p.v_fp)) AS BIGINT) AS sae_fp,
        |  CAST(sum(abs(c.v_fp - p.v_fp)) // count(*) AS BIGINT) AS mae_fp
        |FROM d c JOIN d p ON c.user_id = p.user_id AND c.day = p.day + 7
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    // (s, mx, na) carried through the per-rank recursive CTE against
    // the rank-1 target; greatest() is the same total function on both
    // engines and there is no division anywhere in the fold
    "timeseries_cusum" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT user_id, event_id, t, v_fp,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |f AS (
        |  SELECT user_id, rn, n, v_fp AS tgt, CAST(0 AS BIGINT) AS s,
        |    CAST(0 AS BIGINT) AS mx, CAST(0 AS BIGINT) AS na
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, r.n, f.tgt,
        |    greatest(0, f.s + (r.v_fp - f.tgt - 5000)),
        |    greatest(f.mx, greatest(0, f.s + (r.v_fp - f.tgt - 5000))),
        |    f.na + CASE WHEN greatest(0, f.s + (r.v_fp - f.tgt - 5000))
        |      > 200000 THEN 1 ELSE 0 END
        |  FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(s AS BIGINT) AS cusum_fp, CAST(mx AS BIGINT) AS max_cusum_fp,
        |  CAST(na AS BIGINT) AS n_alarms
        |FROM f WHERE rn = n
        |ORDER BY user_id""".stripMargin,
    // (l, b) carried through the per-rank recursive CTE; DuckDB's //
    // floors on both signs, matching the Spark side's explicit
    // (a − pmod(a,4)) div 4
    "timeseries_holt_linear" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT user_id, event_id, t, v_fp,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |f AS (
        |  SELECT user_id, rn, n, v_fp AS l, CAST(0 AS BIGINT) AS b
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, r.n,
        |    (r.v_fp + 3 * (f.l + f.b)) // 4,
        |    (((r.v_fp + 3 * (f.l + f.b)) // 4) - f.l + 3 * f.b) // 4
        |  FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(l AS BIGINT) AS level_fp, CAST(b AS BIGINT) AS trend_fp,
        |  CAST(l + b AS BIGINT) AS forecast_fp
        |FROM f WHERE rn = n
        |ORDER BY user_id""".stripMargin,
    // the ordered fold replayed as a per-rank recursive CTE: rank 1
    // seeds s = v, rank k joins rank k−1 carrying s = (v + 3·s)//4
    // same per-row (valid, tx) projection and conditional aggregate;
    // the tx dim crosses as a tiny VALUES table
    "scd2_bitemporal_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    coalesce(CAST(CAST(value AS DECIMAL(18,4)) * 10000
        |      AS BIGINT), 0) AS v_fp
        |  FROM events),
        |b AS (SELECT user_id, event_id, t, v_fp,
        |    CASE WHEN t < CAST(19731 AS BIGINT) * 86400000000 THEN 0
        |      WHEN t < CAST(19739 AS BIGINT) * 86400000000 THEN 1
        |      WHEN t < CAST(19747 AS BIGINT) * 86400000000 THEN 2
        |      ELSE 3 END AS valid_b
        |  FROM e),
        |bt AS (SELECT user_id, t, v_fp, valid_b,
        |    least(valid_b + CASE WHEN event_id % 16 = 7 THEN 1 ELSE 0 END,
        |      3) AS tx_b
        |  FROM b),
        |txs AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS x(tx_t))
        |SELECT CAST(txs.tx_t AS BIGINT) AS tx_t, user_id,
        |  CAST(count(*) AS BIGINT) AS n_known,
        |  CAST(sum(v_fp) AS BIGINT) AS v_sum_fp,
        |  CAST(max(t) AS BIGINT) AS last_valid_us
        |FROM bt CROSS JOIN txs
        |WHERE bt.tx_b <= txs.tx_t AND bt.valid_b <= 1
        |GROUP BY 1, 2
        |ORDER BY tx_t, user_id""".stripMargin,
    // the same dense-grid window/pair chain; generate_series ⟷
    // sequence, unnest(range) ⟷ explode(sequence)
    "timeseries_motif_l1" ->
      """WITH e0 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |daily AS (SELECT event_type, day, CAST(sum(v) * 10000 AS BIGINT)
        |    AS y
        |  FROM e0 GROUP BY 1, 2),
        |grid AS (SELECT t.event_type,
        |    unnest(generate_series((SELECT min(day) FROM e0),
        |                           (SELECT max(day) FROM e0))) AS day
        |  FROM (SELECT DISTINCT event_type FROM e0) t),
        |dense AS (SELECT g.event_type, g.day, coalesce(d.y, 0) AS y
        |  FROM grid g LEFT JOIN daily d
        |    ON g.event_type = d.event_type AND g.day = d.day),
        |win AS (SELECT event_type, day - i AS d, i, y
        |  FROM (SELECT event_type, day, y, unnest(range(0, 7)) AS i
        |        FROM dense)),
        |w2 AS (SELECT * FROM win
        |  WHERE d >= (SELECT min(day) FROM e0)
        |    AND d <= (SELECT max(day) FROM e0) - 6),
        |pairs AS (SELECT a.event_type, a.d AS d1, b.d AS d2,
        |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS dist
        |  FROM w2 a JOIN w2 b
        |    ON a.event_type = b.event_type AND a.i = b.i
        |    AND abs(b.d - a.d) >= 7
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT event_type, d1, d2, dist,
        |    row_number() OVER (PARTITION BY event_type, d1
        |      ORDER BY dist, d2) AS rn
        |  FROM pairs)
        |SELECT event_type, CAST(d1 AS BIGINT) AS window_start,
        |  CAST(d2 AS BIGINT) AS motif_match, dist AS l1_dist
        |FROM m WHERE rn = 1
        |ORDER BY event_type, window_start""".stripMargin,
    // the same per-rank recursive replay carrying BOTH registers; all
    // three division sites truncate toward zero on either sign
    "timeseries_kalman_alpha_beta" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT user_id, event_id, t, v_fp,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |f AS (
        |  SELECT user_id, rn, n, v_fp AS x, CAST(0 AS BIGINT) AS vel
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, r.n,
        |    (f.x + f.vel) + (r.v_fp - (f.x + f.vel)) // 4,
        |    f.vel + (r.v_fp - (f.x + f.vel)) // 16
        |  FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(x AS BIGINT) AS x_fp, CAST(vel AS BIGINT) AS vel_fp,
        |  CAST(x + vel AS BIGINT) AS forecast_fp
        |FROM f WHERE rn = n
        |ORDER BY user_id""".stripMargin,
    "timeseries_ewma_fixed" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT user_id, event_id, t, v_fp,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |f AS (
        |  SELECT user_id, rn, n, v_fp AS s FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, r.n, (r.v_fp + 3 * f.s) // 4
        |  FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
        |SELECT f.user_id, CAST(f.n AS BIGINT) AS n_events,
        |  CAST(f.s AS BIGINT) AS ewma_fp, r.v_fp AS last_v_fp
        |FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn
        |WHERE f.rn = f.n
        |ORDER BY f.user_id""".stripMargin,
    // from-scratch SCD2 rebuild over the FULL log — the CDC invariant
    // apply(standing, delta) ≡ rebuild(all); provenance by valid_from
    // against the same 4/5-span cut
    "scd2_cdc_apply" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    value AS v FROM events),
        |c AS (SELECT min(t) + ((max(t) - min(t)) * 4) // 5 AS cut FROM e),
        |h AS (SELECT user_id, event_id,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    t AS valid_from,
        |    CAST(coalesce(lead(t, 1) OVER w, -1) AS BIGINT) AS valid_to,
        |    CASE WHEN lead(t, 1) OVER w IS NULL THEN 1 ELSE 0 END
        |      AS is_current,
        |    v
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT user_id, event_id, version, valid_from, valid_to,
        |  is_current, v,
        |  CASE WHEN valid_from < (SELECT cut FROM c) THEN 'standing'
        |    ELSE 'delta' END AS origin
        |FROM h ORDER BY user_id, version""".stripMargin,
    // same struct-argmax election: max (dd, −event_id) picks the max
    // drawdown with the earliest witnessing event
    "timeseries_max_drawdown" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT user_id, event_id,
        |    max(v_fp) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v_fp AS dd
        |  FROM e),
        |m AS (SELECT user_id, count(*) AS n_events, max(dd) AS max_dd_fp
        |  FROM d GROUP BY user_id)
        |SELECT m.user_id, m.n_events, m.max_dd_fp,
        |  min(d.event_id) AS at_event_id
        |FROM m JOIN d ON d.user_id = m.user_id AND d.dd = m.max_dd_fp
        |GROUP BY m.user_id, m.n_events, m.max_dd_fp
        |ORDER BY m.user_id""".stripMargin,
    "timeseries_interval_union" ->
      """WITH iv AS (
        |  SELECT o.o_custkey, o.o_orderkey,
        |    epoch_us(o.o_orderdate) AS s,
        |    greatest(max(epoch_us(l.l_shipdate)),
        |             epoch_us(o.o_orderdate)) AS e
        |  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT o_custkey, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY o_custkey
        |           ORDER BY s, e, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           IS NULL
        |         OR s > max(e) OVER (PARTITION BY o_custkey
        |           ORDER BY s, e, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS new_island
        |  FROM iv),
        |g AS (
        |  SELECT o_custkey, s, e,
        |    sum(new_island) OVER (PARTITION BY o_custkey
        |      ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |isl AS (
        |  SELECT o_custkey, island, min(s) AS i_s, max(e) AS i_e
        |  FROM g GROUP BY 1, 2)
        |SELECT o_custkey AS c_custkey,
        |  count(*) AS n_islands,
        |  CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
        |  CAST(max(i_e) - min(i_s) - sum(i_e - i_s) AS BIGINT) AS gaps_us
        |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_change_compression" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |f AS (SELECT user_id, event_id, t, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS prev
        |  FROM e),
        |k AS (SELECT user_id, event_id, t, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS version
        |  FROM f WHERE prev IS NULL OR v <> prev),
        |c AS (SELECT user_id, max(version) AS n_versions,
        |    min(t) AS first_from_us, max(t) AS current_from_us
        |  FROM k GROUP BY 1),
        |n AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY 1)
        |SELECT c.user_id, n.n_events, c.n_versions,
        |  n.n_events - c.n_versions AS n_compressed,
        |  c.first_from_us, c.current_from_us,
        |  CAST(k2.v AS DOUBLE) AS current_value
        |FROM c
        |JOIN n ON n.user_id = c.user_id
        |JOIN k k2 ON k2.user_id = c.user_id AND k2.version = c.n_versions
        |ORDER BY c.user_id""".stripMargin,
    // textbook range-join formulation on purpose: agreeing with the
    // Spark side's join-free union+ffill rewrite proves the rewrite
    "scd2_asof_lookup" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |ver AS (SELECT user_id, t, v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS version
        |  FROM e),
        |grid AS (SELECT user_id,
        |    unnest([1704672000000000, 1705276800000000,
        |            1705881600000000, 1706486400000000]) AS probe_us
        |  FROM (SELECT DISTINCT user_id FROM e)),
        |sel AS (SELECT g.user_id, g.probe_us, max(ver.version) AS version
        |  FROM grid g JOIN ver ON ver.user_id = g.user_id
        |    AND ver.t <= g.probe_us
        |  GROUP BY 1, 2)
        |SELECT s.user_id, s.probe_us, s.version,
        |  CAST(ver.v AS DOUBLE) AS v
        |FROM sel s JOIN ver ON ver.user_id = s.user_id
        |  AND ver.version = s.version
        |ORDER BY s.user_id, s.probe_us""".stripMargin,
    "timeseries_resample_ffill" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |r AS (SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY t DESC, event_id DESC) AS rn FROM ev),
        |daily AS (SELECT user_id, day, v AS close FROM r WHERE rn = 1),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev) CROSS JOIN span),
        |filled AS (SELECT g.user_id, g.day, d.close,
        |    last_value(d.close IGNORE NULLS) OVER (PARTITION BY g.user_id
        |      ORDER BY g.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day,
        |  CAST(coalesce(fv, -1) AS DOUBLE) AS value_ffill,
        |  CAST(CASE WHEN close IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_observed
        |FROM filled
        |ORDER BY user_id, day""".stripMargin,
    "timeseries_ohlc_bars" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, event_id,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |r AS (SELECT event_type, t // 21600000000 AS bar, t, event_id, v,
        |    row_number() OVER (PARTITION BY event_type, t // 21600000000
        |      ORDER BY t, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, t // 21600000000
        |      ORDER BY t DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT event_type, bar,
        |  CAST(max(CASE WHEN ra = 1 THEN v END) AS DOUBLE) AS open,
        |  CAST(max(v) AS DOUBLE) AS high,
        |  CAST(min(v) AS DOUBLE) AS low,
        |  CAST(max(CASE WHEN rd = 1 THEN v END) AS DOUBLE) AS close,
        |  CAST(sum(v) AS DOUBLE) AS volume,
        |  count(*) AS n_events
        |FROM r GROUP BY event_type, bar
        |ORDER BY event_type, bar""".stripMargin,
    "scd2_user_value_history" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    value AS v FROM events)
        |SELECT user_id, event_id,
        |  row_number() OVER w AS version,
        |  t AS valid_from,
        |  coalesce(lead(t) OVER w, -1) AS valid_to,
        |  CASE WHEN lead(t) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
        |  v
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "agg_time_decay_weighted" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT event_type,
        |  CAST(sum(greatest(0, 30 -
        |    (((SELECT max(t) FROM e) - t) // 86400000000)) * v)
        |    AS DOUBLE) AS wsum,
        |  CAST(sum(greatest(0, 30 -
        |    (((SELECT max(t) FROM e) - t) // 86400000000)))
        |    AS BIGINT) AS wtotal,
        |  count(*) AS n
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
