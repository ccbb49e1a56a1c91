package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Window functions, global sorts / top-k, and set operations
  * (SURVEY.md §2.5–2.7).
  *
  * The MR reference class implements these via secondary sort (windows),
  * TotalOrderPartitioner (global sort), single-reducer top-k, and
  * concat+dedup jobs (set ops). Spark: WindowExec after a hash
  * repartition, range-partitioned SortExec, TakeOrderedAndProject, and
  * Expand/aggregate-based set operators.
  */
object Windows {

  // ---- §2.5 window functions ------------------------------------------

  /** Top-3 orders per customer by price (MR secondary-sort shape).
    * row_number with a unique tie-break (o_orderkey) keeps the pick
    * deterministic; the filter happens before any further shuffle, so
    * downstream sees ≤3 rows/customer regardless of skew. */
  def windowTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** rank / dense_rank of suppliers by account balance within nation.
    * Rank values are tie-order independent, so ordering within the
    * window by the (possibly tied) balance alone is still deterministic
    * output-wise; the final ORDER BY ends in the unique s_suppkey. */
  def windowRankDense(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc)
    Tables.supplier(spark, dir)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal",
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy($"s_nationkey", $"rnk", $"s_suppkey")
  }

  /** Per-user inter-event gap via lag. Window order uses the
    * microsecond-truncated ts (plus unique event_id) so Spark and the
    * DuckDB oracle — whose parquet reader truncates TIMESTAMP_NS to
    * micros — order identically. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    e.withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .select($"event_id", $"user_id", $"ts_us", coalesce($"gap_us", lit(-1L)).as("gap_us"))
      .orderBy($"event_id")
  }

  /** Running revenue per customer (frame unboundedPreceding..current).
    * Accumulates in exact decimal so the running values are
    * order-of-addition independent, then presents double. */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum(Tables.dec2($"o_totalprice")).over(w).cast("double").as("running_spend"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Bounded-ROWS moving average: each user's trailing-5-event mean —
    * the third frame kind after unbounded-rows (running_sum) and
    * bounded-RANGE (time_range_sum). The frame evaluator keeps exactly
    * 5 rows of state per partition regardless of user history length.
    * Sum accumulates in exact decimal; the mean is ONE double division
    * applied identically on both engines (double / bigint), so no
    * rounding truce is needed. */
  def windowRollingAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"user_id", $"event_id", $"t",
        (sum($"v").over(w).cast("double") / count(lit(1)).over(w))
          .as("avg_last5"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  /** Rolling MEDIAN over the last 7 events per user — the robust
    * smoothing counterpart of windowRollingAvg: an order statistic over
    * a moving frame, the shape monitoring pipelines use when a single
    * spike must not drag the trend line. Spark has NO percentile
    * window function, so this demonstrates the rewrite: collect_list
    * over the bounded rows-frame, sort_array, index the two middle
    * elements. Emitted as med2 = 2×median (the sum of the two middle
    * fixed-point values — integer-exact for odd and even frames alike,
    * no /2 ever happens), the same multiply-through discipline as the
    * MAD key.
    *
    * Scale shape: one shuffle on user_id + one per-partition sort; the
    * collected frame is BOUNDED at 7 elements by construction (row
    * frame −6..0), so per-row state is O(7) longs — this is exactly
    * the bounded-deque cost a native rolling median pays, never a
    * partition-sized buffer. The oracle replays the same two-middle
    * arithmetic over DuckDB's window list() — no engine median
    * function is trusted on either side. */
  def windowRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(-6, 0)
    Tables.events(spark, dir)
      // explicit NULL guard, mirrored in the oracle: collect_list
      // DROPS nulls while DuckDB's window list() KEEPS them — a NULL
      // value in a future fixture would silently desync frame lengths
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("win", sort_array(collect_list($"v_fp").over(w)))
      .withColumn("n_win", size($"win").cast("long"))
      // integer div, NOT Column./ (double division would produce a
      // fractional index): middles at ⌈n/2⌉ and ⌊n/2⌋+1, 1-indexed —
      // equal for odd n, adjacent for even n
      .select($"user_id", $"event_id", $"t", $"n_win",
        expr("element_at(win, int((n_win + 1) div 2)) + " +
          "element_at(win, int(n_win div 2 + 1))").as("med2"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  /** Time-based RANGE-frame window: per user, the rolling 1-hour sum of
    * event value — sum over [t − 1 h, t] by TIMESTAMP DISTANCE, not row
    * count (rowsBetween answers "last N events"; a feature store /
    * monitoring pipeline asks "last hour"). Rows with equal timestamps
    * are frame peers and share the sum, so ties cost nothing and the
    * result is deterministic without a tie-break in the frame order.
    *
    * Scale: one shuffle on user_id + one per-partition sort; the frame
    * is evaluated with a sliding two-pointer pass over the sorted run
    * (Spark's RangeFrame keeps a bounded buffer of the current window,
    * ~1 h of one user's events — not the partition). The value is
    * summed in exact DECIMAL(18,4): a sliding SUM of doubles would
    * accumulate order-dependent rounding, breaking both the oracle and
    * cross-run determinism. */
  def windowTimeRangeSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t")
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_id", $"user_id", $"t",
        sum($"v").over(w).cast("double").as("sum_1h"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  /** Gaps-and-islands: per-user consecutive-day activity streaks — the
    * discrete-sequence complement to time-gap sessionization
    * (`stream_sessionize` groups by idle GAP; this groups by unbroken
    * RUNS of calendar days). The classic trick: over the distinct
    * (user, day) grid, `day − row_number()` is constant exactly within
    * a consecutive run, so one window pass + one groupBy finds every
    * streak with no self-join and no iteration.
    *
    * Scale: distinct first (the grid is bounded by users × days, not
    * event count), then a single user_id shuffle shared by the window
    * and both collapses. Integer arithmetic throughout. */
  def windowGapIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"))
      .select($"user_id", expr("t div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    days.withColumn("island", $"day" - row_number().over(w))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_streaks"), max($"len").as("longest_streak"),
        sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  /** Distinct aggregation over a window — `count(DISTINCT user_id)
    * OVER (PARTITION BY event_type)` decorated onto every event row,
    * the one classic BI window shape Spark's WindowExec refuses
    * outright (`DISTINCT_WINDOW_FUNCTION_UNSUPPORTED`). The operator
    * IS the two-pass rewrite: pass 1 computes the distinct count per
    * partition key as an ordinary aggregate (map-side partial over
    * (event_type, user_id), then a ≤#types-row final), pass 2 joins
    * the tiny per-type frame back onto the fact rows by broadcast —
    * no shuffle of the fact table at all, versus the window form
    * which would hash-repartition every row by event_type (5 keys ⇒
    * 5 reducers ⇒ catastrophic skew at 100 TB). The DuckDB oracle
    * runs the native `count(DISTINCT …) OVER` — the hash-match proves
    * the rewrite is semantics-preserving. */
  def windowCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"user_id")
    val perType = e.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("distinct_users"))
    e.join(broadcast(perType), "event_type")
      .select($"event_id", $"event_type", $"user_id", $"distinct_users")
      .orderBy($"event_id")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist of
    * order prices within customer. All rank-derived rationals (integer
    * counts divided) — deterministic in both engines; o_orderkey
    * tie-break makes ntile assignment total. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"o_custkey", $"o_totalprice", $"o_orderkey")
  }

  /** lead / first_value / last_value with explicit frames — the
    * remaining classic window trio: next event time (lead), the
    * session-start (first_value over unbounded-preceding frame) and
    * session-end (last_value over unbounded-FOLLOWING frame) per user.
    * last_value needs the explicit full-partition frame — the default
    * frame ends at CURRENT ROW, where last_value degenerates to the
    * current row's value in both engines. Micros + event_id tie-break
    * keep the order total (the window_lag determinism rule). */
  def windowLeadFirstlast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.select($"event_id", $"user_id", $"ts_us",
        coalesce(lead($"ts_us", 1).over(w), lit(-1L)).as("next_ts_us"),
        first($"ts_us").over(wAll).as("first_ts_us"),
        last($"ts_us").over(wAll).as("last_ts_us"))
      .orderBy($"event_id")
  }

  // ---- §2.6 global sort / top-k ---------------------------------------

  /** Total-order sort (TeraSort pattern): Spark samples the key range
    * and range-partitions, so each partition sorts independently —
    * no single-reducer bottleneck at scale. */
  def sortGlobal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
  }

  /** Global top-10 by price → TakeOrderedAndProject: each partition
    * keeps its local top-10, driver merges — O(k) memory, no shuffle. */
  /** FAGIN'S THRESHOLD ALGORITHM receipt (Fagin–Lotem–Naor 2001) — the
    * classic early-termination top-k over TWO ranked lists (customers
    * by balance; customers by order count; combined score
    * a + 200 000·b): at sorted-access depth d the threshold
    * T(d) = a@d + 200 000·b@d bounds every UNSEEN object, so the scan
    * may STOP as soon as the k-th best seen score ≥ T(d). The graded
    * frame emits the full receipt at 8 fixed depths — threshold, seen
    * count, k-th best seen (k = 10), and the stop flag — the evidence
    * a top-k serving layer shows for why it read depth-d prefixes
    * instead of the whole table.
    *
    * Scale shape: both ranked prefixes are ORDER BY … LIMIT 128
    * (TakeOrderedAndProject — per-partition top-k, never a global
    * window over the table); ranks, the seen set (≤256 rows) and the
    * per-depth elections are windows over those BOUNDED frames; the
    * depth dim is an 8-row broadcast. */
  def topkThresholdAlgorithm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = 200000L
    val stats = Tables.customer(spark, dir)
      .select($"c_custkey", (Tables.dec2($"c_acctbal") * 100).cast("long").as("a"))
      .join(Tables.orders(spark, dir).groupBy($"o_custkey")
        .agg(count(lit(1)).as("b")), $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"a", coalesce($"b", lit(0L)).as("b"))
    val wA = Window.orderBy($"a".desc, $"c_custkey")
    val wB = Window.orderBy($"b".desc, $"c_custkey")
    val topA = stats.orderBy($"a".desc, $"c_custkey").limit(128)
      .withColumn("rA", row_number().over(wA).cast("long"))
    val topB = stats.orderBy($"b".desc, $"c_custkey").limit(128)
      .withColumn("rB", row_number().over(wB).cast("long"))
    val depths = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L).toDF("d")
    val thr = topA.select($"rA".as("d"), $"a".as("a_at"))
      .join(broadcast(depths), Seq("d"))
      .join(topB.select($"rB".as("d"), $"b".as("b_at")), Seq("d"))
      .select($"d", ($"a_at" + lit(W) * $"b_at").as("threshold"))
    val cand = topA.select($"c_custkey", $"rA")
      .join(topB.select($"c_custkey", $"rB"), Seq("c_custkey"), "full_outer")
      .select($"c_custkey",
        least(coalesce($"rA", lit(129L)), coalesce($"rB", lit(129L))).as("minR"))
      .join(stats, Seq("c_custkey"))
      .select($"c_custkey", $"minR", ($"a" + lit(W) * $"b").as("s"))
    val perD = cand.join(broadcast(depths), $"minR" <= $"d")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"d").orderBy($"s".desc, $"c_custkey")))
      .groupBy($"d")
      .agg(count(lit(1)).as("n_seen"),
        max(when($"rn" === 10, $"s")).as("kb"))
    thr.join(perD, Seq("d"))
      .select($"d", $"threshold", $"n_seen",
        coalesce($"kb", lit(-1L)).as("kth_best"),
        when($"kb".isNotNull && $"kb" >= $"threshold", 1L).otherwise(0L)
          .as("stopped"))
      .orderBy($"d")
  }

  def topkLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  // ---- §2.7 set operations --------------------------------------------

  private def users(spark: SparkSession, dir: String, typ: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_type" === typ).select($"user_id")
  }

  /** Distinct union of click/purchase user sets (MR concat+dedup). */
  def setopUnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    users(spark, dir, "click").union(users(spark, dir, "purchase"))
      .distinct().orderBy($"user_id")
  }

  /** Bag-semantics union (UNION ALL): pure concatenation, no shuffle at
    * all — partitions of both inputs are simply appended. */
  def setopUnionAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    users(spark, dir, "click").union(users(spark, dir, "purchase"))
      .orderBy($"user_id")
  }

  /** Bag-semantics difference (EXCEPT ALL): multiplicity max(0, r−a)
    * per value — the multiset complement SQL's distinct EXCEPT cannot
    * express (removing ONE occurrence per match matters when the input
    * is an event/line log, not a set). Spark plans it as a single
    * count-tagged aggregate + generate, one shuffle on the value. */
  def setopExceptAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    parts(spark, dir, "R").exceptAll(parts(spark, dir, "A"))
      .orderBy($"l_partkey")
  }

  /** Bag-semantics intersection (INTERSECT ALL): multiplicity
    * min(r, a) per value. */
  def setopIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    parts(spark, dir, "R").intersectAll(parts(spark, dir, "A"))
      .orderBy($"l_partkey")
  }

  private def parts(spark: SparkSession, dir: String, flag: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === flag).select($"l_partkey")
  }

  /** Users present in both sets (INTERSECT = distinct semantics). */
  def setopIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    users(spark, dir, "click").intersect(users(spark, dir, "purchase"))
      .orderBy($"user_id")
  }

  /** Users clicking but never purchasing (EXCEPT). */
  def setopExcept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    users(spark, dir, "click").except(users(spark, dir, "purchase"))
      .orderBy($"user_id")
  }

  /** Max-concurrent-intervals via the sweep-line trick: each order is
    * an interval [orderdate, last shipdate); per customer, the peak
    * number of simultaneously open orders. The O(n²) formulation is an
    * interval self-join (every order × every overlapping order); the
    * sweep reduces it to +1/−1 boundary events and ONE running-sum
    * window per customer — O(n log n) in the sort, one shuffle, the
    * standard concurrent-sessions / peak-occupancy plan at any scale.
    *
    * Determinism: boundaries are exact µs integers (unix_micros ⟷
    * DuckDB epoch_us on ms-precision timestamps); at equal time an END
    * sorts before a START (kind 0 < 1 — half-open intervals: an order
    * ending exactly when another starts never overlaps it) and
    * o_orderkey breaks remaining ties, so both engines accumulate in
    * the identical event order. */
  def windowIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // parquet ms-timestamps read as TIMESTAMP_NTZ; the session TZ is
    // pinned UTC (Tables.configure) so the cast is a pure relabel and
    // unix_micros matches DuckDB's epoch_us on the naive value exactly
    // the fixture contains orders whose last shipdate PRECEDES the
    // order date (synthetic skew) — an ill-formed interval whose end
    // event would fire before its start and transiently undercount the
    // sweep; clamp to end ≥ start (zero-length at worst) so every
    // interval is well-formed half-open
    val iv = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).groupBy($"l_orderkey")
        .agg(max(unix_micros($"l_shipdate".cast("timestamp"))).as("e0")),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("s"),
        greatest($"e0", unix_micros($"o_orderdate".cast("timestamp"))).as("e"))
    val ev = iv.select($"o_custkey", $"s".as("t"), lit(1).as("kind"),
        lit(1L).as("delta"), $"o_orderkey")
      .unionByName(iv.select($"o_custkey", $"e".as("t"), lit(0).as("kind"),
        lit(-1L).as("delta"), $"o_orderkey"))
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"t", $"kind", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("open", sum($"delta").over(w))
      .groupBy($"o_custkey")
      .agg(max($"open").as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_orders"))
      .select($"o_custkey".as("c_custkey"), $"max_concurrent", $"n_orders")
      .orderBy($"c_custkey")
  }

  /** Trailing-RANGE distinct count — per event row, the number of
    * distinct users active in the same event_type over the inclusive
    * trailing hour [t−1h, t]. The one window shape with no native
    * Spark form (count(DISTINCT) over a moving RANGE frame) AND no
    * window-sum decomposition: the cumulative trick behind
    * window_cumulative_distinct (count first occurrences) fails on a
    * SLIDING frame because "first in window" depends on the anchor —
    * at anchor t an event counts iff its same-user predecessor fell
    * before t−1h, a predicate PARAMETRIC in t that no fixed per-row
    * weight can encode (SCALE.md has the full argument). Exact
    * semantics therefore cost a bounded range self-join: anchors probe
    * the two hour buckets covering their trailing window, candidates
    * equi-join on (type, hour-bucket), the exact [t−1h, t] band filters
    * after, and a (anchor, user) distinct-aggregate counts survivors.
    *
    * Scale shape: the join is a true equi-join on (event_type, bucket)
    * — work is O(n · occupancy) where occupancy = events per
    * type-hour (11 at sf0.01), never all-pairs; the distinct aggregate
    * runs as the standard two-phase partial on (anchor, user). At
    * 100 TB, unbounded per-type-hour occupancy makes ANY exact method
    * Ω(n·occupancy) — the scale fallback is a mergeable sketch (HLL
    * per (type, hour) merged across the frame), traded here for
    * exactness because the oracle (DuckDB's NATIVE count(DISTINCT)
    * OVER RANGE) grades exact values. */
  def windowRollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val HourUs = 3600000000L
    // NULL ts would drop the anchor here (NULL bucket never equi-joins)
    // while DuckDB's window still emits the row — filter on both sides
    // (the timeseries_max_drawdown latent-NULL lesson)
    val e = Tables.events(spark, dir)
      .filter($"ts".isNotNull)
      .select($"event_id", $"event_type", $"user_id",
        Tables.nsToUs($"ts").as("t"))
    val anchors = e
      .withColumn("h", explode(array(expr(s"t div $HourUs - 1"),
        expr(s"t div $HourUs"))))
    val members = e.select($"event_type", $"user_id".as("m_user"),
      $"t".as("m_t"), expr(s"t div $HourUs").as("h"))
    anchors.join(members, Seq("event_type", "h"))
      .filter($"m_t" >= $"t" - HourUs && $"m_t" <= $"t")
      .groupBy($"event_id", $"event_type", $"t")
      .agg(countDistinct($"m_user").as("n_distinct_1h"))
      .select($"event_id", $"event_type", $"t".as("t_us"), $"n_distinct_1h")
      .orderBy($"event_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "topk_threshold_algorithm" -> (topkThresholdAlgorithm(_, _)),
    "window_rolling_distinct" -> (windowRollingDistinct(_, _)),
    "window_interval_overlap" -> (windowIntervalOverlap(_, _)),
    "window_count_distinct" -> (windowCountDistinct(_, _)),
    "window_topk_per_group" -> (windowTopkPerGroup(_, _)),
    "window_rank_dense" -> (windowRankDense(_, _)),
    "window_lag" -> (windowLag(_, _)),
    "window_running_sum" -> (windowRunningSum(_, _)),
    "window_time_range_sum" -> (windowTimeRangeSum(_, _)),
    "window_rolling_avg" -> (windowRollingAvg(_, _)),
    "window_rolling_median" -> (windowRollingMedian(_, _)),
    "window_gap_islands" -> (windowGapIslands(_, _)),
    "window_distribution" -> (windowDistribution(_, _)),
    "window_lead_firstlast" -> (windowLeadFirstlast(_, _)),
    "setop_union_all" -> (setopUnionAll(_, _)),
    "setop_except_all" -> (setopExceptAll(_, _)),
    "setop_intersect_all" -> (setopIntersectAll(_, _)),
    "sort_global" -> (sortGlobal(_, _)),
    "topk_limit" -> (topkLimit(_, _)),
    "setop_union_distinct" -> (setopUnionDistinct(_, _)),
    "setop_intersect" -> (setopIntersect(_, _)),
    "setop_except" -> (setopExcept(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // the oracle may rank the full table (global row_number); the
    // engine's 128-prefix ranks agree on every depth it reads
    "topk_threshold_algorithm" ->
      """WITH st AS (SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS a,
        |    coalesce(o.b, 0) AS b
        |  FROM customer LEFT JOIN (SELECT o_custkey,
        |      CAST(count(*) AS BIGINT) AS b FROM orders GROUP BY 1) o
        |    ON c_custkey = o.o_custkey),
        |ra AS (SELECT c_custkey, a, b,
        |    row_number() OVER (ORDER BY a DESC, c_custkey) AS rA,
        |    row_number() OVER (ORDER BY b DESC, c_custkey) AS rB
        |  FROM st),
        |ds AS (SELECT * FROM (VALUES (1), (2), (4), (8), (16), (32),
        |    (64), (128)) AS t(d)),
        |thr AS (SELECT ds.d,
        |    (SELECT a FROM ra WHERE rA = ds.d)
        |      + 200000 * (SELECT b FROM ra WHERE rB = ds.d) AS threshold
        |  FROM ds),
        |seen AS (SELECT ds.d, ra.c_custkey, ra.a + 200000 * ra.b AS s
        |  FROM ra JOIN ds ON least(ra.rA, ra.rB) <= ds.d),
        |kth AS (SELECT d, CAST(count(*) AS BIGINT) AS n_seen,
        |    max(CASE WHEN rn = 10 THEN s END) AS kb
        |  FROM (SELECT d, s, c_custkey, row_number() OVER (
        |      PARTITION BY d ORDER BY s DESC, c_custkey) AS rn FROM seen)
        |  GROUP BY d)
        |SELECT CAST(thr.d AS BIGINT) AS d,
        |  CAST(thr.threshold AS BIGINT) AS threshold, kth.n_seen,
        |  CAST(coalesce(kth.kb, -1) AS BIGINT) AS kth_best,
        |  CAST(CASE WHEN kth.kb >= thr.threshold THEN 1 ELSE 0 END
        |    AS BIGINT) AS stopped
        |FROM thr JOIN kth ON thr.d = kth.d
        |ORDER BY d""".stripMargin,
    // DuckDB runs the NATIVE count(DISTINCT) OVER a moving RANGE frame
    // — the hash-match proves the banded self-join rewrite (the
    // window_count_distinct precedent applied to a sliding frame)
    "window_rolling_distinct" ->
      """SELECT event_id, event_type, epoch_us(ts) AS t_us,
        |  CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_distinct_1h
        |FROM events WHERE ts IS NOT NULL ORDER BY event_id""".stripMargin,
    // same two-middle arithmetic over DuckDB's window list() — no
    // engine median function trusted on either side
    "window_rolling_median" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT user_id, event_id, t,
        |    list_sort(list(v_fp) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM e)
        |SELECT user_id, event_id, t, CAST(len(win) AS BIGINT) AS n_win,
        |  win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS med2
        |FROM w ORDER BY user_id, t, event_id""".stripMargin,
    "window_count_distinct" ->
      """SELECT event_id, event_type, user_id,
        |  CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type)
        |    AS BIGINT) AS distinct_users
        |FROM events ORDER BY event_id""".stripMargin,
    "window_interval_overlap" ->
      """WITH iv AS (
        |  SELECT o.o_orderkey, o.o_custkey,
        |    epoch_us(o.o_orderdate) AS s,
        |    greatest(max(epoch_us(l.l_shipdate)),
        |             epoch_us(o.o_orderdate)) AS e
        |  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2, 3),
        |ev AS (
        |  SELECT o_custkey, s AS t, 1 AS kind, 1 AS delta, o_orderkey
        |  FROM iv
        |  UNION ALL
        |  SELECT o_custkey, e AS t, 0 AS kind, -1 AS delta, o_orderkey
        |  FROM iv),
        |sw AS (
        |  SELECT o_custkey,
        |    sum(delta) OVER (PARTITION BY o_custkey
        |      ORDER BY t, kind, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM ev)
        |SELECT o_custkey AS c_custkey,
        |  CAST(max(open) AS BIGINT) AS max_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_orders
        |FROM sw GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_rank_dense" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk
        |FROM supplier ORDER BY s_nationkey, rnk, s_suppkey""".stripMargin,
    "window_lag" ->
      """SELECT event_id, user_id, ts_us,
        |  coalesce(ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id), -1) AS gap_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        |ORDER BY event_id""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_rolling_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |  CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT user_id, event_id, t,
        |  CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w AS avg_last5
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t, event_id""".stripMargin,
    "window_time_range_sum" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |  CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT event_id, user_id, t,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
        |FROM e ORDER BY user_id, t, event_id""".stripMargin,
    "window_gap_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d),
        |s AS (SELECT user_id, island, count(*) AS len
        |      FROM i GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_streaks, max(len) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_distribution" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin,
    "window_lead_firstlast" ->
      """SELECT event_id, user_id, ts_us,
        |  coalesce(lead(ts_us, 1) OVER w, -1) AS next_ts_us,
        |  first_value(ts_us) OVER wa AS first_ts_us,
        |  last_value(ts_us) OVER wa AS last_ts_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
        |  wa AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "setop_union_all" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "setop_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin,
    "setop_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin,
    "sort_global" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
    "topk_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "setop_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "setop_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "setop_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin
  )
}
