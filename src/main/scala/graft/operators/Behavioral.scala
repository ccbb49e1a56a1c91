package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Round-6 behavioral-analytics layer: the event-log query shapes every
  * product-analytics warehouse runs at scale — ordered funnels, cohort
  * retention, and co-occurrence graphs. All three are oracled.
  *
  * Determinism posture: timestamps are compared at microseconds
  * (`Tables.nsToUs` ⟷ DuckDB `epoch_us`), week buckets use BIGINT
  * `div` (identical floor semantics for the positive epoch values
  * here), and every output imposes a total ORDER BY ending in a unique
  * key. No floating point anywhere in this file.
  */
object Behavioral {

  /** Microseconds per 7 days — the cohort/retention bucket width. */
  private val WeekUs = 604800000000L

  /** Super-node guard for the bipartite pair machinery (copurchase /
    * node-jaccard / resource-allocation / assortativity): a part whose
    * collected supplier set exceeds this cap is EXCLUDED from pairing —
    * the winnow hot-fingerprint posture ([[Indexing.dedupWinnowPairs]]
    * drops df(h) > 20 buckets before its self-join). Per-group pair
    * fan-out is C(degree, 2); one adversarial hot part with 10⁵
    * suppliers would emit 10¹⁰ pairs from a single task, so the cap is
    * what makes the degree²-bounded claim hold at 100 TB. The fixture's
    * densest part has 10 / 41 / 52 suppliers at sf0.001/0.01/0.1 — ≥5×
    * headroom under the cap, so no graded oracle changes (re-proved by
    * the three-SF hash-match after the cap landed); BehavioralSpec pins
    * both the exclusion law (parameterized cap) and the headroom bound. */
  private[graft] val PairDegreeCap = 256

  /** The shared capped collection step: one incidence shuffle → per-part
    * sorted supplier set, super-node keys dropped before any pairing. */
  private[graft] def supplierSets(incidence: DataFrame, cap: Int): DataFrame = {
    import incidence.sparkSession.implicits._
    // Fanout.byKey: keep the downstream C(|ss|,2) pair explosion at
    // full parallelism (AQE would coalesce this small aggregate to one
    // partition and single-thread every consumer's explode stage)
    Fanout.byKey(incidence, $"l_partkey").groupBy($"l_partkey")
      .agg(sort_array(collect_set($"l_suppkey")).as("ss"))
      .filter(size($"ss") <= cap)
  }

  /** Ordered three-stage funnel over the event log: a user converts
    * stage 2 only with a click strictly AFTER their first view, and
    * stage 3 only with a purchase strictly AFTER that qualifying click.
    * This ordering constraint is what separates a funnel from three
    * independent counts — and what makes it awkward in plain SQL
    * (each stage's anchor timestamp depends on the previous stage's).
    *
    * Spark shape: ONE shuffle total. Events are hash-partitioned by
    * user_id once; the three stage anchors are unbounded-frame window
    * minima over that same partitioning (no ORDER BY ⇒ no sort — each
    * pass is a single whole-partition reduction), chained so pass N
    * can reference pass N−1's column. A groupBy(user_id) over the same
    * keys collapses to one row per user (again no exchange — the
    * partitioning is reused), then a global 3-counter fold. At 100 TB
    * this is the minimal plan: the event log is read once, shuffled
    * once on user_id, and everything after is per-partition.
    *
    * Output: one row per funnel stage (stage label is the unique order
    * key), `users` = users reaching that stage. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_type", Tables.nsToUs($"ts").as("t"))
    val whole = Window.partitionBy($"user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = e
      .withColumn("fv", min(when($"event_type" === "view", $"t")).over(whole))
      .withColumn("qc",
        min(when($"event_type" === "click" && $"t" > $"fv", $"t")).over(whole))
      .withColumn("qp",
        min(when($"event_type" === "purchase" && $"t" > $"qc", $"t")).over(whole))
    val perUser = staged.groupBy($"user_id")
      .agg(first($"fv").as("fv"), first($"qc").as("qc"), first($"qp").as("qp"))
    // coalesce: sum over an empty frame is NULL; the funnel of an empty
    // log is three zero rows, not three NULL rows (EmptyFixtureSpec)
    val counts = perUser.agg(
      coalesce(sum(when($"fv".isNotNull, 1L)), lit(0L)).as("n1"),
      coalesce(sum(when($"qc".isNotNull, 1L)), lit(0L)).as("n2"),
      coalesce(sum(when($"qp".isNotNull, 1L)), lit(0L)).as("n3"))
    // stack(), not a 3-way union: a union would embed the whole
    // upstream pipeline once per branch (3× the plan, reuse-dependent);
    // stack pivots the single aggregate row in place — 2 exchanges total
    counts.selectExpr(
      """stack(3, '1_view', n1, '2_view_click', n2,
        |'3_view_click_purchase', n3) AS (stage, users)""".stripMargin)
      .orderBy($"stage")
  }

  /** Classic cohort-retention triangle: users are cohorted by the epoch
    * week of their FIRST event; each later active week counts them at
    * `week_offset = week − cohort_week`. The output is the retention
    * matrix every growth dashboard plots.
    *
    * Spark shape: the cohort week is an unbounded-frame window min over
    * user_id (one shuffle, no sort, no join — the usual min-then-join
    * formulation pays a second shuffle for the same answer), then a
    * (cohort_week, week_offset) group with `countDistinct(user_id)`.
    * The distinct-count aggregate partially de-dups map-side on
    * (cohort, offset, user) before its exchange, so the second shuffle
    * moves at most one row per user per active week — at 100 TB that
    * is the active-users table, not the event log. */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"))
      .withColumn("wk", expr(s"t div $WeekUs"))
    val whole = Window.partitionBy($"user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.withColumn("cohort_week", min($"wk").over(whole))
      .groupBy($"cohort_week", ($"wk" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Supplier co-occurrence graph: pairs of suppliers stocking ≥3 of
    * the same parts — the "customers who bought X also bought Y" /
    * common-neighbors shape, built from the bipartite part–supplier
    * incidence. The generic recipe for item-item similarity graphs.
    *
    * Scale shape: (1) project to the two key columns and DISTINCT
    * first — pair generation must run on the incidence relation (one
    * row per (part, supplier)), never on raw lineitem, or a part
    * ordered N times fans out N² instead of degree². (2) Pairs are
    * generated WITHOUT a self-join: one groupBy(part) collects the
    * sorted supplier set, then posexplode × slice emits each (s1, s2)
    * with s1 < s2 directly — per-part work is C(degree, 2), bounded by
    * suppliers-per-part, and the incidence frame is shuffled exactly
    * once (the self-join formulation re-shuffles and re-sorts it for
    * both SMJ sides: measured 2× slower at sf0.1 — CopurchaseProbe,
    * 4.0 s vs 8.1 s on the near-complete 499 496-pair graph). (3) The
    * pair aggregate combines map-side before its exchange. (4) The
    * super-node risk — one hot part with thousands of suppliers — is
    * ENFORCED away by [[supplierSets]]'s [[PairDegreeCap]] degree
    * filter on the collected set (DISCO/cooccurrence-at-scale
    * mitigation), without touching the rest of the plan. */
  def graphCopurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    supplierSets(Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey").distinct(), PairDegreeCap)
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("shared_parts"))
      .filter($"shared_parts" >= 3)
      .orderBy($"shared_parts".desc, $"s1", $"s2")
  }

  /** Node-similarity scoring over the same bipartite incidence:
    * Jaccard similarity of each supplier pair's part sets —
    * |A∩B| / |A∪B| — the normalized companion to the raw
    * common-neighbor counts above (raw counts rank high-degree nodes
    * first; Jaccard corrects for set size, the standard
    * item-item-similarity refinement).
    *
    * Scale shape: the intersection reuses the copurchase pair
    * machinery (one incidence shuffle, degree²-bounded pair explode,
    * map-side pair combine); degrees come from a tiny per-node
    * aggregate (≤|suppliers| rows, broadcast twice); the union is
    * derived (deg1 + deg2 − shared), never materialized. The score is
    * exact 2^20 fixed point via BIGINT floor-division — no
    * cross-engine float division (the determinism rule for ratios
    * whose operands aren't identical doubles by construction). */
  def graphNodeJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val incidence = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val deg = incidence.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("deg"))
    val pairs = supplierSets(incidence, PairDegreeCap)
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 3)
    pairs
      .join(broadcast(deg.withColumnRenamed("l_suppkey", "k1")
        .withColumnRenamed("deg", "deg1")), $"s1" === $"k1")
      .join(broadcast(deg.withColumnRenamed("l_suppkey", "k2")
        .withColumnRenamed("deg", "deg2")), $"s2" === $"k2")
      .select($"s1", $"s2", $"shared", $"deg1", $"deg2",
        expr("(shared * 1048576) div (deg1 + deg2 - shared)").as("jaccard_fp"))
      .orderBy($"jaccard_fp".desc, $"s1", $"s2")
  }

  /** Resource-allocation link-prediction index over the same bipartite
    * incidence — the third member of the similarity family: raw common
    * neighbors ([[graphCopurchasePairs]]) over-rank popular nodes,
    * Jaccard ([[graphNodeJaccard]]) normalizes by the pair, RA (Zhou,
    * Lü & Zhang 2009) discounts each SHARED neighbor by its own degree
    * — RA(s1,s2) = Σ_{shared part z} 1/deg(z) — so a part half the
    * market stocks contributes almost nothing while a rare co-stocked
    * part dominates. The standard Adamic–Adar uses 1/log(deg), but log
    * is banned for oracle parity; RA is the published log-free variant
    * with the same intent and better link-prediction accuracy in the
    * original study. Each reciprocal is ⌊2²⁰/deg⌋ BIGINT fixed point —
    * one truncating division per PART (not per pair), cross-engine
    * exact.
    *
    * Scale shape: identical to the copurchase machinery (one incidence
    * shuffle, degree²-bounded sorted-set pair explode, map-side pair
    * combine) — the per-part weight is computed from the collected
    * set's own size BEFORE pairing, so no degree join is needed at
    * all. */
  def graphResourceAllocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    supplierSets(Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey").distinct(), PairDegreeCap)
      .select($"ss",
        expr("1048576L div cast(size(ss) AS BIGINT)").as("w"),
        posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", $"w", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("shared_parts"), sum($"w").as("ra_fp"))
      .filter($"shared_parts" >= 3)
      .orderBy($"ra_fp".desc, $"s1", $"s2")
  }

  /** Degree assortativity sufficient statistics over the copurchase
    * graph — "do hubs connect to hubs?", the one-number structural
    * summary (Newman 2002) that predicts how the graph behaves under
    * sampling and partitioning. Over every edge of the ≥3-shared-parts
    * graph, taken in BOTH orientations (the standard undirected
    * symmetrization, which makes the x and y marginals identical by
    * construction), the exact sums (n_ends, Σx, Σxy, Σx²) and the
    * Pearson numerator/denominator as BIGINTs — the autocorr/linreg
    * posture: the final r is one IEEE division the caller performs.
    *
    * Scale shape: the edge list reuses the copurchase machinery; the
    * degree decoration is a broadcast of the ≤|suppliers| degree
    * frame; the sums partial-aggregate to ONE row. */
  def graphAssortativityStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted twice over: the incidence feeds the degree frame AND
    // the pair generation, and the edge list feeds both orientations —
    // unmarked, the whole explode chain re-plans per consumer
    // (measured 9 exchanges vs 5 marked)
    val incidence = graft.PlanOnly.cut(Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct())
    val deg = incidence.groupBy($"l_suppkey").agg(count(lit(1)).as("deg"))
    // cut, not mark (r18): the two degree broadcasts and the edge
    // orientation union race a lazy persist's first materialization
    val edges = graft.PlanOnly.cut(supplierSets(incidence, PairDegreeCap)
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 3)
      .select($"s1", $"s2"))
    val both = edges.unionByName(
      edges.select($"s2".as("s1"), $"s1".as("s2")))
    both
      .join(broadcast(deg.select($"l_suppkey".as("s1"), $"deg".as("x"))),
        "s1")
      .join(broadcast(deg.select($"l_suppkey".as("s2"), $"deg".as("y"))),
        "s2")
      .agg(count(lit(1)).as("n_ends"),
        sum($"x").as("sx"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select($"n_ends", $"sx", $"sxy", $"sxx",
        ($"n_ends" * $"sxy" - $"sx" * $"sx").as("num"),
        ($"n_ends" * $"sxx" - $"sx" * $"sx").as("den"))
      .orderBy($"n_ends")
  }

  /** Two deterministic LABEL-PROPAGATION rounds over the copurchase
    * graph — the community-detection primitive (Raghavan et al. 2007)
    * the similarity family lacks: every node starts labeled with its
    * own id; each round a node adopts the MODE of its neighbors'
    * labels, ties broken by the smallest label (the determinism rule —
    * vanilla LPA's random tie-break would never oracle). On a simple
    * graph round 1 from unique labels degenerates to min-neighbor
    * (every neighbor label counts once — documented, not hidden);
    * round 2 is genuine frequency voting over the round-1 labels, the
    * step where communities begin to coalesce. Both rounds emitted per
    * node so the oracle certifies the propagation chain, not just a
    * fixed point.
    *
    * Scale shape: the edge list reuses the capped pair machinery (one
    * incidence shuffle, degree²-bounded explode); each round is one
    * (node, label) count aggregate + one argmax — O(edges) per round,
    * the LPA promise; labels join back by node id, co-partitioned. */
  def graphLabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val incidence = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val edges = graft.PlanOnly.cut {
      val e = supplierSets(incidence, PairDegreeCap)
        .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
        .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
        .groupBy($"s1", $"s2")
        .agg(count(lit(1)).as("shared"))
        .filter($"shared" >= 3)
        .select($"s1", $"s2")
      e.unionByName(e.select($"s2".as("s1"), $"s1".as("s2")))
    }
    // one LPA round: node s adopts the most frequent label among its
    // neighbors' current labels, smallest label on ties
    def round(labels: DataFrame): DataFrame = edges
      .join(labels.select($"s2".as("node"), $"label"), $"s2" === $"node")
      .groupBy($"s1", $"label").agg(count(lit(1)).as("c"))
      .groupBy($"s1")
      .agg(min(struct((-$"c").as("nc"), $"label")).getField("label")
        .as("label"))
      .select($"s1".as("s2"), $"label") // shaped for the next round's join
    // round 1 from identity labels on a simple graph IS min-neighbor
    // (every neighbor label counts exactly once, so the frequency vote
    // ties everywhere and the tie-break elects the minimum): one
    // aggregate instead of round()'s join + two aggregates — identical
    // output, proven by the unchanged oracle (which replays the full
    // vote) and the BehavioralSpec min-neighbor law
    val l1 = graft.PlanOnly.cut(
      edges.groupBy($"s1").agg(min($"s2").as("label"))
        .select($"s1".as("s2"), $"label"))
    val l2 = round(l1)
    l1.select($"s2".as("supplier"), $"label".as("label_r1"))
      .join(l2.select($"s2".as("supplier"), $"label".as("label_r2")),
        "supplier")
      .orderBy($"supplier")
  }

  /** Three K-CORE PEELING rounds (K = 6) over the sparsified
    * copurchase graph — Seidman's (1983) cohesion core by the
    * Matula–Beck peel, the BSP formulation every distributed graph
    * engine runs: each round removes every node whose degree in the
    * current induced subgraph is below K, and the surviving degrees
    * after a FIXED number of rounds are a certified upper envelope of
    * the true core (a full peel iterates to fixpoint; bounding rounds
    * is the synchronous-superstep version, disclosed, and all three
    * per-round degrees are emitted so the oracle certifies the peel
    * CHAIN, not one fixpoint). The raw ≥3-shared copurchase graph is
    * near-complete (probed: min degree n−2 at every SF — k-core would
    * be vacuous), so the graph first sparsifies DETERMINISTICALLY to
    * the top 4·|nodes| pairs by (shared DESC, s1, s2) — the affinity
    * backbone, the same sparsify-then-analyze posture as
    * graph_triangle_count. Probed peel at the three SFs:
    * 94→52→51 nodes (sf0.01), 981→634→544 (sf0.1) — genuinely
    * multi-round everywhere.
    *
    * Scale shape: pair generation reuses the capped machinery
    * (Σdf² under PairDegreeCap, never corpus²); the backbone election
    * runs WITHOUT ordering the pair frame in any single task: a
    * value-domain histogram of `shared` (≤ |distinct counts| rows —
    * bounded by the co-occurrence domain, never by pair volume)
    * admits whole values inside the 4n budget, and only the ONE
    * boundary value refines by (s1, s2) through [[DistributedRank]]'s
    * 3-level prefix-sum; each peel round is one semi-join + one count
    * aggregate on the shrinking edge set — O(edges) per round, the
    * peeling promise. */
  def graphKcorePeel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = 6
    val incidence = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    // CUT, not mark (r18): the election subtree broadcasts bnd,
    // fullVals and DistributedRank's internals as CONCURRENT futures,
    // and each future racing an unmaterialized persist recomputes the
    // whole C(deg,2) pair build — the eager checkpoint materializes it
    // exactly once
    val pairs = graft.PlanOnly.cut(supplierSets(incidence, PairDegreeCap)
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("shared")))
    // |nodes| from the capped incidence directly — identical to the
    // oracle's count(DISTINCT l_suppkey) FROM pp and far cheaper than
    // re-expanding the pair machinery a second time
    val okParts = incidence.groupBy($"l_partkey")
      .agg(count(lit(1)).as("d")).filter($"d" <= PairDegreeCap)
      .select($"l_partkey")
    val nSup = incidence.join(okParts, Seq("l_partkey"), "left_semi")
      .agg(countDistinct($"l_suppkey").as("n"))
    // top-4n under (shared DESC, s1, s2) with no single-partition pass
    // over the pair frame: whole shared-values whose strictly-greater
    // census already fits the budget admit by semi-join; the (at most
    // one) boundary value ranks its pairs by (s1, s2) distributed
    val histW = Window.orderBy($"shared".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // marked: the ≤|distinct counts|-row histogram carries the nSup
    // aggregate (a lineitem-scan chain) and feeds fullVals, the
    // boundary row, AND DistributedRank's two internal passes —
    // unmarked it recomputes that chain once per consumer
    val hist = graft.PlanOnly.cut(
      pairs.groupBy($"shared").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(nSup))
        .withColumn("above", coalesce(sum($"cnt").over(histW), lit(0L)))
        .withColumn("budget", lit(4L) * $"n"))
    val fullVals = hist.filter($"above" + $"cnt" <= $"budget")
      .select($"shared")
    val bnd = hist
      .filter($"above" < $"budget" && $"above" + $"cnt" > $"budget")
      .select($"shared", ($"budget" - $"above").as("need")) // ≤1 row
    // marked: DistributedRank reads its input twice (bounds pass +
    // bucketed-rows fill) — unmarked, each pass re-runs the 500k-row
    // broadcast join against the pair cache
    val bndPairs = graft.PlanOnly.cut(
      pairs.join(broadcast(bnd), Seq("shared")).withColumn("one", lit(1L)))
    val bndTop = DistributedRank
      .rankCum(bndPairs, "s1", "s2", "one")
      .filter($"rnk" <= $"need")
    // marked: both orientations of the edge union read this frame
    val top = graft.PlanOnly.mark(
      pairs.join(broadcast(fullVals), Seq("shared"), "left_semi")
        .select($"s1", $"s2")
        .unionByName(bndTop.select($"s1", $"s2")))
    // lineage CUT, not just a cache mark: the peel rounds nest this
    // frame's logical plan ~6× (d0→a1→d1→a2→d2 + the 3-way final
    // join), and the election subtree (histogram + DistributedRank)
    // made each downstream action re-ANALYZE a tree that size — a
    // driver-side planning blowup measured at ~2× the key's whole
    // runtime. Checkpointing the 8·n-row edge frame truncates every
    // downstream plan to the small peel shape.
    // Fanout inside the cut (r19): the union of two 32+-partition
    // parents checkpointed as ~97 partitions of a ~8n-row frame — every
    // peel job then launched ~97 near-empty tasks. Re-hash by s1 to the
    // session parallelism (the degrees() semi-joins and aggregates key
    // on s1, so the spread also matches their distribution).
    val edges = graft.PlanOnly.cut(Fanout.byKey(
      top.unionByName(top.select($"s2".as("s1"), $"s1".as("s2"))), $"s1"))
    def degrees(alive: DataFrame): DataFrame = edges
      .join(alive, Seq("s1"), "left_semi")
      .join(alive.select($"s1".as("s2")), Seq("s2"), "left_semi")
      .groupBy($"s1").agg(count(lit(1)).as("deg"))
    // cut, not mark (r19, X6): the final 3-way join broadcasts the d1
    // and d2 subtrees as concurrent futures while the probe reads d0 —
    // three racers on d0's lazy persist (and two on d1's) re-run the
    // degree aggregates per racer; both frames are node-scale, so each
    // eager checkpoint is one tiny job
    val d0 = graft.PlanOnly.cut(
      edges.groupBy($"s1").agg(count(lit(1)).as("deg")))
    val a1 = d0.filter($"deg" >= K).select($"s1")
    val d1 = graft.PlanOnly.cut(degrees(a1))
    val a2 = d1.filter($"deg" >= K).select($"s1")
    val d2 = degrees(a2)
    d0.select($"s1".as("supplier"), $"deg".as("deg_r0"))
      .join(d1.select($"s1".as("supplier"), $"deg".as("deg_r1")),
        Seq("supplier"), "left")
      .join(d2.select($"s1".as("supplier"), $"deg".as("deg_r2")),
        Seq("supplier"), "left")
      .select($"supplier", $"deg_r0",
        coalesce($"deg_r1", lit(-1L)).as("deg_r1"),
        coalesce($"deg_r2", lit(-1L)).as("deg_r2"),
        when(coalesce($"deg_r2", lit(-1L)) >= K, 1L).otherwise(0L)
          .as("in_core"))
      .orderBy($"supplier")
  }

  /** Time-to-convert per impression — the FORWARD as-of the existing
    * asof keys don't cover (they look back; attribution looks ahead):
    * for every view event, the user's NEXT purchase timestamp and the
    * gap in whole minutes (−1 when the user never converts after it).
    * This is the label-construction step of a conversion-latency model
    * and the direct input to time-to-event analyses.
    *
    * Scale shape: one user_id shuffle; the "next purchase" is a
    * conditional min over the STRICTLY-FOLLOWING window frame — no
    * self-join of the event log against itself, which is the naive
    * formulation's O(views·purchases) per user. */
  /** One BORŮVKA round + STAR CONTRACTION over the weighted copurchase
    * graph — the distributed-MST building block (Borůvka 1926; the
    * GraphX/Pregel MSF inner loop): every node of the capped ≥3-shared
    * supplier graph elects its best incident edge (max shared, then
    * smallest neighbor — the deterministic tie-break Borůvka needs to
    * avoid cycles), and the star-contraction pointer
    * rep(u) = min(u, p(u), p(p(u))) folds elected stars toward their
    * minima — after O(log n) such rounds components stabilize; ONE
    * round is graded so the hash certifies the election AND the
    * two-hop contraction exactly.
    *
    * Scale shape: the election is one (node) aggregate over the capped
    * pair frame (both orientations); the contraction is two
    * self-equi-joins of the |nodes|-row pointer frame — O(V + E), the
    * Borůvka promise, never a sort. */
  def graphBoruvkaStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val incidence = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val pairs = supplierSets(incidence, PairDegreeCap)
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 3)
    val both = pairs.select($"s1".as("u"), $"s2".as("v"), $"shared")
      .unionAll(pairs.select($"s2".as("u"), $"s1".as("v"), $"shared"))
    // best incident edge per node: (shared DESC, v ASC) via struct-max
    // on (shared, -v) — one aggregate, no window
    // cut, not mark (r18): the pointer self-join's broadcast side
    // would race a lazy persist and recompute the whole pair build
    val elect = graft.PlanOnly.cut(both
      .groupBy($"u")
      .agg(max(struct($"shared", (-$"v").as("nv"))).as("best"))
      .select($"u", $"best.shared".as("shared"), (-$"best.nv").as("p")))
    val rep = elect.as("e1")
      .join(elect.select($"u".as("p"), $"p".as("pp")).as("e2"), Seq("p"))
      .select($"u", $"shared", $"p", least($"u", $"p", $"pp").as("rep"))
    rep.orderBy($"u")
  }

  /** U-SHAPED MULTI-TOUCH ATTRIBUTION — the position-based credit
    * model (40/20/40) marketing analytics runs instead of last-touch:
    * every view/click is assigned to the user's NEXT purchase (the
    * [[behaviorTimeToConvert]] forward as-of, so each journey is the
    * touch run between conversions), and within a journey the first
    * and last touch take 400 000 ppm each while the middles split the
    * remaining 200 000 by truncating division — the integer REMAINDER
    * goes to the earliest middle touch, so per-journey credit sums to
    * exactly 1 000 000 (the Hamilton-exactness posture of
    * corpus_token_budget). 1-touch journeys take the full million,
    * 2-touch journeys split 500 000/500 000. Purchase identity at a
    * tied (user, t) resolves to the min event_id on both engines.
    *
    * Scale shape: two windows, both entity-partitioned (per-user
    * forward as-of, then per-journey rank/count at touch grain) — no
    * global sort, no self-join of the raw log; the purchase-id
    * resolution is a co-partitioned equi-join on (user, t). */
  def behaviorMultitouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"event_type")
    val wFwd = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    val touches = e
      .withColumn("np_t",
        min(when($"event_type" === "purchase", $"t")).over(wFwd))
      .filter($"event_type".isin("view", "click") && $"np_t".isNotNull)
      .select($"user_id", $"event_id".as("touch_event_id"), $"t",
        $"event_type".as("touch_type"), $"np_t")
    val purchases = e.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"t")
      .agg(min($"event_id").as("purchase_event_id"))
    val wJ = Window.partitionBy($"purchase_event_id")
      .orderBy($"t", $"touch_event_id")
    val wN = Window.partitionBy($"purchase_event_id")
    touches
      .join(purchases.withColumnRenamed("t", "np_t"), Seq("user_id", "np_t"))
      .withColumn("touch_rank", row_number().over(wJ).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wN))
      .withColumn("credit_ppm", expr(
        """CASE WHEN n_touches = 1 THEN 1000000
          |  WHEN n_touches = 2 THEN 500000
          |  WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400000
          |  WHEN touch_rank = 2 THEN 200000 div (n_touches - 2)
          |    + 200000 - (n_touches - 2) * (200000 div (n_touches - 2))
          |  ELSE 200000 div (n_touches - 2) END""".stripMargin))
      .select($"purchase_event_id", $"touch_event_id", $"user_id",
        $"touch_type", $"touch_rank", $"n_touches", $"credit_ppm")
      .orderBy($"purchase_event_id", $"touch_event_id")
  }

  def behaviorTimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"event_type")
      .withColumn("next_purchase_t",
        min(when($"event_type" === "purchase", $"t")).over(w))
      .filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"t",
        coalesce($"next_purchase_t", lit(-1L)).as("next_purchase_t"),
        when($"next_purchase_t".isNull, -1L)
          .otherwise(expr("(next_purchase_t - t) div 60000000"))
          .as("gap_minutes"))
      .orderBy($"event_id")
  }

  /** RFM segmentation — the classic behavioral customer partition:
    * Recency (last active day), Frequency (event count), Monetary
    * (summed purchase value, ·10⁴ fixed point) per user, each scored
    * into quintiles by `ntile(5)` over a TOTAL order (metric then
    * user_id — ntile is deterministic only under a total order, and
    * both engines implement the SQL-standard first-(n mod 5)-buckets-
    * get-the-extra-row split), then packed into the familiar 3-digit
    * RFM code (555 = best). Score direction: higher metric ⇒ higher
    * score, so R5 is most-recently-active.
    *
    * Scale shape: one user-grain aggregate (map-side combinable) over
    * the event log; the three metrics then MELT into one
    * (user, metric, value) frame so a SINGLE
    * [[graft.operators.DistributedRank.rankCumBy]] pass (metric =
    * group key) computes all three exact global ranks via the
    * multi-level prefix-sum decomposition — no single-partition
    * window over the |users| frame, and one decomposition instead of
    * three chained ones. Quintiles come from the SQL-standard ntile
    * arithmetic inverted from the rank
    * ([[graft.operators.DistributedRank.ntileFromRank]]); the final
    * user-grain regroup re-assembles scores and metrics without a
    * join. The oracle replays plain `ntile(5) OVER (ORDER BY metric,
    * user_id)` ×3; the hash-match proves rank-arithmetic ≡ window
    * ntile. */
  def behaviorRfmSegmentation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"), $"event_type",
        $"value")
      .groupBy($"user_id")
      .agg(max(expr("t div 86400000000")).as("r_day"),
        count(lit(1)).as("f_events"),
        sum(when($"event_type" === "purchase",
          coalesce((Tables.dec4($"value") * 10000).cast("long"), lit(0L)))
          .otherwise(0L)).as("m_fp"))
    val melted = base
      .select($"user_id", explode(array(
        struct(lit(1L).as("m"), $"r_day".as("v")),
        struct(lit(2L).as("m"), $"f_events".as("v")),
        struct(lit(3L).as("m"), $"m_fp".as("v")))).as("mv"))
      .select($"user_id", $"mv.m".as("m"), $"mv.v".as("v"))
      .withColumn("one", lit(1L))
    DistributedRank.rankCumBy(melted, "m", "v", "user_id", "one")
      .withColumn("score",
        DistributedRank.ntileFromRank("rnk", "w_total", 5))
      .groupBy($"user_id")
      .agg(max(when($"m" === 1, $"v")).as("r_day"),
        max(when($"m" === 2, $"v")).as("f_events"),
        max(when($"m" === 3, $"v")).as("m_fp"),
        max(when($"m" === 1, $"score")).as("r_score"),
        max(when($"m" === 2, $"score")).as("f_score"),
        max(when($"m" === 3, $"score")).as("m_score"))
      .select($"user_id", $"r_day", $"f_events", $"m_fp",
        $"r_score", $"f_score", $"m_score",
        ($"r_score" * 100 + $"f_score" * 10 + $"m_score").as("rfm_code"))
      .orderBy($"user_id")
  }

  /** Longest consecutive-active-day streak per user — the gaps-and-
    * islands pattern applied to engagement: distinct active days,
    * day − row_number() as the island key (consecutive days share it),
    * island lengths, and the per-user argmax election (longest streak,
    * earliest start on ties — the max-struct with negated start).
    *
    * Scale shape: one user_id shuffle serves the day-dedup, the
    * row_number window, the island aggregate, and the final election —
    * every frame after the dedup is entity-scale. */
  def behaviorLongestStreak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day")
    Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"))
      .select($"user_id", expr("t div 86400000000").as("day"))
      .distinct()
      .withColumn("grp", $"day" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"day").as("start"))
      .groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"),
        max(struct($"len", (-$"start").as("ns"))).as("best"))
      .select($"user_id", $"n_active_days",
        $"best.len".as("longest_streak"),
        (-$"best.ns").as("streak_start_day"))
      .orderBy($"user_id")
  }

  /** Point-in-time feature snapshot — the feature-store join discipline
    * that prevents label leakage: for every PURCHASE event, the user's
    * state STRICTLY BEFORE it (prior event count, prior view count,
    * the immediately-preceding value, days since first seen) — each a
    * window over rows [unbounded, 1 preceding], never the current row.
    * This is the training-set builder for a propensity model: the
    * label row never sees itself or its future.
    *
    * Scale shape: ONE user_id shuffle; all four features ride the same
    * (t, event_id) window sort; the purchase filter applies after
    * feature computation (a filtered window would corrupt the "all
    * prior events" semantics). */
  def featurePitSnapshot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"event_type",
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .withColumn("n_prior_events",
        coalesce(count(lit(1)).over(wPrior), lit(0L)))
      .withColumn("n_prior_views",
        coalesce(sum(when($"event_type" === "view", 1L).otherwise(0L))
          .over(wPrior), lit(0L)))
      .withColumn("prev_v_fp", coalesce(lag($"v_fp", 1).over(w), lit(-1L)))
      .withColumn("days_since_first",
        expr("t div 86400000000") - min(expr("t div 86400000000")).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"t", $"n_prior_events",
        $"n_prior_views", $"prev_v_fp", $"days_since_first")
      .orderBy($"event_id")
  }

  /** First-order transition matrix over each user's event sequence —
    * the Markov-chain view of a clickstream (what follows what, and
    * how often). One user_id shuffle: lag() over the per-user order
    * pairs consecutive events, then a (prev, next) count with map-side
    * combine — shuffle two: ≤ |types|² rows total. The self-join
    * formulation (e ⋈ e on adjacent ranks) moves the event log twice
    * for the same answer. */
  def aggTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"event_type")
      .select($"event_type".as("next_type"),
        lag($"event_type", 1).over(w).as("prev_type"))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"prev_type", $"next_type")
  }

  /** Growth accounting: per (event type, day), how many users appear
    * for the FIRST time, and the running distinct-user total — the
    * "cumulative distinct" that a naive count(DISTINCT) over an
    * expanding window would recompute quadratically. Shape: first-seen
    * day per (type, user) is one partial-agg min (shuffle carries one
    * row per (type, user)); daily news collapse to ≤ types × days
    * rows; the cumulative sum is a window over that tiny frame. At
    * 100 TB nothing past the first aggregate sees more than the
    * user-dimension cardinality. */
  def windowCumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = Tables.events(spark, dir)
      .select($"event_type", $"user_id", Tables.nsToUs($"ts").as("t"))
      .select($"event_type", $"user_id", expr("t div 86400000000").as("day"))
      .groupBy($"event_type", $"user_id")
      .agg(min($"day").as("first_day"))
    val news = firstSeen.groupBy($"event_type", $"first_day".as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    news.select($"event_type", $"day", $"new_users",
        sum($"new_users").over(w).as("cum_users"))
      .orderBy($"event_type", $"day")
  }

  /** Contiguous event-pattern detection per user — the MATCH_RECOGNIZE
    * shape: each user's event-type stream (ordered by time) is scanned
    * for the exact consecutive run view→click→purchase, with no other
    * event in between (funnel_conversion answers the subsequence
    * question; this answers the stricter adjacency one a
    * sessionized-intent model asks). The stream is folded into a
    * '>'-delimited string — no event type is a substring of another, so
    * string containment IS sequence containment — and occurrences are
    * counted by length difference under non-overlapping replace
    * (identical semantics in both engines); the division is by a
    * constant pattern length, exact on integers.
    *
    * Scale shape: one user_id shuffle into a sorted in-group fold
    * (sort_array + transform, the timeseries_ewma_fixed posture);
    * per-user state is the bounded per-entity event count. Output is
    * one row per user. */
  def behaviorSequenceMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "view>click>purchase"
    Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("t"), $"event_id",
        $"event_type")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"t", $"event_id", $"event_type")))
        .as("seq"))
      .select($"user_id",
        size($"seq").cast("long").as("n_events"),
        expr("array_join(transform(seq, x -> x.event_type), '>')").as("s"))
      .select($"user_id", $"n_events",
        expr(s"(length(s) - length(replace(s, '$pat', ''))) div ${pat.length}")
          .cast("long").as("n_matches"),
        // instr is 1-based and 0 when absent; −1 sentinel keeps the
        // "no match" case away from any real position
        coalesce(nullif(instr($"s", pat), lit(0)), lit(-1)).cast("long")
          .as("first_pos"))
      .orderBy($"user_id")
  }

  /** STRONGLY-CONNECTED-COMPONENT membership by the FORWARD–BACKWARD
    * pivot step (Fleischer–Hendrickson–Pinar 2000) — the round every
    * distributed SCC decomposition is built from, hop-bounded at 4 on
    * each side (the honest distributed contract: a k-round reachability
    * certificate, the same budget-per-round shape as graph_bfs_reach).
    * The DIRECTED trade graph: supplier → customer for every supplied
    * lineitem, customer → supplier for every RETURNED one
    * (l_returnflag = 'R') — returns close the cycles that make SCCs
    * non-trivial. Pivot = the minimum source node (the smallest
    * customer with a return, since only return edges leave customers
    * and customer ids sit below the supplier-id offset). Output = the
    * pivot's mutual 4-hop reach set — forward distance, backward
    * distance, and the set size as a receipt; the oracle replays both
    * reachabilities as depth-bounded recursive CTEs.
    *
    * Scale shape: edges collapse to distinct pairs map-side; each of
    * the 8 rounds is one frontier equi-join + min-aggregate with a
    * per-round lineage cut — round cost tracks the frontier, and the
    * FW/BW intersection is an equi-join on node id. The supplier-id
    * offset (2⁴⁰) is a fixture-domain namespace split, not a packing
    * trick — custkey stays below it to SF ≈ 7×10⁹, far past any
    * fixture; at production scale the two id spaces union under a
    * typed node key. */
  def graphSccPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_orderkey", $"l_returnflag")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
    def buildEdges(): DataFrame =
      li.select(($"l_suppkey" + 1099511627776L).as("a"), $"o_custkey".as("b"))
        .unionAll(li.filter($"l_returnflag" === "R")
          .select($"o_custkey".as("a"), ($"l_suppkey" + 1099511627776L).as("b")))
        .distinct()
    // graded: ONE CHECKPOINTED edge frame shared by all 8 rounds (cut,
    // not mark, r18: both reach directions fork onto threads below and
    // a lazy persist would race its first materialization; the eager
    // checkpoint also truncates every hop's analyzed plan). Plan-only:
    // cuts are identity, so each consumer builds its OWN dag — same
    // plan shape, fresh exprIds, no ambiguous-self-join trip.
    val sharedEdges =
      if (graft.PlanOnly.enabled) null else graft.PlanOnly.cut(buildEdges())
    def edgesF(): DataFrame =
      if (graft.PlanOnly.enabled) buildEdges() else sharedEdges
    def reach(reverse: Boolean): DataFrame = {
      val ed0 = edgesF()
      val ed = if (reverse) ed0.select($"b".as("a"), $"a".as("b")) else ed0
      var r = graft.PlanOnly.cut(edgesF().agg(min($"a").as("pv"))
        .select($"pv".as("id"), lit(0L).as("dist")))
      // plan-only: ONE unexecuted round (the iterative-key contract —
      // graded runs always run all 4 hops)
      val hops = if (graft.PlanOnly.enabled) 1 else 4
      for (h <- 1 to hops) {
        val frontier = r.filter($"dist" === (h - 1).toLong)
        val next = frontier.join(ed, frontier("id") === ed("a"))
          .select(ed("b").as("id"), lit(h.toLong).as("dist"))
        r = graft.PlanOnly.cut(
          r.unionAll(next).groupBy($"id").agg(min($"dist").as("dist")))
      }
      r
    }
    // independent reach directions over the checkpointed edges —
    // overlap their per-hop jobs (Par rationale; results unchanged)
    val (fwd, bwd) = Par.both(
      reach(reverse = false).withColumnRenamed("dist", "fwd_dist"),
      reach(reverse = true).withColumnRenamed("dist", "bwd_dist"))
    val scc = fwd.join(bwd, Seq("id"))
    scc.crossJoin(broadcast(scc.agg(count(lit(1)).as("scc_size"))))
      .select($"id".as("node_id"), $"fwd_dist", $"bwd_dist", $"scc_size")
      .orderBy($"node_id")
  }

  /** FULL SCC DECOMPOSITION by iterated FORWARD–BACKWARD with trimming
    * (Fleischer–Hendrickson–Pinar 2000; trim from Hong–Rodia–Olukotun
    * 2013) — the loop [[graphSccPivot]] is the single round of, run on
    * the same directed trade graph (supplier → customer per lineitem,
    * customer → supplier per RETURNED one, 2⁴⁰ supplier-id namespace).
    * Three rounds; each round (1) TRIMS in one pass — residual nodes
    * without both an incoming and an outgoing induced edge are trivial
    * SCCs and leave the graph, (2) elects the pivot (min kept node),
    * (3) runs the 4-hop FW and BW reachabilities over the trimmed
    * induced graph (the same hop-bounded certificate contract as
    * graph_bfs_reach), (4) removes FW ∩ BW as that round's SCC. The
    * output is the per-round RECEIPT table — residual size, trimmed
    * count, pivot, FW/BW/SCC sizes, remainder — so a user audits the
    * decomposition's convergence round by round; the oracle replays
    * all three rounds as depth-bounded recursive CTEs.
    *
    * Scale shape: trimming is two semi-joins + two distinct projections
    * per round; each BFS hop is one frontier equi-join + min-aggregate
    * with a lineage cut — round cost tracks frontier and residual
    * sizes, and both shrink monotonically (trim removes the acyclic
    * fringe that dominates real graphs before any BFS runs). Rounds
    * and hops are bounded constants, so the whole decomposition is a
    * fixed number of shuffles regardless of graph size. */
  def graphSccDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_orderkey", $"l_returnflag")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
    def buildEdges(): DataFrame =
      li.select(($"l_suppkey" + 1099511627776L).as("a"), $"o_custkey".as("b"))
        .unionAll(li.filter($"l_returnflag" === "R")
          .select($"o_custkey".as("a"), ($"l_suppkey" + 1099511627776L).as("b")))
        .distinct()
    val sharedEdges =
      if (graft.PlanOnly.enabled) null else graft.PlanOnly.mark(buildEdges())
    def edgesF(): DataFrame =
      if (graft.PlanOnly.enabled) buildEdges() else sharedEdges
    def cnt(df: DataFrame, as: String): DataFrame =
      df.agg(count(lit(1)).cast("long").as(as))
    var residual = graft.PlanOnly.cut(
      edgesF().select($"a".as("id"))
        .unionAll(edgesF().select($"b".as("id"))).distinct())
    val rounds = if (graft.PlanOnly.enabled) 1 else 3
    var stats: DataFrame = null
    for (r <- 1 to rounds) {
      // one-pass trim: induced edges on the residual, keep nodes with
      // >= 1 outgoing AND >= 1 incoming induced edge
      val er = graft.PlanOnly.cut(edgesF()
        .join(residual.select($"id".as("a")), Seq("a"), "left_semi")
        .join(residual.select($"id".as("b")), Seq("b"), "left_semi"))
      val kept = graft.PlanOnly.cut(residual
        .join(er.select($"a".as("id")).distinct(), Seq("id"), "left_semi")
        .join(er.select($"b".as("id")).distinct(), Seq("id"), "left_semi"))
      def buildE2(): DataFrame = er
        .join(kept.select($"id".as("a")), Seq("a"), "left_semi")
        .join(kept.select($"id".as("b")), Seq("b"), "left_semi")
      // cut, not mark (r18): both reach directions fork onto threads
      // below — an eager checkpoint materializes e2 ONCE up front,
      // where a lazy persist would race its first materialization
      val sharedE2 =
        if (graft.PlanOnly.enabled) null else graft.PlanOnly.cut(buildE2())
      def e2F(): DataFrame =
        if (graft.PlanOnly.enabled) buildE2() else sharedE2
      def reach(reverse: Boolean): DataFrame = {
        val ed0 = e2F()
        val ed = if (reverse) ed0.select($"b".as("a"), $"a".as("b")) else ed0
        var rf = graft.PlanOnly.cut(kept.agg(min($"id").as("pv"))
          .filter($"pv".isNotNull)
          .select($"pv".as("id"), lit(0L).as("dist")))
        val hops = if (graft.PlanOnly.enabled) 1 else 4
        for (h <- 1 to hops) {
          val next = rf.filter($"dist" === (h - 1).toLong)
            .select($"id".as("a"))
            .join(ed, Seq("a"))
            .select($"b".as("id"), lit(h.toLong).as("dist"))
          rf = graft.PlanOnly.cut(
            rf.unionAll(next).groupBy($"id").agg(min($"dist").as("dist")))
        }
        rf
      }
      // the forward and backward reachabilities are independent given
      // kept/e2 (e2 checkpointed eagerly above) — overlap their
      // per-hop checkpoint jobs (Par rationale; results unchanged)
      val (fw, bw) = Par.both(reach(reverse = false), reach(reverse = true))
      val scc = graft.PlanOnly.cut(fw.select($"id")
        .join(bw.select($"id"), Seq("id"), "left_semi"))
      val stat = cnt(residual, "n_residual")
        .crossJoin(cnt(kept, "n_kept"))
        .crossJoin(kept.agg(coalesce(min($"id"), lit(-1L)).as("pivot_id")))
        .crossJoin(cnt(fw, "fw_size"))
        .crossJoin(cnt(bw, "bw_size"))
        .crossJoin(cnt(scc, "scc_size"))
        .select(lit(r.toLong).as("round"), $"n_residual",
          ($"n_residual" - $"n_kept").as("n_trimmed"), $"pivot_id",
          $"fw_size", $"bw_size", $"scc_size",
          ($"n_kept" - $"scc_size").as("n_remaining"))
      stats = if (stats == null) stat else stats.unionAll(stat)
      residual = graft.PlanOnly.cut(kept.join(scc, Seq("id"), "left_anti"))
    }
    stats.orderBy($"round")
  }

  val queries: Map[String, QueryFn] = Map(
    "graph_scc_decompose" -> (graphSccDecompose(_, _)),
    "graph_scc_pivot" -> (graphSccPivot(_, _)),
    "behavior_sequence_match" -> (behaviorSequenceMatch(_, _)),
    "funnel_conversion" -> (funnelConversion(_, _)),
    "retention_cohort" -> (retentionCohort(_, _)),
    "agg_transition_matrix" -> (aggTransitionMatrix(_, _)),
    "window_cumulative_distinct" -> (windowCumulativeDistinct(_, _)),
    "graph_copurchase_pairs" -> (graphCopurchasePairs(_, _)),
    "graph_node_jaccard" -> (graphNodeJaccard(_, _)),
    "graph_resource_allocation" -> (graphResourceAllocation(_, _)),
    "behavior_time_to_convert" -> (behaviorTimeToConvert(_, _)),
    "behavior_multitouch_attribution" -> (behaviorMultitouchAttribution(_, _)),
    "graph_boruvka_star" -> (graphBoruvkaStar(_, _)),
    "graph_assortativity_stats" -> (graphAssortativityStats(_, _)),
    "graph_kcore_peel" -> (graphKcorePeel(_, _)),
    "graph_label_propagation" -> (graphLabelPropagation(_, _)),
    "behavior_rfm_segmentation" -> (behaviorRfmSegmentation(_, _)),
    "behavior_longest_streak" -> (behaviorLongestStreak(_, _)),
    "feature_pit_snapshot" -> (featurePitSnapshot(_, _))
  )

  /** The three FW–BW + trim rounds unrolled: per round, the one-pass
    * trim as IN-subqueries over the induced edge set, both 4-hop
    * reachabilities as depth-bounded recursive CTEs, and the residual
    * handed to the next round by NOT IN over the elected SCC. */
  private def sccDecomposeOracle: String = {
    def round(r: Int): String = {
      val n = r + 1
      s"""er_$r AS MATERIALIZED (SELECT src, dst FROM edges
         |  WHERE src IN (SELECT id FROM res_$r)
         |    AND dst IN (SELECT id FROM res_$r)),
         |kept_$r AS MATERIALIZED (SELECT id FROM res_$r
         |  WHERE id IN (SELECT src FROM er_$r)
         |    AND id IN (SELECT dst FROM er_$r)),
         |e2_$r AS MATERIALIZED (SELECT src, dst FROM er_$r
         |  WHERE src IN (SELECT id FROM kept_$r)
         |    AND dst IN (SELECT id FROM kept_$r)),
         |p_$r AS (SELECT min(id) AS pv FROM kept_$r),
         |fwd_$r AS (SELECT pv AS id, 0 AS d FROM p_$r WHERE pv IS NOT NULL
         |  UNION SELECT e.dst, fwd_$r.d + 1 FROM fwd_$r
         |    JOIN e2_$r e ON fwd_$r.id = e.src WHERE fwd_$r.d < 4),
         |bwd_$r AS (SELECT pv AS id, 0 AS d FROM p_$r WHERE pv IS NOT NULL
         |  UNION SELECT e.src, bwd_$r.d + 1 FROM bwd_$r
         |    JOIN e2_$r e ON bwd_$r.id = e.dst WHERE bwd_$r.d < 4),
         |f2_$r AS (SELECT id FROM fwd_$r GROUP BY id),
         |b2_$r AS (SELECT id FROM bwd_$r GROUP BY id),
         |scc_$r AS (SELECT f2_$r.id FROM f2_$r
         |  JOIN b2_$r ON f2_$r.id = b2_$r.id),
         |st_$r AS (SELECT $r AS round,
         |  (SELECT count(*) FROM res_$r) AS n_residual,
         |  (SELECT count(*) FROM res_$r)
         |    - (SELECT count(*) FROM kept_$r) AS n_trimmed,
         |  (SELECT coalesce(min(id), -1) FROM kept_$r) AS pivot_id,
         |  (SELECT count(*) FROM f2_$r) AS fw_size,
         |  (SELECT count(*) FROM b2_$r) AS bw_size,
         |  (SELECT count(*) FROM scc_$r) AS scc_size,
         |  (SELECT count(*) FROM kept_$r)
         |    - (SELECT count(*) FROM scc_$r) AS n_remaining),
         |res_$n AS MATERIALIZED (SELECT id FROM kept_$r
         |  WHERE id NOT IN (SELECT id FROM scc_$r))""".stripMargin
    }
    s"""WITH RECURSIVE
       |li AS MATERIALIZED (SELECT l_suppkey AS s, o_custkey AS c,
       |    l_returnflag
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT 1099511627776 + s AS src, c AS dst FROM li
       |  UNION ALL
       |  SELECT c AS src, 1099511627776 + s AS dst FROM li
       |  WHERE l_returnflag = 'R')),
       |res_1 AS MATERIALIZED (SELECT DISTINCT id FROM (
       |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT CAST(round AS BIGINT) AS round,
       |  CAST(n_residual AS BIGINT) AS n_residual,
       |  CAST(n_trimmed AS BIGINT) AS n_trimmed,
       |  CAST(pivot_id AS BIGINT) AS pivot_id,
       |  CAST(fw_size AS BIGINT) AS fw_size,
       |  CAST(bw_size AS BIGINT) AS bw_size,
       |  CAST(scc_size AS BIGINT) AS scc_size,
       |  CAST(n_remaining AS BIGINT) AS n_remaining
       |FROM (SELECT * FROM st_1 UNION ALL SELECT * FROM st_2
       |  UNION ALL SELECT * FROM st_3)
       |ORDER BY round""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // the iterated FW–BW rounds unrolled (see sccDecomposeOracle)
    "graph_scc_decompose" -> sccDecomposeOracle,
    // both reachabilities replayed as depth-bounded recursive CTEs;
    // UNION-dedup + the min-distance fold match the frontier rounds
    "graph_scc_pivot" ->
      """WITH RECURSIVE
        |li AS (SELECT l_suppkey AS s, o_custkey AS c, l_returnflag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |  SELECT 1099511627776 + s AS src, c AS dst FROM li
        |  UNION ALL
        |  SELECT c AS src, 1099511627776 + s AS dst FROM li
        |  WHERE l_returnflag = 'R')),
        |p AS (SELECT min(src) AS pv FROM edges),
        |fwd AS (
        |  SELECT (SELECT pv FROM p) AS id, 0 AS d
        |  UNION
        |  SELECT e.dst, fwd.d + 1 FROM fwd JOIN edges e ON fwd.id = e.src
        |  WHERE fwd.d < 4),
        |bwd AS (
        |  SELECT (SELECT pv FROM p) AS id, 0 AS d
        |  UNION
        |  SELECT e.src, bwd.d + 1 FROM bwd JOIN edges e ON bwd.id = e.dst
        |  WHERE bwd.d < 4),
        |f2 AS (SELECT id, CAST(min(d) AS BIGINT) AS fwd_dist
        |  FROM fwd GROUP BY id),
        |b2 AS (SELECT id, CAST(min(d) AS BIGINT) AS bwd_dist
        |  FROM bwd GROUP BY id),
        |scc AS (SELECT f2.id, fwd_dist, bwd_dist
        |  FROM f2 JOIN b2 ON f2.id = b2.id)
        |SELECT id AS node_id, fwd_dist, bwd_dist,
        |  (SELECT CAST(count(*) AS BIGINT) FROM scc) AS scc_size
        |FROM scc ORDER BY node_id""".stripMargin,
    // string_agg with ORDER BY replays the sorted fold; replace-count
    // and strpos have identical literal semantics in both engines
    "behavior_sequence_match" ->
      """WITH s AS (SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    string_agg(event_type, '>'
        |      ORDER BY epoch_us(ts), event_id) AS s
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST((length(s) - length(replace(s, 'view>click>purchase', '')))
        |    // 19 AS BIGINT) AS n_matches,
        |  CAST(CASE WHEN strpos(s, 'view>click>purchase') = 0 THEN -1
        |    ELSE strpos(s, 'view>click>purchase') END AS BIGINT)
        |    AS first_pos
        |FROM s ORDER BY user_id""".stripMargin,
    "agg_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |p AS (SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS prev_type FROM e)
        |SELECT prev_type, next_type, count(*) AS n
        |FROM p WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,
    "window_cumulative_distinct" ->
      """WITH f AS (SELECT event_type, user_id,
        |    min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY event_type, user_id),
        |n AS (SELECT event_type, first_day AS day,
        |    count(*) AS new_users FROM f GROUP BY event_type, first_day)
        |SELECT event_type, day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day)
        |    AS BIGINT) AS cum_users
        |FROM n ORDER BY event_type, day""".stripMargin,
    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |u AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN t END) AS fv
        |      FROM e GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.t) AS qc
        |      FROM e JOIN u ON e.user_id = u.user_id
        |      WHERE e.event_type = 'click' AND e.t > u.fv GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.t) AS qp
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.t > c.qc GROUP BY e.user_id)
        |SELECT '1_view' AS stage,
        |  (SELECT count(*) FROM u WHERE fv IS NOT NULL) AS users
        |UNION ALL SELECT '2_view_click', (SELECT count(*) FROM c)
        |UNION ALL SELECT '3_view_click_purchase', (SELECT count(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "retention_cohort" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
        |           FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id)
        |SELECT c.cohort AS cohort_week, e.wk - c.cohort AS week_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    // the oracle mirrors PairDegreeCap exactly (ADVICE r12): parts over
    // the cap are excluded from PAIRING on both engines, so engine and
    // oracle stay equivalent on ALL inputs, not just the fixture's
    // 52-supplier-max headroom
    "graph_copurchase_pairs" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey))
        |SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS shared_parts
        |FROM pp a JOIN pp b
        |  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY shared_parts DESC, s1, s2""".stripMargin,
    // same strictly-following conditional-min frame; whole-minute gap
    // via truncating div on both engines
    // same capped pair grid; the election is the (shared DESC, v)
    // argmax and the contraction a two-hop pointer join
    "graph_boruvka_star" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |pr AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |bo AS (SELECT s1 AS u, s2 AS v, shared FROM pr
        |  UNION ALL SELECT s2, s1, shared FROM pr),
        |el AS (SELECT u, shared, v AS p FROM (SELECT u, v, shared,
        |    row_number() OVER (PARTITION BY u ORDER BY shared DESC, v)
        |      AS rn FROM bo) WHERE rn = 1)
        |SELECT e1.u, e1.shared, e1.p, least(e1.u, e1.p, e2.p) AS rep
        |FROM el e1 JOIN el e2 ON e1.p = e2.u
        |ORDER BY e1.u""".stripMargin,
    // same forward as-of + per-journey rank; the 40/20/40 split and
    // its remainder-to-earliest-middle rule are integer CASE arms
    "behavior_multitouch_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |tou AS (SELECT user_id, event_id AS touch_event_id, t,
        |    event_type AS touch_type,
        |    min(CASE WHEN event_type = 'purchase' THEN t END)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np_t
        |  FROM e),
        |p AS (SELECT user_id, t AS np_t, min(event_id) AS purchase_event_id
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (SELECT p.purchase_event_id, tou.touch_event_id, tou.user_id,
        |    tou.touch_type, tou.t
        |  FROM tou JOIN p ON tou.user_id = p.user_id AND tou.np_t = p.np_t
        |  WHERE tou.touch_type IN ('view', 'click')),
        |r AS (SELECT purchase_event_id, touch_event_id, user_id, touch_type,
        |    CAST(row_number() OVER (PARTITION BY purchase_event_id
        |      ORDER BY t, touch_event_id) AS BIGINT) AS touch_rank,
        |    CAST(count(*) OVER (PARTITION BY purchase_event_id) AS BIGINT)
        |      AS n_touches
        |  FROM j)
        |SELECT purchase_event_id, touch_event_id, user_id, touch_type,
        |  touch_rank, n_touches,
        |  CAST(CASE WHEN n_touches = 1 THEN 1000000
        |    WHEN n_touches = 2 THEN 500000
        |    WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400000
        |    WHEN touch_rank = 2 THEN 200000 // (n_touches - 2)
        |      + 200000 - (n_touches - 2) * (200000 // (n_touches - 2))
        |    ELSE 200000 // (n_touches - 2) END AS BIGINT) AS credit_ppm
        |FROM r ORDER BY purchase_event_id, touch_event_id""".stripMargin,
    "behavior_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |n AS (SELECT user_id, event_id, t, event_type,
        |    min(CASE WHEN event_type = 'purchase' THEN t END)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS np
        |  FROM e)
        |SELECT event_id, user_id, t,
        |  CAST(coalesce(np, -1) AS BIGINT) AS next_purchase_t,
        |  CAST(CASE WHEN np IS NULL THEN -1
        |    ELSE (np - t) // 60000000 END AS BIGINT) AS gap_minutes
        |FROM n WHERE event_type = 'view'
        |ORDER BY event_id""".stripMargin,
    // two LPA rounds over the same capped ≥3-shared pair grid; the mode
    // election is (count desc, label asc) row_number on both engines
    // the full peel chain replayed: sparsify to the top-4n affinity
    // backbone, then three induced-degree rounds at K=6
    "graph_kcore_peel" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |pr AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
        |    count(*) AS shared
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2),
        |n AS (SELECT count(DISTINCT l_suppkey) AS n FROM pp),
        |top AS (SELECT s1, s2 FROM (SELECT s1, s2,
        |    row_number() OVER (ORDER BY shared DESC, s1, s2) AS rk FROM pr)
        |  WHERE rk <= 4 * (SELECT n FROM n)),
        |e AS (SELECT s1, s2 FROM top UNION ALL SELECT s2, s1 FROM top),
        |d0 AS (SELECT s1, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |a1 AS (SELECT s1 FROM d0 WHERE deg >= 6),
        |d1 AS (SELECT e.s1, CAST(count(*) AS BIGINT) AS deg FROM e
        |  WHERE e.s1 IN (SELECT s1 FROM a1) AND e.s2 IN (SELECT s1 FROM a1)
        |  GROUP BY 1),
        |a2 AS (SELECT s1 FROM d1 WHERE deg >= 6),
        |d2 AS (SELECT e.s1, CAST(count(*) AS BIGINT) AS deg FROM e
        |  WHERE e.s1 IN (SELECT s1 FROM a2) AND e.s2 IN (SELECT s1 FROM a2)
        |  GROUP BY 1)
        |SELECT d0.s1 AS supplier, d0.deg AS deg_r0,
        |  coalesce(d1.deg, -1) AS deg_r1, coalesce(d2.deg, -1) AS deg_r2,
        |  CAST(CASE WHEN coalesce(d2.deg, -1) >= 6 THEN 1 ELSE 0 END
        |    AS BIGINT) AS in_core
        |FROM d0 LEFT JOIN d1 ON d0.s1 = d1.s1
        |LEFT JOIN d2 ON d0.s1 = d2.s1
        |ORDER BY supplier""".stripMargin,
    "graph_label_propagation" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |e0 AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |e AS (SELECT s1, s2 FROM e0 UNION ALL SELECT s2 AS s1, s1 AS s2
        |  FROM e0),
        |r1c AS (SELECT s1, s2 AS label, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2),
        |r1 AS (SELECT s1, label FROM (SELECT s1, label,
        |    row_number() OVER (PARTITION BY s1 ORDER BY c DESC, label)
        |      AS rn FROM r1c) WHERE rn = 1),
        |r2c AS (SELECT e.s1, r1.label, CAST(count(*) AS BIGINT) AS c
        |  FROM e JOIN r1 ON e.s2 = r1.s1 GROUP BY 1, 2),
        |r2 AS (SELECT s1, label FROM (SELECT s1, label,
        |    row_number() OVER (PARTITION BY s1 ORDER BY c DESC, label)
        |      AS rn FROM r2c) WHERE rn = 1)
        |SELECT r1.s1 AS supplier, r1.label AS label_r1, r2.label AS label_r2
        |FROM r1 JOIN r2 ON r1.s1 = r2.s1
        |ORDER BY supplier""".stripMargin,
    // both orientations of the same ≥3-shared pair grid, degree-
    // decorated; the oracle may self-join — the graded side never does
    "graph_assortativity_stats" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |deg AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS deg
        |  FROM ps GROUP BY 1),
        |e AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |bo AS (SELECT s1, s2 FROM e
        |  UNION ALL SELECT s2 AS s1, s1 AS s2 FROM e),
        |d AS (SELECT d1.deg AS x, d2.deg AS y FROM bo
        |  JOIN deg d1 ON bo.s1 = d1.l_suppkey
        |  JOIN deg d2 ON bo.s2 = d2.l_suppkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_ends,
        |  CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(x) AS BIGINT) AS num,
        |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS den
        |FROM d ORDER BY n_ends""".stripMargin,
    // ntile over a total order is engine-identical (SQL-standard
    // first-(n mod 5)-buckets-get-one-extra split)
    "behavior_rfm_segmentation" ->
      """WITH b AS (SELECT user_id,
        |    CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS r_day,
        |    CAST(count(*) AS BIGINT) AS f_events,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN
        |      coalesce(CAST(CAST(value AS DECIMAL(18,4)) * 10000
        |        AS BIGINT), 0) ELSE 0 END) AS BIGINT) AS m_fp
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id, r_day, f_events, m_fp,
        |    CAST(ntile(5) OVER (ORDER BY r_day, user_id) AS BIGINT)
        |      AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY f_events, user_id) AS BIGINT)
        |      AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY m_fp, user_id) AS BIGINT)
        |      AS m_score
        |  FROM b)
        |SELECT user_id, r_day, f_events, m_fp, r_score, f_score, m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
        |    AS rfm_code
        |FROM s ORDER BY user_id""".stripMargin,
    // same islands key (day − row_number) and max-struct election via
    // the (len, −start) tuple
    "behavior_longest_streak" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp FROM d),
        |s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |    CAST(min(day) AS BIGINT) AS start
        |  FROM i GROUP BY user_id, grp),
        |r AS (SELECT user_id, len, start,
        |    CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT)
        |      AS n_active_days,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start) AS rn
        |  FROM s)
        |SELECT user_id, n_active_days, len AS longest_streak,
        |  start AS streak_start_day
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // all four features ride one window sort; the purchase filter
    // applies AFTER feature computation on both engines
    "feature_pit_snapshot" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events),
        |f AS (SELECT event_id, user_id, t, event_type,
        |    CAST(coalesce(count(*) OVER wp, 0) AS BIGINT)
        |      AS n_prior_events,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1
        |      ELSE 0 END) OVER wp, 0) AS BIGINT) AS n_prior_views,
        |    CAST(coalesce(lag(v_fp) OVER w, -1) AS BIGINT) AS prev_v_fp,
        |    CAST(t // 86400000000 -
        |      min(t // 86400000000) OVER w2 AS BIGINT)
        |      AS days_since_first
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
        |    wp AS (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    w2 AS (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, t, n_prior_events, n_prior_views,
        |  prev_v_fp, days_since_first
        |FROM f WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // per-part ⌊2²⁰/deg⌋ weight joined onto the pair grid; the oracle
    // may self-join — the graded side never does
    "graph_resource_allocation" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |pd AS (SELECT l_partkey, 1048576 // count(*) AS w
        |  FROM ps GROUP BY l_partkey),
        |p AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_partkey
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey)
        |SELECT s1, s2, CAST(count(*) AS BIGINT) AS shared_parts,
        |  CAST(sum(w) AS BIGINT) AS ra_fp
        |FROM p JOIN pd USING (l_partkey)
        |GROUP BY s1, s2 HAVING count(*) >= 3
        |ORDER BY ra_fp DESC, s1, s2""".stripMargin,
    // cap mirrored in PAIRING only; degrees stay uncapped on both
    // engines (the graded side's denominators come from the raw
    // incidence), so the two sides agree even when the cap binds
    "graph_node_jaccard" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) <= 256),
        |pp AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
        |  JOIN ok USING (l_partkey)),
        |deg AS (SELECT l_suppkey, count(*) AS deg FROM ps GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS shared
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT s1, s2, shared, d1.deg AS deg1, d2.deg AS deg2,
        |  CAST((shared * 1048576) // (d1.deg + d2.deg - shared) AS BIGINT)
        |    AS jaccard_fp
        |FROM pairs
        |JOIN deg d1 ON s1 = d1.l_suppkey
        |JOIN deg d2 ON s2 = d2.l_suppkey
        |ORDER BY jaccard_fp DESC, s1, s2""".stripMargin
  )
}
