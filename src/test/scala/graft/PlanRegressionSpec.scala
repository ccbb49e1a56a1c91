package graft

/** Plan-shape regression: the properties SCALE.md claims must stay true
  * in the physical plans — pushdown reaching the scan, broadcast joins
  * on dims, pruned read schemas. Guards against silent plan regressions
  * that correctness tests can't see. */
class PlanRegressionSpec extends SparkSuite {

  // formatted mode: executedPlan.toString truncates PushedFilters/ReadSchema.
  // clearCache first: a PREVIOUS key's marked (persisted) frames would
  // otherwise substitute InMemoryRelations into THIS key's plan and shift
  // its exchange count (the harnesses clearCache per key for the same
  // reason)
  private def plan(name: String): String = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** Plan-only variant: PlanOnly.cut/mark are identity under
    * `graft.planOnly`, so pins that must see INSIDE a checkpointed
    * subtree (an eager cut truncates the exec plan to a LogicalRDD —
    * the r18 lesson) assert through this helper instead. Exec-only
    * properties (real loop depth, roundTrip layouts, the checkpoint
    * materialization itself) must keep using [[plan]]. */
  private def planOnlyPlan(name: String): String = {
    spark.catalog.clearCache()
    System.setProperty("graft.planOnly", "true")
    try SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    finally System.clearProperty("graft.planOnly")
  }

  /** Count Scan NODES whose own detail block mentions `file`, not raw
    * string occurrences — formatting changes must not flip scan pins
    * (ADVICE r9). Blocks are delimited by the "(n) <NodeName>" headers. */
  private def scanNodes(p: String, file: String): Int =
    p.split("\\n(?=\\(\\d+\\) )")
      .count(b => b.matches("(?s)\\(\\d+\\) Scan parquet.*") && b.contains(file))

  test("filter_predicates pushes all predicates to the parquet scan") {
    val p = plan("filter_predicates")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("LessThanOrEqual(l_shipdate") && p.contains("In(l_returnflag"))
  }

  test("scan_projection_pruning reads only the two projected columns") {
    val p = plan("scan_projection_pruning")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p.take(800))
  }

  test("join_broadcast builds a BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_multiway_star broadcasts the dim tables") {
    val p = plan("join_multiway_star")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("topk_limit plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("topk_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("agg_groupby_sum uses partial+final hash aggregation") {
    val p = plan("agg_groupby_sum")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final pair")
  }

  test("join_skew_salted joins on (key, salt) as a real equi-join") {
    val p = plan("join_skew_salted")
    assert(p.contains("__salt"), "salt column must be part of the join keys")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("analytics-layer plans stay within their exchange budgets") {
    // #Exchange nodes in the un-executed plan = shuffles the query can
    // ever pay (AQE may only remove some at runtime). Budgets are the
    // audited values from SCALE.md round 3 — a regression here means a
    // new shuffle crept into the operator.
    val budgets = Map(
      "sort_zorder_layout" -> 1,   // final sort only
      "embedding_quantize" -> 1,   // final sort only
      "quality_repetition" -> 3,   // gram agg partial/final + sort
      "scalar_bitwise" -> 1,       // final sort only
      "join_bloom_prefilter" -> 4, // two join inputs + agg + sort
      "text_tfidf" -> 3)           // df agg, window, sort (tf is checkpointed)
    val over = budgets.flatMap { case (name, budget) =>
      // formatted mode prints each node twice (tree + details); the
      // details form "(N) Exchange" counts each exchange exactly once
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("skyline_pareto prunes through windows and broadcasts the frontier back") {
    val p = plan("skyline_pareto")
    // survivors join back to parts as a broadcast (the frontier is
    // tiny), never a shuffled or nested-loop join; the whole two-phase
    // rewrite stays within 4 shuffles (pair agg, shard window, global
    // window over survivors only, final sort)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val n = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(n <= 4, s"skyline_pareto exchange count $n > 4")
  }

  test("window_count_distinct plans as broadcast decoration, not a WindowExec") {
    val p = plan("window_count_distinct")
    // the two-pass rewrite: per-type distinct counts aggregate on the
    // tiny side and broadcast back onto the fact rows — the fact table
    // itself must NOT be hash-repartitioned by the 5-value partition
    // key (what a real window would do), and no Window node may appear
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("Window"), "two-pass rewrite must not plan a WindowExec")
    val n = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    // distinct-agg partials (≤2) + final sort only; the fact side rides
    // scan → broadcast-join → sort with no shuffle of its own
    assert(n <= 3, s"expected ≤3 shuffle exchanges, got $n")
  }

  test("q6 pushes every scan predicate into the parquet reader") {
    val p = plan("q6_forecast_revenue")
    // all four predicate families must reach PushedFilters — Q6 is the
    // scan-efficiency probe, a predicate evaluated post-scan defeats it
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate"), "shipdate range not pushed: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_discount") &&
      p.contains("LessThanOrEqual(l_discount"), "discount band not pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity bound not pushed")
  }

  test("round-6 behavioral plans stay within their exchange budgets") {
    val budgets = Map(
      // user_id window shuffle + single-partition collapse; the stage
      // pivot is a stack() over the one aggregate row, not a union of
      // three re-planned pipelines
      "funnel_conversion" -> 2,
      "retention_cohort" -> 3,      // user window + cell agg + sort
      "graph_copurchase_pairs" -> 4, // + r18 Fanout repartition (deliberate: parallelizes the C(deg,2) explode) + part agg + pair agg + sort (no self-join!)
      "q6_forecast_revenue" -> 2,   // partial/final agg + sort
      "q21_sole_supplier_returns" -> 6, // 2 distincts + 2 order aggs + supplier agg + sort
      "eval_holdout_split" -> 2)    // cell agg + sort
    val over = budgets.flatMap { case (name, budget) =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("text_inverted_index pays exactly one term-key shuffle plus the output sort") {
    // the up-front repartition($"term") is the ONLY data shuffle: both
    // aggregation levels — (term, doc) postings, then the term rollup —
    // take their clustering from that one hash partitioning (key-subset
    // satisfaction), so a second aggregate exchange appearing here means
    // the single-shuffle index build regressed
    val p = plan("text_inverted_index")
    val n = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(n == 2, s"expected 2 exchanges (term repartition + sort), got $n: " + p.take(600))
    assert(p.contains("hashpartitioning(term"),
      "the data exchange must hash-partition on term: " + p.take(600))
  }

  test("text_bpe_merge_step elects merges via top-k, within its exchange budget") {
    val p = plan("text_bpe_merge_step")
    // both the top-1 merge election and the top-20 report must plan as
    // TakeOrderedAndProject — a global sort of the pair table would not
    // survive a real alphabet after a few thousand merges
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"),
      "only constant-size broadcasts may cross-join")
    // pair-count partial/final + before-total + election pair-count +
    // after-total (plan-only mode reruns the uncached branches; the
    // graded run reuses the persisted frames)
    val n = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(n <= 5, s"text_bpe_merge_step exchange count $n > 5")
  }

  test("profile_fk_orphans audits all three lineitem edges in ONE fact scan") {
    // the single-pass multi-audit shape: each child table is scanned
    // once, with lineitem's three FK edges exploded from the same rows
    // — a per-edge formulation re-scans the biggest table three times
    val p = plan("profile_fk_orphans")
    val scans = scanNodes(p, "lineitem.parquet")
    assert(scans == 1, s"expected exactly 1 lineitem scan node, got $scans: " + p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("corpus_dedup_pipeline reads documents at most twice across all stages") {
    // n0's census count + the stage-1 cache fill; stages 2-3 and their
    // censuses must come off the persisted inter-stage frames, never a
    // re-scan of the corpus
    val p = plan("corpus_dedup_pipeline")
    val scans = scanNodes(p, "documents.parquet")
    assert(scans <= 2, s"expected <= 2 documents scan nodes, got $scans: " + p.take(600))
    // materialization witness: since r18 the inter-stage frames are
    // EAGER checkpoints (PlanOnly.cut — they print as Scan ExistingRDD),
    // which is a stronger materialize-once than the earlier lazy persist
    // (InMemoryTableScan); accept either
    assert(p.contains("Scan ExistingRDD") || p.contains("InMemoryTableScan")
        || p.contains("InMemoryRelation"),
      "inter-stage survivor frames must be materialized: " + p.take(600))
  }

  test("text_index_delta_merge maintains postings via a term equi-join, never a rescan join") {
    val p = plan("text_index_delta_merge")
    // the maintenance merge is a full-outer EQUI-join on term — standing
    // rows the delta never touches pass through, delta-only terms insert
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    // both index builds keep the single-term-shuffle shape: every data
    // exchange in the plan hash-partitions on term
    assert(p.contains("hashpartitioning(term"), p.take(800))
  }

  test("window_rolling_distinct joins candidates through the hour-bucket equi-join") {
    // the banded rewrite's whole point: the trailing-window candidate
    // match is an EQUI-join on (event_type, hour bucket) with the exact
    // [t-1h, t] band as a post-filter — a pure range/theta join would
    // nest-loop and go quadratic per type
    val p = plan("window_rolling_distinct")
    val equi = "\\(\\d+\\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
      .r.findAllIn(p).size
    assert(equi >= 1, "candidate match must be an equi-join: " + p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("bloom probe rides the fact scan, not a post-join filter") {
    val p = plan("join_bloom_prefilter")
    // Formatted-mode node numbers are assigned bottom-up, so a child's
    // number is SMALLER than its parent's: the Filter detail block that
    // carries the bloom condition must be numbered below the join. A
    // raw string-position compare would be vacuous — the details
    // section always follows the whole tree section.
    val filterNums = "\\((\\d+)\\) Filter".r.findAllMatchIn(p).collect {
      case m if p.substring(m.start, math.min(p.length, m.start + 800))
        .contains("bloom_might_contain") => m.group(1).toInt
    }.toList
    val joinNum = "\\((\\d+)\\) ShuffledHashJoin".r.findFirstMatchIn(p)
      .map(_.group(1).toInt)
    assert(filterNums.nonEmpty, "no Filter node carries the bloom probe: " + p.take(600))
    assert(joinNum.nonEmpty, "prefilter demo requires the non-broadcast join")
    assert(filterNums.exists(_ < joinNum.get),
      s"bloom filter nodes $filterNums must be numbered below join ${joinNum.get} (inside its scan subtree)")
  }

  test("AQE splits a skewed join partition at runtime (the no-manual-salting path)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // join_skew_salted is the MANUAL lever; this pins the AQE runtime
    // lever on the same problem: one hot key absorbing half the fact.
    val keep = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Thresholds sized for the sf0.01 fixture's COMPRESSED shuffle
      // sizes (skew stats measure map-output bytes): the hot partition
      // carries 30k high-entropy doubles, the rest a few KB.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // repartition(8): skew splits are map-output RANGES, so the hot
      // reduce partition is only divisible if it was written by several
      // mappers — the single-file fixture scan is one map task otherwise
      // (a real cluster has thousands of mappers; this is fixture-only)
      val fact = Tables.lineitem(spark, sf001)
        .select(when($"l_orderkey" % 2 === 0, 0L).otherwise($"l_orderkey").as("k"),
          $"l_extendedprice")
        .repartition(8)
      val dim = Tables.orders(spark, sf001)
        .select($"o_orderkey".as("k2"), $"o_totalprice")
      // sum(price) keeps the payload column IN the join shuffle — a bare
      // count() would prune it and the constant-key partition would
      // compress below any sane skew threshold
      // GLOBAL agg: a groupBy on the join key would REQUIRE the join's
      // hash partitioning downstream, and OptimizeSkewedJoin refuses to
      // split a skewed partition when that breaks a required
      // distribution; the partial of a global agg has no requirement
      val q = fact.join(dim, $"k" === $"k2")
        .agg(sum(Tables.dec2($"l_extendedprice")).as("s"))
      q.collect() // finalize THIS df's adaptive plan (count() would plan separately)
      val p = q.queryExecution.executedPlan.toString.toLowerCase
      assert(p.contains("skew"), p.take(1200))
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dedup_semantic_cluster verifies pairs through an equi-join on cid") {
    // the SemDeDup scale claim: candidate pairs come from a hash/merge
    // EQUI-join on the cluster id, never a global cross product. The
    // only BroadcastNestedLoopJoin allowed is the constant-k (4-row)
    // seed broadcast of the assign step.
    val p = plan("dedup_semantic_cluster")
    val pairJoin = "\\(\\d+\\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
      .r.findAllIn(p).size
    assert(pairJoin >= 2, // vec_id decorate join + cid pair join
      "expected equi-joins for assign-decorate and cid-pair: " + p.take(800))
    val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the 4-row seed broadcast may nest-loop, saw $bnlj")
  }

  test("q17 correlated scalar subqueries decorrelate to aggregate-then-join") {
    // the textbook plan re-scans lineitem once PER OUTER ROW; the only
    // plan that survives at scale is RewriteCorrelatedScalarSubquery's:
    // each subquery becomes ONE per-part aggregate hash-joined back.
    val p = plan("q17_small_quantity_revenue")
    // lineitem appears exactly 3×: the outer scan + one scan per
    // decorrelated aggregate (count, sum) — constant, not per-row
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 3, s"expected 3 lineitem scans (outer + 2 aggregates), saw $scans")
    assert(p.contains("Keys [1]: [l_partkey"),
      "decorrelated aggregates must be keyed on the correlation column")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "decorrelation must yield equi-joins only: " + p.take(800))
  }

  test("q19 pushes the OR-of-ANDs disjunction into BOTH parquet scans") {
    // q6 pins conjunctive pushdown; this pins the disjunctive path —
    // Catalyst must extract each table's under-approximation of the
    // OR-of-ANDs and hand it to the reader as an Or filter, so row
    // groups whose min/max miss every band are skipped at the source.
    val p = plan("q19_disjunctive_pushdown")
    val pushedOr = p.linesIterator.filter(l =>
      l.contains("PushedFilters:") && l.contains("Or(")).toList
    assert(pushedOr.size == 2,
      s"expected an Or in both scans' PushedFilters, saw ${pushedOr.size}: $pushedOr")
    assert(pushedOr.exists(_.contains("l_quantity")) &&
      pushedOr.exists(_.contains("p_brand")),
      "both the lineitem quantity bands and the part brand/size bands must push")
  }

  test("round-7 plans stay within their exchange budgets") {
    // audited values from SCALE.md round 7 (sf0.01 formatted plans) —
    // a regression here means a new shuffle crept into the operator
    val budgets = Map(
      "dedup_semantic_cluster" -> 4,     // assign + cid pair join + dedupe + sort
      "q13_customer_distribution" -> 3,  // FK join + per-cust agg + histogram agg
      "q14_promo_revenue_ratio" -> 2,    // partial/final agg + sort
      "q22_idle_balance_segments" -> 4,  // anti join inputs + agg + sort
      "q17_small_quantity_revenue" -> 4, // 2 decorrelated aggs + join + final agg
      "q19_disjunctive_pushdown" -> 2,   // partial/final agg + sort
      "sink_merge_upsert" -> 2,          // read-back join + sort
      "agg_approx_percentile" -> 2,      // partial/final sketch agg + sort
      "window_rolling_avg" -> 2,         // user window + sort
      "agg_string_concat" -> 2)          // group agg + sort
    val over = budgets.flatMap { case (name, budget) =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("q22 plans NOT EXISTS as a LeftAnti hash join with scalar-subquery thresholds") {
    val p = plan("q22_idle_balance_segments")
    assert(p.contains("LeftAnti"), "NOT EXISTS must decorrelate to an anti join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the scalar thresholds must be subquery results, not a joined one-row frame")
  }

  test("q13 keeps zero-order customers through the outer join") {
    val p = plan("q13_customer_distribution")
    assert(p.contains("LeftOuter"), "orders filter must not turn the join inner")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("TPC-H completion plans keep their probe shapes (q1/q2/q15/q20)") {
    // q2: correlated scalar-MIN decorrelates to ONE per-part aggregate
    // joined back — lineitem is scanned exactly twice (offer frame +
    // decorrelated min), a constant, never once per outer row
    val p2 = plan("q2_min_cost_supplier")
    assert("lineitem\\.parquet".r.findAllIn(p2).size == 2,
      "q2 must scan lineitem exactly twice (offer + decorrelated min)")
    assert(!p2.contains("BroadcastNestedLoopJoin") && !p2.contains("CartesianProduct"),
      "q2 decorrelation must yield equi-joins only")
    // q15: the view's max is a scalar subquery broadcast into the
    // filter — present as a Subquery, not a joined one-row frame
    val p15 = plan("q15_top_supplier")
    assert(p15.contains("Subquery"), "q15 max must plan as a scalar subquery")
    assert(!p15.contains("BroadcastNestedLoopJoin"), "q15 threshold must not nest-loop")
    // q20: both IN memberships collapse to left-semi hash joins (the
    // formatted dump prints each join twice: tree + details)
    val p20 = plan("q20_promotion_suppliers")
    assert("LeftSemi".r.findAllIn(p20).size >= 2,
      "q20's nested INs must both plan as left-semi joins")
    assert(!p20.contains("BroadcastNestedLoopJoin"))
    // q1: one full scan feeding one partial/final aggregate pair — the
    // pure scan-bandwidth probe must never grow a second lineitem read
    val p1 = plan("q1_pricing_summary")
    assert("lineitem\\.parquet".r.findAllIn(p1).size == 1,
      "q1 must stay a single-scan aggregate")
  }

  test("TPC-H completion plans stay within their exchange budgets") {
    // audited sf0.01 formatted-plan values on landing (round 7) — a
    // regression here means a shuffle crept into a flagship
    val budgets = Map(
      "q1_pricing_summary" -> 2,     // partial/final agg + sort
      "q2_min_cost_supplier" -> 5,   // offer agg ×2 frames + min agg + SMJ sort sides
      "q8_market_share" -> 2,        // orders FK join rides broadcasts; agg + sort
      "q9_product_profit" -> 2,      // agg + sort (dims broadcast)
      "q11_important_parts" -> 4,    // pv agg pair + scalar re-agg pair
      "q12_priority_shipping" -> 2,  // FK join + 2-group agg + sort
      "q15_top_supplier" -> 4,       // rev agg pair + scalar max agg pair
      "q20_promotion_suppliers" -> 2) // grouped-HAVING agg pair (semis broadcast)
    val over = budgets.flatMap { case (name, budget) =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("join_asof_nearest runs both direction frames in ONE window over one scan") {
    // the nearest as-of must not become two window passes or a
    // self-join: one event scan, one user_id Window node carrying both
    // the backward and forward frames (same partitioning + ordering)
    val p = plan("join_asof_nearest")
    assert("events\\.parquet".r.findAllIn(p).size == 1, "one scan of the event log")
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1,
      "both frames must merge into one Window node: " + p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      "nearest as-of must be join-free")
  }

  test("scd2_asof_lookup is join-free: union + one forward-fill window") {
    // the textbook point-in-time plan is a range join (pair-explosion
    // risk at scale); the rewrite must show NO join operator at all —
    // versions and probes union into one per-user stream
    val p = plan("scd2_asof_lookup")
    assert(!p.contains("Join"), "PIT lookup must be the union+ffill rewrite: " + p.take(600))
    assert(p.contains("Union"), "expected the version∪probe union")
  }

  test("join_lateral_topk decorrelates to a WindowGroupLimit, not per-row re-execution") {
    // LATERAL (ORDER BY … LIMIT k) must rewrite to a per-key group
    // limit (k rows of state per group, rank pushed into the window
    // sort) + ONE equi-join — the plan a hand-written row_number top-k
    // gets. A correlated re-execution or nested loop would be O(outer)
    // inner queries.
    val p = plan("join_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      "lateral top-k must plan a WindowGroupLimit: " + p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("round-7 continuation plans stay within their exchange budgets") {
    val budgets = Map(
      "join_lateral_topk" -> 2,      // group-limit window + sort
      "graph_node_jaccard" -> 8,     // + r18 Fanout repartition (deliberate) + incidence distinct ×2 uses + deg agg + pair agg + sort
      "text_collocation_lift" -> 5,  // uni agg + bi agg + scalar re-agg + join + sort
      "join_asof_nearest" -> 2,      // ONE user_id window (both frames merged) + sort
      "anomaly_zscore_exact" -> 3,   // stats agg pair + census agg (broadcast join back)
      "ml_confusion_matrix" -> 3,    // argmin agg + crosstab agg + sort (seeds broadcast)
      "eval_ranking_metrics" -> 2,   // q_id window + per-query agg (queries broadcast)
      "corpus_snapshot_diff" -> 4,   // v1/v2 join inputs + census agg + sort
      "window_interval_overlap" -> 4, // interval agg + custkey sweep window + agg + sort
      "profile_numeric_stats" -> 3,  // stack feeds one distinct-expand agg pair + sort
      "scd2_asof_lookup" -> 4,       // version window + user grid distinct pair + sort (JOIN-FREE)
      "stream_late_data_census" -> 3, // user arrival window + minute-bucket agg + sort
      "scd2_change_compression" -> 3, // shared user sort + census agg + final sort
      "profile_join_explosion" -> 3)  // key-count agg pair + TakeOrderedAndProject (scalar re-agg)
    val over = budgets.flatMap { case (name, budget) =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("quadratic plans appear ONLY in the documented similarity baselines") {
    // ml_kmeans_step: k-row seed broadcast × corpus is the Lloyd's
    // assign step — fan-out is k (constant), not quadratic.
    // report_dense_grid: cross join of two BOUNDED dims builds the
    // 125-cell reporting grid — cardinality is |dims|², not |facts|²
    // dedup_semantic_cluster: its ONLY nested-loop is the ml_kmeans_step
    // constant-k seed broadcast for the assign step; the pair join is
    // pinned as an equi-join by its own test below
    // ml_confusion_matrix: the same constant-k (4-row) seed broadcast
    // as ml_kmeans_step; eval_ranking_metrics: the same constant query
    // broadcast as simsearch_cosine_topk — fan-out is k/|queries|, not
    // quadratic
    // text_bpe_merge_step / text_bpe_merge_loop: every nested-loop side
    // is a 1-row broadcast (elected pair, totals) — fan-out 1
    // eval_ann_recall: |cells| (10), |probes| (4) and |queries| (5)
    // constant broadcasts — the IVF probe fan-out, not quadratic
    // text_index_delta_merge / scd2_cdc_apply: the 1-row carve-cutoff
    // broadcast
    // §2.22: ml_decision_stump / ml_naive_bayes_counts ride a 1-row
    // totals/vocab broadcast; ml_knn_classify / text_phrase_search a
    // constant query/winner broadcast — fan-out k, not quadratic
    // (sample_stratified_neyman is window-only and stays OFF the list)
    val allowed = Set("simsearch_cosine_topk", "dedup_embedding_cosine",
      "simsearch_ann_ivf", "ml_kmeans_step", "report_dense_grid",
      "dedup_semantic_cluster", "ml_confusion_matrix",
      "eval_ranking_metrics", "text_bpe_merge_step",
      "text_bpe_merge_loop", "text_bpe_tokenize", "eval_ann_recall",
      "text_index_delta_merge", "corpus_dedup_pipeline",
      "scd2_cdc_apply", "ml_decision_stump",
      "ml_naive_bayes_counts", "ml_knn_classify", "text_phrase_search",
      "eval_mrr_fixed", "ml_triplet_mining", "ml_knn_confusion",
      // round-11 adaptive-bucket-width sites: the only nested loops
      // are 1-row bounds broadcasts — fan-out 1. (Grouped
      // DistributedRank joins its bounds per group as a real equi-join
      // — RFM stays OFF this list; the ungrouped wrapper's constant
      // key folds away, leaving abc's 1-row bounds on a BNLJ.)
      "sample_systematic_weighted", "report_abc_classification",
      // embedding_pq_quantize: the exact-baseline side rides the same
      // constant 5-query broadcast as simsearch_cosine_topk — fan-out
      // |queries|, not quadratic
      "embedding_pq_quantize",
      // simsearch_ivf_pq: the same constant broadcasts as
      // eval_ann_recall (|cells| = 10 probe, |probes| = 4 fan, |queries|
      // = 5 exact baseline) — fan-out constant, not quadratic
      "simsearch_ivf_pq",
      // round-13: graph_kcore_peel / ml_gbdt_stump_boost ride 1-row
      // scalar broadcasts (|nodes| count; mean/stump/SSE frames);
      // ml_isotonic_calibration's non-equi interval join is bin×bin
      // over the 10-row decile frame; agg_bloom_replayable's probe
      // grid crosses the CONSTANT |nations| dim (25) with the probe
      // keys — fan-out |nations|, not quadratic
      "graph_kcore_peel", "ml_gbdt_stump_boost",
      "ml_isotonic_calibration", "agg_bloom_replayable",
      // round-14: profile_tv_drift's dense grid crosses two BOUNDED
      // dims (weeks × types — the report_dense_grid shape);
      // agg_kmv_replayable / ml_perceptron_step / ml_pca_power_iter
      // ride 1-row scalar broadcasts (sketch summaries, the previous
      // w, the max-norm); simsearch_graph_greedy (round-16 bucketed
      // build) rides constant broadcasts only: the 32-row seed cells
      // (one per asg dag), the 1-row entry, the ≤40-row query panel,
      // the ≤50-row audit panel, and the 1-row edge-recall receipt —
      // the edge build itself is a cid equi-join, never base × base
      // (pinned by the dedicated bucketed-build test below)
      "profile_tv_drift", "agg_kmv_replayable", "ml_perceptron_step",
      "ml_pca_power_iter", "simsearch_graph_greedy",
      // topk_threshold_algorithm: the per-depth seen-set expansion is
      // a ≤256-row candidate frame × an 8-row depth broadcast on a
      // range predicate — fan-out ≤ 8, never data²
      "topk_threshold_algorithm",
      // eval_spearman_rho: two UNGROUPED DistributedRank passes — the
      // same 1-row adaptive-bounds broadcast as report_abc (fan-out 1)
      "eval_spearman_rho",
      // round-15: agg_quantile_mergeable (and the round-16 log-scale
      // twin agg_quantile_relerr) attaches a 1-row n scalar and
      // a 7-row pct frame to the domain-bounded bucket histogram;
      // simsearch_index_serve probes the 10-row stored-centroid table
      // per query and rides the same constant LUT broadcasts as
      // simsearch_ivf_pq — fan-out |cells|, never data²
      "agg_quantile_mergeable", "agg_quantile_relerr",
      "simsearch_index_serve",
      // round-15 continuation: sink_txn_bloom_skip crosses the
      // CONSTANT 24-row probe-slot frame with the ≤16-row file list
      // (both broadcast planning metadata) and attaches the 1-row
      // min/max bounds scalar — fan-out |files| per probe, never data²;
      // timeseries_dtw_band's type_a < type_b pair join is |types|²
      // over the 5-row profile frame — the metadata-sized model table
      "sink_txn_bloom_skip", "timeseries_dtw_band",
      // simsearch_hnsw_layers (round-16 bucketed build): per-layer
      // edge builds are cid equi-joins over IVF candidates — the only
      // nested loops are the per-layer 32-row seed broadcasts, the
      // 1-row entry, the ≤40-row query panel, the ≤50-row audit
      // panel, and the 1-row edge-recall receipt (pinned by the
      // dedicated bucketed-build test below);
      // graph_scc_pivot attaches the 1-row scc_size scalar (fan-out 1);
      // ml_kmeans_pp_seed crosses the ≤k-row chosen frame (fan-out k,
      // the ml_kmeans_step seeds shape)
      // sink_txn_multi_table attaches the 1-row A-side totals scalar;
      // stream_exec_restart_resume the 1-row rows_processed ledger
      "simsearch_hnsw_layers", "graph_scc_pivot", "ml_kmeans_pp_seed",
      "sink_txn_multi_table", "stream_exec_restart_resume",
      // round-16: graph_scc_decompose / graph_ktruss_peel attach
      // per-round 1-row count scalars (residual/kept/pivot/fw/bw/scc;
      // edges/triangles/kept) — fan-out 1 each;
      // simsearch_index_maintain rides the ≤|cells| (10-row) stored
      // centroid broadcast for the argmin assign — the ml_kmeans_step
      // seeds shape
      "graph_scc_decompose", "simsearch_index_maintain",
      "graph_ktruss_peel",
      // sink_txn_cbo_estimate: per-scenario 1-row planning scalars
      // (row counts, sketch folds, truth counts) and the 1-row
      // mean-threshold frame — fan-out 1 each, the receipt assembly
      "sink_txn_cbo_estimate",
      // round-17: sink_txn_cbo_choose assembles its decision receipt
      // from per-scenario 1-row planning scalars (manifest counts,
      // sketch folds, truth/join counts) — the cbo_estimate shape;
      // sink_txn_vacuum_markers attaches the 1-row A-side totals
      // scalar (the sink_txn_multi_table shape); dedup_index_maintain
      // and corpus_dedup_costs attach 1-row index/funnel censuses —
      // fan-out 1 each, never data²
      "sink_txn_cbo_choose", "sink_txn_vacuum_markers",
      "dedup_index_maintain", "corpus_dedup_costs",
      // sink_txn_cbo_join_order: the same 1-row planning-scalar
      // receipt assembly as cbo_choose; dedup_index_compact attaches
      // the 1-row quarantine census — fan-out 1 each
      "sink_txn_cbo_join_order", "dedup_index_compact",
      // sink_txn_hist_selectivity: the 1-row domain-bounds/predicate
      // frame broadcast over the histogram and the truth scan —
      // fan-out 1; sink_txn_bucket_prune: the 1-row probe-count
      // receipt scalar — fan-out 1
      "sink_txn_hist_selectivity", "sink_txn_bucket_prune",
      // round-18: sink_txn_hist_maintain / sink_txn_hist_decide attach
      // the 1-row sidecar-folded bounds frame and the ≤3-row band
      // frame to the |files|·16 sidecar and the truth scan — fan-out
      // ≤ 3, never data²; sink_txn_cbo_skew_salt assembles its
      // receipt from per-scenario 1-row planning scalars (the
      // cbo_choose shape — the joins themselves are equi-joins on k
      // or (k, salt))
      "sink_txn_hist_maintain", "sink_txn_hist_decide",
      "sink_txn_cbo_skew_salt",
      // simsearch_hnsw_serve: the same constant broadcasts as
      // simsearch_hnsw_layers (1-row stored entry, ≤40-row query
      // panel, 1-row edge census) — the routing itself probes the
      // stored edge table per layer; the build is the shared bucketed
      // cid equi-join pinned by the dedicated test below
      "simsearch_hnsw_serve",
      // simsearch_hnsw_maintain: the 32-row stored seed broadcast (the
      // ml_kmeans_step seeds shape, for the old build AND the O(new)
      // insert), the 1-row entry/census frames, the ≤40-row query
      // panel; sink_txn_hh_maintain / dedup_index_forget attach 1-row
      // decision/census scalars — fan-out 1 each, never data²
      "simsearch_hnsw_maintain", "sink_txn_hh_maintain",
      "dedup_index_forget",
      // sink_txn_hist_stale: the same 1-row band frame as the other
      // hist keys, broadcast over both sidecars and the truth scan
      "sink_txn_hist_stale")
    val offenders = SparkEntry.queries.keys.filterNot(allowed)
      .filter(n => n != "source_csv_roundtrip" && plan(n).contains("BroadcastNestedLoopJoin"))
    assert(offenders.isEmpty, s"unexpected nested-loop joins: $offenders")
  }

  test("round-16 bucketed kNN-graph builds: candidates equi-join on the cell id, never base x base") {
    // (simsearch_hnsw_serve shares this builder but its FINAL plan is
    // the post-commit stored-index read — the cid join runs in the
    // build jobs, so the pin on the shared builder covers it here)
    for (k <- Seq("simsearch_graph_greedy", "simsearch_hnsw_layers")) {
      // plan-only: the exec plan checkpoints the candidate frame (r18
      // PlanOnly.cut), which truncates everything upstream of the cid
      // join to a LogicalRDD — the pin must look through the cut
      val p = planOnlyPlan(k)
      assert(!p.contains("CartesianProduct"), s"$k grew a cartesian product")
      // the IVF candidate generation's cell equi-join must survive as a
      // hash/sort-merge join keyed on cid — the plan-level witness that
      // the offline edge build is bucketed (r15 verdict item 1); a
      // reintroduced base × base crossJoin build has no cid key at all
      assert(p.contains("[cid#"), s"$k: no cid-keyed candidate join in plan")
    }
  }

  test("ml_linreg_sufficient is one partial+final aggregate pair plus the centering subquery") {
    val p = plan("ml_linreg_sufficient")
    // main pass + the min-day scalar subquery — never a third scan
    assert(scanNodes(p, "events.parquet") === 2, p.take(600))
    val aggs = "\\(\\d+\\) HashAggregate".r.findAllIn(p).size
    assert(aggs === 4, s"expected 2 partial+final pairs (main + subquery), got $aggs")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("report_abc_classification decomposes the global rank (no single-partition fact window)") {
    val p = plan("report_abc_classification")
    // the DistributedRank rewrite: three Window nodes — within-cell,
    // intra-bucket cell prefix, and the bounded bucket-frame global
    // prefix; the ONLY unpartitioned window must order by the bucket
    // key drk_vb, never by the revenue/part columns directly
    val windows = "\\(\\d+\\) Window".r.findAllIn(p).size
    assert(windows === 3, s"expected the 3-level rank decomposition, got $windows windows")
    globalWindowsOrderOnlyBy(p, Set("drk_vb"), "report_abc_classification")
    assert(n_exchanges(p) <= 14, s"report_abc_classification exchange count ${n_exchanges(p)} > 14")
  }

  test("behavior_rfm_segmentation scores quintiles without a global ntile sort") {
    val p = plan("behavior_rfm_segmentation")
    // three chained DistributedRank calls — every unpartitioned window
    // orders by the bucket key; the former three |users|-frame ntile
    // sorts are gone
    globalWindowsOrderOnlyBy(p, Set("drk_vb"), "behavior_rfm_segmentation")
    assert(!p.contains("ntile"), "quintiles must come from rank arithmetic, not a window ntile")
  }

  test("sample_systematic_weighted broadcasts the bucket-offset frame back") {
    val p = plan("sample_systematic_weighted")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // main plan: per-doc scan, the adaptive-bucket-width bounds scan
    // (doc_id-only, column-pruned) and the subtotal scans; the stride
    // scalar subqueries read the bucket-subtotal frame (dedupe at
    // execution via ReuseSubquery), so count the MAIN section's scans
    val main = p.split("\\nSubquery:")(0)
    assert(scanNodes(main, "documents.parquet") <= 4, main.take(600))
    globalWindowsOrderOnlyBy(p, Set("bkt"), "sample_systematic_weighted")
  }

  test("unpartitioned windows appear ONLY over bounded/metadata-scale frames (all keys)") {
    // The round-11 global audit, pinned: a totally-ordered WindowExec
    // funnels its whole input through one task, so every key that
    // plans one must order a frame whose size is BOUNDED (value
    // domain / charset / top-k cut / Fan bucket cap) — never a frame
    // that scales with the corpus. Allowlist = the audited ordering
    // columns; a new unpartitioned window on any other column fails.
    val allowedOrd: Map[String, Set[String]] = Map(
      "corpus_token_budget" -> Set("rem"),        // |langs| Hamilton rank
      "sample_stratified_neyman" -> Set("rem"),   // |langs| Hamilton rank
      "dedup_winnow_pairs" -> Set("pb"),          // ≤|charset|² prefix buckets
      "dedup_winnow_verify" -> Set("pb"),
      "text_winnow_fingerprints" -> Set("pb"),
      "dedup_minhash_replayable" -> Set("pb"),    // same vocab-rank chain
      "dedup_simhash_replayable" -> Set("pb"),
      "ml_decision_stump" -> Set("threshold"),    // value-domain curve frame
      "ml_triplet_mining" -> Set("m_h"),          // 10-row global window
      "report_abc_classification" -> Set("drk_vb"), // ≤Fan bucket frame
      "behavior_rfm_segmentation" -> Set("drk_vb"),
      "sample_systematic_weighted" -> Set("bkt"), // ≤65536 bucket frame
      "skyline_pareto" -> Set("price"),           // shard-pruned frontier
      "text_bpe_merge_step" -> Set("cnt"),        // ≤20-row top-k cut
      // round-13 additions, each over an audited bounded frame:
      "corpus_temperature_mix" -> Set("rem"),     // |langs| Hamilton rank
      "ml_gbdt_stump_boost" -> Set("v"),          // value-domain histogram
      "ml_isotonic_calibration" -> Set("bin"),    // 10-row decile frame
      // round-15: the backbone election moved onto the value-domain
      // shared-count histogram (≤|distinct counts| rows) + a
      // DistributedRank boundary refinement — the ordered window now
      // consumes the histogram, never the pair frame
      "graph_kcore_peel" -> Set("shared", "drk_vb"),
      // round-15: the quantile walk orders the ≤|range/2¹⁶| value-
      // domain bucket frame (the sketch itself, never the fact rows)
      "agg_quantile_mergeable" -> Set("b"),
      // round-16: the log-scale quantile walk orders the ≤16·64-row
      // bit-width × minor bucket frame — bounded by the value domain's
      // bit width, never by the data
      "agg_quantile_relerr" -> Set("b"),
      // round-14: every ordered window runs AFTER an ORDER BY…LIMIT 128
      // TakeOrderedAndProject (ranked prefixes) or over the ≤256-row
      // seen-set × 8-depth frame — all bounded by the TA's k/depth
      // constants, never by the table
      "topk_threshold_algorithm" -> Set("a", "b", "s", "c_custkey"),
      // two chained DistributedRank passes — the audited ≤Fan bucket
      // frame, same as abc/rfm
      "eval_spearman_rho" -> Set("drk_vb"),
      // round-18: every ranked window runs AFTER an ORDER BY…LIMIT 8
      // TakeOrderedAndProject — the ≤8/≤16-row capped top-k lists,
      // never the key domain
      "sink_txn_hh_maintain" -> Set("cnt"))
    // whole-frame (unordered, unpartitioned) windows: |langs|/|labels|
    // scale — corpus_mix_rebalance, corpus_token_budget,
    // sample_stratified_neyman, ml_class_balance_weights,
    // ml_decision_stump — no ordering column to check
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val allowed = allowedOrd.getOrElse(name, Set.empty[String])
      windowBlocks(plan(name)).flatMap { b =>
        "windowspecdefinition\\((\\w+)#\\d+L? (?:ASC|DESC)".r
          .findAllMatchIn(b).map(_.group(1))
          .filterNot(allowed.contains).map(c => s"$name:$c")
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unaudited frames: ${offenders.distinct}")
  }

  test("fact-grain histogram rewrites: no window ever consumes fact/event-grain rows") {
    // the round-11 scale-hardening pin: the three former fact-grain
    // low-cardinality windows now run over per-(group, value)
    // histograms — their Window nodes must not carry the fact tie
    // columns the raw-grain plans ordered by
    Seq("agg_weighted_median" -> Seq("l_orderkey", "l_linenumber"),
      "quality_winsorize_clip" -> Seq("event_id"),
      "report_ship_latency" -> Seq("l_orderkey", "l_linenumber"))
      .foreach { case (name, factCols) =>
        val p = plan(name)
        windowBlocks(p).foreach { b =>
          factCols.foreach(c => assert(!b.contains(c),
            s"$name: a Window node consumes fact-grain column $c:\n" + b.take(400)))
        }
      }
  }

  private def n_exchanges(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).size

  /** All `(n) Window` detail blocks of a formatted plan. */
  private def windowBlocks(p: String): Seq[String] =
    p.split("\\n(?=\\(\\d+\\) )").toSeq
      .filter(_.matches("(?s)\\(\\d+\\) Window\\n.*"))

  /** Asserts every UNPARTITIONED window (windowspecdefinition whose
    * first argument is already a sort spec — no partition columns)
    * orders only by one of `allowed` (bounded bucket-frame keys). */
  private def globalWindowsOrderOnlyBy(p: String, allowed: Set[String],
      name: String): Unit =
    windowBlocks(p).foreach { b =>
      "windowspecdefinition\\((\\w+)#\\d+L? (?:ASC|DESC)".r
        .findAllMatchIn(b).foreach { m =>
          assert(allowed.contains(m.group(1)),
            s"$name: unpartitioned window orders by ${m.group(1)} — " +
              s"a corpus-scaling global sort:\n" + b.take(400))
        }
    }

  test("sequential folds shuffle once: ewma and sequence_match stay within 2 exchanges") {
    Seq("timeseries_ewma_fixed", "behavior_sequence_match").foreach { k =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(k)).size
      assert(n <= 2, s"$k exchange count $n > 2 (group shuffle + final sort)")
    }
  }

  test("round-10 §2.22 batch stays within its audited exchange budgets") {
    // measured at landing (target/explain_new.txt audit); a higher
    // count means a new shuffle crept into the operator
    val budgets = Map(
      "timeseries_cusum" -> 2,          // user fold shuffle + final sort
      "ml_decision_stump" -> 4,         // histogram p/f + curve window + sort
      "eval_auc_exact" -> 3,            // score histogram + source window + sort
      "sample_stratified_neyman" -> 2,  // lang stats p/f + tiny-frame windows
      "text_bigram_lm_counts" -> 5,     // doc window + type agg + 3 ctx windows share sorts
      "text_phrase_search" -> 4,        // doc window + election + match agg + sort
      "graph_resource_allocation" -> 4, // + r18 Fanout repartition (deliberate) + incidence distinct + pair agg + sort
      "ml_knn_classify" -> 2,           // per-query windows + final sort
      "text_ngram_coverage" -> 3,       // gram join + doc agg + sort
      "timeseries_forecast_backtest" -> 4, // daily agg + join + user agg + sort
      "timeseries_autocorr_stats" -> 2, // lag window shuffle + final sort
      "behavior_rfm_segmentation" -> 16, // user agg + melt + ONE grouped DistributedRank decomposition + regroup (r11)
      "behavior_longest_streak" -> 3,   // dedup + island window + sort
      "feature_pit_snapshot" -> 2,      // user window shuffle + final sort
      "eval_cohens_kappa" -> 9,         // langid chain + marked cells ×4 consumers
      "quality_winsorize_clip" -> 4,    // histogram agg + type window + bounds agg + clamp agg (r11 rewrite)
      "report_backlog_aging" -> 3,      // band agg + sort (+ anchor subquery)
      "eval_calibration_bins" -> 2,     // bin agg partial/final + sort
      "timeseries_bollinger_stats" -> 2, // user window shuffle + final sort
      "ml_feature_hashing" -> 2,        // (doc, dim) agg partial/final + sort
      "report_ship_latency" -> 3,       // orderkey join + histogram agg + day window (r11 rewrite)
      "graph_assortativity_stats" -> 6, // marked incidence/edges ×2 orientations
      "eval_mrr_fixed" -> 2,            // per-query window + final sort
      "agg_weighted_median" -> 3,       // histogram agg + flag window + final sort (r11 rewrite)
      "multimodal_align_chunks" -> 1,   // ordinal equi-join + final sort
      "ml_triplet_mining" -> 5,         // label window + 10-row global window + sort
      "ml_knn_confusion" -> 4,          // knn chain + cell agg + row window
      "text_doc_features" -> 3,         // doc agg with distinct + sort
      "eval_kfold_census" -> 2,         // (fold, lang) agg partial/final + sort
      "quality_boilerplate_fraction" -> 4, // df distinct agg + blocklist join + doc agg
      "report_brand_concentration" -> 3, // brand join + two rollup levels
      "profile_duplicate_invoices" -> 2, // business-key agg partial/final + sort
      "timeseries_downsample_triangle" -> 6, // user shuffle + boundary joins over the marked frame + union sort
      "ml_class_balance_weights" -> 2,  // label agg + tiny-frame windows + sort
      "eval_ece_exact" -> 2,            // bin agg + 1-row fold
      "text_hapax_stats" -> 3,          // (lang, gram) count + lang rollup + sort
      "behavior_time_to_convert" -> 2)  // user window shuffle + final sort
    val over = budgets.flatMap { case (name, budget) =>
      val n = "\\(\\d+\\) Exchange".r.findAllIn(plan(name)).size
      if (n > budget) Some(s"$name: $n > $budget") else None
    }
    assert(over.isEmpty, s"exchange budget exceeded: $over")
  }

  test("the §2.22 ML keys cross-join only constant-size broadcast frames") {
    // decision_stump's 1-row total, knn's constant query set, and NB's
    // 1-row vocab ride BroadcastNestedLoopJoin by construction; a
    // CartesianProduct would mean a real unbounded pair blow-up
    Seq("ml_decision_stump", "ml_knn_classify", "ml_naive_bayes_counts")
      .foreach { k =>
        val p = plan(k)
        assert(!p.contains("CartesianProduct"), s"$k plans a cartesian")
      }
    // the RA pair generation must never degenerate into a self-join
    val ra = plan("graph_resource_allocation")
    assert(!ra.contains("BroadcastNestedLoopJoin") &&
      !ra.contains("CartesianProduct") && !ra.contains("SortMergeJoin"),
      "RA pairs come from the sorted-set explode, not a join")
    assert(scanNodes(ra, "lineitem.parquet") === 1,
      "RA reads the incidence relation exactly once")
  }

  test("registry-wide: unpartitioned windows only over provably bounded frames (allowlist)") {
    // Every Window with an empty partition spec single-partitions its
    // input — the one plan shape that cannot survive a 100× scale-up
    // unless the consumed frame is bounded by something other than data
    // volume. The allowlist pins every key that legitimately carries
    // one (the bound is documented at each use site: a limit() cut, a
    // value-domain histogram, a ≤Fan bucket-subtotal frame). A NEW
    // unpartitioned window anywhere in the registry fails here
    // until its bound is argued and the key is listed.
    // key → the argued bound of every unpartitioned-window input frame
    // in that key (counting node instances is meaningless — a shared
    // subtree is expanded once per consumer in the analyzed tree)
    val allow: Map[String, String] = Map(
      "agg_quantile_mergeable" -> "≤|price range / 2¹⁶| bucket frame (domain-bounded)",
      "agg_quantile_relerr" -> "≤16·64-row bit-width × minor bucket frame (domain-bounded)",
      "corpus_mix_rebalance" -> "|labels|-row mix frame",
      "corpus_temperature_mix" -> "|labels|-row mix frame",
      "corpus_token_budget" -> "per-bucket subtotals ≤65,536 rows (two-level cumsum)",
      "dedup_minhash_replayable" -> "hot-bucket-capped candidate frame, limit(20) report cut",
      "dedup_index_maintain" -> "rankedTokens prefix-offset frame (≤|charset|² rows, the two-level vocabulary rank)",
      "dedup_index_compact" -> "rankedTokens prefix-offset frame (≤|charset|² rows, the two-level vocabulary rank)",
      "dedup_ingest_gate" -> "rankedTokens prefix-offset frame (≤|charset|² rows, the two-level vocabulary rank)",
      "dedup_index_forget" -> "rankedTokens prefix-offset frame (≤|charset|² rows, the two-level vocabulary rank)",
      "sink_txn_hh_maintain" -> "rank windows AFTER ORDER BY…LIMIT 8 cuts (≤8/≤16-row capped top-k lists)",
      "corpus_dedup_costs" -> "rankedTokens prefix-offset frame (≤|charset|² rows) over the exact-dedup survivors",
      "dedup_simhash_replayable" -> "4-block pigeonhole buckets, >20-doc buckets dropped",
      "dedup_winnow_pairs" -> "fingerprint-bucketed candidates, limit(20) cut",
      "dedup_winnow_verify" -> "verified candidate pairs after the limit(20) cut",
      "graph_kcore_peel" -> "value-domain shared-count histogram (≤|distinct counts| rows)",
      "ml_class_balance_weights" -> "|classes|-row weight frame",
      "ml_decision_stump" -> "|candidate thresholds| ≤128 split frame",
      "ml_gbdt_stump_boost" -> "|candidate thresholds| ≤128 split frame per round",
      "ml_isotonic_calibration" -> "≤128-bin PAV frame",
      "ml_triplet_mining" -> "limit-cut anchor report frame",
      "profile_chi2_independence" -> "≤25-row contingency cells (N marginal)",
      "profile_cramers_v" -> "≤25-row contingency cells (N marginal)",
      "sample_stratified_neyman" -> "|strata|-row allocation frame",
      "sample_systematic_weighted" -> "per-bucket subtotals ≤65,536 rows (stride scalar)",
      "skyline_pareto" -> "shard-pruned survivor frame (global pass over survivors only)",
      "text_bpe_merge_step" -> "top-20 merge report after TakeOrdered cut",
      "text_winnow_fingerprints" -> "limit(20)-cut fingerprint report",
      "topk_threshold_algorithm" -> "≤256-row seen frame × 8-depth broadcast")
    spark.catalog.clearCache()
    System.setProperty("graft.planOnly", "true")
    val observed = try {
      SparkEntry.queries.keys.toSeq.sorted.filter { k =>
        val df = SparkEntry.queries(k)(spark, sf001)
        df.queryExecution.analyzed.collectWithSubqueries {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }.nonEmpty
      }
    } finally System.clearProperty("graft.planOnly")
    val beyond = observed.filterNot(allow.contains)
    assert(beyond.isEmpty,
      s"keys with a NEW unpartitioned window (argue the bound, then " +
        s"allowlist): $beyond\nfull observed census: $observed")
  }
}
