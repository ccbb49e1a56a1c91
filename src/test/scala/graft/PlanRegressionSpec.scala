package graft

/** Plan-shape regression: the properties SCALE.md claims must stay true
  * in the physical plans — pushdown reaching the scan, broadcast joins
  * on dims, pruned read schemas. Guards against silent plan regressions
  * that correctness tests can't see. */
class PlanRegressionSpec extends SparkSuite {

  // formatted mode: executedPlan.toString truncates PushedFilters/ReadSchema
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

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

  test("quadratic plans appear ONLY in the documented similarity baselines") {
    val allowed = Set("simsearch_cosine_topk", "dedup_embedding_cosine", "simsearch_ann_ivf")
    val offenders = SparkEntry.queries.keys.filterNot(allowed)
      .filter(n => n != "source_csv_roundtrip" && plan(n).contains("BroadcastNestedLoopJoin"))
    assert(offenders.isEmpty, s"unexpected nested-loop joins: $offenders")
  }
}
