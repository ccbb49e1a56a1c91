package graft

import org.apache.spark.sql.functions._

/** Semantic property pins for the round-7 continuation keys — value
  * correctness is the oracle's job; these pin the invariants a silent
  * semantic drift would break without failing a hash on some future
  * fixture. */
class ContinuationSpec extends SparkSuite {

  test("graph_node_jaccard: scores bounded by 2^20 and consistent with set algebra") {
    val rows = operators.Behavioral.graphNodeJaccard(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shared, d1, d2, fp) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(shared <= math.min(d1, d2), "intersection can't exceed a degree")
      assert(fp >= 0 && fp <= 1048576, s"jaccard fixed point out of [0,1]: $fp")
      // floor-division definition holds exactly
      assert(fp === shared * 1048576L / (d1 + d2 - shared))
    }
  }

  test("graph_node_jaccard: a node paired with itself would score 1 (sanity via identical sets)") {
    // pairs are strictly s1 < s2, so equality never appears — instead
    // pin the ceiling: no pair of DIFFERENT suppliers reaches 2^20
    // unless their part sets are identical (shared == d1 == d2)
    val full = operators.Behavioral.graphNodeJaccard(spark, sf0001)
      .filter(col("jaccard_fp") === 1048576L).collect()
    full.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) && r.getLong(3) === r.getLong(4),
        "a perfect score requires identical part sets")
    }
  }

  test("text_collocation_lift: every surviving bigram beats independence and meets support") {
    val rows = operators.Analytics.textCollocationLift(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, "min support filter")
      assert(r.getLong(3) >= 0, "lift fixed point is non-negative")
    }
    // output is sorted by lift desc with (w1, w2) tie-break
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted.reverse, "must be ranked by lift")
  }

  test("join_lateral_topk: at most k=2 orders per customer, each customer's max first") {
    val rows = operators.Relational.joinLateralTopk(spark, sf0001).collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 2), "lateral LIMIT 2 must cap per-customer rows")
    // each emitted pair must be that customer's true top by totalprice:
    // recompute independently from the raw table
    val top = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        Tables.dec2(col("o_totalprice")).cast("double").as("p"))
      .collect().groupBy(_.getLong(0)).map { case (c, os) =>
        c -> os.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(2)
          .map(_.getLong(1)).toSet
      }
    byCust.foreach { case (c, got) =>
      assert(got.map(_.getLong(1)).toSet === top(c),
        s"customer $c lateral top-2 mismatch")
    }
    // customers with zero orders are absent (inner lateral join)
    assert(byCust.keySet.subsetOf(top.keySet))
  }
}
