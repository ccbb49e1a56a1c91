package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg
import graft.operators.Aggregations

/** Misra–Gries guarantees — the properties that hold regardless of
  * partition merge order (the estimates themselves are ✖-oracle).
  */
class HeavyHittersSpec extends SparkSuite {

  test("exact regime: k >= distinct items means the summary IS the exact count") {
    import spark.implicits._
    HeavyHittersAgg.register(spark)
    // event_type-as-long has 5 distinct values < k=8: no counter is
    // ever decremented, so every estimate must equal the exact count
    val coded = Tables.events(spark, sf0001)
      .select(xxhash64($"event_type").as("item"), $"event_type")
    val got = coded.agg(expr("heavy_hitters_agg(item)").as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.est")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = coded.groupBy($"item").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("exact regime is partitioning-invariant") {
    import spark.implicits._
    HeavyHittersAgg.register(spark)
    val base = Tables.events(spark, sf0001)
      .select(xxhash64($"event_type").as("item"))
    val run = (np: Int) => base.repartition(np)
      .agg(expr("heavy_hitters_agg(item)").as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.est")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === run(7))
  }

  test("skewed regime: heavy items survive with the n/(k+1) error bound") {
    import spark.implicits._
    HeavyHittersAgg.register(spark)
    // 500 copies of item 1, 300 of item 2, and 1200 singletons: both
    // heavy items have freq > n/(k+1) = 2000/9 ≈ 222 so MG must keep
    // them, each undercounted by at most n/(k+1)
    val n = 2000L
    val skewed = spark.range(n).select(
      when($"id" < 500, 1L).when($"id" < 800, 2L).otherwise($"id" + 1000L)
        .as("item"))
    val got = skewed.repartition(5)
      .agg(expr("heavy_hitters_agg(item)").as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.est")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = n / 9
    assert(got.contains(1L) && got(1L) >= 500 - bound && got(1L) <= 500,
      s"item 1 estimate ${got.get(1L)} outside [${500 - bound}, 500]")
    assert(got.contains(2L) && got(2L) >= 300 - bound && got(2L) <= 300,
      s"item 2 estimate ${got.get(2L)} outside [${300 - bound}, 300]")
    assert(got.size <= 8, s"summary exceeded k: ${got.size}")
  }

  test("agg_heavy_hitters: per-group summaries are bounded and ranked") {
    val rows = Aggregations.aggHeavyHitters(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.length <= 8, s"$et produced more than k rows")
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to rs.length),
        s"$et ranks not dense")
      // est_count must be non-increasing in rank (eval sorts by -est)
      val ests = ranked.map(_.getLong(3))
      assert(ests.zip(ests.tail).forall { case (a, b) => a >= b },
        s"$et estimates not sorted")
    }
  }
}
