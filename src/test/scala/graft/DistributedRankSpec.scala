package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Direct equivalence laws for the DistributedRank decomposition: on
  * frames small enough to ground-truth with the single-partition
  * window it replaces, `rankCum`/`rankCumBy` must be BIT-EQUAL — rank
  * by rank, running sum by running sum — including the shapes the
  * decomposition exists to survive (heavy tie-runs, negative order
  * values, singleton and near-empty frames). The ntile inversion is
  * checked against Spark's own `ntile` under the identical total
  * order. */
class DistributedRankSpec extends SparkSuite {
  import operators.DistributedRank

  private def groundTruth(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("v", "tie", "w").repartition(7)
    val wo = Window.orderBy($"v", $"tie")
    val truth = df
      .withColumn("rnk_t", row_number().over(wo).cast("long"))
      .withColumn("cum_t", sum($"w")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    (df, truth)
  }

  private def checkFrame(rows: Seq[(Long, Long, Long)]): Unit = {
    val (df, truth) = groundTruth(rows)
    val wTotal = rows.map(_._3).sum
    val got = DistributedRank.rankCum(df, "v", "tie", "w").collect()
    assert(got.length === rows.length)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (rt, ct) = truth(key)
      assert(r.getAs[Long]("rnk") === rt, s"rank mismatch at $key")
      assert(r.getAs[Long]("cum") === ct, s"cum mismatch at $key")
      assert(r.getAs[Long]("w_total") === wTotal)
    }
  }

  test("rankCum ≡ single-window rank/cumsum on a mixed frame") {
    // negatives, duplicated order values, irregular weights
    checkFrame(Seq(
      (-5L, 3L, 2L), (-5L, 1L, 7L), (0L, 10L, 1L), (0L, 2L, 4L),
      (0L, 7L, 3L), (12L, 0L, 5L), (12L, 99L, 1L), (-100L, 50L, 9L),
      (7L, 7L, 2L), (7L, 8L, 2L), (7L, 9L, 2L)))
  }

  test("rankCum survives a heavy tie-run (one value, many ties)") {
    // the shape that breaks value-only bucketing: 500 rows share v=0 —
    // the tie-bucket split must still give each a distinct exact rank
    checkFrame((1L to 500L).map(t => (0L, t * 13L % 1000L + t, t % 7L)) ++
      Seq((-1L, 1L, 3L), (1L, 1L, 3L)))
  }

  test("rankCum on singleton and two-row frames") {
    checkFrame(Seq((42L, 7L, 5L)))
    checkFrame(Seq((2L, 1L, 1L), (1L, 2L, 1L)))
  }

  test("rankCumBy ranks independently within each group") {
    import spark.implicits._
    val rows = for (g <- 1L to 3L; i <- 1L to 40L)
      yield (g, (i * 17L) % 11L, i, i % 5L)
    val df = rows.toDF("g", "v", "tie", "w").repartition(5)
    val wo = Window.partitionBy($"g").orderBy($"v", $"tie")
    val truth = df
      .withColumn("rnk_t", row_number().over(wo).cast("long"))
      .withColumn("cum_t", sum($"w")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val got = DistributedRank.rankCumBy(df, "g", "v", "tie", "w").collect()
    assert(got.length === rows.length)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (rt, ct) = truth(key)
      assert(r.getAs[Long]("rnk") === rt, s"rank mismatch at $key")
      assert(r.getAs[Long]("cum") === ct, s"cum mismatch at $key")
      assert(r.getAs[Long]("w_total") === totals(key._1))
    }
  }

  test("ntileFromRank ≡ Spark ntile for every (n, k) shape") {
    import spark.implicits._
    for (n <- Seq(1, 3, 4, 5, 7, 12, 150); k <- Seq(2, 5)) {
      val df = (1L to n.toLong).map(i => (i, n.toLong)).toDF("rnk", "n")
      val got = df.select($"rnk",
        DistributedRank.ntileFromRank("rnk", "n", k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = (1L to n.toLong).toDF("x")
        .withColumn("s", ntile(k).over(Window.orderBy($"x")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"ntile inversion diverges at n=$n k=$k")
    }
  }
}
