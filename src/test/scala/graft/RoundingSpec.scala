package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Analytics

/** Pins the fast-rounding equivalence dedup_embedding_cosine relies on:
  * floor(x·1e6 + 0.5) must agree with round(x, 6)·1e6 (BigDecimal
  * HALF_UP) for every pairwise cosine score in the fixtures, and
  * decoding c6/1e6 must reproduce round(x, 6) bit-for-bit. */
class RoundingSpec extends SparkSuite {

  test("fast integer rounding equals BigDecimal rounding on all sf0.001 pair scores") {
    import spark.implicits._
    VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding", sqrt(expr("dot_product(embedding, embedding)")).as("nrm"))
    val scores = e.select($"embedding".as("ae"), $"nrm".as("an"))
      .crossJoin(e.select($"embedding".as("be"), $"nrm".as("bn")))
      .select((expr("dot_product(ae, be)") / ($"an" * $"bn")).as("c"))
    val diff = scores.select(
      round($"c" * 1e6, 0).cast("long").as("slow"),
      floor($"c" * 1e6 + 0.5).cast("long").as("fast"),
      round($"c", 6).as("r6"))
    assert(diff.filter($"slow" =!= $"fast").count() === 0L)
    assert(diff.filter($"r6" =!= $"fast".cast("double") / 1e6).count() === 0L)
  }

  test("anomaly_mad_outliers classifies a value EXACTLY on the 3·MAD boundary deterministically") {
    import spark.implicits._
    // Crafted fixture: values sorted 1,2,2,2,3,5,5.0001,-1.0001 →
    // median = 2, deviations 1,0,0,0,1,3,3.0001,3.0001 → MAD = 1.
    // The value 5.0 sits EXACTLY at med + 3·MAD: strict `>` must
    // exclude it on BOTH engines. In the fixed-point formulation the
    // compare is 2·adev2 > 3·mad4 over BIGINTs — there is no floating
    // rounding on the classification path at all, so the boundary row
    // cannot flip cross-engine (the oracle SQL mirrors the same
    // integer arithmetic; the sf0.01 hash-match certifies parity).
    val dir = "/root/repo/target/tmp/mad_boundary_fixture"
    Seq(1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0001, -1.0001)
      .map(v => ("t1", v)).toDF("event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Analytics.anomalyMadOutliers(spark, dir).collect()
    assert(row.length === 1)
    assert(row(0).getAs[Double]("med") === 2.0)
    assert(row(0).getAs[Double]("mad") === 1.0)
    // only the two ±3.0001-deviation rows; NOT the exact-boundary 5.0
    assert(row(0).getAs[Long]("n_outliers") === 2L)
    assert(row(0).getAs[Long]("n") === 8L)
  }
}
