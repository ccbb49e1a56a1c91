package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

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
}
