package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The native CosineSimilarity expression must be bit-identical to the
  * higher-order-function formulation (same sequential IEEE fold). */
class VectorOpsSpec extends SparkSuite {

  private def hofCosine = {
    val dot = (a: String, b: String) =>
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    expr(s"${dot("qe", "embedding")} / (sqrt(${dot("qe", "qe")}) * sqrt(${dot("embedding", "embedding")}))")
  }

  test("native cosine == HOF cosine bitwise on all pairs") {
    VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val both = e.crossJoin(q)
      .select(
        expr("cosine_similarity(qe, embedding)").as("native"),
        hofCosine.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
    assert(both.count() === 1500L)
  }

  test("cosine of a vector with itself is 1") {
    VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, sf0001)
    val self = e.select(expr("cosine_similarity(embedding, embedding)").as("c"))
    assert(self.filter(abs(col("c") - 1.0) > 1e-9).count() === 0L)
  }

  test("ml_pca_power_iter: the default Gram FOLD path is bit-identical to the explode path") {
    // BIGINT addition is associative/commutative, so the per-partition
    // triangle fold (the default) must reproduce the per-row explode's
    // Gram exactly — and with it both power iterates, at any partitioning
    val folded = operators.Multimodal.mlPcaPowerIter(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.pca.gramFold", "false")
    try {
      val exploded = operators.Multimodal.mlPcaPowerIter(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      assert(folded === exploded, "the two Gram builds must be bit-identical")
    } finally spark.conf.unset("spark.graft.pca.gramFold")
  }
}
