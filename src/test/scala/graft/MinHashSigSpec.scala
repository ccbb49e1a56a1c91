package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashSig

/** The one-pass MinHash signature aggregator: correctness vs a local
  * reference, and merge associativity under different partitioning. */
class MinHashSigSpec extends SparkSuite {

  private val K = 16

  test("aggregator signature equals locally computed signature") {
    import spark.implicits._
    val agg = new MinHashSig(K)
    val sigUdaf = udaf(agg)
    val data = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 99L))
    val got = data.toDF("doc", "sh")
      .groupBy("doc").agg(sigUdaf(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def local(shs: Seq[Long]): Seq[Long] =
      shs.map(sh => agg.reduce(agg.zero, sh)).reduce(agg.merge).toSeq
    assert(got(1L) === local(Seq(10L, 20L, 30L)))
    assert(got(2L) === local(Seq(10L, 99L)))
  }

  test("signature is partitioning-invariant (merge law) on real shingles") {
    import spark.implicits._
    val sigUdaf = udaf(new MinHashSig(K))
    val sh = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("sh"))
    def sigs(parts: Int) = sh.repartition(parts, col("doc_id"))
      .groupBy("doc_id").agg(sigUdaf(col("sh")).as("sig"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(sigs(2) === sigs(7))
  }
}
