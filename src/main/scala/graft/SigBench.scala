package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-bench: declarative 16×min(hash) signature vs the
  * one-buffer MinHashSig aggregator, over sf0.1 shingles. */
object SigBench {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.create()
    import spark.implicits._
    val sh = Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .select($"doc_id", xxhash64($"t").as("sh")).cache()
    sh.count() // materialize
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val sigCols = (0 until 16).map(i => min(hash($"sh", lit(i))).as(s"h$i"))
    for (_ <- 1 to 3) {
      time("declarative") { sh.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*).count() }
      val sigUdaf = udaf(new graft.functions.MinHashSig(16))
      time("aggregator ") { sh.groupBy($"doc_id").agg(sigUdaf($"sh").as("sig")).count() }
    }
    spark.stop()
  }
}
