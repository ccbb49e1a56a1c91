package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling main for the dedup_minhash_near pipeline: times each
  * stage and a few formulation variants in one JVM (codegen compile is
  * per-plan, so per-stage cold compile cost still shows).
  * Usage: graft.ProfMinhash [sfDir]
  */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.create(cores = "32", logLevel = "WARN")
    import spark.implicits._

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%6.2f s  $name%-40s rows=$n")
    }

    // the SHARED stages come from LlmOps so this profiler always
    // measures the shipped pipeline (only the signature formulations
    // under comparison are written out locally)
    import graft.operators.LlmOps
    def shingles: DataFrame = LlmOps.shingles(spark, sfDir)

    val K = LlmOps.MinhashK; val Bands = LlmOps.Bands; val r = K / Bands

    // warmup, as Bench does
    try {
      spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().count()
      spark.range(1000).selectExpr("sum(id)").collect()
    } catch { case _: Throwable => }

    val sigUdaf = udaf(new graft.functions.MinHashSig(K))
    def sigsU(sh: DataFrame): DataFrame =
      sh.groupBy($"doc_id").agg(sigUdaf($"sh").as("sig"))
    def sigsD(sh: DataFrame): DataFrame =
      sh.groupBy($"doc_id")
        .agg(array((0 until K).map(i => min(hash($"sh", lit(i)))): _*).as("sig"))
    def banded(sigs: DataFrame): DataFrame = {
      val bandCols = (0 until Bands).map { b =>
        struct(lit(b).as("band"),
          hash((b * r until (b + 1) * r).map(i => element_at($"sig", i + 1)): _*).as("bh"))
      }
      sigs.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
        .select($"doc_id", $"bk.band", $"bk.bh")
    }
    def candFrom(b: DataFrame): DataFrame =
      b.as("a").join(b.as("b"),
          $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .distinct()
    def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame =
      LlmOps.exactJaccard(pairs, sh)
    def full(sig: DataFrame => DataFrame, cache: Boolean): Long = {
      val sh = if (cache) shingles.cache() else shingles
      val out = jaccard(candFrom(banded(sig(sh))), sh)
        .filter($"jaccard" >= 0.5).orderBy($"doc_a", $"doc_b").count()
      if (cache) sh.unpersist(blocking = true)
      out
    }

    t("shingles.count") { shingles.count() }
    t("full: cache + UDAF (round-1 formulation)") { full(sigsU, cache = true) }
    t("full: nocache + UDAF") { full(sigsU, cache = false) }
    t("full: cache + declarative") { full(sigsD, cache = true) }
    t("full: nocache + declarative (CURRENT)") { full(sigsD, cache = false) }
    t("full: round-1 again (warm)") { full(sigsU, cache = true) }
    t("full: CURRENT again (warm)") { full(sigsD, cache = false) }
    spark.stop()
  }
}
