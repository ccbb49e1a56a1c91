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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%6.2f s  $name%-40s rows=$n")
    }

    def shingles: DataFrame =
      Tables.documents(spark, sfDir)
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """transform(sequence(1, size(toks) - 2),
            |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))""".stripMargin))
          .as("sh_str"))
        .select($"doc_id", xxhash64($"sh_str").as("sh"))
        .distinct()

    val K = 16; val Bands = 4; val r = K / Bands

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
    def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.as("sa"), $"doc_a" === $"sa.doc_id")
        .join(sh.as("sb"), $"doc_b" === $"sb.doc_id" && $"sa.sh" === $"sb.sh")
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("ni"))
      inter
        .join(sizes.as("na"), $"doc_a" === $"na.doc_id")
        .join(sizes.as("nb"), $"doc_b" === $"nb.doc_id")
        .select($"doc_a", $"doc_b",
          ($"ni".cast("double") / ($"na.n" + $"nb.n" - $"ni")).as("jaccard"))
    }
    def full(sig: DataFrame => DataFrame, cache: Boolean): Long = {
      val sh = if (cache) shingles.cache() else shingles
      val out = jaccard(candFrom(banded(sig(sh))), sh)
        .filter($"jaccard" >= 0.5).orderBy($"doc_a", $"doc_b").count()
      if (cache) sh.unpersist(blocking = true)
      out
    }

    t("shingles.count") { shingles.count() }
    t("full: cache + UDAF (CURRENT)") { full(sigsU, cache = true) }
    t("full: nocache + UDAF") { full(sigsU, cache = false) }
    t("full: cache + declarative") { full(sigsD, cache = true) }
    t("full: nocache + declarative") { full(sigsD, cache = false) }
    t("full: CURRENT again (warm)") { full(sigsU, cache = true) }
    t("full: nocache+decl again (warm)") { full(sigsD, cache = false) }
    spark.stop()
  }
}
