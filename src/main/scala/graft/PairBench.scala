package graft
import org.apache.spark.sql.functions._
/** Dev-only: isolate the cost stages of the quadratic cosine NN. */
object PairBench {
  def main(a: Array[String]): Unit = {
    val spark = LocalSession.create()
    import spark.implicits._
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding", sqrt(expr("dot_product(embedding, embedding)")).as("nrm"))
    val pairs = e.select($"vec_id".as("a_id"), $"embedding".as("ae"), $"nrm".as("an"))
      .crossJoin(e.select($"vec_id".as("b_id"), $"embedding".as("be"), $"nrm".as("bn")))
      .filter($"a_id" =!= $"b_id")
    def t(tag: String)(f: => Any): Unit = { val t0=System.nanoTime(); f; println(f"$tag ${(System.nanoTime()-t0)/1e9}%.2f s") }
    for (_ <- 1 to 2) {
      t("cross count        ") { pairs.count() }
      t("cross + dot        ") { pairs.select(expr("dot_product(ae, be)").as("d")).agg(sum($"d")).collect() }
      t("cross + score+round") { pairs.select(round(expr("dot_product(ae, be)")/($"an"*$"bn"),6).as("c")).agg(sum($"c")).collect() }
      t("full operator      ") { operators.LlmOps.dedupEmbeddingCosine(spark, "/root/testdata/sf0.1").count() }
    }
    spark.stop()
  }
}
/** Dev-only: does floor(x*1e6+0.5) agree with round(x,6)*1e6 on all pair scores? */
object RoundCheck {
  def main(a: Array[String]): Unit = {
    val spark = LocalSession.create()
    import spark.implicits._
    graft.functions.VectorOps.registerAll(spark)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding", sqrt(expr("dot_product(embedding, embedding)")).as("nrm"))
      val pairs = e.select($"vec_id".as("a_id"), $"embedding".as("ae"), $"nrm".as("an"))
        .crossJoin(e.select($"vec_id".as("b_id"), $"embedding".as("be"), $"nrm".as("bn")))
        .filter($"a_id" =!= $"b_id")
        .select((expr("dot_product(ae, be)")/($"an"*$"bn")).as("c"))
      val diff = pairs.select(
          (round($"c"*1e6, 0).cast("long")).as("slow"),
          floor($"c"*1e6 + 0.5).cast("long").as("fast"),
          round($"c", 6).as("r6"))
        .withColumn("viaFast", $"fast".cast("double")/1e6)
      println(sf + " mismatch slow-vs-fast: " + diff.filter($"slow" =!= $"fast").count()
        + ", r6-vs-viaFast: " + diff.filter($"r6" =!= $"viaFast").count()
        + ", neg scores: " + diff.filter($"r6" < 0).count())
    }
    spark.stop()
  }
}
/** Dev-only: stage timings for the minhash pipeline. */
object MinhashStageBench {
  def main(a: Array[String]): Unit = {
    val spark = LocalSession.create()
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Any): Unit = { val t0=System.nanoTime(); f; println(f"$tag ${(System.nanoTime()-t0)/1e9}%.2f s") }
    for (_ <- 1 to 2) {
      val docs = Tables.documents(spark, dir).select($"doc_id", split($"text"," ").as("toks")).filter(size($"toks") >= 3)
      val shRaw = docs.select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))")).as("sh_str"))
      t("explode only      ") { shRaw.count() }
      val sh = shRaw.select($"doc_id", xxhash64($"sh_str").as("sh"))
      t("explode+hash+dist ") { sh.distinct().count() }
      val shD = sh.distinct().cache(); shD.count()
      val sigUdaf = udaf(new graft.functions.MinHashSig(16))
      t("signatures        ") { shD.groupBy($"doc_id").agg(sigUdaf($"sh").as("sig")).count() }
      t("full operator     ") { operators.LlmOps.dedupMinhashNear(spark, dir).count() }
      shD.unpersist()
    }
    spark.stop()
  }
}
