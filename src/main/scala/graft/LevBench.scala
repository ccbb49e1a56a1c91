package graft

import org.apache.spark.sql.functions._

/** Dev-only: isolate the cost stages of dedup_edit_distance at sf0.1. */
object LevBench {
  def main(a: Array[String]): Unit = {
    val spark = LocalSession.create(logLevel = "WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    def d = Tables.documents(spark, dir)
      .select($"doc_id", $"text",
        array_join(slice(split($"text", " "), 1, 5), " ").as("k5"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("blocking join only ") {
        d.as("a").join(d.as("b"), $"a.k5" === $"b.k5" && $"a.doc_id" < $"b.doc_id")
          .count()
      }
      t("join + levenshtein ") {
        d.as("a").join(d.as("b"), $"a.k5" === $"b.k5" && $"a.doc_id" < $"b.doc_id")
          .select(levenshtein($"a.text", $"b.text").as("lev"))
          .agg(sum($"lev")).collect()
      }
      t("+maxlen+sim no flt ") {
        d.as("a").join(d.as("b"), $"a.k5" === $"b.k5" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
            levenshtein($"a.text", $"b.text").cast("long").as("lev"),
            greatest(length($"a.text"), length($"b.text")).cast("long").as("maxlen"))
          .withColumn("sim_fp", expr("((maxlen - lev) * 1000000) div maxlen"))
          .count()
      }
      t("+filter no sort    ") {
        d.as("a").join(d.as("b"), $"a.k5" === $"b.k5" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
            levenshtein($"a.text", $"b.text").cast("long").as("lev"),
            greatest(length($"a.text"), length($"b.text")).cast("long").as("maxlen"))
          .withColumn("sim_fp", expr("((maxlen - lev) * 1000000) div maxlen"))
          .filter($"sim_fp" >= 900000)
          .count()
      }
      t("full operator      ") {
        operators.LlmOps.dedupEditDistance(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
