package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only: regenerate the golden CSVs for the flagship queries
  * (src/test/resources/golden/, asserted by GoldenSpec). Run after an
  * intentional semantic change AND a green oracle check — goldens pin
  * the oracle-verified behavior, they don't define it. */
object GoldenGen {
  val flagships = Seq("agg_groupby_sum", "join_multiway_star", "agg_wordcount",
    "topk_limit", "text_stats", "graph_pagerank", "text_tfidf",
    "sql_recursive_cte", "q4_order_priority", "q6_forecast_revenue",
    "funnel_conversion", "timeseries_ohlc_bars", "graph_triangle_count",
    "agg_transition_matrix", "compact_incremental_agg")

  def csvOf(spark: SparkSession, name: String, sfDir: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString).mkString(","))
    (df.columns.mkString(",") +: rows).mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession.create()
    flagships.foreach { n =>
      val out = Paths.get(s"/root/repo/src/test/resources/golden/$n.csv")
      Files.createDirectories(out.getParent)
      Files.writeString(out, csvOf(spark, n, "/root/testdata/sf0.001"))
      println(s"wrote $n")
    }
    spark.stop()
  }
}
