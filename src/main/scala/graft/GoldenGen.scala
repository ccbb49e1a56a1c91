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

  /** The ✖-by-design keys (SURVEY §2): no DuckDB oracle exists, so these
    * goldens are their ONLY value-level regression pin — a silent
    * semantic drift inside the approximate/engine-specific set would
    * otherwise pass CI. Deterministic because data, session config
    * (local[4], 4 shuffle partitions) and every hash/sketch seed are
    * fixed; regenerate ONLY after an intentional semantic change AND a
    * re-check of the unit-pinned bounds. */
  val noOracle = Seq("agg_approx_distinct", "agg_approx_percentile",
    "agg_heavy_hitters", "agg_hll_partition_merge", "dedup_minhash_near",
    "dedup_simhash", "simsearch_ann_ivf", "simsearch_lsh_bucket",
    "udaf_typed")

  val all: Seq[String] = flagships ++ noOracle

  def csvOf(spark: SparkSession, name: String, sfDir: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString).mkString(","))
    (df.columns.mkString(",") +: rows).mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession.create()
    all.foreach { n =>
      val out = Paths.get(s"/root/repo/src/test/resources/golden/$n.csv")
      Files.createDirectories(out.getParent)
      Files.writeString(out, csvOf(spark, n, "/root/testdata/sf0.001"))
      println(s"wrote $n")
    }
    spark.stop()
  }
}
