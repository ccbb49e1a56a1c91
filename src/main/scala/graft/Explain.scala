package graft


/** Dev-only: print formatted physical plans for the named queries (or
  * all). Usage: graft.Explain [sfDir] [query...]
  *
  * Caveat: query CONSTRUCTION has side effects for some keys — the
  * sink_* keys (and source_* roundtrips) write their layouts,
  * sink_merge_upsert runs its two-phase MERGE, dedup_cluster_cc
  * iterates to convergence, and source_csv_permissive /
  * graph_triangle_count / text_decontaminate cache or persist
  * intermediates for their own lifetime (the documented
  * caller-clearCache contract). clearCache() after each plan keeps
  * repeated all-keys invocations from accumulating cached partitions. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.create()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
