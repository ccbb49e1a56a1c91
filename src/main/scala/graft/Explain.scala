package graft


/** Dev-only: print formatted physical plans for the named queries (or
  * all). Usage: graft.Explain [--exec] [sfDir] [query...]
  *
  * Plan-only by DEFAULT: sets `graft.planOnly` so query construction is
  * side-effect-free — the sink/round-trip keys print their unexecuted
  * equivalent frame instead of writing tmp layouts, and the iterative
  * keys (connected components) print one unexecuted round instead of
  * converging (see [[PlanOnly]]). A full 179-key dump touches no disk
  * and runs no Spark job. Pass `--exec` to restore the old behavior
  * (real writes + loops — needed only when auditing the layout-backed
  * scan properties themselves, which SinksSpec/BucketingSpec pin
  * anyway). clearCache() after each plan keeps repeated --exec
  * invocations from accumulating cached partitions. */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    if (!flags.contains("--exec")) System.setProperty("graft.planOnly", "true")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.create()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
