package graft

import org.apache.spark.sql.SparkSession

/** One place for the project's local-session conventions. Every main
  * (Verify, Bench, Smoke, Explain, GoldenGen, ExtCheck, profilers) and
  * the test suite need the same base config — in particular the
  * warehouse dir pinned under target/, because any entry point that
  * touches `sink_bucketed_join` runs `saveAsTable` and would otherwise
  * litter `<cwd>/spark-warehouse`. */
object LocalSession {

  val WarehouseDir = "/root/repo/target/tmp/warehouse"

  /** @param cores    local[N] parallelism; shuffle partitions match it.
    * @param logLevel spark log level after startup.
    * @param extra    extra builder configs (e.g. spark.sql.extensions). */
  def create(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      logLevel: String = "ERROR",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", WarehouseDir)
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    Tables.configure(spark)
  }
}
