package graft

import org.apache.spark.sql.SparkSession

/** One place for the project's local-session conventions. Every main
  * (Verify, Bench, Smoke, Explain, GoldenGen, ExtCheck, profilers) and
  * the test suite need the same base config — in particular the
  * warehouse dir pinned under target/, because any entry point that
  * touches `sink_bucketed_join` runs `saveAsTable` and would otherwise
  * litter `<cwd>/spark-warehouse`. */
object LocalSession {

  /** Per-process: concurrent JVMs (Verify alongside Bench/tests) must
    * not race on bucketed-table delete/overwrite under a shared
    * warehouse (the Tables.scratch rationale applied to saveAsTable). */
  val WarehouseDir = s"/root/repo/target/tmp/warehouse_${ProcessHandle.current().pid()}"

  /** @param cores    local[N] parallelism; shuffle partitions match it.
    * @param logLevel spark log level after startup.
    * @param extra    extra builder configs (e.g. spark.sql.extensions). */
  def create(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      logLevel: String = "ERROR",
      extra: Map[String, String] = Map.empty): SparkSession = {
    // reclaim dead-PID scratch/warehouse dirs before minting our own
    Tables.sweepStaleScratch()
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // engine default for the SMB tier: co-bucketed joins with
      // DIVISIBLE bucket counts coalesce instead of shuffling
      // (sink_txn_smb_coalesce; harmless elsewhere — equal-count
      // bucketed joins are unaffected)
      .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      // bucketed tables always scan bucketed: autoBucketedScan would
      // silently drop the bucketed read (and with it BUCKET PRUNING)
      // for scan-only queries like sink_txn_bucket_prune's point
      // lookup; the cost is scan granularity = bucket count on
      // bucketed tables, which every bucketed consumer here wants
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      // r18 optimization: Spark 4 flipped AQE coalescing to
      // advisory-size-first (parallelismFirst=false), so every
      // small-bytes shuffle coalesces toward 64 MB partitions — and a
      // CPU-heavy consumer (window rank, pair explosion, verify join)
      // of a few-MB frame then runs 1–2 tasks (measured 3–4 s
      // single-task stages on the graph_* keys). parallelismFirst=true
      // restores the Spark 3.x behavior: AQE targets
      // totalBytes/defaultParallelism (floored at minPartitionSize
      // 1 MB), i.e. parallelism scales with the cluster, not with a
      // byte constant — the scale-adaptive direction for compute-bound
      // stages; IO-bound writes that need few large files already
      // coalesce/repartition explicitly in this repo.
      // read the same escape hatch as Tables.configure so a dev
      // override (-Dgraft.parallelismFirst=false) works uniformly —
      // a hardcoded "true" here silently won over the toggle for any
      // session that never passed through configure (ADVICE r18)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.props.getOrElse("graft.parallelismFirst", "true"))
      .config("spark.sql.warehouse.dir", WarehouseDir)
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    // getOrCreate silently ignores STATIC confs (warehouse dir,
    // spark.sql.extensions, master) when a session already exists in this
    // JVM (ADVICE r2). Callers that resolve paths from the warehouse
    // (Sinks.writeBucketed) would then act under a different root than the
    // one requested — detect and warn loudly rather than proceed silently.
    val requested = Map("spark.sql.warehouse.dir" -> WarehouseDir) ++ extra
    requested.foreach { case (k, v) =>
      val got = spark.conf.getOption(k)
      // warehouse.dir is normalized to a file: URI; compare by suffix
      if (!got.exists(g => g == v || g.endsWith(v)))
        System.err.println(
          s"[LocalSession] WARNING: pre-existing session ignores static conf $k: " +
            s"requested=$v actual=${got.getOrElse("<unset>")}")
    }
    spark.sparkContext.setLogLevel(logLevel)
    Tables.configure(spark)
  }
}
