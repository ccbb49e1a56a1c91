package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Table readers for the driver-provided parquet fixtures.
  *
  * Every query goes through here so session-level gotchas are handled in
  * exactly one place:
  *
  *  - `events.ts` has shipped in two physical forms across driver
  *    fixture generations: parquet TIMESTAMP(NANOS) (reads as BIGINT
  *    nanos under `spark.sql.legacy.parquet.nanosAsLong=true`, SURVEY.md
  *    §7 G1) and, since the round-8 regeneration, TIMESTAMP(MICROS)
  *    (reads as TIMESTAMP_NTZ). [[events]] normalizes BOTH to the
  *    repo-wide contract — BIGINT nanoseconds since epoch — so every
  *    operator keeps using `nsToUs`/`tsFromNanos` unchanged. The DuckDB
  *    oracle reads the same column natively as a timestamp either way,
  *    so oracle SQL keeps comparing via `epoch_us(ts)`.
  *  - Session timezone is pinned to UTC so date extraction matches the
  *    (timezone-less) DuckDB timestamps.
  *
  * Scale posture: plain `spark.read.parquet` — schema comes from the
  * footer, column pruning + predicate pushdown are Catalyst's job. At
  * 100 TB these would be partitioned directory layouts; the read path is
  * unchanged.
  */
object Tables {
  /** Idempotent per-session configuration. Verify/Bench build their own
    * sessions without the nanos flag, so it must be set here, before the
    * first read of events.parquet. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE coalescing: parallelism-first (r18 optimization, REVERSING the
    // earlier advisory-first call). Measured at sf0.1/local[32]: with
    // advisory-first a few-MB post-shuffle frame coalesces to 1–2
    // partitions and any CPU-heavy consumer (window rank over 6.7M pair
    // records, verify joins, explodes) runs single-threaded — 3.5 s
    // single-task stages on the graph_* keys. parallelismFirst=true
    // targets totalBytes/defaultParallelism (floored at the 1 MB
    // minPartitionSize, so tiny frames still coalesce to 1): partitions
    // scale with the executor count, which is also the scale-correct
    // shape at 100 TB where a 64 MB-advisory coalesce is fine for IO
    // but starves compute-bound stages on small reduced frames.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.props.getOrElse("graft.parallelismFirst", "true"))
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events with `ts` normalized to BIGINT epoch-nanos regardless of the
    * fixture generation's physical type. TIMESTAMP_NTZ → instant via a
    * session-tz cast (pinned UTC in [[configure]], so the cast is the
    * identity on the instant); µs→ns is exact (`*1000` on a µs-precision
    * value). LongType fixtures pass through untouched. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    // injected test fixtures may omit ts entirely (RoundingSpec)
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType != org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Per-process scratch dir for staging writes (sink/roundtrip keys).
    * Concurrent sessions — a Verify run alongside Bench, Explain
    * --exec, or the test suite — must never clobber each other's
    * staging directories: a shared fixed path let one session's
    * sf0.001 overwrite land under another's sf0.1 read (observed as a
    * sink_partitioned_read mismatch during an overlapped run). */
  def scratch(name: String): String = {
    sweepStaleScratch()
    s"/root/repo/target/tmp/${name}_${ProcessHandle.current().pid()}"
  }

  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Once-per-JVM sweep of `target/tmp/<name>_<pid>` dirs whose owning
    * process is dead. Per-PID isolation means every JVM mints fresh
    * staging/warehouse dirs; without reclamation the tmp root grows
    * unboundedly across runs (ADVICE r8). Live-PID dirs (concurrent
    * sessions) and non-suffixed names are left untouched. */
  def sweepStaleScratch(): Unit = {
    if (!swept.compareAndSet(false, true)) return
    val root = new java.io.File("/root/repo/target/tmp")
    val self = ProcessHandle.current().pid()
    val suffixed = "^.*_([0-9]+)$".r
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      f.getName match {
        case suffixed(p) =>
          // Try: a >19-digit suffix would overflow toLong and abort every
          // session whose first scratch() call runs the sweep (ADVICE r9)
          scala.util.Try(p.toLong).foreach { pid =>
            val o = ProcessHandle.of(pid)
            val alive = o.isPresent && o.get.isAlive
            if (pid != self && !alive) deleteRecursively(f)
          }
        case _ => ()
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    // never follow symlinks: a pid-suffixed symlink under target/tmp must
    // not let the sweep reach outside the scratch root (ADVICE r9) — the
    // link itself is deleted, its target is left untouched
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Exact floor-division of a BIGINT nanos column by 1000 → micros.
    * NOT `c / 1000`: Column./ is double division, which both loses
    * precision above 2^53 (epoch-nanos ≈ 1.7e18) and rounds instead of
    * flooring. Decimal division + long cast truncates exactly, matching
    * DuckDB's `epoch_us` (its parquet reader already truncates
    * TIMESTAMP_NS to microseconds). */
  def nsToUs(nanos: Column): Column =
    (nanos.cast("decimal(38,0)") / lit(1000)).cast("long")

  /** events.ts (BIGINT nanos) → TimestampType (microsecond precision). */
  def tsFromNanos(nanos: Column): Column = timestamp_micros(nsToUs(nanos))

  /** Exact-decimal view of a 2-decimal money/ratio double column.
    * FIXTURES.md: l_discount/l_tax/l_extendedprice/o_totalprice/acctbal
    * are exactly 2-decimal, so this cast is lossless; aggregation in
    * decimal is then order-independent (the FP-determinism rule,
    * SURVEY.md §7 G2). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** events.value is exactly 4-decimal (verified against the fixtures). */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")
}
