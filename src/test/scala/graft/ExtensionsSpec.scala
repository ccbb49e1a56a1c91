package graft

/** GraftExtensions must make the native functions available to plain
  * spark.sql in a session built with the extension installed. */
class ExtensionsSpec extends SparkSuite {

  test("spark.sql.extensions session exposes cosine_similarity/dot_product in SQL") {
    // Must run in a fresh JVM: getOrCreate in this JVM would reuse the
    // shared test session and silently skip extension installation.
    import scala.sys.process._
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq("java") ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"), "graft.ExtCheck", sf0001)
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code === 0 && out.toString.contains("EXTCHECK_OK"), out.toString)
  }

  test("partitioned layout write enables partition pruning") {
    import org.apache.spark.sql.functions._
    val dir = Tables.scratch("events_by_day")
    val e = graft.streaming.Streamy.eventsWithTimePublic(spark, sf0001)
      .withColumn("day", to_date(col("ts_ts")))
    e.write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() > 0)
    // pruning really skipped data: reading one day < reading all days
    val allDays = spark.read.parquet(dir).count()
    assert(pruned.count() < allDays)
  }
}
