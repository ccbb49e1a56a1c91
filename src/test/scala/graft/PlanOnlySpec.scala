package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Pins the plan-only contract (PlanOnly + graft.Explain's default):
  * with `graft.planOnly` set, constructing ANY side-effecting key —
  * round-trip sources, layout sinks, the iterative cluster/pagerank
  * loops — must touch no file under target/tmp, run no job-driving
  * count, and still yield a frame with the graded output columns, so a
  * full plan dump stays a pure plan dump. */
class PlanOnlySpec extends SparkSuite {

  private val tmpRoot = Paths.get("/root/repo/target/tmp")

  private def snapshot(): Map[Path, Long] =
    if (!Files.exists(tmpRoot)) Map.empty
    else Files.walk(tmpRoot).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p -> Files.getLastModifiedTime(p).toMillis).toMap

  test("plan-only construction of every side-effecting key leaves target/tmp untouched") {
    val keys = Seq(
      "source_csv_roundtrip", "source_orc_roundtrip", "source_jsonl_roundtrip",
      "source_xml_roundtrip", "source_csv_permissive", "source_schema_evolution",
      "sql_ctas_insert", "sink_partitioned_read", "sink_bucketed_join",
      "sink_corpus_layout", "sink_dynamic_overwrite", "sink_merge_upsert",
      "dedup_cluster_cc", "graph_pagerank", "text_tfidf",
      "sink_compact_small_files", "text_bpe_merge_loop",
      "text_bpe_tokenize", "text_index_delta_merge",
      "source_binaryfile_ingest",
      // the persisting keys: PlanOnly.mark must not even REGISTER a
      // cache entry in plan-only mode
      "text_decontaminate", "dedup_semantic_cluster", "graph_triangle_count",
      "corpus_dedup_pipeline")
    // run the one-time stale-scratch janitor BEFORE the first
    // snapshot: its first trigger is otherwise the Tables.scratch call
    // inside the construction loop (SparkSuite doesn't go through
    // LocalSession.create), and snapshotting first would blame the
    // janitor's dead-PID deletions on the plan-only construction
    Tables.sweepStaleScratch()
    spark.catalog.clearCache()
    val before = snapshot()
    System.setProperty("graft.planOnly", "true")
    try {
      keys.foreach { k =>
        val df = SparkEntry.queries(k)(spark, sf0001)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(p.nonEmpty, k)
        assert(!p.contains("InMemoryTableScan"),
          s"$k registered a cache entry under plan-only")
      }
    } finally System.clearProperty("graft.planOnly")
    assert(spark.sharedState.cacheManager.isEmpty,
      "plan-only construction left entries in the CacheManager")
    val after = snapshot()
    assert(after === before,
      s"plan-only construction wrote/touched: ${(after.toSet diff before.toSet).take(5)}")
  }

  test("plan-only frames keep the graded column surface") {
    System.setProperty("graft.planOnly", "true")
    try {
      assert(SparkEntry.queries("sink_merge_upsert")(spark, sf0001).columns.toSeq ===
        Seq("user_id", "event_id", "event_type", "ts_us", "value", "action"))
      assert(SparkEntry.queries("sink_corpus_layout")(spark, sf0001).columns.toSeq ===
        Seq("label", "n_docs", "sum_chars", "sum_e0_fp"))
      assert(SparkEntry.queries("source_schema_evolution")(spark, sf0001).columns.toSeq ===
        Seq("v", "n_nationkey", "n_name", "n_regionkey"))
      assert(SparkEntry.queries("dedup_cluster_cc")(spark, sf0001).columns.toSeq ===
        Seq("doc_id", "cluster_rep", "cluster_sz"))
    } finally System.clearProperty("graft.planOnly")
  }

  test("exec mode still writes the layouts (the graded path is unchanged)") {
    // property NOT set: the csv round trip must really write its tmp dir
    val canary = java.nio.file.Paths.get(Tables.scratch("csv_roundtrip"))
    org.apache.commons.io.FileUtils.deleteQuietly(canary.toFile)
    assert(operators.Relational.sourceCsvRoundtrip(spark, sf0001).count() > 0)
    assert(Files.exists(canary), "exec-mode round trip no longer writes its layout")
  }
}
