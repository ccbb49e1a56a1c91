package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join demonstration (the 100 TB shuffle-elimination
  * lever SCALE.md describes): writing both fact tables bucketed by the
  * join key lets the sort-merge join read pre-partitioned buckets with
  * NO shuffle exchange on either side. */
class BucketingSpec extends SparkSuite {

  test("sink_bucketed_join's graded layout joins without a shuffle exchange") {
    // writes orders_bkt/lineitem_bkt via Sinks.writeBucketed and checks values
    assert(operators.Relational.sinkBucketedJoin(spark, sf0001).count() === 5L)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("sink_corpus_layout prunes the lang partition and joins the embedding buckets exchange-free") {
    // writes the partitioned docs + bucketed embeddings layouts and
    // checks values against sf0.001
    assert(operators.Relational.sinkCorpusLayout(spark, sf0001).count() > 0L)
    // directory pruning: the lang filter must become a PartitionFilter
    // on the hive-partitioned layout (zero non-'en' files touched)
    val pruned = spark.read
      .parquet(Tables.scratch("corpus_layout_docs"))
      .filter(col("lang") === "en")
    val pp = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(pp.contains("PartitionFilters: [isnotnull(lang") && pp.contains("= en)"),
      pp.take(800))
    // bucketed side: with broadcast/AQE off, the doc⋈vec join may only
    // exchange the (pruned, unbucketed) docs side — the embeddings
    // buckets are already hash-laid-out on vec_id
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = pruned.join(spark.table("embeddings_bkt"), col("doc_id") === col("vec_id"))
      val plan = j.queryExecution.executedPlan.toString
      val n = "Exchange".r.findAllIn(plan).size
      assert(n <= 1, s"expected at most the docs-side exchange, got $n:\n${plan.take(900)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed orders ⋈ lineitem joins without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sf0001).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      Tables.lineitem(spark, sf0001).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
