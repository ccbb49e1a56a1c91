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

  test("sink_txn_smb_merge: layout recorded in the manifest, co-bucketed merge plans with no Exchange and no Sort") {
    import graft.sources.TxnTable
    // run the key: stages both bucketed snapshots + layout manifests
    val out = operators.LakehouseCow.sinkTxnSmbMerge(spark, sf0001)
    assert(out.count() > 0L)
    // the log records the layout on every version, including the
    // merge's OUTPUT (the invariant that compounds across merges)
    val tbl = Tables.scratch("txn_smb_state")
    val dTbl = Tables.scratch("txn_smb_delta")
    assert(TxnTable.layoutOf(spark, tbl, Some(0))
      === Some("user_id:8:smb_state_v0"))
    assert(TxnTable.layoutOf(spark, dTbl, Some(0))
      === Some("user_id:8:smb_delta_b0"))
    assert(TxnTable.layoutOf(spark, tbl, Some(1))
      === Some("user_id:8:smb_state_v1"))
    // the co-bucketed MoR merge is exchange-free AND sort-free: both
    // sides are pre-hashed (bucketBy) and pre-sorted (sortBy, one file
    // per bucket) on user_id
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // Spark ignores bucket SORT metadata by default since 3.0
    // (SPARK-28595: multi-file buckets would need a merge-read); with
    // one file per bucket (writeBucketed repartitions) the legacy conf
    // restores the sorted scan — the full SMB: no exchange AND no sort
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    try {
      val merged = operators.LakehouseCow.smbMerge(
        spark.table("smb_state_v0"), spark.table("smb_delta_b0"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected exchange-free co-bucketed merge, got:\n$plan")
      assert(!plan.contains("Sort "),
        s"expected sort-free merge over sorted buckets, got:\n$plan")
      // merged ≡ recompute over all events
      val direct = Tables.events(spark, sf0001)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      assert(merged.select(col("user_id"), col("n_events"))
        .exceptAll(direct).count() === 0L)
      assert(merged.count() === direct.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf
        .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("sink_txn_smb_coalesce: divisible bucket counts coalesce and merge with no Exchange; the coarse layout is committed") {
    import graft.sources.TxnTable
    val out = operators.LakehouseCow.sinkTxnSmbCoalesce(spark, sf0001)
    assert(out.count() > 0L)
    val tbl = Tables.scratch("txn_smbc_state")
    assert(TxnTable.layoutOf(spark, tbl, Some(0))
      === Some("user_id:8:smbc_state_v0"))
    // the merge output adopted the COARSE side's count
    assert(TxnTable.layoutOf(spark, tbl, Some(1))
      === Some("user_id:4:smbc_state_v1"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 8-bucket side coalesces onto the 4-bucket side: SMJ, zero
      // exchange (the coalesceBucketsInJoin engine default)
      val merged = operators.LakehouseCow.smbMerge(
        spark.table("smbc_state_v0"), spark.table("smbc_delta_b0"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected coalesced exchange-free merge, got:\n$plan")
      assert(plan.contains("SelectedBucketsCount: 8 out of 8 (Coalesced to 4)"),
        s"expected the 8→4 coalesce marker in the scan, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("sink_txn_bucket_prune: the literal IN-list scans ≤|probes| of 8 buckets and returns exactly the probed rows") {
    import graft.sources.TxnTable
    val out = operators.LakehouseCow.sinkTxnBucketPrune(spark, sf0001)
      .collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(TxnTable.layoutOf(spark, Tables.scratch("txn_bprune_state"),
      Some(0)) === Some("user_id:8:bprune_state"))
    // re-derive the panel and pin the pruned scan
    val keys = out.map(_.getLong(0)).toSeq
    val looked = spark.table("bprune_state")
      .filter(col("user_id").isin(keys: _*))
    val plan = looked.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(plan)
    assert(m.nonEmpty, s"no bucket pruning in the scan:\n$plan")
    assert(m.get.group(1).toInt <= keys.size,
      s"scan read ${m.get.group(1)} buckets for ${keys.size} probes")
    // content law: the probed rows are the 5 smallest users' states
    val expect = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct()
      .orderBy(col("user_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(keys.sorted === expect.sorted)
  }
}
