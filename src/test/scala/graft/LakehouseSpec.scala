package graft

import org.apache.spark.sql.functions._
import graft.sources.TxnTable

/** Laws for the lakehouse layer (operators/Lakehouse.scala +
  * TxnTable.commitStrict/tryCommit): schema enforcement rejects before
  * staging, optimistic claims serialize, the change feed classifies all
  * four ways, and the streaming txn sink leaves a travelable history. */
class LakehouseSpec extends SparkSuite {

  test("commitStrict: rejects type change / drop / undeclared add BEFORE staging; additive evolution opts in") {
    import spark.implicits._
    val t = Tables.scratch("lh_strict")
    TxnTable.drop(spark, t)
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    TxnTable.commitStrict(spark, t, 0, v0) // first commit: nothing to enforce
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.withColumn("k", $"k".cast("int")),
        allowAdd = true)
    }
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.drop("v"), allowAdd = true)
    }
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.withColumn("extra", lit(9L)))
    }
    // rejection is pre-staging: no v1 data dir, no v1 manifest
    assert(TxnTable.versions(spark, t) === Seq(0))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/v1")))
    // the declared additive evolution commits; old snapshot keeps its schema
    TxnTable.commitStrict(spark, t, 1, v0.withColumn("extra", lit(9L)),
      allowAdd = true)
    assert(TxnTable.read(spark, t, Some(0)).columns.toSeq === Seq("k", "v"))
    assert(TxnTable.read(spark, t, None).columns.toSeq === Seq("k", "v", "extra"))
  }

  test("tryCommit: loser's claim refused and invisible, retry serializes, replay is a no-op skip") {
    import spark.implicits._
    val t = Tables.scratch("lh_occ")
    TxnTable.drop(spark, t)
    TxnTable.commit(spark, t, 0, Seq((1L, 10L)).toDF("k", "n"))
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "n")
    val b = Seq((1L, 10L), (3L, 30L)).toDF("k", "n")
    assert(TxnTable.tryCommit(spark, t, 1, a, "wa"))
    assert(!TxnTable.tryCommit(spark, t, 1, b, "wb")) // conflict detected
    // the loser's data is NOT what v1 resolves to
    val v1 = TxnTable.read(spark, t, Some(1)).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v1 === Seq((1L, 10L), (2L, 20L)))
    assert(TxnTable.tryCommit(spark, t, 2, b, "wb_retry"))
    assert(TxnTable.versions(spark, t) === Seq(0, 1, 2))
    // checkpoint-replay shape: re-claiming a committed version is a skip
    assert(!TxnTable.tryCommit(spark, t, 2, a, "replay"))
  }

  test("vacuum: retained snapshot undisturbed, orphan + expired swept, idempotent, expiry loud (injected)") {
    import spark.implicits._
    val t = Tables.scratch("lh_vac")
    TxnTable.drop(spark, t)
    TxnTable.commit(spark, t, 0, Seq((1L, 10L)).toDF("k", "n"))
    TxnTable.commit(spark, t, 1, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))
    // crashed writer: staged data, no manifest — invisible, immortal
    Seq((9L, 90L)).toDF("k", "n").write.parquet(s"$t/data/v9-crashed")
    assert(TxnTable.vacuum(spark, t, 1) === ((2, 1)))
    assert(TxnTable.versions(spark, t) === Seq(1))
    assert(TxnTable.read(spark, t, None).count() === 2L)
    intercept[IllegalArgumentException] { TxnTable.read(spark, t, Some(0)) }
    assert(TxnTable.vacuum(spark, t, 1) === ((0, 0))) // idempotent
    assert(TxnTable.read(spark, t, None).count() === 2L)
  }

  test("change feed classifies all four ways and never emits carry (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("lh_cdf")
    val splitNs = 19740L * 86400000000L * 1000L
    val dayNs = 86400000000L * 1000L
    // u1/a: only old (expired -> delete); u2/b: only new (-> insert);
    // u3/c: both sides, values differ (-> update); u4/d: entirely inside
    // the [19738, 19740) overlap -> identical summaries -> carry, omitted
    Seq(
      (1L, 1L, splitNs - 10L * dayNs, "a", 1.0),
      (2L, 2L, splitNs + 1L * dayNs, "b", 1.0),
      (3L, 3L, splitNs - 10L * dayNs, "c", 1.0),
      (4L, 3L, splitNs + 2L * dayNs, "c", 1.0),
      (5L, 4L, splitNs - 1L * dayNs, "d", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val feed = operators.Lakehouse.sinkTxnChangeFeed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(feed === Map(
      (1L, "a") -> "delete", (2L, "b") -> "insert", (3L, "c") -> "update"))
    assert(!feed.contains((4L, "d"))) // carry: in both snapshots, unemitted
  }

  test("stream_exec_txn_sink leaves a travelable 4-version history converging to the batch compaction (sf0.001)") {
    import spark.implicits._
    val out = operators.Lakehouse.streamExecTxnSink(spark, sf0001).cache()
    val byV = out.groupBy($"version").count().orderBy($"version")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(byV.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // keyed state only grows as prefixes extend
    assert(byV.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // the final version IS the batch latest-state compaction
    val fin = out.filter($"version" === 3L)
      .select($"user_id", $"event_id", $"event_type", $"ts_us", $"value")
    val batch = operators.Pipelines.compactLatestState(spark, sf0001)
    assert(fin.exceptAll(batch).isEmpty && batch.exceptAll(fin).isEmpty)
    out.unpersist()
  }

  test("schema-evolution key: v0 readers undisturbed, all three invalid commits rejected (sf0.001)") {
    import spark.implicits._
    val r = operators.Lakehouse.sinkTxnSchemaEvolution(spark, sf0001).cache()
    assert(r.select($"rejected_commits").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    // v0 rows carry the -1 sentinel (column absent pre-evolution),
    // v1 rows a real distinct-user count
    assert(r.filter($"version" === 0L && $"n_users" =!= -1L).count() === 0L)
    assert(r.filter($"version" === 1L && $"n_users" <= 0L).count() === 0L)
    r.unpersist()
  }
}
