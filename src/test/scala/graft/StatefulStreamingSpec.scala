package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulSessionizer, StreamingMirror, Streamy}

/** flatMapGroupsWithState sessionizer: streaming emissions must be a
  * consistent subset of the batch reference (closed sessions only —
  * the watermark never passes each user's final session in a finite
  * input), and the batch reference must agree with the window-based
  * sessionizer on session count. */
class StatefulStreamingSpec extends SparkSuite {

  test("stateful EWMA stream equals the graded batch fold across a time-carved two-batch replay") {
    import spark.implicits._
    import graft.streaming.StatefulEwma
    val dir = Tables.scratch("ewma_stage")
    val e = Tables.events(spark, sf0001).filter(col("value").isNotNull)
    val (minNs, maxNs) = {
      val r = e.agg(min("ts"), max("ts")).head(); (r.getLong(0), r.getLong(1))
    }
    val cutNs = minNs + (maxNs - minNs) / 5 * 4
    // two single-file batches carved by TIME (mod-time order = event-time
    // order), so the per-batch left folds compose into the global fold
    e.filter(col("ts") < cutNs).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    Thread.sleep(1500)
    e.filter(col("ts") >= cutNs).coalesce(1)
      .write.mode("append").parquet(dir)
    val q = StatefulEwma.stream(spark, dir)
      .writeStream.format("memory").queryName("ewma_twin")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update mode emits a state snapshot per batch; n grows monotonically,
    // so max-n per user is the final state
    val streamed = spark.table("ewma_twin")
      .groupBy("user_id")
      .agg(max(struct(col("n"), col("ewma_fp"), col("last_v_fp"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"),
        col("s.ewma_fp").as("se"), col("s.last_v_fp").as("sl"))
    val batch = graft.operators.Timeseries.timeseriesEwmaFixed(spark, sf0001)
    assert(streamed.count() === batch.count())
    val diff = batch.join(streamed, "user_id")
      .filter(col("n_events") =!= col("n") || col("ewma_fp") =!= col("se") ||
        col("last_v_fp") =!= col("sl")).count()
    assert(diff === 0L, "incremental stateful fold must equal the batch fold")
  }

  test("batch reference agrees with the window-based sessionizer") {
    val ref = StatefulSessionizer.batch(spark, sf0001)
    assert(ref.count() === 946L)
    assert(ref.agg(sum("n_events")).head().getLong(0) === 1000L)
    // per-user session counts match the lag+cumsum operator
    val wind = Streamy.streamSessionize(spark, sf0001)
      .groupBy("user_id").count().withColumnRenamed("count", "w")
    val got = ref.groupBy("user_id").count().withColumnRenamed("count", "g")
    assert(wind.join(got, "user_id").filter(col("w") =!= col("g")).count() === 0L)
  }

  test("watermark drops late data in the streaming aggregate") {
    import spark.implicits._
    import graft.streaming.Streamy
    val dir = Tables.scratch("late_data_stage")
    // batch 1: the real events; batch 2: one event 10 days older than
    // everything — far beyond the 1h watermark when batch 2 runs.
    val e = Tables.events(spark, sf0001)
    val minTs = e.agg(min("ts")).head().getLong(0)
    e.write.mode("overwrite").parquet(dir)
    // FileStreamSource orders batches by file modification time, and a
    // batch's data only advances the watermark EFFECTIVE the
    // next-plus-one batch — so stage an intermediate normal batch
    // between the bulk and the late arrival.
    val maxTs = e.agg(max("ts")).head().getLong(0)
    Thread.sleep(1500)
    e.limit(1).withColumn("ts", lit(maxTs))
      .withColumn("event_type", lit("fresh_marker"))
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1500)
    val late = e.limit(1)
      .withColumn("ts", lit(minTs - 10L * 24 * 3600 * 1000000000L))
      .withColumn("event_type", lit("late_marker"))
    late.coalesce(1).write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("ts_ts", Tables.tsFromNanos(col("ts")))
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("cnt"))
    val q = src.writeStream.format("memory").queryName("late_check")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode emits only watermark-finalized windows; the late
    // marker's window closed before its event arrived → dropped.
    val res = spark.table("late_check")
    assert(res.filter(col("event_type") === "late_marker").count() === 0L)
    assert(res.count() > 0L)
  }

  test("streaming flatMapGroupsWithState emits closed sessions matching batch") {
    val stage = StreamingMirror.stageEvents(spark, sf0001,
      Tables.scratch("events_stage_fmgws"))
    val q = StatefulSessionizer.stream(spark, stage).writeStream
      .format("memory").queryName("fmgws_sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("fmgws_sessions")
    val batch = StatefulSessionizer.batch(spark, sf0001)
    // every streamed (closed) session appears identically in batch
    assert(streamed.count() > 0L)
    assert(streamed.except(batch).count() === 0L)
  }

  test("streaming throttle state machine equals the batch dedup-watermark replay") {
    val stage = StreamingMirror.stageEvents(spark, sf0001,
      Tables.scratch("events_stage_throttle"))
    val q = StatefulSessionizer.Throttle.stream(spark, stage).writeStream
      .format("memory").queryName("throttle_kept")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("throttle_kept")
    val batch = Streamy.streamDedupWatermark(spark, sf0001)
      .select("event_type", "shard", "event_id", "ts_us")
    assert(streamed.count() > 0L)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("foreachBatch upsert converges to the batch latest-state compaction") {
    import spark.implicits._
    val base = Tables.scratch("upsert")
    // stage as 4 files so maxFilesPerTrigger=1 yields 4 real micro-batches
    Tables.events(spark, sf0001).repartition(4)
      .write.mode("overwrite").parquet(s"$base/stage")
    Seq(s"$base/state", s"$base/ckpt").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    StreamingMirror.upsertStream(spark, s"$base/stage", s"$base/state", s"$base/ckpt")
    val got = spark.read.parquet(s"$base/state")
      .select("user_id", "event_id", "event_type", "ts_us", "value")
    val want = operators.Pipelines.compactLatestState(spark, sf0001)
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0L && want.except(got).count() === 0L)
  }

  test("stream_exec_restart_resume: the restart processes only the unseen files, exactly once (sf0.001)") {
    import org.apache.spark.sql.functions._
    val out = streaming.Streamy.streamExecRestartResume(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val nEvents = Tables.events(spark, sf0001).count()
    // exactly-once ledger: rows processed across BOTH runs == the feed
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_processed") === nEvents)
      assert(r.getAs[Long]("n_restarts") === 2L)
    }
    // the audit shows real incremental batches on both sides of the
    // restart (maxFilesPerTrigger=1 over 2+2 staged files)
    val audit = spark.read
      .parquet(s"${Tables.scratch("stream_exec_restart")}/audit")
      .agg(count(lit(1)), sum(col("n"))).collect().head
    assert(audit.getLong(0) >= 3L, "expected multiple micro-batches")
    assert(audit.getLong(1) === nEvents)
    // state content equals the batch latest-per-user recompute
    val want = operators.Pipelines.compactLatestState(spark, sf0001)
    val got = out.select("user_id", "event_id", "event_type", "ts_us", "value")
    assert(got.except(want).count() === 0L && want.except(got).count() === 0L)
  }

  test("stream_exec_cdc_feed: folding the feed rebuilds the state; inserts are exactly first appearances (sf0.001)") {
    import org.apache.spark.sql.functions._
    val feed = operators.Lakehouse.streamExecCdcFeed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(feed.nonEmpty)
    assert(feed.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L),
      "four genuine micro-batches emit feed rows")
    // a downstream consumer applying the ops in batch order must land
    // on the batch latest-per-user state
    var applied = Map.empty[Long, Long] // user -> event_id
    feed.sortBy(t => (t._1, t._3)).foreach { case (_, op, u, eid, _) =>
      if (op == 1L) assert(!applied.contains(u), s"insert of known user $u")
      else assert(applied.contains(u), s"update of unknown user $u")
      applied += u -> eid
    }
    val want = operators.Pipelines.compactLatestState(spark, sf0001)
      .select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(applied === want, "feed fold must rebuild the final state")
    // every user appears as an insert exactly once across the feed
    val inserts = feed.filter(_._2 == 1L).map(_._3)
    assert(inserts.length === inserts.distinct.length)
    assert(inserts.toSet === want.keySet)
  }

  test("stream_exec_cdf_apply: fold(feed) = recompute at every batch; the preimage retraction branch is exercised (sf0.001)") {
    import org.apache.spark.sql.functions._
    val out = operators.Lakehouse.streamExecCdfApply(spark, sf0001).collect()
    assert(out.nonEmpty)
    // the graded frame's own contract: maintained ≡ direct per row —
    // sentinels (-1) would mark a type present on only one side
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"fold diverged from recompute at version ${r.getLong(0)}, " +
          s"type ${r.getString(1)}: ${r.getLong(2)} vs ${r.getLong(3)}")
      assert(r.getLong(2) >= 0L, "sentinel leaked into the graded frame")
    }
    // the feed itself: updates exist and carry a REAL preimage — the
    // retraction branch (−1 on prev type) is not vacuous at sf0.001
    val base = Tables.scratch("stream_exec_cdc")
    val feed = spark.read.parquet(s"$base/feed_apply").collect()
    val updates = feed.filter(_.getAs[Long]("op_insert") == 0L)
    assert(updates.nonEmpty, "fixture produced no updates — the " +
      "retraction branch is untested")
    assert(updates.forall(_.getAs[String]("prev_event_type") != "(none)"),
      "an update op must carry its preimage type")
    assert(feed.filter(_.getAs[Long]("op_insert") == 1L)
      .forall(_.getAs[String]("prev_event_type") == "(none)"),
      "an insert op has no preimage")
    // and some update actually MOVED a user across types, so at least
    // one per-type count was retracted somewhere in the fold
    assert(updates.exists(r => r.getAs[String]("prev_event_type")
      != r.getAs[String]("event_type")),
      "no update changed a user's latest type — retraction vacuous")
  }

  test("stream_exec_cdf_checkpoint: checkpoint + suffix = full fold = recompute; the folded prefix is physically GONE; the census is exact (sf0.001)") {
    import org.apache.hadoop.fs.Path
    val out = operators.Lakehouse.streamExecCdfCheckpoint(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"checkpoint+suffix diverged from recompute at version " +
          s"${r.getLong(0)}, type ${r.getString(1)}")
      assert(r.getLong(2) >= 0L, "sentinel leaked into the graded frame")
      // the census: exactly the folded prefix (batches 0..1) reclaimed,
      // exactly the suffix (2..3) kept
      assert(r.getLong(4) === 2L && r.getLong(5) === 2L)
    }
    // versions 1..3 all present (v1 served from the checkpoint ALONE)
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // retention is physical: the folded feed partitions no longer exist,
    // the suffix partitions do
    val base = Tables.scratch("stream_exec_cdc")
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 to 1).foreach(k => assert(
      !fs.exists(new Path(s"$base/feed_ckpt/batch=$k")),
      s"GC left the folded batch=$k partition behind"))
    (2 to 3).foreach(k => assert(
      fs.exists(new Path(s"$base/feed_ckpt/batch=$k")),
      s"GC must never touch the suffix partition batch=$k"))
    // the committed checkpoint equals the direct recompute at K = 1
    val ck = graft.sources.TxnTable.read(spark,
        Tables.scratch("cdf_checkpoint_view"))
      .filter(org.apache.spark.sql.functions.col("m") =!= 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1 = out.filter(_.getLong(0) == 1L)
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(ck === v1, "committed checkpoint != direct recompute at K")
  }
}
