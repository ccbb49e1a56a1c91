package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Streamy, StreamingMirror}

/** Structured Streaming runtime mirror: the streaming execution of the
  * event-time operators must agree with their batch forms on complete
  * input (batch sees everything, so a correct incremental run with
  * watermarks must converge to the same answer). */
class StreamingSpec extends SparkSuite {

  private lazy val stage =
    StreamingMirror.stageEvents(spark, sf0001, Tables.scratch("events_stage"))

  test("streaming tumbling window equals batch tumbling window") {
    val streamed = StreamingMirror.runToCompletion(
      spark, StreamingMirror.tumblingStream(spark, stage), "tumbling_mirror")
    val batch = Streamy.streamTumblingWindow(spark, sf0001)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("streaming sliding window equals batch sliding window") {
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(stage).schema
    val src = spark.readStream.schema(schema).parquet(stage)
      .withColumn("ts_ts", Tables.tsFromNanos(col("ts")))
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"), col("cnt"))
    val streamed = StreamingMirror.runToCompletion(spark, src, "sliding_mirror")
    val batch = Streamy.streamSlidingWindow(spark, sf0001)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
  }

  test("stream-static enrich equals the batch broadcast dim join") {
    val streamed = StreamingMirror.runToCompletionAppend(
      spark, StreamingMirror.staticEnrichStream(spark, stage), "enrich_mirror")
    val e = Tables.events(spark, sf0001)
    val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("user_events"))
    val batch = e.select(col("event_id"), col("user_id"), col("event_type"))
      .join(broadcast(dim), "user_id")
      .select(col("user_id"), col("event_id"), col("event_type"), col("user_events"))
    assert(streamed.count() === e.count()) // inner join loses no event
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("streaming dedup drops at-least-once re-deliveries") {
    // stage the same events TWICE — an at-least-once redelivery of the
    // whole batch; the dedup stream must admit each event_id once
    val dir = Tables.scratch("events_stage_dup")
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    Tables.events(spark, sf0001).write.mode("append").parquet(dir)
    val streamed = StreamingMirror.runToCompletionAppend(
      spark, StreamingMirror.dedupStream(spark, dir), "dedup_mirror")
    val n = Tables.events(spark, sf0001).count()
    assert(streamed.count() === n) // not 2n
    assert(streamed.select("event_id").distinct().count() === n)
  }

  test("streaming interval join equals the batch interval join") {
    val streamed = StreamingMirror.runToCompletionAppend(
      spark, StreamingMirror.intervalJoinStream(spark, stage), "attrib_mirror")
    val e = Streamy.eventsWithTimePublic(spark, sf0001)
    def side(tpe: String, p: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${p}_user"), col("ts_ts").as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val batch = side("purchase", "p").join(side("click", "c"),
        col("p_user") === col("c_user") && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("c_id").as("click_id"),
        col("p_id").as("purchase_id"))
    assert(streamed.count() > 0L)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("graded join_interval_attribution agrees with the streaming interval join") {
    // the stream emits EVERY (purchase, click) pair in the hour (its
    // bound is inclusive at equal µs); the graded batch key keeps only
    // the latest STRICTLY-prior click — derive that reduction from the
    // stream output and the two must coincide
    val streamed = StreamingMirror.runToCompletionAppend(
      spark, StreamingMirror.intervalJoinStream(spark, stage), "attrib_latest_mirror")
    val ts = Tables.events(spark, sf0001)
      .select(col("event_id"), Tables.nsToUs(col("ts")).as("ts_us"))
    val best = streamed
      .join(ts.select(col("event_id").as("click_id"), col("ts_us").as("c_ts")), "click_id")
      .join(ts.select(col("event_id").as("purchase_id"), col("ts_us").as("p_ts")), "purchase_id")
      .filter(col("c_ts") < col("p_ts"))
      .groupBy("purchase_id")
      .agg(max(struct(col("c_ts"), col("click_id"))).as("b"))
      .select(col("purchase_id"), col("b.c_ts").as("click_ts_us"),
        col("b.click_id").as("click_id"))
    val batch = graft.operators.Relational.joinIntervalAttribution(spark, sf0001)
      .filter(col("click_id") =!= -1L)
      .select("purchase_id", "click_ts_us", "click_id")
    assert(batch.count() > 0L)
    assert(best.count() === batch.count())
    assert(best.except(batch).count() === 0L)
    assert(batch.except(best).count() === 0L)
  }

  test("streaming session_window produces plausible sessions") {
    val s = StreamingMirror.runToCompletion(
      spark, StreamingMirror.sessionStream(spark, stage), "session_mirror").cache()
    // session_window merges events <30min apart; the lag-based batch
    // sessionizer found 946 sessions — session_window's session *count*
    // must match exactly (same gap rule, complete data)
    assert(s.count() === 946L)
    assert(s.agg(sum("n_events")).head().getLong(0) === 1000L) // every event in exactly one session
  }
}
