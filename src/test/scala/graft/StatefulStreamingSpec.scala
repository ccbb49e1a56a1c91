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

  test("streaming flatMapGroupsWithState emits closed sessions matching batch") {
    val stage = StreamingMirror.stageEvents(spark, sf0001,
      "/root/repo/target/tmp/events_stage_fmgws")
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
}
