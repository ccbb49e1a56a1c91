package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Streaming twin of the batch `timeseries_ewma_fixed` key: the same
  * α = 1/4 integer recurrence kept as PER-USER STREAMING STATE via
  * mapGroupsWithState — the feature-store shape where each entity's
  * smoothed value must stay current as events arrive, without ever
  * re-reading history.
  *
  * State per user = (n, ewma_fp, last_v_fp) — 24 bytes, O(users) total,
  * the bounded profile every stateful operator here carries. Each
  * micro-batch folds its (event-time-sorted) arrivals into the state;
  * because the recurrence is a left fold, folding batch-by-batch in
  * time order is EXACTLY the batch fold — which is what
  * StatefulStreamingSpec asserts against the graded batch key over a
  * time-carved two-batch replay.
  */
object StatefulEwma {

  case class Ev(user_id: Long, t_us: Long, event_id: Long, v_fp: Long,
      ts_ts: java.sql.Timestamp)
  case class St(user_id: Long, n: Long, ewma_fp: Long, last_v_fp: Long)

  def fold(user: Long, events: Iterator[Ev],
      state: GroupState[St]): St = {
    val sorted = events.toSeq.sortBy(e => (e.t_us, e.event_id))
    var s = state.getOption.getOrElse(St(user, 0L, 0L, 0L))
    sorted.foreach { e =>
      s = if (s.n == 0L) St(user, 1L, e.v_fp, e.v_fp)
          else St(user, s.n + 1, (e.v_fp + 3 * s.ewma_fp) / 4, e.v_fp)
    }
    state.update(s)
    s
  }

  /** Streaming form over a staged events directory: Update-mode
    * emissions carry each user's state after every batch touching it —
    * the final emission per user is the converged EWMA. */
  def stream(spark: SparkSession, stageDir: String): Dataset[St] = {
    import spark.implicits._
    Tables.configure(spark)
    val schema = spark.read.parquet(stageDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
      .filter($"value".isNotNull)
      .withColumn("ts_ts", Tables.tsFromNanos($"ts"))
      .select($"user_id", Tables.nsToUs($"ts").as("t_us"), $"event_id",
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("v_fp"),
        $"ts_ts").as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }
}
