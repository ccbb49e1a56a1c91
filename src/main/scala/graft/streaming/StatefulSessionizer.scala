package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Custom-state sessionization via flatMapGroupsWithState — the
  * KeyValueGroupedDataset path for session logic that session_window
  * can't express (e.g. emitting per-session aggregates beyond
  * count/min/max, or custom close conditions).
  *
  * State per user = the open session (start, last-seen, count). An
  * incoming event either extends it (gap ≤ 30 min) or closes it and
  * opens a new one; closed sessions are emitted. On event-time timeout
  * (watermark passed last-seen + gap) the open session is flushed.
  *
  * Scale: state is O(active users) × ~32 bytes, bounded by the
  * watermark; exactly the mapGroupsWithState shape a production
  * sessionizer uses.
  */
object StatefulSessionizer {

  /** ts_ts carries the watermark (event-time timeout requires the
    * watermarked column to survive into the stateful operator). */
  case class Ev(user_id: Long, ts_us: Long, ts_ts: java.sql.Timestamp)
  case class Sess(start_us: Long, last_us: Long, n: Long)
  case class Out(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  def sessionize(user: Long, events: Iterator[Ev],
      state: GroupState[Sess]): Iterator[Out] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Out(user, s.start_us, s.last_us, s.n))
    } else {
      val sorted = events.toSeq.sortBy(_.ts_us)
      var closed = List.empty[Out]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.last_us <= GapUs =>
            cur = Some(Sess(s.start_us, e.ts_us, s.n + 1))
          case Some(s) =>
            closed ::= Out(user, s.start_us, s.last_us, s.n)
            cur = Some(Sess(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(Sess(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // flush when the watermark passes the session close boundary
        state.setTimeoutTimestamp((s.last_us + GapUs) / 1000)
      }
      closed.reverseIterator
    }
  }

  /** Streaming form over a staged events directory. */
  def stream(spark: SparkSession, stageDir: String): Dataset[Out] = {
    import spark.implicits._
    Tables.configure(spark)
    val schema = spark.read.parquet(stageDir).schema
    spark.readStream.schema(schema).parquet(stageDir)
      .withColumn("ts_ts", Tables.tsFromNanos($"ts"))
      .withWatermark("ts_ts", "1 hour")
      .select($"user_id", Tables.nsToUs($"ts").as("ts_us"), $"ts_ts").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionize)
  }

  /** Streaming mirror of Streamy.streamDedupWatermark — the per-key
    * throttle as a REAL stateful stream: flatMapGroupsWithState keyed
    * on (event_type, user shard), state = the single last-emitted
    * event time (8 bytes — exactly the state the batch form's scaladoc
    * promises a production stream would hold). Each micro-batch's rows
    * for a key are sorted by event time and run through the admission
    * chain continuing from the stored state; admitted rows emit
    * immediately (Append mode), state persists across batches.
    *
    * Ordered-ingest assumption: the chain is order-sensitive, so
    * equality with the batch replay holds when micro-batch boundaries
    * respect event-time order per key (AvailableNow over one staged
    * snapshot = one batch = trivially ordered; a production deploy
    * pairs this with a watermark bounding arrival disorder, the same
    * caveat dropDuplicatesWithinWatermark documents). */
  object Throttle {
    case class In(event_type: String, shard: Long, event_id: Long, ts_us: Long)
    case class Kept(event_type: String, shard: Long, event_id: Long, ts_us: Long)
    val DelayUs: Long = 3600L * 1000 * 1000

    def admit(key: (String, Long), rows: Iterator[In],
        state: GroupState[Long]): Iterator[Kept] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
        var last = state.getOption.getOrElse(Long.MinValue)
        val out = sorted.iterator.filter { r =>
          val keep = last == Long.MinValue || r.ts_us - last > DelayUs
          if (keep) last = r.ts_us
          keep
        }.map(r => Kept(key._1, key._2, r.event_id, r.ts_us)).toArray
        if (last != Long.MinValue) state.update(last)
        out.iterator
      }
    }

    def stream(spark: SparkSession, stageDir: String): Dataset[Kept] = {
      import spark.implicits._
      Tables.configure(spark)
      val schema = spark.read.parquet(stageDir).schema
      spark.readStream.schema(schema).parquet(stageDir)
        .select($"event_type", ($"user_id" % 25).as("shard"), $"event_id",
          Tables.nsToUs($"ts").as("ts_us")).as[In]
        .groupByKey(r => (r.event_type, r.shard))
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(admit)
    }
  }

  /** Batch reference with identical semantics (all data in one group
    * pass — no timeouts fire, sessions close on gap or end-of-input;
    * the final open session per user is flushed explicitly). */
  def batch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("ts_us"),
        Tables.tsFromNanos($"ts").cast("timestamp").as("ts_ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (u, it) =>
        val sorted = it.toSeq.sortBy(_.ts_us)
        var res = List.empty[Out]
        var cur: Option[Sess] = None
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts_us - s.last_us <= GapUs =>
              cur = Some(Sess(s.start_us, e.ts_us, s.n + 1))
            case Some(s) =>
              res ::= Out(u, s.start_us, s.last_us, s.n)
              cur = Some(Sess(e.ts_us, e.ts_us, 1))
            case None => cur = Some(Sess(e.ts_us, e.ts_us, 1))
          }
        }
        cur.foreach(s => res ::= Out(u, s.start_us, s.last_us, s.n))
        res.reverseIterator
      }
      .toDF()
    out.orderBy($"user_id", $"start_us")
  }
}
