package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Stream-shaped operators over the events table (SURVEY.md §2.9).
  *
  * The Hadoop-MR reference class is batch-only; the driver ships events
  * as "a stream table", so these operators are declared in their batch
  * form (oracle-able — batch sees complete data, so watermark/late-data
  * semantics are vacuous) and mirrored 1:1 in Structured Streaming by
  * [[StreamingMirror]], which the test suite runs with a file source and
  * Trigger.AvailableNow. The transformation code is shared: each batch
  * query here calls the same frame-builder the streaming mirror uses.
  */
object Streamy {

  /** events with a proper TimestampType event-time column. */
  def eventsWithTimePublic(spark: SparkSession, dir: String): DataFrame =
    eventsWithTime(spark, dir)

  private[streaming] def eventsWithTime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).withColumn("ts_ts", Tables.tsFromNanos($"ts"))
  }

  /** Tumbling 1-day window per event type — the TimeWindow operator
    * (groupBy(window(...))). In streaming this is an incremental
    * stateful agg with watermark eviction; in batch the same plan is a
    * plain two-phase aggregate. */
  private[streaming] def tumblingFrame(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.groupBy(window($"ts_ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec4($"value")).cast("double").as("sum_value"))
      .select($"w.start".cast("date").as("day"), $"event_type", $"cnt", $"sum_value")
  }

  def streamTumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tumblingFrame(eventsWithTime(spark, dir)).orderBy($"day", $"event_type")
  }

  /** Sliding window: 1-day length every 6 hours — the TimeWindow Expand
    * machinery fans each event into length/slide = 4 overlapping
    * windows before the aggregate. Window starts are emitted as BIGINT
    * epoch-µs; the oracle replays the same fan-out explicitly
    * (slide-aligned starts k slides back, k = 0..3, keeping windows
    * that still cover the event). */
  def streamSlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eventsWithTime(spark, dir)
      .groupBy(window($"ts_ts", "1 day", "6 hours").as("w"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros($"w.start").as("w_start_us"), $"event_type", $"cnt")
      .orderBy($"w_start_us", $"event_type")
  }

  /** Sessionization with a 30-minute inactivity gap, batch form:
    * lag → new-session flag → running sum = session index, then one
    * aggregate per (user, session). Two window passes over the same
    * (user_id, time) partitioning — Spark reuses the sort. The
    * streaming mirror uses session_window (state-store sessions with
    * watermark); semantics coincide on complete data. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val flagged = Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("is_new",
        when(lag($"ts_us", 1).over(w).isNull
          || $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
      .orderBy($"user_id", $"session_id")
  }

  /** Late-data census — the batch replay of watermark admission, the
    * semantics StreamingMirror's late-data drop test exercises but no
    * graded key measured until now. Arrival order is the monotone
    * ingest id (event_id); the per-key watermark after each arrival is
    * max(event time of the key's PRIOR arrivals) − 30 s; a row whose
    * event time falls below the watermark at its own arrival would be
    * dropped by the stateful operator. The census reports, per
    * tumbling event-time minute, how many rows arrived and how many
    * were late — the dashboard every production stream runs to size
    * its watermark delay.
    *
    * The fixture's ingest ids are already in event-time order (a
    * perfectly ordered stream has no late data and the census would be
    * vacuously zero), so arrival disorder is injected
    * deterministically — every 10th event arrives 500 arrival slots
    * late (the injected-fixture precedent: both engines derive the
    * identical arrival sequence).
    *
    * Scale shape: one per-user window over arrival order (keyed-state
    * replay — no global single-partition window), then a bounded
    * minute-bucket aggregate with map-side combine. All-integer µs
    * arithmetic; floor-division bucketing. */
  def streamLateDataCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val delayUs = 30L * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"arrival_seq", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("arrival_seq",
        $"event_id" + when($"event_id" % 10 === 0, 500L).otherwise(0L))
      .withColumn("wm", max($"ts_us").over(w) - delayUs)
      .withColumn("late",
        when($"wm".isNotNull && $"ts_us" < $"wm", 1L).otherwise(0L))
      .groupBy(expr("ts_us div 60000000").as("minute_bucket"))
      .agg(count(lit(1)).as("n_total"), sum($"late").as("n_late"))
      .select($"minute_bucket", $"n_total", $"n_late",
        ($"n_total" - $"n_late").as("n_kept"))
      .orderBy($"minute_bucket")
  }

  /** Watermarked streaming dedup / rate-limit, batch replay — the
    * `dropDuplicatesWithinWatermark` / per-key throttle semantics: an
    * event is EMITTED iff its event time is more than `delay` after the
    * last EMITTED event of its key (first event of a key always emits).
    * This is NOT a lag filter — whether a row survives depends on which
    * earlier rows survived (the chain is not prefix-decomposable), so
    * no window rewrite exists; it is exactly the per-key linear state
    * scan the streaming state store runs, expressed here with
    * `groupByKey.flatMapGroups` (the batch twin of
    * flatMapGroupsWithState — [[StatefulSessionizer]] precedent).
    *
    * Key = (event_type, user_id % 25): a sharded per-type throttle with
    * 125 keyed states, dense enough chains for the delay to really drop
    * rows at every SF. Emitted rows come out row-grain (event_id is the
    * unique total-order key).
    *
    * Scale shape: ONE shuffle on the dedup key, then a SECONDARY-SORT
    * streaming scan (repartition + sortWithinPartitions +
    * mapPartitions) holding a single 8-byte last-emitted timestamp per
    * key — the same O(1)-per-key state a production streaming dedup
    * holds, with NO per-key buffering at all (the round-11
    * it.toArray.sortBy form materialized a key's whole history in one
    * task; an adversarial hot key now streams). The oracle replays the
    * identical chain with a recursive CTE (frontier = last kept row
    * per key, LATERAL next-kept probe) — the hash-match proves the
    * state-machine semantics, which no single-pass SQL can express. */
  def streamDedupWatermark(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val delayUs = 3600L * 1000 * 1000
    Tables.events(spark, dir)
      .select($"event_type", ($"user_id" % 25).as("shard"), $"event_id",
        Tables.nsToUs($"ts").as("ts_us"))
      .repartition($"event_type", $"shard")
      .sortWithinPartitions($"event_type", $"shard", $"ts_us", $"event_id")
      .as[(String, Long, Long, Long)]
      .mapPartitions { it =>
        var curT: String = null; var curS = Long.MinValue
        var last = Long.MinValue
        it.filter { r =>
          if (r._1 != curT || r._2 != curS) {
            curT = r._1; curS = r._2; last = Long.MinValue
          }
          val keep = last == Long.MinValue || r._4 - last > delayUs
          if (keep) last = r._4
          keep
        }
      }
      .toDF("event_type", "shard", "event_id", "ts_us")
      .orderBy($"event_id")
  }

  private val execSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val upsertStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Seal a finished streaming result out of its memory-sink view: the
    * frame is MATERIALIZED (eager localCheckpoint — copied off the
    * memory sink into block storage) and the view dropped immediately,
    * so correctness never depends on caller scheduling (ADVICE r12:
    * the former deferred stale-view queue broke under any harness that
    * builds several exec frames before acting on them) and
    * complete-mode result tables no longer accumulate driver memory
    * across a multi-iteration Bench session. The checkpoint preserves
    * the frame's total order, and later actions reuse the materialized
    * blocks instead of re-reading the sink. */
  private def sealResult(spark: SparkSession, name: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val out = df.localCheckpoint(true)
    spark.catalog.dropTempView(name): Unit
    out
  }

  /** TRUE Structured Streaming execution, GRADED — closes the G7
    * harness gap (SURVEY.md §7): the tumbling-window aggregate runs as
    * a real micro-batch StreamingQuery (file source over a staged copy
    * of the event log, 1-hour watermark, state-store-backed
    * incremental aggregation, memory sink) driven to completion with
    * Trigger.AvailableNow INSIDE the batch-shaped queries() contract —
    * so the driver benches an actual streaming runtime and the DuckDB
    * oracle grades its final state. Complete output mode makes the
    * result independent of micro-batch boundaries (the watermark only
    * bounds state), so a correct incremental execution must equal the
    * batch aggregate — the equality the test-only mirrors assert,
    * here promoted to the graded hash-match.
    *
    * Scale shape: readStream over an append-only directory IS the
    * production ingest shape; state is |windows × types|; the staging
    * write is the fixture's stand-in for the upstream feed. Plan-only
    * mode returns the batch-equivalent frame (streams can't be
    * explained unexecuted — the sink/round-trip contract). */
  def streamExecTumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(streamTumblingWindow(spark, dir)) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_tumbling_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletion(spark,
        StreamingMirror.tumblingStream(spark, stage), name)
        .orderBy($"day", $"event_type"))
    }
  }

  /** TRUE STATEFUL Append-mode streaming execution, GRADED — extends
    * the G7 closure from the stateless tumbling aggregate
    * ([[streamExecTumbling]], complete mode: result independent of
    * micro-batch boundaries) to REAL keyed state and real Append-mode
    * emission: the per-key throttle state machine
    * ([[StatefulSessionizer.Throttle]] — flatMapGroupsWithState, state
    * = the single 8-byte last-emitted event time per (event_type,
    * user-shard) key, exactly the state a production streaming
    * dedup/rate-limit holds) runs as a real micro-batch StreamingQuery
    * (file source over a staged copy of the event log,
    * Trigger.AvailableNow, APPEND output mode — each admitted row is
    * emitted exactly once, never retracted — memory sink), and the
    * recursive-CTE replay that grades the batch twin
    * ([[streamDedupWatermark]]) grades THIS runtime's emissions
    * hash-for-hash: frontier = last kept row per key, LATERAL probe =
    * next row more than the delay after it. No single-pass SQL can
    * express the admission chain, so a green row here certifies the
    * state-store execution end to end, not a window rewrite.
    *
    * Scale shape: readStream over an append-only directory, ONE
    * shuffle on the state key, O(1) state per key (125 keys on the
    * fixture; |type × shard| in general — never per-event), admitted
    * rows stream out per micro-batch. Plan-only mode returns the
    * batch-equivalent frame (streams can't be explained unexecuted —
    * the sink/round-trip contract). */
  /** TRUE streaming EXACT-DUPLICATE elimination via Spark's native
    * `dropDuplicatesWithinWatermark` — the ingest-dedup surface every
    * at-least-once feed needs (retries and replays deliver the SAME
    * record twice; the state store remembers event_id within the
    * watermark horizon and admits exactly one copy). The staged feed
    * is the DOUBLED event log (every row twice — the pristine stage
    * has unique ids, which would make this vacuous), run as a real
    * Append-mode StreamingQuery (file source, 1-hour watermark,
    * RocksDB state, AvailableNow, memory sink) and graded by the
    * per-type census of the ADMITTED rows — which must equal the
    * original log's census exactly: a single lost or double-admitted
    * row moves the hash. Complements [[streamExecDedup]] (the keyed
    * THROTTLE state machine — a time-window policy) with the exact
    * at-least-once-to-exactly-once contract.
    *
    * Scale shape: one shuffle on the dedup key, O(1) state per
    * outstanding id bounded by the watermark horizon (the reason
    * dropDuplicatesWithinWatermark exists — plain dropDuplicates
    * holds state forever); admitted rows stream out per micro-batch. */
  def streamExecDropdup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val twin = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(Tables.dec4($"value")) * 10000).cast("long").as("v_sum_4dp"))
      .select($"event_type", $"n", coalesce($"v_sum_4dp", lit(0L)).as("v_sum_4dp"))
      .orderBy($"event_type")
    graft.PlanOnly.roundTrip(twin) {
      val stage = StreamingMirror.dupStage(spark, dir)
      Tables.configure(spark)
      val schema = spark.read.parquet(stage).schema
      val src = spark.readStream.schema(schema).parquet(stage)
        .withColumn("ts_ts", Tables.tsFromNanos($"ts"))
        .withWatermark("ts_ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .select($"event_type", $"value")
      val name = s"stream_exec_dropdup_${execSeq.incrementAndGet()}"
      sealResult(spark, name,
        StreamingMirror.runToCompletionAppend(spark, src, name)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            (sum(Tables.dec4($"value")) * 10000).cast("long").as("v_sum_4dp"))
          .select($"event_type", $"n",
            coalesce($"v_sum_4dp", lit(0L)).as("v_sum_4dp"))
          .orderBy($"event_type"))
    }
  }

  def streamExecDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(streamDedupWatermark(spark, dir)) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_dedup_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletionAppend(spark,
        StatefulSessionizer.Throttle.stream(spark, stage).toDF(), name)
        .orderBy($"event_id"))
    }
  }

  /** Batch replay of what the WATERMARK-EVICTED sessionizer emits — the
    * [[streamExecSessionize]] plan-only equivalent and the shape its
    * oracle replays: sessionize by lag+cumsum (the streamSessionize
    * machinery), then keep a session iff it CLOSED intra-stream (a
    * later event of the same user opened the next session) OR its
    * event-time timeout (last event + gap, at the state store's ms
    * precision) fell strictly below the final watermark (max event
    * time ms − 1 h) so the timer fired — the last open session of a
    * late-active user is retained in state, never emitted. */
  private[streaming] def sessionizeEmitted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapUs = StatefulSessionizer.GapUs
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val s = Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("is_new",
        when(lag($"ts_us", 1).over(w).isNull
          || $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid",
        sum($"is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val g = s.groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
        count(lit(1)).as("n_events"))
    val lastSid = g.groupBy($"user_id").agg(max($"sid").as("last_sid"))
    // the final watermark, ms precision exactly as the state store
    // computes it: per-row floor(µs/1000), maxed (floor is monotone so
    // floor(max) ≡ max(floor)), minus the 1 h delay — all integer div
    // (a double division would lose precision above 2^53 ns). Scalar-
    // decorated via a 1-row broadcast, no driver action (plan-only safe)
    val wm = Tables.events(spark, dir)
      .agg(expr("(max(ts) div 1000) div 1000 - 3600000").as("wm_ms"))
    g.join(broadcast(lastSid), "user_id")
      .crossJoin(broadcast(wm))
      .filter($"sid" < $"last_sid" ||
        expr(s"(end_us + $gapUs) div 1000") < $"wm_ms")
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .orderBy($"user_id", $"start_us")
  }

  /** STATEFUL streaming execution with REAL WATERMARK EVICTION, graded —
    * the third rung of the G7 ladder after the stateless aggregate
    * (complete mode) and the keyed admission chain (Append, NoTimeout):
    * the flatMapGroupsWithState SESSIONIZER runs as a real
    * StreamingQuery with EventTimeTimeout — sessions closed by a gap
    * emit from the data batch, and when the data is exhausted the
    * watermark advance triggers one more micro-batch in which
    * EXPIRED TIMERS FIRE (timeout ts = last event + gap, strictly
    * below the final watermark) and flush their open sessions from the
    * state store; a user whose last session is still inside the
    * watermark horizon keeps it in state, UNEMITTED. That asymmetry —
    * emitted ≠ all sessions — is exactly watermark-eviction semantics,
    * and the oracle replays it: sessionize + the timer-fire predicate
    * against the final watermark. No batch query without the watermark
    * model produces this output.
    *
    * Scale shape: one shuffle on user_id; state = one open session
    * (3 longs) per active user, evicted as the watermark passes; the
    * timeout scan is the state store's own index, never a data pass. */
  def streamExecSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(sessionizeEmitted(spark, dir)) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_sessionize_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletionAppend(spark,
        StatefulSessionizer.stream(spark, stage).toDF(), name)
        .select($"user_id", $"start_us", $"end_us", $"n_events")
        .orderBy($"user_id", $"start_us"))
    }
  }

  /** Batch equivalent of the stream-stream interval join (plan-only
    * stand-in and the oracle's shape): every purchase joined to the
    * same user's clicks from the preceding hour. */
  private[streaming] def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    def side(tpe: String, prefix: String) = e.filter($"event_type" === tpe)
      .select($"user_id".as(s"${prefix}_user"),
        Tables.nsToUs($"ts").as(s"${prefix}_us"),
        $"event_id".as(s"${prefix}_id"))
    side("purchase", "p").join(side("click", "c"),
      $"p_user" === $"c_user" &&
        $"p_us" >= $"c_us" && $"p_us" <= $"c_us" + 3600000000L)
      .select($"p_user".as("user_id"), $"c_id".as("click_id"),
        $"p_id".as("purchase_id"))
      .orderBy($"purchase_id", $"click_id")
  }

  /** STREAM-STREAM JOIN execution, graded — the fourth stateful
    * primitive after windowed aggregation ([[streamExecTumbling]]),
    * keyed admission ([[streamExecDedup]]) and timeout-evicted sessions
    * ([[streamExecSessionize]]): [[StreamingMirror.intervalJoinStream]]
    * runs as a real StreamingQuery — both sides watermarked, the join
    * condition bounding event time in both directions so the state
    * store can evict rows once the watermark passes the attribution
    * interval — in Append mode to a memory sink. Inner stream-stream
    * joins emit each match exactly once as both sides arrive, and the
    * watermark gates EVICTION only, so the complete staged replay must
    * emit exactly the batch interval join — the equality the oracle
    * grades hash-for-hash.
    *
    * Scale shape: both sides shuffle once on user_id; state is bounded
    * by the 1-hour interval × per-user traffic (the watermark bound),
    * never stream lifetime. */
  def streamExecIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(intervalJoinBatch(spark, dir)) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_interval_join_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletionAppend(spark,
        StreamingMirror.intervalJoinStream(spark, stage), name)
        .orderBy($"purchase_id", $"click_id"))
    }
  }

  /** foreachBatch MERGE sink execution, graded — the fifth and last
    * streaming runtime surface after the windowed aggregate, keyed
    * admission, timeout-evicted sessions and the stream-stream join:
    * [[StreamingMirror.upsertStream]] runs as a REAL MULTI-micro-batch
    * StreamingQuery (the event log staged as 4 files,
    * maxFilesPerTrigger = 1 → four genuine triggers), each batch
    * merging into a keyed parquet state table via the tmp-write + swap
    * upsert ([[StreamingMirror.upsertBatch]]); the graded frame is the
    * FINAL STATE TABLE read back from disk. Latest-per-key with the
    * (ts, event_id) tie-break is associative across any batch split,
    * so the converged state must equal the batch latest-state
    * compaction — the same oracle as compact_latest_state, now grading
    * the incremental foreachBatch runtime (checkpointed, crash-swap
    * recovery and all) rather than the one-shot window.
    *
    * Scale shape: per batch, one user_id window over state ∪ batch; at
    * 100 TB the swap becomes MERGE INTO on a transactional format (the
    * documented north-star gap) — the micro-batch merge DISCIPLINE is
    * what this key certifies. */
  /** RESTART-FROM-CHECKPOINT resume, graded — the fault-tolerance
    * property Structured Streaming's checkpoint exists for: a
    * checkpointed foreachBatch upsert processes the feed's FIRST HALF
    * to completion and STOPS; new files land in the source directory;
    * a brand-new query started on the SAME checkpoint processes ONLY
    * the unseen files (the file-source commit log is the exactly-once
    * ledger) and the state converges to the batch latest-per-user
    * answer. The receipt that makes the grade sharp: every micro-batch
    * also appends its row count to an audit table, and the summed
    * rows_processed across BOTH runs must equal count(*) of the raw
    * feed EXACTLY — a restart that reprocessed (duplicates) or skipped
    * (loss) any file breaks the hash. The merge itself is
    * batch-split-associative (latest per key under (ts, event_id)), so
    * the content certifies convergence and the census certifies
    * exactly-once delivery.
    *
    * Scale shape: restart cost is reading the checkpoint's file log —
    * O(files seen), no data replay; the upsert stays O(batch) per
    * micro-batch. This is the nightly-restart / crash-recovery posture
    * of every production ingest job. */
  def streamExecRestartResume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val splitUs = 19740L * 86400000000L
    def ev5 = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), $"value")
    def equivalent = {
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_us".desc, $"event_id".desc)
      ev5.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .drop("rn")
        .crossJoin(broadcast(ev5.agg(count(lit(1)).as("rows_processed"))))
        .withColumn("n_restarts", lit(2L))
        .orderBy($"user_id")
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val base = Tables.scratch("stream_exec_restart")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // fresh everything per invocation — the restart sequence IS the key
      Seq("stage", "state", "ckpt", "audit").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(s"$base/$d")
        if (fs.exists(p)) fs.delete(p, true): Unit
      }
      val schema = ev5.schema
      ev5.filter($"ts_us" < splitUs).repartition(2)
        .write.mode("overwrite").parquet(s"$base/stage")
      def run(): Unit = StreamingMirror.withStreamRuntimeConfs(spark) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$base/stage")
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            StreamingMirror.upsertBatch(batch, s"$base/state")
            batch.groupBy().count().withColumnRenamed("count", "n")
              .write.mode("append").parquet(s"$base/audit")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run() // first half to completion; checkpoint records the files
      ev5.filter($"ts_us" >= splitUs).repartition(2)
        .write.mode("append").parquet(s"$base/stage")
      run() // RESTART on the same checkpoint: only the new files
      val statePath = new org.apache.hadoop.fs.Path(s"$base/state")
      val state = if (fs.exists(statePath))
        spark.read.parquet(s"$base/state") else ev5.limit(0)
      val auditPath = new org.apache.hadoop.fs.Path(s"$base/audit")
      val processed = if (fs.exists(auditPath))
        spark.read.parquet(s"$base/audit")
          .agg(coalesce(sum($"n"), lit(0L)).as("rows_processed"))
      else Seq(0L).toDF("rows_processed")
      state.select($"user_id", $"event_id", $"event_type", $"ts_us", $"value")
        .crossJoin(broadcast(processed))
        .withColumn("n_restarts", lit(2L))
        .orderBy($"user_id")
    }
  }

  def streamExecUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(
      graft.operators.Pipelines.compactLatestState(spark, dir)) {
      val base = Tables.scratch("stream_exec_upsert")
      // the 4-file staged layout is input, not state: write once per
      // (sfDir, JVM) and reuse across Bench iterations
      val stage = upsertStages.computeIfAbsent(dir, d => {
        val p = s"$base/stage_${d.hashCode & Int.MaxValue}"
        Tables.events(spark, d).repartition(4)
          .write.mode("overwrite").parquet(p)
        p
      })
      // reset state + checkpoint: Bench/Verify run the key repeatedly
      // in one JVM and a stale checkpoint would mark the staged files
      // already-processed (yielding an empty run)
      Seq(s"$base/state", s"$base/ckpt").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      StreamingMirror.upsertStream(spark, stage, s"$base/state",
        s"$base/ckpt")
      spark.read.parquet(s"$base/state")
        .select($"user_id", $"event_id", $"event_type", $"ts_us", $"value")
        .orderBy($"user_id")
    }
  }

  /** Batch replay of the Append-mode LEFT OUTER stream-stream join —
    * [[streamExecOuterJoin]]'s plan-only equivalent and the shape its
    * oracle replays: matched pairs are the plain interval join;
    * unmatched purchases NULL-pad ONLY when the final watermark
    * (min over both sides' max event-time ms − 1 h — the per-query
    * watermark is the min across watermark operators) passed their
    * event time, i.e. the state store provably cannot receive a
    * matching click anymore. Tail purchases stay in state, unemitted —
    * the [[sessionizeEmitted]] eviction law, applied to join state. */
  private[streaming] def outerJoinEmitted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", Tables.nsToUs($"ts").as("t"),
        $"event_type")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"t".as("pt"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"t".as("ct"))
    val wm = e.agg(
      max(when($"event_type" === "purchase", $"t")).as("mp"),
      max(when($"event_type" === "click", $"t")).as("mc"))
      .select(expr("least(mp, mc) div 1000 - 3600000").as("wm_ms"))
    val cond = p("user_id") === c("c_user") &&
      $"pt" >= $"ct" && $"pt" <= $"ct" + lit(3600000000L)
    val matched = p.join(c, cond)
      .select($"user_id", $"click_id", $"purchase_id")
    val unmatched = p.join(c, cond, "left_anti")
      .crossJoin(broadcast(wm))
      .filter(expr("pt div 1000") < $"wm_ms")
      .select($"user_id", lit(-1L).as("click_id"), $"purchase_id")
    matched.unionByName(unmatched)
      .orderBy($"purchase_id", $"click_id")
  }

  /** TRUE Append-mode LEFT OUTER stream-stream join, GRADED — the
    * attribution feed WITH the unconverted rows: matched pairs emit on
    * match; a purchase with no click in its trailing hour emits
    * NULL-padded (click_id = −1 sentinel) only when the watermark
    * proves no matching click can still arrive — which makes "every
    * purchase appears exactly once, attributed or not" safe for an
    * incremental consumer, THE semantics Append-mode outer join
    * exists to provide. Runs as a real micro-batch StreamingQuery
    * over the shared staged feed (both sides watermarked, state
    * bounded by the 1 h interval, Trigger.AvailableNow, memory sink);
    * the oracle replays matched pairs AND the eviction cutoff
    * (final watermark = min of both sides' max event-time ms − 1 h;
    * tail purchases stay in state, unemitted).
    *
    * Scale shape: both sides shuffle once on user_id; state is
    * bounded by the interval, and the outer emission adds no state —
    * eviction time is when the NULL row surfaces. Plan-only mode
    * returns the batch-equivalent frame. */
  def streamExecOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(outerJoinEmitted(spark, dir)) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_outer_join_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletionAppend(spark,
        StreamingMirror.outerJoinStream(spark, stage), name)
        .orderBy($"purchase_id", $"click_id"))
    }
  }

  /** TRUE streaming STREAM-STATIC JOIN execution, GRADED — the
    * cheapest streaming join and the 100 TB default for enriching a
    * feed with a slowly-changing dimension: each micro-batch of the
    * staged event stream BROADCAST-joins a STATIC per-user dimension
    * (planned per trigger exactly like a batch join — NO state store,
    * no watermark bookkeeping; the reason to prefer stream-static over
    * stream-stream whenever one side is a dim, and the semantics that
    * give slowly-changing dims their per-trigger refresh for free).
    * Runs as a real micro-batch StreamingQuery (file source,
    * Trigger.AvailableNow, Append mode, memory sink) driven to
    * completion; every enriched event is emitted exactly once, and the
    * DuckDB oracle re-derives the dimension and the join from raw
    * events — grading the runtime's join product, not a batch rewrite.
    *
    * Scale shape: the stream side never shuffles (broadcast hash join
    * per micro-batch); the dim is |users| rows re-planned per trigger.
    * Plan-only mode returns the batch-equivalent frame (streams can't
    * be explained unexecuted — the sink/round-trip contract). */
  def streamExecStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def equivalent = {
      val e = Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"event_type")
      val dim = e.groupBy($"user_id").agg(count(lit(1)).as("user_events"))
      e.join(broadcast(dim), "user_id")
        .select($"user_id", $"event_id", $"event_type", $"user_events")
        .orderBy($"event_id")
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val stage = StreamingMirror.sharedStage(spark, dir)
      val name = s"stream_exec_static_join_${execSeq.incrementAndGet()}"
      sealResult(spark, name, StreamingMirror.runToCompletionAppend(spark,
        StreamingMirror.staticEnrichStream(spark, stage), name)
        .orderBy($"event_id"))
    }
  }

  val queries: Map[String, QueryFn] = Map(
    "stream_exec_static_join" -> (streamExecStaticJoin(_, _)),
    "stream_exec_outer_join" -> (streamExecOuterJoin(_, _)),
    "stream_exec_tumbling" -> (streamExecTumbling(_, _)),
    "stream_exec_dedup" -> (streamExecDedup(_, _)),
    "stream_exec_dropdup" -> (streamExecDropdup(_, _)),
    "stream_exec_sessionize" -> (streamExecSessionize(_, _)),
    "stream_exec_interval_join" -> (streamExecIntervalJoin(_, _)),
    "stream_exec_upsert" -> (streamExecUpsert(_, _)),
    "stream_exec_restart_resume" -> (streamExecRestartResume(_, _)),
    "stream_tumbling_window" -> (streamTumblingWindow(_, _)),
    "stream_sliding_window" -> (streamSlidingWindow(_, _)),
    "stream_sessionize" -> (streamSessionize(_, _)),
    "stream_late_data_census" -> (streamLateDataCensus(_, _)),
    "stream_dedup_watermark" -> (streamDedupWatermark(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // the doubled feed deduped exactly-once must reproduce the
    // ORIGINAL log's census — a lost or double-admitted row moves it
    "stream_exec_dropdup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,4))) * 10000, 0)
        |    AS BIGINT) AS v_sum_4dp
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // the stream-static join emits each event exactly once, enriched
    // with the dim row — the oracle re-derives dim and join from raw
    "stream_exec_static_join" ->
      """WITH d AS (SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
        |  FROM events GROUP BY 1)
        |SELECT e.user_id, e.event_id, e.event_type, d.user_events
        |FROM events e JOIN d USING (user_id)
        |ORDER BY e.event_id""".stripMargin,
    // the streaming runtime's final complete-mode state must equal the
    // batch aggregate — same oracle as the batch form
    "stream_exec_tumbling" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "stream_tumbling_window" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "stream_sliding_window" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS tu FROM events),
        |w AS (SELECT event_type, (tu // 21600000000 - k) * 21600000000 AS ws
        |      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
        |      WHERE tu < (tu // 21600000000 - k) * 21600000000 + 86400000000)
        |SELECT ws AS w_start_us, event_type, count(*) AS cnt
        |FROM w GROUP BY ws, event_type ORDER BY w_start_us, event_type""".stripMargin,
    "stream_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN lag(ts_us, 1) OVER w IS NULL
        |               OR ts_us - lag(ts_us, 1) OVER w > 30 * 60 * 1000000
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |      FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // the multi-batch foreachBatch merge must converge to the batch
    // latest-state compaction — same oracle as compact_latest_state
    // the restart-resume state is the same latest-per-user answer;
    // rows_processed == count(*) IS the exactly-once certificate
    "stream_exec_restart_resume" ->
      """WITH r AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |FROM events),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS rows_processed FROM events)
        |SELECT user_id, event_id, event_type, ts_us, value,
        |  (SELECT rows_processed FROM c) AS rows_processed,
        |  CAST(2 AS BIGINT) AS n_restarts
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "stream_exec_upsert" ->
      """WITH r AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |FROM events)
        |SELECT user_id, event_id, event_type, ts_us, value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // matched pairs = the interval join; NULL-padded purchases emit iff
    // the final watermark (min of both sides' max-ms - 1h) passed them
    "stream_exec_outer_join" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'click'),
        |wm AS (SELECT least((SELECT max(t) FROM p), (SELECT max(t) FROM c))
        |    // 1000 - 3600000 AS wm_ms),
        |m AS (SELECT p.user_id, c.event_id AS click_id,
        |    p.event_id AS purchase_id
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND p.t >= c.t AND p.t <= c.t + 3600000000),
        |um AS (SELECT p.user_id, -1 AS click_id, p.event_id AS purchase_id
        |  FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND p.t >= c.t AND p.t <= c.t + 3600000000)
        |    AND p.t // 1000 < (SELECT wm_ms FROM wm))
        |SELECT user_id, click_id, purchase_id
        |FROM (SELECT * FROM m UNION ALL SELECT * FROM um)
        |ORDER BY purchase_id, click_id""".stripMargin,
    // the stream-stream inner join emits matches exactly once (the
    // watermark gates state eviction, not emission), so the staged
    // replay equals the batch interval join
    "stream_exec_interval_join" ->
      """SELECT p.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        |ORDER BY purchase_id, click_id""".stripMargin,
    // watermark-eviction replay: a session row is emitted iff it closed
    // intra-stream OR its event-time timer (end + gap, ms) fired
    // strictly below the final watermark (max event-time ms − 1 h);
    // the still-open tail sessions stay in state, unemitted
    "stream_exec_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |wm AS (SELECT max(ts_us) // 1000 - 3600000 AS wm_ms FROM e),
        |f AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN lag(ts_us, 1) OVER w IS NULL
        |               OR ts_us - lag(ts_us, 1) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS sid
        |      FROM f),
        |g AS (SELECT user_id, sid, min(ts_us) AS start_us,
        |        max(ts_us) AS end_us, CAST(count(*) AS BIGINT) AS n_events
        |      FROM s GROUP BY user_id, sid),
        |m AS (SELECT user_id, max(sid) AS last_sid FROM g GROUP BY user_id)
        |SELECT g.user_id, g.start_us, g.end_us, g.n_events
        |FROM g JOIN m USING (user_id), wm
        |WHERE g.sid < m.last_sid
        |   OR (g.end_us + 1800000000) // 1000 < wm.wm_ms
        |ORDER BY user_id, start_us""".stripMargin,
    // the REAL stateful Append-mode streaming run must emit exactly the
    // chain the recursive-CTE state replay derives — same oracle as the
    // batch twin below
    "stream_exec_dedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT event_type, user_id % 25 AS shard, event_id,
        |    epoch_us(ts) AS ts_us
        |  FROM events),
        |keep(event_type, shard, event_id, ts_us) AS (
        |  SELECT event_type, shard, event_id, ts_us
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, shard
        |          ORDER BY ts_us, event_id) AS rn FROM e)
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT n.event_type, n.shard, n.event_id, n.ts_us
        |  FROM keep k, LATERAL (
        |    SELECT event_type, shard, event_id, ts_us FROM e
        |    WHERE e.event_type = k.event_type AND e.shard = k.shard
        |      AND e.ts_us > k.ts_us + 3600000000
        |    ORDER BY ts_us, event_id LIMIT 1) n)
        |SELECT event_type, shard, event_id, ts_us
        |FROM keep ORDER BY event_id""".stripMargin,
    // the recursive CTE IS the point: the keep-chain depends on which
    // earlier rows were kept, so the oracle must iterate too — frontier
    // = last kept row per key, LATERAL probe = next row strictly more
    // than the delay after it
    "stream_dedup_watermark" ->
      """WITH RECURSIVE e AS (
        |  SELECT event_type, user_id % 25 AS shard, event_id,
        |    epoch_us(ts) AS ts_us
        |  FROM events),
        |keep(event_type, shard, event_id, ts_us) AS (
        |  SELECT event_type, shard, event_id, ts_us
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, shard
        |          ORDER BY ts_us, event_id) AS rn FROM e)
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT n.event_type, n.shard, n.event_id, n.ts_us
        |  FROM keep k, LATERAL (
        |    SELECT event_type, shard, event_id, ts_us FROM e
        |    WHERE e.event_type = k.event_type AND e.shard = k.shard
        |      AND e.ts_us > k.ts_us + 3600000000
        |    ORDER BY ts_us, event_id LIMIT 1) n)
        |SELECT event_type, shard, event_id, ts_us
        |FROM keep ORDER BY event_id""".stripMargin,
    "stream_late_data_census" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |        event_id + CASE WHEN event_id % 10 = 0
        |                        THEN 500 ELSE 0 END AS arrival_seq
        |      FROM events),
        |f AS (SELECT ts_us,
        |        max(ts_us) OVER (PARTITION BY user_id
        |          ORDER BY arrival_seq, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          - 30000000 AS wm
        |      FROM e),
        |g AS (SELECT ts_us // 60000000 AS minute_bucket,
        |        CASE WHEN wm IS NOT NULL AND ts_us < wm
        |             THEN 1 ELSE 0 END AS late
        |      FROM f)
        |SELECT minute_bucket, count(*) AS n_total,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  CAST(count(*) - sum(late) AS BIGINT) AS n_kept
        |FROM g GROUP BY minute_bucket ORDER BY minute_bucket""".stripMargin
  )
}
