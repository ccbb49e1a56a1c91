package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmOps, Timeseries}

/** Invariants for the time-dimension layer (operators/Timeseries.scala)
  * and the token-window chunker — properties the DuckDB hash-match
  * can't express (it proves equality, not correctness of the shape).
  */
class TimeseriesSpec extends SparkSuite {

  test("timeseries_dtw_band: driver brute-force DP replay at sf0.001") {
    val inf = 1125899906842624L
    // profiles re-derived independently: truncating-mean 4dp per hour
    val cells = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        (Tables.nsToUs(col("ts")).divide(lit(3600000000L)).cast("long") % 24)
          .as("h"))
      .agg(((sum(Tables.dec4(col("value"))) * 10000).cast("long"))
        .as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt,
        r.getLong(2) / r.getLong(3)))
    val prof = cells.groupBy(_._1).map { case (t, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      t -> (0 until 24).map(h => m.getOrElse(h, 0L)).toArray
    }
    def dtw(a: Array[Long], b: Array[Long]): Long = {
      // dp[i][j] (1-based), rows swept i = 1..24
      var row = Array.tabulate(24)(j =>
        if (j == 0) math.abs(a(0) - b(0)) else inf)
      for (i <- 2 to 24) {
        row = Array.tabulate(24) { j0 =>
          val j = j0 + 1
          if (math.abs(i - j) > 3) inf
          else {
            val prev = math.min(row(j0),
              math.min(if (j >= 2) row(j0 - 1) else inf,
                if (j >= 3) row(j0 - 2) else inf))
            math.min(inf, math.abs(a(i - 1) - b(j0)) + prev)
          }
        }
      }
      row(23)
    }
    val out = Timeseries.timeseriesDtwBand(spark, sf0001).collect()
    assert(out.length === prof.size * (prof.size - 1) / 2)
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val expect = dtw(prof(ta), prof(tb))
      assert(r.getLong(3) === expect, s"($ta, $tb) dtw")
      assert(r.getLong(3) < inf, s"($ta, $tb) must be reachable")
      assert(r.getLong(2) === math.abs(prof(ta)(0) - prof(tb)(0)))
    }
  }

  test("timeseries_ohlc_bars: candles are internally consistent and lossless") {
    val bars = Timeseries.timeseriesOhlcBars(spark, sf0001).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= high, s"low > high in $r")
      assert(open >= low && open <= high, s"open outside [low, high] in $r")
      assert(close >= low && close <= high, s"close outside [low, high] in $r")
      assert(r.getLong(7) > 0, s"empty bar emitted: $r")
    }
    // no event lost to bucketing
    val total = bars.map(_.getLong(7)).sum
    assert(total === Tables.events(spark, sf0001).count())
  }

  test("scd2_user_value_history: intervals chain gaplessly with one open row per user") {
    val hist = Timeseries.scd2UserValueHistory(spark, sf0001)
      .select("user_id", "version", "valid_from", "valid_to", "is_current")
      .collect()
      .groupBy(_.getLong(0))
    hist.foreach { case (user, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length),
        s"user $user versions not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) === b.getLong(2),
            s"user $user: valid_to(v${a.getInt(1)}) != valid_from(v${b.getInt(1)})")
        case _ => ()
      }
      assert(sorted.last.getLong(3) === -1L && sorted.last.getInt(4) === 1,
        s"user $user: last version not open-ended")
      assert(sorted.count(_.getInt(4) === 1) === 1,
        s"user $user: is_current count != 1")
    }
  }

  test("agg_time_decay_weighted: weights are bounded by the 30-day ramp") {
    val rows = Timeseries.aggTimeDecayWeighted(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wtotal, n) = (r.getLong(2), r.getLong(3))
      assert(wtotal >= 0 && wtotal <= 30 * n,
        s"wtotal outside [0, 30n] for ${r.getString(0)}")
    }
  }

  test("text_chunk_overlap: chunks tile each document with a 24-token stride") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = LlmOps.textChunkOverlap(spark, sf0001)
      .select("doc_id", "chunk_idx", "n_tok", "chunk_text")
      .collect().groupBy(_.getLong(0))
    assert(chunks.keySet === docs.keySet, "some documents produced no chunks")
    chunks.foreach { case (doc, rows) =>
      val n = docs(doc)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong),
        s"doc $doc chunk_idx not dense")
      // stride tiling: every chunk starts at 24·idx and the last one
      // reaches exactly the end of the token array
      sorted.foreach { c =>
        val expected = math.min(n - c.getLong(1) * 24, 32L)
        assert(c.getLong(2) === expected, s"doc $doc chunk ${c.getLong(1)} n_tok")
        assert(c.getString(3).split(" ", -1).length.toLong === c.getLong(2),
          s"doc $doc chunk ${c.getLong(1)} text/token-count mismatch")
      }
      assert(sorted.last.getLong(1) * 24 + sorted.last.getLong(2) === n.toLong,
        s"doc $doc: chunks don't reach the end of the document")
      // overlap: each non-first chunk re-covers the previous 8 tokens
      if (sorted.length > 1) assert(sorted.init.forall(_.getLong(2) === 32L),
        s"doc $doc: non-final chunk shorter than the window")
    }
  }

  test("timeseries_ewma_fixed: recurrence verified on an injected series") {
    import spark.implicits._
    val dir = Tables.scratch("ewma_fix")
    // user 1: 4.0 then 8.0 → s = (80000 + 3·40000) div 4 = 50000;
    // user 2: single event → ewma = its own value (init case)
    Seq((1L, 1L, 1000L, 4.0), (2L, 1L, 2000L, 8.0), (3L, 2L, 1000L, 2.5))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = operators.Timeseries.timeseriesEwmaFixed(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m(1L) === ((2L, 50000L, 80000L)))
    assert(m(2L) === ((1L, 25000L, 25000L)))
  }

  test("timeseries_ewma_fixed: convex-combination bound — never outside the user's value range (sf0.001)") {
    import spark.implicits._
    // if v, s ≥ 4·lo then (v + 3s) div 4 ≥ lo exactly (4·lo is an
    // integer), and symmetrically for hi — so any escape is a real bug
    val range = Tables.events(spark, sf0001).filter($"value".isNotNull)
      .select($"user_id",
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("v"))
      .groupBy($"user_id").agg(min($"v").as("lo"), max($"v").as("hi"))
    val out = operators.Timeseries.timeseriesEwmaFixed(spark, sf0001)
    assert(out.count() > 0)
    val bad = out.join(range, "user_id")
      .filter($"ewma_fp" < $"lo" || $"ewma_fp" > $"hi").count()
    assert(bad === 0L)
  }

  test("timeseries_downsample_triangle: hand-computed elections on an engineered series") {
    import spark.implicits._
    val dir = Tables.scratch("lttb_fix")
    val sec = 1000000000L // 1 s in nanos
    // 8 events → 4 buckets of 2; spike at rn3 dominates bucket 1,
    // the larger-offset point rn6 dominates bucket 2
    val vs = Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 5.0, 9.0)
    vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, 1L, i * sec, v) }
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Timeseries.timeseriesDownsampleTriangle(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      0L -> ((1L, 0L, -1L)),
      1L -> ((3L, 100000L, 300000L)),
      2L -> ((6L, 0L, 100000L)),
      3L -> ((8L, 90000L, -1L))))
    // corpus-wide shape laws
    val corpus = operators.Timeseries
      .timeseriesDownsampleTriangle(spark, sf0001)
    assert(corpus.count() > 0)
    assert(corpus.filter($"bkt" < 0 || $"bkt" > 3).count() === 0L)
    assert(corpus.groupBy($"user_id").count().filter($"count" > 4)
      .count() === 0L, "at most one elected point per bucket")
  }

  test("timeseries_bollinger_stats: hand-computed trailing window; invariants corpus-wide (sf0.001)") {
    import spark.implicits._
    val dir = Tables.scratch("boll_fix")
    Seq((1L, 1L, 1000L, 1.0), (2L, 1L, 2000L, 2.0), (3L, 1L, 3000L, 3.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Timeseries.timeseriesBollingerStats(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // row 3: n=3, Σ=60000, 3·(1+4+9)e8 − 36e8 = 6e8 → ⌊√6e8⌋ = 24494
    assert(got === Map(
      1L -> ((1L, 10000L, 0L)),
      2L -> ((2L, 30000L, 10000L)),
      3L -> ((3L, 60000L, 24494L))))
    val corpus = operators.Timeseries.timeseriesBollingerStats(spark, sf0001)
    assert(corpus.count() > 0)
    assert(corpus.filter($"sd_num" < 0 || $"n_win" < 1 || $"n_win" > 10)
      .count() === 0L)
  }

  test("timeseries_autocorr_stats: hand-computed sums; Cauchy–Schwarz corpus-wide (sf0.001)") {
    import spark.implicits._
    val dir = Tables.scratch("acf_fix")
    // user 1: 1.0, 2.0, 3.0 → pairs (1,2),(2,3): perfect lag-1
    // correlation ⇒ num² = den_x·den_y exactly
    Seq((1L, 1L, 1000L, 1.0), (2L, 1L, 2000L, 2.0), (3L, 1L, 3000L, 3.0),
        (4L, 2L, 1000L, 5.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Timeseries.timeseriesAutocorrStats(spark, dir)
      .collect()
    assert(got.length === 1, "single-event users carry no pairs")
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((1L, 2L, 30000L, 50000L, 800000000L, 100000000L,
        100000000L, 100000000L)))
    // |corr| ≤ 1 ⇔ num² ≤ den_x·den_y (BigInt: num² overflows Long)
    operators.Timeseries.timeseriesAutocorrStats(spark, sf0001).collect()
      .foreach { r =>
        val (num, dx, dy) =
          (BigInt(r.getLong(5)), BigInt(r.getLong(6)), BigInt(r.getLong(7)))
        assert(num * num <= dx * dy, s"Cauchy–Schwarz violated: $r")
        assert(dx >= 0 && dy >= 0)
      }
  }

  test("timeseries_forecast_backtest: day-7 alignment and end-of-day election (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("backtest_fix")
    val dayNs = 86400000000L * 1000L
    // user 1: day 0 v=4.0; day 7 has TWO events — end-of-day is the
    // later (6.0) → one forecast, |6.0 − 4.0| = 20000; day 3 value
    // has no day−7 partner and contributes nothing
    Seq((1L, 1L, 0L * dayNs, 4.0),
        (2L, 1L, 3L * dayNs, 100.0),
        (3L, 1L, 7L * dayNs + 1000L, 9.0),
        (4L, 1L, 7L * dayNs + 2000L, 6.0),
        (5L, 2L, 1L * dayNs, 5.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Timeseries.timeseriesForecastBacktest(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(1L -> ((1L, 20000L, 20000L))),
      s"user 2 has no aligned pair and must drop: $got")
  }

  test("timeseries_cusum: recurrence, reset, and alarm verified on an injected series") {
    import spark.implicits._
    val dir = Tables.scratch("cusum_fix")
    // user 1: 4.0, 8.0, 4.0 → tgt 40000: s₂ = max(0, 80000−45000) =
    // 35000, s₃ = max(0, 35000 + (40000−45000)) = 30000 (partial reset);
    // user 2: single event → all-zero state;
    // user 3: 1.0 then 30.0 → s₂ = 285000 > 200000 → one alarm
    Seq((1L, 1L, 1000L, 4.0), (2L, 1L, 2000L, 8.0), (3L, 1L, 3000L, 4.0),
        (4L, 2L, 1000L, 2.5),
        (5L, 3L, 1000L, 1.0), (6L, 3L, 2000L, 30.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = operators.Timeseries.timeseriesCusum(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) === ((3L, 30000L, 35000L, 0L)))
    assert(m(2L) === ((1L, 0L, 0L, 0L)))
    assert(m(3L) === ((2L, 285000L, 285000L, 1L)))
  }

  test("timeseries_cusum: state invariants hold corpus-wide (sf0.001)") {
    import spark.implicits._
    val out = operators.Timeseries.timeseriesCusum(spark, sf0001)
    assert(out.count() > 0)
    // s ≥ 0 by the max(0,·) clamp, mx dominates the final s, and an
    // alarm needs an update step (n_alarms ≤ n_events − 1)
    assert(out.filter($"cusum_fp" < 0 || $"max_cusum_fp" < $"cusum_fp" ||
      $"n_alarms" > $"n_events" - 1).count() === 0L)
  }

  test("timeseries_holt_linear: constant series is a fixed point; trends follow direction") {
    import spark.implicits._
    val dir = Tables.scratch("holt_fix")
    // user 1: constant 5.0 → level 50000 trend 0 (exact fixed point);
    // user 2: increasing 1,2,3 → positive trend;
    // user 3: decreasing 3,2,1 → negative trend (the signed-div case)
    Seq((1L, 1L, 1000L, 5.0), (2L, 1L, 2000L, 5.0), (3L, 1L, 3000L, 5.0),
        (4L, 2L, 1000L, 1.0), (5L, 2L, 2000L, 2.0), (6L, 2L, 3000L, 3.0),
        (7L, 3L, 1000L, 3.0), (8L, 3L, 2000L, 2.0), (9L, 3L, 3000L, 1.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = operators.Timeseries.timeseriesHoltLinear(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) === ((50000L, 0L, 50000L)))
    assert(m(2L)._2 > 0L, s"increasing series must carry positive trend: $m")
    assert(m(3L)._2 < 0L, s"decreasing series must carry negative trend: $m")
    m.values.foreach { case (l, b, f) => assert(f === l + b) }
  }

  test("scd2_cdc_apply: merge equals the from-scratch SCD2 rebuild (sf0.001)") {
    import spark.implicits._
    val applied = operators.Timeseries.scd2CdcApply(spark, sf0001)
      .select($"user_id", $"event_id", $"version", $"valid_from",
        $"valid_to", $"is_current".cast("int").as("is_current"), $"v")
    val rebuilt = operators.Timeseries.scd2UserValueHistory(spark, sf0001)
      .select($"user_id", $"event_id", $"version".cast("long").as("version"),
        $"valid_from", $"valid_to",
        $"is_current".cast("int").as("is_current"), $"v")
    assert(applied.count() === rebuilt.count())
    assert(applied.except(rebuilt).count() === 0L)
    assert(rebuilt.except(applied).count() === 0L)
  }

  test("timeseries_stl_profile: brute-force MA-decomposition replay at sf0.001") {
    import spark.implicits._
    val S = 1099511627776L
    val daily = Tables.events(spark, sf0001)
      .filter($"value".isNotNull)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_type", expr("t div 86400000000").as("day"), $"v")
      .groupBy($"event_type", $"day")
      .agg((sum($"v") * 10000).cast("long").as("dv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (tp, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.flatMap { i =>
        val win = sorted.slice(math.max(0, i - 3), math.min(sorted.length, i + 4))
        if (win.length != 7) None
        else {
          val trend = win.map(_._3 + S).sum / 7L - S
          Some((tp, sorted(i)._2 % 7, sorted(i)._3 - trend))
        }
      }
    }.toSeq.groupBy(t => (t._1, t._2)).map { case ((tp, wd), ds) =>
      val dets = ds.map(_._3)
      val n = dets.length.toLong
      (tp, wd, n, (dets.map(_ + S).sum) / n - S, dets.sum,
        dets.map(math.abs).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    val out = operators.Timeseries.timeseriesStlProfile(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out === expect, "per-weekday seasonal profile replay")
    // the decomposition partitions the detrended mass: per type, the
    // weekday sums add to the total detrended sum (additivity receipt)
    out.groupBy(_._1).foreach { case (tp, rows) =>
      assert(rows.map(_._5).sum ===
        expect.filter(_._1 == tp).map(_._5).sum, s"$tp additivity")
      // |seasonal| is bounded by the mean absolute remainder's scale
      rows.foreach(r => assert(math.abs(r._4) <= r._6, s"$tp bound"))
    }
  }
}
