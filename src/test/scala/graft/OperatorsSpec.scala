package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.{Scalars, UserCode}
import graft.streaming.Streamy

/** Per-category unit assertions against known fixture values
  * (FIXTURES.md; recomputed with DuckDB during this session). */
class OperatorsSpec extends SparkSuite {

  test("scan_parquet counts all lineitem rows") {
    assert(Relational.scanParquet(spark, sf0001).head().getLong(0) === 6000L)
  }

  test("filter_grep finds documents containing 'join'") {
    assert(Relational.filterGrep(spark, sf0001).count() === 380L)
  }

  test("agg_groupby_sum returnflag totals match fixtures") {
    val m = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("N" -> 2070L, "R" -> 1968L, "A" -> 1962L))
  }

  test("agg_wordcount token totals match fixtures") {
    val wc = Aggregations.aggWordcount(spark, sf0001)
    assert(wc.count() === 31L) // distinct words
    assert(wc.agg(sum("cnt")).head().getLong(0) === 27939L) // total tokens
  }

  test("event type counts match fixtures") {
    val m = Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("click" -> 210L, "purchase" -> 202L, "error" -> 201L,
      "signup" -> 199L, "view" -> 188L))
  }

  test("window_topk_per_group emits at most 3 rows per customer") {
    val over = Windows.windowTopkPerGroup(spark, sf0001)
      .groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.count() === 0L)
  }

  test("semi and anti join partition the left side") {
    val cust = Tables.customer(spark, sf0001).count()
    val semiAll = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.joinAnti(spark, sf0001).count()
    assert(semiAll + anti === cust)
    assert(anti === 0L) // every sf0.001 customer has orders (fixture)
  }

  test("window_lead_firstlast frames bound every event") {
    val df = Windows.windowLeadFirstlast(spark, sf0001).cache()
    assert(df.count() === 1000L)
    // partition extremes bracket the row; lead is strictly later or the
    // -1 sentinel at the partition tail
    val bad = df.filter(col("first_ts_us") > col("ts_us") ||
      col("last_ts_us") < col("ts_us") ||
      (col("next_ts_us") =!= -1L && col("next_ts_us") < col("ts_us")))
    assert(bad.count() === 0L)
    df.unpersist()
  }

  test("join_interval_attribution matches a brute-force latest-prior-click join") {
    val df = Relational.joinIntervalAttribution(spark, sf0001).cache()
    assert(df.count() === 202L) // one output row per purchase (fixture count)
    assert(df.select("purchase_id").distinct().count() === 202L)
    val hits = df.filter(col("click_id") =!= -1L)
    assert(hits.filter(col("click_ts_us") >= col("ts_us") ||
      col("click_ts_us") < col("ts_us") - 3600000000L).count() === 0L)
    // brute force: expand every qualifying (purchase, click) pair, take
    // the (max ts, max id) click — must equal the window-pass result
    val e = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), Tables.nsToUs(col("ts")).as("ts_us"),
        col("event_type"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("event_id").as("c_id"))
    val brute = p.join(c, Seq("user_id"))
      .filter(col("c_ts") < col("ts_us") && col("c_ts") >= col("ts_us") - 3600000000L)
      .groupBy("purchase_id")
      .agg(max(struct(col("c_ts"), col("c_id"))).as("b"))
      .select(col("purchase_id"), col("b.c_ts").as("click_ts_us"),
        col("b.c_id").as("click_id"))
    val fast = hits.select("purchase_id", "click_ts_us", "click_id")
    assert(brute.count() === fast.count())
    assert(brute.except(fast).count() === 0L)
    assert(fast.except(brute).count() === 0L)
    df.unpersist()
  }

  test("join_range_theta keeps every order exactly once") {
    val df = Relational.joinRangeTheta(spark, sf0001)
    assert(df.count() === 1500L)
    assert(df.select("o_orderkey").distinct().count() === 1500L)
  }

  test("setops: intersect ⊆ union, except ∩ intersect = ∅") {
    val u = Windows.setopUnionDistinct(spark, sf0001)
    val i = Windows.setopIntersect(spark, sf0001)
    val x = Windows.setopExcept(spark, sf0001)
    assert(i.count() <= u.count())
    assert(x.intersect(i).count() === 0L)
  }

  test("stream_sessionize: 30-minute-gap sessions match oracle count") {
    val s = Streamy.streamSessionize(spark, sf0001)
    assert(s.count() === 946L)
    // session bounds are consistent
    assert(s.filter(col("end_us") < col("start_us")).count() === 0L)
  }

  test("stream_tumbling_window covers 150 (day, type) groups") {
    assert(Streamy.streamTumblingWindow(spark, sf0001).count() === 150L)
  }

  test("udaf_typed: stable moments equal exact mean/variance") {
    val got = UserCode.udafTyped(spark, sf0001).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val want = Tables.supplier(spark, sf0001)
      .groupBy("s_nationkey")
      // var_samp of a single-member group is NULL; the aggregator
      // defines it as 0.0 — align with coalesce
      .agg(round(avg("s_acctbal"), 4).as("m"),
        coalesce(round(var_samp("s_acctbal"), 4), lit(0.0)).as("v"))
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (m, v)) =>
      assert(math.abs(m - want(k)._1) < 1e-6, s"mean nation $k")
      assert(math.abs(v - want(k)._2) < 1e-4, s"var nation $k")
    }
  }

  test("scalar_array: dims are 64 and n_pos bounded") {
    val a = Scalars.scalarArray(spark, sf0001)
    assert(a.filter(col("dim") =!= 64).count() === 0L)
    assert(a.filter(col("n_pos") > 64 || col("n_pos") < 0).count() === 0L)
  }

  test("agg_approx_percentile: rank error within the GK 1/accuracy bound") {
    // percentile_approx(accuracy=1000) guarantees the returned value's
    // true rank is within n/1000 of the target rank; verify against the
    // actual data, with one rank of slack for ties/discreteness
    val approx = operators.Aggregations.aggApproxPercentile(spark, sf0001)
      .collect().map(r => r.getString(0) -> Seq(
        0.50 -> r.getDouble(1), 0.90 -> r.getDouble(2), 0.99 -> r.getDouble(3)))
    val vals = Tables.events(spark, sf0001)
      .select(col("event_type"), Tables.dec4(col("value")).cast("double").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (tpe, ps) =>
      val sorted = vals(tpe); val n = sorted.length
      ps.foreach { case (p, est) =>
        // est must be an actual data value (GK returns samples)
        assert(sorted.contains(est), s"$tpe p$p=$est not a data value")
        val rank = sorted.count(_ <= est).toDouble / n
        val rankLo = sorted.count(_ < est).toDouble / n
        val eps = 1.0 / 1000 + 1.0 / n
        assert(rankLo - eps <= p && p <= rank + eps,
          s"$tpe p$p: est=$est covers ranks [$rankLo,$rank], outside ±$eps")
      }
    }
  }

  test("agg_countmin_replayable: one-sided estimates within the CMS overcount bound (sf0.1)") {
    val rows = operators.Aggregations.aggCountminReplayable(spark, sf01).collect()
    assert(rows.length === 20)
    val n = Tables.events(spark, sf01).count().toDouble
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(est >= exact, s"CMS never undercounts: $r")
      // e·n/w holds w.p. 1−e^−d per probe; generous 3n/w deterministic pin
      assert(est - exact <= math.ceil(3 * n / 256).toLong,
        s"overcount ${est - exact} beyond the 3n/w band: $r")
    }
    // the top-20 exact counts are strictly the heaviest users
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("agg_percentile_sampled: sampled quantiles land within rank tolerance of exact (sf0.1)") {
    val rows = operators.Aggregations.aggPercentileSampled(spark, sf01).collect()
    val vals = Tables.events(spark, sf01)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val tpe = r.getString(0)
      assert(r.getLong(1) > 0, s"$tpe: empty sample")
      val sorted = vals(tpe); val n = sorted.length
      Seq(0.5 -> r.getDouble(2), 0.9 -> r.getDouble(3)).foreach { case (p, est) =>
        val rank = sorted.count(_ <= est).toDouble / n
        // ~1/16 sample of ~12k rows per type: 4σ rank band ≈ 0.07
        assert(math.abs(rank - p) < 0.1,
          s"$tpe p$p sampled=$est at rank $rank, outside +-0.1")
      }
    }
  }

  test("agg_hll_replayable: full registers, bounded ranks, estimate near exact (sf0.1)") {
    val rows = operators.Aggregations.aggHllReplayable(spark, sf01).collect()
    // every type fills all 64 registers at this cardinality (~1500 users)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length === 64, s"$t: registers must be full")
      assert(rs.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 35))
      val est = rs.head.getLong(3).toDouble
      val exact = rs.head.getLong(4).toDouble
      // raw HLL at m=64: σ ≈ 1.04/√64 ≈ 13%; assert a generous 3σ band
      assert(math.abs(est / exact - 1.0) < 0.4,
        s"$t: est $est vs exact $exact outside the HLL error band")
    }
  }
}
