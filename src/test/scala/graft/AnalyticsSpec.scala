package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Assertions for the round-3 analytics layer (PageRank, TF-IDF,
  * repetition, Z-order, Bloom prefilter, int8 quantization). Oracle
  * hash-parity is the driver's job; these pin the operator-level
  * invariants the oracle can't express. */
class AnalyticsSpec extends SparkSuite {

  test("graph_pagerank: isolated nodes keep the base rank; hubs rank above it") {
    val r = Analytics.graphPagerank(spark, sf0001).cache()
    // every node labeled exactly once (160 = 150 customers + 10 suppliers at sf0.001)
    assert(r.count() === r.select("node_id").distinct().count())
    // deg-0 nodes receive nothing: rank exactly the 0.15 base
    assert(r.filter(col("deg") === 0 && col("rank_fp") =!= 150000L).count() === 0L)
    // rank mass stays within [n*base, n*RankOne] (damping only sheds mass)
    val n = r.count()
    val mass = r.agg(sum("rank_fp")).head.getLong(0)
    assert(mass >= 150000L * n && mass <= 1000000L * n, s"mass=$mass n=$n")
    // the most-connected node outranks the MEDIAN connected node —
    // a regression flattening ranks (e.g. dropping the degree division)
    // would keep every rank above the base but kill this ordering
    val ranks = r.filter(col("deg") > 0).orderBy(col("deg").desc)
      .select("rank_fp").collect().map(_.getLong(0))
    val hub = ranks.head
    val median = ranks.sorted.apply(ranks.length / 2)
    assert(hub > median, s"hub rank $hub must exceed median rank $median")
    r.unpersist()
  }

  test("text_tfidf: ranks are 1..5 per doc and scores are monotone in rank") {
    val t = Analytics.textTfidf(spark, sf0001).cache()
    assert(t.filter(col("rnk") < 1 || col("rnk") > 5).count() === 0L)
    // within a doc, score_fp never increases as rnk increases
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rnk")
    val bad = t.withColumn("prev", lag("score_fp", 1).over(w))
      .filter(col("prev").isNotNull && col("score_fp") > col("prev"))
    assert(bad.count() === 0L)
    // the score formula itself: score_fp == (tf * N * 1e6) div df
    val n = Tables.documents(spark, sf0001).count()
    val badScore = t.filter(
      col("score_fp") =!= expr(s"(tf * ${n}L * 1000000) div df"))
    assert(badScore.count() === 0L)
    t.unpersist()
  }

  test("quality_repetition: ratio is exact fixed-point of (n_grams - n_distinct)/n_grams") {
    val q = Analytics.qualityRepetition(spark, sf001).cache()
    assert(q.filter(col("dup_fp") < 0 || col("dup_fp") >= 1000000L).count() === 0L)
    val bad = q.filter(
      col("dup_fp") =!= expr("((n_grams - n_distinct) * 1000000) div n_grams"))
    assert(bad.count() === 0L)
    // fixture has real repetition signal (verified 27 docs at sf0.01)
    assert(q.filter(col("dup_fp") > 0).count() > 0L)
    q.unpersist()
  }

  test("quality_repetition: xxhash64 fingerprint variant agrees with the string variant") {
    // The at-scale posture distinct-counts 8-byte gram fingerprints; the
    // oracled output distinct-counts gram strings. Identical unless a
    // 64-bit collision appears in the fixture — this canary makes that
    // fail loudly instead of silently skewing the quality score.
    val s = Analytics.qualityRepetition(spark, sf001).collect().toSeq
    val h = Analytics.qualityRepetitionHashed(spark, sf001).collect().toSeq
    assert(s === h, "xxhash64 gram collision in the documents fixture")
  }

  test("quality_classifier_score: bounded scores, scala-reference weights, balanced deciles") {
    val df = Analytics.qualityClassifierScore(spark, sf0001).cache()
    // every ≥2-token document scored exactly once
    val expected = Tables.documents(spark, sf0001)
      .filter(expr("size(filter(split(text, ' '), w -> w <> '')) >= 2")).count()
    assert(df.count() === expected)
    assert(df.select("doc_id").distinct().count() === expected)
    // weights live in [0, 20] ⇒ the mean-scaled score in [0, 20e6]
    assert(df.filter(col("score_mi") < 0L || col("score_mi") > 20000000L).count() === 0L)
    // scala-reference recomputation of one document's score
    val row = df.filter(col("doc_id") === 0L).head()
    val text = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0L).head().getAs[String]("text")
    val toks = text.split(" ").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = toks.sliding(2).map { bg =>
      val hex = md.digest(bg.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 21
    }.sum
    assert(row.getAs[Long]("score_raw") === want)
    assert(row.getAs[Long]("n_bigrams") === (toks.length - 1).toLong)
    // ntile property: decile sizes within a (lang, shard) differ by ≤ 1
    val spread = df.groupBy("lang", "shard", "decile").count()
      .groupBy("lang", "shard").agg((max("count") - min("count")).as("d"))
      .filter(col("d") > 1L)
    assert(spread.count() === 0L)
    df.unpersist()
  }

  test("sort_zorder_layout: zval interleaves bits exactly (scala reference)") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, k) =>
        acc | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
      }
    val rows = Analytics.sortZorderLayout(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(3) === ref(r.getLong(1), r.getLong(2)),
        s"event ${r.getLong(0)}: z mismatch")
    }
    // curve order: output is sorted by zval
    val zs = rows.map(_.getLong(3))
    assert(zs.sameElements(zs.sorted))
    // locality: both coords < 16 ⇒ z < 256 (prefix property of Morton codes)
    rows.filter(r => r.getLong(1) < 16 && r.getLong(2) < 16)
      .foreach(r => assert(r.getLong(3) < 256))
  }

  test("bloom prefilter has no false negatives and probes inside the scan") {
    import spark.implicits._
    // exact result == unfiltered join result (FPs removed by the join)
    val got = Analytics.joinBloomPrefilter(spark, sf0001)
    val want = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001).filter($"c_mktsegment" === "BUILDING"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.dec2($"o_totalprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority")
    assert(got.collect().toSeq === want.collect().toSeq)
    // plan: the probe rides the fact scan filter, join stays shuffle-hash
    val plan = Analytics.joinBloomPrefilter(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(600))
    assert(plan.contains("ShuffledHashJoin"), "dim side must NOT broadcast here")
  }

  test("bloom expression: zero false negatives over the full key set") {
    import spark.implicits._
    val keys = Tables.customer(spark, sf001).select($"c_custkey")
    val bf = functions.BloomOps.build(keys, "c_custkey", 100000L, 0.01)
    functions.BloomOps.register(spark, bf)
    assert(keys.filter(!expr("bloom_might_contain(c_custkey)")).count() === 0L)
    // and FPs are rare on a disjoint key range
    val probes = spark.range(1000000, 1010000).selectExpr("id AS k")
    val fp = probes.filter(expr("bloom_might_contain(k)")).count()
    assert(fp < 500L, s"fp=$fp of 10000 — fpp far above the configured 1%")
  }

  test("ml_kmeans_step: assignments partition the corpus and seeds self-assign") {
    import graft.operators.Multimodal
    val clusters = Multimodal.mlKmeansStep(spark, sf0001).collect()
    assert(clusters.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    val total = clusters.map(_.getLong(1)).sum
    assert(total === Tables.embeddings(spark, sf0001).count(),
      "every vector must be assigned exactly once")
    clusters.foreach { r =>
      assert(r.getLong(1) >= 1, s"cluster ${r.getLong(0)} empty — its own seed " +
        "is at distance 0 and must self-assign")
      assert(r.getLong(2) >= 0, "inertia cannot be negative")
    }
  }

  test("embedding_quantize: q stays in [-127, 127] and digests are consistent") {
    val q = Analytics.embeddingQuantize(spark, sf0001).cache()
    assert(q.filter(col("q_min") < -127 || col("q_max") > 127).count() === 0L)
    assert(q.filter(abs(col("q_sum")) > col("q_abs_sum")).count() === 0L)
    // a non-zero vector always has an element quantizing to ±127 (its maxabs)
    assert(q.filter(col("scale_fp") > 0 &&
      col("q_max") =!= 127 && col("q_min") =!= -127).count() === 0L)
    q.unpersist()
  }

  test("report_abc_classification: contiguous rank bands that partition the parts (sf0.001)") {
    import spark.implicits._
    val rows = Analytics.reportAbcClassification(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq.sorted === rows.map(_._1).toSeq)
    assert(rows.head._4 === 1L, "class A must start at rank 1")
    rows.sliding(2).foreach {
      case Array((_, _, _, _, hiA), (_, _, _, loB, _)) =>
        assert(hiA + 1 === loB, "rank bands must be contiguous")
      case _ => ()
    }
    rows.foreach { case (_, n, _, lo, hi) => assert(n === hi - lo + 1) }
    val nParts = Tables.lineitem(spark, sf0001)
      .select($"l_partkey").distinct().count()
    assert(rows.map(_._2).sum === nParts)
    // Pareto bound: A's revenue share is ≤ 80% of the total by the
    // class rule (the boundary row falls to B)
    val total = rows.map(_._3).sum
    val aRev = rows.find(_._1 == "A").map(_._3).getOrElse(0L)
    assert(aRev * 5 <= total * 4)
  }

  test("ml_linreg_sufficient: statistics match a hand-computed fit; den obeys Cauchy–Schwarz (sf0.001)") {
    import spark.implicits._
    val dir = Tables.scratch("linreg")
    // one series: days 0,1,2 with values 1,2,3 → perfect slope 1/day:
    // n=3 sx=3 sy_fp=60000 sxx=5 sxy_fp=80000 num=60000 den=6
    val dayNs = 86400000000L * 1000L
    Seq((1L, 1L, 0L * dayNs, "click", 1.0),
        (2L, 1L, 1L * dayNs, "click", 2.0),
        (3L, 1L, 2L * dayNs, "click", 3.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = operators.Multimodal.mlLinregSufficient(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6), row.getLong(7), row.getLong(8)) ===
      ((3L, 3L, 60000L, 5L, 80000L, 60000L, 6L)))
    // n·Σx² − (Σx)² ≥ 0 for every group, = 0 only when all x equal
    val neg = operators.Multimodal.mlLinregSufficient(spark, sf0001)
      .filter($"den" < 0).count()
    assert(neg === 0L)
  }

  test("report_brand_concentration: HHI bounds and brute-force recompute (sf0.001)") {
    val mass = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
      .join(Tables.part(spark, sf0001).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "l_suppkey", "q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = operators.Analytics.reportBrandConcentration(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bySupp = mass(r.getString(0)).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toMap
      val tot = bySupp.values.sum
      val sumSq = bySupp.values.map(v => v * v).sum
      assert(r.getLong(1) === bySupp.size.toLong)
      assert(r.getLong(2) === tot)
      assert(r.getLong(3) === sumSq * 1048576L / (tot * tot))
      // 1/n ≤ HHI ≤ 1 (floor slack one ulp on the lower bound)
      assert(r.getLong(3) <= 1048576L &&
        r.getLong(3) >= 1048576L / r.getLong(1) - 1)
    }
  }

  test("profile_duplicate_invoices: contended keys match a brute-force recompute (sf0.001)") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("od"),
        col("o_orderkey")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = operators.Relational.profileDuplicateInvoices(spark, sf0001)
      .collect()
    val contended = orders.filter(_._2.length > 1)
    assert(got.length === contended.size)
    got.foreach { r =>
      val ks = contended((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === ks.length.toLong)
      assert(r.getLong(3) === ks.min && r.getLong(4) === ks.max)
      assert(r.getLong(3) < r.getLong(4), "distinct orders must collide")
    }
  }

  test("agg_weighted_median: election matches a brute-force weighted scan (sf0.001)") {
    val lines = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1)
    val got = operators.Aggregations.aggWeightedMedian(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val rows = lines(r.getString(0)).sortBy(x => (x._4, x._2, x._3))
      val w = rows.map(_._5).sum
      var cum = 0L
      val med = rows.find { x => cum += x._5; cum * 2 >= w }.get._4
      assert(r.getLong(1) === rows.length.toLong)
      assert(r.getLong(2) === w)
      assert(r.getLong(3) === med, s"weighted median mismatch for ${r.getString(0)}")
    }
  }

  test("report_ship_latency: mass and median match a brute-force recompute (sf0.001)") {
    val lat = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        unix_date(to_date(col("l_shipdate"))).cast("long").as("sd"))
      .join(Tables.orders(spark, sf0001)
        .select(col("o_orderkey"), col("o_orderpriority"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("sd") - col("od")).as("days"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    val got = operators.Analytics.reportShipLatency(spark, sf0001).collect()
    assert(got.map(_.getLong(1)).sum === Tables.lineitem(spark, sf0001).count())
    got.foreach { r =>
      val rows = lat(r.getString(0)).sortBy(x => (x._2, x._3, x._4))
      val n = rows.length
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === rows.map(_._2).min)
      assert(r.getLong(3) === rows.map(_._2).max)
      assert(r.getLong(4) === rows.map(_._2).sum)
      assert(r.getLong(5) === rows((n + 1) / 2 - 1)._2,
        s"median mismatch for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(5) && r.getLong(5) <= r.getLong(3))
    }
  }

  test("quality_winsorize_clip: bounds and clamp match a brute-force recompute (sf0.001)") {
    val evs = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = operators.Analytics.qualityWinsorizeClip(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val rows = evs(r.getString(0)).sortBy(x => (x._3, x._2)).map(_._3)
      val n = rows.length
      val lo = rows((n * 5 + 99) / 100 - 1)
      val hi = rows((n * 95 + 99) / 100 - 1)
      assert(r.getLong(6) === lo && r.getLong(7) === hi,
        s"percentile election mismatch for ${r.getString(0)}")
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === rows.count(_ < lo).toLong)
      assert(r.getLong(3) === rows.count(_ > hi).toLong)
      assert(r.getLong(4) === rows.sum)
      assert(r.getLong(5) === rows.map(v => math.max(lo, math.min(hi, v))).sum)
      // clamping can only pull mass toward the band
      assert(r.getLong(5) >= n * lo && r.getLong(5) <= n * hi)
    }
  }

  test("report_backlog_aging: bands partition the open orders (sf0.001)") {
    val got = operators.Analytics.reportBacklogAging(spark, sf0001).collect()
    val open = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "O").count()
    assert(got.map(_.getLong(2)).sum === open)
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 4))
    assert(got.forall(_.getLong(3) >= 0L))
  }

  test("eval_calibration_bins: deciles cover the corpus; rates are exact (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    val expected = docs.groupBy { case (nc, _) =>
      (nc * 1048576L / 600) * 10 / 1048576L
    }
    val bins = operators.Multimodal.evalCalibrationBins(spark, sf0001)
      .collect()
    assert(bins.map(_.getLong(1)).sum === docs.length.toLong)
    bins.foreach { b =>
      val rows = expected(b.getLong(0))
      assert(b.getLong(1) === rows.length.toLong)
      assert(b.getLong(2) === rows.map(_._1 * 1048576L / 600).sum)
      assert(b.getLong(3) === rows.count(_._2).toLong)
      assert(b.getLong(4) === rows.count(_._2).toLong * 1048576L / rows.length)
    }
  }

  test("eval_ece_exact: summary reconciles with the calibration bins (sf0.001)") {
    val bins = operators.Multimodal.evalCalibrationBins(spark, sf0001)
      .collect()
    val num = bins.map(b => math.abs(b.getLong(3) * 1048576L - b.getLong(2))).sum
    val n = bins.map(_.getLong(1)).sum
    val r = operators.Multimodal.evalEceExact(spark, sf0001).head()
    assert(r.getLong(0) === bins.length.toLong)
    assert(r.getLong(1) === n)
    assert(r.getLong(2) === num)
    assert(r.getLong(3) === num / n)
    assert(r.getLong(3) >= 0 && r.getLong(3) <= 1048576L)
  }

  test("text_hapax_stats: inventory laws and a brute-force lang recompute (sf0.001)") {
    val got = operators.LlmOps.textHapaxStats(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) === r.getLong(3) * 1048576L / r.getLong(2))
    }
    // full recompute for one language
    val grams = Tables.documents(spark, sf0001)
      .filter(col("lang") === "de").select("text").collect()
      .flatMap(_.getString(0).split(" ").sliding(4).filter(_.length == 4)
        .map(_.mkString(" ")))
    val counts = grams.groupBy(identity).view.mapValues(_.length)
    val de = got.find(_.getString(0) == "de").get
    assert(de.getLong(1) === grams.length.toLong)
    assert(de.getLong(2) === counts.size.toLong)
    assert(de.getLong(3) === counts.count(_._2 == 1).toLong)
  }

  test("ml_decision_stump: curve matches a brute-force recompute; exactly one elected split (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    val n = docs.length.toLong
    val p = docs.count(_._2).toLong
    // brute force: for every candidate threshold, the same exact
    // integer Gini score the operator claims
    val expected = docs.map(_._1).distinct.sorted.dropRight(1).map { t =>
      val nl = docs.count(_._1 <= t).toLong
      val pl = docs.count(d => d._1 <= t && d._2).toLong
      val (nr, pr) = (n - nl, p - pl)
      val num = (pl * (nl - pl) * nr + pr * (nr - pr) * nl) * 2097152L
      t -> num / (nl * nr)
    }.toMap
    val got = operators.Multimodal.mlDecisionStump(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      assert(r.getLong(5) === expected(r.getLong(0)),
        s"gini mismatch at threshold ${r.getLong(0)}")
    }
    assert(got.count(_.getLong(6) === 1L) === 1, "exactly one is_best")
    val bestGini = got.filter(_.getLong(6) === 1L).head.getLong(5)
    assert(got.forall(_.getLong(5) >= bestGini), "elected split is argmin")
  }

  test("eval_auc_exact: U statistic matches the pairwise definition (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
      .groupBy(_._1)
    val got = operators.Multimodal.evalAucExact(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val rows = docs(r.getString(0))
      val pos = rows.filter(_._3).map(_._2)
      val neg = rows.filter(!_._3).map(_._2)
      // 2U = Σ_pairs (2·[sp > sn] + [sp = sn]) — ties at half credit
      val u2 = (for { sp <- pos; sn <- neg } yield
        if (sp > sn) 2L else if (sp == sn) 1L else 0L).sum
      assert(r.getLong(1) === pos.length.toLong)
      assert(r.getLong(2) === neg.length.toLong)
      assert(r.getLong(3) === u2, s"u2 mismatch for ${r.getString(0)}")
      val auc = r.getLong(4)
      if (pos.nonEmpty && neg.nonEmpty)
        assert(auc === u2 * 1048576L / (2L * pos.length * neg.length) &&
          auc >= 0 && auc <= 1048576L)
      else assert(auc === -1L)
    }
  }

  test("ml_als_1d_step: a rank-1-consistent fixture is a FIXED POINT of the ALS round") {
    import spark.implicits._
    import graft.operators.Multimodal
    // ratings r = u_c * v_p with v initialized from p_retailprice: the
    // user solve recovers u exactly (Σu·v²/Σv² = u, integral at 2^20)
    // and the item solve must then return v UNCHANGED — the normal
    // equations' fixed point, exact in integer arithmetic.
    val dir = Tables.scratch("als_rank1")
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 2.0), (2L, 5.0)).toDF("p_partkey", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    // u = (3, 4): r_cp = u_c * v_p
    Seq((1L, 1L, 6L), (1L, 2L, 15L), (2L, 1L, 8L), (2L, 2L, 20L))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Multimodal.mlAls1dStep(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((2L, 2L, 2L)), s"part 1: ${out(1L)}")
    assert(out(2L) === ((2L, 5L, 5L)), s"part 2: ${out(2L)}")
  }

  test("ml_gbdt_stump_boost: every round strictly reduces SSE and splits are non-degenerate") {
    import graft.operators.Multimodal
    val rows = Multimodal.mlGbdtStumpBoost(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    rows.foreach { r =>
      val (nl, nr) = (r.getLong(3), r.getLong(4))
      assert(nl >= 1 && nr >= 1, s"degenerate split: $r")
      val (before, after) = (r.getLong(7), r.getLong(8))
      assert(after < before,
        s"round ${r.getLong(0)} did not reduce SSE: $before -> $after")
    }
    // the additive chain: round 2 starts where round 1 ended
    assert(rows(1).getLong(7) === rows(0).getLong(8),
      "round 2's sse_before must equal round 1's sse_after")
  }

  test("ml_isotonic_calibration: the fit is monotone nondecreasing and mass-consistent") {
    import graft.operators.Multimodal
    val rows = Multimodal.mlIsotonicCalibration(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val iso = rows.map(_.getLong(4))
    // THE isotonic property (which the raw diagram lacks)
    iso.sliding(2).foreach(p =>
      if (p.length == 2) assert(p(0) <= p(1), s"fit not monotone: ${iso.toSeq}"))
    // the fit stays inside the observed rate range
    val raw = rows.map(_.getLong(3))
    assert(iso.min >= raw.min && iso.max <= raw.max,
      s"fit escapes the data range: iso=${iso.toSeq} raw=${raw.toSeq}")
  }

  test("graph_ktruss_peel: brute-force 3-round truss replay at sf0.001") {
    import graft.operators.Analytics
    // rebuild the sparsified co-purchase graph exactly (top-5 by shared
    // parts, canonical a < b), then peel with support >= 1 three times
    val ps = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = ps.groupBy(_._1).values.map(_.map(_._2).toSet)
    val sp = scala.collection.mutable.Map[(Long, Long), Long]()
    byPart.foreach { ss =>
      for (u <- ss; v <- ss if u != v) sp((u, v)) = sp.getOrElse((u, v), 0L) + 1L
    }
    val top5 = sp.keys.toSeq.groupBy(_._1).toSeq.flatMap { case (u, pairs) =>
      pairs.map { case (_, v) => (v, sp((u, v))) }
        .sortBy { case (v, s) => (-s, v) }.take(5)
        .map { case (v, _) => (math.min(u, v), math.max(u, v)) }
    }.toSet
    var edges = top5
    val expect = (1 to 3).map { r =>
      val tri = for {
        (a, b) <- edges.toSeq
        (a2, c) <- edges if a2 == b
        if edges.contains((a, c))
      } yield (a, b, c)
      val sup = scala.collection.mutable.Map[(Long, Long), Long]()
      tri.foreach { case (x, y, z) =>
        Seq((x, y), (x, z), (y, z)).foreach(e =>
          sup(e) = sup.getOrElse(e, 0L) + 1L)
      }
      val kept = edges.filter(e => sup.getOrElse(e, 0L) >= 1L)
      val row = (r.toLong, edges.size.toLong, tri.size.toLong,
        (edges.size - kept.size).toLong, kept.size.toLong)
      edges = kept
      row
    }
    val out = Analytics.graphKtrussPeel(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === expect, "3-round truss receipt")
    // the receipt chains: each round's output is the next round's input
    assert(out(1)._2 === out(0)._5 && out(2)._2 === out(1)._5)
  }

  test("ml_als_1d_step: sf0.001 factors are positive and obs counts tie to ratings") {
    import graft.operators.Multimodal
    val rows = Multimodal.mlAls1dStep(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "n_obs")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0,
        s"factors must stay positive: $r")
    }
  }
}
