package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregations, Analytics, Behavioral, Multimodal, Stats, Timeseries}

/** Invariants for the round-14 batch: statistical screens (KS, χ²,
  * TV drift), Theil–Sen, KMV set algebra, attribution exactness, the
  * perceptron/PCA chains, and RAKE structure. Oracle hash-parity is
  * the driver's job; these pin what the oracle can't express. */
class StatsSpec extends SparkSuite {

  test("behavior_multitouch_attribution: per-journey credit sums to exactly one million") {
    val rows = Behavioral.behaviorMultitouchAttribution(spark, sf0001)
      .groupBy(col("purchase_event_id"))
      .agg(sum(col("credit_ppm")).as("s"), max(col("n_touches")).as("n"),
        count(lit(1)).as("cnt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 1000000L,
        s"journey ${r.getLong(0)} credit sums to ${r.getLong(1)}")
      assert(r.getLong(2) === r.getLong(3), "n_touches must equal the journey row count")
    }
  }

  test("behavior_multitouch_attribution: 40/20/40 positions on 3+-touch journeys") {
    val rs = Behavioral.behaviorMultitouchAttribution(spark, sf0001)
      .filter(col("n_touches") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rs.nonEmpty, "sf0.001 has 3+-touch journeys")
    rs.foreach { case (j, rank, n, credit) =>
      if (rank == 1L || rank == n) assert(credit === 400000L, s"journey $j rank $rank")
      else assert(credit >= 200000L / (n - 2) && credit <= 200000L / (n - 2) + 200000L % (n - 2),
        s"journey $j middle credit $credit outside the split band")
    }
  }

  test("agg_kmv_replayable: set algebra and estimate band") {
    val r = Aggregations.aggKmvReplayable(spark, sf01).collect().head
    val m = r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.getLong(i) }.toMap
    // inclusion–exclusion on the exact audit columns
    assert(m("exact_a") + m("exact_b") === m("exact_union") + m("exact_inter"))
    // the union sample's k-th smallest can't exceed either side's
    assert(m("theta_u") <= math.min(m("theta_a"), m("theta_b")))
    assert(m("rho") <= m("k"))
    // 1/sqrt(64) = 12.5% design sigma; allow 4 sigma at sf0.1
    Seq(("est_a", "exact_a"), ("est_b", "exact_b"), ("est_union", "exact_union"))
      .foreach { case (e, x) =>
        val (est, exact) = (m(e).toDouble, m(x).toDouble)
        assert(math.abs(est - exact) / exact < 0.5, s"$e=$est vs $x=$exact")
      }
  }

  /** Per-pair segment value lists at sf0.001 — the brute-force input
    * for the two-sample screen replays. */
  private def segPairValues(): Map[Long, (Seq[Long], Seq[Long])] = {
    val pairs = Seq((1L, "BUILDING", "MACHINERY"),
      (2L, "FURNITURE", "HOUSEHOLD"), (3L, "AUTOMOBILE", "BUILDING"))
    val rows = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (Tables.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    pairs.map { case (id, a, b) =>
      id -> (rows.filter(_._1 == a).map(_._2).toSeq,
        rows.filter(_._1 == b).map(_._2).toSeq)
    }.toMap
  }

  test("profile_mannwhitney_u: brute-force doubled-U replay and complement identity") {
    val vals = segPairValues()
    val out = Stats.profileMannwhitneyU(spark, sf0001).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (id, na, nb, u2a, u2b, auc) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (as, bs) = vals(id)
      assert(na === as.length.toLong && nb === bs.length.toLong)
      // every (a, b) pair scored 2/1/0 — the doubled ½-tie convention
      val brute = (for (a <- as; b <- bs)
        yield if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert(u2a === brute, s"pair $id doubled U")
      assert(u2a + u2b === 2L * na * nb, s"pair $id complement identity")
      assert(auc >= 0L && auc <= 1048576L)
      assert(auc === (BigInt(u2a) * 1048576 / (BigInt(2) * na * nb)).toLong)
    }
  }

  test("profile_cvm_distance: brute-force cleared-numerator replay at sf0.001") {
    val vals = segPairValues()
    val out = Stats.profileCvmDistance(spark, sf0001).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (id, na, nb, nSup, fp) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val (as, bs) = vals(id)
      val support = (as ++ bs).distinct.sorted
      assert(nSup === support.length.toLong)
      var num = BigInt(0)
      support.foreach { v =>
        val (ca, cb) = (as.count(_ == v), bs.count(_ == v))
        val d = BigInt(as.count(_ <= v)) * nb - BigInt(bs.count(_ <= v)) * na
        num += BigInt(ca + cb) * d * d
      }
      val expect = num * 1048576 /
        (BigInt(na) * nb * (na + nb) * (na + nb))
      assert(fp === expect.toLong, s"pair $id cvm_fp")
      assert(fp >= 0L)
    }
  }

  test("profile_anderson_darling: brute-force tail-weighted replay at sf0.001") {
    val vals = segPairValues()
    val out = Stats.profileAndersonDarling(spark, sf0001).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (id, na, nb, nSup, fp) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val (as, bs) = vals(id)
      val n = na + nb
      // support excludes the top value (B_v = n has a zero denominator)
      val support = (as ++ bs).distinct.sorted.dropRight(1)
      assert(nSup === support.length.toLong)
      var ts = BigInt(0)
      support.foreach { v =>
        val (ca, cb) = (as.count(_ == v), bs.count(_ == v))
        val (cua, cub) = (as.count(_ <= v), bs.count(_ <= v))
        val d = BigInt(cua) * nb - BigInt(cub) * na
        val bu = BigInt(cua + cub)
        // the per-value truncating fixed-point division, replayed
        ts += (BigInt(1048576) * (ca + cb) * d * d) / (bu * (n - bu))
      }
      val expect = ts / (BigInt(na) * nb)
      assert(fp === expect.toLong, s"pair $id ad_fp")
      assert(fp >= 0L)
      // swapping the samples leaves A² invariant (d flips sign only) —
      // the symmetry the tail weighting must not break
      var ts2 = BigInt(0)
      support.foreach { v =>
        val (ca, cb) = (as.count(_ == v), bs.count(_ == v))
        val d = BigInt(bs.count(_ <= v)) * na - BigInt(as.count(_ <= v)) * nb
        val bu = BigInt(as.count(_ <= v) + bs.count(_ <= v))
        ts2 += (BigInt(1048576) * (ca + cb) * d * d) / (bu * (n - bu))
      }
      assert(ts2 / (BigInt(nb) * na) === expect, s"pair $id symmetry")
    }
  }

  test("simsearch_hnsw_layers: the descent is score-monotone and bounded by the exact best") {
    val rows = Multimodal.simsearchHnswLayers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sEntry, sL2, sL1, sL0, bestS) =
        (r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(8), r.getLong(10))
      // each hop keeps the current node as a candidate → monotone up
      assert(sEntry <= sL2 && sL2 <= sL1 && sL1 <= sL0,
        s"q ${r.getLong(0)} descent must be monotone")
      assert(sL0 <= bestS, s"q ${r.getLong(0)} routed score beats the exact best")
      assert(r.getLong(11) === (if (r.getLong(7) == r.getLong(9)) 1L else 0L))
    }
    // the layers genuinely nest: every endpoint id is a member of its layer
    rows.foreach { r =>
      assert(r.getLong(3) % 64 === 0L); assert(r.getLong(5) % 16 === 0L)
      assert(r.getLong(7) % 4 === 0L)
    }
    // the L0 edge-recall receipt: one constant pair, 13 audit nodes
    // (b_id % 40, < 2000) × 4 exact edges, bucketing recovers > 0
    val (hits, tot) = (rows.head.getLong(12), rows.head.getLong(13))
    assert(rows.forall(r => r.getLong(12) == hits && r.getLong(13) == tot))
    assert(tot === 52L, "13 audit nodes x 4 exact edges at sf0.001")
    assert(hits > 0L && hits <= tot, "edge recall must be priced in (0, 1]")
  }

  test("simsearch_hnsw_serve: the stored-index descent equals simsearch_hnsw_layers' per-run descent; the censuses equal the committed edge counts") {
    import graft.sources.TxnTable
    val served = Multimodal.simsearchHnswServe(spark, sf0001).collect()
    val built = Multimodal.simsearchHnswLayers(spark, sf0001).collect()
    assert(served.nonEmpty)
    // same membership, same build, same entry → the descent trace and
    // recall receipt must agree row for row (columns 0..11 shared)
    assert(served.map(r => (0 to 11).map(r.getLong).toVector).toSeq ===
      built.map(r => (0 to 11).map(r.getLong).toVector).toSeq,
      "stored-index serving diverged from the per-run build's descent")
    // the census columns really count the COMMITTED index
    val edges = TxnTable.read(spark, Tables.scratch("idx_hnsw_edges"))
      .collect().map(_.getLong(0))
    assert(served.head.getLong(12) === edges.count(_ == 64L).toLong)
    assert(served.head.getLong(13) === edges.count(_ == 16L).toLong)
    assert(served.head.getLong(14) === edges.count(_ == 4L).toLong)
  }

  test("simsearch_hnsw_maintain: descent monotone over the maintained index; the append is a by-reference delta of backlinked L0 edges; upper layers carry untouched") {
    import graft.sources.TxnTable
    val rows = Multimodal.simsearchHnswMaintain(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sEntry, sL2, sL1, sL0, bestS) =
        (r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(8),
          r.getLong(10))
      assert(sEntry <= sL2 && sL2 <= sL1 && sL1 <= sL0,
        s"q ${r.getLong(0)} descent must be monotone")
      assert(sL0 <= bestS)
      assert(r.getLong(11) === (if (r.getLong(7) == r.getLong(9)) 1L
        else 0L))
    }
    val tEdges = Tables.scratch("idx_hnswm_edges")
    // the append commit is a DELTA carrying v0's file by reference
    val v0e = TxnTable.fileEntries(spark, tEdges, Some(0)).map(_.path)
    val v1e = TxnTable.fileEntries(spark, tEdges, Some(1)).map(_.path)
    assert(v0e.toSet.subsetOf(v1e.toSet),
      "v1 must carry v0's edge file by reference")
    assert(v1e.size === v0e.size + 1, "the append adds exactly one file")
    val edges = TxnTable.read(spark, tEdges, Some(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // upper layers untouched: every L1/L2 endpoint is an OLD member
    edges.filter(e => e._1 == 16L || e._1 == 64L).foreach { e =>
      assert(e._2 % 8 == 0L && e._3 % 8 == 0L,
        s"upper-layer edge touches a new node: $e")
    }
    // the inserted L0 edges are backlinked: every new->old edge has
    // its old->new mirror, and new nodes appear on BOTH sides
    val l0 = edges.filter(_._1 == 4L)
    val newSrc = l0.filter(e => e._2 % 8 == 4L).map(e => (e._2, e._3)).toSet
    val newDst = l0.filter(e => e._3 % 8 == 4L).map(e => (e._3, e._2)).toSet
    assert(newSrc.nonEmpty, "no new node was inserted at this fixture")
    assert(newSrc === newDst, "backlinks must mirror the new out-edges")
    // census columns agree with the committed content
    val nv0 = rows.head.getLong(12)
    val nAdd = rows.head.getLong(13)
    assert(nAdd === 2L * newSrc.size)
    assert(edges.length.toLong === nv0 + nAdd)
  }

  test("ml_kmeans_pp_seed: brute-force farthest-first replay and monotone radius") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Seq(vecs.keys.min)
    var picks = Seq((1L, vecs.keys.min, -1L))
    for (t <- 2 to 4) {
      val (pid, dm) = vecs.keys.toSeq.sorted
        .map(v => (v, chosen.map(c => d2(vecs(v), vecs(c))).min))
        .maxBy { case (v, dm) => (dm, -v) }
      chosen :+= pid
      picks :+= ((t.toLong, pid, dm))
    }
    val out = Multimodal.mlKmeansPpSeed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === picks)
    // the coverage radius is non-increasing across rounds 2..4
    val ds = picks.drop(1).map(_._3)
    assert(ds === ds.sorted.reverse, s"radius must be monotone: $ds")
  }

  test("profile_runs_test: brute-force run-count replay at sf0.001") {
    val daily = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (Tables.nsToUs(col("ts"))).as("t"), Tables.dec4(col("value")).as("v"))
      .groupBy(col("event_type"), expr("t div 86400000000").as("day"))
      .agg((sum(col("v")) * 10000).cast("long").as("dv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Stats.profileRunsTest(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(0)
      val seq = daily.filter(_._1 == t).sortBy(_._2)
      val n = seq.length
      val med = seq.map(_._3).sorted.apply((n + 1) / 2 - 1)
      val signs = seq.map(x => if (x._3 > med) 1L else 0L)
      val runs = 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val (n1, n2) = (signs.count(_ == 1L).toLong, signs.count(_ == 0L).toLong)
      assert(r.getLong(1) === n.toLong, s"$t n_days")
      assert((r.getLong(2), r.getLong(3)) === ((n1, n2)), s"$t side counts")
      assert(r.getLong(4) === med, s"$t median")
      assert(r.getLong(5) === runs, s"$t runs")
      assert(r.getLong(6) === runs * n - n - 2L * n1 * n2, s"$t dev")
      // a run count is always within [1, n]
      assert(runs >= 1L && runs <= n.toLong)
    }
  }

  test("eval_bootstrap_multiplier: brute-force replicate replay at sf0.001") {
    val rows = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        (Tables.dec4(col("value")) * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Stats.evalBootstrapMultiplier(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(0)
      val g = rows.filter(_._1 == t)
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getLong(2) === g.map(_._3).sum / g.length)
      // replay all 64 replicates
      val means = (0 until 64).flatMap { b =>
        var (ws, vs) = (0L, 0L)
        g.foreach { case (_, id, v) =>
          val h = ((id + 1) * (b * 2 + 1)) % 1048573 * 2654435761L % 1048573
          val w = if (h < 262143L) 0L else if (h < 786430L) 1L else 2L
          ws += w; vs += w * v
        }
        if (ws > 0) Some((vs / ws, b)) else None
      }.sorted
      assert(r.getLong(3) === means.length.toLong, s"$t n_replicates")
      val lo = means((means.length * 5 + 99) / 100 - 1)._1
      val hi = means((means.length * 95 + 99) / 100 - 1)._1
      assert(r.getLong(4) === lo, s"$t boot_lo")
      assert(r.getLong(5) === hi, s"$t boot_hi")
      assert(lo <= hi)
    }
  }

  test("ml_ridge_normal_eq: BigInt Cramer replay at sf0.001 and a positive quantity slope") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        (Tables.dec2(col("l_discount")) * 100).cast("long"),
        (Tables.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = Multimodal.mlRidgeNormalEq(spark, sf0001).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val flag = r.getString(0)
      val g = rows.filter(_._1 == flag)
      assert(r.getLong(1) === g.length.toLong)
      val lam = BigInt(65536)
      def S(f: ((String, Long, Long, Long)) => BigInt) = g.map(f).sum
      val (s1, s2) = (S(t => BigInt(t._2)), S(t => BigInt(t._3)))
      val (s11, s22, s12) = (S(t => BigInt(t._2) * t._2),
        S(t => BigInt(t._3) * t._3), S(t => BigInt(t._2) * t._3))
      val (b1, b2, b3) = (S(t => BigInt(t._2) * t._4),
        S(t => BigInt(t._3) * t._4), S(t => BigInt(t._4)))
      val (a11, a12, a13, a22, a23, a33) =
        (s11 + lam, s12, s1, s22 + lam, s2, BigInt(g.length) + lam)
      val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
        a13 * (a12 * a23 - a22 * a13)
      assert(det > 0, "ridge system is positive definite")
      val det1 = b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
        a13 * (b2 * a23 - a22 * b3)
      val det2 = a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
        a13 * (a12 * b3 - b2 * a13)
      val det3 = a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13) +
        b1 * (a12 * a23 - a22 * a13)
      def fp(di: BigInt): Long =
        ((BigInt(1048576) * (di + BigInt(16777216) * det)) / det -
          BigInt("17592186044416")).toLong
      assert(r.getLong(2) === b3.toLong)
      assert(r.getLong(3) === fp(det1), s"$flag beta_qty")
      assert(r.getLong(4) === fp(det2), s"$flag beta_disc")
      assert(r.getLong(5) === fp(det3), s"$flag beta0")
      assert(r.getLong(3) > 0L, s"$flag price must grow with quantity")
    }
  }

  test("profile_ks_distance: D is a normalized max over the pooled support") {
    Stats.profileKsDistance(spark, sf0001).collect().foreach { r =>
      val (na, nb, dnum, ks) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dnum <= na * nb && dnum >= 0)
      assert(ks >= 0 && ks <= 1048576L)
      assert(ks === dnum * 1048576L / (na * nb))
    }
  }

  test("profile_chi2_independence: marginals are self-consistent") {
    val rows = Stats.profileChi2Independence(spark, sf0001).collect()
    val byPrio = rows.groupBy(_.getString(0))
    byPrio.foreach { case (p, rs) =>
      assert(rs.map(_.getLong(2)).sum === rs.head.getLong(3),
        s"$p: observed row sum != row_total")
    }
    val n = rows.map(_.getLong(2)).sum
    rows.foreach(r => assert(r.getLong(2) <= n))
    rows.foreach(r => assert(r.getLong(5) >= 0, "chi2 cell contributions are non-negative"))
  }

  test("profile_tv_drift: TV is a [0, 1e6] ppm and weeks are adjacent") {
    val rows = Stats.profileTvDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("timeseries_theil_sen: driver brute-force replay at sf0.001") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"), Tables.nsToUs(col("ts")).as("t"),
        Tables.dec4(col("value")).as("v"))
      .withColumn("day", expr("t div 86400000000"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("v")) * 10000).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val ds = rows.sortBy(_._2)
      val slopes = for {
        i <- ds.indices; j <- (i + 1) until ds.size
      } yield (((ds(j)._3 - ds(i)._3) * 1048576L) / (ds(j)._2 - ds(i)._2),
        ds(i)._2, ds(j)._2)
      val sorted = slopes.sortBy(s => (s._1, s._2, s._3))
      et -> (slopes.size.toLong, sorted((slopes.size + 1) / 2 - 1)._1)
    }
    val got = Timeseries.timeseriesTheilSen(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("ml_perceptron_step: step 1 sweeps every row; driver replay of step 2") {
    val f = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        col("n_chars").as("x1"),
        expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)").as("x2"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val (w1, t1, b1) = (f.map(r => r._1 * r._2).sum, f.map(r => r._1 * r._3).sum, f.map(_._1).sum)
    val mis = f.filter { case (y, x1, x2) => y * (w1 * x1 + t1 * x2 + b1) <= 0 }
    val rows = Multimodal.mlPerceptronStep(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) === ((f.size.toLong, w1, t1, b1)))
    assert(rows(2L) === ((mis.size.toLong,
      w1 + mis.map(r => r._1 * r._2).sum,
      t1 + mis.map(r => r._1 * r._3).sum,
      b1 + mis.map(_._1).sum)))
  }

  test("ml_pca_power_iter: max-norm lands exactly on 2^20 and iterates stay bounded") {
    val rows = Multimodal.mlPcaPowerIter(spark, sf0001).collect()
    assert(rows.length === 64)
    val v1 = rows.map(_.getLong(2))
    val v2 = rows.map(_.getLong(3))
    assert(v1.map(math.abs).max === 1048576L, "one component attains the max-norm")
    assert(v2.map(math.abs).max === 1048576L)
    assert(v1.forall(v => math.abs(v) <= 1048576L))
    rows.foreach(r => assert(r.getLong(1) > 0, "Gram diagonal is positive"))
  }

  test("text_rake_keywords: phrases are stopword-free and structurally consistent") {
    val rows = graft.operators.LlmOps.textRakeKeywords(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rank, phrase, n) = (r.getLong(1), r.getString(2), r.getLong(3))
      assert(rank >= 1 && rank <= 3)
      val toks = phrase.split(" ")
      assert(toks.length.toLong === n, s"phrase '$phrase' n_words=$n")
      assert(!toks.exists(t => t == "the" || t == "a"), s"stopword inside phrase '$phrase'")
    }
    // ranks per doc are a prefix 1..k
    rows.groupBy(_.getLong(0)).foreach { case (d, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.size.toLong).toSeq, s"doc $d ranks")
    }
  }

  test("timeseries_kalman_alpha_beta: driver brute-force replay at sf0.001") {
    val evs = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("user_id"), Tables.nsToUs(col("ts")).as("t"), col("event_id"),
        (Tables.dec4(col("value")) * 10000).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      var x = vs.head; var vel = 0L
      vs.tail.foreach { v =>
        val pred = x + vel; val res = v - pred
        x = pred + res / 4; vel = vel + res / 16
      }
      u -> ((vs.size.toLong, x, vel, x + vel))
    }
    val got = Timeseries.timeseriesKalmanAlphaBeta(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
  }

  test("simsearch_graph_greedy: greedy scores are monotone and bounded by the exact best") {
    val rows = Multimodal.simsearchGraphGreedy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s0, s1, s2, bestS, found) =
        (r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(8), r.getLong(9))
      assert(s1 >= s0 && s2 >= s1, "the current node is always a candidate")
      assert(s2 <= bestS, "routing cannot beat the exact argmax")
      if (found == 1L) assert(s2 === bestS)
    }
    // routing finds the exact best for a non-trivial share even at 2 hops
    assert(rows.count(_.getLong(9) == 1L) > 0, "zero recall at sf0.001")
    // the edge-recall receipt: one constant pair, 13 audit nodes
    // (b_id % 40, < 2000) × 4 exact edges, bucketing recovers > 0
    val (hits, tot) = (rows.head.getLong(10), rows.head.getLong(11))
    assert(rows.forall(r => r.getLong(10) == hits && r.getLong(11) == tot))
    assert(tot === 52L, "13 audit nodes x 4 exact edges at sf0.001")
    assert(hits > 0L && hits <= tot, "edge recall must be priced in (0, 1]")
  }

  test("sink_txn_history_audit: the log census is self-consistent across versions") {
    val rows = graft.operators.LakehouseCow.sinkTxnHistoryAudit(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 >= p._2, "visible rows never shrink on an append chain")
      assert(c._3 === p._3 - c._5 + c._4,
        s"v${c._1}: live files must equal prev - removed + added")
    }
    val v0 = rows.head
    assert(v0._6 === 0L && v0._3 === v0._4 && v0._5 === 0L,
      "v0 is self-contained: adds = live, removes = 0")
    rows.tail.foreach(r => assert(r._6 === 1L, "v1.. are delta commits"))
  }

  test("scan_dynamic_partition_pruning: the fact scan carries a RUNTIME prune") {
    val df = graft.operators.Relational.scanDynamicPartitionPruning(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "expected a DynamicPruningExpression on the staged fact scan:\n" + p.take(800))
    // and the aggregate-derived dim filter must NOT have leaked onto
    // the fact side statically (that would make the receipt vacuous)
    assert(!p.contains("(c % 2)") || p.toLowerCase.contains("dynamicpruning"))
  }

  test("text_vocab_growth: the curve is monotone and ends at the full census") {
    val rows = graft.operators.LlmOps.textVocabGrowth(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L))
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 >= p._2 && c._3 >= p._3 && c._4 >= p._4,
        s"curve must be monotone at cp ${c._1}")
    }
    rows.foreach(r => assert(r._4 <= r._3, "vocab cannot exceed tokens"))
    val full = Tables.documents(spark, sf0001)
      .selectExpr("explode(split(text, ' ')) AS w").where("w <> ''")
      .select("w").distinct().count()
    assert(rows.last._4 === full, "the plateau is the full vocabulary")
  }

  test("agg_rank_hypothetical: ranks satisfy the counting identities") {
    graft.operators.Aggregations.aggRankHypothetical(spark, sf0001)
      .collect().foreach { r =>
        val (n, hr, hd, pct, cume) = (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))
        assert(hr >= 1 && hr <= n + 1)
        assert(hd <= hr, "dense rank never exceeds rank")
        assert(cume >= pct, "cume_dist bounds percent_rank from above")
        assert(pct >= 0 && cume <= 1048576L)
      }
  }

  test("join_range_bucketed: driver brute-force band count at sf0.001") {
    val cents = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), (Tables.dec2(col("o_totalprice")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = cents.map { case (k, c) =>
      k -> cents.count { case (k2, c2) => k2 != k && math.abs(c2 - c) <= 1000L }.toLong
    }.toMap
    val got = graft.operators.Relational.joinRangeBucketed(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("timeseries_motif_l1: twins respect the exclusion zone and distances are exact L1") {
    val rows = Timeseries.timeseriesMotifL1(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2, dist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(d2 - d1) >= 7, "trivial-match exclusion")
      assert(dist >= 0)
    }
  }

  test("profile_cramers_v: the effect size is a [0, 2^20] ratio consistent with the chi2 screen") {
    val v = Stats.profileCramersV(spark, sf0001).collect().head
    val chi2Sum = Stats.profileChi2Independence(spark, sf0001)
      .agg(sum(col("chi2_cell_fp"))).collect().head.getLong(0)
    assert(v.getLong(3) === chi2Sum, "chi2_fp must equal the screen's cell sum")
    assert(v.getLong(4) >= 0 && v.getLong(4) <= 1048576L)
    assert(v.getLong(1) === 5L && v.getLong(2) === 5L)
  }

  test("report_association_rules: the cut is lift-ordered and fractions are consistent") {
    val rows = graft.operators.Analytics.reportAssociationRules(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val lifts = rows.map(_.getLong(8))
    assert(lifts.sameElements(lifts.sortBy(-_)), "rows must be lift-descending")
    rows.foreach { r =>
      val (np, c1, c2, conf) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7))
      assert(np <= math.min(c1, c2), "a pair cannot outnumber either member")
      assert(conf <= 1000000L)
    }
  }

  test("scd2_bitemporal_asof: knowledge is monotone and the late shard diverges at T=1") {
    val rows = Timeseries.scd2BitemporalAsof(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = rows.groupBy(_._2)
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_._1)
      sorted.sliding(2).foreach { w =>
        val (p, c) = (w.head, w.last)
        assert(c._3 >= p._3, s"user ${p._2}: knowledge must be monotone in tx time")
      }
    }
    val atT = rows.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._3).sum }
    assert(atT(1L) < atT(2L),
      "the late shard's batch-1 facts must be invisible at T=1 and visible at T=2")
    assert(atT(2L) === atT(3L), "valid<=1 knowledge is complete by T=2")
  }

  test("topk_threshold_algorithm: the receipt is monotone and stops") {
    val rows = graft.operators.Windows.topkThresholdAlgorithm(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 <= p._2, "the threshold never rises with depth")
      assert(c._3 >= p._3, "the seen set never shrinks")
      if (p._4 >= 0) assert(c._4 >= p._4, "the k-th best never worsens")
      if (p._5 == 1L) assert(c._5 === 1L, "once stopped, stays stopped")
    }
    assert(rows.last._5 === 1L, "TA must stop by depth 128 on 150 customers")
  }

  test("graph_boruvka_star: elections are the true per-node argmax (brute force)") {
    val pairs = Behavioral.graphBoruvkaStar(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.nonEmpty)
    // recompute the pair grid on the driver for the argmax check
    val inc = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bo = inc.groupBy(_._1).values.toSeq.filter(_.size <= 256)
      .flatMap(g => for { a <- g; b <- g; if a._2 < b._2 } yield (a._2, b._2))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 >= 3).toSeq
      .flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val best = bo.groupBy(_._1).map { case (u, es) =>
      u -> es.minBy(e => (-e._3, e._2))
    }
    pairs.foreach { case (u, shared, p, rep) =>
      val (_, bv, bs) = best(u)
      assert(p === bv && shared === bs, s"node $u elected ($p, $shared), expected ($bv, $bs)")
      assert(rep <= u, "the star contraction only moves toward minima")
    }
  }

  test("agg_bitmap_words: union popcount equals the exact distinct union") {
    val rows = Aggregations.aggBitmapWords(spark, sf0001).collect()
    val orSum = rows.map(_.getLong(4)).sum
    val andSum = rows.map(_.getLong(3)).sum
    val exact = Tables.orders(spark, sf0001)
      .where("o_orderstatus IN ('O', 'F')")
      .select("o_custkey").distinct().count()
    assert(orSum === exact, "bitmap OR must count exactly the union")
    val both = Tables.orders(spark, sf0001).where("o_orderstatus = 'O'")
      .select("o_custkey").distinct()
      .intersect(Tables.orders(spark, sf0001).where("o_orderstatus = 'F'")
        .select("o_custkey").distinct()).count()
    assert(andSum === both, "bitmap AND must count exactly the intersection")
  }

  test("agg_quantile_mergeable: merge-order invariance and exact-percentile bracketing") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey",
        (Tables.dec2($"o_totalprice") * 100).cast("long").as("v"))
    // per-shard sketches (odd/even orderkeys) merged by count addition
    // must answer EXACTLY like the one-shot sketch — the mergeability
    // contract a production per-shard rollup relies on
    val a = Aggregations.dyadicSketch(orders.filter($"o_orderkey" % 2 === 1))
    val b = Aggregations.dyadicSketch(orders.filter($"o_orderkey" % 2 === 0))
    val merged = a.unionAll(b).groupBy($"b").agg(sum($"c").as("c"))
    val fromMerge = Aggregations.dyadicQuantiles(spark, merged)
      .collect().map(_.toSeq).toSeq
    val oneShot = Aggregations.aggQuantileMergeable(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(fromMerge === oneShot, "shard-merged sketch must answer identically")
    // every bracket really contains the exact percentile_disc value
    val n = orders.count()
    val sortedV = orders.orderBy($"v").collect().map(_.getLong(1))
    oneShot.foreach { row =>
      val (pct, r) = (row(0).asInstanceOf[Long], row(2).asInstanceOf[Long])
      assert(r === (n * pct + 99) / 100)
      val exact = sortedV(r.toInt - 1)
      val (lo, hi) = (row(6).asInstanceOf[Long], row(7).asInstanceOf[Long])
      assert(exact >= lo && exact <= hi,
        s"pct $pct: exact $exact outside bracket [$lo, $hi]")
    }
  }

  test("agg_quantile_relerr: merge-order invariance, exact bracketing, and the 1/16 relative-error bound") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey",
        (Tables.dec2($"l_extendedprice") * 100).cast("long").as("v"))
    val a = Aggregations.logSketch(li.filter($"l_orderkey" % 2 === 1).select($"v"))
    val b = Aggregations.logSketch(li.filter($"l_orderkey" % 2 === 0).select($"v"))
    val merged = a.unionAll(b).groupBy($"b").agg(sum($"c").as("c"))
    val fromMerge = Aggregations.logQuantiles(spark, merged)
      .collect().map(_.toSeq).toSeq
    val oneShot = Aggregations.aggQuantileRelerr(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(fromMerge === oneShot, "shard-merged sketch must answer identically")
    val n = li.count()
    val sortedV = li.orderBy($"v").collect().map(_.getLong(1))
    oneShot.foreach { row =>
      val (pct, r) = (row(0).asInstanceOf[Long], row(2).asInstanceOf[Long])
      assert(r === (n * pct + 99) / 100)
      val exact = sortedV(r.toInt - 1)
      val (lo, hi) = (row(8).asInstanceOf[Long], row(9).asInstanceOf[Long])
      assert(exact >= lo && exact <= hi,
        s"pct $pct: exact $exact outside bracket [$lo, $hi]")
      // THE key's contract: bracket width is relative, (hi−lo) ≤ lo/16
      assert(hi - lo <= lo / 16,
        s"pct $pct: bracket [$lo, $hi] wider than the 2^-4 relative bound")
    }
  }

  test("agg_bitmap_containers: per-container popcounts are exact and the roaring type decision follows the 4096 threshold") {
    import org.apache.spark.sql.functions._
    val rows = Aggregations.aggBitmapContainers(spark, sf0001).collect()
    val oKeys = Tables.orders(spark, sf0001).where("o_orderstatus = 'O'")
      .select("o_orderkey").distinct()
    val fKeys = Tables.orders(spark, sf0001).where("o_orderstatus = 'F'")
      .select("o_orderkey").distinct()
    // union/intersection popcounts sum to the exact set-op cardinalities
    assert(rows.map(_.getLong(8)).sum ===
      oKeys.union(fKeys).distinct().count(), "OR must count the union")
    assert(rows.map(_.getLong(7)).sum === oKeys.intersect(fKeys).count(),
      "AND must count the intersection")
    // per-container cardinality: card_o equals the exact count of 'O'
    // keys falling in that container (the container partition is lossless)
    val perC = oKeys
      .select(expr("CAST(o_orderkey * 5 AS BIGINT) div 65536").as("c"))
      .groupBy("c").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === perC.getOrElse(r.getLong(0), 0L),
        s"container ${r.getLong(0)} card_o")
      // the adaptive representation decision is the stats, not a guess
      val want = if (r.getLong(1) == 0L) "empty"
        else if (r.getLong(1) <= 4096L) "array" else "bitmap"
      assert(r.getString(5) === want, s"container ${r.getLong(0)} type_o")
      // a container never exceeds its 2048-word / 65536-member bound
      assert(r.getLong(3) <= 2048L && r.getLong(1) <= 65536L)
    }
    // the sparse-domain point: at least 2 containers with differing types
    // would need sf0.1; at sf0.001 assert the container split is real
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("stream_exec_dropdup: the staged feed carries real duplicates and dedup recovers the census") {
    val staged = spark.read.parquet(
      graft.streaming.StreamingMirror.dupStage(spark, sf0001))
    val orig = Tables.events(spark, sf0001)
    assert(staged.count() === 2 * orig.count(),
      "the dup stage must carry every row twice — otherwise the key is vacuous")
    val got = graft.streaming.Streamy.streamExecDropdup(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = orig.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(Tables.dec4(col("value"))) * 10000).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want, "exactly-once admission must reproduce the original census")
  }

  test("graph_hits_hubs_auth: both authority iterates attain the max-norm and stay bounded") {
    val rows = graft.operators.Analytics.graphHitsHubsAuth(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val (a1, a2) = (rows.map(_.getLong(2)), rows.map(_.getLong(3)))
    assert(a1.max === 1048576L && a2.max === 1048576L,
      "max-norm renormalization lands one component exactly on 2^20")
    assert(a1.forall(v => v >= 0 && v <= 1048576L))
    assert(a2.forall(v => v >= 0 && v <= 1048576L))
  }

  test("graph_clustering_coeff: coefficient is a [0, 2^20] ratio consistent with the triangle census") {
    val lcc = Analytics.graphClusteringCoeff(spark, sf0001).collect()
    val tri = Analytics.graphTriangleCount(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lcc.foreach { r =>
      val (node, deg, t, f) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t === tri.getOrElse(node, 0L), s"node $node triangle mismatch")
      if (deg < 2) assert(f === -1L)
      else {
        assert(f === 2L * t * 1048576L / (deg * (deg - 1)))
        assert(f <= 1048576L, s"node $node lcc > 1")
      }
    }
  }
}
