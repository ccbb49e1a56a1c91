package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipelines

/** Assertions for the corpus-pipeline operators (clustering, sampling,
  * packing). The CC transitivity test uses a synthetic fixture because
  * the driver fixtures only exercise single-bucket merges. */
class PipelinesSpec extends SparkSuite {

  test("corpus_mix_rebalance: NULL-lang group gets the '(none)' sentinel and NULL-excluding l") {
    import spark.implicits._
    // 8 docs, 2 non-NULL langs; the NULL group must surface as a row
    // (as DuckDB's GROUP BY does) but be EXCLUDED from l (as
    // count(DISTINCT lang) is on the oracle side), and its label must
    // sort identically on both engines — hence the sentinel.
    val dir = Tables.scratch("mix_null_lang")
    Seq(("en", 1L), ("en", 2L), ("en", 3L), ("en", 4L),
        ("fr", 5L), ("fr", 6L), (null, 7L), (null, 8L))
      .toDF("lang", "doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipelines.corpusMixRebalance(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq("(none)", "en", "fr"))
    val m = rows.toMap
    assert(m("en") === ((4L, 1000000L, 4L)))   // n=8, l=2: 8e6/(2*4)
    assert(m("fr") === ((2L, 2000000L, 4L)))
    assert(m("(none)") === ((2L, 2000000L, 4L)))
  }

  test("dedup_cluster_cc: transitive merge across different bucket keys") {
    import spark.implicits._
    // 0–1 share a prefix bucket, 1–2 share a suffix bucket: one class.
    val dir = Tables.scratch("ccdocs")
    Seq(
      (0L, "alpha beta gamma delta xx yy zz pp qq rr ss"),
      (1L, "alpha beta gamma delta uu vv ww mm nn oo zz"),
      (2L, "q1 q2 q3 w1 w2 w3 w4 mm nn oo zz"),
      (3L, "totally unrelated text with nothing shared here at all")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cc = Pipelines.dedupClusterCc(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cc(0L) === (0L, 3L))
    assert(cc(1L) === (0L, 3L)) // joined 0 via prefix
    assert(cc(2L) === (0L, 3L)) // joined 1 via suffix → transitively 0
    assert(cc(3L) === (3L, 1L)) // isolated
  }

  test("dedup_cluster_cc: labels are self-consistent component minima (sf0.01)") {
    val cc = Pipelines.dedupClusterCc(spark, sf001).cache()
    assert(cc.count() === 500L) // every document labeled exactly once
    assert(cc.filter(col("cluster_rep") > col("doc_id")).count() === 0L)
    // the representative's own representative is itself (fixed point)
    val reps = cc.select(col("cluster_rep").as("r")).distinct()
    val bad = reps.join(cc, reps("r") === cc("doc_id"))
      .filter(col("cluster_rep") =!= col("r"))
    assert(bad.count() === 0L)
    // non-trivial clusters exist in the fixture
    assert(cc.filter(col("cluster_sz") > 1).count() > 0L)
    cc.unpersist()
  }

  test("connectedComponents propagates down a long chain, and fails loudly past the round bound") {
    import spark.implicits._
    // path graph 0-1-2-...-9: min label must travel the full diameter
    val chain = (0L until 9L).map(i => (i, i + 1))
    val edges = chain.toDF("a", "b")
      .unionAll(chain.map(_.swap).toDF("a", "b"))
    val nodes = (0L until 10L).map(i => (i, i)).toDF("id", "lbl")
    val cc = Pipelines.connectedComponents(nodes, edges)
    assert(cc.collect().map(r => r.getLong(1)).toSet === Set(0L))
    // unconverged labels must never be returned silently
    val ex = intercept[IllegalArgumentException] {
      Pipelines.connectedComponents(nodes, edges, maxRounds = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents converges on a 200-hop chain (pointer halving beats the diameter)") {
    import spark.implicits._
    // Diameter 199 > the 64-round budget: pure min-label propagation
    // would abort here. Pointer halving reaches offset 2^(k+1)-2 after
    // k rounds, so this must converge in ≲10 rounds — the adversarial-
    // diameter case the scaladoc promises.
    val n = 200L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val edges = chain.toDF("a", "b")
      .unionAll(chain.map(_.swap).toDF("a", "b"))
    val nodes = (0L until n).map(i => (i, i)).toDF("id", "lbl")
    val cc = Pipelines.connectedComponents(nodes, edges, maxRounds = 12)
    val rows = cc.collect()
    assert(rows.length === n)
    assert(rows.map(_.getLong(1)).toSet === Set(0L))
  }

  test("connectedComponents clusters the MinHash near-dup pairs (sf0.1 composition)") {
    import spark.implicits._
    import graft.operators.LlmOps
    // the production composition: verified near-dup PAIRS in, duplicate CLASSES out
    val pairs = LlmOps.dedupMinhashNear(spark, sf01)
      .select($"doc_a", $"doc_b").localCheckpoint(true)
    assert(pairs.count() > 0L)
    val edges = pairs.select($"doc_a".as("a"), $"doc_b".as("b"))
      .unionAll(pairs.select($"doc_b".as("a"), $"doc_a".as("b")))
    val nodes = Tables.documents(spark, sf01)
      .select($"doc_id".as("id"), $"doc_id".as("lbl"))
    val cc = Pipelines.connectedComponents(nodes, edges).cache()
    // both ends of every near-dup pair land in the same cluster
    val split = pairs.join(cc.as("ca"), $"doc_a" === $"ca.id")
      .join(cc.as("cb"), $"doc_b" === $"cb.id")
      .filter($"ca.cluster_rep" =!= $"cb.cluster_rep")
    assert(split.count() === 0L)
    // representatives are component minima
    assert(cc.filter($"cluster_rep" > $"id").count() === 0L)
    cc.unpersist()
  }

  test("text_decontaminate flags exactly the docs sharing an 8-gram with the benchmark split") {
    import spark.implicits._
    val dir = Tables.scratch("decondocs")
    val leaked = "alpha bravo charlie delta echo foxtrot golf hotel"
    Seq(
      (10L, s"benchmark question follows $leaked end of it"), // benchmark (10 % 10 == 0)
      (11L, s"training doc quoting $leaked verbatim in the middle"), // contaminated
      (13L, "completely unrelated training document with its own words here"),
      (20L, "another benchmark item with different content entirely okay")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipelines.textDecontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(11L)) // only the quoting doc is flagged
    assert(out(11L) === ((1L, 1L))) // one shared 8-gram, one benchmark doc
  }

  test("dedup_incremental drops exactly the incoming docs already in the corpus (sf0.1)") {
    import spark.implicits._
    val admitted = Pipelines.dedupIncremental(spark, sf01).cache()
    // only odd (incoming) doc_ids can be admitted
    assert(admitted.filter($"doc_id" % 2 === 0).count() === 0L)
    val docs = Tables.documents(spark, sf01)
      .select($"doc_id", lower(trim($"text")).as("t"))
    val incoming = docs.filter($"doc_id" % 2 === 1)
    val dupped = incoming.join(
      docs.filter($"doc_id" % 2 === 0).select($"t").distinct(), "t")
    assert(admitted.count() === incoming.count() - dupped.count())
    admitted.unpersist()
  }

  test("sample_hash_stratified: deterministic, a subset, stratum rates near thresholds") {
    val a = Pipelines.sampleHashStratified(spark, sf001)
    val b = Pipelines.sampleHashStratified(spark, sf001)
    assert(a.collect().toSeq === b.collect().toSeq) // bit-reproducible
    val ev = Tables.events(spark, sf001)
    assert(a.count() > 0 && a.count() < ev.count())
    // per-stratum empirical rate within ±50% relative of the hash threshold
    val rates = Map("view" -> 8.0 / 256, "click" -> 16.0 / 256,
      "error" -> 32.0 / 256, "signup" -> 48.0 / 256, "purchase" -> 192.0 / 256)
    val tot = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, p) <- rates; n <- tot.get(t)) {
      val emp = got.getOrElse(t, 0L).toDouble / n
      assert(math.abs(emp - p) < 0.5 * p + 0.02, s"stratum $t: emp=$emp expected≈$p")
    }
  }

  test("pack_sequences matches a sequential reference packing") {
    import spark.implicits._
    val out = Pipelines.packSequences(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // reference: plain Scala fold over the same doc stream
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang",
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("n"))
      .collect().map(r => (r.getString(1), r.getLong(0) % 4, r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._1, t._2, t._3))
    val assigned = docs.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((lang, shard), ds) =>
      var cum = 0L
      ds.toSeq.map { case (_, _, id, n) =>
        val pack = cum / 512; cum += n; (lang, shard, pack, id, n)
      }
    }
    val ref = assigned.groupBy(t => (t._1, t._2, t._3)).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._5).sum, vs.map(_._4).min, vs.map(_._4).max))
    }
    assert(out === ref)
  }

  test("compact_incremental_agg: maintained rollup equals the one-shot aggregate") {
    import spark.implicits._
    import graft.operators.Pipelines
    val maintained = Pipelines.compactIncrementalAgg(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val oneShot = Tables.events(spark, sf0001)
      .select($"event_type", Tables.nsToUs($"ts").as("t"), Tables.dec4($"value").as("v"))
      .select($"event_type", expr("t div 86400000000").as("day"), $"v")
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"v").cast("double").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(maintained === oneShot)
  }

  test("quality_corpus_report: totals reconcile with the document table") {
    import graft.operators.Pipelines
    val report = Pipelines.qualityCorpusReport(spark, sf0001).collect()
    assert(report.nonEmpty)
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(report.map(_.getLong(1)).sum === nDocs)
    report.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1)
      assert(r.getLong(3) <= r.getLong(1), "prefix diversity exceeds doc count")
      assert(r.getLong(5) === r.getLong(4) / r.getLong(1), "mean_chars != floor(total/n)")
      assert(r.getLong(6) <= r.getLong(1))
    }
  }

  test("graph_bfs_reach: hop distances on an injected chain; the 3-hop budget caps the frontier") {
    import spark.implicits._
    // a 6-doc path 0–1–2–3–4–5: consecutive docs alternate sharing a
    // prefix bucket (same first-4 tokens) and a suffix bucket (same
    // last-4) — the driver fixture never exercises hops > 1, this does
    val dir = Tables.scratch("bfsdocs")
    Seq(
      (0L, "a b c d END0 x0 y0 z0 w0"),
      (1L, "a b c d MID1 s1a s1b s1c s1d"),
      (2L, "e f g h MID2 s1a s1b s1c s1d"),
      (3L, "e f g h MID3 t3a t3b t3c t3d"),
      (4L, "i j k l MID4 t3a t3b t3c t3d"),
      (5L, "i j k l MID5 u5a u5b u5c u5d")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // seed set = doc_id % 10 = 0 → exactly doc 0
    val m = Pipelines.graphBfsReach(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      "expected exact hop distances 0..3 and docs 4, 5 beyond the budget")
  }

  test("sample_systematic_weighted: selected docs cover their grid points exactly once (sf0.001)") {
    val sel = Pipelines.sampleSystematicWeighted(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001)
      .agg(sum(expr("size(filter(split(text, ' '), w -> w <> ''))"))
        .cast("long")).head().getLong(0)
    val stride = total / 50
    sel.foreach { r =>
      val (nTok, cumBefore, pick) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cumBefore <= pick * stride && pick * stride < cumBefore + nTok,
        s"doc ${r.getLong(0)}: grid point ${pick * stride} outside its interval")
    }
    val picks = sel.map(_.getLong(3))
    assert(picks.head === 0L, "first grid point (offset 0) must be covered")
    assert(picks.toSeq === picks.sorted.toSeq && picks.distinct.length === picks.length,
      "pick_idx must strictly increase with doc order")
    // partition law: the doc intervals tile [0, total), so the covered
    // grid-point count across selected docs is every point below total
    val covered = sel.map { r =>
      val (nTok, cb) = (r.getLong(1), r.getLong(2))
      (cb + nTok + stride - 1) / stride - (cb + stride - 1) / stride
    }.sum
    assert(covered === (total + stride - 1) / stride)
  }

  test("sample_stratified_neyman: budget spent exactly; weights match the sufficient statistics (sf0.001)") {
    val got = Pipelines.sampleStratifiedNeyman(spark, sf0001).collect()
    assert(got.map(_.getLong(3)).sum === 100L, "Σalloc == budget exactly")
    assert(got.forall(_.getLong(3) >= 0L))
    // w_h recomputed from the raw corpus: ⌊sqrt(N·Σx² − (Σx)²)⌋
    val stats = Tables.documents(spark, sf0001)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    got.foreach { r =>
      val xs = stats(r.getString(0)).map(_._2)
      val arg = xs.length.toLong * xs.map(x => x * x).sum - {
        val s = xs.sum; s * s
      }
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === math.floor(math.sqrt(arg.toDouble)).toLong,
        s"w_h mismatch for ${r.getString(0)}")
    }
    // Hamilton: every allocation within 1 of its exact share
    val totW = got.map(_.getLong(2)).sum.toDouble
    got.foreach { r =>
      val exact = 100.0 * r.getLong(2) / totW
      assert(math.abs(r.getLong(3) - exact) < 1.0,
        s"alloc for ${r.getString(0)} not within one seat of quota")
    }
  }

  test("corpus_shard_manifest: dense positions, telescoping offsets, full partition (sf0.001)") {
    val m = Pipelines.corpusShardManifest(spark, sf0001).collect()
    assert(m.map(_.getLong(2)).distinct.length === m.length,
      "every doc appears exactly once")
    assert(m.length === Tables.documents(spark, sf0001).count())
    m.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 16, s"shard $shard out of range")
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
      var off = 0L
      sorted.foreach { r =>
        assert(r.getLong(5) === off,
          s"shard $shard pos ${r.getLong(1)}: offset ${r.getLong(5)} != $off")
        off += r.getLong(4)
      }
    }
  }

  test("corpus_epoch_shuffle: each epoch is a full permutation, epochs genuinely reshuffle, shards balanced (sf0.001)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = operators.Pipelines.corpusEpochShuffle(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    // every doc appears exactly once per epoch; positions are dense 1..n
    Seq(0L, 1L).foreach { e =>
      val ep = out.filter($"epoch" === e)
      assert(ep.count() === nDocs)
      val byShard = ep.groupBy($"shard").agg(
        count(lit(1)).as("n"), max($"pos").as("mx")).collect()
      byShard.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"epoch $e shard ${r.getLong(0)}: positions not dense"))
      // balance: no shard over 3x the fair share (a hash-quality law)
      val fair = nDocs.toDouble / 8
      byShard.foreach(r => assert(r.getLong(1) <= 3 * fair + 1,
        s"epoch $e shard ${r.getLong(0)} holds ${r.getLong(1)} of $nDocs"))
    }
    // the epochs are DIFFERENT permutations: some doc changes shard or
    // within-shard position (the reshuffle-between-epochs guarantee)
    val e0 = out.filter($"epoch" === 0L).select($"doc_id", $"shard", $"pos")
    val e1 = out.filter($"epoch" === 1L).select($"doc_id", $"shard", $"pos")
    assert(e0.exceptAll(e1).count() > 0, "epoch 1 repeated epoch 0's order")
    out.unpersist()
  }

  test("corpus_temperature_mix: Σalloc == budget exactly; α=0.5 lifts every below-mean language") {
    val rows = operators.Pipelines.corpusTemperatureMix(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("alloc_temp")).sum === 1000000L,
      "largest-remainder apportionment must hit the budget exactly")
    // by Cauchy–Schwarz the sqrt-weight crossover sits at or above the
    // mean size, so a language strictly below the mean must be lifted
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val L = rows.length
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val nat = r.getAs[Long]("natural_ppm")
      val al = r.getAs[Long]("alloc_temp")
      if (n * L < nTotal)
        assert(al >= nat,
          s"${r.getString(0)} (n=$n, below mean): temp $al < natural $nat")
    }
  }
}
