package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmOps, Multimodal}

/** LLM-pipeline operator assertions. Near-dup signal only exists at
  * sf0.1 (8 exact-duplicate texts, 233 shared 5-token prefixes —
  * FIXTURES.md), so dedup suites run there. */
class LlmOpsSpec extends SparkSuite {

  test("dedup_exact: sf0.1 documents collapse to 4992 survivors") {
    val d = LlmOps.dedupExact(spark, sf01)
    assert(d.count() === 4992L)
    assert(d.filter(col("n_dups") > 1).count() === 8L)
  }

  test("dedup_exact is idempotent") {
    val once = LlmOps.dedupExact(spark, sf0001)
    assert(once.count() === Tables.documents(spark, sf0001).count()) // no dups at sf0.001
  }

  test("dedup_minhash_near finds all exact duplicates (jaccard = 1)") {
    val near = LlmOps.dedupMinhashNear(spark, sf01).cache()
    val exactPairs = Tables.documents(spark, sf01)
      .groupBy(lower(trim(col("text"))).as("t"))
      .agg(min("doc_id").as("doc_a"), max("doc_id").as("doc_b"), count(lit(1)).as("c"))
      .filter(col("c") === 2)
      .select("doc_a", "doc_b")
    // every exact-duplicate pair must be reported with jaccard == 1.0
    val missed = exactPairs.join(near.filter(col("jaccard") === 1.0),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0L)
    // and all reported pairs clear the 0.5 threshold
    assert(near.filter(col("jaccard") < 0.5).count() === 0L)
  }

  test("dedup_simhash finds all exact duplicates with hamming 0") {
    val sim = LlmOps.dedupSimhash(spark, sf01).cache()
    val exactPairs = Tables.documents(spark, sf01)
      .groupBy(lower(trim(col("text"))).as("t"))
      .agg(min("doc_id").as("doc_a"), max("doc_id").as("doc_b"), count(lit(1)).as("c"))
      .filter(col("c") === 2)
      .select("doc_a", "doc_b")
    val missed = exactPairs.join(sim.filter(col("hamming") === 0),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0L)
    assert(sim.filter(col("hamming") > 3).count() === 0L)
  }

  test("text_fingerprint: one stable fingerprint per document, dups collide") {
    val fp = LlmOps.textFingerprint(spark, sf01).cache()
    assert(fp.count() === 5000L)
    // the 8 exact-duplicate text pairs must produce equal fingerprints
    val dupFp = Tables.documents(spark, sf01)
      .groupBy(lower(trim(col("text"))).as("t")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val collisions = Tables.documents(spark, sf01)
      .join(fp, "doc_id")
      .groupBy("text").agg(countDistinct("fingerprint").as("nfp"))
      .filter(col("nfp") > 1)
    assert(collisions.count() === 0L)
    assert(dupFp.count() === 8L)
  }

  test("text_langid predicts a language for every document") {
    val l = LlmOps.textLangid(spark, sf0001).cache()
    assert(l.count() === Tables.documents(spark, sf0001).count())
    assert(l.filter(!col("pred_lang").isin("de", "en", "es", "fr", "zh")).count() === 0L)
  }

  test("dedup_embedding_cosine: NN pairs are symmetric-consistent and above threshold") {
    val nn = LlmOps.dedupEmbeddingCosine(spark, sf0001).cache()
    assert(nn.filter(col("cos") < 0.4).count() === 0L)
    assert(nn.filter(col("vec_id") === col("nn_id")).count() === 0L)
  }

  test("simsearch_cosine_topk: 10 neighbours per query, no self, scores in [-1,1]") {
    val t = LlmOps.simsearchCosineTopk(spark, sf0001).cache()
    assert(t.count() === 50L) // 5 queries × 10
    assert(t.filter(col("vec_id") === col("q_id")).count() === 0L)
    assert(t.filter(col("score") > 1.000001 || col("score") < -1.000001).count() === 0L)
    // scores non-increasing within each query
    val bad = t.as("a").join(t.as("b"),
      col("a.q_id") === col("b.q_id") && (col("a.rn") + 1) === col("b.rn")
        && col("a.score") < col("b.score"))
    assert(bad.count() === 0L)
  }

  test("simsearch_ann_ivf: candidate pruning works, recall > random floor") {
    val exact = LlmOps.simsearchCosineTopk(spark, sf0001).select("q_id", "vec_id")
    val approx = Multimodal.simsearchAnnIvf(spark, sf0001).cache()
    assert(approx.groupBy("q_id").count().filter(col("count") > 10).count() === 0L)
    val hit = exact.intersect(approx.select("q_id", "vec_id")).count().toDouble
    val total = exact.count().toDouble
    // These embeddings are random unit vectors, so label cells carry no
    // cluster structure: expected recall ≈ nprobe/ncells = 0.2 — the
    // test asserts the pruning machinery scans its probed share, not
    // cell quality (real clustered data ⇒ high recall, same code).
    assert(hit / total >= 0.1, s"recall ${hit / total}")
  }

  test("simsearch_lsh_bucket: ≤10 candidates per query, recall above random floor") {
    val exact = LlmOps.simsearchCosineTopk(spark, sf0001).select("q_id", "vec_id")
    val lsh = Multimodal.simsearchLshBucket(spark, sf0001).cache()
    assert(lsh.groupBy("q_id").count().filter(col("count") > 10).count() === 0L)
    val hit = exact.intersect(lsh.select("q_id", "vec_id")).count().toDouble
    // random unit vectors: sign-LSH buckets retain near neighbours far
    // above the 3·2^-4-band random floor; assert comfortably above it
    assert(hit / exact.count() >= 0.2, s"recall ${hit / exact.count()}")
  }

  test("simsearch_lsh_replayable: ≤10 per query, recall above the random floor") {
    val exact = LlmOps.simsearchCosineTopk(spark, sf0001).select("q_id", "vec_id")
    val lsh = Multimodal.simsearchLshReplayable(spark, sf0001).cache()
    assert(lsh.groupBy("q_id").count().filter(col("count") > 10).count() === 0L)
    assert(lsh.filter(col("vec_id") === col("q_id")).count() === 0L)
    val hit = exact.intersect(lsh.select("q_id", "vec_id")).count().toDouble
    // integer planes are as sign-balanced as the Gaussian family here:
    // same comfortably-above-the-3·2^-4-floor bound as the native key
    assert(hit / exact.count() >= 0.2, s"recall ${hit / exact.count()}")
  }

  test("simsearch_ivf_pq: candidates monotone in nprobe; full probe equals the flat PQ path") {
    import spark.implicits._
    val r = Multimodal.simsearchIvfPq(spark, sf0001).cache()
    assert(r.count() === 20L) // 5 queries × 4 operating points
    // candidate count is monotone in nprobe per query (cell supersets);
    // at nprobe = |cells| = 10 every non-query vector is scored
    r.collect().groupBy(_.getLong(1)).foreach { case (q, rows) =>
      val cands = rows.sortBy(_.getLong(0)).map(_.getLong(2))
      assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
        s"q=$q candidate counts must be monotone in nprobe")
      assert(cands.last === 499L, s"q=$q full probe must score corpus − 1")
    }
    assert(r.filter(col("recall_fp") < 0 || col("recall_fp") > 1048576L)
      .count() === 0L)
    // endpoint law: the composed path at full probe IS the flat PQ scan —
    // identical candidates, ADC scores, and ground truth ⇒ identical hits
    val pq = Multimodal.embeddingPqQuantize(spark, sf0001)
      .select($"q_id", $"hits".as("pq_hits"))
    val full = r.filter($"nprobe" === 10L).select($"q_id", $"hits")
    assert(full.join(pq, "q_id").filter($"hits" =!= $"pq_hits").count() === 0L,
      "nprobe = |cells| must reproduce the flat PQ recall exactly")
  }

  test("simsearch_label_centroid: 10 labels × 64 dims") {
    val c = LlmOps.simsearchLabelCentroid(spark, sf0001)
    assert(c.count() === 640L)
    assert(c.filter(abs(col("centroid")) > 1.0).count() === 0L)
  }

  test("text_quality_filter output within bounds") {
    val q = LlmOps.textQualityFilter(spark, sf0001)
    assert(q.filter(col("n_chars") < 100 || col("n_chars") > 400).count() === 0L)
    assert(q.count() > 0L)
  }

  test("multimodal_binary_meta: byte length equals n_chars (ascii corpus)") {
    val m = Multimodal.multimodalBinaryMeta(spark, sf0001)
      .join(Tables.documents(spark, sf0001), "doc_id")
    assert(m.filter(col("n_bytes") =!= col("n_chars")).count() === 0L)
  }

  test("multimodal_decode_stub: 16 scalar bin counts summing to n_bytes") {
    val f = Multimodal.multimodalDecodeStub(spark, sf0001).cache()
    // graded-output rule: scalar columns only (no array/map/struct)
    assert(f.schema.fields.forall(_.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }))
    val binSum = (0 until 16).map(b => col(f"b$b%02d")).reduce(_ + _)
    assert(f.filter(binSum =!= col("n_bytes")).count() === 0L)
  }

  test("text_inverted_index: postings are self-consistent and cover every token") {
    val idx = operators.Indexing.textInvertedIndex(spark, sf0001).cache()
    // df == number of doc entries serialized into the postings string
    assert(idx.filter(col("df") =!= size(split(col("postings"), "\\|"))).count() === 0L)
    // n_occurrences == total positions listed across the postings
    val nPos = aggregate(
      transform(split(col("postings"), "\\|"),
        e => size(split(element_at(split(e, ":"), 2), ","))),
      lit(0), (acc, x) => acc + x).cast("long")
    assert(idx.filter(col("n_occurrences") =!= nPos).count() === 0L)
    // the index covers the corpus: Σ n_occurrences == non-empty token count
    val totalIdx = idx.agg(sum("n_occurrences")).head.getLong(0)
    val totalToks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    assert(totalIdx === totalToks)
  }

  test("text_bpe_merge_step: merge strictly shrinks pair mass, bounded by the elected count") {
    val step = operators.Indexing.textBpeMergeStep(spark, sf0001).cache()
    assert(step.count() === 20L)
    val r = step.filter(col("rk") === 1).head
    val (cnt, before, after) = (r.getAs[Long]("cnt"),
      r.getAs[Long]("pairs_before"), r.getAs[Long]("pairs_after"))
    assert(after < before, s"merge must reduce pair mass: $before -> $after")
    // each replacement removes exactly one adjacency; overlapping
    // occurrences can't all be replaced, so the reduction is bounded by
    // the elected pair's count (and is at least half of it)
    assert(before - after <= cnt)
    assert((before - after) * 2 >= cnt)
    // ranks are the contiguous top-20 by (cnt desc, a, b)
    assert(step.agg(max("rk")).head.getLong(0) === 20L)
  }

  test("text_bpe_merge_loop: pair mass strictly decreases, iteration 1 matches the single step") {
    import graft.operators.Indexing
    val loop = Indexing.textBpeMergeLoop(spark, sf0001).collect()
    assert(loop.length === Indexing.BpeIterations)
    // monotone training progress: every merge strictly shrinks the
    // corpus adjacent-pair mass (the law a BPE trainer relies on to
    // terminate) and elections always carry positive support
    val after = loop.map(_.getAs[Long]("pairs_after"))
    assert(after.zip(after.drop(1)).forall { case (x, y) => y < x },
      s"pairs_after must strictly decrease: ${after.mkString(",")}")
    assert(loop.map(_.getAs[Long]("cnt")).forall(_ > 0L))
    // election counts are non-increasing is NOT a law (a merge can
    // create a new pair more frequent than the next-best old one), but
    // iteration 1 must elect exactly what the single-step key elects —
    // same corpus, same (count desc, pair asc) total order
    val step1 = Indexing.textBpeMergeStep(spark, sf0001)
      .filter(col("rk") === 1).head
    assert(loop.head.getAs[String]("a") === step1.getAs[String]("a"))
    assert(loop.head.getAs[String]("b") === step1.getAs[String]("b"))
    assert(loop.head.getAs[Long]("cnt") === step1.getAs[Long]("cnt"))
  }

  test("corpus_dedup_pipeline: census telescopes and stages agree with their standalone keys") {
    // sf0.1: the only SF with exact-dup (8) and shared-prefix signal
    val census = LlmOps.corpusDedupPipeline(spark, sf01).collect()
    assert(census.length === 3)
    // telescoping: stage i's n_out IS stage i+1's n_in, removals add up
    census.foreach(r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_removed") === r.getAs[Long]("n_out")))
    census.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("n_out") === y.getAs[Long]("n_in"))
    }
    val byStage = census.map(r => r.getAs[String]("stage_name") -> r).toMap
    // stage 1 reproduces the standalone quality filter's census
    assert(byStage("quality_filter").getAs[Long]("n_out") ===
      LlmOps.textQualityFilter(spark, sf01).count())
    assert(byStage("quality_filter").getAs[Long]("n_in") ===
      Tables.documents(spark, sf01).count())
    // the cascade really removes something at each dedup tier at sf0.1
    assert(byStage("exact_dedup").getAs[Long]("n_removed") > 0L)
    assert(byStage("prefix_containment").getAs[Long]("n_removed") > 0L)
  }

  test("corpus_dedup_costs: censuses telescope, confirmed ≤ candidates, chars accounting reconciles (sf0.1)") {
    val rows = LlmOps.corpusDedupCosts(spark, sf01).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_removed")
        === r.getAs[Long]("n_out"))
      assert(r.getAs[Long]("n_confirmed") <= r.getAs[Long]("n_candidates")
        || r.getAs[Long]("n_candidates") == 0L)
      assert(r.getAs[Long]("chars_read") >= 0L)
    }
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("n_out") === y.getAs[Long]("n_in"),
        s"${x.getAs[String]("stage_name")} does not telescope")
    }
    val byStage = rows.map(r => r.getAs[String]("stage_name") -> r).toMap
    // the full-scan tiers read the whole frame they gate; the verify
    // tiers read ONLY candidate-pair text — the funnel's point
    assert(byStage("quality_filter").getAs[Long]("chars_read") ===
      Tables.documents(spark, sf01)
        .agg(org.apache.spark.sql.functions.sum("n_chars"))
        .head().getLong(0))
    assert(byStage("minhash_near_dup").getAs[Long]("chars_read") <
      byStage("quality_filter").getAs[Long]("chars_read"),
      "near-dup verify reads less than a corpus scan (blocking works)")
    // stage 1/2 agree with the graded pipeline's censuses
    val pipe = LlmOps.corpusDedupPipeline(spark, sf01).collect()
      .map(r => r.getAs[String]("stage_name") -> r).toMap
    assert(byStage("quality_filter").getAs[Long]("n_out") ===
      pipe("quality_filter").getAs[Long]("n_out"))
    assert(byStage("exact_dedup").getAs[Long]("n_out") ===
      pipe("exact_dedup").getAs[Long]("n_out"))
    // exact tier: every hash-collapse is a confirmed duplicate
    assert(byStage("exact_dedup").getAs[Long]("n_confirmed") ===
      byStage("exact_dedup").getAs[Long]("n_removed"))
  }

  test("text_bpe_tokenize: pieces reconcile with words and with the trainer's final pair mass") {
    import graft.operators.Indexing
    val tok = Indexing.textBpeTokenize(spark, sf0001).collect()
    // pieces concatenate back to the exact word (tokenization is a
    // partition of the word, never a rewrite)
    assert(tok.forall(r =>
      r.getAs[String]("tokens").replace(" ", "") === r.getAs[String]("word")))
    assert(tok.forall(_.getAs[Long]("n_pieces") >= 1L))
    // token-mass conservation: Σ (n_pieces - 1) · freq over the applied
    // vocabulary IS the trainer's final pairs_after — apply and train
    // must describe the same tokenizer
    val mass = tok.map(r => (r.getAs[Long]("n_pieces") - 1) * r.getAs[Long]("freq")).sum
    val lastAfter = Indexing.textBpeMergeLoop(spark, sf0001).collect()
      .maxBy(_.getAs[Long]("iter")).getAs[Long]("pairs_after")
    assert(mass === lastAfter, s"apply mass $mass != trainer pairs_after $lastAfter")
  }

  test("text_index_delta_merge: merged standing+delta equals the from-scratch rebuild") {
    import graft.operators.Indexing
    val merged = Indexing.textIndexDeltaMerge(spark, sf0001).collect()
    val rebuilt = Indexing.textInvertedIndex(spark, sf0001).collect()
    assert(merged.map(_.toString).toSeq === rebuilt.map(_.toString).toSeq)
    // the carve is non-trivial: the materialized standing index is a
    // strict subset of the merged one (delta really contributed)
    val standing = spark.read.parquet(Tables.scratch("index_standing"))
    val standingOcc = standing.agg(sum("n_occurrences")).head.getLong(0)
    val mergedOcc = merged.map(_.getAs[Long]("n_occurrences")).sum
    assert(standingOcc > 0L && standingOcc < mergedOcc,
      s"carve must split the corpus: standing $standingOcc vs merged $mergedOcc")
  }

  test("eval_ann_recall: monotone in nprobe, exact at full probe, hits bounded by k") {
    val r = Multimodal.evalAnnRecall(spark, sf0001).collect()
    assert(r.length === Multimodal.AnnRecallProbes.length * 5)
    // endpoint self-validation: probing every cell IS the exact search
    assert(r.filter(_.getLong(0) == 10L).forall(_.getLong(4) === 1048576L))
    assert(r.forall(_.getLong(3) <= 10L))
    r.groupBy(_.getLong(1)).values.foreach { rows =>
      val byProbe = rows.sortBy(_.getLong(0))
      // recall monotone non-decreasing: a candidate superset can only
      // promote global top-10 members (anything outranking one in the
      // superset also outranked it globally)
      val hits = byProbe.map(_.getLong(3))
      assert(hits.zip(hits.drop(1)).forall { case (a, b) => a <= b },
        s"recall must be monotone in nprobe: ${hits.mkString(",")}")
      // candidate counts strictly grow with probed cells
      val nc = byProbe.map(_.getLong(2))
      assert(nc.zip(nc.drop(1)).forall { case (a, b) => a < b })
    }
  }

  test("quality_langid_confusion: cells reconcile with the classifier and the corpus (sf0.001)") {
    import spark.implicits._
    val cells = LlmOps.qualityLangidConfusion(spark, sf0001).collect()
    // total mass = one prediction per document
    assert(cells.map(_.getLong(2)).sum ===
      Tables.documents(spark, sf0001).count())
    // row totals really are row sums, and shares are exact fixed point
    cells.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      rows.foreach { r =>
        assert(r.getLong(3) === tot)
        assert(r.getLong(4) === r.getLong(2) * 1048576L / tot)
      }
    }
    // cells match a direct recompute from the graded classifier output
    val expected = LlmOps.textLangid(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"pred_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap === expected)
  }

  test("ml_naive_bayes_counts: masses reconcile; Laplace probabilities behave (sf0.001)") {
    import spark.implicits._
    val rows = LlmOps.mlNaiveBayesCounts(spark, sf0001).collect()
    val totalTokens = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
      .count()
    assert(rows.map(_.getLong(2)).sum === totalTokens)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val tot = rs.map(_.getLong(2)).sum
      assert(rs.forall(_.getLong(3) === tot), s"lang_total wrong for $lang")
    }
    // smoothed probability strictly inside (0, 1) in fixed point
    assert(rows.forall(r => r.getLong(4) > 0L && r.getLong(4) < 1048576L))
  }

  test("text_ngram_coverage: full and zero coverage on an injected carve") {
    import spark.implicits._
    val dir = Tables.scratch("covdocs")
    val body = (0 until 12).map(i => s"w$i").mkString(" ")
    // doc 7 (eval) duplicates train doc 0 → every gram covered;
    // doc 17 (eval) is disjoint vocabulary → zero coverage;
    // doc 3 (train) is filler
    Seq((0L, body), (3L, "filler text only here"),
        (7L, body), (17L, (0 until 10).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmOps.textNgramCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === Set(7L, 17L))
    assert(got(7L) === ((9L, 9L, 1000000L)), s"dup doc must be fully covered: $got")
    assert(got(17L) === ((7L, 0L, 0L)), s"disjoint doc must be uncovered: $got")
  }

  test("dedup_substring_runs: exact span boundaries on an injected duplicate") {
    import spark.implicits._
    val dir = Tables.scratch("ssrdocs")
    val span = (0 until 10).map(i => s"s$i").mkString(" ")
    // doc 0 carries the 10-token span at 1-based token 5, doc 1 the
    // SAME span at token 3; all other tokens are globally unique, so
    // the only shared 4-grams are the 7 interior to the span — one
    // maximal run per doc, exact boundaries, owner = doc 0
    Seq(
      (0L, "u0 u1 u2 u3 " + span + " v0 v1 v2"),
      (1L, "w0 w1 " + span + " x0 x1 x2"),
      (2L, (0 until 16).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmOps.dedupSubstringRuns(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 5L, 7L, 10L, 0L),
      (1L, 3L, 7L, 10L, 0L)),
      s"span boundaries must be exact and maximal: ${got.toSeq}")
    // excision law on the same fixture: the first-seen doc keeps its
    // copy, doc 1 loses exactly the 10 span tokens, doc 2 untouched
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("w0 w1 x0 x1 x2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rem = LlmOps.dedupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(rem(0L)._1 === 17L && rem(0L)._2 === 0L, s"owner keeps: $rem")
    assert(rem(1L) === ((15L, 10L, 5L, sha)),
      s"doc 1 must lose exactly the span: ${rem(1L)}")
    assert(rem(2L)._2 === 0L && rem(2L)._3 === 16L)
  }

  test("embedding_pq_quantize: recall ladder monotone in codebook bits; exact at full codebook") {
    val ladder = Seq(2, 4, 16, 1 << 20).map { k =>
      k -> operators.Multimodal.pqRecall(spark, sf0001, k).collect()
        .map(_.getAs[Long]("recall_fp")).toSeq
    }
    val avgs = ladder.map { case (k, rs) => k -> rs.sum / rs.length }
    // k = corpus: every subvector is a seed, zero-distance assignment
    // reconstructs it exactly, ADC ≡ exact dot → recall ≡ 2²⁰ (the
    // provable endpoint — self-validates the harness)
    assert(ladder.last._2.nonEmpty && ladder.last._2.forall(_ === 1048576L),
      s"full-codebook recall must be exact: $avgs")
    // more codebook bits never hurt on the fixture ladder (averaged
    // over queries — per-query monotonicity is not a theorem for
    // independently trained codebooks)
    avgs.sliding(2).foreach { case Seq((k1, a1), (k2, a2)) =>
      assert(a1 <= a2, s"avg recall fell from k=$k1 ($a1) to k=$k2 ($a2): $avgs")
    }
  }

  test("ml_class_balance_weights: inverse-frequency recompute (sf0.001)") {
    val counts = Tables.embeddings(spark, sf0001)
      .select("label").collect().map(_.getInt(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    val k = counts.size.toLong
    val got = operators.Multimodal.mlClassBalanceWeights(spark, sf0001)
      .collect()
    assert(got.length === counts.size)
    got.foreach { r =>
      val c = counts(r.getLong(0).toInt)
      assert(r.getLong(1) === c)
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === n * 1048576L / (k * c))
    }
  }

  test("quality_boilerplate_fraction: shared template chunks detected (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("boilerdocs")
    val template = (0 until 8).map(i => s"tpl$i").mkString(" ")
    // docs 0–4 open with the same 8-token template (df 5 > 3) and end
    // with unique bodies; doc 9 shares nothing
    val docs = (0L to 4L).map(d =>
      (d, template + " " + (0 until 8).map(i => s"b${d}_$i").mkString(" "))) :+
      (9L, (0 until 16).map(i => s"z$i").mkString(" "))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmOps.qualityBoilerplateFraction(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    (0L to 4L).foreach { d =>
      assert(got(d) === ((2L, 1L, 500000L)),
        s"doc $d: template chunk must be flagged: ${got(d)}")
    }
    assert(got(9L) === ((2L, 0L, 0L)), "disjoint doc carries no boilerplate")
    // corpus-wide sanity
    val corpus = LlmOps.qualityBoilerplateFraction(spark, sf0001)
    assert(corpus.count() === Tables.documents(spark, sf0001).count())
    assert(corpus.filter($"n_boiler" > $"n_chunks").count() === 0L)
  }

  test("ml_knn_confusion: cells reconcile with the knn classifier output (sf0.001)") {
    val preds = operators.Multimodal.mlKnnClassify(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val expected = preds.groupBy(identity).view.mapValues(_.length.toLong)
    val got = operators.Multimodal.mlKnnConfusion(spark, sf0001).collect()
    assert(got.map(_.getLong(2)).sum === preds.length.toLong)
    got.foreach { r =>
      assert(r.getLong(2) === expected((r.getLong(0), r.getLong(1))))
      val rowTot = preds.count(_._1 == r.getLong(0)).toLong
      assert(r.getLong(3) === rowTot)
      assert(r.getLong(4) === r.getLong(2) * 1048576L / rowTot)
    }
  }

  test("text_doc_features: features reconcile with the raw documents (sf0.001)") {
    val feats = LlmOps.textDocFeatures(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(feats.length === docs.size)
    feats.foreach { f =>
      val (text, nc) = docs(f.getLong(0))
      val toks = text.split(" ").filter(_.nonEmpty)
      assert(f.getLong(1) === nc)
      assert(f.getLong(2) === toks.length.toLong)
      assert(f.getLong(3) === toks.distinct.length.toLong)
      assert(f.getLong(4) === toks.distinct.length.toLong * 1048576L / toks.length)
      assert(f.getLong(5) === toks.map(_.length.toLong).sum * 1048576L / toks.length)
      assert(f.getLong(6) === toks.map(_.length).max.toLong)
    }
  }

  test("eval_kfold_census: folds cover, masses reconcile, assignment is the LCG (sf0.001)") {
    import spark.implicits._
    val got = LlmOps.evalKfoldCensus(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.map(_.getLong(2)).sum === Tables.documents(spark, sf0001).count())
    // fold of one known doc recomputed from the LCG
    val expected = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").collect()
      .map(r => ((r.getLong(0) * 2654435761L) % 2147483648L % 5, r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
    got.foreach { r =>
      assert(r.getLong(2) === expected((r.getLong(0), r.getString(1))),
        s"census mismatch at fold ${r.getLong(0)} lang ${r.getString(1)}")
    }
  }

  test("multimodal_align_chunks: pairs reconcile with both parent modality keys (sf0.001)") {
    import spark.implicits._
    val chunks = LlmOps.textChunkOverlap(spark, sf0001)
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = operators.Multimodal.multimodalFrameSample(spark, sf0001)
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aligned = operators.Multimodal.multimodalAlignChunks(spark, sf0001)
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aligned.nonEmpty)
    (chunks.keySet ++ frames.keySet).foreach { d =>
      val expect = math.min(chunks.getOrElse(d, 0L), frames.getOrElse(d, 0L))
      assert(aligned.getOrElse(d, 0L) === expect,
        s"doc $d: aligned ${aligned.getOrElse(d, 0L)} != min(chunks, frames) $expect")
    }
  }

  test("ml_triplet_mining: anchor/positive/negative label discipline and LCG determinism (sf0.001)") {
    val labels = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = operators.Multimodal.mlTripletMining(spark, sf0001).collect()
    assert(got.length === labels.size, "one triplet per anchor")
    // expected elections recomputed in plain Scala from the same LCG
    def h(id: Long) = (id * 2654435761L) % 2147483648L
    val byLabel = labels.toSeq.groupBy(_._2).view
      .mapValues(_.map(_._1).sortBy(id => (h(id), id))).toMap
    val labelMins = byLabel.map { case (l, ids) => (l, ids.head) }.toSeq
      .sortBy { case (_, id) => (h(id), id) }
    got.foreach { r =>
      val (a, l) = (r.getLong(0), r.getLong(1).toInt)
      val ids = byLabel(l)
      val expPos =
        if (ids.head != a) ids.head
        else if (ids.length > 1) ids(1) else -1L
      assert(r.getLong(2) === expPos, s"pos mismatch for anchor $a")
      val expNeg =
        if (labelMins.head._1 != l) labelMins.head._2 else labelMins(1)._2
      assert(r.getLong(3) === expNeg, s"neg mismatch for anchor $a")
      if (r.getLong(2) != -1L) {
        assert(labels(r.getLong(2)) === l && r.getLong(2) != a)
      }
      assert(labels(r.getLong(3)) !== l)
    }
  }

  test("ml_feature_hashing: mass conserved and hash recomputed (sf0.001)") {
    import spark.implicits._
    val rows = LlmOps.mlFeatureHashing(spark, sf0001).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val totalTokens = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
      .count()
    assert(rows.map(_.getLong(2)).sum === totalTokens)
    // recompute the replayable hash in plain Scala for one document
    val doc = Tables.documents(spark, sf0001)
      .filter($"doc_id" === 0L).select("text").head.getString(0)
    val expected = doc.split(" ").filter(_.nonEmpty)
      .map(t => (t.length * 131 + t.head.toInt + t.last.toInt * 7) % 64)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows.filter(_.getLong(0) === 0L)
      .map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("eval_mrr_fixed: reconciles with the graded top-10 retrieval key (sf0.001)") {
    import spark.implicits._
    val labels = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // first same-label rank derived from simsearch_cosine_topk's own
    // output — two keys, one truth
    val expected = LlmOps.simsearchCosineTopk(spark, sf0001)
      .select(col("q_id"), col("rn").cast("long"), col("vec_id"))
      .collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        val ql = labels(q)
        val hit = rows.sortBy(_.getLong(1))
          .find(r => labels(r.getLong(2)) == ql).map(_.getLong(1))
        q -> hit.getOrElse(-1L)
      }
    val got = operators.Multimodal.evalMrrFixed(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      assert(r.getLong(2) === expected(r.getLong(0)),
        s"first-match rank mismatch for query ${r.getLong(0)}")
      val rank = r.getLong(2)
      assert(r.getLong(3) === (if (rank == -1L) 0L else 1048576L / rank))
    }
  }

  test("eval_cohens_kappa: matches a brute-force recompute from the classifier cells (sf0.001)") {
    import spark.implicits._
    val joined = LlmOps.textLangid(spark, sf0001)
      .join(Tables.documents(spark, sf0001)
        .select($"doc_id", $"source", $"lang"), "doc_id")
      .select("source", "lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1)
    val got = LlmOps.evalCohensKappa(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val rows = joined(g.getString(0))
      val n = rows.length.toLong
      val agree = rows.count(r => r._2 == r._3).toLong
      val rm = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cm = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val pe = rm.map { case (k, rv) => rv * cm.getOrElse(k, 0L) }.sum
      assert(g.getLong(1) === n)
      assert(g.getLong(2) === agree)
      assert(g.getLong(3) === agree * 1048576L / n)
      val expected =
        if (n * n == pe) -1L else (n * agree - pe) * 1048576L / (n * n - pe)
      assert(g.getLong(4) === expected, s"kappa mismatch for ${g.getString(0)}")
      assert(g.getLong(4) <= 1048576L)
    }
  }

  test("ml_knn_classify: votes match a brute-force neighbor recompute (sf0.001)") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def score(a: Array[Float], b: Array[Float]): Double = {
      // same sequential IEEE fold order as the native expression
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = operators.Multimodal.mlKnnClassify(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = vecs.find(_._1 === r.getLong(0)).get
      val top5 = vecs.filter(_._1 != q._1)
        .map(v => (score(q._2, v._2), v._1, v._3))
        .sortBy { case (s, id, _) => (-s, id) }.take(5)
      val votes = top5.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (l, v) => (-v, l) }
      assert(r.getLong(1) === q._3.toLong, "true label must ride along")
      assert(r.getLong(2) === votes.head._1.toLong,
        s"pred mismatch for query ${q._1}")
      assert(r.getLong(3) === votes.head._2.toLong)
    }
  }

  test("simsearch_index_serve: the serve plan reads the STORED index — every corpus scan is the pushed query fetch, no Lloyd pass") {
    val df = operators.Multimodal.simsearchIndexServe(spark, sf0001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // scan census by node blocks (the PlanRegressionSpec idiom): every
    // corpus scan is a pushed-down vec_id < 5 QUERY FETCH (the probe
    // and the LUT each fetch the 5 query vectors — never the corpus),
    // and the index comes from the committed TxnTable parquet
    val blocks = p.split("\\n(?=\\(\\d+\\) )")
    def scans(file: String): Seq[String] = blocks.toSeq
      .filter(b => b.matches("(?s)\\(\\d+\\) Scan parquet.*") && b.contains(file))
    val corpus = scans("embeddings.parquet")
    assert(corpus.nonEmpty && corpus.forall(_.contains("LessThan(vec_id,5)")),
      "every corpus scan must be the pushed-down 5-query fetch — an " +
        "unfiltered embeddings scan means the serve path recomputes the " +
        s"index: ${corpus.map(_.take(300))}")
    assert(scans("idx_ivf_cells").nonEmpty && scans("idx_pq_codes").nonEmpty &&
      scans("idx_pq_codebook").nonEmpty,
      "serve must read all three stored index tables: " + p.take(600))
    // output shape: a full 1..10 rank prefix per query
    val rows = df.collect()
    assert(rows.length === 50)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 10L), s"query $q")
    }
  }

  test("simsearch_index_maintain: v0 carried by reference, the append writes only the new slice, maintained = recompute") {
    val receipt = operators.Multimodal.simsearchIndexMaintain(spark, sf0001)
      .collect()
    val tAssign = Tables.scratch("idx_maint_assign")
    // the delta manifest carries v0's file by reference: both physical
    // files exist, f1 holds ONLY src=1 rows, and v1 = v0 ∪ f1 exactly
    val f0 = spark.read.parquet(s"$tAssign/data/f0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val f1 = spark.read.parquet(s"$tAssign/data/f1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(f0.nonEmpty && f0.forall(_._3 == 0L), "f0 is the v0 build slice")
    assert(f1.nonEmpty && f1.forall(_._3 == 1L),
      "the append file holds ONLY newly assigned vectors")
    assert(f1.forall(t => t._1 % 8 == 7L), "appended rows are the new slice")
    val v0 = graft.sources.TxnTable.read(spark, tAssign, Some(0)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val v1 = graft.sources.TxnTable.read(spark, tAssign).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(v0.toSet === f0.toSet, "v0 reads exactly the build file")
    assert(v1.toSet === f0.toSet ++ f1.toSet,
      "v1 = carried v0 file + appended file, nothing rewritten")
    // maintained ≡ recompute: brute-force centroids on the old slice,
    // argmin-assign everyone, compare to the maintained table
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toArray))
    val cents = vecs.filter(_._1 % 8 != 7L).groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map(d =>
        math.floor(vs.map(_._3(d)).sum.toDouble / vs.length).toLong).toArray
    }
    def argmin(qv: Array[Long]): Long =
      cents.toSeq.map { case (c, cq) =>
        ((0 until 64).map(d => { val z = qv(d) - cq(d); z * z }).sum, c)
      }.min._2
    val expect = vecs.map(t =>
      (t._1, argmin(t._3), if (t._1 % 8 == 7L) 1L else 0L)).toSet
    assert(v1.toSet === expect, "maintained assignments = recompute")
    // receipt consistency: counts partition the corpus; drift is priced
    assert(receipt.map(r => r.getLong(1) + r.getLong(2)).sum ===
      vecs.length.toLong)
    assert(receipt.forall(_.getLong(3) >= 0L), "drift priced on every cell")
  }
}
