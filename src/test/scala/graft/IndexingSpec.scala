package graft

import org.apache.spark.sql.functions._
import graft.operators.Indexing

/** Laws for the winnowing fingerprint layer (operators/Indexing.scala)
  * — the properties the oracle hash-match proves equal but not correct:
  * the 2/(w+1) selection density, the SIGMOD '03 shared-run guarantee,
  * and the pair detector's signal/noise separation. */
class IndexingSpec extends SparkSuite {

  test("text_winnow_fingerprints: selection density tracks 2/(w+1) (sf0.001)") {
    import spark.implicits._
    val fps = Indexing.textWinnowFingerprints(spark, sf0001)
    val nFps = fps.count()
    // grams per doc = max(0, tokens − 3)
    val nGrams = Tables.documents(spark, sf0001)
      .select(greatest(lit(0),
        expr("size(filter(split(text, ' '), w -> w <> ''))") - 3)
        .cast("long").as("g"))
      .agg(sum($"g")).head().getLong(0)
    val density = nFps.toDouble / nGrams
    // E[density] = 2/(w+1) = 1/3 for w=5; generous band around it
    assert(density > 0.25 && density < 0.45,
      s"winnow density $density outside the 2/(w+1) band ($nFps/$nGrams)")
    // every hash below the modulus, every position non-negative
    assert(fps.filter($"h" < 0 || $"h" >= 1048573L || $"pos" < 0)
      .count() === 0L)
  }

  test("winnowing guarantee: an 8+-token shared run yields a shared fingerprint hash (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("winnowdocs")
    // docs 0 and 1 share a 9-token run (6 grams → one full 5-gram
    // window entirely inside the run); doc 2 is disjoint. The packed
    // (h, pos) key is dominated by h, so both docs elect the same MIN
    // HASH from the identical shared window even though positions
    // differ — the Schleimer/Wilkerson/Aiken match guarantee.
    val shared = (0 until 9).map(i => s"sh$i").mkString(" ")
    Seq(
      (0L, (0 until 10).map(i => s"a$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"b$i").mkString(" ")),
      (1L, (0 until 10).map(i => s"c$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"d$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byDoc = Indexing.textWinnowFingerprints(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty,
      "shared 9-token run must contribute a common fingerprint hash")
    assert((byDoc(0L) intersect byDoc(2L)).isEmpty &&
      (byDoc(1L) intersect byDoc(2L)).isEmpty,
      "disjoint doc must share nothing")
  }

  test("dedup_winnow_pairs: a near-duplicate crosses the threshold, unrelated docs never pair (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("winnowpairs")
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, base),
      // near-dup: same 60-token body, 3-token tail edit
      (1L, base + " tail x y"),
      (2L, (0 until 60).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Indexing.dedupWinnowPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)),
      s"near-dup pair must cross the shared-fingerprint threshold: $pairs")
    assert(pairs.keySet === Set((0L, 1L)),
      s"unrelated doc 2 must not pair with anything: $pairs")
    // verify tier: the 60-of-63-token overlap is a clear duplicate
    val v = Indexing.dedupWinnowVerify(spark, dir).collect()
    assert(v.length === 1)
    assert(v.head.getDouble(3) > 0.9 && v.head.getLong(4) === 1L,
      s"near-dup must verify as duplicate: ${v.head}")
  }

  test("text_bigram_lm_counts: counts reconcile on an injected corpus") {
    import spark.implicits._
    val dir = Tables.scratch("bigramdocs")
    // doc 0: "a b a b a" → ab×2 ba×2; doc 1: "c a b" → ca ab.
    // Type ab: c=3, w1='a' mass = c(ab)+c... a is followed by b only:
    // c_left_ctx(a •)=3; b followed by a: ba×2. Continuations:
    // w2='b' has left contexts {a} → n_cont_left(b)=1;
    // w2='a' has {b, c} → 2; w1='a' fans out to {b} → 1.
    Seq((0L, "a b a b a"), (1L, "c a b"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Indexing.textBigramLmCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      ("a", "b") -> ((3L, 3L, 1L, 1L)),
      ("b", "a") -> ((2L, 2L, 2L, 1L)),
      ("c", "a") -> ((1L, 1L, 2L, 1L))))
  }

  test("text_bigram_lm_counts: token mass conserved corpus-wide (sf0.001)") {
    import spark.implicits._
    // Σ c_bigram == Σ_docs (n_tokens − 1): every adjacent slot counted
    // exactly once (no empty tokens in the fixture)
    val total = Indexing.textBigramLmCounts(spark, sf0001)
      .agg(sum($"c_bigram")).head.getLong(0)
    val expected = Tables.documents(spark, sf0001)
      .select((size(split($"text", " ")) - 1).cast("long").as("n"))
      .agg(sum($"n")).head.getLong(0)
    assert(total === expected)
    // and the left-context mass telescopes: Σ distinct c_left_ctx per
    // w1 == Σ c_bigram (each w1 group sums to its own mass once)
    val byW1 = Indexing.textBigramLmCounts(spark, sf0001)
      .groupBy($"w1").agg(first($"c_left_ctx").as("m"), sum($"c_bigram").as("s"))
      .filter($"m" =!= $"s").count()
    assert(byW1 === 0L)
  }

  test("text_phrase_search: elected phrase, overlap counting, and positions (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("phrasedocs")
    // "x x x x" contains the trigram (x,x,x) at positions 1 and 2 —
    // overlapping occurrences count separately; doc 1 pushes (x,x,x)
    // to the top election; doc 2 contains no x at all
    Seq((0L, "x x x x"), (1L, "a x x x b"), (2L, "p q r s t"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Indexing.textPhraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> (("x x x", 2L, 1L)),
      1L -> (("x x x", 1L, 2L))))
  }

  test("text_bpe_merge_loop: N=10 on an injected corpus with known merge sequence") {
    import spark.implicits._
    val dir = Tables.scratch("bpedocs")
    // one 16-letter word of distinct ascending characters: every pair
    // counts 1, so the (count desc, a asc, b asc) election always
    // merges the growing prefix ("ab" < "c" < ... lexicographically) —
    // iteration i elects (a..<char i>, <char i+1>) and leaves 15 − i
    // adjacent pairs. Capacity 15 merges ≥ the 10 requested.
    val word = ('a' to 'p').mkString
    Seq((0L, word)).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Indexing.textBpeMergeLoopN(spark, dir, 10)
      .collect()
    assert(rows.length === 10)
    rows.zipWithIndex.foreach { case (r, i0) =>
      val i = i0 + 1
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === word.take(i), s"iter $i merges the prefix")
      assert(r.getString(2) === word(i).toString)
      assert(r.getLong(3) === 1L, "all pair counts are 1 on this corpus")
      assert(r.getLong(4) === (15 - i).toLong, s"pairs_after at iter $i")
    }
  }

  test("dedup_winnow_verify: jaccard bounded and consistent with the verdict (sf0.001)") {
    import spark.implicits._
    val v = Indexing.dedupWinnowVerify(spark, sf0001)
    assert(v.count() > 0)
    assert(v.filter($"jaccard" <= 0 || $"jaccard" > 1).count() === 0L)
    assert(v.filter(($"jaccard" >= 0.5) =!= ($"is_dup" === 1L))
      .count() === 0L)
  }

  test("dedup_minhash_replayable: identical docs share all bands at jaccard 1; disjoint docs never pair (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("minhashdocs")
    // docs 0 and 1 are byte-identical ⇒ identical shingle sets ⇒
    // identical 16-slot signatures ⇒ all 4 band keys collide; doc 2
    // shares no token with them ⇒ disjoint shingles, and a pairing
    // would need a base-31 band-hash collision (none here)
    val body = (0 until 40).map(i => s"m$i").mkString(" ")
    Seq((0L, body), (1L, body),
      (2L, (0 until 40).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Indexing.dedupMinhashReplayable(spark, dir).collect()
    assert(rows.length === 1, s"exactly the identical pair: ${rows.toSeq}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)))
    assert(r.getLong(2) === 4L, "identical signatures share every band")
    assert(r.getLong(3) === r.getLong(4) && r.getLong(4) === r.getLong(5),
      "shared = |A| = |B| for identical shingle sets")
    assert(r.getLong(6) === 1048576L, "exact fixed-point jaccard must be 1")
  }

  test("dedup_simhash_replayable: exact duplicates at hamming 0, verdicts bounded (sf0.1)") {
    import spark.implicits._
    val rep = Indexing.dedupSimhashReplayable(spark, sf01).cache()
    assert(rep.filter($"hamming" < 0 || $"hamming" > 3).count() === 0L)
    val exactPairs = Tables.documents(spark, sf01)
      .groupBy(trim($"text").as("t"))
      .agg(min($"doc_id").as("doc_a"), max($"doc_id").as("doc_b"),
        count(lit(1)).as("c"))
      .filter($"c" === 2).select($"doc_a", $"doc_b")
    val missed = exactPairs.join(rep.filter($"hamming" === 0L),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0L,
      "identical token sets must fingerprint identically in every block")
  }

  test("dedup_minhash_replayable finds every exact-duplicate pair at sf0.1") {
    import spark.implicits._
    val rep = Indexing.dedupMinhashReplayable(spark, sf01).cache()
    val exactPairs = Tables.documents(spark, sf01)
      .groupBy(trim($"text").as("t"))
      .agg(min($"doc_id").as("doc_a"), max($"doc_id").as("doc_b"),
        count(lit(1)).as("c"))
      .filter($"c" === 2).select($"doc_a", $"doc_b")
    assert(exactPairs.count() === 8L)
    val missed = exactPairs.join(rep.filter($"jaccard_fp" === 1048576L),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0L,
      "identical docs always collide in every band (MinHash guarantee)")
  }

  test("text_cdc_chunking: boundaries realign after a prefix insertion (the CDC property)") {
    import spark.implicits._
    // doc 1 = doc 0 with one token PREPENDED. Fixed-size chunking would
    // shift every boundary; content-defined boundaries re-sync as soon
    // as the 4-token rolling windows align over shared content, so all
    // chunks after the first few must be identical (chash, n_tokens).
    val words = (1 to 80).map(i => ("abcdefghijklmnop".take(1 + i % 13)) + i)
    val base = words.mkString(" ")
    val dir = Tables.scratch("cdc_docs")
    Seq((0L, base), (1L, "zzz " + base)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Indexing.textCdcChunking(spark, dir).collect()
    val c0 = out.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(4), r.getLong(3))).toSeq
    val c1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(4), r.getLong(3))).toSeq
    assert(c0.size >= 4, s"fixture must produce several chunks, got ${c0.size}")
    val shared = c0.intersect(c1).size
    assert(shared >= c0.size - 3,
      s"only $shared of ${c0.size} chunks survived a 1-token prefix insert")
  }

  /** Brute-force replay of the shared MinHash chain at sf0.001: the
    * per-doc shingle sets and the per-doc band rows — ground truth for
    * every index-lifecycle law below. */
  private lazy val mhReplay: (Map[Long, Set[Long]],
      Map[Long, Seq[(Long, Long)]]) = {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).toSeq
    }
    val vocab = toks.flatMap(_._2).distinct.sorted.zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    val M = 1048573L
    val shg: Map[Long, Set[Long]] = toks.map { case (id, ts) =>
      val rs = ts.map(vocab)
      id -> rs.indices.dropRight(3).map(i =>
        (rs(i) * 29791L + rs(i + 1) * 961L + rs(i + 2) * 31L + rs(i + 3))
          % M).toSet
    }.filter(_._2.nonEmpty).toMap
    val bands: Map[Long, Seq[(Long, Long)]] = shg.map { case (id, hs) =>
      val sig = Indexing.MinhashRepSeeds.map { case (a, b) =>
        hs.map(h => (h * a + b) % M).min
      }
      id -> (0 until 4).map(bd => (bd.toLong,
        sig(4 * bd) * 29791L + sig(4 * bd + 1) * 961L +
          sig(4 * bd + 2) * 31L + sig(4 * bd + 3)))
    }
    (shg, bands)
  }

  test("dedup_index_maintain: v0 carried by reference, maintained index = brute-force rebuild, probe = replayed pairs (sf0.001)") {
    import graft.sources.TxnTable
    val out = Indexing.dedupIndexMaintain(spark, sf0001).collect()
    val tIdx = Tables.scratch("dedup_band_index")
    val (shg, bands) = mhReplay
    val oldB = bands.filter(_._1 % 8 != 7L)
      .flatMap { case (id, bs) => bs.map(b => (id, b._1, b._2)) }.toSet
    val newB = bands.filter(_._1 % 8 == 7L)
      .flatMap { case (id, bs) => bs.map(b => (id, b._1, b._2)) }.toSet
    // ---- maintained ≡ rebuilt + carried by reference ------------------
    val v0 = TxnTable.read(spark, tIdx, Some(0)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val v1 = TxnTable.read(spark, tIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(v0 === oldB, "stored v0 index = brute-force old-slice bands")
    assert(v1 === oldB ++ newB, "maintained v1 = v0 ∪ the appended batch")
    if (oldB.nonEmpty && newB.nonEmpty) {
      val entries = TxnTable.fileEntries(spark, tIdx, Some(1))
      assert(entries.map(_.path).toSet ===
        Set(s"$tIdx/data/f0", s"$tIdx/data/f1"),
        "the delta manifest carries v0's file by reference")
      val f1 = spark.read.parquet(s"$tIdx/data/f1").collect()
      assert(f1.forall(_.getLong(0) % 8 == 7L),
        "the append file holds ONLY the new batch's band rows")
    }
    // ---- probe ≡ replayed pairs ---------------------------------------
    val hot = oldB.groupBy(t => (t._2, t._3)).filter(_._2.size > 20).keySet
    val coldOld = oldB.filterNot(t => hot((t._2, t._3)))
    // Seq, not Set: each shared (band, bh) bucket must COUNT toward
    // n_shared_bands, not collapse
    val expPairs = (for {
      (nid, b, bh) <- newB.toSeq
      (oid, ob, obh) <- coldOld.toSeq if ob == b && obh == bh
    } yield (nid, oid)).groupBy(identity).map { case ((n, o), v) =>
      (n, o, v.size.toLong)
    }.toSet
    val gotPairs = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPairs === expPairs,
      "graded pairs = brute-force probe of the stored buckets")
    // verify columns: exact shingle intersection + fixed-point jaccard
    out.foreach { r =>
      val (nid, oid) = (r.getLong(0), r.getLong(1))
      val ni = (shg(nid) & shg(oid)).size.toLong
      assert(r.getLong(3) === ni, s"n_shared for ($nid, $oid)")
      assert(r.getLong(4) === shg(nid).size.toLong)
      assert(r.getLong(5) === shg(oid).size.toLong)
      assert(r.getLong(6) ===
        ni * 1048576L / (shg(nid).size + shg(oid).size - ni))
    }
  }

  test("dedup_index_compact: capless probe of the compacted index = capped probe of the raw index; quarantine + binpack are physical (sf0.001)") {
    import graft.sources.TxnTable
    val maintain = Indexing.dedupIndexMaintain(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = Indexing.dedupIndexCompact(spark, sf0001).collect()
    // SERVING EQUIVALENCE — the graded statement: compaction moved the
    // hot-bucket cap into the layout without changing a single pair
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === maintain, "compacted serving diverged from capped serving")
    val tIdx = Tables.scratch("dedup_band_index2")
    val tQuar = Tables.scratch("dedup_band_quarantine")
    // census: quarantined + after = before; quarantine sidecar holds
    // exactly the quarantined entries
    val quarN = TxnTable.read(spark, tQuar).count()
    out.headOption.foreach { r =>
      assert(r.getLong(4) === quarN, "sidecar ≠ quarantined census")
      assert(r.getLong(3) - r.getLong(4) === r.getLong(5))
    }
    // physical layout: v2 is ONE compacted file; f0/f1 are out of the
    // manifest (their bytes await vacuum, the standing GC split)
    val v2 = TxnTable.fileEntries(spark, tIdx, Some(2))
    assert(v2.map(_.path) === Seq(s"$tIdx/data/c0"))
    out.headOption.foreach { r =>
      assert(TxnTable.read(spark, tIdx, Some(2)).count() === r.getLong(5),
        "v2 content ≠ entries_after census")
    }
  }

  test("dedup_ingest_gate: admission log = brute-force 3-wave replay with the intra-wave tier; the gate is sequential; the index holds exactly seed + admitted (sf0.001)") {
    import graft.sources.TxnTable
    val out = Indexing.dedupIngestGate(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val (shg, bands) = mhReplay
    val allDocs = Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    var idx: Set[(Long, Long, Long)] = bands.filter(_._1 % 4 == 0L)
      .flatMap { case (id, bs) => bs.map(b => (id, b._1, b._2)) }.toSet
    var expect = Vector.empty[(Long, Long, Long, Long, Long, Long)]
    var admittedAll = Set.empty[Long]
    var crossWaveReject = false
    def jacOk(n: Long, o: Long): Boolean = {
      val ni = (shg(n) & shg(o)).size.toLong
      ni * 1048576L / (shg(n).size + shg(o).size - ni) >= 524288L
    }
    for (k <- 1 to 3) {
      val hot = idx.groupBy(t => (t._2, t._3)).filter(_._2.size > 20)
        .keySet
      val cold = idx.filterNot(t => hot((t._2, t._3))).toSeq
      val waveB = bands.filter(_._1 % 4 == k)
        .flatMap { case (id, bs) => bs.map(b => (id, b._1, b._2)) }.toSeq
      val cand = (for {
        (nid, b, bh) <- waveB
        (oid, ob, obh) <- cold if ob == b && obh == bh
      } yield (nid, oid)).distinct
      val dup = cand.filter { case (n, o) => jacOk(n, o) }
      if (dup.exists { case (_, o) => admittedAll.contains(o) })
        crossWaveReject = true
      // intra-wave tier: wave-internal hot-cap, smaller-id partners
      val whot = waveB.groupBy(t => (t._2, t._3))
        .filter(_._2.size > 20).keySet
      val wcold = waveB.filterNot(t => whot((t._2, t._3)))
      val wdup = (for {
        (nid, b, bh) <- wcold
        (oid, ob, obh) <- wcold if ob == b && obh == bh && oid < nid
      } yield (nid, oid)).distinct.filter { case (n, o) => jacOk(n, o) }
      val ncM = cand.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val ndM = dup.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val wiM = wdup.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val rows = allDocs.filter(_ % 4 == k).map { d =>
        val nd = ndM.getOrElse(d, 0L)
        val wi = wiM.getOrElse(d, 0L)
        (k.toLong, d, ncM.getOrElse(d, 0L), nd, wi,
          if (nd == 0L && wi == 0L) 1L else 0L)
      }
      expect ++= rows
      val adm = rows.filter(_._6 == 1L).map(_._2).toSet
      admittedAll ++= adm
      idx ++= bands.filter(kv => adm(kv._1))
        .flatMap { case (id, bs) => bs.map(b => (id, b._1, b._2)) }
    }
    assert(out.toSet === expect.toSet,
      "admission log diverged from the brute-force replay")
    // the gate is a real filter and a real pass at this fixture
    assert(out.exists(_._6 == 0L), "no doc was ever rejected")
    assert(out.exists(_._6 == 1L), "no doc was ever admitted")
    // the index's final version holds exactly seed + admitted bands
    val stored = TxnTable.read(spark,
        Tables.scratch("dedup_ingest_index")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored === idx, "final index ≠ seed ∪ admitted bands")
    // at least one rejection is caused by an ADMITTED earlier doc (not
    // only by the seed) — the sequential dependence the gate exists for
    assert(crossWaveReject,
      "no dup hit ever referenced an earlier wave's admission — the " +
        "sequential gate is vacuous at this fixture")
  }

  test("dedup_index_forget: MoR serve = folded serve; forgotten docs never pair; the delete file is live at v1 and retired at v2 (sf0.001)") {
    import graft.sources.TxnTable
    val out = Indexing.dedupIndexForget(spark, sf0001).collect()
    // no forgotten doc ever appears on the index side of a pair
    assert(out.forall(_.getLong(1) % 5 != 0L),
      "a forgotten doc surfaced as a match candidate")
    val tIdx = Tables.scratch("dedup_forget_index")
    // v1 carries exactly one live delete file; the OPTIMIZE at v2
    // retires it
    assert(TxnTable.deleteFiles(spark, tIdx, Some(1)).size === 1)
    assert(TxnTable.deleteFiles(spark, tIdx, Some(2)).isEmpty)
    // the MoR read really anti-joins: v1's visible rows = v0 minus the
    // forgotten docs, and v2's folded content is identical
    def rows(v: Int) = TxnTable.read(spark, tIdx, Some(v)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (v0, v1, v2) = (rows(0), rows(1), rows(2))
    assert(v1 === v0.filterNot(_._1 % 5 == 0L),
      "v1 MoR read must hide exactly the forgotten docs")
    assert(v2 === v1, "OPTIMIZE fold must preserve the served content")
    // the census columns are exact (ride every output row)
    out.headOption.foreach { r =>
      assert(r.getLong(7) === v0.size.toLong)
      assert(r.getLong(9) === v1.size.toLong)
      assert(r.getLong(8) ===
        v0.map(_._1).count(_ % 5 == 0L).toLong)
    }
    // the forget is not vacuous at this fixture: something was
    // actually forgotten, and the index still serves pairs
    assert(v0.size > v1.size, "no index entries were forgotten")
    assert(out.nonEmpty, "the post-forget index must still serve")
  }

  test("dedup_ingest_gate: injected same-wave dup pair — exactly the smaller doc_id is admitted; a later wave is rejected by the stored admission; quiet wave commits an empty DELTA") {
    import spark.implicits._
    import graft.sources.TxnTable
    val dir = Tables.scratch("ingestgatedocs")
    def txt(p: String) = (0 until 30).map(i => s"$p$i").mkString(" ")
    // wave layout (doc_id % 4): 0 = seed, 1 = {1, 5} IDENTICAL texts
    // (the intra-wave pair the r17 verdict injected this law for),
    // 2 = distinct doc, 3 = a copy of the wave-1 text (rejected by
    // the STORED index only if doc 1 was admitted and indexed)
    Seq((0L, txt("s")), (1L, txt("b")), (5L, txt("b")),
        (2L, txt("c")), (3L, txt("b")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Indexing.dedupIngestGate(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // exactly ONE of the identical same-wave pair is admitted — the
    // smaller id; the larger carries the intra_wave_hits evidence
    assert(rows(1L) === ((1L, 0L, 0L, 1L)),
      s"doc 1 must be admitted clean: ${rows(1L)}")
    assert(rows(5L)._3 >= 1L && rows(5L)._4 === 0L,
      s"doc 5 must be intra-rejected: ${rows(5L)}")
    // wave 2: unrelated doc admits with zero hits on every tier
    assert(rows(2L) === ((2L, 0L, 0L, 1L)), s"doc 2: ${rows(2L)}")
    // wave 3: the copy is caught by the STORED index (doc 1's bands
    // were appended), not by the intra tier — the sequential gate
    assert(rows(3L)._2 >= 1L && rows(3L)._3 === 0L &&
      rows(3L)._4 === 0L, s"doc 3 must be index-rejected: ${rows(3L)}")
    // the zero-admission wave 3 committed an EMPTY DELTA: version 3
    // exists, is a delta (history flags it), and its snapshot equals
    // version 2's — the degenerate-wave fallback never downgrades the
    // chain to table-level snapshots
    val tIdx = Tables.scratch("dedup_ingest_index")
    val h = TxnTable.history(spark, tIdx).map(t => t._1 -> t).toMap
    assert(h(3)._4 && h(3)._5 === 0, s"v3 must be an empty delta: ${h(3)}")
    assert(TxnTable.fileEntries(spark, tIdx, Some(3)).map(_.path).toSet ===
      TxnTable.fileEntries(spark, tIdx, Some(2)).map(_.path).toSet,
      "an empty delta must carry v2's files by reference")
  }
}
