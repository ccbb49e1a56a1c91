package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Round-9 retrieval/tokenizer layer: the inverted-index build (the
  * classic MapReduce demo beyond wordcount, and the backbone of any
  * search layer over the corpus) and one corpus-wide BPE merge
  * iteration (the tokenizer-training primitive of an LLM pipeline).
  *
  * Determinism posture (both keys oracled): everything is integer
  * counts, integer positions, and strings; ordered aggregation is made
  * deterministic with sort_array / ORDER BY-inside-aggregate on a
  * unique key, and the BPE merge election carries a total (count desc,
  * pair asc) order. The fixture text is printable ASCII (verified), so
  * Java-regex vs RE2 differences on newlines/supplementary planes
  * cannot bite.
  */
object Indexing {

  /** Inverted index — term → postings list. Per term: document
    * frequency, total occurrences, and the full postings string
    * `docId:pos1,pos2|docId:pos…` with documents ascending and 1-based
    * token positions ascending — the text-serialized form of the
    * array<struct> a binary index would store (the oracle compare
    * rejects nested columns, and a flat string is hash-stable anyway).
    *
    * Scale shape: ONE shuffle, on the term key. The token stream is
    * repartitioned by term up front; both aggregation levels —
    * (term, doc) postings, then term rollup — satisfy their clustering
    * from that single hash partitioning (Spark accepts a partitioning
    * on a key SUBSET for grouping), so neither adds an exchange
    * (pinned in PlanRegressionSpec). There is no map-side combine to
    * lose: an inverted index ships every position regardless, so one
    * raw shuffle is strictly cheaper than two aggregate shuffles. At
    * 100 TB this is the term-partitioned index build; stopword terms
    * produce long postings rows — real engines cap or skip-list them,
    * here the fixture vocabulary is bounded (~31 terms). Positions
    * index the RAW split array (empty tokens from repeated spaces keep
    * their slot on both engines), so offsets stay engine-identical. */
  def textInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "term")))
      .filter($"term" =!= "")
      .select($"term", $"doc_id", ($"p0" + 1).cast("long").as("pos"))
      .repartition($"term")
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("n"),
        array_join(transform(sort_array(collect_list($"pos")),
          _.cast("string")), ",").as("poss"))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"),
        sum($"n").as("n_occurrences"),
        array_join(transform(sort_array(collect_list(struct($"doc_id", $"poss"))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("poss"))), "|").as("postings"))
      .orderBy($"term")
  }

  /** One BPE merge iteration over the corpus — the inner step of
    * byte-pair-encoding tokenizer training: words decompose into
    * single-character pieces, every adjacent piece pair is counted
    * corpus-wide, the most frequent pair (ties broken lexicographically
    * — the total order that makes the election deterministic) is merged
    * everywhere, and the corpus pair mass is re-counted. Output: the
    * top-20 pair table plus the elected merge's before/after adjacent-
    * pair totals — `pairs_after < pairs_before` is the monotone-
    * progress law a BPE trainer relies on (pinned in PropertiesSpec).
    *
    * The merge applies via string `replace` on the space-joined piece
    * string: leftmost-first non-overlapping replacement IS BPE's greedy
    * application order, and Spark and DuckDB replace() agree on it.
    *
    * Scale shape: pair counting is a map-side-combinable groupBy on the
    * (a, b) key (pair domain ≤ |alphabet|² initially — tiny); the
    * election is a global top-1 (TakeOrderedAndProject, never a
    * single-partition sort); the 1-row winner broadcasts back over the
    * piece strings for the merge pass. The piece frame is persisted
    * across its three uses (count, before-total, merge+after-total) so
    * the corpus is tokenized once. The rank window and final output
    * ingest ≤20 rows. */
  def textBpeMergeStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut, not mark (r18): three consumers (count, before-total,
    // merge pass) plus the winner broadcast race a lazy persist
    val spaced = graft.PlanOnly.cut(
      Tables.documents(spark, dir)
        .select(explode(split($"text", " ")).as("w"))
        .filter($"w" =!= "")
        .select(trim(regexp_replace($"w", "(.)", "$1 ")).as("s")))
    // cut, not mark (r19, X6): the top-1 winner BROADCASTS back into
    // the `after` count while the top-20 probe reads the same frame —
    // racing futures re-run the pair aggregate; the frame is
    // ≤|alphabet|² rows, so the eager checkpoint is one tiny job
    val pairCounts = graft.PlanOnly.cut(spaced
      .select(split($"s", " ").as("ps"))
      .filter(size($"ps") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ps) - 1),
          |  i -> struct(element_at(ps, i) AS a, element_at(ps, i + 1) AS b))"""
          .stripMargin)).as("p"))
      .select($"p.a", $"p.b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt")))
    val best = pairCounts.orderBy($"cnt".desc, $"a", $"b").limit(1)
      .select($"a".as("ba"), $"b".as("bb"))
    val before = spaced
      .agg(sum(size(split($"s", " ")) - 1).cast("long").as("pairs_before"))
    val after = spaced.crossJoin(broadcast(best))
      .select(replace($"s", concat($"ba", lit(" "), $"bb"),
        concat($"ba", $"bb")).as("s2"))
      .agg(sum(size(split($"s2", " ")) - 1).cast("long").as("pairs_after"))
    // rank window: ≤20 rows after the top-k cut, never the pair table
    val rk = Window.orderBy($"cnt".desc, $"a", $"b")
    pairCounts.orderBy($"cnt".desc, $"a", $"b").limit(20)
      .withColumn("rk", row_number().over(rk).cast("long"))
      .crossJoin(broadcast(before))
      .crossJoin(broadcast(after))
      .select($"rk", $"a", $"b", $"cnt", $"pairs_before", $"pairs_after")
      .orderBy($"rk")
  }

  /** Number of merges the BPE training loop runs. Bounded well under
    * the fixture's merge capacity (31 words × up to 7 initial pair
    * slots); a production train loops to a vocab-size target. */
  val BpeIterations: Int = 6

  /** BPE merge TRAINING LOOP — the round-9 single step
    * ([[textBpeMergeStep]]) extended to the actual tokenizer-training
    * workload: [[BpeIterations]] successive merges, each one re-counting
    * adjacent pairs over the merged corpus, electing the most frequent
    * pair (count desc, pair asc — the total order that makes every
    * election deterministic) and applying it everywhere. Output: one row
    * per iteration — the elected pair, its count at election, and the
    * corpus adjacent-pair total after the merge (strictly decreasing
    * across iterations; the monotone-progress law is pinned in
    * PropertiesSpec).
    *
    * Two design upgrades over the single step, both the shape a real
    * trainer (HF tokenizers, SentencePiece) uses:
    *
    * 1. **Word-frequency table, not the raw corpus.** The corpus is
    *    tokenized ONCE into `(word, freq)` — pair counts are frequency-
    *    weighted sums over DISTINCT words, and merges rewrite only the
    *    distinct-word strings. Every iteration after the first touches
    *    |vocab| rows, not |corpus| — at 100 TB the corpus pass happens
    *    once and the merge loop runs on a frame millions of times
    *    smaller.
    * 2. **Double-space piece encoding makes string `replace` exact
    *    greedy BPE.** Pieces are joined with TWO spaces and the word is
    *    padded with one space each side (` c  a  t `); the merge rewrites
    *    `' a  b '` → `' ab '`. Each piece owns one space on each side, so
    *    (a) a piece boundary can never match inside a multi-char piece
    *    (`' h  e '` does not match ` th  e ` — the round-9 single-space
    *    form had that boundary unsoundness lurking for iteration ≥ 2),
    *    and (b) consecutive matches in a run share no characters, so
    *    leftmost non-overlapping `replace` — identical semantics in
    *    Spark and DuckDB — merges `a a a a` into `aa aa` exactly like
    *    HF's greedy left-to-right pass.
    *
    * Scale shape: one corpus shuffle (the word-frequency groupBy, map-
    * side combinable), then per iteration: a pair-count groupBy over
    * ≤|vocab|·len rows, a top-1 election (TakeOrderedAndProject), and a
    * 1-row broadcast back over the vocab for the merge rewrite. The
    * driver-coordinated loop cuts lineage per iteration via
    * [[graft.PlanOnly.cut]] (the connectedComponents precedent) so
    * iteration N's plan never nests N-1 merge plans. */
  def textBpeMergeLoop(spark: SparkSession, dir: String): DataFrame =
    textBpeMergeLoopN(spark, dir, BpeIterations)

  /** [[textBpeMergeLoop]] with the merge count as an argument — the
    * production surface (a real train loops to a vocab-size target;
    * the graded key pins n = [[BpeIterations]] to match the unrolled
    * oracle). Unit-lawed at n = 1 (≡ the single step) and n = 10 (an
    * injected corpus with known merge capacity, IndexingSpec). The
    * caller must keep n within the corpus's merge capacity (an
    * exhausted corpus has no electable pair). */
  def textBpeMergeLoopN(spark: SparkSession, dir: String, n: Int)
      : DataFrame = {
    import spark.implicits._
    bpeTrain(spark, dir, n)._2.reduce(_.unionByName(_)).orderBy($"iter")
  }

  /** Shared BPE training chain: returns the trained word table
    * `(w, s, freq)` — `s` the double-space piece string after `n`
    * merges — plus the per-iteration stat frames.
    * [[textBpeMergeLoop]] grades the stats; [[textBpeTokenize]] grades
    * the trained vocabulary applied back to the words. */
  private def bpeTrain(spark: SparkSession, dir: String,
      n: Int = BpeIterations): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    val wf = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    // ' c  a  t ': chars double-space-joined, single-space padded
    var cur = graft.PlanOnly.cut(wf.select($"w",
      concat(lit(" "), rtrim(regexp_replace($"w", "(.)", "$1  ")), lit(" ")).as("s"),
      $"freq"))
    val stats = (1 to n).map { i =>
      val pairCounts = cur
        .select(split(trim($"s"), "  ").as("ps"), $"freq")
        .filter(size($"ps") >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ps) - 1),
            |  i -> struct(element_at(ps, i) AS a, element_at(ps, i + 1) AS b))"""
            .stripMargin)).as("p"), $"freq")
        .groupBy($"p.a", $"p.b").agg(sum($"freq").as("cnt"))
      val best = pairCounts.orderBy($"cnt".desc, $"a", $"b").limit(1)
        .select($"a".as("ba"), $"b".as("bb"), $"cnt")
      val merged = graft.PlanOnly.cut(cur.select($"w", $"s", $"freq")
        .crossJoin(broadcast(best))
        .select($"w", replace($"s",
          concat(lit(" "), $"ba", lit("  "), $"bb", lit(" ")),
          concat(lit(" "), $"ba", $"bb", lit(" "))).as("s"),
          $"freq", $"ba", $"bb", $"cnt"))
      val stat = merged.agg(
        max($"ba").as("a"), max($"bb").as("b"), max($"cnt").as("cnt"),
        sum((size(split(trim($"s"), "  ")) - 1).cast("long") * $"freq")
          .cast("long").as("pairs_after"))
        .select(lit(i.toLong).as("iter"), $"a", $"b", $"cnt", $"pairs_after")
      cur = merged.select($"w", $"s", $"freq")
      stat
    }
    (cur, stats)
  }

  /** BPE APPLY — the inference half the trainer exists for: the merge
    * list learned by [[textBpeMergeLoop]] applied back to the vocabulary,
    * yielding each word's final piece decomposition (the tokenizer a
    * pipeline would ship). One row per distinct word: corpus frequency,
    * the space-joined pieces, and the piece count — `Σ n_pieces · freq`
    * is the corpus token count under the trained tokenizer, the number
    * every token-budget planner needs.
    *
    * Greedy-apply correctness rides on the same double-space encoding as
    * the trainer (the merged word strings ARE the applied tokenizer —
    * train-then-apply over a closed vocabulary is one pass, exactly how
    * HF's trainer emits its learned `vocab` file). Scale: output is
    * |vocab| rows; applying to unseen text at 100 TB replays the merge
    * list per word — constant work per word, embarrassingly parallel. */
  def textBpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTrain(spark, dir)._1
      .select($"w".as("word"), $"freq",
        array_join(split(trim($"s"), "  "), " ").as("tokens"),
        size(split(trim($"s"), "  ")).cast("long").as("n_pieces"))
      .orderBy($"word")
  }

  /** Incremental inverted-index maintenance — the delta-merge pattern
    * (compact_incremental_agg) applied to postings: the standing index
    * over the established corpus is MATERIALIZED (written to parquet and
    * read back — the state a nightly build persists), the newest tenth
    * of the id space arrives as a delta batch, and maintenance merges
    * delta postings into standing rows WITHOUT re-reading the base
    * documents: a full-outer join on term, additive df/occurrence
    * arithmetic, and postings-string concatenation. The append-only
    * carve (`doc_id > max·9/10` — new crawl batches get new ids) is what
    * makes concatenation legal: every delta doc_id sorts after every
    * standing doc_id, so `standing || '|' || delta` IS the doc-ascending
    * postings order.
    *
    * The ORACLE is the from-scratch full-corpus rebuild (the same SQL as
    * text_inverted_index) — the graded hash-match is literally the
    * `merge(standing, delta) == rebuild(corpus)` law every incremental
    * index maintains.
    *
    * Scale shape: maintenance cost is O(|standing index| + |delta|),
    * never O(corpus) — the base documents are not rescanned. The merge
    * join shuffles both sides on term here; the production variant
    * stores the standing index term-BUCKETED (the sink_bucketed_join
    * machinery), making the standing side exchange-free so each
    * maintenance run shuffles only the delta. */
  def textIndexDeltaMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = Tables.documents(spark, dir)
      .agg(expr("max(doc_id) * 9 div 10").as("cut"))
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "term")))
      .filter($"term" =!= "")
      .select($"term", $"doc_id", ($"p0" + 1).cast("long").as("pos"))
      .crossJoin(broadcast(cut))
    // the text_inverted_index build shape: one term shuffle feeds both
    // aggregation levels (key-subset clustering satisfaction)
    def build(df: DataFrame): DataFrame = df
      .repartition($"term")
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("n"),
        array_join(transform(sort_array(collect_list($"pos")),
          _.cast("string")), ",").as("poss"))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"),
        sum($"n").as("n_occurrences"),
        array_join(transform(sort_array(collect_list(struct($"doc_id", $"poss"))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("poss"))), "|").as("postings"))
    val standingFrame = build(toks.filter($"doc_id" <= $"cut"))
    val standingDir = Tables.scratch("index_standing")
    val standing = graft.PlanOnly.roundTrip(standingFrame) {
      standingFrame.write.mode("overwrite").parquet(standingDir)
      spark.read.schema(standingFrame.schema).parquet(standingDir)
    }
    val delta = build(toks.filter($"doc_id" > $"cut"))
    standing
      .select($"term", $"df".as("bdf"), $"n_occurrences".as("bn"),
        $"postings".as("bp"))
      .join(delta.select($"term", $"df".as("ddf"),
        $"n_occurrences".as("dn"), $"postings".as("dp")),
        Seq("term"), "full_outer")
      .select($"term",
        (coalesce($"bdf", lit(0L)) + coalesce($"ddf", lit(0L))).as("df"),
        (coalesce($"bn", lit(0L)) + coalesce($"dn", lit(0L))).as("n_occurrences"),
        concat_ws("|", $"bp", $"dp").as("postings"))
      .orderBy($"term")
  }

  /** Winnowing window width w: one fingerprint is selected from every
    * run of [[WinnowW]] consecutive grams, giving the 2/(w+1) expected
    * selection density of Schleimer/Wilkerson/Aiken (SIGMOD '03). */
  private val WinnowW = 5
  /** Fingerprint-hash modulus (prime < 2²⁰) and the position packing
    * base: key = h·2²⁰ + pos encodes the (h, pos) lexicographic order
    * into one BIGINT so a window min() IS the winnowing election —
    * replayable in any engine without struct-min support. */
  private[operators] val WinnowM = 1048573L
  private val PosBase = 1048576L

  /** The shared winnowing chain: 4-token grams hashed with an
    * ENGINE-REPLAYABLE polynomial — token → dense rank over the sorted
    * global vocabulary (no xxhash/murmur, both engines replay it
    * bit-for-bit), gram h = (r₀·31³ + r₁·31² + r₂·31 + r₃) mod 1048573.
    * Each w-gram window elects min(h·2²⁰ + pos); the distinct elected
    * keys are the document's fingerprints. Documents with fewer than w
    * grams contribute their single global minimum. */
  /** The shared token→gram-hash chain — one row per 4-token gram
    * (doc_id, pos, h), h the engine-replayable polynomial over the
    * two-level vocabulary ranks. Consumed by the winnow election below
    * AND by [[dedupMinhashReplayable]] (whose shingle set is the
    * distinct (doc_id, h) projection). */
  /** Tokens decorated with their global vocabulary rank — one row per
    * token position (doc_id, pos, r). The rank is computed WITHOUT a
    * single-partition global sort: UTF-8 order is prefix-monotone
    * (a < b ⇒ prefix₂(a) ≤ prefix₂(b)), so a 2-char prefix bucket +
    * per-bucket row_number + broadcast bucket offsets reproduce the
    * global rank exactly — the two-level prefix sum with a
    * ≤|charset|²-row totally-ordered frame. Shared by the gram-hash
    * chain and the replayable SimHash twin. */
  private def rankedTokens(spark: SparkSession, dir: String): DataFrame =
    rankedTokensOf(Tables.documents(spark, dir))

  /** [[rankedTokens]] over an arbitrary (doc_id, text) frame — the
    * vocabulary is the FRAME's own (a pipeline stage owns its input);
    * shared with the dedup-cascade cost receipt, whose MinHash tier
    * runs over the exact-dedup survivors. */
  private[operators] def rankedTokensOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select($"doc_id",
        posexplode(expr("filter(split(text, ' '), w -> w <> '')"))
          .as(Seq("pos", "tok")))
    val vocab0 = toks.select($"tok").distinct()
      .withColumn("pb", substring($"tok", 1, 2))
    val pbOffs = vocab0.groupBy($"pb").agg(count(lit(1)).as("pn"))
      .withColumn("off", coalesce(sum($"pn").over(Window.orderBy($"pb")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pb", $"off")
    val vocab = vocab0
      .withColumn("rin",
        row_number().over(Window.partitionBy($"pb").orderBy($"tok"))
          .cast("long"))
      .join(broadcast(pbOffs), "pb")
      .select($"tok", ($"off" + $"rin").as("r"))
    toks.join(broadcast(vocab), "tok")
      .select($"doc_id", $"pos", $"r")
  }

  private def gramFrame(spark: SparkSession, dir: String): DataFrame =
    gramFrameOf(rankedTokens(spark, dir))

  /** The 4-token polynomial gram hash over an arbitrary ranked-token
    * frame (from [[rankedTokensOf]]). */
  private[operators] def gramFrameOf(ranked: DataFrame): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    ranked
      .withColumn("h",
        (($"r" * 29791 + lead($"r", 1).over(wDoc) * 961 +
          lead($"r", 2).over(wDoc) * 31 + lead($"r", 3).over(wDoc))
          % WinnowM))
      .filter($"h".isNotNull)
      .select($"doc_id", $"pos", $"h")
  }

  private def winnowFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    // cut: the tokenize→rank→hash chain is the expensive stage and
    // BOTH election branches (full windows, short docs) read it
    val grams = graft.PlanOnly.cut(gramFrame(spark, dir)
      .select($"doc_id", $"pos", ($"h" * PosBase + $"pos").as("key")))
    val wWin = wDoc.rowsBetween(Window.currentRow, WinnowW - 1)
    val full = grams
      .withColumn("wn", count(lit(1)).over(wWin))
      .withColumn("mk", min($"key").over(wWin))
      .filter($"wn" === WinnowW)
      .select($"doc_id", $"mk")
    val short = grams.groupBy($"doc_id")
      .agg(min($"key").as("mk"), count(lit(1)).as("n"))
      .filter($"n" < WinnowW).select($"doc_id", $"mk")
    full.unionAll(short).distinct()
      .select($"doc_id", ($"mk" % PosBase).as("pos"),
        expr(s"mk div $PosBase").as("h"))
  }

  /** Document fingerprint selection by winnowing — the MOSS algorithm
    * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD '03): from every window of
    * [[WinnowW]] consecutive 4-token gram hashes, keep the minimum —
    * guaranteeing any shared run of ≥ w+3 tokens between two documents
    * shares at least one SELECTED fingerprint, at ~2/(w+1) the storage
    * of full gram shingling. The position-independent selection is what
    * MinHash cannot give: matches localize to byte offsets.
    *
    * One row per selected fingerprint (doc_id, gram pos, hash).
    * Scale shape: tokens shuffle once by doc for the gram/window pass;
    * the vocabulary decoration is a broadcast; the window holds w rows
    * of state. The 2²⁰ position base caps documents at 1M tokens —
    * chunk longer docs first (text_chunk_overlap). Density law
    * (selected/grams ≈ 1/3) and the guarantee pinned in IndexingSpec. */
  def textWinnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    winnowFrame(spark, dir).orderBy($"doc_id", $"pos")
  }

  /** Near-dup candidate pairs via shared winnow fingerprints — what
    * MOSS does with the fingerprints: bucket-join documents on
    * fingerprint hash, count distinct shared hashes per pair, keep
    * pairs sharing ≥ 8 (the fixture's clear near-dup band; random
    * small-vocab cooccurrence stays below it). Complements the
    * MinHash/SimHash cascade with the only member whose matches carry
    * POSITIONS (via text_winnow_fingerprints) for span-level verify.
    *
    * Scale shape: the pair join is bucketed by h — never all-pairs —
    * and hot fingerprints (> 20 docs: boilerplate grams) are dropped
    * before pairing, the stopword-cap posture of the banded-LSH keys;
    * candidate count is Σ_h df(h)², bounded by the cap. */
  def dedupWinnowPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the whole winnow chain (tokenize → rank → gram-hash → window
    // election) is materialized ONCE: without the cut, the h-self-join
    // below re-runs it for each side (the fingerprint frame is ~1/3 of
    // the gram count — far cheaper to materialize than to recompute)
    val f = graft.PlanOnly.cut(
      winnowFrame(spark, dir).select($"doc_id", $"h").distinct())
    val df = f.groupBy($"h").agg(count(lit(1)).as("c"))
    val cold = graft.PlanOnly.cut(
      f.join(df.filter($"c" <= 20), "h").select($"doc_id", $"h"))
    cold.select($"h", $"doc_id".as("doc_a"))
      .join(cold.select($"h", $"doc_id".as("doc_b")), "h")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= 8)
      .orderBy($"doc_a", $"doc_b")
  }

  /** The verify tier on top of [[dedupWinnowPairs]] — exact token-set
    * Jaccard over the winnow candidates (the LlmOps.exactJaccard core
    * the MinHash cascade uses), with a 0.5 duplicate verdict. Together
    * the three winnow keys are a complete select→pair→verify dedup
    * path whose every stage is oracled. The single IEEE division
    * ni/(na+nb−ni) of exactly-computed ints is correctly rounded,
    * hence cross-engine identical (the dedup_jaccard_verify precedent).
    * Scale: the verify join fans out only over candidate pairs — cost
    * tracks the (capped) candidate count, never the corpus square. */
  def dedupWinnowVerify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = dedupWinnowPairs(spark, dir)
    // cut: exactJaccard reads this frame on BOTH sides of its
    // intersection join
    val toks = graft.PlanOnly.cut(Tables.documents(spark, dir)
      .select($"doc_id",
        explode(expr("filter(split(text, ' '), w -> w <> '')")).as("sh"))
      .distinct())
    LlmOps.exactJaccard(pairs.select($"doc_a", $"doc_b"), toks)
      .join(pairs, Seq("doc_a", "doc_b"))
      .select($"doc_a", $"doc_b", $"n_shared", $"jaccard",
        when($"jaccard" >= 0.5, 1L).otherwise(0L).as("is_dup"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash signature width / band count (r = K/Bands rows per band)
    * and the affine hash family's prime modulus (= [[WinnowM]], the
    * gram-hash field). Seeds are FIXED constants shared verbatim with
    * the DuckDB oracle: aᵢ = (2654435761·(i+1)) mod P (never 0 — P is
    * prime and the base is a non-multiple), bᵢ = (40503·(2i+1)) mod P. */
  private[operators] val MinhashRepK = 16
  private[operators] val MinhashRepBands = 4
  private[graft] val MinhashRepSeeds: Seq[(Long, Long)] =
    (0 until MinhashRepK).map { i =>
      ((2654435761L * (i + 1)) % WinnowM, (40503L * (2 * i + 1)) % WinnowM)
    }

  /** Banded MinHash near-dup candidates with a fully ENGINE-REPLAYABLE
    * hash family — the graded twin of the ✖-by-design
    * `dedup_minhash_near` (whose xxhash64/murmur signatures no other
    * engine can replay): shingles are the [[gramFrame]] 4-token
    * polynomial gram hashes (the winnow field, h < 2²⁰), the K = 16
    * signature slots are minima of fixed affine maps hᵢ(x) =
    * (aᵢ·x + bᵢ) mod P over each doc's distinct shingle set (the
    * classic universal-hash MinHash family, every product < 2⁴⁰), and
    * the 4 band keys pack r = 4 consecutive slots with the base-31
    * polynomial. Candidates share ≥1 band bucket; hot buckets (> 20
    * docs — boilerplate) are dropped before pairing, the winnow
    * posture. Each candidate pair is verified in-key with the exact
    * shingle-set Jaccard in 2²⁰ fixed point — so the one dedup tier
    * that was graded only by unit laws now has a green oracle row for
    * its complete select→band→pair→verify chain.
    *
    * A band-collision pair sharing ZERO grams would be dropped by the
    * inner verify join — identically in both engines (the sigs are
    * functions of the shingle sets, so such a pair needs a base-31
    * band-hash collision; none exists in the fixture).
    *
    * Scale shape: one gram shuffle per doc for the signature aggregate
    * (all K minima in ONE map-side-combinable groupBy — the measured
    * dedup_minhash_near formulation); the pair join is bucketed by
    * (band, bh), never all-pairs, with the hot-bucket cap bounding
    * Σ df² fan-out; the verify join touches candidates only. The
    * xxhash64 production variant stays as dedup_minhash_near. */
  def dedupMinhashReplayable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut: the gram chain feeds the signature aggregate AND both sides
    // of the verify intersection join
    val sh = graft.PlanOnly.cut(
      gramFrame(spark, dir).select($"doc_id", $"h").distinct())
    // ONE pass computes all 16 signature minima AND the shingle-set
    // size the verify tier needs (a separate sizes aggregate would
    // re-shuffle the gram frame)
    val sigCols = MinhashRepSeeds.zipWithIndex.map { case ((a, b), i) =>
      min(($"h" * a + b) % WinnowM).as(s"s$i")
    } :+ count(lit(1)).as("n")
    // cut, not mark (r18): sigs feeds the band explode AND both size
    // decorations of the verify join — concurrent broadcast futures of
    // the final action would race (and duplicate) a lazy persist
    val sigs = graft.PlanOnly.cut(
      sh.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*))
    val r = MinhashRepK / MinhashRepBands
    val bandCols = (0 until MinhashRepBands).map { b =>
      struct(lit(b.toLong).as("band"),
        (col(s"s${r * b}") * 29791L + col(s"s${r * b + 1}") * 961L +
          col(s"s${r * b + 2}") * 31L + col(s"s${r * b + 3}")).as("bh"))
    }
    val banded = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bh".as("bh"))
    val bsz = banded.groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
    val cold = banded.join(bsz.filter($"c" <= 20), Seq("band", "bh"))
      .select($"band", $"bh", $"doc_id")
    val cand = cold.select($"band", $"bh", $"doc_id".as("doc_a"))
      .join(cold.select($"band", $"bh", $"doc_id".as("doc_b")),
        Seq("band", "bh"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared_bands"))
    val sizes = sigs.select($"doc_id", $"n")
    cand
      .join(sh.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sh.as("sb"), $"doc_b" === $"sb.doc_id" && $"sa.h" === $"sb.h")
      .groupBy($"doc_a", $"doc_b", $"n_shared_bands")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .withColumn("jaccard_fp",
        expr("(n_shared * 1048576) div (na + nb - n_shared)"))
      .select($"doc_a", $"doc_b", $"n_shared_bands", $"n_shared",
        $"na", $"nb", $"jaccard_fp")
      .orderBy($"doc_a", $"doc_b")
  }

  /** NEAR-DUP SIGNATURE INDEX MAINTAINED UNDER APPEND — the r16
    * verdict's top item: [[dedupMinhashReplayable]]'s band buckets
    * promoted from a per-run recomputation to a COMMITTED, VERSIONED
    * index probed by each ingest batch (the simsearch_index_maintain
    * pattern applied to the near-dup tier, closing the ingest loop
    * that previously deduplicated incrementally only at the exact
    * tier). Lifecycle: the OLD corpus slice (doc_id % 8 ≠ 7) sketches
    * once — K = 16 affine MinHash minima, 4 base-31 band keys — and
    * its band rows commit as a FILE-LEVEL TxnTable v0; the new batch
    * (doc_id % 8 = 7) sketches ONLY ITSELF (O(new) — at 100 TB this
    * is the difference between re-sketching the corpus per batch and
    * sketching the batch), probes the STORED v0 buckets by equi-join
    * on (band, bh) — hot stored buckets (> 20 docs) dropped, the
    * standing boilerplate cap — and verifies each candidate against
    * the indexed doc with the exact shingle-set Jaccard in 2²⁰ fixed
    * point. The index itself is MAINTAINED by committing the batch's
    * band rows as a DELTA manifest that carries v0's file BY
    * REFERENCE (zero rewritten rows); maintained ≡ rebuilt and
    * carried-by-reference are law-pinned in IndexingSpec. Graded =
    * the verified new-vs-indexed pairs plus the index census (v0
    * entries, appended entries), all re-derived from scratch by the
    * oracle — the hash certifies probe-the-stored-index ≡ recompute.
    *
    * The shingle hash family (vocabulary-rank polynomial) is the
    * fixture's engine-replayable stand-in for a FIXED hash (xxhash64
    * in production, where new batches hash independently); the probe
    * and verify tiers touch only batch grams + candidate index docs.
    *
    * Scale shape: the probe is |new bands| ⋈ stored buckets on the
    * band key — never corpus × corpus, never a corpus re-sketch; the
    * verify join fans out only over candidates; index maintenance is
    * one O(batch) file write + an O(changed-files) delta manifest. */
  /** The shared (doc_id, h) shingle frame of the index keys — cut: it
    * feeds both slices' signature aggregates AND both sides of the
    * verify intersection join. */
  private def mhSh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.cut(
      gramFrame(spark, dir).select($"doc_id", $"h").distinct())
  }

  /** Per-slice MinHash signatures (+ shingle count n) over the shared
    * shingle frame: the index build reads OLD grams, the probe reads
    * NEW grams — a batch never re-aggregates the corpus. */
  private def mhSigsOf(sh: DataFrame, isNew: Boolean): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sigCols = MinhashRepSeeds.zipWithIndex.map { case ((a, b), i) =>
      min(($"h" * a + b) % WinnowM).as(s"s$i")
    } :+ count(lit(1)).as("n")
    sh.filter(if (isNew) $"doc_id" % 8 === 7 else $"doc_id" % 8 =!= 7)
      .groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** Base-31 band keys of a signature frame — (doc_id, band, bh). */
  private def mhBandsOf(sigs: DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val r = MinhashRepK / MinhashRepBands
    val bandCols = (0 until MinhashRepBands).map { b =>
      struct(lit(b.toLong).as("band"),
        (col(s"s${r * b}") * 29791L + col(s"s${r * b + 1}") * 961L +
          col(s"s${r * b + 2}") * 31L + col(s"s${r * b + 3}")).as("bh"))
    }
    sigs.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bh".as("bh"))
  }

  def dedupIndexMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = mhSh(spark, dir)
    def sigsOf(isNew: Boolean): DataFrame = mhSigsOf(sh, isNew)
    def bandsOf(sigs: DataFrame): DataFrame = mhBandsOf(sigs)
    val sizes = graft.PlanOnly.cut(
      sigsOf(isNew = false).select($"doc_id", $"n")
        .unionAll(sigsOf(isNew = true).select($"doc_id", $"n")))
    def serve(idx: DataFrame, probe: DataFrame): DataFrame = {
      val bsz = idx.groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
      val cold = idx.join(bsz.filter($"c" <= 20), Seq("band", "bh"))
        .select($"band", $"bh", $"doc_id".as("doc_old"))
      val cand = probe.select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(cold, Seq("band", "bh"))
        .groupBy($"doc_new", $"doc_old")
        .agg(count(lit(1)).as("n_shared_bands"))
      val census = idx.agg(count(lit(1)).as("idx_entries"))
        .crossJoin(broadcast(probe.agg(count(lit(1)).as("new_entries"))))
      cand
        .join(sh.as("sa"), $"doc_new" === $"sa.doc_id")
        .join(sh.as("sb"), $"doc_old" === $"sb.doc_id" && $"sa.h" === $"sb.h")
        .groupBy($"doc_new", $"doc_old", $"n_shared_bands")
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select($"doc_id".as("doc_new"), $"n".as("na")),
          "doc_new")
        .join(sizes.select($"doc_id".as("doc_old"), $"n".as("nb")),
          "doc_old")
        .withColumn("jaccard_fp",
          expr("(n_shared * 1048576) div (na + nb - n_shared)"))
        .crossJoin(broadcast(census))
        .select($"doc_new", $"doc_old", $"n_shared_bands", $"n_shared",
          $"na", $"nb", $"jaccard_fp", $"idx_entries", $"new_entries")
        .orderBy($"doc_new", $"doc_old")
    }
    graft.PlanOnly.roundTrip(
      serve(bandsOf(sigsOf(isNew = false)), bandsOf(sigsOf(isNew = true)))) {
      val tIdx = Tables.scratch("dedup_band_index")
      graft.sources.TxnTable.drop(spark, tIdx)
      // both slices cut in parallel (independent sketch aggregates over
      // the shared cut gram frame — Par rationale); cutting b1 also
      // stops its double recompute (count + write + the probe below
      // each re-aggregated the batch sketch before r18)
      val (b0, b1) = Par.both(
        graft.PlanOnly.cut(bandsOf(sigsOf(isNew = false))),
        graft.PlanOnly.cut(bandsOf(sigsOf(isNew = true))))
      val (n0, n1) = (b0.count(), b1.count())
      if (n0 == 0L || n1 == 0L) {
        // degenerate fixture: no file to carry by reference — commit
        // readable table-level snapshots (the commitMaybeEmpty contract)
        graft.sources.TxnTable.commit(spark, tIdx, 0, b0)
        graft.sources.TxnTable.commit(spark, tIdx, 1, b0.unionAll(b1))
      } else {
        val p0 = s"$tIdx/data/f0"
        val p1 = s"$tIdx/data/f1"
        // distinct destinations — overlap the data writes; manifest
        // installs stay sequential (the delta chains on v0)
        Par.both(
          b0.write.mode("overwrite").parquet(p0),
          b1.write.mode("overwrite").parquet(p1))
        graft.sources.TxnTable.commitEntries(spark, tIdx, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = n0)))
        // the append: ONLY the batch's band rows are written; v0's
        // file rides in the delta manifest by reference
        graft.sources.TxnTable.commitDelta(spark, tIdx, 1,
          adds = Seq(graft.sources.TxnTable.FileEntry(1L, p1,
            Long.MinValue, Long.MaxValue, rowCount = n1)))
      }
      // the probe reads the STORED v0 buckets — a fresh batch joins
      // the committed index, never a recomputed sketch of the corpus
      serve(graft.sources.TxnTable.read(spark, tIdx, Some(0))
        .select($"doc_id", $"band", $"bh"), b1)
    }
  }

  /** SIGNATURE-INDEX OPTIMIZE — the maintenance rung ABOVE
    * [[dedupIndexMaintain]]: after appends the band index accumulates
    * small files AND hot buckets (boilerplate band keys matching > 20
    * indexed docs — the entries every probe pays to read and then
    * drops at the cap). The OPTIMIZE pass makes the cap PHYSICAL: hot
    * buckets (old-slice membership > 20, the probe's own criterion)
    * are QUARANTINED into a committed sidecar table (the persisted
    * stopword tier — auditable, revivable, never silently gone), the
    * surviving entries binpack into ONE file, and the index commits a
    * delta manifest that REMOVES f0/f1 and ADDS the compacted file —
    * the Delta OPTIMIZE / Iceberg rewrite-data-files shape on the
    * dedup index. Serving equivalence is the graded statement: the
    * probe of the COMPACTED index needs NO runtime hot-cap (the cap
    * is in the layout now) and must yield exactly the pairs the
    * capped probe of the raw index yields — pinned row-for-row
    * against [[dedupIndexMaintain]] in IndexingSpec, and re-derived
    * from scratch by the oracle together with the quarantine census.
    *
    * Scale shape: OPTIMIZE reads the index (entries, not documents),
    * writes it once; every later probe skips the hot entries by
    * LAYOUT instead of scanning-then-dropping them — at 10¹² docs the
    * boilerplate buckets are the index's heavy tail, and this is the
    * standing stopword-cap posture made durable. */
  def dedupIndexCompact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = mhSh(spark, dir)
    def b0F() = mhBandsOf(mhSigsOf(sh, isNew = false))
    def b1F() = mhBandsOf(mhSigsOf(sh, isNew = true))
    def serve(idx: DataFrame, probe: DataFrame): DataFrame = {
      // hot criterion = the probe cap's own: old-slice membership > 20
      val hot = idx.filter($"doc_id" % 8 =!= 7)
        .groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
        .filter($"c" > 20).select($"band", $"bh")
      val quarantined = idx.join(hot, Seq("band", "bh"), "left_semi")
      val compacted = idx.join(hot, Seq("band", "bh"), "left_anti")
      val census = idx.agg(count(lit(1)).as("entries_before"))
        .crossJoin(broadcast(
          quarantined.agg(count(lit(1)).as("entries_quarantined"))))
        .crossJoin(broadcast(
          hot.agg(count(lit(1)).as("buckets_quarantined"))))
      // NO runtime cap here — the compacted layout IS the cap
      probe.select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(compacted.filter($"doc_id" % 8 =!= 7)
          .select($"band", $"bh", $"doc_id".as("doc_old")),
          Seq("band", "bh"))
        .groupBy($"doc_new", $"doc_old")
        .agg(count(lit(1)).as("n_shared_bands"))
        .crossJoin(broadcast(census))
        .select($"doc_new", $"doc_old", $"n_shared_bands",
          $"entries_before", $"entries_quarantined",
          ($"entries_before" - $"entries_quarantined")
            .as("entries_after"),
          $"buckets_quarantined")
        .orderBy($"doc_new", $"doc_old")
    }
    graft.PlanOnly.roundTrip(serve(b0F().unionAll(b1F()), b1F())) {
      val tIdx = Tables.scratch("dedup_band_index2")
      val tQuar = Tables.scratch("dedup_band_quarantine")
      Seq(tIdx, tQuar).foreach(graft.sources.TxnTable.drop(spark, _))
      // both slice sketches cut in parallel; data writes overlap;
      // manifest installs stay sequential (Par rationale, r18)
      val (b0, b1) = Par.both(
        graft.PlanOnly.cut(b0F()), graft.PlanOnly.cut(b1F()))
      val (n0, n1) = (b0.count(), b1.count())
      val fileLevel = n0 > 0L && n1 > 0L
      if (!fileLevel) {
        graft.sources.TxnTable.commit(spark, tIdx, 0, b0)
        graft.sources.TxnTable.commit(spark, tIdx, 1, b0.unionAll(b1))
      } else {
        val p0 = s"$tIdx/data/f0"
        val p1 = s"$tIdx/data/f1"
        Par.both(
          b0.write.mode("overwrite").parquet(p0),
          b1.write.mode("overwrite").parquet(p1))
        graft.sources.TxnTable.commitEntries(spark, tIdx, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = n0)))
        graft.sources.TxnTable.commitDelta(spark, tIdx, 1,
          adds = Seq(graft.sources.TxnTable.FileEntry(1L, p1,
            Long.MinValue, Long.MaxValue, rowCount = n1)))
      }
      // ---- OPTIMIZE: quarantine hot buckets, binpack the rest -------
      val idx = graft.PlanOnly.cut(
        graft.sources.TxnTable.read(spark, tIdx, Some(1))
          .select($"doc_id", $"band", $"bh"))
      val hot = idx.filter($"doc_id" % 8 =!= 7)
        .groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
        .filter($"c" > 20).select($"band", $"bh")
      graft.sources.TxnTable.commit(spark, tQuar, 0,
        idx.join(hot, Seq("band", "bh"), "left_semi"))
      val compacted = idx.join(hot, Seq("band", "bh"), "left_anti")
      val nc = compacted.count()
      if (fileLevel && nc > 0L) {
        val pc = s"$tIdx/data/c0"
        compacted.write.mode("overwrite").parquet(pc)
        graft.sources.TxnTable.commitDelta(spark, tIdx, 2,
          adds = Seq(graft.sources.TxnTable.FileEntry(0L, pc,
            Long.MinValue, Long.MaxValue, rowCount = nc)),
          removes = Seq(s"$tIdx/data/f0", s"$tIdx/data/f1"))
      } else {
        graft.sources.TxnTable.commit(spark, tIdx, 2, compacted)
      }
      // probe the COMMITTED compacted snapshot — v2 serves capless
      val v2 = graft.sources.TxnTable.read(spark, tIdx, Some(2))
        .select($"doc_id", $"band", $"bh")
      val census = idx.agg(count(lit(1)).as("entries_before"))
        .crossJoin(broadcast(idx.join(hot, Seq("band", "bh"), "left_semi")
          .agg(count(lit(1)).as("entries_quarantined"))))
        .crossJoin(broadcast(
          hot.agg(count(lit(1)).as("buckets_quarantined"))))
      b1.select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(v2.filter($"doc_id" % 8 =!= 7)
          .select($"band", $"bh", $"doc_id".as("doc_old")),
          Seq("band", "bh"))
        .groupBy($"doc_new", $"doc_old")
        .agg(count(lit(1)).as("n_shared_bands"))
        .crossJoin(broadcast(census))
        .select($"doc_new", $"doc_old", $"n_shared_bands",
          $"entries_before", $"entries_quarantined",
          ($"entries_before" - $"entries_quarantined")
            .as("entries_after"),
          $"buckets_quarantined")
        .orderBy($"doc_new", $"doc_old")
    }
  }

  /** RIGHT-TO-BE-FORGOTTEN AT THE INDEX TIER — the deletion lifecycle
    * the dedup index was missing ([[dedupIndexMaintain]] appends,
    * [[dedupIndexCompact]] optimizes; production corpora also DELETE —
    * takedowns, opt-outs, licensing expiry — and a forgotten document
    * must stop matching FUTURE ingest immediately without an O(index)
    * rewrite): the old-slice band index commits file-level as v0; the
    * forget request (every indexed doc with doc_id % 5 = 0) commits as
    * a MERGE-ON-READ DELETE FILE keyed on doc_id — O(forgotten-keys)
    * bytes, zero index rows rewritten, the Iceberg v2 equality-delete
    * shape on the index table — and the new batch's probe of v1 sees
    * the forgotten entries anti-joined out transparently, so no
    * forgotten doc can ever appear as a match candidate. An OPTIMIZE
    * fold then rewrites the surviving entries into one compacted file
    * and retires the delete file (v2); serving equivalence (v1 MoR
    * probe ≡ v2 folded probe) is law-pinned in IndexingSpec. Graded =
    * the post-forget verified pairs plus the census (v0 entries,
    * forgotten keys, live entries) — the oracle re-derives the pair
    * set with the forgotten docs excluded from the index side, so the
    * hash certifies that deletion-by-delete-file ≡ deletion-by-
    * recompute.
    *
    * Scale shape: the forget commit writes O(forgotten keys); every
    * probe pays one anti-join against the (broadcast-sized) delete
    * keys until OPTIMIZE folds them; the fold reads index entries,
    * never documents. At 10¹² index rows a takedown of 10³ docs is a
    * kilobyte commit, not a table rewrite. */
  def dedupIndexForget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = mhSh(spark, dir)
    def b0F() = mhBandsOf(mhSigsOf(sh, isNew = false))
    def b1F() = mhBandsOf(mhSigsOf(sh, isNew = true))
    val sizes = graft.PlanOnly.cut(
      mhSigsOf(sh, isNew = false).select($"doc_id", $"n")
        .unionAll(mhSigsOf(sh, isNew = true).select($"doc_id", $"n")))
    def serve(idx: DataFrame, probe: DataFrame,
        census: DataFrame): DataFrame = {
      val bsz = idx.groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
      val cold = idx.join(bsz.filter($"c" <= 20), Seq("band", "bh"))
        .select($"band", $"bh", $"doc_id".as("doc_old"))
      val cand = probe.select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(cold, Seq("band", "bh"))
        .groupBy($"doc_new", $"doc_old")
        .agg(count(lit(1)).as("n_shared_bands"))
      cand
        .join(sh.as("sa"), $"doc_new" === $"sa.doc_id")
        .join(sh.as("sb"),
          $"doc_old" === $"sb.doc_id" && $"sa.h" === $"sb.h")
        .groupBy($"doc_new", $"doc_old", $"n_shared_bands")
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select($"doc_id".as("doc_new"), $"n".as("na")),
          "doc_new")
        .join(sizes.select($"doc_id".as("doc_old"), $"n".as("nb")),
          "doc_old")
        .withColumn("jaccard_fp",
          expr("(n_shared * 1048576) div (na + nb - n_shared)"))
        .crossJoin(broadcast(census))
        .select($"doc_new", $"doc_old", $"n_shared_bands", $"n_shared",
          $"na", $"nb", $"jaccard_fp", $"entries_v0", $"forgotten_keys",
          $"entries_live")
        .orderBy($"doc_new", $"doc_old")
    }
    def forgetKeysF() = b0F().select($"doc_id").distinct()
      .filter($"doc_id" % 5 === 0)
    def liveF() = b0F().join(forgetKeysF(), Seq("doc_id"), "left_anti")
    def censusF(idx0: DataFrame, live: DataFrame): DataFrame =
      idx0.agg(count(lit(1)).as("entries_v0"))
        .crossJoin(broadcast(
          forgetKeysF().agg(count(lit(1)).as("forgotten_keys"))))
        .crossJoin(broadcast(
          live.agg(count(lit(1)).as("entries_live"))))
    graft.PlanOnly.roundTrip(
      serve(liveF(), b1F(), censusF(b0F(), liveF()))) {
      val tIdx = Tables.scratch("dedup_forget_index")
      graft.sources.TxnTable.drop(spark, tIdx)
      val b0 = graft.PlanOnly.cut(b0F())
      val n0 = b0.count()
      if (n0 == 0L) {
        // degenerate fixture: table-level snapshots, no delete files
        graft.sources.TxnTable.commit(spark, tIdx, 0, b0)
        graft.sources.TxnTable.commit(spark, tIdx, 1, b0)
        serve(graft.sources.TxnTable.read(spark, tIdx, Some(1))
            .select($"doc_id", $"band", $"bh"),
          b1F(), censusF(b0, liveF()))
      } else {
        val p0 = s"$tIdx/data/f0"
        b0.write.mode("overwrite").parquet(p0)
        graft.sources.TxnTable.commitEntries(spark, tIdx, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = n0)))
        // the FORGET: an O(keys) delete-file commit, zero rows rewritten
        val pd = s"$tIdx/data/forget0"
        forgetKeysF().write.mode("overwrite").parquet(pd)
        graft.sources.TxnTable.commitDelta(spark, tIdx, 1,
          delAdds = Seq(graft.sources.TxnTable.DeleteFile(pd, "doc_id")))
        // OPTIMIZE: fold the delete into a compacted rewrite (v2) —
        // IndexingSpec pins v1-serve ≡ v2-serve
        val live = graft.PlanOnly.cut(
          graft.sources.TxnTable.read(spark, tIdx, Some(1))
            .select($"doc_id", $"band", $"bh"))
        val nl = live.count()
        if (nl > 0L) {
          val pc = s"$tIdx/data/c0"
          live.write.mode("overwrite").parquet(pc)
          graft.sources.TxnTable.commitDelta(spark, tIdx, 2,
            adds = Seq(graft.sources.TxnTable.FileEntry(0L, pc,
              Long.MinValue, Long.MaxValue, rowCount = nl)),
            removes = Seq(p0), delRemoves = Seq(pd))
        } else graft.sources.TxnTable.commit(spark, tIdx, 2, live)
        // graded serve reads the MoR v1 (delete file still live) —
        // the transparently-anti-joined path
        serve(graft.sources.TxnTable.read(spark, tIdx, Some(1))
            .select($"doc_id", $"band", $"bh"),
          b1F(), censusF(b0, live))
      }
    }
  }

  /** INCREMENTAL INGEST GATE AT THE NEAR-DUP TIER — the capstone the
    * index keys build toward: [[dedupIndexMaintain]] proves a batch
    * can PROBE the stored index; this key closes the loop into the
    * admission policy a 100 TB corpus ingest actually runs. The seed
    * slice (doc_id % 4 = 0) commits as the index v0; then THREE
    * ingest waves (doc_id % 4 = 1, 2, 3) arrive in order, and each
    * wave (1) sketches only itself, (2) probes the CURRENT stored
    * index (hot buckets > 20 members dropped — the standing cap, now
    * on the growing index), (3) verifies candidates with exact
    * shingle Jaccard, (4) runs the INTRA-WAVE self-check the r17
    * verdict named as the gate's blind spot — the wave's OWN band
    * keys self-join under the same hot-cap discipline (wave-internal
    * bucket membership > 20 dropped), verified pairs with the same
    * fixed-point Jaccard, and a doc is intra-dominated iff it has ANY
    * verified same-wave near-dup with a SMALLER doc_id (first-id-wins
    * — at 10⁹ docs/day with bursty crawls, same-batch dups are the
    * COMMON case, and neither copy is indexed when the wave probes,
    * so the stored-index probe alone would admit both) — then (5)
    * ADMITS exactly the docs with zero stored-index dup hits AND zero
    * intra-wave hits (both tiers at ≥ 0.5 fixed point), and (6)
    * appends ONLY the admitted docs' band rows as a delta commit — so
    * wave 3 is gated by wave 1's and 2's admissions, the sequential
    * dependence that makes this a GATE rather than a report. A
    * zero-admission wave commits an EMPTY delta (the index is
    * unchanged; every prior file carries by reference), so one quiet
    * wave never downgrades later waves to O(index) snapshot rewrites.
    * Graded = the per-doc admission log (wave, doc, candidates, dup
    * hits, intra-wave hits, admitted); the oracle unrolls all three
    * waves from scratch, certifying the stored-index fold ≡ the
    * recompute of the whole admission history.
    *
    * Scale shape: per wave the work is O(batch sketch) + a band-key
    * equi-join against stored buckets + candidate-only verify, plus
    * the intra-wave band self-join — batch × batch ONLY through
    * hot-capped shared buckets (Σ capped-bucket², never |batch|²),
    * the same bound every band tier carries — the corpus is never
    * re-read; the index grows by O(admitted) rows per wave behind
    * O(changed-files) delta manifests (an empty delta when a wave
    * admits nothing). Rejected docs cost ZERO index bytes — the
    * gate's point: at 10⁹ docs/day the index only ever holds the
    * deduplicated corpus. */
  def dedupIngestGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-consumer dag builders (the planonly-self-join contract):
    // graded mode shares ONE cut chain; plan-only rebuilds per use
    def shF() = gramFrame(spark, dir).select($"doc_id", $"h").distinct()
    val shShared =
      if (graft.PlanOnly.enabled) null else graft.PlanOnly.cut(shF())
    def sh() = if (graft.PlanOnly.enabled) shF() else shShared
    def sigsAllF() = {
      val sigCols = MinhashRepSeeds.zipWithIndex.map { case ((a, b), i) =>
        min(($"h" * a + b) % WinnowM).as(s"s$i")
      } :+ count(lit(1)).as("n")
      sh().groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
    }
    // cut, not mark (r18): every wave's probe/verify plan nests this
    // frame ~6× (bands ×3, sizes ×2, verify sides) — an eager
    // checkpoint truncates the analyzed tree once instead of paying
    // analyzer time on the nested signature subtree per wave
    val sigsShared =
      if (graft.PlanOnly.enabled) null
      else graft.PlanOnly.cut(sigsAllF())
    def sigsAll() = if (graft.PlanOnly.enabled) sigsAllF() else sigsShared
    def bandsAll() = mhBandsOf(sigsAll())
    def sizes() = sigsAll().select($"doc_id", $"n")
    val docIds = Tables.documents(spark, dir).select($"doc_id")
    def waveRows(k: Int, idx: DataFrame): DataFrame = {
      val bsz = idx.groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
      val cold = idx.join(bsz.filter($"c" <= 20), Seq("band", "bh"))
        .select($"band", $"bh", $"doc_id".as("doc_old"))
      val cand = bandsAll().filter($"doc_id" % 4 === k)
        .select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(cold, Seq("band", "bh"))
        .select($"doc_new", $"doc_old").distinct()
      val nc = cand.groupBy($"doc_new")
        .agg(count(lit(1)).as("n_candidates"))
      val nd = cand
        .join(sh().as("sa"), $"doc_new" === $"sa.doc_id")
        .join(sh().as("sb"),
          $"doc_old" === $"sb.doc_id" && $"sa.h" === $"sb.h")
        .groupBy($"doc_new", $"doc_old").agg(count(lit(1)).as("ni"))
        .join(sizes().select($"doc_id".as("doc_new"), $"n".as("na")),
          "doc_new")
        .join(sizes().select($"doc_id".as("doc_old"), $"n".as("nb")),
          "doc_old")
        .filter(expr("(ni * 1048576) div (na + nb - ni)") >= 524288L)
        .groupBy($"doc_new").agg(count(lit(1)).as("n_dup_hits"))
      // intra-wave self-check: the wave's own band keys, same hot-cap
      // discipline, same verify tier; a doc counts a hit per verified
      // same-wave near-dup with a SMALLER doc_id (first-id-wins)
      val wb = bandsAll().filter($"doc_id" % 4 === k)
      val wbsz = wb.groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
      val wcold = wb.join(wbsz.filter($"c" <= 20), Seq("band", "bh"))
        .select($"band", $"bh", $"doc_id")
      val wcand = wcold.select($"band", $"bh", $"doc_id".as("doc_new"))
        .join(wcold.select($"band", $"bh", $"doc_id".as("doc_old")),
          Seq("band", "bh"))
        .filter($"doc_old" < $"doc_new")
        .select($"doc_new", $"doc_old").distinct()
      val wi = wcand
        .join(sh().as("wa"), $"doc_new" === $"wa.doc_id")
        .join(sh().as("wz"),
          $"doc_old" === $"wz.doc_id" && $"wa.h" === $"wz.h")
        .groupBy($"doc_new", $"doc_old").agg(count(lit(1)).as("ni"))
        .join(sizes().select($"doc_id".as("doc_new"), $"n".as("na")),
          "doc_new")
        .join(sizes().select($"doc_id".as("doc_old"), $"n".as("nb")),
          "doc_old")
        .filter(expr("(ni * 1048576) div (na + nb - ni)") >= 524288L)
        .groupBy($"doc_new").agg(count(lit(1)).as("intra_wave_hits"))
      docIds.filter($"doc_id" % 4 === k)
        .join(nc.withColumnRenamed("doc_new", "doc_id"),
          Seq("doc_id"), "left")
        .join(nd.withColumnRenamed("doc_new", "doc_id"),
          Seq("doc_id"), "left")
        .join(wi.withColumnRenamed("doc_new", "doc_id"),
          Seq("doc_id"), "left")
        .select(lit(k.toLong).as("wave"), $"doc_id",
          coalesce($"n_candidates", lit(0L)).as("n_candidates"),
          coalesce($"n_dup_hits", lit(0L)).as("n_dup_hits"),
          coalesce($"intra_wave_hits", lit(0L)).as("intra_wave_hits"))
        .withColumn("admitted",
          when($"n_dup_hits" === 0L && $"intra_wave_hits" === 0L, 1L)
            .otherwise(0L))
    }
    def admBands(k: Int, rows: DataFrame): DataFrame =
      bandsAll().filter($"doc_id" % 4 === k)
        .join(rows.filter($"admitted" === 1L).select($"doc_id"),
          Seq("doc_id"), "left_semi")
    def shape(df: DataFrame): DataFrame = df
      .select($"wave", $"doc_id", $"n_candidates", $"n_dup_hits",
        $"intra_wave_hits", $"admitted")
      .orderBy($"wave", $"doc_id")
    def equivalent = {
      var idx = graft.PlanOnly.cut(bandsAll().filter($"doc_id" % 4 === 0))
      val waves = (1 to 3).map { k =>
        val rows = graft.PlanOnly.cut(waveRows(k, idx))
        idx = graft.PlanOnly.cut(idx.unionAll(admBands(k, rows)))
        rows
      }
      shape(waves.reduce(_.unionByName(_)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val tIdx = Tables.scratch("dedup_ingest_index")
      graft.sources.TxnTable.drop(spark, tIdx)
      val seed = graft.PlanOnly.cut(bandsAll().filter($"doc_id" % 4 === 0))
      val nSeed = seed.count()
      var chainFileLevel = nSeed > 0L
      if (chainFileLevel) {
        val p0 = s"$tIdx/data/f0"
        seed.write.mode("overwrite").parquet(p0)
        graft.sources.TxnTable.commitEntries(spark, tIdx, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = nSeed)))
      } else graft.sources.TxnTable.commit(spark, tIdx, 0, seed)
      val waves = (1 to 3).map { k =>
        // the wave probes the STORED index at its current version —
        // gated by every earlier wave's admissions
        val idx = graft.PlanOnly.cut(
          graft.sources.TxnTable.read(spark, tIdx, Some(k - 1))
            .select($"doc_id", $"band", $"bh"))
        val rows = graft.PlanOnly.cut(waveRows(k, idx))
        val ab = admBands(k, rows)
        val nab = ab.count()
        if (chainFileLevel && nab > 0L) {
          val pk = s"$tIdx/data/f$k"
          ab.write.mode("overwrite").parquet(pk)
          graft.sources.TxnTable.commitDelta(spark, tIdx, k,
            adds = Seq(graft.sources.TxnTable.FileEntry(k.toLong, pk,
              Long.MinValue, Long.MaxValue, rowCount = nab)))
        } else if (chainFileLevel) {
          // zero-admission wave: the index is UNCHANGED — an EMPTY
          // delta keeps every prior file by reference and keeps the
          // chain file-level, so the NEXT admitting wave commits an
          // O(batch) delta (r17 verdict: one quiet wave must never
          // downgrade later waves to O(index) snapshot rewrites)
          graft.sources.TxnTable.commitDelta(spark, tIdx, k)
        } else if (nab > 0L) {
          // table-level base (empty seed): RE-ENTER the delta chain by
          // committing the union ONCE as a self-contained file-level
          // snapshot; later waves chain deltas on top of it
          val union = graft.PlanOnly.cut(idx.unionAll(ab))
          val nu = union.count()
          val pk = s"$tIdx/data/s$k"
          union.write.mode("overwrite").parquet(pk)
          graft.sources.TxnTable.commitEntries(spark, tIdx, k,
            Seq(graft.sources.TxnTable.FileEntry(k.toLong, pk,
              Long.MinValue, Long.MaxValue, rowCount = nu)))
          chainFileLevel = true
        } else {
          // empty index AND empty wave: stay table-level (nothing to
          // reference; the commitMaybeEmpty contract)
          graft.sources.TxnTable.commit(spark, tIdx, k, idx.unionAll(ab))
        }
        rows
      }
      shape(waves.reduce(_.unionByName(_)))
    }
  }

  /** The four 16-bit SimHash block scramblers — fixed odd multipliers
    * (Knuth/xxhash-family primes) shared verbatim with the oracle:
    * block j's per-token hash is bits 8..23 of r·K_j, i.e.
    * ((r·K_j) div 256) mod 2¹⁶ — multiplicative hashing's high-quality
    * middle bits, every step exact BIGINT. */
  private[graft] val SimhashRepKs: Seq[Long] =
    Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)

  /** SimHash near-dup detection with a fully ENGINE-REPLAYABLE hash
    * family — the graded twin of the ✖-by-design `dedup_simhash`
    * (whose 64-bit fingerprint rides Spark's xxhash64): per document,
    * each distinct token's vocabulary rank r scrambles through the
    * four fixed multipliers into four 16-bit hashes; each of the 64
    * bit positions sign-aggregates (+1 if set, −1 if not, ties → 1),
    * giving four 16-bit fingerprint blocks. Candidates share at least
    * one identical block (the same 4-block pigeonhole as the
    * production key: hamming ≤ 3 ⇒ some block equal), hot block
    * buckets (> 20 docs) are dropped pre-pairing, and the verify tier
    * is the exact hamming distance Σ_j bit_count(bv_aj ⊕ bv_bj) ≤ 3.
    * Keeping the fingerprint as four BIGINT blocks (never assembled
    * into one 64-bit word) sidesteps the sign-bit overflow that a
    * 2⁶³ shift would hit in engines with checked arithmetic.
    *
    * Scale shape: ONE pass over the distinct (doc, token-rank) frame
    * computes all 64 bit sums map-side (declarative sum(when)
    * columns); the pair join is bucketed by (block, value) with the
    * hot-bucket cap bounding Σ df²; hamming verify touches candidate
    * pairs only. The xxhash64 production variant stays as
    * dedup_simhash. */
  def dedupSimhashReplayable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rk = rankedTokens(spark, dir).select($"doc_id", $"r").distinct()
      .select(($"doc_id" +: (0 until 4).map(j =>
        expr(s"((r * ${SimhashRepKs(j)}L) div 256) % 65536").as(s"h_$j"))): _*)
    val bitSums = (for { j <- 0 until 4; b <- 0 until 16 } yield
      sum(when(expr(s"(h_$j div ${1L << b}) % 2") === 1L, 1L).otherwise(-1L))
        .as(s"s_${j}_$b")).toSeq
    val bits = rk.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val bvCols = (0 until 4).map { j =>
      (0 until 16).map(b =>
        when(col(s"s_${j}_$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"bv_$j")
    }
    // cut, not mark (r18): the signature frame feeds the block
    // buckets AND both sides of the hamming verify join — concurrent
    // broadcast futures racing a lazy persist would each recompute the
    // 64-bit-sum aggregate; the eager checkpoint computes it once
    val sig = graft.PlanOnly.cut(bits.select(($"doc_id" +: bvCols): _*))
    val blk = sig.select($"doc_id", explode(array((0 until 4).map(j =>
        struct(lit(j.toLong).as("j"), col(s"bv_$j").as("bv"))): _*)).as("k"))
      .select($"doc_id", $"k.j".as("j"), $"k.bv".as("bv"))
    val bsz = blk.groupBy($"j", $"bv").agg(count(lit(1)).as("c"))
    val cold = blk.join(bsz.filter($"c" <= 20), Seq("j", "bv"))
      .select($"j", $"bv", $"doc_id")
    val cand = cold.select($"j", $"bv", $"doc_id".as("doc_a"))
      .join(cold.select($"j", $"bv", $"doc_id".as("doc_b")), Seq("j", "bv"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    val sa = sig.select(($"doc_id".as("doc_a")) +:
      (0 until 4).map(j => col(s"bv_$j").as(s"a_$j")): _*)
    val sb = sig.select(($"doc_id".as("doc_b")) +:
      (0 until 4).map(j => col(s"bv_$j").as(s"b_$j")): _*)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("hamming", (0 until 4).map(j =>
        bit_count(col(s"a_$j").bitwiseXOR(col(s"b_$j"))).cast("long"))
        .reduce(_ + _))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Bigram language-model count tables — the Kneser–Ney sufficient
    * statistics a count-based LM (or the data side of a modern
    * tokenizer/contamination analysis) needs per bigram type: the raw
    * bigram count c(w1 w2), the left-context mass c(w1 •) it is
    * normalized by, and the two CONTINUATION type counts — N1+(• w2)
    * (how many distinct left contexts w2 follows: the KN unigram
    * numerator) and N1+(w1 •) (w1's right fan-out: the KN backoff
    * weight numerator). Counts only, no smoothing division — the exact
    * integers every smoothing variant is computed from.
    *
    * Adjacency is over the RAW split array (the inverted-index position
    * posture), so both engines see identical pairs; all-'' pairs are
    * dropped after pairing. Scale shape: one doc_id-partitioned lead
    * window forms bigram tokens, which collapse map-side to bigram
    * TYPES (≤|vocab|² rows, here ≤961); the three context statistics
    * are windows over that tiny type frame, never the corpus. */
  def textBigramLmCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"p0")
    val types = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "w1")))
      .withColumn("w2", lead($"w1", 1).over(wDoc))
      .filter($"w2".isNotNull && $"w1" =!= "" && $"w2" =!= "")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_bigram"))
    types
      .withColumn("c_left_ctx", sum($"c_bigram")
        .over(Window.partitionBy($"w1")))
      .withColumn("n_cont_right", count(lit(1))
        .over(Window.partitionBy($"w1")).cast("long"))
      .withColumn("n_cont_left", count(lit(1))
        .over(Window.partitionBy($"w2")).cast("long"))
      .select($"w1", $"w2", $"c_bigram", $"c_left_ctx",
        $"n_cont_left", $"n_cont_right")
      .orderBy($"w1", $"w2")
  }

  /** Count-based LM QUALITY SCORE per document — the CCNet-style
    * perplexity filter without the logarithm (transcendentals are
    * banned from oracled outputs): each bigram instance scores the
    * fixed-point conditional frequency ⌊2²⁰·c(w1 w2)/c(w1 •)⌋ from the
    * CORPUS-level tables ([[textBigramLmCounts]]'s sufficient
    * statistics), and a document's coherence is the floor-mean over
    * its instances — text whose transitions the corpus has seen scores
    * high, word salad and boilerplate mashups score low. The same
    * gating signal a perplexity filter provides, in exact integer
    * arithmetic both engines replay bit-for-bit.
    *
    * Scale shape: instances collapse to bigram TYPES map-side before
    * the stats window (≤\|V\|² rows); the instance→type decoration is
    * an equi-join on the bigram key (broadcast at fixture scale,
    * co-partitioned shuffle at corpus scale); the per-doc fold is one
    * doc_id aggregate. No corpus-scale window. */
  def qualityBigramCoherence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"p0")
    // cut, not mark (r19, X6): the instance frame feeds the type-count
    // aggregate (the decoration join's BROADCAST build at fixture
    // scale) AND the probe side — a broadcast future racing a lazy
    // persist re-runs the corpus tokenization + lead window
    val inst = graft.PlanOnly.cut(Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "w1")))
      .withColumn("w2", lead($"w1", 1).over(wDoc))
      .filter($"w2".isNotNull && $"w1" =!= "" && $"w2" =!= "")
      .select($"doc_id", $"w1", $"w2"))
    val types = inst.groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c_bigram"))
      .withColumn("c_left", sum($"c_bigram").over(Window.partitionBy($"w1")))
      .withColumn("score_fp", expr("(c_bigram * 1048576) div c_left"))
      .select($"w1", $"w2", $"score_fp")
    inst.join(types, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"score_fp").as("score_sum_fp"))
      .select($"doc_id", $"n_bigrams", $"score_sum_fp",
        expr("score_sum_fp div n_bigrams").as("coherence_fp"))
      .orderBy($"doc_id")
  }

  /** Phrase search through the positional index — the query the
    * position lists of [[textInvertedIndex]] exist to answer: find every
    * document containing an exact 3-word phrase, with its occurrence
    * count and first position. The phrase itself is data-driven and
    * deterministic: the corpus's most frequent trigram, elected by
    * (count desc, trigram asc) — the BPE-election total order.
    * Overlapping occurrences count separately (position semantics, both
    * engines agree by construction).
    *
    * Scale shape: trigram tokens come from the same doc_id-partitioned
    * window pass (two leads, one shuffle); the election is a global
    * top-1 (TakeOrderedAndProject over map-side-combined counts, never
    * a single-partition sort) whose 1-row winner BROADCASTS back as the
    * filter — at 100 TB this is "scan the positional index for one
    * term and verify adjacency", never a re-scan per query. */
  def textPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"p0")
    // cut, not mark (r19, X6): the 1-row election winner BROADCASTS
    // into the match scan that probes the same frame — the racing
    // future would re-run the corpus trigram window
    val tri = graft.PlanOnly.cut(Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "w1")))
      .withColumn("w2", lead($"w1", 1).over(wDoc))
      .withColumn("w3", lead($"w1", 2).over(wDoc))
      .filter($"w3".isNotNull && $"w1" =!= "" && $"w2" =!= "" &&
        $"w3" =!= "")
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"),
        $"w1", $"w2", $"w3"))
    val top = tri.groupBy($"w1", $"w2", $"w3")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"w1", $"w2", $"w3")
      .limit(1)
      .select($"w1".as("t1"), $"w2".as("t2"), $"w3".as("t3"))
    tri.crossJoin(broadcast(top))
      .filter($"w1" === $"t1" && $"w2" === $"t2" && $"w3" === $"t3")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min($"pos").as("first_pos"),
        first(concat_ws(" ", $"t1", $"t2", $"t3")).as("phrase"))
      .select($"doc_id", $"phrase", $"n_occurrences", $"first_pos")
      .orderBy($"doc_id")
  }

  /** CONTENT-DEFINED CHUNKING, graded — the rsync / FastCDC boundary
    * rule at token grain, the primitive that makes byte-store dedup
    * insertion-stable (fixed-size chunking shifts every boundary after
    * an insert; content-defined boundaries realign): a rolling hash
    * over the last 4 tokens (the replayable 131·len+ascii family, four
    * coprime multipliers) declares a chunk boundary wherever
    * H % 8 = 0 — expected ~8-token chunks whose edges depend only on
    * LOCAL content. Each chunk carries a position-weighted content
    * hash and its corpus-wide duplicate count ((chash, len) match) —
    * the sharing census a chunk store would see. Boundary → chunk-id
    * assignment is the gap-island cumsum over the PRECEDING boundary
    * flags (a boundary closes its chunk; the next token opens a new
    * one).
    *
    * Scale shape: per-document windows only (lag×3 + one cumsum —
    * token grain, never corpus grain); the duplicate census is one
    * (chash, len) aggregate over chunk-grain rows, ~tokens/8 of them. */
  def textCdcChunking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("rp", "t")))
      .filter($"t" =!= "")
      .select($"doc_id", $"rp",
        (length($"t") * 131 + ascii(substring($"t", 1, 1)) +
          ascii(substring($"t", -1, 1)) * 7).cast("long").as("v"))
      .createOrReplaceTempView("cdc_tok")
    spark.sql(cdcSql("cdc_tok"))
  }

  /** Shared CDC SQL over a (doc_id, rp, v) token frame — pure %, no
    * engine-specific division, so Spark and DuckDB run it verbatim. */
  private[graft] def cdcSql(tok: String): String =
    s"""WITH s AS (SELECT doc_id, v,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY rp) AS pos
       |  FROM $tok),
       |r AS (SELECT doc_id, v, pos,
       |    CASE WHEN pos >= 4 AND
       |      (v * 41 + lag(v, 1) OVER w * 37 + lag(v, 2) OVER w * 31
       |       + lag(v, 3) OVER w * 29) % 8 = 0 THEN 1 ELSE 0 END AS b
       |  FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |c AS (SELECT doc_id, v, pos,
       |    1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
       |  FROM r),
       |g AS (SELECT doc_id, cid, min(pos) AS start_pos,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    (sum(v * pos) - (min(pos) - 1) * sum(v)) % 2147483647 AS chash
       |  FROM c GROUP BY 1, 2),
       |d AS (SELECT chash, n_tokens, CAST(count(*) AS BIGINT) AS dup_count
       |  FROM g GROUP BY 1, 2)
       |SELECT g.doc_id, CAST(g.cid AS BIGINT) AS chunk_idx,
       |  CAST(g.start_pos AS BIGINT) AS start_pos, g.n_tokens,
       |  CAST(g.chash AS BIGINT) AS chash, d.dup_count
       |FROM g JOIN d ON g.chash = d.chash AND g.n_tokens = d.n_tokens
       |ORDER BY g.doc_id, chunk_idx""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "text_cdc_chunking" -> (textCdcChunking(_, _)),
    "text_bigram_lm_counts" -> (textBigramLmCounts(_, _)),
    "quality_bigram_coherence" -> (qualityBigramCoherence(_, _)),
    "text_phrase_search" -> (textPhraseSearch(_, _)),
    "text_winnow_fingerprints" -> (textWinnowFingerprints(_, _)),
    "dedup_winnow_verify" -> (dedupWinnowVerify(_, _)),
    "dedup_winnow_pairs" -> (dedupWinnowPairs(_, _)),
    "dedup_minhash_replayable" -> (dedupMinhashReplayable(_, _)),
    "dedup_index_maintain" -> (dedupIndexMaintain(_, _)),
    "dedup_index_forget" -> (dedupIndexForget(_, _)),
    "dedup_index_compact" -> (dedupIndexCompact(_, _)),
    "dedup_ingest_gate" -> (dedupIngestGate(_, _)),
    "dedup_simhash_replayable" -> (dedupSimhashReplayable(_, _)),
    "text_inverted_index" -> (textInvertedIndex(_, _)),
    "text_bpe_merge_step" -> (textBpeMergeStep(_, _)),
    "text_bpe_merge_loop" -> (textBpeMergeLoop(_, _)),
    "text_bpe_tokenize" -> (textBpeTokenize(_, _)),
    "text_index_delta_merge" -> (textIndexDeltaMerge(_, _))
  )

  /** DuckDB replay of the shared BPE training chain ([[bpeTrain]]): the
    * same word-frequency table, double-space piece encoding, and
    * (count desc, pair asc) election, unrolled to [[BpeIterations]] CTE
    * generations. Both BPE oracles append their own final SELECT. */
  private def bpeChainSql(n: Int): String = {
    val head =
      """WITH w0 AS (SELECT w, count(*) AS freq FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |s0 AS (SELECT w,
        |    ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ' AS s,
        |    freq FROM w0)""".stripMargin
    val iters = (1 to n).map { i =>
      s"""p$i AS (SELECT ps[j] AS a, ps[j + 1] AS b, freq FROM
         |  (SELECT ps, freq, unnest(generate_series(1, len(ps) - 1)) AS j
         |   FROM (SELECT string_split(trim(s), '  ') AS ps, freq FROM s${i - 1})
         |   WHERE len(ps) >= 2)),
         |c$i AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM p$i GROUP BY a, b),
         |b$i AS (SELECT a AS ba, b AS bb, cnt FROM c$i
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |s$i AS (SELECT w, replace(s, ' ' || ba || '  ' || bb || ' ',
         |    ' ' || ba || bb || ' ') AS s, freq FROM s${i - 1}, b$i),
         |t$i AS (SELECT CAST($i AS BIGINT) AS iter, ba AS a, bb AS b, cnt,
         |  (SELECT CAST(sum((len(string_split(trim(s), '  ')) - 1) * freq)
         |     AS BIGINT) FROM s$i) AS pairs_after FROM b$i)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$iters"
  }

  private def bpeLoopOracle(n: Int): String = {
    val union = (1 to n).map(i => s"SELECT * FROM t$i").mkString(" UNION ALL ")
    s"${bpeChainSql(n)}\n$union ORDER BY iter"
  }

  private def bpeTokenizeOracle(n: Int): String =
    s"""${bpeChainSql(n)}
       |SELECT w AS word, freq,
       |  array_to_string(string_split(trim(s), '  '), ' ') AS tokens,
       |  CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_pieces
       |FROM s$n ORDER BY word""".stripMargin

  /** The from-scratch full-corpus index build — shared verbatim between
    * text_inverted_index and text_index_delta_merge: for the latter the
    * graded hash-match IS the `merge(standing, delta) == rebuild` law. */
  private val invertedIndexOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
      |    FROM documents),
      |tok AS (SELECT doc_id, unnest(generate_series(1, len(ts))) AS pos, ts
      |  FROM toks),
      |hit AS (SELECT doc_id, pos, ts[pos] AS term FROM tok
      |  WHERE ts[pos] <> ''),
      |perdoc AS (SELECT term, doc_id, count(*) AS n,
      |    string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS poss
      |  FROM hit GROUP BY term, doc_id)
      |SELECT term, count(*) AS df, CAST(sum(n) AS BIGINT) AS n_occurrences,
      |  string_agg(CAST(doc_id AS VARCHAR) || ':' || poss, '|'
      |    ORDER BY doc_id) AS postings
      |FROM perdoc GROUP BY term ORDER BY term""".stripMargin

  /** DuckDB replay of the shared winnowing chain ([[winnowFrame]]):
    * same vocabulary ranks, polynomial gram hash, packed (h, pos) key,
    * and w-window min election. Both winnow oracles append their own
    * final SELECT after the `fp` CTE. */
  private val winnowChainSql: String = "WITH " + winnowChainCtes("documents")

  /** The same chain as a CTE LIST over an arbitrary doc source (a table
    * name or a prior CTE), so composite oracles can prepend their own
    * CTEs — shared with the dedup-cascade cost receipt. */
  private[operators] def winnowChainCtes(docSrc: String): String =
    s"""toks0 AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS t
      |  FROM $docSrc),
      |toks AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
      |  FROM toks0 WHERE len(t) >= 1),
      |tok AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM toks),
      |vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS r
      |  FROM (SELECT DISTINCT tok FROM tok)),
      |rk AS (SELECT doc_id, pos, r FROM tok JOIN vocab USING (tok)),
      |g AS (SELECT doc_id, pos,
      |    (r * 29791 + lead(r, 1) OVER w * 961 +
      |     lead(r, 2) OVER w * 31 + lead(r, 3) OVER w) % 1048573 AS h
      |  FROM rk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |grams AS (SELECT doc_id, pos, h * 1048576 + pos AS key
      |  FROM g WHERE h IS NOT NULL),
      |win AS (SELECT doc_id, count(*) OVER wf AS wn, min(key) OVER wf AS mk
      |  FROM grams WINDOW wf AS (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
      |fullsel AS (SELECT DISTINCT doc_id, mk FROM win WHERE wn = 5),
      |shortsel AS (SELECT doc_id, min(key) AS mk FROM grams
      |  GROUP BY doc_id HAVING count(*) < 5),
      |sel AS (SELECT doc_id, mk FROM fullsel
      |  UNION SELECT doc_id, mk FROM shortsel),
      |fp AS (SELECT doc_id, CAST(mk % 1048576 AS BIGINT) AS pos,
      |    CAST(mk // 1048576 AS BIGINT) AS h FROM sel)""".stripMargin

  /** DuckDB replay of [[dedupSimhashReplayable]], generated from the
    * SAME [[SimhashRepKs]] constants and bit arithmetic as the Spark
    * side — 64 sign-aggregated bit sums, 4 block assemblies, the
    * hot-bucket cap, and the block-bucket pair join + hamming verify. */
  private def simhashRepOracle: String = {
    val bitSums = (for { j <- 0 until 4; b <- 0 until 16 } yield
      s"CAST(sum(CASE WHEN (((((r * ${SimhashRepKs(j)}) // 256) % 65536)" +
        s" // ${1L << b}) % 2) = 1 THEN 1 ELSE -1 END) AS BIGINT)" +
        s" AS s_${j}_$b").mkString(",\n    ")
    val bvs = (0 until 4).map { j =>
      (0 until 16).map(b =>
        s"CASE WHEN s_${j}_$b >= 0 THEN ${1L << b} ELSE 0 END")
        .mkString("(", " + ", s") AS bv_$j")
    }.mkString(",\n    ")
    winnowChainSql + s""",
rk2 AS (SELECT DISTINCT doc_id, r FROM rk),
bits AS (SELECT doc_id,
    $bitSums
  FROM rk2 GROUP BY doc_id),
sig AS (SELECT doc_id,
    $bvs
  FROM bits),
blk AS (SELECT doc_id, k.j,
    CASE k.j WHEN 0 THEN bv_0 WHEN 1 THEN bv_1
             WHEN 2 THEN bv_2 ELSE bv_3 END AS bv
  FROM sig, (VALUES (0), (1), (2), (3)) k(j)),
bsz AS (SELECT j, bv, count(*) AS c FROM blk GROUP BY j, bv),
cold AS (SELECT b.j, b.bv, b.doc_id FROM blk b
  JOIN bsz USING (j, bv) WHERE bsz.c <= 20),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cold a JOIN cold b
    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id),
ham AS (SELECT c.doc_a, c.doc_b,
    CAST(bit_count(xor(sa.bv_0, sb.bv_0)) +
         bit_count(xor(sa.bv_1, sb.bv_1)) +
         bit_count(xor(sa.bv_2, sb.bv_2)) +
         bit_count(xor(sa.bv_3, sb.bv_3)) AS BIGINT) AS hamming
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, hamming FROM ham
WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
  }

  /** The three ingest waves unrolled: idx₁ = seed bands; per wave k —
    * hot-cap on the CURRENT index, candidate join, Jaccard-verified
    * dup hits, admission, and idx_{k+1} = idx_k ∪ admitted bands. */
  private def ingestGateOracle: String = {
    def wave(k: Int): String =
      s"""bsz$k AS (SELECT band, bh, count(*) AS c FROM idx$k
         |  GROUP BY band, bh),
         |cold$k AS (SELECT i.band, i.bh, i.doc_id FROM idx$k i
         |  JOIN bsz$k USING (band, bh) WHERE bsz$k.c <= 20),
         |cand$k AS (SELECT DISTINCT n.doc_id AS dn, o.doc_id AS dd
         |  FROM band n JOIN cold$k o
         |    ON n.band = o.band AND n.bh = o.bh
         |  WHERE n.doc_id % 4 = $k),
         |nc$k AS (SELECT dn, CAST(count(*) AS BIGINT) AS nc
         |  FROM cand$k GROUP BY dn),
         |dup$k AS (SELECT c.dn, c.dd
         |  FROM cand$k c JOIN shg a ON a.doc_id = c.dn
         |  JOIN shg b2 ON b2.doc_id = c.dd AND b2.h = a.h
         |  JOIN szd na ON na.doc_id = c.dn
         |  JOIN szd nb ON nb.doc_id = c.dd
         |  GROUP BY c.dn, c.dd, na.n, nb.n
         |  HAVING (count(*) * 1048576) // (na.n + nb.n - count(*))
         |    >= 524288),
         |nd$k AS (SELECT dn, CAST(count(*) AS BIGINT) AS nd
         |  FROM dup$k GROUP BY dn),
         |wb$k AS (SELECT doc_id, band, bh FROM band
         |  WHERE doc_id % 4 = $k),
         |wbsz$k AS (SELECT band, bh, count(*) AS c FROM wb$k
         |  GROUP BY band, bh),
         |wcold$k AS (SELECT w.doc_id, w.band, w.bh FROM wb$k w
         |  JOIN wbsz$k USING (band, bh) WHERE wbsz$k.c <= 20),
         |wcand$k AS (SELECT DISTINCT x.doc_id AS dn, y.doc_id AS dd
         |  FROM wcold$k x JOIN wcold$k y
         |    ON x.band = y.band AND x.bh = y.bh AND y.doc_id < x.doc_id),
         |wdup$k AS (SELECT c.dn, c.dd
         |  FROM wcand$k c JOIN shg a ON a.doc_id = c.dn
         |  JOIN shg b2 ON b2.doc_id = c.dd AND b2.h = a.h
         |  JOIN szd na ON na.doc_id = c.dn
         |  JOIN szd nb ON nb.doc_id = c.dd
         |  GROUP BY c.dn, c.dd, na.n, nb.n
         |  HAVING (count(*) * 1048576) // (na.n + nb.n - count(*))
         |    >= 524288),
         |wnd$k AS (SELECT dn, CAST(count(*) AS BIGINT) AS wn
         |  FROM wdup$k GROUP BY dn),
         |w$k AS (SELECT d.doc_id,
         |    coalesce(nc$k.nc, 0) AS n_candidates,
         |    coalesce(nd$k.nd, 0) AS n_dup_hits,
         |    coalesce(wnd$k.wn, 0) AS intra_wave_hits
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = $k) d
         |  LEFT JOIN nc$k ON d.doc_id = nc$k.dn
         |  LEFT JOIN nd$k ON d.doc_id = nd$k.dn
         |  LEFT JOIN wnd$k ON d.doc_id = wnd$k.dn),
         |idx${k + 1} AS MATERIALIZED (SELECT * FROM idx$k
         |  UNION ALL SELECT doc_id, band, bh FROM band
         |  WHERE doc_id % 4 = $k AND doc_id IN
         |    (SELECT doc_id FROM w$k
         |     WHERE n_dup_hits = 0 AND intra_wave_hits = 0))"""
        .stripMargin
    winnowChainSql + s""",
      |shg AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM g
      |  WHERE h IS NOT NULL),
      |seeds AS (SELECT * FROM (VALUES ${MinhashRepSeeds.zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")})
      |  AS s(i, a, b)),
      |sig AS (SELECT doc_id, i, min((h * a + b) % 1048573) AS s
      |  FROM shg, seeds GROUP BY doc_id, i),
      |band AS MATERIALIZED (SELECT doc_id, i // 4 AS band,
      |    CAST(sum(s * CASE i % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
      |      WHEN 2 THEN 31 ELSE 1 END) AS BIGINT) AS bh
      |  FROM sig GROUP BY doc_id, i // 4),
      |szd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg
      |  GROUP BY doc_id),
      |idx1 AS MATERIALIZED (SELECT doc_id, band, bh FROM band
      |  WHERE doc_id % 4 = 0),
      |${(1 to 3).map(wave).mkString(",\n")}
      |SELECT wave, doc_id, n_candidates, n_dup_hits, intra_wave_hits,
      |  CAST(CASE WHEN n_dup_hits = 0 AND intra_wave_hits = 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS admitted
      |FROM (${(1 to 3).map(k =>
        s"SELECT CAST($k AS BIGINT) AS wave, * FROM w$k")
        .mkString("\nUNION ALL\n")})
      |ORDER BY wave, doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // the admission history unrolled (see ingestGateOracle)
    "dedup_ingest_gate" -> ingestGateOracle,
    // the same CDC SQL verbatim over the exploded-token CTE
    "text_cdc_chunking" -> {
      val tok =
        """(SELECT doc_id, rp, CAST(length(t) * 131
          |    + ascii(substring(t, 1, 1))
          |    + ascii(substring(t, length(t), 1)) * 7 AS BIGINT) AS v
          |  FROM (SELECT doc_id,
          |      CAST(generate_subscripts(string_split(text, ' '), 1)
          |        AS BIGINT) AS rp,
          |      unnest(string_split(text, ' ')) AS t FROM documents)
          |  WHERE t <> '')""".stripMargin
      cdcSql(tok)
    },
    "dedup_simhash_replayable" -> simhashRepOracle,
    // raw-array adjacency (l[j], l[j+1]) ≡ the Spark lead-over-p0 pairs;
    // the three context statistics are windows over the type frame
    // the same bigram-instance frame, decorated with the corpus-level
    // fixed-point conditional frequency and folded per doc
    "quality_bigram_coherence" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |i AS (SELECT doc_id, l, unnest(range(1, len(l))) AS j FROM t
        |  WHERE len(l) >= 2),
        |b AS (SELECT doc_id, l[j] AS w1, l[j + 1] AS w2 FROM i
        |  WHERE l[j] <> '' AND l[j + 1] <> ''),
        |ty AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
        |  FROM b GROUP BY w1, w2),
        |sc AS (SELECT w1, w2,
        |    (c_bigram * 1048576) //
        |      sum(c_bigram) OVER (PARTITION BY w1) AS score_fp
        |  FROM ty)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(score_fp) AS BIGINT) AS score_sum_fp,
        |  CAST(sum(score_fp) // count(*) AS BIGINT) AS coherence_fp
        |FROM b JOIN sc ON b.w1 = sc.w1 AND b.w2 = sc.w2
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "text_bigram_lm_counts" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |i AS (SELECT doc_id, l, unnest(range(1, len(l))) AS j FROM t
        |  WHERE len(l) >= 2),
        |b AS (SELECT l[j] AS w1, l[j + 1] AS w2 FROM i
        |  WHERE l[j] <> '' AND l[j + 1] <> ''),
        |ty AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
        |  FROM b GROUP BY w1, w2)
        |SELECT w1, w2, c_bigram,
        |  CAST(sum(c_bigram) OVER (PARTITION BY w1) AS BIGINT)
        |    AS c_left_ctx,
        |  CAST(count(*) OVER (PARTITION BY w2) AS BIGINT) AS n_cont_left,
        |  CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS n_cont_right
        |FROM ty ORDER BY w1, w2""".stripMargin,
    // same trigram frame + (count desc, trigram asc) top-1 election;
    // 1-based positions on both engines, overlaps count separately
    "text_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |i AS (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS j FROM t
        |  WHERE len(l) >= 3),
        |tri AS (SELECT doc_id, CAST(j AS BIGINT) AS pos,
        |    l[j] AS w1, l[j + 1] AS w2, l[j + 2] AS w3
        |  FROM i WHERE l[j] <> '' AND l[j + 1] <> '' AND l[j + 2] <> ''),
        |top AS (SELECT w1, w2, w3 FROM tri GROUP BY w1, w2, w3
        |  ORDER BY count(*) DESC, w1, w2, w3 LIMIT 1)
        |SELECT doc_id,
        |  (SELECT w1 || ' ' || w2 || ' ' || w3 FROM top) AS phrase,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(min(pos) AS BIGINT) AS first_pos
        |FROM tri JOIN top USING (w1, w2, w3)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_winnow_fingerprints" -> (winnowChainSql +
      "\nSELECT doc_id, pos, h FROM fp ORDER BY doc_id, pos"),
    "dedup_winnow_pairs" -> (winnowChainSql +
      """,
        |f AS (SELECT DISTINCT doc_id, h FROM fp),
        |dfh AS (SELECT h, count(*) AS c FROM f GROUP BY h),
        |cold AS (SELECT f.doc_id, f.h FROM f JOIN dfh USING (h)
        |  WHERE dfh.c <= 20)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 8
        |ORDER BY doc_a, doc_b""".stripMargin),
    // the OPTIMIZE lifecycle re-derived: hot buckets (old membership
    // > 20) quarantined, the capless probe of the compacted remainder,
    // and the quarantine census — compacted serving ≡ capped serving
    "dedup_index_compact" -> (winnowChainSql + s""",
        |shg AS (SELECT DISTINCT doc_id, h FROM g WHERE h IS NOT NULL),
        |seeds AS (SELECT * FROM (VALUES ${MinhashRepSeeds.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")})
        |  AS s(i, a, b)),
        |sig AS (SELECT doc_id, i, min((h * a + b) % 1048573) AS s
        |  FROM shg, seeds GROUP BY doc_id, i),
        |band AS (SELECT doc_id, i // 4 AS band,
        |    CAST(sum(s * CASE i % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
        |      WHEN 2 THEN 31 ELSE 1 END) AS BIGINT) AS bh
        |  FROM sig GROUP BY doc_id, i // 4),
        |old_b AS (SELECT * FROM band WHERE doc_id % 8 <> 7),
        |new_b AS (SELECT * FROM band WHERE doc_id % 8 = 7),
        |hotq AS (SELECT band, bh FROM old_b GROUP BY band, bh
        |  HAVING count(*) > 20),
        |comp_old AS (SELECT o.* FROM old_b o
        |  WHERE NOT EXISTS (SELECT 1 FROM hotq q
        |    WHERE q.band = o.band AND q.bh = o.bh)),
        |census AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM band)
        |      AS entries_before,
        |    (SELECT CAST(count(*) AS BIGINT) FROM band b
        |      WHERE EXISTS (SELECT 1 FROM hotq q
        |        WHERE q.band = b.band AND q.bh = b.bh))
        |      AS entries_quarantined,
        |    (SELECT CAST(count(*) AS BIGINT) FROM hotq)
        |      AS buckets_quarantined)
        |SELECT n.doc_id AS doc_new, o.doc_id AS doc_old,
        |  CAST(count(*) AS BIGINT) AS n_shared_bands,
        |  census.entries_before, census.entries_quarantined,
        |  census.entries_before - census.entries_quarantined
        |    AS entries_after,
        |  census.buckets_quarantined
        |FROM new_b n JOIN comp_old o
        |  ON n.band = o.band AND n.bh = o.bh, census
        |GROUP BY 1, 2, census.entries_before,
        |  census.entries_quarantined, census.buckets_quarantined
        |ORDER BY doc_new, doc_old""".stripMargin),
    // the index lifecycle re-derived from scratch: the same signature
    // chain as dedup_minhash_replayable, band rows split into the
    // committed old slice vs the probing batch, hot-bucket cap on the
    // STORED buckets, new⋈old candidate join, fixed-point verify, and
    // the index-entry census — probe-the-stored-index ≡ this recompute
    "dedup_index_maintain" -> (winnowChainSql + s""",
        |shg AS (SELECT DISTINCT doc_id, h FROM g WHERE h IS NOT NULL),
        |seeds AS (SELECT * FROM (VALUES ${MinhashRepSeeds.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")})
        |  AS s(i, a, b)),
        |sig AS (SELECT doc_id, i, min((h * a + b) % 1048573) AS s
        |  FROM shg, seeds GROUP BY doc_id, i),
        |band AS (SELECT doc_id, i // 4 AS band,
        |    CAST(sum(s * CASE i % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
        |      WHEN 2 THEN 31 ELSE 1 END) AS BIGINT) AS bh
        |  FROM sig GROUP BY doc_id, i // 4),
        |old_b AS (SELECT * FROM band WHERE doc_id % 8 <> 7),
        |new_b AS (SELECT * FROM band WHERE doc_id % 8 = 7),
        |bsz AS (SELECT band, bh, count(*) AS c FROM old_b
        |  GROUP BY band, bh),
        |coldb AS (SELECT b.band, b.bh, b.doc_id FROM old_b b
        |  JOIN bsz USING (band, bh) WHERE bsz.c <= 20),
        |cnd AS (SELECT n.doc_id AS doc_new, o.doc_id AS doc_old,
        |    CAST(count(*) AS BIGINT) AS n_shared_bands
        |  FROM new_b n JOIN coldb o
        |    ON n.band = o.band AND n.bh = o.bh
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg
        |  GROUP BY doc_id),
        |iv AS (SELECT c.doc_new, c.doc_old, c.n_shared_bands,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM cnd c JOIN shg a ON a.doc_id = c.doc_new
        |  JOIN shg b ON b.doc_id = c.doc_old AND b.h = a.h
        |  GROUP BY 1, 2, 3),
        |census AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM old_b) AS idx_entries,
        |    (SELECT CAST(count(*) AS BIGINT) FROM new_b) AS new_entries)
        |SELECT iv.doc_new, iv.doc_old, iv.n_shared_bands, iv.n_shared,
        |  na.n AS na, nb.n AS nb,
        |  CAST((iv.n_shared * 1048576) // (na.n + nb.n - iv.n_shared)
        |    AS BIGINT) AS jaccard_fp,
        |  census.idx_entries, census.new_entries
        |FROM iv JOIN sz na ON na.doc_id = iv.doc_new
        |JOIN sz nb ON nb.doc_id = iv.doc_old, census
        |ORDER BY doc_new, doc_old""".stripMargin),
    // the forget re-derived: the live index = old slice minus the
    // %5-forgotten docs; hot-cap + probe + verify over the LIVE
    // entries only — deletion-by-delete-file ≡ deletion-by-recompute
    "dedup_index_forget" -> (winnowChainSql + s""",
        |shg AS (SELECT DISTINCT doc_id, h FROM g WHERE h IS NOT NULL),
        |seeds AS (SELECT * FROM (VALUES ${MinhashRepSeeds.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")})
        |  AS s(i, a, b)),
        |sig AS (SELECT doc_id, i, min((h * a + b) % 1048573) AS s
        |  FROM shg, seeds GROUP BY doc_id, i),
        |band AS (SELECT doc_id, i // 4 AS band,
        |    CAST(sum(s * CASE i % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
        |      WHEN 2 THEN 31 ELSE 1 END) AS BIGINT) AS bh
        |  FROM sig GROUP BY doc_id, i // 4),
        |old_b AS (SELECT * FROM band WHERE doc_id % 8 <> 7),
        |live_b AS (SELECT * FROM old_b WHERE doc_id % 5 <> 0),
        |new_b AS (SELECT * FROM band WHERE doc_id % 8 = 7),
        |bsz AS (SELECT band, bh, count(*) AS c FROM live_b
        |  GROUP BY band, bh),
        |coldb AS (SELECT b.band, b.bh, b.doc_id FROM live_b b
        |  JOIN bsz USING (band, bh) WHERE bsz.c <= 20),
        |cnd AS (SELECT n.doc_id AS doc_new, o.doc_id AS doc_old,
        |    CAST(count(*) AS BIGINT) AS n_shared_bands
        |  FROM new_b n JOIN coldb o
        |    ON n.band = o.band AND n.bh = o.bh
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg
        |  GROUP BY doc_id),
        |iv AS (SELECT c.doc_new, c.doc_old, c.n_shared_bands,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM cnd c JOIN shg a ON a.doc_id = c.doc_new
        |  JOIN shg b ON b.doc_id = c.doc_old AND b.h = a.h
        |  GROUP BY 1, 2, 3),
        |census AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM old_b) AS entries_v0,
        |    (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM old_b
        |      WHERE doc_id % 5 = 0) AS forgotten_keys,
        |    (SELECT CAST(count(*) AS BIGINT) FROM live_b)
        |      AS entries_live)
        |SELECT iv.doc_new, iv.doc_old, iv.n_shared_bands, iv.n_shared,
        |  na.n AS na, nb.n AS nb,
        |  CAST((iv.n_shared * 1048576) // (na.n + nb.n - iv.n_shared)
        |    AS BIGINT) AS jaccard_fp,
        |  census.entries_v0, census.forgotten_keys, census.entries_live
        |FROM iv JOIN sz na ON na.doc_id = iv.doc_new
        |JOIN sz nb ON nb.doc_id = iv.doc_old, census
        |ORDER BY doc_new, doc_old""".stripMargin),
    // same gram shingles (CTE g), the SAME seed constants (generated
    // from MinhashRepSeeds — one source of truth), affine min-hash,
    // base-31 band packing, hot-bucket cap, and fixed-point verify
    "dedup_minhash_replayable" -> (winnowChainSql + s""",
        |shg AS (SELECT DISTINCT doc_id, h FROM g WHERE h IS NOT NULL),
        |seeds AS (SELECT * FROM (VALUES ${MinhashRepSeeds.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")})
        |  AS s(i, a, b)),
        |sig AS (SELECT doc_id, i, min((h * a + b) % 1048573) AS s
        |  FROM shg, seeds GROUP BY doc_id, i),
        |band AS (SELECT doc_id, i // 4 AS band,
        |    CAST(sum(s * CASE i % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
        |      WHEN 2 THEN 31 ELSE 1 END) AS BIGINT) AS bh
        |  FROM sig GROUP BY doc_id, i // 4),
        |bsz AS (SELECT band, bh, count(*) AS c FROM band
        |  GROUP BY band, bh),
        |coldb AS (SELECT b.band, b.bh, b.doc_id FROM band b
        |  JOIN bsz USING (band, bh) WHERE bsz.c <= 20),
        |cnd AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS BIGINT) AS n_shared_bands
        |  FROM coldb a JOIN coldb b
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg
        |  GROUP BY doc_id),
        |iv AS (SELECT c.doc_a, c.doc_b, c.n_shared_bands,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM cnd c JOIN shg a ON a.doc_id = c.doc_a
        |  JOIN shg b ON b.doc_id = c.doc_b AND b.h = a.h
        |  GROUP BY 1, 2, 3)
        |SELECT iv.doc_a, iv.doc_b, iv.n_shared_bands, iv.n_shared,
        |  na.n AS na, nb.n AS nb,
        |  CAST((iv.n_shared * 1048576) // (na.n + nb.n - iv.n_shared)
        |    AS BIGINT) AS jaccard_fp
        |FROM iv JOIN sz na ON na.doc_id = iv.doc_a
        |JOIN sz nb ON nb.doc_id = iv.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_winnow_verify" -> (winnowChainSql +
      """,
        |f AS (SELECT DISTINCT doc_id, h FROM fp),
        |dfh AS (SELECT h, count(*) AS c FROM f GROUP BY h),
        |cold AS (SELECT f.doc_id, f.h FROM f JOIN dfh USING (h)
        |  WHERE dfh.c <= 20),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 8),
        |sh AS (SELECT DISTINCT doc_id, tok AS sh0 FROM tok),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT p.doc_a, p.doc_b, p.n_shared, count(*) AS ni
        |  FROM pr p
        |  JOIN sh a ON a.doc_id = p.doc_a
        |  JOIN sh b ON b.doc_id = p.doc_b AND b.sh0 = a.sh0
        |  GROUP BY 1, 2, 3)
        |SELECT it.doc_a, it.doc_b, it.n_shared,
        |  CAST(it.ni AS DOUBLE) / (na.n + nb.n - it.ni) AS jaccard,
        |  CAST(CASE WHEN CAST(it.ni AS DOUBLE) / (na.n + nb.n - it.ni)
        |    >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |FROM it
        |JOIN sz na ON na.doc_id = it.doc_a
        |JOIN sz nb ON nb.doc_id = it.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin),
    "text_bpe_merge_loop" -> bpeLoopOracle(BpeIterations),
    "text_bpe_tokenize" -> bpeTokenizeOracle(BpeIterations),
    "text_index_delta_merge" -> invertedIndexOracle,
    // positions index the raw split array on both engines (1-based);
    // string_agg ORDER BY pos / doc_id mirrors sort_array-in-aggregate
    "text_inverted_index" -> invertedIndexOracle,
    "text_bpe_merge_step" ->
      """WITH words AS (SELECT w FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |spaced AS (SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS s
        |  FROM words),
        |pieces AS (SELECT string_split(s, ' ') AS ps FROM spaced),
        |pairs AS (SELECT ps[i] AS a, ps[i + 1] AS b
        |  FROM (SELECT ps, unnest(generate_series(1, len(ps) - 1)) AS i
        |        FROM pieces WHERE len(ps) >= 2)),
        |pc AS (SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b),
        |best AS (SELECT a AS ba, b AS bb FROM pc
        |  ORDER BY cnt DESC, a, b LIMIT 1),
        |bef AS (SELECT CAST(sum(len(ps) - 1) AS BIGINT) AS pairs_before
        |  FROM pieces),
        |merged AS (SELECT replace(s, ba || ' ' || bb, ba || bb) AS s2
        |  FROM spaced, best),
        |aft AS (SELECT CAST(sum(len(string_split(s2, ' ')) - 1) AS BIGINT)
        |    AS pairs_after FROM merged),
        |top AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rk
        |  FROM pc ORDER BY cnt DESC, a, b LIMIT 20)
        |SELECT rk, a, b, cnt, pairs_before, pairs_after
        |FROM top, bef, aft ORDER BY rk""".stripMargin
  )
}
