package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Training-data pipeline operators beyond per-row transforms: duplicate
  * CLUSTERING (pairs → connected components → survivor election),
  * deterministic stratified SAMPLING, and sequence PACKING into
  * fixed-token training bins.
  *
  * These are the steps that turn the dedup/scoring primitives in
  * [[LlmOps]] into an end-to-end corpus pipeline: near-dup detection
  * yields PAIRS, but a corpus needs one survivor per duplicate CLASS
  * (transitive closure); training needs reproducible subsets and
  * context-window-sized batches.
  *
  * Scale posture:
  *  - clustering is iterative min-label propagation plus per-round
  *    pointer halving (the small-star move of Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC '14) — each
  *    round is two shuffle joins carrying (id, label) longs only, and
  *    rounds = O(log diameter), so adversarially long chains (a 65+-hop
  *    path) converge inside the round budget instead of aborting;
  *  - sampling is a pure codegen'd filter on a content hash — zero
  *    shuffle, resumable, and identical on any cluster/partitioning;
  *  - packing windows over (lang, shard) so no window partition ever
  *    exceeds one shard of one language — bounded memory at any corpus
  *    size, and shards parallelize the packing across executors.
  */
object Pipelines {

  // ---- duplicate clustering (connected components) ---------------------

  /** Bucket-star candidate edges over the documents table — the shared
    * graph substrate of dedup_cluster_cc and graph_bfs_reach: each doc
    * keys on its first-4/last-4 token windows, every bucket member gets
    * one star edge to the bucket's min doc_id, symmetric closure
    * materialized once. Returns (star, edges): star additionally feeds
    * the CC label seed. */
  private def bucketStarFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 4)
    val keys = toks
      .select($"doc_id", concat(lit("p"), concat_ws(" ", slice($"t", 1, 4))).as("k"))
      .unionAll(toks
        .select($"doc_id", concat(lit("s"), concat_ws(" ", slice($"t", -4, 4))).as("k")))
    // one window pass feeds both the edge list and the label seed
    val star = graft.PlanOnly.cut(
      keys.withColumn("m", min($"doc_id").over(Window.partitionBy($"k")))
        .select($"doc_id", $"m"))
    val e0 = star.filter($"m" =!= $"doc_id")
      .select($"doc_id".as("a"), $"m".as("b")).distinct()
    // symmetric closure, materialized once — reused every round
    val edges = graft.PlanOnly.cut(
      e0.unionAll(e0.select($"b".as("a"), $"a".as("b"))))
    (star, edges)
  }

  /** Near-dup pairs → duplicate classes via connected components.
    *
    * Edge generation is the SQL-expressible bucket-star form
    * ([[bucketStarFrames]]) so the whole operator can be oracled.
    * Components form transitively — doc A sharing a prefix with B, and
    * B a suffix with C, lands A, B, C in one class. The same loop runs
    * unchanged over MinHash/SimHash candidate pairs
    * (LlmOps.dedupMinhashNear) in production.
    *
    * The propagation loop is driver-coordinated but fully distributed:
    * label(x) ← min(label(x), min over neighbours' labels) until a
    * fixed point, each round one equi-join + partial agg on 16-byte
    * rows, lineage cut per round via localCheckpoint. Deterministic:
    * the fixed point (component-min labels) is partitioning-invariant.
    *
    * Oracled via a DuckDB recursive CTE computing the same reachability
    * min-label. */
  def dedupClusterCc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (star, edges) = bucketStarFrames(spark, dir)
    // Seed with the min over the doc's own buckets — the first
    // propagation round for free (same window pass that built the
    // edges), so single-bucket duplicate classes converge immediately.
    val seed = star.groupBy($"doc_id").agg(min($"m").as("lbl0"))
    val nodes = Tables.documents(spark, dir).select($"doc_id".as("id"))
      .join(seed.select($"doc_id".as("id"), $"lbl0"), Seq("id"), "left")
      .select($"id", coalesce($"lbl0", $"id").as("lbl"))
    connectedComponents(nodes, edges)
      .select($"id".as("doc_id"), $"cluster_rep")
      .withColumn("cluster_sz", count(lit(1)).over(Window.partitionBy($"cluster_rep")))
      .orderBy($"doc_id")
  }

  /** Min-label connected components over an arbitrary edge list — the
    * reusable clustering core: dedup_cluster_cc feeds it bucket-star
    * edges, and the MinHash/SimHash pipelines feed it verified
    * near-dup pairs (PipelinesSpec proves that composition). Propagates
    * label(x) ← min(label, neighbours' labels) then halves pointers
    * (label ← label(label)) to the fixed point in O(log diameter)
    * rounds; each round carries (id, label) longs only, lineage cut per
    * round via localCheckpoint (the local-mode fast path — a cluster
    * deployment would use a reliable checkpoint dir instead).
    *
    * @param seeded nodes as (id, lbl) — pass id as lbl for an unseeded
    *               start; a tighter seed (e.g. per-bucket minima) saves
    *               rounds but must never exceed the node's own id.
    * @param edges  DIRECTED edge list (a, b) — callers wanting the
    *               undirected closure union the reverse, as
    *               dedupClusterCc does.
    * @return (id, cluster_rep) with cluster_rep = the component's min id. */
  def connectedComponents(seeded: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    import seeded.sparkSession.implicits._
    // no checkpoint on the seed: round 1 reads it twice, but both reads
    // are cheap derivations of inputs the caller already materialized;
    // a checkpoint here costs a whole extra job (measured)
    var labels = seeded.select($"id", $"lbl")
    // Each round: (1) neighbour-min propagation, (2) pointer halving
    // (lbl ← lbl(lbl)) — the small-star move from Kiveris et al.
    // SoCC '14. Labels are monotone non-increasing and always ids of
    // component members, so the fixed point is unchanged (component
    // min), but chains collapse in O(log diameter) rounds instead of
    // O(diameter): a 1M-hop path converges in ~20 rounds, so maxRounds
    // is a true runaway guard, not a diameter bound.
    def round(lbls: DataFrame): DataFrame = {
      val prop = edges
        .join(lbls.select($"id".as("nb"), $"lbl".as("nlbl")), $"b" === $"nb")
        .groupBy($"a").agg(min($"nlbl").as("nlbl"))
      val stepped = lbls.join(prop, $"id" === $"a", "left")
        .select($"id", $"lbl".as("old"),
          least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
      // halving: follow the label one hop through the label table itself
      // ((id, lbl) longs — same shuffle width as the propagation join);
      // left join because a caller-provided seed label may name a node
      // outside `seeded` — then it just doesn't shortcut this round.
      // `stepped` appears twice in this self-join uncached: the physical
      // plan dedupes the recompute via ReuseExchange (both sides shuffle
      // on the same child), so "two shuffle joins per round" relies on
      // that rule staying enabled — cache `stepped` if that ever changes
      stepped
        .join(stepped.select($"id".as("pid"), $"lbl".as("plbl")),
          $"lbl" === $"pid", "left")
        .select($"id", $"old", least($"lbl", coalesce($"plbl", $"lbl")).as("lbl"))
    }
    // plan-only audit: ONE unexecuted round — the per-round plan is the
    // repeated unit; convergence is a runtime property, not a plan one
    if (graft.PlanOnly.enabled)
      return round(labels).select($"id", $"lbl".as("cluster_rep"))
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = round(labels).localCheckpoint(true)
      converged = next.filter($"lbl" =!= $"old").limit(1).count() == 0
      // the previous round's checkpoint blocks become unreachable here;
      // the ContextCleaner reclaims them asynchronously
      labels = next.select($"id", $"lbl")
      rounds += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds " +
      "(log-diameter exceeds the bound — pathological input, refuse to emit partial labels)")
    labels.select($"id", $"lbl".as("cluster_rep"))
  }

  /** Incremental ingest dedup: a new document batch is admitted only if
    * its normalized content hash is absent from the existing corpus —
    * the anti-join every continuously-ingesting corpus runs per batch.
    * Fixture split: even doc_ids play the corpus, odd ones the incoming
    * batch.
    *
    * The join key is sha2(normalized text): the corpus side needs only
    * its 32-byte hash index, never the text — at 100 TB the hash index
    * is ~3000× smaller than the corpus and is the only thing shuffled
    * (or broadcast, once it fits). Oracled with NOT EXISTS on the
    * normalized text itself. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .withColumn("h", sha2(lower(trim($"text")), 256))
    val corpusIdx = docs.filter($"doc_id" % 2 === 0).select($"h")
    docs.filter($"doc_id" % 2 === 1)
      .join(corpusIdx, Seq("h"), "left_anti")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination: flag training documents sharing any
    * 8-gram with a held-out benchmark set (fixture split: doc_id % 10
    * == 0 plays the benchmark) — the step that keeps eval data out of
    * the training corpus. Standard 8-gram overlap (in the 8–13 range
    * used in published decontamination setups).
    *
    * N-grams are xxhash64'd before the join: the shuffle carries
    * 8-byte fingerprints, never n-gram text, and the benchmark side —
    * tiny by construction — broadcasts. Output: contaminated doc,
    * distinct colliding grams, distinct benchmark docs hit. The oracle
    * joins the n-gram STRINGS; any xxhash64 collision would diverge —
    * none exists in the fixtures (P ≈ n²/2⁶⁴). */
  def textDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialized once: both the benchmark side and the corpus side
    // derive from this frame, and without it the whole
    // tokenize → explode → distinct (the dominant cost at any scale)
    // runs twice — once under the broadcast build, once in the probe.
    // cut, not mark (r19, X6): the bench side IS a broadcast build, and
    // its future racing a LAZY persist re-runs the dominant pass anyway
    // — the eager checkpoint materializes it exactly once. Cluster
    // caveat (the reason the r18 text kept a lazy persist): a
    // localCheckpoint severs lineage, so an executor loss fails the job
    // instead of recomputing — at real cluster scale prefer an eagerly
    // materialized reliable checkpoint or a persist barriered by its
    // own action before the broadcast consumers fork.
    val grams = graft.PlanOnly.cut(Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 7), i -> xxhash64(concat_ws(' ', slice(t, i, 8))))"))
        .as("g"))
      .distinct())
    val bench = grams.filter($"doc_id" % 10 === 0)
      .select($"g", $"doc_id".as("bench_id"))
    val corpus = grams.filter($"doc_id" % 10 =!= 0)
    corpus.join(broadcast(bench), "g")
      .groupBy($"doc_id")
      .agg(countDistinct($"g").as("n_grams_hit"),
        countDistinct($"bench_id").as("n_bench_docs"))
      .orderBy($"doc_id")
  }

  // ---- deterministic stratified sampling -------------------------------

  /** Per-stratum deterministic Bernoulli sampling: keep an event iff the
    * first hex byte of sha2(event_id) falls below the stratum's
    * threshold (e.g. '10' ⇒ 16/256 ≈ 6.25%). Content-hash gating — not
    * `rand()` — is what a training pipeline needs: the sample is
    * reproducible across runs, engines, partitionings and restarts, and
    * audit-able row by row. Down-weights the dominant 'view' stratum,
    * keeps nearly every rare 'purchase'.
    *
    * One codegen'd filter, no shuffle (the final sort is oracle-driven).
    * Oracled: Spark sha2 and DuckDB sha256 emit identical lowercase hex
    * of the UTF-8 key, and hex-string comparison is binary in both. */
  def sampleHashStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val threshold = expr(
      """CASE event_type WHEN 'view' THEN '08' WHEN 'click' THEN '10'
        |     WHEN 'error' THEN '20' WHEN 'signup' THEN '30' ELSE 'c0' END""".stripMargin)
    Tables.events(spark, dir)
      .filter(substring(sha2($"event_id".cast("string"), 256), 1, 2) < threshold)
      .select($"event_id", $"user_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), $"value")
      .orderBy($"event_id")
  }

  /** Exactly-k-per-stratum sample — the fixed-SIZE companion to the
    * fixed-RATE sample above: "take exactly 20 documents per language",
    * the shape eval-set construction and per-domain budget sampling
    * need (a rate gives binomial noise around the target; a budget
    * demands exactness). Selection ranks by sha2(text) with a doc_id
    * tie-break, so membership is content-keyed — the same documents
    * win across corpus re-shards, engines, and partition layouts, and
    * the pick is uniform over content (hash order is pseudorandom but
    * deterministic). One window per language partition with the rank
    * filter immediately after (the window_topk_per_group pattern —
    * downstream sees ≤k rows per group); at extreme per-group
    * cardinality, pre-filter on a coarse hash prefix first and rank
    * only the survivors (sample_hash_stratified composes as exactly
    * that pre-filter). */
  def sampleReservoirFixedK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 20
    // NULL-lang sentinel + NULL-text hash guard (the corpus_quota_sampler
    // discipline): NULL ordering keys desync Spark NULLS FIRST vs DuckDB
    // NULLS LAST; no current fixture has them, but the guard is free
    val w = Window.partitionBy($"lang")
      .orderBy(sha2(coalesce($"text", lit("")), 256), $"doc_id")
    Tables.documents(spark, dir)
      .withColumn("lang", coalesce($"lang", lit("(none)")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"lang", $"rk".cast("long").as("rk"), $"doc_id",
        length(coalesce($"text", lit(""))).cast("long").as("text_len"))
      .orderBy($"lang", $"rk")
  }

  /** Data-mixing weights: per-language sampling multipliers that
    * rebalance the corpus to a uniform language target — the "mixture
    * weights" step every multilingual training pipeline runs before
    * sampling (up-weight rare languages, down-weight dominant ones).
    * weight_fp = target_share / actual_share in 1e-6 fixed point
    * (>1 000 000 ⇒ upsample), plus the projected post-sampling count.
    *
    * One ~5-group aggregate; the corpus totals are an unpartitioned
    * window over those ~5 per-language rows (NOT a second scan + cross
    * join — that plans a nested-loop join and reads the corpus twice).
    * Integer `div` end to end; the only single-partition traffic is
    * the language table itself, whose cardinality is #languages at any
    * corpus size. */
  def corpusMixRebalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("docs"))
      .withColumn("n", sum($"docs").over(whole))
      // count(lang), not count(*): one row per group, so this equals the
      // oracle's count(DISTINCT lang) exactly — including its NULL
      // exclusion, should a future fixture ever carry a NULL lang
      .withColumn("l", count($"lang").over(whole))
      .withColumn("weight_fp", expr("(n * 1000000) div (l * docs)"))
      .withColumn("projected", expr("(docs * weight_fp) div 1000000"))
      // '(none)' sentinel for a NULL-lang group: without it the output
      // row exists on both engines but sorts NULLS FIRST on Spark and
      // NULLS LAST on DuckDB — the row-order compare would desync.
      // The weight itself already treats NULL symmetrically (count(lang)
      // here == count(DISTINCT lang) there, both NULL-excluding).
      .select(coalesce($"lang", lit("(none)")).as("lang"),
        $"docs", $"weight_fp", $"projected")
      .orderBy($"lang")
  }

  /** Deterministic three-way train/val/test split by content hash: a
    * document's split is decided by the first hex byte of sha2(text) —
    * '00'..'0c' → test (13/256 ≈ 5.1%), '0d'..'19' → val (5.1%), rest
    * → train. Content-keyed (not id- or rand()-keyed) is the property
    * an eval pipeline actually needs: the SAME text lands in the same
    * split across corpus versions, re-shards and engines, so a doc can
    * never migrate from test into train between runs and silently
    * contaminate the benchmark. Output is the split × language audit
    * table (the shape you eyeball before a training run).
    *
    * One codegen'd projection + one partially-aggregated groupBy over
    * ~15 (split, lang) cells — at 100 TB the shuffle carries one row
    * per cell per task, nothing else. */
  def evalHoldoutSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = substring(sha2($"text", 256), 1, 2)
    Tables.documents(spark, dir)
      .withColumn("split",
        when(h < "0d", "test").when(h < "1a", "val").otherwise("train"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("docs"))
      .orderBy($"split", $"lang")
  }

  /** Log compaction: collapse an append-only event log to the latest
    * record per key — the upsert/current-state view every CDC or
    * state-table pipeline materializes. One window pass partitioned by
    * the key; ties on the event timestamp break on event_id so the
    * survivor is deterministic. At scale the rank filter prunes to one
    * row per key inside the window operator (no second shuffle), and a
    * skewed key salts exactly like any hot aggregation key. */
  def compactLatestState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), $"value")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"ts_us", $"value")
      .orderBy($"user_id")
  }

  // ---- sequence packing ------------------------------------------------

  private val PackBudget = 512 // tokens per training bin (fixture-sized)
  private val PackShards = 4

  /** Pack documents into ≈[[PackBudget]]-token training bins: within
    * each (lang, shard), documents in doc_id order join the bin their
    * cumulative token offset falls in (pack_id = ⌊tokens-before/budget⌋).
    * A document always lands wholly in the bin where it starts, so bins
    * overflow by at most one document — the standard "document packing
    * with boundary overflow" used for LLM context-window batching.
    *
    * The cumulative window partitions by (lang, shard): no partition
    * outgrows one shard of one language regardless of corpus size, and
    * shards spread the packing across the cluster. Output is the
    * per-bin manifest (doc count, token total, doc_id range) a batch
    * loader would consume. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"lang",
      ($"doc_id" % PackShards).as("shard"),
      expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("n_tok"))
    val w = Window.partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("pack_id", floor($"cum_before" / lit(PackBudget.toDouble)).cast("long"))
      .groupBy($"lang", $"shard", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"shard", $"pack_id")
  }

  /** Incremental aggregate maintenance: a daily rollup kept current by
    * re-aggregating ONLY the days a late-arriving batch touched —
    * untouched days ride through from the standing aggregate via an
    * anti-join on the (tiny, broadcast) touched-day set. At 100 TB
    * this is the difference between an hourly backfill re-reading the
    * whole fact table and re-reading a handful of day partitions
    * (partition pruning serves the touched-day scan). The late batch
    * is carved deterministically (event_id % 10) so the result is
    * reproducible — and must equal the one-shot aggregate, which is
    * exactly what the oracle checks (and PipelinesSpec asserts
    * directly). */
  def compactIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_id", $"event_type", expr("t div 86400000000").as("day"), $"v")
    def rollup(df: DataFrame) = df.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val late = e.filter($"event_id" % 10 === 0)
    val standing = rollup(e.filter($"event_id" % 10 =!= 0))
    val touched = late.select($"day").distinct()
    val kept = standing.join(broadcast(touched), Seq("day"), "left_anti")
    val recomputed = rollup(e.join(broadcast(touched), Seq("day")))
    kept.unionByName(recomputed)
      .select($"day", $"event_type", $"n", $"sv".cast("double").as("sum_value"))
      .orderBy($"day", $"event_type")
  }

  /** Corpus health report per source — the dashboard a data-curation
    * team watches: volume, language spread, length profile, and
    * 5-token-prefix diversity (a cheap truncation-dup smell; the full
    * answer is dedup_containment_prefix). One scan, one partial+final
    * aggregate; the two DISTINCTs plan via Expand and still combine
    * map-side. Mean length in integer `div` (floor semantics agree
    * across engines for the non-negative counts here). */
  def qualityCorpusReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(coalesce($"source", lit("(none)")).as("source"), $"lang",
        $"n_chars",
        concat_ws(" ", expr("slice(split(text, ' '), 1, 5)")).as("p5"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"p5").as("n_prefix5_distinct"),
        sum($"n_chars").as("total_chars"),
        expr("count(*) FILTER (WHERE n_chars < 200)").as("n_short"))
      .select($"source", $"n_docs", $"n_langs", $"n_prefix5_distinct",
        $"total_chars", expr("total_chars div n_docs").as("mean_chars"),
        $"n_short")
      .orderBy($"source")
  }

  /** Corpus snapshot diff — the data-ops census run before promoting a
    * new corpus version: FULL OUTER join of two snapshots on doc_id,
    * each doc classed added / removed / changed / same by content hash,
    * aggregated per (status, lang). The v2 snapshot is derived from the
    * fixture deterministically (the injected-fixture precedent:
    * deletions = doc_id % 7 = 0, edits = doc_id % 5 = 0 get a marker
    * suffix, additions = re-keyed copies of doc_id % 11 = 0), so both
    * engines diff identical inputs.
    *
    * Scale shape: the join shuffles (doc_id, 32-B sha256, lang) only —
    * text never moves (hash computed inside each scan); the diff frame
    * aggregates to ≤ 4·|langs| rows with map-side combine. This is the
    * same-cost shape as dedup_incremental at any corpus size. */
  def corpusSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v1 = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", sha2($"text", 256).as("h1"))
    val base = Tables.documents(spark, dir)
    val kept = base.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"lang",
        sha2(when($"doc_id" % 5 === 0, concat($"text", lit(" [v2]")))
          .otherwise($"text"), 256).as("h2"))
    val added = base.filter($"doc_id" % 11 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"lang",
        sha2($"text", 256).as("h2"))
    val v2 = kept.unionByName(added)
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(
        when(v2("h2").isNull, lit("removed"))
          .when(v1("h1").isNull, lit("added"))
          .when(v1("h1") =!= v2("h2"), lit("changed"))
          .otherwise(lit("same")).as("status"),
        coalesce(v1("lang"), v2("lang")).as("lang"))
      .groupBy($"status", $"lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"status", $"lang")
  }

  /** Per-cell quota cap — the C4/"max N pages per domain" sampler: at
    * most K=3 documents survive per (lang, source) cell, chosen by
    * content-hash order (sha256, doc_id tie-break) so the selection is
    * a deterministic function of content — reproducible across
    * re-shards, re-ingests, and engines, never favoring ingest order.
    * The complement of corpus_mix_rebalance (which reweights by
    * fraction): quotas CAP absolute per-cell volume so no source can
    * dominate a language slice no matter how much it ships.
    *
    * Scale shape: one shuffle on the (lang, source) cell key, one
    * partitioned window; per-cell row counts are bounded by source
    * traffic and the rank column is the only addition — the same
    * WindowGroupLimit shape as window_topk_per_group, so Spark prunes
    * each partition to its first K rows before the filter at scale.
    * Only (id, lang, source, 32-B hash) travel; text never moves. */
  def corpusQuotaSampler(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"lang", $"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", coalesce($"lang", lit("(none)")).as("lang"),
        coalesce($"source", lit("(none)")).as("source"),
        // NULL text would hash to NULL, and Spark NULLS FIRST vs DuckDB
        // NULLS LAST on ASC would desync the survivors — hash '' instead
        sha2(coalesce($"text", lit("")), 256).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"doc_id", $"lang", $"source", $"rk")
      .orderBy($"doc_id")
  }

  /** Token-budget apportionment — the training-mix planning step: a
    * global budget of 1 000 000 tokens is split across languages
    * proportionally to their corpus token mass using LARGEST-REMAINDER
    * (Hamilton) rounding, the apportionment rule that guarantees
    * Σalloc == budget exactly and every allocation within one token of
    * its exact proportional share. Naive per-lang rounding either
    * over- or under-spends the budget; the remainder ranking is the
    * fix every mix-planner reinvents.
    *
    * All-integer: quotaᵢ = ⌊B·nᵢ/N⌋ (decimal-38 products, integral
    * div), remainderᵢ = B·nᵢ − quotaᵢ·N, the B − Σquota leftover goes
    * +1 each to the largest remainders (lang tie-break). Scale shape:
    * the corpus scan collapses to ≤|langs| rows map-side; the
    * remainder rank and leftover are windows over that tiny frame —
    * the single-partition window ingests |langs| rows, never the
    * corpus. */
  def corpusTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000000L
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy().orderBy($"rem".desc, $"lang")
    Tables.documents(spark, dir)
      .select(coalesce($"lang", lit("(none)")).as("lang"),
        size(filter(split($"text", " "), t => t =!= "")).cast("long").as("nt"))
      .groupBy($"lang").agg(sum($"nt").as("n_tokens"))
      .withColumn("total", sum($"n_tokens").over(wAll))
      .withColumn("quota",
        expr(s"(CAST($budget AS DECIMAL(38,0)) * n_tokens) div total"))
      .withColumn("rem",
        expr(s"CAST($budget AS DECIMAL(38,0)) * n_tokens - quota * total"))
      .withColumn("leftover", lit(budget) - sum($"quota").over(wAll))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .select($"lang", $"n_tokens", $"quota",
        when($"rk" <= $"leftover", 1L).otherwise(0L).as("bonus"),
        ($"quota" + when($"rk" <= $"leftover", 1L).otherwise(0L)).as("alloc"))
      .orderBy($"lang")
  }

  /** TEMPERATURE-SCALED language mix (α = 0.5), graded — the published
    * multilingual rebalancing move (mBERT / XLM-R: sample languages
    * ∝ n^α with α < 1 to lift low-resource languages) computed with NO
    * transcendentals: n^0.5 IS sqrt, so the temperature weight is
    * ⌊2²⁰·√n_l⌋ (exact-BIGINT argument, correctly-rounded IEEE sqrt,
    * cross-engine-identical floor — [[sampleStratifiedNeyman]]'s
    * determinism argument), and the million-sample budget apportions
    * by the Hamilton largest-remainder rule of [[corpusTokenBudget]]
    * (Σalloc == budget exactly). The NATURAL per-million share sits
    * next to the temperature alloc so the output exhibits the lift a
    * low-resource language receives — the whole point of the knob.
    *
    * Scale shape: one map-side collapse of the corpus to |langs| rows,
    * then windows over that tiny frame only. */
  def corpusTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000000L
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy().orderBy($"rem".desc, $"lang")
    Tables.documents(spark, dir)
      .select(coalesce($"lang", lit("(none)")).as("lang"))
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_fp",
        floor(sqrt($"n_docs".cast("double")) * lit(1048576.0)).cast("long"))
      .withColumn("n_total", sum($"n_docs").over(wAll))
      .withColumn("w_total", sum($"weight_fp").over(wAll))
      .withColumn("natural_ppm",
        expr(s"(CAST($budget AS DECIMAL(38,0)) * n_docs) div n_total"))
      .withColumn("quota",
        expr(s"(CAST($budget AS DECIMAL(38,0)) * weight_fp) div w_total"))
      .withColumn("rem",
        expr(s"CAST($budget AS DECIMAL(38,0)) * weight_fp - quota * w_total"))
      .withColumn("leftover", lit(budget) - sum($"quota").over(wAll))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .select($"lang", $"n_docs", $"weight_fp", $"natural_ppm",
        ($"quota" + when($"rk" <= $"leftover", 1L).otherwise(0L))
          .as("alloc_temp"))
      .orderBy($"lang")
  }

  /** Neyman-optimal stratified sample allocation — the statistically
    * correct upgrade of proportional stratification: a 100-doc eval
    * budget is split across languages ∝ N_h·σ_h (stratum size × spread
    * of n_chars), so high-variance strata get more probes per Neyman
    * (1934). The weight is computed WITHOUT any non-exact math:
    * N_h·σ_h = sqrt(N_h·Σx² − (Σx)²), the argument is an exact BIGINT
    * < 2⁵³ (so exactly representable), IEEE sqrt is correctly rounded on
    * both engines, and ⌊·⌋ of it is cross-engine identical because the
    * true root of a non-square integer is never within one ulp of an
    * integer at this magnitude. Allocation then reuses the
    * largest-remainder (Hamilton) rule of [[corpusTokenBudget]] —
    * all-integer, Σalloc == 100 exactly.
    *
    * Scale shape: one map-side collapse of the corpus to |langs| rows of
    * sufficient statistics (n, Σx, Σx²) — the same one-pass
    * partial-aggregate posture as ml_linreg_sufficient — then windows
    * over that tiny frame only. */
  def sampleStratifiedNeyman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 100L
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy().orderBy($"rem".desc, $"lang")
    Tables.documents(spark, dir)
      .select(coalesce($"lang", lit("(none)")).as("lang"),
        $"n_chars".as("x"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .withColumn("w_h",
        floor(sqrt(($"n_docs" * $"sxx" - $"sx" * $"sx").cast("double")))
          .cast("long"))
      .withColumn("total_w", sum($"w_h").over(wAll))
      // degenerate corpus guard (every stratum zero-variance ⇒
      // total_w = 0, and x/0 is NULL-vs-error engine-divergent):
      // fall back to proportional-by-n_docs weights — same Hamilton
      // arithmetic, never a division by zero on either engine
      .withColumn("w_eff",
        when($"total_w" === 0, $"n_docs").otherwise($"w_h"))
      .withColumn("total_eff",
        when($"total_w" === 0, sum($"n_docs").over(wAll))
          .otherwise($"total_w"))
      .withColumn("quota", expr(s"($budget * w_eff) div total_eff"))
      .withColumn("rem", lit(budget) * $"w_eff" - $"quota" * $"total_eff")
      .withColumn("leftover", lit(budget) - sum($"quota").over(wAll))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .select($"lang", $"n_docs", $"w_h",
        ($"quota" + when($"rk" <= $"leftover", 1L).otherwise(0L)).as("alloc"))
      .orderBy($"lang")
  }

  /** k-hop BFS reachability from a seed set — the graph primitive CC
    * deliberately skips: not "which component" but "how FAR", the query
    * behind contamination-radius checks (every doc within 3 dedup hops
    * of a benchmark doc) and influence frontiers. Seeds are
    * doc_id % 10 = 0; edges are the shared bucket-star frame
    * ([[bucketStarFrames]]); 3 synchronous rounds of frontier
    * expansion, each one equi-join + min-aggregate over (id, dist)
    * longs with a per-round lineage cut — the connectedComponents loop
    * shape with a hop budget instead of a fixed point. Only the
    * previous round's FRONTIER joins edges (nodes already settled at a
    * smaller distance never re-expand), so round cost tracks the
    * frontier size, not the reached set. Oracled by a depth-bounded
    * recursive CTE computing the same min-distance. */
  def graphBfsReach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, edges) = bucketStarFrames(spark, dir)
    val seeds = Tables.documents(spark, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("id"), lit(0L).as("dist"))
    var reach = graft.PlanOnly.cut(seeds)
    // plan-only: ONE unexecuted round (the documented iterative-key
    // contract) — with identity cuts, round ≥2 would self-join the
    // edges dag inside `reach` against `edges` and trip Spark's
    // ambiguous-self-join check; graded runs always run all 3 hops
    val hops = if (graft.PlanOnly.enabled) 1 else 3
    for (h <- 1 to hops) {
      val frontier = reach.filter($"dist" === (h - 1).toLong)
      val next = frontier.join(edges, frontier("id") === edges("a"))
        .select(edges("b").as("id"), lit(h.toLong).as("dist"))
      reach = graft.PlanOnly.cut(
        reach.unionAll(next).groupBy($"id").agg(min($"dist").as("dist")))
    }
    reach.select($"id".as("doc_id"), $"dist").orderBy($"doc_id")
  }

  /** Token-weighted systematic sampling — the curation step that draws a
    * ~50-doc evaluation slice whose inclusion probability is proportional
    * to token mass (long documents must be represented by their weight in
    * the training mix, not their document count). A fixed grid of
    * `stride = total_tokens div 50` points is laid over the cumulative
    * token axis in doc_id order; a document is selected iff its token
    * interval [cum_before, cum_before + n_tok) covers a grid point.
    * Deterministic, exact, and engine-replayable: no RNG, no division
    * beyond integer `div` on non-negative counts.
    *
    * Scale shape: the cumulative sum is computed as a TWO-LEVEL prefix
    * sum — per-bucket subtotals (an ADAPTIVE bucket width of
    * ceil(id_domain/65536), floored at 64, keeps this frame bounded at
    * ≤ 65536 rows at any corpus size) carry the global offset via a
    * window over buckets, and the per-document running sum windows
    * WITHIN its bucket. No totally-ordered window ever exceeds the
    * bounded bucket frame (the classic distributed prefix-sum
    * decomposition; the oracle replays the mathematically-equal single
    * window). */
  def sampleSystematicWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // adaptive bucket width: ceil(id_domain / 65536), floored at 64 —
    // the subtotal frame stays ≤ 65536 rows at ANY corpus size (the
    // result is bucket-assignment-invariant: the oracle replays the
    // mathematically-equal single cumulative window)
    val ids = Tables.documents(spark, dir)
      .select($"doc_id",
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_tok"))
    val d = ids
      .crossJoin(broadcast(ids.agg(max($"doc_id").as("id_max"))))
      .withColumn("bkt",
        expr("doc_id div greatest(64L, (id_max div 65536L) + 1L)"))
      .drop("id_max")
    val wIn = Window.partitionBy($"bkt").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBkt = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket subtotals: ≤ 65536 rows — the stride scalar reads THIS
    // bounded frame, never the per-doc cum frame
    val sub = d.groupBy($"bkt").agg(sum($"n_tok").as("bt"))
    sub.createOrReplaceTempView("sysw_bkt")
    val offsets = sub
      .withColumn("bkt_off", coalesce(sum($"bt").over(wBkt), lit(0L)))
      .select($"bkt", $"bkt_off")
    d.withColumn("in_off", coalesce(sum($"n_tok").over(wIn), lit(0L)))
      .join(broadcast(offsets), "bkt")
      .withColumn("cum_before", $"bkt_off" + $"in_off")
      .createOrReplaceTempView("sysw_docs")
    // grid points m·stride, m ≥ 0; npts(x) = #points < x = (x+stride−1) div
    // stride for x ≥ 0. Selected iff the doc's interval contains a point.
    spark.sql(
      """WITH s AS (SELECT doc_id, n_tok, cum_before,
        |    (SELECT sum(bt) div 50 FROM sysw_bkt) AS stride
        |  FROM sysw_docs)
        |SELECT doc_id, n_tok, cum_before,
        |  (cum_before + stride - 1) div stride AS pick_idx
        |FROM s
        |WHERE (cum_before + n_tok + stride - 1) div stride
        |    > (cum_before + stride - 1) div stride
        |ORDER BY doc_id""".stripMargin)
  }

  /** Deterministic training-shard manifest — the epoch "shuffle" a
    * dataloader consumes: every document is assigned a pseudo-random but
    * fully reproducible shard (LCG hash of doc_id — seeded PRNG without
    * any engine-specific hash so the oracle replays it bit-for-bit),
    * ordered within its shard by the same hash (the shuffle), and given
    * its byte offset so a reader can seek straight to any document.
    * One manifest row per document: the artifact written next to every
    * webdataset/packed-shard corpus.
    *
    * Scale shape: assignment is a pure per-row projection (h, shard);
    * the within-shard (pos, offset) window partitions by shard — with a
    * production shard count (~bytes/shard_size, here the fixture knob
    * 16) each partition holds one shard's manifest rows, the same
    * bounded-window posture as pack_sequences. The LCG (mod 2^31, odd
    * multiplier) is injective on doc_id below 2^31, so h ties cannot
    * occur at fixture scale and doc_id breaks them beyond it. */
  def corpusShardManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assigned = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        expr("(doc_id * 1103515245 + 12345) % 2147483648").as("h"))
      .withColumn("shard", $"h" % 16)
    val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
    assigned
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("byte_offset", coalesce(
        sum($"n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"shard", $"pos", $"doc_id", $"h", $"n_chars", $"byte_offset")
      .orderBy($"shard", $"pos")
  }

  /** Per-EPOCH deterministic reshuffle — the dataloader contract
    * [[corpusShardManifest]]'s static manifest can't express: every
    * training epoch must see a DIFFERENT but fully reproducible global
    * permutation (reshuffling between epochs measurably improves
    * convergence; reproducibility is what makes a run restartable and
    * a data bug bisectable). The epoch seed folds into the same
    * LCG-family hash (odd multiplier, mod 2³¹ — engine-replayable
    * integer arithmetic, no RNG state), so epoch e's order and shard
    * assignment are pure functions of (doc_id, e): any worker can
    * recompute any shard of any epoch independently — the property
    * that lets a 1000-worker job resume mid-epoch without a
    * coordinator.
    *
    * Scale shape: assignment is a per-row projection; the within-
    * (epoch, shard) position is one window whose partitions are
    * shard-sized (epochs × shards partitions in one shuffle). The
    * cross-epoch permutation-inequality and shard-balance laws live in
    * PipelinesSpec. */
  def corpusEpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one corpus scan: epochs fan out via explode, not a per-epoch union
    val assigned = Tables.documents(spark, dir)
      .select($"doc_id", explode(array(lit(0L), lit(1L))).as("epoch"))
      .withColumn("h",
        expr("(doc_id * 1103515245 + 12345 + epoch * 2654435761) " +
          "% 2147483648"))
      .withColumn("shard", $"h" % 8)
    val w = Window.partitionBy($"epoch", $"shard").orderBy($"h", $"doc_id")
    assigned
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"epoch", $"doc_id", $"h", $"shard", $"pos")
      .orderBy($"epoch", $"doc_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "corpus_epoch_shuffle" -> (corpusEpochShuffle(_, _)),
    "sample_stratified_neyman" -> (sampleStratifiedNeyman(_, _)),
    "graph_bfs_reach" -> (graphBfsReach(_, _)),
    "sample_systematic_weighted" -> (sampleSystematicWeighted(_, _)),
    "corpus_shard_manifest" -> (corpusShardManifest(_, _)),
    "corpus_token_budget" -> (corpusTokenBudget(_, _)),
    "corpus_temperature_mix" -> (corpusTemperatureMix(_, _)),
    "corpus_quota_sampler" -> (corpusQuotaSampler(_, _)),
    "corpus_snapshot_diff" -> (corpusSnapshotDiff(_, _)),
    "compact_incremental_agg" -> (compactIncrementalAgg(_, _)),
    "quality_corpus_report" -> (qualityCorpusReport(_, _)),
    "dedup_cluster_cc" -> (dedupClusterCc(_, _)),
    "dedup_incremental" -> (dedupIncremental(_, _)),
    "text_decontaminate" -> (textDecontaminate(_, _)),
    "compact_latest_state" -> (compactLatestState(_, _)),
    "sample_hash_stratified" -> (sampleHashStratified(_, _)),
    "sample_reservoir_fixed_k" -> (sampleReservoirFixedK(_, _)),
    "eval_holdout_split" -> (evalHoldoutSplit(_, _)),
    "corpus_mix_rebalance" -> (corpusMixRebalance(_, _)),
    "pack_sequences" -> (packSequences(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // the epoch-seeded LCG replayed verbatim; % on nonneg BIGINTs
    "corpus_epoch_shuffle" ->
      """WITH a AS (SELECT e.epoch, d.doc_id,
        |    (d.doc_id * 1103515245 + 12345 + e.epoch * 2654435761)
        |      % 2147483648 AS h
        |  FROM documents d
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
        |    AS e(epoch))
        |SELECT epoch, doc_id, h, h % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, h % 8
        |    ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM a ORDER BY epoch, doc_id""".stripMargin,
    // same bucket-star edge CTE as dedup_cluster_cc; the walk is a
    // depth-bounded recursive CTE, min(dist) = BFS distance
    "graph_bfs_reach" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |keys AS (
        |  SELECT doc_id, 'p' || array_to_string(list_slice(t, 1, 4), ' ') AS k
        |  FROM toks WHERE len(t) >= 4
        |  UNION ALL
        |  SELECT doc_id, 's' || array_to_string(list_slice(t, -4, -1), ' ') AS k
        |  FROM toks WHERE len(t) >= 4
        |),
        |star AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS m FROM keys),
        |e0 AS (SELECT DISTINCT doc_id AS a, m AS b FROM star WHERE m <> doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |walk(id, dist) AS (
        |  SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 0
        |  UNION
        |  SELECT e.a, w.dist + 1 FROM walk w JOIN edges e ON e.b = w.id
        |  WHERE w.dist < 3
        |)
        |SELECT id AS doc_id, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin,
    // single global window replay of the two-level prefix sum (equal by
    // associativity of + over the doc_id order)
    "sample_systematic_weighted" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    (SELECT sum(n_tok) // 50 FROM d) AS stride
        |  FROM d)
        |SELECT doc_id, n_tok, cum_before,
        |  CAST((cum_before + stride - 1) // stride AS BIGINT) AS pick_idx
        |FROM c
        |WHERE (cum_before + n_tok + stride - 1) // stride
        |    > (cum_before + stride - 1) // stride
        |ORDER BY doc_id""".stripMargin,
    "corpus_shard_manifest" ->
      """WITH a AS (SELECT doc_id, n_chars,
        |    (doc_id * 1103515245 + 12345) % 2147483648 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, CAST(h AS BIGINT) AS h,
        |    CAST(h % 16 AS BIGINT) AS shard FROM a)
        |SELECT shard,
        |  CAST(row_number() OVER w AS BIGINT) AS pos,
        |  doc_id, h, n_chars,
        |  CAST(coalesce(sum(n_chars) OVER (PARTITION BY shard
        |    ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS byte_offset
        |FROM s
        |WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)
        |ORDER BY shard, pos""".stripMargin,
    // same sufficient-stats → ⌊sqrt⌋ weight → Hamilton rounding chain;
    // sqrt argument < 2⁵³ so both engines see the identical double
    "sample_stratified_neyman" ->
      """WITH t AS (SELECT coalesce(lang, '(none)') AS lang,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY 1),
        |wgt AS (SELECT lang, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)))
        |      AS BIGINT) AS w_h
        |  FROM t),
        |a AS (SELECT lang, n_docs, w_h, sum(w_h) OVER () AS total_w,
        |    sum(n_docs) OVER () AS total_n
        |  FROM wgt),
        |e AS (SELECT lang, n_docs, w_h,
        |    CASE WHEN total_w = 0 THEN n_docs ELSE w_h END AS w_eff,
        |    CASE WHEN total_w = 0 THEN total_n ELSE total_w END
        |      AS total_eff
        |  FROM a),
        |q AS (SELECT lang, n_docs, w_h,
        |    (100 * w_eff) // total_eff AS quota,
        |    100 * w_eff - ((100 * w_eff) // total_eff) * total_eff AS rem
        |  FROM e),
        |r AS (SELECT lang, n_docs, w_h, quota, rem,
        |    100 - sum(quota) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
        |  FROM q)
        |SELECT lang, n_docs, w_h,
        |  CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM r ORDER BY lang""".stripMargin,
    "corpus_temperature_mix" ->
      """WITH t AS (SELECT coalesce(lang, '(none)') AS lang,
        |    count(*) AS n_docs FROM documents GROUP BY 1),
        |a AS (SELECT lang, n_docs,
        |    CAST(floor(sqrt(n_docs) * 1048576) AS BIGINT) AS weight_fp,
        |    sum(n_docs) OVER () AS n_total FROM t),
        |b AS (SELECT lang, n_docs, weight_fp, n_total,
        |    sum(weight_fp) OVER () AS w_total FROM a),
        |q AS (SELECT lang, n_docs, weight_fp,
        |    (1000000 * n_docs) // n_total AS natural_ppm,
        |    (1000000 * weight_fp) // w_total AS quota,
        |    1000000 * weight_fp
        |      - ((1000000 * weight_fp) // w_total) * w_total AS rem
        |  FROM b),
        |r AS (SELECT lang, n_docs, weight_fp, natural_ppm, quota, rem,
        |    1000000 - sum(quota) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM q)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, weight_fp,
        |  CAST(natural_ppm AS BIGINT) AS natural_ppm,
        |  CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_temp
        |FROM r ORDER BY lang""".stripMargin,
    "corpus_token_budget" ->
      """WITH t AS (SELECT coalesce(lang, '(none)') AS lang,
        |    sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_tokens
        |  FROM documents GROUP BY 1),
        |a AS (SELECT lang, n_tokens, sum(n_tokens) OVER () AS total FROM t),
        |q AS (SELECT lang, n_tokens,
        |    (1000000 * n_tokens) // total AS quota,
        |    1000000 * n_tokens - ((1000000 * n_tokens) // total) * total AS rem
        |  FROM a),
        |r AS (SELECT lang, n_tokens, quota, rem,
        |    1000000 - sum(quota) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
        |  FROM q)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(quota AS BIGINT) AS quota,
        |  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS bonus,
        |  CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY lang""".stripMargin,
    "corpus_quota_sampler" ->
      """WITH r AS (SELECT doc_id,
        |    coalesce(lang, '(none)') AS lang,
        |    coalesce(source, '(none)') AS source,
        |    row_number() OVER (PARTITION BY coalesce(lang, '(none)'),
        |        coalesce(source, '(none)')
        |      ORDER BY sha256(coalesce(text, '')), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY doc_id""".stripMargin,
    "corpus_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, lang, sha256(text) AS h1 FROM documents),
        |kept AS (SELECT doc_id, lang,
        |    sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' [v2]'
        |                ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 7 <> 0),
        |added AS (SELECT doc_id + 1000000 AS doc_id, lang,
        |    sha256(text) AS h2
        |  FROM documents WHERE doc_id % 11 = 0),
        |v2 AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |d AS (SELECT
        |    CASE WHEN v2.h2 IS NULL THEN 'removed'
        |         WHEN v1.h1 IS NULL THEN 'added'
        |         WHEN v1.h1 <> v2.h2 THEN 'changed'
        |         ELSE 'same' END AS status,
        |    coalesce(v1.lang, v2.lang) AS lang
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, lang, count(*) AS n_docs
        |FROM d GROUP BY status, lang ORDER BY status, lang""".stripMargin,
    "compact_incremental_agg" ->
      // the maintained rollup must equal the one-shot aggregate
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT day, event_type, count(*) AS n,
        |  CAST(sum(v) AS DOUBLE) AS sum_value
        |FROM e GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin,
    "quality_corpus_report" ->
      """WITH d AS (SELECT coalesce(source, '(none)') AS source, lang,
        |    n_chars,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
        |      AS p5 FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT p5) AS n_prefix5_distinct,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_chars) AS BIGINT) // count(*) AS mean_chars,
        |  count(*) FILTER (WHERE n_chars < 200) AS n_short
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "dedup_cluster_cc" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |keys AS (
        |  SELECT doc_id, 'p' || array_to_string(list_slice(t, 1, 4), ' ') AS k
        |  FROM toks WHERE len(t) >= 4
        |  UNION ALL
        |  SELECT doc_id, 's' || array_to_string(list_slice(t, -4, -1), ' ') AS k
        |  FROM toks WHERE len(t) >= 4
        |),
        |star AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS m FROM keys),
        |e0 AS (SELECT DISTINCT doc_id AS a, m AS b FROM star WHERE m <> doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |reach(doc_id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.lbl FROM reach r JOIN edges e ON e.b = r.doc_id
        |),
        |cc AS (SELECT doc_id, CAST(min(lbl) AS BIGINT) AS cluster_rep
        |       FROM reach GROUP BY doc_id)
        |SELECT doc_id, cluster_rep,
        |  count(*) OVER (PARTITION BY cluster_rep) AS cluster_sz
        |FROM cc ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      """SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id % 2 = 1 AND NOT EXISTS (
        |  SELECT 1 FROM documents c
        |  WHERE c.doc_id % 2 = 0 AND lower(trim(c.text)) = lower(trim(d.text)))
        |ORDER BY d.doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        |        FROM toks WHERE len(t) >= 8),
        |grams AS (SELECT DISTINCT doc_id,
        |            array_to_string(list_slice(t, i, i + 7), ' ') AS g FROM pos),
        |bench AS (SELECT g, doc_id AS bench_id FROM grams WHERE doc_id % 10 = 0),
        |corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0)
        |SELECT c.doc_id, count(DISTINCT c.g) AS n_grams_hit,
        |  count(DISTINCT b.bench_id) AS n_bench_docs
        |FROM corpus c JOIN bench b USING (g)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "compact_latest_state" ->
      """WITH r AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |FROM events)
        |SELECT user_id, event_id, event_type, ts_us, value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "sample_hash_stratified" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events
        |WHERE substr(sha256(CAST(event_id AS VARCHAR)), 1, 2) <
        |  CASE event_type WHEN 'view' THEN '08' WHEN 'click' THEN '10'
        |       WHEN 'error' THEN '20' WHEN 'signup' THEN '30' ELSE 'c0' END
        |ORDER BY event_id""".stripMargin,
    "sample_reservoir_fixed_k" ->
      """WITH r AS (SELECT coalesce(lang, '(none)') AS lang, doc_id,
        |    length(coalesce(text, '')) AS text_len,
        |    row_number() OVER (PARTITION BY coalesce(lang, '(none)')
        |      ORDER BY sha256(coalesce(text, '')), doc_id) AS rk
        |  FROM documents)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id,
        |  CAST(text_len AS BIGINT) AS text_len
        |FROM r WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "eval_holdout_split" ->
      """WITH s AS (SELECT lang,
        |  CASE WHEN substr(sha256(text), 1, 2) < '0d' THEN 'test'
        |       WHEN substr(sha256(text), 1, 2) < '1a' THEN 'val'
        |       ELSE 'train' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS docs FROM s
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "corpus_mix_rebalance" ->
      """WITH b AS (SELECT lang, count(*) AS docs FROM documents GROUP BY lang),
        |t AS (SELECT count(*) AS n, count(DISTINCT lang) AS l FROM documents)
        |SELECT coalesce(lang, '(none)') AS lang, docs,
        |  (t.n * 1000000) // (t.l * b.docs) AS weight_fp,
        |  (b.docs * ((t.n * 1000000) // (t.l * b.docs))) // 1000000 AS projected
        |FROM b CROSS JOIN t ORDER BY coalesce(lang, '(none)')""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, lang, doc_id % 4 AS shard,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, lang, shard, n_tok,
        |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT lang, shard, CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY lang, shard, pack_id
        |ORDER BY lang, shard, pack_id""".stripMargin
  )
}
