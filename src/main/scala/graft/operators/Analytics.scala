package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Round-3 analytics layer: iterative graph analytics (PageRank), IR
  * scoring (TF-IDF), data-layout optimization (Z-order), runtime join
  * filters (Bloom), corpus quality (repetition), and embedding
  * compression (int8 quantization).
  *
  * Determinism posture (every operator here is oracled): all scores are
  * computed in scaled-integer fixed point with `div` (integer division
  * — identical floor semantics in Spark and DuckDB for the non-negative
  * operands used here), or in IEEE double +,*,/ (bit-identical across
  * engines); no transcendentals, no decimal-rounding divergence.
  */
object Analytics {

  /** Supplier node ids live above this base so the bipartite graph
    * shares one BIGINT id space with customers. */
  private val SupBase = 10000000L
  /** PageRank fixed point: rank 1.0 == 1,000,000. */
  private val RankOne = 1000000L

  /** PageRank (3 fixed iterations, damping 0.85) over the bipartite
    * customer–supplier graph induced by purchases: an undirected edge
    * per distinct (customer, supplier) pair appearing in
    * orders⋈lineitem. The classic "importance" measure for entity
    * graphs — here: which suppliers sit in the broadest customer
    * neighborhoods.
    *
    * Arithmetic is entirely scaled-integer: each node sends
    * `rank div degree` along every edge; the new rank is
    * `0.15·RankOne + (85·Σincoming) div 100`. Integer `div` floors the
    * same way in Spark and DuckDB, so three unrolled iterations
    * hash-match a recursive-free DuckDB oracle exactly — no floating
    * point anywhere.
    *
    * Scale: each iteration is one equi-join (edges ⋈ ranks, both keyed
    * on node id) plus a partial-aggregated groupBy — 16-byte rows, the
    * same shape as connectedComponents. Rounds are fixed (3), not
    * data-dependent; lineage is cut per round via localCheckpoint.
    * Dangling mass is dropped (deg-0 nodes keep the 0.15 base), the
    * standard simplification for fixed-iteration ranking. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e0 = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"), ($"l_suppkey" + SupBase).as("b"))
      .distinct()
    // Symmetric closure, materialized once — reused all 3 rounds.
    // Partitioned by DESTINATION before the checkpoint: every copy of a
    // given b lands in one partition, so each round's partial aggregate
    // compresses the contribution sum to ≤|nodes| rows BEFORE its
    // shuffle (measured at sf0.1: 0.5M → 16k shuffled rows per round).
    val edges = graft.PlanOnly.cut(
      e0.unionAll(e0.select($"b".as("a"), $"a".as("b")))
        .repartition($"b"))
    val deg = edges.groupBy($"a").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("a", "id")
    val nodes = Tables.customer(spark, dir).select($"c_custkey".cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir).select(($"s_suppkey" + SupBase).as("id")))
    var r = graft.PlanOnly.cut(nodes.join(deg, Seq("id"), "left")
      .select($"id", coalesce($"deg", lit(0L)).as("deg"), lit(RankOne).as("r")))
    for (_ <- 1 to 3) {
      // deg-0 nodes are never an edge source; the filter also keeps the
      // integer division away from ANSI div-by-zero
      val inc = edges
        .join(broadcast(r.filter($"deg" > 0).select($"id".as("a"), expr("r div deg").as("c"))),
          Seq("a"))
        .groupBy($"b").agg(sum($"c").as("inc"))
      r = graft.PlanOnly.cut(r.join(inc, $"id" === $"b", "left")
        .select($"id", $"deg",
          (lit(RankOne * 15 / 100) +
            expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) div 100")).as("r")))
    }
    r.select($"id".as("node_id"), $"deg", $"r".as("rank_fp"))
      .orderBy($"node_id")
  }

  /** TF-IDF top-5 terms per document, linear-idf variant: score ∝
    * tf · (N/df), held exact as the scaled integer
    * `(tf · N · 1e6) div df` — logarithmic idf would need `ln` (banned
    * transcendental under the oracle hash-match), and for RANKING terms
    * within a document the linear form is the same family of
    * rare-term-boosting weights. Ties break on the term string.
    *
    * Shape at scale: tf is one (doc,term) partial-agg; df reuses the tf
    * frame (one row per (doc,term) ⇒ count = document frequency) so the
    * corpus is tokenized exactly once; N is a metadata-scale scalar
    * (count of the corpus manifest), folded into the scoring expression
    * as a literal. The final top-5 is a bounded per-doc window. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, dir)
      .select($"doc_id", explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
    // materialized once: df derives FROM the tf frame, and without the
    // checkpoint both branches would re-tokenize the whole corpus — the
    // most expensive stage, twice, at any scale
    val tf = graft.PlanOnly.cut(
      terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // N is a metadata-scale scalar folded in as a literal; a plan audit
    // substitutes 1 rather than running the count job
    val nDocs = if (graft.PlanOnly.enabled) 1L else Tables.documents(spark, dir).count()
    val w = Window.partitionBy($"doc_id").orderBy($"score_fp".desc, $"term")
    tf.join(df, "term")
      .withColumn("score_fp", expr(s"(tf * ${nDocs}L * 1000000) div df"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"doc_id", $"rnk".cast("long").as("rnk"), $"term", $"tf", $"df", $"score_fp")
      .orderBy($"doc_id", $"rnk")
  }

  /** Gopher-style repetition quality signal: the fraction of a
    * document's 3-grams that are repeats of an earlier 3-gram —
    * boilerplate and looping text score high and get filtered before
    * training. Emitted as the exact scaled ratio
    * `(n_grams − n_distinct)·1e6 div n_grams`.
    *
    * The oracled output distinct-counts the gram STRINGS on both sides
    * — same domain, no collision class at all. At 100 TB the distinct
    * state should carry 8-byte xxhash64 fingerprints instead of gram
    * text (the decontaminate posture; see `qualityRepetitionHashed`),
    * which is identical UNLESS a 64-bit collision occurs;
    * AnalyticsSpec asserts the two variants agree on the fixture so a
    * collision fails loudly rather than silently skewing the score. */
  def qualityRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionBase(spark, dir, hashGrams = false)

  /** At-scale variant: distinct-count over xxhash64 fingerprints (8 B
    * of aggregation state per gram instead of the gram text). */
  def qualityRepetitionHashed(spark: SparkSession, dir: String): DataFrame =
    repetitionBase(spark, dir, hashGrams = true)

  private def repetitionBase(spark: SparkSession, dir: String, hashGrams: Boolean): DataFrame = {
    import spark.implicits._
    val gram = "concat_ws(' ', slice(t, i, 3))"
    val gramExpr = if (hashGrams) s"xxhash64($gram)" else gram
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", expr("filter(split(text, ' '), w -> w <> '')").as("t"))
      .filter(size($"t") >= 3)
    toks
      .select($"doc_id", (size($"t") - 2).cast("long").as("n_grams"),
        explode(expr(s"transform(sequence(1, size(t) - 2), i -> $gramExpr)"))
          .as("g"))
      .groupBy($"doc_id", $"n_grams")
      .agg(countDistinct($"g").as("n_distinct"))
      .select($"doc_id", $"n_grams", $"n_distinct",
        expr("((n_grams - n_distinct) * 1000000) div n_grams").as("dup_fp"))
      .orderBy($"doc_id")
  }

  /** Linear quality-classifier scoring (fastText shape): every token
    * bigram hashes to a fixed integer weight, the document score is the
    * mean feature weight, and documents get a per-(lang, shard) decile
    * for threshold gating — the classifier-gate step (filter →
    * repetition → classifier) of a pretraining quality pipeline, with
    * the model reduced to a deterministic weight hash so it oracles
    * exactly.
    *
    * Weights derive from sha256(bigram): the first 4 hex chars parse to
    * an integer whose mod-21 residue is the weight in [0, 20] — both
    * engines compute the identical lowercase hex (the
    * sample_hash_stratified precedent) and keep every operand
    * non-negative, so `div`/`//` agree. The whole per-doc score is ONE
    * codegen'd higher-order expression (transform → aggregate): no
    * explode, no shuffle for scoring — at 100 TB the scoring pass is
    * embarrassingly parallel map work.
    *
    * Quantile assignment shards the ntile window by (lang, doc_id % 4):
    * no window partition outgrows one shard of one language (the
    * pack_sequences bound), and a hash shard is an exchangeable sample,
    * so shard deciles estimate the language's global deciles; an exact
    * global quantile would need either a single-partition window (a
    * scale non-starter) or a two-pass threshold broadcast. */
  def qualityClassifierScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        expr("filter(split(text, ' '), w -> w <> '')").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", $"lang", (size($"t") - 1).cast("long").as("n_bigrams"),
        expr("""aggregate(
                  transform(sequence(1, size(t) - 1),
                    i -> cast(conv(substring(sha2(concat_ws(' ', slice(t, i, 2)), 256), 1, 4), 16, 10) as bigint) % 21),
                  cast(0 as bigint), (acc, x) -> acc + x)""").as("score_raw"))
      .withColumn("score_mi", expr("(score_raw * 1000000) div n_bigrams"))
      .withColumn("shard", $"doc_id" % 4)
    val w = Window.partitionBy($"lang", $"shard").orderBy($"score_mi", $"doc_id")
    d.select($"doc_id", $"lang", $"shard", $"n_bigrams", $"score_raw",
        $"score_mi", ntile(10).over(w).as("decile"))
      .orderBy($"doc_id")
  }

  /** Z-order (Morton) layout key over events: interleave the low 16
    * bits of user_id with the low 16 bits of the event's minute bucket.
    * Sorting/writing by `zval` co-locates rows that are close in BOTH
    * dimensions, so min/max zone maps prune scans filtered on either
    * user OR time — the multi-dimensional clustering trick behind
    * Delta/Iceberg OPTIMIZE ZORDER, expressed as pure integer
    * arithmetic (shift/and/add) that stays in whole-stage codegen.
    * The output is the layout manifest: each event with its curve
    * position, in curve order. */
  def sortZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def interleave(x: Column, y: Column): Column =
      (0 until 16).foldLeft(lit(0L): Column) { (acc, k) =>
        acc +
          shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k) +
          shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1)
      }
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("x", $"user_id".bitwiseAND(lit(65535L)))
      .withColumn("y", expr("(ts_us div 60000000) & 65535"))
      .select($"event_id", $"x", $"y", interleave($"x", $"y").as("zval"))
      .orderBy($"zval", $"event_id")
  }

  /** Bloom-prefiltered join — the runtime-filter pattern for big
    * shuffle joins: build a Bloom filter over the reduced dim side's
    * keys (distributed build, ~100s of KB result), probe it inside the
    * fact scan, and only shuffle fact rows that might match. The exact
    * join afterwards removes false positives, so the result is exact —
    * what the filter changes at 100 TB is the fact side's shuffle
    * volume (|matching| + fpp·|fact| rows instead of |fact|).
    *
    * The join is deliberately hinted shuffle-hash: with a broadcast
    * join the build side would already act as its own filter; the
    * bloom-prefilter pattern exists precisely for dims too big to
    * broadcast. */
  def joinBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val bf = graft.functions.BloomOps.build(dims, "c_custkey", 100000L, 0.01)
    graft.functions.BloomOps.register(spark, bf)
    Tables.orders(spark, dir)
      .filter(expr("bloom_might_contain(o_custkey)"))
      .join(dims.hint("shuffle_hash"), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.dec2($"o_totalprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** Symmetric int8 quantization digest per embedding: q_i =
    * ⌊x_i·127/maxabs + 0.5⌋ (zero vectors quantize to zeros). The
    * compression step before shipping vectors to an ANN index — 4×
    * smaller than float32, and the digest (sum, |sum|, min, max, scale)
    * is what a quantization-quality monitor tracks. float→double
    * widening, *, /, floor are all IEEE-identical across engines, so
    * the digest is oracled exactly. Pure per-row expression work —
    * no shuffle at all before the oracle-driven sort. */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      // empty vectors are dropped on BOTH sides: the oracle's unnest CTE
      // produces no rows for them (inner join drops), and Spark's
      // array_max over [] would emit NULL scale_fp — the decode_stub
      // empty-input divergence class, excluded by construction here
      .filter(size($"embedding") > 0)
      .withColumn("maxabs", expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("q", expr(
        """transform(embedding, x -> CASE WHEN maxabs = 0.0D THEN CAST(0 AS BIGINT)
          |  ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0D / maxabs + 0.5D) AS BIGINT) END)""".stripMargin))
      .select($"vec_id", $"label",
        size($"q").cast("long").as("n_dims"),
        floor($"maxabs" * lit(1099511627776.0)).cast("long").as("scale_fp"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))").as("q_abs_sum"),
        array_min($"q").as("q_min"), array_max($"q").as("q_max"))
      .orderBy($"vec_id")
  }

  /** Robust anomaly gate: per event type, flag values more than 3 MADs
    * (median absolute deviations) from the median — the
    * outlier detector that, unlike mean±3σ (`agg_stats_moments`),
    * doesn't let the outliers themselves inflate the threshold. The
    * standard data-quality screen before a metric feeds training or
    * alerting.
    *
    * Two passes over the event values with a 5-row broadcast between
    * them: medians per type, then deviation medians per type, then one
    * counting aggregate — at 100 TB that is two scans + three tiny
    * aggregates, no large shuffle (the group key has 5 values; partial
    * aggregation collapses each to one row per task).
    *
    * Determinism by construction (not by rounding): `value` is a
    * 4-decimal quantity, so `v_fp = (value::DECIMAL(18,4) · 10⁴)::BIGINT`
    * is exact. A q=0.5 percentile over BIGINTs is exactly representable
    * in double (an integer or a half-integer) no matter how an engine
    * orders its interpolation formula — lo+(hi−lo)·0.5 and (lo+hi)·0.5
    * are bit-identical when lo,hi are integers ≪ 2⁵². Doubling the
    * median (`med2`) and the MAD-of-doubled-deviations (`mad4`) lands
    * everything back in BIGINT, and the outlier gate
    * `2·adev2 > 3·mad4` is pure integer arithmetic: no engine-dependent
    * rounding anywhere on the classification path. The displayed
    * med/mad divide the exact integers back down — division of
    * identical doubles is IEEE-identical cross-engine. */
  def anomalyMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      ($"value".cast("decimal(18,4)") * 10000).cast("long").as("v_fp"))
    val med = e.groupBy($"event_type")
      .agg((expr("percentile(v_fp, 0.5)") * 2).cast("long").as("med2"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev2", abs($"v_fp" * 2 - $"med2"))
    val mad = dev.groupBy($"event_type")
      .agg((expr("percentile(adev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(max($"med2").as("med2"), max($"mad4").as("mad4"),
        sum(when($"adev2" * 2 > $"mad4" * 3, 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
      .select($"event_type",
        ($"med2".cast("double") / 20000.0).as("med"),
        ($"mad4".cast("double") / 40000.0).as("mad"),
        $"n_outliers", $"n")
      .orderBy($"event_type")
  }

  /** Per-node triangle count over the strong-tie supplier graph.
    *
    * The raw co-occurrence graph on this synthetic data is near-
    * complete (every supplier pair shares parts), so triangles are
    * counted on a kNN sparsification: each node keeps its 5 strongest
    * neighbors (most shared parts; ties broken by id), edges
    * undirected-deduped, THEN triangles enumerated. That's also the
    * 100 TB shape: sparsify with a PARTITIONED window (per-node top-k —
    * never a global rank), and enumerate on the sparse graph where the
    * e⋈e⋈e chain is bounded by max-degree, not the raw quadratic
    * incidence.
    *
    * Incidence pairs come from the set-explode shape (groupBy partkey →
    * sorted set → per-element explode of the others), not a self-join —
    * measured 2× faster on this data (CopurchaseProbe) and one shuffle.
    * The sparse edge frame is persisted because the triangle join reads
    * it three times (same caller contract as text_decontaminate: the
    * harness clearCache()s per query). Triangle orientation a<b<c
    * counts each exactly once; per-node counts explode the 3 roles. */
  def graphTriangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = Fanout.byKey(Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct(), $"l_partkey")
      .groupBy($"l_partkey")
      .agg(sort_array(collect_set($"l_suppkey")).as("ss"))
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("sp"))
    // mirror directions AFTER the pair aggregation: the dominant
    // shuffle carries each unordered pair once (the ordered-pair
    // explode would double it), and the cheap 2× fan-out happens on
    // the already-aggregated frame
    val inc = Fanout.byKey(und.select(explode(array(
        struct($"s1".as("u"), $"s2".as("v"), $"sp"),
        struct($"s2".as("u"), $"s1".as("v"), $"sp"))).as("x"))
      .select($"x.u".as("u"), $"x.v".as("v"), $"x.sp".as("sp")), $"u")
    val w = Window.partitionBy($"u").orderBy($"sp".desc, $"v")
    // cut, not mark (r18): the 3-way wedge self-join broadcasts two e
    // sides — concurrent futures racing a lazy persist would recompute
    // the whole sparsified-edge build per side
    val e = graft.PlanOnly.cut(
      inc.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
        .distinct())
    val t = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    t.select(explode(array($"x", $"y", $"z")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"node")
  }

  /** K-TRUSS PEELING (Cohen 2008) — the cohesion decomposition one
    * rung above [[graphKcorePeel]]'s degree criterion: every edge of
    * the 3-truss must sit in ≥ 1 triangle OF THE TRUSS (k-truss with
    * k = 3, support bound k − 2), so peeling
    * alternates triangle-support counting with edge removal —
    * hop-bounded at 3 rounds (the bounded-round certificate contract
    * shared with graph_scc_decompose). Graph = the co-purchase
    * top-5-kNN sparsified supplier graph shared with
    * graph_triangle_count / graph_clustering_coeff (canonical a < b
    * edges). Output = the per-round receipt table (edges in, oriented
    * triangles, edges dropped, edges out) auditing convergence —
    * round 1 peels the triangle-free fringe, the later rounds CERTIFY
    * the fixpoint (n_dropped = 0 once the truss is stable); the
    * oracle unrolls all three rounds.
    *
    * Scale shape: per round ONE oriented 3-way edge self-join (the
    * graph_triangle_count wedge shape over a degree-capped frame —
    * wedge work bounded by cap², never raw degree), one support
    * aggregate, one semi-filter; rounds are a constant → a fixed
    * shuffle count at any graph size, and the edge set only shrinks. */
  def graphKtrussPeel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def buildE0(): DataFrame = {
      val und = Fanout.byKey(Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey").distinct(), $"l_partkey")
        .groupBy($"l_partkey")
        .agg(sort_array(collect_set($"l_suppkey")).as("ss"))
        .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
        .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
        .groupBy($"s1", $"s2").agg(count(lit(1)).as("sp"))
      val inc = Fanout.byKey(und.select(explode(array(
          struct($"s1".as("u"), $"s2".as("v"), $"sp"),
          struct($"s2".as("u"), $"s1".as("v"), $"sp"))).as("x"))
        .select($"x.u".as("u"), $"x.v".as("v"), $"x.sp".as("sp")), $"u")
      val w = Window.partitionBy($"u").orderBy($"sp".desc, $"v")
      inc.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
        .distinct()
    }
    def cnt(df: DataFrame, as: String): DataFrame =
      df.agg(count(lit(1)).cast("long").as(as))
    var edges = graft.PlanOnly.cut(buildE0())
    val rounds = if (graft.PlanOnly.enabled) 1 else 3
    var stats: DataFrame = null
    for (r <- 1 to rounds) {
      val t = edges.as("e1")
        .join(edges.as("e2"), col("e2.a") === col("e1.b"))
        .join(edges.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      val sup = graft.PlanOnly.cut(t
        .select(explode(array(
          struct($"x".as("a"), $"y".as("b")),
          struct($"x".as("a"), $"z".as("b")),
          struct($"y".as("a"), $"z".as("b")))).as("k"))
        .select($"k.a".as("a"), $"k.b".as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("support")))
      val kept = graft.PlanOnly.cut(edges
        .join(sup.filter($"support" >= 1L).select($"a", $"b"),
          Seq("a", "b"), "left_semi"))
      val stat = cnt(edges, "n_edges_in")
        .crossJoin(sup.agg(coalesce(sum($"support"), lit(0L)).as("s3"))
          .select(expr("s3 div 3").as("n_triangles")))
        .crossJoin(cnt(kept, "n_edges_out"))
        .select(lit(r.toLong).as("round"), $"n_edges_in", $"n_triangles",
          ($"n_edges_in" - $"n_edges_out").as("n_dropped"), $"n_edges_out")
      stats = if (stats == null) stat else stats.unionAll(stat)
      edges = kept
    }
    stats.orderBy($"round")
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over the bipartite
    * customer→supplier purchase graph — the OTHER eigenvector ranking
    * (PageRank scores a stochastic walk; HITS power-iterates AᵀA, so
    * an authority is a supplier bought by broad BUYERS and a hub a
    * customer buying from authoritative SUPPLIERS — the mutual
    * reinforcement PageRank's single score can't express). Two full
    * hub→authority rounds from h⁰ = 1, each half-step max-norm
    * renormalized to 2²⁰ (the sqrt-free power-method scaling shared
    * with ml_pca_power_iter); both authority iterates emitted so the
    * hash certifies the alternation chain. ONE SQL text runs verbatim
    * on both engines.
    *
    * Scale shape: each half-step is one co-partitioned edge⋈vector
    * join + partial-aggregated sum — the pagerank per-round shape;
    * max-norms are scalar subqueries (never a window). */
  def graphHitsHubsAuth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: the SQL references `e` five times (h1, a1, h2, a2, deg) and
    // Spark inlines the CTE — five recomputations of the distinct
    // customer→supplier edge join. Materialize e ONCE (eager
    // checkpoint) and point the CTE at it; the oracle keeps the
    // self-contained text (same rows, hash unchanged). In plan-only
    // mode cut is identity, so the audit still sees the full dag.
    val e = graft.PlanOnly.cut(
      Tables.orders(spark, dir).select($"o_custkey", $"o_orderkey")
        .join(Tables.lineitem(spark, dir)
          .select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("s")).distinct())
    e.createOrReplaceTempView("hits_e")
    spark.sql(hitsSql("hits_ord", "hits_li", "div",
      eBody = Some("SELECT c, s FROM hits_e")))
  }

  /** Shared HITS SQL — `idiv` is `div` (Spark) or `//` (DuckDB);
    * `eBody` optionally replaces the edge CTE's body with a
    * pre-materialized view (the graded Spark path; the oracle inlines
    * the self-contained default). */
  private[graft] def hitsSql(ord: String, li: String, idiv: String,
      eBody: Option[String] = None): String =
    s"""WITH e AS (${eBody.getOrElse(
        s"SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s\n" +
        s"  FROM $ord o JOIN $li l ON o.o_orderkey = l.l_orderkey")}),
       |h1 AS (SELECT c, CAST(count(*) AS BIGINT) AS h FROM e GROUP BY c),
       |h1n AS (SELECT c, (h * 1048576) $idiv (SELECT max(h) FROM h1)
       |    AS hn FROM h1),
       |a1 AS (SELECT s, CAST(sum(hn) AS BIGINT) AS a
       |  FROM e JOIN h1n ON e.c = h1n.c GROUP BY s),
       |a1n AS (SELECT s, (a * 1048576) $idiv (SELECT max(a) FROM a1)
       |    AS an FROM a1),
       |h2 AS (SELECT c, CAST(sum(an) AS BIGINT) AS h
       |  FROM e JOIN a1n ON e.s = a1n.s GROUP BY c),
       |h2n AS (SELECT c, (h * 1048576) $idiv (SELECT max(h) FROM h2)
       |    AS hn FROM h2),
       |a2 AS (SELECT s, CAST(sum(hn) AS BIGINT) AS a
       |  FROM e JOIN h2n ON e.c = h2n.c GROUP BY s),
       |a2n AS (SELECT s, (a * 1048576) $idiv (SELECT max(a) FROM a2)
       |    AS an FROM a2),
       |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS indeg
       |  FROM e GROUP BY s)
       |SELECT deg.s AS supplier, deg.indeg,
       |  CAST(a1n.an AS BIGINT) AS auth1_fp,
       |  CAST(a2n.an AS BIGINT) AS auth2_fp
       |FROM deg JOIN a1n ON deg.s = a1n.s JOIN a2n ON deg.s = a2n.s
       |ORDER BY supplier""".stripMargin

  /** ASSOCIATION RULES over order baskets (Agrawal–Srikant market-
    * basket analysis) — the top-50 part pairs by LIFT with
    * support ≥ 2 baskets: support/confidence in exact ppm, lift in 2²⁰
    * fixed point (lift = P(p1,p2)/(P(p1)·P(p2)) cleared to
    * n_pair·N div (c1·c2)), (lift DESC, p1, p2) total order under the
    * LIMIT so the cut is deterministic. The classic retail
    * cross-sell / co-occurrence screen at the order grain the
    * copurchase graph keys don't cover (they pair SUPPLIERS via
    * parts; this pairs PARTS via baskets).
    *
    * Scale shape: pair generation is the basket-local slice-explode
    * (fan-out bounded by basket size — TPC-H baskets are ≤ 7 lines;
    * the graded side never self-joins the fact table), part counts are
    * one aggregate, the N scalar an inline subquery (ReuseSubquery
    * dedupes), and the cut is TakeOrderedAndProject. */
  def reportAssociationRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bi = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    bi.createOrReplaceTempView("ar_bi")
    bi.groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("ps"))
      .select($"ps", posexplode($"ps").as(Seq("i", "p1")))
      .select($"p1", explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("n_pair"))
      .filter($"n_pair" >= 2)
      .createOrReplaceTempView("ar_pairs")
    bi.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .createOrReplaceTempView("ar_cnt")
    spark.sql(
      """SELECT p.p1, p.p2, p.n_pair, c1.c AS c1, c2.c AS c2,
        |  (SELECT count(DISTINCT l_orderkey) FROM ar_bi) AS n_orders,
        |  (p.n_pair * 1000000)
        |    div (SELECT count(DISTINCT l_orderkey) FROM ar_bi)
        |    AS support_ppm,
        |  (p.n_pair * 1000000) div c1.c AS conf_ppm,
        |  (p.n_pair * (SELECT count(DISTINCT l_orderkey) FROM ar_bi)
        |    * 1048576) div (c1.c * c2.c) AS lift_fp
        |FROM ar_pairs p
        |JOIN ar_cnt c1 ON p.p1 = c1.l_partkey
        |JOIN ar_cnt c2 ON p.p2 = c2.l_partkey
        |ORDER BY lift_fp DESC, p1, p2 LIMIT 50""".stripMargin)
  }

  /** LOCAL CLUSTERING COEFFICIENT per supplier (Watts–Strogatz 1998)
    * over the same top-5-affinity sparsified backbone as
    * [[graphTriangleCount]] — the per-node "how clique-like is my
    * neighborhood" ratio community detection and link prediction both
    * read: lcc = 2·tri / (deg·(deg−1)) in 2²⁰ fixed point, −1 sentinel
    * for degree-<2 nodes where the ratio is undefined. Extends the
    * triangle key from a count to the normalized coefficient (the
    * triangle census alone can't rank a hub against a leaf).
    *
    * Scale shape: identical to the triangle key — kNN sparsification
    * bounds the edge set at 5·|nodes| before the wedge join, so the
    * triple-join cost is degree-bounded, never n²; degrees and the
    * coefficient are one aggregate + one broadcast-size join over the
    * per-node frames. */
  def graphClusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = Fanout.byKey(Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct(), $"l_partkey")
      .groupBy($"l_partkey")
      .agg(sort_array(collect_set($"l_suppkey")).as("ss"))
      .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
      .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("sp"))
    val inc = Fanout.byKey(und.select(explode(array(
        struct($"s1".as("u"), $"s2".as("v"), $"sp"),
        struct($"s2".as("u"), $"s1".as("v"), $"sp"))).as("x"))
      .select($"x.u".as("u"), $"x.v".as("v"), $"x.sp".as("sp")), $"u")
    val w = Window.partitionBy($"u").orderBy($"sp".desc, $"v")
    // marked: the sparsified edge set feeds degrees AND both sides of
    // the wedge/closure joins
    // cut, not mark (r18): the 3-way wedge self-join broadcasts two e
    // sides — concurrent futures racing a lazy persist would recompute
    // the whole sparsified-edge build per side
    val e = graft.PlanOnly.cut(
      inc.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
        .distinct())
    val deg = e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .select(explode(array($"x", $"y", $"z")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("node"), "left")
      .withColumn("n_triangles", coalesce($"tri", lit(0L)))
      .select($"node", $"deg", $"n_triangles",
        when($"deg" < 2, -1L)
          .otherwise(expr("(2 * n_triangles * 1048576) div (deg * (deg - 1))"))
          .as("lcc_fp"))
      .orderBy($"node")
  }

  /** Collocation mining — the PMI/lift shape: bigrams whose observed
    * frequency beats the independence expectation of their two words,
    * lift = p(xy) / (p(x)·p(y)) with all probabilities over the bigram
    * total. The standard first step of phrase detection (word2vec
    * phrases, n-gram LM pruning) over a tokenized corpus.
    *
    * Determinism: PMI's log is banned cross-engine (transcendental),
    * and lift's division has no identical-doubles guarantee — so the
    * score is exact 2^20 fixed point via BIGINT floor-division:
    * lift_fp = (c_xy · N · 2^20) div (c_x · c_y), monotone in PMI.
    * The products run in DECIMAL(38,0) (Spark) ⟷ HUGEINT (DuckDB) —
    * BIGINT would overflow near sf1 in the degenerate worst case; the
    * 38-digit ceiling gives headroom past sf1000.
    *
    * Scale shape: unigram and bigram counts both partial-aggregate
    * map-side (shuffle = O(vocab), O(vocab²-observed)); the corpus
    * total N is a scalar re-aggregate of the ALREADY AGGREGATED bigram
    * frame (inline scalar subquery — never a one-row cross join, which
    * would plan BroadcastNestedLoopJoin); the two unigram decorations
    * broadcast at any realistic vocabulary. No single-partition
    * window, no driver-side count. */
  def textCollocationLift(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents_tcl")
    spark.sql(
      """WITH toks AS (
        |  SELECT filter(split(text, ' '), w -> w <> '') AS t
        |  FROM documents_tcl),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT explode(t) AS w FROM toks) GROUP BY w),
        |bi AS (
        |  SELECT element_at(t, i) AS w1, element_at(t, i + 1) AS w2,
        |    count(*) AS c_xy
        |  FROM (SELECT t, explode(sequence(1, size(t) - 1)) AS i
        |        FROM toks WHERE size(t) >= 2)
        |  GROUP BY 1, 2)
        |SELECT w1, w2, c_xy,
        |  CAST((CAST(c_xy AS DECIMAL(38,0))
        |      * (SELECT sum(c_xy) FROM bi) * 1048576)
        |    div (CAST(u1.c AS DECIMAL(38,0)) * u2.c) AS BIGINT) AS lift_fp
        |FROM bi JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w
        |WHERE c_xy >= 5
        |ORDER BY lift_fp DESC, w1, w2 LIMIT 100""".stripMargin)
  }

  /** Parametric 3σ outlier census per event type — the classical
    * z-score companion to the robust MAD screen (anomaly_mad_outliers):
    * MAD survives heavy tails, z-score is what monitoring dashboards
    * actually compute. The determinism problem is that μ and σ are
    * ratios (FP division + sqrt cross-engine); the classification is
    * therefore rewritten multiplication-only over integer fixed point:
    *
    *   |x − μ| > 3σ  ⟺  (n·x − S)² > 9·(n·SS − S²)
    *
    * with x = value·10⁴ (events.value is 4-dec exact), S = Σx,
    * SS = Σx² — every operand an exact integer in both engines (Spark
    * DECIMAL(38,0), DuckDB HUGEINT), so no rounding boundary exists at
    * all, unlike the MAD key's round(6) quantization.
    *
    * Scale shape: one partial-aggregated stats pass (5 group rows),
    * broadcast back over the fact scan, conditional count — two scans,
    * zero wide shuffles. Magnitude audit at sf0.1: SS ≤ 6.3e17 (BIGINT
    * sum is safe but summed as DECIMAL anyway), n·SS ≤ 1.3e22 and
    * (n·x−S)² ≤ 1.2e22, both far under the 1e38 DECIMAL(38)/HUGEINT
    * ceiling — headroom to ~sf100. */
  def anomalyZscoreExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Tables.events(spark, dir)
      .select($"event_type", (Tables.dec4($"value") * 10000).cast("long").as("x"))
    val s = v.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x").cast("decimal(38,0)").as("sx"),
      sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"))
    val d = ($"n" * $"x" - $"sx").cast("decimal(38,0)")
    v.join(broadcast(s), "event_type")
      .groupBy($"event_type")
      .agg(
        max($"n").as("n"),
        sum(when(d * d >
          ($"n".cast("decimal(38,0)") * $"sxx" - $"sx" * $"sx") * 9,
          1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  /** 2-D Pareto skyline over parts — the cheapest-for-its-size
    * frontier: a part survives iff NO other part is both
    * no-more-expensive and no-smaller, with at least one strict
    * inequality (minimize retail price, maximize size). The classic
    * dominance query (Börzsönyi et al., "The Skyline Operator",
    * ICDE'01) — product search fronts, price-performance audits,
    * model-selection curves.
    *
    * Plan: the sort-based window rewrite, NEVER the O(n²) dominance
    * self-join the textbook formulation implies — and the DuckDB
    * oracle deliberately KEEPS the quadratic NOT EXISTS form, so the
    * hash-match itself proves the rewrite. On DISTINCT (price, size)
    * pairs sorted (price asc, size desc), a pair is dominated iff the
    * running max of size over the strict row prefix ≥ its own size:
    * a prefix row has either strictly smaller price (≥ size ⇒
    * dominates) or equal price and — pairs being distinct — strictly
    * larger size (dominates); conversely the prefix-max witness is
    * always a dominator. Equal (price, size) parts never dominate
    * each other, which the pair-dedup encodes for free.
    *
    * Scale shape: skyline is distributive — frontier(A ∪ B) =
    * frontier(frontier(A) ∪ frontier(B)) — so phase 1 prunes with a
    * PARTITIONED window per hash shard and only the ≤32 shard
    * frontiers (each already tiny) reach the phase-2 global window;
    * the one single-partition sort ingests survivors, never the
    * table. Survivor pairs broadcast-join back to parts for the
    * row-grain report. */
  def skylinePareto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .select($"p_partkey", Tables.dec2($"p_retailprice").as("price"), $"p_size")
    val pairs = parts.groupBy($"price", $"p_size").agg(count(lit(1)).as("n_parts"))
    def undominated(df: DataFrame, shard: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(shard: _*).orderBy($"price".asc, $"p_size".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("pm", max($"p_size").over(w))
        .filter($"pm".isNull || $"pm" < $"p_size").drop("pm")
    }
    val local = undominated(
      pairs.withColumn("shard", pmod(hash($"price", $"p_size"), lit(32))),
      Seq($"shard")).drop("shard")
    val global = undominated(local, Seq.empty)
    parts.join(broadcast(global.select($"price", $"p_size")), Seq("price", "p_size"))
      .select($"p_partkey", $"price".cast("double").as("price"), $"p_size")
      .orderBy($"p_partkey")
  }

  /** Temporal rate-spike census — the monitoring-alert shape the
    * distribution-based outlier keys (z-score, MAD) don't cover: per
    * (event_type, hour bucket), is the event RATE more than 2× the
    * trailing-24-bucket average? Detected entirely in integers —
    * spike ⟺ cnt·n_trailing > 2·Σtrailing — so the threshold compare
    * cannot diverge cross-engine (the anomaly_zscore_exact
    * multiply-through discipline applied to rates). Reports per type:
    * buckets observed, spikes, the peak bucket and its count
    * (struct-argmax, earliest bucket tie-break).
    *
    * Scale shape: the event scan collapses to ≤|types|×|hours| rows in
    * one partial+final aggregate; the trailing window (range frame
    * over the bucket index, so calendar gaps count as missing — rows
    * frame would silently stretch the lookback) and the final census
    * run on that tiny frame. First 24 buckets of a type have a short
    * trailing history by construction; they census like any other
    * (the trailing average adapts, the standard cold-start rule). */
  def anomalyRateSpike(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wTrail = Window.partitionBy($"event_type").orderBy($"hr")
      .rangeBetween(-24, -1)
    val hourly = Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("t"))
      .select($"event_type", expr("t div 3600000000").as("hr"))
      .groupBy($"event_type", $"hr").agg(count(lit(1)).as("cnt"))
    hourly
      .withColumn("trail_sum", sum($"cnt").over(wTrail))
      .withColumn("trail_n", count(lit(1)).over(wTrail))
      .withColumn("spike",
        when($"trail_n" > 0 && $"cnt" * $"trail_n" > $"trail_sum" * 2, 1L)
          .otherwise(0L))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_buckets"),
        sum($"spike").as("n_spikes"),
        max(struct($"cnt", (-$"hr").as("neg_hr"))).getField("cnt").as("peak_cnt"),
        (-max(struct($"cnt", (-$"hr").as("neg_hr"))).getField("neg_hr")).as("peak_hr"))
      .orderBy($"event_type")
  }

  /** ABC inventory classification — the Pareto report every
    * supply-chain/revenue dashboard opens with: parts ranked by revenue,
    * classed A while the running share stays ≤ 80%, B to 95%, C beyond,
    * reported as the 3-row class census (count, revenue mass, rank
    * span). Division-free: all comparisons are integer cross-products
    * on revenue in 10⁻⁴-currency fixed point (cum·5 ≤ total·4 ⟺ share
    * ≤ 80%) — exact in both engines; at extreme corpus scale the sums
    * move to DECIMAL(38,0), same plan.
    *
    * Scale shape: the fact scan collapses to the per-part revenue frame
    * (dimension-scale) before any windowing; the global revenue-order
    * rank and running sum then come from [[DistributedRank.rankCum]] —
    * the multi-level prefix-sum decomposition, so no totally-ordered
    * window ever sees more than a bounded bucket frame (the former
    * single-partition `Window.orderBy` over |parts| rows is gone; the
    * oracle replays the single-window form and the hash-match proves
    * the decomposition). */
  def reportAbcClassification(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        (Tables.dec2($"l_extendedprice") *
          (lit(BigDecimal(1)) - Tables.dec2($"l_discount")) * 10000)
          .cast("long").as("r_fp"))
      .groupBy($"l_partkey").agg(sum($"r_fp").as("r_fp"))
      .withColumn("neg_r", -$"r_fp")
    DistributedRank.rankCum(rev, "neg_r", "l_partkey", "r_fp")
      .withColumn("abc_class",
        when($"cum" * 5 <= $"w_total" * 4, "A")
          .when($"cum" * 20 <= $"w_total" * 19, "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(count(lit(1)).as("n_parts"), sum($"r_fp").as("revenue_fp"),
        min($"rnk").as("min_rnk"), max($"rnk").as("max_rnk"))
      .orderBy($"abc_class")
  }

  /** Winsorization clamp report per event type — the outlier-taming
    * data-cleaning pass a feature pipeline runs before training: values
    * below the exact 5th percentile (percentile_disc semantics: the
    * smallest member value with cumulative rank ≥ p — an ELECTED member,
    * never an interpolation) are raised to it, above the 95th lowered to
    * it, and the report prices the intervention: n, clip counts on each
    * side, and the value mass before/after (value·10⁴ BIGINT).
    *
    * Scale shape: the event rows collapse map-side to a per-(type,
    * value) HISTOGRAM first — one combinable aggregate, after which
    * every frame is value-domain-scale (|distinct v_fp| rows per type),
    * never event-scale. The percentile election is grain-invariant:
    * the rank-k row's value is the smallest value whose cumulative
    * count reaches k, so min(v_fp | cum ≥ k) over the histogram ≡ the
    * rank-k election over raw rows (the oracle replays the row-grain
    * form; the hash-match proves the rewrite). The clamp report then
    * reads the SAME persisted histogram — counts and masses weight by
    * cnt — so the event log is scanned exactly once. */
  def qualityWinsorizeClip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cut, not mark (r19, X6): bounds is a BROADCAST build off this
    // frame while the clamp report probes it — the broadcast future
    // racing a lazy persist re-runs the event scan + histogram
    // aggregate; the frame is value-domain scale, so the eager
    // checkpoint is one tiny job
    val hist = graft.PlanOnly.cut(Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type",
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .groupBy($"event_type", $"v_fp")
      .agg(count(lit(1)).as("cnt")))
    val wc = Window.partitionBy($"event_type").orderBy($"v_fp")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bounds = hist
      .withColumn("cum", sum($"cnt").over(wc))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg(min(when($"cum" >= expr("(n * 5 + 99) div 100"), $"v_fp"))
        .as("lo"),
        min(when($"cum" >= expr("(n * 95 + 99) div 100"), $"v_fp"))
          .as("hi"))
    hist
      .join(broadcast(bounds), "event_type")
      .groupBy($"event_type")
      .agg(sum($"cnt").as("n"),
        sum(when($"v_fp" < $"lo", $"cnt").otherwise(0L)).as("n_clip_lo"),
        sum(when($"v_fp" > $"hi", $"cnt").otherwise(0L)).as("n_clip_hi"),
        sum($"v_fp" * $"cnt").as("sum_before_fp"),
        sum(greatest($"lo", least($"hi", $"v_fp")) * $"cnt")
          .as("sum_after_fp"),
        max($"lo").as("lo_fp"), max($"hi").as("hi_fp"))
      .orderBy($"event_type")
  }

  /** Open-order backlog aging — the operations report every order desk
    * runs: orders still open (status 'O') bucketed by age (180-day
    * bands relative to the latest order date, capped at band 4), per
    * (priority, band): count and value mass in exact cents. The corpus
    * anchor date is an inline scalar subquery (the
    * agg_time_decay_weighted pattern), so the report is deterministic
    * on any snapshot.
    *
    * Scale shape: one map-side-combinable (priority, band) aggregate
    * over the filtered scan; the anchor is metadata-scale. */
  def reportBacklogAging(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "O")
      .select($"o_orderpriority",
        (Tables.dec2($"o_totalprice") * 100).cast("long").as("cents"),
        unix_date(to_date($"o_orderdate")).cast("long").as("od"))
      .createOrReplaceTempView("backlog_src")
    spark.sql(
      """SELECT o_orderpriority,
        |  least((((SELECT max(od) FROM backlog_src) - od) div 180), 4)
        |    AS age_band,
        |  count(*) AS n_orders,
        |  sum(cents) AS value_cents
        |FROM backlog_src
        |GROUP BY o_orderpriority, age_band
        |ORDER BY o_orderpriority, age_band""".stripMargin)
  }

  /** Order-to-ship latency report per priority class — the fulfilment
    * SLA dashboard: every lineitem's shipping delay in whole days
    * (l_shipdate − o_orderdate, epoch-day integers), rolled up per
    * priority with count, min/max, exact day mass, and the exact median
    * (percentile_disc election at rank ⌈n/2⌉ — the winsorize machinery
    * pointed at a latency distribution).
    *
    * Scale shape: the orders→lineitem equi-join shuffles on orderkey
    * (orders side is the smaller but NOT broadcast-size at 100 TB —
    * the standard fact-fact shuffle join); the join output then
    * collapses map-side to a per-(priority, latency-day) HISTOGRAM —
    * the day domain is tiny, so the cumulative/median window runs over
    * a metadata-scale frame, never the fact rows. The median election
    * is grain-invariant: the rank-⌈n/2⌉ latency is the smallest day
    * whose cumulative count reaches ⌈n/2⌉ (the oracle replays the
    * row-grain rank form; the hash-match proves the rewrite). */
  def reportShipLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        unix_date(to_date($"l_shipdate")).cast("long").as("sd"))
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderpriority",
          unix_date(to_date($"o_orderdate")).cast("long").as("od")),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority", ($"sd" - $"od").as("days"))
      .groupBy($"o_orderpriority", $"days")
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy($"o_orderpriority").orderBy($"days")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("cum", sum($"cnt").over(wc))
      .withColumn("n", sum($"cnt")
        .over(Window.partitionBy($"o_orderpriority")))
      .groupBy($"o_orderpriority")
      .agg(max($"n").as("n_lines"),
        min($"days").as("min_days"), max($"days").as("max_days"),
        sum($"days" * $"cnt").as("sum_days"),
        min(when($"cum" >= expr("(n + 1) div 2"), $"days")).as("p50_days"))
      .orderBy($"o_orderpriority")
  }

  /** Supplier market concentration per brand — the Herfindahl–
    * Hirschman index every procurement/antitrust review computes, in
    * exact integer form: within each brand's shipped-quantity market,
    * HHI = Σ share_s², emitted as the exact cross-product
    * hhi_fp = (Σ q_s²·2²⁰) div (Σ q_s)² — one truncating division per
    * brand, no per-supplier ratios. A brand served by one supplier
    * scores 2²⁰ (monopoly); even splits score 2²⁰/n.
    *
    * Scale shape: lineitem joins the ≤|parts| brand map (broadcast at
    * fixture scale, shuffled at 100 TB), collapses map-side to
    * (brand, supplier) quantity mass, then to |brands| rows — the
    * windowless two-level rollup. */
  def reportBrandConcentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("q"))
      .join(Tables.part(spark, dir).select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"l_suppkey")
      .agg(sum($"q").as("qs"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_suppliers"), sum($"qs").as("q_total"),
        sum($"qs" * $"qs").as("sum_sq"))
      .select($"p_brand", $"n_suppliers", $"q_total",
        expr("(sum_sq * 1048576) div (q_total * q_total)").as("hhi_fp"))
      .orderBy($"p_brand")
  }

  val queries: Map[String, QueryFn] = Map(
    "report_brand_concentration" -> (reportBrandConcentration(_, _)),
    "report_ship_latency" -> (reportShipLatency(_, _)),
    "quality_winsorize_clip" -> (qualityWinsorizeClip(_, _)),
    "report_backlog_aging" -> (reportBacklogAging(_, _)),
    "report_abc_classification" -> (reportAbcClassification(_, _)),
    "anomaly_rate_spike" -> (anomalyRateSpike(_, _)),
    "skyline_pareto" -> (skylinePareto(_, _)),
    "anomaly_zscore_exact" -> (anomalyZscoreExact(_, _)),
    "text_collocation_lift" -> (textCollocationLift(_, _)),
    "graph_triangle_count" -> (graphTriangleCount(_, _)),
    "graph_ktruss_peel" -> (graphKtrussPeel(_, _)),
    "graph_clustering_coeff" -> (graphClusteringCoeff(_, _)),
    "report_association_rules" -> (reportAssociationRules(_, _)),
    "graph_hits_hubs_auth" -> (graphHitsHubsAuth(_, _)),
    "anomaly_mad_outliers" -> (anomalyMadOutliers(_, _)),
    "graph_pagerank" -> (graphPagerank(_, _)),
    "graph_ppr_seeded" -> (graphPprSeeded(_, _)),
    "text_tfidf" -> (textTfidf(_, _)),
    "quality_repetition" -> (qualityRepetition(_, _)),
    "quality_classifier_score" -> (qualityClassifierScore(_, _)),
    "sort_zorder_layout" -> (sortZorderLayout(_, _)),
    "join_bloom_prefilter" -> (joinBloomPrefilter(_, _)),
    "embedding_quantize" -> (embeddingQuantize(_, _))
  )

  private def zorderSql: String = {
    val terms = (0 until 16).flatMap(k => Seq(
      s"((x >> $k) & 1) * ${1L << (2 * k)}",
      s"((y >> $k) & 1) * ${1L << (2 * k + 1)}"))
      .mkString(" + ")
    s"""WITH b AS (SELECT event_id, user_id & 65535 AS x,
       |  (epoch_us(ts) // 60000000) & 65535 AS y FROM events)
       |SELECT event_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       |  CAST($terms AS BIGINT) AS zval
       |FROM b ORDER BY zval, event_id""".stripMargin
  }

  /** PERSONALIZED PageRank (2 fixed iterations, damping 0.85, restart
    * mass confined to a seed set), graded — the Jeh–Widom / Page et al.
    * personalization that turns the global importance walk into a
    * FROM-WHOSE-PERSPECTIVE walk: restart probability flows only to
    * the seeds (customers with `c_custkey % 100 = 1`), so rank mass
    * decays with graph distance from them — the primitive behind
    * graph-based recommendation and the weighted contamination radius
    * (graph_bfs_reach's hop census, upgraded with mass). Same exact
    * integer scheme as [[graphPagerank]]: contributions `r div deg`,
    * update `seed·0.15·RankOne + (85·Σincoming) div 100` — every
    * division truncating, zero floats, two unrolled iterations
    * hash-matched against the recursive-free oracle.
    *
    * Scale shape: identical to pagerank (edges pre-partitioned by
    * destination, per-round partial-aggregated contribution sums);
    * the engine additionally drops zero-rank sources from the
    * broadcast (they contribute nothing — arithmetic unchanged, the
    * frontier shrinks to the seeds' neighborhood early on, which is
    * the sparsity PPR exists to exploit). */
  def graphPprSeeded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e0 = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"), ($"l_suppkey" + SupBase).as("b"))
      .distinct()
    val edges = graft.PlanOnly.cut(
      e0.unionAll(e0.select($"b".as("a"), $"a".as("b")))
        .repartition($"b"))
    val deg = edges.groupBy($"a").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("a", "id")
    val nodes = Tables.customer(spark, dir)
      .select($"c_custkey".cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select(($"s_suppkey" + SupBase).as("id")))
    var r = graft.PlanOnly.cut(nodes.join(deg, Seq("id"), "left")
      .select($"id", coalesce($"deg", lit(0L)).as("deg"),
        when($"id" < SupBase && $"id" % 100 === 1, 1L).otherwise(0L)
          .as("seed"))
      .withColumn("r", $"seed" * lit(RankOne)))
    for (_ <- 1 to 2) {
      val inc = edges
        .join(broadcast(r.filter($"deg" > 0 && $"r" > 0)
          .select($"id".as("a"), expr("r div deg").as("c"))), Seq("a"))
        .groupBy($"b").agg(sum($"c").as("inc"))
      r = graft.PlanOnly.cut(r.join(inc, $"id" === $"b", "left")
        .select($"id", $"deg", $"seed",
          ($"seed" * lit(RankOne * 15 / 100) +
            expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) div 100"))
            .as("r")))
    }
    r.select($"id".as("node_id"), $"deg", $"seed".as("is_seed"),
      $"r".as("ppr_fp"))
      .orderBy($"node_id")
  }

  private def pprSql: String = {
    def iter(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""i$i AS (SELECT e.b AS id, sum(s.r // s.deg) AS inc
         |        FROM edges e JOIN $prev s ON s.id = e.a GROUP BY e.b),
         |r$i AS (SELECT p.id, p.deg, p.seed,
         |          CAST(p.seed * ${RankOne * 15 / 100}
         |            + (85 * coalesce(i.inc, 0)) // 100 AS BIGINT) AS r
         |        FROM $prev p LEFT JOIN i$i i ON i.id = p.id)""".stripMargin
    }
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS a,
       |              CAST(l_suppkey + $SupBase AS BIGINT) AS b
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
       |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |          UNION ALL SELECT CAST(s_suppkey + $SupBase AS BIGINT) FROM supplier),
       |r0 AS (SELECT n.id, CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
       |         CAST(CASE WHEN n.id < $SupBase AND n.id % 100 = 1
       |           THEN 1 ELSE 0 END AS BIGINT) AS seed,
       |         CAST(CASE WHEN n.id < $SupBase AND n.id % 100 = 1
       |           THEN $RankOne ELSE 0 END AS BIGINT) AS r
       |       FROM nodes n LEFT JOIN deg d ON d.id = n.id),
       |${iter(1)},
       |${iter(2)}
       |SELECT id AS node_id, deg, seed AS is_seed, r AS ppr_fp
       |FROM r2 ORDER BY node_id""".stripMargin
  }

  private def pagerankSql: String = {
    def iter(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""i$i AS (SELECT e.b AS id, sum(s.r // s.deg) AS inc
         |        FROM edges e JOIN $prev s ON s.id = e.a GROUP BY e.b),
         |r$i AS (SELECT p.id, p.deg,
         |          CAST(${RankOne * 15 / 100} + (85 * coalesce(i.inc, 0)) // 100 AS BIGINT) AS r
         |        FROM $prev p LEFT JOIN i$i i ON i.id = p.id)""".stripMargin
    }
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS a,
       |              CAST(l_suppkey + $SupBase AS BIGINT) AS b
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
       |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |          UNION ALL SELECT CAST(s_suppkey + $SupBase AS BIGINT) FROM supplier),
       |r0 AS (SELECT n.id, CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
       |         CAST($RankOne AS BIGINT) AS r
       |       FROM nodes n LEFT JOIN deg d ON d.id = n.id),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id AS node_id, deg, r AS rank_fp FROM r3 ORDER BY node_id""".stripMargin
  }

  /** The three truss-peel rounds unrolled: per round the oriented
    * 3-way triangle join, the per-edge support count, and the kept
    * set handed down; counts as scalar subqueries per receipt row. */
  private def ktrussOracle: String = {
    def round(r: Int): String = {
      val n = r + 1
      s"""t_$r AS (SELECT e1.a, e1.b, e2.b AS c
         |  FROM e_$r e1 JOIN e_$r e2 ON e2.a = e1.b
         |  JOIN e_$r e3 ON e3.a = e1.a AND e3.b = e2.b),
         |sup_$r AS (SELECT a, b, count(*) AS s FROM (
         |    SELECT a, b FROM t_$r
         |    UNION ALL SELECT a AS a, c AS b FROM t_$r
         |    UNION ALL SELECT b AS a, c AS b FROM t_$r) roles
         |  GROUP BY 1, 2),
         |e_$n AS MATERIALIZED (SELECT e.a, e.b FROM e_$r e
         |  JOIN sup_$r s ON e.a = s.a AND e.b = s.b AND s.s >= 1),
         |st_$r AS (SELECT $r AS round,
         |  (SELECT count(*) FROM e_$r) AS n_edges_in,
         |  (SELECT coalesce(sum(s), 0) // 3 FROM sup_$r) AS n_triangles,
         |  (SELECT count(*) FROM e_$r)
         |    - (SELECT count(*) FROM e_$n) AS n_dropped,
         |  (SELECT count(*) FROM e_$n) AS n_edges_out)""".stripMargin
    }
    s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |inc AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS sp
       |        FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
       |          AND a.l_suppkey <> b.l_suppkey
       |        GROUP BY 1, 2),
       |nbr AS (SELECT u, v FROM (
       |          SELECT u, v, row_number() OVER (
       |            PARTITION BY u ORDER BY sp DESC, v) AS rn
       |          FROM inc) WHERE rn <= 5),
       |e_1 AS MATERIALIZED (SELECT DISTINCT least(u, v) AS a,
       |  greatest(u, v) AS b FROM nbr),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT CAST(round AS BIGINT) AS round,
       |  CAST(n_edges_in AS BIGINT) AS n_edges_in,
       |  CAST(n_triangles AS BIGINT) AS n_triangles,
       |  CAST(n_dropped AS BIGINT) AS n_dropped,
       |  CAST(n_edges_out AS BIGINT) AS n_edges_out
       |FROM (SELECT * FROM st_1 UNION ALL SELECT * FROM st_2
       |  UNION ALL SELECT * FROM st_3)
       |ORDER BY round""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // same two-level rollup and exact HHI cross-product
    "report_brand_concentration" ->
      """WITH m AS (SELECT p.p_brand, l.l_suppkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qs
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand, l.l_suppkey)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(qs) AS BIGINT) AS q_total,
        |  CAST((sum(qs * qs) * 1048576) // (sum(qs) * sum(qs))
        |    AS BIGINT) AS hhi_fp
        |FROM m GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // same epoch-day latency, rank window, and ⌈n/2⌉ median election
    "report_ship_latency" ->
      """WITH lat AS (SELECT o.o_orderpriority, l.l_orderkey,
        |    l.l_linenumber,
        |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        |      AS BIGINT) AS days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |r AS (SELECT o_orderpriority, days,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY days, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM lat)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_lines,
        |  CAST(min(days) AS BIGINT) AS min_days,
        |  CAST(max(days) AS BIGINT) AS max_days,
        |  CAST(sum(days) AS BIGINT) AS sum_days,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN days END) AS BIGINT)
        |    AS p50_days
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // same row_number rank on (v, event_id), ceil-rank elections, and
    // greatest/least clamp
    "quality_winsorize_clip" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, v_fp,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v_fp, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |b AS (SELECT event_type,
        |    max(CASE WHEN rn = (n * 5 + 99) // 100 THEN v_fp END) AS lo,
        |    max(CASE WHEN rn = (n * 95 + 99) // 100 THEN v_fp END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v_fp < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN v_fp > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  CAST(sum(v_fp) AS BIGINT) AS sum_before_fp,
        |  CAST(sum(greatest(lo, least(hi, v_fp))) AS BIGINT)
        |    AS sum_after_fp,
        |  CAST(max(lo) AS BIGINT) AS lo_fp, CAST(max(hi) AS BIGINT)
        |    AS hi_fp
        |FROM e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // epoch-day integers on both engines; 180-day bands capped at 4
    "report_backlog_aging" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS od
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_orderpriority,
        |  CAST(least(((SELECT max(od) FROM o) - od) // 180, 4) AS BIGINT)
        |    AS age_band,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM o
        |GROUP BY o_orderpriority, age_band
        |ORDER BY o_orderpriority, age_band""".stripMargin,
    // every aggregate/window sum CAST to BIGINT (DuckDB sums into
    // HUGEINT); same integer cross-product class boundaries
    "report_abc_classification" ->
      """WITH r AS (SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |      AS BIGINT) AS r_fp
        |  FROM lineitem GROUP BY l_partkey),
        |c AS (SELECT l_partkey, r_fp,
        |    CAST(row_number() OVER (ORDER BY r_fp DESC, l_partkey)
        |      AS BIGINT) AS rnk,
        |    CAST(sum(r_fp) OVER (ORDER BY r_fp DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(r_fp) OVER () AS BIGINT) AS total
        |  FROM r),
        |k AS (SELECT *,
        |    CASE WHEN cum * 5 <= total * 4 THEN 'A'
        |         WHEN cum * 20 <= total * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM c)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(r_fp) AS BIGINT) AS revenue_fp,
        |  CAST(min(rnk) AS BIGINT) AS min_rnk,
        |  CAST(max(rnk) AS BIGINT) AS max_rnk
        |FROM k GROUP BY abc_class ORDER BY abc_class""".stripMargin,
    "anomaly_rate_spike" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, hr, cnt,
        |    sum(cnt) OVER w AS trail_sum,
        |    count(*) OVER w AS trail_n
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |s AS (SELECT event_type, hr, cnt,
        |    CASE WHEN trail_n > 0 AND cnt * trail_n > trail_sum * 2
        |         THEN 1 ELSE 0 END AS spike
        |  FROM t),
        |p AS (SELECT event_type, cnt AS peak_cnt, hr AS peak_hr,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt DESC, hr) AS rn
        |  FROM h)
        |SELECT s.event_type, count(*) AS n_buckets,
        |  CAST(sum(s.spike) AS BIGINT) AS n_spikes,
        |  max(p.peak_cnt) AS peak_cnt, max(p.peak_hr) AS peak_hr
        |FROM s JOIN p ON p.event_type = s.event_type AND p.rn = 1
        |GROUP BY s.event_type ORDER BY s.event_type""".stripMargin,
    // the quadratic NOT EXISTS is the POINT: the oracle states the
    // dominance definition directly; the Spark side must reproduce it
    // with the sort-based linear rewrite
    "skyline_pareto" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(p_retailprice AS DECIMAL(18,2)) AS price, p_size
        |  FROM part)
        |SELECT p_partkey, CAST(price AS DOUBLE) AS price, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price <= a.price AND b.p_size >= a.p_size
        |    AND (b.price < a.price OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "anomaly_zscore_exact" ->
      """WITH v AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
        |    sum(x * x) AS sxx
        |  FROM v GROUP BY 1)
        |SELECT v.event_type, max(s.n) AS n,
        |  CAST(sum(CASE WHEN (s.n * v.x - s.sx) * (s.n * v.x - s.sx)
        |      > 9 * (s.n * s.sxx - s.sx * s.sx) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM v JOIN s ON v.event_type = s.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_collocation_lift" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |bi AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c_xy
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i
        |        FROM toks WHERE len(t) >= 2)
        |  GROUP BY 1, 2)
        |SELECT w1, w2, c_xy,
        |  CAST((c_xy * (SELECT sum(c_xy) FROM bi) * 1048576)
        |    // (u1.c * u2.c) AS BIGINT) AS lift_fp
        |FROM bi JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w
        |WHERE c_xy >= 5
        |ORDER BY lift_fp DESC, w1, w2 LIMIT 100""".stripMargin,
    "graph_hits_hubs_auth" -> hitsSql("orders", "lineitem", "//"),
    // the oracle may self-join the distinct basket frame (bounded
    // fan-out); identical cleared-fraction arithmetic and cut order
    "report_association_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |    CAST(count(*) AS BIGINT) AS n_pair
        |  FROM bi a JOIN bi b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM bi GROUP BY 1),
        |no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
        |  FROM bi)
        |SELECT p.p1, p.p2, p.n_pair, c1.c AS c1, c2.c AS c2,
        |  (SELECT n FROM no) AS n_orders,
        |  CAST((p.n_pair * 1000000) // (SELECT n FROM no) AS BIGINT)
        |    AS support_ppm,
        |  CAST((p.n_pair * 1000000) // c1.c AS BIGINT) AS conf_ppm,
        |  CAST((p.n_pair * (SELECT n FROM no) * 1048576)
        |    // (c1.c * c2.c) AS BIGINT) AS lift_fp
        |FROM pr p
        |JOIN cnt c1 ON p.p1 = c1.l_partkey
        |JOIN cnt c2 ON p.p2 = c2.l_partkey
        |ORDER BY lift_fp DESC, p1, p2 LIMIT 50""".stripMargin,
    // same top-5 sparsified chain + degree frame; nodes without a
    // closing wedge keep 0 triangles via the left join
    "graph_clustering_coeff" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |inc AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS sp
        |        FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
        |          AND a.l_suppkey <> b.l_suppkey
        |        GROUP BY 1, 2),
        |nbr AS (SELECT u, v FROM (
        |          SELECT u, v, row_number() OVER (
        |            PARTITION BY u ORDER BY sp DESC, v) AS rn
        |          FROM inc) WHERE rn <= 5),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM nbr),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e) ends
        |  GROUP BY node),
        |t AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM e e1 JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tri AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS node FROM t
        |    UNION ALL SELECT b FROM t
        |    UNION ALL SELECT c FROM t) roles
        |  GROUP BY node)
        |SELECT deg.node, deg.deg,
        |  CAST(coalesce(tri.tri, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN deg.deg < 2 THEN -1
        |    ELSE (2 * coalesce(tri.tri, 0) * 1048576)
        |      // (deg.deg * (deg.deg - 1)) END AS BIGINT) AS lcc_fp
        |FROM deg LEFT JOIN tri ON deg.node = tri.node
        |ORDER BY deg.node""".stripMargin,
    // the three peel rounds unrolled; MATERIALIZED edge sets bound the
    // reader fan-out of the recursive-looking chain
    "graph_ktruss_peel" -> ktrussOracle,
    "graph_triangle_count" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |inc AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS sp
        |        FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
        |          AND a.l_suppkey <> b.l_suppkey
        |        GROUP BY 1, 2),
        |nbr AS (SELECT u, v FROM (
        |          SELECT u, v, row_number() OVER (
        |            PARTITION BY u ORDER BY sp DESC, v) AS rn
        |          FROM inc) WHERE rn <= 5),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM nbr),
        |t AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM e e1 JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |  SELECT a AS node FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t) roles
        |GROUP BY node ORDER BY node""".stripMargin,
    "anomaly_mad_outliers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events),
        |med AS (SELECT event_type,
        |    CAST(quantile_cont(v_fp, 0.5) * 2 AS BIGINT) AS med2
        |  FROM e GROUP BY event_type),
        |d AS (SELECT e.event_type, m.med2, abs(e.v_fp * 2 - m.med2) AS adev2
        |      FROM e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type,
        |    CAST(quantile_cont(adev2, 0.5) * 2 AS BIGINT) AS mad4
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type,
        |  CAST(max(d.med2) AS DOUBLE) / 20000.0 AS med,
        |  CAST(max(mad.mad4) AS DOUBLE) / 40000.0 AS mad,
        |  CAST(sum(CASE WHEN d.adev2 * 2 > mad.mad4 * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  count(*) AS n
        |FROM d JOIN mad ON d.event_type = mad.event_type
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "graph_pagerank" -> pagerankSql,
    "graph_ppr_seeded" -> pprSql,
    "text_tfidf" ->
      """WITH terms AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
        |        CAST((tf.tf * n.n_docs * 1000000) // df.df AS BIGINT) AS score_fp
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_fp DESC, term) AS rnk FROM s)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score_fp
        |FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "quality_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS t FROM documents),
        |g AS (SELECT doc_id, len(t) - 2 AS n_grams,
        |        array_to_string(list_slice(t, i, i + 2), ' ') AS g
        |      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |            FROM toks WHERE len(t) >= 3))
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
        |  CAST(((n_grams - count(DISTINCT g)) * 1000000) // n_grams AS BIGINT) AS dup_fp
        |FROM g GROUP BY doc_id, n_grams ORDER BY doc_id""".stripMargin,
    // '0x…'::BIGINT parses the sha256 hex prefix in DuckDB; Spark's
    // conv(…, 16, 10) computes the identical integer (both engines emit
    // lowercase hex — the sample_hash_stratified precedent)
    "quality_classifier_score" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS t FROM documents),
        |d AS (SELECT doc_id, lang, CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
        |        CAST(list_sum(list_transform(range(1, len(t)), i ->
        |          CAST('0x' || substr(sha256(array_to_string(list_slice(t, i, i + 1), ' ')), 1, 4) AS BIGINT) % 21))
        |          AS BIGINT) AS score_raw
        |      FROM toks WHERE len(t) >= 2),
        |s AS (SELECT doc_id, lang, doc_id % 4 AS shard, n_bigrams, score_raw,
        |        (score_raw * 1000000) // n_bigrams AS score_mi FROM d)
        |SELECT doc_id, lang, shard, n_bigrams, score_raw, score_mi,
        |  ntile(10) OVER (PARTITION BY lang, shard ORDER BY score_mi, doc_id) AS decile
        |FROM s ORDER BY doc_id""".stripMargin,
    "sort_zorder_layout" -> zorderSql,
    "join_bloom_prefilter" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "embedding_quantize" ->
      """WITH u AS (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings),
        |m AS (SELECT vec_id, max(abs(CAST(x AS DOUBLE))) AS maxabs,
        |        CAST(count(*) AS BIGINT) AS n_dims FROM u GROUP BY vec_id),
        |q AS (SELECT u.vec_id,
        |        CASE WHEN m.maxabs = 0 THEN 0
        |             ELSE CAST(floor(CAST(u.x AS DOUBLE) * 127.0 / m.maxabs + 0.5) AS BIGINT)
        |        END AS qv
        |      FROM u JOIN m USING (vec_id))
        |SELECT e.vec_id, e.label, m.n_dims,
        |  CAST(floor(m.maxabs * 1099511627776.0) AS BIGINT) AS scale_fp,
        |  CAST(sum(q.qv) AS BIGINT) AS q_sum,
        |  CAST(sum(abs(q.qv)) AS BIGINT) AS q_abs_sum,
        |  CAST(min(q.qv) AS BIGINT) AS q_min, CAST(max(q.qv) AS BIGINT) AS q_max
        |FROM embeddings e JOIN m ON m.vec_id = e.vec_id JOIN q ON q.vec_id = e.vec_id
        |GROUP BY e.vec_id, e.label, m.n_dims, m.maxabs ORDER BY e.vec_id""".stripMargin
  )
}
