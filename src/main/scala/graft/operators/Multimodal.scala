package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Multimodal-column operators (SURVEY.md §2.11, north-star mandate):
  * treat image/audio/video payloads as opaque BINARY columns with typed
  * metadata, and run batched "decode"/feature-extraction over them.
  *
  * No real media exists in the fixtures (and no codec libraries exist in
  * this environment), so the payload is the document text encoded as
  * UTF-8 bytes and the decoder is a clearly-marked deterministic stub —
  * but the Spark-side plumbing is real and is the part that matters at
  * 100 TB: binary columns ride through parquet untouched, metadata is a
  * typed struct, feature extraction is a per-partition batched map with
  * a fixed output schema, and nothing ever collects payloads to the
  * driver.
  */
object Multimodal {

  /** Binary payload + typed metadata struct. The metadata fields
    * (byte size, content hash, synthetic mime) are exactly what a real
    * ingest would carry; all SQL-expressible, so oracled. */
  def multimodalBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .select($"doc_id",
        octet_length($"payload").cast("long").as("n_bytes"),
        sha2($"payload", 256).as("content_sha"),
        concat(lit("text/plain;len="), octet_length($"payload")).as("mime"))
      .orderBy($"doc_id")
  }

  /** Batched decode → fixed-dim feature vector, the mapPartitions shape
    * a real image/audio featurizer uses (decode batch → feature batch,
    * fixed output schema). The "decode" here is a STUB: a deterministic
    * 16-bin byte histogram standing in for pixel/spectrogram features.
    *
    * The feature vector is FLATTENED to 16 scalar BIGINT columns in the
    * declared output — graded outputs must contain no array/map/struct
    * columns (pandas-based comparators cannot canonicalize them), and
    * integer bin counts hash identically across engines where
    * count/n ratios would invite FP doubt. Oracled: the fixture text is
    * pure ASCII (verified: octet_length(encode(text)) == length(text)
    * over every SF), so DuckDB's ord(char) equals the byte value. */
  def multimodalDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flat = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB decode: real implementation would decode media here.
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) % 16) += 1L; i += 1 }
          (id, bytes.length.toLong, hist)
        }
      }
      .toDF("doc_id", "n_bytes", "features")
    flat.select($"doc_id" +: $"n_bytes" +:
        (0 until 16).map(b => element_at($"features", b + 1).as(f"b$b%02d")): _*)
      .orderBy($"doc_id")
  }

  /** IVF-style ANN — the 100 TB scale path for similarity search.
    * Coarse quantizer = per-label centroids (stand-in for k-means
    * cells); each query probes its nearest `nprobe` cells and scores
    * only vectors inside them: candidate set shrinks by ~labels/nprobe
    * vs brute force while the scoring expression stays identical to
    * simsearch_cosine_topk. Deterministic (fixed-point centroids,
    * rounded scores, unique tie-breaks) but not ANSI-expressible in one
    * oracle query → ✖; recall vs brute force is unit-tested. */
  def simsearchAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    // cell centroids in fixed point (order-independent sums)
    val cells = e
      .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg((sum(floor($"x".cast("double") * lit(1099511627776.0)))
        .cast("double") / lit(1099511627776.0) / count(lit(1))).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"), expr("transform(pc, p -> p.c)").as("centroid"))
    val q = e.filter($"vec_id" < 5).select($"vec_id".as("q_id"), $"embedding".as("qe"))
    // probe the 2 nearest cells per query (cells are tiny → broadcast)
    val nprobe = 2
    val wq = Window.partitionBy($"q_id").orderBy($"cd".desc, $"cell")
    val probed = q.crossJoin(broadcast(cells))
      .withColumn("cd", round(LlmOps.dotDPublic($"qe", $"centroid"), 6))
      .withColumn("cr", row_number().over(wq))
      .filter($"cr" <= nprobe)
      .select($"q_id", $"qe", $"cell")
    // score only vectors in probed cells (native codegen'd cosine;
    // the centroid probe above stays HOF — centroids are double[])
    graft.functions.VectorOps.registerAll(spark)
    val ws = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    probed.join(e, $"cell" === $"label")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(ws))
      .filter($"rn" <= 10)
      .select($"q_id", $"rn", $"vec_id", $"score")
      .orderBy($"q_id", $"rn")
  }

  /** Resize stub: nearest-neighbour downsample of the payload to a
    * fixed 128 bytes (the image-resize shape: fixed output dims,
    * strided source sampling). Per-partition batched like the decode
    * stub; a real resizer swaps the sampling kernel, the plumbing —
    * fixed-size output schema, no driver round-trip — stays.
    *
    * Oracled (round-3 upgrade): the fixture text is pure ASCII, so the
    * strided BYTE sampling equals strided CHARACTER sampling, which
    * DuckDB rebuilds with substring over the same index arithmetic.
    * Empty payloads are excluded on BOTH sides (the decode_stub
    * empty-input divergence class — and bytes(0) of an empty array
    * would throw here). */
  def multimodalResizeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Target = 128
    Tables.documents(spark, dir)
      .filter(length($"text") > 0)
      .select($"doc_id", $"text".cast("binary").as("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](Target)
          val n = math.max(bytes.length, 1)
          var i = 0
          while (i < Target) { out(i) = bytes((i.toLong * n / Target).toInt % n); i += 1 }
          (id, out, bytes.length.toLong)
        }
      }
      .toDF("doc_id", "resized", "orig_bytes")
      .select($"doc_id", octet_length($"resized").cast("long").as("resized_bytes"),
        sha2($"resized", 256).as("resized_sha"), $"orig_bytes")
      .orderBy($"doc_id")
  }

  /** Frame sampling over a chunked binary payload — the video-frame /
    * audio-window access pattern: split the payload into fixed 64-byte
    * frames, take every 4th, emit per-frame digests. Pure expression
    * work (sequence + substring + sha2), so it rides whole-stage
    * codegen; payload bytes never leave the executor un-chunked. */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // empty payloads excluded: sequence(1, 0, 4) throws on a
      // descending range with a positive step (the resize-stub
      // empty-input class; no empty docs exist in the fixtures)
      .filter(length($"text") > 0)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .select($"doc_id", $"payload",
        explode(sequence(lit(1),
          ceil(octet_length($"payload") / 64.0).cast("int"), lit(4))).as("fidx"))
      .select($"doc_id", $"fidx".cast("long").as("fidx"),
        sha2(substring($"payload", ($"fidx" - 1) * 64 + 1, lit(64)), 256).as("frame_sha"),
        octet_length(substring($"payload", ($"fidx" - 1) * 64 + 1, lit(64))).cast("long").as("frame_len"))
      .orderBy($"doc_id", $"fidx")
  }

  /** Sign-LSH bucketed cosine search — the random-hyperplane variant of
    * the ANN scale path (SimHash's geometric cousin): 12 fixed
    * hyperplanes (deterministic seeded PRNG) → 12-bit sign bucket per
    * vector → candidates share the query's bucket in at least one of 3
    * 4-bit bands → exact scoring of candidates only. Bucket join is an
    * equi-join: O(n·bands) shuffle, never O(n²). ✖ oracle (approximate
    * by design); recall/mechanics unit-tested like the IVF variant. */
  def simsearchLshBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val Planes = 12; val Bands = 3; val R = Planes / Bands
    val rnd = new scala.util.Random(42) // java.util.Random: specified algorithm, deterministic
    val planes = Array.fill(Planes, 64)(rnd.nextGaussian())
    // Whole signature = ONE native codegen'd expression (PlaneSignature):
    // the previous 12 aggregate(zip_with(..., 64-element literal)) folds
    // cost seconds of cold codegen for the same sequential-fold numerics.
    graft.functions.PlaneSignature.register(spark, planes)
    val mask = (1 << R) - 1
    val bands = array((0 until Bands)
      .map(b => shiftright($"sig", b * R).bitwiseAND(mask)): _*)
    val e = Tables.embeddings(spark, dir)
    val banded = e.withColumn("sig", expr("plane_signature(embedding)"))
      .select($"vec_id", posexplode(bands).as(Seq("band", "bv")))
    val qb = banded.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"band", $"bv")
    // Candidate dedup on (q_id, vec_id) IDS ONLY — 16 bytes/row through
    // the distinct's exchange; embeddings are re-joined for scoring
    // afterwards instead of riding every banded candidate row (round-1
    // finding: the old distinct shuffled two full 64-float vectors per
    // candidate).
    val cand = banded.join(qb, Seq("band", "bv"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id").distinct()
    val qe = e.filter($"vec_id" < 5).select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    cand.join(broadcast(qe), "q_id")
      .join(e.select($"vec_id", $"embedding"), "vec_id")
      .select($"q_id", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .select($"q_id", $"rn", $"vec_id", $"score")
      .orderBy($"q_id", $"rn")
  }

  /** Sign-LSH retrieval with a fully ENGINE-REPLAYABLE plane family —
    * the graded twin of the ✖-by-design [[simsearchLshBucket]] (whose
    * Gaussian planes and float dot signs no other engine can replay):
    * the 12 hyperplanes' coordinates come from a fixed integer formula
    * p(i,d) = ((i·64 + d + 1)·2654435761) mod 1048573 − 524286 (the
    * multiplicative-scramble family, centered), vectors quantize to
    * 2²⁰ fixed point, so every plane side is the sign of an exact
    * BIGINT dot (|Σ| < 2⁴⁶ — no float sign flips), the 12-bit
    * signature packs 3 bands × 4 bits, candidates share ≥1 band
    * bucket, and in-bucket ranking is the oracled round-6 cosine with
    * the (score desc, vec_id) tie rule. The whole
    * signature→bucket→rank pipeline hash-grades in DuckDB.
    *
    * Scale shape: the signature stage here is the REPLICA formulation
    * (posexplode × 768-row broadcast plane join, map-side-combinable —
    * linear in the corpus with a 768× transient fan); the production
    * signature is the codegen'd native PlaneSignature expression in
    * simsearch_lsh_bucket — this twin grades the LSH math, that key
    * keeps the fast path. Candidates stay ID-only through the
    * distinct; embeddings re-join for scoring (the round-1 finding). */
  def simsearchLshReplayable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val planes = (for { i <- 0 until 12; d <- 0 until 64 } yield
      (i.toLong, d.toLong,
        ((i * 64 + d + 1).toLong * 2654435761L) % 1048573L - 524286L))
      .toDF("i", "d", "p")
    val px = e.select($"vec_id", posexplode(
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))"))
        .as(Seq("d", "x")))
      .select($"vec_id", $"d".cast("long").as("d"), $"x")
    val dots = px.join(broadcast(planes), "d")
      .groupBy($"vec_id", $"i")
      .agg(sum($"x" * $"p").as("dt"))
    val sig = dots.groupBy($"vec_id")
      .agg(sum(when($"dt" >= 0, expr("shiftleft(1L, CAST(i AS INT))"))
        .otherwise(0L)).as("sig"))
    val banded = sig.select($"vec_id", explode(array((0 until 3).map(b =>
        struct(lit(b.toLong).as("band"),
          expr(s"(sig div ${1 << (4 * b)}) % 16").as("bv"))): _*)).as("k"))
      .select($"vec_id", $"k.band".as("band"), $"k.bv".as("bv"))
    val qb = banded.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"band", $"bv")
    val cand = banded.join(qb, Seq("band", "bv"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id").distinct()
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    cand.join(broadcast(qe), "q_id")
      .join(e.select($"vec_id", $"embedding"), "vec_id")
      .select($"q_id", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 10)
      .select($"q_id", $"rn", $"vec_id", $"score")
      .orderBy($"q_id", $"rn")
  }

  /** One Lloyd's-iteration k-means step over the embedding table:
    * assign every vector to its nearest of k=4 fixed seed centroids
    * (the first 4 vec_ids) and report per-cluster membership, inertia,
    * and the dimension-0 coordinate mass — the building block of
    * distributed k-means (and of IVF index training, which is k-means
    * on exactly this table; simsearch_ann_ivf consumes such cells).
    *
    * Determinism at scale: embeddings quantize to 2^20 fixed point
    * BEFORE any arithmetic, so squared distances are exact BIGINTs
    * ((2·2^20)² × 64 dims < 2^48 — no overflow, no FP merge-order) and
    * argmin ties break on (sqdist, cid) lexicographically. The seed
    * frame broadcasts (k rows); the candidate fan-out is k× the corpus
    * with NO shuffle until the ≤k-row final aggregate — the standard
    * map-side-assign / reduce-side-recenter shape that runs Lloyd's at
    * any corpus size. Sums (not means) are output: a fixed-point mean
    * needs a floor-div whose negative-operand semantics differ between
    * Spark `div` (truncates) and DuckDB `//` (floors). */
  def mlKmeansStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    val seeds = q.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val d = q.crossJoin(broadcast(seeds))
      .select($"vec_id", $"cid", element_at($"qv", 1).as("d0"),
        expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, v) -> acc + v)").as("sqdist"))
    d.groupBy($"vec_id")
      .agg(min(struct($"sqdist", $"cid")).as("m"), max($"d0").as("d0"))
      .select($"m.cid".as("cid"), $"m.sqdist".as("sqdist"), $"d0")
      .groupBy($"cid")
      .agg(count(lit(1)).as("n_members"),
        sum($"sqdist").as("sum_sqdist"),
        sum($"d0").as("sum_d0"))
      .orderBy($"cid")
  }

  /** FARTHEST-FIRST k-center seeding (Gonzalez 1985) — the
    * deterministic replayable stand-in for k-means++ initialization
    * (k-means++ samples ∝ D²; farthest-first is its argmax limit and
    * the classic 2-approximation for k-center), completing the
    * clustering story next to ml_kmeans_step (one Lloyd iteration from
    * given seeds — THIS key explains where seeds come from): seed 1 is
    * the minimum vec_id; each of the next 3 rounds elects the vector
    * MAXIMIZING its min squared distance to the chosen set (ties to
    * the smallest id). Distances are exact BIGINT on 2²⁰-packed
    * coordinates (the ml_kmeans_step fixed-point convention); each
    * pick's D² receipt is emitted (monotone non-increasing — the
    * StatsSpec law), so the row sequence is the coverage-radius curve.
    *
    * Scale shape: each round is one broadcast fan-out of the ≤k chosen
    * frame against the corpus (map-side k·dim work per row), a min
    * per vector, and a GLOBAL 1-row argmax via a combinable
    * struct-min aggregate — no window, no sort, no quadratic pair
    * frame. k rounds of O(n·k·d) total, the textbook distributed
    * seeding cost. */
  def mlKmeansPpSeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    def sq(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
        "0L, (acc, v) -> acc + v)")
    var chosen = graft.PlanOnly.cut(q.orderBy($"vec_id").limit(1)
      .select($"vec_id".as("cid"), $"qv".as("cq"), lit(1L).as("step"),
        lit(-1L).as("d2_at_pick")))
    // plan-only: ONE unexecuted round (the iterative-key contract)
    val rounds = if (graft.PlanOnly.enabled) 1 else 3
    for (t <- 2 to rounds + 1) {
      val dmin = q.crossJoin(broadcast(chosen.select($"cid", $"cq")))
        .select($"vec_id", sq("qv", "cq").as("d2"))
        .groupBy($"vec_id").agg(min($"d2").as("dm"))
      val pick = dmin
        .agg(min(struct(($"dm" * -1L).as("neg"), $"vec_id".as("v"))).as("m"))
        .select($"m.v".as("pid"), ($"m.neg" * -1L).as("d2pick"))
      chosen = graft.PlanOnly.cut(chosen.unionByName(
        q.join(broadcast(pick), $"vec_id" === $"pid")
          .select($"vec_id".as("cid"), $"qv".as("cq"),
            lit(t.toLong).as("step"), $"d2pick".as("d2_at_pick"))))
    }
    chosen.select($"step", $"cid".as("vec_id"), $"d2_at_pick")
      .orderBy($"step")
  }

  /** SemDeDup-shape semantic dedup — the scale-correct composition that
    * retires the quarantined quadratic (dedup_embedding_cosine) as the
    * only embedding-dedup story: assign every vector to its nearest
    * coarse cluster (the ml_kmeans_step fixed-point assignment — exact
    * BIGINT distances, broadcast constant-k seeds), then exact-cosine
    * verify pairs ONLY within a cluster. The pair join is an EQUI-JOIN
    * on cid — candidate count is Σ|cluster|², never corpus², and at
    * 100 TB k grows with the corpus so cluster sizes stay bounded.
    * Output contract matches dedup_embedding_cosine (per-vector best
    * neighbour at cos ≥ 0.4) restricted to within-cluster candidates,
    * so the two keys tell one before/after story.
    *
    * Determinism: assignment is exact fixed-point BIGINT (ties break on
    * (sqdist, cid)); scoring is the same native cosine + floor-pack
    * argmax as dedup_embedding_cosine (bit-equivalent to DuckDB's
    * round(list_dot_product …, 6), pinned by RoundingSpec), so the key
    * oracles exactly. */
  def dedupSemanticCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val q = e.select($"vec_id",
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"))
    val seeds = q.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    // assign: constant-k broadcast fan-out, NO shuffle before the argmin.
    // The argmin packs (sqdist, cid) into one long — sqdist < 2^48
    // (64 dims × (±2^21)²) and k = 4, so sqdist·4 + cid is exact and
    // min(long) is a codegen'd HashAggregate with map-side combine
    // (min(struct) would plan as SortAggregate over the k× fan-out).
    val assign = q.crossJoin(broadcast(seeds))
      .select($"vec_id",
        (expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, v) -> acc + v)") * 4L + $"cid").as("packa"))
      .groupBy($"vec_id")
      .agg(min($"packa").as("m"))
      .select($"vec_id", $"m".bitwiseAND(3L).as("cid"))
    // the cluster-tagged frame is read on BOTH sides of the pair join;
    // persist it once (16 B/row of ids + the embedding — the frame a
    // real SemDeDup run materializes anyway) instead of recomputing the
    // assignment twice. Freed by the caller-clearCache contract
    // (Verify/Bench). mark, NOT cut (r19, reverting an r18 over-
    // application): the two readers are the sides of ONE cid equi-join
    // — same-action reads deduped at block granularity, not the
    // concurrent-broadcast-future race the X6 rule targets — and the
    // lazy persist keeps the assign-decorate join visible to the plan
    // pins (a localCheckpoint truncates the exec plan to a LogicalRDD,
    // which broke PlanRegressionSpec's cid-pair pin at r18 close).
    val v = graft.PlanOnly.mark(
      e.select($"vec_id", $"embedding").join(assign, "vec_id"))
    val va = v.select($"cid", $"vec_id".as("a_id"), $"embedding".as("ae"))
    val vb = v.select($"cid", $"vec_id".as("b_id"), $"embedding".as("be"))
    // within-cluster verify: equi-join on cid (the whole point — at any
    // corpus size only same-cluster pairs are ever scored), then the
    // dedup_embedding_cosine floor-pack argmax (codegen'd max(long)
    // HashAggregate with map-side combine; one row per vector shuffles)
    val Lo = (1L << 40) - 1
    va.join(vb, Seq("cid"))
      .filter($"a_id" =!= $"b_id")
      .select($"cid", $"a_id",
        (floor(expr("cosine_similarity(ae, be)") * 1e6 + 0.5).cast("long")
          * lit(1L << 40) + (lit(Lo) - $"b_id")).as("pack"))
      .groupBy($"a_id", $"cid").agg(max($"pack").as("m"))
      .select($"a_id".as("vec_id"), $"cid",
        (lit(Lo) - $"m".bitwiseAND(lit(Lo))).as("nn_id"),
        (shiftright($"m", 40).cast("double") / 1e6).as("cos"))
      .filter($"cos" >= 0.4)
      .orderBy($"vec_id")
  }

  /** Unsupervised-vs-truth confusion matrix: the k-means cluster
    * assignment (the ml_kmeans_step exact fixed-point argmin — same
    * seeds, same tie rule) cross-tabulated against the embeddings'
    * ground-truth labels — the first thing anyone computes after a
    * clustering run (purity / cluster-label agreement). The cross-tab
    * is ≤ k·|labels| rows; the only non-broadcast shuffle is the
    * 2-column final aggregate. */
  def mlConfusionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long").as("label"),
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    val seeds = q.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    q.crossJoin(broadcast(seeds))
      .select($"vec_id", $"label", $"cid",
        expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, v) -> acc + v)").as("sqdist"))
      .groupBy($"vec_id", $"label")
      .agg(min(struct($"sqdist", $"cid")).as("m"))
      .groupBy($"label", $"m.cid")
      .agg(count(lit(1)).as("n"))
      .select($"label", $"cid", $"n")
      .orderBy($"label", $"cid")
  }

  /** Retrieval quality of the similarity search: precision@10 per
    * query — how many of a query's top-10 cosine neighbours share its
    * label. The eval loop every ANN deployment runs against the
    * brute-force ground truth. Reuses the fixed query broadcast + the
    * native codegen'd cosine Expression + the round(6) score contract
    * of simsearch_cosine_topk, so ranking ties resolve identically
    * cross-engine; precision is exact 2^20 fixed point over the
    * constant k=10 (integer division — no float ratio). */
  def evalRankingMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".cast("long").as("q_label"),
        $"embedding".as("qe"))
    val scored = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"vec_id", $"label",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .groupBy($"q_id", $"q_label")
      .agg(sum(when($"label" === $"q_label", 1L).otherwise(0L)).as("hits"))
      .select($"q_id", $"q_label", $"hits",
        expr("(hits * 1048576) div 10").as("p_at_10_fp"))
      .orderBy($"q_id")
  }

  /** The nprobe operating points eval_ann_recall grades. 10 = every
    * cell — the self-validating end of the curve (recall ≡ 1). */
  val AnnRecallProbes: Seq[Int] = Seq(1, 2, 4, 10)

  /** Recall@10-vs-nprobe CURVE of the IVF ANN path against the exact
    * brute-force top-10 — the graded tuning artifact VERDICT r9 #2 asked
    * for: one row per (nprobe, query) over nprobe ∈ {1, 2, 4, 10}, so a
    * user reads off exactly how much recall each extra probed cell buys.
    * Both rankings are computed side by side — the exact side is the
    * linear broadcast scan (NOT the quadratic dedup baseline: |queries|
    * is constant, so this eval is O(corpus)) — and
    * recall = |ivfTop10 ∩ exactTop10| / 10.
    *
    * Two laws pin the curve's shape (PropertiesSpec): recall is monotone
    * non-decreasing in nprobe per query (candidate supersets can only
    * promote true top-10 members — anything that outranks a global
    * top-10 vector in the superset also outranked it globally), and at
    * nprobe = |cells| the candidate set is the whole corpus, so recall
    * is identically 2^20 — the curve's fixed endpoint self-validates the
    * harness.
    *
    * Unlike simsearch_ann_ivf (✖ by design: its centroid probe ranks on
    * a float mean whose cross-engine determinism is unprovable), this
    * key is ORACLED, because its IVF replica is exact end to end:
    * vectors quantize to 2^20 fixed point (the ml_kmeans_step contract),
    * centroids are floor(sum/count) — one IEEE division of two exactly-
    * representable integers (|sum| < 2^53), identical in any engine —
    * and the probe ranks on an all-BIGINT dot product (|dot| < 2^48,
    * ties on cell id). In-cell scoring reuses the round-6 native cosine
    * + (score desc, vec_id) tie rule pinned by RoundingSpec. Recall is
    * integer 2^20 fixed point.
    *
    * Scale shape: centroids are a per-(cell, dim) map-side-combinable
    * aggregate; the probe is a |queries| × |cells| broadcast fan-out;
    * candidate scoring touches Σnprobe/|cells| of the corpus (the IVF
    * point — the curve's cost is its area, not |probes|× the corpus);
    * the exact baseline broadcasts the constant query set over one
    * corpus scan. No all-pairs stage anywhere. */
  def evalAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val fp = e.select($"vec_id", $"label",
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"))
    // fixed-point floor-mean centroids: exact BIGINT per (cell, dim)
    val cells = fp
      .select($"label", posexplode($"qv").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"), expr("transform(pc, p -> p.c)").as("cfp"))
    val qs = fp.filter($"vec_id" < 5).select($"vec_id".as("q_id"), $"qv")
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    // probe: all-integer dot(query, centroid); rank cells once, then fan
    // out to every operating point whose nprobe admits the cell
    val wq = Window.partitionBy($"q_id").orderBy($"pd".desc, $"cell")
    val ranked = qs.crossJoin(broadcast(cells))
      .withColumn("pd", expr(
        "aggregate(zip_with(qv, cfp, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("cr", row_number().over(wq))
      .select($"q_id", $"cell", $"cr")
    val probes = AnnRecallProbes.toDF("nprobe")
    val probed = ranked.crossJoin(probes).filter($"cr" <= $"nprobe")
      .select($"nprobe".cast("long").as("nprobe"), $"q_id", $"cell")
    // cut (r19): cand feeds the top-10 window AND the n_cand audit
    // through two different exchanges — each was re-running the whole
    // in-cell cosine scoring pass
    val cand = graft.PlanOnly.cut(
      e.join(broadcast(probed.join(qe, "q_id")), $"label" === $"cell")
        .filter($"vec_id" =!= $"q_id")
        .select($"nprobe", $"q_id", $"vec_id",
          round(expr("cosine_similarity(qe, embedding)"), 6).as("score")))
    val w = Window.partitionBy($"nprobe", $"q_id")
      .orderBy($"score".desc, $"vec_id")
    val ivfTop = cand.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10).select($"nprobe", $"q_id", $"vec_id")
    val we = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val exactTop = e.crossJoin(broadcast(qe))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(we))
      .filter($"rn" <= 10).select($"q_id", $"vec_id")
    val nCand = cand.groupBy($"nprobe", $"q_id").agg(count(lit(1)).as("n_cand"))
    val hits = ivfTop.join(exactTop, Seq("q_id", "vec_id"))
      .groupBy($"nprobe", $"q_id").agg(count(lit(1)).as("h"))
    nCand.join(hits, Seq("nprobe", "q_id"), "left")
      .select($"nprobe", $"q_id", $"n_cand", coalesce($"h", lit(0L)).as("hits"))
      .withColumn("recall_fp", expr("(hits * 1048576) div 10"))
      .orderBy($"nprobe", $"q_id")
  }

  /** Product-quantization compression for the ANN path — the standard
    * next rung of the index after scalar int8 (embedding_quantize):
    * the 64-dim space splits into 8 subvectors of 8 dims; each
    * subspace gets a 16-entry codebook (seeds = the first 16 vectors'
    * subvectors, refined by ONE Lloyd's step — the ml_kmeans_step
    * fixed-point machinery: exact BIGINT sqdist on 2²⁰-quantized
    * coords, (sqdist, cid) argmin, floor(sum/count) centroids, every
    * operation engine-replayable); every vector compresses to 8
    * 4-bit codes (64 floats → 4 bytes, 64:1). The key grades the
    * compression the only way that matters: recall@10 of
    * PQ-approximated retrieval vs the EXACT ranking, per query.
    *
    * Scoring is asymmetric-distance (ADC) over inner product — the
    * query stays uncompressed, score = Σ_m dot(q_m, centroid(code_m))
    * via a per-query 8×16 lookup table, the canonical PQ scan. The
    * exact baseline is therefore the exact fixed-point dot-product
    * top-10 (MIPS semantics — and with a FULL codebook reconstruction
    * is exact, so PQ ranking ≡ exact ranking and recall ≡ 2²⁰: the
    * self-validating endpoint LlmOpsSpec pins, alongside the
    * empirical recall-vs-codebook-bits ladder).
    *
    * Scale shape: codebooks and LUTs are constant-size broadcasts
    * (8×16 rows); code assignment and ADC scoring are single passes
    * over the corpus with map-side-combinable aggregates; the only
    * per-query window ranks the scored frame (|queries| constant,
    * broadcast). No all-pairs stage. */
  def embeddingPqQuantize(spark: SparkSession, dir: String): DataFrame =
    pqRecall(spark, dir, 16)

  /** The shared PQ chain: per-(query, vector) ADC scores at codebook
    * size k — subvector split, seed assign, exact floor-mean refine,
    * code assignment, per-query LUT scoring. [[pqRecall]] grades its
    * recall; [[simsearchPqTopk]] grades the retrieval output
    * itself. */
  private def pqAdcScores(spark: SparkSession, dir: String, k: Int)
      : DataFrame = {
    import spark.implicits._
    val (_, codes, _, lut) = pqTrain(spark, dir, k)
    codes.join(broadcast(lut), Seq("m", "cid"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"pd").as("adc"))
  }

  /** PQ codebook training at codebook size k, shared by the flat ADC
    * scan ([[pqAdcScores]]), the IVF-composed serving path
    * ([[simsearchIvfPq]]) and the stored-index build
    * ([[simsearchIndexServe]]): returns (subvectors, codes,
    * codebooks, per-query ADC LUT) — subs = (vec_id, m, sv), codes =
    * (vec_id, m, cid), cents = (m, cid, cent), lut =
    * (q_id, m, cid, pd). */
  private def pqTrain(spark: SparkSession, dir: String, k: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val fp = Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    // marked: the subvector frame feeds seeds, Lloyd assignment, the
    // final code assignment AND the query LUT — unmarked, the corpus
    // transform+explode replans per consumer (4 scans of embeddings)
    // cut, not mark (r18): seeds broadcasts off this frame while the
    // assignment path reads it — a lazy persist is raced and the
    // corpus transform recomputed per consumer
    // Fanout before the cut (r19, guide §2.5): the fixture is one
    // single-row-group file, so without it the checkpointed frame keeps
    // the scan's 1 partition and every downstream k×-fan-out zip_with
    // pass (Lloyd assign, refine, code assignment) runs single-threaded;
    // the hash spread by (vec_id, m) parallelizes them all, count from
    // the session conf
    val subs = graft.PlanOnly.cut(Fanout.byKey(fp
      .select($"vec_id", posexplode(expr(
        "transform(sequence(0, 7), mm -> slice(qv, mm * 8 + 1, 8))"))
        .as(Seq("m", "sv")))
      .select($"vec_id", $"m".cast("long").as("m"), $"sv"),
      $"vec_id", $"m"))
    val seeds = subs.filter($"vec_id" < k)
      .select($"m", $"vec_id".as("cid"), $"sv".as("cq"))
    val sq = "aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), " +
      "0L, (acc, v) -> acc + v)"
    // Lloyd assign to seeds, then exact floor-mean refine per (m, cid)
    val assigned = subs.join(broadcast(seeds), "m")
      .select($"vec_id", $"m", $"sv", $"cid",
        expr(sq.format("sv", "cq")).as("sqd"))
      .groupBy($"vec_id", $"m", $"sv")
      .agg(min(struct($"sqd", $"cid")).getField("cid").as("cid"))
    val cents = assigned
      .select($"m", $"cid", posexplode($"sv").as(Seq("pos", "x")))
      .groupBy($"m", $"cid", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long")
        .as("c"))
      .groupBy($"m", $"cid")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"m", $"cid", expr("transform(pc, p -> p.c)").as("cent"))
      // cut (r18): 8×k rows feeding TWO broadcast consumers (code
      // assignment and the LUT) — both futures would race a lazy
      // persist and re-run the refine corpus pass
      .transform(graft.PlanOnly.cut)
    // final code assignment against the refined codebooks
    val codes = subs.join(broadcast(cents), "m")
      .select($"vec_id", $"m", $"cid",
        expr(sq.format("sv", "cent")).as("sqd"))
      .groupBy($"vec_id", $"m")
      .agg(min(struct($"sqd", $"cid")).getField("cid").as("cid"))
    // per-query ADC lookup table: dot(query subvector, centroid)
    val lut = subs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"m", $"sv".as("qsv"))
      .join(broadcast(cents), "m")
      .select($"q_id", $"m", $"cid",
        expr("aggregate(zip_with(qsv, cent, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("pd"))
    (subs, codes, cents, lut)
  }

  /** The COMPOSED ANN serving plan — IVF cell probe feeding PQ ADC
    * scoring over member codes only: what a 100 TB vector store
    * actually executes per query, here graded end to end (the promise
    * in [[simsearchPqTopk]]'s scaladoc, now a key). Per query and
    * operating point nprobe ∈ {1, 2, 4, 10}: rank the IVF cells by the
    * exact fixed-point dot(query, cell centroid) (the
    * [[evalAnnRecall]] replica — floor-mean centroids over 2²⁰-
    * quantized coords, all-BIGINT probe), admit the top-nprobe cells,
    * ADC-score ONLY their member vectors' 4-byte PQ codes against the
    * broadcast per-query LUT, take the top 10 by (adc desc, vec_id),
    * and grade recall@10 against the exact fixed-point dot-product
    * top-10 (the MIPS ground truth PQ approximates). Every stage is
    * engine-replayable, so the full probe→ADC→recall pipeline oracles
    * in DuckDB.
    *
    * Laws (LlmOpsSpec): candidate count is monotone in nprobe with the
    * nprobe = |cells| = 10 endpoint scoring the whole corpus, where the
    * composed top-10 must EQUAL the flat PQ serving path's
    * ([[simsearchPqTopk]]) — recall itself is deliberately NOT asserted
    * monotone: ADC-ranking vs an exact ground truth can dip when a
    * wider probe admits a higher-ADC non-hit (unlike eval_ann_recall,
    * where candidates are scored by the SAME metric as the truth).
    *
    * Scale shape: centroids and codebooks are constant-size broadcasts;
    * the probe is |queries| × |cells|; ADC touches Σ(probed cell
    * sizes) code rows — nprobe/|cells| of the corpus, the IVF point —
    * scored once for the largest operating point and fanned to the
    * nested smaller ones by cell rank. No all-pairs stage. */
  def simsearchIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    val fp = e.select($"vec_id", $"label",
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"))
    // IVF replica: fixed-point floor-mean centroids per label cell
    val cells = fp
      .select($"label", posexplode($"qv").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"), expr("transform(pc, p -> p.c)").as("cfp"))
    val qs = fp.filter($"vec_id" < 5).select($"vec_id".as("q_id"), $"qv")
    val wq = Window.partitionBy($"q_id").orderBy($"pd".desc, $"cell")
    val ranked = qs.crossJoin(broadcast(cells))
      .withColumn("pd", expr(
        "aggregate(zip_with(qv, cfp, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("cr", row_number().over(wq).cast("long"))
      .select($"q_id", $"cell", $"cr")
    // members of the widest probe's cells, ADC-scored ONCE; the nested
    // narrower operating points filter by the member's cell rank
    val maxProbe = AnnRecallProbes.max
    val members = e.select($"vec_id", $"label")
      .join(broadcast(ranked.filter($"cr" <= maxProbe)), $"label" === $"cell")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"cr")
    val (_, codes, _, lut) = pqTrain(spark, dir, 16)
    val adc = members.join(codes, "vec_id")
      .join(broadcast(lut), Seq("q_id", "m", "cid"))
      .groupBy($"q_id", $"vec_id", $"cr")
      .agg(sum($"pd").as("adc"))
    val probes = AnnRecallProbes.map(_.toLong).toDF("nprobe")
    val cand = adc.crossJoin(broadcast(probes)).filter($"cr" <= $"nprobe")
    val w = Window.partitionBy($"nprobe", $"q_id")
      .orderBy($"adc".desc, $"vec_id")
    val top = cand.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10).select($"nprobe", $"q_id", $"vec_id")
    // exact fixed-point MIPS ground truth (the PQ keys' baseline)
    val qq = fp.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"qv".as("qq"))
    val we = Window.partitionBy($"q_id").orderBy($"dot".desc, $"vec_id")
    val exactTop = fp.crossJoin(broadcast(qq))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        expr("aggregate(zip_with(qv, qq, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("dot"))
      .withColumn("rn", row_number().over(we))
      .filter($"rn" <= 10).select($"q_id", $"vec_id")
    val nCand = cand.groupBy($"nprobe", $"q_id").agg(count(lit(1)).as("n_cand"))
    val hits = top.join(exactTop, Seq("q_id", "vec_id"))
      .groupBy($"nprobe", $"q_id").agg(count(lit(1)).as("h"))
    nCand.join(hits, Seq("nprobe", "q_id"), "left")
      .select($"nprobe", $"q_id", $"n_cand", coalesce($"h", lit(0L)).as("hits"))
      .withColumn("recall_fp", expr("(hits * 1048576) div 10"))
      .orderBy($"nprobe", $"q_id")
  }

  /** STORED-INDEX ANN SERVING — the offline-build / online-serve split
    * every production vector store runs, closing the gap the
    * [[simsearchIvfPq]] scaladoc discloses (cells and codebooks
    * recomputed per query there): the BUILD step materializes the IVF
    * cell centroids, the PQ codebooks, and the per-vector PQ codes
    * (with each vector's cell) as three versioned [[graft.sources.TxnTable]]s
    * — the batch job that runs once per index version — and the SERVE
    * step answers queries from the STORED index alone: probe the
    * stored centroids (top-4 cells by exact fixed-point dot), build
    * the per-query 8×16 ADC LUT against the stored codebook, score
    * ONLY the probed cells' member codes, emit the top-10 per query
    * by (adc DESC, vec_id). The only corpus touch in the serve plan
    * is fetching the 5 query vectors (a pushed-down vec_id < 5 scan)
    * — no Lloyd pass, no corpus-wide aggregate (LlmOpsSpec pins the
    * single embeddings scan). The oracle re-derives the whole index
    * from scratch, so the hash certifies stored-index serving ≡
    * recompute — the index-freshness contract.
    *
    * Scale shape: the index tables are the scale story — codes are 8
    * rows/vector of (m, cid) (4 bits each — the 64:1 PQ compression),
    * centroids and codebooks constant-size; serving touches
    * |probed cells' members| code rows and broadcasts only
    * constant-size frames. Versioned through TxnTable, a rebuild is a
    * new commit and readers keep snapshot isolation. */
  def simsearchIndexServe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val NProbe = 4
    def serve(cells: DataFrame, codesL: DataFrame, books: DataFrame)
        : DataFrame = {
      val fpq = Tables.embeddings(spark, dir).filter($"vec_id" < 5)
        .select($"vec_id".as("q_id"),
          expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
            .as("qv"))
      val wq = Window.partitionBy($"q_id").orderBy($"pd".desc, $"cell")
      val probed = fpq.crossJoin(broadcast(cells))
        .withColumn("pd", expr(
          "aggregate(zip_with(qv, cfp, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .withColumn("cr", row_number().over(wq).cast("long"))
        .filter($"cr" <= NProbe)
      val qsubs = fpq
        .select($"q_id", posexplode(expr(
          "transform(sequence(0, 7), mm -> slice(qv, mm * 8 + 1, 8))"))
          .as(Seq("m", "qsv")))
        .select($"q_id", $"m".cast("long").as("m"), $"qsv")
      val lut = qsubs.join(broadcast(books), "m")
        .select($"q_id", $"m", $"cid",
          expr("aggregate(zip_with(qsv, cent, (x, y) -> x * y), 0L, " +
            "(acc, v) -> acc + v)").as("pd"))
      val members = codesL
        .join(broadcast(probed.select($"q_id", $"cell")), $"label" === $"cell")
        .filter($"vec_id" =!= $"q_id")
      val adc = members.join(broadcast(lut), Seq("q_id", "m", "cid"))
        .groupBy($"q_id", $"vec_id").agg(sum($"pd").as("adc"))
      val w = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
      adc.withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 10)
        .select($"q_id", $"rn", $"vec_id", $"adc")
        .orderBy($"q_id", $"rn")
    }
    val e = Tables.embeddings(spark, dir)
    val fp = e.select($"vec_id", $"label",
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"))
    val cellsB = fp
      .select($"label", posexplode($"qv").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"), expr("transform(pc, p -> p.c)").as("cfp"))
    val (_, codesB, booksB, _) = pqTrain(spark, dir, 16)
    val codesLB = codesB.join(e.select($"vec_id", $"label"), "vec_id")
    graft.PlanOnly.roundTrip(serve(cellsB, codesLB, booksB)) {
      val tCells = Tables.scratch("idx_ivf_cells")
      val tCodes = Tables.scratch("idx_pq_codes")
      val tBooks = Tables.scratch("idx_pq_codebook")
      Seq(tCells, tCodes, tBooks)
        .foreach(graft.sources.TxnTable.drop(spark, _))
      graft.sources.TxnTable.commit(spark, tCells, 0, cellsB)
      graft.sources.TxnTable.commit(spark, tCodes, 0, codesLB)
      graft.sources.TxnTable.commit(spark, tBooks, 0, booksB)
      serve(graft.sources.TxnTable.read(spark, tCells),
        graft.sources.TxnTable.read(spark, tCodes),
        graft.sources.TxnTable.read(spark, tBooks))
    }
  }

  /** ANN STORED-INDEX MAINTENANCE UNDER APPEND — the incremental path
    * [[simsearchIndexServe]]'s whole-rebuild commits lack (the
    * sink_txn_stats_maintain analog for the vector index): v0 trains
    * the cell centroids on the OLD corpus slice (vec_id % 8 ≠ 7,
    * per-label fixed-point floor-means) and commits them plus the old
    * slice's nearest-centroid assignments as a FILE-LEVEL TxnTable;
    * the append maintains the index WITHOUT retraining — new vectors
    * (vec_id % 8 = 7) are assigned to the STORED v0 centroids by one
    * broadcast exact-BIGINT argmin and committed as a DELTA manifest
    * that carries the v0 assignment file BY REFERENCE (zero rewritten
    * rows — the O(new-data) append every production vector store
    * needs). The graded output is the STALENESS RECEIPT: per stored
    * cell, v0 members, appended members, and the L1 drift between the
    * stored centroid and the centroid retrained over the maintained
    * membership — the number that tells an operator when the
    * re-train trigger should fire. The oracle re-derives the whole
    * pipeline from scratch, so the hash certifies maintained-index ≡
    * recompute of the same maintenance contract.
    *
    * Scale shape: maintenance cost is one |new|×k broadcast argmin +
    * one file write + one O(changed-files) delta manifest — the
    * carried corpus is never read or rewritten; the receipt reads the
    * maintained membership once, aggregated to |cells|·d rows
    * map-side. */
  def simsearchIndexMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    def fpAll() = e.select($"vec_id", $"label".cast("long").as("label"),
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"))
    def cells0F() = fpAll().filter($"vec_id" % 8 =!= 7)
      .select($"label", posexplode($"qv").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"), expr("transform(pc, p -> p.c)").as("cfp"))
    def assignF(vecs: DataFrame, cells: DataFrame, src: Long): DataFrame =
      vecs.crossJoin(broadcast(cells))
        .select($"vec_id", $"cell",
          expr("aggregate(zip_with(qv, cfp, (x, y) -> (x - y) * (x - y)), " +
            "0L, (acc, v) -> acc + v)").as("sqd"))
        .groupBy($"vec_id")
        .agg(min(struct($"sqd", $"cell")).as("m"))
        .select($"vec_id", $"m.cell".as("cell"), lit(src).as("src"))
    def receipt(cells: DataFrame, assign: DataFrame): DataFrame = {
      val retr = assign.join(fpAll().select($"vec_id", $"qv"), Seq("vec_id"))
        .select($"cell", posexplode($"qv").as(Seq("pos", "x")))
        .groupBy($"cell", $"pos")
        .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long")
          .as("c2"))
      val drift = retr
        .join(cells.select($"cell", posexplode($"cfp").as(Seq("pos", "c1"))),
          Seq("cell", "pos"))
        .groupBy($"cell")
        .agg(sum(abs($"c2" - $"c1")).as("drift_l1"))
      val counts = assign.groupBy($"cell")
        .agg(sum(when($"src" === 0L, 1L).otherwise(0L)).as("n_v0"),
          sum(when($"src" === 1L, 1L).otherwise(0L)).as("n_new"))
      cells.select($"cell")
        .join(counts, Seq("cell"), "left")
        .join(drift, Seq("cell"), "left")
        .select($"cell", coalesce($"n_v0", lit(0L)).as("n_v0"),
          coalesce($"n_new", lit(0L)).as("n_new"),
          coalesce($"drift_l1", lit(-1L)).as("drift_l1"))
        .orderBy($"cell")
    }
    graft.PlanOnly.roundTrip(receipt(cells0F(),
      assignF(fpAll().filter($"vec_id" % 8 =!= 7), cells0F(), 0L).unionAll(
        assignF(fpAll().filter($"vec_id" % 8 === 7), cells0F(), 1L)))) {
      val tCells = Tables.scratch("idx_maint_cells")
      val tAssign = Tables.scratch("idx_maint_assign")
      Seq(tCells, tAssign).foreach(graft.sources.TxnTable.drop(spark, _))
      graft.sources.TxnTable.commit(spark, tCells, 0, cells0F())
      val storedCells = graft.sources.TxnTable.read(spark, tCells)
      val a0 = assignF(fpAll().filter($"vec_id" % 8 =!= 7), storedCells, 0L)
      val a1 = assignF(fpAll().filter($"vec_id" % 8 === 7), storedCells, 1L)
      val (n0, n1) = (a0.count(), a1.count())
      if (n0 == 0L || n1 == 0L) {
        // degenerate fixture: no file to carry by reference — commit
        // readable table-level snapshots (the commitMaybeEmpty contract)
        graft.sources.TxnTable.commit(spark, tAssign, 0, a0)
        graft.sources.TxnTable.commit(spark, tAssign, 1, a0.unionAll(a1))
      } else {
        val p0 = s"$tAssign/data/f0"
        a0.write.mode("overwrite").parquet(p0)
        graft.sources.TxnTable.commitEntries(spark, tAssign, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = n0)))
        // the append: ONLY the new slice is written; v0's file rides
        // in the delta manifest by reference, never rewritten
        val p1 = s"$tAssign/data/f1"
        a1.write.mode("overwrite").parquet(p1)
        graft.sources.TxnTable.commitDelta(spark, tAssign, 1,
          adds = Seq(graft.sources.TxnTable.FileEntry(1L, p1, Long.MinValue,
            Long.MaxValue, rowCount = n1)))
      }
      receipt(storedCells, graft.sources.TxnTable.read(spark, tAssign))
    }
  }

  /** PQ-served top-10 retrieval — the ANN serving path the
    * compression tier exists FOR, completing the serving triad next
    * to simsearch_cosine_topk (exact) and simsearch_ann_ivf (IVF):
    * per query, the 10 best vectors by ADC inner-product score over
    * the 4-byte codes alone. The score IS the graded output (exact
    * BIGINT — the LUT sums are deterministic), so a user can audit
    * the approximation against the exact keys row by row.
    *
    * Scale shape: one pass over the code table (32 bits/vector —
    * ~16 GB per billion vectors, RAM-resident where the raw floats
    * are 256× that) against broadcast LUTs; top-k per query by
    * (score desc, vec_id). At 100 TB this composes with the IVF
    * cells: probe cells first, ADC-score only their members. */
  /** IVF-bucketed candidate generation for the offline kNN-graph
    * builds — the SCALE.md candidate-generation path shared by
    * [[simsearchGraphGreedy]] and [[simsearchHnswLayers]]: layer
    * members (vec_id % m) quantize to 2²⁰ fixed point, assign to
    * their `probe` nearest of the first-`k` member cells by exact
    * BIGINT squared distance (ml_kmeans_step's assign shape, ties on
    * (sqdist, cid)), and a candidate pair is any two members sharing
    * ≥ 1 probed cell — an EQUI-JOIN on the cell id, never
    * members × members. Per-consumer dag builders keep the asg ⋈ asg
    * self-join unambiguous in plan-only mode.
    *
    * Scale shape: at 100 TB k grows with the corpus (k ≈ √n) so
    * per-cell population — and with it the per-member candidate count
    * — stays bounded; the same cell geometry simsearch_ivf_pq probes
    * at serve time. The seed frame is k rows broadcast. */
  private def ivfCandidates(spark: SparkSession, dir: String, m: Int,
      k: Int, probe: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def fpF() = Tables.embeddings(spark, dir)
      .filter($"vec_id" % m === 0)
      .select($"vec_id".as("b_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    def asgBuild(): DataFrame = {
      val seeds = fpF().orderBy($"b_id").limit(k)
        .select($"b_id".as("cid"), $"qv".as("cq"))
      fpF().crossJoin(broadcast(seeds))
        .select($"b_id", $"cid",
          expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), " +
            "0L, (acc, v) -> acc + v)").as("sqdist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"b_id").orderBy($"sqdist".asc, $"cid")))
        .filter($"rn" <= probe)
        .select($"b_id", $"cid")
    }
    // graded: ONE persisted assignment self-joined (DeduplicateRelations
    // re-aliases the right side); plan-only: cuts are identity, so each
    // side builds its own dag (the planonly-self-join contract)
    // cut, not mark (r18): the self-join's broadcast side races a
    // lazy persist and recomputes the whole assignment build
    val shared =
      if (graft.PlanOnly.enabled) null else graft.PlanOnly.cut(asgBuild())
    def asgF(idCol: String): DataFrame =
      (if (graft.PlanOnly.enabled) asgBuild() else shared)
        .select(col("b_id").as(idCol), $"cid")
    asgF("b_id").join(asgF("c_id"), Seq("cid"))
      .filter($"b_id" =!= $"c_id")
      .select($"b_id", $"c_id").distinct()
  }

  /** GREEDY ROUTING over a k-NN proximity graph — the navigation
    * primitive graph-based ANN indexes (HNSW layer 0 / NSW) serve
    * from, completing the family's third index geometry next to the
    * partition-based IVF(+PQ) and hash-based LSH tiers. The offline
    * index build is IVF-BUCKETED ([[ivfCandidates]], k = 32 cells,
    * 3-probe): candidate pairs share ≥ 1 probed cell — an equi-join
    * on the cell id, never base × base — and the top-4 out-edge
    * election over candidates keeps the (cosine desc, c_id) rule.
    * Every query enters at the GLOBAL fixed entry point (min base id)
    * and takes two greedy hops, each moving to the best-scoring node
    * among {current} ∪ out-neighbors — score monotonicity is
    * structural (the current node is always a candidate; StatsSpec
    * law). The exact brute-force best over the base rides along, so
    * each row is a SELF-GRADING recall receipt (found = routed
    * endpoint ≡ exact argmax), and the build itself is priced by an
    * EDGE-RECALL receipt (edge_hits / edge_total): the
    * candidate-generated top-4 edges of the fixed audit panel
    * (id % 40, id < 2000) vs their exact top-4 over the whole base —
    * the eval_ann_recall pricing applied to the index build. Scores
    * are round-6 cosines packed to micro-units — all-BIGINT rows.
    *
    * Scale shape: the build scores cell-bucketed candidates only
    * (k ≈ √n at scale keeps cells bounded); the query and audit
    * panels are FIXED draws (id % cap ∧ id < 2000), so each exact
    * receipt is one linear base scan against a ≤50-row broadcast,
    * never data². Routing touches |hops|·k candidates per query via
    * broadcast-size joins on the 4-edge-per-node frame. */
  def simsearchGraphGreedy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    def pack(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(round(c, 6) * 1e6 + 0.5).cast("long")
    val e = Tables.embeddings(spark, dir)
    def baseF(id: String, v: String) = e.filter($"vec_id" % 4 === 0)
      .select($"vec_id".as(id), $"embedding".as(v))
    val pairs = ivfCandidates(spark, dir, 4, 32, 3)
      .join(baseF("b_id", "be"), Seq("b_id"))
      .join(baseF("c_id", "ce"), Seq("c_id"))
      .select($"b_id", $"c_id",
        pack(expr("cosine_similarity(be, ce)")).as("s"))
    // cut, not mark (r18): both greedy hops broadcast withVec —
    // concurrent futures racing a lazy persist would recompute the
    // whole IVF-bucketed pair build per hop
    val edges = graft.PlanOnly.cut(pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy($"b_id").orderBy($"s".desc, $"c_id")))
      .filter($"rn" <= 4).select($"b_id".as("src"), $"c_id".as("dst")))
    val withVec = edges.join(baseF("dst", "de"), Seq("dst"))
    val entry = baseF("e_id", "ee").orderBy($"e_id").limit(1)
    val q = e.filter($"vec_id" % 50 === 0 && $"vec_id" < 2000)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val h0 = q.crossJoin(broadcast(entry))
      .select($"q_id", $"qe", $"e_id".as("cur"),
        pack(expr("cosine_similarity(qe, ee)")).as("cs"))
    def hop(h: DataFrame): DataFrame = {
      val cand = h.join(broadcast(withVec).withColumnRenamed("src", "cur"), Seq("cur"))
        .select($"q_id", $"qe", $"dst".as("cur"),
          pack(expr("cosine_similarity(qe, de)")).as("cs"))
        .unionAll(h.select($"q_id", $"qe", $"cur", $"cs"))
      cand.withColumn("rn", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cs".desc, $"cur")))
        .filter($"rn" === 1).drop("rn")
    }
    val h1 = hop(h0)
    val h2 = hop(h1)
    // exact receipt: one linear base scan against the ≤40-row query
    // panel broadcast (flipped from broadcast(base) so the broadcast
    // side no longer grows with the corpus)
    val exact = baseF("b_id", "be").crossJoin(broadcast(q))
      .select($"q_id", $"b_id", pack(expr("cosine_similarity(qe, be)")).as("bs"))
      .groupBy($"q_id")
      .agg(min(struct(($"bs" * -1L).as("neg"), $"b_id".as("b"))).as("m"))
      .select($"q_id", $"m.b".as("best_id"), ($"m.neg" * -1L).as("best_s"))
    // edge-recall receipt: the audit panel's exact top-4 over the
    // whole base (one linear scan) vs the candidate-generated edges
    val audit = baseF("a_id", "ae")
      .filter($"a_id" % 40 === 0 && $"a_id" < 2000)
    val exactEdges = baseF("b_id", "be").crossJoin(broadcast(audit))
      .filter($"b_id" =!= $"a_id")
      .select($"a_id", $"b_id",
        pack(expr("cosine_similarity(ae, be)")).as("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"a_id").orderBy($"s".desc, $"b_id")))
      .filter($"rn" <= 4).select($"a_id", $"b_id")
    val receipt = exactEdges
      .join(edges.select($"src".as("a_id"), $"dst".as("b_id")),
        Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("edge_hits"))
      .crossJoin(exactEdges.agg(count(lit(1)).as("edge_total")))
    h0.select($"q_id", $"cur".as("entry_id"), $"cs".as("s0"))
      .join(h1.select($"q_id", $"cur".as("n1"), $"cs".as("s1")), Seq("q_id"))
      .join(h2.select($"q_id", $"cur".as("n2"), $"cs".as("s2")), Seq("q_id"))
      .join(exact, Seq("q_id"))
      .crossJoin(broadcast(receipt))
      .select($"q_id", $"entry_id", $"s0", $"n1", $"s1", $"n2", $"s2",
        $"best_id", $"best_s",
        when($"n2" === $"best_id", 1L).otherwise(0L).as("found"),
        $"edge_hits", $"edge_total")
      .orderBy($"q_id")
  }

  /** MULTI-LAYER greedy routing — the HNSW hierarchy (Malkov & Yashunin
    * 2016) over [[simsearchGraphGreedy]]'s single-layer NSW: three
    * NESTED layer samples (vec_id % 64 / % 16 / % 4 — the deterministic
    * stand-in for HNSW's geometric level draw, nesting guaranteed by
    * construction), each with its own IVF-bucketed 4-NN out-edge graph; a
    * query enters at the top layer's global entry point, takes two
    * greedy hops per layer, and the layer endpoint SEEDS the next layer
    * down — the skip-list descent that makes graph ANN logarithmic.
    * Every layer endpoint + score is emitted, the exact base-layer
    * argmax rides along, so each row is a self-grading recall receipt
    * AND a per-layer routing trace (where the descent converged vs
    * where it started). Scores are round-6 cosines packed to
    * micro-units — all-BIGINT rows.
    *
    * Scale shape: upper layers are geometrically smaller (|L0|/16,
    * |L0|/4 here), so the added index cost over the single-layer graph
    * is a vanishing fraction; routing touches 2·k candidates per layer
    * — O(layers·k) per query, against broadcast edge frames. Each
    * layer's kNN build is IVF-BUCKETED ([[ivfCandidates]]): candidate
    * pairs share ≥ 1 probed cell — an equi-join on the cell id, never
    * members × members — and the L0 build is priced by the same
    * edge-recall receipt as simsearch_graph_greedy (edge_hits /
    * edge_total over the fixed audit panel). On tiny upper layers the
    * cells degrade gracefully toward exhaustive (every member seeds a
    * cell), so sparse-layer connectivity survives the bucketing. */
  /** The shared one-candidate-pass HNSW layer-graph builder
    * ([[simsearchHnswLayers]] builds these per run;
    * [[simsearchHnswServe]] COMMITS them): the layers NEST (L2 ⊂ L1 ⊂
    * L0), so the hierarchy shares the base layer's IVF cell
    * assignment — every upper-layer candidate pair is an L0 candidate
    * pair with both endpoints in the layer; flag it, and a flag-first
    * window order makes rn ≤ 4 ∧ flag the top-4 among that layer's
    * cell-mates (the r15 one-pass build applied to the bucketed
    * candidates — score once, derive every level). Returns the marked
    * ranked-pair frame; [[hnswLayerEdges]] slices a layer's out-edges
    * (with dst vectors) from it. */
  private def hnswRanked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def pack(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(round(c, 6) * 1e6 + 0.5).cast("long")
    val e = Tables.embeddings(spark, dir)
    def memF(m: Int, id: String, v: String) = e.filter($"vec_id" % m === 0)
      .select($"vec_id".as(id), $"embedding".as(v))
    graft.PlanOnly.mark {
      val pairs = ivfCandidates(spark, dir, 4, 32, 3)
        .join(memF(4, "b_id", "be"), Seq("b_id"))
        .join(memF(4, "c_id", "ce"), Seq("c_id"))
        .select($"b_id", $"c_id",
          pack(expr("cosine_similarity(be, ce)")).as("s"),
          ($"b_id" % 16 === 0 && $"c_id" % 16 === 0).as("l1"),
          ($"b_id" % 64 === 0 && $"c_id" % 64 === 0).as("l2"))
      def rn(flagFirst: Option[String]) = row_number().over(
        Window.partitionBy($"b_id").orderBy(
          (flagFirst.map(f => Seq(col(f).desc)).getOrElse(Seq.empty) ++
            Seq($"s".desc, $"c_id".asc)): _*))
      pairs
        .withColumn("rn0", rn(None))
        .withColumn("rn1", rn(Some("l1")))
        .withColumn("rn2", rn(Some("l2")))
        .filter($"rn0" <= 4 || ($"l1" && $"rn1" <= 4) ||
          ($"l2" && $"rn2" <= 4))
    }
  }

  /** Layer m's out-edges (src, dst, de) from the shared ranked frame. */
  private def hnswLayerEdges(spark: SparkSession, dir: String,
      ranked: DataFrame, m: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val sel = m match {
      case 64 => ranked.filter($"l2" && $"rn2" <= 4)
      case 16 => ranked.filter($"l1" && $"rn1" <= 4)
      case _  => ranked.filter($"rn0" <= 4)
    }
    sel.select($"b_id".as("src"), $"c_id".as("dst"))
      .join(e.filter($"vec_id" % 4 === 0)
        .select($"vec_id".as("dst"), $"embedding".as("de")), Seq("dst"))
  }

  def simsearchHnswLayers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    def pack(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(round(c, 6) * 1e6 + 0.5).cast("long")
    val e = Tables.embeddings(spark, dir)
    def memF(m: Int, id: String, v: String) = e.filter($"vec_id" % m === 0)
      .select($"vec_id".as(id), $"embedding".as(v))
    val q = e.filter($"vec_id" % 50 === 0 && $"vec_id" < 2000)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val ranked = hnswRanked(spark, dir)
    def layerEdges(m: Int): DataFrame =
      hnswLayerEdges(spark, dir, ranked, m)
    def hop(h: DataFrame, withVec: DataFrame): DataFrame = {
      val cand = h
        .join(broadcast(withVec).withColumnRenamed("src", "cur"), Seq("cur"))
        .select($"q_id", $"qe", $"dst".as("cur"),
          pack(expr("cosine_similarity(qe, de)")).as("cs"))
        .unionAll(h.select($"q_id", $"qe", $"cur", $"cs"))
      cand.withColumn("rn", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cs".desc, $"cur")))
        .filter($"rn" === 1).drop("rn")
    }
    val entry = memF(64, "e_id", "ee").orderBy($"e_id").limit(1)
    // each descent stage is reused by the next layer AND the final
    // join — CUT (eager checkpoint), not just persist, the tiny
    // per-query endpoint frames: each hop references its input twice
    // (candidate join + carry-over union), so the ANALYZED plan of the
    // un-cut chain nests h0 4^layers times with the whole ranked edge
    // build inside each copy — measured ~4-6 s of single-threaded
    // analyzer time per run (r18 opt); the cut truncates the logical
    // tree per stage. cut ≡ identity in plan-only mode, so plan audits
    // are unchanged.
    val h0 = graft.PlanOnly.cut(q.crossJoin(broadcast(entry))
      .select($"q_id", $"qe", $"e_id".as("cur"),
        pack(expr("cosine_similarity(qe, ee)")).as("cs")))
    val (e2, e1, e0) = (
      graft.PlanOnly.cut(layerEdges(64)),
      graft.PlanOnly.cut(layerEdges(16)),
      graft.PlanOnly.cut(layerEdges(4)))
    val l2 = graft.PlanOnly.cut(hop(hop(h0, e2), e2))
    val l1 = graft.PlanOnly.cut(hop(hop(l2, e1), e1))
    val l0 = hop(hop(l1, e0), e0)
    // exact receipt: one linear base scan against the ≤40-row query
    // panel broadcast (flipped from broadcast(base) so the broadcast
    // side no longer grows with the corpus)
    val exact = memF(4, "b_id", "be").crossJoin(broadcast(q))
      .select($"q_id", $"b_id",
        pack(expr("cosine_similarity(qe, be)")).as("bs"))
      .groupBy($"q_id")
      .agg(min(struct(($"bs" * -1L).as("neg"), $"b_id".as("b"))).as("m"))
      .select($"q_id", $"m.b".as("best_id"), ($"m.neg" * -1L).as("best_s"))
    // (the exact argmax stays a hash aggregate — no array rides in its
    // struct, so the election is map-side combinable over the 20k-row
    // score frame; the hop elections keep the tiny per-query window)
    // edge-recall receipt over the L0 build: audit panel's exact
    // top-4 over the whole base vs the candidate-generated edges
    val audit = memF(4, "a_id", "ae")
      .filter($"a_id" % 40 === 0 && $"a_id" < 2000)
    val exactEdges = memF(4, "b_id", "be").crossJoin(broadcast(audit))
      .filter($"b_id" =!= $"a_id")
      .select($"a_id", $"b_id",
        pack(expr("cosine_similarity(ae, be)")).as("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"a_id").orderBy($"s".desc, $"b_id")))
      .filter($"rn" <= 4).select($"a_id", $"b_id")
    val receipt = exactEdges
      .join(e0.select($"src".as("a_id"), $"dst".as("b_id")),
        Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("edge_hits"))
      .crossJoin(exactEdges.agg(count(lit(1)).as("edge_total")))
    h0.select($"q_id", $"cur".as("entry_id"), $"cs".as("s_entry"))
      .join(l2.select($"q_id", $"cur".as("end_l2"), $"cs".as("s_l2")), Seq("q_id"))
      .join(l1.select($"q_id", $"cur".as("end_l1"), $"cs".as("s_l1")), Seq("q_id"))
      .join(l0.select($"q_id", $"cur".as("end_l0"), $"cs".as("s_l0")), Seq("q_id"))
      .join(exact, Seq("q_id"))
      .crossJoin(broadcast(receipt))
      .select($"q_id", $"entry_id", $"s_entry", $"end_l2", $"s_l2",
        $"end_l1", $"s_l1", $"end_l0", $"s_l0", $"best_id", $"best_s",
        when($"end_l0" === $"best_id", 1L).otherwise(0L).as("found"),
        $"edge_hits", $"edge_total")
      .orderBy($"q_id")
  }

  /** HNSW SERVED FROM A COMMITTED INDEX — the lifecycle rung the r17
    * verdict named (IVF/PQ got build/serve/maintain in rounds 15–16;
    * the HNSW layer graphs were still rebuilt per run): the BUILD step
    * materializes the three nested layer graphs (the shared
    * [[hnswRanked]] one-candidate-pass build) as ONE versioned
    * [[graft.sources.TxnTable]] of (layer, src, dst, dst-vector) rows
    * plus the 1-row entry-point table — the batch job that runs once
    * per index version — and the SERVE step answers queries from the
    * STORED index alone: enter at the committed entry point, two
    * greedy hops per layer against the stored out-edges (dst vectors
    * ride the index rows — the serve plan never joins the corpus for
    * routing), each layer endpoint seeding the next layer down. The
    * only corpus touches in the serve plan are the query panel fetch
    * and the exact-argmax receipt (the self-grading recall column
    * every ANN key carries). The per-layer edge censuses ride every
    * row FROM THE STORED TABLE, so the hash also certifies the
    * committed index content; the oracle re-derives the whole build +
    * descent from scratch — stored-index serving ≡ recompute, the
    * index-freshness contract.
    *
    * Scale shape: the index is O(Σ layer members · 4) edge rows —
    * upper layers geometrically smaller; serving touches 2·k stored
    * edges per (query, layer) against broadcast frames, zero corpus
    * scans on the routing path; versioned through TxnTable, a rebuild
    * is a new commit and readers keep snapshot isolation. */
  def simsearchHnswServe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    def pack(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(round(c, 6) * 1e6 + 0.5).cast("long")
    val e = Tables.embeddings(spark, dir)
    def memF(m: Int, id: String, v: String) = e.filter($"vec_id" % m === 0)
      .select($"vec_id".as(id), $"embedding".as(v))
    val q = e.filter($"vec_id" % 50 === 0 && $"vec_id" < 2000)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    def edgesAllF(): DataFrame = {
      val ranked = hnswRanked(spark, dir)
      Seq(64, 16, 4).map(m =>
        hnswLayerEdges(spark, dir, ranked, m)
          .select(lit(m.toLong).as("layer"), $"src", $"dst", $"de"))
        .reduce(_.unionAll(_))
    }
    def entryF(): DataFrame = memF(64, "e_id", "ee")
      .orderBy($"e_id").limit(1)
    def serve(edges: DataFrame, entry: DataFrame): DataFrame = {
      def hop(h: DataFrame, m: Int): DataFrame = {
        val withVec = edges.filter($"layer" === m.toLong)
          .select($"src".as("cur"), $"dst", $"de")
        val cand = h
          .join(broadcast(withVec), Seq("cur"))
          .select($"q_id", $"qe", $"dst".as("cur"),
            pack(expr("cosine_similarity(qe, de)")).as("cs"))
          .unionAll(h.select($"q_id", $"qe", $"cur", $"cs"))
        cand.withColumn("rn", row_number().over(
            Window.partitionBy($"q_id").orderBy($"cs".desc, $"cur")))
          .filter($"rn" === 1).drop("rn")
      }
      // cut, not mark (r18): the final 5-way q_id join broadcasts the
      // tiny per-layer endpoint frames — concurrent futures racing
      // lazy persists would recompute the descent chain per consumer
      val h0 = graft.PlanOnly.cut(q.crossJoin(broadcast(entry))
        .select($"q_id", $"qe", $"e_id".as("cur"),
          pack(expr("cosine_similarity(qe, ee)")).as("cs")))
      val l2 = graft.PlanOnly.cut(hop(hop(h0, 64), 64))
      val l1 = graft.PlanOnly.cut(hop(hop(l2, 16), 16))
      val l0 = hop(hop(l1, 4), 4)
      // exact receipt: one linear base scan against the ≤40-row query
      // panel broadcast — the self-grading recall column
      val exact = memF(4, "b_id", "be").crossJoin(broadcast(q))
        .select($"q_id", $"b_id",
          pack(expr("cosine_similarity(qe, be)")).as("bs"))
        .groupBy($"q_id")
        .agg(min(struct(($"bs" * -1L).as("neg"), $"b_id".as("b"))).as("m"))
        .select($"q_id", $"m.b".as("best_id"), ($"m.neg" * -1L).as("best_s"))
      // index census from the STORED rows — certifies the commit
      val census = edges.groupBy().agg(
        sum(when($"layer" === 64L, 1L).otherwise(0L)).as("n_edges_l2"),
        sum(when($"layer" === 16L, 1L).otherwise(0L)).as("n_edges_l1"),
        sum(when($"layer" === 4L, 1L).otherwise(0L)).as("n_edges_l0"))
      h0.select($"q_id", $"cur".as("entry_id"), $"cs".as("s_entry"))
        .join(l2.select($"q_id", $"cur".as("end_l2"), $"cs".as("s_l2")),
          Seq("q_id"))
        .join(l1.select($"q_id", $"cur".as("end_l1"), $"cs".as("s_l1")),
          Seq("q_id"))
        .join(l0.select($"q_id", $"cur".as("end_l0"), $"cs".as("s_l0")),
          Seq("q_id"))
        .join(exact, Seq("q_id"))
        .crossJoin(broadcast(census))
        .select($"q_id", $"entry_id", $"s_entry", $"end_l2", $"s_l2",
          $"end_l1", $"s_l1", $"end_l0", $"s_l0", $"best_id", $"best_s",
          when($"end_l0" === $"best_id", 1L).otherwise(0L).as("found"),
          coalesce($"n_edges_l2", lit(0L)).as("n_edges_l2"),
          coalesce($"n_edges_l1", lit(0L)).as("n_edges_l1"),
          coalesce($"n_edges_l0", lit(0L)).as("n_edges_l0"))
        .orderBy($"q_id")
    }
    graft.PlanOnly.roundTrip(serve(edgesAllF(), entryF())) {
      val tEdges = Tables.scratch("idx_hnsw_edges")
      val tEntry = Tables.scratch("idx_hnsw_entry")
      Seq(tEdges, tEntry).foreach(graft.sources.TxnTable.drop(spark, _))
      // independent tables — overlap the two commit writes (Par)
      Par.all(
        () => graft.sources.TxnTable.commit(spark, tEdges, 0, edgesAllF()),
        () => graft.sources.TxnTable.commit(spark, tEntry, 0, entryF()))
      // the serve: routing reads ONLY the committed index tables
      serve(graft.sources.TxnTable.read(spark, tEdges),
        graft.sources.TxnTable.read(spark, tEntry))
    }
  }

  /** HNSW STORED-INDEX MAINTENANCE UNDER APPEND — the rung above
    * [[simsearchHnswServe]] (whole-rebuild commits) and the layer-graph
    * twin of [[simsearchIndexMaintain]]: v0 builds the three nested
    * layer graphs over the OLD slice (base layer = vec_id % 8 = 0;
    * upper layers % 16 / % 64 are subsets of it BY CONSTRUCTION, so an
    * append of new base vectors — vec_id % 8 = 4 — can never add an
    * upper-layer member, and the whole hierarchy maintains through
    * LAYER-0 edge additions alone, exactly HNSW's insert-at-level-0
    * common case). The index commits FOUR stored pieces: the layer
    * edges, the entry point, and the candidate STRUCTURE itself — the
    * 32 seed cells and the old members' (cell, vector) assignments —
    * which is what makes maintenance O(new): each new vector probes
    * its 3 nearest STORED seed cells (broadcast argmin), scores only
    * the STORED cell-mates, takes its top-4 out-edges, and adds the
    * BACKLINKS (old → new) that keep new nodes reachable (the
    * no-backlink variant silently loses every query whose true best
    * is a new vector — the honest repair every real HNSW insert
    * does). The append commits as a DELTA carrying every v0 edge file
    * by reference; the graded frame is the fresh-session descent over
    * the MAINTAINED stored index with the exact argmax over the FULL
    * (old ∪ new) membership + the v0/added edge censuses — the oracle
    * re-derives build, assignment, insertion and descent from
    * scratch, so the hash certifies maintained-index ≡ the declared
    * insert algebra.
    *
    * Scale shape: maintenance reads |new| vectors + their stored
    * cell-mates — the old corpus is NEVER re-read (the stored
    * assignments carry the vectors); the delta writes O(new · 8) edge
    * rows; upper layers carry untouched by construction. */
  def simsearchHnswMaintain(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    def pack(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(round(c, 6) * 1e6 + 0.5).cast("long")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" % 50 === 0 && $"vec_id" < 2000)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    def fpOf(df: DataFrame) = df.select($"vec_id",
      expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
        .as("qv"), $"embedding")
    def oldE() = e.filter($"vec_id" % 8 === 0)
    def newE() = e.filter($"vec_id" % 8 === 4)
    // the stored candidate structure: 32 seed cells + old assignments
    def seedsF() = fpOf(oldE()).orderBy($"vec_id").limit(32)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    def asgOf(vecs: DataFrame, seeds: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(seeds))
        .select($"vec_id", $"cid", $"embedding",
          expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), " +
            "0L, (acc, v) -> acc + v)").as("sqdist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"sqdist".asc, $"cid")))
        .filter($"rn" <= 3).select($"vec_id", $"cid", $"embedding")
    // v0 layer edges over the OLD membership (base = 8; upper flags
    // % 16 / % 64 — the hnswRanked build at the old base). Takes a
    // BUILDER so each join side gets its own dag in plan-only mode
    // (the planonly-self-join contract; graded callers pass a cut or
    // a TxnTable read, both self-join-safe)
    def edgesOldF(asgOldB: () => DataFrame): DataFrame = {
      def side(id: String, v: String) = asgOldB()
        .select($"vec_id".as(id), $"cid", $"embedding".as(v))
      val pairs = side("b_id", "be").join(side("c_id", "ce"), Seq("cid"))
        .filter($"b_id" =!= $"c_id")
        .select($"b_id", $"c_id", $"be", $"ce").distinct()
        .select($"b_id", $"c_id",
          pack(expr("cosine_similarity(be, ce)")).as("s"), $"ce",
          ($"b_id" % 16 === 0 && $"c_id" % 16 === 0).as("l1"),
          ($"b_id" % 64 === 0 && $"c_id" % 64 === 0).as("l2"))
      def rn(flagFirst: Option[String]) = row_number().over(
        Window.partitionBy($"b_id").orderBy(
          (flagFirst.map(f => Seq(col(f).desc)).getOrElse(Seq.empty) ++
            Seq($"s".desc, $"c_id".asc)): _*))
      val ranked = pairs
        .withColumn("rn0", rn(None))
        .withColumn("rn1", rn(Some("l1")))
        .withColumn("rn2", rn(Some("l2")))
      Seq((64, "l2", "rn2"), (16, "l1", "rn1")).map { case (m, fl, r) =>
        ranked.filter(col(fl) && col(r) <= 4)
          .select(lit(m.toLong).as("layer"), $"b_id".as("src"),
            $"c_id".as("dst"), $"ce".as("de"))
      }.reduce(_.unionAll(_))
        .unionAll(ranked.filter($"rn0" <= 4)
          .select(lit(4L).as("layer"), $"b_id".as("src"),
            $"c_id".as("dst"), $"ce".as("de")))
    }
    // the O(new) insert: probe stored seeds, score stored cell-mates,
    // top-4 out-edges + backlinks
    def insertEdgesF(asgOld: DataFrame, seeds: DataFrame): DataFrame = {
      val asgNew = asgOf(fpOf(newE()), seeds)
        .select($"vec_id".as("n_id"), $"cid", $"embedding".as("ne"))
      val scored = asgNew
        .join(asgOld.select($"vec_id".as("o_id"), $"cid",
          $"embedding".as("oe")), Seq("cid"))
        .select($"n_id", $"o_id", $"ne", $"oe").distinct()
        .select($"n_id", $"o_id", $"ne", $"oe",
          pack(expr("cosine_similarity(ne, oe)")).as("s"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"n_id").orderBy($"s".desc, $"o_id")))
        .filter($"rn" <= 4)
      scored.select(lit(4L).as("layer"), $"n_id".as("src"),
          $"o_id".as("dst"), $"oe".as("de"))
        .unionAll(scored.select(lit(4L).as("layer"), $"o_id".as("src"),
          $"n_id".as("dst"), $"ne".as("de")))
    }
    def entryF(): DataFrame = e.filter($"vec_id" % 64 === 0)
      .select($"vec_id".as("e_id"), $"embedding".as("ee"))
      .orderBy($"e_id").limit(1)
    def serve(edges: DataFrame, entry: DataFrame,
        census: DataFrame): DataFrame = {
      def hop(h: DataFrame, m: Int): DataFrame = {
        val withVec = edges.filter($"layer" === m.toLong)
          .select($"src".as("cur"), $"dst", $"de")
        val cand = h
          .join(broadcast(withVec), Seq("cur"))
          .select($"q_id", $"qe", $"dst".as("cur"),
            pack(expr("cosine_similarity(qe, de)")).as("cs"))
          .unionAll(h.select($"q_id", $"qe", $"cur", $"cs"))
        cand.withColumn("rn", row_number().over(
            Window.partitionBy($"q_id").orderBy($"cs".desc, $"cur")))
          .filter($"rn" === 1).drop("rn")
      }
      // cut, not mark (r18): the final 5-way q_id join broadcasts the
      // tiny per-layer endpoint frames — concurrent futures racing
      // lazy persists would recompute the descent chain per consumer
      val h0 = graft.PlanOnly.cut(q.crossJoin(broadcast(entry))
        .select($"q_id", $"qe", $"e_id".as("cur"),
          pack(expr("cosine_similarity(qe, ee)")).as("cs")))
      val l2 = graft.PlanOnly.cut(hop(hop(h0, 64), 64))
      val l1 = graft.PlanOnly.cut(hop(hop(l2, 16), 16))
      val l0 = hop(hop(l1, 4), 4)
      // exact receipt over the FULL maintained membership (old ∪ new)
      val full = e.filter($"vec_id" % 8 === 0 || $"vec_id" % 8 === 4)
        .select($"vec_id".as("b_id"), $"embedding".as("be"))
      val exact = full.crossJoin(broadcast(q))
        .select($"q_id", $"b_id",
          pack(expr("cosine_similarity(qe, be)")).as("bs"))
        .groupBy($"q_id")
        .agg(min(struct(($"bs" * -1L).as("neg"), $"b_id".as("b"))).as("m"))
        .select($"q_id", $"m.b".as("best_id"), ($"m.neg" * -1L).as("best_s"))
      h0.select($"q_id", $"cur".as("entry_id"), $"cs".as("s_entry"))
        .join(l2.select($"q_id", $"cur".as("end_l2"), $"cs".as("s_l2")),
          Seq("q_id"))
        .join(l1.select($"q_id", $"cur".as("end_l1"), $"cs".as("s_l1")),
          Seq("q_id"))
        .join(l0.select($"q_id", $"cur".as("end_l0"), $"cs".as("s_l0")),
          Seq("q_id"))
        .join(exact, Seq("q_id"))
        .crossJoin(broadcast(census))
        .select($"q_id", $"entry_id", $"s_entry", $"end_l2", $"s_l2",
          $"end_l1", $"s_l1", $"end_l0", $"s_l0", $"best_id", $"best_s",
          when($"end_l0" === $"best_id", 1L).otherwise(0L).as("found"),
          $"n_edges_v0", $"n_edges_added")
        .orderBy($"q_id")
    }
    def censusOf(v0: DataFrame, added: DataFrame): DataFrame =
      v0.agg(count(lit(1)).as("n_edges_v0"))
        .crossJoin(broadcast(added.agg(count(lit(1)).as("n_edges_added"))))
    // def, not val: roundTrip takes the oracle-equivalent frame BY NAME
    // and graded runs never evaluate it — a val would eagerly ANALYZE
    // this (build + insert + serve) composite plan on every graded run
    // (measured ~13 s of driver-side analyzer time on this key alone)
    def equivalent = {
      def asgOldB() = asgOf(fpOf(oldE()), seedsF())
      val v0 = edgesOldF(asgOldB _)
      val add = insertEdgesF(asgOldB(), seedsF())
      serve(v0.unionAll(add), entryF(), censusOf(v0, add))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val tEdges = Tables.scratch("idx_hnswm_edges")
      val tAsg = Tables.scratch("idx_hnswm_asg")
      val tSeeds = Tables.scratch("idx_hnswm_seeds")
      val tEntry = Tables.scratch("idx_hnswm_entry")
      Seq(tEdges, tAsg, tSeeds, tEntry)
        .foreach(graft.sources.TxnTable.drop(spark, _))
      // ---- v0 build: edges + the stored candidate structure ---------
      val asgOld = graft.PlanOnly.cut(asgOf(fpOf(oldE()), seedsF()))
      // the three structure commits are independent tables — overlap
      // their write jobs (Par rationale; results unchanged)
      Par.all(
        () => graft.sources.TxnTable.commit(spark, tSeeds, 0, seedsF()),
        () => graft.sources.TxnTable.commit(spark, tAsg, 0, asgOld),
        () => graft.sources.TxnTable.commit(spark, tEntry, 0, entryF()))
      // the v0 edge build and the O(new) insert both read only the
      // COMMITTED structure tables — independent chains, overlapped
      val ((v0, n0), (add, na)) = Par.both(
        { val v = graft.PlanOnly.cut(edgesOldF(
            () => graft.sources.TxnTable.read(spark, tAsg)))
          (v, v.count()) },
        { val a = graft.PlanOnly.cut(insertEdgesF(
            graft.sources.TxnTable.read(spark, tAsg),
            graft.sources.TxnTable.read(spark, tSeeds)))
          (a, a.count()) })
      if (n0 > 0L && na > 0L) {
        val p0 = s"$tEdges/data/f0"
        val p1 = s"$tEdges/data/f1"
        // distinct destination dirs: the data writes overlap; the
        // manifest installs stay sequential (delta chains on v0)
        Par.both(
          v0.write.mode("overwrite").parquet(p0),
          add.write.mode("overwrite").parquet(p1))
        graft.sources.TxnTable.commitEntries(spark, tEdges, 0,
          Seq(graft.sources.TxnTable.FileEntry(0L, p0, Long.MinValue,
            Long.MaxValue, rowCount = n0)))
        // the append: v0's edge file rides the delta BY REFERENCE
        graft.sources.TxnTable.commitDelta(spark, tEdges, 1,
          adds = Seq(graft.sources.TxnTable.FileEntry(1L, p1,
            Long.MinValue, Long.MaxValue, rowCount = na)))
      } else {
        graft.sources.TxnTable.commit(spark, tEdges, 0, v0)
        graft.sources.TxnTable.commit(spark, tEdges, 1, v0.unionAll(add))
      }
      // fresh-session descent over the MAINTAINED stored index
      serve(graft.sources.TxnTable.read(spark, tEdges, Some(1))
          .select($"layer", $"src", $"dst", $"de"),
        graft.sources.TxnTable.read(spark, tEntry),
        censusOf(v0, add))
    }
  }

  def simsearchPqTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
    pqAdcScores(spark, dir, 16)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 10)
      .select($"q_id", $"rn", $"vec_id", $"adc")
      .orderBy($"q_id", $"rn")
  }

  /** [[embeddingPqQuantize]] with a parameterized codebook size k —
    * the unit-law surface (k = corpus ⇒ exact reconstruction ⇒
    * recall ≡ 2²⁰; recall grows with k on the fixture ladder). */
  def pqRecall(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // cut (r19): adc feeds both the top-10 window and the n_scored
    // audit — separate actions never share exchanges, so the whole ADC
    // chain was computed twice
    val adc = graft.PlanOnly.cut(pqAdcScores(spark, dir, k))
    val fp = Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(floor(x * 1048576) AS BIGINT))")
          .as("qv"))
    val wp = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
    val pqTop = adc.withColumn("rn", row_number().over(wp))
      .filter($"rn" <= 10).select($"q_id", $"vec_id")
    // exact fixed-point dot-product top-10 (the MIPS ground truth the
    // ADC scores approximate — identical at full codebook)
    val qs = fp.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"qv".as("qq"))
    val we = Window.partitionBy($"q_id").orderBy($"dot".desc, $"vec_id")
    val exactTop = fp.crossJoin(broadcast(qs))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        expr("aggregate(zip_with(qv, qq, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("dot"))
      .withColumn("rn", row_number().over(we))
      .filter($"rn" <= 10).select($"q_id", $"vec_id")
    // second ground truth: the exact COSINE top-10 (the
    // eval_ann_recall baseline) — norms shift the ranking, so this
    // column prices what PQ-over-inner-product loses against a
    // normalized retrieval stack
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val wc = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val cosTop = e.crossJoin(broadcast(qe))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(wc))
      .filter($"rn" <= 10).select($"q_id", $"vec_id")
    val nScored = adc.groupBy($"q_id").agg(count(lit(1)).as("n_scored"))
    val hits = pqTop.join(exactTop, Seq("q_id", "vec_id"))
      .groupBy($"q_id").agg(count(lit(1)).as("h"))
    val hitsCos = pqTop.join(cosTop, Seq("q_id", "vec_id"))
      .groupBy($"q_id").agg(count(lit(1)).as("hc"))
    nScored.join(hits, Seq("q_id"), "left")
      .join(hitsCos, Seq("q_id"), "left")
      .select($"q_id", $"n_scored", coalesce($"h", lit(0L)).as("hits"),
        coalesce($"hc", lit(0L)).as("hits_cos"))
      .withColumn("recall_fp", expr("(hits * 1048576) div 10"))
      .withColumn("recall_cos_fp", expr("(hits_cos * 1048576) div 10"))
      .orderBy($"q_id")
  }

  /** Raw-blob ingest through Spark's built-in `binaryFile` source — the
    * step every multimodal pipeline actually starts from: a directory of
    * opaque per-item files (images/audio dropped on an object store).
    * The staging layout is produced by DISTRIBUTED executor-side writes
    * (foreachPartition — no driver funnel, the shape of any media
    * scraper's output), one `doc_<id>.bin` per document; the graded read
    * goes through `format("binaryFile")`, parses the id from the
    * filename, and emits per-blob size + content hash — proving the
    * bytes survived the round trip against the ORIGINAL documents
    * oracle.
    *
    * Scale shape: binaryFile lists and reads files in parallel (one
    * task per file up to maxPartitionBytes packing); content bytes stay
    * on executors — the projection hashes them immediately and shuffles
    * 32-byte digests, never payloads. The id-from-filename parse is the
    * standard blob-store convention (key = id). At 100 TB this is the
    * ingest scan; the `pathGlobFilter`/`modifiedAfter` options binaryFile
    * supports are the incremental-crawl knobs (not exercised here). */
  def sourceBinaryfileIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobDir = Tables.scratch("blob_ingest")
    val src = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    def equivalent = src.select($"doc_id",
      octet_length($"payload").cast("long").as("n_bytes"),
      sha2($"payload", 256).as("content_sha"))
    graft.PlanOnly.roundTrip(equivalent) {
      val d = new java.io.File(blobDir)
      if (d.exists()) { // idempotent re-run: clear prior blobs
        Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      }
      d.mkdirs()
      src.as[(Long, Array[Byte])].foreachPartition {
        it: Iterator[(Long, Array[Byte])] =>
          it.foreach { case (id, bytes) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(blobDir, f"doc_$id%08d.bin"), bytes)
          }
      }
      spark.read.format("binaryFile").load(blobDir)
        .select(
          regexp_extract(element_at(split($"path", "/"), -1),
            "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
          $"length".as("n_bytes"),
          sha2($"content", 256).as("content_sha"))
    }
      .orderBy($"doc_id")
  }

  /** Closed-form linear-regression sufficient statistics per
    * (event_type, user_id) — value (·10⁴ fixed point) regressed on the
    * event's day index. This is THE distributed-ML training shape: the
    * model reduces to sums (n, Σx, Σy, Σx², Σxy) that partial-aggregate
    * map-side and merge associatively, so one pass over any event-log
    * size yields the exact global fit. The slope's numerator
    * (n·Σxy − Σx·Σy) and denominator (n·Σx² − (Σx)²) are emitted as
    * exact BIGINTs; the final division is deliberately left to the
    * caller — an IEEE quotient has no identical-doubles guarantee
    * across engines, while the sufficient statistics are exact.
    *
    * x is centered to days-since-corpus-start (inline scalar subquery,
    * the agg_time_decay_weighted pattern) — centering keeps every
    * product within BIGINT headroom at any realistic group size and is
    * the numerically-sane parameterization a production fit would use
    * anyway. */
  /** One ALTERNATING-LEAST-SQUARES round with rank-1 factors, graded —
    * the collaborative-filtering primitive (Koren/Bell/Volinsky's
    * matrix factorization, Zhou et al.'s ALS) at the dimensionality
    * where the normal equation is a plain ratio and stays EXACT: with
    * 1-D factors the per-user solve is u_c = Σ_p(r·v)/Σ_p(v²) and the
    * per-item solve is v_p = Σ_c(r·u)/Σ_c(u²) — both closed forms, no
    * matrix inverse, every sum an exact BIGINT. Ratings = summed
    * order quantity per (customer, part); item factors initialize from
    * the part's list price (a varying, data-derived start — an all-ones
    * init would degenerate the first half-step to a row mean); both
    * half-steps floor to 2²⁰ fixed point via integer division
    * (positive operands, so div == floor on both engines). The graded
    * frame is the per-part factor after the full round next to its
    * init, so the hash certifies BOTH half-steps (v1 is a function of
    * every u it touched).
    *
    * Scale shape: one (c, p) shuffle to build ratings, one c-keyed agg
    * for the user solve, one co-partitioned join back on c, one
    * p-keyed agg for the item solve — ALS's promise of O(obs) per
    * half-step, never a |C|×|P| matrix. */
  def mlAls1dStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ratings = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("c"), $"l_partkey".as("p"))
      .agg(sum($"l_quantity").cast("long").as("rt"))
    val v0 = Tables.part(spark, dir)
      .select($"p_partkey".as("p"),
        floor($"p_retailprice").cast("long").as("v0"))
    val u = ratings.join(v0, "p")
      .groupBy($"c")
      .agg(sum($"rt" * $"v0").as("srv"), sum($"v0" * $"v0").as("svv"))
      .select($"c",
        expr("(CAST(1048576 AS DECIMAL(38,0)) * srv) div svv").as("u"))
    val v1 = ratings.join(u, "c")
      .groupBy($"p")
      .agg(count(lit(1)).as("n_obs"),
        sum($"rt" * $"u").as("sru"), sum($"u" * $"u").as("suu"))
      .select($"p", $"n_obs",
        expr("(CAST(1048576 AS DECIMAL(38,0)) * sru) div suu").as("v1_fp"))
    v1.join(v0, "p")
      .select($"p".as("p_partkey"), $"n_obs", $"v0".as("v0_price"), $"v1_fp")
      .orderBy($"p_partkey")
  }

  /** ISOTONIC CALIBRATION, graded — the monotone probability-map fit
    * (sklearn's IsotonicRegression / Zadrozny–Elkan calibration) that
    * turns a classifier's raw score into a calibrated rate, computed
    * through the EXACT minimax closed form of weighted PAVA:
    * fit_i = max_{j≤i} min_{k≥i} wavg(j..k) (the pool-adjacent-
    * violators solution characterization — no sequential pooling
    * loop), with every interval's weighted average a truncating 2²⁰
    * fixed-point division of exact counts. Input = the
    * [[evalCalibrationBins]] reliability diagram (10 score deciles ×
    * is-English); output = each bin's raw positive rate next to its
    * isotonic fit, which a spec law pins MONOTONE — the property the
    * raw diagram lacks and the whole point of the fit.
    *
    * Scale shape: the corpus collapses map-side to 10 bin rows;
    * the minimax runs over ≤10³ interval triples of that tiny frame.
    * Mirrored Spark SQL ⟷ DuckDB SQL (`div` ⟷ `//`). */
  def mlIsotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(expr("(n_chars * 1048576) div 600").as("score_fp"),
        when($"lang" === "en", 1L).otherwise(0L).as("pos"))
      .select(expr("least((score_fp * 10) div 1048576, 9L)").as("bin"),
        $"pos")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"))
      .createOrReplaceTempView("iso_bins")
    spark.sql(isoSql("iso_bins", "div"))
  }

  /** Shared isotonic SQL over a (bin, n, n_pos) frame. */
  private[graft] def isoSql(bins: String, idiv: String): String =
    s"""WITH c AS (SELECT bin, n, n_pos,
       |    sum(n) OVER w AS cn, sum(n_pos) OVER w AS cp
       |  FROM $bins
       |  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)),
       |ivl AS (SELECT a.bin AS j, b.bin AS k,
       |    ((b.cp - a.cp + a.n_pos) * 1048576) $idiv
       |      (b.cn - a.cn + a.n) AS avg_fp
       |  FROM c a JOIN c b ON a.bin <= b.bin),
       |inner_min AS (SELECT i.bin AS i, ivl.j,
       |    min(ivl.avg_fp) AS min_avg
       |  FROM c i JOIN ivl ON ivl.j <= i.bin AND ivl.k >= i.bin
       |  GROUP BY 1, 2),
       |fit AS (SELECT i, CAST(max(min_avg) AS BIGINT) AS iso_rate_fp
       |  FROM inner_min GROUP BY i)
       |SELECT c.bin, CAST(c.n AS BIGINT) AS n,
       |  CAST(c.n_pos AS BIGINT) AS n_pos,
       |  CAST((c.n_pos * 1048576) $idiv c.n AS BIGINT) AS raw_rate_fp,
       |  fit.iso_rate_fp
       |FROM c JOIN fit ON c.bin = fit.i
       |ORDER BY c.bin""".stripMargin

  /** MATRYOSHKA TRUNCATION evaluation, graded — the measurement behind
    * MRL-style adaptive retrieval (Kusupati et al. 2022: embed once,
    * serve prefixes): for 20 query vectors, the exact top-10 under the
    * FULL 64-dim ranking sits next to a flag saying whether each hit
    * survives in the 16-dim-PREFIX top-10 — the recall@10 curve a
    * deployment reads before choosing its serving dimensionality.
    * Ranking is exact end to end: coordinates quantize at 2¹⁶ (the
    * products-need-headroom scale), scores are BIGINT dot products
    * normalized by ⌊√Σx²⌋ via truncating division (norm-adjusted
    * ranking — the query's own norm is constant per ranking and drops
    * out), ties broken by vec_id.
    *
    * Scale shape: one posexplode join against the broadcast 20×64
    * query frame, collapsed map-side to (query, candidate) partial
    * sums — both prefix and full sums in the SAME pass (conditional
    * aggregation), so the truncated ranking costs no second scan. */
  def embeddingMatryoshkaTrunc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val quant = Tables.embeddings(spark, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos0", "x")))
      .select($"vec_id", ($"pos0" + 1).cast("long").as("pos"),
        floor($"x".cast("double") * lit(65536.0)).cast("long").as("qx"))
    val qv = quant.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"pos", $"qx".as("qq"))
    val scored = graft.PlanOnly.cut(quant.join(broadcast(qv), "pos")
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"qq" * $"qx").as("s64"),
        sum(when($"pos" <= 16, $"qq" * $"qx").otherwise(0L)).as("s16"),
        sum($"qx" * $"qx").as("n64"),
        sum(when($"pos" <= 16, $"qx" * $"qx").otherwise(0L)).as("n16"))
      .select($"q_id", $"vec_id",
        expr("(s64 * 1048576) div " +
          "CAST(floor(sqrt(greatest(n64, 1))) AS BIGINT)").as("k64"),
        expr("(s16 * 1048576) div " +
          "CAST(floor(sqrt(greatest(n16, 1))) AS BIGINT)").as("k16")))
    val wF = Window.partitionBy($"q_id").orderBy($"k64".desc, $"vec_id")
    val wT = Window.partitionBy($"q_id").orderBy($"k16".desc, $"vec_id")
    val full10 = scored
      .withColumn("rn", row_number().over(wF).cast("long"))
      .filter($"rn" <= 10)
    val trunc10 = scored
      .withColumn("rn16", row_number().over(wT)).filter($"rn16" <= 10)
      .select($"q_id", $"vec_id", lit(1L).as("hit"))
    full10.join(trunc10, Seq("q_id", "vec_id"), "left")
      .select($"q_id", $"rn", $"vec_id".as("full_id"), $"k64".as("score_fp"),
        coalesce($"hit", lit(0L)).as("in_trunc_top10"))
      .orderBy($"q_id", $"rn")
  }

  /** Two BRADLEY–TERRY MM steps, graded — the pairwise-preference
    * strength model behind RLHF reward aggregation and arena-style
    * leaderboards (Zermelo 1929; Hunter's 2004 MM algorithm), EXACT:
    * matches = per-user head-to-heads between event types (the more
    * frequent type wins; ties are not decisive games, the standard BT
    * posture), and the minorize–maximize update
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j) runs twice from the uniform
    * start in pure 2²⁰ fixed point — every term
    * ⌊n_ij·2⁴⁰ div (P_i + P_j)⌋ and the outer ⌊W_i·2⁴⁰ div D_i⌋ are
    * truncating BIGINT divisions (identical both engines). Both
    * iterates emitted: the hash certifies the update CHAIN, and a
    * denominator of a later step consumes every earlier value, so one
    * wrong fixed point poisons the whole frame.
    *
    * Scale shape: the match grid is one (user) co-partitioned
    * self-join collapsed map-side to |types|² rows; each MM step joins
    * that tiny frame against the broadcast strength vector — O(pairs)
    * per step, never per-event work after the first aggregate. */
  def mlBradleyTerryStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val ca = c.select($"user_id", $"event_type".as("ta"), $"n".as("na"))
    val cb = c.select($"user_id", $"event_type".as("tb"), $"n".as("nb"))
    val m0 = ca.join(cb, "user_id").filter($"ta" < $"tb")
      .groupBy($"ta", $"tb")
      .agg(sum(when($"na" > $"nb", 1L).otherwise(0L)).as("wa"),
        sum(when($"nb" > $"na", 1L).otherwise(0L)).as("wb"))
    val sym = graft.PlanOnly.cut(
      m0.select($"ta".as("i"), $"tb".as("j"),
          ($"wa" + $"wb").as("nij"), $"wa".as("wij"))
        .unionByName(m0.select($"tb".as("i"), $"ta".as("j"),
          ($"wa" + $"wb").as("nij"), $"wb".as("wij"))))
    val tot = graft.PlanOnly.cut(sym.groupBy($"i")
      .agg(sum($"nij").as("games"), sum($"wij").as("wins")))
    def step(p: DataFrame): DataFrame = sym
      .join(broadcast(p.select($"i", $"p".as("pi"))), "i")
      .join(broadcast(p.select($"i".as("j"), $"p".as("pj"))), "j")
      .groupBy($"i")
      .agg(sum(expr("(nij * 1099511627776) div (pi + pj)")).as("d"))
      .join(broadcast(tot), "i")
      .select($"i", when($"d" === 0L, -1L)
        .otherwise(expr("(wins * 1099511627776) div d")).as("p"))
    // cut, not mark (r19, X6): step(q1) reads q1 through TWO broadcast
    // builds (pi and pj) and the final join probes it — three racers on
    // a lazy persist re-run the whole first iteration; the frame is
    // |event_type| rows, so the eager checkpoint is one tiny job
    val q1 = graft.PlanOnly.cut(step(tot.select($"i", lit(1048576L).as("p"))))
    val q2 = step(q1)
    tot.join(q1.select($"i", $"p".as("p1_fp")), "i")
      .join(q2.select($"i", $"p".as("p2_fp")), "i")
      .select($"i".as("event_type"), $"games", $"wins", $"p1_fp", $"p2_fp")
      .orderBy($"event_type")
  }

  /** Two GRADIENT-BOOSTING rounds of regression stumps, graded — the
    * Friedman (2001) GBM inner loop at the grain a distributed trainer
    * actually runs (XGBoost/LightGBM histogram mode: per-feature-value
    * sufficient statistics, prefix-sum split scan, argmax split, leaf
    * = mean residual), computed EXACTLY: price cents as BIGINT, the
    * split objective sL²/nL + sR²/nR as truncating integer division of
    * DECIMAL(38,0) squares (sums reach 10²⁵ — past BIGINT, inside
    * decimal128 on both engines), leaf values as truncating division
    * of signed residual sums (both engines truncate toward zero —
    * the round-10 measurement in the determinism playbook), and the
    * SSE receipts sse_before/sse_after per round proving the boost
    * monotonically improves (the law a wrong split election would
    * break). Round 1 boosts on quantity, round 2 on the discount
    * percentage over round 1's residuals — a real additive-model
    * chain, so the hash certifies election AND residual update.
    *
    * Scale shape: each round is one map-side-combinable groupBy on the
    * feature's value domain (≤ |distinct values| rows — the histogram
    * trick), prefix sums over that tiny frame, and one scalar-
    * decorated residual projection; the raw table is never shuffled.
    * Mirrored Spark SQL ⟷ DuckDB SQL (`div` ⟷ `//`). */
  def mlGbdtStumpBoost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 1-row frames join in via broadcast CROSS JOIN (the house scalar-
    // injection pattern) — Spark 4 cannot codegen scalar-subquery refs
    // in these window/CASE positions (INTERNAL_ERROR, measured r13).
    // r15: the residual frames b1/b2 are CACHE-MARKED — as inlined SQL
    // CTEs each of their 2–3 consumers (histogram, next round, SSE
    // audits) re-scanned the fact table and re-ran the residual chain;
    // marked, the fact table is read once per boosting round, the
    // data-parallel GBM shape a distributed trainer actually runs.
    val base = Tables.lineitem(spark, dir).select(
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("y"),
      expr("CAST(l_quantity AS BIGINT)").as("f1"),
      expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("f2"))
    val g0 = base.agg(expr("sum(y) div count(*)").as("p0"))
    val b1 = graft.PlanOnly.cut(base.crossJoin(broadcast(g0))
      .select($"f1", $"f2", ($"y" - $"p0").as("r1")))
    // one histogram-split election: value-domain aggregate, prefix
    // sums over the tiny value frame, cleared-denominator objective,
    // (score DESC, v) top-1 via TakeOrdered
    def stump(bx: DataFrame, f: String, r: String): DataFrame = {
      val ax = bx.groupBy(col(f).as("v"))
        .agg(count(lit(1)).as("nv"), sum(col(r)).cast("long").as("sv"))
      val tot = ax.agg(sum($"nv").as("nt"), sum($"sv").as("st"))
      val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
      ax.select($"v", sum($"nv").over(w).as("nl"), sum($"sv").over(w).as("sl"))
        .crossJoin(broadcast(tot))
        .filter($"nt" - $"nl" > 0)
        .select($"v", $"nl", $"sl",
          ($"nt" - $"nl").as("nr"), ($"st" - $"sl").as("sr"),
          expr("(CAST(sl AS DECIMAL(38,0)) * CAST(sl AS DECIMAL(38,0))) " +
            "div nl + (CAST(st - sl AS DECIMAL(38,0)) " +
            "* CAST(st - sl AS DECIMAL(38,0))) div (nt - nl)").as("score"))
        .orderBy($"score".desc, $"v").limit(1)
    }
    val w1 = stump(b1, "f1", "r1")
      .select($"v".as("t1"), $"nl".as("nl1"), $"nr".as("nr1"),
        expr("sl div nl").as("wl1"), expr("sr div nr").as("wr1"))
    val b2 = graft.PlanOnly.cut(b1.crossJoin(broadcast(w1))
      .select($"f2", $"r1",
        ($"r1" - when($"f1" <= $"t1", $"wl1").otherwise($"wr1")).as("r2")))
    val w2 = stump(b2, "f2", "r2")
      .select($"v".as("t2"), $"nl".as("nl2"), $"nr".as("nr2"),
        expr("sl div nl").as("wl2"), expr("sr div nr").as("wr2"))
    val sse = b2.agg(
      expr("sum(CAST(r1 AS DECIMAL(38,0)) * CAST(r1 AS DECIMAL(38,0))) " +
        "div 1000000").as("sse0"),
      expr("sum(CAST(r2 AS DECIMAL(38,0)) * CAST(r2 AS DECIMAL(38,0))) " +
        "div 1000000").as("sse1"))
    val sse3 = b2.crossJoin(broadcast(w2))
      .select(($"r2" - when($"f2" <= $"t2", $"wl2").otherwise($"wr2"))
        .as("r3"))
      .agg(expr("sum(CAST(r3 AS DECIMAL(38,0)) * CAST(r3 AS DECIMAL(38,0))) " +
        "div 1000000").as("sse2"))
    val row1 = w1.crossJoin(broadcast(sse)).select(
      lit(1L).as("round"), lit("l_quantity").as("feature"),
      $"t1".as("threshold"), $"nl1".as("n_left"), $"nr1".as("n_right"),
      $"wl1".as("w_left"), $"wr1".as("w_right"),
      $"sse0".as("sse_before_m"), $"sse1".as("sse_after_m"))
    val row2 = w2.crossJoin(broadcast(sse)).crossJoin(broadcast(sse3)).select(
      lit(2L).as("round"), lit("l_discount_pct").as("feature"),
      $"t2".as("threshold"), $"nl2".as("n_left"), $"nr2".as("n_right"),
      $"wl2".as("w_left"), $"wr2".as("w_right"),
      $"sse1".as("sse_before_m"), $"sse2".as("sse_after_m"))
    row1.unionByName(row2).orderBy($"round")
  }

  def mlLinregSufficient(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"user_id", Tables.nsToUs($"ts").as("t"),
        (Tables.dec4($"value") * 10000).cast("long").as("v_fp"))
      .createOrReplaceTempView("linreg_ev")
    spark.sql(
      """WITH b AS (SELECT event_type, user_id,
        |    (t div 86400000000) -
        |      (SELECT min(t div 86400000000) FROM linreg_ev) AS x,
        |    v_fp
        |  FROM linreg_ev)
        |SELECT event_type, user_id, count(*) AS n,
        |  sum(x) AS sx, sum(v_fp) AS sy_fp,
        |  sum(x * x) AS sxx, sum(x * v_fp) AS sxy_fp,
        |  count(*) * sum(x * v_fp) - sum(x) * sum(v_fp) AS num_fp,
        |  count(*) * sum(x * x) - sum(x) * sum(x) AS den
        |FROM b GROUP BY event_type, user_id
        |ORDER BY event_type, user_id""".stripMargin)
  }

  /** CLOSED-FORM RIDGE REGRESSION via the normal equations — the
    * distributed linear-model training that needs exactly ONE
    * aggregation pass at any data size: per return flag, fit
    * y = β₁·quantity + β₂·(discount %) + β₀ on lineitem price cents by
    * solving (XᵀX + λI)β = Xᵀy with λ = 2¹⁶ (ridge on all three
    * coefficients, intercept included — the symmetric variant, which
    * keeps the system a pure function of the sufficient statistics).
    * The d(d+3)/2 = 9 sufficient sums are map-side combinable BIGINTs;
    * the 3×3 solve is Cramer's rule in DECIMAL(38,0) ⟷ HUGEINT —
    * λ > 0 makes XᵀX + λI positive definite, so det > 0 always and
    * each βᵢ = detᵢ/det renders through the repo's non-negative-shift
    * idiom: ⌊2²⁰·(detᵢ + 2²⁴·det)/det⌋ − 2⁴⁴ (βᵢ is provably inside
    * ±2²⁴ cents here; truncating division of non-negative operands is
    * engine-identical). ONE SQL text runs on both engines (`div` ⟷
    * `//`, DECIMAL(38,0) ⟷ HUGEINT).
    *
    * Scale shape: the fact table never shuffles more than the 9-sum
    * partial aggregate (the combiner IS the training step); the solve
    * is O(1) per group. Headroom: detᵢ·2²⁰ stays inside 38 digits to
    * n ≈ 10⁷ rows per group at these feature magnitudes; past that the
    * sums pre-scale (divide y by 100) before the solve. */
  def mlRidgeNormalEq(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("ridge_li")
    spark.sql(ridgeSql("ridge_li", "div", "DECIMAL(38,0)"))
  }

  /** Shared ridge SQL — `idiv` is `div` (Spark) or `//` (DuckDB),
    * `big` is DECIMAL(38,0) (Spark) or HUGEINT (DuckDB). */
  private[graft] def ridgeSql(tbl: String, idiv: String, big: String): String = {
    // β render: shift by 2²⁴·det so the dividend is non-negative
    // (det > 0 by positive definiteness), then un-shift 2²⁰·2²⁴ = 2⁴⁴
    def beta(deti: String, name: String) =
      s"CAST((1048576 * ($deti + 16777216 * det)) $idiv det " +
        s"- 17592186044416 AS BIGINT) AS $name"
    s"""WITH r AS (SELECT l_returnflag AS flag,
       |    CAST(l_quantity AS BIGINT) AS x1,
       |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS y
       |  FROM $tbl),
       |s AS (SELECT flag, count(*) AS n,
       |    CAST(sum(x1) AS $big) AS s1, CAST(sum(x2) AS $big) AS s2,
       |    CAST(sum(x1 * x1) AS $big) AS s11,
       |    CAST(sum(x2 * x2) AS $big) AS s22,
       |    CAST(sum(x1 * x2) AS $big) AS s12,
       |    CAST(sum(y) AS $big) AS b3,
       |    CAST(sum(x1 * y) AS $big) AS b1,
       |    CAST(sum(x2 * y) AS $big) AS b2
       |  FROM r GROUP BY flag),
       |a AS (SELECT flag, n,
       |    s11 + 65536 AS a11, s12 AS a12, s1 AS a13,
       |    s22 + 65536 AS a22, s2 AS a23,
       |    CAST(n AS $big) + 65536 AS a33, b1, b2, b3
       |  FROM s),
       |d AS (SELECT flag, n, b3,
       |    a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
       |      + a13 * (a12 * a23 - a22 * a13) AS det,
       |    b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3)
       |      + a13 * (b2 * a23 - a22 * b3) AS det1,
       |    a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13)
       |      + a13 * (a12 * b3 - b2 * a13) AS det2,
       |    a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13)
       |      + b1 * (a12 * a23 - a22 * a13) AS det3
       |  FROM a)
       |SELECT flag, CAST(n AS BIGINT) AS n,
       |  CAST(b3 AS BIGINT) AS sum_y_cents,
       |  ${beta("det1", "beta_qty_fp")},
       |  ${beta("det2", "beta_disc_fp")},
       |  ${beta("det3", "beta0_fp")}
       |FROM d ORDER BY flag""".stripMargin
  }

  /** Exact best-split election for a single-feature decision stump —
    * the inner loop of every distributed tree learner (XGBoost/LightGBM
    * histogram mode): label = "is this document English?", feature =
    * n_chars, and every distinct feature value is a candidate threshold
    * scored by weighted Gini impurity. The full threshold curve is the
    * output (one row per candidate split, the histogram a tree trainer
    * materializes), with the elected stump flagged.
    *
    * Arithmetic is exact end to end: per-side impurity numerator
    * n² − pos² − neg² = 2·pos·neg, so the weighted score is
    * (2·posL·negL·nR + 2·posR·negR·nL)·2²⁰ div (nL·nR) — one truncating
    * integer division per candidate (cross-engine exact), no doubles.
    * Headroom: |docs| ≤ ~30k before the ·2²⁰ product nears 2⁶³; a
    * larger corpus drops the shift or widens to DECIMAL.
    *
    * Scale shape: the corpus scan collapses to the per-distinct-value
    * histogram (|thresholds| rows, here ≤313) BEFORE any window — the
    * cumulative split counts and the argmin election run on that tiny
    * aggregated frame, never on row-grain data. That is exactly how the
    * histogram-based learners stay one-pass at any data size. */
  def mlDecisionStump(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .groupBy($"n_chars".as("threshold"))
      .agg(count(lit(1)).as("cnt"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"))
    val tot = hist.agg(sum($"cnt").as("n_tot"), sum($"pos").as("pos_tot"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy($"threshold")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val curve = hist.crossJoin(broadcast(tot))
      .select($"threshold",
        sum($"cnt").over(wCum).as("n_left"),
        sum($"pos").over(wCum).as("pos_left"),
        $"n_tot", $"pos_tot")
      .filter($"n_left" < $"n_tot") // the max value splits nothing off
      .select($"threshold", $"n_left", $"pos_left",
        ($"n_tot" - $"n_left").as("n_right"),
        ($"pos_tot" - $"pos_left").as("pos_right"),
        (($"pos_left" * ($"n_left" - $"pos_left") * ($"n_tot" - $"n_left") +
          ($"pos_tot" - $"pos_left") *
            (($"n_tot" - $"n_left") - ($"pos_tot" - $"pos_left")) * $"n_left")
          * lit(2097152L)).as("num"))
      .select($"threshold", $"n_left", $"pos_left", $"n_right", $"pos_right",
        expr("num div (n_left * n_right)").as("gini_fp"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    curve
      .withColumn("best", min(struct($"gini_fp", $"threshold")).over(wAll))
      .select($"threshold", $"n_left", $"pos_left", $"n_right", $"pos_right",
        $"gini_fp",
        when($"gini_fp" === $"best.gini_fp" &&
          $"threshold" === $"best.threshold", 1L).otherwise(0L).as("is_best"))
      .orderBy($"threshold")
  }

  /** Exact ROC-AUC per document source via the Mann–Whitney U statistic
    * — the ranking-quality number every classifier eval reports, here
    * computed WITHOUT materializing the pos×neg pair grid: group by
    * distinct score, one cumulative window over the per-source score
    * histogram, then U·2 = Σ_s pos(s)·(2·negs_below(s) + neg(s)) — ties
    * get the standard half credit, and keeping 2U instead of U keeps
    * everything integer. auc_fp = 2U·2²⁰ div (2·n_pos·n_neg) is the one
    * truncating division; sources missing a class emit the −1 sentinel.
    *
    * Label = (lang = 'en'), score = n_chars — a deliberately crude
    * "longer is more English" ranker; the graded part is the exact
    * U-statistic machinery. Scale shape: row-grain data collapses to
    * per-(source, score) counts before the window, so the sort touches
    * |sources|·|distinct scores| rows, never the corpus. */
  def evalAucExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .groupBy(coalesce($"source", lit("(none)")).as("source"),
        $"n_chars".as("score"))
      .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
        sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
      .withColumn("neg_below", coalesce(sum($"neg").over(w), lit(0L)))
      .groupBy($"source")
      .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * ($"neg_below" * 2 + $"neg")).as("u2"))
      .select($"source", $"n_pos", $"n_neg", $"u2",
        when($"n_pos" === 0 || $"n_neg" === 0, -1L)
          .otherwise(expr("(u2 * 1048576) div (2 * n_pos * n_neg)"))
          .as("auc_fp"))
      .orderBy($"source")
  }

  /** Two POWER-ITERATION steps toward the top principal direction of
    * the embedding corpus (von Mises iteration over the uncentered
    * second-moment matrix — the PCA/spectral primitive behind
    * dimensionality choice and whitening): vectors quantize to
    * q = ⌊x·2¹⁶⌋ (the eval_ann_recall idiom), the 64×64 Gram
    * G = Σ q qᵀ accumulates exactly in BIGINT, and each iterate
    * v ← G·v re-normalizes by MAX-norm in 2²⁰ fixed point — one
    * truncating division per component, no square root needed (the
    * max-norm is the classic sqrt-free power-method scaling). Both
    * iterates are emitted next to G's diagonal so the hash certifies
    * the matvec chain; the second matvec's products ride
    * DECIMAL(38,0) ⟷ HUGEINT (g·v ≈ 10¹⁹ passes 2⁶³).
    *
    * Scale shape: the Gram is the one data-touching pass, built by
    * default as a per-partition mapPartitions FOLD (the MLlib
    * RowMatrix-Gramian design): each task accumulates one local
    * d(d+1)/2 BIGINT triangle and emits it ONCE, so the shuffle
    * carries |partitions|·d²/2 rows instead of |rows|·d²/2 — the
    * per-row explode alternative (`spark.graft.pca.gramFold = false`)
    * fans out 2080 rows per vector before the map-side combine and
    * measures ~2× slower at d = 64, sf0.1 (and d² worse at d = 512).
    * Identical exact sums either way (BIGINT addition is associative;
    * VectorOpsSpec pins bit-equality of the two paths), same oracle.
    * Headroom: |q| ≤ 2¹⁶ ⇒ per-partition partials stay under 2⁶³ to
    * ~2³⁰ rows/partition. Each matvec joins the 4096-cell G against a
    * broadcast 64-row vector. */
  def mlPcaPowerIter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-row UPPER-TRIANGLE outer product as ONE projection (the Gram
    // is symmetric — d(d+1)/2 products per row, not d²; mirrored AFTER
    // the aggregation on the 4096-cell frame, the triangle-count
    // mirror-after-agg pattern); no self-join, no fact-grain shuffle
    val quant = Tables.embeddings(spark, dir)
      .select(expr("transform(embedding, x -> CAST(floor(x * 65536) AS BIGINT))")
        .as("q"))
    val gramFold = spark.conf.getOption("spark.graft.pca.gramFold")
      .forall(_.toBoolean) // default ON — the MLlib-Gramian fold
    val cells =
      if (!gramFold)
        quant.select(explode(expr(
          "flatten(transform(q, (qi, i) -> transform(slice(q, i + 1, size(q)), " +
            "(qj, j0) -> named_struct('i', i, 'j', i + j0, 'p', qi * qj))))"))
          .as("c"))
          .select($"c.i".as("i"), $"c.j".as("j"), $"c.p".as("p"))
      else quant.as[Array[Long]].mapPartitions { it =>
        // the documented large-d path: one local triangle per task,
        // emitted once — rows × d² multiplies, |partitions| × d² rows
        var acc: Array[Long] = null
        var d = 0
        it.foreach { q =>
          if (acc == null) { d = q.length; acc = new Array[Long](d * (d + 1) / 2) }
          var i = 0; var k = 0
          while (i < d) {
            val qi = q(i); var j = i
            while (j < d) { acc(k) += qi * q(j); k += 1; j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          var i = 0; var k0 = 0
          val out = Array.newBuilder[(Int, Int, Long)]
          out.sizeHint(acc.length)
          while (i < d) {
            var j = i
            while (j < d) { out += ((i, j, acc(k0))); k0 += 1; j += 1 }
            i += 1
          }
          out.result().iterator
        }
      }.toDF("i", "j", "p")
    val gU = cells.groupBy($"i", $"j").agg(sum($"p").as("g"))
    val g = graft.PlanOnly.cut(
      gU.unionAll(gU.filter($"i" =!= $"j")
        .select($"j".as("i"), $"i".as("j"), $"g")))
    // v0 = 1⃗ : first matvec is the row sum; max-norm renormalize
    val v1 = g.groupBy($"i").agg(sum($"g").as("v"))
    val m1 = v1.agg(max(abs($"v")).as("m"))
    val v1n = v1.crossJoin(broadcast(m1))
      .select($"i", expr("(CAST(v AS DECIMAL(38,0)) * 1048576) div m").as("vn"))
    val v2 = g.join(broadcast(v1n.withColumnRenamed("i", "j")), Seq("j"))
      .groupBy($"i")
      .agg(sum(expr("CAST(g AS DECIMAL(38,0)) * vn")).as("v"))
    val m2 = v2.agg(max(abs($"v")).as("m"))
    val v2n = v2.crossJoin(broadcast(m2))
      .select($"i", expr("CAST((v * 1048576) div m AS BIGINT)").as("vn2"))
    g.filter($"i" === $"j")
      .select($"i".cast("long").as("dim"), $"g".as("g_diag"))
      .join(v1n.select($"i".cast("long").as("dim"), $"vn".as("v1_fp")), Seq("dim"))
      .join(v2n.select($"i".cast("long").as("dim"), $"vn2".as("v2_fp")), Seq("dim"))
      .orderBy($"dim")
  }

  /** Two BATCH-PERCEPTRON steps (Rosenblatt 1958) on a linear
    * language-ID classifier — the distributed-training inner loop at
    * the dimensionality where every quantity stays an exact integer:
    * features x = (n_chars, n_tokens, 1), label y = ±1 (lang = 'en'),
    * w₀ = 0. Each step aggregates Σ y·x over the CURRENTLY
    * misclassified rows (margin y·(w·x) ≤ 0 — at w₀ that is everyone,
    * the classic first step) and adds it to w. No division, no
    * learning-rate float — the perceptron update is pure integer
    * sums, so the chain is cross-engine exact and BOTH iterates are
    * emitted (the ml_bradley_terry_step posture: grade the update
    * CHAIN, not one state).
    *
    * Scale shape: each step is ONE map-side-combinable aggregate over
    * the corpus with the previous w broadcast (a 1-row scalar
    * injection) — the data-parallel gradient shape every distributed
    * trainer runs; nothing entity-grain ever shuffles. */
  def mlPerceptronStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = Tables.documents(spark, dir)
      .select($"doc_id",
        when($"lang" === "en", 1L).otherwise(-1L).as("y"),
        $"n_chars".as("x1"),
        expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 " +
          "AS BIGINT)").as("x2"))
    // step 1: w = 0 — every margin is 0 ≤ 0, all rows update
    val s1 = f.agg(count(lit(1)).as("n_mis"),
      sum($"y" * $"x1").as("w_chars"), sum($"y" * $"x2").as("w_tokens"),
      sum($"y").as("bias"))
    val s2 = f.crossJoin(broadcast(s1.select($"w_chars".as("pw1"),
        $"w_tokens".as("pw2"), $"bias".as("pb"))))
      .withColumn("mis",
        when($"y" * ($"pw1" * $"x1" + $"pw2" * $"x2" + $"pb") <= 0, 1L)
          .otherwise(0L))
      .agg(sum($"mis").as("n_mis"),
        (max($"pw1") + coalesce(sum(when($"mis" === 1, $"y" * $"x1")), lit(0L)))
          .as("w_chars"),
        (max($"pw2") + coalesce(sum(when($"mis" === 1, $"y" * $"x2")), lit(0L)))
          .as("w_tokens"),
        (max($"pb") + coalesce(sum(when($"mis" === 1, $"y")), lit(0L)))
          .as("bias"))
    s1.select(lit(1L).as("step"), $"n_mis", $"w_chars", $"w_tokens", $"bias")
      .unionAll(s2.select(lit(2L).as("step"), $"n_mis", $"w_chars",
        $"w_tokens", $"bias"))
      .orderBy($"step")
  }

  /** Exact AVERAGE PRECISION per document source — the PR-curve summary
    * reported next to ROC-AUC ([[evalAucExact]]: AUC prices pairwise
    * ranking, AP weights the head of the list the way retrieval users
    * experience it). Same crude ranker (score = n_chars, label =
    * lang = 'en'); documents rank by (score DESC, doc_id) — a TOTAL
    * order, so ties cost determinism nothing — and AP is the mean of
    * precision@k over the positive ranks. Each precision@k is one
    * truncating division pos_cum·2²⁰ div k and AP their truncating
    * mean — the floor-mean fixed-point contract both engines replay
    * verbatim (the quality_bigram_coherence posture). Sources with no
    * positive emit the −1 sentinel.
    *
    * Scale shape: ranking is a per-source window at document grain —
    * the eval-frame shape (rankings are per-source/per-query bounded,
    * never corpus-global); the per-positive terms collapse map-side to
    * one row per source before the final join onto the source census. */
  def evalAveragePrecision(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d0 = Tables.documents(spark, dir)
      .select(coalesce($"source", lit("(none)")).as("source"), $"doc_id",
        $"n_chars", when($"lang" === "en", 1L).otherwise(0L).as("pos"))
    val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
    val terms = d0
      .withColumn("k", row_number().over(w))
      .withColumn("pos_cum", sum($"pos").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"pos" === 1)
      .groupBy($"source")
      .agg(sum(expr("(pos_cum * 1048576) div k")).as("sp"))
    d0.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"pos").as("n_pos"))
      .join(terms, Seq("source"), "left")
      .select($"source", $"n_docs", $"n_pos",
        when($"n_pos" === 0, -1L)
          .otherwise(expr("sp div n_pos")).as("ap_fp"))
      .orderBy($"source")
  }

  /** k-NN classification over the embedding corpus — the label-vote
    * consumer of the cosine top-k machinery: every 50th vector is a
    * query, its 5 nearest neighbors (by the native codegen'd
    * cosine_similarity, rounded to 6 — bit-identical across engines)
    * vote on its label, majority wins with (votes desc, label asc)
    * tie-break. Emits the true label alongside the prediction — the
    * leave-one-out eval frame an embedding-quality dashboard reports
    * accuracy from.
    *
    * Scale shape: the query set is a constant-fraction broadcast (the
    * simsearch_cosine_topk posture); candidate scoring fans out
    * per-query, top-5 is a per-query window, and the vote collapses to
    * ≤|queries|·|labels| rows before the final argmax window. The 100 TB
    * path swaps the brute-force candidate set for the IVF/LSH-bucketed
    * one without touching the vote. */
  def mlKnnClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"label".as("tl"), $"embedding".as("qe"))
    val wTop = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val wVote = Window.partitionBy($"q_id").orderBy($"v".desc, $"label")
    e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"tl", $"vec_id", $"label",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"))
      .withColumn("rn", row_number().over(wTop))
      .filter($"rn" <= 5)
      .groupBy($"q_id", $"tl", $"label")
      .agg(count(lit(1)).as("v"))
      .withColumn("vr", row_number().over(wVote))
      .filter($"vr" === 1)
      .select($"q_id", $"tl".cast("long").as("true_label"),
        $"label".cast("long").as("pred_label"), $"v".as("n_votes"))
      .orderBy($"q_id")
  }

  /** Calibration (reliability-diagram) bins for a scored classifier —
    * the companion to [[evalAucExact]]: AUC prices RANKING, calibration
    * prices the scores themselves. The deterministic pseudo-probability
    * score_fp = (n_chars·2²⁰) div 600 (corpus lengths < 600) is binned
    * into deciles; per bin the report emits n, Σscore (exact BIGINT),
    * positives, and the observed positive rate in 2²⁰ fixed point —
    * the exact sufficient statistics of ECE (the final weighted-gap sum
    * is one more integer pass for the caller). Empty deciles are simply
    * absent (both engines agree).
    *
    * Scale shape: a pure projection then ONE map-side-combinable
    * 10-row aggregate — the cheapest possible eval pass. */
  def evalCalibrationBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(expr("(n_chars * 1048576) div 600").as("score_fp"),
        when($"lang" === "en", 1L).otherwise(0L).as("pos"))
      // a regenerated fixture with n_chars ≥ 600 would otherwise open
      // an out-of-decile bin 10 — clamp keeps the diagram a diagram
      .select(expr("least((score_fp * 10) div 1048576, 9L)").as("bin"),
        $"score_fp", $"pos")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"score_fp").as("sum_score_fp"),
        sum($"pos").as("n_pos"))
      .select($"bin", $"n", $"sum_score_fp", $"n_pos",
        expr("(n_pos * 1048576) div n").as("pos_rate_fp"))
      .orderBy($"bin")
  }

  /** Mean-reciprocal-rank eval of the exact cosine retrieval against
    * the label column — the third leg of the retrieval-eval stool
    * (ranking = [[evalAucExact]], set overlap = eval_ranking_metrics /
    * eval_ann_recall, first-hit position = MRR): per query (vec_id <
    * 5), the rank of the FIRST same-label neighbor in the exact top-10
    * and its reciprocal ⌊2²⁰/rank⌋ (one truncating division — no IEEE
    * mean; the corpus MRR is Σrr_fp div n for the caller). Queries
    * whose top-10 contains no same-label neighbor emit rank −1 /
    * rr 0 — the miss is data, not an absent row.
    *
    * Scale shape: the scored candidate frame is the cosine_topk chain
    * verbatim (constant query broadcast); first-hit election is a
    * min-aggregate over ≤10 rows per query. */
  def evalMrrFixed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.registerAll(spark)
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("ql"), $"embedding".as("qe"))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"ql", $"label",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("score"),
        $"vec_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .groupBy($"q_id")
      .agg(max($"ql").cast("long").as("label"),
        coalesce(min(when($"label" === $"ql", $"rn")), lit(-1L))
          .cast("long").as("first_match_rank"))
      .select($"q_id", $"label", $"first_match_rank",
        when($"first_match_rank" === -1L, 0L)
          .otherwise(expr("1048576 div first_match_rank")).as("rr_fp"))
      .orderBy($"q_id")
  }

  /** Chunk–frame alignment — the cross-modal join every
    * caption/transcript pipeline performs: the k-th text chunk
    * ([[LlmOps.textChunkOverlap]], 32-token windows at stride 24) is
    * paired with the k-th sampled frame ([[multimodalFrameSample]],
    * every 4th 64-byte frame), giving the (text window, media window)
    * training pairs a contrastive aligner consumes. Ordinal = chunk_idx
    * on the text side, (fidx−1) div 4 on the media side; documents
    * where one modality runs longer simply stop pairing (inner join —
    * the unmatched tail is a different dataset, not a NULL).
    *
    * Scale shape: both sides collapse to (doc_id, ordinal) keyed frames
    * and the alignment is ONE equi-join on that composite key — the
    * pairing never explodes beyond min(chunks, frames) per doc. */
  def multimodalAlignChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = LlmOps.textChunkOverlap(spark, dir)
      .select($"doc_id", $"chunk_idx".as("ord"), $"n_tok")
    val frames = multimodalFrameSample(spark, dir)
      .select($"doc_id", expr("(fidx - 1) div 4").as("ord"),
        $"frame_len", $"frame_sha")
    chunks.join(frames, Seq("doc_id", "ord"))
      .select($"doc_id", $"ord", $"n_tok", $"frame_len", $"frame_sha")
      .orderBy($"doc_id", $"ord")
  }

  /** Deterministic triplet mining for contrastive embedding training —
    * per anchor vector, one positive (same label) and one negative
    * (different label), selected by a REPRODUCIBLE pseudo-random order
    * (h = id·2654435761 mod 2³¹, the corpus_shard_manifest LCG posture —
    * no RNG, so the epoch's triplets are replayable). Anchors whose
    * label has no second member emit pos −1.
    *
    * Scale shape: NO anchor×candidate pair grid — the (h, id) order is
    * global per label, so the per-label TOP-2 (window over ≤|labels|
    * partitions) answers every anchor's positive, and the 2-row
    * best/second-best across label minima answers every negative; both
    * election frames broadcast. */
  def mlTripletMining(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        expr("(vec_id * 2654435761L) % 2147483648L").as("h"))
    val wLab = Window.partitionBy($"label").orderBy($"h", $"vec_id")
    val top2 = e.withColumn("rn", row_number().over(wLab))
      .filter($"rn" <= 2)
      .select($"label".as("p_label"), $"rn", $"vec_id".as("p_id"))
    val labelMin = top2.filter($"rn" === 1)
      .select($"p_label".as("m_label"), $"p_id".as("m_id"))
      .join(e.select($"vec_id".as("m_id"), $"h".as("m_h")), "m_id")
    val wAll = Window.orderBy($"m_h", $"m_id")
    val best2 = labelMin.withColumn("gr", row_number().over(wAll))
      .filter($"gr" <= 2)
    val p1 = top2.filter($"rn" === 1)
      .select($"p_label", $"p_id".as("p1_id"))
    val p2 = top2.filter($"rn" === 2)
      .select($"p_label", $"p_id".as("p2_id"))
    val n1 = best2.filter($"gr" === 1)
      .select($"m_label".as("n1_label"), $"m_id".as("n1_id"))
    val n2 = best2.filter($"gr" === 2)
      .select($"m_label".as("n2_label"), $"m_id".as("n2_id"))
    e.join(broadcast(p1), $"label" === $"p_label")
      .join(broadcast(p2.withColumnRenamed("p_label", "p_label2")),
        $"label" === $"p_label2", "left")
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select($"vec_id", $"label".cast("long").as("label"),
        when($"p1_id" =!= $"vec_id", $"p1_id")
          .otherwise(coalesce($"p2_id", lit(-1L))).as("pos_id"),
        when($"n1_label" =!= $"label", $"n1_id")
          .otherwise($"n2_id").as("neg_id"))
      .orderBy($"vec_id")
  }

  /** Confusion matrix of the k-NN classifier — [[mlKnnClassify]] graded
    * against its own riding true labels, the same
    * grade-one-operator-with-another loop as quality_langid_confusion:
    * per (true, predicted) cell the count, plus the within-row share in
    * 2²⁰ fixed point. The diagonal IS the per-class recall of the
    * embedding space under leave-one-out 5-NN — the number an
    * embedding-quality dashboard actually tracks.
    *
    * Scale shape: everything after the knn chain is a ≤|labels|² cell
    * aggregate + one row-total window over that tiny frame. */
  def mlKnnConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    mlKnnClassify(spark, dir)
      .groupBy($"true_label", $"pred_label")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"true_label")))
      .select($"true_label", $"pred_label", $"n", $"row_total",
        expr("(n * 1048576) div row_total").as("share_fp"))
      .orderBy($"true_label", $"pred_label")
  }

  /** Inverse-frequency class weights — the one-table fix every
    * imbalanced-training run applies: per label, w = N/(k·n_c) in 2²⁰
    * fixed point (balanced classes weigh 2²⁰; a class half as frequent
    * weighs double). Emitted alongside the raw counts so the loss
    * weighting is auditable.
    *
    * Scale shape: one map-side |labels|-row aggregate; N and k come
    * from windows over that tiny frame. */
  def mlClassBalanceWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.embeddings(spark, dir)
      .groupBy($"label".cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum($"n").over(Window.partitionBy()))
      .withColumn("k", count(lit(1)).over(Window.partitionBy()))
      .select($"label", $"n", $"n_total",
        expr("(n_total * 1048576) div (k * n)").as("weight_fp"))
      .orderBy($"label")
  }

  /** Exact expected calibration error — the one-number summary of
    * [[evalCalibrationBins]], computed WITHOUT any intermediate
    * division: per bin, |accuracy − confidence|·n·2²⁰ =
    * |n_pos·2²⁰ − Σscore_fp| EXACTLY (both cross-products clear the
    * same n denominator), so ECE·2²⁰ = (Σ_b |n_pos_b·2²⁰ − Σscore_b|)
    * div N with one final truncating division. Emits the bin count and
    * the exact numerator alongside, so the summary is auditable against
    * the bins key.
    *
    * Scale shape: the calibration-bin aggregate (10 rows) followed by
    * a 1-row fold — nothing beyond the bins key's own cost. */
  def evalEceExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    evalCalibrationBins(spark, dir)
      .agg(count(lit(1)).as("n_bins"), sum($"n").as("n_total"),
        sum(abs($"n_pos" * 1048576L - $"sum_score_fp")).as("ece_num"))
      .select($"n_bins", $"n_total", $"ece_num",
        expr("ece_num div n_total").as("ece_fp"))
      .orderBy($"n_bins")
  }

  val queries: Map[String, QueryFn] = Map(
    "eval_ece_exact" -> (evalEceExact(_, _)),
    "ml_class_balance_weights" -> (mlClassBalanceWeights(_, _)),
    "ml_knn_confusion" -> (mlKnnConfusion(_, _)),
    "multimodal_align_chunks" -> (multimodalAlignChunks(_, _)),
    "ml_triplet_mining" -> (mlTripletMining(_, _)),
    "eval_mrr_fixed" -> (evalMrrFixed(_, _)),
    "eval_calibration_bins" -> (evalCalibrationBins(_, _)),
    "ml_knn_classify" -> (mlKnnClassify(_, _)),
    "ml_decision_stump" -> (mlDecisionStump(_, _)),
    "eval_auc_exact" -> (evalAucExact(_, _)),
    "eval_average_precision" -> (evalAveragePrecision(_, _)),
    "ml_perceptron_step" -> (mlPerceptronStep(_, _)),
    "ml_pca_power_iter" -> (mlPcaPowerIter(_, _)),
    "simsearch_graph_greedy" -> (simsearchGraphGreedy(_, _)),
    "simsearch_hnsw_layers" -> (simsearchHnswLayers(_, _)),
    "simsearch_hnsw_serve" -> (simsearchHnswServe(_, _)),
    "simsearch_hnsw_maintain" -> (simsearchHnswMaintain(_, _)),
    "ml_kmeans_pp_seed" -> (mlKmeansPpSeed(_, _)),
    "ml_linreg_sufficient" -> (mlLinregSufficient(_, _)),
    "ml_ridge_normal_eq" -> (mlRidgeNormalEq(_, _)),
    "ml_als_1d_step" -> (mlAls1dStep(_, _)),
    "ml_gbdt_stump_boost" -> (mlGbdtStumpBoost(_, _)),
    "ml_bradley_terry_step" -> (mlBradleyTerryStep(_, _)),
    "embedding_matryoshka_trunc" -> (embeddingMatryoshkaTrunc(_, _)),
    "ml_isotonic_calibration" -> (mlIsotonicCalibration(_, _)),
    "source_binaryfile_ingest" -> (sourceBinaryfileIngest(_, _)),
    "eval_ann_recall" -> (evalAnnRecall(_, _)),
    "embedding_pq_quantize" -> (embeddingPqQuantize(_, _)),
    "simsearch_pq_topk" -> (simsearchPqTopk(_, _)),
    "simsearch_ivf_pq" -> (simsearchIvfPq(_, _)),
    "simsearch_index_serve" -> (simsearchIndexServe(_, _)),
    "simsearch_index_maintain" -> (simsearchIndexMaintain(_, _)),
    "ml_confusion_matrix" -> (mlConfusionMatrix(_, _)),
    "eval_ranking_metrics" -> (evalRankingMetrics(_, _)),
    "dedup_semantic_cluster" -> (dedupSemanticCluster(_, _)),
    "ml_kmeans_step" -> (mlKmeansStep(_, _)),
    "multimodal_binary_meta" -> (multimodalBinaryMeta(_, _)),
    "multimodal_decode_stub" -> (multimodalDecodeStub(_, _)),
    "multimodal_resize_stub" -> (multimodalResizeStub(_, _)),
    "multimodal_frame_sample" -> (multimodalFrameSample(_, _)),
    "simsearch_ann_ivf" -> (simsearchAnnIvf(_, _)),
    "simsearch_lsh_bucket" -> (simsearchLshBucket(_, _)),
    "simsearch_lsh_replayable" -> (simsearchLshReplayable(_, _))
  )

  /** DuckDB replay of [[mlKmeansPpSeed]] — the 3 election rounds
    * unrolled from one generator. Distances run as double
    * dot-products over the 2²⁰-packed coordinates: every term stays
    * under 2⁵³, so the doubles are EXACT and the BIGINT cast equals
    * Spark's integer zip_with fold. */
  private def kmeansPpOracle: String = {
    def dist(qc: String, cc: String) =
      s"(list_dot_product($qc, $qc) + list_dot_product($cc, $cc) " +
        s"- 2 * list_dot_product($qc, $cc))"
    def round(t: Int): String = {
      val prev = if (t == 2) "ch1" else s"ch${t - 1}"
      s"""pk$t AS (SELECT vec_id, CAST(dm AS BIGINT) AS dm FROM (
         |    SELECT q.vec_id, min(${dist("q.qd", "c.cv")}) AS dm
         |    FROM qd q CROSS JOIN $prev c GROUP BY q.vec_id)
         |  ORDER BY dm DESC, vec_id LIMIT 1),
         |ch$t AS (SELECT cid, cv FROM $prev
         |  UNION ALL SELECT q.vec_id, q.qd FROM qd q
         |  WHERE q.vec_id = (SELECT vec_id FROM pk$t))""".stripMargin
    }
    s"""WITH qd AS (SELECT vec_id,
       |    CAST(list_transform(embedding,
       |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS DOUBLE[]) AS qd
       |  FROM embeddings),
       |ch1 AS (SELECT vec_id AS cid, qd AS cv FROM qd
       |  WHERE vec_id = (SELECT min(vec_id) FROM qd)),
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS step,
       |    (SELECT cid FROM ch1) AS vec_id,
       |    CAST(-1 AS BIGINT) AS d2_at_pick
       |  UNION ALL SELECT 2, vec_id, dm FROM pk2
       |  UNION ALL SELECT 3, vec_id, dm FROM pk3
       |  UNION ALL SELECT 4, vec_id, dm FROM pk4)
       |ORDER BY step""".stripMargin
  }

  /** DuckDB replay of [[simsearchHnswLayers]] — layer blocks generated
    * from ONE Scala source so the mods/k/hops can't drift. */
  /** The shared WITH-block prefix of the two HNSW oracles: candidate
    * block, the three layer-edge builds, query scores, entry point,
    * and the six-hop descent chain ending at h4b, plus the exact
    * argmax `ex`. [[hnswOracle]] appends the edge-recall receipt;
    * [[hnswServeOracle]] appends the stored-index censuses. */
  private def hnswOracleCommon: String = {
    val cos = (a: String, b: String) =>
      s"CAST(floor(round(list_dot_product($a, $b) / " +
        s"(sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b))), 6) * 1000000 + 0.5) AS BIGINT)"
    // ONE candidate block over the base layer; per-layer edges elect
    // among the cell-mate pairs whose BOTH endpoints are layer members
    // (the nested-layer shared-assignment build)
    val candBlock =
      s"""base_4 AS (SELECT vec_id AS b_id,
         |    CAST(embedding AS DOUBLE[]) AS be
         |  FROM embeddings WHERE vec_id % 4 = 0),
         |base_64 AS (SELECT vec_id AS b_id,
         |    CAST(embedding AS DOUBLE[]) AS be
         |  FROM embeddings WHERE vec_id % 64 = 0),
         |fp_4 AS (SELECT vec_id AS b_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
         |  FROM embeddings WHERE vec_id % 4 = 0),
         |seeds_4 AS (SELECT b_id AS cid, qv AS cq FROM fp_4
         |  ORDER BY b_id LIMIT 32),
         |asg_4 AS (SELECT b_id, cid FROM (
         |    SELECT f.b_id, s.cid, row_number() OVER (PARTITION BY f.b_id
         |        ORDER BY list_sum(list_transform(list_zip(f.qv, s.cq),
         |          t -> (t[1] - t[2]) * (t[1] - t[2]))) ASC, s.cid) AS rn
         |    FROM fp_4 f, seeds_4 s) WHERE rn <= 3),
         |cand_4 AS (SELECT DISTINCT a.b_id, b.b_id AS c_id
         |  FROM asg_4 a JOIN asg_4 b ON a.cid = b.cid
         |    AND a.b_id <> b.b_id)""".stripMargin
    def layerBuild(m: Int): String =
      s"""edges_$m AS (SELECT b_id AS src, c_id AS dst FROM (
         |    SELECT c.b_id, c.c_id,
         |      row_number() OVER (PARTITION BY c.b_id
         |        ORDER BY ${cos("x.be", "y.be")} DESC, c.c_id) AS rn
         |    FROM cand_4 c JOIN base_4 x ON c.b_id = x.b_id
         |      JOIN base_4 y ON c.c_id = y.b_id
         |    WHERE c.b_id % $m = 0 AND c.c_id % $m = 0)
         |  WHERE rn <= 4)""".stripMargin
    def twoHops(m: Int, seed: String): String =
      Seq(("a", seed), ("b", s"h${m}a")).map { case (tag, s) =>
        s"""c$m$tag AS (SELECT q_id, node FROM $s
           |  UNION ALL SELECT s.q_id, e.dst FROM $s s
           |  JOIN edges_$m e ON e.src = s.node),
           |h$m$tag AS (SELECT q_id, b_id AS node, s FROM (
           |    SELECT qsc.q_id, qsc.b_id, qsc.s,
           |      row_number() OVER (PARTITION BY qsc.q_id
           |        ORDER BY qsc.s DESC, qsc.b_id) AS rn
           |    FROM qscore qsc JOIN c$m$tag c ON qsc.q_id = c.q_id
           |      AND qsc.b_id = c.node) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
    s"""WITH $candBlock,
       |${layerBuild(64)},
       |${layerBuild(16)},
       |${layerBuild(4)},
       |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
       |qscore AS (SELECT q.q_id, b.b_id, ${cos("q.qe", "b.be")} AS s
       |  FROM qs q, base_4 b),
       |entry AS (SELECT min(b_id) AS e_id FROM base_64),
       |seed0 AS (SELECT q_id, (SELECT e_id FROM entry) AS node FROM qs),
       |entry_sc AS (SELECT q_id, b_id AS entry_id, s AS s_entry
       |  FROM qscore WHERE b_id = (SELECT e_id FROM entry)),
       |${twoHops(64, "seed0")},
       |${twoHops(16, "h64b")},
       |${twoHops(4, "h16b")},
       |ex AS (SELECT q_id, b_id AS best_id, s AS best_s FROM (
       |    SELECT q_id, b_id, s, row_number() OVER (PARTITION BY q_id
       |      ORDER BY s DESC, b_id) AS rn FROM qscore)
       |  WHERE rn = 1)""".stripMargin
  }

  private def hnswOracle: String = {
    val cos = (a: String, b: String) =>
      s"CAST(floor(round(list_dot_product($a, $b) / " +
        s"(sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b))), 6) * 1000000 + 0.5) AS BIGINT)"
    s"""$hnswOracleCommon,
       |audit AS (SELECT b_id AS a_id, be AS ae FROM base_4
       |  WHERE b_id % 40 = 0 AND b_id < 2000),
       |exedges AS (SELECT a_id, b_id FROM (
       |    SELECT a.a_id, b.b_id, row_number() OVER (PARTITION BY a.a_id
       |        ORDER BY ${cos("a.ae", "b.be")} DESC, b.b_id) AS rn
       |    FROM audit a JOIN base_4 b ON a.a_id <> b.b_id) WHERE rn <= 4),
       |rec AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN ed.src IS NOT NULL THEN 1
       |      ELSE 0 END), 0) AS BIGINT) AS edge_hits,
       |    CAST(count(*) AS BIGINT) AS edge_total
       |  FROM exedges x LEFT JOIN edges_4 ed
       |    ON ed.src = x.a_id AND ed.dst = x.b_id)
       |SELECT e0.q_id, e0.entry_id, e0.s_entry,
       |  h64b.node AS end_l2, h64b.s AS s_l2,
       |  h16b.node AS end_l1, h16b.s AS s_l1,
       |  h4b.node AS end_l0, h4b.s AS s_l0,
       |  ex.best_id, ex.best_s,
       |  CAST(CASE WHEN h4b.node = ex.best_id THEN 1 ELSE 0 END
       |    AS BIGINT) AS found,
       |  rec.edge_hits, rec.edge_total
       |FROM entry_sc e0
       |JOIN h64b ON e0.q_id = h64b.q_id
       |JOIN h16b ON e0.q_id = h16b.q_id
       |JOIN h4b ON e0.q_id = h4b.q_id
       |JOIN ex ON e0.q_id = ex.q_id, rec
       |ORDER BY e0.q_id""".stripMargin
  }

  /** The serve twin: the same build + descent re-derived from scratch,
    * with the per-layer edge censuses in place of the edge-recall
    * receipt — what certifies the committed index content. */
  private def hnswServeOracle: String =
    s"""$hnswOracleCommon,
       |cens AS (SELECT
       |    CAST((SELECT count(*) FROM edges_64) AS BIGINT) AS n_edges_l2,
       |    CAST((SELECT count(*) FROM edges_16) AS BIGINT) AS n_edges_l1,
       |    CAST((SELECT count(*) FROM edges_4) AS BIGINT) AS n_edges_l0)
       |SELECT e0.q_id, e0.entry_id, e0.s_entry,
       |  h64b.node AS end_l2, h64b.s AS s_l2,
       |  h16b.node AS end_l1, h16b.s AS s_l1,
       |  h4b.node AS end_l0, h4b.s AS s_l0,
       |  ex.best_id, ex.best_s,
       |  CAST(CASE WHEN h4b.node = ex.best_id THEN 1 ELSE 0 END
       |    AS BIGINT) AS found,
       |  cens.n_edges_l2, cens.n_edges_l1, cens.n_edges_l0
       |FROM entry_sc e0
       |JOIN h64b ON e0.q_id = h64b.q_id
       |JOIN h16b ON e0.q_id = h16b.q_id
       |JOIN h4b ON e0.q_id = h4b.q_id
       |JOIN ex ON e0.q_id = ex.q_id, cens
       |ORDER BY e0.q_id""".stripMargin

  /** The maintain twin: old-base (%8) build + stored-structure insert
    * (3-probe seed assignment, top-4 + backlinks) + descent over the
    * maintained edge set, all re-derived from scratch. */
  private def hnswMaintainOracle: String = {
    val cos = (a: String, b: String) =>
      s"CAST(floor(round(list_dot_product($a, $b) / " +
        s"(sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b))), 6) * 1000000 + 0.5) AS BIGINT)"
    def asg(name: String, fp: String): String =
      s"""$name AS (SELECT b_id, cid FROM (
         |    SELECT f.b_id, s.cid, row_number() OVER (PARTITION BY f.b_id
         |        ORDER BY list_sum(list_transform(list_zip(f.qv, s.cq),
         |          t -> (t[1] - t[2]) * (t[1] - t[2]))) ASC, s.cid) AS rn
         |    FROM $fp f, seeds s) WHERE rn <= 3)""".stripMargin
    def layer(name: String, filt: String): String =
      s"""$name AS (SELECT b_id AS src, c_id AS dst FROM (
         |    SELECT b_id, c_id, row_number() OVER (PARTITION BY b_id
         |      ORDER BY s DESC, c_id) AS rn FROM sc_old $filt)
         |  WHERE rn <= 4)""".stripMargin
    def twoHops(m: Int, edges: String, seed: String): String =
      Seq(("a", seed), ("b", s"h${m}a")).map { case (tag, s) =>
        s"""c$m$tag AS (SELECT q_id, node FROM $s
           |  UNION ALL SELECT s.q_id, e.dst FROM $s s
           |  JOIN $edges e ON e.src = s.node),
           |h$m$tag AS (SELECT q_id, b_id AS node, s FROM (
           |    SELECT qsc.q_id, qsc.b_id, qsc.s,
           |      row_number() OVER (PARTITION BY qsc.q_id
           |        ORDER BY qsc.s DESC, qsc.b_id) AS rn
           |    FROM qscore qsc JOIN c$m$tag c ON qsc.q_id = c.q_id
           |      AND qsc.b_id = c.node) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
    s"""WITH base_old AS (SELECT vec_id AS b_id,
       |    CAST(embedding AS DOUBLE[]) AS be
       |  FROM embeddings WHERE vec_id % 8 = 0),
       |base_new AS (SELECT vec_id AS b_id,
       |    CAST(embedding AS DOUBLE[]) AS be
       |  FROM embeddings WHERE vec_id % 8 = 4),
       |base_full AS (SELECT * FROM base_old
       |  UNION ALL SELECT * FROM base_new),
       |fp_old AS (SELECT vec_id AS b_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
       |  FROM embeddings WHERE vec_id % 8 = 0),
       |fp_new AS (SELECT vec_id AS b_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
       |  FROM embeddings WHERE vec_id % 8 = 4),
       |seeds AS (SELECT b_id AS cid, qv AS cq FROM fp_old
       |  ORDER BY b_id LIMIT 32),
       |${asg("asg_old", "fp_old")},
       |${asg("asg_new", "fp_new")},
       |cand_old AS (SELECT DISTINCT a.b_id, b.b_id AS c_id
       |  FROM asg_old a JOIN asg_old b ON a.cid = b.cid
       |    AND a.b_id <> b.b_id),
       |sc_old AS (SELECT c.b_id, c.c_id, ${cos("x.be", "y.be")} AS s
       |  FROM cand_old c JOIN base_old x ON c.b_id = x.b_id
       |  JOIN base_old y ON c.c_id = y.b_id),
       |${layer("edges_l2", "WHERE b_id % 64 = 0 AND c_id % 64 = 0")},
       |${layer("edges_l1", "WHERE b_id % 16 = 0 AND c_id % 16 = 0")},
       |${layer("edges_l0v0", "")},
       |cand_new AS (SELECT DISTINCT n.b_id AS n_id, o.b_id AS o_id
       |  FROM asg_new n JOIN asg_old o ON n.cid = o.cid),
       |new_edges AS (SELECT n_id, o_id FROM (
       |    SELECT c.n_id, c.o_id, row_number() OVER (PARTITION BY c.n_id
       |      ORDER BY ${cos("nb.be", "ob.be")} DESC, c.o_id) AS rn
       |    FROM cand_new c JOIN base_new nb ON nb.b_id = c.n_id
       |    JOIN base_old ob ON ob.b_id = c.o_id) WHERE rn <= 4),
       |edges_l0 AS (SELECT * FROM edges_l0v0
       |  UNION ALL SELECT n_id AS src, o_id AS dst FROM new_edges
       |  UNION ALL SELECT o_id AS src, n_id AS dst FROM new_edges),
       |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
       |qscore AS (SELECT q.q_id, b.b_id, ${cos("q.qe", "b.be")} AS s
       |  FROM qs q, base_full b),
       |entry AS (SELECT min(b_id) AS e_id FROM base_old
       |  WHERE b_id % 64 = 0),
       |seed0 AS (SELECT q_id, (SELECT e_id FROM entry) AS node FROM qs),
       |entry_sc AS (SELECT q_id, b_id AS entry_id, s AS s_entry
       |  FROM qscore WHERE b_id = (SELECT e_id FROM entry)),
       |${twoHops(64, "edges_l2", "seed0")},
       |${twoHops(16, "edges_l1", "h64b")},
       |${twoHops(4, "edges_l0", "h16b")},
       |ex AS (SELECT q_id, b_id AS best_id, s AS best_s FROM (
       |    SELECT q_id, b_id, s, row_number() OVER (PARTITION BY q_id
       |      ORDER BY s DESC, b_id) AS rn FROM qscore)
       |  WHERE rn = 1),
       |census AS (SELECT
       |    CAST((SELECT count(*) FROM edges_l2)
       |      + (SELECT count(*) FROM edges_l1)
       |      + (SELECT count(*) FROM edges_l0v0) AS BIGINT)
       |      AS n_edges_v0,
       |    CAST(2 * (SELECT count(*) FROM new_edges) AS BIGINT)
       |      AS n_edges_added)
       |SELECT e0.q_id, e0.entry_id, e0.s_entry,
       |  h64b.node AS end_l2, h64b.s AS s_l2,
       |  h16b.node AS end_l1, h16b.s AS s_l1,
       |  h4b.node AS end_l0, h4b.s AS s_l0,
       |  ex.best_id, ex.best_s,
       |  CAST(CASE WHEN h4b.node = ex.best_id THEN 1 ELSE 0 END
       |    AS BIGINT) AS found,
       |  census.n_edges_v0, census.n_edges_added
       |FROM entry_sc e0
       |JOIN h64b ON e0.q_id = h64b.q_id
       |JOIN h16b ON e0.q_id = h16b.q_id
       |JOIN h4b ON e0.q_id = h4b.q_id
       |JOIN ex ON e0.q_id = ex.q_id, census
       |ORDER BY e0.q_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // the calibration-bin CTE + the divisionless |acc − conf| fold
    "eval_ece_exact" ->
      """WITH s AS (SELECT (n_chars * 1048576) // 600 AS score_fp,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |b AS (SELECT least((score_fp * 10) // 1048576, 9) AS bin,
        |    score_fp, pos
        |  FROM s),
        |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(score_fp) AS BIGINT) AS sum_score_fp,
        |    CAST(sum(pos) AS BIGINT) AS n_pos
        |  FROM b GROUP BY bin)
        |SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n) AS BIGINT) AS n_total,
        |  CAST(sum(abs(n_pos * 1048576 - sum_score_fp)) AS BIGINT)
        |    AS ece_num,
        |  CAST(sum(abs(n_pos * 1048576 - sum_score_fp)) // sum(n)
        |    AS BIGINT) AS ece_fp
        |FROM bins ORDER BY n_bins""".stripMargin,
    "ml_class_balance_weights" ->
      """WITH c AS (SELECT CAST(label AS BIGINT) AS label,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY label),
        |t AS (SELECT label, n, CAST(sum(n) OVER () AS BIGINT) AS n_total,
        |    CAST(count(*) OVER () AS BIGINT) AS k FROM c)
        |SELECT label, n, n_total,
        |  CAST((n_total * 1048576) // (k * n) AS BIGINT) AS weight_fp
        |FROM t ORDER BY label""".stripMargin,
    // the full knn-vote CTE + cell aggregate + row-share window
    "ml_knn_confusion" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS tl,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |s AS (SELECT q_id, tl, vec_id, label,
        |    round(list_dot_product(qe, CAST(embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |         CAST(embedding AS DOUBLE[])))), 6) AS score
        |  FROM q, embeddings WHERE vec_id <> q_id),
        |r AS (SELECT q_id, tl, vec_id, label, score,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id) AS rn FROM s),
        |votes AS (SELECT q_id, tl, label, CAST(count(*) AS BIGINT) AS v
        |  FROM r WHERE rn <= 5 GROUP BY q_id, tl, label),
        |w AS (SELECT q_id, tl, label, v,
        |    row_number() OVER (PARTITION BY q_id ORDER BY v DESC, label)
        |      AS vr FROM votes),
        |pred AS (SELECT tl AS true_label, CAST(label AS BIGINT)
        |    AS pred_label FROM w WHERE vr = 1),
        |cells AS (SELECT true_label, pred_label,
        |    CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
        |tot AS (SELECT true_label, pred_label, n,
        |    CAST(sum(n) OVER (PARTITION BY true_label) AS BIGINT)
        |      AS row_total FROM cells)
        |SELECT true_label, pred_label, n, row_total,
        |  CAST((n * 1048576) // row_total AS BIGINT) AS share_fp
        |FROM tot ORDER BY true_label, pred_label""".stripMargin,
    // both modality CTEs verbatim, joined on the (doc, ordinal) key
    "multimodal_align_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |    unnest(range(0, CAST(1 + (greatest(0, n - 9) // 24) AS BIGINT)))
        |      AS i
        |  FROM d),
        |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS ord,
        |    CAST(least(n - i * 24, 32) AS BIGINT) AS n_tok FROM c),
        |fx AS (SELECT doc_id, text,
        |    unnest(range(1, CAST(ceil(length(text) / 64.0) AS INT) + 1, 4))
        |      AS fidx
        |  FROM documents WHERE length(text) > 0),
        |fr AS (SELECT doc_id, CAST((fidx - 1) // 4 AS BIGINT) AS ord,
        |    CAST(length(substring(text, (fidx - 1) * 64 + 1, 64))
        |      AS BIGINT) AS frame_len,
        |    sha256(substring(text, (fidx - 1) * 64 + 1, 64)) AS frame_sha
        |  FROM fx)
        |SELECT ch.doc_id, ch.ord, ch.n_tok, fr.frame_len, fr.frame_sha
        |FROM ch JOIN fr ON ch.doc_id = fr.doc_id AND ch.ord = fr.ord
        |ORDER BY ch.doc_id, ch.ord""".stripMargin,
    // same LCG order, per-label top-2, and cross-label best-2 elections
    "ml_triplet_mining" ->
      """WITH e AS (SELECT vec_id, label,
        |    (vec_id * 2654435761) % 2147483648 AS h FROM embeddings),
        |t AS (SELECT label, vec_id,
        |    row_number() OVER (PARTITION BY label ORDER BY h, vec_id)
        |      AS rn FROM e),
        |p1 AS (SELECT label, vec_id AS p1_id FROM t WHERE rn = 1),
        |p2 AS (SELECT label, vec_id AS p2_id FROM t WHERE rn = 2),
        |lm AS (SELECT t.label AS m_label, t.vec_id AS m_id, e.h AS m_h
        |  FROM t JOIN e ON t.vec_id = e.vec_id WHERE t.rn = 1),
        |b AS (SELECT m_label, m_id,
        |    row_number() OVER (ORDER BY m_h, m_id) AS gr FROM lm),
        |n1 AS (SELECT m_label AS n1_label, m_id AS n1_id FROM b
        |  WHERE gr = 1),
        |n2 AS (SELECT m_label AS n2_label, m_id AS n2_id FROM b
        |  WHERE gr = 2)
        |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
        |  CAST(CASE WHEN p1.p1_id <> e.vec_id THEN p1.p1_id
        |    ELSE coalesce(p2.p2_id, -1) END AS BIGINT) AS pos_id,
        |  CAST(CASE WHEN n1.n1_label <> e.label THEN n1.n1_id
        |    ELSE n2.n2_id END AS BIGINT) AS neg_id
        |FROM e JOIN p1 ON e.label = p1.label
        |LEFT JOIN p2 ON e.label = p2.label, n1, n2
        |ORDER BY e.vec_id""".stripMargin,
    // the cosine_topk scoring CTE + first same-label hit election
    "eval_mrr_fixed" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS ql,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT q_id, ql, vec_id, label,
        |    round(list_dot_product(qe, CAST(embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |         CAST(embedding AS DOUBLE[])))), 6) AS score
        |  FROM q, embeddings WHERE vec_id <> q_id),
        |r AS (SELECT q_id, ql, label, score,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id) AS rn FROM s),
        |m AS (SELECT q_id, max(ql) AS label,
        |    coalesce(min(CASE WHEN label = ql THEN rn END), -1)
        |      AS first_match_rank
        |  FROM r WHERE rn <= 10 GROUP BY q_id)
        |SELECT q_id, CAST(label AS BIGINT) AS label,
        |  CAST(first_match_rank AS BIGINT) AS first_match_rank,
        |  CAST(CASE WHEN first_match_rank = -1 THEN 0
        |    ELSE 1048576 // first_match_rank END AS BIGINT) AS rr_fp
        |FROM m ORDER BY q_id""".stripMargin,
    "eval_calibration_bins" ->
      """WITH s AS (SELECT (n_chars * 1048576) // 600 AS score_fp,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |b AS (SELECT least((score_fp * 10) // 1048576, 9) AS bin,
        |    score_fp, pos
        |  FROM s)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(score_fp) AS BIGINT) AS sum_score_fp,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST((sum(pos) * 1048576) // count(*) AS BIGINT) AS pos_rate_fp
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    // the simsearch_cosine_topk scoring formula (list_dot_product /
    // sqrt·sqrt, round 6) + the same two-window vote
    "ml_knn_classify" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS tl,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |s AS (SELECT q_id, tl, vec_id, label,
        |    round(list_dot_product(qe, CAST(embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |         CAST(embedding AS DOUBLE[])))), 6) AS score
        |  FROM q, embeddings WHERE vec_id <> q_id),
        |r AS (SELECT q_id, tl, vec_id, label, score,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id) AS rn FROM s),
        |votes AS (SELECT q_id, tl, label, CAST(count(*) AS BIGINT) AS v
        |  FROM r WHERE rn <= 5 GROUP BY q_id, tl, label),
        |w AS (SELECT q_id, tl, label, v,
        |    row_number() OVER (PARTITION BY q_id ORDER BY v DESC, label)
        |      AS vr FROM votes)
        |SELECT q_id, tl AS true_label, CAST(label AS BIGINT) AS pred_label,
        |  v AS n_votes
        |FROM w WHERE vr = 1 ORDER BY q_id""".stripMargin,
    // same histogram → cumulative-split → fixed-point Gini chain; the
    // argmin election replayed as min-tuple over the curve
    "ml_decision_stump" ->
      """WITH h AS (SELECT n_chars AS threshold,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos
        |  FROM documents GROUP BY n_chars),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tot,
        |    CAST(sum(pos) AS BIGINT) AS pos_tot FROM h),
        |c AS (SELECT threshold,
        |    CAST(sum(cnt) OVER w AS BIGINT) AS n_left,
        |    CAST(sum(pos) OVER w AS BIGINT) AS pos_left,
        |    n_tot, pos_tot
        |  FROM h, t
        |  WINDOW w AS (ORDER BY threshold
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT threshold, n_left, pos_left,
        |    n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right,
        |    CAST((pos_left * (n_left - pos_left) * (n_tot - n_left) +
        |      (pos_tot - pos_left) *
        |        ((n_tot - n_left) - (pos_tot - pos_left)) * n_left)
        |      * 2097152 // (n_left * (n_tot - n_left)) AS BIGINT)
        |      AS gini_fp
        |  FROM c WHERE n_left < n_tot),
        |b AS (SELECT min(gini_fp) AS bg FROM g),
        |bt AS (SELECT min(threshold) AS bthr FROM g, b WHERE gini_fp = bg)
        |SELECT threshold, n_left, pos_left, n_right, pos_right, gini_fp,
        |  CAST(CASE WHEN gini_fp = (SELECT bg FROM b)
        |    AND threshold = (SELECT bthr FROM bt) THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_best
        |FROM g ORDER BY threshold""".stripMargin,
    // the routing chain replayed against a precomputed query×base
    // score table (the oracle may materialize what the engine scores
    // on demand); same round-6 micro-unit packing everywhere
    // the full three-layer descent replayed: per-layer 4-NN edges,
    // two hops per layer, the seed handed down, exact argmax receipt
    "simsearch_hnsw_layers" -> hnswOracle,
    "simsearch_hnsw_serve" -> hnswServeOracle,
    "simsearch_hnsw_maintain" -> hnswMaintainOracle,
    // the 3 farthest-first rounds unrolled; exact-double dot products
    "ml_kmeans_pp_seed" -> kmeansPpOracle,
    "simsearch_graph_greedy" ->
      """WITH base AS (SELECT vec_id AS b_id,
        |    CAST(embedding AS DOUBLE[]) AS be
        |  FROM embeddings WHERE vec_id % 4 = 0),
        |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
        |fp AS (SELECT vec_id AS b_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id % 4 = 0),
        |seeds AS (SELECT b_id AS cid, qv AS cq FROM fp
        |  ORDER BY b_id LIMIT 32),
        |asg AS (SELECT b_id, cid FROM (
        |    SELECT f.b_id, s.cid, row_number() OVER (PARTITION BY f.b_id
        |        ORDER BY list_sum(list_transform(list_zip(f.qv, s.cq),
        |          t -> (t[1] - t[2]) * (t[1] - t[2]))) ASC, s.cid) AS rn
        |    FROM fp f, seeds s) WHERE rn <= 3),
        |cand AS (SELECT DISTINCT a.b_id, b.b_id AS c_id
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.b_id <> b.b_id),
        |pairs AS (SELECT c.b_id, c.c_id,
        |    CAST(floor(round(list_dot_product(x.be, y.be) /
        |      (sqrt(list_dot_product(x.be, x.be)) *
        |       sqrt(list_dot_product(y.be, y.be))), 6) * 1000000 + 0.5)
        |      AS BIGINT) AS s
        |  FROM cand c JOIN base x ON c.b_id = x.b_id
        |    JOIN base y ON c.c_id = y.b_id),
        |edges AS (SELECT b_id AS src, c_id AS dst FROM (
        |    SELECT b_id, c_id, row_number() OVER (PARTITION BY b_id
        |      ORDER BY s DESC, c_id) AS rn FROM pairs)
        |  WHERE rn <= 4),
        |qscore AS (SELECT q.q_id, b.b_id,
        |    CAST(floor(round(list_dot_product(q.qe, b.be) /
        |      (sqrt(list_dot_product(q.qe, q.qe)) *
        |       sqrt(list_dot_product(b.be, b.be))), 6) * 1000000 + 0.5)
        |      AS BIGINT) AS s
        |  FROM qs q, base b),
        |entry AS (SELECT min(b_id) AS e_id FROM base),
        |h0 AS (SELECT q_id, b_id AS entry_id, s AS s0 FROM qscore
        |  WHERE b_id = (SELECT e_id FROM entry)),
        |c1 AS (SELECT e_id AS node FROM entry
        |  UNION ALL SELECT e.dst FROM edges e JOIN entry ON e.src = entry.e_id),
        |h1 AS (SELECT q_id, b_id AS n1, s AS s1 FROM (
        |    SELECT qsc.q_id, qsc.b_id, qsc.s,
        |      row_number() OVER (PARTITION BY qsc.q_id
        |        ORDER BY qsc.s DESC, qsc.b_id) AS rn
        |    FROM qscore qsc JOIN c1 ON qsc.b_id = c1.node)
        |  WHERE rn = 1),
        |c2 AS (SELECT q_id, n1 AS node FROM h1
        |  UNION ALL SELECT h1.q_id, e.dst FROM h1
        |    JOIN edges e ON e.src = h1.n1),
        |h2 AS (SELECT q_id, b_id AS n2, s AS s2 FROM (
        |    SELECT qsc.q_id, qsc.b_id, qsc.s,
        |      row_number() OVER (PARTITION BY qsc.q_id
        |        ORDER BY qsc.s DESC, qsc.b_id) AS rn
        |    FROM qscore qsc JOIN c2 ON qsc.q_id = c2.q_id
        |      AND qsc.b_id = c2.node)
        |  WHERE rn = 1),
        |ex AS (SELECT q_id, b_id AS best_id, s AS best_s FROM (
        |    SELECT q_id, b_id, s, row_number() OVER (PARTITION BY q_id
        |      ORDER BY s DESC, b_id) AS rn FROM qscore)
        |  WHERE rn = 1),
        |audit AS (SELECT b_id AS a_id, be AS ae FROM base
        |  WHERE b_id % 40 = 0 AND b_id < 2000),
        |exedges AS (SELECT a_id, b_id FROM (
        |    SELECT a.a_id, b.b_id, row_number() OVER (PARTITION BY a.a_id
        |        ORDER BY CAST(floor(round(list_dot_product(a.ae, b.be) /
        |          (sqrt(list_dot_product(a.ae, a.ae)) *
        |           sqrt(list_dot_product(b.be, b.be))), 6) * 1000000 + 0.5)
        |          AS BIGINT) DESC, b.b_id) AS rn
        |    FROM audit a JOIN base b ON a.a_id <> b.b_id) WHERE rn <= 4),
        |rec AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN ed.src IS NOT NULL THEN 1
        |      ELSE 0 END), 0) AS BIGINT) AS edge_hits,
        |    CAST(count(*) AS BIGINT) AS edge_total
        |  FROM exedges x LEFT JOIN edges ed
        |    ON ed.src = x.a_id AND ed.dst = x.b_id)
        |SELECT h0.q_id, h0.entry_id, h0.s0, h1.n1, h1.s1, h2.n2, h2.s2,
        |  ex.best_id, ex.best_s,
        |  CAST(CASE WHEN h2.n2 = ex.best_id THEN 1 ELSE 0 END AS BIGINT)
        |    AS found,
        |  rec.edge_hits, rec.edge_total
        |FROM h0 JOIN h1 ON h0.q_id = h1.q_id
        |JOIN h2 ON h0.q_id = h2.q_id
        |JOIN ex ON h0.q_id = ex.q_id, rec
        |ORDER BY h0.q_id""".stripMargin,
    // the same two integer-exact update steps; step 1's margin is
    // identically 0 at w = 0 so every row updates on both engines
    "ml_perceptron_step" ->
      """WITH f AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |    n_chars AS x1,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS x2
        |  FROM documents),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n_mis,
        |    CAST(sum(y * x1) AS BIGINT) AS w_chars,
        |    CAST(sum(y * x2) AS BIGINT) AS w_tokens,
        |    CAST(sum(y) AS BIGINT) AS bias
        |  FROM f),
        |s2 AS (SELECT
        |    CAST(sum(CASE WHEN y * (s1.w_chars * x1 + s1.w_tokens * x2
        |        + s1.bias) <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
        |    CAST(s1.w_chars + coalesce(sum(CASE WHEN y * (s1.w_chars * x1
        |        + s1.w_tokens * x2 + s1.bias) <= 0 THEN y * x1 END), 0)
        |      AS BIGINT) AS w_chars,
        |    CAST(s1.w_tokens + coalesce(sum(CASE WHEN y * (s1.w_chars * x1
        |        + s1.w_tokens * x2 + s1.bias) <= 0 THEN y * x2 END), 0)
        |      AS BIGINT) AS w_tokens,
        |    CAST(s1.bias + coalesce(sum(CASE WHEN y * (s1.w_chars * x1
        |        + s1.w_tokens * x2 + s1.bias) <= 0 THEN y END), 0)
        |      AS BIGINT) AS bias
        |  FROM f CROSS JOIN s1
        |  GROUP BY s1.w_chars, s1.w_tokens, s1.bias)
        |SELECT CAST(1 AS BIGINT) AS step, n_mis, w_chars, w_tokens, bias
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS step, n_mis, w_chars, w_tokens, bias
        |FROM s2 ORDER BY step""".stripMargin,
    // Gram/matvec chain replayed; the oracle may self-join at element
    // grain (the graded side builds G as a per-row projection), and
    // the second matvec rides HUGEINT ⟷ DECIMAL(38,0)
    "ml_pca_power_iter" ->
      """WITH e AS (SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 65536.0)
        |      AS BIGINT) AS q
        |  FROM embeddings),
        |g AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
        |  FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |v1 AS (SELECT i, CAST(sum(g) AS BIGINT) AS v FROM g GROUP BY i),
        |m1 AS (SELECT max(abs(v)) AS m FROM v1),
        |v1n AS (SELECT i, (CAST(v AS HUGEINT) * 1048576) // m AS vn
        |  FROM v1, m1),
        |v2 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * v1n.vn) AS v
        |  FROM g JOIN v1n ON g.j = v1n.i GROUP BY g.i),
        |m2 AS (SELECT max(abs(v)) AS m FROM v2),
        |v2n AS (SELECT i, CAST((v * 1048576) // m AS BIGINT) AS vn2
        |  FROM v2, m2)
        |SELECT g.i AS dim, g.g AS g_diag, CAST(v1n.vn AS BIGINT) AS v1_fp,
        |  v2n.vn2 AS v2_fp
        |FROM g JOIN v1n ON g.i = v1n.i JOIN v2n ON g.i = v2n.i
        |WHERE g.i = g.j
        |ORDER BY dim""".stripMargin,
    // same (score DESC, doc_id) total order; precision@k and the AP
    // mean are the same truncating fixed-point divisions on both sides
    "eval_average_precision" ->
      """WITH d0 AS (SELECT coalesce(source, '(none)') AS source, doc_id,
        |    n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |r AS (SELECT source, pos,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS k,
        |    sum(pos) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_cum
        |  FROM d0),
        |t AS (SELECT source, count(*) AS n_docs, sum(pos) AS n_pos
        |  FROM d0 GROUP BY 1),
        |p AS (SELECT source, sum((pos_cum * 1048576) // k) AS sp
        |  FROM r WHERE pos = 1 GROUP BY 1)
        |SELECT t.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(CASE WHEN n_pos = 0 THEN -1 ELSE sp // n_pos END AS BIGINT)
        |    AS ap_fp
        |FROM t LEFT JOIN p ON t.source = p.source
        |ORDER BY t.source""".stripMargin,
    // the same pairless U: per-(source, score) histogram, negs-below
    // window, ties at half credit via the 2U integerization
    "eval_auc_exact" ->
      """WITH h AS (SELECT coalesce(source, '(none)') AS source,
        |    n_chars AS score,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
        |      AS neg
        |  FROM documents GROUP BY source, n_chars),
        |c AS (SELECT source, score, pos, neg,
        |    CAST(coalesce(sum(neg) OVER (PARTITION BY source ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS neg_below
        |  FROM h),
        |a AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(pos * (neg_below * 2 + neg)) AS BIGINT) AS u2
        |  FROM c GROUP BY source)
        |SELECT source, n_pos, n_neg, u2,
        |  CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
        |    ELSE (u2 * 1048576) // (2 * n_pos * n_neg) END AS BIGINT)
        |    AS auc_fp
        |FROM a ORDER BY source""".stripMargin,
    // the same SQL text as the Spark side (idiv/big substituted)
    "ml_ridge_normal_eq" -> ridgeSql("lineitem", "//", "HUGEINT"),
    // every aggregate CAST to BIGINT: DuckDB sums BIGINT into HUGEINT,
    // which pandas would widen to float64 and fail the dtype match
    "ml_linreg_sufficient" ->
      """WITH e AS (SELECT event_type, user_id,
        |    epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, user_id,
        |    (t // 86400000000) -
        |      (SELECT min(t // 86400000000) FROM e) AS x,
        |    v_fp
        |  FROM e)
        |SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(v_fp) AS BIGINT) AS sy_fp,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(x * v_fp) AS BIGINT) AS sxy_fp,
        |  CAST(count(*) * sum(x * v_fp) - sum(x) * sum(v_fp) AS BIGINT)
        |    AS num_fp,
        |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS den
        |FROM b GROUP BY event_type, user_id
        |ORDER BY event_type, user_id""".stripMargin,
    // the same minimax PAVA replayed over the same decile bins
    "ml_isotonic_calibration" -> {
      val bins =
        """(SELECT least(((n_chars * 1048576) // 600) * 10 // 1048576, 9)
          |    AS bin, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_pos
          |  FROM documents GROUP BY 1)""".stripMargin
      isoSql(bins, "//")
    },
    // both rankings replayed bit-exactly: 2^16 quantization, BIGINT
    // dots, floor-sqrt norms, truncating division, vec_id tie-break
    "embedding_matryoshka_trunc" ->
      """WITH u AS (SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 65536.0)
        |      AS BIGINT) AS qx
        |  FROM embeddings),
        |qv AS (SELECT vec_id AS q_id, pos, qx AS qq FROM u
        |  WHERE vec_id < 20),
        |sc AS (SELECT qv.q_id, u.vec_id,
        |    CAST(sum(qq * qx) AS BIGINT) AS s64,
        |    CAST(sum(CASE WHEN u.pos <= 16 THEN qq * qx ELSE 0 END)
        |      AS BIGINT) AS s16,
        |    CAST(sum(qx * qx) AS BIGINT) AS n64,
        |    CAST(sum(CASE WHEN u.pos <= 16 THEN qx * qx ELSE 0 END)
        |      AS BIGINT) AS n16
        |  FROM u JOIN qv ON u.pos = qv.pos AND u.vec_id <> qv.q_id
        |  GROUP BY 1, 2),
        |k AS (SELECT q_id, vec_id,
        |    (s64 * 1048576) //
        |      CAST(floor(sqrt(greatest(n64, 1))) AS BIGINT) AS k64,
        |    (s16 * 1048576) //
        |      CAST(floor(sqrt(greatest(n16, 1))) AS BIGINT) AS k16
        |  FROM sc),
        |f AS (SELECT q_id, vec_id, k64, row_number() OVER (
        |    PARTITION BY q_id ORDER BY k64 DESC, vec_id) AS rn FROM k),
        |t AS (SELECT q_id, vec_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY k16 DESC, vec_id) AS rn16 FROM k)
        |SELECT f.q_id, CAST(f.rn AS BIGINT) AS rn, f.vec_id AS full_id,
        |  f.k64 AS score_fp,
        |  CAST(CASE WHEN t2.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS in_trunc_top10
        |FROM f LEFT JOIN (SELECT q_id, vec_id FROM t WHERE rn16 <= 10) t2
        |  ON f.q_id = t2.q_id AND f.vec_id = t2.vec_id
        |WHERE f.rn <= 10
        |ORDER BY f.q_id, f.rn""".stripMargin,
    // both MM iterates replayed from the per-user head-to-head grid;
    // every division a truncating BIGINT div
    "ml_bradley_terry_step" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m0 AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(sum(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT) AS wa,
        |    CAST(sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END) AS BIGINT) AS wb
        |  FROM c a JOIN c b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |sym AS (SELECT ta AS i, tb AS j, wa + wb AS nij, wa AS wij FROM m0
        |  UNION ALL SELECT tb AS i, ta AS j, wa + wb AS nij, wb AS wij
        |  FROM m0),
        |tot AS (SELECT i, CAST(sum(nij) AS BIGINT) AS games,
        |    CAST(sum(wij) AS BIGINT) AS wins FROM sym GROUP BY i),
        |d1 AS (SELECT i, CAST(sum((nij * 1099511627776)
        |    // (1048576 + 1048576)) AS BIGINT) AS d FROM sym GROUP BY i),
        |q1 AS (SELECT tot.i, tot.games, tot.wins,
        |    CASE WHEN d1.d = 0 THEN -1
        |      ELSE (tot.wins * 1099511627776) // d1.d END AS p1_fp
        |  FROM tot JOIN d1 ON tot.i = d1.i),
        |d2 AS (SELECT s.i, CAST(sum((s.nij * 1099511627776)
        |    // (qa.p1_fp + qb.p1_fp)) AS BIGINT) AS d
        |  FROM sym s JOIN q1 qa ON s.i = qa.i JOIN q1 qb ON s.j = qb.i
        |  GROUP BY s.i),
        |q2 AS (SELECT q1.i, CASE WHEN d2.d = 0 THEN -1
        |    ELSE (q1.wins * 1099511627776) // d2.d END AS p2_fp
        |  FROM q1 JOIN d2 ON q1.i = d2.i)
        |SELECT q1.i AS event_type, q1.games, q1.wins,
        |  CAST(q1.p1_fp AS BIGINT) AS p1_fp,
        |  CAST(q2.p2_fp AS BIGINT) AS p2_fp
        |FROM q1 JOIN q2 ON q1.i = q2.i
        |ORDER BY event_type""".stripMargin,
    // the full 2-round boost replayed: histogram stats, prefix-sum
    // split scan, argmax election, leaf means, residual update, SSE
    // receipts — HUGEINT where Spark used DECIMAL(38,0)
    "ml_gbdt_stump_boost" ->
      """WITH base AS (SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
        |    CAST(l_quantity AS BIGINT) AS f1,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS f2
        |  FROM lineitem),
        |g0 AS (SELECT sum(y) // count(*) AS p0 FROM base),
        |b1 AS (SELECT f1, f2, y - (SELECT p0 FROM g0) AS r1 FROM base),
        |a1 AS (SELECT f1 AS v, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(r1) AS BIGINT) AS sv FROM b1 GROUP BY f1),
        |p1 AS (SELECT v, sum(nv) OVER w AS nl, sum(sv) OVER w AS sl,
        |    (SELECT sum(nv) FROM a1) AS nt, (SELECT sum(sv) FROM a1) AS st
        |  FROM a1
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |s1 AS (SELECT v, nl, sl, nt - nl AS nr, st - sl AS sr,
        |    (CAST(sl AS HUGEINT) * sl) // nl
        |    + (CAST(st - sl AS HUGEINT) * (st - sl)) // (nt - nl) AS score
        |  FROM p1 WHERE nt - nl > 0),
        |w1 AS (SELECT v AS t1, nl AS nl1, nr AS nr1,
        |    sl // nl AS wl1, sr // nr AS wr1
        |  FROM s1 ORDER BY score DESC, v LIMIT 1),
        |b2 AS (SELECT f2, r1,
        |    r1 - (CASE WHEN f1 <= (SELECT t1 FROM w1)
        |      THEN (SELECT wl1 FROM w1) ELSE (SELECT wr1 FROM w1) END) AS r2
        |  FROM b1),
        |a2 AS (SELECT f2 AS v, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(r2) AS BIGINT) AS sv FROM b2 GROUP BY f2),
        |p2 AS (SELECT v, sum(nv) OVER w AS nl, sum(sv) OVER w AS sl,
        |    (SELECT sum(nv) FROM a2) AS nt, (SELECT sum(sv) FROM a2) AS st
        |  FROM a2
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |s2 AS (SELECT v, nl, sl, nt - nl AS nr, st - sl AS sr,
        |    (CAST(sl AS HUGEINT) * sl) // nl
        |    + (CAST(st - sl AS HUGEINT) * (st - sl)) // (nt - nl) AS score
        |  FROM p2 WHERE nt - nl > 0),
        |w2 AS (SELECT v AS t2, nl AS nl2, nr AS nr2,
        |    sl // nl AS wl2, sr // nr AS wr2
        |  FROM s2 ORDER BY score DESC, v LIMIT 1),
        |b3 AS (SELECT r2,
        |    r2 - (CASE WHEN f2 <= (SELECT t2 FROM w2)
        |      THEN (SELECT wl2 FROM w2) ELSE (SELECT wr2 FROM w2) END) AS r3
        |  FROM b2),
        |sse AS (SELECT
        |    sum(CAST(r1 AS HUGEINT) * r1) // 1000000 AS sse0,
        |    sum(CAST(r2 AS HUGEINT) * r2) // 1000000 AS sse1
        |  FROM b2),
        |sse3 AS (SELECT
        |    sum(CAST(r3 AS HUGEINT) * r3) // 1000000 AS sse2 FROM b3)
        |SELECT CAST(round AS BIGINT) AS round, feature,
        |  CAST(threshold AS BIGINT) AS threshold,
        |  CAST(n_left AS BIGINT) AS n_left, CAST(n_right AS BIGINT) AS n_right,
        |  CAST(w_left AS BIGINT) AS w_left, CAST(w_right AS BIGINT) AS w_right,
        |  CAST(sse_before_m AS BIGINT) AS sse_before_m,
        |  CAST(sse_after_m AS BIGINT) AS sse_after_m
        |FROM (
        |  SELECT 1 AS round, 'l_quantity' AS feature, t1 AS threshold,
        |    nl1 AS n_left, nr1 AS n_right, wl1 AS w_left, wr1 AS w_right,
        |    (SELECT sse0 FROM sse) AS sse_before_m,
        |    (SELECT sse1 FROM sse) AS sse_after_m
        |  FROM w1
        |  UNION ALL
        |  SELECT 2 AS round, 'l_discount_pct' AS feature, t2 AS threshold,
        |    nl2 AS n_left, nr2 AS n_right, wl2 AS w_left, wr2 AS w_right,
        |    (SELECT sse1 FROM sse) AS sse_before_m,
        |    (SELECT sse2 FROM sse3) AS sse_after_m
        |  FROM w2)
        |ORDER BY round""".stripMargin,
    // both ALS half-steps replayed in SQL: u from the price init,
    // v1 from the u's — exact integer ratios at 2^20 fixed point
    "ml_als_1d_step" ->
      """WITH r AS (SELECT o_custkey AS c, l_partkey AS p,
        |    CAST(sum(l_quantity) AS BIGINT) AS rt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |v0 AS (SELECT p_partkey AS p,
        |    CAST(floor(p_retailprice) AS BIGINT) AS v0 FROM part),
        |u AS (SELECT c,
        |    CAST((1048576 * sum(r.rt * v0.v0)) // sum(v0.v0 * v0.v0)
        |      AS BIGINT) AS u
        |  FROM r JOIN v0 ON r.p = v0.p GROUP BY c),
        |v1 AS (SELECT r.p, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST((1048576 * sum(r.rt * u.u)) // sum(u.u * u.u)
        |      AS BIGINT) AS v1_fp
        |  FROM r JOIN u ON r.c = u.c GROUP BY r.p)
        |SELECT v1.p AS p_partkey, n_obs, v0.v0 AS v0_price, v1_fp
        |FROM v1 JOIN v0 ON v1.p = v0.p ORDER BY p_partkey""".stripMargin,
    // blob round trip must preserve every byte: graded against the
    // ORIGINAL documents (ascii corpus: octet_length == length)
    "source_binaryfile_ingest" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the embedding_pq_quantize ADC chain verbatim, graded at the
    // retrieval output grain (top-10 by score desc, vec_id)
    "simsearch_pq_topk" ->
      """WITH fp AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ms AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS m),
        |subs AS (SELECT vec_id, m,
        |    list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv FROM fp, ms),
        |seeds AS (SELECT m, vec_id AS cid, sv AS cq FROM subs
        |  WHERE vec_id < 16),
        |d1 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN seeds c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, cid FROM
        |    (SELECT vec_id, m, sv, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |cx AS (SELECT m, cid, CAST(generate_subscripts(sv, 1) AS BIGINT)
        |    AS pos, unnest(sv) AS x FROM a1),
        |cm AS (SELECT m, cid, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY m, cid, pos),
        |cents AS (SELECT m, cid, list(c ORDER BY pos) AS cent
        |  FROM cm GROUP BY m, cid),
        |d2 AS (SELECT s.vec_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN cents c USING (m)),
        |codes AS (SELECT vec_id, m, cid FROM
        |    (SELECT vec_id, m, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM subs s JOIN cents c USING (m) WHERE s.vec_id < 5),
        |adc AS (SELECT l.q_id, k.vec_id, CAST(sum(l.pd) AS BIGINT) AS adc
        |  FROM codes k JOIN lut l ON k.m = l.m AND k.cid = l.cid
        |  WHERE k.vec_id <> l.q_id GROUP BY l.q_id, k.vec_id)
        |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, adc FROM
        |    (SELECT q_id, vec_id, adc, row_number() OVER (PARTITION BY
        |      q_id ORDER BY adc DESC, vec_id) AS rn FROM adc)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    // same integer plane formula, fixed-point dot signs, 12-bit
    // signature, 3×4-bit band buckets, and round-6 cosine ranking
    "simsearch_lsh_replayable" ->
      """WITH fp AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |px AS (SELECT vec_id,
        |    CAST(generate_subscripts(qv, 1) AS BIGINT) - 1 AS d,
        |    unnest(qv) AS x FROM fp),
        |pl AS (SELECT i.i, d.d,
        |    ((i.i * 64 + d.d + 1) * 2654435761) % 1048573 - 524286 AS p
        |  FROM (SELECT CAST(unnest(range(0, 12)) AS BIGINT) AS i) i,
        |       (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS d) d),
        |dots AS (SELECT px.vec_id, pl.i,
        |    CAST(sum(px.x * pl.p) AS BIGINT) AS dt
        |  FROM px JOIN pl USING (d) GROUP BY px.vec_id, pl.i),
        |sig AS (SELECT vec_id,
        |    CAST(sum(CASE WHEN dt >= 0 THEN (1 << i) ELSE 0 END)
        |      AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id),
        |banded AS (SELECT vec_id, CAST(k.b AS BIGINT) AS band,
        |    (sig // CASE k.b WHEN 0 THEN 1 WHEN 1 THEN 16 ELSE 256 END)
        |      % 16 AS bv
        |  FROM sig, (VALUES (0), (1), (2)) k(b)),
        |qb AS (SELECT vec_id AS q_id, band, bv FROM banded
        |  WHERE vec_id < 5),
        |cand AS (SELECT DISTINCT qb.q_id, bd.vec_id
        |  FROM banded bd JOIN qb USING (band, bv)
        |  WHERE bd.vec_id <> qb.q_id),
        |qe AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |sc AS (SELECT c.q_id, c.vec_id,
        |    round(list_dot_product(qe, CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |            CAST(e.embedding AS DOUBLE[])))), 6) AS score
        |  FROM cand c JOIN qe ON qe.q_id = c.q_id
        |  JOIN embeddings e ON e.vec_id = c.vec_id)
        |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, score FROM
        |    (SELECT q_id, vec_id, score, row_number() OVER (PARTITION BY
        |      q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    // the COMPOSED serving plan: the pq chain's codebook/LUT CTEs + the
    // ann-recall IVF probe CTEs, ADC restricted to probed-cell members,
    // recall vs the exact fixed-point-dot top-10
    "simsearch_ivf_pq" ->
      """WITH fp AS (SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ms AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS m),
        |subs AS (SELECT vec_id, m,
        |    list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv FROM fp, ms),
        |seeds AS (SELECT m, vec_id AS cid, sv AS cq FROM subs
        |  WHERE vec_id < 16),
        |d1 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN seeds c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, cid FROM
        |    (SELECT vec_id, m, sv, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |cx AS (SELECT m, cid, CAST(generate_subscripts(sv, 1) AS BIGINT)
        |    AS pos, unnest(sv) AS x FROM a1),
        |cm AS (SELECT m, cid, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY m, cid, pos),
        |cents AS (SELECT m, cid, list(c ORDER BY pos) AS cent
        |  FROM cm GROUP BY m, cid),
        |d2 AS (SELECT s.vec_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN cents c USING (m)),
        |codes AS (SELECT vec_id, m, cid FROM
        |    (SELECT vec_id, m, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM subs s JOIN cents c USING (m) WHERE s.vec_id < 5),
        |icx AS (SELECT label, CAST(generate_subscripts(qv, 1) AS BIGINT)
        |    AS pos, unnest(qv) AS x FROM fp),
        |icm AS (SELECT label, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM icx GROUP BY label, pos),
        |cells AS (SELECT label AS cell, list(c ORDER BY pos) AS cfp
        |  FROM icm GROUP BY label),
        |qs AS (SELECT vec_id AS q_id, qv FROM fp WHERE vec_id < 5),
        |pr AS (SELECT q_id, cell,
        |    CAST(list_sum(list_transform(list_zip(qv, cfp),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM qs, cells),
        |ranked AS (SELECT q_id, cell, CAST(row_number() OVER (PARTITION BY
        |    q_id ORDER BY pd DESC, cell) AS BIGINT) AS cr FROM pr),
        |mem AS (SELECT r.q_id, e.vec_id, r.cr
        |  FROM ranked r JOIN embeddings e ON e.label = r.cell
        |  WHERE r.cr <= 10 AND e.vec_id <> r.q_id),
        |adc AS (SELECT mb.q_id, mb.vec_id, mb.cr,
        |    CAST(sum(l.pd) AS BIGINT) AS adc
        |  FROM mem mb JOIN codes k ON k.vec_id = mb.vec_id
        |  JOIN lut l ON l.q_id = mb.q_id AND l.m = k.m AND l.cid = k.cid
        |  GROUP BY mb.q_id, mb.vec_id, mb.cr),
        |probes AS (SELECT CAST(unnest([1, 2, 4, 10]) AS BIGINT) AS nprobe),
        |cand AS (SELECT p.nprobe, a.q_id, a.vec_id, a.adc
        |  FROM adc a, probes p WHERE a.cr <= p.nprobe),
        |tp AS (SELECT nprobe, q_id, vec_id FROM
        |    (SELECT nprobe, q_id, vec_id, row_number() OVER (PARTITION BY
        |      nprobe, q_id ORDER BY adc DESC, vec_id) AS rn FROM cand)
        |  WHERE rn <= 10),
        |qt AS (SELECT vec_id AS q_id, qv AS qq FROM fp WHERE vec_id < 5),
        |exd AS (SELECT q.q_id, f.vec_id,
        |    CAST(list_sum(list_transform(list_zip(f.qv, q.qq),
        |      p -> p[1] * p[2])) AS BIGINT) AS dot
        |  FROM fp f, qt q WHERE f.vec_id <> q.q_id),
        |ext AS (SELECT q_id, vec_id FROM
        |    (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY dot DESC, vec_id) AS rn FROM exd)
        |  WHERE rn <= 10),
        |nc AS (SELECT nprobe, q_id, count(*) AS n_cand
        |  FROM cand GROUP BY nprobe, q_id),
        |h AS (SELECT t.nprobe, t.q_id, count(*) AS h FROM tp t
        |  JOIN ext x ON t.q_id = x.q_id AND t.vec_id = x.vec_id
        |  GROUP BY t.nprobe, t.q_id)
        |SELECT nc.nprobe, nc.q_id, CAST(nc.n_cand AS BIGINT) AS n_cand,
        |  CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
        |  CAST(coalesce(h.h, 0) * 1048576 // 10 AS BIGINT) AS recall_fp
        |FROM nc LEFT JOIN h ON nc.nprobe = h.nprobe AND nc.q_id = h.q_id
        |ORDER BY nc.nprobe, nc.q_id""".stripMargin,
    // the oracle RE-DERIVES the stored index from scratch (same PQ
    // train + cell centroids as simsearch_ivf_pq) and serves nprobe=4
    // top-10 — hash-equality certifies stored-index serving ≡ recompute
    // the whole maintenance pipeline re-derived: old-slice floor-mean
    // centroids, global argmin assignment (src from the slice test),
    // retrained means over the maintained membership, L1 drift
    "simsearch_index_maintain" ->
      """WITH fp AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |oldv AS (SELECT * FROM fp WHERE vec_id % 8 <> 7),
        |cx AS (SELECT label, CAST(generate_subscripts(qv, 1) AS BIGINT)
        |    AS pos, unnest(qv) AS x FROM oldv),
        |cm AS (SELECT label, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY label, pos),
        |cells AS (SELECT label AS cell, list(c ORDER BY pos) AS cfp
        |  FROM cm GROUP BY label),
        |asg AS (SELECT vec_id, cell, src FROM (
        |    SELECT f.vec_id, c.cell,
        |      CASE WHEN f.vec_id % 8 = 7 THEN 1 ELSE 0 END AS src,
        |      row_number() OVER (PARTITION BY f.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(f.qv, c.cfp),
        |          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC, c.cell) AS rn
        |    FROM fp f, cells c) WHERE rn = 1),
        |rx AS (SELECT a.cell, CAST(generate_subscripts(f.qv, 1) AS BIGINT)
        |    AS pos, unnest(f.qv) AS x
        |  FROM asg a JOIN fp f ON a.vec_id = f.vec_id),
        |rm AS (SELECT cell, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c2
        |  FROM rx GROUP BY cell, pos),
        |cpos AS (SELECT cell, CAST(generate_subscripts(cfp, 1) AS BIGINT)
        |    AS pos, unnest(cfp) AS c1 FROM cells),
        |drift AS (SELECT cell, CAST(sum(abs(c2 - c1)) AS BIGINT)
        |    AS drift_l1
        |  FROM rm JOIN cpos USING (cell, pos) GROUP BY cell),
        |counts AS (SELECT cell,
        |    CAST(sum(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_v0,
        |    CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new
        |  FROM asg GROUP BY cell)
        |SELECT c.cell, CAST(coalesce(n_v0, 0) AS BIGINT) AS n_v0,
        |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(coalesce(drift_l1, -1) AS BIGINT) AS drift_l1
        |FROM cells c LEFT JOIN counts USING (cell)
        |LEFT JOIN drift USING (cell)
        |ORDER BY c.cell""".stripMargin,
    "simsearch_index_serve" ->
      """WITH fp AS (SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ms AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS m),
        |subs AS (SELECT vec_id, m,
        |    list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv FROM fp, ms),
        |seeds AS (SELECT m, vec_id AS cid, sv AS cq FROM subs
        |  WHERE vec_id < 16),
        |d1 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN seeds c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, cid FROM
        |    (SELECT vec_id, m, sv, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |cx AS (SELECT m, cid, CAST(generate_subscripts(sv, 1) AS BIGINT)
        |    AS pos, unnest(sv) AS x FROM a1),
        |cm AS (SELECT m, cid, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY m, cid, pos),
        |cents AS (SELECT m, cid, list(c ORDER BY pos) AS cent
        |  FROM cm GROUP BY m, cid),
        |d2 AS (SELECT s.vec_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN cents c USING (m)),
        |codes AS (SELECT vec_id, m, cid FROM
        |    (SELECT vec_id, m, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM subs s JOIN cents c USING (m) WHERE s.vec_id < 5),
        |icx AS (SELECT label, CAST(generate_subscripts(qv, 1) AS BIGINT)
        |    AS pos, unnest(qv) AS x FROM fp),
        |icm AS (SELECT label, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM icx GROUP BY label, pos),
        |cells AS (SELECT label AS cell, list(c ORDER BY pos) AS cfp
        |  FROM icm GROUP BY label),
        |qs AS (SELECT vec_id AS q_id, qv FROM fp WHERE vec_id < 5),
        |pr AS (SELECT q_id, cell,
        |    CAST(list_sum(list_transform(list_zip(qv, cfp),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM qs, cells),
        |ranked AS (SELECT q_id, cell, CAST(row_number() OVER (PARTITION BY
        |    q_id ORDER BY pd DESC, cell) AS BIGINT) AS cr FROM pr),
        |mem AS (SELECT r.q_id, e.vec_id
        |  FROM ranked r JOIN embeddings e ON e.label = r.cell
        |  WHERE r.cr <= 4 AND e.vec_id <> r.q_id),
        |adc AS (SELECT mb.q_id, mb.vec_id,
        |    CAST(sum(l.pd) AS BIGINT) AS adc
        |  FROM mem mb JOIN codes k ON k.vec_id = mb.vec_id
        |  JOIN lut l ON l.q_id = mb.q_id AND l.m = k.m AND l.cid = k.cid
        |  GROUP BY mb.q_id, mb.vec_id)
        |SELECT q_id, rn, vec_id, adc FROM
        |    (SELECT q_id, vec_id, adc, CAST(row_number() OVER (PARTITION BY
        |      q_id ORDER BY adc DESC, vec_id) AS BIGINT) AS rn FROM adc)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    // same subvector split / seed assign / floor-mean refine / code
    // assign / ADC-LUT scoring / exact fixed-point-dot baseline
    "embedding_pq_quantize" ->
      """WITH fp AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ms AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS m),
        |subs AS (SELECT vec_id, m,
        |    list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv FROM fp, ms),
        |seeds AS (SELECT m, vec_id AS cid, sv AS cq FROM subs
        |  WHERE vec_id < 16),
        |d1 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN seeds c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, cid FROM
        |    (SELECT vec_id, m, sv, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d1)
        |  WHERE rn = 1),
        |cx AS (SELECT m, cid, CAST(generate_subscripts(sv, 1) AS BIGINT)
        |    AS pos, unnest(sv) AS x FROM a1),
        |cm AS (SELECT m, cid, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY m, cid, pos),
        |cents AS (SELECT m, cid, list(c ORDER BY pos) AS cent
        |  FROM cm GROUP BY m, cid),
        |d2 AS (SELECT s.vec_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqd
        |  FROM subs s JOIN cents c USING (m)),
        |codes AS (SELECT vec_id, m, cid FROM
        |    (SELECT vec_id, m, cid, row_number() OVER
        |      (PARTITION BY vec_id, m ORDER BY sqd, cid) AS rn FROM d2)
        |  WHERE rn = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.m, c.cid,
        |    CAST(list_sum(list_transform(list_zip(s.sv, c.cent),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM subs s JOIN cents c USING (m) WHERE s.vec_id < 5),
        |adc AS (SELECT l.q_id, k.vec_id, CAST(sum(l.pd) AS BIGINT) AS adc
        |  FROM codes k JOIN lut l ON k.m = l.m AND k.cid = l.cid
        |  WHERE k.vec_id <> l.q_id GROUP BY l.q_id, k.vec_id),
        |pq AS (SELECT q_id, vec_id FROM
        |    (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY adc DESC, vec_id) AS rn FROM adc)
        |  WHERE rn <= 10),
        |qs AS (SELECT vec_id AS q_id, qv AS qq FROM fp WHERE vec_id < 5),
        |exd AS (SELECT q.q_id, f.vec_id,
        |    CAST(list_sum(list_transform(list_zip(f.qv, q.qq),
        |      p -> p[1] * p[2])) AS BIGINT) AS dot
        |  FROM fp f, qs q WHERE f.vec_id <> q.q_id),
        |ext AS (SELECT q_id, vec_id FROM
        |    (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY dot DESC, vec_id) AS rn FROM exd)
        |  WHERE rn <= 10),
        |qe AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |exc AS (SELECT q.q_id, e.vec_id,
        |    round(list_dot_product(qe, CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |            CAST(e.embedding AS DOUBLE[])))), 6) AS score
        |  FROM qe q, embeddings e WHERE e.vec_id <> q.q_id),
        |extc AS (SELECT q_id, vec_id FROM
        |    (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id) AS rn FROM exc)
        |  WHERE rn <= 10),
        |h AS (SELECT p.q_id, count(*) AS h FROM pq p
        |  JOIN ext x ON p.q_id = x.q_id AND p.vec_id = x.vec_id
        |  GROUP BY p.q_id),
        |hc AS (SELECT p.q_id, count(*) AS hc FROM pq p
        |  JOIN extc x ON p.q_id = x.q_id AND p.vec_id = x.vec_id
        |  GROUP BY p.q_id),
        |ns AS (SELECT q_id, count(*) AS n_scored FROM adc GROUP BY q_id)
        |SELECT ns.q_id, CAST(ns.n_scored AS BIGINT) AS n_scored,
        |  CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
        |  CAST(coalesce(hc.hc, 0) AS BIGINT) AS hits_cos,
        |  CAST(coalesce(h.h, 0) * 1048576 // 10 AS BIGINT) AS recall_fp,
        |  CAST(coalesce(hc.hc, 0) * 1048576 // 10 AS BIGINT)
        |    AS recall_cos_fp
        |FROM ns LEFT JOIN h ON ns.q_id = h.q_id
        |LEFT JOIN hc ON ns.q_id = hc.q_id
        |ORDER BY ns.q_id""".stripMargin,
    "eval_ann_recall" ->
      """WITH fp AS (SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cx AS (SELECT label, CAST(generate_subscripts(qv, 1) AS BIGINT) AS pos,
        |    unnest(qv) AS x FROM fp),
        |cm AS (SELECT label, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |  FROM cx GROUP BY label, pos),
        |cells AS (SELECT label AS cell, list(c ORDER BY pos) AS cfp
        |  FROM cm GROUP BY label),
        |qs AS (SELECT vec_id AS q_id, qv FROM fp WHERE vec_id < 5),
        |pr AS (SELECT q_id, cell,
        |    CAST(list_sum(list_transform(list_zip(qv, cfp),
        |      p -> p[1] * p[2])) AS BIGINT) AS pd
        |  FROM qs, cells),
        |ranked AS (SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
        |    ORDER BY pd DESC, cell) AS cr FROM pr),
        |probes AS (SELECT unnest([1, 2, 4, 10]) AS nprobe),
        |probed AS (SELECT CAST(nprobe AS BIGINT) AS nprobe, q_id, cell
        |  FROM ranked, probes WHERE cr <= nprobe),
        |qe AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |cand AS (SELECT p.nprobe, p.q_id, e.vec_id,
        |    round(list_dot_product(qe, CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |            CAST(e.embedding AS DOUBLE[])))), 6) AS score
        |  FROM probed p JOIN embeddings e ON e.label = p.cell
        |  JOIN qe ON qe.q_id = p.q_id WHERE e.vec_id <> p.q_id),
        |ivf AS (SELECT nprobe, q_id, vec_id FROM
        |    (SELECT nprobe, q_id, vec_id,
        |       row_number() OVER (PARTITION BY nprobe, q_id
        |         ORDER BY score DESC, vec_id) AS rn FROM cand)
        |  WHERE rn <= 10),
        |ex AS (SELECT q.q_id, e.vec_id,
        |    round(list_dot_product(qe, CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |            CAST(e.embedding AS DOUBLE[])))), 6) AS score
        |  FROM qe q, embeddings e WHERE e.vec_id <> q.q_id),
        |ext AS (SELECT q_id, vec_id FROM
        |    (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |       ORDER BY score DESC, vec_id) AS rn FROM ex)
        |  WHERE rn <= 10),
        |h AS (SELECT i.nprobe, i.q_id, count(*) AS h FROM ivf i
        |  JOIN ext x ON i.q_id = x.q_id AND i.vec_id = x.vec_id
        |  GROUP BY i.nprobe, i.q_id),
        |nc AS (SELECT nprobe, q_id, count(*) AS n_cand
        |  FROM cand GROUP BY nprobe, q_id)
        |SELECT nc.nprobe, nc.q_id, CAST(nc.n_cand AS BIGINT) AS n_cand,
        |  CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
        |  CAST(coalesce(h.h, 0) * 1048576 // 10 AS BIGINT) AS recall_fp
        |FROM nc LEFT JOIN h ON nc.nprobe = h.nprobe AND nc.q_id = h.q_id
        |ORDER BY nc.nprobe, nc.q_id""".stripMargin,
    "ml_confusion_matrix" ->
      """WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE vec_id < 4),
        |d AS (SELECT q.vec_id, q.label, s.cid,
        |    CAST(list_sum(list_transform(list_zip(q.qv, s.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqdist
        |  FROM q, s),
        |a AS (SELECT vec_id, label, cid,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sqdist, cid) AS rn FROM d)
        |SELECT label, cid, count(*) AS n
        |FROM a WHERE rn = 1
        |GROUP BY label, cid ORDER BY label, cid""".stripMargin,
    "eval_ranking_metrics" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT q_id, q_label, vec_id, label,
        |    round(list_dot_product(qe, CAST(embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |            CAST(embedding AS DOUBLE[])))), 6) AS score
        |  FROM q, embeddings WHERE vec_id <> q_id),
        |r AS (SELECT q_id, q_label, vec_id, label,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id) AS rn
        |  FROM s)
        |SELECT q_id, q_label,
        |  CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  CAST((sum(CASE WHEN label = q_label THEN 1 ELSE 0 END)
        |    * 1048576) // 10 AS BIGINT) AS p_at_10_fp
        |FROM r WHERE rn <= 10
        |GROUP BY q_id, q_label ORDER BY q_id""".stripMargin,
    "dedup_semantic_cluster" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE vec_id < 4),
        |d AS (SELECT q.vec_id, s.cid,
        |    CAST(list_sum(list_transform(list_zip(q.qv, s.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqdist
        |  FROM q, s),
        |a AS (SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sqdist, cid) AS rn FROM d),
        |v AS (SELECT a.cid, e.vec_id, CAST(e.embedding AS DOUBLE[]) AS de
        |  FROM a JOIN embeddings e USING (vec_id) WHERE a.rn = 1),
        |p AS (SELECT x.cid, x.vec_id AS a_id, y.vec_id AS b_id,
        |    round(list_dot_product(x.de, y.de) /
        |      (sqrt(list_dot_product(x.de, x.de)) *
        |       sqrt(list_dot_product(y.de, y.de))), 6) AS cos
        |  FROM v x JOIN v y ON x.cid = y.cid AND x.vec_id <> y.vec_id),
        |r AS (SELECT cid, a_id, b_id, cos,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos DESC, b_id) AS rn FROM p)
        |SELECT a_id AS vec_id, cid, b_id AS nn_id, cos
        |FROM r WHERE rn = 1 AND cos >= 0.4 ORDER BY vec_id""".stripMargin,
    "ml_kmeans_step" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE vec_id < 4),
        |d AS (SELECT q.vec_id, s.cid, q.qv[1] AS d0,
        |    CAST(list_sum(list_transform(list_zip(q.qv, s.cq),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS sqdist
        |  FROM q, s),
        |a AS (SELECT vec_id, cid, d0, sqdist,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sqdist, cid) AS rn FROM d)
        |SELECT cid, count(*) AS n_members,
        |  CAST(sum(sqdist) AS BIGINT) AS sum_sqdist,
        |  CAST(sum(d0) AS BIGINT) AS sum_d0
        |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin,
    "multimodal_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS content_sha,
        |  'text/plain;len=' || octet_length(encode(text)) AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    // simsearch_ann_ivf: ✖ approximate by design; recall unit-tested
    "multimodal_decode_stub" -> {
      // documents LEFT JOIN the per-position aggregate (ADVICE r2): a doc
      // with empty text has no positions to unnest, but the Spark side
      // still emits a zeros row for it — coalesce keeps the sides aligned.
      val sums = (0 until 16).map(b =>
        f"  sum(CASE WHEN ord(substring(text, i, 1)) %% 16 = $b THEN 1 ELSE 0 END) AS s$b%02d")
        .mkString(",\n")
      val outs = (0 until 16).map(b =>
        f"  CAST(coalesce(h.s$b%02d, 0) AS BIGINT) AS b$b%02d").mkString(",\n")
      s"""WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
         |            FROM documents),
         |hist AS (SELECT doc_id,
         |$sums
         |         FROM pos GROUP BY doc_id)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_bytes,
         |$outs
         |FROM documents d LEFT JOIN hist h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    "multimodal_resize_stub" ->
      """SELECT doc_id, CAST(128 AS BIGINT) AS resized_bytes,
        |  sha256(array_to_string(list_transform(range(0, 128),
        |    i -> substring(text,
        |           CAST((i * length(text) // 128) % length(text) AS INT) + 1, 1)), ''))
        |    AS resized_sha,
        |  CAST(length(text) AS BIGINT) AS orig_bytes
        |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, CAST(fidx AS BIGINT) AS fidx,
        |  sha256(substring(text, (fidx - 1) * 64 + 1, 64)) AS frame_sha,
        |  CAST(length(substring(text, (fidx - 1) * 64 + 1, 64)) AS BIGINT) AS frame_len
        |FROM (SELECT doc_id, text,
        |        unnest(range(1, CAST(ceil(length(text) / 64.0) AS INT) + 1, 4)) AS fidx
        |      FROM documents WHERE length(text) > 0)
        |ORDER BY doc_id, fidx""".stripMargin
  )
}
