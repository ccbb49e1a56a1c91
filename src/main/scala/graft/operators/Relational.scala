package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryFn, Tables}

/** Scans, filters, projections and joins (SURVEY.md §2.1–2.3).
  *
  * The Hadoop-MR reference class expresses scans as InputFormat splits,
  * filters/projections as map-side user code, and joins as either
  * reduce-side repartition joins or map-side distributed-cache joins.
  * Here each is a declarative plan; Catalyst provides pushdown, pruning
  * and join-strategy selection, AQE re-plans at runtime.
  */
object Relational {

  // ---- §2.1 scans / sources -------------------------------------------

  /** Full-scan count (MR input-split read analog). The count aggregates
    * per-split partial counts — no shuffle of row data at any scale. */
  def scanParquet(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n_rows"))

  /** Column-pruned scan: parquet reader materializes only 2 of 11
    * columns (check ReadSchema in explain). At 100 TB this is the
    * difference between reading ~18% and 100% of the bytes. */
  def scanProjectionPruning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity")
      .orderBy($"l_orderkey", $"l_quantity")
  }

  /** Semi-structured ingestion: JSON string column → typed field.
    * get_json_object is codegen'd; no UDF, pushdown unaffected. */
  def sourceJsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id", get_json_object($"props", "$.k").cast(IntegerType).as("k"))
      .orderBy($"event_id")
  }

  /** Deep nested-schema flatten — the log-ingest shape events.props is
    * too shallow to exercise: a struct-of-array document
    * `{meta:{kind,day}, items:[{i,v}…]}` parsed with an explicit
    * schema (`from_json`), dot-path extraction (`j.meta.kind`), and
    * `posexplode` of the inner array. The nested column is DERIVED
    * deterministically from events (the text_pii_scrub
    * injected-fixture precedent) with integer-only leaf values — a
    * double serialized into JSON formats differently across engines,
    * a BIGINT doesn't. At 100 TB this is the one-pass semi-structured
    * path: explicit schema (no inference scan), the parse + explode
    * pipeline whole-stage-codegens, and flattening multiplies rows by
    * the bounded items arity, never joins. The DuckDB oracle builds
    * the same JSON text and extracts with `$.`-path `json_extract` —
    * the hash-match certifies parse+flatten parity end to end. */
  def sourceJsonNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        ($"value".cast("decimal(18,4)") * 10000).cast("long").as("v_fp"),
        Tables.nsToUs($"ts").as("t"))
      .select($"event_id", $"event_type", $"v_fp",
        expr("t div 86400000000").as("day"))
    val doc = base.select($"event_id", concat(
      lit("""{"meta":{"kind":""""), $"event_type", lit("\",\"day\":"), $"day",
      lit("""},"items":[{"i":0,"v":"""), $"v_fp",
      lit("""},{"i":1,"v":"""), ($"v_fp" * 2),
      lit("}]}")).as("doc"))
    val schema = "STRUCT<meta: STRUCT<kind: STRING, day: BIGINT>, " +
      "items: ARRAY<STRUCT<i: BIGINT, v: BIGINT>>>"
    doc.select($"event_id",
        from_json($"doc", schema, Map.empty[String, String]).as("j"))
      .select($"event_id", $"j.meta.kind".as("kind"), $"j.meta.day".as("day"),
        posexplode($"j.items"))
      .select($"event_id", $"kind", $"day", $"pos".cast("long").as("pos"),
        $"col.i".as("i"), $"col.v".as("v"))
      .orderBy($"event_id", $"pos")
  }

  /** CSV round-trip (MR TextInputFormat analog): export nation to CSV,
    * read it back with an explicit schema (schema inference would cost
    * an extra full pass at scale). Oracled against the ORIGINAL nation
    * parquet: the graded property is a value-preserving round trip. */
  def sourceCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("csv_roundtrip")
    graft.PlanOnly.roundTrip(Tables.nation(spark, dir).orderBy($"n_nationkey")) {
      Tables.nation(spark, dir).write.mode("overwrite").option("header", "true").csv(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      spark.read.option("header", "true").schema(schema).csv(tmp)
        .orderBy($"n_nationkey")
    }
  }

  /** ORC round-trip: same dance as CSV through Spark's second columnar
    * format (predicate pushdown + vectorized read apply to ORC too).
    * Oracled against the original supplier parquet (value-preserving
    * round trip, doubles bit-exact through ORC). */
  def sourceOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("orc_roundtrip")
    graft.PlanOnly.roundTrip(Tables.supplier(spark, dir).orderBy($"s_suppkey")) {
      Tables.supplier(spark, dir).write.mode("overwrite").orc(tmp)
      spark.read.orc(tmp).orderBy($"s_suppkey")
    }
  }

  /** JSON-lines round-trip with explicit schema (inference would scan
    * twice). Oracled against the original region parquet (value-
    * preserving round trip). */
  def sourceJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("jsonl_roundtrip")
    val src = Tables.region(spark, dir)
    graft.PlanOnly.roundTrip(src.orderBy($"r_regionkey")) {
      src.write.mode("overwrite").json(tmp)
      spark.read.schema(src.schema).json(tmp).orderBy($"r_regionkey")
    }
  }

  /** Partitioned-layout round trip — the 100 TB read path made a graded
    * artifact: events land hive-partitioned by day
    * (Sinks.writePartitioned), and the readback filters a 7-day range so
    * the scan prunes 23 of 30 day directories before reading a byte
    * (`PartitionFilters` — asserted in SinksSpec). Day is computed with
    * exact integer division on microseconds (`div`, not `/`: Column./
    * is double division) so it matches DuckDB's `//` on `epoch_us`.
    * The oracle runs on the ORIGINAL events parquet — the round trip
    * must be value-preserving for the hash to match. */
  def sinkPartitionedRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("partitioned_events")
    val src = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("day", expr("ts_us div 86400000000"))
    graft.PlanOnly.roundTrip(src) {
      graft.sources.Sinks.writePartitioned(src, tmp, "day")
      // Explicit schema on the readback: directory-name inference would
      // type day as int (pinned back to long below either way), and an
      // EMPTY write leaves no part files to infer from at all.
      spark.read.schema(src.schema).parquet(tmp)
    }
      .withColumn("day", $"day".cast("long"))
      .filter($"day" >= 19730L && $"day" <= 19736L)
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec4($"value")).cast("double").as("sum_value"))
      .orderBy($"day", $"event_type")
  }

  /** DYNAMIC PARTITION PRUNING receipt — the third leg of the layout
    * story (sink_partitioned_read = static directory pruning,
    * sink_bucketed_join = shuffle elimination; this = the RUNTIME
    * prune): the fact side is the day-partitioned event copy, the dim
    * side a small day dimension whose predicate — days with an ODD
    * event count — is aggregate-derived, so no static rewrite can put
    * it on the fact scan (constraint propagation stops at the
    * aggregate); only DPP can keep the scan from reading every
    * partition. Spark plans a DynamicPruningExpression subquery on the
    * fact scan's PartitionFilters (pinned in PlanRegressionSpec); at
    * 100 TB this
    * is the difference between scanning 3 partitions and 3 000. The
    * graded frame is the joined per-day census, oracled by the direct
    * filter — correctness certifies the prune dropped no row.
    *
    * Scale shape: dim side broadcasts; the fact scan reads only the
    * dim's surviving day directories; the aggregate is
    * map-side-combinable on (day, type). */
  def scanDynamicPartitionPruning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.events(spark, dir)
      .select($"event_id", $"event_type", Tables.dec4($"value").as("v"),
        Tables.nsToUs($"ts").as("ts_us"))
      .withColumn("day", expr("ts_us div 86400000000"))
      .drop("ts_us")
    def shaped(fact: DataFrame, dim: DataFrame): DataFrame =
      fact.join(broadcast(dim), Seq("day"))
        .groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n"),
          (sum($"v") * 10000).cast("long").as("v_sum_4dp"))
        .orderBy($"day", $"event_type")
    // the dim's predicate is AGGREGATE-derived (days with an odd event
    // count) — a constraint Catalyst cannot propagate statically onto
    // the fact scan (InferFiltersFromConstraints stops at the
    // aggregate), so the partition prune can ONLY happen at runtime
    val dim = src.groupBy($"day").agg(count(lit(1)).as("c"))
      .filter($"c" % 2 === 1).select($"day")
    graft.PlanOnly.roundTrip(shaped(src, dim)) {
      val tmp = dppStages.computeIfAbsent(dir, _ => {
        val t = Tables.scratch(s"dpp_events_${dir.hashCode & Int.MaxValue}")
        graft.sources.Sinks.writePartitioned(src, t, "day")
        t
      })
      val fact = spark.read.schema(src.schema).parquet(tmp)
        .withColumn("day", $"day".cast("long"))
      shaped(fact, dim)
    }
  }
  private val dppStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bucketed co-located join — the other half of the 100 TB layout
    * story (sink_partitioned_read covers directory pruning; this covers
    * shuffle elimination). Both fact tables land bucketed+sorted on the
    * join key via Sinks.writeBucketed: a later sort-merge join reads
    * pre-partitioned, pre-sorted buckets with NO exchange and NO sort
    * on either side (asserted with broadcast/AQE pinned off in
    * BucketingSpec — under the graded run's AQE the small SF simply
    * broadcasts). The oracle runs the same join+agg on the ORIGINAL
    * tables: the bucketed round trip must preserve every row. */
  def sinkBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 32 buckets: bucket count bounds write parallelism (one task per
    // bucket after writeBucketed's repartition), so match the core
    // count; a 100 TB table would use hundreds of buckets for the same
    // reason.
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice")
    val ob = graft.PlanOnly.roundTrip(o) {
      graft.sources.Sinks.writeBucketed(o, "orders_bkt", 32, "o_orderkey")
      spark.table("orders_bkt")
    }
    val lb = graft.PlanOnly.roundTrip(l) {
      graft.sources.Sinks.writeBucketed(l, "lineitem_bkt", 32, "l_orderkey")
      spark.table("lineitem_bkt")
    }
    ob.join(lb, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(Tables.dec2($"l_extendedprice")).cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Corpus-table layouts — the two physical layouts an LLM pipeline
    * actually ships for documents/embeddings, in one key: documents
    * hive-partitioned by `lang` (the column every corpus job slices
    * by — readers prune whole directories via PartitionFilters) and
    * embeddings BUCKETED by `vec_id` (the doc-hash join key — the
    * doc⋈vec join reads pre-shuffled buckets, no exchange on the
    * embedding side; pinned in BucketingSpec). The graded query reads
    * the 'en' partition only and joins it back to the bucketed
    * embeddings: at 100 TB that is one directory subtree scanned, one
    * side of the join exchange eliminated, and the float array
    * reduced to an 8-byte fixed-point scalar BEFORE the shuffle. The
    * oracle runs the same join+agg on the ORIGINAL tables — the
    * layout round trip must preserve every row. */
  def sinkCorpusLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("corpus_layout_docs")
    val src = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars", $"lang")
    val vecs = Tables.embeddings(spark, dir).select($"vec_id", $"label",
      floor(element_at($"embedding", 1).cast("double") * lit(1099511627776.0))
        .cast("long").as("e0_fp"))
    val docsBack = graft.PlanOnly.roundTrip(src) {
      graft.sources.Sinks.writePartitioned(src, tmp, "lang")
      // explicit schema: directory inference has nothing to type on an
      // empty write (sink_partitioned_read precedent)
      spark.read.schema(src.schema).parquet(tmp)
    }
    val vecsBack = graft.PlanOnly.roundTrip(vecs) {
      graft.sources.Sinks.writeBucketed(vecs, "embeddings_bkt", 32, "vec_id")
      spark.table("embeddings_bkt")
    }
    docsBack
      .filter($"lang" === "en")
      .join(vecsBack, $"doc_id" === $"vec_id")
      .groupBy($"label")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        sum($"e0_fp").as("sum_e0_fp"))
      .select($"label".cast("long").as("label"), $"n_docs", $"sum_chars",
        $"sum_e0_fp")
      .orderBy($"label")
  }

  // ---- §2.2 filters / projections -------------------------------------

  /** Distributed grep — the canonical MR demo workload. rlike is a
    * codegen'd regex filter; the scan prunes to (doc_id, text). */
  def filterGrep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"text".rlike("\\bjoin\\b"))
      .select($"doc_id", $"text")
      .orderBy($"doc_id")
  }

  /** Compound predicate: range + IN + comparison, all pushable to the
    * parquet reader (row-group/page skipping at scale). */
  def filterPredicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-12-31").cast("timestamp")
        && $"l_returnflag".isin("A", "R")
        && $"l_quantity" > 25)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag", $"l_shipdate")
      // (l_orderkey, l_linenumber) is NOT unique in this data — order by
      // every output column so the multiset order is total.
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag", $"l_shipdate")
  }

  /** Projection with computed column (map-side emit). Money math in
    * exact decimal, presented as double (SURVEY.md §7 G2). */
  def projectDerived(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        (Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"l_orderkey", $"l_linenumber", $"revenue")
  }

  // ---- §2.3 joins ------------------------------------------------------

  /** Reduce-side repartition equi-join (MR's standard join): both sides
    * shuffle on the key → SortMergeJoin/ShuffledHashJoin. At scale this
    * is the shuffle-heavy path; key choice = FK so no skew. */
  def joinShuffleEqui(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey", "inner")
      .select($"o_orderkey", $"l_linenumber", $"o_totalprice", $"l_quantity")
      .orderBy($"o_orderkey", $"l_linenumber", $"o_totalprice", $"l_quantity")
  }

  /** Manually salted repartition join — the skew fallback when one join
    * key is hot enough that AQE's OptimizeSkewedJoin split still leaves
    * a straggler reducer. The big side derives a salt from the ROW
    * (hash, not rand(): deterministic, so retries/speculative tasks
    * agree), the small side replicates once per salt value, and the
    * join key becomes (key, salt) — the hot key's rows spread over
    * `Salt` reducers. Cost: small side ×Salt, so salt only the skewed
    * keys in production (split + union). Oracled against the PLAIN
    * equi-join — salting must not change the result set. */
  def joinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Salt = 8
    val big = Tables.lineitem(spark, dir)
      .withColumn("__salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(Salt)))
    val small = Tables.orders(spark, dir)
      .withColumn("__salt", explode(array((0 until Salt).map(s => lit(s.toLong)): _*)))
    big.join(small, $"l_orderkey" === $"o_orderkey" && big("__salt") === small("__salt"))
      .select($"o_orderkey", $"l_linenumber", $"o_orderpriority", $"l_quantity")
      .orderBy($"o_orderkey", $"l_linenumber", $"o_orderpriority", $"l_quantity")
  }

  /** Map-side join (MR distributed-cache analog): part is dim-sized, so
    * broadcast it — zero shuffle of the fact table at any scale. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"p_name", $"p_retailprice")
      .orderBy($"l_orderkey", $"l_linenumber", $"p_name", $"p_retailprice")
  }

  /** 4-table star join rolled up to region revenue. The three dim tables
    * are broadcast (region/nation trivially, customer is 1.5M rows at
    * sf100 — still broadcastable; at larger scale AQE falls back to
    * shuffle join on the FK). */
  def joinMultiwayStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.dec2($"o_totalprice")).cast("double").as("revenue"))
      .orderBy($"r_name")
  }

  /** Left outer join preserving customers without orders, aggregated to
    * per-customer order count + spend. */
  def joinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(sum(Tables.dec2($"o_totalprice")).cast("double"), lit(0.0)).as("spent"))
      .orderBy($"c_custkey")
  }

  /** Left-semi: customers having at least one URGENT order (EXISTS).
    * Semi-join ships only the key column of the right side. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(spark, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-anti: customers with no orders at all (NOT EXISTS). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Full outer join with genuinely unmatched rows on BOTH sides
    * (even-keyed customers vs 1997 orders). Null keys surface as -1:
    * nullable BIGINTs are comparator hazards (SURVEY.md §7 G2). */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).filter($"c_custkey" % 2 === 0)
      .select($"c_custkey")
    val o = Tables.orders(spark, dir).filter(year($"o_orderdate") === 1997)
      .select($"o_orderkey", $"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
      .select(coalesce($"c_custkey", lit(-1L)).as("ck"),
        coalesce($"o_orderkey", lit(-1L)).as("ok"))
      .orderBy($"ck", $"ok")
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other instead of silently dropping — the semantics a
    * CDC/merge pipeline needs when the join key is legitimately absent
    * on both sides. Crucially `EqualNullSafe` is still an EQUI-join
    * predicate in Catalyst: it hash-partitions (NULL is just one more
    * key bucket) and never degrades to the O(n·m) nested-loop a
    * `coalesce(k, sentinel) = coalesce(k2, sentinel)` workaround risks
    * when sentinel types clash. Output buckets keyed by
    * coalesce(k, -1) (nullable group keys are comparator hazards,
    * SURVEY.md §7 G2). */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .select(expr("nullif(c_nationkey % 5, 0)").as("k"))
    val s = Tables.supplier(spark, dir)
      .select(expr("nullif(s_nationkey % 5, 0)").as("k2"))
    c.join(s, $"k" <=> $"k2")
      .groupBy(coalesce($"k", lit(-1)).as("k"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy($"k")
  }

  /** Range/theta join, bucketized: lineitems shipped within 7 days of
    * each order's date. A naive theta join is BroadcastNestedLoopJoin
    * (O(n·m) — lethal at scale); instead explode each order into its 7
    * day-keys and equi-join on the day (dates are midnight-aligned in
    * this data, so the bucket join is exact, no residual filter).
    * Shuffle volume: 7×|orders| + |lineitem|, both keyed on day. */
  def joinRangeTheta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", explode(sequence(to_date($"o_orderdate"),
        date_add(to_date($"o_orderdate"), 6))).as("d"))
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey", to_date($"l_shipdate").as("ship_d"))
    o.join(l, $"d" === $"ship_d", "left")
      .groupBy($"o_orderkey")
      .agg(count($"l_orderkey").as("n_items"))
      .orderBy($"o_orderkey")
  }

  /** BANDED self-join via BUCKET EQUI-JOIN — the scale rewrite of the
    * |a−b| ≤ band inequality join (joinRangeTheta covers the
    * interval-expansion variant; this is the VALUE-band one): every
    * order counts its price-comparable peers (±$10.00). A naive theta
    * join is n²; instead each row lands in bucket ⌊cents/band⌋ and
    * probes exactly the three neighbor buckets (a candidate pair
    * matches in exactly ONE of the probe's three exploded buckets, so
    * no dedup pass is needed), then the exact band predicate filters.
    * Candidate cost is Σ bucket-density² over the value domain —
    * 1.8 M candidates vs 22.5 G naive pairs at sf0.1 — and a hot
    * bucket salts like any hot equi-key.
    *
    * Scale shape: one shuffle on the bucket id, map-side-combinable
    * count, left-join-back for zero-comparable rows; the oracle runs
    * the direct BETWEEN theta join (DuckDB IEJoin), certifying the
    * rewrite drops and invents nothing. */
  def joinRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val band = 1000L // ±$10.00 in cents
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey",
        (Tables.dec2($"o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("b", expr(s"cents div $band"))
    val probe = o.select($"o_orderkey", $"cents",
      explode(array($"b" - 1, $"b", $"b" + 1)).as("nb"))
    val build = o.select($"o_orderkey".as("k2"), $"cents".as("c2"),
      $"b".as("nb"))
    val counts = probe.join(build, Seq("nb"))
      .filter(abs($"c2" - $"cents") <= band && $"k2" =!= $"o_orderkey")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_comparable"))
    o.select($"o_orderkey", $"cents")
      .join(counts, Seq("o_orderkey"), "left")
      .select($"o_orderkey", $"cents",
        coalesce($"n_comparable", lit(0L)).as("n_comparable"))
      .orderBy($"o_orderkey")
  }

  /** As-of self join: for every click, the most recent strictly-earlier
    * purchase by the same user. Implemented scalably as one pass over a
    * tagged union with a window (no nested-loop join): partition by
    * user, order by (ts, kind) with clicks before purchases at equal ts
    * so the strict `<` holds, then last(purchase_ts) over rows
    * [unbounded, -1]. DuckDB oracle uses its native ASOF JOIN. */
  def joinSelfAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // All comparisons happen at MICROsecond precision: DuckDB truncates
    // TIMESTAMP_NS parquet to µs on read, so its ASOF strictness test is
    // p.ts_us < c.ts_us. Ordering the window by raw nanos would include a
    // purchase that precedes a click within the same microsecond — a row
    // the oracle excludes. (kind: clicks sort before purchases at equal
    // ts_us, so rows [unbounded, -1] sees only strictly-earlier-µs
    // purchases.)
    val e = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"), $"event_type",
        when($"event_type" === "purchase", Tables.nsToUs($"ts")).as("pts_us"),
        when($"event_type" === "click", lit(0)).otherwise(lit(1)).as("kind"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prev_purchase_us0", last($"pts_us", ignoreNulls = true).over(w))
      .filter($"event_type" === "click")
      // coalesce to -1: nullable int64 would round-trip through float64
      // in pandas-based comparators.
      .select($"event_id", $"user_id", $"ts_us",
        coalesce($"prev_purchase_us0", lit(-1L)).as("prev_purchase_us"))
      .orderBy($"event_id")
  }

  /** Interval attribution: each purchase attributed to the LATEST click
    * by the same user strictly before it (µs precision) and at most one
    * hour earlier — the batch twin of the stream-stream interval join
    * the streaming mirror runs (StreamingMirror.intervalJoin;
    * StreamingSpec asserts the two agree on the shared fixture).
    *
    * Not a range join: a range join explodes to every (purchase, click)
    * pair inside the hour before aggregating. One sorted window pass
    * per user carries the latest-prior-click (ts, id) struct — the
    * attribution state is O(1) per row, the only shuffle is the hash
    * partition on user_id, and skew salts like any hot key. The 1 h
    * window then just filters the carried candidate.
    *
    * Determinism: purchases sort BEFORE clicks at equal ts_us (kind 0
    * vs 1), so the [unbounded, -1] frame sees only strictly-earlier-µs
    * clicks — matching the oracle's c.ts_us < p.ts_us. Among clicks at
    * the same µs, window order ends in event_id, so the carried struct
    * is the (max ts_us, max event_id) click — the oracle reproduces
    * that with max(ts)-then-max(id) grouping. */
  /** Column-level data profiling over the fact table — the
    * "know-your-data" report (row counts, null counts, distinct
    * cardinalities, value ranges per column) every ingestion pipeline
    * and query optimizer runs before anything else. One pass: the
    * eight numeric columns unpivot to (col_name, value) rows via
    * stack() inside the scan projection, then a single grouped
    * aggregate profiles all columns together — never eight separate
    * scans. All profiled columns are integer- or 2-dec-exact, so
    * min/max round-trip DECIMAL(18,2) with no FP boundary; distinct
    * counts partial-expand per column group.
    *
    * At 100 TB this is the shape to prefer over per-column jobs: the
    * unpivot multiplies rows ×8 but each carries 1 value, and the
    * aggregate is 8 groups — scan-bound, exactly like q1. */
  /** BENFORD first-digit profile per order priority — the audit /
    * fraud-screening classic (Benford 1938; Nigrini's forensic use):
    * the leading digit of every order's total (in cents — always ≥ 1,
    * so the digit is '1'–'9' with no zero case), counted per priority
    * class with the per-million share in exact fixed point. No
    * logarithms anywhere: the digit comes from the integer's decimal
    * string (identical rendering of a positive BIGINT on both
    * engines), and conformance-to-Benford is the CALLER's judgment
    * call on the emitted shares — the operator's job is the exact
    * profile. (Honest note: TPC-H totals are range-bounded, so this
    * fixture is deliberately NON-Benford — which is exactly what the
    * profile exhibits.)
    *
    * Scale shape: one map-side-combinable (priority, digit) aggregate
    * over the scan; the share decoration windows the ≤ 5×9-row
    * result. */
  def profileBenfordDigits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderpriority",
        substring((Tables.dec2($"o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"o_orderpriority", $"digit")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("share_ppm",
        expr("(n_orders * 1000000) div sum(n_orders) OVER " +
          "(PARTITION BY o_orderpriority)"))
      .select($"o_orderpriority", $"digit", $"n_orders", $"share_ppm")
      .orderBy($"o_orderpriority", $"digit")
  }

  def profileNumericStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS DECIMAL(18,2))").mkString(", ")
    Tables.lineitem(spark, dir)
      .select(expr(s"stack(${cols.length}, $stackArgs) AS (col_name, v)"))
      .groupBy($"col_name")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count($"v")).as("n_null"),
        countDistinct($"v").as("n_distinct"),
        min($"v").cast("double").as("min_v"),
        max($"v").cast("double").as("max_v"))
      .orderBy($"col_name")
  }

  /** Join-explosion diagnostic — the report you run BEFORE a self-join
    * or fact-fact join on a hot key: per key, the row count and the
    * n² pair contribution a same-key join would emit, plus each key's
    * share of the total estimated output. This is the number that
    * tells you to salt (join_skew_salted), cap super-nodes
    * (graph_copurchase_pairs), or block (dedup keys) — the planning
    * complement to those mitigations.
    *
    * Scale shape: one partial-aggregated count per key; the Σn² total
    * is an inline scalar re-aggregate of the ALREADY AGGREGATED count
    * frame (never a second fact scan, never a one-row cross join);
    * top-20 is TakeOrderedAndProject. Shares are exact ppm integers
    * (no float division). */
  def profileJoinExplosion(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_pje")
    spark.sql(
      """WITH k AS (
        |  SELECT user_id, count(*) AS n_rows
        |  FROM events_pje GROUP BY user_id)
        |SELECT user_id, n_rows, n_rows * n_rows AS pairs_est,
        |  (n_rows * n_rows * 1000000L)
        |    div (SELECT sum(n_rows * n_rows) FROM k) AS share_ppm
        |FROM k
        |ORDER BY pairs_est DESC, user_id LIMIT 20""".stripMargin)
  }

  /** Nearest-event as-of join, BOTH directions: each purchase matched
    * to its temporally closest click by the same user within ±1 h —
    * the sensor-fusion/session-stitching variant of the backward-only
    * as-of (join_self_asof) and backward-interval attribution
    * (join_interval_attribution). pandas calls this
    * `merge_asof(direction='nearest', tolerance=...)`; neither Spark
    * nor DuckDB has a native nearest as-of, so both sides compose it
    * from ordered primitives with IDENTICAL tie rules.
    *
    * Plan: ONE window pass over the tagged click∪purchase union per
    * direction — the nearest prior click is carried by a backward
    * [unbounded, -1] frame, the nearest next by a forward
    * [+1, unbounded] frame, then a pure projection picks the closer
    * valid side. No join at all: the event log shuffles once on
    * user_id and both frames ride the same sort (O(1) evaluator state
    * each). The oracle reproduces it as four aggregate joins.
    *
    * Tie rules (exact, µs integers end to end): a click at the
    * purchase's own µs counts as a prior at distance 0; equal
    * prior/next distance → prior; several prior clicks at the same µs
    * → max event_id (the interval-attribution rule); several next
    * clicks at the same µs → min event_id (first in time order). */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val e = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"),
        $"event_type",
        when($"event_type" === "click", lit(0)).otherwise(lit(1)).as("kind"))
      .withColumn("cstruct",
        when($"kind" === 0, struct($"ts_us", $"event_id")))
    val order = Seq($"ts_us", $"kind", $"event_id")
    val wPrev = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val tagged = e
      .withColumn("prior", last($"cstruct", ignoreNulls = true).over(wPrev))
      .withColumn("nxt", first($"cstruct", ignoreNulls = true).over(wNext))
      .filter($"event_type" === "purchase")
    val dp = $"ts_us" - $"prior.ts_us"
    val dn = $"nxt.ts_us" - $"ts_us"
    val pv = $"prior".isNotNull && dp <= hourUs
    val nv = $"nxt".isNotNull && dn <= hourUs
    tagged.select($"event_id".as("purchase_id"), $"user_id", $"ts_us",
      when(pv && (!nv || dp <= dn), lit("prior"))
        .when(nv, lit("next")).otherwise(lit("none")).as("side"),
      when(pv && (!nv || dp <= dn), $"prior.ts_us")
        .when(nv, $"nxt.ts_us").otherwise(lit(-1L)).as("click_ts_us"),
      when(pv && (!nv || dp <= dn), $"prior.event_id")
        .when(nv, $"nxt.event_id").otherwise(lit(-1L)).as("click_id"))
      .orderBy($"purchase_id")
  }

  /** Correlated LATERAL top-k join — "each customer with their 2
    * most-valuable orders": the LATERAL (ORDER BY … LIMIT k) subquery
    * shape BI tools emit constantly. The naive plan re-runs the inner
    * query per outer row; Catalyst's lateral decorrelation must
    * rewrite it to a per-key WindowGroupLimit (rank ≤ k pushed INTO
    * the window sort — each group keeps k rows of state, no full
    * per-key sort materialized) followed by one equi-join on custkey —
    * the same plan a hand-written row_number() top-k would get, which
    * is what survives at scale. Pinned in PlanRegressionSpec.
    *
    * Determinism: o_totalprice is 2-dec-exact so the double ORDER BY
    * compares identically cross-engine; ties break on o_orderkey
    * inside the lateral, and the outer ORDER BY ends in the unique
    * (c_custkey, o_orderkey). */
  def joinLateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_jlt")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_jlt")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |    AS o_totalprice
        |FROM customer_jlt c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_jlt
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
  }

  def joinIntervalAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", Tables.nsToUs($"ts").as("ts_us"), $"event_type",
        when($"event_type" === "purchase", lit(0)).otherwise(lit(1)).as("kind"))
      .withColumn("click_st",
        when($"kind" === 1, struct($"ts_us", $"event_id")))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("cand", last($"click_st", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("hit", $"cand".isNotNull &&
        $"cand.ts_us" >= $"ts_us" - lit(3600000000L))
      .select($"event_id".as("purchase_id"), $"user_id", $"ts_us",
        when($"hit", $"cand.ts_us").otherwise(lit(-1L)).as("click_ts_us"),
        when($"hit", $"cand.event_id").otherwise(lit(-1L)).as("click_id"))
      .orderBy($"purchase_id")
  }

  /** Catalog DML: CTAS into the warehouse + INSERT INTO + read back —
    * the managed-table write path (CREATE TABLE AS SELECT, appending
    * INSERT) a SQL-engine user expects beyond path-based sinks. Oracled
    * against the equivalent SELECT over the original parquet: the
    * catalog round trip must preserve every row. The warehouse
    * directory is cleared first because the in-memory catalog forgets
    * tables across JVMs while their directories survive (the
    * writeBucketed lesson). */
  def sqlCtasInsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.PlanOnly.roundTrip(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name", $"n_regionkey").orderBy($"n_nationkey")) {
      Tables.nation(spark, dir).createOrReplaceTempView("nation_src")
      spark.sql("DROP TABLE IF EXISTS nation_ctas")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "nation_ctas")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      spark.sql(
        """CREATE TABLE nation_ctas USING parquet AS
          |SELECT n_nationkey, n_name, n_regionkey FROM nation_src WHERE n_regionkey <> 4""".stripMargin)
      spark.sql(
        """INSERT INTO nation_ctas
          |SELECT n_nationkey, n_name, n_regionkey FROM nation_src WHERE n_regionkey = 4""".stripMargin)
      spark.table("nation_ctas").orderBy($"n_nationkey")
    }
  }

  /** XML round-trip through Spark 4's NATIVE xml datasource (the
    * spark-xml donation): part rows nest under a rowTag, read back
    * with an explicit schema. XML is the interchange format
    * enterprise feeds still arrive in; the graded property is
    * value preservation — including doubles, whose Java
    * shortest-representation toString guarantees an exact parse
    * round trip. Per-row parse, partition-parallel like every other
    * text source. */
  def sourceXmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("xml_roundtrip")
    val cols = Seq($"p_partkey", $"p_name", $"p_brand", $"p_size", $"p_retailprice")
    graft.PlanOnly.roundTrip(
        Tables.part(spark, dir).select(cols: _*).orderBy($"p_partkey")) {
      Tables.part(spark, dir).select(cols: _*)
        .write.mode("overwrite").option("rowTag", "part").xml(tmp)
      val schema = StructType(Seq(
        StructField("p_partkey", LongType), StructField("p_name", StringType),
        StructField("p_brand", StringType), StructField("p_size", IntegerType),
        StructField("p_retailprice", DoubleType)))
      spark.read.option("rowTag", "part").schema(schema).xml(tmp)
        .select(cols: _*)
        .orderBy($"p_partkey")
    }
  }

  /** Categorical-imbalance profile — Gini impurity per categorical
    * column, the know-your-data skew metric that says whether a
    * dimension is balanced enough to partition/stratify on. Entropy
    * needs log (banned cross-engine); Gini = 1 − Σpᵢ² is RATIONAL, so
    * the whole metric is exact integer arithmetic:
    * gini_ppm = (n² − Σnᵢ²)·10⁶ div n². Profiled over three
    * categorical columns (events.event_type, documents.lang,
    * documents.source) in one output frame — per column: cardinality,
    * n, the majority share in ppm, and the Gini.
    *
    * Scale shape: each column profiles as a two-level aggregate — the
    * per-value counts collapse map-side (≤|domain| rows), the second
    * level reduces to ONE row per column; nᵢ is cast to DECIMAL(38,0)
    * BEFORE squaring (mirroring the oracle's HUGEINT cast-then-multiply
    * — a LongType nᵢ·nᵢ would overflow past nᵢ ≈ 3·10⁹), so the
    * headroom is nᵢ ≤ ~10¹⁹ before nᵢ² nears the decimal-38 ceiling.
    * The three profiles union — no joins, no windows. */
  def profileCategoryGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def profile(df: DataFrame, colName: String, label: String): DataFrame =
      df.select(col(colName).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("ni"))
        .agg(count(lit(1)).as("cardinality"),
          sum($"ni").as("n"),
          max($"ni").as("max_ni"),
          sum($"ni".cast("decimal(38,0)") * $"ni").as("ssq"))
        .select(lit(label).as("column_name"), $"cardinality", $"n",
          // integral div, not Column./ (double) — ppm stays exact;
          // widen max_ni before ×10⁶ (BIGINT would overflow at 9.2e12)
          expr("(CAST(max_ni AS DECIMAL(38,0)) * 1000000) div n").as("majority_ppm"),
          expr("((CAST(n AS DECIMAL(38,0)) * n - ssq) * 1000000) div " +
            "(CAST(n AS DECIMAL(38,0)) * n)").as("gini_ppm"))
    profile(Tables.events(spark, dir), "event_type", "events.event_type")
      .unionByName(profile(Tables.documents(spark, dir), "lang", "documents.lang"))
      .unionByName(profile(Tables.documents(spark, dir), "source", "documents.source"))
      .orderBy($"column_name")
  }

  /** Week-over-week top movers — the BI reporting staple no other key
    * composes end to end: weekly value totals per event type, each
    * week's delta vs the type's PRIOR OBSERVED week (lag over the
    * per-type week series — a gap compares against the last week that
    * exists, the standard dashboard convention), ranked by signed
    * delta descending, top 10. Totals and deltas in BIGINT fixed point
    * (DECIMAL(18,4) sums ×10⁴ — exact), so ordering ties are
    * impossible to mis-break: the order key (delta, type, week) is
    * unique.
    *
    * Scale shape: the event scan collapses to ≤|types|×|weeks| rows in
    * one partial+final aggregate; the lag window and the global top-10
    * (TakeOrderedAndProject, never a single-partition rank window) run
    * on that tiny frame. */
  def reportWeekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"week")
    Tables.events(spark, dir)
      .select($"event_type", Tables.nsToUs($"ts").as("t"),
        Tables.dec4($"value").as("v"))
      .select($"event_type", expr("t div 604800000000").as("week"), $"v")
      .groupBy($"event_type", $"week")
      .agg((sum($"v") * 10000).cast("long").as("wk_fp"))
      .withColumn("prev_fp", lag($"wk_fp", 1).over(w))
      .filter($"prev_fp".isNotNull)
      .select($"event_type", $"week", $"wk_fp", $"prev_fp",
        ($"wk_fp" - $"prev_fp").as("delta_fp"))
      .orderBy($"delta_fp".desc, $"event_type", $"week")
      .limit(10)
  }

  /** Referential-integrity audit — one report row per foreign-key edge
    * of the fixture star schema (all 9: the TPC-H skeleton's 7 plus
    * events.user_id→customer and embeddings.vec_id→documents), with the
    * child row count, NULL-key rows, distinct key count, and the orphan
    * census (keys and rows whose parent is missing). The data-quality
    * gate every warehouse runs before trusting a join: an inner join
    * silently DROPS orphan rows, so this report is the difference
    * between "the join lost 3% of revenue" and knowing why.
    *
    * Scale shape — single-pass multi-audit: every child table is
    * scanned ONCE (lineitem carries its three FK edges in one pass —
    * each row explodes to its (edge, key) pairs), ONE combined
    * map-side-combinable aggregate collapses all edges to
    * (edge, key, cnt) (≤ Σ|key domains| rows), ONE left-anti join
    * against the union of parent key columns decides orphanhood at KEY
    * grain for every edge simultaneously, and the per-edge rollups
    * equi-join (9 rows a side) for the report. Orphan rows come from
    * summing cnt, never from re-touching child rows; at 100 TB this is
    * one fact-table scan instead of one per FK. */
  def profileFkOrphans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def childKeys(df: DataFrame, edges: (String, String)*): DataFrame =
      df.select(explode(array(edges.map { case (label, fk) =>
        struct(lit(label).as("edge"), col(fk).cast("long").as("k"))
      }: _*)).as("e")).select($"e.edge".as("edge"), $"e.k".as("k"))
    def parentKeys(df: DataFrame, pk: String, labels: String*): DataFrame =
      labels.map(l => df.select(lit(l).as("edge"), col(pk).cast("long").as("k")))
        .reduce(_.unionByName(_))
    val children = Seq(
      childKeys(Tables.customer(spark, dir),
        "customer.c_nationkey->nation.n_nationkey" -> "c_nationkey"),
      childKeys(Tables.embeddings(spark, dir),
        "embeddings.vec_id->documents.doc_id" -> "vec_id"),
      childKeys(Tables.events(spark, dir),
        "events.user_id->customer.c_custkey" -> "user_id"),
      childKeys(Tables.lineitem(spark, dir),
        "lineitem.l_orderkey->orders.o_orderkey" -> "l_orderkey",
        "lineitem.l_partkey->part.p_partkey" -> "l_partkey",
        "lineitem.l_suppkey->supplier.s_suppkey" -> "l_suppkey"),
      childKeys(Tables.nation(spark, dir),
        "nation.n_regionkey->region.r_regionkey" -> "n_regionkey"),
      childKeys(Tables.orders(spark, dir),
        "orders.o_custkey->customer.c_custkey" -> "o_custkey"),
      childKeys(Tables.supplier(spark, dir),
        "supplier.s_nationkey->nation.n_nationkey" -> "s_nationkey"))
      .reduce(_.unionByName(_))
    val parents = Seq(
      parentKeys(Tables.nation(spark, dir), "n_nationkey",
        "customer.c_nationkey->nation.n_nationkey",
        "supplier.s_nationkey->nation.n_nationkey"),
      parentKeys(Tables.documents(spark, dir), "doc_id",
        "embeddings.vec_id->documents.doc_id"),
      parentKeys(Tables.customer(spark, dir), "c_custkey",
        "events.user_id->customer.c_custkey",
        "orders.o_custkey->customer.c_custkey"),
      parentKeys(Tables.orders(spark, dir), "o_orderkey",
        "lineitem.l_orderkey->orders.o_orderkey"),
      parentKeys(Tables.part(spark, dir), "p_partkey",
        "lineitem.l_partkey->part.p_partkey"),
      parentKeys(Tables.supplier(spark, dir), "s_suppkey",
        "lineitem.l_suppkey->supplier.s_suppkey"),
      parentKeys(Tables.region(spark, dir), "r_regionkey",
        "nation.n_regionkey->region.r_regionkey"))
      .reduce(_.unionByName(_))
    // the (edge, key, cnt) frame is consumed ONCE: a left join tags each
    // child key with a parent-exists marker (parents are PK columns —
    // unique per edge — so the join never multiplies), and a single
    // aggregate derives totals, NULL census and orphan census together.
    // Round-10 finding: the r9 two-branch form (totals + anti-join) ran
    // the whole child pass twice — the "1 fact scan" pin was counting
    // plan-string mentions, not scan nodes, and hid the double scan.
    val keys = children.groupBy($"edge", $"k").agg(count(lit(1)).as("cnt"))
    keys.join(parents.withColumn("pk", lit(1)), Seq("edge", "k"), "left")
      .groupBy($"edge").agg(
        sum($"cnt").as("n_rows"),
        coalesce(sum(when($"k".isNull, $"cnt")), lit(0L)).as("n_null_rows"),
        count(when($"k".isNotNull, lit(1))).as("n_keys"),
        count(when($"k".isNotNull && $"pk".isNull, lit(1))).as("n_orphan_keys"),
        coalesce(sum(when($"k".isNotNull && $"pk".isNull, $"cnt")), lit(0L))
          .as("n_orphan_rows"))
      .select($"edge".as("fk_edge"), $"n_rows", $"n_null_rows", $"n_keys",
        $"n_orphan_keys", $"n_orphan_rows")
      .orderBy($"fk_edge")
  }

  /** Primary-key uniqueness audit — the complement of
    * [[profileFkOrphans]]: one report row per candidate key of every
    * fixture table (the 9 single-column ids plus lineitem's composite
    * (l_orderkey, l_linenumber) — which the synthetic fixture
    * deliberately violates, so the report shows real duplication), with
    * row/key counts, duplicated-key and duplicated-row censuses, and
    * the worst multiplicity. The other half of the join-trust gate: FK
    * orphans say an inner join DROPS rows, PK duplicates say it
    * MULTIPLIES them.
    *
    * Scale shape per key: one map-side-combinable count aggregate
    * collapses the table to ≤|keys| rows (key columns only — pruned
    * scan), then a 1-row rollup; the 10 one-row frames union. No
    * joins, no windows. */
  /** Duplicate-invoice suspects — the fraud/data-quality sweep every
    * billing pipeline runs: multiple DISTINCT orders by the same
    * customer on the same calendar day are double-entry suspects a
    * reviewer triages. Emits one row per contended (customer, day)
    * business key: multiplicity, the min/max colliding order keys, and
    * the total cents under review. Differs from
    * [[profilePkDuplicates]] (which audits the PHYSICAL key): this
    * audits a SEMANTIC key the schema never enforced — 355 contended
    * keys at sf0.1, so the detector has real signal at every fixture
    * scale.
    *
    * Scale shape: one map-side-combinable groupBy on the composite
    * business key; only contended groups (HAVING > 1) survive to the
    * tiny output. */
  def profileDuplicateInvoices(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_custkey",
        unix_date(to_date($"o_orderdate")).cast("long").as("od"),
        (Tables.dec2($"o_totalprice") * 100).cast("long").as("cents"),
        $"o_orderkey")
      .groupBy($"o_custkey", $"od")
      .agg(count(lit(1)).as("n_orders"),
        min($"o_orderkey").as("min_orderkey"),
        max($"o_orderkey").as("max_orderkey"),
        sum($"cents").as("cents_at_risk"))
      .filter($"n_orders" > 1)
      .orderBy($"o_custkey", $"od")
  }

  def profilePkDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def audit(label: String, df: DataFrame, cols: Seq[String]): DataFrame =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(sum($"cnt").as("n_rows"),
          count(lit(1)).as("n_keys"),
          count(when($"cnt" > 1, lit(1))).as("n_dup_keys"),
          coalesce(sum(when($"cnt" > 1, $"cnt")), lit(0L)).as("n_dup_rows"),
          max($"cnt").as("max_multiplicity"))
        .select(lit(label).as("key_name"), $"n_rows", $"n_keys",
          $"n_dup_keys", $"n_dup_rows", $"max_multiplicity")
    Seq(
      audit("customer(c_custkey)", Tables.customer(spark, dir), Seq("c_custkey")),
      audit("documents(doc_id)", Tables.documents(spark, dir), Seq("doc_id")),
      audit("embeddings(vec_id)", Tables.embeddings(spark, dir), Seq("vec_id")),
      audit("events(event_id)", Tables.events(spark, dir), Seq("event_id")),
      audit("lineitem(l_orderkey,l_linenumber)", Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_linenumber")),
      audit("nation(n_nationkey)", Tables.nation(spark, dir), Seq("n_nationkey")),
      audit("orders(o_orderkey)", Tables.orders(spark, dir), Seq("o_orderkey")),
      audit("part(p_partkey)", Tables.part(spark, dir), Seq("p_partkey")),
      audit("region(r_regionkey)", Tables.region(spark, dir), Seq("r_regionkey")),
      audit("supplier(s_suppkey)", Tables.supplier(spark, dir), Seq("s_suppkey")))
      .reduce(_.unionByName(_))
      .orderBy($"key_name")
  }

  /** Target bytes per compacted file — the standard 128 MB parquet
    * row-group/file sweet spot a production compactor aims for. */
  val CompactTargetBytes: Long = 128L * 1024 * 1024

  /** Small-file compaction — the table-maintenance staple: a
    * deliberately fragmented staging write (64-way — the tasks×buckets
    * pathology Sinks.writeBucketed documents) is rewritten to
    * size-targeted files. The graded output is the compacted table's
    * rows against the ORIGINAL events oracle (the roundtrip
    * precedent: compaction exists to change LAYOUT, so value
    * preservation is the contract); the before/after file-count
    * manifest — the part compaction actually buys — is pinned in
    * SinksSpec, where file counts are observable.
    *
    * Scale shape: both writes are distributed repartition writes (never
    * coalesce(1) — a zero-shuffle single-task funnel at 100 TB); the
    * compactor SIZES its shuffle from the staged bytes it just listed —
    * target count = ceil(stagedBytes / 128 MB) — so each task writes
    * one target-size file at ANY corpus size (the fixture compacts to
    * 1; a 100 TB table plans ~800k writers). The listing goes through
    * the Path's own FileSystem, so the same code sizes an HDFS/S3
    * staging dir on a cluster; a driver-side directory listing is the
    * one driver round-trip every real compactor (Delta OPTIMIZE,
    * Iceberg rewrite_data_files) also performs. */
  def sinkCompactSmallFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frag = Tables.scratch("compact_frag")
    val out = Tables.scratch("compact_out")
    val src = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), $"value")
    graft.PlanOnly.roundTrip(src) {
      src.repartition(64).write.mode("overwrite").parquet(frag)
      val target = compactTargetFileCount(spark, frag)
      val fragBack = spark.read.schema(src.schema).parquet(frag)
      fragBack.repartition(target).write.mode("overwrite").parquet(out)
      spark.read.schema(src.schema).parquet(out)
    }
      .orderBy($"event_id")
  }

  /** ceil(total staged part-file bytes / 128 MB), floored at 1 — the
    * size-aware writer count the compactor shuffles to. */
  def compactTargetFileCount(spark: SparkSession, stagedDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(stagedDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    math.max(1L, (bytes + CompactTargetBytes - 1) / CompactTargetBytes).toInt
  }

  /** Dense-grid zero-fill — the reporting pattern for sparse facts: a
    * dashboard needs EVERY (nation, priority) cell, including the
    * combinations no order hit, so the dimension grid is built first
    * (cross join of two bounded dims — 25 × 5 rows, broadcast
    * nested-loop by construction and allowlisted as such) and the
    * observed aggregate left-joins onto it with a 0 fill. Without the
    * grid, absent cells silently vanish and downstream charts
    * misreport. The fact table aggregates BEFORE the join, so the
    * grid join touches O(cells), not O(orders). */
  def reportDenseGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"o_orderpriority")
      .agg(count(lit(1)).as("n_obs"),
        sum(Tables.dec2($"o_totalprice")).cast("double").as("sum_price"))
    val grid = Tables.nation(spark, dir).select($"n_name")
      .crossJoin(Tables.orders(spark, dir).select($"o_orderpriority").distinct())
    grid.join(broadcast(obs), Seq("n_name", "o_orderpriority"), "left")
      .select($"n_name", $"o_orderpriority",
        coalesce($"n_obs", lit(0L)).as("n_orders"),
        coalesce($"sum_price", lit(0.0d)).as("sum_price"))
      .orderBy($"n_name", $"o_orderpriority")
  }

  /** Dynamic partition overwrite — the idempotent backfill primitive:
    * re-ingesting one day REPLACES exactly that day's directory and
    * leaves every other partition untouched (static overwrite mode
    * would truncate the whole table; append would duplicate). Here the
    * full log lands day-partitioned, then day 19725 is re-written with
    * its 'error' events corrected away; the readback census proves the
    * surgical replacement. At 100 TB this is how every nightly
    * correction run works: write-amplification bounded by the touched
    * partitions, the job re-runnable because overwrite is idempotent.
    * The session's partitionOverwriteMode is saved and restored — the
    * mode is per-write semantics, not a global the operator may leak. */
  def sinkDynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("dynamic_overwrite")
    val src = Tables.events(spark, dir)
      .select($"event_id", $"event_type", Tables.dec4($"value").as("v"),
        Tables.nsToUs($"ts").as("t"))
      .withColumn("day", expr("t div 86400000000"))
    graft.PlanOnly.roundTrip(
        src.filter(!($"day" === 19725L && $"event_type" === "error"))) {
      src.write.mode("overwrite").partitionBy("day").parquet(tmp)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        src.filter($"day" === 19725L && $"event_type" =!= "error")
          .write.mode("overwrite").partitionBy("day").parquet(tmp)
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      spark.read.schema(src.schema).parquet(tmp)
    }
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("n"), sum($"v").cast("double").as("sum_value"))
      .orderBy($"day")
  }

  /** Transactional snapshot log with TIME TRAVEL, graded — the
    * homegrown slice of the lakehouse north-star gap
    * ([[graft.sources.TxnTable]]: atomic rename-installed version
    * manifests over immutable parquet snapshots; Delta/Iceberg jars
    * are unavailable offline, SCALE.md records the decision): v0 = the
    * per-user event summary BEFORE the split day, committed; v1 = v0's
    * SNAPSHOT READ merged with the post-split delta (read-prev →
    * merge → commit-next — the MERGE INTO discipline, incremental by
    * construction), committed; the graded frame reads BOTH snapshots
    * back through the as-of resolver and stacks them. The hash-match
    * therefore certifies three things at once: commit atomicity
    * machinery really ran (the data only becomes visible through the
    * renamed manifest), time travel resolves the right snapshot after
    * later commits (v0 is read back AFTER v1 exists), and the
    * incremental merge equals the from-scratch recompute the oracle
    * performs.
    *
    * Scale shape: snapshots are table-level copy-on-write (honest
    * write amplification of plain parquet — the file-level refinement
    * is what the real formats add); the merge is one user_id
    * aggregate over prev ∪ delta; manifests are O(1) driver I/O. */
  def sinkTxnTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val splitUs = 19740L * 86400000000L // the sink_merge_upsert boundary
    val ev = Tables.events(spark, dir)
      .select($"user_id", Tables.nsToUs($"ts").as("ts_us"))
    def summarize(df: DataFrame): DataFrame = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"ts_us").as("last_us"))
    def equivalent = summarize(ev.filter($"ts_us" < splitUs))
      .withColumn("version", lit(0L))
      .unionByName(summarize(ev).withColumn("version", lit(1L)))
      .select($"version", $"user_id", $"n_events", $"last_us")
      .orderBy($"version", $"user_id")
    graft.PlanOnly.roundTrip(equivalent) {
      import graft.sources.TxnTable
      val table = Tables.scratch("txn_table")
      TxnTable.drop(spark, table)
      TxnTable.commit(spark, table, 0,
        summarize(ev.filter($"ts_us" >= 0L && $"ts_us" < splitUs)))
      val v1 = TxnTable.read(spark, table, Some(0))
        .unionByName(summarize(ev.filter($"ts_us" >= splitUs)))
        .groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"))
      TxnTable.commit(spark, table, 1, v1)
      TxnTable.read(spark, table, Some(0)).withColumn("version", lit(0L))
        .unionByName(
          TxnTable.read(spark, table, None).withColumn("version", lit(1L)))
        .select($"version", $"user_id", $"n_events", $"last_us")
        .orderBy($"version", $"user_id")
    }
  }

  /** Batch MERGE/upsert — row-level update-else-insert against a
    * standing keyed table, the single most common warehouse write
    * pattern. The standing state (latest row per user before the split
    * day) is materialized as parquet, then one update batch (events on
    * or after the split) MERGEs in through the same step the streaming
    * mirror replays per micro-batch ([[graft.streaming.StreamingMirror
    * .upsertBatch]]: read state ∪ batch → latest per key → tmp-write +
    * swap). The read-back is annotated with the MERGE action — rows the
    * batch replaced ('update'), keys it introduced ('insert'), rows it
    * left alone ('carry') — so the output proves row-level semantics,
    * not just final values. Latest-per-key with the (ts_us, event_id)
    * tie-break is associative, so ANY batch split yields this same
    * table; the oracle is the one-shot latest-per-key over the full
    * log with the same provenance derivation. At 100 TB this step is a
    * MERGE INTO on a transactional table format: write amplification is
    * the whole state table per batch here (the honest cost of plain
    * parquet), which row-group-level copy-on-write formats cut to the
    * touched files — see SCALE.md. */
  def sinkMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val splitUs = 19740L * 86400000000L // mid-range day boundary
    // per-process state dir: two concurrent runs (a Verify alongside a
    // Bench or --exec Explain, always separate JVMs) must not race on
    // this table's delete/write/swap — same isolation move as
    // LocalSession's pinned warehouse; re-runs in one JVM stay
    // idempotent (delete-first) under the stable pid key
    val stateDir = Tables.scratch("merge_upsert_state")
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), $"value")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    val standing = ev.filter($"ts_us" < splitUs)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val state = graft.PlanOnly.roundTrip(
        // latest-per-key over the FULL log — the associative-merge
        // equivalence the oracle also relies on
        ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")) {
      val fs = new org.apache.hadoop.fs.Path(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // idempotent re-run: clear prior state AND the crash-recovery tmp
      // (a stale __tmp would otherwise be reinstalled as state)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir), true)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir + "__tmp"), true)
      standing.write.mode("overwrite").parquet(stateDir)
      graft.streaming.StreamingMirror.upsertBatch(ev.filter($"ts_us" >= splitUs), stateDir)
      spark.read.parquet(stateDir)
    }
    val standingKeys = standing.select($"user_id".as("sk")).distinct()
    state
      .join(broadcast(standingKeys), $"user_id" === $"sk", "left")
      .select($"user_id", $"event_id", $"event_type", $"ts_us", $"value",
        when($"ts_us" >= splitUs,
          when($"sk".isNotNull, "update").otherwise("insert"))
          .otherwise("carry").as("action"))
      .orderBy($"user_id")
  }

  /** Malformed-row ingest policy: PERMISSIVE CSV parsing quarantines
    * bad rows into `_corrupt_record` instead of failing the job — the
    * only sane default at 100 TB, where a billion-line crawl WILL
    * contain garbage and FAILFAST would burn the whole batch for one
    * row (DROPMALFORMED silently changes row counts; quarantine keeps
    * the evidence auditable). Three deterministic garbage lines ride
    * along with the real rows; the output is the ok/corrupt census.
    * Parsing is per-row and partition-parallel — corruption handling
    * adds no shuffle. */
  def sourceCsvPermissive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("csv_permissive")
    val good = Tables.nation(spark, dir)
      .select(concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey").as("value"))
    // all three garbage lines are LONG-column type mismatches — the
    // corruption class PERMISSIVE flags unconditionally (arity
    // mismatches are partially repaired instead, parser-dependent)
    val bad = Seq("not-a-key|corrupted line|x", "g1|garbage|g2", "zz|bad row|yy")
      .toDF("value")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_regionkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    graft.PlanOnly.roundTrip(
        // same PERMISSIVE parse, file-free: from_csv over the in-memory
        // lines (the scalar twin of the datasource parser)
        good.unionByName(bad).select(from_csv($"value", schema, Map(
            "sep" -> "|", "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
          .select($"r._corrupt_record".as("_corrupt_record"),
            $"r.n_nationkey".as("n_nationkey"))) {
      good.unionByName(bad).write.mode("overwrite").text(tmp)
      spark.read.schema(schema)
        .option("sep", "|").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(tmp)
        // cached: Spark refuses CSV scans whose pruned schema is ONLY the
        // internal corrupt-record column (which a downstream count()
        // can produce by pruning the other aggregates); caching pins the
        // full-schema parse — the documented workaround, and the same
        // caller contract as the other cached frames (harness
        // clearCache()s per query)
        .cache()
    }
      .select(when($"_corrupt_record".isNull, lit("ok"))
        .otherwise(lit("corrupt")).as("status"), $"n_nationkey")
      .groupBy($"status")
      .agg(count(lit(1)).as("n"), count($"n_nationkey").as("n_keys_parsed"))
      .orderBy($"status")
  }

  /** Schema-evolution read: two parquet generations under one root —
    * v=1 written before a column existed, v=2 after — unified by
    * `mergeSchema` (footer union across files) plus the directory
    * partition column. The absent column reads as NULL in old files
    * and gets the −1 sentinel (nullable BIGINT rule). This is the
    * append-only table-evolution path a long-lived 100 TB dataset
    * needs: new columns arrive without rewriting old partitions, and
    * the merged read stays a plain pruned parquet scan (mergeSchema
    * costs one footer read per file — at real scale you'd pin the
    * merged schema in a catalog instead of re-inferring). */
  def sourceSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = Tables.scratch("schema_evolution")
    val n = Tables.nation(spark, dir)
    graft.PlanOnly.roundTrip(
        n.select(lit(1).as("v"), $"n_nationkey", $"n_name",
            lit(null).cast("int").as("n_regionkey"))
          .unionByName(n.select(lit(2).as("v"), $"n_nationkey", $"n_name",
            $"n_regionkey"))) {
      n.select($"n_nationkey", $"n_name")
        .write.mode("overwrite").parquet(tmp + "/v=1")
      n.select($"n_nationkey", $"n_name", $"n_regionkey")
        .write.mode("overwrite").parquet(tmp + "/v=2")
      spark.read.option("mergeSchema", "true").parquet(tmp)
    }
      .select($"v".cast("long").as("v"), $"n_nationkey", $"n_name",
        coalesce($"n_regionkey", lit(-1L)).as("n_regionkey"))
      .orderBy($"v", $"n_nationkey")
  }

  /** Wide→long reshape via the native `Dataset.unpivot` API (SQL MELT):
    * per-priority order metrics pivoted into (metric, value) rows.
    * Catalyst plans unpivot as a single Expand over the aggregated
    * frame — one pass, unlike the UNION-of-selects formulation that
    * re-embeds the upstream aggregate N times (the funnel lesson).
    * All melted metrics share one DOUBLE value column; counts are
    * exact integers below 2^53 so the cast is lossless. */
  def sqlUnpivotMelt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        sum(Tables.dec2($"o_totalprice")).cast("double").as("total_price"),
        count(lit(1)).cast("double").as("n_orders"),
        countDistinct($"o_custkey").cast("double").as("n_customers"))
      .unpivot(Array($"o_orderpriority"),
        Array($"total_price", $"n_orders", $"n_customers"),
        "metric", "value")
      .orderBy($"o_orderpriority", $"metric")
  }

  val queries: Map[String, QueryFn] = Map(
    "source_xml_roundtrip" -> (sourceXmlRoundtrip(_, _)),
    "report_dense_grid" -> (reportDenseGrid(_, _)),
    "sink_dynamic_overwrite" -> (sinkDynamicOverwrite(_, _)),
    "sink_merge_upsert" -> (sinkMergeUpsert(_, _)),
    "sink_txn_time_travel" -> (sinkTxnTimeTravel(_, _)),
    "source_csv_permissive" -> (sourceCsvPermissive(_, _)),
    "source_schema_evolution" -> (sourceSchemaEvolution(_, _)),
    "sql_unpivot_melt" -> (sqlUnpivotMelt(_, _)),
    "sql_ctas_insert" -> (sqlCtasInsert(_, _)),
    "scan_parquet" -> (scanParquet(_, _)),
    "scan_projection_pruning" -> (scanProjectionPruning(_, _)),
    "source_json_props" -> (sourceJsonProps(_, _)),
    "source_json_nested" -> (sourceJsonNested(_, _)),
    "source_csv_roundtrip" -> (sourceCsvRoundtrip(_, _)),
    "source_orc_roundtrip" -> (sourceOrcRoundtrip(_, _)),
    "source_jsonl_roundtrip" -> (sourceJsonlRoundtrip(_, _)),
    "sink_partitioned_read" -> (sinkPartitionedRead(_, _)),
    "scan_dynamic_partition_pruning" -> (scanDynamicPartitionPruning(_, _)),
    "join_range_bucketed" -> (joinRangeBucketed(_, _)),
    "sink_bucketed_join" -> (sinkBucketedJoin(_, _)),
    "sink_corpus_layout" -> (sinkCorpusLayout(_, _)),
    "filter_grep" -> (filterGrep(_, _)),
    "filter_predicates" -> (filterPredicates(_, _)),
    "project_derived" -> (projectDerived(_, _)),
    "join_shuffle_equi" -> (joinShuffleEqui(_, _)),
    "join_skew_salted" -> (joinSkewSalted(_, _)),
    "join_broadcast" -> (joinBroadcast(_, _)),
    "join_multiway_star" -> (joinMultiwayStar(_, _)),
    "join_left_outer" -> (joinLeftOuter(_, _)),
    "join_semi" -> (joinSemi(_, _)),
    "join_anti" -> (joinAnti(_, _)),
    "join_full_outer" -> (joinFullOuter(_, _)),
    "join_null_safe" -> (joinNullSafe(_, _)),
    "join_range_theta" -> (joinRangeTheta(_, _)),
    "join_self_asof" -> (joinSelfAsof(_, _)),
    "join_interval_attribution" -> (joinIntervalAttribution(_, _)),
    "join_lateral_topk" -> (joinLateralTopk(_, _)),
    "join_asof_nearest" -> (joinAsofNearest(_, _)),
    "profile_numeric_stats" -> (profileNumericStats(_, _)),
    "profile_benford_digits" -> (profileBenfordDigits(_, _)),
    "profile_join_explosion" -> (profileJoinExplosion(_, _)),
    "profile_category_gini" -> (profileCategoryGini(_, _)),
    "report_week_over_week" -> (reportWeekOverWeek(_, _)),
    "profile_fk_orphans" -> (profileFkOrphans(_, _)),
    "sink_compact_small_files" -> (sinkCompactSmallFiles(_, _)),
    "profile_pk_duplicates" -> (profilePkDuplicates(_, _)),
    "profile_duplicate_invoices" -> (profileDuplicateInvoices(_, _))
  )

  // PK-uniqueness census per candidate key; cnt>1 filters mirror the
  // Spark when($"cnt" > 1, …) conditional aggregates
  private def pkSql(label: String, table: String, cols: String): String =
    s"""SELECT '$label' AS key_name,
       |  CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_dup_keys,
       |  CAST(coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS BIGINT)
       |    AS n_dup_rows,
       |  CAST(max(cnt) AS BIGINT) AS max_multiplicity
       |FROM (SELECT count(*) AS cnt FROM $table GROUP BY $cols)""".stripMargin

  // referential-integrity census per FK edge; the anti-join side of the
  // Spark plan becomes LEFT JOIN … pk IS NULL here
  private def fkSql(label: String, child: String, fk: String,
      parent: String, pk: String): String =
    s"""SELECT '$label' AS fk_edge,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS n_null_rows,
       |  CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
       |  CAST(count(DISTINCT CASE WHEN k IS NOT NULL AND pk IS NULL
       |    THEN k END) AS BIGINT) AS n_orphan_keys,
       |  CAST(count(*) FILTER (WHERE k IS NOT NULL AND pk IS NULL)
       |    AS BIGINT) AS n_orphan_rows
       |FROM (SELECT $fk AS k FROM $child) c
       |LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $parent) p ON c.k = p.pk""".stripMargin

  // HUGEINT division: DuckDB's `//` on DECIMAL operands is NOT
  // integral (it keeps the quotient scale — 799987.94 — and the BIGINT
  // cast then rounds HALF-UP, diverging from Spark's flooring `div` by
  // one on any fractional quotient); on HUGEINT it floors exactly
  private def giniSql(label: String, table: String, column: String): String =
    s"""SELECT '$label' AS column_name, count(*) AS cardinality,
       |  CAST(sum(ni) AS BIGINT) AS n,
       |  CAST((CAST(max(ni) AS HUGEINT) * 1000000) // sum(ni) AS BIGINT) AS majority_ppm,
       |  CAST(((CAST(sum(ni) AS HUGEINT) * sum(ni)
       |      - sum(CAST(ni AS HUGEINT) * ni)) * 1000000)
       |    // (CAST(sum(ni) AS HUGEINT) * sum(ni)) AS BIGINT) AS gini_ppm
       |FROM (SELECT count(*) AS ni FROM $table GROUP BY $column)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // the two committed snapshots recomputed from scratch: v0 = the
    // pre-split summary, v1 = the full-log summary (incremental merge
    // must equal recompute — associativity of count/max)
    "sink_txn_time_travel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |v0 AS (SELECT CAST(0 AS BIGINT) AS version, user_id,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us
        |  FROM e WHERE ts_us >= 0 AND ts_us < 1705536000000000
        |  GROUP BY user_id),
        |v1 AS (SELECT CAST(1 AS BIGINT) AS version, user_id,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us
        |  FROM e GROUP BY user_id)
        |SELECT version, user_id, n_events, last_us FROM
        |  (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
        |ORDER BY version, user_id""".stripMargin,
    // semantic business key (custkey, epoch-day); only contended
    // groups survive
    "profile_duplicate_invoices" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS od,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderkey
        |  FROM orders)
        |SELECT o_custkey, od, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_orderkey,
        |  CAST(sum(cents) AS BIGINT) AS cents_at_risk
        |FROM o GROUP BY o_custkey, od
        |HAVING count(*) > 1
        |ORDER BY o_custkey, od""".stripMargin,
    "profile_pk_duplicates" ->
      s"""SELECT * FROM (
         |${pkSql("customer(c_custkey)", "customer", "c_custkey")}
         |UNION ALL
         |${pkSql("documents(doc_id)", "documents", "doc_id")}
         |UNION ALL
         |${pkSql("embeddings(vec_id)", "embeddings", "vec_id")}
         |UNION ALL
         |${pkSql("events(event_id)", "events", "event_id")}
         |UNION ALL
         |${pkSql("lineitem(l_orderkey,l_linenumber)", "lineitem", "l_orderkey, l_linenumber")}
         |UNION ALL
         |${pkSql("nation(n_nationkey)", "nation", "n_nationkey")}
         |UNION ALL
         |${pkSql("orders(o_orderkey)", "orders", "o_orderkey")}
         |UNION ALL
         |${pkSql("part(p_partkey)", "part", "p_partkey")}
         |UNION ALL
         |${pkSql("region(r_regionkey)", "region", "r_regionkey")}
         |UNION ALL
         |${pkSql("supplier(s_suppkey)", "supplier", "s_suppkey")}
         |) ORDER BY key_name""".stripMargin,
    "profile_fk_orphans" ->
      s"""SELECT * FROM (
         |${fkSql("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey")}
         |UNION ALL
         |${fkSql("embeddings.vec_id->documents.doc_id", "embeddings", "vec_id", "documents", "doc_id")}
         |UNION ALL
         |${fkSql("events.user_id->customer.c_custkey", "events", "user_id", "customer", "c_custkey")}
         |UNION ALL
         |${fkSql("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey")}
         |UNION ALL
         |${fkSql("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey")}
         |UNION ALL
         |${fkSql("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey")}
         |UNION ALL
         |${fkSql("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey")}
         |UNION ALL
         |${fkSql("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey")}
         |UNION ALL
         |${fkSql("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey")}
         |) ORDER BY fk_edge""".stripMargin,
    // compaction changes layout, never values: the oracle reads the
    // ORIGINAL events (the sink_partitioned_read roundtrip precedent)
    "sink_compact_small_files" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events ORDER BY event_id""".stripMargin,
    "profile_category_gini" ->
      s"""SELECT * FROM (
         |${giniSql("events.event_type", "events", "event_type")}
         |UNION ALL
         |${giniSql("documents.lang", "documents", "lang")}
         |UNION ALL
         |${giniSql("documents.source", "documents", "source")}
         |) ORDER BY column_name""".stripMargin,
    "report_week_over_week" ->
      """WITH wk AS (SELECT event_type,
        |    epoch_us(ts) // 604800000000 AS week,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS wk_fp
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, week, wk_fp,
        |    lag(wk_fp, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_fp
        |  FROM wk)
        |SELECT event_type, week, wk_fp, prev_fp, wk_fp - prev_fp AS delta_fp
        |FROM d WHERE prev_fp IS NOT NULL
        |ORDER BY delta_fp DESC, event_type, week
        |LIMIT 10""".stripMargin,
    "sql_ctas_insert" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "report_dense_grid" ->
      """WITH obs AS (SELECT n.n_name, o.o_orderpriority,
        |    count(*) AS n_obs,
        |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, o.o_orderpriority),
        |grid AS (SELECT n_name, o_orderpriority
        |  FROM nation CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders))
        |SELECT g.n_name, g.o_orderpriority,
        |  coalesce(obs.n_obs, 0) AS n_orders,
        |  coalesce(obs.sum_price, 0.0) AS sum_price
        |FROM grid g LEFT JOIN obs
        |  ON g.n_name = obs.n_name AND g.o_orderpriority = obs.o_orderpriority
        |ORDER BY g.n_name, g.o_orderpriority""".stripMargin,
    "sink_merge_upsert" ->
      // one-shot latest-per-key over the full log == the two-phase
      // MERGE (latest-per-key is associative across any batch split);
      // action re-derives the row-level MERGE provenance
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us, value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev),
        |latest AS (SELECT user_id, event_id, event_type, ts_us, value
        |  FROM r WHERE rn = 1),
        |standing AS (SELECT DISTINCT user_id FROM ev
        |  WHERE ts_us < 1705536000000000)
        |SELECT l.user_id, l.event_id, l.event_type, l.ts_us, l.value,
        |  CASE WHEN l.ts_us >= 1705536000000000 THEN
        |    CASE WHEN s.user_id IS NOT NULL THEN 'update' ELSE 'insert' END
        |  ELSE 'carry' END AS action
        |FROM latest l LEFT JOIN standing s ON l.user_id = s.user_id
        |ORDER BY l.user_id""".stripMargin,
    "sink_dynamic_overwrite" ->
      // final table state: everything except day 19725's error events
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT day, count(*) AS n, CAST(sum(v) AS DOUBLE) AS sum_value
        |FROM e WHERE NOT (day = 19725 AND event_type = 'error')
        |GROUP BY day ORDER BY day""".stripMargin,
    "source_csv_permissive" ->
      // 3 deterministic garbage lines are injected alongside the real
      // rows; the graded property is that PERMISSIVE parsing keeps
      // every good row and quarantines exactly the garbage
      """SELECT 'corrupt' AS status, CAST(3 AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS n_keys_parsed
        |UNION ALL
        |SELECT 'ok', count(*), count(*) FROM nation
        |ORDER BY status""".stripMargin,
    "source_schema_evolution" ->
      """SELECT CAST(1 AS BIGINT) AS v, n_nationkey, n_name,
        |  CAST(-1 AS BIGINT) AS n_regionkey FROM nation
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n_nationkey, n_name, n_regionkey
        |FROM nation
        |ORDER BY v, n_nationkey""".stripMargin,
    "sql_unpivot_melt" ->
      """WITH m AS (SELECT o_orderpriority,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'total_price' AS metric, total_price AS value FROM m
        |UNION ALL SELECT o_orderpriority, 'n_orders', n_orders FROM m
        |UNION ALL SELECT o_orderpriority, 'n_customers', n_customers FROM m
        |ORDER BY o_orderpriority, metric""".stripMargin,
    "scan_parquet" -> "SELECT count(*) AS n_rows FROM lineitem",
    "scan_projection_pruning" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity",
    "source_json_props" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events ORDER BY event_id",
    "source_json_nested" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |j AS (SELECT event_id,
        |    '{"meta":{"kind":"' || event_type || '","day":' || day ||
        |    '},"items":[{"i":0,"v":' || v_fp ||
        |    '},{"i":1,"v":' || (v_fp * 2) || '}]}' AS doc
        |  FROM e)
        |SELECT j.event_id,
        |  json_extract_string(doc, '$.meta.kind') AS kind,
        |  CAST(json_extract(doc, '$.meta.day') AS BIGINT) AS day,
        |  CAST(p.pos AS BIGINT) AS pos,
        |  CAST(json_extract(doc, '$.items[' || p.pos || '].i') AS BIGINT) AS i,
        |  CAST(json_extract(doc, '$.items[' || p.pos || '].v') AS BIGINT) AS v
        |FROM j CROSS JOIN (VALUES (0), (1)) AS p(pos)
        |ORDER BY j.event_id, p.pos""".stripMargin,
    // The round-trip oracles run on the ORIGINAL parquet tables: the
    // graded property is that export → re-import is value-preserving.
    "source_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "source_jsonl_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "source_xml_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    // the bucket rewrite is the engine's job; the oracle runs the
    // direct BETWEEN theta join (IEJoin) over the same cents
    "join_range_bucketed" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT a.o_orderkey, a.cents,
        |  CAST(count(b.o_orderkey) AS BIGINT) AS n_comparable
        |FROM o a LEFT JOIN o b ON b.o_orderkey <> a.o_orderkey
        |  AND b.cents BETWEEN a.cents - 1000 AND a.cents + 1000
        |GROUP BY 1, 2 ORDER BY a.o_orderkey""".stripMargin,
    // the prune is the engine's job; the oracle certifies no row was
    // dropped by replaying the aggregate-derived dim filter directly
    "scan_dynamic_partition_pruning" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dim AS (SELECT day FROM (SELECT day, count(*) AS c FROM e
        |    GROUP BY 1) WHERE c % 2 = 1)
        |SELECT e.day, e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |FROM e JOIN dim ON e.day = dim.day
        |GROUP BY 1, 2 ORDER BY e.day, e.event_type""".stripMargin,
    "sink_partitioned_read" ->
      """SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE epoch_us(ts) // 86400000000 BETWEEN 19730 AND 19736
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,
    // bucketed layout must preserve every row: oracle = same join+agg on originals
    "sink_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sink_corpus_layout" ->
      """SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n_docs,
        |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CAST(floor(CAST(e.embedding[1] AS DOUBLE)
        |    * 1099511627776.0) AS BIGINT)) AS BIGINT) AS sum_e0_fp
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.lang = 'en'
        |GROUP BY e.label ORDER BY label""".stripMargin,
    "filter_grep" ->
      "SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\\bjoin\\b') ORDER BY doc_id",
    "filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-31' AND l_returnflag IN ('A','R') AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate""".stripMargin,
    "project_derived" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "join_shuffle_equi" ->
      """SELECT o_orderkey, l_linenumber, o_totalprice, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber, o_totalprice, l_quantity""".stripMargin,
    // salting must be invisible in the result: the oracle is the plain join
    "join_skew_salted" ->
      """SELECT o_orderkey, l_linenumber, o_orderpriority, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber, o_orderpriority, l_quantity""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_name, p_retailprice""".stripMargin,
    "join_multiway_star" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(c_custkey, -1) AS ck, coalesce(o_orderkey, -1) AS ok
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
        |FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE year(o_orderdate) = 1997) o
        |  ON c_custkey = o_custkey
        |ORDER BY ck, ok""".stripMargin,
    "join_null_safe" ->
      """SELECT coalesce(c.ck, -1) AS k, count(*) AS pairs
        |FROM (SELECT nullif(c_nationkey % 5, 0) AS ck FROM customer) c
        |JOIN (SELECT nullif(s_nationkey % 5, 0) AS sk FROM supplier) s
        |  ON c.ck IS NOT DISTINCT FROM s.sk
        |GROUP BY coalesce(c.ck, -1) ORDER BY k""".stripMargin,
    "join_range_theta" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_items
        |FROM orders LEFT JOIN lineitem
        |  ON l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "join_self_asof" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, coalesce(epoch_us(p.ts), -1) AS prev_purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts < c.ts
        |ORDER BY c.event_id""".stripMargin,
    // latest-prior-click tie-break (max ts, then max id) is reproduced
    // as max(ts)-group then max(id)-group — DuckDB's ASOF JOIN cannot
    // express the bounded window + deterministic id tie-break directly
    "join_interval_attribution" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('click', 'purchase')),
        |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |g AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts_us,
        |        max(c.ts_us) AS cts
        |      FROM p LEFT JOIN c ON c.user_id = p.user_id
        |        AND c.ts_us < p.ts_us AND c.ts_us >= p.ts_us - 3600000000
        |      GROUP BY 1, 2, 3),
        |r AS (SELECT g.purchase_id, g.user_id, g.ts_us, g.cts,
        |        max(c.event_id) AS cid
        |      FROM g LEFT JOIN c ON c.user_id = g.user_id AND c.ts_us = g.cts
        |      GROUP BY 1, 2, 3, 4)
        |SELECT purchase_id, user_id, ts_us,
        |  CAST(coalesce(cts, -1) AS BIGINT) AS click_ts_us,
        |  CAST(coalesce(cid, -1) AS BIGINT) AS click_id
        |FROM r ORDER BY purchase_id""".stripMargin,
    "join_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |    AS o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin,
    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    event_type FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |p AS (SELECT event_id, user_id, ts_us FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts_us FROM e
        |      WHERE event_type = 'click'),
        |gp AS (SELECT p.event_id AS pid, p.user_id, p.ts_us,
        |    max(c.ts_us) AS pts
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id
        |    AND c.ts_us <= p.ts_us
        |  GROUP BY 1, 2, 3),
        |gpi AS (SELECT gp.pid, gp.user_id, gp.ts_us, gp.pts,
        |    max(c.event_id) AS pcid
        |  FROM gp LEFT JOIN c ON c.user_id = gp.user_id
        |    AND c.ts_us = gp.pts
        |  GROUP BY 1, 2, 3, 4),
        |gn AS (SELECT gpi.pid, gpi.user_id, gpi.ts_us, gpi.pts, gpi.pcid,
        |    min(c.ts_us) AS nts
        |  FROM gpi LEFT JOIN c ON c.user_id = gpi.user_id
        |    AND c.ts_us > gpi.ts_us
        |  GROUP BY 1, 2, 3, 4, 5),
        |gni AS (SELECT gn.pid, gn.user_id, gn.ts_us, gn.pts, gn.pcid,
        |    gn.nts, min(c.event_id) AS ncid
        |  FROM gn LEFT JOIN c ON c.user_id = gn.user_id
        |    AND c.ts_us = gn.nts
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |f AS (SELECT pid, user_id, ts_us, pts, pcid, nts, ncid,
        |    (pts IS NOT NULL AND ts_us - pts <= 3600000000) AS pv,
        |    (nts IS NOT NULL AND nts - ts_us <= 3600000000) AS nv
        |  FROM gni)
        |SELECT pid AS purchase_id, user_id, ts_us,
        |  CASE WHEN pv AND (NOT nv OR ts_us - pts <= nts - ts_us)
        |    THEN 'prior' WHEN nv THEN 'next' ELSE 'none' END AS side,
        |  CAST(CASE WHEN pv AND (NOT nv OR ts_us - pts <= nts - ts_us)
        |    THEN pts WHEN nv THEN nts ELSE -1 END AS BIGINT)
        |    AS click_ts_us,
        |  CAST(CASE WHEN pv AND (NOT nv OR ts_us - pts <= nts - ts_us)
        |    THEN pcid WHEN nv THEN ncid ELSE -1 END AS BIGINT)
        |    AS click_id
        |FROM f ORDER BY purchase_id""".stripMargin,
    // first digit of the cent-integer's decimal string, counted per
    // priority; share in exact ppm fixed point
    "profile_benford_digits" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT o_orderpriority, digit,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM o GROUP BY 1, 2)
        |SELECT o_orderpriority, digit, n_orders,
        |  CAST((n_orders * 1000000) // sum(n_orders)
        |    OVER (PARTITION BY o_orderpriority) AS BIGINT) AS share_ppm
        |FROM g ORDER BY o_orderpriority, digit""".stripMargin,
    "profile_numeric_stats" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', CAST(l_orderkey AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS DECIMAL(18,2)) FROM lineitem)
        |SELECT col_name, count(*) AS n,
        |  CAST(count(*) - count(v) AS BIGINT) AS n_null,
        |  count(DISTINCT v) AS n_distinct,
        |  CAST(min(v) AS DOUBLE) AS min_v,
        |  CAST(max(v) AS DOUBLE) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "profile_join_explosion" ->
      """WITH k AS (
        |  SELECT user_id, count(*) AS n_rows
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_rows, n_rows * n_rows AS pairs_est,
        |  CAST((n_rows * n_rows * 1000000)
        |    // (SELECT sum(n_rows * n_rows) FROM k) AS BIGINT)
        |    AS share_ppm
        |FROM k
        |ORDER BY pairs_est DESC, user_id LIMIT 20""".stripMargin
  )
}
