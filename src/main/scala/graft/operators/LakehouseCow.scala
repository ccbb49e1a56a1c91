package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.TxnTable
import graft.sources.TxnTable.FileEntry

/** The FILE-LEVEL lakehouse layer, graded — the copy-on-write
  * refinement the table-level snapshot keys (Lakehouse.scala) document
  * as what Delta/Iceberg add on top of an atomic snapshot log: a
  * version's manifest lists FILES (with min/max stats), a MERGE/DELETE
  * rewrites only the touched files and carries the rest BY REFERENCE,
  * scans prune files against manifest stats before reading a byte, and
  * appends are O(1) manifest extensions compacted by an OPTIMIZE
  * rewrite. At 100 TB this is the difference between a merge that
  * rewrites 100 TB per commit and one that rewrites only the buckets
  * the delta touches — the entire point of the file-level formats.
  *
  * Grading design: every file-planning census the keys emit
  * (files written / carried / dropped / scanned / skipped / purged) is
  * DERIVED FROM DATA by the DuckDB oracle (distinct-bucket counts over
  * the same deterministic bucketing expressions), so the hash-match
  * certifies that the manifest machinery's actual file operations
  * agree with the declarative spec — not just that the row content
  * survived. Driver-side collects below are all file-PLANNING metadata
  * (≤ |buckets| = 16 rows — exactly the collect Delta's own merge does
  * to enumerate touched files), never data.
  *
  * No reference file:line can exist (/root/reference is empty —
  * SURVEY.md §0); the public models are the Delta add/remove-action
  * log and the Iceberg manifest-entry spec. */
object LakehouseCow {

  private type QueryFn = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L
  /** The standing mid-range split day (same as sink_merge_upsert). */
  private val SplitUs = 19740L * DayUs
  /** Hash-bucket count for the clustered state tables. */
  private val NBuckets = 16L
  /** Micro-append quartile bounds (same as stream_exec_txn_sink). */
  private val AppendBoundsUs =
    Seq(19731L * DayUs, 19739L * DayUs, 19747L * DayUs, Long.MaxValue)

  private def evUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), Tables.dec4($"value").as("v"))
  }

  /** The clustered per-user state: exact-decimal value sum kept as a
    * 4-dp-scaled BIGINT so summary merges are plain associative sums. */
  private def state(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.groupBy($"user_id").agg(count(lit(1)).as("n_events"),
      max($"ts_us").as("last_us"),
      (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"))
  }

  /** Write `df` hash-clustered on `bkt` as one file (dir) per bucket
    * under `dest` and return the manifest entries with real per-file
    * min/max stats of `keyCol`. Stats are computed FIRST: a frame with
    * zero rows in every bucket writes nothing and returns no entries
    * (a fully-deleted file is REMOVED from the manifest, not rewritten
    * empty — the Delta remove-action shape). */
  private def writeBuckets(df: DataFrame, dest: String,
      keyCol: String): Seq[FileEntry] = {
    val s = df.sparkSession
    import s.implicits._
    // materialize once (r19): the stats collect and the data write are
    // two separate actions on `df`, and separate actions never share
    // exchanges — every writeBuckets call was computing its per-version
    // state chain TWICE (41 call sites across the sink_txn tier)
    val d = graft.PlanOnly.cut(df)
    // stats and write both read the checkpointed blocks — overlap the
    // two jobs (guide §2.6). An empty frame now writes an empty (and
    // unreferenced — the manifest gets no entries) dest dir instead of
    // skipping the write; readers resolve only manifest paths, so the
    // zero-rows-removes-the-file contract is unchanged.
    val (stats, _) = Par.both(
      d.groupBy($"bkt")
        .agg(min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"),
          count(lit(1)).as("cnt"))
        .collect(), // ≤ |buckets|: file-planning metadata, never data
      d.write.mode("overwrite").partitionBy("bkt").parquet(dest))
    if (stats.isEmpty) Seq.empty
    else
      stats.toSeq.map(r => FileEntry(r.getLong(0),
        s"$dest/bkt=${r.getLong(0)}", r.getLong(1), r.getLong(2),
        rowCount = r.getLong(3)))
  }

  /** Two-dimensional [[writeBuckets]]: per-file zone maps on BOTH
    * `k1` (→ minKey/maxKey) and `k2` (→ min2/max2) — what z-order
    * clustering needs to pay off at scan time. */
  private def writeBuckets2(df: DataFrame, dest: String,
      k1: String, k2: String): Seq[FileEntry] = {
    val s = df.sparkSession
    import s.implicits._
    // materialize once (r19): same stats-then-write double-compute as
    // writeBuckets
    val d = graft.PlanOnly.cut(df)
    // same stats/write overlap (and empty-case note) as writeBuckets
    val (stats, _) = Par.both(
      d.groupBy($"bkt")
        .agg(min(col(k1)).as("mn1"), max(col(k1)).as("mx1"),
          min(col(k2)).as("mn2"), max(col(k2)).as("mx2"),
          count(lit(1)).as("cnt"))
        .collect(), // ≤ |buckets|: file-planning metadata, never data
      d.write.mode("overwrite").partitionBy("bkt").parquet(dest))
    if (stats.isEmpty) Seq.empty
    else
      stats.toSeq.map(r => FileEntry(r.getLong(0),
        s"$dest/bkt=${r.getLong(0)}", r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), rowCount = r.getLong(5)))
  }

  /** Morton interleave of the low 16 bits of two BIGINT columns —
    * pure shift/and/add (whole-stage codegen), same arithmetic as the
    * engine-replayable sort_zorder_layout oracle. */
  private def zInterleave(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).foldLeft(lit(0L): org.apache.spark.sql.Column) { (acc, k) =>
      acc +
        shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }

  /** The same interleave as DuckDB SQL over columns `x`/`y`. */
  private def zTermsSql(x: String, y: String): String =
    (0 until 16).flatMap(k => Seq(
      s"(($x >> $k) & 1) * ${1L << (2 * k)}",
      s"(($y >> $k) & 1) * ${1L << (2 * k + 1)}")).mkString(" + ")

  /** Install `entries` as a file-level manifest, or — when the entry
    * list is empty (zero-row table state: nothing was written, so there
    * is no file to reference) — fall back to a table-level commit of
    * the empty frame, which keeps every downstream read schema-correct.
    * An empty ingest batch must commit an empty-but-readable version,
    * not throw (the EmptyFixtureSpec contract). */
  private def commitMaybeEmpty(spark: SparkSession, table: String,
      version: Int, entries: Seq[FileEntry], emptyFallback: DataFrame): Unit =
    if (entries.isEmpty) TxnTable.commit(spark, table, version, emptyFallback)
    else TxnTable.commitEntries(spark, table, version, entries)

  /** Commit a COW rewrite as an O(changed-files) DELTA manifest
    * (`adds` = rewritten files, `removes` = their superseded
    * predecessors) when the chain supports it — the base version must
    * be file-level and the resulting entry set non-empty; otherwise
    * fall back to a self-contained commit of the full set (the
    * degenerate empty-fixture shapes, where there is no census to
    * delta against). Readers resolve both identically; only the bytes
    * a commit writes differ — which is the point
    * (TxnTable.commitDelta's scale contract). */
  private def commitCowDelta(spark: SparkSession, table: String,
      version: Int, baseEntries: Seq[FileEntry], adds: Seq[FileEntry],
      removes: Seq[String], fullSet: Seq[FileEntry],
      emptyFallback: DataFrame): Unit =
    if (baseEntries.isEmpty || fullSet.isEmpty)
      commitMaybeEmpty(spark, table, version, fullSet, emptyFallback)
    else TxnTable.commitDelta(spark, table, version, adds = adds,
      removes = removes)

  /** DESCRIBE HISTORY, graded — the log-metadata audit table every
    * format exposes (Delta DESCRIBE HISTORY / Iceberg snapshots
    * metadata table), here certified AGAINST THE DATA: a 4-version
    * chain commits the clustered per-user state at the standing
    * quartile prefixes (v0 self-contained, v1..v3 as COW DELTAS whose
    * adds/removes are exactly the slice's bucket footprint), and the
    * graded frame is read FROM THE LOG — per version the visible row
    * count (snapshot read), live-file count (resolved manifest), the
    * delta's add/remove action counts, and the manifest kind — while
    * the oracle re-derives every number from the raw events (bucket
    * first-seen vs the quartile bounds). A hash-match certifies the
    * log's self-description: versions added exactly the buckets the
    * data changed, removed exactly their predecessors, and the live
    * census tracks the data's bucket closure.
    *
    * Scale shape: history is O(versions × chain) manifest parses and
    * one snapshot count per version — log metadata, no table scan
    * beyond the per-version state reads; commit planning is the ≤16-row
    * changed-bucket collect every COW key shares. */
  def sinkTxnHistoryAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def expected(): DataFrame = {
      val f = ev.select($"user_id", ($"user_id" % NBuckets).as("bkt"),
        $"ts_us")
      val perB = f.groupBy($"bkt").agg(min($"ts_us").as("mn"))
      val fj = f.join(broadcast(perB), Seq("bkt"))
      val frames = AppendBoundsUs.zipWithIndex.map { case (hi, k) =>
        val lo = if (k == 0) Long.MinValue else AppendBoundsUs(k - 1)
        fj.agg(
          countDistinct(when($"ts_us" < hi, $"user_id")).as("rows_visible"),
          countDistinct(when($"ts_us" < hi, $"bkt")).as("files_live"),
          countDistinct(when($"ts_us" >= lo && $"ts_us" < hi, $"bkt"))
            .as("files_added"),
          countDistinct(when($"ts_us" >= lo && $"ts_us" < hi &&
            $"mn" < lo, $"bkt")).as("files_removed"))
          .select(lit(k.toLong).as("version"), $"rows_visible",
            $"files_live", $"files_added", $"files_removed",
            lit(if (k > 0) 1L else 0L).as("is_delta"))
      }
      frames.reduce(_ unionAll _).orderBy($"version")
    }
    graft.PlanOnly.roundTrip(expected()) {
      val table = Tables.scratch("txn_history_table")
      TxnTable.drop(spark, table)
      var prev: Seq[FileEntry] = Seq.empty
      AppendBoundsUs.zipWithIndex.foreach { case (hi, k) =>
        val st = state(ev.filter($"ts_us" < hi))
          .withColumn("bkt", $"user_id" % NBuckets)
        if (k == 0) {
          prev = writeBuckets(st, s"$table/data/v0", "user_id")
          commitMaybeEmpty(spark, table, 0, prev, st.drop("bkt"))
        } else if (prev.isEmpty) {
          // empty-fixture degenerate: no file tier to delta against
          TxnTable.commit(spark, table, k, st.drop("bkt"))
        } else {
          val lo = AppendBoundsUs(k - 1)
          val changed = ev.filter($"ts_us" >= lo && $"ts_us" < hi)
            .select(($"user_id" % NBuckets).as("b")).distinct()
            .collect().map(_.getLong(0)).toSet // ≤16: planning metadata
          val adds = writeBuckets(
            st.filter($"bkt".isInCollection(changed)), s"$table/data/v$k",
            "user_id")
          val removes = prev.filter(e => changed(e.bucket)).map(_.path)
          TxnTable.commitDelta(spark, table, k, adds = adds,
            removes = removes)
          prev = prev.filterNot(e => changed(e.bucket)) ++ adds
        }
      }
      val rows = TxnTable.history(spark, table).map {
        case (v, files, _, isDelta, adds, removes) =>
          // rows_visible comes from the MANIFEST rowCount stats (zero
          // data I/O — the production DESCRIBE HISTORY path); countAt
          // falls back to a real snapshot count only for stat-less or
          // delete-carrying versions, which this table never commits
          (v.toLong, TxnTable.countAt(spark, table, Some(v)),
            files.toLong, adds.toLong, removes.toLong,
            if (isDelta) 1L else 0L)
      }
      rows.toDF("version", "rows_visible", "files_live", "files_added",
        "files_removed", "is_delta").orderBy($"version")
    }
  }

  /** ARBITRARY-COLUMN ZONE MAPS via a versioned STATS SIDECAR — the
    * Parquet-footer-stats-in-the-manifest tier (Iceberg's column
    * metrics / Delta's per-column minValues-maxValues) the FileEntry's
    * clustering-key zone map can't give an ad-hoc query: the state
    * table is clustered by VALUE RANGE but its manifest entries record
    * user_id stats only (deliberately useless for a value predicate),
    * and a sidecar TxnTable — committed in the same version cadence —
    * carries per-file (column, min, max, rows) footer stats for EVERY
    * column. The graded query filters on `v_sum_4dp` (not the manifest
    * key): scan planning reads the SIDECAR, prunes to the overlapping
    * files (driver-side O(files) metadata, like every commit planner
    * here), scans only them with the residual filter, and emits the
    * files_total/scanned/skipped census — every number re-derived from
    * raw events by the oracle, so the hash certifies the pruning was
    * exactly the stats-overlap set and lost no rows.
    *
    * Scale shape: the sidecar is |files|·|columns| rows of metadata —
    * at 10⁶ files × 20 columns it is a 2×10⁷-row table read with a
    * pushed column-name filter, never the data; pruning cost is
    * O(files) independent of data volume, the zone-map promise. The
    * sidecar rows' `rows` column must agree with the manifest
    * rowCount tier (LakehouseCowSpec stats-honesty law). */
  def sinkTxnColumnStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"files_total", $"files_scanned", $"files_skipped")
      .orderBy($"user_id")
    def equivalent = {
      val st = state(ev)
      val bF = st.agg(min($"v_sum_4dp").as("mn"), max($"v_sum_4dp").as("mx"))
      val withB = st.crossJoin(broadcast(bF))
        .withColumn("w", expr(s"((mx - mn) DIV $NBuckets) + 1"))
        .withColumn("b", expr("(v_sum_4dp - mn) DIV w"))
        .withColumn("lo", expr("mn + ((mx - mn) * 3) DIV 10"))
        .withColumn("hi", expr("mn + ((mx - mn) * 9) DIV 20"))
      val perB = withB.groupBy($"b", $"lo", $"hi")
        .agg(min($"v_sum_4dp").as("bmn"), max($"v_sum_4dp").as("bmx"))
      val census = perB.agg(count(lit(1)).as("files_total"),
        count(when($"bmx" >= $"lo" && $"bmn" <= $"hi", 1))
          .as("files_scanned"))
      shape(withB.filter($"v_sum_4dp" >= $"lo" && $"v_sum_4dp" <= $"hi")
        .crossJoin(broadcast(census.select($"files_total", $"files_scanned",
          ($"files_total" - $"files_scanned").as("files_skipped")))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_colstats")
      val tStats = Tables.scratch("txn_colstats_sidecar")
      TxnTable.drop(spark, table)
      TxnTable.drop(spark, tStats)
      val st = state(ev)
      val bRow = st.agg(min($"v_sum_4dp"), max($"v_sum_4dp"))
        .collect().head // table stats: planning scalars
      if (bRow.isNullAt(0)) {
        TxnTable.commit(spark, table, 0, st) // empty-but-readable
        shape(TxnTable.read(spark, table, None)
          .withColumn("files_total", lit(0L))
          .withColumn("files_scanned", lit(0L))
          .withColumn("files_skipped", lit(0L)))
      } else {
        val (mn, mx) = (bRow.getLong(0), bRow.getLong(1))
        val w = (mx - mn) / NBuckets + 1
        val lo = mn + (mx - mn) * 3 / 10
        val hi = mn + (mx - mn) * 9 / 20
        // layout clustered by VALUE range; the manifest's zone map
        // deliberately records user_id — useless for this predicate
        val clustered = st.withColumn("bkt",
          expr(s"(v_sum_4dp - ${mn}L) DIV ${w}L"))
        val e0 = writeBuckets(clustered, s"$table/data/v0", "user_id")
        commitMaybeEmpty(spark, table, 0, e0, st)
        // per-file per-column footer stats → the versioned sidecar
        TxnTable.commit(spark, tStats, 0,
          fileColumnStats(clustered, s"$table/data/v0"))
        // scan planning: prune via the SIDECAR's v_sum_4dp zone maps —
        // O(files) metadata, zero data I/O
        val pruned = TxnTable.read(spark, tStats, None)
          .filter($"col" === "v_sum_4dp" && $"mx" >= lo && $"mn" <= hi)
          .select($"path").collect().map(_.getString(0)).sorted
        val out =
          if (pruned.isEmpty) TxnTable.read(spark, table, None).limit(0)
          else spark.read.parquet(pruned.toIndexedSeq: _*)
        shape(out
          .filter($"v_sum_4dp".between(lo, hi)) // residual: stats admit a superset
          .withColumn("files_total", lit(e0.size.toLong))
          .withColumn("files_scanned", lit(pruned.length.toLong))
          .withColumn("files_skipped", lit(e0.size.toLong - pruned.length)))
      }
    }
  }

  /** NDV SIDECAR STATS — the distinct-count tier the zone-map sidecar
    * ([[sinkTxnColumnStats]]) lacks and join planning / CBO needs (the
    * r15 verdict's missing item 4): per (file, column), a k = 16 KMV
    * sample — the 16 smallest replayable hashes of the column's
    * DISTINCT values (the agg_kmv_replayable machinery at file grain)
    * — committed as a versioned sidecar TxnTable next to the
    * hash-clustered state table. Serving is METADATA-ONLY (the
    * sink_txn_stats_serve posture): per file the sample count + θ fold
    * to ndv_est = ⌊(k−1)·M/θ⌋ with the exact-count fallback below k,
    * and — the property the sketch exists for — the per-file samples
    * MERGE LOSSLESSLY: the k smallest of the union of per-file
    * k-samples IS the k smallest of the whole table (any global
    * top-k hash is necessarily in its own file's top-k), so the
    * bkt = −1 merged row is the TRUE table-level KMV with no data
    * read. Columns chosen to exercise both regimes: user_id (unique
    * per row — the estimator regime) and n_events (tiny domain — the
    * exact-fallback regime).
    *
    * Scale shape: the sidecar is |files|·|columns|·k metadata rows; a
    * table-NDV question at 10⁶ files reads 3.2×10⁷ sidecar rows and
    * zero data bytes; the merge is ORDER BY h LIMIT k over samples —
    * never a distinct over the corpus. */
  def sinkTxnNdvStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = evUsers(spark, dir)
    def serve(sidecar: DataFrame): DataFrame = {
      val perFile = sidecar.groupBy($"bkt", $"col")
        .agg(count(lit(1)).as("n_sample"), max($"h").as("theta"))
      val merged = sidecar.select($"col", $"h").distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy($"col").orderBy($"h")))
        .filter($"rn" <= 16)
        .groupBy($"col")
        .agg(count(lit(1)).as("n_sample"), max($"h").as("theta"))
        .select(lit(-1L).as("bkt"), $"col", $"n_sample", $"theta")
      perFile.select($"bkt", $"col", $"n_sample", $"theta")
        .unionAll(merged)
        .select($"bkt", $"col", $"n_sample", $"theta",
          when($"n_sample" < 16, $"n_sample")
            .otherwise(expr("32212254705 div theta")).as("ndv_est"))
        .orderBy($"col", $"bkt")
    }
    def sampleF(): DataFrame = {
      val st = state(ev).withColumn("bkt", expr("user_id % 8"))
      st.select($"bkt", explode(array(
          struct(lit("n_events").as("col"), $"n_events".as("v")),
          struct(lit("user_id").as("col"), $"user_id".as("v")))).as("kv"))
        .select($"bkt", $"kv.col".as("col"), $"kv.v".as("v")).distinct()
        .select($"bkt", $"col",
          expr("((v + 1) * 2654435761) % 2147483647").as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"bkt", $"col").orderBy($"h")))
        .filter($"rn" <= 16)
        .select($"bkt", $"col", $"h")
    }
    graft.PlanOnly.roundTrip(serve(sampleF())) {
      val table = Tables.scratch("txn_ndv")
      val tSide = Tables.scratch("txn_ndv_sidecar")
      Seq(table, tSide).foreach(TxnTable.drop(spark, _))
      val st = state(ev).withColumn("bkt", expr("user_id % 8"))
      val e0 = writeBuckets(st, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      val side = sampleF().withColumn("path",
        concat(lit(s"$table/data/v0/bkt="), $"bkt"))
      TxnTable.commit(spark, tSide, 0, side)
      serve(TxnTable.read(spark, tSide).select($"bkt", $"col", $"h"))
    }
  }

  /** STATS-DRIVEN JOIN-CARDINALITY ESTIMATION — the CBO loop the NDV
    * tier ([[sinkTxnNdvStats]]) exists FOR, closed end to end: three
    * join scenarios are planned METADATA-ONLY from committed stats
    * (row counts from the manifest rowCount tier via countAt; join-key
    * NDVs from a committed KMV sidecar — never a data scan), estimated
    * with the textbook equi-join formula |A ⋈ B| ≈ r_A·r_B /
    * max(ndv_A, ndv_B), and then CONFRONTED with the exact join count
    * — every row is a self-auditing estimation receipt (ratio_fp =
    * ⌊2²⁰·est/true⌋). The scenarios exercise the formula's regimes:
    * unique-key joins land within sketch error (ratio ≈ 2²⁰), while
    * the SELECTIVE dim (active users only) overestimates — the
    * containment-assumption failure every CBO textbook warns about,
    * made visible in the receipt.
    *
    * Scale shape: planning reads O(1) manifest scalars + a ≤64-row
    * sketch per table — zero data bytes; only the truth column (the
    * receipt's subject) runs real semi-joins. KMV samples are ORDER BY
    * h LIMIT k (TakeOrderedAndProject — per-partition top-k, never a
    * global sort). */
  def sinkTxnCboEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val M = 2147483647L
    val ev = evUsers(spark, dir)
    def usersAll() = state(ev).select($"user_id")
    // the selective dim: users above 1.1x the mean event count — a
    // scale-free cut (~20% of users at every SF), so the containment
    // failure shows at all graded fixtures
    def usersActive() = {
      val tot = state(ev).agg(count(lit(1)).as("u"),
        sum($"n_events").as("tot"))
      state(ev).crossJoin(broadcast(tot))
        .filter($"n_events" * $"u" * 10L > $"tot" * 11L)
        .select($"user_id")
    }
    def sliceB(t: String) = ev.filter($"event_type" === t)
      .select($"user_id", $"event_id")
    def kmvH(keys: DataFrame): DataFrame = keys.distinct()
      .select(expr(s"((user_id + 1) * 2654435761) % $M").as("h"))
      .orderBy($"h").limit(64)
    // (name, planned row-count frame [1 row: r], key sample, table for
    // the truth join) per side — planning inputs stay frames so the
    // plan-only equivalent and the stats-served graded path share the
    // same assembly
    def scenario(name: String, ra: DataFrame, a: DataFrame, aH: DataFrame,
        rb: DataFrame, b: DataFrame, bH: DataFrame): DataFrame = {
      val na = aH.agg(count(lit(1)).as("nsa"),
        coalesce(max($"h"), lit(-1L)).as("tha"))
      val nb = bH.agg(count(lit(1)).as("nsb"),
        coalesce(max($"h"), lit(-1L)).as("thb"))
      val tr = b.join(a, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("true_rows"))
      ra.select($"r".as("r_a")).crossJoin(rb.select($"r".as("r_b")))
        .crossJoin(na).crossJoin(nb).crossJoin(tr)
        .select(lit(name).as("scenario"), $"r_a", $"r_b",
          expr(s"CASE WHEN nsa < 64 THEN nsa " +
            s"ELSE ${63L * M} div tha END").as("ndv_a"),
          expr(s"CASE WHEN nsb < 64 THEN nsb " +
            s"ELSE ${63L * M} div thb END").as("ndv_b"),
          $"true_rows")
        .withColumn("est_rows",
          when(greatest($"ndv_a", $"ndv_b") > 0L,
            expr("(r_a * r_b) div greatest(ndv_a, ndv_b)")).otherwise(0L))
        .withColumn("ratio_fp",
          when($"true_rows" > 0L,
            expr("(est_rows * 1048576) div true_rows")).otherwise(-1L))
        .select($"scenario", $"r_a", $"r_b", $"ndv_a", $"ndv_b",
          $"est_rows", $"true_rows", $"ratio_fp")
    }
    def cntF(df: DataFrame): DataFrame = df.agg(count(lit(1)).as("r"))
    def assemble(uAll: DataFrame, rAll: DataFrame, uAct: DataFrame,
        rAct: DataFrame, bP: DataFrame, rP: DataFrame, bC: DataFrame,
        rC: DataFrame, hAll: DataFrame, hAct: DataFrame, hP: DataFrame,
        hC: DataFrame): DataFrame =
      scenario("active_x_purchase", rAct, uAct, hAct, rP, bP, hP)
        .unionAll(scenario("all_x_click", rAll, uAll, hAll, rC, bC, hC))
        .unionAll(scenario("all_x_purchase", rAll, uAll, hAll, rP, bP, hP))
        .orderBy($"scenario")
    graft.PlanOnly.roundTrip(assemble(
      usersAll(), cntF(usersAll()), usersActive(), cntF(usersActive()),
      sliceB("purchase"), cntF(sliceB("purchase")),
      sliceB("click"), cntF(sliceB("click")),
      kmvH(usersAll()), kmvH(usersActive()),
      kmvH(sliceB("purchase").select($"user_id")),
      kmvH(sliceB("click").select($"user_id")))) {
      val tables = Seq("cbo_a_all" -> usersAll(), "cbo_a_act" -> usersActive(),
        "cbo_b_pur" -> sliceB("purchase"), "cbo_b_clk" -> sliceB("click"))
      val tS = Tables.scratch("cbo_ndv_sidecar")
      TxnTable.drop(spark, tS)
      val stored = tables.map { case (nm, df) =>
        val t = Tables.scratch(nm)
        TxnTable.drop(spark, t)
        val n = df.count()
        if (n == 0L) TxnTable.commit(spark, t, 0, df)
        else {
          val p = s"$t/data/f0"
          df.write.mode("overwrite").parquet(p)
          TxnTable.commitEntries(spark, t, 0, Seq(TxnTable.FileEntry(0L, p,
            Long.MinValue, Long.MaxValue, rowCount = n)))
        }
        nm -> t
      }.toMap
      // the committed KMV sidecar: one ≤64-row key sample per table
      TxnTable.commit(spark, tS, 0, tables.map { case (nm, df) =>
        kmvH(df.select($"user_id")).withColumn("tbl", lit(nm))
      }.reduce(_.unionAll(_)))
      val sc = TxnTable.read(spark, tS)
      def sideH(nm: String) = sc.filter($"tbl" === nm).select($"h")
      // row counts from MANIFEST stats (countAt — zero data I/O),
      // attached as planning literals like every commit planner here
      def mCount(nm: String) = spark.range(1)
        .select(lit(TxnTable.countAt(spark, stored(nm))).as("r"))
      def asTable(nm: String) = TxnTable.read(spark, stored(nm))
      assemble(asTable("cbo_a_all"), mCount("cbo_a_all"),
        asTable("cbo_a_act"), mCount("cbo_a_act"),
        asTable("cbo_b_pur"), mCount("cbo_b_pur"),
        asTable("cbo_b_clk"), mCount("cbo_b_clk"),
        sideH("cbo_a_all"), sideH("cbo_a_act"), sideH("cbo_b_pur"),
        sideH("cbo_b_clk"))
    }
  }

  // ---- shared CBO planning machinery (r17 ADVICE: one copy) ----------

  /** KMV modulus (2³¹ − 1) shared by every CBO key sample. */
  private val CboM = 2147483647L

  /** The ≤64-hash KMV key sample of a frame's user_id column — the
    * committed join-key NDV sketch every CBO key stages per table. */
  private def cboKmvH(keys: DataFrame): DataFrame = {
    val s = keys.sparkSession
    import s.implicits._
    keys.distinct()
      .select(expr(s"((user_id + 1) * 2654435761) % $CboM").as("h"))
      .orderBy($"h").limit(64)
  }

  /** The KMV NDV estimate of a sketch as a 1-row/1-col frame
    * (ns < 64 ⇒ exact; else the (k−1)·M/θ estimator). */
  private def cboNdvCol(h: DataFrame, as: String): DataFrame = {
    val s = h.sparkSession
    import s.implicits._
    h.agg(count(lit(1)).as("ns"), coalesce(max($"h"), lit(-1L)).as("th"))
      .select(expr(s"CASE WHEN ns < 64 THEN ns " +
        s"ELSE ${63L * CboM} div th END").as(as))
  }

  /** The KMV NDV estimate of table `nm`'s rows in the committed sketch
    * sidecar `sc`, as a planning scalar. */
  private def cboNdvOf(sc: DataFrame, nm: String): Long = {
    val s = sc.sparkSession
    import s.implicits._
    val r = sc.filter($"tbl" === nm)
      .agg(count(lit(1)).as("ns"), coalesce(max($"h"), lit(-1L)).as("th"))
      .collect()(0) // 1 row: planning metadata, never data
    val (ns, th) = (r.getLong(0), r.getLong(1))
    if (ns < 64) ns else 63L * CboM / th
  }

  /** The CBO dim slices over the per-user state — all users, the
    * heavy-hitter "active" 10%+ band, and a 1%-of-keys sparse slice. */
  private def cboUsersAll(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    state(ev).select($"user_id")
  }
  private def cboUsersActive(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val tot = state(ev).agg(count(lit(1)).as("u"),
      sum($"n_events").as("tot"))
    state(ev).crossJoin(broadcast(tot))
      .filter($"n_events" * $"u" * 10L > $"tot" * 11L)
      .select($"user_id")
  }
  private def cboUsersSparse(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    state(ev).filter($"user_id" % 97 === 0).select($"user_id")
  }

  /** Stage each (name, frame) as a FILE-LEVEL TxnTable (table-level
    * when empty — the commitMaybeEmpty contract) and commit the shared
    * KMV sketch sidecar under `sidecarTable`; returns name → table. */
  private def cboStage(spark: SparkSession, sidecarTable: String,
      defs: Seq[(String, DataFrame)]): Map[String, String] = {
    import spark.implicits._
    TxnTable.drop(spark, sidecarTable)
    // r19: each staged frame was computed THREE times (count, data
    // write, KMV sidecar build — separate actions never share
    // exchanges) and the 5 tables staged sequentially. Checkpoint each
    // frame once and stage the tables on parallel driver threads
    // (distinct scratch dirs + distinct manifests — the established
    // X5 overlap shape); only the shared sidecar commit stays on the
    // caller thread, after all frames exist. Scratch paths are minted
    // on the caller thread (sweepStaleScratch is not re-entrant).
    val planned = defs.map { case (nm, df) => (nm, Tables.scratch(nm), df) }
    val staged = Par.all(planned.map { case (nm, t, df) => () =>
      TxnTable.drop(spark, t)
      val d = graft.PlanOnly.cut(df)
      val n = d.count()
      if (n == 0L) TxnTable.commit(spark, t, 0, d)
      else {
        val p = s"$t/data/f0"
        d.write.mode("overwrite").parquet(p)
        TxnTable.commitEntries(spark, t, 0, Seq(FileEntry(0L, p,
          Long.MinValue, Long.MaxValue, rowCount = n)))
      }
      (nm, t, d)
    }: _*)
    TxnTable.commit(spark, sidecarTable, 0, staged.map { case (nm, _, d) =>
      cboKmvH(d.select($"user_id")).withColumn("tbl", lit(nm))
    }.reduce(_.unionAll(_)))
    staged.map { case (nm, t, _) => nm -> t }.toMap
  }

  /** STATS-DRIVEN PLAN CHOICE — the decision rung [[sinkTxnCboEstimate]]
    * stops short of (r16 verdict item 3): the committed stats don't
    * just PRICE a join, they PICK ITS STRATEGY. Three star-join
    * scenarios (dim ⋉ fact intermediate, probed against the click
    * fact) are planned METADATA-ONLY — row counts from the manifest
    * rowCount tier (countAt), join-key NDVs from the committed KMV
    * sidecar — the intermediate's cardinality estimated with the
    * semi-join containment formula |F ⋉ D| ≈ r_F · min(ndv_D, ndv_F) /
    * ndv_F, and the BROADCAST-VS-SHUFFLE decision taken from the
    * estimate alone (broadcast when est·8 ≤ r_probe — the
    * autoBroadcastJoinThreshold gesture as a scale-free row-ratio);
    * the probe join then EXECUTES under the chosen hint. The graded
    * row is the planner-regression receipt every CBO needs: estimate
    * vs truth, the decision taken, the decision truth would have
    * taken, and whether truth would have FLIPPED it — with the final
    * join count proving the answer is strategy-independent. Scenarios
    * exercise the regimes: the full dim (estimate exact up to sketch
    * error), the SELECTIVE dim (the skew/containment failure mode —
    * active users are heavy users, so their fact share exceeds their
    * key share), and a sparse 1%-of-keys dim (clear broadcast).
    * The plan shape under each decision is pinned in LakehouseSpec
    * (broadcast choice ⇒ BroadcastHashJoin, shuffle choice ⇒ no
    * broadcast on the intermediate) with AQE off.
    *
    * Scale shape: planning reads O(1) manifest scalars + a ≤64-row
    * sketch per table and the decision is driver arithmetic — zero
    * data bytes before the strategy is fixed, which is the entire
    * point: at 100 TB the wrong choice here is a 10⁴-executor
    * shuffle of a table that fit in RAM. */
  def sinkTxnCboChoose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def usersAll() = cboUsersAll(ev)
    def usersActive() = cboUsersActive(ev)
    def usersSparse() = cboUsersSparse(ev)
    def factF() = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id")
    def probeF() = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id")
    // decision receipt from frames — shared shape of both branches;
    // `joined` is the EXECUTED probe join (hinted in the real branch)
    def receipt(name: String, rd: DataFrame, rf: DataFrame, rp: DataFrame,
        nd: DataFrame, nf: DataFrame, inter: DataFrame,
        joined: DataFrame): DataFrame =
      rd.crossJoin(rf).crossJoin(rp).crossJoin(nd).crossJoin(nf)
        .crossJoin(inter.agg(count(lit(1)).as("true_inter")))
        .crossJoin(joined.agg(count(lit(1)).as("join_rows")))
        .select(lit(name).as("scenario"), $"r_dim", $"r_fact", $"r_probe",
          $"ndv_dim", $"ndv_fact",
          expr("CASE WHEN ndv_fact > 0 THEN (r_fact * " +
            "least(ndv_dim, ndv_fact)) div ndv_fact ELSE 0 END")
            .as("est_inter"),
          $"true_inter", $"join_rows")
        .withColumn("est_bcast",
          when($"est_inter" * 8L <= $"r_probe", 1L).otherwise(0L))
        .withColumn("true_bcast",
          when($"true_inter" * 8L <= $"r_probe", 1L).otherwise(0L))
        .withColumn("flipped",
          when($"est_bcast" =!= $"true_bcast", 1L).otherwise(0L))
        .select($"scenario", $"r_dim", $"r_fact", $"r_probe", $"ndv_dim",
          $"ndv_fact", $"est_inter", $"true_inter", $"est_bcast",
          $"true_bcast", $"flipped", $"join_rows")
    def cnt(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    def scenarioEq(name: String, dim: DataFrame): DataFrame = {
      val inter = factF().join(dim, Seq("user_id"), "left_semi")
      receipt(name, cnt(dim, "r_dim"), cnt(factF(), "r_fact"),
        cnt(probeF(), "r_probe"), cboNdvCol(cboKmvH(dim), "ndv_dim"),
        cboNdvCol(cboKmvH(factF().select($"user_id")), "ndv_fact"),
        inter, probeF().join(inter, Seq("user_id")))
    }
    def equivalent = Seq("active_dim" -> usersActive _,
        "all_dim" -> usersAll _, "sparse_dim" -> usersSparse _)
      .map { case (n, d) => scenarioEq(n, d()) }
      .reduce(_.unionAll(_)).orderBy($"scenario")
    graft.PlanOnly.roundTrip(equivalent) {
      val tS = Tables.scratch("cbo2_ndv_sidecar")
      val stored = cboStage(spark, tS,
        Seq("cbo2_all" -> usersAll(), "cbo2_act" -> usersActive(),
          "cbo2_sparse" -> usersSparse(), "cbo2_fact" -> factF(),
          "cbo2_probe" -> probeF()))
      val sc = graft.PlanOnly.cut(TxnTable.read(spark, tS))
      // planning scalars: manifest counts + ≤64-row sketch folds — the
      // O(1)-per-table metadata a real planner reads before any data
      def rOf(nm: String) = TxnTable.countAt(spark, stored(nm))
      def ndvOf(nm: String): Long = cboNdvOf(sc, nm)
      val (rFact, rProbe) = (rOf("cbo2_fact"), rOf("cbo2_probe"))
      val ndvFact = ndvOf("cbo2_fact")
      def lick(v: Long, as: String) = spark.range(1).select(lit(v).as(as))
      def scenarioReal(name: String, dimNm: String): DataFrame = {
        val rDim = rOf(dimNm)
        val ndvDim = ndvOf(dimNm)
        val est = if (ndvFact > 0) rFact * math.min(ndvDim, ndvFact) / ndvFact
          else 0L
        val chosenBcast = est * 8L <= rProbe
        val dim = TxnTable.read(spark, stored(dimNm))
        val fact = TxnTable.read(spark, stored("cbo2_fact"))
        val probe = TxnTable.read(spark, stored("cbo2_probe"))
        val inter = fact.join(dim, Seq("user_id"), "left_semi")
        // THE decision: the estimate alone picks the physical strategy
        val joined =
          if (chosenBcast) probe.join(broadcast(inter), Seq("user_id"))
          else probe.hint("merge").join(inter, Seq("user_id"))
        receipt(name, lick(rDim, "r_dim"), lick(rFact, "r_fact"),
          lick(rProbe, "r_probe"), lick(ndvDim, "ndv_dim"),
          lick(ndvFact, "ndv_fact"), inter, joined)
      }
      Seq("active_dim" -> "cbo2_act", "all_dim" -> "cbo2_all",
          "sparse_dim" -> "cbo2_sparse")
        .map { case (n, t) => scenarioReal(n, t) }
        .reduce(_.unionAll(_)).orderBy($"scenario")
    }
  }

  /** The SMB state-merge algebra: full-outer on the bucket key, counts
    * and sums fold, last_us takes the max — shared by the graded key
    * and BucketingSpec's no-Exchange plan pin. */
  private[graft] def smbMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val l = a.select($"user_id", $"n_events".as("an"),
      $"last_us".as("al"), $"v_sum_4dp".as("av"))
    val r = b.select($"user_id", $"n_events".as("bn"),
      $"last_us".as("bl"), $"v_sum_4dp".as("bv"))
    l.join(r, Seq("user_id"), "full_outer")
      .select($"user_id",
        (coalesce($"an", lit(0L)) + coalesce($"bn", lit(0L))).as("n_events"),
        greatest(coalesce($"al", $"bl"), coalesce($"bl", $"al"))
          .as("last_us"),
        (coalesce($"av", lit(0L)) + coalesce($"bv", lit(0L)))
          .as("v_sum_4dp"))
  }

  /** SORT-MERGE-BUCKET RUNG ON THE TRANSACTIONAL TIER — the
    * [[Relational.sinkBucketedJoin]] proof applied to the TxnTable log
    * (r16 verdict item 6): the manifest RECORDS the snapshot's physical
    * layout ([[TxnTable.commitAt]] — bucket key, bucket count, catalog
    * table), and the MERGE path plans from the LOG — it reads both
    * sides' layout strings, verifies they agree on (key, buckets), and
    * only then serves the merge as a co-bucketed sort-merge join over
    * the two Hive-bucketed snapshots: NO exchange on either side, and
    * NO sort either — the sort-free half needs Spark to TRUST the
    * bucket files' recorded sort order (SPARK-28595 ignores it by
    * default), so the key pins
    * spark.sql.legacy.bucketedTableScan.outputOrdering=true around
    * the matching-layout merge itself (r17 ADVICE: the claim must
    * hold in the graded run, not only under BucketingSpec's conf;
    * both pinned with AQE/broadcast off in BucketingSpec; a layout
    * mismatch would fall back to the ordinary shuffle merge — the
    * safe direction None layouts also take). The merge OUTPUT is
    * written bucketed again and committed as v1 WITH its layout — the
    * invariant that keeps every later merge exchange-free too (the
    * property that makes SMB compound: at 100 TB the state table
    * shuffles ZERO times across its entire maintenance lifetime). The
    * graded frame is v1 read back, decorated with the layout receipt;
    * the oracle recomputes the merged per-user state from raw events,
    * so the hash certifies the exchange-free fold ≡ recompute.
    *
    * Scale shape: both sides pre-hashed and pre-sorted on user_id —
    * the merge is a zip of co-located buckets (map-side at 1000
    * executors); the only data movement is the v1 write itself. */
  def sinkTxnSmbMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val post = ev.filter($"ts_us" >= SplitUs)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"bucket_count", $"layout_match")
      .orderBy($"user_id")
    def equivalent = shape(state(ev)
      .withColumn("bucket_count", lit(8L))
      .withColumn("layout_match", lit(1L)))
    graft.PlanOnly.roundTrip(equivalent) {
      val tbl = Tables.scratch("txn_smb_state")
      val dTbl = Tables.scratch("txn_smb_delta")
      Seq(tbl, dTbl).foreach(TxnTable.drop(spark, _))
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      def loc(n: String) = new org.apache.hadoop.fs.Path(wh,
        n.toLowerCase).toString
      graft.sources.Sinks.writeBucketed(state(pre), "smb_state_v0", 8,
        "user_id")
      TxnTable.commitAt(spark, tbl, 0, loc("smb_state_v0"),
        "user_id:8:smb_state_v0")
      graft.sources.Sinks.writeBucketed(state(post), "smb_delta_b0", 8,
        "user_id")
      TxnTable.commitAt(spark, dTbl, 0, loc("smb_delta_b0"),
        "user_id:8:smb_delta_b0")
      // plan from the LOG: both layouts must agree on (key, buckets)
      def lay(t: String): (String, Long, String) = {
        val l = TxnTable.layoutOf(spark, t, Some(0))
          .getOrElse(sys.error(s"no layout recorded for $t"))
        val Array(k, n, cat) = l.split(":", 3)
        (k, n.toLong, cat)
      }
      val (ka, na, ca) = lay(tbl)
      val (kb, nb, cb) = lay(dTbl)
      val matches = ka == kb && na == nb
      // trust the recorded per-bucket sort order so the co-bucketed
      // merge plans sort-free as well as exchange-free (SPARK-28595
      // hides it by default); scoped to this merge + its write
      val ordKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      val ordPrev = spark.conf.getOption(ordKey)
      if (matches) spark.conf.set(ordKey, "true")
      try {
        val merged =
          if (matches) smbMerge(spark.table(ca), spark.table(cb))
          else smbMerge(TxnTable.read(spark, tbl, Some(0)),
            TxnTable.read(spark, dTbl, Some(0))) // unknown layout: shuffle
        // the merge write PRESERVES the layout — v1 is bucketed too
        graft.sources.Sinks.writeBucketed(merged, "smb_state_v1",
          na.toInt, ka)
      } finally ordPrev match {
        case Some(v) => spark.conf.set(ordKey, v)
        case None => spark.conf.unset(ordKey)
      }
      TxnTable.commitAt(spark, tbl, 1, loc("smb_state_v1"),
        s"$ka:$na:smb_state_v1")
      shape(spark.table("smb_state_v1")
        .withColumn("bucket_count", lit(na))
        .withColumn("layout_match", lit(if (matches) 1L else 0L)))
    }
  }

  /** BUCKET PRUNING ON THE SMB LAYOUT — the scan-path payoff that
    * makes the layout tier worth its write cost beyond joins: a point
    * lookup (user_id IN (...)) against the bucketed state table scans
    * ONLY the buckets the probe keys hash to — at 8 buckets that is
    * ≤ |probes| of 8 files; at a production table's 4096 buckets it is
    * the difference between reading 100 TB and reading 25 GB per
    * lookup batch. The probe panel is the 5 smallest user_ids
    * (data-derived, deterministic); the literal IN-list is what lets
    * Spark's bucket pruning fire (a dynamic frame wouldn't — the same
    * reason DPP exists for partitions), and the pruned scan is pinned
    * in BucketingSpec (`SelectedBucketsCount: k out of 8`, k ≤ 5).
    * Graded = the probed rows + the layout receipt; the oracle
    * re-derives the panel and rows from raw events.
    *
    * Scale shape: the probe-key collect is ≤5 rows of planning
    * metadata (the literal the pruner needs); the lookup reads
    * O(probes) buckets and zero others — no shuffle anywhere. */
  def sinkTxnBucketPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"buckets_total", $"n_probes")
      .orderBy($"user_id")
    def panelF() = state(ev).select($"user_id")
      .orderBy($"user_id").limit(5)
    def equivalent = {
      val nP = panelF().agg(count(lit(1)).as("n_probes"))
      shape(state(ev)
        .join(panelF(), Seq("user_id"), "left_semi")
        .withColumn("buckets_total", lit(8L))
        .crossJoin(broadcast(nP)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val tbl = Tables.scratch("txn_bprune_state")
      TxnTable.drop(spark, tbl)
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      graft.sources.Sinks.writeBucketed(state(ev), "bprune_state", 8,
        "user_id")
      TxnTable.commitAt(spark, tbl, 0,
        new org.apache.hadoop.fs.Path(wh, "bprune_state").toString,
        "user_id:8:bprune_state")
      // ≤5 probe keys: the literal IN-list bucket pruning needs —
      // planning metadata, never data
      val keys = panelF().collect().map(_.getLong(0)).toSeq
      val looked =
        if (keys.isEmpty) spark.table("bprune_state").limit(0)
        else spark.table("bprune_state").filter($"user_id".isin(keys: _*))
      shape(looked
        .withColumn("buckets_total", lit(8L))
        .withColumn("n_probes", lit(keys.size.toLong)))
    }
  }

  /** HISTOGRAM SIDECAR + RANGE-SELECTIVITY ESTIMATION — the third
    * stats rung (zone maps prune files, [[sinkTxnNdvStats]] prices
    * joins; THIS prices range predicates INSIDE a file, where a
    * min/max zone map is worthless under skew): per file of the
    * value-clustered state table, a 16-bucket EQUI-WIDTH histogram of
    * v_sum_4dp commits as a versioned sidecar; a range predicate (the
    * 30–45% band of the domain — sinkTxnColumnStats' band) is then
    * estimated METADATA-ONLY — full interior buckets count whole,
    * edge buckets interpolate linearly with one truncating integer
    * division per (file, bucket) — and CONFRONTED with the exact
    * count: one receipt row per file plus the bkt = −1 table rollup,
    * ratio_fp = ⌊2²⁰·est/true⌋ making the interpolation error
    * self-auditing (uniform-within-bucket is the assumption every
    * histogram CBO rides; the receipt shows where it bends).
    *
    * Scale shape: the sidecar is |files|·16 metadata rows, each
    * CARRYING its grid scalars (mn, mx, w) and the band (lo, hi) —
    * committed at build time so the estimate path reads ONLY the
    * sidecar, zero data bytes at any table size (r17 ADVICE: the
    * serving branch previously recomputed the domain bounds from the
    * state table); only the truth column (the receipt's subject)
    * scans. Per-row grid scalars are also what lets the maintain rung
    * ([[sinkTxnHistMaintain]]) keep HETEROGENEOUS grids per file. */
  def sinkTxnHistSelectivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"bkt", $"est_rows", $"true_rows", $"ratio_fp")
      .orderBy($"bkt")
    // planning scalars as a 1-row frame: domain bounds, bucket width,
    // predicate band — computed ONCE at build time, committed on every
    // sidecar row, never re-derived from data at estimation time
    def boundsF(st: DataFrame): DataFrame = st.agg(
        coalesce(min($"v_sum_4dp"), lit(0L)).as("mn"),
        coalesce(max($"v_sum_4dp"), lit(0L)).as("mx"))
      .select($"mn", $"mx",
        expr("((mx - mn) DIV 16) + 1").as("w"),
        expr("mn + ((mx - mn) * 3) DIV 10").as("lo"),
        expr("mn + ((mx - mn) * 9) DIV 20").as("hi"))
    def sideF(st: DataFrame, bounds: DataFrame): DataFrame =
      st.crossJoin(broadcast(bounds))
        .select($"bkt", expr("(v_sum_4dp - mn) DIV w").as("hb"),
          $"mn", $"mx", $"w", $"lo", $"hi")
        .groupBy($"bkt", $"hb", $"mn", $"mx", $"w", $"lo", $"hi")
        .agg(count(lit(1)).as("cnt"))
    def receiptOf(st: DataFrame, side: DataFrame): DataFrame = {
      // the estimate: every scalar rides the sidecar rows themselves
      val est = side
        .withColumn("blo", $"mn" + $"hb" * $"w")
        .withColumn("bhi", $"mn" + ($"hb" + 1L) * $"w" - 1L)
        .withColumn("ov",
          greatest(lit(0L),
            least($"hi", $"bhi") - greatest($"lo", $"blo") + 1L))
        .groupBy($"bkt")
        .agg(sum(expr("(cnt * ov) div w")).as("est_rows"))
      // the truth reads the table, but its BAND comes from the sidecar
      val band = side.select($"lo", $"hi").distinct()
      val tru = st.crossJoin(broadcast(band))
        .filter($"v_sum_4dp".between($"lo", $"hi"))
        .groupBy($"bkt").agg(count(lit(1)).as("true_rows"))
      val perFile = est.join(tru, Seq("bkt"), "full_outer")
        .select($"bkt", coalesce($"est_rows", lit(0L)).as("est_rows"),
          coalesce($"true_rows", lit(0L)).as("true_rows"))
      val table = perFile.agg(
          coalesce(sum($"est_rows"), lit(0L)).as("est_rows"),
          coalesce(sum($"true_rows"), lit(0L)).as("true_rows"))
        .select(lit(-1L).as("bkt"), $"est_rows", $"true_rows")
      perFile.unionAll(table)
        .withColumn("ratio_fp",
          when($"true_rows" > 0L,
            expr("(est_rows * 1048576) div true_rows")).otherwise(-1L))
    }
    def stF() = state(ev).withColumn("bkt", expr("user_id % 8"))
    graft.PlanOnly.roundTrip(
      shape(receiptOf(stF(), sideF(stF(), boundsF(stF()))))) {
      val table = Tables.scratch("txn_hist_state")
      val tSide = Tables.scratch("txn_hist_sidecar")
      Seq(table, tSide).foreach(TxnTable.drop(spark, _))
      val st = graft.PlanOnly.cut(stF())
      val e0 = writeBuckets(st, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      // per-file 16-bucket equi-width histograms WITH their planning
      // scalars → the sidecar commit
      TxnTable.commit(spark, tSide, 0, sideF(st, boundsF(st)))
      // estimation reads ONLY the sidecar; truth reads the table (the
      // hive-style layout strips bkt from the files — re-derive it
      // from the clustering expression, exactly what a reader with
      // the manifest's bucket column would attach)
      shape(receiptOf(TxnTable.read(spark, table, None)
          .withColumn("bkt", expr("user_id % 8")),
        TxnTable.read(spark, tSide, None)
          .select($"bkt", $"hb", $"cnt", $"mn", $"mx", $"w",
            $"lo", $"hi")))
    }
  }

  /** Per-file equi-width histogram rows of a bucket-clustered state
    * frame, each file's 16-bucket grid pinned to ITS OWN write-time
    * domain — (bkt, hb, cnt, mn, mx, w), the sidecar grain shared by
    * [[sinkTxnHistMaintain]] (incremental maintenance) and
    * [[sinkTxnHistDecide]] (scan-vs-skip decisions). Per-file grids
    * are the honest scale design: a file written today cannot know
    * tomorrow's domain, so sidecar grids are heterogeneous BY
    * CONSTRUCTION and every consumer must merge them. */
  private def fileHist(clustered: DataFrame): DataFrame = {
    val s = clustered.sparkSession
    import s.implicits._
    val grids = clustered.groupBy($"bkt").agg(
        min($"v_sum_4dp").as("mn"), max($"v_sum_4dp").as("mx"))
      .select($"bkt", $"mn", $"mx",
        expr("((mx - mn) DIV 16) + 1").as("w"))
    clustered.join(grids, Seq("bkt"))
      .select($"bkt", expr("(v_sum_4dp - mn) DIV w").as("hb"),
        $"mn", $"mx", $"w")
      .groupBy($"bkt", $"hb", $"mn", $"mx", $"w")
      .agg(count(lit(1)).as("cnt"))
  }

  /** HISTOGRAM SIDECAR MAINTENANCE UNDER APPEND — the r17 verdict's
    * design problem made a receipt: zone maps ([[sinkTxnStatsMaintain]])
    * and NDV sketches both maintain incrementally, but equi-width
    * histograms DO NOT merge losslessly when the domain grows — an old
    * file's bucket bounds are pinned at its write-time domain, so the
    * maintained sidecar is heterogeneous-grid by construction and the
    * rollup must merge grids that disagree. v0 commits the pre-split
    * per-user state (8 value files) plus a per-FILE histogram sidecar
    * (each file's 16-bucket grid from its OWN domain); the append is
    * the merge_cow-shaped backfill (post-split events of `user_id % 64
    * = 3` — one bucket's footprint), and maintenance is
    * O(changed-files): a FRESH histogram (with a fresh grid — the
    * rewritten file's domain may have grown past every old bound) only
    * for the rewritten file, carried files keep their v0 sidecar rows
    * BY REFERENCE. The graded frame confronts the maintained
    * heterogeneous sidecar with the data: per file its grid scalars,
    * the metadata-only estimate of the standing 30–45% band (the band
    * itself folded from the sidecar's own min/max — zero data bytes in
    * the estimate path), the exact count, ratio_fp, and the rewritten
    * flag, plus the bkt = −1 rollup summing ACROSS grids. The oracle
    * re-derives every grid, estimate and truth from raw events, so the
    * hash certifies maintained ≡ rebuilt (carried files' data is
    * untouched, so their write-time grids equal a recompute — exactly
    * the property that makes carry-by-reference sound).
    *
    * Scale shape: maintenance cost = 16 metadata rows per rewritten
    * file + one aggregate over the rewritten bucket's rows; carried
    * stats are a metadata filter on the committed sidecar. At 10⁶
    * files a one-shard backfill updates one file's 16 rows — the
    * histogram tier stays fresh without the O(table) rebuild that
    * non-mergeable grids would otherwise force. */
  def sinkTxnHistMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 3)
    def shape(df: DataFrame): DataFrame = df
      .select($"bkt", $"mn", $"mx", $"w", $"est_rows", $"true_rows",
        $"ratio_fp", $"rewritten")
      .orderBy($"bkt")
    def receiptOf(st: DataFrame, side: DataFrame,
        touched: DataFrame): DataFrame = {
      // the band folds from the SIDECAR's own bounds — metadata-only
      val g = side.agg(coalesce(min($"mn"), lit(0L)).as("gmn"),
          coalesce(max($"mx"), lit(0L)).as("gmx"))
        .select($"gmn", $"gmx",
          expr("gmn + ((gmx - gmn) * 3) DIV 10").as("lo"),
          expr("gmn + ((gmx - gmn) * 9) DIV 20").as("hi"))
      val est = side.crossJoin(broadcast(g))
        .withColumn("blo", $"mn" + $"hb" * $"w")
        .withColumn("bhi", $"mn" + ($"hb" + 1L) * $"w" - 1L)
        .withColumn("ov",
          greatest(lit(0L),
            least($"hi", $"bhi") - greatest($"lo", $"blo") + 1L))
        .groupBy($"bkt", $"mn", $"mx", $"w")
        .agg(sum(expr("(cnt * ov) div w")).as("est_rows"))
      val tru = st.crossJoin(broadcast(g.select($"lo", $"hi")))
        .filter($"v_sum_4dp".between($"lo", $"hi"))
        .groupBy($"bkt").agg(count(lit(1)).as("true_rows"))
      val perFile = est.join(tru, Seq("bkt"), "left")
        .join(broadcast(touched.withColumn("rw", lit(1L))),
          Seq("bkt"), "left")
        .select($"bkt", $"mn", $"mx", $"w", $"est_rows",
          coalesce($"true_rows", lit(0L)).as("true_rows"),
          coalesce($"rw", lit(0L)).as("rewritten"))
      val rollup = g.crossJoin(
          perFile.agg(coalesce(sum($"est_rows"), lit(0L)).as("est_rows"),
            coalesce(sum($"true_rows"), lit(0L)).as("true_rows")))
        .select(lit(-1L).as("bkt"), $"gmn".as("mn"), $"gmx".as("mx"),
          lit(-1L).as("w"), $"est_rows", $"true_rows",
          lit(-1L).as("rewritten"))
      perFile.unionAll(rollup)
        .withColumn("ratio_fp",
          when($"true_rows" > 0L,
            expr("(est_rows * 1048576) div true_rows")).otherwise(-1L))
    }
    def mergedF() = state(pre.filter($"user_id" % 64 =!= 3)
        .unionByName(ev.filter($"user_id" % 64 === 3)))
      .withColumn("bkt", $"user_id" % 8)
    def touchedF() = delta.select(($"user_id" % 8).as("bkt")).distinct()
    graft.PlanOnly.roundTrip(
      shape(receiptOf(mergedF(), fileHist(mergedF()), touchedF()))) {
      val table = Tables.scratch("txn_histmaint_state")
      val tSide = Tables.scratch("txn_histmaint_sidecar")
      Seq(table, tSide).foreach(TxnTable.drop(spark, _))
      val c0 = state(pre).withColumn("bkt", $"user_id" % 8)
      val e0 = writeBuckets(c0, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, state(pre))
      TxnTable.commit(spark, tSide, 0, fileHist(c0))
      // the COW merge: only the delta's bucket footprint rewrites
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % 8).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // ≤8: file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % 8).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"),
          max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val c1 = merged.withColumn("bkt", $"user_id" % 8)
      val e1 = writeBuckets(c1, s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      // O(changed-files) sidecar maintenance: a FRESH grid + histogram
      // for the rewritten file only; carried rows pass through from
      // the committed v0 sidecar, never recomputed from data
      val carriedHist = TxnTable.read(spark, tSide, Some(0))
        .filter(!$"bkt".isin(touched.toSeq: _*))
      TxnTable.commit(spark, tSide, 1,
        carriedHist.unionByName(fileHist(c1)))
      shape(receiptOf(
        TxnTable.read(spark, table, None)
          .withColumn("bkt", $"user_id" % 8),
        TxnTable.read(spark, tSide, None)
          .select($"bkt", $"hb", $"cnt", $"mn", $"mx", $"w"),
        touched.toSeq.toDF("bkt")))
    }
  }

  /** THE STALE-STATS HAZARD, PRICED — the receipt that justifies
    * [[sinkTxnHistMaintain]]'s existence: what happens when an append
    * lands and the histogram sidecar is NOT maintained? v0 commits the
    * pre-split state + per-file sidecar; the COW backfill rewrites one
    * file; BOTH sidecars are then asked to estimate the standing
    * 30–45% band over the POST-append table — the STALE v0 sidecar
    * (whose rewritten-file rows still describe the pre-append data,
    * with a grid pinned to the pre-append domain) against the
    * MAINTAINED v1 sidecar — and both estimates are confronted with
    * the exact count. Carried files agree by construction (their data
    * did not change — the same fact that makes carry-by-reference
    * sound); the rewritten file is where the stale estimate breaks:
    * rows whose new values fall OUTSIDE the old grid's domain are
    * invisible to it entirely (an equi-width grid cannot even
    * represent them — the non-mergeable-bounds problem from the
    * maintain key, now shown as an estimation error instead of a
    * design note). ratio columns per file + the bkt = −1 rollup make
    * the divergence exact. The oracle re-derives both sidecars and
    * the truth from raw events.
    *
    * Scale shape: both estimate paths read |files|·16 metadata rows,
    * zero data; only the truth column scans. The receipt is what an
    * operator shows to justify the maintenance job's budget: at 10⁶
    * files one unmaintained shard per day compounds into a planner
    * that silently under-estimates every hot range. */
  def sinkTxnHistStale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 3)
    def shape(df: DataFrame): DataFrame = df
      .select($"bkt", $"est_stale", $"est_maint", $"true_rows",
        $"ratio_stale_fp", $"ratio_maint_fp", $"rewritten")
      .orderBy($"bkt")
    def mergedF() = state(pre.filter($"user_id" % 64 =!= 3)
        .unionByName(ev.filter($"user_id" % 64 === 3)))
      .withColumn("bkt", $"user_id" % 8)
    def preF() = state(pre).withColumn("bkt", $"user_id" % 8)
    def touchedF() = delta.select(($"user_id" % 8).as("bkt")).distinct()
    def receiptOf(st: DataFrame, sideStale: DataFrame,
        sideMaint: DataFrame, touched: DataFrame): DataFrame = {
      // the band folds from the MAINTAINED sidecar (the query is
      // against the current table; the stale sidecar just answers it
      // with its old grids)
      val g = sideMaint.agg(coalesce(min($"mn"), lit(0L)).as("gmn"),
          coalesce(max($"mx"), lit(0L)).as("gmx"))
        .select($"gmn", $"gmx",
          expr("gmn + ((gmx - gmn) * 3) DIV 10").as("lo"),
          expr("gmn + ((gmx - gmn) * 9) DIV 20").as("hi"))
      def estOf(side: DataFrame, as: String): DataFrame =
        side.crossJoin(broadcast(g))
          .withColumn("blo", $"mn" + $"hb" * $"w")
          .withColumn("bhi", $"mn" + ($"hb" + 1L) * $"w" - 1L)
          .withColumn("ov",
            greatest(lit(0L),
              least($"hi", $"bhi") - greatest($"lo", $"blo") + 1L))
          .groupBy($"bkt")
          .agg(sum(expr("(cnt * ov) div w")).as(as))
      val tru = st.crossJoin(broadcast(g.select($"lo", $"hi")))
        .filter($"v_sum_4dp".between($"lo", $"hi"))
        .groupBy($"bkt").agg(count(lit(1)).as("true_rows"))
      val perFile = estOf(sideMaint, "est_maint")
        .join(estOf(sideStale, "est_stale"), Seq("bkt"), "left")
        .join(tru, Seq("bkt"), "left")
        .join(broadcast(touched.withColumn("rw", lit(1L))),
          Seq("bkt"), "left")
        .select($"bkt", coalesce($"est_stale", lit(0L)).as("est_stale"),
          $"est_maint", coalesce($"true_rows", lit(0L)).as("true_rows"),
          coalesce($"rw", lit(0L)).as("rewritten"))
      val rollup = perFile.agg(
          coalesce(sum($"est_stale"), lit(0L)).as("est_stale"),
          coalesce(sum($"est_maint"), lit(0L)).as("est_maint"),
          coalesce(sum($"true_rows"), lit(0L)).as("true_rows"))
        .select(lit(-1L).as("bkt"), $"est_stale", $"est_maint",
          $"true_rows", lit(-1L).as("rewritten"))
      perFile.unionAll(rollup)
        .withColumn("ratio_stale_fp",
          when($"true_rows" > 0L,
            expr("(est_stale * 1048576) div true_rows")).otherwise(-1L))
        .withColumn("ratio_maint_fp",
          when($"true_rows" > 0L,
            expr("(est_maint * 1048576) div true_rows")).otherwise(-1L))
    }
    def equivalent = shape(receiptOf(mergedF(), fileHist(preF()),
      fileHist(mergedF()), touchedF()))
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_histstale_state")
      val tSide = Tables.scratch("txn_histstale_sidecar")
      Seq(table, tSide).foreach(TxnTable.drop(spark, _))
      val c0 = preF()
      val e0 = writeBuckets(c0, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, state(pre))
      TxnTable.commit(spark, tSide, 0, fileHist(c0))
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % 8).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // ≤8: file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % 8).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"),
          max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val c1 = merged.withColumn("bkt", $"user_id" % 8)
      val e1 = writeBuckets(c1, s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      // MAINTAINED sidecar v1 (the hist_maintain discipline); the
      // STALE path simply keeps reading v0
      val carriedHist = TxnTable.read(spark, tSide, Some(0))
        .filter(!$"bkt".isin(touched.toSeq: _*))
      TxnTable.commit(spark, tSide, 1,
        carriedHist.unionByName(fileHist(c1)))
      def sideAt(v: Int) = TxnTable.read(spark, tSide, Some(v))
        .select($"bkt", $"hb", $"cnt", $"mn", $"mx", $"w")
      shape(receiptOf(
        TxnTable.read(spark, table, None)
          .withColumn("bkt", $"user_id" % 8),
        sideAt(0), sideAt(1), touched.toSeq.toDF("bkt")))
    }
  }

  /** SPEND THE HISTOGRAM IN A DECISION — the r17 verdict's rung above
    * [[sinkTxnHistSelectivity]] (estimation alone is a dashboard; a
    * planner ACTS): three range bands (a 2% low tail, the standing
    * 30–45% interior band, the top-10% tail — all folded from the
    * committed sidecar's own bounds, zero data bytes) each take the
    * SCAN-VS-SKIP decision per file FROM THE SIDECAR ALONE — scan a
    * file iff its histogram-estimated band mass is ≥ 1 row — and the
    * decision is then CONFRONTED with the data: rows found in scanned
    * files, rows MISSED in skipped files (a truncating `(cnt·ov) div
    * w` can round a thinly-populated edge bucket to zero — the
    * histogram-skip hazard min/max zone maps never have, priced
    * honestly instead of hidden), and the per-file flip census
    * (est>0 vs truth>0 disagreements). The oracle re-derives grids,
    * bands, decisions, truths and flips from raw events; the hash
    * certifies decide-from-sidecar ≡ recompute.
    *
    * Scale shape: the decision pass reads |files|·16 sidecar rows —
    * zero data; the band scan then reads ONLY the passing files (the
    * whole point: at 10⁶ files a 2%-tail query that histogram-skips
    * 97% of files reads 3% of the table); the missed/flip columns are
    * the receipt's subject and exist to GRADE the estimator, exactly
    * like every truth column in the CBO tier. */
  def sinkTxnHistDecide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"band_id", $"lo", $"hi", $"files_total", $"files_scanned",
        $"est_rows", $"true_in_scanned", $"missed_rows", $"flip_files")
      .orderBy($"band_id")
    def receiptOf(st: DataFrame, side: DataFrame): DataFrame = {
      val g = side.agg(coalesce(min($"mn"), lit(0L)).as("gmn"),
        coalesce(max($"mx"), lit(0L)).as("gmx"))
      val bands = g.select(explode(array(
          struct(lit(0L).as("band_id"), $"gmn".as("lo"),
            expr("gmn + ((gmx - gmn) * 1) DIV 50").as("hi")),
          struct(lit(1L).as("band_id"),
            expr("gmn + ((gmx - gmn) * 3) DIV 10").as("lo"),
            expr("gmn + ((gmx - gmn) * 9) DIV 20").as("hi")),
          struct(lit(2L).as("band_id"),
            expr("gmn + ((gmx - gmn) * 9) DIV 10").as("lo"),
            $"gmx".as("hi")))).as("b"))
        .select($"b.band_id", $"b.lo", $"b.hi")
      // per (band, file) estimate — sidecar only
      val estPF = side.crossJoin(broadcast(bands))
        .withColumn("blo", $"mn" + $"hb" * $"w")
        .withColumn("bhi", $"mn" + ($"hb" + 1L) * $"w" - 1L)
        .withColumn("ov",
          greatest(lit(0L),
            least($"hi", $"bhi") - greatest($"lo", $"blo") + 1L))
        .groupBy($"band_id", $"bkt")
        .agg(sum(expr("(cnt * ov) div w")).as("est_rows"))
      // per (band, file) truth — the receipt's subject
      val truPF = st.crossJoin(broadcast(bands))
        .filter($"v_sum_4dp".between($"lo", $"hi"))
        .groupBy($"band_id", $"bkt").agg(count(lit(1)).as("true_rows"))
      val pf = estPF.join(truPF, Seq("band_id", "bkt"), "full_outer")
        .select($"band_id", $"bkt",
          coalesce($"est_rows", lit(0L)).as("est_rows"),
          coalesce($"true_rows", lit(0L)).as("true_rows"))
        .withColumn("scanned", when($"est_rows" > 0L, 1L).otherwise(0L))
      val perBand = pf.groupBy($"band_id").agg(
        count(lit(1)).as("files_total"),
        sum($"scanned").as("files_scanned"),
        sum($"est_rows").as("est_rows"),
        sum(when($"scanned" === 1L, $"true_rows").otherwise(0L))
          .as("true_in_scanned"),
        sum(when($"scanned" === 0L, $"true_rows").otherwise(0L))
          .as("missed_rows"),
        sum(when(($"est_rows" > 0L) =!= ($"true_rows" > 0L), 1L)
          .otherwise(0L)).as("flip_files"))
      bands.join(perBand, Seq("band_id"), "left")
        .select($"band_id", $"lo", $"hi",
          coalesce($"files_total", lit(0L)).as("files_total"),
          coalesce($"files_scanned", lit(0L)).as("files_scanned"),
          coalesce($"est_rows", lit(0L)).as("est_rows"),
          coalesce($"true_in_scanned", lit(0L)).as("true_in_scanned"),
          coalesce($"missed_rows", lit(0L)).as("missed_rows"),
          coalesce($"flip_files", lit(0L)).as("flip_files"))
    }
    def stF() = state(ev).withColumn("bkt", $"user_id" % 8)
    graft.PlanOnly.roundTrip(shape(receiptOf(stF(), fileHist(stF())))) {
      val table = Tables.scratch("txn_histdec_state")
      val tSide = Tables.scratch("txn_histdec_sidecar")
      Seq(table, tSide).foreach(TxnTable.drop(spark, _))
      val st = graft.PlanOnly.cut(stF())
      val e0 = writeBuckets(st, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      TxnTable.commit(spark, tSide, 0, fileHist(st))
      shape(receiptOf(
        TxnTable.read(spark, table, None)
          .withColumn("bkt", $"user_id" % 8),
        TxnTable.read(spark, tSide, None)
          .select($"bkt", $"hb", $"cnt", $"mn", $"mx", $"w")))
    }
  }

  /** STATS-DRIVEN JOIN ORDER — the second planner decision the stats
    * tier feeds (broadcast-vs-shuffle is [[sinkTxnCboChoose]]; this is
    * WHICH JOIN RUNS FIRST): a fact is reduced by TWO dims, and the
    * planner must apply the more selective one first — at 100 TB the
    * difference between the second join probing 1% of the fact or 50%
    * of it. Each scenario estimates BOTH one-dim intermediates from
    * committed stats alone (manifest countAt rows + KMV NDVs, the
    * semi-join containment formula), orders the dims by estimate
    * (ties → dim A, the deterministic tiebreak), EXECUTES the chosen
    * order, and emits the receipt: both estimates, both truths, the
    * chosen order, the order truth would pick, whether truth would
    * FLIP it, and the order-independent final count. The three
    * scenarios exercise clear-cut (1% vs 20%), dominated (100% vs
    * 20%) and skew-threatened (20% of users holding >20% of events vs
    * a 50% hash slice) regimes.
    *
    * Scale shape: the decision costs O(1) manifest scalars + two
    * ≤64-row sketch folds — zero data bytes; both semi-joins are
    * key-partitioned; the receipt's truth columns are the only real
    * joins and exist to GRADE the estimator. */
  def sinkTxnCboJoinOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def usersAll() = cboUsersAll(ev)
    def usersActive() = cboUsersActive(ev)
    def usersSparse() = cboUsersSparse(ev)
    def usersHalf() = state(ev).filter($"user_id" % 2 === 0)
      .select($"user_id")
    def factF() = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id")
    def receipt(name: String, rf: DataFrame, nf: DataFrame,
        nda: DataFrame, ndb: DataFrame, ta: DataFrame, tb: DataFrame,
        fin: DataFrame): DataFrame =
      rf.crossJoin(nf).crossJoin(nda).crossJoin(ndb)
        .crossJoin(ta).crossJoin(tb).crossJoin(fin)
        .select(lit(name).as("scenario"), $"r_fact", $"ndv_fact",
          $"ndv_a", $"ndv_b",
          expr("CASE WHEN ndv_fact > 0 THEN (r_fact * " +
            "least(ndv_a, ndv_fact)) div ndv_fact ELSE 0 END")
            .as("est_inter_a"),
          expr("CASE WHEN ndv_fact > 0 THEN (r_fact * " +
            "least(ndv_b, ndv_fact)) div ndv_fact ELSE 0 END")
            .as("est_inter_b"),
          $"true_inter_a", $"true_inter_b", $"final_rows")
        .withColumn("chose_a_first",
          when($"est_inter_a" <= $"est_inter_b", 1L).otherwise(0L))
        .withColumn("truth_a_first",
          when($"true_inter_a" <= $"true_inter_b", 1L).otherwise(0L))
        .withColumn("flipped",
          when($"chose_a_first" =!= $"truth_a_first", 1L).otherwise(0L))
        .select($"scenario", $"r_fact", $"ndv_fact", $"ndv_a", $"ndv_b",
          $"est_inter_a", $"est_inter_b", $"true_inter_a",
          $"true_inter_b", $"chose_a_first", $"truth_a_first",
          $"flipped", $"final_rows")
    def cnt(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    def scenarioEq(name: String, da: DataFrame, db: DataFrame)
        : DataFrame = {
      val ia = factF().join(da, Seq("user_id"), "left_semi")
      val ib = factF().join(db, Seq("user_id"), "left_semi")
      receipt(name, cnt(factF(), "r_fact"),
        cboNdvCol(cboKmvH(factF().select($"user_id")), "ndv_fact"),
        cboNdvCol(cboKmvH(da), "ndv_a"), cboNdvCol(cboKmvH(db), "ndv_b"),
        cnt(ia, "true_inter_a"), cnt(ib, "true_inter_b"),
        cnt(ia.join(db, Seq("user_id"), "left_semi"), "final_rows"))
    }
    def equivalent = Seq(
        ("active_vs_half", usersActive _, usersHalf _),
        ("active_vs_sparse", usersActive _, usersSparse _),
        ("all_vs_active", usersAll _, usersActive _))
      .map { case (n, a, b) => scenarioEq(n, a(), b()) }
      .reduce(_.unionAll(_)).orderBy($"scenario")
    graft.PlanOnly.roundTrip(equivalent) {
      val tS = Tables.scratch("cbo3_ndv_sidecar")
      val stored = cboStage(spark, tS,
        Seq("cbo3_all" -> usersAll(), "cbo3_act" -> usersActive(),
          "cbo3_sparse" -> usersSparse(), "cbo3_half" -> usersHalf(),
          "cbo3_fact" -> factF()))
      val sc = graft.PlanOnly.cut(TxnTable.read(spark, tS))
      def rOf(nm: String) = TxnTable.countAt(spark, stored(nm))
      def ndvOf(nm: String): Long = cboNdvOf(sc, nm)
      val (rFact, ndvFact) = (rOf("cbo3_fact"), ndvOf("cbo3_fact"))
      def lick(v: Long, as: String) = spark.range(1).select(lit(v).as(as))
      def scenarioReal(name: String, aNm: String, bNm: String)
          : DataFrame = {
        val (ndvA, ndvB) = (ndvOf(aNm), ndvOf(bNm))
        def est(nd: Long) = if (ndvFact > 0)
          rFact * math.min(nd, ndvFact) / ndvFact else 0L
        val aFirst = est(ndvA) <= est(ndvB)
        val fact = TxnTable.read(spark, stored("cbo3_fact"))
        val dA = TxnTable.read(spark, stored(aNm))
        val dB = TxnTable.read(spark, stored(bNm))
        val ia = fact.join(dA, Seq("user_id"), "left_semi")
        val ib = fact.join(dB, Seq("user_id"), "left_semi")
        // THE decision: the estimated-smaller intermediate runs first
        val fin =
          if (aFirst) ia.join(dB, Seq("user_id"), "left_semi")
          else ib.join(dA, Seq("user_id"), "left_semi")
        receipt(name, lick(rFact, "r_fact"), lick(ndvFact, "ndv_fact"),
          lick(ndvA, "ndv_a"), lick(ndvB, "ndv_b"),
          cnt(ia, "true_inter_a"), cnt(ib, "true_inter_b"),
          cnt(fin, "final_rows"))
      }
      Seq(("active_vs_half", "cbo3_act", "cbo3_half"),
          ("active_vs_sparse", "cbo3_act", "cbo3_sparse"),
          ("all_vs_active", "cbo3_all", "cbo3_act"))
        .map { case (n, a, b) => scenarioReal(n, a, b) }
        .reduce(_.unionAll(_)).orderBy($"scenario")
    }
  }

  /** The salt-vs-plain join executor shared by [[sinkTxnCboSkewSalt]]
    * and LakehouseSpec's plan pin: plain = the ordinary equi-join;
    * salted = the fact's hot key split across 8 sub-keys (salt =
    * event_id % 8 — deterministic, result-invariant) against the dim
    * replicated ×8, so no single reducer owns a heavy key's whole
    * fanout. Same rows either way — only the physical distribution
    * differs, which is the point. */
  private[graft] def skewJoin(fact: DataFrame, dim: DataFrame,
      salted: Boolean): DataFrame = {
    val s = fact.sparkSession
    import s.implicits._
    if (!salted) fact.join(dim, Seq("k"))
    else fact.withColumn("salt", $"event_id" % 8)
      .join(dim.withColumn("salt",
        explode(expr("sequence(0L, 7L)"))), Seq("k", "salt"))
      .drop("salt")
  }

  /** THE SKEW DECISION — the third planner decision the stats tier
    * exists for (r17 verdict item 4; broadcast-vs-shuffle and join
    * order are [[sinkTxnCboChoose]]/[[sinkTxnCboJoinOrder]]): whether
    * a shuffle join needs SALTING is decided by the heaviest key's
    * share of the fact, and it must be decided BEFORE the first
    * shuffle materializes — the one call AQE's skew-join cannot make
    * up front. A per-key HEAVY-HITTER sidecar (exact top-8 counts by
    * (cnt DESC, key) + the total — engine-replayable like the KMV
    * tier; Misra–Gries is the sketch a 100 TB build would stream, with
    * identical top-1 semantics here) commits at BUILD time over the
    * PRE-SPLIT fact, and each scenario's salt-vs-plain decision is
    * taken from the STORED sidecar alone: salt iff est_max_cnt · 8 >
    * est_total (the heaviest key would overflow a 1/8 partition
    * budget). The join then EXECUTES under the choice ([[skewJoin]] —
    * salted: fact salt = event_id % 8 ⋈ dim×8; plain: the ordinary
    * equi-join), and the receipt confronts estimate with truth: the
    * FULL fact's exact max-key share (the sidecar is stale by one
    * append — the honest operating condition of every stats tier),
    * both decisions, the flip bit, and the strategy-independent join
    * count + event_id checksum. Scenarios exercise both regimes:
    * `type_key` (5-value event_type — max share ≥ 20% ≫ 1/8 budget →
    * SALT) and `user_key` (uniform user_id keys → plain).
    *
    * Scale shape: the decision reads ≤9 committed sidecar rows per
    * scenario — zero data bytes; the salted execution bounds any
    * reducer at ~max_key/8 rows (the difference between one straggler
    * executor holding 20% of 100 TB and 8 holding 2.5% each); the
    * truth columns exist to GRADE the estimator, like every CBO
    * receipt. */
  def sinkTxnCboSkewSalt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    def factType() = ev.select($"event_type".as("k"), $"event_id")
    def factTypePre() = pre.select($"event_type".as("k"), $"event_id")
    def factUser() = ev.filter($"event_type" === "purchase")
      .select($"user_id".cast("string").as("k"), $"event_id")
    def factUserPre() = pre.filter($"event_type" === "purchase")
      .select($"user_id".cast("string").as("k"), $"event_id")
    def hhOf(scen: String, factPre: DataFrame): DataFrame = {
      val top = factPre.groupBy($"k").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"k").limit(8)
        .select(lit(scen).as("scen"), $"k", $"cnt")
      val tot = factPre.agg(count(lit(1)).as("cnt"))
        .select(lit(scen).as("scen"), lit("(total)").as("k"), $"cnt")
      top.unionAll(tot)
    }
    def shape(df: DataFrame): DataFrame = df
      .select($"scenario", $"r_fact", $"est_max_cnt", $"est_total",
        $"est_share_fp", $"true_max_cnt", $"true_share_fp", $"salted",
        $"truth_salted", $"flipped", $"join_rows", $"join_sum")
      .orderBy($"scenario")
    // `est` is a 1-row (est_max_cnt, est_total) frame; `saltedOpt`
    // Some(b) = the graded branch's sidecar-driven physical decision,
    // None = the equivalent branch (plain execution, decision column
    // derived in-frame — same VALUES, only the plan differs)
    def receipt(scen: String, fact: DataFrame, est: DataFrame,
        saltedOpt: Option[Boolean]): DataFrame = {
      val dim = fact.select($"k").distinct()
      val joined = skewJoin(fact, dim, saltedOpt.getOrElse(false))
        .agg(count(lit(1)).as("join_rows"),
          coalesce(sum($"event_id"), lit(0L)).as("join_sum"))
      val truth = fact.groupBy($"k").agg(count(lit(1)).as("c"))
        .agg(coalesce(max($"c"), lit(0L)).as("true_max_cnt"))
        .crossJoin(fact.agg(count(lit(1)).as("r_fact")))
      val saltedCol = saltedOpt
        .map(b => lit(if (b) 1L else 0L))
        .getOrElse(when($"est_total" > 0L &&
          $"est_max_cnt" * 8L > $"est_total", 1L).otherwise(0L))
      truth.crossJoin(broadcast(est)).crossJoin(joined)
        .select(lit(scen).as("scenario"), $"r_fact",
          $"est_max_cnt", $"est_total",
          when($"est_total" > 0L,
            expr("(est_max_cnt * 1048576) div est_total")).otherwise(-1L)
            .as("est_share_fp"),
          $"true_max_cnt",
          when($"r_fact" > 0L,
            expr("(true_max_cnt * 1048576) div r_fact")).otherwise(-1L)
            .as("true_share_fp"),
          saltedCol.as("salted"),
          when($"true_max_cnt" * 8L > $"r_fact", 1L).otherwise(0L)
            .as("truth_salted"),
          $"join_rows", $"join_sum")
        .withColumn("flipped",
          when($"salted" =!= $"truth_salted", 1L).otherwise(0L))
    }
    def estF(factPre: DataFrame): DataFrame =
      factPre.groupBy($"k").agg(count(lit(1)).as("c"))
        .agg(coalesce(max($"c"), lit(0L)).as("est_max_cnt"))
        .crossJoin(factPre.agg(count(lit(1)).as("est_total")))
    def equivalent = shape(
      receipt("type_key", factType(), estF(factTypePre()), None)
        .unionByName(
          receipt("user_key", factUser(), estF(factUserPre()), None)))
    graft.PlanOnly.roundTrip(equivalent) {
      val tHH = Tables.scratch("cbo4_hh_sidecar")
      TxnTable.drop(spark, tHH)
      // the committed heavy-hitter sidecar: built ONCE over the
      // pre-split fact (stale by one append at decision time — the
      // honest operating condition of a stats tier)
      TxnTable.commit(spark, tHH, 0,
        hhOf("type_key", factTypePre())
          .unionByName(hhOf("user_key", factUserPre())))
      val sc = graft.PlanOnly.cut(TxnTable.read(spark, tHH))
      def estFromSidecar(scen: String): (Long, Long) = {
        val r = sc.filter($"scen" === scen)
          .agg(coalesce(max(when($"k" =!= "(total)", $"cnt")), lit(0L))
            .as("m"),
            coalesce(max(when($"k" === "(total)", $"cnt")), lit(0L))
              .as("t"))
          .collect()(0) // 1 row: planning metadata, never data
        (r.getLong(0), r.getLong(1))
      }
      def lickEst(mt: (Long, Long)): DataFrame = spark.range(1)
        .select(lit(mt._1).as("est_max_cnt"), lit(mt._2).as("est_total"))
      val (eT, eU) = (estFromSidecar("type_key"),
        estFromSidecar("user_key"))
      // THE decision: the stored sidecar alone picks salt-vs-plain
      shape(receipt("type_key", factType(), lickEst(eT),
          Some(eT._2 > 0 && eT._1 * 8L > eT._2))
        .unionByName(receipt("user_key", factUser(), lickEst(eU),
          Some(eU._2 > 0 && eU._1 * 8L > eU._2))))
    }
  }

  /** HEAVY-HITTER SIDECAR MAINTENANCE UNDER APPEND — the skew tier's
    * maintenance rung ([[sinkTxnCboSkewSalt]] builds and spends the
    * sidecar; this key keeps it fresh), and like the histogram tier it
    * is honest about a NON-MERGEABLE summary: a capped top-k list does
    * not merge losslessly — folding top-8(pre) ⊕ top-8(delta) by
    * summing shared keys and re-ranking UNDERCOUNTS any key that fell
    * outside either half's list (the Misra–Gries/SpaceSaving error
    * bound made concrete), and can mis-rank or even miss a true top-8
    * key that was mid-tier in both halves. v0 commits the pre-split
    * top-8 (by user_id over purchase events) + total; the append's
    * top-8 folds in WITHOUT re-reading the pre-split fact (O(delta)
    * maintenance); the graded frame confronts the maintained list with
    * the exact full-fact rebuild rank by rank — est vs true user and
    * count, match flags, the guaranteed under-count direction — and
    * carries the decision consequence: the salt-vs-plain call made
    * from the maintained list vs from truth, and whether maintenance
    * error would flip it. The oracle replays the same fold from raw
    * events, so the hash certifies maintained ≡ the declared merge
    * algebra (not ≡ truth — the receipt's whole point is measuring
    * that gap).
    *
    * Scale shape: maintenance reads the delta once and folds two
    * ≤9-row lists — the pre-split fact is never re-read (at 100 TB the
    * difference between a daily O(delta) sketch fold and a full-table
    * re-count); the truth columns exist to GRADE the fold, like every
    * receipt in the CBO tier. */
  def sinkTxnHhMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = evUsers(spark, dir)
    def factOf(f: DataFrame) = f.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id")
    val pre = factOf(ev.filter($"ts_us" < SplitUs))
    val delta = factOf(ev.filter($"ts_us" >= SplitUs))
    val all = factOf(ev)
    // cap FIRST via TakeOrderedAndProject (scale-safe at any key
    // cardinality), THEN rank the ≤8 surviving rows with a window over
    // the capped frame — the unpartitioned window never sees more than
    // the cap
    def rank8(capped: DataFrame): DataFrame = capped
      .withColumn("rank", row_number().over(
        Window.orderBy($"cnt".desc, $"user_id")).cast("long"))
    def topK(f: DataFrame): DataFrame = rank8(
      f.groupBy($"user_id").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"user_id").limit(8))
    def totOf(f: DataFrame): DataFrame = f.agg(count(lit(1)).as("t"))
    // the maintenance fold: union the two capped lists, sum per key,
    // re-rank, re-cap — the declared (lossy) merge algebra over ≤16 rows
    def foldTop(a: DataFrame, b: DataFrame): DataFrame = rank8(
      a.select($"user_id", $"cnt")
        .unionAll(b.select($"user_id", $"cnt"))
        .groupBy($"user_id").agg(sum($"cnt").as("cnt"))
        .orderBy($"cnt".desc, $"user_id").limit(8))
    def shape(df: DataFrame): DataFrame = df
      .select($"rank", $"est_user_id", $"est_cnt", $"true_user_id",
        $"true_cnt", $"user_match", $"undercount", $"est_total",
        $"true_total", $"salted_est", $"salted_true", $"flipped")
      .orderBy($"rank")
    def receipt(maint: DataFrame, maintTot: DataFrame): DataFrame = {
      val rebuilt = topK(all)
      val decide = maintTot.select($"t".as("est_total"))
        .crossJoin(totOf(all).select($"t".as("true_total")))
        .crossJoin(broadcast(maint.filter($"rank" === 1L)
          .select($"cnt".as("est_max"))))
        .crossJoin(broadcast(rebuilt.filter($"rank" === 1L)
          .select($"cnt".as("true_max"))))
        .select($"est_total", $"true_total",
          when($"est_total" > 0L && $"est_max" * 8L > $"est_total", 1L)
            .otherwise(0L).as("salted_est"),
          when($"true_max" * 8L > $"true_total", 1L).otherwise(0L)
            .as("salted_true"))
        .withColumn("flipped",
          when($"salted_est" =!= $"salted_true", 1L).otherwise(0L))
      maint.select($"rank", $"user_id".as("est_user_id"),
          $"cnt".as("est_cnt"))
        .join(rebuilt.select($"rank", $"user_id".as("true_user_id"),
          $"cnt".as("true_cnt")), Seq("rank"), "full_outer")
        .select($"rank",
          coalesce($"est_user_id", lit(-1L)).as("est_user_id"),
          coalesce($"est_cnt", lit(-1L)).as("est_cnt"),
          coalesce($"true_user_id", lit(-1L)).as("true_user_id"),
          coalesce($"true_cnt", lit(-1L)).as("true_cnt"))
        .withColumn("user_match",
          when($"est_user_id" === $"true_user_id", 1L).otherwise(0L))
        .withColumn("undercount",
          when($"user_match" === 1L, $"true_cnt" - $"est_cnt")
            .otherwise(-1L))
        .crossJoin(broadcast(decide))
    }
    def equivalent = shape(receipt(foldTop(topK(pre), topK(delta)),
      totOf(pre).select(($"t" + lit(0L)).as("c")).crossJoin(totOf(delta))
        .select(($"c" + $"t").as("t"))))
    graft.PlanOnly.roundTrip(equivalent) {
      val tHH = Tables.scratch("hh_maint_sidecar")
      TxnTable.drop(spark, tHH)
      // v0: the pre-split capped list + total — the committed sketch
      TxnTable.commit(spark, tHH, 0,
        topK(pre).select($"rank", $"user_id", $"cnt")
          .unionAll(totOf(pre).select(lit(-1L).as("rank"),
            lit(-1L).as("user_id"), $"t".as("cnt"))))
      // O(delta) maintenance: fold the delta's list into the STORED v0
      // list — the pre-split fact is never re-read
      val v0 = graft.PlanOnly.cut(TxnTable.read(spark, tHH, Some(0)))
      val v0top = v0.filter($"rank" >= 0L).select($"user_id", $"cnt")
      val v0tot = v0.filter($"rank" === -1L).select($"cnt")
      val maint = foldTop(v0top, topK(delta))
      val maintTot = v0tot.select($"cnt".as("c"))
        .crossJoin(totOf(delta)).select(($"c" + $"t").as("t"))
      TxnTable.commit(spark, tHH, 1,
        maint.select($"rank", $"user_id", $"cnt")
          .unionAll(maintTot.select(lit(-1L).as("rank"),
            lit(-1L).as("user_id"), $"t".as("cnt"))))
      // serve the receipt from the COMMITTED v1
      val v1 = graft.PlanOnly.cut(TxnTable.read(spark, tHH, Some(1)))
      shape(receipt(v1.filter($"rank" >= 0L)
          .select($"rank", $"user_id", $"cnt"),
        v1.filter($"rank" === -1L).select($"cnt".as("t"))))
    }
  }

  /** BUCKET-COUNT EVOLUTION ON THE SMB TIER — the mismatch case
    * [[sinkTxnSmbMerge]]'s layout check would otherwise send to the
    * shuffle fallback: the base snapshot is bucketed 8 ways, the delta
    * arrives bucketed 4 ways (a writer with different parallelism —
    * bucket counts evolve in every long-lived table). The layouts
    * DISAGREE on count but the counts are DIVISIBLE, so the merge path
    * COALESCES the 8-bucket side to 4 (each coarse bucket reads 2 fine
    * buckets — pure locality arithmetic, Spark's
    * coalesceBucketsInJoin; an engine default in LocalSession) and
    * still joins with ZERO exchange — the graceful-degradation rung
    * between perfect layout agreement and a full shuffle (pinned in
    * BucketingSpec). Graded = the merged v1 read back with the
    * coalescing receipt (bucket_a, bucket_b, coalesced_to,
    * layout_compat); oracle recomputes the merged state from raw
    * events.
    *
    * Scale shape: coalescing keeps the merge map-side (the coarse
    * side's tasks read 2 co-located files each); the alternative —
    * rewriting the delta to 8 buckets first — costs a full shuffle of
    * the delta, exactly what the divisibility rule avoids. */
  def sinkTxnSmbCoalesce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val post = ev.filter($"ts_us" >= SplitUs)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"bucket_a", $"bucket_b", $"coalesced_to", $"layout_compat")
      .orderBy($"user_id")
    def equivalent = shape(state(ev)
      .withColumn("bucket_a", lit(8L))
      .withColumn("bucket_b", lit(4L))
      .withColumn("coalesced_to", lit(4L))
      .withColumn("layout_compat", lit(1L)))
    graft.PlanOnly.roundTrip(equivalent) {
      val tbl = Tables.scratch("txn_smbc_state")
      val dTbl = Tables.scratch("txn_smbc_delta")
      Seq(tbl, dTbl).foreach(TxnTable.drop(spark, _))
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      def loc(n: String) = new org.apache.hadoop.fs.Path(wh,
        n.toLowerCase).toString
      graft.sources.Sinks.writeBucketed(state(pre), "smbc_state_v0", 8,
        "user_id")
      TxnTable.commitAt(spark, tbl, 0, loc("smbc_state_v0"),
        "user_id:8:smbc_state_v0")
      graft.sources.Sinks.writeBucketed(state(post), "smbc_delta_b0", 4,
        "user_id")
      TxnTable.commitAt(spark, dTbl, 0, loc("smbc_delta_b0"),
        "user_id:4:smbc_delta_b0")
      def lay(t: String): (String, Long, String) = {
        val l = TxnTable.layoutOf(spark, t, Some(0))
          .getOrElse(sys.error(s"no layout recorded for $t"))
        val Array(k, n, cat) = l.split(":", 3)
        (k, n.toLong, cat)
      }
      val (ka, na, ca) = lay(tbl)
      val (kb, nb, cb) = lay(dTbl)
      // the divisibility rule: same key and one count divides the
      // other → coalesce-and-join (no exchange); else shuffle fallback
      val compat = ka == kb &&
        (na % nb == 0L || nb % na == 0L)
      val merged =
        if (compat) smbMerge(spark.table(ca), spark.table(cb))
        else smbMerge(TxnTable.read(spark, tbl, Some(0)),
          TxnTable.read(spark, dTbl, Some(0)))
      val coarse = math.min(na, nb)
      // the merge output adopts the COARSE layout (the count both
      // sides can serve exchange-free from now on)
      graft.sources.Sinks.writeBucketed(merged, "smbc_state_v1",
        coarse.toInt, ka)
      TxnTable.commitAt(spark, tbl, 1, loc("smbc_state_v1"),
        s"$ka:$coarse:smbc_state_v1")
      shape(spark.table("smbc_state_v1")
        .withColumn("bucket_a", lit(na))
        .withColumn("bucket_b", lit(nb))
        .withColumn("coalesced_to", lit(coarse))
        .withColumn("layout_compat", lit(if (compat) 1L else 0L)))
    }
  }

  /** Per-file (column, min, max, rows) footer stats of a
    * bucket-clustered state frame — the sidecar row grain shared by
    * [[sinkTxnColumnStats]] (build + prune) and
    * [[sinkTxnStatsMaintain]] (incremental maintenance under COW). */
  private def fileColumnStats(clustered: DataFrame, destPrefix: String)
      : DataFrame = {
    val s = clustered.sparkSession
    import s.implicits._
    clustered.groupBy($"bkt").agg(
        count(lit(1)).as("rows"),
        min($"n_events").as("mn_ne"), max($"n_events").as("mx_ne"),
        min($"last_us").as("mn_lu"), max($"last_us").as("mx_lu"),
        min($"v_sum_4dp").as("mn_vs"), max($"v_sum_4dp").as("mx_vs"))
      .withColumn("path", concat(lit(s"$destPrefix/bkt="), $"bkt"))
      .selectExpr("bkt", "path", "rows",
        "stack(3, 'n_events', mn_ne, mx_ne, 'last_us', mn_lu, mx_lu, " +
          "'v_sum_4dp', mn_vs, mx_vs) AS (col, mn, mx)")
  }

  /** INCREMENTAL SIDECAR MAINTENANCE under file-level COW churn — the
    * question an ad-hoc-query user asks right after
    * [[sinkTxnColumnStats]] exists: do the column zone maps SURVIVE a
    * merge without a full recompute? v0 commits the hash-clustered
    * per-user state plus its per-file (column, min, max, rows)
    * sidecar; v1 is the merge_cow-shaped targeted backfill (post-split
    * events of `user_id % 64 = 3` — one bucket's footprint), and the
    * sidecar maintenance is O(changed-files): FRESH stats are computed
    * only for the rewritten files, while carried files keep their v0
    * sidecar rows BY REFERENCE (read back from the committed sidecar,
    * never recomputed from data). The graded frame is the v1 sidecar
    * read back, with each row's `rewritten` flag derived from the
    * FILE PATH (lives under v1) — the oracle re-derives every stat
    * from raw events and the flag from the delta's bucket footprint,
    * so hash-equality certifies BOTH that the maintained stats equal a
    * from-scratch recompute AND that the rewrite set was exactly the
    * delta's footprint.
    *
    * Scale shape: maintenance cost = |rewritten files|·|columns|
    * metadata rows + one aggregate over the rewritten buckets' rows;
    * carried stats are a metadata filter. At 10⁶ files a one-shard
    * backfill updates a handful of sidecar rows — the zone-map tier
    * stays fresh for free. */
  def sinkTxnStatsMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 3)
    def shape(df: DataFrame): DataFrame = df
      .select($"bucket", $"col", $"mn", $"mx", $"n_rows", $"rewritten")
      .orderBy($"bucket", $"col")
    def equivalent = {
      val merged = state(pre.filter($"user_id" % 64 =!= 3)
        .unionByName(ev.filter($"user_id" % 64 === 3)))
      val touchedB = delta.select(($"user_id" % NBuckets).as("bucket"))
        .distinct().withColumn("rw", lit(1L))
      val byB = merged.withColumn("bucket", $"user_id" % NBuckets)
        .groupBy($"bucket").agg(count(lit(1)).as("n_rows"),
          min($"n_events").as("mn_ne"), max($"n_events").as("mx_ne"),
          min($"last_us").as("mn_lu"), max($"last_us").as("mx_lu"),
          min($"v_sum_4dp").as("mn_vs"), max($"v_sum_4dp").as("mx_vs"))
      shape(byB.join(broadcast(touchedB), Seq("bucket"), "left")
        .withColumn("rewritten", coalesce($"rw", lit(0L)))
        .selectExpr("bucket", "n_rows", "rewritten",
          "stack(3, 'n_events', mn_ne, mx_ne, 'last_us', mn_lu, mx_lu, " +
            "'v_sum_4dp', mn_vs, mx_vs) AS (col, mn, mx)"))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_statsmaint")
      val tStats = Tables.scratch("txn_statsmaint_sidecar")
      TxnTable.drop(spark, table)
      TxnTable.drop(spark, tStats)
      val st0 = state(pre)
      val c0 = st0.withColumn("bkt", $"user_id" % NBuckets)
      val e0 = writeBuckets(c0, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st0)
      TxnTable.commit(spark, tStats, 0,
        fileColumnStats(c0, s"$table/data/v0"))
      // the COW merge (the merge_cow shape: only the delta's bucket
      // footprint rewrites; the rest carries by reference)
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // ≤16: file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val c1 = merged.withColumn("bkt", $"user_id" % NBuckets)
      val e1 = writeBuckets(c1, s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      // O(changed-files) sidecar maintenance: fresh stats ONLY for the
      // rewritten files; carried rows pass through from the v0 sidecar
      val carriedStats = TxnTable.read(spark, tStats, Some(0))
        .filter(!$"bkt".isin(touched.toSeq: _*))
      TxnTable.commit(spark, tStats, 1,
        carriedStats.unionByName(fileColumnStats(c1, s"$table/data/v1")))
      shape(TxnTable.read(spark, tStats, None)
        .select($"bkt".as("bucket"), $"col", $"mn", $"mx",
          $"rows".as("n_rows"),
          when($"path".contains("/data/v1/"), 1L).otherwise(0L)
            .as("rewritten")))
    }
  }

  /** METADATA-ONLY AGGREGATE SERVING — the query class the stats
    * sidecar exists FOR beyond pruning: `SELECT count(*), min(x),
    * max(x) FROM t` answered WITHOUT reading a data byte (Iceberg
    * serves these from manifest column metrics; Delta from
    * minValues/maxValues/numRecords). v0 commits the hash-clustered
    * per-user state plus its per-file (column, min, max, rows)
    * sidecar; the graded frame is one row per column — file count,
    * exact row count (Σ sidecar rows), and the global min/max folded
    * over the per-file bounds — aggregated from the SIDECAR TxnTable
    * alone. The oracle re-derives every number from raw events, so the
    * hash certifies metadata-served ≡ data-derived (count and min/max
    * fold exactly; no approximation enters).
    *
    * Scale shape: the serve aggregates |files|·|columns| metadata rows
    * — at 10⁶ files a count(*)/min/max over 100 TB touches ~3×10⁶
    * sidecar rows and zero data. The build cost is the same one-pass
    * clustered write the other COW keys pay. */
  def sinkTxnStatsServe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"col", $"n_files", $"n_rows", $"mn", $"mx")
      .orderBy($"col")
    def equivalent = {
      val st = state(ev).withColumn("bkt", $"user_id" % NBuckets)
      shape(st.selectExpr("bkt",
          "stack(3, 'n_events', n_events, 'last_us', last_us, " +
            "'v_sum_4dp', v_sum_4dp) AS (col, v)")
        .groupBy($"col")
        .agg(countDistinct($"bkt").as("n_files"), count(lit(1)).as("n_rows"),
          min($"v").as("mn"), max($"v").as("mx")))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_statsserve")
      val tStats = Tables.scratch("txn_statsserve_sidecar")
      TxnTable.drop(spark, table)
      TxnTable.drop(spark, tStats)
      val st = state(ev)
      val c0 = st.withColumn("bkt", $"user_id" % NBuckets)
      val e0 = writeBuckets(c0, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      TxnTable.commit(spark, tStats, 0,
        fileColumnStats(c0, s"$table/data/v0"))
      // the serve: every output number comes from the sidecar alone
      shape(TxnTable.read(spark, tStats, None)
        .groupBy($"col")
        .agg(count(lit(1)).as("n_files"), sum($"rows").as("n_rows"),
          min($"mn").as("mn"), max($"mx").as("mx")))
    }
  }

  /** Probe keys for [[sinkTxnBloomSkip]]: six ids present at every SF
    * (the events user_id domain is 0..15·SF·1000) and two absent ones
    * — the false-positive path must be exercised, not just asserted. */
  private val BloomProbes = Seq(2L, 3L, 5L, 7L, 11L, 13L, 100000L, 100001L)

  /** The replayable 3-hash bloom slot for key column `k` and hash
    * index column `i` — the multiplicative family agg_bloom_replayable
    * pinned (mod 1048573, m = 4096 bits). */
  private def bloomSlot(k: String, i: String): String =
    s"(CASE $i WHEN 1 THEN (($k + 1) * 2654435761) % 1048573 " +
      s"WHEN 2 THEN (($k + 1) * 2246822519) % 1048573 " +
      s"ELSE (($k + 1) * 3266489917) % 1048573 END) % 4096"

  /** FILE-LEVEL BLOOM-FILTER SKIPPING — the point-lookup pruning tier
    * min/max zone maps cannot provide: the table is clustered by VALUE
    * range (deliberately — every file's user_id span covers nearly the
    * whole id domain, so [[sinkTxnColumnStats]]-style zone maps admit
    * every file for a `user_id = k` probe), and a per-file BLOOM
    * sidecar (m = 4096 bits as ≤128 non-empty BIGINT words, k = 3
    * replayable multiplicative hashes — the Parquet footer-bloom /
    * Delta bloom-index shape) is what prunes. Eight fixed point probes
    * (six present at every SF, two absent) are served: each file
    * passes iff all 3 probe bits are set in its words, only PASSING
    * files are scanned with the residual `user_id = k` filter, and the
    * row census rides along — files_total/passed, the false-pass
    * count, and the fetched row's columns (−1 sentinels when absent).
    * The oracle re-derives the clustering, every bloom word, the pass
    * set, and the fetched values from raw events, so the hash
    * certifies the stored sidecar bits AND the skip decisions.
    *
    * Scale shape: the sidecar is ≤128 words/file metadata; a point
    * lookup at 10⁶ files tests 3 bits per file (O(files) metadata,
    * zero data) and reads only the expected-O(1) passing files. The
    * false-positive rate is the classic (1−e^{−3n/m})³ — files sized
    * so n/m keeps it ~1e-3, which the fp_files column makes
    * observable. */
  def sinkTxnBloomSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val probesDf = BloomProbes.toDF("probe_k")
    def shape(df: DataFrame): DataFrame = df
      .select($"probe_k", $"files_total", $"files_passed", $"fp_files",
        $"row_found", $"n_events", $"last_us", $"v_sum_4dp")
      .orderBy($"probe_k")
    // probe → its 3 slots (24 rows, constant)
    val pslots = probesDf
      .withColumn("i", explode(array(lit(1), lit(2), lit(3))))
      .selectExpr("probe_k", s"${bloomSlot("probe_k", "i")} AS slot")
    // serve against a words frame + the value-clustered state (shared
    // by the plan-only equivalent and, for the census, the real path)
    def serve(words: DataFrame, clustered: DataFrame): DataFrame = {
      val files = clustered.select($"bkt").distinct()
      val cand = pslots.crossJoin(broadcast(files))
        .join(words, pslots("slot").divide(lit(32)).cast("long") === words("w")
          && files("bkt") === words("wb"), "left")
        .select($"probe_k", $"bkt",
          when($"wv".isNotNull &&
            expr("(wv >> CAST(slot % 32 AS INT)) & 1") === 1L,
            1L).otherwise(0L).as("hit"))
        .groupBy($"probe_k", $"bkt").agg(min($"hit").as("pass"))
      val census = cand.groupBy($"probe_k")
        .agg(count(lit(1)).as("files_total"), sum($"pass").as("files_passed"))
      val found = clustered
        .join(cand.filter($"pass" === 1L).select($"probe_k", $"bkt"),
          Seq("bkt"))
        .filter($"user_id" === $"probe_k")
        .select($"probe_k", $"n_events", $"last_us", $"v_sum_4dp")
      probesDf
        .join(census, Seq("probe_k"), "left")
        .join(found, Seq("probe_k"), "left")
        .select($"probe_k",
          coalesce($"files_total", lit(0L)).as("files_total"),
          coalesce($"files_passed", lit(0L)).as("files_passed"),
          (coalesce($"files_passed", lit(0L)) -
            when($"n_events".isNotNull, 1L).otherwise(0L)).as("fp_files"),
          when($"n_events".isNotNull, 1L).otherwise(0L).as("row_found"),
          coalesce($"n_events", lit(-1L)).as("n_events"),
          coalesce($"last_us", lit(-1L)).as("last_us"),
          coalesce($"v_sum_4dp", lit(-1L)).as("v_sum_4dp"))
    }
    def wordsOf(clustered: DataFrame): DataFrame = clustered
      .select($"bkt", $"user_id")
      .withColumn("i", explode(array(lit(1), lit(2), lit(3))))
      .selectExpr("bkt AS wb", s"${bloomSlot("user_id", "i")} AS slot")
      .groupBy($"wb", expr("slot div 32").as("w"))
      .agg(expr("bit_or(CAST(1 AS BIGINT) << CAST(slot % 32 AS INT))")
        .as("wv"))
    def equivalent = {
      val st = state(ev)
      val bF = st.agg(min($"v_sum_4dp").as("mn"), max($"v_sum_4dp").as("mx"))
      val cl = st.crossJoin(broadcast(bF))
        .withColumn("w0", expr(s"((mx - mn) DIV $NBuckets) + 1"))
        .withColumn("bkt", expr("(v_sum_4dp - mn) DIV w0"))
        .drop("mn", "mx", "w0")
      shape(serve(wordsOf(cl), cl))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_bloomskip")
      val tBloom = Tables.scratch("txn_bloomskip_sidecar")
      TxnTable.drop(spark, table)
      TxnTable.drop(spark, tBloom)
      val st = state(ev)
      val bRow = st.agg(min($"v_sum_4dp"), max($"v_sum_4dp"))
        .collect().head // table stats: planning scalars
      if (bRow.isNullAt(0)) {
        TxnTable.commit(spark, table, 0, st) // empty-but-readable
        shape(probesDf
          .withColumn("files_total", lit(0L))
          .withColumn("files_passed", lit(0L))
          .withColumn("fp_files", lit(0L))
          .withColumn("row_found", lit(0L))
          .withColumn("n_events", lit(-1L))
          .withColumn("last_us", lit(-1L))
          .withColumn("v_sum_4dp", lit(-1L)))
      } else {
        val (mn, mx) = (bRow.getLong(0), bRow.getLong(1))
        val w = (mx - mn) / NBuckets + 1
        // VALUE-clustered layout: user_id zone maps can't prune a
        // point probe here — that is the premise
        val clustered = st.withColumn("bkt",
          expr(s"(v_sum_4dp - ${mn}L) DIV ${w}L"))
        val e0 = writeBuckets(clustered, s"$table/data/v0", "user_id")
        commitMaybeEmpty(spark, table, 0, e0, st)
        TxnTable.commit(spark, tBloom,
          0, wordsOf(clustered).withColumn("path",
            concat(lit(s"$table/data/v0/bkt="), $"wb")))
        // probe planning from the SIDECAR alone: which files pass?
        val words = TxnTable.read(spark, tBloom, None)
        val filesB = e0.map(_.bucket).sorted.toDF("bkt")
        val cand = pslots.crossJoin(broadcast(filesB))
          .join(words, pslots("slot").divide(lit(32)).cast("long") === words("w")
            && filesB("bkt") === words("wb"), "left")
          .select($"probe_k", $"bkt",
            when($"wv".isNotNull &&
              expr("(wv >> CAST(slot % 32 AS INT)) & 1") === 1L,
              1L).otherwise(0L).as("hit"))
          .groupBy($"probe_k", $"bkt").agg(min($"hit").as("pass"))
        val passing = cand.filter($"pass" === 1L)
          .collect().map(r => (r.getLong(0), r.getLong(1))) // ≤ 8·16: planning
        val census = cand.groupBy($"probe_k")
          .agg(count(lit(1)).as("files_total"),
            sum($"pass").as("files_passed"))
        val paths = passing.map(_._2).distinct.sorted
          .map(b => s"$table/data/v0/bkt=$b")
        val found =
          if (paths.isEmpty)
            probesDf.limit(0).select($"probe_k",
              lit(0L).as("n_events"), lit(0L).as("last_us"),
              lit(0L).as("v_sum_4dp"))
          else {
            // the data fetch: ONLY passing files, residual point filter
            val passDf = passing.toSeq.toDF("probe_k", "pbkt")
            spark.read.parquet(paths.toIndexedSeq: _*)
              .withColumn("bkt", expr(s"(v_sum_4dp - ${mn}L) DIV ${w}L"))
              .join(broadcast(passDf), $"bkt" === $"pbkt"
                && $"user_id" === $"probe_k")
              .select($"probe_k", $"n_events", $"last_us", $"v_sum_4dp")
          }
        shape(probesDf
          .join(census, Seq("probe_k"), "left")
          .join(found, Seq("probe_k"), "left")
          .select($"probe_k",
            coalesce($"files_total", lit(0L)).as("files_total"),
            coalesce($"files_passed", lit(0L)).as("files_passed"),
            (coalesce($"files_passed", lit(0L)) -
              when($"n_events".isNotNull, 1L).otherwise(0L)).as("fp_files"),
            when($"n_events".isNotNull, 1L).otherwise(0L).as("row_found"),
            coalesce($"n_events", lit(-1L)).as("n_events"),
            coalesce($"last_us", lit(-1L)).as("last_us"),
            coalesce($"v_sum_4dp", lit(-1L)).as("v_sum_4dp")))
      }
    }
  }

  // ---- file-level copy-on-write MERGE --------------------------------

  /** File-level COW MERGE, graded — the operation that makes a 100 TB
    * table maintainable: v0 = the pre-split per-user state, clustered
    * into `user_id % 16` hash buckets with one manifest entry (path +
    * min/max stats) per file; the delta = ONE tenant shard's late
    * backfill (post-split events of users with `user_id % 64 = 3` — a
    * targeted feed, the shape that makes COW pay). The merge resolves
    * the touched-file set from the delta's bucket footprint (here the
    * single bucket 3, since 64 ≡ 0 mod 16 — but computed, not
    * assumed), re-aggregates ONLY those buckets' rows ∪ delta, writes
    * only them under v1, and CARRIES every untouched file by reference
    * into the v1 manifest. The graded frame is v1 read back through
    * the file-manifest resolver, decorated with the files-written /
    * files-carried census — both derived from data by the oracle, so
    * the hash certifies the rewrite set was exactly the delta's
    * footprint and the carried bytes were never touched.
    *
    * Scale shape: touched-file planning is a ≤16-row driver collect
    * (the same metadata join Delta's merge runs); the rewrite reads
    * |touched buckets| of the state, never the table; carried files
    * cost zero I/O. At 100 TB with 2ⁱ⁶ buckets a one-shard backfill
    * rewrites 1/65536th of the table. */
  def sinkTxnMergeCow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 3)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"files_written", $"files_carried")
      .orderBy($"user_id")
    def equivalent = {
      val touchedB = delta.select(($"user_id" % NBuckets).as("b")).distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("files_written"))))
        .crossJoin(broadcast(
          pre.select(($"user_id" % NBuckets).as("b")).distinct
            .join(touchedB, Seq("b"), "left_anti")
            .agg(count(lit(1)).as("files_carried"))))
      shape(state(pre.filter($"user_id" % 64 =!= 3).unionByName(
          ev.filter($"user_id" % 64 === 3)))
        .crossJoin(broadcast(census.select($"files_written", $"files_carried"))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_cow_merge")
      TxnTable.drop(spark, table)
      val st0 = state(pre)
      val e0 = writeBuckets(st0.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st0)
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val e1 = writeBuckets(merged.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      // the commit writes O(touched-files) manifest bytes: adds = the
      // rewritten buckets, removes = their v0 predecessors; carried
      // files are IMPLICIT (they stay in the resolved set untouched)
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      shape(TxnTable.read(spark, table, None)
        .withColumn("files_written", lit(e1.size.toLong))
        .withColumn("files_carried", lit(carried.size.toLong)))
    }
  }

  // ---- GDPR delete: targeted rewrite + reference-aware purge ---------

  /** Targeted DELETE with file-level COW and a PHYSICAL PURGE, graded —
    * the right-to-be-forgotten workload: erase every user with
    * `user_id % 64 = 7` from the clustered state table. The delete
    * resolves the matched users' bucket footprint (bucket 7 alone),
    * rewrites only that file without the erased rows — and when NO
    * survivor remains in a touched bucket (the sf0.001 case: user 7 is
    * the bucket's only occupant) the file is DROPPED from the manifest
    * entirely, the Delta remove-action — then carries the other 15
    * files by reference. The reference-aware vacuum (`keepLast = 1`)
    * must then walk the kept manifest's FILE set: it physically purges
    * exactly v0's bucket-7 file (the only unreferenced path — where
    * every erased byte lives) while the carried v0 files SURVIVE
    * because v1 still references them — deleting them would corrupt
    * the live table, which is why real formats' vacuums are
    * reference-aware and not age-based dir sweeps. The graded frame is
    * the post-vacuum latest snapshot (reading it exercises the carried
    * files) + the full census: files rewritten/dropped/carried, users
    * erased, paths purged, manifests expired, and the loud-expiry flag
    * for time travel to the pre-erasure version — every number derived
    * from data by the oracle.
    *
    * Scale shape: matched-file planning is the ≤16-row metadata
    * collect; the rewrite reads one bucket; the purge is O(files)
    * driver deletes with zero data read. GDPR at 100 TB = rewrite the
    * matched buckets + vacuum, never a table scan-and-rewrite. */
  def sinkTxnDeleteCow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val erased = $"user_id" % 64 === 7
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"files_rewritten", $"files_dropped", $"files_carried",
        $"users_erased", $"paths_purged", $"manifests_expired",
        $"expired_travel_fails")
      .orderBy($"user_id")
    def equivalent = {
      val allB = ev.select(($"user_id" % NBuckets).as("b")).distinct
      val touchedB = ev.filter(erased)
        .select(($"user_id" % NBuckets).as("b")).distinct
      val survivorB = ev.filter(!erased)
        .select(($"user_id" % NBuckets).as("b")).distinct
        .join(touchedB, Seq("b"), "left_semi")
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(survivorB.agg(count(lit(1)).as("files_rewritten"))))
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("touched"))))
        .crossJoin(broadcast(
          allB.join(touchedB, Seq("b"), "left_anti")
            .agg(count(lit(1)).as("files_carried"))))
        .crossJoin(broadcast(ev.filter(erased)
          .agg(countDistinct($"user_id").as("users_erased"))))
      shape(state(ev.filter(!erased))
        .crossJoin(broadcast(census.select($"files_rewritten",
          ($"touched" - $"files_rewritten").as("files_dropped"),
          $"files_carried", $"users_erased",
          $"touched".as("paths_purged"))))
        .withColumn("manifests_expired", lit(1L))
        .withColumn("expired_travel_fails", lit(1L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_cow_delete")
      TxnTable.drop(spark, table)
      val st = state(ev)
      val e0 = writeBuckets(st.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      val touched = TxnTable.read(spark, table, Some(0)).filter(erased)
        .select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val survivors = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*) && !erased)
      val e1 = writeBuckets(
        survivors.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, survivors)
      val nErased = st.filter(erased).count() // the erasure receipt
      val (purged, expired) = TxnTable.vacuum(spark, table, 1)
      val travelFails =
        try { TxnTable.read(spark, table, Some(0)); 0L }
        catch { case _: IllegalArgumentException => 1L }
      shape(TxnTable.read(spark, table, None)
        .withColumn("files_rewritten", lit(e1.size.toLong))
        .withColumn("files_dropped", lit(touched.size.toLong - e1.size))
        .withColumn("files_carried", lit(carried.size.toLong))
        .withColumn("users_erased", lit(nErased))
        .withColumn("paths_purged", lit(purged.toLong))
        .withColumn("manifests_expired", lit(expired.toLong))
        .withColumn("expired_travel_fails", lit(travelFails)))
    }
  }

  // ---- GDPR delete, merge-on-read tier --------------------------------

  /** MERGE-ON-READ point deletes, graded — the Iceberg-v2 delete-file /
    * Delta deletion-vector contract the COW tier can't express: a
    * trickle of point deletes (the GDPR steady state) must NOT force a
    * bucket rewrite per commit. v0 = the 16-bucket clustered state;
    * then TWO delete commits (`user_id % 64 = 7`, then `% 64 = 21`)
    * each write ONLY a small parquet of deleted keys and an
    * O(deleted-keys)-byte delta manifest (`delAdds`) — zero data files
    * touched; every read from v1 on transparently anti-joins the live
    * delete files, so deleted users are invisible the moment the
    * delete commits (rows_v1/rows_v2 certify exactly this, derived
    * from data by the oracle). An OPTIMIZE fold (v3) then rewrites
    * only the deletes' bucket footprint without the erased rows, drops
    * a bucket entirely when no survivor remains, carries the rest, and
    * RETIRES both delete files (`delRemoves`) — read-side work returns
    * to zero. The reference-aware vacuum physically purges the
    * superseded v0 buckets AND the delete files (which expire with
    * their versions — the retention law), and time travel to the
    * pre-fold versions fails loudly. The graded frame is the
    * post-vacuum snapshot + the full census: delete files written,
    * per-version visible-row counts, fold rewrite/drop/carry split,
    * paths purged, manifests expired, loud-expiry flag — every number
    * re-derived from raw events by the oracle.
    *
    * Scale shape: a point delete is O(keys) bytes and O(1) files; the
    * read-side anti-join touches |delete keys| (tiny) per scan until
    * the fold amortizes it away; the fold rewrites |touched buckets|,
    * never the table. At 100 TB this is the difference between a GDPR
    * queue forcing daily bucket rewrites and a weekly OPTIMIZE. */
  def sinkTxnDeleteMor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val del1 = $"user_id" % 64 === 7
    val del2 = $"user_id" % 64 === 21
    val erased = del1 || del2
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"delete_files_written", $"rows_v1", $"rows_v2",
        $"files_rewritten", $"files_dropped", $"files_carried",
        $"paths_purged", $"manifests_expired", $"expired_travel_fails")
      .orderBy($"user_id")
    def equivalent = {
      val allB = ev.select(($"user_id" % NBuckets).as("b")).distinct
      val touchedB = ev.filter(erased)
        .select(($"user_id" % NBuckets).as("b")).distinct
      val survivorB = ev.filter(!erased)
        .select(($"user_id" % NBuckets).as("b")).distinct
        .join(touchedB, Seq("b"), "left_semi")
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(ev.filter(!del1)
          .agg(countDistinct($"user_id").as("rows_v1"))))
        .crossJoin(broadcast(ev.filter(!erased)
          .agg(countDistinct($"user_id").as("rows_v2"))))
        .crossJoin(broadcast(survivorB.agg(count(lit(1)).as("files_rewritten"))))
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("touched"))))
        .crossJoin(broadcast(allB.join(touchedB, Seq("b"), "left_anti")
          .agg(count(lit(1)).as("files_carried"))))
      shape(state(ev.filter(!erased))
        .crossJoin(broadcast(census.select(lit(2L).as("delete_files_written"),
          $"rows_v1", $"rows_v2", $"files_rewritten",
          ($"touched" - $"files_rewritten").as("files_dropped"),
          $"files_carried", ($"touched" + 2L).as("paths_purged"))))
        .withColumn("manifests_expired", lit(3L))
        .withColumn("expired_travel_fails", lit(1L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_mor_delete")
      TxnTable.drop(spark, table)
      val st = state(ev)
      val e0 = writeBuckets(st.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      // two point-delete commits: O(keys) bytes each, zero data rewrites
      def deleteCommit(version: Int, pred: org.apache.spark.sql.Column): String = {
        val path = s"$table/data/v$version/del"
        st.filter(pred).select($"user_id").coalesce(1)
          .write.mode("overwrite").parquet(path)
        TxnTable.commitDelta(spark, table, version,
          delAdds = Seq(TxnTable.DeleteFile(path, "user_id")))
        path
      }
      val d1 = deleteCommit(1, del1)
      val rowsV1 = TxnTable.read(spark, table, Some(1)).count()
      val d2 = deleteCommit(2, del2)
      val rowsV2 = TxnTable.read(spark, table, Some(2)).count()
      // OPTIMIZE fold: rewrite only the deletes' bucket footprint from
      // the MOR read (deletes already applied), retire the delete files
      val touched = st.filter(erased)
        .select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val survivors = TxnTable.read(spark, table, Some(2))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      val e3 = writeBuckets(
        survivors.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v3", "user_id")
      if (e0.isEmpty)
        TxnTable.commitDelta(spark, table, 3, delRemoves = Seq(d1, d2))
      else TxnTable.commitDelta(spark, table, 3, adds = e3,
        removes = e0.filter(e => touched.contains(e.bucket)).map(_.path),
        delRemoves = Seq(d1, d2))
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      val (purged, expired) = TxnTable.vacuum(spark, table, 1)
      val travelFails =
        try { TxnTable.read(spark, table, Some(1)); 0L }
        catch { case _: IllegalArgumentException => 1L }
      shape(TxnTable.read(spark, table, None)
        .withColumn("delete_files_written", lit(2L))
        .withColumn("rows_v1", lit(rowsV1))
        .withColumn("rows_v2", lit(rowsV2))
        .withColumn("files_rewritten", lit(e3.size.toLong))
        .withColumn("files_dropped", lit(touched.size.toLong - e3.size))
        .withColumn("files_carried", lit(carried.size.toLong))
        .withColumn("paths_purged", lit(purged.toLong))
        .withColumn("manifests_expired", lit(expired.toLong))
        .withColumn("expired_travel_fails", lit(travelFails)))
    }
  }

  // ---- manifest-stats data skipping ----------------------------------

  /** Stats-based DATA SKIPPING, graded — the read-side half of the
    * file-level format: the state table is RANGE-clustered on user_id
    * (bucket = user_id div W, W sized from the max id so ≤16 files),
    * each manifest entry carrying the file's true min/max key; a
    * selective scan (`user_id BETWEEN 30% AND 45%` of the id range)
    * prunes the entry list against the predicate BEFORE reading a byte
    * and scans only the overlapping files (+ the residual filter,
    * since stats admit a superset). The graded frame is the
    * pruned-scan result decorated with files_total / files_scanned /
    * files_skipped, ALL derived from data by the oracle (per-bucket
    * min/max recomputed in SQL) — so the hash certifies both halves:
    * a file wrongly skipped loses rows, a file wrongly scanned breaks
    * the census.
    *
    * Scale shape: pruning is O(files) driver metadata (the Iceberg
    * manifest scan); data I/O is |overlapping files| — a 15% key-range
    * query on a 100 TB range-clustered table reads ~15% of files, and
    * the same machinery serves partition pruning, z-order min/max and
    * bloom skipping. */
  def sinkTxnDataSkipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"files_total", $"files_scanned", $"files_skipped")
      .orderBy($"user_id")
    // replayable range arithmetic: W = mx div 16 + 1, bounds at 30/45%
    def boundsOf(mx: Long): (Long, Long, Long) =
      (mx / NBuckets + 1, mx * 3 / 10, mx * 9 / 20)
    def equivalent = {
      val mxF = ev.agg(max($"user_id").as("mx"))
      val bkts = ev.crossJoin(broadcast(mxF))
        .select(expr(s"user_id DIV (mx DIV $NBuckets + 1)").as("b"),
          $"user_id", (($"mx" * 3) / 10).cast("long").as("lo"),
          (($"mx" * 9) / 20).cast("long").as("hi"))
        .groupBy($"b", $"lo", $"hi")
        .agg(min($"user_id").as("mn"), max($"user_id").as("mx_b"))
      val census = bkts.agg(count(lit(1)).as("files_total"),
        count(when($"mx_b" >= $"lo" && $"mn" <= $"hi", 1))
          .as("files_scanned"))
      val filtered = state(ev).crossJoin(broadcast(mxF))
        .filter($"user_id".between((($"mx" * 3) / 10).cast("long"),
          (($"mx" * 9) / 20).cast("long")))
        .drop("mx")
      shape(filtered.crossJoin(broadcast(census
        .select($"files_total", $"files_scanned",
          ($"files_total" - $"files_scanned").as("files_skipped")))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_skip")
      TxnTable.drop(spark, table)
      val mxRow = ev.agg(max($"user_id")).collect().head // table stats
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val (w, lo, hi) = boundsOf(mx)
      val st = state(ev)
      val e0 = writeBuckets(st.withColumn("bkt", expr(s"user_id DIV $w")),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st)
      // scan planning: prune the manifest against the predicate —
      // driver-side O(files) metadata, zero data I/O
      val scanned = e0.filter(e => e.maxKey >= lo && e.minKey <= hi)
      val out =
        if (e0.isEmpty) TxnTable.read(spark, table, None) // empty table
        else if (scanned.isEmpty) // every file pruned: zero-I/O empty scan
          TxnTable.read(spark, table, None).limit(0)
        else {
          // re-resolve THROUGH the committed manifest (not the local
          // entry list): pruning must act on what a reader would see
          val entries = TxnTable.fileEntries(spark, table, None)
          val live = entries.filter(e => e.maxKey >= lo && e.minKey <= hi)
          spark.read.parquet(live.map(_.path): _*)
        }
      shape(out
        .filter($"user_id".between(lo, hi)) // residual: stats admit a superset
        .withColumn("files_total", lit(e0.size.toLong))
        .withColumn("files_scanned", lit(scanned.size.toLong))
        .withColumn("files_skipped", lit(e0.size.toLong - scanned.size)))
    }
  }

  // ---- O(1) appends + OPTIMIZE compaction ----------------------------

  /** Append-only commits + OPTIMIZE bin-packing, graded — the ingest
    * lifecycle of a file-level table: four event-time quartiles of the
    * RAW event log land as four APPEND commits, each an O(1) manifest
    * extension (the new file's entry + every prior entry carried by
    * reference — no data rewritten, the Delta add-action); then
    * OPTIMIZE rewrites the accumulated small files into the
    * `user_id % 16` hash-clustered layout as v4 (content-identical,
    * layout-only — what nightly compaction does to a streaming
    * table's small-file debt), and the reference-aware vacuum purges
    * exactly the four superseded quartile files. The graded frame is
    * the per-event-type summary read FROM the compacted table (count,
    * 4-dp value sum, ts min/max, distinct users — a content
    * fingerprint that any lost or duplicated row breaks) + the
    * files_before / files_after / paths_purged census, the latter two
    * derived from data by the oracle.
    *
    * Scale shape: appends never touch existing data (the point of the
    * log); OPTIMIZE is one full-table pass shuffled on the cluster
    * key — amortized across the appends it supersedes; vacuum is
    * O(files) metadata. */
  def sinkTxnCompactBinpack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    def summary(df: DataFrame): DataFrame = df.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"),
        min($"ts_us").as("min_ts_us"), max($"ts_us").as("max_ts_us"),
        countDistinct($"user_id").as("n_users"))
    def shape(df: DataFrame): DataFrame = df
      .select($"event_type", $"n_events", $"v_sum_4dp", $"min_ts_us",
        $"max_ts_us", $"n_users", $"files_before", $"files_after",
        $"paths_purged")
      .orderBy($"event_type")
    def equivalent = {
      val census = ev.select(($"user_id" % NBuckets).as("b")).distinct
        .agg(count(lit(1)).as("files_after"))
      shape(summary(ev).crossJoin(broadcast(census
        .select(lit(4L).as("files_before"), $"files_after",
          lit(4L).as("paths_purged")))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_binpack")
      TxnTable.drop(spark, table)
      var entries = Seq.empty[FileEntry]
      AppendBoundsUs.zipWithIndex.foreach { case (b, i) =>
        val loB = if (i == 0) Long.MinValue else AppendBoundsUs(i - 1)
        val q = ev.filter($"ts_us" >= loB && $"ts_us" < b)
        val path = s"$table/data/v$i/q"
        q.write.mode("overwrite").parquet(path)
        val st = q.agg(min($"ts_us"), max($"ts_us"), count(lit(1)))
          .collect().head
        // append = prior entries carried + one add-action; O(1) rewrite.
        // Empty-batch stats: a [MaxValue, MinValue] sentinel range that
        // no predicate overlaps (skipping-correct for an empty file)
        val add = FileEntry(i.toLong, path,
          if (st.isNullAt(0)) Long.MaxValue else st.getLong(0),
          if (st.isNullAt(1)) Long.MinValue else st.getLong(1),
          rowCount = st.getLong(2))
        entries = entries :+ add
        // first commit anchors the chain (full); every later append is
        // an O(1)-byte delta manifest carrying only its add-action
        if (i == 0) TxnTable.commitEntries(spark, table, i, entries)
        else TxnTable.commitDelta(spark, table, i, adds = Seq(add))
      }
      val filesBefore = entries.size.toLong
      // OPTIMIZE: content-identical re-clustering of the small files
      val pre = TxnTable.read(spark, table, None)
      val e4 = writeBuckets(pre.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v4", "user_id")
      // OPTIMIZE as a delta: add the clustered layout, remove every
      // superseded quartile — O(changed) manifest bytes again
      commitCowDelta(spark, table, 4, entries, e4,
        entries.map(_.path), e4, pre)
      val (purged, _) = TxnTable.vacuum(spark, table, 1)
      shape(summary(TxnTable.read(spark, table, None))
        .withColumn("files_before", lit(filesBefore))
        .withColumn("files_after", lit(e4.size.toLong))
        .withColumn("paths_purged", lit(purged.toLong)))
    }
  }

  // ---- z-order clustering + two-dimensional skipping -----------------

  /** Z-ORDER clustering with TWO-DIMENSIONAL zone-map skipping, graded
    * — the OPTIMIZE ZORDER payoff measured at the manifest: the
    * (user, day) activity grid is clustered by the Morton interleave
    * of CELL-NORMALIZED coordinates (user cell = `user_id DIV Wu` in
    * 0..15, day offset = `day − min(day)` — normalization matters:
    * interleaving raw keys whose high bits are constant, like epoch
    * days, degenerates the curve into a single z-range) into ≤16
    * z-range files, each manifest entry carrying zone maps on BOTH
    * dimensions; a rectangle query (user ∈ 30–45% of the id range AND
    * day ∈ the middle of the observed window) prunes the entry list on
    * both zone maps before any I/O. Because the curve keeps z-adjacent
    * rows close in BOTH dimensions, each file's (user × day) bounding
    * box is tight, and the rectangle skips files on EITHER dimension —
    * a single-key layout serves only one (its files span the full
    * range of the other; the documented honesty gap of
    * `sink_txn_data_skipping`, closed here). Census and content both
    * oracle-derived: the DuckDB replay recomputes the 32-term
    * interleave, the z-range bucketing, the per-file boxes AND the
    * overlap count from raw events.
    *
    * Scale shape: interleave is shift/and/add inside codegen; the
    * cluster write is one range shuffle on zval; pruning is O(files)
    * driver metadata. At 100 TB the same curve serves every
    * rectangle-ish predicate on the two clustered keys without a
    * second copy of the data. */
  def sinkTxnZorderSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val grid = ev.groupBy($"user_id",
        expr(s"CAST(ts_us DIV $DayUs AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("n_events"),
        (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"))
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"day", $"n_events", $"v_sum_4dp",
        $"files_total", $"files_scanned", $"files_skipped")
      .orderBy($"user_id", $"day")
    def equivalent = {
      val bounds = grid.agg(max($"user_id").as("mxu"),
        min($"day").as("dmn"), max($"day").as("dmx"))
      val zc = grid.crossJoin(broadcast(bounds))
        .withColumn("zval", zInterleave(
          expr(s"user_id DIV (mxu DIV $NBuckets + 1)"), $"day" - $"dmn"))
      val boundsZ = zc.agg(max($"zval").as("mxz"))
      val boxes = zc.crossJoin(broadcast(boundsZ))
        .select(expr(s"zval DIV (mxz DIV $NBuckets + 1)").as("b"),
          $"user_id", $"day",
          (($"mxu" * 3) / 10).cast("long").as("ulo"),
          (($"mxu" * 9) / 20).cast("long").as("uhi"),
          ($"dmn" + ($"dmx" - $"dmn") / 4).cast("long").as("dlo"),
          ($"dmn" + (($"dmx" - $"dmn") * 5) / 8).cast("long").as("dhi"))
        .groupBy($"b", $"ulo", $"uhi", $"dlo", $"dhi")
        .agg(min($"user_id").as("mn1"), max($"user_id").as("mx1"),
          min($"day").as("mn2"), max($"day").as("mx2"))
      val census = boxes.agg(count(lit(1)).as("files_total"),
        count(when($"mx1" >= $"ulo" && $"mn1" <= $"uhi" &&
          $"mx2" >= $"dlo" && $"mn2" <= $"dhi", 1)).as("files_scanned"))
      val filtered = grid.crossJoin(broadcast(bounds))
        .filter($"user_id".between((($"mxu" * 3) / 10).cast("long"),
            (($"mxu" * 9) / 20).cast("long")) &&
          $"day".between(($"dmn" + ($"dmx" - $"dmn") / 4).cast("long"),
            ($"dmn" + (($"dmx" - $"dmn") * 5) / 8).cast("long")))
        .drop("mxu", "dmn", "dmx")
      shape(filtered.crossJoin(broadcast(census
        .select($"files_total", $"files_scanned",
          ($"files_total" - $"files_scanned").as("files_skipped")))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_zorder")
      TxnTable.drop(spark, table)
      val bRow = grid.agg(max($"user_id"), min($"day"), max($"day"))
        .collect().head // table stats
      val (mxu, dmn, dmx) =
        if (bRow.isNullAt(0)) (0L, 0L, 0L)
        else (bRow.getLong(0), bRow.getLong(1), bRow.getLong(2))
      val wu = mxu / NBuckets + 1
      val z = grid.withColumn("zval",
        zInterleave(expr(s"user_id DIV $wu"), $"day" - lit(dmn)))
      val zRow = z.agg(max($"zval")).collect().head
      val mxz = if (zRow.isNullAt(0)) 0L else zRow.getLong(0)
      val wz = mxz / NBuckets + 1
      val (ulo, uhi) = (mxu * 3 / 10, mxu * 9 / 20)
      val (dlo, dhi) = (dmn + (dmx - dmn) / 4, dmn + (dmx - dmn) * 5 / 8)
      val e0 = writeBuckets2(
        z.withColumn("bkt", expr(s"zval DIV $wz")).drop("zval"),
        s"$table/data/v0", "user_id", "day")
      commitMaybeEmpty(spark, table, 0, e0, grid)
      // two-zone-map pruning: a file survives only if its (user × day)
      // bounding box intersects the query rectangle
      val scanned = e0.filter(e => e.maxKey >= ulo && e.minKey <= uhi &&
        e.max2 >= dlo && e.min2 <= dhi)
      val out =
        if (e0.isEmpty) TxnTable.read(spark, table, None)
        else if (scanned.isEmpty) TxnTable.read(spark, table, None).limit(0)
        else spark.read.parquet(TxnTable.fileEntries(spark, table, None)
          .filter(e => e.maxKey >= ulo && e.minKey <= uhi &&
            e.max2 >= dlo && e.min2 <= dhi).map(_.path): _*)
      shape(out
        .filter($"user_id".between(ulo, uhi) && $"day".between(dlo, dhi))
        .withColumn("files_total", lit(e0.size.toLong))
        .withColumn("files_scanned", lit(scanned.size.toLong))
        .withColumn("files_skipped", lit(e0.size.toLong - scanned.size)))
    }
  }

  // ---- GDPR delete, positional deletion-vector tier --------------------

  /** POSITIONAL deletion vectors, graded — the refinement
    * [[sinkTxnDeleteMor]]'s equality deletes approximate: a DV
    * addresses PHYSICAL ROW POSITIONS, not key values, so applying it
    * costs an anti-join on a compact (file, position) set with no key
    * semantics at all (works for keyless tables, duplicate keys, and
    * row-level ACLs alike). Stable addresses exist here because every
    * data file is written SORTED by the cluster key and is immutable
    * thereafter — `pos` (the in-file rank) is materialized at write
    * time, the honest stand-in for the parquet row index the real
    * formats address. The DELETE's scan resolves the matched rows'
    * (bucket, pos) addresses from the v0 snapshot, commits them as ONE
    * small DV parquet + an O(entries)-byte delta manifest; reads from
    * v1 anti-join on the composite address ([[TxnTable.DeleteFile]]'s
    * `"bkt,pos"` form); the OPTIMIZE fold rewrites the touched buckets
    * (re-ranking positions — addresses are file-local and die with
    * their file), retires the DV, and vacuum expires it with its
    * version. Census all data-derived: DV entry count, v1 visibility,
    * fold split, purge and loud-expiry receipts.
    *
    * Scale shape: identical to the equality tier — O(entries) delete
    * commits, |touched buckets| fold — with the anti-join key now
    * constant-width regardless of the table's key shape. */
  def sinkTxnDeleteDv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val bad = $"user_id" % 64 === 11
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"dv_positions", $"rows_v1", $"files_rewritten", $"files_dropped",
        $"files_carried", $"paths_purged", $"manifests_expired",
        $"expired_travel_fails")
      .orderBy($"user_id")
    def equivalent = {
      val allB = ev.select(($"user_id" % NBuckets).as("b")).distinct
      val touchedB = ev.filter(bad)
        .select(($"user_id" % NBuckets).as("b")).distinct
      val survivorB = ev.filter(!bad)
        .select(($"user_id" % NBuckets).as("b")).distinct
        .join(touchedB, Seq("b"), "left_semi")
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(ev.filter(bad)
          .agg(countDistinct($"user_id").as("dv_positions"))))
        .crossJoin(broadcast(ev.filter(!bad)
          .agg(countDistinct($"user_id").as("rows_v1"))))
        .crossJoin(broadcast(survivorB.agg(count(lit(1)).as("files_rewritten"))))
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("touched"))))
        .crossJoin(broadcast(allB.join(touchedB, Seq("b"), "left_anti")
          .agg(count(lit(1)).as("files_carried"))))
      shape(state(ev.filter(!bad))
        .crossJoin(broadcast(census.select($"dv_positions", $"rows_v1",
          $"files_rewritten",
          ($"touched" - $"files_rewritten").as("files_dropped"),
          $"files_carried", ($"touched" + 1L).as("paths_purged"))))
        .withColumn("manifests_expired", lit(2L))
        .withColumn("expired_travel_fails", lit(1L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_dv_delete")
      TxnTable.drop(spark, table)
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy($"bkt").orderBy($"user_id")
      // files are written sorted by the cluster key; (b, pos) = the
      // stable in-file address every later DV targets. `b` is stored
      // IN the file (partitionBy consumes `bkt` into the dir name, and
      // per-file manifest reads don't run partition discovery).
      def addressed(df: DataFrame): DataFrame = df
        .withColumn("bkt", $"user_id" % NBuckets)
        .withColumn("b", $"user_id" % NBuckets)
        .withColumn("pos", row_number().over(wPos).cast("long"))
      val st = addressed(state(ev))
      val e0 = writeBuckets(st, s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st.drop("bkt"))
      // the DELETE's scan resolves physical addresses from the snapshot
      val dvPath = s"$table/data/v1/dv"
      val dvRows = TxnTable.read(spark, table, Some(0)).filter(bad)
        .select($"b", $"pos")
      dvRows.coalesce(1).write.mode("overwrite").parquet(dvPath)
      val dvN = dvRows.count()
      TxnTable.commitDelta(spark, table, 1,
        delAdds = Seq(TxnTable.DeleteFile(dvPath, "b,pos")))
      val rowsV1 = TxnTable.read(spark, table, Some(1)).count()
      // OPTIMIZE fold: rewrite the DV's bucket footprint, re-ranking
      // positions (addresses are file-local and die with their file)
      val touched = st.filter(bad)
        .select($"b").distinct.collect().map(_.getLong(0)).toSet
      val survivors = addressed(TxnTable.read(spark, table, Some(1))
        .filter($"b".isin(touched.toSeq: _*))
        .drop("b", "pos"))
      val e2 = writeBuckets(survivors, s"$table/data/v2", "user_id")
      if (e0.isEmpty)
        TxnTable.commitDelta(spark, table, 2, delRemoves = Seq(dvPath))
      else TxnTable.commitDelta(spark, table, 2, adds = e2,
        removes = e0.filter(e => touched.contains(e.bucket)).map(_.path),
        delRemoves = Seq(dvPath))
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      val (purged, expired) = TxnTable.vacuum(spark, table, 1)
      val travelFails =
        try { TxnTable.read(spark, table, Some(1)); 0L }
        catch { case _: IllegalArgumentException => 1L }
      shape(TxnTable.read(spark, table, None)
        .withColumn("dv_positions", lit(dvN))
        .withColumn("rows_v1", lit(rowsV1))
        .withColumn("files_rewritten", lit(e2.size.toLong))
        .withColumn("files_dropped", lit(touched.size.toLong - e2.size))
        .withColumn("files_carried", lit(carried.size.toLong))
        .withColumn("paths_purged", lit(purged.toLong))
        .withColumn("manifests_expired", lit(expired.toLong))
        .withColumn("expired_travel_fails", lit(travelFails)))
    }
  }

  // ---- zero-copy shallow clone ----------------------------------------

  /** SHALLOW CLONE + write isolation, graded — the Delta SHALLOW CLONE /
    * Iceberg snapshot-ref workflow that makes a 100 TB table cheap to
    * sandbox: the clone is a NEW snapshot log whose v0 manifest simply
    * REFERENCES the source's files (zero bytes copied — the clone costs
    * O(files) manifest metadata), and a subsequent COW merge INTO THE
    * CLONE (one tenant shard's post-split backfill, `user_id % 64 = 5`)
    * rewrites only the touched buckets under the clone's own data dir
    * while the source stays byte-identical and version-identical — the
    * two isolation directions (clone sees source data; source never
    * sees clone writes) that make dev/test-against-production safe.
    * The graded frame stacks the SOURCE read (must equal the original
    * state — proving write isolation) with the CLONE read (must equal
    * the merged state — proving the clone is live, not a copy of
    * staleness), plus the census: cloned file count, clone-merge
    * rewrite/carry split, and the source's version count after all
    * clone activity (still 1). Every number data-derived by the
    * oracle.
    *
    * Scale shape: the clone commit is O(files) manifest bytes, zero
    * data I/O; the clone's merge pays only its bucket footprint; the
    * source pays NOTHING. (Vacuum honesty: each root's vacuum walks
    * its own data dir, so a clone vacuum cannot purge source files —
    * but a SOURCE vacuum does not see clone references; production
    * formats track cross-table references or disallow vacuum under
    * clones, and the scaladoc records the same operational rule
    * here.) */
  def sinkTxnCloneShallow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 5)
    def shape(df: DataFrame): DataFrame = df
      .select($"side", $"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"cloned_files", $"clone_rewritten", $"clone_carried",
        $"source_versions")
      .orderBy($"side", $"user_id")
    def equivalent = {
      val allB = pre.select(($"user_id" % NBuckets).as("b")).distinct
      val touchedB = delta.select(($"user_id" % NBuckets).as("b")).distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(allB.agg(count(lit(1)).as("cloned_files"))))
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("clone_rewritten"))))
        .crossJoin(broadcast(allB.join(touchedB, Seq("b"), "left_anti")
          .agg(count(lit(1)).as("clone_carried"))))
      val src = state(pre).withColumn("side", lit("source"))
      val cln = state(pre.filter($"user_id" % 64 =!= 5)
          .unionByName(ev.filter($"user_id" % 64 === 5)))
        .withColumn("side", lit("clone"))
      shape(src.unionByName(cln)
        .crossJoin(broadcast(census.select($"cloned_files",
          $"clone_rewritten", $"clone_carried")))
        .withColumn("source_versions", lit(1L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_clone_src")
      TxnTable.drop(spark, table)
      val clone = s"$table/clones/dev"
      val st0 = state(pre)
      val e0 = writeBuckets(st0.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st0)
      // SHALLOW CLONE: a new log whose v0 references the source's files
      commitMaybeEmpty(spark, clone, 0, e0,
        TxnTable.read(spark, table, None))
      // COW merge INTO THE CLONE only
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val prevTouched = TxnTable.read(spark, clone, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val e1 = writeBuckets(merged.withColumn("bkt", $"user_id" % NBuckets),
        s"$clone/data/v1", "user_id")
      commitCowDelta(spark, clone, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ e0.filterNot(e => touched.contains(e.bucket)), merged)
      val srcVersions = TxnTable.versions(spark, table).size.toLong
      shape(TxnTable.read(spark, table, None).withColumn("side", lit("source"))
        .unionByName(
          TxnTable.read(spark, clone, None).withColumn("side", lit("clone")))
        .withColumn("cloned_files", lit(e0.size.toLong))
        .withColumn("clone_rewritten", lit(e1.size.toLong))
        .withColumn("clone_carried",
          lit(e0.count(e => !touched.contains(e.bucket)).toLong))
        .withColumn("source_versions", lit(srcVersions)))
    }
  }

  // ---- write-audit-publish branch isolation ---------------------------

  /** WRITE-AUDIT-PUBLISH, graded — the Iceberg WAP / Delta-on-a-branch
    * workflow that keeps UNAUDITED data out of every main-table
    * reader's view: the post-split ingest batch (per-(user, period)
    * summaries) lands on an AUDIT BRANCH (its own snapshot log under
    * `branches/audit/` — same TxnTable protocol, different root); the
    * audit query then runs AGAINST THE BRANCH and flags rows from a
    * known-poisoned ingest shard (`user_id % 64 = 9`); the fix commits
    * the quarantined batch as branch v1; the re-audit passes; and only
    * then does PUBLISH make the data visible on main — as a delta
    * manifest whose adds REFERENCE THE BRANCH'S FILES (zero-copy: a
    * publish moves no bytes, exactly Iceberg's fast-forward). Main's
    * version count is captured BEFORE publish (still v0 while the
    * branch held two commits) — the isolation guarantee, graded. A
    * branch vacuum then purges the unaudited candidate's files while
    * the published files survive (they are referenced by the branch's
    * kept manifest AND by main — reference-aware both ways). The
    * graded frame is the post-publish main read (pre-state ∪ audited
    * batch) + the census: audit violations before/after the fix,
    * main's pre-publish version count, published file count,
    * candidate paths purged — every number re-derived from raw events
    * by the oracle.
    *
    * Scale shape: the branch is a metadata namespace (zero data
    * divergence cost); audits are ordinary reads of the branch
    * snapshot; publish is O(published-files) manifest bytes and ZERO
    * data I/O; the candidate purge is O(files) driver metadata. At
    * 100 TB this is how nightly ingest ships: stage → audit → publish
    * or quarantine, with main never serving an unaudited row. */
  def sinkTxnWapPublish(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val bad = $"user_id" % 64 === 9
    def perPeriod(df: DataFrame, period: String): DataFrame = df
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"),
        max($"ts_us").as("last_us"),
        (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"))
      .withColumn("period", lit(period))
    val pre = perPeriod(ev.filter($"ts_us" < SplitUs), "pre")
    val post = perPeriod(ev.filter($"ts_us" >= SplitUs), "post")
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"period", $"n_events", $"last_us", $"v_sum_4dp",
        $"audit1_violations", $"audit2_violations",
        $"main_versions_before_publish", $"published_files",
        $"candidate_paths_purged")
      .orderBy($"user_id", $"period")
    def equivalent = {
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(post.filter(bad)
          .agg(count(lit(1)).as("audit1_violations"))))
        .crossJoin(broadcast(post.filter(!bad)
          .select(($"user_id" % NBuckets).as("b")).distinct
          .agg(count(lit(1)).as("published_files"))))
      shape(pre.unionByName(post.filter(!bad))
        .crossJoin(broadcast(census.select($"audit1_violations",
          lit(0L).as("audit2_violations"),
          lit(1L).as("main_versions_before_publish"),
          $"published_files",
          // the unaudited candidate sweeps as ONE whole version dir
          // (no kept manifest references any of its files)
          lit(1L).as("candidate_paths_purged")))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_wap")
      TxnTable.drop(spark, table)
      val branch = s"$table/branches/audit"
      // main v0: the already-published pre-split state
      val e0 = writeBuckets(pre.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, pre)
      // WRITE: the candidate batch lands on the branch, not on main
      val eC = writeBuckets(post.withColumn("bkt", $"user_id" % NBuckets),
        s"$branch/data/v0", "user_id")
      commitMaybeEmpty(spark, branch, 0, eC, post)
      // AUDIT 1 (against the branch read): rows from the poisoned shard
      val audit1 = TxnTable.read(spark, branch, None).filter(bad).count()
      // FIX: quarantine the poisoned shard's rows, commit branch v1
      val fixed = TxnTable.read(spark, branch, Some(0)).filter(!bad)
      val eF = writeBuckets(fixed.withColumn("bkt", $"user_id" % NBuckets),
        s"$branch/data/v1", "user_id")
      if (eC.isEmpty || eF.isEmpty)
        commitMaybeEmpty(spark, branch, 1, eF, fixed)
      else TxnTable.commitDelta(spark, branch, 1, adds = eF,
        removes = eC.map(_.path))
      // AUDIT 2: the fixed batch is clean
      val audit2 = TxnTable.read(spark, branch, None).filter(bad).count()
      require(audit2 == 0, s"audit still failing after fix: $audit2 rows")
      // ISOLATION receipt: main has NOT seen any of this
      val mainVersionsBefore = TxnTable.versions(spark, table).size.toLong
      // PUBLISH: main v1 references the branch's audited files — no copy
      if (e0.isEmpty || eF.isEmpty) {
        val merged = pre.unionByName(fixed)
        commitMaybeEmpty(spark, table, 1,
          if (eF.isEmpty) Seq.empty else e0 ++ eF, merged)
      } else TxnTable.commitDelta(spark, table, 1, adds = eF)
      // retention on the branch: the unaudited candidate's files are
      // purged; the published files survive (referenced by branch v1)
      val (purged, _) = TxnTable.vacuum(spark, branch, 1)
      shape(TxnTable.read(spark, table, None)
        .withColumn("audit1_violations", lit(audit1))
        .withColumn("audit2_violations", lit(audit2))
        .withColumn("main_versions_before_publish", lit(mainVersionsBefore))
        .withColumn("published_files", lit(eF.size.toLong))
        .withColumn("candidate_paths_purged", lit(purged.toLong)))
    }
  }

  // ---- partition-spec evolution --------------------------------------

  /** PARTITION-SPEC EVOLUTION, graded — the Iceberg contract the other
    * formats lack: v0 lands under spec A (user-range clustering, the
    * right layout for per-user serving), then the table's partition
    * spec CHANGES to by-day for new data (the right layout for
    * time-windowed ingest) — and v1 = the spec-A files CARRIED
    * UNREWRITTEN + the post-split days as one spec-B file per day, the
    * two layouts coexisting in one manifest. The graded query is a
    * 4-day post-split window: every spec-A file prunes on its day zone
    * map (pre-split data can't match), spec-B prunes to exactly the
    * matching days — so the read touches only the new layout while
    * the old data never got rewritten, which is the entire point of
    * spec evolution (a 100 TB re-partition is not a thing you run).
    * Census (total/scanned/skipped + per-spec file counts) and content
    * both re-derived from raw events by the oracle.
    *
    * Scale shape: the spec change is a metadata decision (zero data
    * movement); per-day appends are one filter+write each; pruning is
    * O(files) driver metadata over both specs uniformly — zone maps
    * make the two layouts indistinguishable to the scan planner. */
  def sinkTxnPartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val grid = ev.groupBy($"user_id",
        expr(s"CAST(ts_us DIV $DayUs AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("n_events"),
        (sum($"v") * lit(10000)).cast("long").as("v_sum_4dp"))
    val SplitDay = SplitUs / DayUs
    val (qlo, qhi) = (SplitDay + 2, SplitDay + 5) // the 4-day window
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"day", $"n_events", $"v_sum_4dp",
        $"files_total", $"files_scanned", $"files_skipped",
        $"spec_a_files", $"spec_b_files")
      .orderBy($"user_id", $"day")
    def equivalent = {
      val mxF = grid.filter($"day" < SplitDay).agg(max($"user_id").as("mxu"))
      val specA = grid.filter($"day" < SplitDay).crossJoin(broadcast(mxF))
        .select(expr(s"user_id DIV (mxu DIV $NBuckets + 1)").as("b"))
        .distinct
      val specB = grid.filter($"day" >= SplitDay).select($"day".as("b"))
        .distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(specA.agg(count(lit(1)).as("spec_a_files"))))
        .crossJoin(broadcast(specB.agg(count(lit(1)).as("spec_b_files"))))
        .crossJoin(broadcast(specB
          .filter($"b".between(qlo, qhi))
          .agg(count(lit(1)).as("files_scanned"))))
      shape(grid.filter($"day".between(qlo, qhi))
        .crossJoin(broadcast(census.select(
          ($"spec_a_files" + $"spec_b_files").as("files_total"),
          $"files_scanned",
          ($"spec_a_files" + $"spec_b_files" - $"files_scanned")
            .as("files_skipped"),
          $"spec_a_files", $"spec_b_files"))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_specevo")
      TxnTable.drop(spark, table)
      val preGrid = grid.filter($"day" < SplitDay)
      val mxRow = preGrid.agg(max($"user_id")).collect().head
      val mxu = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val w = mxu / NBuckets + 1
      // spec A: user-range clustering, day zone maps riding along
      val eA = writeBuckets2(preGrid.withColumn("bkt", expr(s"user_id DIV $w")),
        s"$table/data/v0", "user_id", "day")
      commitMaybeEmpty(spark, table, 0, eA, preGrid)
      // SPEC CHANGE (metadata-only): new data partitions by day;
      // spec-A files are carried, never rewritten
      val postGrid = grid.filter($"day" >= SplitDay)
      val eB = writeBuckets2(postGrid.withColumn("bkt", $"day"),
        s"$table/data/v1", "user_id", "day")
      // the spec change itself is metadata-only: v1 = a delta adding
      // the spec-B files; spec-A files ride along unrewritten
      commitCowDelta(spark, table, 1, eA, eB, Seq.empty, eA ++ eB, grid)
      val entries = eA ++ eB
      val scanned = entries.filter(e => e.max2 >= qlo && e.min2 <= qhi)
      val out =
        if (entries.isEmpty) TxnTable.read(spark, table, None)
        else if (scanned.isEmpty) TxnTable.read(spark, table, None).limit(0)
        else spark.read.parquet(TxnTable.fileEntries(spark, table, None)
          .filter(e => e.max2 >= qlo && e.min2 <= qhi).map(_.path): _*)
      shape(out.filter($"day".between(qlo, qhi))
        .withColumn("files_total", lit(entries.size.toLong))
        .withColumn("files_scanned", lit(scanned.size.toLong))
        .withColumn("files_skipped", lit(entries.size.toLong - scanned.size))
        .withColumn("spec_a_files", lit(eA.size.toLong))
        .withColumn("spec_b_files", lit(eB.size.toLong)))
    }
  }

  // ---- merge-on-read UPSERT -------------------------------------------

  /** MERGE-ON-READ UPSERT, graded — the Iceberg-v2 MOR merge / Delta
    * DV-update contract that [[sinkTxnDeleteMor]]'s delete tier can't
    * express: the upsert batch (post-split events of shard
    * `user_id % 64 = 1`) commits as ONE positional delete file
    * addressing the REPLACED rows plus the MERGED batch rows as new
    * clustered files — the existing data files are never rewritten (a
    * trickle of upserts costs O(batch) bytes per commit, not a bucket
    * rewrite). The address is the 3-part (src, b, pos) — writing
    * version, bucket, in-file rank — because equality deletes cannot
    * serve an upsert here: the new files carry the SAME keys the
    * delete names, so the address must be file-complete to kill only
    * the superseded copies (Iceberg scopes positional deletes by file
    * path + sequence number; materializing the writing version in the
    * immutable file is this log's equivalent). Reads from v1 on
    * anti-join the addresses transparently (rows_v1 certifies
    * visibility: replaced keys appear ONCE, merged). OPTIMIZE (v2)
    * folds: rewrites only the batch's bucket footprint from the MOR
    * read, retires the delete file and the MOR files; vacuum purges
    * the superseded v0 buckets and the whole v1 MOR staging; travel to
    * pre-fold versions fails loudly. Census (replaced vs inserted
    * keys, MOR files, fold rewrite/carry split, purge counts) is
    * re-derived from raw events by the oracle.
    *
    * Scale shape: the upsert reads |touched buckets| of the snapshot
    * and writes O(batch) bytes + O(changed-files) manifest; the
    * read-side anti-join touches |outstanding delete addresses| until
    * the fold amortizes it to zero — the GDPR/CDC steady state at
    * 100 TB. */
  def sinkTxnMergeMor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val deltaEv = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 1)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"upsert_users", $"replaced_keys", $"inserted_keys",
        $"mor_files_written", $"rows_v1", $"files_rewritten",
        $"files_carried", $"paths_purged", $"manifests_expired",
        $"expired_travel_fails")
      .orderBy($"user_id")
    def equivalent = {
      val batchU = deltaEv.select($"user_id").distinct
      val preU = pre.select($"user_id").distinct
      val tb = batchU.select(($"user_id" % NBuckets).as("b")).distinct
      val v0b = preU.select(($"user_id" % NBuckets).as("b")).distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(batchU.agg(count(lit(1)).as("upsert_users"))))
        .crossJoin(broadcast(batchU.join(preU, Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("replaced_keys"))))
        .crossJoin(broadcast(tb.agg(count(lit(1)).as("mor_files_written"))))
        .crossJoin(broadcast(preU.unionByName(batchU).distinct()
          .agg(count(lit(1)).as("rows_v1"))))
        .crossJoin(broadcast(v0b.join(tb, Seq("b"), "left_anti")
          .agg(count(lit(1)).as("files_carried"))))
        .crossJoin(broadcast(tb.join(v0b, Seq("b"), "left_semi")
          .agg(count(lit(1)).as("tb_in_v0"))))
      shape(state(pre.unionByName(deltaEv))
        .crossJoin(broadcast(census.select($"upsert_users", $"replaced_keys",
          ($"upsert_users" - $"replaced_keys").as("inserted_keys"),
          $"mor_files_written", $"rows_v1",
          $"mor_files_written".as("files_rewritten"), $"files_carried",
          ($"tb_in_v0" + 1L).as("paths_purged"))))
        .withColumn("manifests_expired", lit(2L))
        .withColumn("expired_travel_fails", lit(1L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_mor_merge")
      TxnTable.drop(spark, table)
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy($"bkt").orderBy($"user_id")
      def addressed(df: DataFrame, src: Long): DataFrame = df
        .withColumn("bkt", $"user_id" % NBuckets)
        .withColumn("b", $"user_id" % NBuckets)
        .withColumn("src", lit(src))
        .withColumn("pos", row_number().over(wPos).cast("long"))
      val st0 = state(pre)
      val e0 = writeBuckets(addressed(st0, 0L), s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, addressed(st0, 0L).drop("bkt"))
      val deltaSt = state(deltaEv)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val batchKeys = deltaSt.select($"user_id")
      // resolve the replaced rows' physical addresses from the snapshot
      val prevBatch = TxnTable.read(spark, table, Some(0))
        .join(batchKeys, Seq("user_id"), "left_semi")
      val dvPath = s"$table/data/v1/dv"
      val dvRows = prevBatch.select($"src", $"b", $"pos")
      dvRows.coalesce(1).write.mode("overwrite").parquet(dvPath)
      val replaced = dvRows.count()
      val merged = prevBatch
        .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp")
        .unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val e1 = writeBuckets(addressed(merged, 1L), s"$table/data/v1/rows",
        "user_id")
      val degenerate = e0.isEmpty || e1.isEmpty
      if (degenerate)
        TxnTable.commit(spark, table, 1,
          addressed(state(pre.unionByName(deltaEv)), 1L).drop("bkt"))
      else TxnTable.commitDelta(spark, table, 1, adds = e1,
        delAdds = Seq(TxnTable.DeleteFile(dvPath, "src,b,pos")))
      val rowsV1 = TxnTable.read(spark, table, Some(1)).count()
      // OPTIMIZE fold: rewrite only the batch's bucket footprint from
      // the MOR read; retire the delete file and the MOR files
      val foldSrc = TxnTable.read(spark, table, Some(1))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
        .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp")
      val e2 = writeBuckets(addressed(foldSrc, 2L), s"$table/data/v2",
        "user_id")
      if (degenerate)
        TxnTable.commit(spark, table, 2,
          addressed(state(pre.unionByName(deltaEv)), 2L).drop("bkt"))
      else TxnTable.commitDelta(spark, table, 2, adds = e2,
        removes = e0.filter(e => touched.contains(e.bucket)).map(_.path)
          ++ e1.map(_.path),
        delRemoves = Seq(dvPath))
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      val (purged, expired) = TxnTable.vacuum(spark, table, 1)
      val travelFails =
        try { TxnTable.read(spark, table, Some(1)); 0L }
        catch { case _: IllegalArgumentException => 1L }
      val upsertUsers = deltaSt.count()
      shape(TxnTable.read(spark, table, None)
        .withColumn("upsert_users", lit(upsertUsers))
        .withColumn("replaced_keys", lit(replaced))
        .withColumn("inserted_keys", lit(upsertUsers - replaced))
        .withColumn("mor_files_written", lit(e1.size.toLong))
        .withColumn("rows_v1", lit(rowsV1))
        .withColumn("files_rewritten", lit(e2.size.toLong))
        .withColumn("files_carried", lit(carried.size.toLong))
        .withColumn("paths_purged", lit(purged.toLong))
        .withColumn("manifests_expired", lit(expired.toLong))
        .withColumn("expired_travel_fails", lit(travelFails)))
    }
  }

  // ---- row lineage across COW rewrites ---------------------------------

  /** ROW LINEAGE across a COW rewrite, graded — the Iceberg-v3 row
    * lineage contract (row_id + last_updated_sequence_number): every
    * row carries (first_commit, last_modified), and the subtlety the
    * grading targets is that lineage is ROW-level, not file-level — a
    * COW merge rewrites every row of a touched bucket, but only rows
    * whose CONTENT changed may advance `last_modified`; an innocent
    * bystander row that was physically rewritten into a new file keeps
    * its original lineage (without this rule, CDC consumers reading
    * "what changed since v0" would re-process whole buckets). v0 =
    * the pre-split state (lineage (0,0)); v1 = the COW merge of shard
    * `user_id % 64 = 2`'s post-split backfill — updated rows keep
    * first_commit = 0 and advance last_modified = 1, NEW users enter
    * with (1,1), bystanders in rewritten buckets stay (0,0). The
    * graded frame is the post-merge read with both lineage columns +
    * the created/updated/rewritten/carried census, all re-derived from
    * raw events by the oracle.
    *
    * Scale shape: identical to the COW merge (≤16-row file planning,
    * touched-bucket rewrite, carry by reference); lineage adds two
    * BIGINT columns and zero extra passes — the full-outer merge
    * computes them in the same join. */
  def sinkTxnRowLineage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 2)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"first_commit", $"last_modified",
        $"rows_created", $"rows_updated", $"files_rewritten",
        $"files_carried")
      .orderBy($"user_id")
    def equivalent = {
      val batchU = delta.select($"user_id").distinct
      val preU = pre.select($"user_id").distinct
      val tb = batchU.select(($"user_id" % NBuckets).as("b")).distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(batchU.join(preU, Seq("user_id"), "left_anti")
          .agg(count(lit(1)).as("rows_created"))))
        .crossJoin(broadcast(batchU.join(preU, Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("rows_updated"))))
        .crossJoin(broadcast(tb.agg(count(lit(1)).as("files_rewritten"))))
        .crossJoin(broadcast(
          preU.select(($"user_id" % NBuckets).as("b")).distinct
            .join(tb, Seq("b"), "left_anti")
            .agg(count(lit(1)).as("files_carried"))))
      shape(state(pre.unionByName(delta))
        .join(preU.withColumn("had_pre", lit(1L)), Seq("user_id"), "left")
        .join(batchU.withColumn("in_batch", lit(1L)), Seq("user_id"), "left")
        .withColumn("first_commit",
          when($"had_pre".isNull, 1L).otherwise(0L))
        .withColumn("last_modified",
          when($"in_batch".isNotNull, 1L).otherwise(0L))
        .crossJoin(broadcast(census.select($"rows_created", $"rows_updated",
          $"files_rewritten", $"files_carried"))))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_lineage")
      TxnTable.drop(spark, table)
      val st0 = state(pre)
        .withColumn("first_commit", lit(0L))
        .withColumn("last_modified", lit(0L))
      val e0 = writeBuckets(st0.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st0)
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      // row-level lineage through the full-outer merge: updated rows
      // keep first_commit and advance last_modified; bystanders of the
      // rewritten buckets pass through with lineage UNTOUCHED
      val d = deltaSt.select($"user_id", $"n_events".as("d_n"),
        $"last_us".as("d_last"), $"v_sum_4dp".as("d_v"))
      val merged = prevTouched.join(d, Seq("user_id"), "full_outer")
        .select($"user_id",
          (coalesce($"n_events", lit(0L)) + coalesce($"d_n", lit(0L)))
            .as("n_events"),
          greatest(coalesce($"last_us", lit(Long.MinValue)),
            coalesce($"d_last", lit(Long.MinValue))).as("last_us"),
          (coalesce($"v_sum_4dp", lit(0L)) + coalesce($"d_v", lit(0L)))
            .as("v_sum_4dp"),
          when($"first_commit".isNull, 1L).otherwise($"first_commit")
            .as("first_commit"),
          when($"d_n".isNotNull, 1L).otherwise($"last_modified")
            .as("last_modified"))
      val e1 = writeBuckets(merged.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      val created = deltaSt.join(st0.select($"user_id"), Seq("user_id"),
        "left_anti").count()
      val updated = deltaSt.count() - created
      shape(TxnTable.read(spark, table, None)
        .withColumn("rows_created", lit(created))
        .withColumn("rows_updated", lit(updated))
        .withColumn("files_rewritten", lit(e1.size.toLong))
        .withColumn("files_carried", lit(carried.size.toLong)))
    }
  }

  // ---- RESTORE: metadata-only rollback --------------------------------

  /** RESTORE TABLE TO VERSION, graded — Delta's RESTORE / Iceberg's
    * rollback-to-snapshot: after a COW merge (v1, a one-shard backfill
    * `user_id % 64 = 10`) proves regrettable, v2 makes the table serve
    * v0's EXACT state again by committing a delta manifest that
    * RE-REFERENCES v0's superseded files (adds = the files v1 had
    * replaced, removes = v1's rewrites) — ZERO data I/O, and HISTORY
    * IS PRESERVED: v1 still time-travels, because a restore is a new
    * commit, not an erasure (audit trails survive; the undo of an undo
    * stays possible). The graded frame is the post-restore latest read
    * — it must hash-equal the v0 state, the only proof that matters —
    * plus the census: log version count, files re-referenced vs
    * removed by the restore, data files WRITTEN by the restore (zero,
    * the headline), and v1's surviving row count read back through
    * time travel. Every census number re-derived from raw events by
    * the oracle.
    *
    * Scale shape: un-shipping a bad deploy against a 100 TB table
    * costs O(touched-files) manifest bytes — no data rewrite, no
    * backup copy-back; exactly why the formats keep superseded files
    * referenced-but-inactive until vacuum. */
  def sinkTxnRestore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = evUsers(spark, dir)
    val pre = ev.filter($"ts_us" < SplitUs)
    val delta = ev.filter($"ts_us" >= SplitUs && $"user_id" % 64 === 10)
    def shape(df: DataFrame): DataFrame = df
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp",
        $"versions", $"files_readded", $"files_removed",
        $"restore_files_written", $"rows_v1")
      .orderBy($"user_id")
    def equivalent = {
      val touchedB = delta.select(($"user_id" % NBuckets).as("b")).distinct
      val preB = pre.select(($"user_id" % NBuckets).as("b")).distinct
      val census = Seq(1).toDF("one")
        .crossJoin(broadcast(touchedB.join(preB, Seq("b"), "left_semi")
          .agg(count(lit(1)).as("files_readded"))))
        .crossJoin(broadcast(touchedB.agg(count(lit(1)).as("files_removed"))))
        .crossJoin(broadcast(
          pre.select($"user_id").unionByName(delta.select($"user_id"))
            .agg(countDistinct($"user_id").as("rows_v1"))))
      shape(state(pre)
        .crossJoin(broadcast(census.select($"files_readded",
          $"files_removed", $"rows_v1")))
        .withColumn("versions", lit(3L))
        .withColumn("restore_files_written", lit(0L)))
    }
    graft.PlanOnly.roundTrip(equivalent) {
      val table = Tables.scratch("txn_restore")
      TxnTable.drop(spark, table)
      val st0 = state(pre)
      val e0 = writeBuckets(st0.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v0", "user_id")
      commitMaybeEmpty(spark, table, 0, e0, st0)
      val deltaSt = state(delta)
      val touched = deltaSt.select(($"user_id" % NBuckets).as("b"))
        .distinct.collect().map(_.getLong(0)).toSet // file planning
      val prevTouched = TxnTable.read(spark, table, Some(0))
        .filter(($"user_id" % NBuckets).isin(touched.toSeq: _*))
      val merged = prevTouched.unionByName(deltaSt).groupBy($"user_id")
        .agg(sum($"n_events").as("n_events"), max($"last_us").as("last_us"),
          sum($"v_sum_4dp").as("v_sum_4dp"))
      val e1 = writeBuckets(merged.withColumn("bkt", $"user_id" % NBuckets),
        s"$table/data/v1", "user_id")
      val carried = e0.filterNot(e => touched.contains(e.bucket))
      commitCowDelta(spark, table, 1, e0, e1,
        e0.filter(e => touched.contains(e.bucket)).map(_.path),
        e1 ++ carried, merged)
      // RESTORE to v0: re-reference the superseded files, remove v1's
      // rewrites — a pure manifest delta, zero data bytes written
      val readds = e0.filter(e => touched.contains(e.bucket))
      if (e0.isEmpty || (e1 ++ carried).isEmpty)
        TxnTable.commit(spark, table, 2, st0)
      else TxnTable.commitDelta(spark, table, 2, adds = readds,
        removes = e1.map(_.path))
      val rowsV1 = TxnTable.read(spark, table, Some(1)).count()
      shape(TxnTable.read(spark, table, None)
        .withColumn("versions", lit(TxnTable.versions(spark, table).size.toLong))
        .withColumn("files_readded", lit(readds.size.toLong))
        .withColumn("files_removed", lit(e1.size.toLong))
        .withColumn("restore_files_written", lit(0L))
        .withColumn("rows_v1", lit(rowsV1)))
    }
  }

  val queries: Map[String, QueryFn] = Map(
    "sink_txn_ndv_stats" -> (sinkTxnNdvStats(_, _)),
    "sink_txn_cbo_estimate" -> (sinkTxnCboEstimate(_, _)),
    "sink_txn_cbo_choose" -> (sinkTxnCboChoose(_, _)),
    "sink_txn_cbo_join_order" -> (sinkTxnCboJoinOrder(_, _)),
    "sink_txn_hist_selectivity" -> (sinkTxnHistSelectivity(_, _)),
    "sink_txn_hist_maintain" -> (sinkTxnHistMaintain(_, _)),
    "sink_txn_hist_decide" -> (sinkTxnHistDecide(_, _)),
    "sink_txn_hist_stale" -> (sinkTxnHistStale(_, _)),
    "sink_txn_cbo_skew_salt" -> (sinkTxnCboSkewSalt(_, _)),
    "sink_txn_hh_maintain" -> (sinkTxnHhMaintain(_, _)),
    "sink_txn_bucket_prune" -> (sinkTxnBucketPrune(_, _)),
    "sink_txn_smb_merge" -> (sinkTxnSmbMerge(_, _)),
    "sink_txn_smb_coalesce" -> (sinkTxnSmbCoalesce(_, _)),
    "sink_txn_restore" -> (sinkTxnRestore(_, _)),
    "sink_txn_merge_mor" -> (sinkTxnMergeMor(_, _)),
    "sink_txn_row_lineage" -> (sinkTxnRowLineage(_, _)),
    "sink_txn_merge_cow" -> (sinkTxnMergeCow(_, _)),
    "sink_txn_history_audit" -> (sinkTxnHistoryAudit(_, _)),
    "sink_txn_delete_cow" -> (sinkTxnDeleteCow(_, _)),
    "sink_txn_delete_mor" -> (sinkTxnDeleteMor(_, _)),
    "sink_txn_delete_dv" -> (sinkTxnDeleteDv(_, _)),
    "sink_txn_wap_publish" -> (sinkTxnWapPublish(_, _)),
    "sink_txn_clone_shallow" -> (sinkTxnCloneShallow(_, _)),
    "sink_txn_data_skipping" -> (sinkTxnDataSkipping(_, _)),
    "sink_txn_column_stats" -> (sinkTxnColumnStats(_, _)),
    "sink_txn_stats_maintain" -> (sinkTxnStatsMaintain(_, _)),
    "sink_txn_stats_serve" -> (sinkTxnStatsServe(_, _)),
    "sink_txn_bloom_skip" -> (sinkTxnBloomSkip(_, _)),
    "sink_txn_compact_binpack" -> (sinkTxnCompactBinpack(_, _)),
    "sink_txn_zorder_skip" -> (sinkTxnZorderSkip(_, _)),
    "sink_txn_partition_evolution" -> (sinkTxnPartitionEvolution(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // the whole NDV pipeline re-derived from raw events: per-user
    // state, per-bucket distinct values, replayable KMV hashes, the
    // per-file top-16 samples, and the lossless top-16-of-samples merge
    "sink_txn_ndv_stats" ->
      """WITH e AS (SELECT user_id FROM events),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY 1),
        |vals AS (
        |  SELECT user_id % 8 AS bkt, 'n_events' AS col, n_events AS v
        |    FROM st
        |  UNION ALL
        |  SELECT user_id % 8 AS bkt, 'user_id' AS col, user_id AS v
        |    FROM st),
        |dv AS (SELECT DISTINCT bkt, col, v FROM vals),
        |hs AS (SELECT bkt, col,
        |    ((v + 1) * 2654435761) % 2147483647 AS h FROM dv),
        |samp AS (SELECT bkt, col, h FROM (SELECT bkt, col, h,
        |    row_number() OVER (PARTITION BY bkt, col ORDER BY h) AS rn
        |  FROM hs) WHERE rn <= 16),
        |perfile AS (SELECT bkt, col, CAST(count(*) AS BIGINT) AS n_sample,
        |    CAST(max(h) AS BIGINT) AS theta FROM samp GROUP BY 1, 2),
        |mh AS (SELECT DISTINCT col, h FROM samp),
        |mg AS (SELECT col, h FROM (SELECT col, h,
        |    row_number() OVER (PARTITION BY col ORDER BY h) AS rn
        |  FROM mh) WHERE rn <= 16),
        |merged AS (SELECT CAST(-1 AS BIGINT) AS bkt, col,
        |    CAST(count(*) AS BIGINT) AS n_sample,
        |    CAST(max(h) AS BIGINT) AS theta FROM mg GROUP BY col),
        |allr AS (SELECT * FROM perfile UNION ALL SELECT * FROM merged)
        |SELECT CAST(bkt AS BIGINT) AS bkt, col, n_sample, theta,
        |  CAST(CASE WHEN n_sample < 16 THEN n_sample
        |    ELSE 32212254705 // theta END AS BIGINT) AS ndv_est
        |FROM allr ORDER BY col, bkt""".stripMargin,
    // the whole estimation pipeline re-derived: user sets, the four
    // ≤64-hash KMV samples, the textbook r_a·r_b/max(ndv) estimate,
    // and the exact semi-join truths
    "sink_txn_cbo_estimate" ->
      """WITH e AS (SELECT user_id, event_type FROM events),
        |ua AS (SELECT DISTINCT user_id FROM e),
        |st AS (SELECT user_id, count(*) AS n FROM e GROUP BY 1),
        |m AS (SELECT count(*) AS u, sum(n) AS tot FROM st),
        |uact AS (SELECT user_id FROM st, m WHERE n * u * 10 > tot * 11),
        |bpr AS (SELECT user_id FROM e WHERE event_type = 'purchase'),
        |bcl AS (SELECT user_id FROM e WHERE event_type = 'click'),
        |hall AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM ua ORDER BY h LIMIT 64),
        |hact AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM uact ORDER BY h LIMIT 64),
        |hpur AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM (SELECT DISTINCT user_id FROM bpr) ORDER BY h LIMIT 64),
        |hclk AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM (SELECT DISTINCT user_id FROM bcl) ORDER BY h LIMIT 64),
        |sc AS (
        |  SELECT 'active_x_purchase' AS scenario,
        |    (SELECT count(*) FROM uact) AS r_a,
        |    (SELECT count(*) FROM bpr) AS r_b,
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hact) AS ndv_a,
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hpur) AS ndv_b,
        |    (SELECT count(*) FROM bpr
        |      WHERE user_id IN (SELECT user_id FROM uact)) AS true_rows
        |  UNION ALL
        |  SELECT 'all_x_click',
        |    (SELECT count(*) FROM ua), (SELECT count(*) FROM bcl),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hall),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hclk),
        |    (SELECT count(*) FROM bcl
        |      WHERE user_id IN (SELECT user_id FROM ua))
        |  UNION ALL
        |  SELECT 'all_x_purchase',
        |    (SELECT count(*) FROM ua), (SELECT count(*) FROM bpr),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hall),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM hpur),
        |    (SELECT count(*) FROM bpr
        |      WHERE user_id IN (SELECT user_id FROM ua))),
        |est AS (SELECT scenario, r_a, r_b, ndv_a, ndv_b, true_rows,
        |    CASE WHEN greatest(ndv_a, ndv_b) > 0
        |      THEN (r_a * r_b) // greatest(ndv_a, ndv_b) ELSE 0 END
        |      AS est_rows
        |  FROM sc)
        |SELECT scenario, CAST(r_a AS BIGINT) AS r_a,
        |  CAST(r_b AS BIGINT) AS r_b, CAST(ndv_a AS BIGINT) AS ndv_a,
        |  CAST(ndv_b AS BIGINT) AS ndv_b,
        |  CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(true_rows AS BIGINT) AS true_rows,
        |  CAST(CASE WHEN true_rows > 0
        |    THEN (est_rows * 1048576) // true_rows ELSE -1 END AS BIGINT)
        |    AS ratio_fp
        |FROM est ORDER BY scenario""".stripMargin,
    // merged v1 ≡ the per-user state over ALL events (pre-fold ⊕
    // post-fold telescopes); the layout receipt is the staged spec
    "sink_txn_smb_merge" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us,
        |  CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  CAST(8 AS BIGINT) AS bucket_count,
        |  CAST(1 AS BIGINT) AS layout_match
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the probed rows re-derived: the 5-smallest-user panel and their
    // per-user state; the receipt constants are the staged layout
    "sink_txn_bucket_prune" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e GROUP BY user_id),
        |panel AS (SELECT user_id FROM st ORDER BY user_id LIMIT 5),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM panel)
        |SELECT st.user_id, st.n_events, st.last_us, st.v_sum_4dp,
        |  CAST(8 AS BIGINT) AS buckets_total,
        |  (SELECT n_probes FROM np) AS n_probes
        |FROM st JOIN panel ON st.user_id = panel.user_id
        |ORDER BY st.user_id""".stripMargin,
    // the histogram pipeline re-derived: per-file equi-width buckets,
    // whole interior buckets + linearly interpolated edges (one
    // truncating division per (file, bucket)), exact truths, and the
    // bkt = -1 rollup
    "sink_txn_hist_selectivity" ->
      """WITH e AS (SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |st AS (SELECT user_id, user_id % 8 AS bkt,
        |    CAST(sum(v) * 10000 AS BIGINT) AS vs
        |  FROM e GROUP BY user_id),
        |b AS (SELECT coalesce(min(vs), 0) AS mn,
        |    coalesce(max(vs), 0) AS mx FROM st),
        |p AS (SELECT mn, mx, ((mx - mn) // 16) + 1 AS w,
        |    mn + ((mx - mn) * 3) // 10 AS lo,
        |    mn + ((mx - mn) * 9) // 20 AS hi FROM b),
        |side AS (SELECT bkt, (vs - mn) // w AS hb, count(*) AS cnt
        |  FROM st, p GROUP BY 1, 2),
        |ovs AS (SELECT s.bkt, s.cnt, p.w,
        |    greatest(0, least(p.hi, p.mn + (s.hb + 1) * p.w - 1)
        |      - greatest(p.lo, p.mn + s.hb * p.w) + 1) AS ov
        |  FROM side s, p),
        |est AS (SELECT bkt, CAST(sum((cnt * ov) // w) AS BIGINT)
        |    AS est_rows FROM ovs GROUP BY bkt),
        |tru AS (SELECT bkt, CAST(count(*) AS BIGINT) AS true_rows
        |  FROM st, p WHERE vs BETWEEN lo AND hi GROUP BY bkt),
        |pf AS (SELECT coalesce(est.bkt, tru.bkt) AS bkt,
        |    coalesce(est_rows, 0) AS est_rows,
        |    coalesce(true_rows, 0) AS true_rows
        |  FROM est FULL JOIN tru ON est.bkt = tru.bkt),
        |allr AS (SELECT * FROM pf
        |  UNION ALL SELECT -1,
        |    coalesce((SELECT sum(est_rows) FROM pf), 0),
        |    coalesce((SELECT sum(true_rows) FROM pf), 0))
        |SELECT CAST(bkt AS BIGINT) AS bkt,
        |  CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(true_rows AS BIGINT) AS true_rows,
        |  CAST(CASE WHEN true_rows > 0
        |    THEN (est_rows * 1048576) // true_rows ELSE -1 END
        |    AS BIGINT) AS ratio_fp
        |FROM allr ORDER BY bkt""".stripMargin,
    // heterogeneous-grid maintenance re-derived: per-file write-time
    // grids over the MERGED state (carried files' data is untouched,
    // so their v0 grids equal a recompute), the sidecar-folded band,
    // per-file interpolation on each file's OWN grid, the cross-grid
    // rollup, and the rewritten footprint from the delta slice
    "sink_txn_hist_maintain" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |m AS (SELECT * FROM e WHERE user_id % 64 = 3
        |  UNION ALL
        |  SELECT * FROM e WHERE user_id % 64 <> 3
        |    AND ts_us < CAST(19740 AS BIGINT) * 86400000000),
        |st AS (SELECT user_id % 8 AS bkt,
        |    CAST(sum(v) * 10000 AS BIGINT) AS vs
        |  FROM m GROUP BY user_id),
        |pb AS (SELECT bkt, min(vs) AS mn, max(vs) AS mx,
        |    ((max(vs) - min(vs)) // 16) + 1 AS w
        |  FROM st GROUP BY bkt),
        |g AS (SELECT coalesce(min(mn), 0) AS gmn,
        |    coalesce(max(mx), 0) AS gmx FROM pb),
        |p AS (SELECT gmn, gmx,
        |    gmn + ((gmx - gmn) * 3) // 10 AS lo,
        |    gmn + ((gmx - gmn) * 9) // 20 AS hi FROM g),
        |side AS (SELECT st.bkt, (vs - mn) // w AS hb,
        |    count(*) AS cnt, mn, mx, w
        |  FROM st JOIN pb USING (bkt) GROUP BY 1, 2, 4, 5, 6),
        |ovs AS (SELECT s.bkt, s.cnt, s.w,
        |    greatest(0, least(p.hi, s.mn + (s.hb + 1) * s.w - 1)
        |      - greatest(p.lo, s.mn + s.hb * s.w) + 1) AS ov
        |  FROM side s, p),
        |est AS (SELECT bkt, CAST(sum((cnt * ov) // w) AS BIGINT)
        |    AS est_rows FROM ovs GROUP BY bkt),
        |tru AS (SELECT bkt, CAST(count(*) AS BIGINT) AS true_rows
        |  FROM st, p WHERE vs BETWEEN lo AND hi GROUP BY bkt),
        |tc AS (SELECT DISTINCT user_id % 8 AS bkt FROM e
        |  WHERE ts_us >= CAST(19740 AS BIGINT) * 86400000000
        |    AND user_id % 64 = 3),
        |pf AS (SELECT pb.bkt, pb.mn, pb.mx, pb.w,
        |    coalesce(est.est_rows, 0) AS est_rows,
        |    coalesce(tru.true_rows, 0) AS true_rows,
        |    CAST(CASE WHEN tc.bkt IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |      AS rewritten
        |  FROM pb LEFT JOIN est ON pb.bkt = est.bkt
        |  LEFT JOIN tru ON pb.bkt = tru.bkt
        |  LEFT JOIN tc ON pb.bkt = tc.bkt),
        |allr AS (SELECT * FROM pf
        |  UNION ALL SELECT -1, p.gmn, p.gmx, -1,
        |    coalesce((SELECT sum(est_rows) FROM pf), 0),
        |    coalesce((SELECT sum(true_rows) FROM pf), 0), -1 FROM p)
        |SELECT CAST(bkt AS BIGINT) AS bkt, CAST(mn AS BIGINT) AS mn,
        |  CAST(mx AS BIGINT) AS mx, CAST(w AS BIGINT) AS w,
        |  CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(true_rows AS BIGINT) AS true_rows,
        |  CAST(CASE WHEN true_rows > 0
        |    THEN (est_rows * 1048576) // true_rows ELSE -1 END
        |    AS BIGINT) AS ratio_fp,
        |  CAST(rewritten AS BIGINT) AS rewritten
        |FROM allr ORDER BY bkt""".stripMargin,
    // the stale-vs-maintained confrontation re-derived: both sidecars'
    // grids and counts, the maintained-fold band, both interpolated
    // estimates, the exact truth, and the rewritten footprint
    "sink_txn_hist_stale" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |m AS (SELECT * FROM e WHERE user_id % 64 = 3
        |  UNION ALL
        |  SELECT * FROM e WHERE user_id % 64 <> 3
        |    AND ts_us < CAST(19740 AS BIGINT) * 86400000000),
        |st1 AS (SELECT user_id % 8 AS bkt,
        |    CAST(sum(v) * 10000 AS BIGINT) AS vs
        |  FROM m GROUP BY user_id),
        |st0 AS (SELECT user_id % 8 AS bkt,
        |    CAST(sum(v) * 10000 AS BIGINT) AS vs
        |  FROM e WHERE ts_us < CAST(19740 AS BIGINT) * 86400000000
        |  GROUP BY user_id),
        |pb1 AS (SELECT bkt, min(vs) AS mn, max(vs) AS mx,
        |    ((max(vs) - min(vs)) // 16) + 1 AS w FROM st1 GROUP BY bkt),
        |pb0 AS (SELECT bkt, min(vs) AS mn, max(vs) AS mx,
        |    ((max(vs) - min(vs)) // 16) + 1 AS w FROM st0 GROUP BY bkt),
        |g AS (SELECT coalesce(min(mn), 0) AS gmn,
        |    coalesce(max(mx), 0) AS gmx FROM pb1),
        |p AS (SELECT gmn + ((gmx - gmn) * 3) // 10 AS lo,
        |    gmn + ((gmx - gmn) * 9) // 20 AS hi FROM g),
        |side1 AS (SELECT st1.bkt, (vs - mn) // w AS hb,
        |    count(*) AS cnt, mn, w
        |  FROM st1 JOIN pb1 USING (bkt) GROUP BY 1, 2, 4, 5),
        |side0 AS (SELECT st0.bkt, (vs - mn) // w AS hb,
        |    count(*) AS cnt, mn, w
        |  FROM st0 JOIN pb0 USING (bkt) GROUP BY 1, 2, 4, 5),
        |est1 AS (SELECT bkt, CAST(sum((cnt * greatest(0,
        |      least(p.hi, mn + (hb + 1) * w - 1)
        |      - greatest(p.lo, mn + hb * w) + 1)) // w) AS BIGINT)
        |    AS est_maint FROM side1, p GROUP BY bkt),
        |est0 AS (SELECT bkt, CAST(sum((cnt * greatest(0,
        |      least(p.hi, mn + (hb + 1) * w - 1)
        |      - greatest(p.lo, mn + hb * w) + 1)) // w) AS BIGINT)
        |    AS est_stale FROM side0, p GROUP BY bkt),
        |tru AS (SELECT bkt, CAST(count(*) AS BIGINT) AS true_rows
        |  FROM st1, p WHERE vs BETWEEN lo AND hi GROUP BY bkt),
        |tc AS (SELECT DISTINCT user_id % 8 AS bkt FROM e
        |  WHERE ts_us >= CAST(19740 AS BIGINT) * 86400000000
        |    AND user_id % 64 = 3),
        |pf AS (SELECT e1.bkt,
        |    coalesce(e0.est_stale, 0) AS est_stale, e1.est_maint,
        |    coalesce(tru.true_rows, 0) AS true_rows,
        |    CAST(CASE WHEN tc.bkt IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |      AS rewritten
        |  FROM est1 e1 LEFT JOIN est0 e0 ON e1.bkt = e0.bkt
        |  LEFT JOIN tru ON e1.bkt = tru.bkt
        |  LEFT JOIN tc ON e1.bkt = tc.bkt),
        |allr AS (SELECT * FROM pf
        |  UNION ALL SELECT -1,
        |    coalesce((SELECT sum(est_stale) FROM pf), 0),
        |    coalesce((SELECT sum(est_maint) FROM pf), 0),
        |    coalesce((SELECT sum(true_rows) FROM pf), 0), -1)
        |SELECT CAST(bkt AS BIGINT) AS bkt,
        |  CAST(est_stale AS BIGINT) AS est_stale,
        |  CAST(est_maint AS BIGINT) AS est_maint,
        |  CAST(true_rows AS BIGINT) AS true_rows,
        |  CAST(CASE WHEN true_rows > 0
        |    THEN (est_stale * 1048576) // true_rows ELSE -1 END
        |    AS BIGINT) AS ratio_stale_fp,
        |  CAST(CASE WHEN true_rows > 0
        |    THEN (est_maint * 1048576) // true_rows ELSE -1 END
        |    AS BIGINT) AS ratio_maint_fp,
        |  CAST(rewritten AS BIGINT) AS rewritten
        |FROM allr ORDER BY bkt""".stripMargin,
    // the lossy top-8 fold replayed: pre/delta capped lists, the
    // sum-shared-keys + re-rank + re-cap merge, the exact rebuild, and
    // the decision consequence from both
    "sink_txn_hh_maintain" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |pre AS (SELECT * FROM e
        |  WHERE t < CAST(19740 AS BIGINT) * 86400000000),
        |del AS (SELECT * FROM e
        |  WHERE t >= CAST(19740 AS BIGINT) * 86400000000),
        |ptop AS (SELECT user_id, cnt FROM (
        |    SELECT user_id, count(*) AS cnt, row_number() OVER (
        |      ORDER BY count(*) DESC, user_id) AS rn
        |    FROM pre GROUP BY user_id) WHERE rn <= 8),
        |dtop AS (SELECT user_id, cnt FROM (
        |    SELECT user_id, count(*) AS cnt, row_number() OVER (
        |      ORDER BY count(*) DESC, user_id) AS rn
        |    FROM del GROUP BY user_id) WHERE rn <= 8),
        |maint AS (SELECT user_id, cnt, CAST(rn AS BIGINT) AS rank FROM (
        |    SELECT user_id, CAST(sum(cnt) AS BIGINT) AS cnt,
        |      row_number() OVER (
        |        ORDER BY sum(cnt) DESC, user_id) AS rn
        |    FROM (SELECT * FROM ptop UNION ALL SELECT * FROM dtop)
        |    GROUP BY user_id) WHERE rn <= 8),
        |true8 AS (SELECT user_id, cnt, CAST(rn AS BIGINT) AS rank FROM (
        |    SELECT user_id, count(*) AS cnt, row_number() OVER (
        |      ORDER BY count(*) DESC, user_id) AS rn
        |    FROM e GROUP BY user_id) WHERE rn <= 8),
        |dec AS (SELECT
        |    (SELECT count(*) FROM pre) + (SELECT count(*) FROM del)
        |      AS est_total,
        |    (SELECT count(*) FROM e) AS true_total,
        |    coalesce((SELECT cnt FROM maint WHERE rank = 1), 0)
        |      AS est_max,
        |    coalesce((SELECT cnt FROM true8 WHERE rank = 1), 0)
        |      AS true_max)
        |SELECT coalesce(ma.rank, t8.rank) AS rank,
        |  coalesce(ma.user_id, -1) AS est_user_id,
        |  coalesce(ma.cnt, -1) AS est_cnt,
        |  coalesce(t8.user_id, -1) AS true_user_id,
        |  coalesce(t8.cnt, -1) AS true_cnt,
        |  CAST(CASE WHEN coalesce(ma.user_id, -1)
        |    = coalesce(t8.user_id, -2) THEN 1 ELSE 0 END AS BIGINT)
        |    AS user_match,
        |  CAST(CASE WHEN coalesce(ma.user_id, -1)
        |    = coalesce(t8.user_id, -2)
        |    THEN t8.cnt - ma.cnt ELSE -1 END AS BIGINT) AS undercount,
        |  CAST(est_total AS BIGINT) AS est_total,
        |  CAST(true_total AS BIGINT) AS true_total,
        |  CAST(CASE WHEN est_total > 0 AND est_max * 8 > est_total
        |    THEN 1 ELSE 0 END AS BIGINT) AS salted_est,
        |  CAST(CASE WHEN true_max * 8 > true_total
        |    THEN 1 ELSE 0 END AS BIGINT) AS salted_true,
        |  CAST(CASE WHEN (CASE WHEN est_total > 0
        |      AND est_max * 8 > est_total THEN 1 ELSE 0 END)
        |    <> (CASE WHEN true_max * 8 > true_total THEN 1 ELSE 0 END)
        |    THEN 1 ELSE 0 END AS BIGINT) AS flipped
        |FROM maint ma FULL JOIN true8 t8 ON ma.rank = t8.rank, dec
        |ORDER BY rank""".stripMargin,
    // the skew decision re-derived: pre-split heavy-hitter max/total
    // (= the committed top-8 sidecar's content), the 1/8-budget
    // decision, full-fact truths, and the strategy-independent join
    // census (dim = the fact's own key domain, so every row matches)
    "sink_txn_cbo_skew_salt" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS t FROM events),
        |pre AS (SELECT * FROM e
        |  WHERE t < CAST(19740 AS BIGINT) * 86400000000),
        |scen AS (
        |  SELECT 'type_key' AS scenario,
        |    coalesce((SELECT max(c) FROM (SELECT count(*) AS c
        |      FROM pre GROUP BY event_type)), 0) AS est_max_cnt,
        |    (SELECT count(*) FROM pre) AS est_total,
        |    coalesce((SELECT max(c) FROM (SELECT count(*) AS c
        |      FROM e GROUP BY event_type)), 0) AS true_max_cnt,
        |    (SELECT count(*) FROM e) AS r_fact,
        |    coalesce((SELECT sum(event_id) FROM e), 0) AS join_sum
        |  UNION ALL
        |  SELECT 'user_key',
        |    coalesce((SELECT max(c) FROM (SELECT count(*) AS c FROM pre
        |      WHERE event_type = 'purchase' GROUP BY user_id)), 0),
        |    (SELECT count(*) FROM pre WHERE event_type = 'purchase'),
        |    coalesce((SELECT max(c) FROM (SELECT count(*) AS c FROM e
        |      WHERE event_type = 'purchase' GROUP BY user_id)), 0),
        |    (SELECT count(*) FROM e WHERE event_type = 'purchase'),
        |    coalesce((SELECT sum(event_id) FROM e
        |      WHERE event_type = 'purchase'), 0))
        |SELECT scenario, CAST(r_fact AS BIGINT) AS r_fact,
        |  CAST(est_max_cnt AS BIGINT) AS est_max_cnt,
        |  CAST(est_total AS BIGINT) AS est_total,
        |  CAST(CASE WHEN est_total > 0
        |    THEN (est_max_cnt * 1048576) // est_total ELSE -1 END
        |    AS BIGINT) AS est_share_fp,
        |  CAST(true_max_cnt AS BIGINT) AS true_max_cnt,
        |  CAST(CASE WHEN r_fact > 0
        |    THEN (true_max_cnt * 1048576) // r_fact ELSE -1 END
        |    AS BIGINT) AS true_share_fp,
        |  CAST(CASE WHEN est_total > 0 AND est_max_cnt * 8 > est_total
        |    THEN 1 ELSE 0 END AS BIGINT) AS salted,
        |  CAST(CASE WHEN true_max_cnt * 8 > r_fact
        |    THEN 1 ELSE 0 END AS BIGINT) AS truth_salted,
        |  CAST(CASE WHEN (CASE WHEN est_total > 0
        |      AND est_max_cnt * 8 > est_total THEN 1 ELSE 0 END)
        |    <> (CASE WHEN true_max_cnt * 8 > r_fact THEN 1 ELSE 0 END)
        |    THEN 1 ELSE 0 END AS BIGINT) AS flipped,
        |  CAST(r_fact AS BIGINT) AS join_rows,
        |  CAST(join_sum AS BIGINT) AS join_sum
        |FROM scen ORDER BY scenario""".stripMargin,
    // scan-vs-skip decided from per-file write-time grids: three
    // sidecar-folded bands, per-file est >= 1 row gates the scan, the
    // data then grades the decision (found / missed / flip census)
    "sink_txn_hist_decide" ->
      s"""WITH e AS (SELECT user_id,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |st AS (SELECT user_id % 8 AS bkt,
        |    CAST(sum(v) * 10000 AS BIGINT) AS vs
        |  FROM e GROUP BY user_id),
        |pb AS (SELECT bkt, min(vs) AS mn, max(vs) AS mx,
        |    ((max(vs) - min(vs)) // 16) + 1 AS w
        |  FROM st GROUP BY bkt),
        |g AS (SELECT coalesce(min(mn), 0) AS gmn,
        |    coalesce(max(mx), 0) AS gmx FROM pb),
        |bands AS (
        |  SELECT 0 AS band_id, gmn AS lo,
        |    gmn + ((gmx - gmn) * 1) // 50 AS hi FROM g
        |  UNION ALL SELECT 1, gmn + ((gmx - gmn) * 3) // 10,
        |    gmn + ((gmx - gmn) * 9) // 20 FROM g
        |  UNION ALL SELECT 2, gmn + ((gmx - gmn) * 9) // 10, gmx FROM g),
        |side AS (SELECT st.bkt, (vs - mn) // w AS hb,
        |    count(*) AS cnt, mn, w
        |  FROM st JOIN pb USING (bkt) GROUP BY 1, 2, 4, 5),
        |estpf AS (SELECT b.band_id, s.bkt,
        |    CAST(sum((s.cnt * greatest(0,
        |      least(b.hi, s.mn + (s.hb + 1) * s.w - 1)
        |      - greatest(b.lo, s.mn + s.hb * s.w) + 1)) // s.w)
        |      AS BIGINT) AS est_rows
        |  FROM side s, bands b GROUP BY 1, 2),
        |trupf AS (SELECT b.band_id, st.bkt,
        |    CAST(count(*) AS BIGINT) AS true_rows
        |  FROM st, bands b WHERE st.vs BETWEEN b.lo AND b.hi
        |  GROUP BY 1, 2),
        |pf AS (SELECT coalesce(ep.band_id, tp.band_id) AS band_id,
        |    coalesce(ep.bkt, tp.bkt) AS bkt,
        |    coalesce(ep.est_rows, 0) AS est_rows,
        |    coalesce(tp.true_rows, 0) AS true_rows
        |  FROM estpf ep FULL JOIN trupf tp
        |    ON ep.band_id = tp.band_id AND ep.bkt = tp.bkt),
        |pb2 AS (SELECT band_id,
        |    CAST(count(*) AS BIGINT) AS files_total,
        |    CAST(sum(CASE WHEN est_rows > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS files_scanned,
        |    CAST(sum(est_rows) AS BIGINT) AS est_rows,
        |    CAST(sum(CASE WHEN est_rows > 0 THEN true_rows ELSE 0 END)
        |      AS BIGINT) AS true_in_scanned,
        |    CAST(sum(CASE WHEN est_rows = 0 THEN true_rows ELSE 0 END)
        |      AS BIGINT) AS missed_rows,
        |    CAST(sum(CASE WHEN (est_rows > 0) <> (true_rows > 0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS flip_files
        |  FROM pf GROUP BY band_id)
        |SELECT CAST(b.band_id AS BIGINT) AS band_id,
        |  CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
        |  coalesce(files_total, 0) AS files_total,
        |  coalesce(files_scanned, 0) AS files_scanned,
        |  coalesce(est_rows, 0) AS est_rows,
        |  coalesce(true_in_scanned, 0) AS true_in_scanned,
        |  coalesce(missed_rows, 0) AS missed_rows,
        |  coalesce(flip_files, 0) AS flip_files
        |FROM bands b LEFT JOIN pb2 ON b.band_id = pb2.band_id
        |ORDER BY band_id""".stripMargin,
    // merged v1 under bucket-count evolution ≡ the same per-user state;
    // the coalescing receipt is the staged 8-vs-4 divisible lifecycle
    "sink_txn_smb_coalesce" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us,
        |  CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  CAST(8 AS BIGINT) AS bucket_a,
        |  CAST(4 AS BIGINT) AS bucket_b,
        |  CAST(4 AS BIGINT) AS coalesced_to,
        |  CAST(1 AS BIGINT) AS layout_compat
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // both one-dim intermediates estimated and measured, the order
    // decision (smaller estimate first, tie → A), and the
    // order-independent final count
    "sink_txn_cbo_join_order" ->
      """WITH e AS (SELECT user_id, event_id, event_type FROM events),
        |st AS (SELECT user_id, count(*) AS n FROM e GROUP BY 1),
        |m AS (SELECT count(*) AS u, sum(n) AS tot FROM st),
        |d_all AS (SELECT user_id FROM st),
        |d_act AS (SELECT user_id FROM st, m WHERE n * u * 10 > tot * 11),
        |d_sparse AS (SELECT user_id FROM st WHERE user_id % 97 = 0),
        |d_half AS (SELECT user_id FROM st WHERE user_id % 2 = 0),
        |fact AS (SELECT user_id, event_id FROM e
        |  WHERE event_type = 'purchase'),
        |h_all AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_all ORDER BY h LIMIT 64),
        |h_act AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_act ORDER BY h LIMIT 64),
        |h_sparse AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_sparse ORDER BY h LIMIT 64),
        |h_half AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_half ORDER BY h LIMIT 64),
        |h_fact AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM (SELECT DISTINCT user_id FROM fact) ORDER BY h LIMIT 64),
        |nf AS (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |  ELSE 135291469761 // max(h) END AS ndv_fact FROM h_fact),
        |rf AS (SELECT count(*) AS r_fact FROM fact),
        |sc AS (
        |  SELECT 'active_vs_half' AS scenario,
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_act) AS ndv_a,
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_half) AS ndv_b,
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act))
        |      AS true_inter_a,
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_half))
        |      AS true_inter_b,
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act)
        |        AND user_id IN (SELECT user_id FROM d_half))
        |      AS final_rows
        |  UNION ALL
        |  SELECT 'active_vs_sparse',
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_act),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_sparse),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act)),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_sparse)),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act)
        |        AND user_id IN (SELECT user_id FROM d_sparse))
        |  UNION ALL
        |  SELECT 'all_vs_active',
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_all),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_act),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_all)),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act)),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_all)
        |        AND user_id IN (SELECT user_id FROM d_act))),
        |est AS (SELECT scenario, r_fact, ndv_fact, ndv_a, ndv_b,
        |    true_inter_a, true_inter_b, final_rows,
        |    CASE WHEN ndv_fact > 0
        |      THEN (r_fact * least(ndv_a, ndv_fact)) // ndv_fact
        |      ELSE 0 END AS est_inter_a,
        |    CASE WHEN ndv_fact > 0
        |      THEN (r_fact * least(ndv_b, ndv_fact)) // ndv_fact
        |      ELSE 0 END AS est_inter_b
        |  FROM sc, rf, nf)
        |SELECT scenario, CAST(r_fact AS BIGINT) AS r_fact,
        |  CAST(ndv_fact AS BIGINT) AS ndv_fact,
        |  CAST(ndv_a AS BIGINT) AS ndv_a,
        |  CAST(ndv_b AS BIGINT) AS ndv_b,
        |  CAST(est_inter_a AS BIGINT) AS est_inter_a,
        |  CAST(est_inter_b AS BIGINT) AS est_inter_b,
        |  CAST(true_inter_a AS BIGINT) AS true_inter_a,
        |  CAST(true_inter_b AS BIGINT) AS true_inter_b,
        |  CAST(CASE WHEN est_inter_a <= est_inter_b THEN 1 ELSE 0 END
        |    AS BIGINT) AS chose_a_first,
        |  CAST(CASE WHEN true_inter_a <= true_inter_b THEN 1 ELSE 0 END
        |    AS BIGINT) AS truth_a_first,
        |  CAST(CASE WHEN (est_inter_a <= est_inter_b)
        |    <> (true_inter_a <= true_inter_b) THEN 1 ELSE 0 END
        |    AS BIGINT) AS flipped,
        |  CAST(final_rows AS BIGINT) AS final_rows
        |FROM est ORDER BY scenario""".stripMargin,
    // the decision pipeline re-derived: KMV NDVs, the semi-join
    // containment estimate, the ×8 row-ratio broadcast rule applied to
    // estimate AND truth, and the strategy-independent join count
    "sink_txn_cbo_choose" ->
      """WITH e AS (SELECT user_id, event_id, event_type FROM events),
        |st AS (SELECT user_id, count(*) AS n FROM e GROUP BY 1),
        |m AS (SELECT count(*) AS u, sum(n) AS tot FROM st),
        |d_all AS (SELECT user_id FROM st),
        |d_act AS (SELECT user_id FROM st, m WHERE n * u * 10 > tot * 11),
        |d_sparse AS (SELECT user_id FROM st WHERE user_id % 97 = 0),
        |fact AS (SELECT user_id, event_id FROM e
        |  WHERE event_type = 'purchase'),
        |probe AS (SELECT user_id, event_id FROM e
        |  WHERE event_type = 'click'),
        |h_all AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_all ORDER BY h LIMIT 64),
        |h_act AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_act ORDER BY h LIMIT 64),
        |h_sparse AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM d_sparse ORDER BY h LIMIT 64),
        |h_fact AS (SELECT ((user_id + 1) * 2654435761) % 2147483647 AS h
        |  FROM (SELECT DISTINCT user_id FROM fact) ORDER BY h LIMIT 64),
        |nf AS (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |  ELSE 135291469761 // max(h) END AS ndv_fact FROM h_fact),
        |rfp AS (SELECT (SELECT count(*) FROM fact) AS r_fact,
        |  (SELECT count(*) FROM probe) AS r_probe),
        |sc AS (
        |  SELECT 'active_dim' AS scenario,
        |    (SELECT count(*) FROM d_act) AS r_dim,
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_act) AS ndv_dim,
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_act)) AS true_inter,
        |    (SELECT count(*) FROM probe p JOIN fact f
        |      ON p.user_id = f.user_id
        |      WHERE f.user_id IN (SELECT user_id FROM d_act)) AS join_rows
        |  UNION ALL
        |  SELECT 'all_dim',
        |    (SELECT count(*) FROM d_all),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_all),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_all)),
        |    (SELECT count(*) FROM probe p JOIN fact f
        |      ON p.user_id = f.user_id
        |      WHERE f.user_id IN (SELECT user_id FROM d_all))
        |  UNION ALL
        |  SELECT 'sparse_dim',
        |    (SELECT count(*) FROM d_sparse),
        |    (SELECT CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE 135291469761 // max(h) END FROM h_sparse),
        |    (SELECT count(*) FROM fact
        |      WHERE user_id IN (SELECT user_id FROM d_sparse)),
        |    (SELECT count(*) FROM probe p JOIN fact f
        |      ON p.user_id = f.user_id
        |      WHERE f.user_id IN (SELECT user_id FROM d_sparse))),
        |est AS (SELECT scenario, r_dim, ndv_dim, true_inter, join_rows,
        |    r_fact, r_probe, ndv_fact,
        |    CASE WHEN ndv_fact > 0
        |      THEN (r_fact * least(ndv_dim, ndv_fact)) // ndv_fact
        |      ELSE 0 END AS est_inter
        |  FROM sc, rfp, nf)
        |SELECT scenario, CAST(r_dim AS BIGINT) AS r_dim,
        |  CAST(r_fact AS BIGINT) AS r_fact,
        |  CAST(r_probe AS BIGINT) AS r_probe,
        |  CAST(ndv_dim AS BIGINT) AS ndv_dim,
        |  CAST(ndv_fact AS BIGINT) AS ndv_fact,
        |  CAST(est_inter AS BIGINT) AS est_inter,
        |  CAST(true_inter AS BIGINT) AS true_inter,
        |  CAST(CASE WHEN est_inter * 8 <= r_probe THEN 1 ELSE 0 END
        |    AS BIGINT) AS est_bcast,
        |  CAST(CASE WHEN true_inter * 8 <= r_probe THEN 1 ELSE 0 END
        |    AS BIGINT) AS true_bcast,
        |  CAST(CASE WHEN (est_inter * 8 <= r_probe)
        |    <> (true_inter * 8 <= r_probe) THEN 1 ELSE 0 END
        |    AS BIGINT) AS flipped,
        |  CAST(join_rows AS BIGINT) AS join_rows
        |FROM est ORDER BY scenario""".stripMargin,
    // every history number re-derived from raw events: visible rows =
    // distinct users under the bound, live/added/removed files from
    // the bucket closure vs the quartile slices
    "sink_txn_history_audit" ->
      """WITH f AS (SELECT user_id, user_id % 16 AS bkt, epoch_us(ts) AS t
        |  FROM events),
        |pb AS (SELECT bkt, min(t) AS mn FROM f GROUP BY 1),
        |j AS (SELECT f.user_id, f.bkt, f.t, pb.mn
        |  FROM f JOIN pb ON f.bkt = pb.bkt),
        |bounds AS (SELECT * FROM (VALUES
        |    (0, CAST(-9223372036854775807 AS BIGINT) - 1,
        |     CAST(19731 AS BIGINT) * 86400000000),
        |    (1, CAST(19731 AS BIGINT) * 86400000000,
        |     CAST(19739 AS BIGINT) * 86400000000),
        |    (2, CAST(19739 AS BIGINT) * 86400000000,
        |     CAST(19747 AS BIGINT) * 86400000000),
        |    (3, CAST(19747 AS BIGINT) * 86400000000,
        |     CAST(9223372036854775807 AS BIGINT)))
        |  AS t(v, lo, hi))
        |SELECT CAST(v AS BIGINT) AS version,
        |  CAST(count(DISTINCT CASE WHEN t < hi THEN user_id END) AS BIGINT)
        |    AS rows_visible,
        |  CAST(count(DISTINCT CASE WHEN t < hi THEN bkt END) AS BIGINT)
        |    AS files_live,
        |  CAST(count(DISTINCT CASE WHEN t >= lo AND t < hi THEN bkt END)
        |    AS BIGINT) AS files_added,
        |  CAST(count(DISTINCT CASE WHEN t >= lo AND t < hi AND mn < lo
        |    THEN bkt END) AS BIGINT) AS files_removed,
        |  CAST(CASE WHEN v > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_delta
        |FROM j CROSS JOIN bounds
        |GROUP BY v, lo, hi
        |ORDER BY version""".stripMargin,
    // row lineage: merged content + (first_commit, last_modified)
    // re-derived from raw membership; bystanders stay (0,0)
    "sink_txn_row_lineage" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |pre AS (SELECT * FROM e WHERE ts_us < 1705536000000000),
        |d AS (SELECT * FROM e
        |  WHERE ts_us >= 1705536000000000 AND user_id % 64 = 2),
        |bu AS (SELECT DISTINCT user_id FROM d),
        |pu AS (SELECT DISTINCT user_id FROM pre),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM bu),
        |rc AS (SELECT CAST(count(*) AS BIGINT) AS rows_created FROM bu
        |  WHERE bu.user_id NOT IN (SELECT user_id FROM pu)),
        |ru AS (SELECT CAST(count(*) AS BIGINT) AS rows_updated FROM bu
        |  WHERE bu.user_id IN (SELECT user_id FROM pu)),
        |fw AS (SELECT CAST(count(*) AS BIGINT) AS files_rewritten FROM tb),
        |fc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM pu) vb
        |  WHERE vb.b NOT IN (SELECT b FROM tb)),
        |m AS (SELECT * FROM pre UNION ALL SELECT * FROM d)
        |SELECT m.user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  CAST(CASE WHEN m.user_id IN (SELECT user_id FROM pu)
        |    THEN 0 ELSE 1 END AS BIGINT) AS first_commit,
        |  CAST(CASE WHEN m.user_id IN (SELECT user_id FROM bu)
        |    THEN 1 ELSE 0 END AS BIGINT) AS last_modified,
        |  (SELECT rows_created FROM rc) AS rows_created,
        |  (SELECT rows_updated FROM ru) AS rows_updated,
        |  (SELECT files_rewritten FROM fw) AS files_rewritten,
        |  (SELECT files_carried FROM fc) AS files_carried
        |FROM m GROUP BY m.user_id ORDER BY m.user_id""".stripMargin,
    // MOR upsert: merged content for the batch shard, pre-split for the
    // rest; replaced/inserted/MOR-file/fold/purge census data-derived
    "sink_txn_merge_mor" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |pre AS (SELECT * FROM e WHERE ts_us < 1705536000000000),
        |d AS (SELECT * FROM e
        |  WHERE ts_us >= 1705536000000000 AND user_id % 64 = 1),
        |bu AS (SELECT DISTINCT user_id FROM d),
        |pu AS (SELECT DISTINCT user_id FROM pre),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM bu),
        |vb AS (SELECT DISTINCT user_id % 16 AS b FROM pu),
        |uu AS (SELECT CAST(count(*) AS BIGINT) AS upsert_users FROM bu),
        |rk AS (SELECT CAST(count(*) AS BIGINT) AS replaced_keys FROM bu
        |  WHERE bu.user_id IN (SELECT user_id FROM pu)),
        |mf AS (SELECT CAST(count(*) AS BIGINT) AS mor_files FROM tb),
        |r1 AS (SELECT CAST(count(*) AS BIGINT) AS rows_v1 FROM
        |  (SELECT user_id FROM pu UNION SELECT user_id FROM bu)),
        |fc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM vb
        |  WHERE vb.b NOT IN (SELECT b FROM tb)),
        |ti AS (SELECT CAST(count(*) AS BIGINT) AS tb_in_v0 FROM tb
        |  WHERE tb.b IN (SELECT b FROM vb)),
        |m AS (SELECT * FROM pre UNION ALL SELECT * FROM d)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  (SELECT upsert_users FROM uu) AS upsert_users,
        |  (SELECT replaced_keys FROM rk) AS replaced_keys,
        |  (SELECT upsert_users FROM uu) - (SELECT replaced_keys FROM rk)
        |    AS inserted_keys,
        |  (SELECT mor_files FROM mf) AS mor_files_written,
        |  (SELECT rows_v1 FROM r1) AS rows_v1,
        |  (SELECT mor_files FROM mf) AS files_rewritten,
        |  (SELECT files_carried FROM fc) AS files_carried,
        |  (SELECT tb_in_v0 FROM ti) + 1 AS paths_purged,
        |  CAST(2 AS BIGINT) AS manifests_expired,
        |  CAST(1 AS BIGINT) AS expired_travel_fails
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    // restored content = the pre-split state exactly; the re-reference/
    // remove census and v1's surviving row count all data-derived
    "sink_txn_restore" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |pre AS (SELECT * FROM e WHERE ts_us < 1705536000000000),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e
        |  WHERE ts_us >= 1705536000000000 AND user_id % 64 = 10),
        |pb AS (SELECT DISTINCT user_id % 16 AS b FROM pre),
        |fr AS (SELECT CAST(count(*) AS BIGINT) AS files_readded FROM tb
        |  WHERE tb.b IN (SELECT b FROM pb)),
        |fm AS (SELECT CAST(count(*) AS BIGINT) AS files_removed FROM tb),
        |r1 AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS rows_v1
        |  FROM e WHERE ts_us < 1705536000000000 OR user_id % 64 = 10)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  CAST(3 AS BIGINT) AS versions,
        |  (SELECT files_readded FROM fr) AS files_readded,
        |  (SELECT files_removed FROM fm) AS files_removed,
        |  CAST(0 AS BIGINT) AS restore_files_written,
        |  (SELECT rows_v1 FROM r1) AS rows_v1
        |FROM pre GROUP BY user_id ORDER BY user_id""".stripMargin,
    // merged content = full log for the backfilled shard, pre-split for
    // everyone else; the file census derived from bucket footprints
    "sink_txn_merge_cow" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |m AS (SELECT * FROM e
        |  WHERE ts_us < 1705536000000000 OR user_id % 64 = 3),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e
        |  WHERE ts_us >= 1705536000000000 AND user_id % 64 = 3),
        |cw AS (SELECT CAST(count(*) AS BIGINT) AS files_written FROM tb),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e
        |     WHERE ts_us < 1705536000000000) p
        |  WHERE p.b NOT IN (SELECT b FROM tb))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  (SELECT files_written FROM cw) AS files_written,
        |  (SELECT files_carried FROM cc) AS files_carried
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    // survivors' state + the erasure/purge census, all data-derived
    "sink_txn_delete_cow" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e WHERE user_id % 64 = 7),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS files_rewritten FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e WHERE user_id % 64 <> 7) s
        |  WHERE s.b IN (SELECT b FROM tb)),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS touched FROM tb),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e) a
        |  WHERE a.b NOT IN (SELECT b FROM tb)),
        |ce AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS users_erased
        |  FROM e WHERE user_id % 64 = 7)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  (SELECT files_rewritten FROM sb) AS files_rewritten,
        |  (SELECT touched FROM ct) - (SELECT files_rewritten FROM sb)
        |    AS files_dropped,
        |  (SELECT files_carried FROM cc) AS files_carried,
        |  (SELECT users_erased FROM ce) AS users_erased,
        |  (SELECT touched FROM ct) AS paths_purged,
        |  CAST(1 AS BIGINT) AS manifests_expired,
        |  CAST(1 AS BIGINT) AS expired_travel_fails
        |FROM e WHERE user_id % 64 <> 7
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // positional deletion vectors: survivors' state + the DV/visibility/
    // fold/purge census, all re-derived from raw events
    "sink_txn_delete_dv" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e
        |  WHERE user_id % 64 = 11),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS files_rewritten FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e
        |     WHERE user_id % 64 <> 11) s
        |  WHERE s.b IN (SELECT b FROM tb)),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS touched FROM tb),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e) a
        |  WHERE a.b NOT IN (SELECT b FROM tb)),
        |dv AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS dv_positions
        |  FROM e WHERE user_id % 64 = 11),
        |r1 AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS rows_v1
        |  FROM e WHERE user_id % 64 <> 11)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  (SELECT dv_positions FROM dv) AS dv_positions,
        |  (SELECT rows_v1 FROM r1) AS rows_v1,
        |  (SELECT files_rewritten FROM sb) AS files_rewritten,
        |  (SELECT touched FROM ct) - (SELECT files_rewritten FROM sb)
        |    AS files_dropped,
        |  (SELECT files_carried FROM cc) AS files_carried,
        |  (SELECT touched FROM ct) + 1 AS paths_purged,
        |  CAST(2 AS BIGINT) AS manifests_expired,
        |  CAST(1 AS BIGINT) AS expired_travel_fails
        |FROM e WHERE user_id % 64 <> 11
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // shallow clone: source unchanged next to the clone's merged state,
    // with the zero-copy and isolation census data-derived
    "sink_txn_clone_shallow" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |pre AS (SELECT * FROM e WHERE ts_us < 1705536000000000),
        |m AS (SELECT * FROM e
        |  WHERE ts_us < 1705536000000000 OR user_id % 64 = 5),
        |ab AS (SELECT DISTINCT user_id % 16 AS b FROM pre),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e
        |  WHERE ts_us >= 1705536000000000 AND user_id % 64 = 5),
        |cf AS (SELECT CAST(count(*) AS BIGINT) AS cloned_files FROM ab),
        |cr AS (SELECT CAST(count(*) AS BIGINT) AS clone_rewritten FROM tb),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS clone_carried FROM ab
        |  WHERE ab.b NOT IN (SELECT b FROM tb)),
        |src AS (SELECT 'source' AS side, user_id,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM pre GROUP BY user_id),
        |cln AS (SELECT 'clone' AS side, user_id,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM m GROUP BY user_id),
        |u AS (SELECT * FROM src UNION ALL SELECT * FROM cln)
        |SELECT side, user_id, n_events, last_us, v_sum_4dp,
        |  (SELECT cloned_files FROM cf) AS cloned_files,
        |  (SELECT clone_rewritten FROM cr) AS clone_rewritten,
        |  (SELECT clone_carried FROM cc) AS clone_carried,
        |  CAST(1 AS BIGINT) AS source_versions
        |FROM u ORDER BY side, user_id""".stripMargin,
    // write-audit-publish: pre-state plus the audited batch, with the
    // audit/isolation/publish census re-derived from raw events
    "sink_txn_wap_publish" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |pre AS (SELECT user_id, 'pre' AS period,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e WHERE ts_us < 1705536000000000 GROUP BY user_id),
        |post AS (SELECT user_id, 'post' AS period,
        |    CAST(count(*) AS BIGINT) AS n_events, max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e WHERE ts_us >= 1705536000000000 GROUP BY user_id),
        |a1 AS (SELECT CAST(count(*) AS BIGINT) AS audit1_violations
        |  FROM post WHERE user_id % 64 = 9),
        |pf AS (SELECT CAST(count(DISTINCT user_id % 16) AS BIGINT)
        |    AS published_files FROM post WHERE user_id % 64 <> 9),
        |u AS (SELECT * FROM pre
        |  UNION ALL SELECT * FROM post WHERE user_id % 64 <> 9)
        |SELECT user_id, period, n_events, last_us, v_sum_4dp,
        |  (SELECT audit1_violations FROM a1) AS audit1_violations,
        |  CAST(0 AS BIGINT) AS audit2_violations,
        |  CAST(1 AS BIGINT) AS main_versions_before_publish,
        |  (SELECT published_files FROM pf) AS published_files,
        |  CAST(1 AS BIGINT) AS candidate_paths_purged
        |FROM u ORDER BY user_id, period""".stripMargin,
    // merge-on-read: survivors' state + the per-version visibility and
    // fold/purge census, all re-derived from raw events
    "sink_txn_delete_mor" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |tb AS (SELECT DISTINCT user_id % 16 AS b FROM e
        |  WHERE user_id % 64 IN (7, 21)),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS files_rewritten FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e
        |     WHERE user_id % 64 NOT IN (7, 21)) s
        |  WHERE s.b IN (SELECT b FROM tb)),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS touched FROM tb),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS files_carried FROM
        |  (SELECT DISTINCT user_id % 16 AS b FROM e) a
        |  WHERE a.b NOT IN (SELECT b FROM tb)),
        |r1 AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS rows_v1
        |  FROM e WHERE user_id % 64 <> 7),
        |r2 AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS rows_v2
        |  FROM e WHERE user_id % 64 NOT IN (7, 21))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  CAST(2 AS BIGINT) AS delete_files_written,
        |  (SELECT rows_v1 FROM r1) AS rows_v1,
        |  (SELECT rows_v2 FROM r2) AS rows_v2,
        |  (SELECT files_rewritten FROM sb) AS files_rewritten,
        |  (SELECT touched FROM ct) - (SELECT files_rewritten FROM sb)
        |    AS files_dropped,
        |  (SELECT files_carried FROM cc) AS files_carried,
        |  (SELECT touched FROM ct) + 2 AS paths_purged,
        |  CAST(3 AS BIGINT) AS manifests_expired,
        |  CAST(1 AS BIGINT) AS expired_travel_fails
        |FROM e WHERE user_id % 64 NOT IN (7, 21)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the 30–45% key-range scan + the skip census from per-bucket stats
    // maintained sidecar ≡ from-scratch recompute: merged state per
    // bucket (full history for the delta users, pre-split for the
    // rest), per-column min/max/rows unpivoted, rewritten = the
    // delta's bucket footprint — all from raw events
    "sink_txn_stats_maintain" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |m AS (SELECT * FROM e WHERE user_id % 64 = 3
        |  UNION ALL
        |  SELECT * FROM e WHERE user_id % 64 <> 3
        |    AND ts_us < CAST(19740 AS BIGINT) * 86400000000),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM m GROUP BY 1),
        |tb AS (SELECT user_id % 16 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    min(n_events) AS mn_ne, max(n_events) AS mx_ne,
        |    min(last_us) AS mn_lu, max(last_us) AS mx_lu,
        |    min(v_sum_4dp) AS mn_vs, max(v_sum_4dp) AS mx_vs
        |  FROM st GROUP BY 1),
        |tc AS (SELECT DISTINCT user_id % 16 AS bucket FROM e
        |  WHERE ts_us >= CAST(19740 AS BIGINT) * 86400000000
        |    AND user_id % 64 = 3),
        |u AS (SELECT bucket, 'n_events' AS col, mn_ne AS mn, mx_ne AS mx,
        |    n_rows FROM tb
        |  UNION ALL SELECT bucket, 'last_us', mn_lu, mx_lu, n_rows FROM tb
        |  UNION ALL SELECT bucket, 'v_sum_4dp', mn_vs, mx_vs, n_rows
        |    FROM tb)
        |SELECT u.bucket, u.col, u.mn, u.mx, u.n_rows,
        |  CAST(CASE WHEN tc.bucket IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS rewritten
        |FROM u LEFT JOIN tc ON u.bucket = tc.bucket
        |ORDER BY u.bucket, u.col""".stripMargin,
    // arbitrary-column zone maps: bucket by VALUE range, census =
    // overlap of per-bucket v_sum min/max with the fixed 30/45% band —
    // all re-derived from raw events
    // metadata-served count/min/max re-derived from raw events: the
    // hash certifies sidecar aggregation ≡ data aggregation
    "sink_txn_stats_serve" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e GROUP BY 1),
        |s AS (SELECT user_id % 16 AS bkt, 'n_events' AS col,
        |    n_events AS v FROM st
        |  UNION ALL SELECT user_id % 16, 'last_us', last_us FROM st
        |  UNION ALL SELECT user_id % 16, 'v_sum_4dp', v_sum_4dp FROM st)
        |SELECT col, CAST(count(DISTINCT bkt) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(v) AS mn, max(v) AS mx
        |FROM s GROUP BY col ORDER BY col""".stripMargin,
    // the full bloom replay: value clustering, per-file words, probe
    // pass sets, and the fetched rows — all from raw events
    "sink_txn_bloom_skip" -> {
      def slot(k: String) =
        s"(CASE i WHEN 1 THEN (($k + 1) * 2654435761) % 1048573 " +
          s"WHEN 2 THEN (($k + 1) * 2246822519) % 1048573 " +
          s"ELSE (($k + 1) * 3266489917) % 1048573 END) % 4096"
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
         |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
         |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |    max(ts_us) AS last_us,
         |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
         |  FROM e GROUP BY 1),
         |b AS (SELECT min(v_sum_4dp) AS mn, max(v_sum_4dp) AS mx FROM st),
         |cl AS (SELECT st.*, (v_sum_4dp - (SELECT mn FROM b)) //
         |    (((SELECT mx FROM b) - (SELECT mn FROM b)) // 16 + 1) AS bkt
         |  FROM st),
         |hs AS (SELECT bkt, ${slot("user_id")} AS slot
         |  FROM cl CROSS JOIN (VALUES (1), (2), (3)) t(i)),
         |words AS (SELECT bkt AS wb, slot // 32 AS w,
         |    bit_or(CAST(1 AS BIGINT) << CAST(slot % 32 AS INT)) AS wv
         |  FROM hs GROUP BY 1, 2),
         |pr AS (SELECT CAST(probe_k AS BIGINT) AS probe_k FROM (VALUES
         |    (2), (3), (5), (7), (11), (13), (100000), (100001))
         |  t(probe_k)),
         |ps AS (SELECT probe_k, ${slot("probe_k")} AS slot
         |  FROM pr CROSS JOIN (VALUES (1), (2), (3)) t(i)),
         |files AS (SELECT DISTINCT bkt FROM cl),
         |cand AS (SELECT ps.probe_k, f.bkt,
         |    min(CASE WHEN w.wv IS NOT NULL
         |      AND ((w.wv >> CAST(ps.slot % 32 AS INT)) & 1) = 1
         |      THEN 1 ELSE 0 END) AS pass
         |  FROM ps CROSS JOIN files f LEFT JOIN words w
         |    ON f.bkt = w.wb AND ps.slot // 32 = w.w
         |  GROUP BY 1, 2),
         |cen AS (SELECT probe_k, CAST(count(*) AS BIGINT) AS files_total,
         |    CAST(sum(pass) AS BIGINT) AS files_passed
         |  FROM cand GROUP BY 1),
         |found AS (SELECT c.probe_k, cl.n_events, cl.last_us, cl.v_sum_4dp
         |  FROM cand c JOIN cl ON c.bkt = cl.bkt AND cl.user_id = c.probe_k
         |  WHERE c.pass = 1)
         |SELECT pr.probe_k,
         |  coalesce(cen.files_total, 0) AS files_total,
         |  coalesce(cen.files_passed, 0) AS files_passed,
         |  coalesce(cen.files_passed, 0) -
         |    (CASE WHEN found.n_events IS NOT NULL THEN 1 ELSE 0 END)
         |    AS fp_files,
         |  CAST(CASE WHEN found.n_events IS NOT NULL THEN 1 ELSE 0 END
         |    AS BIGINT) AS row_found,
         |  coalesce(found.n_events, -1) AS n_events,
         |  coalesce(found.last_us, -1) AS last_us,
         |  coalesce(found.v_sum_4dp, -1) AS v_sum_4dp
         |FROM pr LEFT JOIN cen ON pr.probe_k = cen.probe_k
         |LEFT JOIN found ON pr.probe_k = found.probe_k
         |ORDER BY pr.probe_k""".stripMargin
    },
    "sink_txn_column_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(ts_us) AS last_us,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e GROUP BY 1),
        |b AS (SELECT min(v_sum_4dp) AS mn, max(v_sum_4dp) AS mx FROM st),
        |pb AS (SELECT (v_sum_4dp - (SELECT mn FROM b)) //
        |      (((SELECT mx FROM b) - (SELECT mn FROM b)) // 16 + 1) AS bk,
        |    min(v_sum_4dp) AS bmn, max(v_sum_4dp) AS bmx
        |  FROM st GROUP BY 1),
        |lim AS (SELECT (SELECT mn FROM b)
        |      + ((SELECT mx FROM b) - (SELECT mn FROM b)) * 3 // 10 AS lo,
        |    (SELECT mn FROM b)
        |      + ((SELECT mx FROM b) - (SELECT mn FROM b)) * 9 // 20 AS hi),
        |cs AS (SELECT CAST(count(*) AS BIGINT) AS files_total,
        |    CAST(count(*) FILTER (bmx >= (SELECT lo FROM lim)
        |      AND bmn <= (SELECT hi FROM lim)) AS BIGINT) AS files_scanned
        |  FROM pb)
        |SELECT user_id, n_events, last_us, v_sum_4dp,
        |  (SELECT files_total FROM cs) AS files_total,
        |  (SELECT files_scanned FROM cs) AS files_scanned,
        |  (SELECT files_total FROM cs) - (SELECT files_scanned FROM cs)
        |    AS files_skipped
        |FROM st
        |WHERE v_sum_4dp BETWEEN (SELECT lo FROM lim) AND (SELECT hi FROM lim)
        |ORDER BY user_id""".stripMargin,
    "sink_txn_data_skipping" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |mxv AS (SELECT max(user_id) AS mx FROM e),
        |bs AS (SELECT user_id // ((SELECT mx FROM mxv) // 16 + 1) AS b,
        |    min(user_id) AS mn, max(user_id) AS mx_b
        |  FROM e GROUP BY 1),
        |cs AS (SELECT CAST(count(*) AS BIGINT) AS files_total,
        |    CAST(count(*) FILTER (
        |      mx_b >= (SELECT mx FROM mxv) * 3 // 10
        |      AND mn <= (SELECT mx FROM mxv) * 9 // 20) AS BIGINT)
        |      AS files_scanned
        |  FROM bs)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts_us) AS last_us, CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  (SELECT files_total FROM cs) AS files_total,
        |  (SELECT files_scanned FROM cs) AS files_scanned,
        |  (SELECT files_total FROM cs) - (SELECT files_scanned FROM cs)
        |    AS files_skipped
        |FROM e
        |WHERE user_id BETWEEN (SELECT mx FROM mxv) * 3 // 10
        |  AND (SELECT mx FROM mxv) * 9 // 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // compacted-table content fingerprint + the layout census
    "sink_txn_compact_binpack" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |ca AS (SELECT CAST(count(DISTINCT user_id % 16) AS BIGINT)
        |    AS files_after FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp,
        |  min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(4 AS BIGINT) AS files_before,
        |  (SELECT files_after FROM ca) AS files_after,
        |  CAST(4 AS BIGINT) AS paths_purged
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the z-curve rectangle scan: DuckDB recomputes the 32-term Morton
    // interleave, the z-range buckets, each file's (user × day) bounding
    // box AND the overlap census from raw events
    "sink_txn_zorder_skip" -> {
      val terms = zTermsSql("x", "y")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
         |g AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
         |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
         |  FROM e GROUP BY 1, 2),
         |muv AS (SELECT max(user_id) AS mxu FROM g),
         |mdv AS (SELECT min(day) AS dmn, max(day) AS dmx FROM g),
         |zc AS (SELECT user_id, day,
         |    user_id // ((SELECT mxu FROM muv) // 16 + 1) AS x,
         |    day - (SELECT dmn FROM mdv) AS y FROM g),
         |z AS (SELECT user_id, day, CAST($terms AS BIGINT) AS zval FROM zc),
         |mzv AS (SELECT max(zval) AS mxz FROM z),
         |q AS (SELECT (SELECT mxu FROM muv) * 3 // 10 AS ulo,
         |             (SELECT mxu FROM muv) * 9 // 20 AS uhi,
         |             (SELECT dmn + (dmx - dmn) // 4 FROM mdv) AS dlo,
         |             (SELECT dmn + (dmx - dmn) * 5 // 8 FROM mdv) AS dhi),
         |bs AS (SELECT zval // ((SELECT mxz FROM mzv) // 16 + 1) AS b,
         |    min(user_id) AS mn1, max(user_id) AS mx1,
         |    min(day) AS mn2, max(day) AS mx2
         |  FROM z GROUP BY 1),
         |cs AS (SELECT CAST(count(*) AS BIGINT) AS files_total,
         |    CAST(count(*) FILTER (mx1 >= (SELECT ulo FROM q)
         |      AND mn1 <= (SELECT uhi FROM q)
         |      AND mx2 >= (SELECT dlo FROM q)
         |      AND mn2 <= (SELECT dhi FROM q)) AS BIGINT) AS files_scanned
         |  FROM bs)
         |SELECT user_id, day, n_events, v_sum_4dp,
         |  (SELECT files_total FROM cs) AS files_total,
         |  (SELECT files_scanned FROM cs) AS files_scanned,
         |  (SELECT files_total FROM cs) - (SELECT files_scanned FROM cs)
         |    AS files_skipped
         |FROM g
         |WHERE user_id BETWEEN (SELECT ulo FROM q) AND (SELECT uhi FROM q)
         |  AND day BETWEEN (SELECT dlo FROM q) AND (SELECT dhi FROM q)
         |ORDER BY user_id, day""".stripMargin
    },
    // two partition specs in one manifest: the 4-day window prunes all
    // spec-A files by their day zone maps and scans only matching days
    "sink_txn_partition_evolution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |g AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(v) * 10000 AS BIGINT) AS v_sum_4dp
        |  FROM e GROUP BY 1, 2),
        |mu AS (SELECT max(user_id) AS mxu FROM g WHERE day < 19740),
        |sa AS (SELECT CAST(count(DISTINCT
        |      user_id // ((SELECT mxu FROM mu) // 16 + 1)) AS BIGINT)
        |    AS spec_a_files FROM g WHERE day < 19740),
        |sb AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS spec_b_files
        |  FROM g WHERE day >= 19740),
        |sc AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS files_scanned
        |  FROM g WHERE day BETWEEN 19742 AND 19745)
        |SELECT user_id, day, n_events, v_sum_4dp,
        |  (SELECT spec_a_files FROM sa) + (SELECT spec_b_files FROM sb)
        |    AS files_total,
        |  (SELECT files_scanned FROM sc) AS files_scanned,
        |  (SELECT spec_a_files FROM sa) + (SELECT spec_b_files FROM sb)
        |    - (SELECT files_scanned FROM sc) AS files_skipped,
        |  (SELECT spec_a_files FROM sa) AS spec_a_files,
        |  (SELECT spec_b_files FROM sb) AS spec_b_files
        |FROM g WHERE day BETWEEN 19742 AND 19745
        |ORDER BY user_id, day""".stripMargin
  )
}
