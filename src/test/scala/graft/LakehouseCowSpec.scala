package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.TxnTable
import graft.sources.TxnTable.FileEntry

/** Laws for the FILE-LEVEL lakehouse layer (operators/LakehouseCow.scala
  * + the TxnTable file-manifest protocol): COW merges share untouched
  * files by reference, targeted deletes physically purge every erased
  * byte while carried files survive the reference-aware vacuum, stats
  * pruning never loses rows, and OPTIMIZE is content-identical. */
class LakehouseCowSpec extends SparkSuite {

  private def fs = new Path("/root/repo/target")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commitEntries/fileEntries roundtrip; file-level read is the entry union; carried files survive vacuum") {
    import spark.implicits._
    val t = Tables.scratch("lhc_proto")
    TxnTable.drop(spark, t)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$t/data/v0/bkt=0")
    Seq((11L, "c")).toDF("k", "v").write.parquet(s"$t/data/v0/bkt=1")
    val e0 = Seq(FileEntry(0, s"$t/data/v0/bkt=0", 1, 2),
      FileEntry(1, s"$t/data/v0/bkt=1", 11, 11))
    TxnTable.commitEntries(spark, t, 0, e0)
    assert(TxnTable.fileEntries(spark, t, Some(0)) === e0)
    assert(TxnTable.read(spark, t, Some(0)).count() === 3)
    // v1: rewrite bucket 1, carry bucket 0 by reference
    Seq((12L, "d")).toDF("k", "v").write.parquet(s"$t/data/v1/bkt=1")
    TxnTable.commitEntries(spark, t, 1,
      Seq(e0.head, FileEntry(1, s"$t/data/v1/bkt=1", 12, 12)))
    assert(TxnTable.read(spark, t, None).orderBy($"k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 12L))
    // vacuum keepLast=1: v0's manifest expires, but its CARRIED file
    // (bkt=0, still referenced by v1) must survive — only the
    // superseded v0/bkt=1 is purged
    val (removed, expired) = TxnTable.vacuum(spark, t, 1)
    assert((removed, expired) === (1, 1))
    assert(fs.exists(new Path(s"$t/data/v0/bkt=0")))
    assert(!fs.exists(new Path(s"$t/data/v0/bkt=1")))
    // the carried file still serves the live table
    assert(TxnTable.read(spark, t, None).count() === 3)
    // idempotent
    assert(TxnTable.vacuum(spark, t, 1) === ((0, 0)))
  }

  test("merge_cow: carried entries reference v0 files untouched; only the delta's bucket footprint is rewritten (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnMergeCow(spark, sf0001).cache()
    // fixture footprint: users ≡ 3 (mod 64) land in bucket 3 alone
    assert(out.select($"files_written").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    val t = Tables.scratch("txn_cow_merge") // the key's per-PID table
    val e1 = TxnTable.fileEntries(spark, t, Some(1))
    val (fresh, carried) = e1.partition(_.path.contains("/data/v1/"))
    assert(fresh.map(_.bucket) === Seq(3L))
    assert(carried.nonEmpty && carried.forall(_.path.contains("/data/v0/")))
    // carried entries are IDENTICAL to v0's (shared by reference — a
    // rewrite would have changed the path)
    val e0 = TxnTable.fileEntries(spark, t, Some(0)).map(e => e.bucket -> e).toMap
    assert(carried.forall(c => e0(c.bucket) === c))
    // stats honesty: every entry's min/max brackets its file's keys
    e1.foreach { e =>
      val mm = spark.read.parquet(e.path).agg(min($"user_id"), max($"user_id"))
        .collect().head
      assert(mm.getLong(0) === e.minKey && mm.getLong(1) === e.maxKey, e)
    }
    out.unpersist()
  }

  test("delete_cow: erased users physically purged from every surviving file; carried files serve the live read (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnDeleteCow(spark, sf0001).cache()
    assert(out.filter($"user_id" % 64 === 7).count() === 0)
    val t = Tables.scratch("txn_cow_delete")
    // post-vacuum: only v1 is travelable, and EVERY file it references
    // exists and contains no erased user — the GDPR guarantee is about
    // bytes on disk, not query results
    assert(TxnTable.versions(spark, t) === Seq(1))
    TxnTable.fileEntries(spark, t, None).foreach { e =>
      assert(fs.exists(new Path(e.path)), e.path)
      assert(spark.read.parquet(e.path)
        .filter($"user_id" % 64 === 7).count() === 0, e.path)
    }
    // sf0.001: user 7 was its bucket's only occupant — the file is
    // DROPPED from the manifest (Delta remove-action), not rewritten
    assert(out.select($"files_dropped").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    assert(!fs.exists(new Path(s"$t/data/v0/bkt=7"))) // purged bytes
    out.unpersist()
  }

  test("delete_mor: deletes invisible from commit on, fold retires the delete files, vacuum purges them (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnDeleteMor(spark, sf0001).cache()
    // both delete sets erased from the graded content
    assert(out.filter($"user_id" % 64 === 7 || $"user_id" % 64 === 21)
      .count() === 0)
    // the MOR read-side proof: the v2 visible-row count equals the
    // post-fold table (deletes applied by anti-join, not by rewrite)
    val rowsV2 = out.select($"rows_v2").head.getLong(0)
    assert(rowsV2 === out.count())
    val t = Tables.scratch("txn_mor_delete")
    // only the folded version survives; its delete-file set is EMPTY
    assert(TxnTable.versions(spark, t) === Seq(3))
    assert(TxnTable.deleteFiles(spark, t, None).isEmpty)
    // the delete files expired WITH their versions (the retention law)
    assert(!fs.exists(new Path(s"$t/data/v1")), "v1 delete file survived")
    assert(!fs.exists(new Path(s"$t/data/v2")), "v2 delete file survived")
    // every live file is free of erased users (fold correctness on disk)
    TxnTable.fileEntries(spark, t, None).foreach { e =>
      assert(spark.read.parquet(e.path)
        .filter($"user_id" % 64 === 7 || $"user_id" % 64 === 21)
        .count() === 0, e.path)
    }
    out.unpersist()
  }

  test("wap_publish: main isolated until publish, publish is zero-copy, candidate purged while published files survive (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnWapPublish(spark, sf0001).cache()
    // no poisoned-shard row ever reached main's published batch
    assert(out.filter($"period" === "post" && $"user_id" % 64 === 9)
      .count() === 0)
    // pre-state users are untouched by the audit (the gate is on NEW data)
    assert(out.select($"main_versions_before_publish").head.getLong(0) === 1L)
    val t = Tables.scratch("txn_wap")
    val branch = s"$t/branches/audit"
    // zero-copy publish: main's post-period files LIVE UNDER THE BRANCH
    val mainEntries = TxnTable.fileEntries(spark, t, None)
    val branchRefs = mainEntries.filter(_.path.contains("/branches/audit/"))
    assert(branchRefs.nonEmpty, "publish copied data instead of referencing")
    branchRefs.foreach(e => assert(fs.exists(new Path(e.path)), e.path))
    // the unaudited candidate is physically gone; branch v1 survives
    assert(!fs.exists(new Path(s"$branch/data/v0")), "candidate not purged")
    assert(TxnTable.versions(spark, branch) === Seq(1))
    // audit receipts: violations found once, zero after the fix
    if (out.select($"audit1_violations").head.getLong(0) > 0)
      assert(out.select($"audit2_violations").head.getLong(0) === 0L)
    out.unpersist()
  }

  test("delete_dv: the DV is purely positional (no key column), applied read-side, folded and expired (sf0.001)") {
    import spark.implicits._
    // capture the DV parquet BEFORE the key's vacuum erases it: replay
    // the v0 write + address resolution on an injected mini-table
    val t = Tables.scratch("lhc_dv_proto")
    TxnTable.drop(spark, t)
    Seq((1L, "a"), (11L, "bad"), (27L, "c")).toDF("user_id", "v")
      .withColumn("b", lit(0L))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"b")
          .orderBy($"user_id")).cast("long"))
      .coalesce(1).write.parquet(s"$t/data/v0/bkt=0")
    TxnTable.commitEntries(spark, t, 0,
      Seq(TxnTable.FileEntry(0, s"$t/data/v0/bkt=0", 1, 27)))
    // a purely positional DV: addresses only, NO key semantics
    Seq((0L, 2L)).toDF("b", "pos").coalesce(1)
      .write.parquet(s"$t/data/v1/dv")
    TxnTable.commitDelta(spark, t, 1,
      delAdds = Seq(TxnTable.DeleteFile(s"$t/data/v1/dv", "b,pos")))
    val dvSchema = spark.read.parquet(s"$t/data/v1/dv").columns.toSeq
    assert(dvSchema === Seq("b", "pos"), "DV carries more than addresses")
    // position 2 (user 11) is gone; keys were never consulted
    assert(TxnTable.read(spark, t, None).select($"user_id")
      .orderBy($"user_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 27L))
    // the graded key end-to-end
    val out = operators.LakehouseCow.sinkTxnDeleteDv(spark, sf0001).cache()
    assert(out.filter($"user_id" % 64 === 11).count() === 0)
    assert(out.select($"rows_v1").head.getLong(0) === out.count())
    val kt = Tables.scratch("txn_dv_delete")
    assert(TxnTable.versions(spark, kt) === Seq(2))
    assert(TxnTable.deleteFiles(spark, kt, None).isEmpty)
    assert(!fs.exists(new Path(s"$kt/data/v1")), "DV survived its version")
    out.unpersist()
  }

  test("clone_shallow: clone v0 references source files (zero copy), clone writes never touch the source (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnCloneShallow(spark, sf0001).cache()
    val t = Tables.scratch("txn_clone_src")
    val clone = s"$t/clones/dev"
    // zero copy: the clone's v0 manifest points INTO the source tree
    val e0clone = TxnTable.fileEntries(spark, clone, Some(0))
    assert(e0clone.nonEmpty && e0clone.forall(_.path.startsWith(s"$t/data/")),
      "clone v0 copied data instead of referencing the source")
    // isolation: the source log never advanced, and its content equals
    // the graded 'source' side
    assert(TxnTable.versions(spark, t) === Seq(0))
    val srcRows = out.filter($"side" === "source")
      .select($"user_id", $"n_events", $"last_us", $"v_sum_4dp")
    val direct = TxnTable.read(spark, t, None)
    assert(srcRows.exceptAll(direct).isEmpty && direct.exceptAll(srcRows).isEmpty)
    // the clone's merge wrote only under the clone's own data dir
    val e1clone = TxnTable.fileEntries(spark, clone, Some(1))
    e1clone.filterNot(e0clone.toSet).foreach(e =>
      assert(e.path.startsWith(s"$clone/data/"), e.path))
    out.unpersist()
  }

  test("data_skipping: pruned scan ≡ full scan + filter, with files genuinely skipped (sf0.001 + adversarial bounds)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnDataSkipping(spark, sf0001).cache()
    val census = out.select($"files_total", $"files_scanned", $"files_skipped")
      .distinct().collect().head
    assert(census.getLong(1) > 0 && census.getLong(2) > 0,
      s"degenerate skip census: $census") // pruning did real work
    assert(census.getLong(0) === census.getLong(1) + census.getLong(2))
    // equivalence: the pruned result must equal the UNPRUNED scan of the
    // committed table under the same residual filter
    val t = Tables.scratch("txn_skip")
    val mx = Tables.events(spark, sf0001).agg(max($"user_id"))
      .collect().head.getLong(0)
    val (lo, hi) = (mx * 3 / 10, mx * 9 / 20)
    val full = TxnTable.read(spark, t, None)
      .filter($"user_id".between(lo, hi))
    val pruned = out.select($"user_id", $"n_events", $"last_us", $"v_sum_4dp")
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // adversarial: a predicate inside ONE file's range scans exactly it
    val entries = TxnTable.fileEntries(spark, t, None)
    val one = entries.filter(e => e.maxKey >= lo && e.minKey <= hi).head
    val hits = entries.count(e => e.maxKey >= one.minKey && e.minKey <= one.minKey)
    assert(hits === 1, "point predicate must prune to a single file")
    out.unpersist()
  }

  test("zorder_skip: both dimensions prune; pruned rectangle ≡ unpruned rectangle (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnZorderSkip(spark, sf0001).cache()
    val census = out.select($"files_total", $"files_scanned", $"files_skipped")
      .distinct().collect().head
    assert(census.getLong(1) > 0 && census.getLong(2) > 0,
      s"degenerate z-order census: $census")
    // the curve must produce a real multi-file tiling, not one z-range
    assert(census.getLong(0) >= 8, s"z-bucketing collapsed: $census")
    val t = Tables.scratch("txn_zorder")
    val entries = TxnTable.fileEntries(spark, t, None)
    val ev = Tables.events(spark, sf0001)
    val mxu = ev.agg(max($"user_id")).collect().head.getLong(0)
    val (ulo, uhi) = (mxu * 3 / 10, mxu * 9 / 20)
    // rectangle equivalence: pruned result equals full-table filter
    val full = TxnTable.read(spark, t, None)
    val dRow = full.agg(min($"day"), max($"day")).collect().head
    val (dmn, dmx) = (dRow.getLong(0), dRow.getLong(1))
    val (dlo, dhi) = (dmn + (dmx - dmn) / 4, dmn + (dmx - dmn) * 5 / 8)
    val expect = full.filter($"user_id".between(ulo, uhi) &&
      $"day".between(dlo, dhi))
      .select($"user_id", $"day", $"n_events", $"v_sum_4dp")
    val got = out.select($"user_id", $"day", $"n_events", $"v_sum_4dp")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // day-dimension pruning is REAL: at least one file whose user box
    // overlaps the query range was still skipped — only its day zone
    // map can have excluded it. A single-key user layout cannot have
    // this property (every user-overlapping file would be scanned).
    val scannedN = census.getLong(1)
    val userOverlapping = entries.count(e => e.maxKey >= ulo && e.minKey <= uhi)
    assert(scannedN < userOverlapping,
      s"day zone map never pruned: scanned=$scannedN of $userOverlapping user-overlapping files")
    out.unpersist()
  }

  test("partition_evolution: old spec carried unrewritten and fully day-pruned; new spec scans only matching days (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnPartitionEvolution(spark, sf0001)
      .cache()
    val t = Tables.scratch("txn_specevo")
    val e1 = TxnTable.fileEntries(spark, t, Some(1))
    val (specB, specA) = e1.partition(_.path.contains("/data/v1/"))
    // spec A carried by reference (paths still under v0), never rewritten
    assert(specA.nonEmpty && specA.forall(_.path.contains("/data/v0/")))
    // spec change is visible in the layout: spec-B files are one day each
    assert(specB.nonEmpty && specB.forall(e => e.min2 === e.max2))
    // and spec-A files span many days (the old layout, coexisting)
    assert(specA.exists(e => e.max2 > e.min2))
    // the 4-day window prunes EVERY spec-A file by its day zone map
    val (qlo, qhi) = (19742L, 19745L)
    assert(specA.forall(e => e.max2 < qlo || e.min2 > qhi))
    val scanned = out.select($"files_scanned").head.getLong(0)
    assert(scanned === specB.count(e => e.max2 >= qlo && e.min2 <= qhi))
    // content: only post-split days inside the window
    assert(out.filter($"day" < qlo || $"day" > qhi).count() === 0)
    out.unpersist()
  }

  test("compact_binpack: OPTIMIZE is content-identical, appends superseded and purged (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnCompactBinpack(spark, sf0001).cache()
    val t = Tables.scratch("txn_binpack")
    // the quartile append files are gone; only the clustered layout lives
    (0 to 3).foreach { i =>
      assert(!fs.exists(new Path(s"$t/data/v$i")), s"append v$i not purged")
    }
    assert(out.select($"paths_purged").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(4L))
    // content identity: the compacted table equals the raw event log
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type",
        Tables.nsToUs($"ts").as("ts_us"), Tables.dec4($"value").as("v"))
    val compacted = TxnTable.read(spark, t, None)
    assert(compacted.exceptAll(ev).isEmpty && ev.exceptAll(compacted).isEmpty)
    // every live file holds exactly one hash bucket (the cluster law)
    TxnTable.fileEntries(spark, t, None).foreach { e =>
      val b = spark.read.parquet(e.path)
        .select(($"user_id" % 16).as("b")).distinct().collect()
      assert(b.map(_.getLong(0)).toSeq === Seq(e.bucket), e)
    }
    out.unpersist()
  }

  test("sink_txn_restore: latest ≡ v0 through travel, v1 preserved and genuinely undone") {
    operators.LakehouseCow.sinkTxnRestore(spark, sf0001).collect(): Unit
    val t = Tables.scratch("txn_restore")
    val latest = TxnTable.read(spark, t, None)
    val v0 = TxnTable.read(spark, t, Some(0))
    // the restore serves v0's exact state again...
    assert(latest.exceptAll(v0).isEmpty && v0.exceptAll(latest).isEmpty,
      "post-restore latest must equal v0 row-for-row")
    // ...while HISTORY survives: the undone merge still time-travels,
    // and it really differed (the restore was not vacuous)
    val v1 = TxnTable.read(spark, t, Some(1))
    assert(v1.exceptAll(v0).count() > 0,
      "fixture must exercise a real merge before the restore")
    assert(TxnTable.versions(spark, t) === Seq(0, 1, 2))
  }

  test("column_stats: the sidecar's zone maps are honest per file, agree with the manifest rowCount, and really prune (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnColumnStats(spark, sf0001).cache()
    // the fixture must exercise real pruning (a vacuous census grades nothing)
    val census = out.select($"files_total", $"files_scanned", $"files_skipped")
      .distinct().collect().head
    assert(census.getLong(2) > 0, "files_skipped must be > 0 at sf0.001")
    assert(census.getLong(0) === census.getLong(1) + census.getLong(2))
    // sidecar honesty: every (file, column) row's min/max/rows equals a
    // direct scan of that file — the footer-stats contract
    val sidecar = TxnTable.read(spark, Tables.scratch("txn_colstats_sidecar"))
      .collect()
    assert(sidecar.nonEmpty)
    val byPath = sidecar.groupBy(_.getAs[String]("path"))
    val manifestRows = TxnTable
      .fileEntries(spark, Tables.scratch("txn_colstats"))
      .map(e => e.path -> e.rowCount).toMap
    byPath.foreach { case (path, rows) =>
      val f = spark.read.parquet(path)
      val direct = f.agg(count(lit(1)),
        min($"n_events"), max($"n_events"), min($"last_us"), max($"last_us"),
        min($"v_sum_4dp"), max($"v_sum_4dp")).collect().head
      val expect = Map(
        "n_events" -> (direct.getLong(1), direct.getLong(2)),
        "last_us" -> (direct.getLong(3), direct.getLong(4)),
        "v_sum_4dp" -> (direct.getLong(5), direct.getLong(6)))
      rows.foreach { r =>
        val c = r.getAs[String]("col")
        assert((r.getAs[Long]("mn"), r.getAs[Long]("mx")) === expect(c),
          s"$path/$c zone map dishonest")
        assert(r.getAs[Long]("rows") === direct.getLong(0), s"$path rows")
      }
      // the sidecar and the manifest rowCount tier must agree
      assert(manifestRows(path) === direct.getLong(0), s"$path manifest rows")
    }
    out.unpersist(): Unit
  }

  test("stats_maintain: carried sidecar rows are the v0 rows verbatim; only the delta footprint gets fresh stats (sf0.001)") {
    import spark.implicits._
    operators.LakehouseCow.sinkTxnStatsMaintain(spark, sf0001).collect(): Unit
    val tStats = Tables.scratch("txn_statsmaint_sidecar")
    val v0 = TxnTable.read(spark, tStats, Some(0)).collect()
      .map(_.toSeq).toSet
    val v1 = TxnTable.read(spark, tStats, Some(1)).collect()
    assert(v1.nonEmpty)
    val (fresh, carriedRows) = v1.partition(
      _.getAs[String]("path").contains("/data/v1/"))
    // maintenance is O(changed-files): exactly one bucket rewrote
    // (users ≡ 3 mod 64 land in hash bucket 3 alone), everything else
    // passed through from the v0 sidecar UNCHANGED — same rows verbatim
    assert(fresh.map(_.getAs[Long]("bkt")).toSet === Set(3L))
    carriedRows.foreach(r => assert(v0.contains(r.toSeq),
      s"carried row not verbatim from v0: $r"))
    assert(carriedRows.length === v0.size - 3, // v0's bucket-3 rows replaced
      "every non-rewritten v0 row must carry")
    // fresh stats honesty: the rewritten file's stats match a direct scan
    fresh.groupBy(_.getAs[String]("path")).foreach { case (path, rows) =>
      val d = spark.read.parquet(path).agg(count(lit(1)),
        min($"n_events"), max($"n_events"), min($"last_us"),
        max($"last_us"), min($"v_sum_4dp"), max($"v_sum_4dp"))
        .collect().head
      val expect = Map(
        "n_events" -> (d.getLong(1), d.getLong(2)),
        "last_us" -> (d.getLong(3), d.getLong(4)),
        "v_sum_4dp" -> (d.getLong(5), d.getLong(6)))
      rows.foreach { r =>
        assert((r.getAs[Long]("mn"), r.getAs[Long]("mx")) ===
          expect(r.getAs[String]("col")), s"$path zone map")
        assert(r.getAs[Long]("rows") === d.getLong(0))
      }
    }
  }

  test("manifest rowCount stats: countAt == data count for every version, and is served with ZERO data I/O (sf0.001)") {
    operators.LakehouseCow.sinkTxnHistoryAudit(spark, sf0001).collect(): Unit
    val t = Tables.scratch("txn_history_table")
    val vs = TxnTable.versions(spark, t)
    assert(vs.nonEmpty)
    // stats-equal-data law: the manifest rowCount sum matches a real
    // snapshot count at every version (no fallback fires — the table
    // has no table-level versions, unknown stats, or live deletes)
    val expected = vs.map(v =>
      v -> TxnTable.read(spark, t, Some(v)).count()).toMap
    vs.foreach { v =>
      assert(TxnTable.countAt(spark, t, Some(v)) === expected(v), s"v$v")
    }
    // zero-data-I/O proof: with the DATA GONE the log still answers —
    // a countAt that touched any parquet would throw, not match
    assert(fs.delete(new Path(s"$t/data"), true))
    vs.foreach { v =>
      assert(TxnTable.countAt(spark, t, Some(v)) === expected(v),
        s"v$v must be served from manifest stats alone")
    }
    TxnTable.drop(spark, t) // leave no half-table behind
  }

  test("stats_serve: metadata aggregates equal a direct data scan, and survive the data's deletion (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnStatsServe(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set("n_events", "last_us", "v_sum_4dp"))
    // direct data-derived aggregates
    val t = Tables.scratch("txn_statsserve")
    val data = TxnTable.read(spark, t, None).cache()
    val nFiles = data.select((col("user_id") % 16).as("b")).distinct().count()
    val nRows = data.count()
    Seq("n_events", "last_us", "v_sum_4dp").foreach { c =>
      val d = data.agg(min(col(c)), max(col(c))).collect().head
      assert(out(c) === ((nFiles, nRows, d.getLong(0), d.getLong(1))), c)
    }
    data.unpersist()
    // zero-data-I/O proof: delete the data files; the sidecar still
    // serves the same numbers (any data read would now throw)
    assert(fs.delete(new Path(s"$t/data"), true))
    val served = TxnTable
      .read(spark, Tables.scratch("txn_statsserve_sidecar"), None)
      .groupBy(col("col"))
      .agg(count(lit(1)), sum(col("rows")), min(col("mn")), max(col("mx")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(served === out, "sidecar-served aggregates must survive data deletion")
    TxnTable.drop(spark, t)
  }

  test("bloom_skip: present probes fetch their true state row, absent probes prune everywhere, fp accounting holds (sf0.001)") {
    import spark.implicits._
    val out = operators.LakehouseCow.sinkTxnBloomSkip(spark, sf0001).collect()
    assert(out.length === 8)
    // the true per-user state from raw events
    val st = Tables.events(spark, sf0001)
      .groupBy($"user_id").agg(count(lit(1)).as("n"),
        max(Tables.nsToUs($"ts")).as("l"),
        (sum(Tables.dec4($"value")) * 10000).cast("long").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    out.foreach { r =>
      val (k, total, passed, fp, found) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(total > 0 && passed >= 0 && passed <= total, s"probe $k census")
      assert(fp === passed - found, s"probe $k fp accounting")
      if (st.contains(k)) {
        assert(found === 1L, s"present probe $k must be found (no false negatives)")
        assert((r.getLong(5), r.getLong(6), r.getLong(7)) === st(k), s"probe $k row")
      } else {
        assert(found === 0L, s"absent probe $k")
        assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((-1L, -1L, -1L)))
        assert(passed < total, s"absent probe $k must be bloom-pruned somewhere")
      }
    }
    // genuine skipping: across the 8 probes most (probe, file) tests fail
    val sumPassed = out.map(_.getLong(2)).sum
    val sumTotal = out.map(_.getLong(1)).sum
    assert(sumPassed * 2 < sumTotal, s"bloom must prune: $sumPassed/$sumTotal passed")
  }

  test("sink_txn_ndv_stats: per-file KMV samples replay exactly, the merge is lossless, and small domains serve the exact count") {
    import spark.implicits._
    val rows = operators.LakehouseCow.sinkTxnNdvStats(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val M = 2147483647L
    def h(v: Long) = ((v + 1L) * 2654435761L) % M
    // brute-force per-user state
    val st = Tables.events(spark, sf0001).groupBy($"user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def bucketDistinct(bkt: Long, v: ((Long, Long)) => Long): Long =
      st.filter(_._1 % 8 == bkt).map(v).distinct.length.toLong
    for (colName <- Seq("n_events", "user_id")) {
      def v(t: (Long, Long)): Long = if (colName == "user_id") t._1 else t._2
      val samples = st.groupBy(_._1 % 8).map { case (bkt, ts) =>
        bkt -> ts.map(v).distinct.map(h).sorted.take(16).toSeq
      }
      samples.foreach { case (bkt, hs) =>
        val (nS, theta, est) = rows((bkt, colName))
        assert(nS === hs.length.toLong, s"$colName/$bkt n_sample")
        assert(theta === hs.max, s"$colName/$bkt theta")
        // the exact-NDV-at-fixture contract: below k the sidecar
        // SERVES the exact distinct count
        val expEst =
          if (hs.length < 16) hs.length.toLong else 15L * M / hs.max
        assert(est === expEst, s"$colName/$bkt ndv_est")
        if (hs.length < 16)
          assert(est === bucketDistinct(bkt, v), s"$colName/$bkt exact")
      }
      // losslessness: the k smallest of the union of per-file samples
      // IS the k smallest over the global distinct set
      val mergedSample =
        samples.values.flatten.toSeq.distinct.sorted.take(16)
      val globalSample =
        st.map(v).distinct.map(h).sorted.take(16).toSeq
      assert(mergedSample === globalSample, s"$colName merge losslessness")
      val (nM, thetaM, _) = rows((-1L, colName))
      assert(nM === globalSample.length.toLong &&
        thetaM === globalSample.max, s"$colName merged row")
    }
  }

  test("sink_txn_cbo_estimate: planning inputs replay from raw data and the estimate formula is exact") {
    val out = operators.LakehouseCow.sinkTxnCboEstimate(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    val M = 2147483647L
    def h(v: Long) = ((v + 1L) * 2654435761L) % M
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) => (u, xs.length.toLong) }
    val uAll = byUser.keySet
    val (uCount, tot) = (uAll.size.toLong, ev.length.toLong)
    val uAct = byUser.collect {
      case (u, n) if n * uCount * 10L > tot * 11L => u
    }.toSet
    def ndv(keys: Set[Long]): Long = {
      val hs = keys.toSeq.map(h).sorted.take(64)
      if (hs.length < 64) hs.length.toLong else 63L * M / hs.max
    }
    def scen(a: Set[Long], bType: String) = {
      val b = ev.filter(_._2 == bType)
      val (ra, rb) = (a.size.toLong, b.length.toLong)
      val (na, nb) = (ndv(a), ndv(b.map(_._1).toSet))
      val truth = b.count(e => a.contains(e._1)).toLong
      val est = if (math.max(na, nb) > 0) ra * rb / math.max(na, nb) else 0L
      val ratio = if (truth > 0) est * 1048576L / truth else -1L
      (ra, rb, na, nb, est, truth, ratio)
    }
    assert(out("all_x_purchase") === scen(uAll, "purchase"))
    assert(out("all_x_click") === scen(uAll, "click"))
    assert(out("active_x_purchase") === scen(uAct, "purchase"))
    // unique-key scenarios: containment holds, truth IS r_b
    assert(out("all_x_purchase")._6 === out("all_x_purchase")._2)
    assert(out("all_x_click")._6 === out("all_x_click")._2)
    // the selective dim genuinely subsets (the scale-free 1.1x-mean cut)
    assert(uAct.nonEmpty && uAct.size < uAll.size)
  }

  test("sink_txn_hist_selectivity: estimate = brute-force interpolation replay, rollup telescopes, truths exact (sf0.001)") {
    import org.apache.spark.sql.functions._
    val out = operators.LakehouseCow.sinkTxnHistSelectivity(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // brute-force replay from raw events
    val st = Tables.events(spark, sf0001)
      .select(col("user_id"), Tables.dec4(col("value")).as("v"))
      .groupBy(col("user_id"))
      .agg((sum(col("v")) * lit(10000)).cast("long").as("vs"))
      .collect().map(r => (r.getLong(0) % 8, r.getLong(1)))
    val (mn, mx) = (st.map(_._2).min, st.map(_._2).max)
    val w = (mx - mn) / 16 + 1
    val lo = mn + (mx - mn) * 3 / 10
    val hi = mn + (mx - mn) * 9 / 20
    val side = st.groupBy { case (b, vs) => (b, (vs - mn) / w) }
      .view.mapValues(_.size.toLong).toMap
    val est = side.toSeq.map { case ((b, hb), cnt) =>
      val (blo, bhi) = (mn + hb * w, mn + (hb + 1) * w - 1)
      val ov = math.max(0L, math.min(hi, bhi) - math.max(lo, blo) + 1)
      b -> cnt * ov / w
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tru = st.filter(t => t._2 >= lo && t._2 <= hi)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val perFile = (est.keySet ++ tru.keySet).toSeq.map { b =>
      val (e, t) = (est.getOrElse(b, 0L), tru.getOrElse(b, 0L))
      (b, e, t, if (t > 0) e * 1048576L / t else -1L)
    }
    val table = (-1L, perFile.map(_._2).sum, perFile.map(_._3).sum,
      if (perFile.map(_._3).sum > 0)
        perFile.map(_._2).sum * 1048576L / perFile.map(_._3).sum
      else -1L)
    assert(out.toSet === (perFile :+ table).toSet,
      "receipt diverged from the brute-force interpolation replay")
    // truths positive and estimates within a loose band of truth at
    // the rollup (interpolation error, not divergence)
    val roll = out.find(_._1 == -1L).get
    assert(roll._3 > 0L)
    assert(roll._4 > 524288L && roll._4 < 2097152L,
      s"table-level est/true ratio ${roll._4} outside [0.5, 2]x")
  }

  /** Brute-force per-file write-time grids + band fold shared by the
    * two round-18 histogram laws: (bkt → (mn, mx, w)), and per-file
    * est/true for a band [lo, hi]. */
  private def histReplay(st: Seq[(Long, Long)])
      : (Map[Long, (Long, Long, Long)], (Long, Long)) = {
    val grids = st.groupBy(_._1).view.mapValues { rows =>
      val vs = rows.map(_._2)
      val (mn, mx) = (vs.min, vs.max)
      (mn, mx, (mx - mn) / 16 + 1)
    }.toMap
    val gmn = if (grids.isEmpty) 0L else grids.values.map(_._1).min
    val gmx = if (grids.isEmpty) 0L else grids.values.map(_._2).max
    (grids, (gmn, gmx))
  }

  private def histEst(st: Seq[(Long, Long)],
      grids: Map[Long, (Long, Long, Long)], lo: Long, hi: Long)
      : (Map[Long, Long], Map[Long, Long]) = {
    val side = st.groupBy { case (b, vs) =>
      (b, (vs - grids(b)._1) / grids(b)._3)
    }.view.mapValues(_.size.toLong).toMap
    val est = side.toSeq.map { case ((b, hb), cnt) =>
      val (mn, _, w) = grids(b)
      val (blo, bhi) = (mn + hb * w, mn + (hb + 1) * w - 1)
      val ov = math.max(0L, math.min(hi, bhi) - math.max(lo, blo) + 1)
      b -> cnt * ov / w
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tru = st.filter(t => t._2 >= lo && t._2 <= hi)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    (est, tru)
  }

  test("sink_txn_hist_maintain: receipt = brute-force heterogeneous-grid replay; carried sidecar rows are v0's BY VALUE; rewritten = the delta footprint (sf0.001)") {
    import org.apache.spark.sql.functions._
    import graft.sources.TxnTable
    val splitUs = 19740L * 86400000000L
    val out = operators.LakehouseCow.sinkTxnHistMaintain(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), Tables.nsToUs(col("ts")).as("ts_us"),
        Tables.dec4(col("value")).as("v"))
    val merged = ev.filter(col("user_id") % 64 === 3)
      .unionByName(ev.filter(col("user_id") % 64 =!= 3 &&
        col("ts_us") < splitUs))
    val st = merged.groupBy(col("user_id"))
      .agg((sum(col("v")) * lit(10000)).cast("long").as("vs"))
      .collect().map(r => (r.getLong(0) % 8, r.getLong(1))).toSeq
    val (grids, (gmn, gmx)) = histReplay(st)
    val lo = gmn + (gmx - gmn) * 3 / 10
    val hi = gmn + (gmx - gmn) * 9 / 20
    val (est, tru) = histEst(st, grids, lo, hi)
    val touched = ev
      .filter(col("ts_us") >= splitUs && col("user_id") % 64 === 3)
      .select((col("user_id") % 8).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val perFile = grids.toSeq.map { case (b, (mn, mx, w)) =>
      val (e, t) = (est.getOrElse(b, 0L), tru.getOrElse(b, 0L))
      (b, mn, mx, w, e, t, if (t > 0) e * 1048576L / t else -1L,
        if (touched(b)) 1L else 0L)
    }
    val eSum = perFile.map(_._5).sum
    val tSum = perFile.map(_._6).sum
    val roll = (-1L, gmn, gmx, -1L, eSum, tSum,
      if (tSum > 0) eSum * 1048576L / tSum else -1L, -1L)
    assert(out.toSet === (perFile :+ roll).toSet,
      "maintained receipt diverged from the heterogeneous-grid replay")
    // the delta's one-bucket footprint IS the rewritten set (%64 ⊂ %8)
    assert(touched.subsetOf(Set(3L)), s"unexpected footprint $touched")
    assert(out.filter(_._1 >= 0).count(_._8 == 1L) === touched.size)
    // physical carry: v1 sidecar rows for untouched files equal v0's
    val tSide = Tables.scratch("txn_histmaint_sidecar")
    def rows(v: Int) = TxnTable.read(spark, tSide, Some(v)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val (v0, v1) = (rows(0), rows(1))
    assert(v1.filter(t => !touched(t._1)) ===
      v0.filter(t => !touched(t._1)),
      "carried sidecar rows must pass through from v0 unchanged")
    // genuinely heterogeneous grids: at least two files disagree on w
    assert(grids.values.map(_._3).toSet.size > 1,
      "fixture degenerate: all write-time grids agree — no merge to test")
  }

  test("sink_txn_hist_decide: decisions = brute-force replay; found+missed = band truth; the histogram genuinely skips files on a tail band (sf0.001)") {
    import org.apache.spark.sql.functions._
    val out = operators.LakehouseCow.sinkTxnHistDecide(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    val st = Tables.events(spark, sf0001)
      .select(col("user_id"), Tables.dec4(col("value")).as("v"))
      .groupBy(col("user_id"))
      .agg((sum(col("v")) * lit(10000)).cast("long").as("vs"))
      .collect().map(r => (r.getLong(0) % 8, r.getLong(1))).toSeq
    val (grids, (gmn, gmx)) = histReplay(st)
    val bands = Seq(
      (0L, gmn, gmn + (gmx - gmn) / 50),
      (1L, gmn + (gmx - gmn) * 3 / 10, gmn + (gmx - gmn) * 9 / 20),
      (2L, gmn + (gmx - gmn) * 9 / 10, gmx))
    val expect = bands.map { case (bid, lo, hi) =>
      val (est, tru) = histEst(st, grids, lo, hi)
      val files = grids.keySet
      val scanned = files.filter(b => est.getOrElse(b, 0L) > 0L)
      (bid, lo, hi, files.size.toLong, scanned.size.toLong,
        est.values.sum,
        scanned.toSeq.map(b => tru.getOrElse(b, 0L)).sum,
        (files -- scanned).toSeq.map(b => tru.getOrElse(b, 0L)).sum,
        files.count(b =>
          (est.getOrElse(b, 0L) > 0L) != (tru.getOrElse(b, 0L) > 0L))
          .toLong)
    }
    assert(out.toSet === expect.toSet,
      "decision receipt diverged from the brute-force replay")
    // accounting: found + missed = the band's exact row count
    bands.zip(out.sortBy(_._1)).foreach { case ((_, lo, hi), o) =>
      val bandTruth = st.count(t => t._2 >= lo && t._2 <= hi).toLong
      assert(o._7 + o._8 === bandTruth,
        s"band ${o._1}: found ${o._7} + missed ${o._8} != $bandTruth")
    }
    // the tier earns its keep: some tail band skips at least one file
    assert(out.exists(o => o._5 < o._4),
      "no band ever skipped a file — the decision is vacuous here")
  }

  test("sink_txn_hist_stale: carried files agree stale = maintained; the rewritten file genuinely diverges; both replay from raw data (sf0.001)") {
    import org.apache.spark.sql.functions._
    val splitUs = 19740L * 86400000000L
    val out = operators.LakehouseCow.sinkTxnHistStale(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), Tables.nsToUs(col("ts")).as("ts_us"),
        Tables.dec4(col("value")).as("v"))
    def stOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"))
      .agg((sum(col("v")) * lit(10000)).cast("long").as("vs"))
      .collect().map(r => (r.getLong(0) % 8, r.getLong(1))).toSeq
    val st1 = stOf(ev.filter(col("user_id") % 64 === 3)
      .unionByName(ev.filter(col("user_id") % 64 =!= 3 &&
        col("ts_us") < splitUs)))
    val st0 = stOf(ev.filter(col("ts_us") < splitUs))
    val (g1, (gmn, gmx)) = histReplay(st1)
    val (g0, _) = histReplay(st0)
    val lo = gmn + (gmx - gmn) * 3 / 10
    val hi = gmn + (gmx - gmn) * 9 / 20
    val (estM, tru) = histEst(st1, g1, lo, hi)
    val (estS, _) = histEst(st0, g0, lo, hi)
    out.filter(_._1 >= 0).foreach { r =>
      assert(r._2 === estS.getOrElse(r._1, 0L),
        s"bkt ${r._1}: stale estimate diverged from replay")
      assert(r._3 === estM.getOrElse(r._1, 0L))
      assert(r._4 === tru.getOrElse(r._1, 0L))
      // carried files: data unchanged → the two estimates agree
      if (r._7 == 0L) assert(r._2 === r._3,
        s"carried bkt ${r._1}: stale must equal maintained")
    }
    // the receipt is non-vacuous: the rewritten file's stale estimate
    // genuinely diverges from the maintained one at this fixture
    val rw = out.filter(r => r._1 >= 0 && r._7 == 1L)
    assert(rw.nonEmpty, "no file was rewritten")
    assert(rw.exists(r => r._2 != r._3),
      "staleness changed nothing — the receipt is vacuous here")
  }

  test("sink_txn_hh_maintain: maintained list = the declared lossy fold; matched keys only ever UNDERCOUNT; totals merge exactly (sf0.001)") {
    import org.apache.spark.sql.functions._
    val splitUs = 19740L * 86400000000L
    val out = operators.LakehouseCow.sinkTxnHhMaintain(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.nsToUs(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def top8(rows: Seq[Long]): Seq[(Long, Long)] = rows
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (u, c) => (-c, u) }.take(8)
    val pre = top8(ev.filter(_._2 < splitUs).map(_._1).toSeq)
    val del = top8(ev.filter(_._2 >= splitUs).map(_._1).toSeq)
    val maint = (pre ++ del).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (u, c) => (-c, u) }.take(8)
    val truth = top8(ev.map(_._1).toSeq)
    assert(out.map(r => (r._1, r._2, r._3)).toSet ===
      maint.zipWithIndex.map { case ((u, c), i) =>
        (i + 1L, u, c) }.toSet,
      "maintained list diverged from the declared fold")
    assert(out.map(r => (r._1, r._4, r._5)).toSet ===
      truth.zipWithIndex.map { case ((u, c), i) =>
        (i + 1L, u, c) }.toSet,
      "rebuilt list diverged from the exact top-8")
    // the Misra-Gries direction: a matched key's maintained count can
    // only be missing contributions, never inventing them
    out.filter(_._6 == 1L).foreach { r =>
      assert(r._7 >= 0L, s"rank ${r._1}: est overcounts truth")
      assert(r._3 + r._7 === r._5)
    }
    // totals ARE mergeable — the contrast the receipt documents
    assert(out.forall(r => r._8 === r._9),
      "count totals must merge exactly")
  }
}
