package graft

import org.apache.spark.sql.functions._
import graft.sources.TxnTable

/** Laws for the lakehouse layer (operators/Lakehouse.scala +
  * TxnTable.commitStrict/tryCommit): schema enforcement rejects before
  * staging, optimistic claims serialize, the change feed classifies all
  * four ways, and the streaming txn sink leaves a travelable history. */
class LakehouseSpec extends SparkSuite {

  test("commitStrict: rejects type change / drop / undeclared add BEFORE staging; additive evolution opts in") {
    import spark.implicits._
    val t = Tables.scratch("lh_strict")
    TxnTable.drop(spark, t)
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    TxnTable.commitStrict(spark, t, 0, v0) // first commit: nothing to enforce
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.withColumn("k", $"k".cast("int")),
        allowAdd = true)
    }
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.drop("v"), allowAdd = true)
    }
    intercept[TxnTable.SchemaViolation] {
      TxnTable.commitStrict(spark, t, 1, v0.withColumn("extra", lit(9L)))
    }
    // rejection is pre-staging: no v1 data dir, no v1 manifest
    assert(TxnTable.versions(spark, t) === Seq(0))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/v1")))
    // the declared additive evolution commits; old snapshot keeps its schema
    TxnTable.commitStrict(spark, t, 1, v0.withColumn("extra", lit(9L)),
      allowAdd = true)
    assert(TxnTable.read(spark, t, Some(0)).columns.toSeq === Seq("k", "v"))
    assert(TxnTable.read(spark, t, None).columns.toSeq === Seq("k", "v", "extra"))
  }

  test("tryCommit: loser's claim refused and invisible, retry serializes, replay is a no-op skip") {
    import spark.implicits._
    val t = Tables.scratch("lh_occ")
    TxnTable.drop(spark, t)
    TxnTable.commit(spark, t, 0, Seq((1L, 10L)).toDF("k", "n"))
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "n")
    val b = Seq((1L, 10L), (3L, 30L)).toDF("k", "n")
    assert(TxnTable.tryCommit(spark, t, 1, a, "wa"))
    assert(!TxnTable.tryCommit(spark, t, 1, b, "wb")) // conflict detected
    // the loser's data is NOT what v1 resolves to
    val v1 = TxnTable.read(spark, t, Some(1)).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v1 === Seq((1L, 10L), (2L, 20L)))
    assert(TxnTable.tryCommit(spark, t, 2, b, "wb_retry"))
    assert(TxnTable.versions(spark, t) === Seq(0, 1, 2))
    // checkpoint-replay shape: re-claiming a committed version is a skip
    assert(!TxnTable.tryCommit(spark, t, 2, a, "replay"))
  }

  test("vacuum: retained snapshot undisturbed, orphan + expired swept, idempotent, expiry loud (injected)") {
    import spark.implicits._
    val t = Tables.scratch("lh_vac")
    TxnTable.drop(spark, t)
    TxnTable.commit(spark, t, 0, Seq((1L, 10L)).toDF("k", "n"))
    TxnTable.commit(spark, t, 1, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))
    // crashed writer: staged data, no manifest — invisible, immortal
    Seq((9L, 90L)).toDF("k", "n").write.parquet(s"$t/data/v9-crashed")
    assert(TxnTable.vacuum(spark, t, 1) === ((2, 1)))
    assert(TxnTable.versions(spark, t) === Seq(1))
    assert(TxnTable.read(spark, t, None).count() === 2L)
    intercept[IllegalArgumentException] { TxnTable.read(spark, t, Some(0)) }
    assert(TxnTable.vacuum(spark, t, 1) === ((0, 0))) // idempotent
    assert(TxnTable.read(spark, t, None).count() === 2L)
  }

  test("change feed classifies all four ways and never emits carry (injected)") {
    import spark.implicits._
    val dir = Tables.scratch("lh_cdf")
    val splitNs = 19740L * 86400000000L * 1000L
    val dayNs = 86400000000L * 1000L
    // u1/a: only old (expired -> delete); u2/b: only new (-> insert);
    // u3/c: both sides, values differ (-> update); u4/d: entirely inside
    // the [19738, 19740) overlap -> identical summaries -> carry, omitted
    Seq(
      (1L, 1L, splitNs - 10L * dayNs, "a", 1.0),
      (2L, 2L, splitNs + 1L * dayNs, "b", 1.0),
      (3L, 3L, splitNs - 10L * dayNs, "c", 1.0),
      (4L, 3L, splitNs + 2L * dayNs, "c", 1.0),
      (5L, 4L, splitNs - 1L * dayNs, "d", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val feed = operators.Lakehouse.sinkTxnChangeFeed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(feed === Map(
      (1L, "a") -> "delete", (2L, "b") -> "insert", (3L, "c") -> "update"))
    assert(!feed.contains((4L, "d"))) // carry: in both snapshots, unemitted
  }

  test("stream_exec_txn_sink leaves a travelable 4-version history converging to the batch compaction (sf0.001)") {
    import spark.implicits._
    val out = operators.Lakehouse.streamExecTxnSink(spark, sf0001).cache()
    val byV = out.groupBy($"version").count().orderBy($"version")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(byV.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // keyed state only grows as prefixes extend
    assert(byV.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // the final version IS the batch latest-state compaction
    val fin = out.filter($"version" === 3L)
      .select($"user_id", $"event_id", $"event_type", $"ts_us", $"value")
    val batch = operators.Pipelines.compactLatestState(spark, sf0001)
    assert(fin.exceptAll(batch).isEmpty && batch.exceptAll(fin).isEmpty)
    out.unpersist()
  }

  test("multi-writer OCC (scalacheck): racing increments, one winner per version, no lost updates, serial-equivalent final state") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val nWriters = 4
    val winsEach = 2
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed: Long =>
      val t = Tables.scratch(s"lh_occ_race_$seed")
      TxnTable.drop(spark, t)
      TxnTable.commit(spark, t, 0, Seq((0L, 0L)).toDF("k", "n"))
      val rnd = new java.util.Random(seed)
      val jitter = Array.fill(nWriters)(rnd.nextInt(5))
      val doubleClaims = new java.util.concurrent.atomic.AtomicInteger(0)
      val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val threads = (0 until nWriters).map { w =>
        new Thread(() => {
          try {
            var wins = 0
            while (wins < winsEach && failure.get() == null) {
              // the OCC loop: resolve the latest snapshot, merge (here:
              // increment), claim base+1; on refusal re-read and retry
              val cur = TxnTable.resolve(spark, t, None)
              val n = TxnTable.read(spark, t, Some(cur))
                .agg(org.apache.spark.sql.functions.max($"n"))
                .collect().head.getLong(0)
              Thread.sleep(jitter(w).toLong)
              if (TxnTable.tryCommit(spark, t, cur + 1,
                  Seq((0L, n + 1)).toDF("k", "n"), s"w$w")) {
                if (!claimed.add(cur + 1)) doubleClaims.incrementAndGet(): Unit
                wins += 1
              }
            }
          } catch { case e: Throwable => failure.compareAndSet(null, e): Unit }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      if (failure.get() != null) throw failure.get()
      val total = nWriters * winsEach
      val finalN = TxnTable.read(spark, t, None)
        .agg(org.apache.spark.sql.functions.max($"n"))
        .collect().head.getLong(0)
      val serial = TxnTable.versions(spark, t) == (0 to total).toSeq
      TxnTable.drop(spark, t)
      // exactly one winner per version, contiguous history, and the
      // final counter equals the commit count — no lost update survived
      (doubleClaims.get() == 0) :| "a version was claimed twice" &&
        serial :| "non-contiguous version history" &&
        (finalN == total.toLong) :| s"lost update: $finalN != $total"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }

  test("manifest corruption fails loudly at read (checksum trailer)") {
    import spark.implicits._
    val t = Tables.scratch("lh_crc")
    TxnTable.drop(spark, t)
    TxnTable.commit(spark, t, 0, Seq((1L, 10L)).toDF("k", "n"))
    val mf = java.nio.file.Paths.get(s"$t/_log/v00000.json")
    // drop Hadoop LocalFileSystem's OWN .crc sidecar: object stores
    // don't have that layer — the trailer must catch corruption alone
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$t/_log/.v00000.json.crc")): Unit
    val content = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    // flip one byte INSIDE the body (the version digit), keep the trailer
    val corrupted = content.replaceFirst("\"version\":0", "\"version\":9")
    assert(corrupted != content)
    java.nio.file.Files.write(mf, corrupted.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TxnTable.read(spark, t, None).count()
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // a truncated manifest (trailer gone) is equally loud
    java.nio.file.Files.write(mf,
      content.substring(0, content.lastIndexOf("\n@crc:")).getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      TxnTable.read(spark, t, None).count()
    }
    assert(e2.getMessage.contains("checksum") ||
      e2.getMessage.contains("trailer"), e2.getMessage)
  }

  test("delta commits write O(changed-files) manifest bytes; vacuum checkpoints the survivor before expiry") {
    import spark.implicits._
    val t = Tables.scratch("lh_delta_bytes")
    TxnTable.drop(spark, t)
    // v0: a 16-file full manifest
    (0L until 16L).map(b => (b, b * 10))
      .toDF("bkt", "user_id").write.partitionBy("bkt").parquet(s"$t/data/v0")
    val e0 = (0L until 16L).map(b =>
      TxnTable.FileEntry(b, s"$t/data/v0/bkt=$b", b * 10, b * 10))
    TxnTable.commitEntries(spark, t, 0, e0)
    // v1: one appended file, committed as a DELTA
    Seq((16L, 160L)).toDF("bkt", "user_id")
      .write.partitionBy("bkt").parquet(s"$t/data/v1")
    TxnTable.commitDelta(spark, t, 1,
      adds = Seq(TxnTable.FileEntry(16L, s"$t/data/v1/bkt=16", 160, 160)))
    def mBytes(v: Int) = java.nio.file.Files.size(
      java.nio.file.Paths.get(f"$t/_log/v$v%05d.json"))
    // the scale law: a 1-file append writes a fraction of the census
    assert(mBytes(1) * 4 < mBytes(0),
      s"delta manifest not O(changed): v1=${mBytes(1)}B vs v0=${mBytes(0)}B")
    // resolution composes: 17 files visible, all rows readable
    assert(TxnTable.fileEntries(spark, t, None).size === 17)
    assert(TxnTable.read(spark, t, None).count() === 17L)
    // vacuum(keepLast=1) must checkpoint v1 (a delta about to lose its
    // base) before expiring v0 — and the table stays fully readable
    val (_, expired) = TxnTable.vacuum(spark, t, 1)
    assert(expired === 1)
    assert(TxnTable.versions(spark, t) === Seq(1))
    assert(TxnTable.fileEntries(spark, t, None).size === 17)
    assert(TxnTable.read(spark, t, None).count() === 17L)
    intercept[IllegalArgumentException] { TxnTable.read(spark, t, Some(0)) }
  }

  test("merge-on-read delete files: visible-from-commit, folded by OPTIMIZE, expiring with their versions") {
    import spark.implicits._
    val t = Tables.scratch("lh_mor_proto")
    TxnTable.drop(spark, t)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "v")
      .coalesce(1).write.parquet(s"$t/data/v0/bkt=0")
    TxnTable.commitEntries(spark, t, 0,
      Seq(TxnTable.FileEntry(0, s"$t/data/v0/bkt=0", 1, 3)))
    // a point delete: O(keys) bytes, zero data files touched
    Seq(2L).toDF("user_id").coalesce(1).write.parquet(s"$t/data/v1/del")
    TxnTable.commitDelta(spark, t, 1,
      delAdds = Seq(TxnTable.DeleteFile(s"$t/data/v1/del", "user_id")))
    // the delete is visible the moment it commits, and v0 still isn't
    assert(TxnTable.read(spark, t, None).orderBy($"user_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(TxnTable.read(spark, t, Some(0)).count() === 3L)
    assert(TxnTable.deleteFiles(spark, t, None) ===
      Seq(TxnTable.DeleteFile(s"$t/data/v1/del", "user_id")))
    // OPTIMIZE fold: rewrite without the deleted key, retire the del file
    Seq((1L, "a"), (3L, "c")).toDF("user_id", "v")
      .coalesce(1).write.parquet(s"$t/data/v2/bkt=0")
    TxnTable.commitDelta(spark, t, 2,
      adds = Seq(TxnTable.FileEntry(0, s"$t/data/v2/bkt=0", 1, 3)),
      removes = Seq(s"$t/data/v0/bkt=0"),
      delRemoves = Seq(s"$t/data/v1/del"))
    assert(TxnTable.deleteFiles(spark, t, None).isEmpty)
    assert(TxnTable.read(spark, t, None).count() === 2L)
    // the delete file expires with its version
    val fsp = new org.apache.hadoop.fs.Path(s"$t/data/v1")
    val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    TxnTable.vacuum(spark, t, 1): Unit
    assert(!fs.exists(fsp), "delete file survived its version's expiry")
    assert(TxnTable.read(spark, t, None).count() === 2L)
  }

  test("ivm delta algebra: insert, update AND delete fold the view to the direct recompute (injected retention fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // v0: cumulative counts; v1: retention-pruned — u1/a EXPIRES (the
    // delete branch the graded cumulative-prefix key can't reach),
    // u2/b shrinks (update), u3/c enters (insert)
    val v0 = Seq((1L, "a", 5L), (2L, "b", 4L)).toDF("user_id", "event_type", "n")
    val v1 = Seq((2L, "b", 2L), (3L, "c", 7L)).toDF("user_id", "event_type", "n")
    val view0 = v0.groupBy($"event_type").agg(sum($"n").as("view_n_events"))
    val maintained = view0
      .join(operators.Lakehouse.ivmDelta(v0, v1), Seq("event_type"), "full_outer")
      .select($"event_type",
        (coalesce($"view_n_events", lit(0L)) + coalesce($"d", lit(0L)))
          .as("view_n_events"))
    val got = maintained.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 5 − 5 = 0 (expired), b: 4 − 2 = 2, c: 0 + 7 = 7
    assert(got === Map("a" -> 0L, "b" -> 2L, "c" -> 7L))
  }

  test("schema-evolution key: v0 readers undisturbed, all three invalid commits rejected (sf0.001)") {
    import spark.implicits._
    val r = operators.Lakehouse.sinkTxnSchemaEvolution(spark, sf0001).cache()
    assert(r.select($"rejected_commits").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    // v0 rows carry the -1 sentinel (column absent pre-evolution),
    // v1 rows a real distinct-user count
    assert(r.filter($"version" === 0L && $"n_users" =!= -1L).count() === 0L)
    assert(r.filter($"version" === 1L && $"n_users" <= 0L).count() === 0L)
    r.unpersist()
  }

  test("MOR upsert addressing: a version-scoped positional delete kills ONLY the superseded copies") {
    import spark.implicits._
    // the sink_txn_merge_mor subtlety, isolated at the TxnTable API:
    // the upsert's new file carries the SAME key the delete names, so
    // an equality delete would erase both copies — the 3-part
    // (src, b, pos) address must kill exactly the old one.
    val t = Tables.scratch("mor_addr_law")
    TxnTable.drop(spark, t)
    val v0 = Seq((1L, 10L, 0L, 0L, 1L), (2L, 20L, 0L, 0L, 2L))
      .toDF("user_id", "v", "b", "src", "pos")
    v0.coalesce(1).write.mode("overwrite").parquet(s"$t/data/v0/rows")
    TxnTable.commitEntries(spark, t, 0,
      Seq(TxnTable.FileEntry(0L, s"$t/data/v0/rows", 1L, 2L)))
    // upsert user 1: delete its OLD address, add the merged row (same
    // key!) under src = 1
    Seq((0L, 0L, 1L)).toDF("b", "src", "pos").coalesce(1)
      .write.mode("overwrite").parquet(s"$t/data/v1/dv")
    Seq((1L, 11L, 0L, 1L, 1L)).toDF("user_id", "v", "b", "src", "pos")
      .coalesce(1).write.mode("overwrite").parquet(s"$t/data/v1/rows")
    TxnTable.commitDelta(spark, t, 1,
      adds = Seq(TxnTable.FileEntry(0L, s"$t/data/v1/rows", 1L, 1L)),
      delAdds = Seq(TxnTable.DeleteFile(s"$t/data/v1/dv", "src,b,pos")))
    val got = TxnTable.read(spark, t, None)
      .select($"user_id", $"v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 1 appears EXACTLY once with the NEW value (the old copy at
    // (0,0,1) is dead, the new copy at (1,0,1) — same b and pos! — is
    // alive because src scopes the address); user 2 untouched
    assert(got === Map(1L -> 11L, 2L -> 20L),
      s"version-scoped positional delete mis-addressed: $got")
  }
  test("sink_txn_multi_table: the orphaned member version is invisible until a recovery marker lands (sf0.001)") {
    import spark.implicits._
    val out = operators.Lakehouse.sinkTxnMultiTable(spark, sf0001).collect()
    assert(out.nonEmpty)
    val (tA, tB) = (Tables.scratch("txn_multi_a"), Tables.scratch("txn_multi_b"))
    // the crash left A one version ahead of B and of the marker log
    assert(TxnTable.versions(spark, tA) === Seq(0, 1, 2))
    assert(TxnTable.versions(spark, tB) === Seq(0, 1))
    // the orphan really differs from the resolved version (slice 9 landed)
    val a1 = TxnTable.read(spark, tA, Some(1)).agg(sum(col("n_events"))).collect().head.getLong(0)
    val a2 = TxnTable.read(spark, tA, Some(2)).agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(a2 > a1, "txn2's A member commit must contain extra rows")
    // every graded row resolved txn1 for BOTH tables
    out.foreach { r =>
      assert(r.getLong(6) === 1L && r.getLong(7) === 1L && r.getLong(8) === 1L)
      assert(r.getLong(9) === 3L && r.getLong(10) === 2L)
    }
    // RECOVERY: finish the B member commit and land the txn2 marker —
    // the reader flips to txn2 for both tables atomically
    val evB = Tables.events(spark, sf0001)
      .select(col("event_type"), Tables.nsToUs(col("ts")).as("ts_us"),
        col("user_id"), Tables.dec4(col("value")).as("v"))
      .filter(col("ts_us") < lit(19740L * 86400000000L)
        || (col("user_id") % 64 === 7) || (col("user_id") % 64 === 9))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("b_n_events"), max(col("ts_us")).as("b_last_us"),
        (sum(col("v")) * 10000).cast("long").as("b_v_sum_4dp"))
    TxnTable.commit(spark, tB, 2, evB)
    val txnLog = new java.io.File(Tables.scratch("txn_multi_log"))
    java.nio.file.Files.writeString(
      new java.io.File(txnLog, "txn-00002").toPath, "2,2")
    val last = txnLog.listFiles().map(_.getName).filter(_.startsWith("txn-")).sorted.last
    assert(last === "txn-00002")
    val Array(av, bv) = java.nio.file.Files
      .readString(new java.io.File(txnLog, last).toPath).split(",").map(_.toInt)
    assert((av, bv) === ((2, 2)))
    val aRec = TxnTable.read(spark, tA, Some(av)).agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(aRec === a2, "recovery must surface the previously-orphaned A@v2")
    TxnTable.drop(spark, tA); TxnTable.drop(spark, tB)
  }

  test("vacuumMarkers: the orphaned member commit is reclaimed; marked histories and the resolved read are untouched") {
    import spark.implicits._
    // rebuild the crashed-txn2 state: A@{0,1,2}, B@{0,1}, markers 0..1
    operators.Lakehouse.sinkTxnMultiTable(spark, sf0001).collect()
    val (tA, tB) = (Tables.scratch("txn_multi_a"), Tables.scratch("txn_multi_b"))
    val txnLog = new java.io.File(Tables.scratch("txn_multi_log"))
    val before = Seq((tA, 0), (tA, 1), (tB, 0), (tB, 1)).map { case (t, v) =>
      (t, v) -> TxnTable.read(spark, t, Some(v)).collect().map(_.toSeq).toSet
    }.toMap
    // keep both markers: the ONLY reclaimable version is the orphan A@2
    val (expired, removed) =
      operators.Lakehouse.vacuumMarkers(spark, txnLog, Seq(tA, tB), 2)
    assert((expired, removed) === ((0, 1)), "exactly the orphan is removed")
    assert(TxnTable.versions(spark, tA) === Seq(0, 1))
    assert(TxnTable.versions(spark, tB) === Seq(0, 1))
    assert(!new java.io.File(s"$tA/data/v2").exists(),
      "the orphan's data dir must be physically gone")
    assert(txnLog.listFiles().map(_.getName).count(_.startsWith("txn-")) === 2)
    // marked histories byte-identical, resolved read unchanged
    before.foreach { case ((t, v), rows) =>
      assert(TxnTable.read(spark, t, Some(v)).collect().map(_.toSeq).toSet
        === rows, s"$t@v$v disturbed by the GC")
    }
    // retention: keep only the latest marker — txn0's member versions go
    val (expired2, removed2) =
      operators.Lakehouse.vacuumMarkers(spark, txnLog, Seq(tA, tB), 1)
    assert((expired2, removed2) === ((1, 2)), "marker 0 + both v0 members")
    assert(TxnTable.versions(spark, tA) === Seq(1))
    assert(TxnTable.versions(spark, tB) === Seq(1))
    intercept[IllegalArgumentException] {
      TxnTable.read(spark, tA, Some(0)).collect()
    }
    assert(TxnTable.read(spark, tA, Some(1)).collect().map(_.toSeq).toSet
      === before((tA, 1)), "the latest marked version survives intact")
    TxnTable.drop(spark, tA); TxnTable.drop(spark, tB)
  }

  test("sink_txn_vacuum_markers: orphan physically gone, GC idempotent, corrupt marker aborts BEFORE any delete (sf0.001)") {
    import org.apache.hadoop.fs.Path
    val out = operators.Lakehouse.sinkTxnVacuumMarkers(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    // census columns carried on every row
    assert(out.forall(r => r.getLong(6) == 1L && r.getLong(7) == 3L
      && r.getLong(8) == 1L && r.getLong(9) == 1L))
    val tA = Tables.scratch("txn_gc_a")
    val tB = Tables.scratch("txn_gc_b")
    val log = new java.io.File(Tables.scratch("txn_gc_log"))
    // only the marked v1 survives on either member; the orphan's data
    // dir is physically gone
    assert(TxnTable.versions(spark, tA) === Seq(1))
    assert(TxnTable.versions(spark, tB) === Seq(1))
    val fs = new Path(tA).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$tA/data/v2")), "orphan data survives")
    assert(!fs.exists(new Path(s"$tA/data/v0")), "expired data survives")
    // idempotent: a second GC with the same retention reclaims nothing
    assert(operators.Lakehouse.vacuumMarkers(spark, log, Seq(tA, tB), 1)
      === ((0, 0)))
    // corrupt-marker guard: a short surviving marker aborts the GC
    // BEFORE any marker expires or any version is removed
    val badLog = new java.io.File(Tables.scratch("txn_gc_badlog"))
    if (badLog.exists()) badLog.listFiles().foreach(_.delete())
    badLog.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(badLog, "txn-00000").toPath, "0,0")
    java.nio.file.Files.writeString(
      new java.io.File(badLog, "txn-00001").toPath, "1") // short!
    intercept[IllegalArgumentException] {
      operators.Lakehouse.vacuumMarkers(spark, badLog, Seq(tA, tB), 1)
    }
    assert(badLog.listFiles().length === 2,
      "corrupt-marker abort must leave the log intact")
    assert(TxnTable.versions(spark, tA) === Seq(1),
      "corrupt-marker abort must not remove member versions")
  }

  test("sink_txn_cbo_choose: receipt internally consistent; the chosen strategy materializes in the plan (sf0.001)") {
    import org.apache.spark.sql.functions._
    val rows = operators.LakehouseCow.sinkTxnCboChoose(spark, sf0001)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (rFact, rProbe) = (r.getLong(2), r.getLong(3))
      val (ndvDim, ndvFact) = (r.getLong(4), r.getLong(5))
      val (est, tru) = (r.getLong(6), r.getLong(7))
      val (eb, tb, fl) = (r.getLong(8), r.getLong(9), r.getLong(10))
      // the estimate is the containment formula over the receipt's own
      // planning inputs; the decisions are the ×8 rule; flipped is XOR
      assert(est === (if (ndvFact > 0)
        rFact * math.min(ndvDim, ndvFact) / ndvFact else 0L),
        s"${r.getString(0)}: est_inter breaks the formula")
      assert(eb === (if (est * 8 <= rProbe) 1L else 0L))
      assert(tb === (if (tru * 8 <= rProbe) 1L else 0L))
      assert(fl === (if (eb != tb) 1L else 0L))
    }
    // plan law: the decision the estimate takes is the plan that runs —
    // rebuild each scenario's join AS THE KEY DOES from the committed
    // tables, under the key's own decision, with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dims = Map("active_dim" -> "cbo2_act", "all_dim" -> "cbo2_all",
        "sparse_dim" -> "cbo2_sparse")
      rows.foreach { r =>
        val dim = TxnTable.read(spark, Tables.scratch(dims(r.getString(0))))
        val fact = TxnTable.read(spark, Tables.scratch("cbo2_fact"))
        val probe = TxnTable.read(spark, Tables.scratch("cbo2_probe"))
        val inter = fact.join(dim, Seq("user_id"), "left_semi")
        val joined =
          if (r.getLong(8) == 1L)
            probe.join(broadcast(inter), Seq("user_id"))
          else probe.hint("merge").join(inter, Seq("user_id"))
        val plan = joined.queryExecution.executedPlan.toString
        if (r.getLong(8) == 1L)
          assert(plan.contains("BroadcastHashJoin"),
            s"${r.getString(0)}: broadcast decision not in plan:\n$plan")
        else
          assert(plan.contains("SortMergeJoin"),
            s"${r.getString(0)}: shuffle decision not in plan:\n$plan")
        assert(joined.count() === r.getLong(11),
          s"${r.getString(0)}: join count is strategy-independent")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sink_txn_cbo_join_order: decisions follow the estimates, truths follow the data, the final count is order-independent (sf0.001)") {
    val rows = operators.LakehouseCow.sinkTxnCboJoinOrder(spark, sf0001)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (rFact, ndvFact) = (r.getLong(1), r.getLong(2))
      val (ndvA, ndvB) = (r.getLong(3), r.getLong(4))
      val (estA, estB) = (r.getLong(5), r.getLong(6))
      val (truA, truB) = (r.getLong(7), r.getLong(8))
      val (cA, tA2, fl) = (r.getLong(9), r.getLong(10), r.getLong(11))
      def est(nd: Long) = if (ndvFact > 0)
        rFact * math.min(nd, ndvFact) / ndvFact else 0L
      assert(estA === est(ndvA) && estB === est(ndvB),
        s"${r.getString(0)}: estimate breaks the containment formula")
      assert(cA === (if (estA <= estB) 1L else 0L))
      assert(tA2 === (if (truA <= truB) 1L else 0L))
      assert(fl === (if (cA != tA2) 1L else 0L))
      // the final count can never exceed either intermediate
      assert(r.getLong(12) <= math.min(truA, truB))
    }
    // the executed order is data-verifiable: re-run both orders from
    // the committed tables and confirm the count is order-independent
    val fact = TxnTable.read(spark, Tables.scratch("cbo3_fact"))
    val dA = TxnTable.read(spark, Tables.scratch("cbo3_act"))
    val dB = TxnTable.read(spark, Tables.scratch("cbo3_half"))
    val ab = fact.join(dA, Seq("user_id"), "left_semi")
      .join(dB, Seq("user_id"), "left_semi").count()
    val ba = fact.join(dB, Seq("user_id"), "left_semi")
      .join(dA, Seq("user_id"), "left_semi").count()
    assert(ab === ba)
    assert(ab === rows.find(_.getString(0) == "active_vs_half")
      .get.getLong(12))
  }

  test("sink_txn_cbo_skew_salt: the two regimes decide differently; the decisions follow the 1/8 budget; salting is result-invariant and materializes in the plan (sf0.001)") {
    import org.apache.spark.sql.functions._
    val rows = operators.LakehouseCow.sinkTxnCboSkewSalt(spark, sf0001)
      .collect()
    assert(rows.length === 2)
    val byScen = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      val (rFact, estMax, estTot) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      val (truMax, salted, truthSalted, flipped) =
        (r.getLong(5), r.getLong(7), r.getLong(8), r.getLong(9))
      assert(salted ===
        (if (estTot > 0 && estMax * 8 > estTot) 1L else 0L),
        s"${r.getString(0)}: decision breaks the 1/8 budget rule")
      assert(truthSalted === (if (truMax * 8 > rFact) 1L else 0L))
      assert(flipped === (if (salted != truthSalted) 1L else 0L))
      // dim = the fact's own key domain, so the join is total
      assert(r.getLong(10) === rFact,
        s"${r.getString(0)}: join_rows must equal r_fact")
    }
    // the fixture exercises BOTH regimes: the 5-value type key salts,
    // the uniform user key stays plain
    assert(byScen("type_key").getLong(7) === 1L, "type_key must salt")
    assert(byScen("user_key").getLong(7) === 0L, "user_key must not")
    // salting invariance + plan shape: same rows either way, and the
    // salted plan genuinely joins on the widened (k, salt) key
    import spark.implicits._
    val fact = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L))
      .toDF("k", "event_id")
    val dim = fact.select($"k").distinct()
    val plain = operators.LakehouseCow.skewJoin(fact, dim, salted = false)
    val saltedDf = operators.LakehouseCow.skewJoin(fact, dim, salted = true)
    assert(plain.collect().map(_.toSeq).toSet ===
      saltedDf.collect().map(_.toSeq).toSet,
      "salting must be result-invariant")
    val plan = saltedDf.queryExecution.executedPlan.toString
    assert(plan.contains("salt"),
      s"salted plan must join on the widened key:\n$plan")
    assert(!plain.queryExecution.executedPlan.toString.contains("salt"))
  }
}
