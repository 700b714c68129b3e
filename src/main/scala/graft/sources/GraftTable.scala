package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal transactional commit log over the streaming export tree —
  * the role BASELINE.md assigns to Delta/Iceberg, built on nothing but
  * parquet + atomic rename (runs on local disk, HDFS, or any HCFS
  * connector; no external dependencies are available in this build).
  *
  * Layout:
  * {{{
  *   <root>/_graft_log/v<batchId>.json   // one commit per micro-batch
  *   <root>/_graft_log/checkpoint.v<N>.json  // folded history (per-version)
  *   <root>/<sink>/year=…/batch_id=N/…   // data files (writeBatch layout)
  * }}}
  *
  * Protocol:
  *  - Writers land data files first (idempotent per-batch dynamic
  *    overwrite — [[graft.operators.ExportParquet.writeBatch]]), then
  *    publish ONE commit file listing every file the batch produced
  *    across ALL sinks, via write-to-temp + atomic rename. The rename is
  *    the commit point: a crash anywhere earlier leaves only invisible
  *    data; a batch replay rewrites the same files and re-publishes the
  *    same commit (idempotent — version = batch id).
  *  - Readers list the log and read exactly the committed files, so the
  *    raw and aggregate sinks of one batch become visible ATOMICALLY —
  *    the cross-sink consistency a crash between two plain writes would
  *    otherwise break (visibility-level exactly-once on top of the
  *    file-level idempotence).
  *  - Each commit also records the parquet footer schema of every sink
  *    it touched. Commits enforce ADDITIVE schema evolution (Delta-style
  *    enforcement): new columns may appear; an existing column changing
  *    its type, or disappearing, aborts the commit before publication.
  *    [[read]] turns on `mergeSchema` exactly when committed versions
  *    disagree on a sink's schema, so old files surface new columns as
  *    nulls.
  *  - Because commits are append-only deltas, history is free:
  *    [[readAsOf]] reads the union of versions ≤ the requested batch id
  *    (Delta's `versionAsOf`). [[checkpoint]] folds commit FILES into
  *    one manifest but keeps the per-version structure, so time travel
  *    survives folding and snapshot listing stays O(1) log files.
  *
  * Scale: a commit is O(files-per-batch) bytes of JSON; reads list one
  * directory of commit files. Periodic [[checkpoint]] folds the log's
  * prefix into a single manifest so listing stays O(recent commits), the
  * same shape as Delta's checkpoint parquet. [[vacuum]] deletes data
  * files no commit references (crash-window orphans, superseded
  * replay output) once they age past a TTL — the Delta `VACUUM` analog,
  * with the same "TTL must exceed any in-flight writer" contract.
  */
object GraftTable {

  private val LogDir = "_graft_log"
  private val Checkpoint = "checkpoint.json"

  /** One published version: the files batch `batchId` added, the files
    * it logically REMOVED from the snapshot (copy-on-write row-level
    * deletes — bytes stay on disk for time travel), the footer
    * schema (base64 of Spark schema JSON) per sink it touched, and an
    * optional idempotence marker (`queryId:epochId`) stamped by the
    * streaming sink — a restarted stream finds its replayed epoch's
    * marker and skips re-publication (Delta's `txn` action). */
  final case class Version(batchId: Long, files: Seq[String],
                           schemas: Map[String, String],
                           removed: Seq[String] = Nil,
                           txn: Option[String] = None,
                           ts: Option[Long] = None)

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def version(batchId: Long) = f"v$batchId%020d.json"

  /** Per-root write serialization WITHIN one JVM. The copy-on-write
    * verbs and [[commit]] stage data under `batch_id=nextBatchId()`
    * with dynamic partition overwrite BEFORE the log's atomic publish
    * arbitrates — two local writers picking the same id would clobber
    * each other's staged directories, and the loser's retry cannot
    * restore the winner's deleted part-files. One JVM is the
    * deployment shape (a single driver running the stream plus its
    * maintenance passes), so a monitor per table root closes the race
    * where it actually occurs. CROSS-PROCESS mutation remains
    * unsupported (the same restriction class as Delta without an
    * atomic LogStore): [[commit]]'s replay check detects a
    * cross-process collision after the fact but cannot undo it. */
  private val writeLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private[sources] def writeLock(root: String): Object =
    writeLocks.getOrElseUpdate(root, new Object)

  /** Files under `root` belonging to `batchId` (the writeBatch layout's
    * `batch_id=N` directories), as root-relative paths.
    *
    * Walked manually, descending only through partition directories and
    * opening only the target batch's dir — NOT a full recursive listing
    * of the table: this runs once per micro-batch commit, and listing
    * other batches' files would make commit latency grow with TOTAL
    * table size (months of batch directories) instead of with the
    * batch being committed. */
  /** Runaway guard on partition nesting — NOT a coverage cap: the walk
    * below self-terminates at the layout's real depth, so any sane
    * depth is fully covered and a deeper-than-this tree fails loudly
    * instead of silently dropping files from the manifest (which
    * vacuum would later delete as unreferenced — data loss). */
  private val MaxPartitionDepth = 64
  private def batchFiles(hfs: FileSystem, root: Path, batchId: Long): Seq[String] = {
    if (!hfs.exists(root)) return Nil
    val rootUri = root.toUri.getPath
    val target = s"batch_id=$batchId"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // manual walk that descends ONLY through partition directories and
    // opens ONLY the target batch's dir: other batches contribute a
    // name in their parent's listing (unavoidable under any listing
    // scheme) but their FILES are never enumerated. A glob with a
    // wildcard leaf (the previous descend probe) listed every file of
    // every batch at the final level — O(total table files) per commit.
    def walk(dir: Path, depth: Int): Unit = {
      if (depth > MaxPartitionDepth)
        throw new IllegalStateException(
          s"partition nesting under $root exceeds $MaxPartitionDepth " +
            "levels — refusing to commit (deeper files would be " +
            "orphaned from the manifest)")
      hfs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val n = st.getPath.getName
          if (n == target)
            hfs.listStatus(st.getPath).foreach { f =>
              if (f.isFile && f.getPath.getName.endsWith(".parquet"))
                out += f.getPath.toUri.getPath
                  .stripPrefix(rootUri).stripPrefix("/")
            }
          else if (!n.startsWith("batch_id=") && !n.startsWith(".") &&
                   !n.startsWith("_"))
            walk(st.getPath, depth + 1) // a partition dir — descend
          // dot/underscore dirs are invisible everywhere in the layout:
          // the DSv2 writers stage under `.staging-…` and a commit walk
          // that descended into one could claim in-flight bytes
        }
      }
    }
    walk(root, 0)
    out.toSeq.sorted
  }

  /** True when batch `batchId` is already published — the whole batch
    * (data writes included) can then be skipped on replay: the commit's
    * existence proves every sink completed, and re-running the writes
    * would orphan the manifest's file list (overwrite generates fresh
    * part-file names). */
  def isCommitted(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (hfs, rootPath) = fs(spark, root)
    // fast path: the commit file stands. After a checkpoint folds a
    // version, its commit FILE is gone but the version is still durably
    // committed (it lives in the manifest) — a replayed batch must skip
    // it, not redo it, so fall back to the folded history.
    hfs.exists(new Path(new Path(rootPath, LogDir), version(batchId))) ||
      versions(spark, root).contains(batchId)
  }

  private def sinkOf(rel: String): String = rel.takeWhile(_ != '/')

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  /** Footer schema per sink for this file set (one footer read per sink,
    * driver-side; partition columns live in the directory names, not the
    * footer, so they never participate in evolution checks). */
  private def sinkSchemas(spark: SparkSession, root: String,
                          files: Seq[String]): Map[String, String] =
    files.groupBy(sinkOf).map { case (sink, fs) =>
      val schema = spark.read.parquet(s"$root/${fs.head}").schema
      sink -> b64e.encodeToString(
        schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  private def decodeSchema(b64: String): StructType =
    DataType.fromJson(new String(b64d.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]

  /** Additive-only enforcement: every column of `prev` must survive in
    * `next` with a structurally identical type (nullability free to
    * change). New columns are welcome — old files read them as null. */
  private def checkEvolution(sink: String, prev: StructType,
                             next: StructType): Unit = {
    val nextByName = next.fields.map(f => f.name -> f).toMap
    prev.fields.foreach { pf =>
      nextByName.get(pf.name) match {
        case None => throw new IllegalStateException(
          s"schema evolution rejected for sink '$sink': column " +
            s"'${pf.name}' dropped (additive changes only — rename via " +
            "an added column + backfill)")
        case Some(nf)
          if !DataType.equalsStructurally(pf.dataType, nf.dataType,
            ignoreNullability = true) =>
          throw new IllegalStateException(
            s"schema evolution rejected for sink '$sink': column " +
              s"'${pf.name}' changed type ${pf.dataType.simpleString} → " +
              s"${nf.dataType.simpleString}")
        case _ => ()
      }
    }
  }

  /** Publish batch `batchId`: one atomic commit covering every file the
    * batch landed under `root` (all sinks), with per-sink footer
    * schemas. Idempotent — a replayed batch re-publishes the same
    * version and is a no-op if the commit already exists (after
    * verifying its files are still on disk, which catches a concurrent
    * writer's destructive overwrite of this batch's directories). */
  def commit(spark: SparkSession, root: String, batchId: Long): Seq[String] =
      writeLock(root).synchronized {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    val target = new Path(log, version(batchId))
    if (hfs.exists(target)) { // replay after a completed commit
      val published = parseVersion(readJson(hfs, target))
        .map(_.files).getOrElse(Nil)
      val lost = published.filterNot(f => hfs.exists(new Path(rootPath, f)))
      if (lost.nonEmpty) throw new IllegalStateException(
        s"commit v$batchId references ${lost.size} missing file(s) " +
          s"(first: ${lost.head}) — a concurrent writer overwrote this " +
          "batch's directories; the table needs a single writer per batch")
      return published
    }
    val hist = history(spark, root)
    // replay after the version was FOLDED into a checkpoint: the commit
    // file is gone but the version is committed — re-publishing would
    // duplicate it (and could fight a later compaction for the batch
    // dirs). Same lost-file check as the standing-commit replay path.
    hist.find(_.batchId == batchId).foreach { v =>
      val lost = v.files.filterNot(f => hfs.exists(new Path(rootPath, f)))
      if (lost.nonEmpty) throw new IllegalStateException(
        s"commit v$batchId references ${lost.size} missing file(s) " +
          s"(first: ${lost.head}) — a concurrent writer overwrote this " +
          "batch's directories; the table needs a single writer per batch")
      return v.files
    }
    val files = batchFiles(hfs, rootPath, batchId)
    val schemas = sinkSchemas(spark, root, files)
    val prior = hist.filter(_.batchId < batchId)
    schemas.foreach { case (sink, b64) =>
      checkCommitEvolution(prior, sink, decodeSchema(b64))
    }
    publish(hfs, log, batchId,
      versionJson(stampNow(Version(batchId, files, schemas))), files)
  }

  /** Commit-side evolution gate. DROPS are judged against the latest
    * FILE-BEARING version's schema — the lineage of actual data — so an
    * [[evolveSchema]]-declared column a writer has not materialized yet
    * never bricks that writer; a column real files carried that
    * vanishes still aborts (the data-loss signal this gate exists for).
    * TYPES are judged against the full recorded lineage: a declared
    * column must arrive with its declared type. */
  private def checkCommitEvolution(prior: Seq[Version], sink: String,
                                   next: StructType): Unit = {
    prior.filter(v => v.files.exists(_.startsWith(sink + "/")))
      .flatMap(_.schemas.get(sink)).lastOption.map(decodeSchema)
      .foreach(prev => checkEvolution(sink, prev, next))
    prior.flatMap(_.schemas.get(sink)).lastOption.map(decodeSchema)
      .foreach { full =>
        val nextByName = next.fields.map(f => f.name -> f).toMap
        full.fields.foreach { pf =>
          nextByName.get(pf.name).foreach { nf =>
            if (!DataType.equalsStructurally(pf.dataType, nf.dataType,
                ignoreNullability = true))
              throw new IllegalStateException(
                s"schema evolution rejected for sink '$sink': column " +
                  s"'${pf.name}' changed type ${pf.dataType.simpleString} " +
                  s"→ ${nf.dataType.simpleString}")
          }
        }
      }
  }

  /** Publish an EXPLICIT file list as version `batchId` — the commit
    * the DSv2 write paths use: tasks report the exact root-relative
    * files they wrote, so there is no batch-directory walk and the
    * staged directory id never has to equal the version id until the
    * caller promotes it. Evolution-checked like [[commit]]. `removed`
    * marks a truncating write (INSERT OVERWRITE / Complete mode);
    * a removal-only version re-records the sink's latest schema so the
    * emptied sink stays schema'd. `txn` stamps streaming idempotence.
    * The caller must hold [[writeLock]] for `root`. */
  private[sources] def commitFiles(spark: SparkSession, root: String,
                                   batchId: Long, files: Seq[String],
                                   removed: Seq[String] = Nil,
                                   txn: Option[String] = None): Seq[String] = {
    val (hfs, rootPath) = fs(spark, root)
    val hist = history(spark, root)
    val schemas =
      if (files.nonEmpty) {
        val ss = sinkSchemas(spark, root, files)
        ss.foreach { case (sink, b64) =>
          checkCommitEvolution(hist.filter(_.batchId < batchId), sink,
            decodeSchema(b64))
        }
        ss
      } else
        removed.map(sinkOf).distinct.flatMap { sink =>
          hist.flatMap(_.schemas.get(sink)).lastOption.map(sink -> _)
        }.toMap
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, batchId,
      versionJson(stampNow(Version(batchId, files.sorted, schemas, removed, txn))),
      files.sorted)
  }

  /** The version a streaming epoch already published under this
    * idempotence marker, if any — the replay check. */
  private[sources] def txnVersion(spark: SparkSession, root: String,
                                  txn: String): Option[Long] =
    history(spark, root).find(_.txn.contains(txn)).map(_.batchId)

  /** Declarative schema evolution — `ALTER TABLE … ADD COLUMNS`:
    * publish a FILES-EMPTY version whose recorded schema is the sink's
    * latest plus `newCols`. Readers that pin the recorded schema (the
    * catalog's named tables) surface the new columns immediately,
    * null-filled from files that predate them; writers materialize the
    * columns whenever they start including them. Additive only, like
    * every other evolution here: adding a column that exists aborts.
    * Returns the published version. */
  def evolveSchema(spark: SparkSession, root: String, sink: String,
                   newCols: StructType): Long =
      writeLock(root).synchronized {
    require(newCols.nonEmpty, "ADD COLUMNS needs at least one column")
    val hist = history(spark, root)
    val prev = hist.flatMap(_.schemas.get(sink)).lastOption.map(decodeSchema)
      .getOrElse(throw new IllegalStateException(
        s"sink '$sink' has no recorded schema (never committed) — " +
          "evolution needs a base schema; commit a first batch"))
    newCols.fields.foreach { f =>
      require(!prev.fieldNames.contains(f.name),
        s"column '${f.name}' already exists in sink '$sink'")
    }
    val next = StructType(prev.fields ++ newCols.fields)
    val b64 = b64e.encodeToString(
      next.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val id = nextBatchIdFrom(hist)
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, id,
      versionJson(stampNow(Version(id, Nil, Map(sink -> b64)))), Nil)
    id
  }

  /** Atomically publish a version file, arbitrating racing writers:
    * the rename onto the version name is the commit point; a loser
    * whose content matches the winner's (replayed batch) succeeds
    * idempotently, a loser with different content gets
    * [[ConcurrentCommitException]]. */
  private[graft] def publish(hfs: FileSystem, log: Path, batchId: Long,
                             json: String, files: Seq[String])
      : Seq[String] = {
    val target = new Path(log, version(batchId))
    // writer-unique tmp name: two racing writers must never share a
    // staging file, or the loser's delete could destroy the winner's
    // pre-rename bytes
    val tmp = new Path(log,
      s".tmp-${java.util.UUID.randomUUID()}-${version(batchId)}")
    val out = hfs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // Arbitration primitive per filesystem: HDFS/object-store rename
    // FAILS when the destination exists — but the local filesystem's
    // rename is POSIX rename(2), which silently REPLACES it, letting a
    // losing writer overwrite the winner's commit. On file:// use
    // hard-link creation instead: link(2) fails atomically iff the
    // target exists, restoring fail-if-present semantics.
    def renameNoReplace(): Boolean =
      if (hfs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          hfs.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else hfs.rename(tmp, target)
    if (!renameNoReplace()) {
      hfs.delete(tmp, false)
      require(hfs.exists(target), s"commit rename failed for $target")
      // lost the publish race for this version. Accept iff the winner
      // published the same file set (a replayed/duplicate attempt of
      // the same batch); otherwise surface the conflict so the caller
      // restages under a fresh version — Delta-style optimistic
      // concurrency, arbitrated by the atomic rename.
      val winner = parseVersion(readJson(hfs, target))
        .map(_.files).getOrElse(Nil)
      if (winner.toSet != files.toSet) throw new ConcurrentCommitException(
        s"version $batchId was concurrently committed with a different " +
          s"file set (${winner.size} vs ${files.size} files) — restage " +
          "under nextBatchId() and retry")
      winner
    } else files
  }

  /** A racing writer lost the atomic publish for its version AND the
    * winner's content differs — retry with a fresh [[nextBatchId]]. */
  final class ConcurrentCommitException(msg: String)
      extends IllegalStateException(msg)

  /** Next free version for an optimistic ad-hoc writer: one past the
    * newest committed version. Two racers can still pick the same id —
    * the commit's atomic rename arbitrates and the loser gets a
    * [[ConcurrentCommitException]] to retry with a re-read id: Delta's
    * optimistic-concurrency loop without a coordination service. */
  def nextBatchId(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption.map(_ + 1L).getOrElse(0L)

  private def versionJson(v: Version): String = {
    val fs = v.files.map(f => "\"" + f + "\"").mkString(",")
    val rm = if (v.removed.isEmpty) ""
      else v.removed.map(f => "\"" + f + "\"")
        .mkString(""","removed":[""", ",", "]")
    val ss = v.schemas.toSeq.sortBy(_._1)
      .map { case (k, s) => "\"" + k + "\":\"" + s + "\"" }.mkString(",")
    val tx = v.txn.map(t => s""","txn":"$t"""").getOrElse("")
    val ts = v.ts.map(t => s""","ts":$t""").getOrElse("")
    s"""{"batchId":${v.batchId},"files":[$fs]$rm,"schemas":{$ss}$tx$ts}"""
  }

  /** Stamp the commit wall-clock (epoch millis) a version is published
    * with — the `TIMESTAMP AS OF` resolution key. Stamped at publish
    * time by every commit path; versions written by older engines lack
    * it and resolve through their commit file's modification time
    * (Delta's pre-ICT behavior). */
  private def stampNow(v: Version): Version =
    v.copy(ts = Some(System.currentTimeMillis()))

  // A commit file and a checkpoint's version entries share one shape;
  // file paths contain no quotes/brackets and schemas are base64, so a
  // non-greedy regex parse is exact. "removed" is optional (row-level
  // deletes only), "schemas" is optional for logs written before schema
  // tracking, "txn" is optional (streaming-sink versions only).
  private val VersionRe =
    ("""\{"batchId":(\d+),"files":\[([^\]]*)\]""" +
      """(?:,"removed":\[([^\]]*)\])?(?:,"schemas":\{([^}]*)\})?""" +
      """(?:,"txn":"([^"]+)")?(?:,"ts":(\d+))?\}""").r
  private val StrRe = "\"([^\"]+)\"".r
  private val PairRe = "\"([^\"]+)\":\"([^\"]+)\"".r

  private def parseVersions(json: String): Seq[Version] =
    VersionRe.findAllMatchIn(json).map { m =>
      def strs(g: String) =
        Option(g).map(s => StrRe.findAllMatchIn(s).map(_.group(1)).toSeq)
          .getOrElse(Nil)
      val schemas = Option(m.group(4)).map { g =>
        PairRe.findAllMatchIn(g).map(x => x.group(1) -> x.group(2)).toMap
      }.getOrElse(Map.empty[String, String])
      Version(m.group(1).toLong, strs(m.group(2)), schemas, strs(m.group(3)),
        Option(m.group(5)), Option(m.group(6)).map(_.toLong))
    }.toSeq

  private def parseVersion(json: String): Option[Version] =
    parseVersions(json).headOption

  private def readJson(hfs: FileSystem, p: Path): String = {
    val in = hfs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Full committed history, oldest first: the checkpoint's folded
    * per-version entries plus every newer commit file. */
  def history(spark: SparkSession, root: String): Seq[Version] = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    if (!hfs.exists(log)) return Nil
    val entries = hfs.listStatus(log).map(_.getPath)
      .filter(p => !p.getName.startsWith("."))
    // newest manifest wins; older ones (or the legacy mutable name) may
    // coexist transiently mid-checkpoint and are simply ignored
    val folded = entries
      .flatMap(p => checkpointThrough(p.getName).map(_ -> p))
      .sortBy(_._1).lastOption
      .map { case (_, p) => parseVersions(readJson(hfs, p)) }.getOrElse(Nil)
    val foldedIds = folded.map(_.batchId).toSet
    val commits = entries
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".json"))
      .sortBy(_.getName)
      .flatMap(p => parseVersion(readJson(hfs, p)))
      .filterNot(v => foldedIds.contains(v.batchId))
    (folded ++ commits).sortBy(_.batchId)
  }

  /** Committed batch ids, oldest first (Delta's `DESCRIBE HISTORY`). */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    history(spark, root).map(_.batchId)

  /** Per-version EFFECTIVE commit timestamps (epoch millis), oldest
    * first, aligned with [[history]]. Three layers, weakest last:
    * the stamped `ts` (every commit since it exists), the commit
    * file's modification time (pre-ts logs whose files still exist),
    * and carry-forward of the previous version's value (pre-ts
    * versions already folded into a checkpoint). A final running-max
    * pass makes the sequence monotone in version order — wall clocks
    * can step backwards between commits, but `TIMESTAMP AS OF` must
    * map each instant to exactly one version prefix (Delta adjusts
    * file mtimes the same way). */
  def versionTimestamps(spark: SparkSession, root: String)
      : Seq[(Long, Option[Long])] = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    // ONE listStatus for every commit file's mtime — not a per-version
    // exists()+getFileStatus() pair, which is O(versions) serial
    // namenode round-trips on a long pre-checkpoint log
    val mtimes: Map[String, Long] =
      try {
        if (hfs.exists(log))
          hfs.listStatus(log).iterator
            .map(st => st.getPath.getName -> st.getModificationTime)
            .toMap
        else Map.empty
      } catch { case _: Exception => Map.empty }
    val raw = history(spark, root).map { v =>
      val eff = v.ts.orElse(mtimes.get(version(v.batchId)))
      (v.batchId, eff)
    }
    // carry-forward then running max: an unknown version inherits its
    // predecessor's instant (it cannot be EARLIER than what preceded
    // it), and a clock step backwards clamps to the prefix's max
    var last: Option[Long] = None
    raw.map { case (id, eff) =>
      val carried = eff.orElse(last)
      val mono = (carried, last) match {
        case (Some(c), Some(l)) => Some(math.max(c, l))
        case (c, _) => c
      }
      last = mono
      (id, mono)
    }
  }

  /** `TIMESTAMP AS OF` resolution: the LATEST version whose effective
    * commit timestamp is ≤ `tsMillis` (Delta's contract). Throws when
    * the instant predates the table's first commit — "a table that
    * didn't exist yet" must be loud, not an empty table — and,
    * symmetrically, when it EXCEEDS the last effective commit instant
    * (Delta's "after the latest commit" error): resolving "now" to
    * "latest" would make the same query return different data as the
    * table grows, breaking time-travel reproducibility. */
  def versionAt(spark: SparkSession, root: String, tsMillis: Long): Long = {
    val stamped = versionTimestamps(spark, root)
    require(stamped.nonEmpty, s"$root has no committed versions")
    val lastKnown = stamped.flatMap(_._2).lastOption
    lastKnown match {
      case Some(latest) if tsMillis > latest =>
        throw new IllegalArgumentException(
          s"TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tsMillis)} " +
            s"is after $root's latest commit " +
            s"(${java.time.Instant.ofEpochMilli(latest)}) — use the " +
            "plain (un-travelled) read for the current snapshot, or an " +
            "instant at or before the latest commit")
      case None =>
        // no version has a resolvable instant (pre-ts log whose commit
        // files are gone): ANY instant would resolve to latest, which
        // is a silent lie — refuse instead of guessing
        throw new IllegalArgumentException(
          s"$root has no resolvable commit timestamps (pre-timestamp " +
            "log with folded commit files) — use VERSION AS OF instead")
      case _ => ()
    }
    val eligible = stamped.takeWhile {
      case (_, Some(t)) => t <= tsMillis
      case (_, None) => true // no older instant known: can't exclude
    }
    if (eligible.isEmpty) {
      val earliest = stamped.head._2
        .map(t => java.time.Instant.ofEpochMilli(t).toString)
        .getOrElse("unknown")
      throw new IllegalArgumentException(
        s"TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tsMillis)} " +
          s"predates $root's first commit ($earliest) — the table did " +
          "not exist at that instant")
    }
    eligible.last._1
  }

  /** The log directory's current file NAMES (one listStatus, zero
    * content reads) — a cheap change-detection key: commit and
    * checkpoint files are immutable once named, so an unchanged name
    * set means an unchanged [[history]] (the streaming source's
    * per-trigger cache keys on this). */
  def logListing(spark: SparkSession, root: String): Seq[String] = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    if (!hfs.exists(log)) Nil
    else hfs.listStatus(log).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).toSeq
  }

  /** Fold a version prefix into its snapshot file set: adds then
    * removals, in version order (row-level deletes publish `removed`
    * entries — the bytes stay on disk for time travel). */
  private def foldFiles(cut: Seq[Version]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    cut.sortBy(_.batchId).foreach { v =>
      out ++= v.files
      out --= v.removed
    }
    out.toSeq
  }

  /** Snapshot file set of one sink as of `asOf`, folded from an
    * ALREADY-READ history — the streaming source's bootstrap batch uses
    * this against its per-trigger cached history instead of re-listing
    * the log. */
  private[sources] def snapshotFilesFrom(hist: Seq[Version], sink: String,
                                         asOf: Long): Seq[String] =
    foldFiles(hist.filter(_.batchId <= asOf))
      .filter(_.startsWith(sink + "/"))

  /** All committed root-relative files — optionally the snapshot as of
    * batch `asOf` (adds minus removals over the version prefix). */
  def committedFiles(spark: SparkSession, root: String,
                     asOf: Option[Long] = None): Seq[String] = {
    val hist = history(spark, root)
    val cut = asOf.map(a => hist.filter(_.batchId <= a)).getOrElse(hist)
    foldFiles(cut)
  }

  // Overload preserving the TableFormat contract signature.
  def committedFiles(spark: SparkSession, root: String): Seq[String] =
    committedFiles(spark, root, None)

  /** Latest recorded footer schema for `sink` (from the newest version
    * that touched it, optionally only versions `< beforeBatch`). */
  def latestSchema(spark: SparkSession, root: String, sink: String,
                   beforeBatch: Long = Long.MaxValue): Option[StructType] =
    history(spark, root).filter(_.batchId < beforeBatch)
      .flatMap(v => v.schemas.get(sink)).lastOption.map(decodeSchema)

  /** Fold all commits up to and including `throughBatchId` into a
    * checkpoint manifest — KEEPING the per-version structure so
    * [[readAsOf]] still works — then drop the folded commit files and
    * any older checkpoint. Checkpoints are VERSIONED
    * (`checkpoint.v<through>.json`, each written once via
    * write-tmp + rename to a unique name, never replaced in place):
    * a reader always finds a complete manifest whichever instant it
    * lists the log, and a crash at ANY point leaves either the old
    * checkpoint intact or both (history picks the newest) — the
    * delete-then-rename a single mutable `checkpoint.json` would need
    * has a window that loses the only copy of the folded history and
    * lets vacuum delete live data. */
  def checkpoint(spark: SparkSession, root: String, throughBatchId: Long): Unit = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    if (!hfs.exists(log)) return
    // Folding DESTROYS the commit files — the last chance to preserve a
    // pre-ts-era version's commit wall-clock is NOW, from its commit
    // file's modification time (the same fallback resolution uses).
    // Baked in here, TIMESTAMP AS OF keeps working after the fold.
    val hist = history(spark, root).map { v =>
      if (v.ts.isDefined) v
      else {
        val cf = new Path(log, version(v.batchId))
        try {
          if (hfs.exists(cf))
            v.copy(ts = Some(hfs.getFileStatus(cf).getModificationTime))
          else v
        } catch { case _: Exception => v }
      }
    }
    val json = s"""{"through":$throughBatchId,"versions":[${
      hist.map(versionJson).mkString(",")}]}"""
    val name = f"checkpoint.v$throughBatchId%020d.json"
    val tmp = new Path(log, s".tmp-$name")
    val out = hfs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val target = new Path(log, name)
    // same-name rename may find the target already written by an
    // identical concurrent fold — either copy is the same bytes
    if (!hfs.rename(tmp, target)) {
      hfs.delete(tmp, false)
      require(hfs.exists(target), s"checkpoint rename failed for $target")
    }
    // only AFTER the new manifest is durable: fold away the commit
    // files it covers and retire older manifests (incl. the legacy
    // mutable checkpoint.json of logs written before versioning)
    hfs.listStatus(log).map(_.getPath)
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".json"))
      .filter(p => p.getName.stripPrefix("v").stripSuffix(".json").toLong <= throughBatchId)
      .foreach(p => hfs.delete(p, false))
    hfs.listStatus(log).map(_.getPath)
      .filter(p => checkpointThrough(p.getName).exists(_ < throughBatchId))
      .foreach(p => hfs.delete(p, false))
  }

  /** The `through` id a checkpoint file name encodes; the legacy
    * mutable name sorts below every versioned one. */
  private def checkpointThrough(name: String): Option[Long] =
    if (name == Checkpoint) Some(-1L)
    else if (name.startsWith("checkpoint.v") && name.endsWith(".json"))
      scala.util.Try(
        name.stripPrefix("checkpoint.v").stripSuffix(".json").toLong).toOption
    else None

  /** Delete data files under `root` that NO commit references and whose
    * modification time is older than `ttlMs` — crash-window orphans and
    * part files superseded by a replay's dynamic overwrite. The TTL
    * must exceed the longest possible in-flight write (an active batch's
    * files are unreferenced until its commit publishes). Returns the
    * deleted root-relative paths. */
  def vacuum(spark: SparkSession, root: String, ttlMs: Long,
             dryRun: Boolean = false): Seq[String] = {
    val (hfs, rootPath) = fs(spark, root)
    if (!hfs.exists(rootPath)) return Nil
    // every file ANY version references is live — files replaced by a
    // row-level delete must survive for time travel to older versions
    val live = history(spark, root).flatMap(_.files).toSet
    val cutoff = System.currentTimeMillis() - ttlMs
    val rootUri = rootPath.toUri.getPath
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = hfs.listFiles(rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (!rel.startsWith(LogDir + "/") && rel.endsWith(".parquet") &&
          !live.contains(rel) && st.getModificationTime < cutoff) {
        // DRY RUN reports what WOULD go (Delta's spelling): the one
        // safety valve a destructive maintenance verb needs before a
        // too-short TTL eats an in-flight writer's staging
        if (!dryRun) hfs.delete(st.getPath, false)
        deleted += rel
      }
    }
    deleted.toSeq.sorted
  }

  /** True when the sink's committed versions disagree on the footer
    * schema — the condition under which ANY multi-file read of the sink
    * must merge footers or silently drop additively-added columns (a
    * single-footer inference picks an arbitrary file, typically the
    * oldest). The read rule [[readFiles]] applies, shared with every
    * copy-on-write verb: a rewrite that read the snapshot without
    * merging would re-materialize survivors WITHOUT the new columns and
    * destroy their data. */
  private def schemasDisagree(hist: Seq[Version], sink: String): Boolean =
    hist.flatMap(_.schemas.get(sink)).distinct.size > 1

  /** Partition scoping shared by `OPTIMIZE … WHERE` and
    * `ZORDER BY … WHERE` (Delta's spelling): evaluate the predicate
    * against each candidate LOGICAL directory's hive key=value pairs —
    * METADATA-ONLY, via a tiny local frame, so a daily "maintain
    * yesterday's partition" never lists or rewrites the rest of a
    * 100 TB sink. Values are offered as strings; Spark's implicit
    * casts make `hour = 5` and `dt >= '2026-01-01'` both work. */
  private def scopePartitions(spark: SparkSession, dirs: Seq[String],
                              pred: String, sink: String): Set[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val kvs: Seq[Map[String, String]] = dirs.map(d =>
      d.split('/').filter(_.nonEmpty).map { seg =>
        val eq = seg.indexOf('=')
        require(eq > 0, s"non-hive path segment '$seg' under '$sink'")
        ExternalCatalogUtils.unescapePathName(seg.take(eq)) ->
          ExternalCatalogUtils.unescapePathName(seg.drop(eq + 1))
      }.toMap)
    val names = kvs.flatMap(_.keys).distinct.sorted
    require(names.nonEmpty,
      s"the WHERE clause addresses hive partition columns, but " +
        s"sink '$sink' is unpartitioned (beyond batch_id)")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__dir",
        org.apache.spark.sql.types.StringType) +:
        names.map(n => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    val rows = dirs.zip(kvs).map { case (d, kv) =>
      org.apache.spark.sql.Row.fromSeq(
        d +: names.map(n => kv.getOrElse(n, null)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .filter(org.apache.spark.sql.functions.expr(pred))
      .select("__dir").collect().map(_.getString(0)).toSet
  }

  /** The batch_id-stripped logical partition directory of a
    * root-relative file — the unit partition scoping and compaction
    * grouping both key on. */
  private def logicalDirOf(rel: String): String =
    rel.split('/').drop(1).dropRight(1)
      .filterNot(_.startsWith("batch_id=")).mkString("/")

  /** Snapshot-file read for the mutation verbs: basePath for partition
    * columns, footer merge exactly when committed schemas disagree. */
  private def mutationRead(spark: SparkSession, root: String, sink: String,
                           files: Seq[String],
                           mergeNeeded: Boolean): DataFrame =
    spark.read.option("basePath", s"$root/$sink")
      .option("mergeSchema", mergeNeeded)
      .parquet(files.map(f => s"$root/$f"): _*)

  /** One past the newest id in an already-read history. */
  private def nextBatchIdFrom(hist: Seq[Version]): Long =
    hist.lastOption.map(_.batchId + 1L).getOrElse(0L)

  private def readFiles(spark: SparkSession, root: String, sink: String,
                        asOf: Option[Long]): DataFrame = {
    val hist = history(spark, root)
    val cut = asOf.map(a => hist.filter(_.batchId <= a)).getOrElse(hist)
    val files = foldFiles(cut)
      .filter(_.startsWith(sink + "/")).map(f => s"$root/$f")
    if (files.isEmpty) {
      // a sink emptied by a full DELETE keeps its schema: consumers'
      // selects must keep resolving (same contract as readChanges'
      // empty poll), not hit a zero-column frame. Footer columns only —
      // partition columns live in directory names and no directories
      // remain. A never-written sink has no schema to offer.
      val schema = cut.flatMap(_.schemas.get(sink)).lastOption
        .map(decodeSchema).getOrElse(new StructType())
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    // merge footers only when versions actually disagree on the schema
    val distinctSchemas = cut.flatMap(_.schemas.get(sink)).distinct
    spark.read
      .option("basePath", s"$root/$sink")
      .option("mergeSchema", distinctSchemas.size > 1)
      .parquet(files: _*)
  }

  /** Snapshot read of one sink: exactly the committed files, with hive
    * partition columns intact (`basePath`). Uncommitted batch
    * directories on disk are invisible. When committed versions disagree
    * on the sink's schema, footers are merged (added columns read as
    * null from older files). */
  def read(spark: SparkSession, root: String, sink: String): DataFrame =
    readFiles(spark, root, sink, None)

  /** The inputs an EXTERNAL reader (the `graft` catalog's named log
    * tables) needs to reproduce [[read]]/[[readAsOf]] semantics without
    * a DataFrame in hand: (root-relative committed files of the sink,
    * whether committed versions disagree on the sink's schema — i.e.
    * whether the reader must merge footers, [[schemasDisagree]]'s law,
    * computed over the SAME version cut as the files so a post-`asOf`
    * evolution never forces a merge the snapshot doesn't need). */
  def snapshotFiles(spark: SparkSession, root: String, sink: String,
                    asOf: Option[Long] = None): (Seq[String], Boolean) = {
    val hist = history(spark, root)
    val cut = asOf.map(a => hist.filter(_.batchId <= a)).getOrElse(hist)
    (foldFiles(cut).filter(_.startsWith(sink + "/")),
      cut.flatMap(_.schemas.get(sink)).distinct.size > 1)
  }

  /** The UNION of recorded footer schemas of `sink` over a version cut,
    * columns in order of first appearance — what a catalog-named table
    * pins as its read schema: additive evolution means later schemas
    * extend earlier ones, and the union also covers a commit that
    * landed after an [[evolveSchema]] without materializing the
    * declared column yet (its footer records the smaller schema; the
    * declaration must survive). Types can never conflict across the
    * cut — the commit gate rejects changes. */
  def snapshotSchema(spark: SparkSession, root: String, sink: String,
                     asOf: Option[Long] = None): Option[StructType] = {
    val hist = history(spark, root)
    val cut = asOf.map(a => hist.filter(_.batchId <= a)).getOrElse(hist)
    val recorded = cut.flatMap(_.schemas.get(sink)).map(decodeSchema)
    if (recorded.isEmpty) None
    else Some(recorded.reduce { (a, b) =>
      StructType(a.fields ++
        b.fields.filterNot(f => a.fieldNames.contains(f.name)))
    })
  }

  /** Time travel: the sink exactly as of batch `asOfBatchId` (Delta's
    * `versionAsOf`). History survives [[checkpoint]] folding, so any
    * published version stays addressable. */
  def readAsOf(spark: SparkSession, root: String, sink: String,
               asOfBatchId: Long): DataFrame =
    readFiles(spark, root, sink, Some(asOfBatchId))

  /** The change-feed type column readers use to avoid double-counting
    * copy-on-write rewrites. */
  val ChangeTypeCol = "_change_type"

  /** Incremental read (the change-data-feed shape a downstream
    * consumer polls): ONLY the files versions in `(afterVersion,
    * untilVersion]` ADDED to `sink`, each row tagged with a
    * [[ChangeTypeCol]] column:
    *
    *  - `"insert"` — the version was a plain append (empty `removed`
    *    list): genuinely new rows;
    *  - `"rewrite"` — the version removed files (deleteWhere / update /
    *    merge / compact): these rows are copy-on-write SURVIVORS the
    *    consumer has already seen, re-materialized in new files. An
    *    incremental consumer that is not idempotent must skip them (or
    *    diff against its own state) — without the tag, every DELETE
    *    would double-count the untouched rows of affected files.
    *    (A merge's not-matched inserts share the rewrite version, so
    *    they tag `"rewrite"` too — the conservative direction: a
    *    consumer may re-process a row it skipped, never double-count.)
    *
    * A consumer that processed through version N calls
    * `readChanges(…, N, M)` and touches none of the snapshot it already
    * saw — at 100 TB the difference between re-scanning a corpus and
    * reading a micro-batch. A version's row-level deletes surface
    * through its `removed` list ([[history]]).
    *
    * An empty poll (the common case) returns an EMPTY frame WITH the
    * sink's latest committed schema plus [[ChangeTypeCol]] — not a
    * zero-column frame — so a consumer's `select` keeps resolving
    * (Delta CDF contract). */
  def readChanges(spark: SparkSession, root: String, sink: String,
                  afterVersion: Long,
                  untilVersion: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val hist = history(spark, root)
    val vs = hist
      .filter(v => v.batchId > afterVersion && v.batchId <= untilVersion)
    val added = vs.flatMap(v => v.files.filter(_.startsWith(sink + "/"))
      .map(f => f -> (if (v.removed.isEmpty) "insert" else "rewrite")))
    if (added.isEmpty) {
      // schema'd empty frame, SAME schema as a non-empty poll: the
      // snapshot's files under basePath give footer columns + partition
      // columns + batch_id with the types partition discovery would
      // infer (one footer read; paths parse without data I/O), so a
      // consumer's `select hour` keeps resolving across empty and
      // non-empty polls (Delta-CDF contract). A never-written sink
      // falls back to the newest footer schema alone.
      val snap = foldFiles(hist).filter(_.startsWith(sink + "/"))
      val base =
        if (snap.nonEmpty)
          // merge footers when committed schemas disagree — a single
          // arbitrary footer could miss additively-added columns and
          // break the SAME-schema-as-non-empty-poll contract
          mutationRead(spark, root, sink, snap,
            schemasDisagree(hist, sink)).schema
        else hist.flatMap(_.schemas.get(sink)).lastOption
          .map(decodeSchema).getOrElse(new StructType())
      val schema = base
        .add(ChangeTypeCol, org.apache.spark.sql.types.StringType,
          nullable = false)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val distinctSchemas = vs.flatMap(_.schemas.get(sink)).distinct
    def readAdded(files: Seq[String],
                  pinned: Option[StructType]): DataFrame = {
      val r = spark.read
        .option("basePath", s"$root/$sink")
        .option("mergeSchema", distinctSchemas.size > 1)
      pinned.foreach(r.schema)
      r.parquet(files.map(f => s"$root/$f"): _*)
    }
    val types = added.map(_._2).distinct
    if (types.size == 1)
      // constant range: one scan, constant tag — stays codegen'd
      readAdded(added.map(_._1), None)
        .withColumn(ChangeTypeCol, lit(types.head))
    else {
      // mixed insert/rewrite range: one constant-tagged scan per group
      // (each lists only its own files), schemas pinned to the full
      // range's merged schema so the union is column-exact under schema
      // evolution. The tag is per-SCAN, not per-row — no
      // input_file_name() lookup, the whole plan stays codegen'd.
      val merged = readAdded(added.map(_._1), None).schema
      types.map { t =>
        readAdded(added.collect { case (f, `t`) => f }, Some(merged))
          .withColumn(ChangeTypeCol, lit(t))
      }.reduce(_.unionByName(_))
    }
  }

  /** Copy-on-write row-level DELETE (Delta's `DELETE WHERE`): rewrite
    * only the files of `sink` that contain matching rows — survivors of
    * each affected file land under a fresh `batch_id` directory and one
    * commit atomically publishes {added survivors, removed originals}.
    * Untouched files are never rewritten; replaced bytes stay on disk
    * so [[readAsOf]] to a pre-delete version still works ([[vacuum]]
    * keeps every version-referenced file).
    *
    * Returns the published version, or None when no row matched.
    * Partitioned sinks keep their layout: partition keys are recovered
    * from the affected files' `key=value` path segments.
    *
    * Scale: reads ONLY affected files (predicate pruning decides how
    * many), one write of their survivors, one commit. Concurrent
    * writers arbitrate through [[publish]] like any commit. */
  def deleteWhere(spark: SparkSession, root: String, sink: String,
                  predicate: org.apache.spark.sql.Column): Option[Long] =
      writeLock(root).synchronized {
    import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit}
    val (hfs, rootPath) = fs(spark, root)
    val hist = history(spark, root)
    val snap = foldFiles(hist).filter(_.startsWith(sink + "/"))
    if (snap.isEmpty) return None
    val mergeNeeded = schemasDisagree(hist, sink)
    val rootUri = rootPath.toUri.getPath
    def toRel(abs: String): String = {
      val p = new Path(abs).toUri.getPath
      p.stripPrefix(rootUri).stripPrefix("/")
    }
    val withF = mutationRead(spark, root, sink, snap, mergeNeeded)
      .withColumn("__file", input_file_name())
    // Delta DELETE semantics: a NULL predicate matches nothing and the
    // row is RETAINED. Both the affected-file scan and the survivor
    // filter below use the same null-safe form, so a null-condition row
    // co-located with matches is rewritten as a survivor, never dropped.
    val matched = coalesce(predicate, lit(false))
    val affected = withF.filter(matched)
      .select(col("__file")).distinct()
      .collect().map(r => toRel(r.getString(0))).toSeq.sorted
    if (affected.isEmpty) return None
    val newId = nextBatchIdFrom(hist)
    // the rewrite reads ONLY the affected files — true scan pruning,
    // not a per-row input_file_name() filter over the snapshot. The
    // rewrite is re-assigned to batch_id=<newId>: replace the inferred
    // batch_id partition column with the new id so the write below can
    // re-derive the directory from it
    val survivors = mutationRead(spark, root, sink, affected, mergeNeeded)
      .filter(!matched)
      .drop("batch_id")
      .withColumn("batch_id", lit(newId))
    // recover the partition layout (key=value segments between sink/
    // and the filename, batch_id excluded — it is re-assigned)
    val partCols = affected.head.split('/')
      .drop(1).dropRight(1)
      .filter(_.contains('='))
      .map(_.takeWhile(_ != '='))
      .filterNot(_ == "batch_id")
    // survivors must land in the writeBatch layout —
    // sink/<partCols...>/batch_id=N — NOT batch_id=N/<partCols...>:
    // partition discovery rejects a snapshot mixing two column
    // orderings, so one mis-ordered rewrite would poison every later
    // read of a partitioned sink. Dynamic overwrite touches only the
    // fresh batch_id=<newId> leaves; originals stay for time travel.
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy((partCols.toIndexedSeq :+ "batch_id"): _*)
      .parquet(s"$root/$sink")
    val files = batchFiles(hfs, rootPath, newId)
    val schemas = sinkSchemas(spark, root,
      if (files.nonEmpty) files else snap)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, newId,
      versionJson(stampNow(Version(newId, files, schemas, affected))), files)
    Some(newId)
  }

  /** Copy-on-write row-level UPDATE (Delta's `UPDATE … SET`): rewrite
    * ONLY the files of `sink` containing rows that match `predicate`;
    * matched rows take the `set` expressions — every RHS is evaluated
    * against the OLD row in one projection, so `SET a = b, b = a` swaps
    * — and co-located non-matching rows (including NULL-predicate rows,
    * same law as [[deleteWhere]]) carry over byte-identical. One commit
    * atomically publishes {added rewrites, removed originals}; replaced
    * bytes stay on disk for [[readAsOf]]. A SET that changes a
    * partition column moves the row to its new directory (the rewrite
    * re-derives the layout from row values).
    *
    * Returns the published version, or None when no row matched.
    * Scale: reads only affected files + one survivor write + one
    * commit — identical shape to [[deleteWhere]]. */
  def updateWhere(spark: SparkSession, root: String, sink: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column]): Option[Long] =
      writeLock(root).synchronized {
    import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, when}
    require(set.nonEmpty, "UPDATE needs at least one SET assignment")
    require(!set.contains("batch_id"),
      "batch_id is assigned by the commit log, not SET-able")
    val (hfs, rootPath) = fs(spark, root)
    val hist = history(spark, root)
    val snap = foldFiles(hist).filter(_.startsWith(sink + "/"))
    if (snap.isEmpty) return None
    val mergeNeeded = schemasDisagree(hist, sink)
    val rootUri = rootPath.toUri.getPath
    def toRel(abs: String): String =
      new Path(abs).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
    val withF = mutationRead(spark, root, sink, snap, mergeNeeded)
      .withColumn("__file", input_file_name())
    set.keys.foreach(c => require(withF.columns.contains(c),
      s"unknown SET column '$c' for sink '$sink'"))
    val matched = coalesce(predicate, lit(false))
    val affected = withF.filter(matched)
      .select(col("__file")).distinct()
      .collect().map(r => toRel(r.getString(0))).toSeq.sorted
    if (affected.isEmpty) return None
    val newId = nextBatchIdFrom(hist)
    // the rewrite reads ONLY the affected files — true scan pruning,
    // not a per-row input_file_name() filter over the snapshot
    val affRows = mutationRead(spark, root, sink, affected, mergeNeeded)
    val rewritten = affRows.select(
      affRows.columns.map { c =>
        set.get(c) match {
          case Some(e) => when(matched, e).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }.toIndexedSeq: _*)
      .drop("batch_id")
      .withColumn("batch_id", lit(newId))
    val partCols = affected.head.split('/')
      .drop(1).dropRight(1)
      .filter(_.contains('='))
      .map(_.takeWhile(_ != '='))
      .filterNot(_ == "batch_id")
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy((partCols.toIndexedSeq :+ "batch_id"): _*)
      .parquet(s"$root/$sink")
    val files = batchFiles(hfs, rootPath, newId)
    val schemas = sinkSchemas(spark, root,
      if (files.nonEmpty) files else snap)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, newId,
      versionJson(stampNow(Version(newId, files, schemas, affected))), files)
    Some(newId)
  }

  /** Copy-on-write MERGE — Delta's
    * `MERGE INTO sink USING source ON keys
    *  WHEN MATCHED [AND cond] THEN DELETE
    *  WHEN MATCHED THEN UPDATE SET *
    *  WHEN NOT MATCHED [AND cond] THEN INSERT *`
    * shape, the verb a CDC-consuming pipeline uses most. `source` must
    * carry every sink data column (SET* / INSERT* semantics) and may
    * carry extras (an op flag) the clause conditions reference; matched
    * target rows are REPLACED by their source version — EVERY matched
    * row, so N duplicate-key target rows become N copies of the source
    * row (Delta's update-each-matched-row law; cardinality preserved) —
    * matched rows whose source satisfies `deleteWhenMatched` are
    * DELETED (the CDC tombstone), unmatched source rows satisfying
    * `insertWhen` are appended, and only the files that contain
    * affected target rows are rewritten. Everything lands in ONE
    * atomic commit {added rewrites+inserts, removed originals}, so
    * readers see the whole merge or none of it, concurrent writers
    * arbitrate through [[publish]] (loser gets
    * [[ConcurrentCommitException]] and retries), and [[readAsOf]] to a
    * pre-merge version still sees the old rows.
    *
    * Delta's ambiguity law is enforced: two source rows sharing a merge
    * key abort (which row should win is undefined).
    *
    * A merge into an EMPTY sink bootstraps it: every `insertWhen`
    * source row is inserted, laid out under
    * `sink/<bootstrapPartitionBy...>/batch_id=N` — pass the partition
    * columns later appends will use, or the sink becomes a
    * batch_id-only layout that a later partitioned append would break
    * (Spark partition discovery rejects mixed layouts).
    *
    * Returns the published version, or None when the merge would be a
    * no-op (no matches to update or delete and no rows to insert).
    *
    * Scale: the affected-file scan and the target-key scan are both
    * column-pruned to `keys` (+ file name); `source` is typically a
    * CDC micro-batch — broadcast-sized — so every join here broadcasts;
    * the rewrite re-reads ONLY the affected files (file pruning at the
    * scan, not a per-row filename filter). */
  def merge(spark: SparkSession, root: String, sink: String,
            source: DataFrame, keys: Seq[String],
            updateWhenMatched: Boolean = true,
            insertWhenNotMatched: Boolean = true,
            deleteWhenMatched: Option[org.apache.spark.sql.Column] = None,
            insertWhen: Option[org.apache.spark.sql.Column] = None,
            bootstrapPartitionBy: Seq[String] = Nil): Option[Long] =
      writeLock(root).synchronized {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit}
    require(keys.nonEmpty, "MERGE needs at least one key column")
    require(updateWhenMatched || insertWhenNotMatched ||
      deleteWhenMatched.nonEmpty,
      "MERGE with no UPDATE, INSERT, or DELETE clause is a no-op by " +
        "construction")
    val (hfs, rootPath) = fs(spark, root)
    val hist = history(spark, root)
    val snap = foldFiles(hist).filter(_.startsWith(sink + "/"))
    val mergeNeeded = schemasDisagree(hist, sink)
    val rootUri = rootPath.toUri.getPath
    def toRel(abs: String): String =
      new Path(abs).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")

    // first write into an empty sink: every insert-eligible source row
    // is an insert, laid out for the appends that will follow
    if (snap.isEmpty) {
      if (!insertWhenNotMatched) return None
      val insAll = insertWhen.map(c => source.filter(coalesce(c, lit(false))))
        .getOrElse(source)
      // a sink emptied by a full DELETE still has its schema in the
      // log: project inserts onto it so a clause-only source column
      // (the CDC op flag) is not baked into the sink. A NEVER-written
      // sink has no recorded schema — there the full source defines it
      // (document extras away via a pre-projection).
      val ins = latestSchema(spark, root, sink) match {
        case Some(recorded) =>
          // recorded schemas are footer-derived, so partition columns
          // are NOT in them: union the bootstrap partition columns into
          // the projection, else re-bootstrapping a partitioned sink
          // after a full DELETE would drop its partition column and
          // fail the partition-column require below with a misleading
          // "not a source column" message
          val cols = (recorded.fieldNames.filterNot(_ == "batch_id") ++
            bootstrapPartitionBy.filterNot(recorded.fieldNames.contains))
            .toIndexedSeq
          cols.foreach(c => require(insAll.columns.contains(c),
            s"source is missing sink column '$c' (MERGE is INSERT*)"))
          insAll.select(cols.map(col): _*)
        case None => insAll
      }
      if (ins.isEmpty) return None
      bootstrapPartitionBy.foreach(c => require(ins.columns.contains(c),
        s"bootstrap partition column '$c' is not a source column"))
      val newId = nextBatchIdFrom(hist)
      ins.withColumn("batch_id", lit(newId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .partitionBy((bootstrapPartitionBy :+ "batch_id"): _*)
        .parquet(s"$root/$sink")
      val files = batchFiles(hfs, rootPath, newId)
      val log = new Path(rootPath, LogDir)
      hfs.mkdirs(log)
      publish(hfs, log, newId,
        versionJson(stampNow(Version(newId, files, sinkSchemas(spark, root, files)))),
        files)
      return Some(newId)
    }

    val target = mutationRead(spark, root, sink, snap, mergeNeeded)
    val dataCols = target.columns.filterNot(_ == "batch_id").toIndexedSeq
    keys.foreach(k => require(dataCols.contains(k),
      s"merge key '$k' is not a column of sink '$sink'"))
    dataCols.foreach(c => require(source.columns.contains(c),
      s"source is missing sink column '$c' (MERGE is SET* / INSERT* — " +
        "project the source onto the sink schema first)"))
    // clause conditions are evaluated against the FULL source row (they
    // may reference op-flag columns outside the sink schema), then the
    // row is projected onto the sink's data columns
    val srcProj = source
      .withColumn("__del",
        coalesce(deleteWhenMatched.getOrElse(lit(false)), lit(false)))
      .withColumn("__ins",
        coalesce(insertWhen.getOrElse(lit(true)), lit(false)))
      .select((dataCols.map(col) :+ col("__del") :+ col("__ins")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = srcProj.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      require(dup.isEmpty,
        s"MERGE aborted: multiple source rows share the merge key " +
          s"${dup.headOption.map(_.toString).getOrElse("")} — which row " +
          "wins is undefined (Delta's ambiguity law)")
      // column-pruned scans: only key columns (+ file name) leave the scan
      val targetKeys = target.select(keys.map(col): _*).distinct()
      val matchedSrc = srcProj.join(targetKeys, keys, "left_semi")
      // keys whose target rows this merge touches: every matched key
      // when updating, only tombstone keys when delete is the sole
      // matched clause
      val affKeys = (if (updateWhenMatched) matchedSrc
        else matchedSrc.filter(col("__del")))
        .select(keys.map(col): _*).distinct()
      val updSrc = matchedSrc.filter(!col("__del"))
        .select(dataCols.map(col): _*)
      val insertedSrc = srcProj.filter(col("__ins"))
        .join(targetKeys, keys, "left_anti")
        .select(dataCols.map(col): _*)
      val withF = target.withColumn("__file", input_file_name())
      val affected = withF.join(affKeys, keys, "left_semi")
        .select(col("__file")).distinct()
        .collect().map(r => toRel(r.getString(0))).toSeq.sorted
      // no-op detection needs the insert-side probe ONLY when nothing
      // matched — with affected files in hand the merge publishes
      // regardless, so the common path skips that extra action
      if (affected.isEmpty &&
          (!insertWhenNotMatched || insertedSrc.isEmpty)) return None

      val newId = nextBatchIdFrom(hist)
      // the rewrite reads ONLY the affected files — true scan pruning,
      // not a per-row input_file_name() filter over the snapshot
      val affRows =
        if (affected.isEmpty) null
        else mutationRead(spark, root, sink, affected, mergeNeeded)
      // survivors: affected-file rows whose key this merge doesn't touch
      val survivors =
        if (affected.isEmpty) null
        else affRows.join(affKeys, keys, "left_anti")
          .select(dataCols.map(col): _*)
      // updates preserve target cardinality: one output row per matched
      // TARGET row (source is unique per key — checked above), each
      // replaced by its source version
      val updatedTgt =
        if (!updateWhenMatched || affected.isEmpty) null
        else affRows.select(keys.map(col): _*)
          .join(updSrc, keys, "inner")
          .select(dataCols.map(col): _*)
      val pieces = Seq(
        Option(survivors),
        Option(updatedTgt),
        Some(insertedSrc).filter(_ => insertWhenNotMatched)).flatten
      val out = pieces.reduce(_.unionByName(_))
        .withColumn("batch_id", lit(newId))
      val partCols = snap.head.split('/')
        .drop(1).dropRight(1)
        .filter(_.contains('='))
        .map(_.takeWhile(_ != '='))
        .filterNot(_ == "batch_id")
      out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .partitionBy((partCols.toIndexedSeq :+ "batch_id"): _*)
        .parquet(s"$root/$sink")
      val files = batchFiles(hfs, rootPath, newId)
      val schemas = sinkSchemas(spark, root,
        if (files.nonEmpty) files else snap)
      val log = new Path(rootPath, LogDir)
      hfs.mkdirs(log)
      publish(hfs, log, newId,
        versionJson(stampNow(Version(newId, files, schemas, affected))), files)
      Some(newId)
    } finally srcProj.unpersist()
  }

  /** Z-ORDER rewrite (Delta's `OPTIMIZE … ZORDER BY` analog): rewrite
    * the WHOLE sink clustered on the Morton interleave of 1–8 columns,
    * so range predicates on any of them land in few files — at 100 TB
    * the difference between parquet row-group stats pruning a couple of
    * files and scanning the corpus. One commit atomically publishes
    * {added clustered files, removed: the whole prior snapshot};
    * replaced bytes stay on disk for [[readAsOf]].
    *
    * Bucketing is by QUANTILE: one `approx_percentile` pass computes
    * 2^bits−1 interior quantiles per column (bits = min([[
    * graft.operators.Layout.ZBits]], 62/n)), and each row's bucket is a
    * codegen'd binary search against them
    * ([[graft.functions.QuantileBucket]]). Every bucket holds ~equal
    * ROW MASS, so a zipfian column clusters as tightly as a uniform
    * one — uniform-width buckets would cram the head into one bucket
    * and cluster nothing — and the bucket index is clamped by
    * construction (no max-edge overflow into dropped interleave bits).
    * The verb is re-runnable after the distribution shifts.
    *
    * Output files: `ceil(snapshot bytes / targetFileBytes)` range
    * partitions of the z-value, rows sorted by z within each — every
    * task writes one ~target-sized clustered file. Returns the
    * published version, or None for an empty sink.
    *
    * This is a REWRITE version: the change feed tags its rows
    * `rewrite`, and the streaming source refuses it by default
    * (`ignoreChanges` semantics) — run layout maintenance on a table
    * BETWEEN streaming consumers, same as Delta. */
  def zorder(spark: SparkSession, root: String, sink: String,
             cols: Seq[String],
             targetFileBytes: Long = 128L << 20,
             partitionPredicate: Option[String] = None): Option[Long] =
      writeLock(root).synchronized {
    import org.apache.spark.sql.functions.{col, lit, max, min, percentile_approx}
    import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}
    require(cols.nonEmpty && cols.length <= 8,
      s"ZORDER BY takes 1 to 8 columns, got ${cols.length}")
    require(cols.distinct.length == cols.length,
      s"ZORDER BY columns must be distinct: ${cols.mkString(", ")}")
    val hist = history(spark, root)
    val fullSnap = foldFiles(hist).filter(_.startsWith(sink + "/"))
    // partition scoping (Delta's `OPTIMIZE … WHERE … ZORDER BY`): only
    // matching partitions are read, re-clustered, and removed; the
    // rest of the snapshot is untouched — quantile boundaries come
    // from the SCOPED rows (clustering quality is per-scope)
    val snap = partitionPredicate match {
      case None => fullSnap
      case Some(pred) =>
        val kept = scopePartitions(spark,
          fullSnap.map(logicalDirOf).distinct.sorted, pred, sink)
        fullSnap.filter(rel => kept(logicalDirOf(rel)))
    }
    if (snap.isEmpty) return None
    val (hfs, rootPath) = fs(spark, root)
    val mergeNeeded = schemasDisagree(hist, sink)
    val data = mutationRead(spark, root, sink, snap, mergeNeeded)
    cols.foreach { c =>
      require(data.columns.contains(c),
        s"ZORDER column '$c' is not a column of sink '$sink'")
      data.schema(c).dataType match {
        case _: NumericType | TimestampType | TimestampNTZType | DateType |
             StringType => ()
        case other => throw new IllegalArgumentException(
          s"ZORDER column '$c' must be numeric, timestamp, date, or " +
            s"string (orderable for quantile bucketing), got " +
            s"${other.simpleString}")
      }
    }
    // String dimensions rank through an order-preserving numeric
    // surrogate ([[graft.functions.StringPrefixRank]]: 6 UTF-8 bytes
    // past the column's common prefix, exact in a double) so they share
    // the ONE quantile pipeline below. The common prefix of min and max
    // is by definition shared by every value — one column-pruned agg
    // pass over just the string dims (URLs' 'https://…' contributes no
    // discrimination and would otherwise eat the whole rank window).
    val strCols = cols.filter(c => data.schema(c).dataType == StringType)
    val strSkip: Map[String, Int] =
      if (strCols.isEmpty) Map.empty
      else {
        val aggs = strCols.flatMap(c => Seq(min(col(c)), max(col(c))))
        val r = data.agg(aggs.head, aggs.tail: _*).head
        strCols.zipWithIndex.map { case (c, i) =>
          val lo = Option(r.getString(2 * i)).getOrElse("")
          val hi = Option(r.getString(2 * i + 1)).getOrElse("")
          c -> graft.functions.StringPrefixRank.commonPrefixBytes(
            org.apache.spark.unsafe.types.UTF8String.fromString(lo),
            org.apache.spark.unsafe.types.UTF8String.fromString(hi))
        }.toMap
      }
    // each dimension as a double: the quantile sketch and the bucket
    // search share one representation
    def dim(c: String): org.apache.spark.sql.Column =
      data.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case TimestampType | TimestampNTZType => col(c).cast("double")
        case DateType => col(c).cast("timestamp").cast("double")
        case StringType =>
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.functions.StringPrefixRank(
              org.apache.spark.sql.GraftColumnBridge.resolvedExpression(
                col(c)),
              strSkip(c)))
        case other => throw new IllegalArgumentException(
          s"ZORDER column '$c' has unexpected type ${other.simpleString}")
      }
    val bits = math.min(graft.operators.Layout.ZBits, 62 / cols.length)
    val buckets = 1 << bits
    // ONE quantile pass for every dimension's bucket boundaries (the
    // driver gets n arrays of 2^bits−1 doubles)
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    val aggs = cols.map(c =>
      percentile_approx(dim(c), lit(qs), lit(10000)))
    val row = data.agg(aggs.head, aggs.tail: _*).head
    val dims = cols.zipWithIndex.map { case (c, i) =>
      val raw =
        if (row.isNullAt(i)) Seq.empty[Double]
        else row.getSeq[Double](i)
      // sorted interior boundaries, DUPLICATES kept: repeated
      // boundaries are the rank scaling that spreads a skewed column
      // over the full bit range (see QuantileBucket). An all-null or
      // constant column degrades to one bucket — harmless.
      val bs = raw.filterNot(_.isNaN).sorted.toArray
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.QuantileBucket(
          org.apache.spark.sql.GraftColumnBridge.resolvedExpression(dim(c)),
          bs))
    }
    if (dims.isEmpty) return None
    val z = graft.operators.Layout.zValueN(dims, bits)
    val totalBytes = {
      val dirs = snap.map(rel => rel.take(rel.lastIndexOf('/'))).distinct
      val names = snap.toSet
      dirs.flatMap { d =>
        hfs.listStatus(new Path(rootPath, d)).toSeq
          .filter(st => names.contains(s"$d/${st.getPath.getName}"))
          .map(_.getLen)
      }.sum
    }
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) /
      targetFileBytes).toInt
    val newId = nextBatchIdFrom(hist)
    // the sink's hive layout survives (same law as deleteWhere —
    // partition discovery rejects mixed layouts): clustering happens
    // WITHIN each logical partition, Delta's ZORDER shape. Range
    // partitions are keyed (partCols…, z) so one task's rows share a
    // directory run and files stay near target size.
    val partCols = snap.head.split('/')
      .drop(1).dropRight(1)
      .filter(_.contains('='))
      .map(_.takeWhile(_ != '='))
      .filterNot(_ == "batch_id")
    val rangeKeys = (partCols.toIndexedSeq.map(col) :+ col("__z"))
    data.withColumn("__z", z)
      .repartitionByRange(nFiles, rangeKeys: _*)
      .sortWithinPartitions(rangeKeys: _*)
      .drop("__z")
      .drop("batch_id")
      .withColumn("batch_id", lit(newId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy((partCols.toIndexedSeq :+ "batch_id"): _*)
      .parquet(s"$root/$sink")
    val files = batchFiles(hfs, rootPath, newId)
    val schemas = sinkSchemas(spark, root,
      if (files.nonEmpty) files else snap)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, newId,
      versionJson(stampNow(Version(newId, files, schemas, snap))), files)
    Some(newId)
  }

  /** Small-file compaction (Delta's `OPTIMIZE` analog) for LOG-TRACKED
    * sinks — the transactional twin of
    * [[graft.operators.Compaction]] (which serves plain export trees
    * via rename-swap): bin-pack the
    * sink's committed files smaller than `smallFileBytes` into files of
    * ~`targetFileBytes`, per logical partition (every `key=value`
    * directory except the re-assigned `batch_id`). One commit
    * atomically publishes {added compacted files, removed originals};
    * replaced bytes stay on disk so [[readAsOf]] to pre-compaction
    * versions still works and [[vacuum]] keeps them while referenced.
    *
    * Returns the published version, or None when no partition holds two
    * or more small files (nothing worth rewriting).
    *
    * Scale shape: candidate selection is driver-side file METADATA only
    * (sizes from the snapshot listing — O(files), the same order as
    * reading the log); the data pass reads and shuffles ONLY the small
    * files' rows, hashed to one task per output bin; large files are
    * never touched. Streaming ingest is exactly the workload this
    * serves — one `batch_id` directory per micro-batch means a day of
    * short triggers is thousands of tiny files per partition, and scan
    * task counts drop proportionally after compaction. Bin placement is
    * EXACT (a bin-id partitioner, not hash), so every output file is
    * bounded by the bin's packed input bytes ≤ `targetFileBytes`;
    * Delta's job-per-bin model gets the same bound at the cost of one
    * Spark job per bin, the wrong trade at thousands of bins. */
  def compact(spark: SparkSession, root: String, sink: String,
              smallFileBytes: Long = 32L << 20,
              targetFileBytes: Long = 128L << 20,
              partitionPredicate: Option[String] = None): Option[Long] =
      writeLock(root).synchronized {
    import org.apache.spark.sql.functions.{col, lit}
    val (hfs, rootPath) = fs(spark, root)
    val hist = history(spark, root)
    val snap = foldFiles(hist).filter(_.startsWith(sink + "/"))
    if (snap.isEmpty) return None
    val rootUri = rootPath.toUri.getPath

    // metadata-only candidate selection: small files grouped by their
    // logical partition directory (batch_id excluded — it is re-assigned)
    def logicalDir(rel: String): String = logicalDirOf(rel)
    // one listStatus per DIRECTORY, not one getFileStatus per file: at
    // the ~17k-files/day this serves, per-file probes are 17k serial
    // namenode RPCs; per-directory listing is O(directories)
    val sizeByRel: Map[String, Long] = snap
      .groupBy(rel => rel.take(rel.lastIndexOf('/')))
      .flatMap { case (dir, rels) =>
        val names = rels.map(r => r.drop(dir.length + 1)).toSet
        hfs.listStatus(new Path(rootPath, dir)).toSeq
          .filter(st => names.contains(st.getPath.getName))
          .map(st => s"$dir/${st.getPath.getName}" -> st.getLen)
      }
    val smalls = snap.flatMap { rel =>
      sizeByRel.get(rel).filter(_ < smallFileBytes).map(len => (rel, len))
    }
    val allGroups = smalls.groupBy { case (rel, _) => logicalDir(rel) }
      .filter(_._2.size >= 2)
    val groups = partitionPredicate match {
      case None => allGroups
      case Some(pred) =>
        val kept = scopePartitions(spark,
          allGroups.keys.toSeq.sorted, pred, sink)
        allGroups.filter { case (d, _) => kept(d) }
    }
    if (groups.isEmpty) return None

    // first-fit bin-packing per partition; bins are globally numbered so
    // the repartition below gives (at most) one task per bin
    val rawBinOf = scala.collection.mutable.Map.empty[String, Int]
    var rawNext = 0
    groups.toSeq.sortBy(_._1).foreach { case (_, files) =>
      var binBytes = -1L // negative forces a fresh bin per partition
      files.sortBy(_._1).foreach { case (rel, len) =>
        if (binBytes < 0 || binBytes + len > targetFileBytes) {
          rawNext += 1; binBytes = 0L
        }
        rawBinOf(rel) = rawNext - 1
        binBytes += len
      }
    }
    // drop SINGLETON bins: rewriting one file into one file gains
    // nothing and, worse, never converges — a partition whose smalls
    // cannot pair (e.g. smallFileBytes > targetFileBytes/2) would be
    // byte-identically "compacted" again on every maintenance run,
    // bloating history and vacuum work forever. Only multi-file bins
    // rewrite; bin ids are then renumbered contiguous for the exact
    // partitioner below.
    val binSizes = rawBinOf.groupBy(_._2).view.mapValues(_.size).toMap
    val keptBins = binSizes.collect { case (b, n) if n >= 2 => b }
      .toSeq.sorted
    if (keptBins.isEmpty) return None
    val renumber = keptBins.zipWithIndex.toMap
    val binOf = rawBinOf.collect {
      case (rel, b) if renumber.contains(b) => rel -> renumber(b)
    }
    val candidates = binOf.keys.toSeq.sorted
    val totalBins = keptBins.size

    val newId = nextBatchIdFrom(hist)
    val rootU = rootUri
    val partCols = candidates.head.split('/')
      .drop(1).dropRight(1)
      .filter(_.contains('='))
      .map(_.takeWhile(_ != '='))
      .filterNot(_ == "batch_id")
    val binned = mutationRead(spark, root, sink, candidates,
        schemasDisagree(hist, sink))
      .withColumn("__file",
        org.apache.spark.sql.functions.input_file_name())
      .drop("batch_id")
      .withColumn("batch_id", lit(newId))
    // EXACTLY one task per bin: hash repartitioning can collide two bins
    // into one partition (a 2×-target output file) while others sit
    // empty — route by the bin id itself. A bin's rows share one
    // logical partition and one batch_id, so each task writes exactly
    // one ~target-sized file. Leaving codegen for the exchange is fine:
    // compaction is an I/O-bound maintenance pass over small files.
    // The file→bin map is BROADCAST and resolved inside the RDD stage
    // the exact partitioner already forces — one shipped copy per
    // executor (not a per-task closure), and no UDF in the plan.
    val binMapBc = spark.sparkContext.broadcast(binOf.toMap)
    val fileIdx = binned.schema.fieldIndex("__file")
    val schema = StructType(binned.schema.filterNot(_.name == "__file"))
    val exactRows = binned.rdd
      .map { r =>
        val rel = new Path(r.getString(fileIdx)).toUri.getPath
          .stripPrefix(rootU).stripPrefix("/")
        (binMapBc.value.getOrElse(rel, -1),
          org.apache.spark.sql.Row.fromSeq(r.toSeq.patch(fileIdx, Nil, 1)))
      }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = totalBins
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    val compacted = spark.createDataFrame(exactRows, schema)
    // same layout law as deleteWhere: sink/<partCols...>/batch_id=N,
    // or partition discovery rejects the mixed snapshot
    compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy((partCols.toIndexedSeq :+ "batch_id"): _*)
      .parquet(s"$root/$sink")
    val files = batchFiles(hfs, rootPath, newId)
    val schemas = sinkSchemas(spark, root, if (files.nonEmpty) files else snap)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    publish(hfs, log, newId,
      versionJson(stampNow(Version(newId, files, schemas, candidates))), files)
    Some(newId)
  }
}
