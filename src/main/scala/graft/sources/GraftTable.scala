package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal transactional commit log over the streaming export tree —
  * the role BASELINE.md assigns to Delta/Iceberg, built on nothing but
  * parquet + atomic rename (runs on local disk, HDFS, or any HCFS
  * connector; no external dependencies are available in this build).
  *
  * Layout:
  * {{{
  *   <root>/_graft_log/v<batchId>.json   // one commit per micro-batch
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
  *
  * Scale: a commit is O(files-per-batch) bytes of JSON; reads list one
  * directory of commit files. Periodic [[checkpoint]] folds the log's
  * prefix into a single manifest so listing stays O(recent commits), the
  * same shape as Delta's checkpoint parquet.
  */
object GraftTable {

  private val LogDir = "_graft_log"
  private val Checkpoint = "checkpoint.json"

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def version(batchId: Long) = f"v$batchId%020d.json"

  /** Files under `root` belonging to `batchId` (the writeBatch layout's
    * `batch_id=N` directories), as root-relative paths. */
  private def batchFiles(hfs: FileSystem, root: Path, batchId: Long): Seq[String] = {
    if (!hfs.exists(root)) return Nil
    val needle = s"/batch_id=$batchId/"
    val rootUri = root.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = hfs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (("/" + rel).contains(needle) && f.getName.endsWith(".parquet"))
        out += rel
    }
    out.toSeq.sorted
  }

  /** True when batch `batchId` is already published — the whole batch
    * (data writes included) can then be skipped on replay: the commit's
    * existence proves every sink completed, and re-running the writes
    * would orphan the manifest's file list (overwrite generates fresh
    * part-file names). */
  def isCommitted(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (hfs, rootPath) = fs(spark, root)
    hfs.exists(new Path(new Path(rootPath, LogDir), version(batchId)))
  }

  /** Publish batch `batchId`: one atomic commit covering every file the
    * batch landed under `root` (all sinks). Idempotent — a replayed
    * batch re-publishes the same version and is a no-op if the commit
    * already exists. */
  def commit(spark: SparkSession, root: String, batchId: Long): Seq[String] = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    hfs.mkdirs(log)
    val target = new Path(log, version(batchId))
    val files = batchFiles(hfs, rootPath, batchId)
    if (hfs.exists(target)) return files // replay after a completed commit
    val json =
      s"""{"batchId":$batchId,"files":[${files.map(f => "\"" + f + "\"").mkString(",")}]}"""
    val tmp = new Path(log, s".tmp-${version(batchId)}")
    val out = hfs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (!hfs.rename(tmp, target)) {
      hfs.delete(tmp, false)
      require(hfs.exists(target), s"commit rename failed for $target")
    }
    files
  }

  private def parseFiles(json: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile("\"([^\"]+\\.parquet)\"").matcher(json)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toSeq
  }

  private def readJson(hfs: FileSystem, p: Path): String = {
    val in = hfs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** All committed root-relative files (checkpoint manifest + newer
    * commits). */
  def committedFiles(spark: SparkSession, root: String): Seq[String] = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    if (!hfs.exists(log)) return Nil
    val entries = hfs.listStatus(log).map(_.getPath)
      .filter(p => !p.getName.startsWith("."))
    val ckpt = entries.find(_.getName == Checkpoint)
      .map(p => parseFiles(readJson(hfs, p))).getOrElse(Nil)
    val ckptThrough = entries.find(_.getName == Checkpoint)
      .map(p => "\"through\":(\\d+)".r.findFirstMatchIn(readJson(hfs, p))
        .map(_.group(1).toLong).getOrElse(-1L)).getOrElse(-1L)
    val commits = entries
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".json"))
      .filter(p => p.getName.stripPrefix("v").stripSuffix(".json").toLong > ckptThrough)
      .sortBy(_.getName)
      .flatMap(p => parseFiles(readJson(hfs, p)))
    (ckpt ++ commits).distinct
  }

  /** Fold all commits up to and including `throughBatchId` into one
    * checkpoint manifest and drop the folded commit files. Readers keep
    * working at every point (checkpoint is written before commits are
    * removed; committedFiles de-duplicates the overlap). */
  def checkpoint(spark: SparkSession, root: String, throughBatchId: Long): Unit = {
    val (hfs, rootPath) = fs(spark, root)
    val log = new Path(rootPath, LogDir)
    if (!hfs.exists(log)) return
    val all = committedFiles(spark, root)
    val folded = hfs.listStatus(log).map(_.getPath)
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".json"))
      .filter(p => p.getName.stripPrefix("v").stripSuffix(".json").toLong <= throughBatchId)
    val json = s"""{"through":$throughBatchId,"files":[${
      all.map(f => "\"" + f + "\"").mkString(",")}]}"""
    val tmp = new Path(log, s".tmp-$Checkpoint")
    val out = hfs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val target = new Path(log, Checkpoint)
    hfs.delete(target, false)
    require(hfs.rename(tmp, target), s"checkpoint rename failed")
    folded.foreach(p => hfs.delete(p, false))
  }

  /** Snapshot read of one sink: exactly the committed files, with hive
    * partition columns intact (`basePath`). Uncommitted batch
    * directories on disk are invisible. */
  def read(spark: SparkSession, root: String, sink: String): DataFrame = {
    val files = committedFiles(spark, root)
      .filter(_.startsWith(sink + "/"))
      .map(f => s"$root/$f")
    if (files.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.option("basePath", s"$root/$sink").parquet(files: _*)
  }
}
