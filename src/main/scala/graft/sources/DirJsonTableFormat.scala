package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** A second, deliberately minimal [[TableFormat]] implementation — the
  * in-repo proof that the Delta/Iceberg swap seam is real: anything
  * that passes `TableFormatContractSpec` can replace [[GraftTableFormat]]
  * under [[graft.streaming.BidPipeline]] without touching pipeline code.
  *
  * Design (the "whole state per version" family, closer to Iceberg's
  * metadata-pointer swap than to Delta's append-only action log): ONE
  * JSON document holds the entire committed state — every batch id and
  * its published file list — and each commit writes the next version
  * of that document, `_djson_log/state.v<N>.json`, via temp + atomic
  * rename; readers take the highest committed version. Contrast with
  * [[GraftTable]]'s per-commit log files + folding checkpoint: here a
  * checkpoint has nothing to fold (state is already one file) and just
  * retires superseded state versions.
  *
  * Tradeoffs vs the mini-log, stated because they are the instructive
  * part of the seam: O(table) metadata rewritten per commit (fine for
  * bounded batch counts, the reason real formats keep deltas + periodic
  * snapshots), no schema-evolution enforcement, no time travel. The
  * CONTRACT (atomic visibility, idempotent replay, crash-window
  * invisibility, checkpoint transparency) is identical — which is
  * exactly what the shared spec asserts.
  */
object DirJsonTableFormat extends TableFormat {

  private val LogDir = "_djson_log"
  private val MaxDepth = 8

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def stateVersion(name: String): Option[Long] =
    if (name.startsWith("state.v") && name.endsWith(".json"))
      scala.util.Try(
        name.stripPrefix("state.v").stripSuffix(".json").toLong).toOption
    else None

  /** (version, batchId → files) of the newest committed state; (0,
    * empty) for a fresh root. */
  private def loadState(hfs: FileSystem, root: Path)
      : (Long, Map[Long, Seq[String]]) = {
    val log = new Path(root, LogDir)
    if (!hfs.exists(log)) return (0L, Map.empty)
    val newest = hfs.listStatus(log)
      .flatMap(st => stateVersion(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1).lastOption
    newest match {
      case None => (0L, Map.empty)
      case Some((v, p)) =>
        val in = hfs.open(p)
        val text = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        val batches = JsonMethods.parse(text) \ "batches" match {
          case JObject(fields) => fields.map {
            case (id, JArray(fs)) =>
              id.toLong -> fs.collect { case JString(f) => f }
            case (id, _) => id.toLong -> Seq.empty[String]
          }.toMap
          case _ => Map.empty[Long, Seq[String]]
        }
        (v, batches)
    }
  }

  private def writeState(hfs: FileSystem, root: Path, v: Long,
                         batches: Map[Long, Seq[String]]): Boolean = {
    val log = new Path(root, LogDir)
    hfs.mkdirs(log)
    val json = JsonMethods.compact(JsonMethods.render(JObject(
      "batches" -> JObject(batches.toSeq.sortBy(_._1).map {
        case (id, files) =>
          id.toString -> (JArray(files.sorted.map(JString(_)).toList): JValue)
      }: _*))))
    val tmp = new Path(log, s".state.v$v.tmp")
    val out = hfs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(log, s"state.v$v.json")
    if (hfs.exists(dest)) { hfs.delete(tmp, false); false }
    else if (hfs.rename(tmp, dest)) true
    else { hfs.delete(tmp, false); false }
  }

  /** All `*.parquet` under any `batch_id=<id>` directory, root-relative
    * — the same discovery rule as the mini-log's commit. */
  private def batchFiles(hfs: FileSystem, root: Path,
                         batchId: Long): Seq[String] = {
    if (!hfs.exists(root)) return Nil
    val rootUri = root.toUri.getPath
    val target = s"batch_id=$batchId"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(dir: Path, depth: Int): Unit = {
      if (depth > MaxDepth) return
      hfs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val n = st.getPath.getName
          if (n == LogDir || n.startsWith(".")) ()
          else if (n == target)
            hfs.listStatus(st.getPath).foreach { f =>
              if (f.isFile && f.getPath.getName.endsWith(".parquet"))
                out += f.getPath.toUri.getPath
                  .stripPrefix(rootUri).stripPrefix("/")
            }
          else walk(st.getPath, depth + 1)
        }
      }
    }
    walk(root, 0)
    out.sorted.toSeq
  }

  override def isCommitted(spark: SparkSession, root: String,
                           batchId: Long): Boolean = {
    val (hfs, p) = fs(spark, root)
    loadState(hfs, p)._2.contains(batchId)
  }

  override def commit(spark: SparkSession, root: String,
                      batchId: Long): Seq[String] = {
    val (hfs, p) = fs(spark, root)
    var attempts = 0
    while (attempts < 16) {
      val (v, batches) = loadState(hfs, p)
      batches.get(batchId) match {
        case Some(files) => return files // idempotent replay
        case None =>
          val files = batchFiles(hfs, p, batchId)
          if (writeState(hfs, p, v + 1, batches + (batchId -> files)))
            return files
          // lost a publish race: reload and retry (the winner may have
          // been our own batch replayed concurrently)
          attempts += 1
      }
    }
    throw new IllegalStateException(
      s"dirjson commit of batch $batchId under $root lost ${attempts} " +
        "consecutive state-publish races — a livelocked writer storm; " +
        "this format is single-writer-per-batch by contract")
  }

  override def committedFiles(spark: SparkSession,
                              root: String): Seq[String] = {
    val (hfs, p) = fs(spark, root)
    loadState(hfs, p)._2.toSeq.sortBy(_._1).flatMap(_._2)
  }

  /** One state file IS the checkpoint — folding is retiring superseded
    * versions (readers only ever open the newest). */
  override def checkpoint(spark: SparkSession, root: String,
                          throughBatchId: Long): Unit = {
    val (hfs, p) = fs(spark, root)
    val log = new Path(p, LogDir)
    if (!hfs.exists(log)) return
    val versions = hfs.listStatus(log)
      .flatMap(st => stateVersion(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1)
    versions.dropRight(1).foreach { case (_, path) =>
      hfs.delete(path, false)
    }
  }

  override def read(spark: SparkSession, root: String,
                    sink: String): DataFrame = {
    val files = committedFiles(spark, root)
      .filter(_.startsWith(sink + "/"))
    require(files.nonEmpty,
      s"sink '$sink' under $root has no committed files")
    spark.read
      .option("basePath", s"$root/$sink")
      .parquet(files.map(f => s"$root/$f"): _*)
  }
}
