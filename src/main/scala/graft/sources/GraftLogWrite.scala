package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{StringType, StructType}

import graft.operators.ArrowInterchange.SerConf

/** WRITE paths into a [[GraftTable]] commit-log sink — the piece that
  * lets `INSERT INTO cat.db.t`, `INSERT OVERWRITE`, and
  * `writeStream.toTable("cat.db.t")` publish through the commit
  * protocol instead of refusing. The reference's core loop is
  * append-to-named-destination-table
  * (/root/reference/main.go:255 `WithDestinationTable("bidreq")`);
  * this is that loop's Spark spelling with the log's atomicity.
  *
  * Shape (both batch and streaming):
  *  1. data lands under a DOT-PREFIXED staging directory inside the
  *     sink (`<sink>/.staging-…`) — invisible to partition discovery,
  *     to the commit walk, and to readers; a crash strands only
  *     staging bytes, which vacuum sweeps once they age out;
  *  2. under the root's write lock, the staged files are RENAMED into
  *     the sink's hive layout (`<sink>/<partDirs>/batch_id=<v>/…`) at
  *     the version id allocated at that moment, and ONE commit
  *     publishes the explicit file list ([[GraftTable.commitFiles]]);
  *     a cross-process publish loser relocates its files to a fresh id
  *     and retries — Delta's optimistic-concurrency loop.
  *
  * Streaming exactly-once: every epoch's version carries a
  * `txn = queryId:epochId` marker; a restarted query replaying an
  * epoch finds the marker and skips re-publication (its re-staged
  * bytes are left for vacuum). Complete output mode truncates: the
  * epoch's version also REMOVES the prior snapshot.
  *
  * Scale: tasks write parquet directly (Spark's own
  * `ParquetWriteSupport` row codec — same bytes the built-in sink
  * produces), one file per (task, partition-dir); the driver touches
  * only file NAMES (renames + one commit JSON), never data. Batch
  * INSERT stages through `df.write.parquet` so Spark's own committer
  * and partition rendering do the heavy lifting. */
private[sources] object GraftLogWrite {

  /** Partition columns of the sink's CURRENT layout, recovered from a
    * snapshot file path (`key=value` segments, batch_id excluded — it
    * is log-assigned). Empty for an empty/unpartitioned sink. */
  def partitionColsOf(snap: Seq[String]): Seq[String] =
    snap.headOption.map { rel =>
      rel.split('/').drop(1).dropRight(1)
        .filter(_.contains('='))
        .map(_.takeWhile(_ != '='))
        .filterNot(_ == "batch_id").toSeq
    }.getOrElse(Nil)

  /** Staged parquet files under `staging`, staging-relative. */
  def stagedFiles(hfs: FileSystem, staging: Path): Seq[String] = {
    if (!hfs.exists(staging)) return Nil
    val base = staging.toUri.getPath
    val out = mutable.ArrayBuffer.empty[String]
    val it = hfs.listFiles(staging, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
    }
    out.toSeq.sorted
  }

  /** Move staged files into the sink layout and publish one version.
    * `relFiles` are staging-relative (`<partDirs>/<name>`); they land
    * at `<sink>/<partDirs>/batch_id=<id>/<name>`. Returns the
    * published version id. */
  def promoteAndCommit(spark: SparkSession, root: String, sink: String,
                       staging: Path, relFiles: Seq[String],
                       truncate: Boolean,
                       txn: Option[String]): Long =
      GraftTable.writeLock(root).synchronized {
    val rootPath = new Path(root)
    val hfs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    def sinkRel(rel: String, id: Long): String = {
      val i = rel.lastIndexOf('/')
      val dirs = if (i < 0) "" else rel.substring(0, i + 1)
      s"$sink/${dirs}batch_id=$id/${rel.substring(i + 1)}"
    }
    var id = GraftTable.nextBatchId(spark, root)
    var placed: Seq[String] = relFiles.map { rel =>
      val dst = new Path(rootPath, sinkRel(rel, id))
      hfs.mkdirs(dst.getParent)
      require(hfs.rename(new Path(staging, rel), dst),
        s"staging promotion failed: $staging/$rel -> $dst")
      sinkRel(rel, id)
    }
    val removed =
      if (truncate) GraftTable.snapshotFiles(spark, root, sink)._1 else Nil
    var attempts = 0
    var published = -1L
    while (published < 0) {
      try {
        GraftTable.commitFiles(spark, root, id, placed, removed, txn)
        published = id
      } catch {
        case e: GraftTable.ConcurrentCommitException =>
          // a cross-process writer won this version id: relocate the
          // placed files to a fresh id and retry (bounded — each loss
          // means ANOTHER writer made progress, so livelock would need
          // a pathological commit storm)
          attempts += 1
          if (attempts >= 5) throw e
          val next = GraftTable.nextBatchId(spark, root)
          placed = placed.map { rel =>
            val moved = rel.replace(s"/batch_id=$id/", s"/batch_id=$next/")
            val dst = new Path(rootPath, moved)
            hfs.mkdirs(dst.getParent)
            require(hfs.rename(new Path(rootPath, rel), dst),
              s"conflict relocation failed: $rel -> $moved")
            moved
          }
          id = next
      }
    }
    hfs.delete(staging, true)
    published
  }

  /** Driver-side batch INSERT (the V1 fallback body): stage through
    * Spark's own parquet writer (its committer + hive partition
    * rendering), then promote. The sink's existing partition layout is
    * preserved — an append into a `lang=…` tree stays `lang=…`. */
  def insertFrame(spark: SparkSession, root: String, sink: String,
                  data: DataFrame, truncate: Boolean): Unit = {
    val (snap, _) = GraftTable.snapshotFiles(spark, root, sink)
    val partCols = partitionColsOf(snap)
    val staging = new Path(new Path(root),
      s"$sink/.staging-insert-${UUID.randomUUID()}")
    val w = data.write.mode("overwrite").option("compression", "zstd")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(staging.toString)
    val hfs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val rels = stagedFiles(hfs, staging)
    if (rels.isEmpty && !truncate) { hfs.delete(staging, true); return }
    promoteAndCommit(spark, root, sink, staging, rels, truncate, None)
    ()
  }

  /** The parquet write configuration tasks need: the session's hadoop
    * conf plus the SQL keys Spark's `ParquetWriteSupport` asserts at
    * init (the built-in sink sets the same ones in `prepareWrite`). */
  def taskConf(spark: SparkSession): Configuration = {
    val c = spark.sessionState.newHadoopConf()
    // defaults mirror Spark's own (the variant-annotate flag reads as
    // the literal string "null" when absent, so every key gets an
    // explicit fallback)
    Seq("spark.sql.parquet.writeLegacyFormat" -> "false",
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
      "spark.sql.parquet.fieldId.write.enabled" -> "true",
      "spark.sql.parquet.variant.annotateLogicalType.enabled" -> "false",
      "spark.sql.parquet.datetimeRebaseModeInWrite" -> "EXCEPTION",
      "spark.sql.parquet.int96RebaseModeInWrite" -> "EXCEPTION",
      "spark.sql.session.timeZone" ->
        spark.sessionState.conf.sessionLocalTimeZone)
      .foreach { case (k, d) =>
        c.set(k, scala.util.Try(spark.conf.get(k)).toOption
          .filter(v => v != null && v != "null").getOrElse(d))
      }
    c.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    c
  }
}

/** WriteBuilder for a named commit-log table: batch appends ride the
  * V1 fallback (the whole frame stages driver-side through Spark's
  * parquet writer), streaming appends get real per-task writers.
  * `SupportsTruncate` covers INSERT OVERWRITE (static mode) and
  * streaming Complete mode — the version then removes the prior
  * snapshot atomically with its adds. */
private[sources] class GraftLogWriteBuilder(root: String, sink: String,
                                            info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateRequested = false
  override def truncate(): WriteBuilder = { truncateRequested = true; this }
  override def build(): Write = new GraftLogWriteImpl(
    root, sink, info.schema(), info.queryId(), truncateRequested)
}

private[sources] class GraftLogWriteImpl(root: String, sink: String,
                                         schema: StructType,
                                         queryId: String,
                                         truncate: Boolean)
    extends V1Write {
  override def toInsertableRelation: InsertableRelation =
    (data: DataFrame, overwrite: Boolean) =>
      GraftLogWrite.insertFrame(data.sparkSession, root, sink, data,
        truncate || overwrite)
  override def toStreaming: StreamingWrite =
    new GraftLogStreamingWrite(root, sink, schema, queryId, truncate)
}

private[sources] final case class GraftLogFilesMessage(files: Seq[String])
    extends WriterCommitMessage

/** Streaming epochs into a commit-log sink: per-task parquet writers
  * land in a per-(query, epoch) staging dir; the driver's epoch commit
  * promotes exactly the task-reported files and publishes ONE version
  * stamped `txn = queryId:epochId`. Replayed epochs (checkpoint
  * recovery) find their marker and skip — exactly-once visibility on
  * top of at-least-once task execution. The staging dir name is
  * DETERMINISTIC in (queryId, epochId), not run-token-keyed: Spark can
  * rebuild this object between factory creation and commit, and only
  * message-reported files are ever promoted, so a zombie run's stray
  * bytes in the same staging dir are ignored and swept. */
private[sources] class GraftLogStreamingWrite(root: String, sink: String,
                                              schema: StructType,
                                              queryId: String,
                                              truncate: Boolean)
    extends StreamingWrite {
  private def spark = SparkSession.active
  // sanitized: the txn marker must round-trip the version JSON's regex
  private val qid = queryId.filter(c => c > ' ' && c != '"' && c != '\\')

  private def stagingFor(epochId: Long) = new Path(new Path(root),
    s"$sink/.staging-$qid-epoch-$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val partCols = GraftLogWrite.partitionColsOf(
      GraftTable.snapshotFiles(spark, root, sink)._1)
    new GraftLogWriterFactory(s"$root/$sink", qid,
      new SerConf(GraftLogWrite.taskConf(spark)), schema, partCols,
      spark.sessionState.conf.sessionLocalTimeZone)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
      GraftTable.writeLock(root).synchronized {
    val staging = stagingFor(epochId)
    val hfs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val txn = s"$qid:$epochId"
    if (GraftTable.txnVersion(spark, root, txn).isDefined) {
      // checkpoint replay of an already-published epoch: the first
      // run's version stands; this run's re-staged bytes are debris
      hfs.delete(staging, true)
      return
    }
    val rels = messages.collect {
      case GraftLogFilesMessage(fs) => fs
    }.flatten.toSeq.sorted
    val mustTruncate =
      truncate && GraftTable.snapshotFiles(spark, root, sink)._1.nonEmpty
    if (rels.isEmpty && !mustTruncate) { hfs.delete(staging, true); return }
    GraftLogWrite.promoteAndCommit(spark, root, sink, staging, rels,
      truncate, Some(txn))
    ()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val staging = stagingFor(epochId)
    staging.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(staging, true)
    ()
  }
}

private[sources] class GraftLogWriterFactory(sinkDir: String, qid: String,
                                             conf: SerConf,
                                             schema: StructType,
                                             partCols: Seq[String],
                                             timeZone: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(
      s"$sinkDir/.staging-$qid-epoch-$epochId", conf, schema, partCols,
      timeZone, partitionId)
}

/** One task's parquet writer: routes rows into hive partition
  * directories (values rendered with Spark's own escaping; null →
  * `__HIVE_DEFAULT_PARTITION__`), one open file per directory seen,
  * footer columns = table schema minus partition columns (partition
  * values live in the directory names, the layout's law). Uses Spark's
  * `ParquetWriteSupport` InternalRow codec — the same bytes the
  * built-in parquet sink writes, zstd like every other writer here. */
private[sources] class GraftLogDataWriter(staging: String, conf: SerConf,
                                          schema: StructType,
                                          partCols: Seq[String],
                                          timeZone: String,
                                          partitionId: Int)
    extends DataWriter[InternalRow] {
  private val dataFields = schema.fields.zipWithIndex
    .filterNot { case (f, _) => partCols.contains(f.name) }
  private val dataSchema = StructType(dataFields.map(_._1).toIndexedSeq)
  private val proj = UnsafeProjection.create(
    dataFields.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }.toIndexedSeq)
  // partition values render through catalyst Cast-to-string (session
  // time zone), matching Spark's directory naming for the atomic types
  // these layouts partition by
  private val renderers = partCols.map { c =>
    val i = schema.fieldIndex(c)
    val f = schema(i)
    Cast(BoundReference(i, f.dataType, f.nullable), StringType,
      Some(timeZone))
  }

  private val writers = mutable.LinkedHashMap.empty[String,
    org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow]]
  private val files = mutable.ArrayBuffer.empty[String]

  private def dirFor(row: InternalRow): String =
    partCols.zip(renderers).map { case (c, r) =>
      val v = r.eval(row)
      val s =
        if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(v.toString)
      s"${ExternalCatalogUtils.escapePathName(c)}=$s"
    }.mkString("/")

  private def writerFor(dir: String) = writers.getOrElseUpdate(dir, {
    val hconf = new Configuration(conf.conf) // setSchema mutates: copy
    ParquetWriteSupport.setSchema(dataSchema, hconf)
    val name = f"part-$partitionId%05d-${UUID.randomUUID()}.parquet"
    val rel = if (dir.isEmpty) name else s"$dir/$name"
    val path = new Path(staging, rel)
    path.getFileSystem(hconf).mkdirs(path.getParent)
    files += rel
    new ParquetOutputFormat[InternalRow]()
      .getRecordWriter(hconf, path, CompressionCodecName.ZSTD)
  })

  override def write(row: InternalRow): Unit =
    // proj reuses one UnsafeRow buffer; ParquetWriteSupport serializes
    // the record before returning, so reuse is safe
    writerFor(dirFor(row)).write(null, proj(row))

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close(null))
    writers.clear()
    GraftLogFilesMessage(files.toSeq)
  }

  override def abort(): Unit = {
    close()
    val base = new Path(staging)
    val hfs = base.getFileSystem(conf.conf)
    files.foreach(rel => hfs.delete(new Path(base, rel), false))
  }

  override def close(): Unit = {
    writers.values.foreach { w =>
      try w.close(null) catch { case _: Exception => () }
    }
    writers.clear()
  }
}
