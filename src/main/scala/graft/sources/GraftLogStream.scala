package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** A catalog-named [[GraftTable]] commit-log table — batch reads over
  * the resolution-time snapshot (full parquet pushdown via delegation),
  * streaming READS that tail the log's versions, and WRITES that
  * publish through the commit protocol (`INSERT INTO` via the V1
  * fallback, `writeStream.toTable` via per-task parquet writers — see
  * [[GraftLogWriteBuilder]]). The Delta-table analog, addressed by
  * name.
  *
  * Streaming read: `spark.readStream.table("cat.db.t")`.
  *
  * Offsets are committed version ids: offset N means "versions ≤ N
  * consumed". Each micro-batch reads exactly the files the versions in
  * `(start, end]` ADDED to the sink — an incremental consumer never
  * re-scans the snapshot it already saw, which at 100 TB is the
  * difference between reading a micro-batch and re-reading a corpus.
  * The actual bytes are read by Spark's own vectorized parquet source
  * (each batch plans a parquet scan over its own file list; every
  * partition carries its batch's serialized reader factory, so the
  * stream-level factory is a stateless dispatcher and no ordering
  * between planInputPartitions and createReaderFactory is assumed).
  *
  * APPEND-ONLY by default, exactly like Delta's streaming source: a
  * version that REMOVED files (DELETE / UPDATE / MERGE / OPTIMIZE
  * rewrote survivors) fails the stream loudly — its added files
  * re-materialize rows the consumer already received, and silently
  * streaming them would double-count. `ignoreChanges=true` opts into
  * streaming those files anyway (at-least-once for rewritten rows, the
  * consumer dedups), Delta's same-named escape hatch.
  * `maxVersionsPerTrigger=N` caps admission per micro-batch (a
  * restarted consumer against a long history drains in steps instead
  * of one giant batch).
  *
  * The schema is PINNED at stream construction (the log enforces
  * additive-only evolution; a mid-stream schema change needs a restart
  * — Delta's contract as well). */
private[graft] class GraftLogTable(delegate: ParquetTable,
                                   root: String, sink: String)
    extends Table with SupportsRead with SupportsWrite {
  // ParquetTable declares `name` and `schema` as vals (FileTable), so
  // no parens on the delegate side
  override def name(): String = delegate.name
  // batch_id is HIDDEN from the named-table schema: it is commit-log
  // metadata (the version that added the row), log-assigned on every
  // write — surfacing it would force INSERT/streaming inputs to carry
  // a column whose value the log overrides. Lineage consumers read it
  // through the path API (GraftTable.read / readChanges), the Delta
  // model of commit metadata living beside the table, not in it.
  override def schema(): StructType =
    StructType(delegate.schema.filterNot(_.name == "batch_id"))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  // pushdown-preserving wrap: the delegating builder (sql-package
  // bridge) forwards the INTERNAL catalyst-filter trait Spark's file
  // sources actually use, so named log tables keep full filter /
  // partition / aggregate pushdown; only build() is intercepted to
  // hang the streaming path off the produced scan
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new org.apache.spark.sql.GraftDelegatingScanBuilder(
      delegate.newScanBuilder(options),
      inner => new GraftLogScan(inner, root, sink,
        delegate.dataSchema, options))
  // writes publish through the commit protocol: batch INSERT stages
  // driver-side (V1 fallback), streaming epochs get per-task parquet
  // writers; both promote staged files under the root's write lock and
  // publish ONE version (see GraftLogWrite)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLogWriteBuilder(root, sink, info)
  override def properties(): java.util.Map[String, String] =
    delegate.properties()
}

private[graft] class GraftLogScan(inner: Scan, root: String, sink: String,
                                  dataSchema: StructType,
                                  opts: CaseInsensitiveStringMap)
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  // runtime (join-side) filtering keeps flowing to the file scan —
  // without the forward, a broadcast join against a named log table
  // would scan the whole snapshot at execution time
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case s: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        s.filterAttributes()
      case _ => Array.empty
    }
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      s.filter(predicates)
    case _ => ()
  }
  override def readSchema(): StructType = inner.readSchema()
  // the inner parquet scan's description carries the evidence the plan
  // reader needs (PushedFilters, ReadSchema) — don't hide it
  override def description(): String =
    s"graft-log $root/$sink ${inner.description()}"
  override def toBatch: Batch = inner.toBatch
  // size/row estimates keep flowing to the optimizer (join sizing)
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(root, sink, dataSchema,
      inner.readSchema(), opts)
}

object GraftLogTable {
  /** The shared table factory for one commit-log sink — used by the
    * catalog (named tables) and the path-based
    * `format("graft-log")` provider: resolution-time snapshot, parquet
    * delegation, streaming over versions. An EMPTIED sink (schema
    * recorded, zero files) stays streamable; a NEVER-written sink has
    * no schema to offer and the caller degrades it. Returns None only
    * in that no-schema case. */
  private[graft] def forSink(spark: SparkSession, root: String,
                             sink: String, asOf: Option[Long],
                             display: String): Option[Table] = {
    val (files, mergeNeeded) = GraftTable.snapshotFiles(spark, root, sink, asOf)
    if (files.isEmpty) {
      GraftTable.snapshotSchema(spark, root, sink, asOf).map { schema =>
        val opts = new CaseInsensitiveStringMap(
          java.util.Map.of("basePath", s"$root/$sink"))
        new GraftLogTable(
          ParquetTable(display, spark, opts, Nil, Some(schema),
            classOf[ParquetFileFormat]),
          root, sink)
      }
    } else {
      // the read schema is PINNED to the union of recorded footer
      // schemas (snapshotSchema): files that predate an additively
      // added column null-fill it — including a column declared by
      // ALTER TABLE ADD COLUMNS that no file carries yet. Partition
      // columns are appended by discovery (recorded schemas are
      // footer-only). Legacy logs without schema tracking fall back to
      // footer inference with mergeSchema.
      val pinned = GraftTable.snapshotSchema(spark, root, sink, asOf)
      val opts = new CaseInsensitiveStringMap(java.util.Map.of(
        "basePath", s"$root/$sink",
        "mergeSchema", (pinned.isEmpty && mergeNeeded).toString))
      Some(new GraftLogTable(
        ParquetTable(display, spark, opts,
          files.map(f => s"$root/$f").toList, pinned,
          classOf[ParquetFileFormat]),
        root, sink))
    }
  }
}

/** Path-based spelling of the commit-log source —
  * `spark.read.format("graft-log").option("sink", "raw").load(root)`
  * and the same through `readStream`: exactly the catalog-named
  * table's behavior (snapshot batch reads with full pushdown,
  * version-id streaming) for users without a catalog configured. */
class GraftLogSourceProvider
    extends org.apache.spark.sql.connector.catalog.TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-log"

  private def tableFor(options: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(options)
    val root = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-log: a commit-log root path is required (load(root))"))
    val sink = Option(opts.get("sink")).getOrElse(
      throw new IllegalArgumentException(
        "graft-log: option(\"sink\", \"<sink name>\") is required"))
    // time travel for catalog-less users (Delta's reader options):
    // versionAsOf pins a batch id directly; timestampAsOf resolves an
    // instant — epoch millis, ISO-8601, or UTC 'yyyy-MM-dd[ HH:mm:ss]'
    // — through the same monotone commit timestamps the catalog uses
    val spark = SparkSession.active
    require(opts.get("versionasof") == null || opts.get("timestampasof") == null,
      "graft-log: versionAsOf and timestampAsOf are mutually exclusive")
    val asOf: Option[Long] = Option(opts.get("versionasof")).map(_.toLong)
      .orElse(Option(opts.get("timestampasof")).map(t =>
        GraftTable.versionAt(spark, root,
          GraftLogSourceProvider.parseInstantMillis(t))))
    GraftLogTable.forSink(spark, root, sink, asOf,
      s"graft-log:$root/$sink").getOrElse(
      throw new IllegalArgumentException(
        s"sink '$sink' under $root has no committed schema (never " +
          "written) — commit a batch first"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String]): Table =
    tableFor(properties)

  override def supportsExternalMetadata(): Boolean = false
}

private[graft] object GraftLogSourceProvider {
  /** `timestampAsOf` value → epoch millis. Digits are millis verbatim;
    * otherwise ISO-8601 (`2026-08-16T01:00:00Z`), or the SQL spellings
    * `yyyy-MM-dd HH:mm:ss[.SSS]` / `yyyy-MM-dd`, read as UTC — the
    * engine's session timezone contract. */
  def parseInstantMillis(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else scala.util.Try(java.time.Instant.parse(s).toEpochMilli)
      .orElse(scala.util.Try(
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .orElse(scala.util.Try(
        java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli))
      .getOrElse(throw new IllegalArgumentException(
        s"timestampAsOf: cannot parse '$s' (want epoch millis, " +
          "ISO-8601, 'yyyy-MM-dd HH:mm:ss[.SSS]' UTC, or 'yyyy-MM-dd')"))
}

/** Version-id offset: `last` = newest version consumed (-1 = none). */
private[graft] final case class GraftLogOffset(last: Long) extends Offset {
  override def json(): String = last.toString
}

private[graft] class GraftLogMicroBatchStream(root: String, sink: String,
                                              dataSchema: StructType,
                                              required: StructType,
                                              opts: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private def spark = SparkSession.active
  private val ignoreChanges =
    Option(opts.get("ignorechanges")).exists(_.toBoolean)
  private val maxVersionsPerTrigger =
    Option(opts.get("maxversionspertrigger")).map(_.toLong)
  // admission by FILE COUNT — the log records each version's file list,
  // so this cap is free; a bytes cap would cost one namenode RPC per
  // file per trigger (the log stores no sizes) and is deliberately
  // absent. Both caps compose; at least one version always admits so a
  // single over-cap version can't stall the stream.
  private val maxFilesPerTrigger =
    Option(opts.get("maxfilespertrigger")).map(_.toLong)
  // where a FRESH stream starts (Delta's startingVersion /
  // startingTimestamp): by default the current snapshot is the first
  // batch; startingVersion=N tails version N onward as CHANGES
  // (N=0 degrades to the snapshot bootstrap — identical rows for
  // append-only history, and the sound choice over a rewrite history);
  // startingVersion=latest tails only commits after stream start;
  // startingTimestamp resolves to the first version committed at or
  // after the instant (after the last commit → behaves like latest).
  // Checkpointed streams never consult these again — the offset wins.
  private val startingVersion: Option[Long] =
    Option(opts.get("startingversion")).map {
      case v if v.equalsIgnoreCase("latest") => Long.MaxValue
      case v => scala.util.Try(v.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion: want a version id or 'latest', got '$v'"))
    }
  private val startingTimestamp: Option[Long] =
    Option(opts.get("startingtimestamp"))
      .map(GraftLogSourceProvider.parseInstantMillis)
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "graft-log: startingVersion and startingTimestamp are mutually " +
      "exclusive")

  // the log is append-only per version file, so history content is
  // immutable once listed: cache the parse keyed by the log's FILE
  // NAME SET (one listStatus per probe, zero content reads when
  // unchanged) — without this a capped drain re-reads the whole log
  // twice per trigger, O(versions^2) metadata reads over a long history
  private var histCache: (Set[String], Seq[GraftTable.Version]) =
    (null, Nil)
  private def cachedHistory(): Seq[GraftTable.Version] = synchronized {
    val names = GraftTable.logListing(spark, root).toSet
    if (histCache._1 != names)
      histCache = (names, GraftTable.history(spark, root))
    histCache._2
  }

  private def maxCommitted(): Long =
    cachedHistory().lastOption.map(_.batchId).getOrElse(-1L)

  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(maxCommitted())

  override def initialOffset(): Offset = GraftLogOffset(
    startingVersion match {
      case Some(Long.MaxValue) => maxCommitted() // 'latest'
      case Some(v) => v - 1 // tail version v onward as changes
      case None => startingTimestamp match {
        case Some(ts) =>
          // first version committed AT OR AFTER the instant, tailed as
          // changes; an instant past the last commit = only the future
          GraftTable.versionTimestamps(spark, root)
            .find(_._2.exists(_ >= ts)).map(_._1 - 1)
            .getOrElse(maxCommitted())
        case None => -1L // default: snapshot bootstrap
      }
    })
  override def deserializeOffset(json: String): Offset =
    GraftLogOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    GraftLogOffset(availableNowTarget.getOrElse(maxCommitted()))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogOffset].last
    val target = availableNowTarget.getOrElse(maxCommitted())
    // cap by COMMITTED versions in range, not id arithmetic: batch ids
    // may be sparse (multi-sink roots, crash gaps) and `from + cap`
    // would emit one checkpointed empty micro-batch per missing id
    // before reaching data
    val capped =
      if (maxVersionsPerTrigger.isEmpty && maxFilesPerTrigger.isEmpty) target
      else {
        val inRange = cachedHistory()
          .filter(v => v.batchId > from && v.batchId <= target)
        val byVersions = maxVersionsPerTrigger.map(cap =>
          inRange.take(math.min(cap, Int.MaxValue.toLong).toInt))
          .getOrElse(inRange)
        val byFiles = maxFilesPerTrigger.map { cap =>
          var admitted = 0L
          byVersions.takeWhile { v =>
            val n = v.files.count(_.startsWith(sink + "/")).toLong
            // the first file-bearing version always admits — one
            // over-cap version must move the stream forward, not stall
            // it forever; file-less versions (schema-only, other sinks)
            // ride along free
            val ok = admitted == 0L || admitted + n <= cap
            if (ok) admitted += n
            ok
          }
        }.getOrElse(byVersions)
        byFiles.lastOption.map(_.batchId).getOrElse(from)
      }
    GraftLogOffset(math.max(from, capped))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftLogOffset].last
    val until = end.asInstanceOf[GraftLogOffset].last
    if (until <= from) return Array.empty
    val hist = cachedHistory()
    val rel: Seq[String] =
      if (from < 0L) {
        // fresh start: the first batch is the current SNAPSHOT as of
        // `until` (adds minus removals folded), Delta's initial-snapshot
        // semantics — pre-stream rewrites are invisible and rows already
        // deleted from the table are never delivered, so a table with
        // past DELETE/OPTIMIZE history stays streamable for new
        // consumers without ignoreChanges. The rewrite gate below
        // applies only to versions AFTER this pinned start.
        GraftTable.snapshotFilesFrom(hist, sink, until)
      } else {
        val versions = hist
          .filter(v => v.batchId > from && v.batchId <= until)
        // only removals of THIS SINK's files gate the stream: a rewrite
        // on a sibling sink of the same root is invisible to this
        // consumer
        if (!ignoreChanges) versions
            .find(_.removed.exists(_.startsWith(sink + "/"))).foreach { v =>
          throw new IllegalStateException(
            s"version ${v.batchId} of $root rewrote files (DELETE/UPDATE/" +
              "MERGE/OPTIMIZE) — streaming a log table requires append-only " +
              "versions, because rewrite versions re-materialize rows the " +
              "stream already delivered; set ignoreChanges=true to stream " +
              "them anyway (at-least-once for rewritten rows)")
        }
        versions.flatMap(_.files.filter(_.startsWith(sink + "/")))
      }
    if (rel.isEmpty) return Array.empty
    // retention guard for lagging consumers: versions stay addressable
    // forever, but their FILES may have been removed from storage out of
    // band (aggressive vacuum policy, external cleanup). Probing the
    // planned files driver-side (one exists per file, bounded by the
    // micro-batch's admission) turns a mid-batch executor FileNotFound
    // into an actionable error. The bootstrap snapshot skips the probe:
    // its files are the CURRENT snapshot (vacuum never deletes
    // snapshot-referenced files), and probing a 100 TB snapshot's file
    // list would be O(corpus) namenode RPCs for a case that cannot be a
    // retention lag.
    if (from >= 0L) {
      val (hfs, rootPath) = {
        val p = new org.apache.hadoop.fs.Path(root)
        (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
      }
      rel.find(f => !hfs.exists(new org.apache.hadoop.fs.Path(rootPath, f)))
        .foreach { missing =>
          throw new IllegalStateException(
            s"file $missing of a version in ($from, $until] no longer " +
              s"exists under $root — this stream's offset predates the " +
              "table's retention (the files were vacuumed or externally " +
              "deleted). Restart the query from a fresh checkpoint to " +
              "bootstrap from the current snapshot.")
        }
    }
    val files = rel.map(f => s"$root/$f")
    // one parquet scan per micro-batch over exactly this batch's files,
    // schema PINNED to the stream's (no per-batch inference — the log's
    // additive evolution can't reshape rows mid-stream)
    val batchOpts = new CaseInsensitiveStringMap(
      java.util.Map.of("basePath", s"$root/$sink"))
    val table = ParquetTable(s"graft-log-stream:$root/$sink", spark,
      batchOpts, files.toList, Some(dataSchema), classOf[ParquetFileFormat])
    val builder = table.newScanBuilder(batchOpts)
    builder match {
      case b: SupportsPushDownRequiredColumns => b.pruneColumns(required)
      case _ => ()
    }
    val batch = builder.build().toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions()
      .map(p => GraftLogStreamPartition(p, factory): InputPartition)
  }

  // stateless dispatcher: each partition carries its own batch's
  // serialized parquet reader factory, so no ordering between
  // planInputPartitions and createReaderFactory is assumed and a
  // replayed (checkpoint-recovered) batch rebuilds its factory with
  // its own plan
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogDispatchFactory
}

private[graft] final case class GraftLogStreamPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

private[graft] class GraftLogDispatchFactory extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): (InputPartition, PartitionReaderFactory) = {
    val q = p.asInstanceOf[GraftLogStreamPartition]
    (q.inner, q.factory)
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (inner, f) = unwrap(p); f.createReader(inner)
  }
  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (inner, f) = unwrap(p); f.createColumnarReader(inner)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = {
    val (inner, f) = unwrap(p); f.supportColumnarReads(inner)
  }
}
