package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType, TimestampType}

import graft.GraftSession

/** The whole reference service as a runnable binary — the analogue of
  * the reference's `main.go` flag surface and lifecycle
  * (/root/reference/main.go:41-89,410-429):
  *
  * {{{
  * runMain graft.streaming.ServiceMain \
  *   --brokers host:9092 --topic bids \          // Kafka mode, or:
  *   --frames-dir /path/to/frames \              // bounded file mode
  *   --export /path/out --checkpoint /path/ckpt \
  *   --metrics metrics.json [--available-now] [--cores 32] \
  *   [--commit-log] [--dedupe-ids] [--dedupe-content]
  *   [--descriptor x.desc --message Name]
  *   [--maintain [--vacuum-ttl-ms N]]   // end-of-run OPTIMIZE+VACUUM
  * }}}
  *
  * Flag mapping: `--max-offsets` ≈ the reference's 122880×kc message
  * buffer; `--available-now` ≈ the `-t` bounded-run timeout; metrics
  * JSONL ≈ `o.ReportJSONL()` on exit; the JVM shutdown hook ≈ the
  * SIGTERM graceful drain. File mode streams pre-framed messages
  * (binary `value` + `timestamp`) from parquet — the test harness and
  * replay path; Kafka mode is the production path.
  */
object ServiceMain {

  final case class Args(
      brokers: Option[String] = None,
      topic: Option[String] = None,
      framesDir: Option[String] = None,
      export: String = "export",
      checkpoint: String = "checkpoint",
      metrics: String = "metrics.json",
      maxOffsets: Long = 983040L,
      cores: Int = 32,
      availableNow: Boolean = false,
      commitLog: Boolean = false,
      dedupeIds: Boolean = false,
      dedupeContent: Boolean = false,
      descriptor: Option[String] = None,  // compiled FileDescriptorSet
      message: String = "Bidrequest",
      // end-of-run maintenance on the commit log (requires --commit-log):
      // compact small files, fold the log, vacuum aged orphans
      maintain: Boolean = false,
      vacuumTtlMs: Long = 7L * 24 * 3600 * 1000)

  def parse(argv: Array[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], a: Args): Args = rest match {
      case "--brokers" :: v :: t       => go(t, a.copy(brokers = Some(v)))
      case "--topic" :: v :: t         => go(t, a.copy(topic = Some(v)))
      case "--frames-dir" :: v :: t    => go(t, a.copy(framesDir = Some(v)))
      case "--export" :: v :: t        => go(t, a.copy(export = v))
      case "--checkpoint" :: v :: t    => go(t, a.copy(checkpoint = v))
      case "--metrics" :: v :: t       => go(t, a.copy(metrics = v))
      case "--max-offsets" :: v :: t   => go(t, a.copy(maxOffsets = v.toLong))
      case "--cores" :: v :: t         => go(t, a.copy(cores = v.toInt))
      case "--available-now" :: t      => go(t, a.copy(availableNow = true))
      case "--commit-log" :: t         => go(t, a.copy(commitLog = true))
      case "--dedupe-ids" :: t         => go(t, a.copy(dedupeIds = true))
      case "--dedupe-content" :: t     => go(t, a.copy(dedupeContent = true))
      case "--descriptor" :: v :: t    => go(t, a.copy(descriptor = Some(v)))
      case "--message" :: v :: t       => go(t, a.copy(message = v))
      case "--maintain" :: t           => go(t, a.copy(maintain = true))
      case "--vacuum-ttl-ms" :: v :: t => go(t, a.copy(vacuumTtlMs = v.toLong))
      case Nil                         => a
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown flag $other")
    }
    go(argv.toList, Args())
  }

  private val frameSchema = StructType(Seq(
    StructField("value", BinaryType), StructField("timestamp", TimestampType)))

  /** One staged frame file per micro-batch — the file-mode analogue of
    * `maxOffsetsPerTrigger` (file sources rate-limit by files, not
    * rows), so replay runs exercise the same multi-batch commit-log
    * shape as production Kafka triggers. */
  def fileFrameSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(frameSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .select(col("value"), col("timestamp"))

  def run(spark: SparkSession, args: Args): Unit = {
    val listener = new MetricsListener(args.metrics)
    spark.streams.addListener(listener)
    val cfg = BidPipeline.Config(
      bootstrapServers = args.brokers.getOrElse("unused:9092"),
      topic = args.topic.getOrElse("unused"),
      maxOffsetsPerTrigger = args.maxOffsets,
      checkpointLocation = args.checkpoint,
      exportRoot = args.export,
      availableNow = args.availableNow,
      commitLog = args.commitLog,
      dedupeIds = args.dedupeIds,
      dedupeContent = args.dedupeContent,
      schema = args.descriptor match {
        case Some(path) => // new topic: schema compiles from its descriptor
          graft.sources.proto.ProtoDescriptor.messageSchema(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
            args.message)
        case None => graft.sources.proto.BidRequestSchema.bidrequest
      })
    val source = args.framesDir.map(fileFrameSource(spark, _))
    val query = BidPipeline.start(spark, cfg, source)
    // SIGTERM/SIGINT graceful drain (main.go:410-429)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try query.stop() catch { case _: Throwable => }))
    query.awaitTermination()
    spark.streams.removeListener(listener)
    if (args.maintain && args.commitLog) maintain(spark, cfg, args.vacuumTtlMs)
  }

  /** End-of-run table maintenance (the OPTIMIZE/VACUUM job a production
    * deployment schedules out-of-band): compact each sink's micro-batch
    * small files, fold the commit log through the newest version, then
    * vacuum data files no version references once they age out. Safe to
    * run while readers are active — compaction publishes atomically and
    * vacuum only touches unreferenced files past the TTL. */
  def maintain(spark: SparkSession, cfg: BidPipeline.Config,
               vacuumTtlMs: Long): Unit = {
    import graft.sources.GraftTable
    val root = s"${cfg.exportRoot}/${cfg.logname}"
    Seq("raw", "hourly_requests_agg").foreach { sink =>
      GraftTable.compact(spark, root, sink).foreach(v =>
        println(s"[maintain] compacted $sink -> version $v"))
    }
    val versions = GraftTable.versions(spark, root)
    if (versions.nonEmpty) {
      GraftTable.checkpoint(spark, root, versions.max)
      println(s"[maintain] log folded through v${versions.max}")
    }
    val removed = GraftTable.vacuum(spark, root, vacuumTtlMs)
    if (removed.nonEmpty)
      println(s"[maintain] vacuumed ${removed.size} aged orphan files")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    require(args.framesDir.isDefined || args.brokers.isDefined,
      "need --frames-dir or --brokers")
    val spark = GraftSession.create(args.cores, "graft-service")
    try run(spark, args) finally spark.stop()
  }
}
