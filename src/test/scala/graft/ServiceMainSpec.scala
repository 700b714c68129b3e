package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProtoPipeline
import graft.streaming.ServiceMain

/** Drives the service binary's bounded file mode end-to-end: framed
  * messages on disk → ServiceMain.run (real streaming query, metrics
  * listener, checkpoint) → partitioned export tree.
  */
class ServiceMainSpec extends AnyFunSuite {
  import SparkTestSession._

  test("flag parsing covers the reference's surface") {
    val a = ServiceMain.parse(Array(
      "--frames-dir", "/x", "--export", "/e", "--checkpoint", "/c",
      "--metrics", "/m.json", "--max-offsets", "1000",
      "--cores", "8", "--available-now"))
    assert(a.framesDir.contains("/x") && a.export == "/e" &&
      a.checkpoint == "/c" && a.metrics == "/m.json" &&
      a.maxOffsets == 1000 && a.cores == 8 && a.availableNow)
    intercept[IllegalArgumentException] {
      ServiceMain.parse(Array("--bogus"))
    }
    val b = ServiceMain.parse(Array("--brokers", "h:9092", "--topic", "t",
      "--commit-log", "--dedupe-ids", "--dedupe-content",
      "--descriptor", "/d.desc", "--message", "Other"))
    assert(b.commitLog && b.dedupeIds && b.dedupeContent &&
      b.descriptor.contains("/d.desc") && b.message == "Other")
  }

  test("commit-log file-mode run: exports visible only through the log") {
    val base = Files.createTempDirectory("graft-service-log").toString
    val framesDir = s"$base/frames"
    ProtoPipeline.framedMessages(spark, sf0001)
      .select(col("value"),
        graft.sources.proto.ProtoFunctions.leUint64(col("value")).as("tm"))
      .select(expr("substring(value, 1, length(value) - 8)").as("value"),
        timestamp_millis(col("tm")).as("timestamp"))
      .coalesce(2).write.parquet(framesDir)

    ServiceMain.run(spark, ServiceMain.Args(
      framesDir = Some(framesDir),
      export = s"$base/export", checkpoint = s"$base/ckpt",
      metrics = s"$base/metrics.json",
      availableNow = true, commitLog = true))

    val root = s"$base/export/ortb.bid-requests"
    assert(new java.io.File(s"$root/_graft_log").listFiles()
      .exists(_.getName.endsWith(".json")))
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(graft.sources.GraftTable.read(spark, root, "raw").count() == nEvents)
  }

  test("--maintain: end-of-run compaction + log fold + vacuum") {
    val base = Files.createTempDirectory("graft-service-maint").toString
    val framesDir = s"$base/frames"
    ProtoPipeline.framedMessages(spark, sf0001)
      .select(col("value"),
        graft.sources.proto.ProtoFunctions.leUint64(col("value")).as("tm"))
      .select(expr("substring(value, 1, length(value) - 8)").as("value"),
        timestamp_millis(col("tm")).as("timestamp"))
      .repartition(4).write.parquet(framesDir)

    // one staged file per trigger -> several micro-batches -> several
    // batch_id dirs per partition
    ServiceMain.run(spark, ServiceMain.Args(
      framesDir = Some(framesDir),
      export = s"$base/export", checkpoint = s"$base/ckpt",
      metrics = s"$base/metrics.json", maxOffsets = 4000,
      availableNow = true, commitLog = true, maintain = true))

    val root = s"$base/export/ortb.bid-requests"
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    // snapshot correct after compaction, and the log is folded
    assert(graft.sources.GraftTable.read(spark, root, "raw").count() == nEvents)
    // versioned manifest name (checkpoint.v<through>.json) — written
    // once, never replaced in place
    val ckpts = new java.io.File(s"$root/_graft_log").listFiles()
      .map(_.getName).filter(_.startsWith("checkpoint."))
    assert(ckpts.nonEmpty, "maintain must fold the commit log")
    // compaction happened: the newest version holds rewritten raw files
    val hist = graft.sources.GraftTable.history(spark, root)
    assert(hist.last.removed.nonEmpty,
      "maintain should compact the micro-batch small files")
    // flags parse
    val m = ServiceMain.parse(Array("--maintain", "--vacuum-ttl-ms", "123"))
    assert(m.maintain && m.vacuumTtlMs == 123L)
  }

  test("bounded file-mode run exports both projections and metrics") {
    val base = Files.createTempDirectory("graft-service").toString
    val framesDir = s"$base/frames"
    // stage Kafka-shaped frames (prefix+payload, broker timestamp col)
    ProtoPipeline.framedMessages(spark, sf0001)
      .select(col("value"),
        graft.sources.proto.ProtoFunctions.leUint64(col("value")).as("tm"))
      .select(expr("substring(value, 1, length(value) - 8)").as("value"),
        timestamp_millis(col("tm")).as("timestamp"))
      .coalesce(2).write.parquet(framesDir)

    val args = ServiceMain.Args(
      framesDir = Some(framesDir),
      export = s"$base/export",
      checkpoint = s"$base/ckpt",
      metrics = s"$base/metrics.json",
      availableNow = true)
    ServiceMain.run(spark, args)

    val raw = spark.read.parquet(s"$base/export/ortb.bid-requests/raw")
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(raw.count() == nEvents)
    val agg = spark.read
      .parquet(s"$base/export/ortb.bid-requests/hourly_requests_agg")
    assert(agg.agg(sum("requests")).head().getLong(0) >= nEvents)
    val metrics = scala.io.Source.fromFile(s"$base/metrics.json")
      .getLines().toList
    assert(metrics.exists(_.contains("numInputRows")))
  }
}
