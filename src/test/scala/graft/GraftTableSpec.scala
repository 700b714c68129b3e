package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExportParquet, ProtoPipeline}
import graft.sources.GraftTable
import graft.streaming.BidPipeline

/** Transactional commit log: both sinks of a batch become visible in one
  * atomic rename; uncommitted data is invisible; replays are no-ops;
  * checkpointing folds the log without breaking readers.
  */
class GraftTableSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cfgFor(export: String) = BidPipeline.Config(
    bootstrapServers = "unused:9092", topic = "unused",
    checkpointLocation = Files.createTempDirectory("gt-ckpt").toString,
    exportRoot = export, commitLog = true)

  test("dual-sink commit: atomic visibility, crash invisibility, replay no-op") {
    val export = Files.createTempDirectory("gt-export").toString
    val cfg = cfgFor(export)
    val root = s"$export/${cfg.logname}"
    val batch = ProtoPipeline.decodeFrames(ProtoPipeline.framedMessages(spark, sf0001))
    val n = batch.count()

    // crash window: raw landed, agg + commit never happened
    ExportParquet.writeBatch(
      ExportParquet.withPartitionCols(batch,
        col("timestamp.seconds") * 1000 +
          (col("timestamp.nanos") / 1000000).cast("long")),
      s"$root/raw", batchId = 0)
    assert(GraftTable.read(spark, root, "raw").isEmpty,
      "uncommitted data must be invisible to log readers")

    // replay runs the full dual export + commit
    BidPipeline.exportBatch(batch, cfg, batchId = 0)
    val raw = GraftTable.read(spark, root, "raw")
    assert(raw.count() == n)
    assert(raw.columns.contains("year"), "partition columns must survive basePath read")
    val agg = GraftTable.read(spark, root, "hourly_requests_agg")
    assert(agg.count() > 0, "both sinks must be visible after the one commit")

    // re-replay after a completed commit: still exactly once
    BidPipeline.exportBatch(batch, cfg, batchId = 0)
    assert(GraftTable.read(spark, root, "raw").count() == n)

    // a second batch appends atomically
    BidPipeline.exportBatch(batch.limit(10), cfg, batchId = 1)
    assert(GraftTable.read(spark, root, "raw").count() == n + 10)
  }

  test("checkpoint folds the log prefix; readers see the same snapshot") {
    val export = Files.createTempDirectory("gt-ckpt-export").toString
    val cfg = cfgFor(export)
    val root = s"$export/${cfg.logname}"
    val batch = ProtoPipeline.decodeFrames(
      ProtoPipeline.framedMessages(spark, sf0001)).limit(50)
    (0L to 3L).foreach(b => BidPipeline.exportBatch(batch, cfg, batchId = b))
    val before = GraftTable.committedFiles(spark, root).toSet
    assert(GraftTable.read(spark, root, "raw").count() == 200)

    GraftTable.checkpoint(spark, root, throughBatchId = 2)
    assert(GraftTable.committedFiles(spark, root).toSet == before)
    assert(GraftTable.read(spark, root, "raw").count() == 200)

    // only the un-folded commit remains as a standalone file
    val logFiles = new java.io.File(s"$root/_graft_log").listFiles()
      .map(_.getName).filter(_.startsWith("v"))
    assert(logFiles.length == 1 && logFiles.head.contains("3"))

    // and new commits after the checkpoint still append
    BidPipeline.exportBatch(batch, cfg, batchId = 4)
    assert(GraftTable.read(spark, root, "raw").count() == 250)
  }
}
