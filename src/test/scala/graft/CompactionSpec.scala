package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, ExportParquet}
import graft.sources.Tables

/** Compaction: many small part files per hive partition → few, with
  * identical data readback. */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("compacts multi-file partitions preserving data and layout") {
    val out = Files.createTempDirectory("graft-compact").toString
    val ev = Tables.events(spark, sf0001)
    // write twice (append) so every partition has ≥ 2 files
    (1 to 2).foreach { _ =>
      ExportParquet.write(
        ExportParquet.withPartitionCols(
          ev, unix_millis(col("ts").cast("timestamp"))),
        out)
    }
    val before = spark.read.parquet(out)
    val beforeCount = before.count()
    val beforePartitions =
      before.select("year", "month", "day", "hour").distinct().count()
    assert(beforeCount == 2 * ev.count())

    val results = Compaction.compact(spark, out)
    assert(results.nonEmpty, "expected at least one compacted partition")
    results.foreach { case (_, nBefore, nAfter) =>
      assert(nAfter < nBefore)
    }

    val after = spark.read.parquet(out)
    assert(after.count() == beforeCount)
    // layout preserved: partition columns still readable
    assert(after.select("year", "month", "day", "hour").distinct().count() ==
      beforePartitions)
  }
}
