package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExportParquet
import graft.sources.Tables

/** B17/B18 write path: hive layout, zstd codec, and — the scale
  * property — datepart predicates on readback become partition pruning,
  * not data filters.
  */
class ExportParquetSpec extends AnyFunSuite {
  import SparkTestSession._

  test("partitioned zstd write + partition pruning on readback") {
    val out = Files.createTempDirectory("graft-export-spec").toString
    val ev = Tables.events(spark, sf0001)
    ExportParquet.write(
      ExportParquet.withPartitionCols(
        ev, unix_millis(col("ts").cast("timestamp"))),
      out)

    // layout
    val root = new java.io.File(out)
    val yDir = root.listFiles().filter(_.getName.startsWith("year=")).head
    val mDir = yDir.listFiles().filter(_.getName.startsWith("month=")).head
    val dDir = mDir.listFiles().filter(_.getName.startsWith("day=")).head
    val hDir = dDir.listFiles().filter(_.getName.startsWith("hour=")).head
    val part = hDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.getName.contains("zstd"), s"expected zstd codec: ${part.getName}")

    // count preserved
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())

    // partition pruning: filter on partition cols must show as
    // PartitionFilters in the scan, and read only matching partitions
    val pruned = back.filter(col("year") === 2024 && col("month") === 1 &&
      col("day") === 2 && col("hour") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("year#") || plan.contains("year = 2024") ||
      plan.toLowerCase.contains("partitionfilters"))
    val expected = ev.filter(
      year(col("ts")) === 2024 && month(col("ts")) === 1 &&
        dayofmonth(col("ts")) === 2 && hour(col("ts")) === 3).count()
    assert(pruned.count() == expected)
  }
}
