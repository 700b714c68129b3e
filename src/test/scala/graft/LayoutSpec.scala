package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: the Morton arithmetic itself, and the property the
  * operator exists for — a sorted-by-code write gives every output file
  * a compact rectangle in (x, y) space, so min/max stats prune on BOTH
  * columns where a linear sort prunes on one.
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue equals the reference bit-interleave on a value grid") {
    import spark.implicits._
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) ==
        mortonRef(r.getLong(0), r.getLong(1), Layout.ZBits))
    }
  }

  test("z-order write preserves rows and out-prunes a linear sort on the second dimension") {
    val dir = Files.createTempDirectory("graft-zorder").toFile
    val zPath = new java.io.File(dir, "z").getAbsolutePath
    val xPath = new java.io.File(dir, "x").getAbsolutePath
    val nFiles = 16
    val df = Layout.eventBuckets(graft.sources.Tables.events(spark, sf0001))

    Layout.zorderWrite(df, col("xb"), col("yb"), zPath, nFiles)
    // the linear-layout strawman: same file count, sorted on xb only
    df.repartitionByRange(nFiles, col("xb"))
      .sortWithinPartitions(col("xb"))
      .write.mode("overwrite").parquet(xPath)

    val zBack = spark.read.parquet(zPath)
    assert(zBack.count() == df.count())
    assert(zBack.join(df, Seq("event_id", "xb", "yb"), "left_anti").count() == 0)

    // per-file min/max stats as a query planner would read them
    def fileRanges(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("yb").as("lo"), max("yb").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    // a y-selective box query: how many files must be read?
    val (yLo, yHi) = (100L, 150L)
    def hits(ranges: Array[(Long, Long)]) =
      ranges.count { case (lo, hi) => hi >= yLo && lo <= yHi }

    val zHits = hits(fileRanges(zPath))
    val xHits = hits(fileRanges(xPath))
    val zTotal = fileRanges(zPath).length
    // linear-on-x layout scatters y across every file; z-order must
    // confine the y range to a strict subset of files
    assert(xHits == fileRanges(xPath).length,
      s"strawman unexpectedly pruned ($xHits)")
    assert(zHits < zTotal,
      s"z-order layout pruned nothing ($zHits of $zTotal files)")

    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(dir)
  }

  test("zorderEvents plans as TakeOrderedAndProject, not a global sort") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Layout.zorderEvents(spark, sf0001)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case other => other
      }
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty)
  }
}
