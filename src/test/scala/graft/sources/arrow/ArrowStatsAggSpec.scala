package graft.sources.arrow

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Manifest-served MIN/MAX aggregate pushdown: un-grouped MIN/MAX (±
  * COUNT(*)) over zone-mapped columns answer from the per-file stats
  * the writers stamp — zero record batches loaded — and every case the
  * stats can't answer EXACTLY declines to the normal scan. */
class ArrowStatsAggSpec extends AnyFunSuite {
  import SparkTestSession._

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.description()
    }.mkString("; ")

  test("un-grouped MIN/MAX (+ COUNT(*)) serve from stamped stats; " +
       "values are exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-statsagg").toString
    (1L to 1000L).map(i => (i, i.toDouble / 7.0,
        java.sql.Timestamp.valueOf(f"2024-01-${(i % 28) + 1}%02d 00:00:00")))
      .toDF("id", "score", "ts")
      .repartition(4)
      .write.format("graft-arrow").mode("overwrite").save(out)
    val t = spark.read.format("graft-arrow").load(out)
    val agg = t.agg(min("id"), max("id"), min("score"), max("ts"),
      count(lit(1)))
    assert(scanDesc(agg).contains("stats-served"),
      s"MIN/MAX not pushed: ${scanDesc(agg)}")
    val row = agg.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 1000L)
    assert(row.getDouble(2) == 1.0 / 7.0)
    assert(row.getTimestamp(3) ==
      java.sql.Timestamp.valueOf("2024-01-28 00:00:00"))
    assert(row.getLong(4) == 1000L)
  }

  test("inexact-stat cases decline to the normal scan and stay correct") {
    import spark.implicits._
    // NaN poisons the double column's stats → decline, exact via scan
    val nanDir = Files.createTempDirectory("graft-statsagg-nan").toString
    Seq((1L, 2.5), (2L, Double.NaN), (3L, -4.0)).toDF("id", "d")
      .coalesce(1).write.format("graft-arrow").mode("overwrite").save(nanDir)
    val nan = spark.read.format("graft-arrow").load(nanDir).agg(min("d"))
    assert(!scanDesc(nan).contains("stats-served"))
    assert(nan.head.getDouble(0) == -4.0)
    // a ZERO extreme declines: the stamp widens zero bounds across both
    // signs for zone-map soundness, so the stat's sign may be wrong
    val zDir = Files.createTempDirectory("graft-statsagg-zero").toString
    Seq((1L, 0.0), (2L, 5.0)).toDF("id", "d")
      .coalesce(1).write.format("graft-arrow").mode("overwrite").save(zDir)
    val z = spark.read.format("graft-arrow").load(zDir).agg(min("d"))
    assert(!scanDesc(z).contains("stats-served"))
    assert(z.head.getDouble(0) == 0.0)
    // …while its max still serves (5.0 is exact)
    val zmax = spark.read.format("graft-arrow").load(zDir).agg(max("d"))
    assert(scanDesc(zmax).contains("stats-served"))
    assert(zmax.head.getDouble(0) == 5.0)
    // untracked (string) columns decline
    val sDir = Files.createTempDirectory("graft-statsagg-str").toString
    Seq((1L, "b"), (2L, "a")).toDF("id", "s")
      .coalesce(1).write.format("graft-arrow").mode("overwrite").save(sDir)
    val s = spark.read.format("graft-arrow").load(sDir).agg(min("s"))
    assert(!scanDesc(s).contains("stats-served"))
    assert(s.head.getString(0) == "a")
    // grouped aggregates never push
    val g = spark.read.format("graft-arrow").load(zDir)
      .groupBy("id").agg(max("d"))
    assert(!scanDesc(g).contains("stats-served"))
    assert(g.count() == 2)
  }

  test("count(col) serves from stamped null counts: rows minus nulls, " +
       "any column type; count(distinct) declines") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-statsagg-cnt").toString
    (1L to 900L).map(i =>
        (i, if (i % 3 == 0) None else Some(s"v$i"),
          if (i % 5 == 0) None else Some(i.toDouble)))
      .toDF("id", "s", "d")
      .repartition(4)
      .write.format("graft-arrow").mode("overwrite").save(out)
    val t = spark.read.format("graft-arrow").load(out)
    // string AND double columns both serve (null counts are typeless),
    // mixed freely with count(*) and min/max
    val agg = t.agg(count(col("s")), count(col("d")), count(lit(1)),
      max("id"))
    assert(scanDesc(agg).contains("stats-served"),
      s"count(col) not pushed: ${scanDesc(agg)}")
    val row = agg.head
    assert(row.getLong(0) == 600L, "900 rows, every 3rd s null")
    assert(row.getLong(1) == 720L, "900 rows, every 5th d null")
    assert(row.getLong(2) == 900L && row.getLong(3) == 900L)
    // count(DISTINCT col) cannot answer from null counts → declines
    val d = t.agg(countDistinct(col("s")))
    assert(!scanDesc(d).contains("stats-served"))
    assert(d.head.getLong(0) == 600L)
  }

  test("estimateStatistics serves stamped rows and pruned bytes") {
    import spark.implicits._
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val out = Files.createTempDirectory("graft-statsagg-est").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.format("graft-arrow").mode("overwrite").save(out)
    val declared = spark.read.format("graft-arrow").load(out).schema
    def opts() = new CaseInsensitiveStringMap(java.util.Map.of())
    val full = new ArrowScanBuilder(out, declared, opts()).build()
      .asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(full.numRows().getAsLong == 1000L)
    assert(full.sizeInBytes().getAsLong > 0L)
    // pushed filters shrink the estimate: pruned files drop out of
    // both the byte and the row totals
    val sb = new ArrowScanBuilder(out, declared, opts())
    sb.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("id", 900L)))
    val pruned = sb.build()
      .asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(pruned.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong,
      "zone-map pruning must shrink the size estimate")
    assert(pruned.numRows().getAsLong < 1000L)
  }

  test("an all-empty export serves null MIN/MAX and zero COUNT from " +
       "its schema-only file") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-statsagg-empty").toString
    Seq.empty[(Long, Double)].toDF("id", "d")
      .write.format("graft-arrow").mode("overwrite").save(out)
    val agg = spark.read.format("graft-arrow").load(out)
      .agg(min("id"), count(lit(1)))
    assert(scanDesc(agg).contains("stats-served"))
    val row = agg.head
    assert(row.isNullAt(0) && row.getLong(1) == 0L)
  }
}
