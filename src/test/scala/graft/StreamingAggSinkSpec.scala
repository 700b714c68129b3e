package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAgg

/** Production streaming-agg sink: append-mode watermark-evicted hourly
  * windows land as immutable hive-partitioned parquet as the watermark
  * advances file by file; values match the equivalent batch GROUP BY.
  */
class StreamingAggSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("append-mode file sink materializes finalized hours incrementally") {
    val stage = Files.createTempDirectory("graft-agg-stage").toString
    val out = Files.createTempDirectory("graft-agg-out").toString
    val ckpt = Files.createTempDirectory("graft-agg-ckpt").toString

    // stage the first 6 days as one file per day (increasing mtimes) so
    // the stream's watermark advances day by day; Tables.events
    // normalizes whichever ts flavor (nanos/micros) the generator wrote
    val raw = graft.sources.Tables.events(spark, sf0001)
      .withColumn("__day", dayofmonth(col("ts")))
      .filter(col("__day") <= 6)
    val days = raw.select("__day").distinct()
      .collect().map(_.getInt(0)).sorted
    days.foreach { d =>
      raw.filter(col("__day") === d).drop("__day")
        .coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(50) // distinct modification times → deterministic order
    }

    val q = StreamingAgg.hourlyWindowToFiles(spark, stage, out, ckpt)
    q.awaitTermination()
    assert(q.recentProgress.length > days.length - 1,
      "watermark must advance over multiple micro-batches")

    // batch-computed truth over the same staged input
    val ev = raw.drop("__day")
    val expected = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    val maxTs = ev.agg(max(col("ts")).cast("timestamp"))
      .head().getTimestamp(0)

    val emitted = spark.read.parquet(out)
    assert(emitted.count() > 0, "no finalized hours were written")
    // hive layout present
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("year=")))

    // every emitted row matches its batch counterpart exactly, no extras
    val joined = emitted.alias("e").join(expected.alias("x"),
      col("e.hour_start").cast("string") === col("x.hour_start").cast("string")
        && col("e.event_type") === col("x.event_type"))
    assert(joined.count() == emitted.count(), "emitted row missing from batch truth")
    assert(joined.filter(col("e.n_events") =!= col("x.n_events") ||
      col("e.total_value") =!= col("x.total_value")).count() == 0)

    // completeness: every strictly-finalized window must have been emitted
    val strictlyFinal = expected.filter(
      col("hour_start") + expr("interval 1 hour") <
        lit(maxTs) - expr("interval 1 hour"))
    val missing = strictlyFinal.alias("x").join(emitted.alias("e"),
      col("e.hour_start").cast("string") === col("x.hour_start").cast("string")
        && col("e.event_type") === col("x.event_type"), "left_anti")
    assert(missing.count() == 0, "a finalized window was not materialized")

    // the still-open tail (last hour) must NOT be in the output
    val openTail = emitted.filter(
      col("hour_start") + expr("interval 1 hour") >
        lit(maxTs))
    assert(openTail.count() == 0, "an unfinalized window leaked to the sink")
  }
}
