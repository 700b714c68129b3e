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

  test("restart with late data: finalized windows never restate, " +
       "in-watermark stragglers land, too-late rows drop") {
    val stage = Files.createTempDirectory("graft-agg-late-stage").toString
    val out = Files.createTempDirectory("graft-agg-late-out").toString
    val ckpt = Files.createTempDirectory("graft-agg-late-ckpt").toString

    val all = graft.sources.Tables.events(spark, sf0001)
      .withColumn("__day", dayofmonth(col("ts")))
    def stageDays(days: Seq[Int]): Unit = days.foreach { d =>
      all.filter(col("__day") === d).drop("__day")
        .coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(50)
    }

    // ---- run 1: days 1-4, run to completion, remember what finalized
    stageDays(1 to 4)
    val q1 = StreamingAgg.hourlyWindowToFiles(spark, stage, out, ckpt)
    q1.awaitTermination()
    val run1 = spark.read.parquet(out)
      .select(col("hour_start").cast("string").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    assert(run1.nonEmpty, "run 1 must finalize some windows")
    // the checkpointed watermark: max event time of run 1 minus delay
    val w1 = new java.sql.Timestamp(
      all.filter(col("__day") <= 4)
        .agg(max(col("ts")).cast("timestamp")).head()
        .getTimestamp(0).getTime - 3600L * 1000)

    // ---- between runs: two stragglers with full events schema.
    // lateIn  — 1 min PAST the checkpointed watermark: must be admitted
    //           and counted when its (still-open) window finalizes.
    // tooLate — 5 h BEFORE it, aimed at an already-written window: must
    //           be dropped, and that window must NOT be restated.
    val template = all.filter(col("__day") <= 4).drop("__day").limit(1)
    def straggler(ts: java.sql.Timestamp) = template
      .withColumn("ts", lit(ts).cast("timestamp_ntz"))
      .withColumn("event_id", lit(999999L))
    val lateInTs = new java.sql.Timestamp(w1.getTime + 60L * 1000)
    val tooLateTs = new java.sql.Timestamp(w1.getTime - 5L * 3600 * 1000)
    straggler(lateInTs).unionByName(straggler(tooLateTs))
      .coalesce(1).write.mode("append").parquet(stage)
    Thread.sleep(50)
    // then the genuinely new days, so the watermark advances past the
    // straggler's window and finalizes it
    stageDays(5 to 6)

    // ---- run 2: SAME checkpoint (restart semantics), runs the new
    // files in mtime order: stragglers first (at watermark w1), days
    // 5-6 after
    val q2 = StreamingAgg.hourlyWindowToFiles(spark, stage, out, ckpt)
    q2.awaitTermination()

    val emitted = spark.read.parquet(out)
      .select(col("hour_start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

    // invariant 1: a (window, type) is written AT MOST ONCE across both
    // runs — a restated window would surface as a duplicate pair
    val dup = emitted.groupBy("hour_start", "event_type").count()
      .filter(col("count") > 1)
    assert(dup.count() == 0,
      s"restart restated finalized windows: ${dup.collect().mkString(",")}")

    // invariant 2: every run-1 row survives byte-identically
    val run2 = emitted
      .select(col("hour_start").cast("string").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    assert(run1.subsetOf(run2),
      s"run-1 output changed after restart: ${(run1 -- run2).take(3)}")

    // invariant 3: final output equals batch truth over days 1-6 PLUS
    // the admitted straggler, MINUS the too-late one, restricted to
    // finalized windows — wrong handling of either straggler breaks
    // the per-window values
    val ev = all.filter(col("__day") <= 6).drop("__day", "event_id")
      .unionByName(straggler(lateInTs).drop("event_id"))
    val expected = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    val joined = emitted.alias("e").join(expected.alias("x"),
      col("e.hour_start").cast("string") === col("x.hour_start").cast("string")
        && col("e.event_type") === col("x.event_type"))
    assert(joined.count() == emitted.count())
    assert(joined.filter(col("e.n_events") =!= col("x.n_events") ||
      col("e.total_value") =!= col("x.total_value")).count() == 0,
      "a straggler was mis-handled (dropped lateIn or admitted tooLate)")
    // and the straggler's window really did finalize in run 2
    val lateHour = new java.sql.Timestamp(
      lateInTs.getTime / 3600000L * 3600000L)
    assert(emitted.filter(
      col("hour_start").cast("string") === lateHour.toString.stripSuffix(".0"))
      .count() > 0, "the admitted straggler's window never finalized")
  }
}
