package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Continuous (windowed, watermarked) aggregation — the capability the
  * reference approximates with per-rotated-file batch SQL (SURVEY §2.C
  * notes it has no continuous aggregation; this is the Spark-native
  * upgrade). Runs a real Structured Streaming query over the events
  * parquet as a file stream, 1-hour tumbling windows keyed by
  * event_type, with a 1-hour watermark for late data.
  */
object StreamingAgg {

  private val runId = new AtomicInteger(0)

  /** events schema with `ts` as `tsType` — the generator has shipped
    * both TIMESTAMP(NANOS) (read as raw long under the legacy conf, see
    * graft.sources.Tables.events) and TIMESTAMP(MICROS) (read as NTZ). */
  private def eventsSchema(tsType: org.apache.spark.sql.types.DataType) =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** A stream reader must declare its schema up front, so probe the
    * footer of whatever is already staged (one batch-metadata read, no
    * scan) to learn which `ts` flavor this directory carries. Returns
    * (declared schema, expression rebuilding `ts` as TimestampType
    * micros — event-time columns must be TimestampType for the
    * watermark; the UTC session keeps the wall clock identical to the
    * NTZ batch view). Empty/unreadable dir → the MICROS flavor, the
    * current generator's canonical output — but LOUDLY: a stream
    * started against a not-yet-staged directory that later receives
    * NANOS files would silently misdeclare, so the fallback is logged
    * with the cause and the remedy (stage a file first, or start the
    * stream after the first landing). */
  private def probeEvents(spark: SparkSession, dir: String,
                          glob: Option[String]): (StructType, String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probed = scala.util.Try {
      val r = spark.read
      glob.foreach(g => r.option("pathGlobFilter", g))
      r.parquet(dir).schema("ts").dataType
    } match {
      case scala.util.Success(t) => t
      case scala.util.Failure(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"events ts-flavor probe failed for $dir (${e.getMessage}); " +
            "assuming TIMESTAMP(MICROS). If NANOS-flavor files land in " +
            "this directory later they will be misread — stage at least " +
            "one file before starting the stream to let the probe see it.")
        TimestampNTZType
    }
    probed match {
      case LongType =>
        (eventsSchema(LongType), "timestamp_micros(ts div 1000)")
      case _ =>
        (eventsSchema(TimestampNTZType), "cast(ts as timestamp)")
    }
  }

  /** Hourly windowed aggregate via an actual streaming query (memory
    * sink, AvailableNow trigger → runs to completion synchronously).
    * Output matches the equivalent batch GROUP BY — which is exactly
    * what the DuckDB oracle asserts.
    */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame = {
    val (srcSchema, tsExpr) =
      probeEvents(spark, dir, Some("events.parquet"))
    val name = s"graft_stream_hourly_${runId.incrementAndGet()}"
    val stream = spark.readStream
      .schema(srcSchema)
      .option("pathGlobFilter", "events.parquet") // dir holds all tables
      .parquet(dir)
      .withColumn("ts", expr(tsExpr))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // snapshot and drop the memory sink — otherwise every invocation
    // leaves a full aggregate copy registered in the catalog for the
    // session lifetime. A complete-mode memory sink is ALREADY
    // driver-resident, so collecting the few-hundred-row aggregate adds
    // nothing in scale terms and costs one local pass (the previous
    // localCheckpoint materialization re-ran the sort through the
    // cluster and doubled this harness entry's bench time). The collect
    // is BOUNDED by hours × event-types (72 h × 4 types here — never
    // corpus rows), the same cardinality the memory sink itself already
    // holds. This entry is the oracle harness only — the production
    // path is [[hourlyWindowToFiles]].
    val snap = spark.table(name)
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("hour_start", "event_type")
    val rows = snap.collect()
    val schema = snap.schema
    spark.catalog.dropTempView(name)
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** The PRODUCTION twin of [[hourlyWindow]]: append-mode,
    * watermark-evicting hourly aggregate writing hive-partitioned
    * parquet. Only FINALIZED windows — watermark past the window end —
    * are ever written, so (a) aggregate state is bounded by the
    * watermark horizon, not the job lifetime, and (b) every output file
    * is immutable once written: downstream readers never see a partial
    * hour restated. Nothing driver-resident: state lives in the state
    * store, output goes straight to the file sink with exactly-once
    * tracking via its _spark_metadata log.
    *
    * `srcDir` is a directory of event part-files (the staging layout a
    * collector would land); `maxFilesPerTrigger` bounds each micro-batch
    * so the watermark — and therefore finalization — advances file by
    * file.
    */
  def hourlyWindowToFiles(spark: SparkSession, srcDir: String,
                          outPath: String, checkpoint: String,
                          maxFilesPerTrigger: Int = 1,
                          availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (schema, tsExpr) = probeEvents(spark, srcDir, None)
    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .withColumn("ts", expr(tsExpr))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"),
        year(col("window.start")).as("year"),
        month(col("window.start")).as("month"),
        dayofmonth(col("window.start")).as("day"),
        hour(col("window.start")).as("hour"))
      // align writer tasks with the partition layout: without this every
      // state-store task writes its own file into every day dir it
      // holds groups for (up to shufflePartitions small files per dir
      // per flush); after it, each day dir gets exactly one file per
      // flush — the small-file control a partitioned sink needs at scale
      .repartition(col("year"), col("month"), col("day"))
    val writer = agg.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .option("compression", "zstd")
      // DAY-level dirs: an hourly AGGREGATE is tiny relative to its
      // input — hour-level dirs would hold ~one row per event_type
      // (pathological small files at any scale); `hour` stays as a data
      // column, so hour-range queries prune to the day then filter
      .partitionBy("year", "month", "day")
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds")))
      .start()
  }

  /** q_stream_hourly_files: [[hourlyWindowToFiles]] — the PRODUCTION
    * append-mode file-sink path — under the driver's oracle gate. Stages
    * the events table as range-partitioned part files in a scratch dir,
    * runs the streaming query to completion (AvailableNow; one data
    * micro-batch, then the no-data batch that advances the watermark and
    * flushes finalized windows), reads the committed hive-partitioned
    * output back, and returns it.
    *
    * Append mode emits exactly the windows whose end is at or before
    * the final watermark — max event time floored to milliseconds (the
    * engine tracks event-time stats in ms) minus the 1-hour delay — and
    * nothing else: the still-open tail hours stay in state and are
    * never written. The DuckDB oracle states that same predicate
    * relationally, so a leak of an unfinalized window, a dropped
    * finalized one, or a wrong aggregate all hash-fail.
    */
  def hourlyFiles(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-stream-files").toString
    try {
      graft.sources.Tables.events(spark, dir)
        .repartitionByRange(4, col("ts"))
        .write.parquet(s"$base/src")
      StreamHarness.withShufflePartitions(spark, 8) {
        val q = hourlyWindowToFiles(spark, s"$base/src", s"$base/out",
          s"$base/ckpt", maxFilesPerTrigger = 64)
        q.awaitTermination()
      }
      graft.operators.Scratch.materializeAndClean(base,
        spark.read.parquet(s"$base/out")
          .select(col("hour_start").cast("timestamp_ntz").as("hour_start"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy("hour_start", "event_type"))
    } catch { case e: Throwable =>
      graft.operators.Scratch.rm(new java.io.File(base)); throw e
    }
  }
}
