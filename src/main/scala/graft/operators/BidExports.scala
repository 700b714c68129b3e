package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The two hosted export queries of the reference, as whole-table
  * operators (the per-partition `{{year}}…` templating disappears — the
  * partitioned write IS the partition loop).
  */
object BidExports {

  /** Hourly requests aggregate (main.go:109-125): per (date, hour,
    * pub_id, device_id, resolution, deal) — exact distinct request
    * count. `GROUP BY ALL`, `datetrunc`, `extract`, epoch_ms
    * reconstruction and the `WxH` concat, B6-B16 in one plan.
    */
  def hourlyRequestsAgg(norm: DataFrame): DataFrame = {
    val ts = timestamp_millis(col("event_time") * 1000)
    norm.groupBy(
        ts.cast("date").as("date"),
        hour(ts).as("hour"),
        col("pub_id"),
        col("device_id"),
        concat(col("width").cast("string"), lit("x"),
          col("height").cast("string")).as("resolution"),
        col("deal"))
      .agg(countDistinct(col("bidreq_id")).as("requests"))
  }

  /** Partition discovery over the raw nested frame (main.go:92-99):
    * distinct (y,m,d,h) as STRINGs (the reference casts `::STRING` for
    * path templating). */
  def partitionDiscovery(bidreq: DataFrame): DataFrame = {
    val ts = timestamp_millis(col("timestamp.seconds") * 1000)
    bidreq.select(
        year(ts).cast("string").as("year"),
        month(ts).cast("string").as("month"),
        dayofmonth(ts).cast("string").as("day"),
        hour(ts).cast("string").as("hour"))
      .distinct()
      .orderBy("year", "month", "day", "hour")
  }

  /** Oracle-checked entry: the full chain wire-bytes → decode →
    * normalize → hourly aggregate, deterministically ordered. */
  def hourlyAggFromWire(spark: SparkSession, dir: String): DataFrame =
    hourlyRequestsAgg(
      Normalize(ProtoPipeline.decodeFrames(
        ProtoPipeline.framedMessages(spark, dir))))
      .orderBy(col("date"), col("hour"), col("pub_id"), col("device_id"),
        col("resolution"), col("deal").asc_nulls_first)
}
