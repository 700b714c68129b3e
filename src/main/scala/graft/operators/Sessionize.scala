package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch sessionization: split each user's event stream into sessions
  * at inactivity gaps > 30 minutes — the classic lag + flag + running
  * sum plan, fully declarative (two window passes over one shuffle on
  * user_id, then the session group-by reuses the same partitioning).
  * The streaming twin lives in [[graft.streaming.StatefulSessionize]].
  */
object Sessionize {

  val GapMs = 30L * 60 * 1000

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts").cast("timestamp")) -
            unix_millis(col("prev_ts").cast("timestamp")) > GapMs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_idx")
  }
}
