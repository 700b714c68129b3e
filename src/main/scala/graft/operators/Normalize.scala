package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** The reference's decode-time flatten/normalize stage re-expressed as a
  * declarative projection (SURVEY §2.A A6-A10; /root/reference/
  * main.go:198-199,342-381): one `bidreq_norm` row per deal of the FIRST
  * impression (outer — zero deals still yield one row with NULL deal),
  * with flattened aliases, first-non-EMPTY device id coalesce, and
  * banner→video width/height fallback.
  *
  * The reference materializes this at deserialization time for cache
  * locality (main.go:339-341 comment). Here it's a narrow projection
  * Catalyst pipelines into the scan — materialization is a choice made
  * at the sink (foreachBatch writes both projections from one decoded
  * batch, SURVEY §2.A A11), not in the operator.
  */
object Normalize {

  /** Raw decoded bidreq frame (+ `event_tm`) → `bidreq_norm` frame. */
  def apply(bidreq: DataFrame): DataFrame = {
    val imp0: Column = col("imp").getItem(0)
    bidreq.select(
        col("id").as("bidreq_id"),
        coalesceNonEmpty(col("user.id"), col("site.id"), col("device.ifa"))
          .as("device_id"),
        col("site.publisher.id").as("pub_id"),
        col("event_tm"),
        col("timestamp.seconds").as("event_time"),
        when(imp0.getField("banner").isNotNull,
          imp0.getField("banner").getField("w"))
          .otherwise(imp0.getField("video").getField("w")).as("width"),
        when(imp0.getField("banner").isNotNull,
          imp0.getField("banner").getField("h"))
          .otherwise(imp0.getField("video").getField("h")).as("height"),
        explode_outer(imp0.getField("pmp").getField("deals")).as("deal_s"))
      .withColumn("deal", col("deal_s").getField("id"))
      .drop("deal_s")
  }
}
