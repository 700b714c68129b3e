package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Normalize, ProtoPipeline}

/** SURVEY §5 property invariants over the decoded+normalized frame:
  * norm row count = Σ max(1, |deals|); raw count = message count;
  * empty-string coalesce skips empties; banner/video fallback; outer
  * explode emits NULL-deal rows.
  */
class NormalizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val raw =
    ProtoPipeline.decodeFrames(ProtoPipeline.framedMessages(spark, sf0001))
      .cache()
  private lazy val norm = Normalize(raw).cache()
  private lazy val nEvents =
    graft.sources.Tables.events(spark, sf0001).count()

  test("raw row count = message count") {
    assert(raw.count() == nEvents)
  }

  test("norm row count = sum of max(1, deals)") {
    // generator: event_id % 3 deals per message (0 → one NULL-deal row)
    val expected = graft.sources.Tables.events(spark, sf0001)
      .select(sum(greatest(col("event_id") % 3, lit(1)))).head().getLong(0)
    assert(norm.count() == expected)
  }

  test("explode_outer yields exactly one NULL-deal row per zero-deal message") {
    val nullDeals = norm.filter(col("deal").isNull).count()
    val zeroDealMsgs = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_id") % 3 === 0).count()
    assert(nullDeals == zeroDealMsgs)
  }

  test("device_id coalesce skips EMPTY user ids (not only nulls)") {
    // generator: user_id % 4 == 0 → user.id = "" → must fall to site.id
    val fromSite = norm.filter(col("device_id").startsWith("site_"))
      .select("bidreq_id").distinct().count()
    val emptyUsers = raw.filter(col("user.id") === "").count()
    assert(fromSite == emptyUsers && emptyUsers > 0)
  }

  test("width falls back to video when banner absent") {
    val videoRows = raw.filter(col("imp").getItem(0).getField("banner").isNull)
    assert(videoRows.count() > 0)
    val bad = Normalize(videoRows)
      .join(graft.sources.Tables.events(spark, sf0001)
          .select(col("event_id").cast("string").as("bidreq_id"),
            (floor(col("value")) + 2).cast("int").as("expected_w")),
        "bidreq_id")
      .filter(col("width") =!= col("expected_w"))
    assert(bad.count() == 0)
  }

  test("proto3 scalar defaults: absent site name decodes as empty string") {
    assert(raw.filter(col("site.name").isNull).count() == 0)
    assert(raw.filter(col("site.name") === "").count() == nEvents)
  }

  test("absent app message decodes as NULL struct") {
    assert(raw.filter(col("app").isNull).count() == nEvents)
  }
}
