package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.StreamingAgg

/** The testdata generator has shipped `events.ts` as TIMESTAMP(NANOS)
  * and as TIMESTAMP(MICROS) in different rounds — round 8's flip
  * silently compressed the streaming time axis 1000× (a declared
  * LongType schema read micros as nanos). Both flavors are pinned
  * here: the MICROS path against the live testdata, the NANOS path
  * against a checked-in fixture (`events_nanos.parquet`, footer
  * logical type Timestamp(NANOS, isAdjustedToUTC=false)), batch AND
  * streaming, asserting identical semantics.
  */
class EventsTsFlavorSpec extends AnyFunSuite {
  import SparkTestSession._

  private def nanosDir(): String = {
    val dir = Files.createTempDirectory("graft-ts-nanos").toString
    Files.copy(Paths.get("src/test/resources/events_nanos.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("batch loader normalizes NANOS to TIMESTAMP_NTZ micros") {
    val ev = Tables.events(spark, nanosDir())
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(ev.count() === 240)
    // fixture rows are ~15 min apart from 2024-01-01T00:00Z — the
    // wall-clock range proves nanos were divided, not misread
    val (lo, hi) = {
      val r = ev.agg(min(col("ts")).cast("string"),
        max(col("ts")).cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo.startsWith("2024-01-01 00:00:00"), s"got $lo")
    assert(hi.startsWith("2024-01-03 11:48"), s"got $hi")
  }

  test("live testdata (whatever flavor) loads as TIMESTAMP_NTZ micros") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(ev.count() > 0)
  }

  test("streaming probe matches batch semantics on BOTH flavors") {
    for (dir <- Seq(nanosDir(), sf0001)) {
      val stream = StreamingAgg.hourlyWindow(spark, dir)
      val batch = Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
      assert(stream.count() === batch.count(),
        s"window-group count must match the batch GROUP BY for $dir")
      val joined = stream.alias("s").join(batch.alias("b"),
        col("s.hour_start").cast("string") === col("b.hour_start").cast("string")
          && col("s.event_type") === col("b.event_type"))
      assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() === 0)
    }
  }

  // same drift class, embeddings axis: the vector operators AND their
  // static oracle SQL both encode the dimensionality, so a generator
  // that ships a different dim must refuse loudly at the reader —
  // not surface as opaque shape errors mid-operator (round 8's cost)
  test("embeddings reader refuses a drifted dimensionality with an actionable error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dims-drift").toString
    Seq((0L, "a", Array.fill(32)(0.1f)), (1L, "b", Array.fill(32)(0.2f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      Tables.embeddings(spark, dir).count()
    }
    assert(e.getMessage.contains("32-dimensional"))
    assert(e.getMessage.contains("oracle"))
    // the live testdata passes the guard
    assert(Tables.embeddings(spark, sf0001).count() > 0)
  }

  test("embeddings reader reports a NULL first vector actionably, not as an NPE") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dims-null").toString
    Seq((0L, "a", null: Array[Float]), (1L, "b", Array.fill(64)(0.2f)))
      .toDF("vec_id", "label", "embedding")
      .coalesce(1) // one file → the probe's first row IS the null row
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      Tables.embeddings(spark, dir).count()
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }
}
