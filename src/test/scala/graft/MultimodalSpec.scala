package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Multimodal}

/** Multimodal plumbing: the decode pass must be a SINGLE narrow
  * row-append map — no join back to the payload frame (which would
  * shuffle the binary column and recompute upstream synthesis per join
  * side) — and corrupt payloads must land on the deterministic
  * fallback, never a task failure.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mediaFrame = {
    import spark.implicits._
    Seq(
      (1L, MediaCodec.png(8, 5, 1L)),
      (2L, MediaCodec.synthImage(2L)),
      (3L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)), // garbage
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "media")
  }

  test("decodeFeatures appends decode facts; corrupt/null -> fallback") {
    val out = Multimodal.decodeFeatures(mediaFrame)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    // row 1: known-geometry png decodes to its true dims
    assert(out(0).getAs[String]("format") == "png")
    assert(out(0).getAs[Int]("width") == 8)
    assert(out(0).getAs[Int]("height") == 5)
    assert(out(0).getAs[Long]("n_px") == 120L) // 8x5 pixels x 3 channels
    // rows 3 and 4: fallback, not a task failure
    Seq(out(2), out(3)).foreach { r =>
      assert(r.getAs[String]("format") == MediaCodec.ImageFallback.format)
      assert(r.getAs[Int]("width") == 0 && r.getAs[Long]("n_px") == 0L)
    }
  }

  test("decodeFeatures preserves every input column, in order") {
    val in = mediaFrame.withColumn("meta",
      struct(lit("png").as("format"), lit(8).as("width")))
    val out = Multimodal.decodeFeatures(in)
    assert(out.schema.fieldNames.take(3).toSeq ==
      Seq("doc_id", "media", "meta"))
    assert(out.schema.fieldNames.drop(3).toSeq ==
      Seq("format", "width", "height", "n_px", "px_mean"))
  }

  test("decode is one narrow pass: no join, no exchange in the plan") {
    val plan = Multimodal.decodeFeatures(mediaFrame)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"decode must not self-join:\n$plan")
    assert(!plan.contains("Exchange"), s"decode must stay narrow:\n$plan")
  }

  test("features end-to-end over the sf parquet matches decode facts") {
    val rows = Multimodal.features(spark, sf0001).collect()
    assert(rows.length == 500)
    // every 17th payload is truncated -> fallback zeros
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 17 == 0) assert(r.getAs[Int]("width") == 0)
      else {
        assert(r.getAs[Int]("width") > 0)
        // resize preserves the aspect cap: longest side == TargetDim
        // unless the source is degenerate-small (scale still >= 1 ok)
        assert(math.max(r.getAs[Int]("rs_width"),
          r.getAs[Int]("rs_height")) == Multimodal.TargetDim)
      }
    }
  }
}
