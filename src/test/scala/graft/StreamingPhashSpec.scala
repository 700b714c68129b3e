package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, PerceptualHash}
import graft.streaming.StreamingPhash

/** Streaming image near-dup: the stateful band-bucket pass must flag a
  * streamed image against a bootstrapped corpus copy within the
  * hamming bound, reuse the batch kernel bit-for-bit, and drop
  * undecodable payloads without touching state.
  */
class StreamingPhashSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(ms: Long) = new Timestamp(1704067200000L + ms)

  private def runStream(
      batches: Seq[Seq[(Long, Array[Byte], Timestamp)]],
      bootstrap: Option[org.apache.spark.sql.DataFrame])
      : Seq[StreamingPhash.Pair] = {
    import spark.implicits._
    val stream = MemoryStream[(Long, Array[Byte], Timestamp)](spark)
    val pairs = StreamingPhash.pairs(
      stream.toDF().toDF("doc_id", "media", "event_ts"),
      bootstrapCorpus = bootstrap)
    val name = s"phash_stream_${System.nanoTime()}"
    val q = pairs.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("phash-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingPhash.Pair].collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("a streamed image pairs with its bootstrapped corpus copy; " +
    "distant images and undecodable payloads never pair") {
    import spark.implicits._
    // corpus: doc 10's raster; the stream re-sends the SAME raster
    // under a new id (hamming 0) plus an unrelated and a corrupt one
    val corpus = Seq((10L, MediaCodec.synthImage(10L)))
      .toDF("doc_id", "media")
    val base = PerceptualHash.ahash(MediaCodec.synthImage(10L)).get
    // pick a far image: hamming > MaxHamming from doc 10
    val farId = (1L to 400L).find { i =>
      PerceptualHash.ahash(MediaCodec.synthImage(i)).exists {
        case (hi, lo) =>
          PerceptualHash.hamming(base._1, base._2, hi, lo) >
            PerceptualHash.MaxHamming
      }
    }.get
    val got = runStream(Seq(Seq(
      (500L, MediaCodec.synthImage(10L), ts(0)),
      (501L, MediaCodec.synthImage(farId), ts(0)),
      (502L, Array[Byte](1, 2, 3), ts(0)))), Some(corpus))
    val keys = got.map(p => (p.doc_a, p.doc_b)).distinct
    assert(keys.toSet == Set((10L, 500L)), s"got $keys")
    assert(got.forall(_.hamming == 0))
  }

  test("stream-vs-stream pairs surface too, once per colliding band, " +
    "with the exact kernel hamming") {
    // identical rasters collide in all four bands
    val got = runStream(Seq(
      Seq((1L, MediaCodec.synthImage(20L), ts(0))),
      Seq((2L, MediaCodec.synthImage(20L), ts(1000)))), None)
    assert(got.count(p => p.doc_a == 1L && p.doc_b == 2L) == 4,
      s"expected one emission per band, got $got")
    assert(got.forall(_.hamming == 0))
  }

  test("uniquePairs: exactly-once (doc_a, doc_b) across bands and " +
    "cross-batch re-emissions, with the conf-scoped start") {
    import spark.implicits._
    val stream = MemoryStream[(Long, Array[Byte], Timestamp)](spark)
    val deduped = StreamingPhash.uniquePairs(
      stream.toDF().toDF("doc_id", "media", "event_ts"))
    val name = s"phash_uniq_${System.nanoTime()}"
    val confKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val priorConf = spark.conf.getOption(confKey)
    val q = graft.streaming.StreamingNearDup.startUnchecked(spark) {
      deduped.writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("phash-uniq-ckpt")
            .toString)
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    assert(spark.conf.getOption(confKey) == priorConf)
    try {
      // identical rasters collide in all 4 bands; a re-send of doc 2
      // re-emits from every band a second time — one row must survive
      val batches = Seq(
        Seq((1L, MediaCodec.synthImage(20L), ts(0))),
        Seq((2L, MediaCodec.synthImage(20L), ts(1000))),
        Seq((2L, MediaCodec.synthImage(20L), ts(2000))))
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val got = spark.table(name)
        .select("doc_a", "doc_b", "hamming")
        .as[(Long, Long, Int)].collect().toSeq
      assert(got == Seq((1L, 2L, 0)),
        s"expected exactly one deduped pair row, got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }
}
