package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, VectorOps}
import graft.streaming.StreamingSemantic

/** Streaming embedding near-dup: the SRP bucket pass must flag a
  * streamed vector against a bootstrapped corpus twin with the exact
  * rounded cosine, reach hamming-1 buckets via multi-probe, emit each
  * pair AT MOST ONCE (residents live in one bucket), and drop
  * below-threshold pairs.
  */
class StreamingSemanticSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(ms: Long) = new Timestamp(1704067200000L + ms)

  private def unit(seed: Int): Array[Double] =
    VectorOps.l2Normalize(Array.tabulate(64)(i => math.sin(seed * 64.0 + i)))

  private def runStream(
      batches: Seq[Seq[(Long, Array[Double], Timestamp)]],
      bootstrap: Option[org.apache.spark.sql.DataFrame])
      : Seq[StreamingSemantic.Pair] = {
    import spark.implicits._
    val stream = MemoryStream[(Long, Array[Double], Timestamp)](spark)
    val pairs = StreamingSemantic.pairs(
      stream.toDF().toDF("vec_id", "v", "event_ts"),
      bootstrapCorpus = bootstrap)
    val name = s"sem_stream_${System.nanoTime()}"
    val q = pairs.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sem-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingSemantic.Pair].collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("a streamed vector pairs with its bootstrapped corpus twin " +
    "EXACTLY ONCE (one resident bucket, 9 probes), with the kernel " +
    "cosine; dissimilar vectors never pair") {
    import spark.implicits._
    val base = unit(5)
    val corpus = Seq((10L, base)).toDF("vec_id", "v")
    // a dissimilar stream vector: find one under the threshold
    val far = (100 to 200).map(unit).find(v =>
      VectorOps.roundAt(VectorOps.dot(base, v), 4) <
        graft.operators.Dedup.EmbeddingCosThreshold).get
    val got = runStream(
      Seq(Seq((500L, base, ts(0)), (501L, far, ts(0)))), Some(corpus))
    assert(got.map(p => (p.vec_a, p.vec_b, p.sim)) == Seq((10L, 500L, 1.0)),
      s"expected exactly one pair row, got $got")
  }

  test("multi-probe reaches a hamming-1 resident; stream-vs-stream " +
    "pairs surface symmetrically") {
    import spark.implicits._
    // find two similar vectors whose SRP buckets differ in exactly 1 bit
    val pairs = for {
      a <- 1 to 60; b <- (a + 1) to 60
      va = unit(a); vb = unit(b)
      hm = java.lang.Integer.bitCount(
        Similarity.srpBucket(va) ^ Similarity.srpBucket(vb))
      sim = VectorOps.roundAt(VectorOps.dot(va, vb), 4)
      if hm == 1 && sim >= graft.operators.Dedup.EmbeddingCosThreshold
    } yield (a, b)
    assume(pairs.nonEmpty, "no hamming-1 similar pair in the seed range")
    val (sa, sb) = pairs.head
    val corpus = Seq((10L, unit(sa))).toDF("vec_id", "v")
    val got = runStream(Seq(Seq((500L, unit(sb), ts(0)))), Some(corpus))
    assert(got.map(p => (p.vec_a, p.vec_b)) == Seq((10L, 500L)),
      s"hamming-1 multi-probe must find the resident: $got")
    // stream-vs-stream across batches, also exactly once
    val got2 = runStream(Seq(
      Seq((1L, unit(sa), ts(0))),
      Seq((2L, unit(sb), ts(1000)))), None)
    assert(got2.map(p => (p.vec_a, p.vec_b)) == Seq((1L, 2L)))
  }
}
