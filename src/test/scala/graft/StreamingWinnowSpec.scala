package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingWinnow

/** Streaming copied-passage detection: the fingerprint-bucket pass
  * must flag a streamed doc that copies a passage from a bootstrapped
  * corpus doc (≥ MinSharedFp shared winnow fingerprints), keep
  * unrelated docs silent, use the batch kernel bit-identically, and
  * cap bucket residents at HotGroupCap.
  */
class StreamingWinnowSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(ms: Long) = new Timestamp(1704067200000L + ms)

  // ≥ FpWindow+2 tokens so a copied passage selects several window
  // minima; distinct tails keep docs from pairing via their own text
  private def passage(tag: String) =
    (0 until 30).map(j => s"${tag}w$j").mkString(" ")

  private def runStream(
      batches: Seq[Seq[(Long, String, Timestamp)]],
      bootstrap: Option[org.apache.spark.sql.DataFrame])
      : Seq[StreamingWinnow.Match] = {
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Timestamp)](spark)
    val pairs = StreamingWinnow.pairs(
      stream.toDF().toDF("doc_id", "text", "event_ts"),
      bootstrapCorpus = bootstrap)
    val name = s"wn_stream_${System.nanoTime()}"
    val q = pairs.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wn-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingWinnow.Match].collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("a streamed doc copying a corpus passage collides in the same " +
    "fingerprints the batch kernel selects; an unrelated doc is silent") {
    import spark.implicits._
    val common = passage("c")
    val corpus = Seq((10L, s"$common tail10a tail10b tail10c"))
      .toDF("doc_id", "text")
    val got = runStream(Seq(Seq(
      (500L, s"$common tail500a tail500b tail500c", ts(0)),
      (501L, passage("zz"), ts(0)))), Some(corpus))
    val byPair = got.groupBy(p => (p.doc_a, p.doc_b))
    assert(byPair.keySet == Set((10L, 500L)),
      s"only the copying doc pairs, got ${byPair.keySet}")
    // the shared fps are exactly the batch kernel's intersection
    val digest = java.security.MessageDigest.getInstance("MD5")
    val fpsCorpus = Dedup.winnowFpsOf(
      s"$common tail10a tail10b tail10c", digest).toSet
    val fpsInc = Dedup.winnowFpsOf(
      s"$common tail500a tail500b tail500c", digest).toSet
    val shared = fpsCorpus intersect fpsInc
    assert(shared.size >= Dedup.MinSharedFp, "fixture needs a real overlap")
    assert(got.filter(p => p.doc_a == 10L).map(_.fp).toSet == shared)
  }

  test("bucket residents cap at HotGroupCap: an over-cap corpus family " +
    "yields cap match rows per shared fp, min id always resident") {
    import spark.implicits._
    val common = passage("h")
    val n = Dedup.HotGroupCap + 20
    // identical corpus docs → identical fp sets → one over-cap bucket
    // per selected fp
    val corpus = (0L until n.toLong).map(i => (i, common))
      .toDF("doc_id", "text")
    val got = runStream(
      Seq(Seq((9000L, common, ts(0)))), Some(corpus))
    val digest = java.security.MessageDigest.getInstance("MD5")
    val nFps = Dedup.winnowFpsOf(common, digest).size
    assert(got.size == nFps * Dedup.HotGroupCap,
      s"expected ${nFps}x${Dedup.HotGroupCap} match rows, got ${got.size}")
    assert(got.count(_.doc_a == 0L) == nFps, "bucket min survives the cap")
    assert(!got.exists(_.doc_a >= Dedup.HotGroupCap.toLong),
      "no non-resident corpus doc may emit")
  }
}
