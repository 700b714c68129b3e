package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** The streaming near-dup twin: signature/band parity with the batch
  * kernel, cross-micro-batch pair detection, deterministic capped
  * behavior on a hot bucket.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  /** Driver-side oracle: all (a<b) pairs sharing ≥1 band whose
    * 16-component signature estimate clears the threshold. */
  private def expectedPairs(docs: Seq[(Long, String)])
      : Set[(Long, Long, Double)] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val sigs = docs.flatMap { case (id, text) =>
      val sh = Dedup.shinglesOfText(text)
      if (sh.isEmpty) None
      else Some((id, Dedup.minhashSignature(sh, digest),
        Dedup.bandKeys(Dedup.minhashSignature(sh, digest), digest)))
    }
    (for {
      (ia, sa, ba) <- sigs
      (ib, sb, bb) <- sigs
      if ia < ib && ba.zip(bb).exists { case (x, y) => x == y }
      est = BigDecimal(StreamingNearDup.estJaccard(sa, sb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if est >= StreamingNearDup.EstThreshold
    } yield (ia, ib, est)).toSet
  }

  private def runStream(batches: Seq[Seq[(Long, String, Timestamp)]])
      : Seq[StreamingNearDup.Pair] = {
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Timestamp)](spark)
    val pairs = StreamingNearDup.pairs(
      stream.toDF().toDF("doc_id", "text", "event_ts"))
    val name = s"neardup_sink_${System.nanoTime()}"
    val q = pairs.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingNearDup.Pair].collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("pairs across micro-batches match the batch-kernel oracle") {
    import spark.implicits._
    val real = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // guaranteed near-dups: one exact copy and one light edit of a real doc
    val base = real.head._2
    val docs = real ++ Seq(
      (900001L, base),
      (900002L, base + " extra trailing tokens here"))
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val got = runStream(Seq(
      b1.map { case (id, t) => (id, t, ts(0)) },
      b2.map { case (id, t) => (id, t, ts(1000)) }))

    val gotSet = got.map(p => (p.doc_a, p.doc_b, p.est_jaccard)).toSet
    val expected = expectedPairs(docs)
    assert(expected.nonEmpty, "test corpus must contain near-dups")
    assert(expected.exists(p => p._1 == real.head._1 && p._2 == 900001L),
      "the exact copy must pair with its source")
    assert(gotSet == expected,
      s"stream/batch divergence: missing=${expected -- gotSet} " +
        s"extra=${gotSet -- expected}")
    // the copy pair spans the two micro-batches (source in b1, copy in b2)
    assert(b1.exists(_._1 == real.head._1) && b2.exists(_._1 == 900001L))
  }

  test("bootstrap: stream flags near-dups of the landed corpus from batch one") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    // stream: an exact copy of corpus doc 10 plus an unrelated doc
    val stream = MemoryStream[(Long, String, Timestamp)](spark)
    val pairs = StreamingNearDup.pairs(
      stream.toDF().toDF("doc_id", "text", "event_ts"),
      bootstrapCorpus = Some(corpus))
    val name = s"neardup_boot_${System.nanoTime()}"
    val q = pairs.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup-boot-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(Seq(
        (500L, "alpha beta gamma delta epsilon zeta eta theta", ts(0)),
        (501L, "totally different words with no overlap at all", ts(0))))
      q.processAllAvailable()
      val got = spark.table(name).as[StreamingNearDup.Pair].collect()
      val pairKeys = got.map(p => (p.doc_a, p.doc_b)).distinct
      assert(pairKeys.toSet == Set((10L, 500L)),
        s"expected the corpus doc to pair with its stream copy, got ${pairKeys.toSeq}")
      assert(got.forall(_.est_jaccard == 1.0))
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("uniquePairs: exactly-once (doc_a, doc_b) across bands and " +
    "cross-batch re-emissions") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // identical texts collide in ALL FOUR bands; re-sending doc 2 in a
    // later batch re-emits the pair from every band a second time
    val batches = Seq(
      Seq((1L, text, ts(0))),
      Seq((2L, text, ts(1000))),
      Seq((2L, text, ts(2000))))
    // raw contract: one row per colliding band (and again on re-arrival)
    val raw = runStream(batches)
    assert(raw.count(p => p.doc_a == 1L && p.doc_b == 2L) >= 8,
      s"expected 4 bands x 2 arrivals, got ${raw.toSeq}")
    // deduped stage: exactly one row within the watermark horizon
    val stream = MemoryStream[(Long, String, Timestamp)](spark)
    val deduped = StreamingNearDup.uniquePairs(
      stream.toDF().toDF("doc_id", "text", "event_ts"))
    val name = s"neardup_uniq_${System.nanoTime()}"
    val confKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val priorConf = spark.conf.getOption(confKey)
    val q = StreamingNearDup.startUnchecked(spark) {
      deduped.writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("neardup-uniq-ckpt")
            .toString)
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    // the check-disable is scoped to the started query: the session
    // conf is restored the moment startUnchecked returns
    assert(spark.conf.getOption(confKey) == priorConf,
      "startUnchecked must restore the session's correctness-check conf")
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val got = spark.table(name)
        .select("doc_a", "doc_b", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == Seq((1L, 2L, 1.0)),
        s"expected exactly one deduped pair row, got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("hot bucket: deterministic capped membership, no lost comparisons") {
    // 260 identical docs > HotGroupCap=256: every newcomer compares
    // against min(i, cap) residents; membership stops growing at the cap
    val n = 260
    val docs = (1 to n).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon", ts(i)))
    val got = runStream(Seq(docs))
    val perBand = got.groupBy(_.band).view.mapValues(_.size).toMap
    val expectedPerBand = (1 until n)
      .map(i => math.min(i, Dedup.HotGroupCap)).sum
    assert(perBand.keySet == Set(0, 1, 2, 3))
    perBand.foreach { case (b, c) =>
      assert(c == expectedPerBand, s"band $b: $c != $expectedPerBand")
    }
    assert(got.forall(_.est_jaccard == 1.0))
  }
}
