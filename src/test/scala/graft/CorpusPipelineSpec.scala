package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.CorpusPipeline

/** Streaming curation pipeline (quality gate → decontamination →
  * content dedup) against a driver-side batch oracle over the same
  * corpus delivered in two micro-batches.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(ms: Long) = 1700000000000L + ms

  test("stream curate == batch gates, duplicates and contamination drop") {
    import spark.implicits._
    val real = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    // eval set = a handful of real docs (so contamination is guaranteed
    // for those docs themselves if they pass quality)
    val evalTexts = real.take(3).map(_._2)
    val evalSet = CorpusPipeline.evalShingleSet(evalTexts.toDS())
    assert(evalSet.nonEmpty)

    // driver-side oracle with the exact batch formulas
    val qualityPass = graft.operators.TextAnalysis
      .qualityScore(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("quality") >=
        graft.operators.Curation.QualityThreshold)
      .select("doc_id").as[Long].collect().toSet
    def contaminated(text: String): Boolean =
      Dedup.shinglesOfText(text)
        .count(evalSet.contains) >= Dedup.MinContamOverlap

    // corpus: all docs + one exact duplicate in batch 2 whose source is
    // a guaranteed batch-1 SURVIVOR (passes both gates) — first-arrival
    // dedup semantics are then deterministic across the batch boundary
    val firstHalf = real.take(real.length / 2)
    val dupSource = firstHalf
      .find { case (id, t) => qualityPass.contains(id) && !contaminated(t) }
      .getOrElse(fail("no batch-1 doc survives both gates"))
    val docs = real :+ (800001L -> dupSource._2)
    val (b1, b2) = docs.splitAt(real.length / 2)

    val expectedIds = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      docs.flatMap { case (id, t) =>
        val pass = qualityPass.contains(id) ||
          (id == 800001L && qualityPass.contains(dupSource._1))
        if (pass && !contaminated(t) && seen.add(t)) Some(id) else None
      }.toSet
    }
    assert(expectedIds.nonEmpty)
    assert(!expectedIds.contains(800001L),
      "the redelivered duplicate text must not survive")

    val stream = MemoryStream[(Long, String, Long)](spark)
    val curated = CorpusPipeline.curate(
      stream.toDF().toDF("doc_id", "text", "event_tm"), evalSet)
    val name = s"curate_sink_${System.nanoTime()}"
    val q = curated.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("curate-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(b1.map { case (id, t) => (id, t, ts(0)) })
      q.processAllAvailable()
      stream.addData(b2.map { case (id, t) => (id, t, ts(1000)) })
      q.processAllAvailable()
      val got = spark.table(name).select("doc_id").as[Long].collect().toSet
      assert(got == expectedIds,
        s"missing=${expectedIds -- got} extra=${got -- expectedIds}")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("docs differing only in leaked PII dedupe as one after redaction") {
    import spark.implicits._
    // a body long enough to pass the quality gate (length + stopwords)
    val body = ("the data value table with a key for the scan on " * 3).trim
    val d1 = s"$body mail bob@corp.example.com from 10.1.2.3"
    val d2 = s"$body mail eve@other.example.org from 192.168.0.9"
    val stream = MemoryStream[(Long, String, Long)](spark)
    val curated = CorpusPipeline.curate(
      stream.toDF().toDF("doc_id", "text", "event_tm"), Set("zz zz zz"))
    val name = s"pii_sink_${System.nanoTime()}"
    val q = curated.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pii-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(Seq((1L, d1, ts(0))))
      q.processAllAvailable()
      stream.addData(Seq((2L, d2, ts(500))))
      q.processAllAvailable()
      val rows = spark.table(name).select("doc_id", "text")
        .as[(Long, String)].collect()
      assert(rows.map(_._1).toSeq == Seq(1L),
        s"expected only first arrival to survive, got ${rows.map(_._1).toSeq}")
      val red = rows.head._2
      assert(red.contains("<EMAIL>") && red.contains("<IP>")
        && !red.contains("@"))
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("streamed classifier scores == batch classify (train batch, score in-flight)") {
    import spark.implicits._
    val w = graft.operators.QualityClassifier.weights(spark, sf0001)
    val batch = graft.operators.QualityClassifier.classify(spark, sf0001)
      .select("doc_id", "score_micro", "pred_pass")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, s, p) => id -> ((s, p)) }.toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val stream = MemoryStream[(Long, String, Long)](spark)
    val scored = CorpusPipeline.scoreQuality(
      stream.toDF().toDF("doc_id", "text", "event_tm"), w)
    val name = s"clf_sink_${System.nanoTime()}"
    val q = scored.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("clf-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(b1.map { case (id, t) => (id, t, ts(0)) })
      q.processAllAvailable()
      stream.addData(b2.map { case (id, t) => (id, t, ts(1000)) })
      q.processAllAvailable()
      val got = spark.table(name)
        .select("doc_id", "score_micro", "pred_pass")
        .as[(Long, Long, Boolean)].collect()
      assert(got.length == docs.length)
      got.foreach { case (id, s, p) =>
        assert(batch(id) == ((s, p)), s"doc $id stream/batch disagree")
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("quality gate formula matches the batch operator exactly") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val gated = CorpusPipeline.qualityGate(docs)
      .select("doc_id").as[Long].collect().toSet
    val batch = TextAnalysis.qualityScore(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("quality") >=
        graft.operators.Curation.QualityThreshold)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == batch)
  }
}
