package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, Similarity}

/** Persisted PQ index lifecycle: build → storage → query, bit-identical
  * to the in-memory operator, with the hot scan touching only the
  * packed 8-byte codes; incremental merges encode against the frozen
  * stored codebooks.
  */
class PqIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val idx: String = {
    val p = Files.createTempDirectory("graft-pqindex").toString
    PqIndex.build(spark, sf0001, p)
    p
  }

  test("index layout: one packed BIGINT code per vector, tiny codebooks") {
    val codes = PqIndex.codeTable(spark, idx)
    assert(codes.columns.toSeq == Seq("vec_id", "code"))
    val n = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(codes.count() == n)
    val cb = spark.read.parquet(s"$idx/codebooks.v1.parquet")
    assert(cb.count() == Similarity.PqM * Similarity.PqK)
  }

  test("persisted-index query == in-memory pqTopK, bit for bit") {
    val fromIndex = PqIndex.topK(spark, sf0001, idx).collect().map(_.toSeq)
    val inMemory = Similarity.pqTopK(spark, sf0001).collect().map(_.toSeq)
    assert(fromIndex.sameElements(inMemory))
  }

  test("merge encodes against the STORED codebooks: split build+merge == one-shot build's codes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one-shot reference over the full corpus
    val oneShot = PqIndex.codeTable(spark, idx).as[(Long, Long)]
      .collect().toMap
    // split: build on 60%, merge the rest — codebooks train on the
    // SPLIT, so codes differ from oneShot in general; what must hold is
    // that merged codes equal re-encoding the same vectors against the
    // split index's stored codebooks (frozen-codebook contract)
    val root = Files.createTempDirectory("graft-pq-split").toString
    try {
      val vecs = graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      PqIndex.build(vecs.filter(col("vec_id") % 10 < 6), s"$root/idx")
      PqIndex.merge(vecs.filter(col("vec_id") % 10 >= 6), s"$root/idx")
      val all = PqIndex.codeTable(spark, s"$root/idx").as[(Long, Long)]
        .collect().toMap
      assert(all.size == oneShot.size, "merge must cover the whole corpus")
      val reEncoded = PqIndex.encodeStage(
          vecs.filter(col("vec_id") % 10 >= 6)
            .withColumnRenamed("v", "embedding"), s"$root/idx")
        .select(col("vec_id"), col("code")).as[(Long, Long)].collect()
      reEncoded.foreach { case (id, code) =>
        assert(all(id) == code, s"vec $id merged/re-encoded code mismatch")
      }
      // retrying the SAME merge batch is a fingerprint-detected no-op
      PqIndex.merge(vecs.filter(col("vec_id") % 10 >= 6), s"$root/idx")
      assert(PqIndex.codeTable(spark, s"$root/idx").count() == all.size,
        "a retried merge must not duplicate codes")
    } finally graft.operators.Scratch.rm(new java.io.File(root))
  }

  test("streaming encode stage: in-flight codes == the built index's codes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val stored = PqIndex.codeTable(spark, idx)
      .as[(Long, Long)].collect().toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = vecs.splitAt(vecs.length / 2)
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val encoded = PqIndex.encodeStage(
      stream.toDF().toDF("vec_id", "embedding"), idx)
      .select("vec_id", "code")
    val name = s"pq_enc_${System.nanoTime()}"
    val q = encoded.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("pq-enc-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, Long)].collect()
      assert(got.length == vecs.length)
      got.foreach { case (id, code) =>
        assert(code == stored(id), s"vec $id stream/index code mismatch")
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("codes round-trip: decoding the stored code re-derives the argmin") {
    import spark.implicits._
    // re-encoding the corpus against the STORED codebooks must equal
    // the stored codes (parquet round-trips doubles exactly)
    val cbRows = spark.read.parquet(s"$idx/codebooks.v1.parquet")
      .as[(Int, Int, Array[Double])].collect()
    val cents = Array.ofDim[Array[Double]](Similarity.PqM, Similarity.PqK)
    cbRows.foreach { case (m, cid, cv) => cents(m)(cid) = cv }
    val stored = PqIndex.codeTable(spark, idx)
      .as[(Long, Long)].collect().toMap
    val sd = Similarity.PqSubDim
    graft.sources.Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().foreach { case (id, v) =>
        val nv = graft.operators.VectorOps.l2Normalize(v)
        var code = 0L
        for (m <- 0 until Similarity.PqM)
          code |= Similarity.pqArgmin(cents(m),
            nv.slice(m * sd, (m + 1) * sd)).toLong << (4 * m)
        assert(code == stored(id), s"vec $id code mismatch")
      }
  }
}
