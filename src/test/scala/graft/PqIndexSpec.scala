package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, Similarity}

/** Persisted PQ index lifecycle: build → storage → query, bit-identical
  * to the in-memory operator, with the hot scan touching only the
  * packed 8-byte codes.
  */
class PqIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val idx: String = {
    val p = Files.createTempDirectory("graft-pqindex").toString
    PqIndex.build(spark, sf0001, p)
    p
  }

  test("index layout: one packed BIGINT code per vector, tiny codebooks") {
    val codes = spark.read.parquet(s"$idx/codes.parquet")
    assert(codes.columns.toSeq == Seq("vec_id", "code"))
    val n = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(codes.count() == n)
    val cb = spark.read.parquet(s"$idx/codebooks.parquet")
    assert(cb.count() == Similarity.PqM * Similarity.PqK)
  }

  test("persisted-index query == in-memory pqTopK, bit for bit") {
    val fromIndex = PqIndex.topK(spark, sf0001, idx).collect().map(_.toSeq)
    val inMemory = Similarity.pqTopK(spark, sf0001).collect().map(_.toSeq)
    assert(fromIndex.sameElements(inMemory))
  }

  test("streaming encode stage: in-flight codes == the built index's codes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val stored = spark.read.parquet(s"$idx/codes.parquet")
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
    val cbRows = spark.read.parquet(s"$idx/codebooks.parquet")
      .as[(Int, Int, Array[Double])].collect()
    val cents = Array.ofDim[Array[Double]](Similarity.PqM, Similarity.PqK)
    cbRows.foreach { case (m, cid, cv) => cents(m)(cid) = cv }
    val stored = spark.read.parquet(s"$idx/codes.parquet")
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
