package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DecontamIndex, Scratch}

/** Persisted decontamination index: the stored filter must round-trip
  * bit-exactly, query results must match the from-scratch Bloom path
  * row for row, and the artifact must stay bounded by filter geometry.
  */
class DecontamIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("persisted query == in-memory decontaminateBloom") {
    val viaIndex = DecontamIndex.persistedDecontam(spark, sf0001)
      .collect().map(_.toSeq)
    Dedup.clearMemo() // decontaminateBloom publishes to the shared memo
    val inMemory = Dedup.decontaminateBloom(spark, sf0001)
      .collect().map(_.toSeq)
    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq == inMemory.toSeq)
  }

  test("bloom words round-trip the store bit-exactly") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % Dedup.EvalStride === 0)
    val root = Files.createTempDirectory("graft-dcidx-rt").toString
    try {
      DecontamIndex.build(evalDocs, s"$root/idx")
      val loaded = DecontamIndex.loadBloom(spark, s"$root/idx")
      // rebuild in memory with the same geometry the artifact declares
      val sh = spark.read.parquet(s"$root/idx/shingles.parquet")
      val direct = Dedup.bloomBuild(sh, "s", loaded.length * 64)
      assert(loaded.toSeq == direct.toSeq)
      assert(loaded.exists(_ != 0L), "filter must have set bits")
    } finally Scratch.rm(new java.io.File(root))
  }

  test("artifact is bounded by geometry, not eval-set size") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-dcidx-geom").toString
    try {
      DecontamIndex.build(docs.filter(col("doc_id") % Dedup.EvalStride === 0),
        s"$root/idx")
      val nWords = DecontamIndex.loadBloom(spark, s"$root/idx").length
      // the persisted sparse rows can never exceed the dense word count
      val sparseRows = spark.read.parquet(s"$root/idx/bloom.parquet").count()
      assert(sparseRows <= nWords)
      assert(nWords * 64 >= Dedup.BloomBits) // floor geometry respected
    } finally Scratch.rm(new java.io.File(root))
  }
}
