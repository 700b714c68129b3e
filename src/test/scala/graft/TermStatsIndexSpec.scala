package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Scratch, TermStatsIndex, TextAnalysis}

/** Persisted corpus term-statistics index: scoring an increment against
  * the index must be bit-identical to the batch rarity over the unioned
  * corpus filtered to the increment (union semantics — the increment
  * sees itself in the statistics), merges must equal a fresh union
  * build with exact df sums, compact must fold without changing
  * answers, and the query plan must broadcast the increment (never
  * shuffle the stored side).
  */
class TermStatsIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsOf = graft.sources.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("query over the persisted index == batch rarity over the union") {
    val docs = docsOf
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    val root = Files.createTempDirectory("graft-tsidx-eq").toString
    try {
      TermStatsIndex.build(corpus, s"$root/idx")
      val viaIndex = rows(TermStatsIndex.query(spark, s"$root/idx", inc))
      // corpus ∪ increment = the whole table: the batch operator over
      // the full docs table, filtered to the increment, IS the contract
      val batch = rows(TextAnalysis.rarityScore(spark, sf0001)
        .filter(col("doc_id") % 10 === 3))
      assert(viaIndex.nonEmpty, "fixture must score at least one doc")
      assert(viaIndex == batch)
    } finally Scratch.rm(new java.io.File(root))
  }

  test("build(A) + merge(B) answers exactly like build(A union B); compact folds") {
    val docs = docsOf
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val a = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 1)
    val merged = Files.createTempDirectory("graft-tsidx-m1").toString
    val fresh = Files.createTempDirectory("graft-tsidx-m2").toString
    try {
      TermStatsIndex.build(a, s"$merged/idx")
      TermStatsIndex.merge(b, s"$merged/idx")
      TermStatsIndex.build(a.unionByName(b), s"$fresh/idx")
      val viaMerged = rows(TermStatsIndex.query(spark, s"$merged/idx", inc))
      assert(viaMerged.nonEmpty)
      assert(viaMerged ==
        rows(TermStatsIndex.query(spark, s"$fresh/idx", inc)))
      // df sums across generations are exact, not approximate
      assert(rows(TermStatsIndex.statsTable(spark, s"$merged/idx")
          .orderBy("term")) ==
        rows(TermStatsIndex.statsTable(spark, s"$fresh/idx")
          .orderBy("term")))
      assert(TermStatsIndex.docCount(spark, s"$merged/idx") ==
        TermStatsIndex.docCount(spark, s"$fresh/idx"))
      // retrying the committed merge is a no-op (marker fingerprint)
      val n = TermStatsIndex.docCount(spark, s"$merged/idx")
      TermStatsIndex.merge(b, s"$merged/idx")
      assert(TermStatsIndex.docCount(spark, s"$merged/idx") == n)
      // compact folds generations without changing any answer
      TermStatsIndex.compact(spark, s"$merged/idx")
      assert(rows(TermStatsIndex.query(spark, s"$merged/idx", inc))
        == viaMerged)
      assert(TermStatsIndex.docCount(spark, s"$merged/idx") == n)
    } finally {
      Scratch.rm(new java.io.File(merged)); Scratch.rm(new java.io.File(fresh))
    }
  }

  test("query plan broadcasts the increment — stored side never sort-merges") {
    val docs = docsOf
    val root = Files.createTempDirectory("graft-tsidx-plan").toString
    try {
      TermStatsIndex.build(docs.filter(col("doc_id") % 10 =!= 3),
        s"$root/idx")
      val plan = TermStatsIndex.scoreFrameNow(spark, s"$root/idx",
          docs.filter(col("doc_id") % 10 === 3))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"increment must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"stored side must not sort-merge (implies shuffle):\n$plan")
    } finally Scratch.rm(new java.io.File(root))
  }
}
