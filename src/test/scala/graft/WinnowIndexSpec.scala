package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Scratch, WinnowIndex}

/** Persisted winnowed-fingerprint index: build-once / query-increments
  * must be row-identical to the in-memory cross-corpus join (including
  * the union-frequency hot drop), merges must equal a fresh union
  * build, compact must reclaim without changing answers, and the query
  * plan must broadcast the increment (never shuffle the corpus side).
  */
class WinnowIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsOf = graft.sources.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("query over the persisted index == in-memory winnowJoin") {
    val docs = docsOf
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    val root = Files.createTempDirectory("graft-wfidx-eq").toString
    try {
      WinnowIndex.build(corpus, s"$root/idx")
      val viaIndex = rows(WinnowIndex.query(spark, s"$root/idx", inc))
      val inMemory = rows(Dedup.winnowJoin(inc, corpus))
      assert(viaIndex.nonEmpty, "fixture must produce at least one pair")
      assert(viaIndex == inMemory)
    } finally Scratch.rm(new java.io.File(root))
  }

  test("build(A) + merge(B) answers exactly like build(A union B); compact reclaims") {
    val docs = docsOf
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val a = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 1)
    val merged = Files.createTempDirectory("graft-wfidx-m1").toString
    val fresh = Files.createTempDirectory("graft-wfidx-m2").toString
    try {
      WinnowIndex.build(a, s"$merged/idx")
      WinnowIndex.merge(b, s"$merged/idx")
      WinnowIndex.build(a.unionByName(b), s"$fresh/idx")
      val viaMerged = rows(WinnowIndex.query(spark, s"$merged/idx", inc))
      assert(viaMerged.nonEmpty)
      assert(viaMerged == rows(WinnowIndex.query(spark, s"$fresh/idx", inc)))
      // retrying the committed merge is a no-op (marker fingerprint)
      val n = WinnowIndex.postingTable(spark, s"$merged/idx").count()
      WinnowIndex.merge(b, s"$merged/idx")
      assert(WinnowIndex.postingTable(spark, s"$merged/idx").count() == n)
      // compact folds generations without changing any answer
      WinnowIndex.compact(spark, s"$merged/idx")
      assert(rows(WinnowIndex.query(spark, s"$merged/idx", inc)) == viaMerged)
      assert(WinnowIndex.postingTable(spark, s"$merged/idx").count() <= n)
    } finally {
      Scratch.rm(new java.io.File(merged)); Scratch.rm(new java.io.File(fresh))
    }
  }

  test("union-frequency hot drop: a fingerprint hot only across corpus+increment is dropped") {
    import spark.implicits._
    // every doc shares a 40-token prefix, so all of them select the
    // SAME several window-minimum fingerprints from the common region
    // (≥ MinSharedFp of them) plus unique-tail noise; the corpus side
    // alone is under ShingleFreqCap, corpus+increment crosses it, so
    // the in-memory join drops those fps — the index must reproduce
    // that with its stored full counts
    val n = Dedup.ShingleFreqCap - 100 // corpus docs
    val common = (0 until 40).map(j => s"common$j").mkString(" ")
    def mk(ids: Range, tag: String) = ids.map(i =>
      (i.toLong, s"$common $tag${i}a $tag${i}b $tag${i}c $tag${i}d"))
      .toDF("doc_id", "text")
    val corpus = mk(0 until n, "c")
    val incSmall = mk(10000 until 10050, "q")   // under the cap combined? no:
    val root = Files.createTempDirectory("graft-wfidx-hot").toString
    try {
      WinnowIndex.build(corpus, s"$root/idx")
      // 900 corpus + 150 increment = 1050 > 1000 → hot → zero pairs
      val incBig = mk(10000 until 10150, "q")
      val got = WinnowIndex.query(spark, s"$root/idx", incBig)
      val mem = Dedup.winnowJoin(incBig, corpus)
      assert(rows(got) == rows(mem),
        "index hot-drop must match the in-memory union-frequency drop")
      assert(got.count() == 0,
        "fp crossing the cap only with the increment counted must drop")
      // 900 + 50 = 950 ≤ 1000 → fp survives → pairs exist
      val got2 = WinnowIndex.query(spark, s"$root/idx", incSmall)
      assert(got2.count() > 0,
        "fp under the union cap must keep producing pairs")
      assert(rows(got2) == rows(Dedup.winnowJoin(incSmall, corpus)))
    } finally Scratch.rm(new java.io.File(root))
  }

  test("chained admit gates each batch against the index as left by " +
    "the previous step, identically to the in-memory join chain") {
    val docs = docsOf
    def batch(k: Int) = docs.filter(col("doc_id") % 3 === k)
    val root = Files.createTempDirectory("graft-wfidx-admit").toString
    try {
      val idx = s"$root/idx"
      WinnowIndex.build(batch(0), idx)
      val a1 = WinnowIndex.admit(batch(1), idx)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val a2 = WinnowIndex.admit(batch(2), idx)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // expected: the same chain through the in-memory cross-corpus
      // join (whose hot drop is union-scoped exactly like query's)
      val r1 = Dedup.winnowJoin(batch(1), batch(0))
        .select("left_id").collect().map(_.getLong(0)).toSet
      val e1 = batch(1).select("doc_id").collect()
        .map(_.getLong(0)).toSet -- r1
      val landed2 = batch(0).unionByName(
        batch(1).filter(col("doc_id").isin(e1.toSeq: _*)))
      val r2 = Dedup.winnowJoin(batch(2), landed2)
        .select("left_id").collect().map(_.getLong(0)).toSet
      val e2 = batch(2).select("doc_id").collect()
        .map(_.getLong(0)).toSet -- r2
      assert(r1.nonEmpty, "fixture must reject at least one batch-1 doc")
      assert(a1 == e1)
      assert(a2 == e2)
      // the index now covers batch 0 + survivors only: a rejected doc
      // re-offered is rejected again (its near-dup landed), while the
      // final index answers exactly like a fresh build over the
      // admitted corpus
      val fresh = Files.createTempDirectory("graft-wfidx-admit-f").toString
      try {
        WinnowIndex.build(landed2.unionByName(
          batch(2).filter(col("doc_id").isin(e2.toSeq: _*))), s"$fresh/idx")
        val probe = batch(1).limit(50)
        assert(rows(WinnowIndex.query(spark, idx, probe)) ==
          rows(WinnowIndex.query(spark, s"$fresh/idx", probe)))
      } finally Scratch.rm(new java.io.File(fresh))
    } finally Scratch.rm(new java.io.File(root))
  }

  test("query plan broadcasts the increment — corpus side never sort-merges") {
    val docs = docsOf
    val root = Files.createTempDirectory("graft-wfidx-plan").toString
    try {
      WinnowIndex.build(docs.filter(col("doc_id") % 10 =!= 3), s"$root/idx")
      val plan = WinnowIndex.candidateFrame(spark, s"$root/idx",
          docs.filter(col("doc_id") % 10 === 3))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"increment must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"corpus side must not sort-merge (implies shuffle):\n$plan")
    } finally Scratch.rm(new java.io.File(root))
  }
}
