package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MinhashIndex, Scratch}

/** Persisted banded MinHash index: build-once / query-increments must
  * be row-identical to the in-memory cross-corpus join, the query plan
  * must broadcast the increment (never shuffle the corpus side), and
  * the resident cap must be baked in at build time.
  */
class MinhashIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("query over the persisted index == in-memory minhashJoin") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    val root = Files.createTempDirectory("graft-mhidx-eq").toString
    try {
      MinhashIndex.build(corpus, s"$root/idx")
      val viaIndex = MinhashIndex.query(spark, s"$root/idx", inc)
        .collect().map(_.toSeq)
      val inMemory = Dedup.minhashJoin(inc, corpus)
        .collect().map(_.toSeq)
      assert(viaIndex.nonEmpty, "fixture must produce at least one pair")
      assert(viaIndex.toSeq == inMemory.toSeq)
    } finally Scratch.rm(new java.io.File(root))
  }

  test("query plan broadcasts the increment — corpus side never shuffles") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-mhidx-plan").toString
    try {
      MinhashIndex.build(docs.filter(col("doc_id") % 10 =!= 3), s"$root/idx")
      val plan = MinhashIndex.candidateFrame(spark, s"$root/idx",
          docs.filter(col("doc_id") % 10 === 3))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"increment must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"corpus side must not sort-merge (implies shuffle):\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"corpus side must not shuffle:\n$plan")
    } finally Scratch.rm(new java.io.File(root))
  }

  test("build(A) + merge(B) answers exactly like build(A union B)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val a = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 2 === 1)
    val merged = Files.createTempDirectory("graft-mhidx-m1").toString
    val fresh = Files.createTempDirectory("graft-mhidx-m2").toString
    try {
      MinhashIndex.build(a, s"$merged/idx")
      MinhashIndex.merge(b, s"$merged/idx")
      MinhashIndex.build(a.unionByName(b), s"$fresh/idx")
      val viaMerged = MinhashIndex.query(spark, s"$merged/idx", inc)
        .collect().map(_.toSeq)
      val viaFresh = MinhashIndex.query(spark, s"$fresh/idx", inc)
        .collect().map(_.toSeq)
      assert(viaMerged.nonEmpty)
      assert(viaMerged.toSeq == viaFresh.toSeq)
    } finally {
      Scratch.rm(new java.io.File(merged)); Scratch.rm(new java.io.File(fresh))
    }
  }

  test("merge then query re-caps stale residents: union cap == fresh cap") {
    import spark.implicits._
    def identical(ids: Range) = ids.map(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val merged = Files.createTempDirectory("graft-mhidx-s1").toString
    val fresh = Files.createTempDirectory("graft-mhidx-s2").toString
    try {
      // both generations exceed the cap on the SAME bucket: stored
      // residents = 256 of A + 256 of B; true union residents = 0..255
      MinhashIndex.build(identical(0 until 300), s"$merged/idx")
      MinhashIndex.merge(identical(300 until 600), s"$merged/idx")
      MinhashIndex.build(identical(0 until 600), s"$fresh/idx")
      val inc = identical(600 until 610)
      val viaMerged = MinhashIndex.query(spark, s"$merged/idx", inc)
      val got = viaMerged.collect()
      assert(got.length == 10 * Dedup.HotGroupCap)
      assert(got.map(_.getLong(1)).max == Dedup.HotGroupCap - 1L,
        "re-cap must keep the union's smallest ids, not one per generation")
      assert(got.map(_.toSeq).toSeq ==
        MinhashIndex.query(spark, s"$fresh/idx", inc).collect().map(_.toSeq).toSeq)
    } finally {
      Scratch.rm(new java.io.File(merged)); Scratch.rm(new java.io.File(fresh))
    }
  }

  test("compact reclaims out-capped rows and leaves answers unchanged") {
    import spark.implicits._
    def identical(ids: Range) = ids.map(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-mhidx-c").toString
    try {
      MinhashIndex.build(identical(0 until 300), s"$root/idx")
      MinhashIndex.merge(identical(300 until 600), s"$root/idx")
      val before = MinhashIndex.bandTable(spark, s"$root/idx").count()
      val inc = identical(600 until 605)
      val preCompact = MinhashIndex.query(spark, s"$root/idx", inc)
        .collect().map(_.toSeq)
      MinhashIndex.compact(spark, s"$root/idx")
      val after = MinhashIndex.bandTable(spark, s"$root/idx")
      // every bucket back to exactly cap residents (both generations
      // overflowed the same buckets)
      after.groupBy("b", "k").count().collect()
        .foreach(r => assert(r.getLong(2) == Dedup.HotGroupCap))
      assert(after.count() < before, "compaction must reclaim rows")
      assert(MinhashIndex.query(spark, s"$root/idx", inc)
        .collect().map(_.toSeq).toSeq == preCompact.toSeq)
    } finally Scratch.rm(new java.io.File(root))
  }

  test("hot buckets cap at build: residents bounded, every increment doc flagged") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mhidx-hot").toString
    val root = Files.createTempDirectory("graft-mhidx-hotidx").toString
    try {
      val docs = (0L until 600L)
        .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
        .toDF("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 2 === 0) // 300 > cap 256
      MinhashIndex.build(corpus, s"$root/idx")
      // residents persisted per bucket are the cap smallest ids
      val bands = MinhashIndex.bandTable(spark, s"$root/idx")
      val perBucket = bands.groupBy("b", "k")
        .agg(count(lit(1)).as("n"), max(col("right_id")).as("mx"))
        .collect()
      assert(perBucket.nonEmpty)
      perBucket.foreach { r =>
        assert(r.getAs[Long]("n") == Dedup.HotGroupCap)
        assert(r.getAs[Long]("mx") == (Dedup.HotGroupCap - 1) * 2L)
      }
      // every left doc still pairs with every resident
      val out = MinhashIndex.query(spark, s"$root/idx",
        docs.filter(col("doc_id") % 2 === 1))
      assert(out.count() == 300L * Dedup.HotGroupCap)
    } finally { Scratch.rm(new java.io.File(root)); Scratch.rm(new java.io.File(d)) }
  }

  test("admit: survivors merge in, rejects stay out, index content == admitted set") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val novel = (k: Int) => s"completely different subject matter number $k " +
      s"with unique vocabulary item$k token$k word$k term$k phrase$k"
    val b0 = Seq((0L, base), (1L, novel(1))).toDF("doc_id", "text")
    // batch 1: doc 10 duplicates base (guaranteed band collision),
    // doc 11 is new
    val b1 = Seq((10L, base), (11L, novel(2))).toDF("doc_id", "text")
    // batch 2: doc 20 duplicates the landed base, doc 21 duplicates the
    // batch-1 SURVIVOR 11 (so survivors must gate later batches),
    // doc 22 is new
    val b2 = Seq((20L, base), (21L, novel(2)), (22L, novel(3)))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-mh-admit").toString
    try {
      val idx = s"$root/idx"
      MinhashIndex.build(b0, idx)
      val a1 = MinhashIndex.admit(b1, idx).select("doc_id")
        .as[Long].collect().toSet
      assert(a1 == Set(11L), s"batch 1 must admit only the novel doc: $a1")
      val a2 = MinhashIndex.admit(b2, idx).select("doc_id")
        .as[Long].collect().toSet
      assert(a2 == Set(22L),
        s"batch 2 must reject dups of landed docs AND of admitted survivors: $a2")
      // the index's committed shingle set covers exactly the admitted docs
      val indexed = spark.read
        .option("basePath", s"$idx/shingles").parquet(s"$idx/shingles")
        .select("doc_id").as[Long].collect().toSet
      assert(indexed == Set(0L, 1L, 11L, 22L),
        s"index content must equal the admitted set: $indexed")
      // an all-duplicate batch admits nothing and leaves the index usable
      val a3 = MinhashIndex.admit(
        Seq((30L, base)).toDF("doc_id", "text"), idx)
      assert(a3.isEmpty)
      assert(MinhashIndex.query(spark, idx,
        Seq((40L, base)).toDF("doc_id", "text")).count() >= 1,
        "the index must stay queryable after an empty-admission merge")
    } finally Scratch.rm(new java.io.File(root))
  }
}
