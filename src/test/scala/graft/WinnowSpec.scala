package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Winnowing fingerprint dedup: the Schleimer-et-al guarantee is that a
  * common token run of at least FpWindow + NgramN - 1 tokens selects at
  * least one shared fingerprint in both documents regardless of how the
  * run is aligned inside each doc — the exact-substring overlap detector
  * that set-similarity (Jaccard on the whole doc) misses when the copied
  * run is a small fraction of each document.
  */
class WinnowSpec extends AnyFunSuite {
  import SparkTestSession._

  private def write(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-winnow").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("shared run at different offsets is detected; disjoint docs are not") {
    // a 40-token run embedded at offset 0 of doc 0 and offset ~25 of
    // doc 1 — whole-doc Jaccard is low, winnowing must still pair them
    val run = words("shared", 40)
    val d = write(Seq(
      0L -> s"$run ${words("alpha", 60)}",
      1L -> s"${words("beta", 25)} $run ${words("gamma", 35)}",
      2L -> words("delta", 80)))
    val rows = Dedup.winnowPairs(spark, d).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    assert(rows.head.getLong(2) >= Dedup.MinSharedFp)
  }

  test("short docs (below one window) still pair on identical text") {
    val d = write(Seq(
      0L -> "tiny shared snippet of text",
      1L -> "tiny shared snippet of text",
      2L -> "another unrelated short doc"))
    // < FpWindow hashes → the single min-hash fingerprint is selected;
    // identical short docs share it but one fp < MinSharedFp, so the
    // designed behavior is NO pair (exact dedup owns the identical case)
    val pairs = Dedup.winnowPairs(spark, d).collect()
    assert(pairs.isEmpty)
  }

  test("boilerplate fingerprints above the frequency cap are dropped") {
    // 1200 docs all carrying the same boilerplate run > ShingleFreqCap:
    // every boilerplate fp is hot and excised, so no O(n^2) pair space
    // (identical-doc dedup belongs to dedup_exact / minhash star)
    val boiler = words("boiler", 20)
    val docs = (0L until 1200L).map(i => i -> s"$boiler ${words(s"u$i-", 10)}")
    val d = write(docs)
    assert(Dedup.winnowPairs(spark, d).count() == 0)
  }

  test("cross-corpus join: shared run found, right side caps, left never dropped") {
    import org.apache.spark.sql.functions.col
    val run = words("lifted", 40)
    // 600 docs all containing the same 40-token run, split odd (crawl)
    // / even (corpus): every fp posting on the right is 300 > cap →
    // capped at HotGroupCap lowest even ids; every LEFT doc must still
    // pair (the crawl side is never dropped)
    val docs = (0L until 600L).map(i => i -> s"${words(s"pre$i-", 5)} $run")
    val d = write(docs)
    val all = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val rows = Dedup.winnowJoin(
      all.filter(col("doc_id") % 2 === 1),
      all.filter(col("doc_id") % 2 === 0)).collect()
    val leftIds = rows.map(_.getLong(0)).toSet
    assert(leftIds == (1L until 600L by 2).toSet,
      "every crawl doc must be flagged")
    val rightIds = rows.map(_.getLong(1)).toSet
    assert(rightIds.subsetOf((0L until 600L by 2).toSet))
    assert(rows.forall(_.getLong(2) >= Dedup.MinSharedFp))
  }

  test("cross-corpus join: disjoint corpora produce no pairs") {
    import org.apache.spark.sql.functions.col
    val d = write(Seq(
      1L -> words("alpha", 60),
      3L -> words("beta", 60),
      0L -> words("gamma", 60),
      2L -> words("delta", 60)))
    val all = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    assert(Dedup.winnowJoin(
      all.filter(col("doc_id") % 2 === 1),
      all.filter(col("doc_id") % 2 === 0)).count() == 0)
  }

  test("fingerprint selection is deterministic across repartitioning") {
    import org.apache.spark.sql.functions.col
    val run = words("copy", 30)
    val docs = (0L until 50L).map(i => i -> s"${words(s"w$i-", i.toInt % 17)} $run")
    val d = write(docs)
    val a = Dedup.winnowPairs(spark, d).collect().map(_.toSeq).toSet
    val b = Dedup.winnowPairs(spark, d)
      .orderBy(col("doc_b"), col("doc_a")).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
