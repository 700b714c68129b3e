package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, VectorOps}

/** Batch embedding cross-corpus join (`Dedup.semanticJoin`): candidate
  * reach must be exactly the SRP bucket + hamming-1 multi-probe the
  * streaming twin uses, verification must be exact round-4 cosine, and
  * the hot-bucket cap must be one-sided (landed residents capped, the
  * crawl side never silently excluded).
  */
class SemanticCrossCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  test("semanticCrossCorpus equals the brute-force hamming-1 bucket " +
    "filter when every bucket is under the cap") {
    val got = Dedup.semanticCrossCorpus(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = graft.sources.Tables.embeddings(spark, sf001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
    val sig = vecs.map { case (id, v) =>
      (id, Similarity.srpBucket(v), VectorOps.l2Normalize(v))
    }
    // sf0.01 holds 500 vectors over 256 buckets — far under
    // HotGroupCap per bucket, so the capped join must equal the full
    // left-vs-right reach filter
    val expected = (for {
      (il, bl, nl) <- sig if il % 2 == 1
      (ir, br, nr) <- sig if ir % 2 == 0
      if java.lang.Integer.bitCount(bl ^ br) <= 1
      s = VectorOps.roundAt(VectorOps.dot(nl, nr), 4)
      if s >= Dedup.EmbeddingCosThreshold
    } yield (il, ir, s)).sorted
    assert(got.nonEmpty, "the sf0.01 clusters must produce cross pairs")
    assert(got.toSeq.sorted == expected.toSeq)
  }

  test("hot-bucket cap is one-sided: an over-cap landed bucket keeps " +
    "cap smallest-id residents; the crawl side is never capped") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i * 0.37) + 0.2)
    val n = Dedup.HotGroupCap + 44 // landed bucket of 300 identical vecs
    val landed = (0L until 2L * n).filter(_ % 2 == 0).map(id => (id, base))
    val crawl = Seq((1L, base), (3L, base)) // two uncapped crawl dups
    val got = Dedup.semanticJoin(
        crawl.toDF("vec_id", "v"), landed.toDF("vec_id", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byLeft = got.groupBy(_._1)
    assert(byLeft(1L).length == Dedup.HotGroupCap)
    assert(byLeft(3L).length == Dedup.HotGroupCap)
    assert(got.forall(_._3 == 1.0))
    assert(got.count(_._2 == 0L) == 2, "the bucket min survives the cap")
    assert(got.length == 2 * Dedup.HotGroupCap,
      s"uncapped would be ${2 * landed.length} rows")
  }

  test("multi-probe reach: a crawl vector finds a landed neighbor one " +
    "bucket-bit away") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i * 0.37) + 0.2)
    val b0 = Similarity.srpBucket(base)
    // search a small perturbation whose bucket is exactly hamming-1
    // from base's and whose cosine still clears the threshold
    val neighbor = Iterator.from(1)
      .map { k =>
        val v = base.clone()
        v(k % 64) = v(k % 64) - 0.02 * (k / 64 + 1)
        v
      }
      .find { v =>
        java.lang.Integer.bitCount(Similarity.srpBucket(v) ^ b0) == 1 &&
          VectorOps.roundAt(VectorOps.dot(
            VectorOps.l2Normalize(v), VectorOps.l2Normalize(base)),
            4) >= Dedup.EmbeddingCosThreshold
      }
      .get
    val got = Dedup.semanticJoin(
        Seq((1L, base)).toDF("vec_id", "v"),
        Seq((2L, neighbor)).toDF("vec_id", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)),
      "the hamming-1 probe must reach the adjacent bucket")
  }
}
