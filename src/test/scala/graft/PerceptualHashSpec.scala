package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MediaCodec, PerceptualHash}

/** Perceptual image near-dup: the aHash must equal the closed-form
  * replay of the synthesized pixel ramp (decode and synthesis are
  * independent code paths — a bug in either breaks the equality), and
  * the pair operator must honor the hamming bound, ordering, and the
  * undecodable-payload exclusion.
  */
class PerceptualHashSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The oracle's arithmetic, in Scala: sampled gray from the ramp. */
  private def closedFormAhash(d: Long): (Long, Long) = {
    val w = 4 * (1 + d % 8)
    val h = 2 + (d * 5) % 14
    def gray(b: Int): Long = {
      val y = (b / 8) * h / 8
      // BMP (odd ids) stores rows bottom-up: decoded row y is the
      // written row h-1-y, so the ramp index flips vertically
      val row = if (d % 2 == 0) y else h - 1 - y
      val p = 3 * (row * w + (b % 8) * w / 8)
      (d + p) % 256 + (d + p + 1) % 256 + (d + p + 2) % 256
    }
    val gs = Array.tabulate(64)(gray)
    val tot = gs.sum
    var phi = 0L
    var plo = 0L
    for (b <- 0 until 64 if 64L * gs(b) > tot)
      if (b < 32) phi |= 1L << b else plo |= 1L << (b - 32)
    (phi, plo)
  }

  test("ahash over the DECODED raster equals the closed-form ramp replay " +
    "for both png (even ids) and bmp (odd ids)") {
    // skip ids divisible by 17 (truncated payloads, no hash)
    // (no id divisible by 17 — those are truncated payloads)
    for (d <- Seq(1L, 2L, 3L, 4L, 10L, 23L, 100L, 254L, 256L, 399L)) {
      val got = PerceptualHash.ahash(MediaCodec.synthImage(d))
      assert(got.contains(closedFormAhash(d)), s"doc $d")
    }
  }

  test("undecodable payloads hash to nothing") {
    assert(PerceptualHash.ahash(MediaCodec.synthImage(17L)).isEmpty)
    assert(PerceptualHash.ahash(Array[Byte](1, 2, 3)).isEmpty)
    assert(PerceptualHash.ahash(null).isEmpty)
  }

  test("phash pairs: ordered, hamming-bounded, truncated docs excluded, " +
    "and exact against a brute-force replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = PerceptualHash.phash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, hm) =>
      a < b && hm >= 0 && hm <= PerceptualHash.MaxHamming })
    assert(got.forall { case (a, b, _) => a % 17 != 0 && b % 17 != 0 })
    // brute-force replay over the closed form (all groups/buckets are
    // far under HotGroupCap at this scale, so capped == full clique)
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 17 != 0)
    val hs = ids.map(d => d -> closedFormAhash(d)).toMap
    val expected = (for {
      i <- ids; j <- ids if i < j
      hm = java.lang.Long.bitCount(hs(i)._1 ^ hs(j)._1) +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if hm <= PerceptualHash.MaxHamming
    } yield (i, j, hm)).sorted
    assert(hs.values.groupBy(identity).values.map(_.size).max
      <= Dedup.HotGroupCap, "scale assumption: groups under the cap")
    assert(got.toSeq.sorted == expected.toSeq)
  }

  /** The DCT oracle's arithmetic, in Scala, from the ramp: 32×32 gray
    * grid → separable integer DCT → median-thresholded low band. */
  private def closedFormDct(d: Long): (Long, Long) = {
    val n = PerceptualHash.DctGrid
    val w = 4 * (1 + d % 8)
    val h = 2 + (d * 5) % 14
    def gray(b: Int): Long = {
      val y = (b / n) * h / n
      val row = if (d % 2 == 0) y else h - 1 - y
      val p = 3 * (row * w + (b % n) * w / n)
      (d + p) % 256 + (d + p + 1) % 256 + (d + p + 2) % 256
    }
    val gs = Array.tabulate(n * n)(gray)
    val q = PerceptualHash.DctTable
    val co = Array.tabulate(64) { k =>
      val (u, v) = (k / 8, k % 8)
      (for (y <- 0 until n; x <- 0 until n)
        yield q(u)(y).toLong * q(v)(x) * gs(y * n + x)).sum
    }
    val med = co.slice(1, 64).sorted.apply(31)
    var phi = 0L
    var plo = 0L
    for (b <- 1 until 64 if co(b) > med)
      if (b < 32) phi |= 1L << b else plo |= 1L << (b - 32)
    (phi, plo)
  }

  test("dctHash over the DECODED raster equals the closed-form ramp " +
    "replay, and undecodable payloads hash to nothing") {
    for (d <- Seq(1L, 2L, 3L, 4L, 10L, 23L, 100L, 254L, 256L, 399L)) {
      val got = PerceptualHash.dctHash(MediaCodec.synthImage(d))
      assert(got.contains(closedFormDct(d)), s"doc $d")
    }
    assert(PerceptualHash.dctHash(MediaCodec.synthImage(17L)).isEmpty)
    assert(PerceptualHash.dctHash(Array[Byte](1, 2, 3)).isEmpty)
    // DC (global brightness) never sets a bit
    for (d <- Seq(2L, 3L)) {
      val (phi, _) = closedFormDct(d)
      assert((phi & 1L) == 0L, "bit 0 is the excluded DC coefficient")
    }
  }

  test("dct pairs: exact against a brute-force replay at sf0.001, and " +
    "more discriminative than aHash on identical-hash groups") {
    val dir = "/root/testdata/sf0.001"
    val got = PerceptualHash.phashDct(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 17 != 0)
    val hs = ids.map(d => d -> closedFormDct(d)).toMap
    assert(hs.values.groupBy(identity).values.map(_.size).max
      <= Dedup.HotGroupCap, "scale assumption: groups under the cap")
    val expected = (for {
      i <- ids; j <- ids if i < j
      hm = java.lang.Long.bitCount(hs(i)._1 ^ hs(j)._1) +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if hm <= PerceptualHash.MaxHamming
    } yield (i, j, hm)).sorted
    assert(got.toSeq.sorted == expected.toSeq)
    // the 64-sample mean threshold collides far more rasters than the
    // frequency-domain hash: DCT's identical-hash (hamming-0) pair set
    // must be a strict subset of the corpus's aHash hamming-0 pairs
    val a0 = PerceptualHash.phash(spark, dir).collect()
      .filter(_.getInt(2) == 0).map(r => (r.getLong(0), r.getLong(1))).toSet
    val d0 = got.filter(_._3 == 0).map(t => (t._1, t._2)).toSet
    assert(d0.size < a0.size, s"dct ${d0.size} vs ahash ${a0.size}")
  }

  test("phashCrossCorpus: exact against a one-sided brute-force replay " +
    "at sf0.001 (odd crawl vs even landed)") {
    val dir = "/root/testdata/sf0.001"
    val got = PerceptualHash.phashCrossCorpus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (l, r, hm) =>
      l % 2 == 1 && r % 2 == 0 && hm <= PerceptualHash.MaxHamming })
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 17 != 0)
    val hs = ids.map(d => d -> closedFormAhash(d)).toMap
    // every band bucket is under the cap at this scale, so the capped
    // join equals the full left-vs-right hamming filter
    val expected = (for {
      i <- ids if i % 2 == 1; j <- ids if j % 2 == 0
      hm = java.lang.Long.bitCount(hs(i)._1 ^ hs(j)._1) +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if hm <= PerceptualHash.MaxHamming
    } yield (i, j, hm)).sorted
    assert(got.toSeq.sorted == expected.toSeq)
  }

  test("phashJoin hot-bucket cap is one-sided: an over-cap landed group " +
    "keeps cap residents (min id always present); the crawl side is " +
    "never capped") {
    import spark.implicits._
    val n = Dedup.HotGroupCap + 44 // landed group of 300 identical hashes
    val landed = (0L until 2L * n).filter(_ % 2 == 0).map(id => (id, 7L, 0L))
    val crawl = Seq((1L, 7L, 0L), (3L, 6L, 0L)) // dup + hamming-1 neighbor
    val got = PerceptualHash.phashJoin(
        crawl.toDF("doc_id", "phi", "plo"),
        landed.toDF("doc_id", "phi", "plo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // each crawl doc pairs with exactly the HotGroupCap smallest-id
    // residents, never the full group, and resident sets include id 0
    val gotByLeft = got.groupBy(_._1)
    assert(gotByLeft(1L).length == Dedup.HotGroupCap)
    assert(gotByLeft(3L).length == Dedup.HotGroupCap)
    assert(gotByLeft(1L).forall(_._3 == 0))
    assert(gotByLeft(3L).forall(_._3 == 1))
    assert(got.count(_._2 == 0L) == 2, "the bucket min survives the cap")
    assert(got.length == 2 * Dedup.HotGroupCap,
      s"uncapped would be ${2 * landed.length} rows")
  }

  test("cross-group expansion is capped: two over-HotGroupCap duplicate " +
    "groups within hamming<=3 emit star edges, never |A|x|B|") {
    import spark.implicits._
    val n = Dedup.HotGroupCap + 44 // 300 per group, both over the cap
    val groupA = (0L until n.toLong).map(id => (id, 0L, 0L))
    val groupB = (1000L until 1000L + n).map(id => (id, 1L, 0L))
    val hs = (groupA ++ groupB).toDF("doc_id", "phi", "plo")
    val got = PerceptualHash.pairsFromHashes(hs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // within each over-cap group: spanning star from the group min
    val withinA = (1L until n.toLong).map(i => (0L, i, 0))
    val withinB = (1001L until 1000L + n).map(i => (1000L, i, 0))
    // cross-group: BOTH groups over the cap -> exactly the rep pair
    // (uncapped expansion would emit 300 x 300 = 90,000 rows here)
    val cross = Seq((0L, 1000L, 1))
    assert(got.sorted == (withinA ++ withinB ++ cross).sorted)

    // one side under the cap: the small group expands fully, the
    // over-cap side still contributes only its representative
    val small = Seq((2000L, 1L, 0L), (2001L, 1L, 0L))
    val got2 = PerceptualHash
      .pairsFromHashes((groupA ++ small).toDF("doc_id", "phi", "plo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val cross2 = Seq((0L, 2000L, 1), (0L, 2001L, 1))
    val within2 = withinA :+ (2000L, 2001L, 0)
    assert(got2.sorted == (within2 ++ cross2).sorted)
  }
}
