package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image near-dup: a 64-bit average hash (aHash) over each
  * document's DECODED raster, fed into the same banded pair machinery
  * as the text dedup family — so image-heavy corpora stop deduping on
  * exact payload bytes only.
  *
  * The hash is the classic average hash: sample the decoded image on a
  * [[GridDim]]×[[GridDim]] grid (nearest neighbor — x=(c·w)/8,
  * y=(r·h)/8, integer division), grayscale each sample as the plain
  * channel sum R+G+B (no luma weights: integer-exact, so the DuckDB
  * oracle can replay it bit-for-bit from the synthesized corpus's
  * closed-form pixel ramp), and set bit r·8+c when the sample is
  * strictly brighter than the grid mean — compared in integer
  * cross-multiplied form (64·g > Σg) so no float division exists on
  * either engine. Two perceptually-close images differ in few bits;
  * Hamming distance ≤ [[MaxHamming]] defines a pair.
  *
  * The 64 bits travel as two 32-bit words (`phi` = bits 0..31, `plo` =
  * bits 32..63), the same packing as [[Dedup.simhash]] — one BIGINT
  * would overflow the sign bit differently per engine.
  *
  * Plan shape (100 TB-safe, no all-pairs anywhere):
  *  1. one narrow decode+hash pass (mapPartitions — the payload column
  *     never crosses the wire);
  *  2. identical hashes COLLAPSE to a representative (min doc_id) —
  *     exact-duplicate rasters are the common case and must not flood
  *     the band index;
  *  3. representatives band-join on the four 16-bit hash bands
  *     (pigeonhole: hamming ≤ 3 over 4 bands ⇒ ≥ 1 equal band) via
  *     [[Dedup.selfJoinCapped]] — full clique for buckets ≤
  *     [[Dedup.HotGroupCap]], spanning star above, the rule the oracle
  *     replays verbatim;
  *  4. candidate representative pairs keep hamming ≤ [[MaxHamming]];
  *  5. expansion back to member pairs: cross-group pairs inherit the
  *     representatives' hamming, within-group pairs are hamming 0 and
  *     go through [[Dedup.selfJoinCapped]] keyed on the hash itself
  *     (clique under the cap, star above). The CROSS-group expansion
  *     is capped by the same discipline: each side expands to its full
  *     member set only while the group is ≤ [[Dedup.HotGroupCap]] —
  *     an over-cap group contributes only its representative (star
  *     edges through the rep, whose within-group star already connects
  *     the rest). Output per rep pair is therefore ≤ cap², never
  *     |A|·|B|: two near-identical million-copy groups (thumbnails,
  *     logos — the common case on a real image corpus) emit ONE pair,
  *     not 10¹², and cluster connectivity is unchanged because every
  *     representative reaches its members via the within-group star.
  *
  * Undecodable payloads (truncated, corrupt, hostile headers) hash to
  * nothing and simply never pair — the same total-decode contract as
  * [[Multimodal.decodeFeatures]].
  */
object PerceptualHash {

  /** Grid side: 8×8 = 64 bits. */
  val GridDim = 8
  /** Pair threshold: ≤ 3 differing bits over the 4×16-bit bands keeps
    * the pigeonhole guarantee (the same bound as simhash). */
  val MaxHamming = 3

  /** aHash of a decoded raster as (bits 0..31, bits 32..63); None when
    * the payload doesn't decode. */
  def ahash(bytes: Array[Byte]): Option[(Long, Long)] =
    MediaCodec.readImage(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val gs = new Array[Long](GridDim * GridDim)
      var tot = 0L
      var r = 0
      while (r < GridDim) {
        val y = r * h / GridDim
        var c = 0
        while (c < GridDim) {
          val x = c * w / GridDim
          val rgb = img.getRGB(x, y)
          val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          gs(r * GridDim + c) = g
          tot += g
          c += 1
        }
        r += 1
      }
      var phi = 0L
      var plo = 0L
      var b = 0
      while (b < 64) {
        // strictly brighter than the mean, integer-exact: 64·g > Σg
        if (64L * gs(b) > tot) {
          if (b < 32) phi |= 1L << b else plo |= 1L << (b - 32)
        }
        b += 1
      }
      (phi, plo)
    }

  /** The four 16-bit band keys of a 64-bit hash — the SHARED kernel
    * between the batch band join (which spells the same arithmetic in
    * SQL expressions) and [[graft.streaming.StreamingPhash]]'s bucket
    * keys. Pigeonhole: hamming ≤ [[MaxHamming]] (3) over 4 bands ⇒
    * at least one equal band. */
  def bandsOf(phi: Long, plo: Long): Array[Long] =
    Array(phi >> 16, phi & 0xffffL, plo >> 16, plo & 0xffffL)

  /** Hamming distance between two (phi, plo) hashes. */
  def hamming(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Int =
    java.lang.Long.bitCount(aHi ^ bHi) + java.lang.Long.bitCount(aLo ^ bLo)

  // ---- DCT variant (pHash proper) -----------------------------------

  /** Sample grid side for the DCT hash: 32×32 gray samples feed an
    * 8×8 low-frequency DCT block — the classic pHash shape. */
  val DctGrid = 32

  /** Integer-quantized DCT-II basis: `DctTable(u)(x) =
    * round(64·cos((2x+1)·u·π/64))` for u < 8, x < 32. Quantizing the
    * cosines to integers makes the whole transform exact integer
    * arithmetic, so the DuckDB oracle replays it bit-for-bit from the
    * SAME table (the oracle SQL embeds these values as literals
    * generated from this array — one source of truth, no cross-engine
    * float trust). */
  val DctTable: Array[Array[Int]] = Array.tabulate(8, DctGrid)((u, x) =>
    Math.round(64.0 * Math.cos((2 * x + 1) * u * Math.PI
      / (2.0 * DctGrid))).toInt)

  /** DCT perceptual hash of a decoded raster as (bits 0..31, bits
    * 32..63); None when the payload doesn't decode.
    *
    * Where [[ahash]] thresholds raw brightness (brittle to uniform
    * brightness/contrast edits — every sample shifts together, but the
    * mean shifts too, so ONLY nonlinear edits break it; gradients and
    * vignettes break it badly), the DCT hash thresholds the 8×8
    * low-FREQUENCY block against its own median: bit `u·8+v` is set
    * when coefficient C(u,v) strictly exceeds the median of the 63
    * non-DC coefficients (the DC bit 0 is always clear — DC is the
    * global brightness the hash exists to ignore). Median over an odd
    * count is the 32nd order statistic — integer-exact on both
    * engines, no float division anywhere.
    *
    * The transform is separable and integer: gray g(y,x) = R+G+B at
    * nearest-neighbor samples of a [[DctGrid]]² grid, T(u,x) =
    * Σ_y Q(u,y)·g(y,x), C(u,v) = Σ_x Q(v,x)·T(u,x), with Q =
    * [[DctTable]]. Magnitudes stay < 2⁶³ by construction
    * (64·64·765·1024 ≈ 3.2·10⁹ per coefficient). */
  def dctHash(bytes: Array[Byte]): Option[(Long, Long)] =
    MediaCodec.readImage(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val n = DctGrid
      val gs = new Array[Long](n * n)
      var r = 0
      while (r < n) {
        val y = r * h / n
        var c = 0
        while (c < n) {
          val x = c * w / n
          val rgb = img.getRGB(x, y)
          gs(r * n + c) =
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          c += 1
        }
        r += 1
      }
      // separable integer DCT: rows then columns
      val t = new Array[Long](8 * n)
      var u = 0
      while (u < 8) {
        var x = 0
        while (x < n) {
          var s = 0L
          var y = 0
          while (y < n) { s += DctTable(u)(y) * gs(y * n + x); y += 1 }
          t(u * n + x) = s
          x += 1
        }
        u += 1
      }
      val co = new Array[Long](64)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0L
          var x = 0
          while (x < n) { s += DctTable(v)(x) * t(u * n + x); x += 1 }
          co(u * 8 + v) = s
          v += 1
        }
        u += 1
      }
      val med = co.slice(1, 64).sorted.apply(31) // 32nd smallest of 63
      var phi = 0L
      var plo = 0L
      var b = 1 // DC bit 0 stays clear
      while (b < 64) {
        if (co(b) > med) {
          if (b < 32) phi |= 1L << b else plo |= 1L << (b - 32)
        }
        b += 1
      }
      (phi, plo)
    }

  /** (doc_id, phi, plo) for every decodable document raster — one
    * narrow typed pass over the media table. Memoized MATERIALIZED per
    * (session, dir): the ImageIO decode pass is the family's dominant
    * cost and is needed by [[phash]] AND (twice — both corpus halves)
    * [[phashCrossCorpus]]; without the memo each consumer re-decodes
    * every raster. The memoized frame is tiny (3 numeric columns, one
    * row per decodable doc) and lineage-free; [[clearMemo]] drops it
    * with the pair memos (Bench clears between passes, so no timing
    * ever leaks across passes). */
  private[operators] def hashes(spark: SparkSession, dir: String): DataFrame =
    MemoStats.cached(hashMemo, (spark, dir))(
      Materialize(hashesUncached(spark, dir)))

  private def hashesUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ahash(bytes).map { case (phi, plo) => (id, phi, plo) }
      })
      .toDF("doc_id", "phi", "plo")
  }

  /** Perceptual near-dup pairs: (doc_a, doc_b, hamming), doc_a <
    * doc_b, hamming ≤ [[MaxHamming]]. Memoized per (session, dir) —
    * [[graft.operators.Dedup.clusters]] consumers share the decode +
    * pair computation (the frame is lineage-free and tiny). */
  def phash(spark: SparkSession, dir: String): DataFrame =
    MemoStats.cached(pairMemo, (spark, dir))(
      Materialize(phashUncached(spark, dir)))

  /** `dedup_phash_dct`: the DCT variant's pairs — [[dctHash]] per
    * decodable raster through the SAME capped band machinery
    * ([[pairsFromHashes]]). */
  def phashDct(spark: SparkSession, dir: String): DataFrame =
    MemoStats.cached(dctMemo, (spark, dir))(
      Materialize(pairsFromHashes(dctHashes(spark, dir))))

  private def dctHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        dctHash(bytes).map { case (phi, plo) => (id, phi, plo) }
      })
      .toDF("doc_id", "phi", "plo")
  }

  private val pairMemo = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  private val dctMemo = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]
  private val hashMemo = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]

  def clearMemo(): Unit = {
    pairMemo.clear(); dctMemo.clear(); hashMemo.clear()
  }

  private def phashUncached(spark: SparkSession, dir: String): DataFrame =
    pairsFromHashes(hashes(spark, dir))

  /** The pair machinery over an explicit (doc_id, phi, plo) hash frame
    * — the seam the over-[[Dedup.HotGroupCap]] spec drives directly
    * (synthesizing 2×300 real over-cap duplicate images per run would
    * test the decoder, not the cap). */
  private[graft] def pairsFromHashes(hsIn: DataFrame): DataFrame = {
    val hs = Materialize(hsIn)

    // group size + min per identical hash: ONE window shuffle shared by
    // the representative table and the capped cross-group expansion
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("phi"), col("plo"))
    val mem = hs.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__mn", min(col("doc_id")).over(w))

    // within-group pairs: identical hashes, hamming 0 — clique under
    // the cap, spanning star above (selfJoinCapped keyed on the hash)
    val within = Dedup.selfJoinCapped(
      hs.select(col("doc_id").as("id"), col("phi"), col("plo")),
      Seq("phi", "plo"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        lit(0).as("hamming"))

    // representatives: one row per distinct hash (the group minimum)
    val reps = mem.filter(col("doc_id") === col("__mn"))
      .select(col("phi"), col("plo"), col("doc_id").as("rep"))

    val bands = bandFrame(reps.withColumnRenamed("rep", "id"), "id")
    val cand = Dedup.selfJoinCapped(bands, Seq("b", "k"))
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"))
      .distinct()

    // candidate rep pairs → hamming filter, carrying both hash keys
    // for the member expansion below
    val repPairs = cand
      .join(reps.select(col("rep").as("rep_a"), col("phi").as("pa_hi"),
        col("plo").as("pa_lo")), "rep_a")
      .join(reps.select(col("rep").as("rep_b"), col("phi").as("pb_hi"),
        col("plo").as("pb_lo")), "rep_b")
      .select(col("pa_hi"), col("pa_lo"), col("pb_hi"), col("pb_lo"),
        (bit_count(col("pa_hi").bitwiseXOR(col("pb_hi"))) +
          bit_count(col("pa_lo").bitwiseXOR(col("pb_lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= MaxHamming)

    // expansion: capped member set of group A × capped member set of
    // group B, ordered; cross-group hamming IS the representatives'
    // hamming (identical hashes within each group). "Capped" = the
    // full group while ≤ HotGroupCap, ONLY the representative above —
    // the hot-key star discipline of Dedup.selfJoinCapped, restated by
    // the oracle — so output per rep pair is bounded by cap², never
    // |A|·|B| (the uncapped form is quadratic in group size: two
    // near-identical exact-dup families of 10⁶ members would emit
    // 10¹² rows and a matching shuffle)
    val capped = mem.filter(col("__n") <= Dedup.HotGroupCap ||
      col("doc_id") === col("__mn"))
    val cross = repPairs
      .join(capped.select(col("phi").as("pa_hi"), col("plo").as("pa_lo"),
        col("doc_id").as("ida")), Seq("pa_hi", "pa_lo"))
      .join(capped.select(col("phi").as("pb_hi"), col("plo").as("pb_lo"),
        col("doc_id").as("idb")), Seq("pb_hi", "pb_lo"))
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))

    within.unionByName(cross)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** The four (b, k) band rows of each hash in a (idCol, phi, plo)
    * frame — the batch spelling of [[bandsOf]], shared by the
    * self-join ([[pairsFromHashes]]) and the cross-corpus join. */
  private def bandFrame(hs: DataFrame, idCol: String): DataFrame = {
    val bandCols = Seq(
      struct(lit(0).as("b"), shiftright(col("phi"), 16).as("k")),
      struct(lit(1).as("b"), col("phi").bitwiseAND(65535).as("k")),
      struct(lit(2).as("b"), shiftright(col("plo"), 16).as("k")),
      struct(lit(3).as("b"), col("plo").bitwiseAND(65535).as("k")))
    hs.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.b").as("b"), col("bk.k").as("k"))
  }

  /** dedup_phash_crosscorpus: perceptual near-dup JOIN between a crawl
    * increment (left, odd ids) and the landed corpus (right, even
    * ids) — the image complement of [[Dedup.minhashJoin]] and the
    * batch complement of [[graft.streaming.StreamingPhash]]'s
    * bootstrap-corpus mode. */
  def phashCrossCorpus(spark: SparkSession, dir: String): DataFrame = {
    val hs = hashes(spark, dir)
    phashJoin(hs.filter(col("doc_id") % 2 === 1),
      hs.filter(col("doc_id") % 2 === 0))
  }

  /** Cross-corpus perceptual join over two explicit (doc_id, phi, plo)
    * hash frames: candidates share ≥ 1 of the four 16-bit bands
    * (pigeonhole for hamming ≤ [[MaxHamming]]), verified exactly.
    *
    * Hot-bucket discipline is ONE-SIDED, [[Dedup.minhashJoin]]'s rule:
    * each (b, k) bucket keeps its [[Dedup.HotGroupCap]] smallest-id
    * RIGHT residents, the left side is never capped — every crawl doc
    * does bounded work (≤ 4·cap candidates per band bucket) but is
    * never silently excluded, the guarantee cross-corpus dedup needs.
    * An identical right image always shares its group's minimum-id
    * resident (same band keys in every band), so exact dups of a hot
    * landed family are always flagged. At 100 TB the right band frame
    * is the big landed corpus: persist/bucket it by (b, k) once and
    * every crawl increment joins against it with no corpus reshuffle
    * (the [[MinhashIndex]] persisted-index path, image flavor). */
  private[graft] def phashJoin(left: DataFrame, right: DataFrame)
      : DataFrame = {
    val hl = Materialize(left)
    val hr = Materialize(right)
    val cand = bandFrame(
        hl.select(col("doc_id").as("left_id"), col("phi"), col("plo")),
        "left_id")
      .join(Dedup.capBucket(bandFrame(
        hr.select(col("doc_id").as("right_id"), col("phi"), col("plo")),
        "right_id"), "right_id"), Seq("b", "k"))
      .select(col("left_id"), col("right_id"))
      .distinct()
    cand
      .join(hl.select(col("doc_id").as("left_id"), col("phi").as("la_hi"),
        col("plo").as("la_lo")), "left_id")
      .join(hr.select(col("doc_id").as("right_id"), col("phi").as("ra_hi"),
        col("plo").as("ra_lo")), "right_id")
      .select(col("left_id"), col("right_id"),
        (bit_count(col("la_hi").bitwiseXOR(col("ra_hi"))) +
          bit_count(col("la_lo").bitwiseXOR(col("ra_lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .orderBy("left_id", "right_id")
  }
}
