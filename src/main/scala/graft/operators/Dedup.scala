package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Deduplication family over the `documents` table — the operators a
  * training-data pipeline needs beyond the reference's surface
  * (BASELINE.json north_star; the reference's only dedup backstop is
  * `count(distinct)` — /root/reference/main.go:117).
  *
  * Scale design (100 TB):
  *  - Exact dedup is a hash group-by: one shuffle on the content hash.
  *  - MinHash/SimHash avoid the O(n²) pair space via LSH banding: the
  *    only shuffle is on (band, key) — candidate pairs are the join
  *    output, a tiny fraction of n². The quadratic fallbacks
  *    (ngramJaccard within length blocks, embedding near-dup) are
  *    blocked/bucketed so the cross product never materializes globally.
  *  - All hashes are md5-derived (deterministic, engine-agnostic) so the
  *    DuckDB oracle reproduces them bit-for-bit; fixed-width lowercase
  *    hex compares lexicographically = numerically.
  */
object Dedup {

  val NumHashes = 16
  val NumBands = 4 // 4 rows per band
  val MinhashJaccardThreshold = 0.5
  val SimhashBits = 64 // as two 32-bit words (avoids 64-bit sign overflow)
  val SimhashMaxHamming = 3
  val NgramN = 3
  val EmbeddingCosThreshold = 0.45

  /** (doc_id, sh: distinct word-3-gram shingles), docs with ≥1 shingle. */
  private[operators] def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(wordNgrams(tokens(col("text")), NgramN)).as("sh"),
        size(tokens(col("text"))).as("n_toks"))
      .filter(size(col("sh")) > 0)

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact dedup: group documents by content hash; emit group size and
    * the surviving (minimum) doc_id. One shuffle, fully scalable.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .orderBy("content_hash")

  /** MinHash + LSH near-dup pairs: 16 md5-derived min-hashes over word
    * 3-gram shingles, 4 bands × 4 rows; pairs sharing any band bucket are
    * candidates; candidates are verified with true Jaccard ≥ 0.5.
    * The band self-join shuffles on (band, key) only — no n² pair space.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).select("doc_id", "sh")
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val sigCols = (0 until NumHashes).map(j =>
      min(hexHash(j, col("s"))).as(s"h$j"))
    val sig = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("b"),
        md5(concat((0 until NumHashes / NumBands)
          .map(r => col(s"h${NumHashes / NumBands * b + r}")): _*)).as("k"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.b").as("b"), col("bk.k").as("k"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("sa"), col("sb")), 4).as("jaccard"))
      .filter(col("jaccard") >= MinhashJaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs: 64-bit term-frequency-weighted simhash (each
    * token occurrence votes ±1 per bit of its md5 hash — repetition IS
    * the tf weight; bit set where the vote sum is positive). The 64 bits
    * are carried as two 32-bit words — packing
    * into one BIGINT would overflow the sign bit differently per engine.
    * Candidate pairs must share at least one of the four 16-bit bands
    * (pigeonhole: hamming ≤ 3 over 4 bands guarantees ≥ 1 equal band),
    * then are kept when Hamming distance ≤ 3.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val md = md5(concat(lit("991:"), col("tok")))
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("hhi", conv(substring(md, 1, 8), 16, 10).cast("long"))
      .withColumn("hlo", conv(substring(md, 9, 8), 16, 10).cast("long"))
    val bitSums =
      (0 until 32).map(b =>
        sum(when(shiftright(col("hhi"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"a$b")) ++
      (0 until 32).map(b =>
        sum(when(shiftright(col("hlo"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"c$b"))
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    def word(prefix: String) = (0 until 32)
      .map(b => when(col(s"$prefix$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sh = sums.select(col("doc_id"),
      word("a").as("shi"), word("c").as("slo"))
    val bandCols = Seq(
      struct(lit(0).as("b"), shiftright(col("shi"), 16).as("k")),
      struct(lit(1).as("b"), col("shi").bitwiseAND(65535).as("k")),
      struct(lit(2).as("b"), shiftright(col("slo"), 16).as("k")),
      struct(lit(3).as("b"), col("slo").bitwiseAND(65535).as("k")))
    val bands = sh
      .select(col("doc_id"), col("shi"), col("slo"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("shi"), col("slo"),
        col("bk.b").as("b"), col("bk.k").as("k"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (bit_count(col("x.shi").bitwiseXOR(col("y.shi"))) +
          bit_count(col("x.slo").bitwiseXOR(col("y.slo"))))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimhashMaxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard near-dup pairs with length blocking: documents
    * are compared only when their token counts fall in the same or
    * adjacent bucket of 10 (each doc emits block keys b and b+1, pairs
    * join on key equality), so the global cross product never forms.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val keyed = sh.select(col("doc_id"), col("sh"),
      explode(array((col("n_toks") / 10).cast("long"),
        (col("n_toks") / 10).cast("long") + 1)).as("blk"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        round(jaccard(col("x.sh"), col("y.sh")), 4).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= MinhashJaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding cosine near-dup pairs ≥ 0.45. The pair space is the full
    * self-join here (corpus fits; at 100 TB swap in the LSH bucketing of
    * [[Similarity]] — same verification tail, different candidate
    * generator).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(cosineSim(col("x.v"), col("y.v")), 4).as("sim"))
      .filter(col("sim") >= EmbeddingCosThreshold)
      .orderBy("vec_a", "vec_b")
  }
}
