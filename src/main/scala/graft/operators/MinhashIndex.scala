package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent banded MinHash index — the production lifecycle of
  * [[Dedup.minhashJoin]]'s right side: band the landed corpus ONCE,
  * write it to storage, and let every subsequent crawl increment join
  * against it with no corpus reshuffle. This is the incremental-ingest
  * shape [[Dedup.minhashJoin]]'s Scaladoc promises ("persist/bucket it
  * by (b, k) and the incremental crawl joins against it"): daily
  * increments are checked for near-dups against a 100 TB landed corpus
  * at the cost of scanning the index, never re-banding the corpus.
  *
  * Layout under `indexPath`:
  * {{{
  *   bands.parquet    (b, k, right_id) — bucket RESIDENTS only: the
  *                    [[Dedup.HotGroupCap]] smallest ids per (b, k),
  *                    capped at BUILD time (the cap is a function of
  *                    the corpus alone, so capping once at build equals
  *                    [[Dedup.minhashJoin]]'s query-time cap row for
  *                    row). Partitioned by `b`, k-sorted within files
  *                    so parquet row-group stats support bucket-range
  *                    pruning by external readers.
  *   shingles.parquet (doc_id, sh)     — per-doc shingle sets for
  *                    candidate verification.
  * }}}
  *
  * Query plan shape (asserted in the spec): the increment side is
  * BROADCAST into both the band join and the verification join, so the
  * index is read with a narrow scan — zero Exchange on the corpus
  * side. Work per increment doc is bounded by cap × bands exactly as
  * in the in-memory operator, and results are row-identical to
  * [[Dedup.minhashJoin]](increment, corpus) over the same data.
  */
object MinhashIndex {

  /** Band `corpus` (doc_id, text) and write the index. The resident
    * cap runs at build time: one window shuffle over the corpus bands
    * — the only corpus-wide shuffle in the index's whole lifecycle. */
  def build(corpus: DataFrame, indexPath: String): Unit = {
    val perDoc = Dedup.shingleSigs(corpus)
    Materialize.withCached(perDoc) {
      val bands = Dedup.bandFrame(perDoc)
        .select(col("doc_id").as("right_id"), col("b"), col("k"))
      Dedup.capBucket(bands, "right_id")
        .repartition(col("b"))
        .sortWithinPartitions(col("k"), col("right_id"))
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(s"$indexPath/bands.parquet")
      perDoc.select(col("doc_id"), col("sh"))
        .write.mode("overwrite")
        .parquet(s"$indexPath/shingles.parquet")
      // withCached materializes its body's result: return a frame that
      // records what was written without re-reading it
      perDoc.sparkSession.range(0).toDF("done")
    }
    ()
  }

  /** Admit a new batch of docs INTO the index (after near-dup checking
    * it): append its band rows — capped within the batch — and its
    * shingles. Append-only, no rewrite of existing files, no
    * corpus-wide work: the only shuffle is the resident-cap window
    * over the BATCH.
    *
    * Correctness: the cap keeps the [[Dedup.HotGroupCap]] smallest ids
    * per bucket, and the cap-smallest of A ∪ B is always a subset of
    * (cap-smallest of A) ∪ (cap-smallest of B) — so batch-capped
    * appends plus [[query]]'s candidate-local re-cap reproduce a fresh
    * build over the union exactly (asserted row-for-row in the spec).
    * Buckets touched by many merges accumulate ≤ cap stale
    * (out-capped) rows per merge; a maintenance pass that rewrites a
    * partition through the same cap window reclaims them. */
  def merge(admitted: DataFrame, indexPath: String): Unit = {
    val perDoc = Dedup.shingleSigs(admitted)
    Materialize.withCached(perDoc) {
      val bands = Dedup.bandFrame(perDoc)
        .select(col("doc_id").as("right_id"), col("b"), col("k"))
      Dedup.capBucket(bands, "right_id")
        .repartition(col("b"))
        .sortWithinPartitions(col("k"), col("right_id"))
        .write.mode("append")
        .partitionBy("b")
        .parquet(s"$indexPath/bands.parquet")
      perDoc.select(col("doc_id"), col("sh"))
        .write.mode("append")
        .parquet(s"$indexPath/shingles.parquet")
      perDoc.sparkSession.range(0).toDF("done")
    }
    ()
  }

  /** Maintenance: rewrite the band table through the resident-cap
    * window, reclaiming rows that later [[merge]] generations out-capped
    * (each merge can leave up to cap stale rows per touched bucket).
    * One cap window + rewrite of the band table — shingles are
    * untouched (they are keyed by doc and never superseded). Queries
    * before and after compaction answer identically ([[query]]'s re-cap
    * is a no-op on a compacted index); the spec asserts both that and
    * the reclaimed row count. */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    val bands = spark.read.parquet(s"$indexPath/bands.parquet")
      .select(col("right_id"), col("b"), col("k"))
    val recapped = Dedup.capBucket(bands, "right_id")
    // parquet cannot rewrite in place: stage, swap, drop the old tree
    val tmp = s"$indexPath/bands.parquet.compacting"
    recapped
      .repartition(col("b"))
      .sortWithinPartitions(col("k"), col("right_id"))
      .write.mode("overwrite")
      .partitionBy("b")
      .parquet(tmp)
    val live = new java.io.File(s"$indexPath/bands.parquet")
    Scratch.rm(live)
    if (!new java.io.File(tmp).renameTo(live))
      throw new java.io.IOException(s"compact: rename $tmp failed")
  }

  /** Near-dup pairs between `increment` (doc_id, text) and the indexed
    * corpus: row-identical to `Dedup.minhashJoin(increment, corpus)`.
    * The increment is assumed small relative to the corpus (the whole
    * point of the index) and is broadcast; candidate verification
    * reads only the candidate ids' shingle rows via a broadcast join
    * as well, so the corpus-side tables are never shuffled. */
  def query(spark: SparkSession, indexPath: String,
            increment: DataFrame): DataFrame = {
    val perL = Dedup.shingleSigs(increment)
    Materialize.withCached(perL) {
      val bandsL = Dedup.bandFrame(perL)
        .select(col("doc_id").as("left_id"), col("b"), col("k"))
      val idx = spark.read.parquet(s"$indexPath/bands.parquet")
      // candidate-local re-cap: after [[merge]]s a bucket may hold up
      // to cap residents per merged generation; the true residents of
      // the unioned corpus are the cap smallest of what is stored
      // (see merge's subset argument). The window runs over candidate
      // rows only — increment-bounded, never the corpus.
      val matched = idx.join(broadcast(bandsL.select(col("b"), col("k")).distinct()),
        Seq("b", "k"))
      val recapped = Dedup.capBucket(matched, "right_id")
      val cand = recapped.join(broadcast(bandsL), Seq("b", "k"))
        .select(col("left_id"), col("right_id"))
        .distinct()
      val shR = spark.read.parquet(s"$indexPath/shingles.parquet")
      val withR = shR.join(broadcast(cand),
          shR("doc_id") === cand("right_id"))
        .select(col("left_id"), col("right_id"), col("sh").as("sb"))
      withR
        .join(broadcast(perL.select(col("doc_id").as("left_id"),
          col("sh").as("sa"))), "left_id")
        .select(col("left_id"), col("right_id"),
          round(Dedup.jaccard(col("sa"), col("sb")), 4).as("jaccard"))
        .filter(col("jaccard") >= Dedup.MinhashJaccardThreshold)
        .orderBy("left_id", "right_id")
    }
  }

  /** The un-materialized candidate frame (band join only) — the plan
    * the spec inspects for the no-corpus-shuffle guarantee. */
  private[graft] def candidateFrame(spark: SparkSession, indexPath: String,
                                    increment: DataFrame): DataFrame = {
    val bandsL = Dedup.bandFrame(Dedup.shingleSigs(increment))
      .select(col("doc_id").as("left_id"), col("b"), col("k"))
    spark.read.parquet(s"$indexPath/bands.parquet")
      .join(broadcast(bandsL), Seq("b", "k"))
      .select(col("left_id"), col("right_id"))
  }

  /** dedup_incremental: build the index over the landed corpus (doc_id
    * % 10 ≠ 3), query the 10% "crawl increment" (doc_id % 10 = 3)
    * against it — all in a scratch dir the harness deletes. The DuckDB
    * oracle states the same pairs relationally, so the whole
    * build→persist→broadcast-query lifecycle is hash-gated. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-mh-index").toString
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    try {
      build(docs.filter(col("doc_id") % 10 =!= 3), s"$root/idx")
      Scratch.materializeAndClean(root,
        query(spark, s"$root/idx", docs.filter(col("doc_id") % 10 === 3)))
    } catch {
      case e: Throwable => Scratch.rm(new java.io.File(root)); throw e
    }
  }
}
