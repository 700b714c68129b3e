package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** BPE tokenizer training — the merge-table learner (Sennrich et al.
  * 2016 shape): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair over the frequency-weighted word
  * vocabulary. Emits the learned merge table, the artifact a tokenizer
  * ships.
  *
  * Determinism contract: pair counts are exact BIGINTs (weighted by
  * word frequency, order-independent); the winning pair each round is
  * (max count, then lexicographically smallest (left, right)); merge
  * application is the standard greedy left-to-right non-overlapping
  * scan — for left ≠ right every match is non-overlapping, for
  * left == right the scan keeps odd-indexed matches within each run
  * (both replayed relationally by the oracle's window-parity trick).
  *
  * Scale shape: state is the distinct-word vocabulary (words × symbol
  * lists — vocabulary-bounded, NOT corpus-bounded) persisted per
  * round; each round = one pair-count shuffle + a 1-row
  * TakeOrdered to the driver + one narrow merge map. Driver state =
  * the merge table (K rows).
  */
object Bpe {

  /** Number of merges to learn. */
  val Merges = 8

  /** Greedy left-to-right non-overlapping merge of (a, b) → a+b. */
  private[graft] def applyMerge(syms: Seq[String], a: String,
                                b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** The learned merge table: (rank, left, right), rank 1 = first
    * (most frequent) merge. */
  def merges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // frequency-weighted distinct words → initial character symbols
    val vocab0: Dataset[(String, Long, Seq[String])] =
      Tables.documents(spark, dir)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .as[(String, Long)]
        .map { case (w, c) => (w, c, w.map(_.toString)) }
    var vocab = vocab0.persist()
    vocab.count()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      for (_ <- 0 until Merges) {
        val top = vocab
          .flatMap { case (_, c, syms) =>
            (0 until syms.length - 1).iterator.map(i =>
              (syms(i), syms(i + 1), c))
          }
          .toDF("a", "b", "c")
          .groupBy("a", "b").agg(sum(col("c")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        if (top.nonEmpty) {
          val (a, b, _) = top.head
          learned += ((a, b))
          val next = vocab
            .map { case (w, c, syms) => (w, c, applyMerge(syms, a, b)) }
            .persist()
          next.count()
          vocab.unpersist(blocking = false)
          vocab = next
        }
      }
    } finally vocab.unpersist(blocking = false)
    learned.toSeq.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "lhs", "rhs")
      .orderBy("rank")
  }
}
