package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The composed training-data curation pipeline — the end-to-end DAG a
  * corpus pass actually runs: quality-gate every document, then drop
  * near-duplicates (MinHash-LSH pairs; within each duplicate pair the
  * higher doc_id is dropped, so chains collapse toward the smallest id).
  *
  * Plan shape at scale: the quality gate is a narrow map; the dedup drop
  * set comes from the LSH band join (no n² pair space); the final
  * survivor set is a broadcast-able left-anti join. One pass over the
  * corpus plus the LSH shuffles — nothing quadratic anywhere.
  */
object Curation {

  val QualityThreshold = 0.8

  /** Default entry: pairs come from [[Dedup.minhashLsh]], which is
    * memoized per (session, dir) — a session running the dedup family
    * and this pipeline computes the LSH pass once. */
  def pipeline(spark: SparkSession, dir: String): DataFrame =
    pipeline(spark, dir, Dedup.minhashLsh(spark, dir))

  /** Pipeline over a caller-supplied near-dup pair frame (`doc_a`,
    * `doc_b`) — the explicit sharing hook for a corpus pass that already
    * holds pairs from any [[Dedup]] family member. */
  def pipeline(spark: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val drops = pairs
      .select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(spark, dir)
      .join(quality, "doc_id")
      .filter(col("quality") >= QualityThreshold)
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("quality"))
      .orderBy("doc_id")
  }
}
