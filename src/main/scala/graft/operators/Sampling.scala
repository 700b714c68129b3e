package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Deterministic sampling + dataset profiling — the remaining
  * bread-and-butter of a corpus pipeline.
  *
  * Sampling uses the md5 hash-fraction trick instead of `rand()`:
  * reproducible across runs, engines (the oracle draws the identical
  * sample) and cluster topologies, and stable under repartitioning —
  * the property `TABLESAMPLE`/`rand()` cannot give you. Narrow map, no
  * shuffle.
  */
object Sampling {

  val SampleRate = 0.3

  /** Per-language stratified sample: keep a deterministic ~30% of each
    * stratum, plus the stratum bookkeeping a pipeline records. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("u", hashFraction("smp", col("doc_id").cast("string")))
      .filter(col("u") < SampleRate)
      .select(col("doc_id"), col("lang"), col("source"),
        round(col("u"), 6).as("u"))
      .orderBy("doc_id")

  /** ANALYZE-style column profile of the events table: one row per
    * profiled column with count/nulls/distinct/min/max rendered as
    * strings (the union-of-stats shape every catalog profiler emits).
    *
    * The two exact distinct counts are SEPARATE single-column
    * aggregates cross-joined back onto the min/max pass: putting
    * `countDistinct` twice in one aggregate makes Spark expand every
    * input row once per distinct group (×3 the table through the hash
    * aggregate — measured ~2× this query's cost); three independent
    * jobs each read one column, partial-aggregate map-side, and meet
    * in a broadcast nested loop of three GUARANTEED-1-row frames
    * (global aggregates without grouping; a literal equi-key would not
    * survive — constant folding erases it and re-plans the NLJ). The
    * plan-hygiene spec exempts this query by name for exactly this
    * single-row-broadcast shape. Same exact semantics, scale shape
    * intact (each distinct is its own bounded shuffle of
    * already-deduped partials).
    */
  def profileEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val basic = ev.agg(
      count(lit(1)).as("n_rows"),
      min(col("user_id")).as("user_min"),
      max(col("user_id")).as("user_max"),
      min(col("event_type")).as("type_min"),
      max(col("event_type")).as("type_max"),
      round(min(col("value")), 2).as("value_min"),
      round(max(col("value")), 2).as("value_max"))
    val userDist = ev.agg(countDistinct(col("user_id")).as("user_distinct"))
    val typeDist = ev.agg(countDistinct(col("event_type")).as("type_distinct"))
    val stats = basic.crossJoin(userDist).crossJoin(typeDist)
    stats.selectExpr(
      "stack(3, " +
        "'user_id', CAST(n_rows AS STRING), CAST(user_distinct AS STRING), " +
        "  CAST(user_min AS STRING), CAST(user_max AS STRING), " +
        "'event_type', CAST(n_rows AS STRING), CAST(type_distinct AS STRING), " +
        "  type_min, type_max, " +
        "'value', CAST(n_rows AS STRING), NULL, " +
        "  CAST(value_min AS STRING), CAST(value_max AS STRING)) " +
        "AS (column_name, n_rows, n_distinct, min_value, max_value)")
      .orderBy("column_name")
  }

  /** Domain-mixture rebalancing — downsample every language stratum to
    * the size of the smallest one, the simplest instance of the
    * "hit a target mixture" pass every pretraining pipeline runs (swap
    * the `min(n)` target for any per-domain token budget and the plan
    * is unchanged). Per-stratum keep rate = min_count / count; a doc is
    * kept iff its deterministic hash fraction clears the rate, so the
    * sample is reproducible and a stratum's sample only shrinks-or-grows
    * monotonically as its rate moves.
    *
    * Scale: the stratum-count aggregate is tiny (one row per language)
    * and broadcast back onto the corpus — the corpus itself is touched
    * by exactly one narrow filter pass. No shuffle of the data, no
    * driver state. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val target = counts.agg(min(col("n")).as("mn"))
    docs
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(target))
      .withColumn("rate", col("mn").cast("double") / col("n"))
      .filter(hashFraction("mix", col("doc_id").cast("string")) < col("rate"))
      .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
      .orderBy("doc_id")
  }

  /** How many rows of the deterministic training order the query
    * returns (the full order is a write, not a result set). */
  val TrainingOrderK = 100

  /** Deterministic global training-order shuffle: every epoch pipeline
    * needs the corpus in a reproducible pseudo-random order (not the
    * crawl/ingest order, which is correlated with time and domain). The
    * sort key is md5 over a seed + doc_id — stable across runs, engines
    * and partitionings; change the seed string to get a fresh epoch
    * permutation.
    *
    * Scale: the query form takes the first K by sort key —
    * `TakeOrderedAndProject`, per-partition heaps, K rows to the
    * driver, NO global sort. The full-corpus write form is
    * `repartitionByRange(sort_key).sortWithinPartitions(sort_key)` — a
    * range exchange whose sampling Spark handles, producing sorted
    * non-overlapping files (see [[Layout.zorderWrite]] for the same
    * shape in 2-D). */
  def trainingOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(md5(concat(lit("ord:"), col("doc_id").cast("string"))), 1, 16)
          .as("sort_key"))
      .orderBy(col("sort_key"), col("doc_id"))
      .limit(TrainingOrderK)
}
