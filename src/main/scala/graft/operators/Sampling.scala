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
    * One pass per... no — ONE aggregate pass total, then a literal
    * unpivot of the single stats row.
    */
  def profileEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("user_distinct"),
      min(col("user_id")).as("user_min"),
      max(col("user_id")).as("user_max"),
      countDistinct(col("event_type")).as("type_distinct"),
      min(col("event_type")).as("type_min"),
      max(col("event_type")).as("type_max"),
      round(min(col("value")), 2).as("value_min"),
      round(max(col("value")), 2).as("value_max"))
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
}
