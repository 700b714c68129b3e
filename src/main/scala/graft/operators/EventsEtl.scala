package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Batch re-expression of the reference's hosted SQL surface (SURVEY.md
  * §2.B) over the `events` table — the analog of the reference's
  * `bidreq_norm` flat table.
  *
  * The reference runs three DuckDB queries per rotated file: partition
  * discovery (/root/reference/main.go:92-99), raw export
  * (main.go:101-108), hourly aggregate export (main.go:109-125). Each is
  * a single declarative plan here; Catalyst provides the pushdown/pruning
  * the reference delegates to DuckDB.
  *
  * Scale notes (100 TB): every query below is one scan + at most one
  * shuffle. The aggregate shuffles on (day, hour, event_type) — a
  * bounded-cardinality key space, so partial (map-side) aggregation
  * collapses almost everything before the exchange. `countDistinct` is
  * exact (SURVEY §2.B B7 — the dedup backstop must stay exact), planned by
  * Spark as a two-phase expand+agg; at cluster scale the expand is the
  * dominant cost and is unavoidable for exact semantics.
  */
object EventsEtl {

  /** DuckDB `x::BIGINT` on a DOUBLE rounds half-to-even (verified:
    * 2.5::DOUBLE→2, 3.5::DOUBLE→4; DECIMAL literals round half-away —
    * don't be fooled testing with bare literals). Spark `cast` truncates,
    * `round` is half-up; `bround` is the half-to-even match. Use this
    * wherever the reference's SQL casts float math to BIGINT
    * (main.go:105).
    */
  def duckCastLong(c: Column): Column = bround(c, 0).cast("long")

  private def withDateParts(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))

  /** Partition discovery (main.go:92-99): distinct (y,m,d,h) present in
    * the batch, ordered. `GROUP BY ALL` over the four dateparts ⇒
    * `select(...).distinct()`. In production this query is subsumed by
    * `partitionBy` on the write path (ExportParquet); it exists as an
    * operator for oracle parity.
    */
  def partitionDiscovery(spark: SparkSession, dir: String): DataFrame =
    withDateParts(Tables.events(spark, dir))
      .select("year", "month", "day", "hour")
      .distinct()
      .orderBy("year", "month", "day", "hour")

  /** Raw export (main.go:101-108): `SELECT *` plus the four datepart
    * conjuncts for one partition. After ExportParquet writes with
    * `partitionBy(y,m,d,h)`, these filters become partition pruning (no
    * data read outside the target hour) — the reference achieves the same
    * only by templating one query per partition.
    */
  def rawExport(spark: SparkSession, dir: String,
                y: Int = 2024, m: Int = 1, d: Int = 15): DataFrame =
    withDateParts(Tables.events(spark, dir))
      .filter(col("year") === y && col("month") === m && col("day") === d)
      .orderBy("event_id")

  /** Hourly aggregate export (main.go:109-125): per (day, hour, dims) —
    * count, exact distinct users, value sum. B6/B7/B10-B16.
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        hour(col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("users"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("day", "hour", "event_type")

  /** Epoch-ms reconstruction exactly as the reference's SQL does it
    * (main.go:105): `((seconds*1000)+(nanos/1000000))::BIGINT` where `/`
    * is DuckDB float division and the cast rounds (B11/B14). Round-trips
    * the value back through `timestamp_millis` (≈ DuckDB `epoch_ms`) and
    * re-extracts the hour, per the export queries' `datepart('hour',
    * epoch_ms(...))` pattern (main.go:105-108).
    */
  def epochRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val us = unix_micros(col("ts").cast("timestamp"))
    val seconds = ((us - pmod(us, lit(1000000L))) / lit(1000000L)).cast("long")
    val nanos = (pmod(us, lit(1000000L)) * lit(1000L)).cast("long")
    val eventTm = duckCastLong(
      seconds.cast("double") * lit(1000.0) +
        nanos.cast("double") / lit(1000000.0))
    ev.select(
        col("event_id"),
        eventTm.as("event_tm"),
        timestamp_millis(eventTm).cast("timestamp_ntz").as("event_ts"),
        hour(timestamp_millis(eventTm)).as("event_hour"))
      .orderBy("event_id")
  }

  /** A7: first non-EMPTY string coalesce (main.go:431-438) — empty
    * strings are "absent", unlike plain SQL COALESCE. The CASE makes a
    * deterministic subset of rows empty so the nullif path is actually
    * exercised by the oracle.
    */
  def coalesceNonEmptyDemo(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        coalesceNonEmpty(
          when(col("lang") === "en", lit("")).otherwise(col("lang")),
          col("source"),
          lit("unknown")).as("device_lang"))
      .orderBy("doc_id")

  /** A9: OUTER explode — one row per array element, or one NULL row when
    * the array is empty (the reference appends an explicit NULL deal,
    * main.go:362-380). Non-exploded columns duplicate per row.
    */
  def explodeOuterDemo(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        explodeOuter(
          filter(split(lower(col("text")), " "), t => length(t) >= 8))
          .as("deal"))
      .orderBy(col("doc_id"), col("deal").asc_nulls_first)

  /** Skew-resistant two-phase aggregation: pre-aggregate on
    * (key, salt) so one hot key spreads over `salt` reducers, then
    * combine partials per key. Results equal the direct group-by (the
    * oracle runs the direct form); the plan trades one extra small
    * shuffle for bounded per-reducer load — the standard mitigation
    * when AQE skew handling isn't enough.
    */
  def saltedUserStats(spark: SparkSession, dir: String,
                      saltBuckets: Int = 16): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"),
        pmod(col("event_id"), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).as("total_value"))
      .orderBy("user_id")

  /** KMV sketch vs exact distinct per event_type — the oracle asserts
    * the identical estimate (md5-derived sketch, SURVEY §7.2's
    * TypedImperativeAggregate extension point). */
  def kmvUserEstimate(spark: SparkSession, dir: String,
                      k: Int = 64): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("users_exact"),
        graft.functions.KmvDistinct.kmvDistinct(col("user_id"), k)
          .as("users_kmv"))
      .orderBy("event_type")

  /** Exact percentiles per group (continuous interpolation — matches
    * DuckDB's quantile_cont). At 100 TB exact percentiles need the full
    * sort per group; swap in approx_percentile when a bounded-memory
    * sketch is acceptable (not oracle-comparable, hence exact here). */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  /** Correlated-subquery pattern: customers above their nation's average
    * balance — expressed as the decorrelated plan Catalyst would produce
    * (aggregate once per nation, broadcast back). */
  def aboveNationAvgCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nationAvg = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("nation_avg"))
    cust.join(broadcast(nationAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        round(col("nation_avg"), 4).as("nation_avg"))
      .orderBy("c_custkey")
  }

  /** Semi-structured access: pull typed values out of the JSON `props`
    * column (`get_json_object` is codegen'd; for repeated access of many
    * keys, `from_json` with an explicit schema beats per-key parsing). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
        (get_json_object(col("props"), "$.k").cast("int") % 10 === 0)
          .as("k_round"))
      .orderBy("event_id")

  /** B16-style computed concat: `CONCAT(w::string,'x',h::string)`
    * (main.go:115) re-expressed on events (value-bucket "resolution"). */
  def resolutionConcat(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        concat(
          floor(col("value") / 100).cast("long").cast("string"),
          lit("x"),
          length(col("event_type")).cast("string")).as("resolution"))
      .orderBy("event_id")
}
