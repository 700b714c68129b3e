package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has a `queries` entry; each
  * SQL-expressible one also has an `oracleSql` entry executed by the
  * driver in DuckDB over the same parquet tables. Column names/types are
  * aligned on both sides (the driver hash-compares after sorting columns
  * by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventsEtl.hourlyAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: hosted SQL surface (SURVEY §2.B) -------------
    "q_partition_discovery" -> (EventsEtl.partitionDiscovery _),
    "q_raw_export"          -> ((s, d) => EventsEtl.rawExport(s, d)),
    "q_hourly_agg"          -> (EventsEtl.hourlyAgg _),
    "q_epoch_roundtrip"     -> (EventsEtl.epochRoundtrip _),
    "q_coalesce_nonempty"   -> (EventsEtl.coalesceNonEmptyDemo _),
    "q_explode_outer"       -> (EventsEtl.explodeOuterDemo _),
    "q_resolution_concat"   -> (EventsEtl.resolutionConcat _),
    // --- general relational surface -------------------------------------
    "q1_pricing_summary"    -> (Relational.q1PricingSummary _),
    "q3_shipping_priority"  -> (Relational.q3ShippingPriority _),
    "q5_local_supplier"     -> (Relational.q5LocalSupplierVolume _),
    "q_top_orders_window"   -> (Relational.topOrdersPerPriority _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_partition_discovery" ->
      """SELECT CAST(datepart('year', ts) AS INT) AS year,
        |       CAST(datepart('month', ts) AS INT) AS month,
        |       CAST(datepart('day', ts) AS INT) AS day,
        |       CAST(datepart('hour', ts) AS INT) AS hour
        |FROM events GROUP BY ALL ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_raw_export" ->
      """SELECT event_id, ts, user_id, event_type, value, props,
        |       CAST(datepart('year', ts) AS INT) AS year,
        |       CAST(datepart('month', ts) AS INT) AS month,
        |       CAST(datepart('day', ts) AS INT) AS day,
        |       CAST(datepart('hour', ts) AS INT) AS hour
        |FROM events
        |WHERE datepart('year', ts) = 2024 AND datepart('month', ts) = 1
        |  AND datepart('day', ts) = 15
        |ORDER BY event_id""".stripMargin,
    "q_hourly_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |       CAST(datepart('hour', ts) AS INT) AS hour,
        |       event_type,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS users,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY ALL ORDER BY day, hour, event_type""".stripMargin,
    "q_epoch_roundtrip" ->
      """WITH t AS (
        |  SELECT event_id,
        |         CAST((epoch_us(ts) // 1000000) * 1000.0
        |              + ((epoch_us(ts) % 1000000) * 1000) / 1000000.0
        |              AS BIGINT) AS event_tm
        |  FROM events)
        |SELECT event_id, event_tm, epoch_ms(event_tm) AS event_ts,
        |       CAST(datepart('hour', epoch_ms(event_tm)) AS INT) AS event_hour
        |FROM t ORDER BY event_id""".stripMargin,
    "q_coalesce_nonempty" ->
      """SELECT doc_id,
        |       coalesce(nullif(CASE WHEN lang = 'en' THEN '' ELSE lang END, ''),
        |                nullif(source, ''), 'unknown') AS device_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> len(x) >= 8) AS arr
        |  FROM documents)
        |SELECT doc_id,
        |       unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS deal
        |FROM t ORDER BY doc_id, deal NULLS FIRST""".stripMargin,
    "q_resolution_concat" ->
      """SELECT event_id,
        |       concat(CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR), 'x',
        |              CAST(len(event_type) AS VARCHAR)) AS resolution
        |FROM events ORDER BY event_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY ALL ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_orders_window" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey,
        |       round(o_totalprice, 2) AS o_totalprice
        |FROM t WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
  )
}
