package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** General relational surface over the star schema — the capabilities a
  * user migrating off the reference's DuckDB-hosted SQL expects from a
  * full engine (scan/filter/project/aggregate/join/top-k), expressed so
  * Catalyst picks the scalable physical plan.
  *
  * Scale notes (100 TB): fact tables (`lineitem`, `orders`, `events`) are
  * always the probe side; dimensions (`region`, `nation`, `customer`,
  * `supplier`, `part`) are broadcast explicitly so no shuffle of the fact
  * table happens for dimension joins. Fact-fact joins (orders⋈lineitem)
  * shuffle on the join key — with AQE enabled, skewed keys split
  * automatically. Aggregations are partial-before-exchange by
  * construction (hash aggregate).
  */
object Relational {

  /** Money products as EXACT decimals (TPC-H's own column types): the
    * inputs are cent-valued, so `l_extendedprice·(1−l_discount)` has
    * exactly 4 true decimals — a double sum of those lands on an exact
    * round-2 tie with ~1% odds per group, where the reported last digit
    * depends on float summation order and differs between engines (and
    * between partitionings of the same engine). Decimal sums are exact
    * and order-invariant; both engines round the same value and cast to
    * double only for output. Plain sums of the raw cent columns
    * (`sum_qty`, `sum_base_price`, `o_totalprice`) stay double: their
    * true values have no digits past the rounding scale, so no tie. */
  private def epD = col("l_extendedprice").cast("decimal(18,2)")
  private def discPrice = epD * (lit(1) - col("l_discount").cast("decimal(18,2)"))
  private def charge = discPrice * (lit(1) + col("l_tax").cast("decimal(18,2)"))

  /** TPC-H Q1 shape: single-scan hash aggregate with computed measures.
    * One shuffle on a 6-value key; everything else is map-side. Sums are
    * rounded to pin double accumulation order differences vs the oracle.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
        round(sum(charge), 2).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: customer(broadcast) ⋈ orders ⋈ lineitem, revenue
    * top-10. The only big shuffle is orders⋈lineitem on orderkey; customer
    * is broadcast. Top-k is a TakeOrderedAndProject (no global sort).
    * Tie-break on orderkey keeps the limit deterministic for the oracle.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join; all four dimension sides broadcast, so
    * the plan is scan(lineitem) → broadcast-probe chain → one shuffle for
    * the final group-by. The supplier-nation/customer-nation co-location
    * predicate is the classic Q5 "local supplier" condition.
    */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Anti/semi join surface: customers without any order (left_anti) and
    * per-segment counts of customers with orders (left_semi). The anti
    * and semi joins broadcast nothing here — orderkeys are the big side —
    * so Catalyst plans shuffled hash joins keyed on custkey; at scale
    * that is the only shuffle.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    // ONE semi-join, not a semi + an anti: the anti side is the
    // complement, so n_without = segment total − n_with. Halves the
    // orders scans/joins; the totals aggregate is a narrow partial agg
    // of the dimension table.
    val withOrd = cust.join(ord, col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_with"))
    val totals = cust.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_total"))
    totals.join(withOrd, Seq("c_mktsegment"), "left_outer")
      .select(col("c_mktsegment"),
        (col("n_total") - coalesce(col("n_with"), lit(0L))).as("n_without"),
        coalesce(col("n_with"), lit(0L)).as("n_with"))
      .orderBy("c_mktsegment")
  }

  /** Hierarchical aggregate (ROLLUP): revenue by (priority, status),
    * by priority, and grand total — the multi-granularity export shape.
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Set operations: nation keys serving customers vs suppliers —
    * INTERSECT / EXCEPT both directions, tagged and unioned.
    *
    * Planned as ONE hash aggregate over the unioned flagged keys, not
    * the literal intersect/except algebra: the naive form costs six
    * shuffles (two distincts, a join per set op) and re-shuffles the
    * SAME two key sets three times each. `groupBy(nk).agg(max(flag))`
    * computes all three memberships in a single exchange — partial
    * aggregation collapses each side to its distinct keys map-side, so
    * the shuffle carries ≤ |distinct keys| rows per side at any scale.
    * Same result set: set ops on a projected single column are
    * distinct-by-definition, which the aggregate gives for free. */
  def nationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nk"),
        lit(1).as("in_c"), lit(0).as("in_s"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nk"),
        lit(0).as("in_c"), lit(1).as("in_s"))
    c.unionByName(s)
      .groupBy(col("nk"))
      .agg(max(col("in_c")).as("c"), max(col("in_s")).as("s"))
      .select(
        when(col("c") === 1 && col("s") === 1, "both")
          .when(col("c") === 1, "customer_only")
          .otherwise("supplier_only").as("op"),
        col("nk"))
      .orderBy("op", "nk")
  }

  /** Dimension-table profiling: per-brand part statistics.
    *
    * `avg_price` is computed in exact integer cents, with the round-4
    * half-up done in integer space — `floor((200·S + n) / (2n))` in
    * 10⁻⁴-dollar units — NOT as `round(avg(double), 4)`: prices are
    * 2-decimal values, so a brand's true mean can land exactly on a
    * round-4 tie (Brand#4 at sf0.01 does: 91257.00/96 = 950.59375),
    * where the last digit of a double `avg` depends on float summation
    * order and differs between engines/partitionings. Integer sums are
    * order-invariant and the final `/10000.0` is one exact-operand
    * IEEE division, identical in Spark and the DuckDB oracle. */
  def partsByBrand(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(round(col("p_retailprice") * 100, 0).cast("long")).as("__cents"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        countDistinct(col("p_type")).as("n_types"))
      .withColumn("avg_price",
        expr("cast((200 * __cents + n_parts) div (2 * n_parts) as double)")
          / lit(10000.0))
      .select(col("p_brand"), col("n_parts"), col("avg_price"),
        col("min_size"), col("max_size"), col("n_types"))
      .orderBy("p_brand")

  /** String-function surface in one projection: case, trim/pad,
    * substring, translate, position, repeat. */
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        lower(col("c_mktsegment")).as("lower_seg"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")

  /** Date-function surface: weekday (Monday=0 on both engines via
    * Spark weekday / DuckDB isodow-1), week-of-year, quarter,
    * days-since-epoch, month boundaries. */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        weekday(col("o_orderdate")).as("wd"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")

  /** Array-aggregation surface: per-user sorted distinct event types,
    * cardinality, first/last elements, membership flag. */
  def userEventArrays(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .select(col("user_id"),
        array_join(col("types"), ",").as("types_str"),
        size(col("types")).as("n_types"),
        col("types").getItem(0).as("first_type"),
        element_at(col("types"), -1).as("last_type"),
        array_contains(col("types"), "purchase").as("has_purchase"))
      .orderBy("user_id")

  /** Pivot: daily event counts with one column per event type. The
    * value list is explicit — at scale an unlisted pivot forces an extra
    * distinct pass over the data before planning.
    */
  def pivotDailyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Analytic window-function surface in one pass: lag/lead, quartile
    * ntile, cume_dist (deterministic — the order key is unique), and a
    * rank with genuine ties (few distinct order statuses). Windows
    * compute over the FULL partitions; the output row filter applies
    * after, so values are scale-independent. */
  def windowFunctions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val byStatus = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderstatus"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(lag(col("o_totalprice"), 1).over(win), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(win), 2).as("next_price"),
        ntile(4).over(win).as("quartile"),
        round(cume_dist().over(win), 6).as("cdist"),
        rank().over(byStatus).as("status_rank"))
      .filter(col("o_orderkey") % 20 === 0)
      .orderBy("o_orderkey")
  }

  /** CUBE over (status, order year): all four grouping combinations in
    * one pass — the grouping-set surface beyond ROLLUP. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("oy"),
        col("o_totalprice"))
      .cube(col("o_orderstatus"), col("oy"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("oy").asc_nulls_first)

  /** Ordered string aggregation (LISTAGG/string_agg): per-segment sorted
    * name roster — sort-then-join makes the result deterministic and
    * engine-portable. */
  def segmentNameRoster(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % 50 === 0)
      .groupBy(col("c_mktsegment"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** Grouped top-k with a window function: top-3 orders by totalprice per
    * priority class — rank + filter, deterministic tie-break.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderpriority", "rk")
  }
}
