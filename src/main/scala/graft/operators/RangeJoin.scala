package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (interval) join — the operator Spark's optimizer does NOT
  * handle well natively: a plain `p >= start AND p < end` join predicate
  * has no equi-conjunct, so Catalyst plans a BroadcastNestedLoopJoin
  * (or a cartesian product), both of which are O(|points|·|intervals|)
  * and fall over long before 100 TB.
  *
  * Strategy (the standard bucketed rewrite, cf. interval joins in
  * streaming engines): quantize time into fixed-width buckets; an
  * interval registers in every bucket it overlaps (bounded flatMap —
  * ⌈span/width⌉ rows per interval), a point registers in exactly one;
  * the join becomes an EQUI-join on the bucket id followed by the exact
  * range predicate as a post-filter. Each qualifying (interval, point)
  * pair meets in precisely one bucket (the point's), so no dedup pass
  * is needed. The shuffle key is the bucket — pick `bucketSeconds` near
  * the typical interval span so interval replication stays small while
  * buckets stay selective; degenerate skew (everything in one bucket)
  * is the same hot-key problem the dedup family handles and would cap
  * the same way.
  */
object RangeJoin {

  /** Epoch seconds of a TIMESTAMP or TIMESTAMP_NTZ column (sessions pin
    * UTC, so the NTZ→instant cast is the identity mapping). */
  private def epochSeconds(c: org.apache.spark.sql.Column) =
    unix_seconds(c.cast("timestamp"))

  /** Inner-join `points` (a timestamp column `pointCol`) against
    * `intervals` ([`startCol`, `endCol`) half-open) on containment.
    * Output carries all columns of both inputs (callers pre-project;
    * names must not collide). Empty and inverted intervals match
    * nothing and are dropped before the bucket explode — `sequence`
    * would otherwise run DESCENDING for them and manufacture buckets.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long = 16L * 86400): DataFrame = {
    val pts = points.withColumn("__bucket",
      floor(epochSeconds(col(pointCol)) / bucketSeconds))
    val ivs = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(epochSeconds(col(startCol)) / bucketSeconds),
        floor((epochSeconds(col(endCol)) - 1) / bucketSeconds))))
    ivs.join(pts, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs where [aStart, aEnd) ∩ [bStart, bEnd)
    * is non-empty. Same bucket rewrite on both sides; a pair can now
    * meet in several buckets, so matches are attributed to ONE bucket —
    * the first bucket of the overlap region — with a post-filter
    * instead of a distinct (no extra shuffle). */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketSeconds: Long = 16L * 86400): DataFrame = {
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn("__bucket", explode(sequence(
          floor(epochSeconds(col(s)) / bucketSeconds),
          floor((epochSeconds(col(e)) - 1) / bucketSeconds))))
    val overlapStart = greatest(epochSeconds(col(lStart)), epochSeconds(col(rStart)))
    buckets(left, lStart, lEnd).join(buckets(right, rStart, rEnd), Seq("__bucket"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") === floor(overlapStart / bucketSeconds))
      .drop("__bucket")
  }

  /** Oracle-gated query: urgent orders falling inside the (synthetic,
    * quantity-derived) shipping window of low-suppkey lineitems — a
    * pure inequality join in the DuckDB oracle, the bucketed equi-join
    * here. */
  def shippingWindowOrders(spark: SparkSession, dir: String): DataFrame = {
    val ivs = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 2)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("win_start"),
        (col("l_shipdate") + expr(
          "make_dt_interval(pmod(cast(l_quantity as int), 14) + 1, 0, 0, 0)"))
          .as("win_end"))
    val pts = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    pointInInterval(pts, "o_orderdate", ivs, "win_start", "win_end")
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .orderBy("l_orderkey", "l_linenumber", "o_orderkey")
  }
}
