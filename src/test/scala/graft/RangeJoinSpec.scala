package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Range-join semantics (half-open containment, bucket-boundary cases)
  * and the plan guarantee that makes it scale: the bucketed rewrite
  * must never fall back to a nested-loop/cartesian join.
  */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def noNestedLoop(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "range join must not plan a nested-loop/cartesian join")
  }

  test("pointInInterval: half-open bounds, bucket boundaries, inverted intervals") {
    import spark.implicits._
    val intervals = Seq(
      // spans a 16-day bucket boundary (bucket width = 16 d from epoch)
      (1L, ts("2024-01-10 00:00:00"), ts("2024-02-05 00:00:00")),
      // single-instant-exclusive: start == end matches nothing
      (2L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00")),
      // inverted: must be dropped, not explode a descending sequence
      (3L, ts("2024-04-10 00:00:00"), ts("2024-04-01 00:00:00")),
      (4L, ts("2024-05-01 00:00:00"), ts("2024-05-02 00:00:00")))
      .toDF("iv_id", "s", "e")
    val points = Seq(
      (10L, ts("2024-01-10 00:00:00")), // == start → included
      (11L, ts("2024-02-05 00:00:00")), // == end → excluded
      (12L, ts("2024-02-04 23:59:59")), // just inside
      (13L, ts("2024-03-01 00:00:00")), // empty interval → excluded
      (14L, ts("2024-04-05 00:00:00")), // inside the inverted interval
      (15L, ts("2024-05-01 12:00:00")))
      .toDF("p_id", "p")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 12L), (4L, 15L)))
  }

  test("matches the naive inequality join exactly at sf0.001") {
    val got = RangeJoin.shippingWindowOrders(spark, sf0001)
    noNestedLoop(got)
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .filter(col("l_suppkey") <= 2)
    val ords = graft.sources.Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    // naive plan (small SF only): the semantics reference
    val naive = li.crossJoin(ords)
      .filter(col("o_orderdate") >= col("l_shipdate") &&
        col("o_orderdate") < col("l_shipdate") + expr(
          "make_dt_interval(pmod(cast(l_quantity as int), 14) + 1, 0, 0, 0)"))
      .select("l_orderkey", "l_linenumber", "o_orderkey")
    assert(got.count() > 0, "sf0.001 must produce matches")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("interval replication is bounded by span/bucketWidth + 1") {
    import spark.implicits._
    // 64-day interval, 16-day buckets → at most 5 bucket rows, and the
    // pair output still has no duplicates
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-03-05 00:00:00")))
      .toDF("iv_id", "s", "e")
    val points = Seq((10L, ts("2024-02-15 08:30:00"))).toDF("p_id", "p")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
    assert(out.count() == 1)
  }

  test("intervalOverlap: overlapping pairs once, touching pairs never") {
    import spark.implicits._
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
      (2L, ts("2024-06-01 00:00:00"), ts("2024-06-10 00:00:00")))
      .toDF("a_id", "as", "ae")
    val b = Seq(
      // overlaps a1 across multiple shared buckets → must emit ONCE
      (7L, ts("2024-01-20 00:00:00"), ts("2024-03-01 00:00:00")),
      // touches a1 end-to-start (half-open) → no match
      (8L, ts("2024-02-01 00:00:00"), ts("2024-02-10 00:00:00")),
      // strictly inside a2
      (9L, ts("2024-06-03 00:00:00"), ts("2024-06-04 00:00:00")))
      .toDF("b_id", "bs", "be")
    val out = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(out.toSet == Set((1L, 7L), (2L, 9L)))
    assert(out.length == 2, s"duplicate overlap rows: ${out.toSeq}")
  }
}
