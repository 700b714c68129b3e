package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvDistinct.kmvDistinct
import graft.operators.AsOfJoin

/** Semantics of the composed as-of join (tie rule, missing-match NULL)
  * and determinism of the KMV sketch under partial aggregation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("as-of join: >= tie rule, latest prior row, NULL when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, ts(5)),   // before any click → NULL
      (2L, 7L, ts(10)),  // same instant as click 100 → matches (>=)
      (3L, 7L, ts(25)),  // after clicks 100(t10) and 101(t20) → 101
      (4L, 8L, ts(50))   // other user, no clicks → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(10), 100L),
      (7L, ts(20), 101L)
    ).toDF("user_id", "ts", "click_id")
    val out = AsOfJoin(left, right, "user_id", "ts", Seq("click_id"))
      .orderBy("event_id")
      .select(col("event_id"), col("asof_click_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((1L, -1L), (2L, 100L), (3L, 101L), (4L, -1L)))
  }

  test("as-of join: NULL payload in the matched row stays NULL (no torn rows)") {
    import spark.implicits._
    // newest click has a NULL value; an older click has 9.0 — the match
    // must return (101, NULL), never mix in the stale 9.0
    val left = Seq((1L, 7L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(5), 100L, Some(9.0)),
      (7L, ts(20), 101L, Option.empty[Double])
    ).toDF("user_id", "ts", "click_id", "click_value")
    val r = AsOfJoin(left, right, "user_id", "ts",
      Seq("click_id", "click_value")).head()
    assert(r.getLong(r.fieldIndex("asof_click_id")) == 101L)
    assert(r.isNullAt(r.fieldIndex("asof_click_value")),
      "NULL payload must not inherit a stale value from an older right row")
  }

  test("KMV estimate is identical under different partitionings (merge path)") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    def est(parts: Int) = ev.repartition(parts)
      .agg(kmvDistinct(col("user_id"), 8).as("e")).head().getDouble(0)
    assert(est(1) == est(16), "merge must be order-insensitive")
  }

  test("KMV below-k groups return exact cardinality") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
    assert(df.agg(kmvDistinct(col("v"), 64)).head().getDouble(0) == 3.0)
  }
}
