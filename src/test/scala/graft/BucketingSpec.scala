package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The 100 TB co-location claim, made checkable at sf0.001: orders and
  * lineitem bucketed on the join key join WITHOUT any shuffle exchange
  * (broadcast disabled to force the sort-merge path), and the result
  * matches the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans without exchange") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val nBuckets = 8
    Tables.orders(spark, sf0001).write
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/orders_b").mode("overwrite")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/lineitem_b").mode("overwrite")
      .saveAsTable("lineitem_b")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      // the only exchange allowed is for the final groupBy, which keys on
      // o_orderpriority; the JOIN itself must read bucketed data directly
      val joinSection = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // correctness vs the plain join
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.agg(sum("n")).head().getLong(0) == expected && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
