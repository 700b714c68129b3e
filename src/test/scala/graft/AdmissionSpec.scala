package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Admission, Dedup}

/** Composed admission pipeline: one log row per batch doc, the verdict
  * is exactly the conjunction of the three gate flags, and the fixture
  * corpus exercises every gate (the per-gate SEMANTICS are each proven
  * by their own index spec + the oracle row — this spec pins the
  * composition). */
class AdmissionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("one row per batch doc; admitted == conjunction; gates exercised") {
    val out = Admission.pipeline(spark, sf0001).cache()
    try {
      val batchN = graft.sources.Tables.documents(spark, sf0001)
        .filter(col("doc_id") % Dedup.EvalStride =!= 0 &&
          col("doc_id") % 10 === 3).count()
      assert(out.count() == batchN, "one log row per batch doc")
      assert(out.select("doc_id").distinct().count() == batchN)
      assert(out.filter(col("admitted") =!= (col("passed_decontam") &&
        col("passed_rarity") && col("passed_neardup") &&
        col("passed_passage"))).isEmpty,
        "admitted must be exactly the conjunction of the gate flags")
      assert(out.filter(col("admitted")).count() > 0, "some docs admitted")
      assert(out.filter(!col("admitted")).count() > 0, "some docs rejected")
    } finally out.unpersist(blocking = false)
  }
}
