package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Mixture rebalancing and the deterministic training order. */
class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mixtureSample rebalances strata toward the smallest one, deterministically") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = counts.values.min
    val out = Sampling.mixtureSample(spark, sf0001).collect()
    val sampled = out.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    counts.foreach { case (lang, n) =>
      val rate = minN.toDouble / n
      val got = sampled.getOrElse(lang, 0L)
      // hash-fraction sampling is binomial around rate * n = minN;
      // 5σ band keeps the test deterministic-in-practice
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(got - minN) <= 5 * sigma + 1,
        s"$lang: got $got, expected ~$minN (n=$n)")
    }
    // determinism: a second run yields the identical set
    val again = Sampling.mixtureSample(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("profileEvents: no expand in the plan — distincts run as separate aggregates") {
    val df = Sampling.profileEvents(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // two countDistinct in ONE aggregate would plan an Expand that
    // multiplies every input row once per distinct group; the separate-
    // aggregate shape must keep it out of the plan for good
    assert(!plan.contains("Expand"),
      s"multi-distinct expand crept back into profileEvents:\n$plan")
  }

  test("mixtureSample touches the corpus with one narrow filter — stratum stats broadcast") {
    val df = Sampling.mixtureSample(spark, sf0001)
    df.collect() // materialize so AQE's final plan is inspectable
    // toString prints Final and Initial plan sections; audit the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // stratum counts reach the corpus by broadcast (hash join on lang,
    // scalar min target by a 1-row nested-loop build) — the corpus
    // never shuffles before the filter
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan.take(2000))
    // exactly ONE scan reads doc_id (the single corpus pass); the two
    // stats scans are pruned to the lang column alone
    val docIdScans = "ReadSchema: [^\\n]*doc_id".r.findAllIn(plan).size
    assert(docIdScans == 1, s"corpus scanned $docIdScans times:\n${plan.take(2000)}")
  }

  test("trainingOrder is a deterministic permutation prefix via TakeOrdered") {
    val a = Sampling.trainingOrder(spark, sf0001).collect()
    val b = Sampling.trainingOrder(spark, sf0001).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.length == Sampling.TrainingOrderK)
    // keys ascend and are the md5 the contract names
    val keys = a.map(_.getString(1))
    assert(keys.toSeq == keys.sorted.toSeq)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Sampling.trainingOrder(spark, sf0001)
      .queryExecution.executedPlan match {
        case ad: AdaptiveSparkPlanExec => ad.inputPlan
        case other => other
      }
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "trainingOrder must be per-partition heaps, not a global sort")
  }
}
