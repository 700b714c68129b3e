package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, VectorOps}

/** Scale-shape regression guards for the vector operators: the
  * embedding near-dup must stay a tiled block join (no driver collect
  * at construction, no broadcast nested loop), the ANN paths must keep
  * their bounded pre-reduction, and the typed kernel pieces must match
  * their naive definitions exactly.
  */
class VectorScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  test("TopK heap matches full sort-and-take under ties") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      // coarse sims force many ties at the k boundary
      (math.floor(rng.nextDouble() * 10) / 10.0, rng.nextLong().abs % 100)
    }.distinct
    for (k <- Seq(1, 5, 17)) {
      val h = new VectorOps.TopK(k)
      rows.foreach { case (s, id) => h.insert(s, id) }
      val got = h.drain().toSeq.sortBy { case (s, id) => (-s, id) }
      val want = rows.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got == want, s"k=$k")
    }
  }

  test("VecMean aggregator equals naive per-label mean") {
    import spark.implicits._
    val data = Seq(
      (1L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)),
      (2L, Array(10.0, 0.0)), (2L, Array(0.0, 10.0)), (2L, Array(2.0, 2.0)))
    val got = data.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new VectorOps.VecMean(2).toColumn.name("m"))
      .collect().toMap
    assert(got(1L).toSeq == Seq(2.0, 3.0))
    assert(got(2L).toSeq == Seq(4.0, 4.0))
  }

  test("embeddingNearDup constructs without running any job (no collect)") {
    // warm the parquet listing/schema path so only operator-construction
    // jobs would be counted
    graft.sources.Tables.embeddings(spark, sf001).schema
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Thread.sleep(300) // drain in-flight listener events from prior tests
    val t0 = System.currentTimeMillis()
    val l = new SparkListener {
      // events deliver async: only count jobs that STARTED after t0
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.time >= t0)
          sites.add(Option(js.properties.getProperty("callSite.short")).getOrElse(""))
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Dedup.embeddingNearDup(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      Thread.sleep(300) // let any async job-start events land
      // parquet footer/schema-inference metadata jobs are fine; any
      // data-moving action (collect/count/take) at construction is the
      // scale-killer this test guards against
      val offending = sites.toArray(Array.empty[String])
        .filter(s => s.contains("collect") || s.contains("count") ||
          s.contains("take") || s.contains("Dedup"))
      assert(offending.isEmpty, s"construction ran: ${offending.mkString(", ")}")
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("embeddingNearDup result is invariant to the tile count") {
    val b1 = Dedup.embeddingNearDup(spark, sf001, blocks = 1).collect().toSeq
    val b3 = Dedup.embeddingNearDup(spark, sf001, blocks = 3).collect().toSeq
    val b8 = Dedup.embeddingNearDup(spark, sf001, blocks = 8).collect().toSeq
    assert(b1.nonEmpty, "expected near-dup pairs at sf0.01")
    assert(b3 == b1)
    assert(b8 == b1)
  }

  test("embeddingNearDup pins the tile shuffle to one partition per tile-pair") {
    // the dot-product kernel is CPU-dense per byte: AQE's byte-derived
    // coalescing would fold the whole all-pairs pass into one task, so
    // the tile exchange must carry an EXPLICIT numPartitions (exempt
    // from coalescing) equal to the B(B+1)/2 tile-pair count
    val plan = Dedup.embeddingNearDup(spark, sf001, blocks = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"), plan.take(2000))
    assert(plan.contains("hashpartitioning(pair_id"), plan.take(2000))
    assert(plan.contains(", 36)"), plan.take(2000))
  }

  test("bruteForceTopK refuses an unbounded query block") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(spark, sf001, maxQueries = 3)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("ivfTopK plan has no row-exploding Generate (typed centroid pass)") {
    val plan = Similarity.ivfTopK(spark, sf001)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("posexplode"), plan.take(2000))
  }
}
