package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Deterministic k-means + SemDeDup: fixed-init Lloyd rounds must be
  * exactly reproducible (the oracle replays them in SQL), every vector
  * must land in exactly one cluster, and cluster-scoped pruning must
  * only ever surface pairs the exhaustive embedding near-dup also
  * finds — SemDeDup trades recall across cluster boundaries for
  * O(Σ|cluster|²) work, never precision.
  */
class SemanticDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  test("kmeans is deterministic and accounts for every vector") {
    val a = Similarity.kmeans(spark, sf001).collect()
    val b = Similarity.kmeans(spark, sf001).collect()
    assert(a.sameElements(b), "fixed-init Lloyd must be run-to-run stable")

    val n = graft.sources.Tables.embeddings(spark, sf001).count()
    assert(a.length == n, "every vector assigned exactly once")
    val clusters = a.map(_.getInt(1)).distinct
    assert(clusters.forall(c => c >= 0 && c < Similarity.KmeansK))
    // n_cluster is the true partition size
    val byCluster = a.groupBy(_.getInt(1))
    assert(a.forall(r => r.getLong(2) == byCluster(r.getInt(1)).length))
  }

  test("driver-side and distributed Lloyd branches train identical models") {
    // the adaptive split (DriverKmeansMaxCells) must be invisible: same
    // corpus, same k -> bit-identical centroids from both branches (the
    // distributed branch is what a 100 TB corpus runs; every test SF
    // takes the driver branch, so this is its only exercise)
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])]
    val k = 4
    val driver = Similarity.trainDriverSide(e, k)
    val dist = Similarity.trainDistributed(e, k)
    assert(driver.length == dist.length)
    driver.zip(dist).zipWithIndex.foreach { case ((d, s), i) =>
      assert(d.sameElements(s), s"centroid $i diverged between branches")
    }
  }

  test("distributed Lloyd is summation-order invariant") {
    // branch invariance must not hinge on a lucky reduction order: the
    // quantized-long centroid sums (VectorOps.VecMeanQ / qMean) are
    // exact integers, so an adversarial repartition + reversed
    // within-partition order — a different merge tree entirely — must
    // still train the bit-identical model
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])]
    val scrambled = e.toDF("vec_id", "v")
      .repartition(17, col("vec_id"))
      .sortWithinPartitions(col("vec_id").desc)
      .as[(Long, Array[Double])]
    val k = 4
    val a = Similarity.trainDistributed(e, k)
    val b = Similarity.trainDistributed(scrambled, k)
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.sameElements(y), s"centroid $i depends on summation order")
    }
  }

  test("kmeans iterations tighten or hold the within-cluster spread") {
    // sanity on the Lloyd contract: the final assignment's clusters are
    // non-degenerate (more than one populated) for the test corpus
    val populated = Similarity.kmeans(spark, sf001)
      .select("cluster").distinct().count()
    assert(populated > 1, s"degenerate clustering: $populated cluster(s)")
  }

  test("semanticDedup pairs are a subset of exhaustive embedding near-dups") {
    val sem = Similarity.semanticDedup(spark, sf001).collect()
    assert(sem.nonEmpty, "test corpus is seeded with near-duplicates")
    val exhaustive = Dedup.embeddingNearDup(spark, sf001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    sem.foreach { r =>
      val (vecId, keeper) = (r.getLong(0), r.getLong(2))
      assert(keeper < vecId, "keeper must be the lower id")
      assert(exhaustive.contains((keeper, vecId)),
        s"pair ($keeper, $vecId) not found by the exhaustive near-dup " +
          "— cluster-scoped pruning surfaced a pair the full scan rejects")
    }
  }

  test("degenerate 10^5-vector cluster takes the bounded star path") {
    import org.apache.spark.sql.functions._
    // all-identical vectors in ONE cluster: the clique would be ~5e9
    // pairs — the star fallback must finish with n−1 pairs, keeper = 0
    val n = 100000
    val withV = spark.range(n)
      .select(col("id").as("vec_id"), lit(0).as("cluster"),
        array(lit(1.0), lit(0.0)).as("v"))
    val out = Similarity.semanticPrune(withV).collect()
    assert(out.length == n - 1, "star must prune every satellite once")
    assert(out.forall(_.getLong(2) == 0L), "keeper is the cluster min")
    assert(out.forall(_.getDouble(3) == 1.0))
  }

  test("cap boundary: exact clique at SemPairCap members, star one past it") {
    import org.apache.spark.sql.functions._
    val cap = Similarity.SemPairCap
    // member 0 orthogonal to everyone; members 1.. identical — the
    // clique prunes b ≥ 2 (keeper 1), the star (min vs rest) finds
    // nothing, so the two paths are distinguishable by construction
    def run(n: Int) = Similarity.semanticPrune(
      spark.range(n).select(col("id").as("vec_id"), lit(0).as("cluster"),
        when(col("id") === 0, array(lit(1.0), lit(0.0)))
          .otherwise(array(lit(0.0), lit(1.0))).as("v"))).collect()
    assert(run(cap).length == cap - 2,
      "a cluster of exactly cap members must keep the exact clique")
    assert(run(cap + 1).isEmpty,
      "one member past the cap must switch to the spanning star")
  }

  test("semanticDedup never prunes a cluster's minimum id") {
    val sem = Similarity.semanticDedup(spark, sf001).collect()
    val assigned = Similarity.kmeans(spark, sf001).collect()
      .groupBy(_.getInt(1)).map { case (c, rows) =>
        c -> rows.map(_.getLong(0)).min
      }
    sem.foreach { r =>
      assert(r.getLong(0) != assigned(r.getInt(1)),
        "the lowest id of a cluster has no lower-id neighbor to prune it")
    }
  }
}
