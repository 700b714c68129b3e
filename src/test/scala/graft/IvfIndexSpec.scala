package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}

/** Persistent IVF index: build/query parity with the in-memory
  * operator, and the partition-pruning property that justifies the
  * persisted layout.
  */
class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val indexPath = {
    val p = Files.createTempDirectory("graft-ivf-index").toString
    IvfIndex.build(spark, sf0001, p)
    p
  }

  test("persisted-index query is bit-identical to the in-memory operator") {
    val fromIndex = IvfIndex.topK(spark, indexPath).collect()
    val inMemory = Similarity.ivfTopK(spark, sf0001).collect()
    assert(fromIndex.nonEmpty)
    assert(fromIndex.sameElements(inMemory))
  }

  test("probed-cell scan prunes partitions to the probed labels") {
    val scan = IvfIndex.probedCells(spark, indexPath, Seq(0L, 1L))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:"),
      s"expected a partition-pruned scan, got:\n$scan")
    assert(scan.contains("label"),
      "the pruning predicate must be on the cell label")
    // the pruned scan must read strictly fewer files than the full corpus
    val all = spark.read.parquet(s"$indexPath/cells")
    val pruned = IvfIndex.probedCells(spark, indexPath, Seq(0L, 1L))
    assert(pruned.count() < all.count())
    assert(pruned.select("label").distinct().count() == 2)
  }

  test("index layout: one centroid row per cell, cells hive-partitioned") {
    val cent = spark.read.parquet(s"$indexPath/centroids.parquet")
    val labels = spark.read.parquet(s"$indexPath/cells")
      .select("label").distinct().count()
    assert(cent.count() == labels)
    val cellDirs = new java.io.File(s"$indexPath/cells")
      .listFiles().count(_.getName.startsWith("label="))
    assert(cellDirs == labels)
  }
}
