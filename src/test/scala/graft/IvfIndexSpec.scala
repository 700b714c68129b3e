package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}

/** Persistent IVF index: build/query parity with the in-memory
  * operator, incremental merges into frozen cells, and the
  * partition-pruning property that justifies the persisted layout.
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
    val all = spark.read.parquet(s"$indexPath/cells.v1")
    val pruned = IvfIndex.probedCells(spark, indexPath, Seq(0L, 1L))
    assert(pruned.count() < all.count())
    assert(pruned.select("label").distinct().count() == 2)
  }

  test("index layout: one centroid row per cell, cells hive-partitioned") {
    val cent = spark.read.parquet(s"$indexPath/centroids.v1.parquet")
    val labels = spark.read.parquet(s"$indexPath/cells.v1")
      .select("label").distinct().count()
    assert(cent.count() == labels)
    val cellDirs = new java.io.File(s"$indexPath/cells.v1/gen=0")
      .listFiles().count(_.getName.startsWith("label="))
    assert(cellDirs == labels)
  }

  test("merge files a batch into frozen cells; retry is a no-op") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-ivf-split").toString
    try {
      val vecs = graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("label").cast("long"),
          col("embedding").cast("array<double>").as("v"))
      IvfIndex.build(vecs.filter(col("vec_id") % 10 < 6), s"$root/idx")
      val centBefore = spark.read
        .parquet(s"$root/idx/centroids.v1.parquet").collect().map(_.toSeq)
      IvfIndex.merge(vecs.filter(col("vec_id") % 10 >= 6), s"$root/idx")
      // centroids are frozen: byte-identical before and after the merge
      val centAfter = spark.read
        .parquet(s"$root/idx/centroids.v1.parquet").collect().map(_.toSeq)
      assert(centBefore.sameElements(centAfter))
      // the cells now cover the whole corpus
      import spark.implicits._
      val n = vecs.count()
      val labels = vecs.select("label").distinct().as[Long].collect().toSeq
      val got = IvfIndex.probedCells(spark, s"$root/idx", labels)
      assert(got.count() == n)
      // retrying the SAME merge batch is a fingerprint-detected no-op
      IvfIndex.merge(vecs.filter(col("vec_id") % 10 >= 6), s"$root/idx")
      assert(IvfIndex.probedCells(spark, s"$root/idx", labels).count() == n,
        "a retried merge must not duplicate cell rows")
    } finally graft.operators.Scratch.rm(new java.io.File(root))
  }

  test("ingest assigns bare vectors to their nearest frozen cell; " +
       "retry is a no-op; build-first is enforced") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ivf-ingest").toString
    try {
      val vecs = graft.operators.Similarity.corpus(spark, sf0001)
      val landed = vecs.filter(col("vec_id") % 10 =!= 3)
      val crawl = vecs.filter(col("vec_id") % 10 === 3)
        .select(col("vec_id"), col("v"))
      // ingest before build fails loudly
      val e = intercept[IllegalArgumentException](
        IvfIndex.ingest(crawl, s"$root/none"))
      assert(e.getMessage.contains("run build first"))
      IvfIndex.build(landed, s"$root/idx")
      val centBefore = spark.read
        .parquet(s"$root/idx/centroids.v1.parquet").collect().map(_.toSeq)
      IvfIndex.ingest(crawl, s"$root/idx")
      // centroids frozen; every crawl vector landed in exactly one cell
      val centAfter = spark.read
        .parquet(s"$root/idx/centroids.v1.parquet").collect().map(_.toSeq)
      assert(centBefore.sameElements(centAfter))
      val labels = landed.select(col("label").cast("long"))
        .distinct().as[Long].collect().toSeq
      val cells = IvfIndex.probedCells(spark, s"$root/idx", labels)
      assert(cells.count() == vecs.count())
      // assignment is the argmin over frozen centroids (brute-check a
      // few rows against the centroid table)
      val cents = spark.read.parquet(s"$root/idx/centroids.v1.parquet")
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val crawlRows = crawl.as[(Long, Array[Double])].collect().take(10)
      val assigned = cells.join(crawl.select(col("vec_id")), "vec_id")
        .select(col("vec_id"), col("label")).as[(Long, Long)]
        .collect().toMap
      crawlRows.foreach { case (id, v) =>
        val want = cents.minBy { case (l, cv) =>
          (graft.operators.VectorOps.roundAt(
            graft.operators.VectorOps.dist2(v, cv), 6), l)
        }._1
        assert(assigned(id) == want, s"vec $id assigned ${assigned(id)}")
      }
      // retry of the same batch is fingerprint-detected
      IvfIndex.ingest(crawl, s"$root/idx")
      assert(IvfIndex.probedCells(spark, s"$root/idx", labels).count() ==
        vecs.count(), "a retried ingest must not duplicate cell rows")
    } finally graft.operators.Scratch.rm(new java.io.File(root))
  }

  test("compact folds generations into one versioned cell tree; " +
       "queries are unchanged and later merges keep appending") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-ivf-compact").toString
    try {
      val vecs = graft.operators.Similarity.corpus(spark, sf0001)
      IvfIndex.build(vecs.filter(col("vec_id") % 10 < 5), s"$root/idx")
      IvfIndex.merge(vecs.filter(col("vec_id") % 10 >= 5)
        .filter(col("vec_id") % 10 < 8), s"$root/idx")
      IvfIndex.ingest(vecs.filter(col("vec_id") % 10 >= 8)
        .select(col("vec_id"), col("v")), s"$root/idx")
      val before = IvfIndex.topK(spark, s"$root/idx").collect()
      IvfIndex.compact(spark, s"$root/idx")
      // one folded generation dir in the new version; old version
      // retired down to the one-version grace
      assert(new java.io.File(s"$root/idx/cells.v2")
        .listFiles().count(_.getName.startsWith("gen=")) == 1)
      // queries over the compacted tree are bit-identical
      val after = IvfIndex.topK(spark, s"$root/idx").collect()
      assert(after.sameElements(before))
      // a second compact retires v1 (grace window moves forward)
      IvfIndex.compact(spark, s"$root/idx")
      assert(!new java.io.File(s"$root/idx/cells.v1").exists())
      assert(IvfIndex.topK(spark, s"$root/idx").collect()
        .sameElements(before))
      // merges after compaction append into the live version
      IvfIndex.merge(vecs.filter(col("vec_id") % 10 >= 5)
        .filter(col("vec_id") % 10 < 8)
        .withColumn("vec_id", col("vec_id") + 1000000L), s"$root/idx")
      val labels = vecs.select(col("label").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(IvfIndex.probedCells(spark, s"$root/idx", labels).count() >
        vecs.count())
    } finally graft.operators.Scratch.rm(new java.io.File(root))
  }
}
