package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HnswIndex, HnswRouted, Similarity}

/** Routed (per-IVF-cell) HNSW: parallel executor-side builds are
  * reproducible, the probed-cell scan is partition-pruned, and while
  * cells fit the RoutedEf beam the composed result is exactly "probe
  * cells, score exactly".
  */
class HnswRoutedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("parallel per-cell builds are reproducible and each cell is a " +
    "well-formed graph") {
    val r1 = Files.createTempDirectory("hnswr-a").toString
    val r2 = Files.createTempDirectory("hnswr-b").toString
    HnswRouted.build(spark, sf0001, r1)
    HnswRouted.build(spark, sf0001, r2)
    def rows(root: String) = spark.read.parquet(s"$root/cells.v1")
      // partition-column discovery types label as int; pin it
      .select(col("label").cast("long").as("label"),
        col("vec_id"), col("level"), col("nbrs"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getSeq[scala.collection.Seq[Long]](3).map(_.toSeq).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(r1) == rows(r2))
    // every node's level matches the deterministic assignment; every
    // neighbor lives in the same cell
    val byCell = rows(r1).groupBy(_._1)
    byCell.foreach { case (_, cell) =>
      val ids = cell.map(_._2).toSet
      cell.foreach { case (_, id, lvl, nbrs) =>
        assert(lvl == HnswIndex.levelOf(id))
        assert(nbrs.length == lvl + 1)
        assert(nbrs.flatten.forall(ids.contains), s"foreign edge at $id")
      }
    }
  }

  test("query scan is partition-pruned to the probed cells") {
    val root = Files.createTempDirectory("hnswr-p").toString
    HnswRouted.build(spark, sf0001, root)
    val df = HnswRouted.query(spark, sf0001, root)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:"),
      s"expected a partition-pruned scan, got:\n$scan")
    assert(scan.contains("label"),
      "the pruning predicate must be on the cell label")
  }

  test("routed result == probe-cells-score-exactly at both test scales " +
    "(cells fit the RoutedEf beam)") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.1")) {
      // reference: ivfTopK's probe selection with normalized scoring —
      // brute force within probed cells
      import spark.implicits._
      val typed = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
        .as[(Long, Long, Array[Double])].collect()
      val cellSizes = typed.groupBy(_._2).view.mapValues(_.length)
      assert(cellSizes.values.max <= HnswRouted.RoutedEf,
        "scale assumption: cells within the exhaustive-beam bound")
      val cents = typed.groupBy(_._2).toSeq.map { case (l, vs) =>
        (l, Array.tabulate(64)(i => vs.map(_._3(i)).sum / vs.length))
      }.sortBy(_._1)
      val queries = typed.filter(_._1 % Similarity.QueryStride == 0)
      val expected = queries.flatMap { case (qId, _, qv) =>
        val probed = cents.map { case (l, cv) =>
          (graft.operators.VectorOps.roundAt(
            graft.operators.VectorOps.dist2(qv, cv), 6), l)
        }.sorted.take(Similarity.NProbe).map(_._2).toSet
        val qnv = graft.operators.VectorOps.l2Normalize(qv)
        typed.filter(t => probed.contains(t._2) && t._1 != qId)
          .map { case (nId, _, nv) =>
            (qId, graft.operators.VectorOps.roundAt(
              graft.operators.VectorOps.dot(qnv,
                graft.operators.VectorOps.l2Normalize(nv)), 4), nId)
          }
          .sortBy { case (_, sim, nId) => (-sim, nId) }
          .take(Similarity.K).zipWithIndex
          .map { case ((q, sim, nId), i) => (q, i + 1, nId, sim) }
      }.sortBy(t => (t._1, t._2)).toSeq
      val got = HnswRouted.topK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got == expected, s"routed mismatch at $dir")
      graft.operators.HnswRouted.clearMemo()
    }
  }
}
