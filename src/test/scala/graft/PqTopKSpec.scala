package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** PQ-compressed ANN: geometry invariants, approximation quality vs the
  * exact brute-force baseline, and determinism. Value-level parity with
  * the DuckDB training/encoding/ADC replay is the driver gate's job.
  */
class PqTopKSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PQ geometry covers the vector exactly") {
    assert(Similarity.PqM * Similarity.PqSubDim == Similarity.Dims)
    assert(Similarity.PqK <= 16, "codes must fit 4 bits per subspace")
  }

  test("output shape matches the other top-k operators") {
    val df = Similarity.pqTopK(spark, sf0001)
    assert(df.columns.toSeq == Seq("q_id", "rank", "n_id", "sim"))
    val rows = df.collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length == Similarity.K))
    perQuery.values.foreach { g =>
      assert(g.map(_.getInt(1)).sorted.toSeq == (1 to Similarity.K))
      // ranks ordered by sim desc, ties by n_id
      val sorted = g.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getDouble(3), b.getDouble(3))
          assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)))
        case _ =>
      }
    }
  }

  test("recall@K vs exact brute force clears the floor") {
    val exact = Similarity.bruteForceTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val pq = Similarity.pqTopK(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(pq.keySet == exact.keySet)
    // .keys.toSeq: mapping over a Set would collapse equal per-query
    // recall values before the sum
    val recall = exact.keys.toSeq.map(q =>
      (pq(q) & exact(q)).size.toDouble / Similarity.K).sum / exact.size
    // uniform synthetic vectors are PQ's worst case; 0.87 measured at
    // sf0.1, 0.6 floor guards against a broken codebook/ADC path while
    // tolerating small-corpus variance
    assert(recall >= 0.6, s"recall@${Similarity.K} = $recall")
  }

  test("codebooks are memoized and results deterministic") {
    val a = Similarity.pqTopK(spark, sf0001).collect().map(_.toSeq)
    val b = Similarity.pqTopK(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
