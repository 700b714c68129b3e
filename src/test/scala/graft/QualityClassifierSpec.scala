package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** The trained quality classifier must actually LEARN: the distilled
  * linear model's agreement with its supervising Gopher label has to
  * clear the majority-class base rate by a wide margin (a dead or
  * saturated model scores exactly the base rate). Value-level parity
  * with the DuckDB training replay is the driver gate's job.
  */
class QualityClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  test("distilled model beats the base rate at sf0.001") {
    val rows = QualityClassifier.classify(spark, sf0001).collect()
    val n = rows.length.toDouble
    val pos = rows.count(_.getBoolean(3)) / n
    val base = math.max(pos, 1 - pos)
    val acc = rows.count(r => r.getBoolean(2) == r.getBoolean(3)) / n
    assert(acc >= 0.85, s"accuracy $acc below floor")
    assert(acc >= base + 0.15,
      s"accuracy $acc does not clear the base rate $base — model is dead")
  }

  test("scores are calibrated-ish: positives score above negatives") {
    val rows = QualityClassifier.classify(spark, sf0001).collect()
    def mean(v: Seq[Long]) = v.sum.toDouble / v.size
    val posScores = rows.filter(_.getBoolean(3)).map(_.getLong(1)).toSeq
    val negScores = rows.filterNot(_.getBoolean(3)).map(_.getLong(1)).toSeq
    assert(mean(posScores) > mean(negScores) + 200000,
      "label classes are not separated in score space")
  }

  test("weights: one per feature, structural families learned") {
    val w = QualityClassifier.modelWeights(spark, sf0001).collect()
    assert(w.length == QualityClassifier.NumFeatures)
    assert(w.map(_.getInt(0)).toSeq == (0 until QualityClassifier.NumFeatures))
    // the word-count one-hots straddle the MinWords gate: some signal
    // must be nonzero there, else the model ignored document structure
    val structural = w.filter(_.getInt(0) >= QualityClassifier.WordsBase)
    assert(structural.exists(_.getLong(1) != 0L), "structural weights all zero")
  }

  test("training is memoized per (session, corpus)") {
    val a = QualityClassifier.weights(spark, sf0001)
    val b = QualityClassifier.weights(spark, sf0001)
    assert(a eq b, "second weights() call must return the memoized array")
  }

  test("classify is deterministic across invocations") {
    val a = QualityClassifier.classify(spark, sf0001).collect().map(_.toSeq)
    val b = QualityClassifier.classify(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
