package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Character-trigram LM scoring: the perplexity-filter stand-in must be
  * deterministic, bounded below by 1.0 (a context count can never fall
  * below its continuation count), identical for identical prefixes, and
  * must rank text the corpus has seen verbatim as less surprising than
  * text it has not.
  */
class LmScoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val scores = TextAnalysis.lmScore(spark, sf0001)

  test("every scored doc is covered and scores are >= 1.0") {
    val n = graft.sources.Tables.documents(spark, sf0001)
      .filter(length(lower(substring(col("text"), 1,
        TextAnalysis.LmPrefix))) >= 3).count()
    assert(scores.count() == n)
    assert(scores.filter(col("lm_score") < 1.0).count() == 0)
    assert(scores.filter(col("n_tri") >
      TextAnalysis.LmPrefix - 2).count() == 0,
      "prefix bound must cap the per-doc trigram count")
  }

  test("identical prefixes score identically; scoring is deterministic") {
    val again = TextAnalysis.lmScore(spark, sf0001).collect()
    assert(scores.collect().sameElements(again))

    // docs sharing their first LmPrefix chars must tie exactly
    val byPrefix = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        lower(substring(col("text"), 1, TextAnalysis.LmPrefix)).as("p"))
      .join(scores, "doc_id")
      .groupBy("p").agg(countDistinct(col("lm_score")).as("k"))
    assert(byPrefix.filter(col("k") > 1).count() == 0)
  }

  test("over-cap corpora fall back to the distributed path, bit-identical") {
    // driverCap=1 forces the gate on the first partial: the distributed
    // join formulation must replay the driver path's integer arithmetic
    // exactly — same rows, same doubles, no driver-side count tables
    val distributed = TextAnalysis.lmScore(spark, sf0001, driverCap = 1L)
      .collect()
    assert(distributed.sameElements(scores.collect()),
      "distributed fallback must be bit-identical to the driver path")
  }

  test("repeated boilerplate scores lower than novel character soup") {
    import spark.implicits._
    // 60 copies of one sentence + 1 novel doc: the LM is dominated by
    // the boilerplate, so the clones sit near the floor while the novel
    // doc's unseen trigrams are maximally surprising
    val boiler = (1L to 60L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val novel = Seq((99L, "zxqvj kwpyt gmbfd hcrns uaeio ltzqx wvjky pmbgf"))
    val dir = java.nio.file.Files.createTempDirectory("lm-docs").toString
    (boiler ++ novel).toDF("doc_id", "text")
      .withColumn("source", lit("t")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val s = TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) < s(99L),
      s"boilerplate ${s(1L)} must score below novel ${s(99L)}")
    assert(s(1L) < 1.5, "fully-seen text sits near the 1.0 floor")
  }
}
