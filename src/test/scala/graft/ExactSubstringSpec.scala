package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** [[Dedup.exactSubstringSpans]] properties on real data: every
  * reported span is a true token-for-token match, maximal on both
  * sides, and at least [[Dedup.MinRunTokens]] long. (Hash-exactness vs
  * the DuckDB diagonal-islands replay is the `dedup_substring` oracle
  * row; this spec checks the semantic contract independently.) */
class ExactSubstringSpec extends AnyFunSuite {
  import SparkTestSession._

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(' ').filter(_.nonEmpty)

  test("spans are exact, maximal, and above the length gate") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val spans = Dedup.exactSubstringSpans(spark, sf0001).collect()
    assert(spans.nonEmpty, "sf0.001 contains near-duplicate docs")
    spans.foreach { r =>
      val (a, b) = (docs(r.getLong(0)), docs(r.getLong(1)))
      val (sa, sb, len) = (r.getInt(2) - 1, r.getInt(3) - 1, r.getInt(4))
      assert(len >= Dedup.MinRunTokens)
      assert(a.slice(sa, sa + len).sameElements(b.slice(sb, sb + len)),
        s"span $r must match token for token")
      // maximal: the tokens flanking the run differ or hit a boundary
      assert(sa == 0 || sb == 0 || a(sa - 1) != b(sb - 1),
        s"span $r extends left")
      assert(sa + len == a.length || sb + len == b.length ||
        a(sa + len) != b(sb + len), s"span $r extends right")
    }
  }

  test("reported pairs are exactly the winnow candidates with long runs") {
    val pairs = Dedup.exactSubstringSpans(spark, sf0001)
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.winnowPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(candidates),
      "spans only come from winnow-confirmed candidate pairs")
  }
}
