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

  test("removal cuts exactly the spanned tokens of the higher doc id") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val spans = Dedup.exactSubstringSpans(spark, sf0001).collect()
    val removedPos = spans.groupBy(_.getLong(1)).map { case (doc, rs) =>
      doc -> rs.flatMap(r => r.getInt(3) until r.getInt(3) + r.getInt(4)).toSet
    }
    val out = Dedup.removeSubstringSpans(spark, sf0001).collect()
    assert(out.length == docs.size, "every document is emitted")
    out.foreach { r =>
      val (id, text, nRemoved) = (r.getLong(0), r.getString(1), r.getInt(2))
      val expect = removedPos.getOrElse(id, Set.empty)
      assert(nRemoved == expect.size, s"doc $id removal count")
      val kept = docs(id).zipWithIndex
        .filterNot { case (_, i) => expect.contains(i + 1) }.map(_._1)
      assert(text == kept.mkString(" "), s"doc $id surviving stream")
    }
    assert(out.exists(_.getInt(2) > 0), "some passage was actually cut")
    // the keeper side (lowest doc id of each pair) is never cut by
    // spans it shares with a higher doc
    val keepers = spans.map(_.getLong(0)).toSet -- spans.map(_.getLong(1)).toSet
    keepers.foreach { id =>
      val r = out.find(_.getLong(0) == id).get
      assert(r.getInt(2) == 0, s"pure keeper $id must keep all tokens")
    }
  }

  test("chunked cells reassemble spans exactly: tiny chunks == default") {
    // chunk size 16 forces every ≥8-token run on sf0.001 across MANY
    // cell boundaries; fragment merging must reproduce the single-cell
    // answer bit for bit
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val pairs = Dedup.winnowPairs(spark, sf0001).select("doc_a", "doc_b")
    val tiny = Dedup.spansOf(pairs, docs, chunkTokens = 16).collect()
    val dflt = Dedup.spansOf(pairs, docs, Dedup.SpanChunkTokens).collect()
    assert(tiny.length == dflt.length)
    tiny.zip(dflt).foreach { case (t, d) => assert(t == d) }
  }

  test("adversarial long-doc pair: bounded cells, analytic spans") {
    // Two ~1e5-token docs in ONE confirmed pair — the crawl-outlier
    // shape that used to pin a single task on an O(len_a·len_b) scan.
    // doc 2 is doc 1 with every 5000th token mutated, so the exact
    // answer is analytic: 20 maximal runs of exactly 4999 tokens on
    // the main diagonal. The kernel must (a) get it right through the
    // fragment merge (each run crosses ~12 chunk edges at the default
    // size) and (b) finish in bounded per-task units — the scan is
    // ~600 cells of ≤ SpanChunkTokens² work, not one task.
    val n = 100000
    val rng = new scala.util.Random(7)
    val base = Array.fill(n)("t" + rng.nextInt(1 << 30))
    val mutated = base.clone()
    (4999 until n by 5000).foreach(k => mutated(k) = "zzz" + k)
    import spark.implicits._
    val docs = Seq((1L, base.mkString(" ")), (2L, mutated.mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val spans = Dedup.spansOf(pairs, docs, Dedup.SpanChunkTokens)
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getInt(4)))
    val expected = (0 until 20).map(i => (i * 5000 + 1, i * 5000 + 1, 4999))
    assert(spans.toSeq == expected,
      s"got ${spans.length} spans, head ${spans.take(3).mkString(",")}")
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
