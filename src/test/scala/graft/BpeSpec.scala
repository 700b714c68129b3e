package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE merge learning: greedy application semantics, iteration on
  * merged symbols, deterministic tie-breaks, early exhaustion. Value
  * parity with the DuckDB training replay is the driver gate's job.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def write(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bpe").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "b", "c", "a", "b"), "a", "b") ==
      Seq("ab", "c", "ab"))
    // same-symbol runs merge at odd match positions only
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ==
      Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
  }

  test("merges iterate on previously-merged symbols") {
    // one word "abab": (a,b) twice beats (b,a) once; after merging,
    // (ab,ab) is the only remaining pair; then the word is one symbol
    val d = write(Seq(0L -> "abab"))
    val m = Bpe.merges(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(m.toSeq == Seq((1, "a", "b"), (2, "ab", "ab")))
  }

  test("tie on count breaks to the lexicographically smallest pair") {
    val d = write(Seq(0L -> "ab cd ab cd"))
    val first = Bpe.merges(spark, d).collect().head
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("vocabulary exhaustion stops early without padding ranks") {
    val d = write(Seq(0L -> "aa aa"))
    // single distinct word "aa": one merge and the vocab is atomic
    val m = Bpe.merges(spark, d).collect()
    assert(m.length == 1)
    assert((m.head.getString(1), m.head.getString(2)) == ("a", "a"))
  }

  test("driver and distributed training paths agree exactly") {
    val fast = Bpe.merges(spark, sf0001).collect().map(_.toSeq)
    val dist = Bpe.merges(spark, sf0001, driverCap = 0)
      .collect().map(_.toSeq)
    assert(fast.sameElements(dist))
  }

  test("real corpus: learned table has Merges rows and composite symbols") {
    val m = Bpe.merges(spark, sf0001).collect()
    assert(m.length == Bpe.Merges)
    assert(m.map(_.getInt(0)).toSeq == (1 to Bpe.Merges))
    // frequency-weighted english-like text must produce at least one
    // second-order merge (a side longer than one character)
    assert(m.exists(r =>
      r.getString(1).length > 1 || r.getString(2).length > 1))
  }

  test("encode applies the trained table: counts match a hand replay") {
    val d = write(Seq(
      (1L, "aaaa aaaa bb"),   // drives merges toward aa / aaaa
      (2L, "aaaa bb bb"),
      (3L, ""),               // tokenizes to nothing -> 0 / 0
      (4L, "zq")))            // rare word: stays near character-level
    val ms = Bpe.learnedMerges(spark, d)
    val enc = Bpe.encode(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(enc(3L) == ((0, 0L)), "empty doc must report zero counts")
    // replay each word through applyMerge and compare
    def count(w: String): Long = {
      var syms: Seq[String] = w.map(_.toString)
      ms.foreach { case (a, b) => syms = Bpe.applyMerge(syms, a, b) }
      syms.length.toLong
    }
    assert(enc(1L) == ((3, count("aaaa") * 2 + count("bb"))))
    assert(enc(2L) == ((3, count("aaaa") + count("bb") * 2)))
    assert(enc(4L) == ((1, count("zq"))))
    // encoding must compress: the trained merges shrink frequent words
    assert(count("aaaa") < 4, "frequent word must end under char count")
  }

  test("encode cache cap: adversarial all-distinct-words partition stays exact") {
    // every word unique -> zero cache hits, constant eviction pressure;
    // counts must be identical to the uncapped run (the cache only
    // avoids recompute, never changes results)
    val docs = (0L until 50L).map { i =>
      i -> (0 until 40).map(j => s"w${i}x$j").mkString(" ")
    }
    val d = write(docs)
    val capped = Bpe.encode(spark, d, cacheCap = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val uncapped = Bpe.encode(spark, d, cacheCap = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(capped.sameElements(uncapped),
      "a 4-entry cache must not change any count")
    assert(capped.forall(_._2 == 40), "every doc tokenizes to 40 words")
  }
}
