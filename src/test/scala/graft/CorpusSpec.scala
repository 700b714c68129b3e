package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Semantic invariants of the corpus-preparation operators (the oracle
  * gate covers value equality; these pin the properties that make the
  * operators *correct by construction* on any corpus).
  */
class CorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  test("piiRedact counts and strips every injected PII class") {
    val out = Corpus.piiRedact(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1)
      assert(r.getAs[Int]("n_phones") >= 1)
      assert(r.getAs[Int]("n_ips") >= 1)
      val red = r.getAs[String]("redacted")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
        red.contains("<IP>"))
      assert(!red.contains("@"), s"unredacted email in: $red")
      assert(!red.matches(".*[0-9]{3}-[0-9]{3}-[0-9]{4}.*"))
      assert(!red.matches(""".*\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b.*"""))
    }
  }

  test("tokenChunks reconstructs the exact token stream of each doc") {
    val overlap = Corpus.ChunkSize - Corpus.ChunkStride
    val chunks = Corpus.tokenChunks(spark, sf0001)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.tokens(col("text")).as("t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("chunk_id"))
      // stitch: whole first chunk, then drop `overlap` tokens per later one
      val stitched = ordered.zipWithIndex.flatMap { case (r, i) =>
        val toks = r.getAs[String]("chunk").split(' ').toSeq
        assert(toks.size == r.getAs[Int]("n_toks"))
        if (i == 0) toks else toks.drop(overlap)
      }
      assert(stitched.toSeq == docs(id).toSeq, s"doc $id chunk stitch mismatch")
    }
  }

  test("spanDedup flags identical docs and keeps unique docs") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-spans").toString
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq((1L, text), (2L, text), (3L, (1 to 40).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Corpus.spanDedup(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_frac"), r.getAs[Boolean]("keep"))).toMap
    assert(rows(1L) == (1.0, false) && rows(2L) == (1.0, false))
    assert(rows(3L) == (0.0, true))
  }

  test("trainSplit is deterministic with ~90/5/5 mass") {
    val a = Corpus.trainSplit(spark, sf0001).collect()
    val b = Corpus.trainSplit(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    val frac = a.groupBy(_.getAs[String]("split"))
      .map { case (k, v) => k -> v.length.toDouble / a.length }
    assert(frac("train") > 0.8 && frac("train") < 0.97)
    assert(frac.getOrElse("val", 0.0) < 0.15 && frac.getOrElse("test", 0.0) < 0.15)
  }

  test("topTerms equals the exact count on a collected corpus") {
    val got = Corpus.topTerms(spark, sf0001).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt")))
    val manual = graft.sources.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split(' ').filter(_.nonEmpty))
      .groupBy(identity).map { case (t, v) => (t, v.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(Corpus.TopTermsK)
    assert(got.toSeq == manual)
  }

  test("quantizeProfile error is bounded by half a quantization step") {
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        ((array_max(col("embedding")) - array_min(col("embedding")))
          .cast("double") / 255.0).as("scale"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("scale"))
      .toMap
    val out = Corpus.quantizeProfile(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bound = rows(r.getAs[Long]("vec_id")) / 2.0 + 1e-4
      assert(r.getAs[Double]("qerr_max") <= bound)
      // 64 dims each within half a step
      assert(r.getAs[Double]("qerr_l2") <= math.sqrt(64.0) * bound)
    }
  }

  test("plan shapes: narrow ops shuffle only for the presentation sort; topTerms is TakeOrdered") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def unwrapped(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case other => other
      }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      unwrapped(df).collect { case e: Exchange => e }.size
    // per-doc maps: at most the final orderBy exchange (none at all
    // when the scan is a single partition)
    assert(exchanges(Corpus.piiRedact(spark, sf0001)) <= 1)
    assert(exchanges(Corpus.gopherFilters(spark, sf0001)) <= 1)
    assert(exchanges(Corpus.trainSplit(spark, sf0001)) <= 1)
    assert(exchanges(Corpus.tokenChunks(spark, sf0001)) <= 1)
    assert(exchanges(Corpus.quantizeProfile(spark, sf0001)) <= 1)
    // top-K must be the distributed heap operator, never a global sort
    // or a single-partition window
    val top = Corpus.topTerms(spark, sf0001)
    assert(unwrapped(top).collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "topTerms must plan as TakeOrderedAndProject")
    // span dedup: span-hash agg + join + doc agg + sort — bounded at 4
    assert(exchanges(Corpus.spanDedup(spark, sf0001)) <= 4)
  }

  test("packSequences tiles each shard's token stream exactly") {
    val rows = Corpus.packSequences(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
      .foreach { case (_, docs) =>
        val ordered = docs.sortBy(_.getAs[Long]("doc_id"))
        var cum = 0L
        ordered.foreach { r =>
          val n = r.getAs[Long]("n_toks")
          // the doc starts exactly where the previous one ended
          assert(r.getAs[Long]("tok_offset") == cum % Corpus.SeqLen)
          assert(r.getAs[Long]("seq_first") == cum / Corpus.SeqLen)
          assert(r.getAs[Long]("seq_last") == (cum + n - 1) / Corpus.SeqLen)
          assert(r.getAs[Long]("seq_first") <= r.getAs[Long]("seq_last"))
          cum += n
        }
      }
  }

  test("packSequences windows are partitioned — never a global running sum") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Corpus.packSequences(spark, sf0001)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case other => other
      }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty,
        "packing window must be partitioned by the shard key"))
  }

  test("urlDedup canonical form collapses tracking variants and accounts for every doc") {
    val out = Corpus.urlDedup(spark, sf0001).collect()
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("n_fetches")).sum == total)
    out.foreach { r =>
      val u = r.getAs[String]("url")
      assert(!u.contains("utm_"), s"tracking params survived: $u")
      assert(!u.contains("#"), s"fragment survived: $u")
      assert(!u.contains(":443"), s"default port survived: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
      val host = u.replaceAll("^[a-z]+://", "").takeWhile(_ != '/')
      assert(host == host.toLowerCase, s"host not lowercased: $u")
      // doc_id % 50 collapses ≥ 2 docs per (source, path) at any sf
      assert(r.getAs[Long]("n_fetches") >= 1)
    }
    // canonicalization must actually merge: fewer URLs than docs
    assert(out.length < total)
  }

  test("corpusBuild: valid splits, unique hashes, eval stride excluded") {
    val rows = Corpus.corpusBuild(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.length < total, "every gate disabled?")
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
    val hashes = rows.map(_.getAs[String]("content_hash"))
    assert(hashes.distinct.length == hashes.length,
      "exact dedup must leave content hashes unique")
    assert(rows.forall(_.getAs[Long]("doc_id") %
      graft.operators.Dedup.EvalStride != 0),
      "eval-stride docs must not enter the training corpus")
    assert(rows.forall(_.getAs[Int]("n_words") > 0))
  }

  test("corpusBuild: shuffle anti-join fallback returns the broadcast branch's rows") {
    // broadcastCap = 0 forces the pathological-drop-list branch (the
    // 100 TB fallback when the contamination list outgrows a broadcast
    // table); both plans must agree row for row
    val broad = Corpus.corpusBuild(spark, sf0001).collect()
    val shuffled = Corpus.corpusBuild(spark, sf0001, broadcastCap = 0L).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
        r.getAs[Int]("n_words"), r.getAs[String]("content_hash"))
    assert(broad.map(key).toSeq == shuffled.map(key).toSeq,
      "anti-join branch choice changed the corpus")
  }

  test("gopher gate matches a hand computation on one doc") {
    val r = Corpus.gopherFilters(spark, sf0001)
      .filter(col("doc_id") === 0).collect().head
    val text = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val toks = text.toLowerCase.split(' ').filter(_.nonEmpty)
    assert(r.getAs[Int]("n_words") == toks.length)
    val mean = BigDecimal(toks.map(_.length).sum.toDouble / toks.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("mean_word_len") == mean)
    val nStop = toks.distinct.count(graft.operators.TextAnalysis.Stopwords.contains)
    assert(r.getAs[Int]("n_stopwords") == nStop)
    assert(r.getAs[Boolean]("gopher_pass") ==
      (toks.length >= Corpus.MinWords && toks.length <= Corpus.MaxWords &&
        mean >= Corpus.MinMeanWordLen && mean <= Corpus.MaxMeanWordLen &&
        r.getAs[Double]("alpha_frac") >= Corpus.MinAlphaFrac &&
        nStop >= Corpus.MinDistinctStopwords))
  }
}
