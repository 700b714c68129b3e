package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.tokens
import graft.operators.Corpus
import graft.sources.Tables

/** Component microbench: is the cost the normalize/redact chain re-eval
  * or the gopher token math itself? (dev tool) */
object CorpusProfile2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32, "corpus-profile2")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir)
    time("scan only")(docs.select(sum(length(col("text")))).collect())
    // warm each twice, report second
    for (round <- 1 to 2) {
      val tag = if (round == 2) " [warm]" else ""
      time(s"tokens size$tag")(
        docs.select(sum(size(tokens(col("text"))))).collect())
      time(s"gopher on raw text$tag")(
        docs.select(sum(size(tokens(col("text")))),
          count(when(Corpus.gopherCol(col("text"))
            .getField("gopher_pass"), 1))).collect())
      val messy = Corpus.withSyntheticMess(col("text"), col("doc_id"))
      val norm = Corpus.normalizeTextCol(messy)
      val withPii = Corpus.withSyntheticPii(norm, col("doc_id"))
      val t = Corpus.piiRedactCol(withPii).getField("redacted")
      time(s"chain only (md5)$tag")(
        docs.select(count(md5(t))).collect())
      time(s"chain + gopher$tag")(
        docs.select(count(md5(t)),
          count(when(Corpus.gopherCol(t).getField("gopher_pass"), 1)))
          .collect())
      time(s"chain + gopher + nwords$tag")(
        docs.select(count(md5(t)),
          count(when(Corpus.gopherCol(t).getField("gopher_pass"), 1)),
          sum(size(tokens(t)))).collect())
      val ts2 = tokens(t)
      time(s"P1 only (h+ts)$tag")(
        docs.select(col("doc_id"), md5(t).as("h"), ts2.as("ts"))
          .select(count(col("h")), sum(size(col("ts")))).collect())
      time(s"P1+P2 (gate from ts)$tag")(
        docs.select(col("doc_id"), md5(t).as("h"), ts2.as("ts"))
          .select(count(col("h")),
            count(when(Corpus.gopherFromTokens(col("ts"))
              .getField("gopher_pass"), 1)),
            sum(size(col("ts")))).collect())
      time(s"chain x3 separate cols$tag")(
        docs.select(count(md5(t)), count(md5(concat(t, lit("x")))),
          count(md5(concat(t, lit("y"))))).collect())
    }
    spark.stop()
  }
}
