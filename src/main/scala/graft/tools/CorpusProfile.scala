package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Corpus, Dedup}
import graft.sources.Tables

/** Scratch profiler for the corpusBuild composite (dev tool): times each
  * sub-plan in isolation so the fusion work targets the real cost.
  * `runMain graft.tools.CorpusProfile micro` runs the expression-level
  * microbench instead (is the cost the normalize/redact chain re-eval
  * or the gopher token math itself?). */
object CorpusProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32, "corpus-profile")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (args.headOption.contains("micro")) {
      micro(spark, dir); spark.stop(); return
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("docs count")(Tables.documents(spark, dir).count())

    time("contamCounts cold")(Dedup.contamCounts(spark, dir).count())
    time("contamCounts warm")(Dedup.contamCounts(spark, dir).count())

    val messy = Corpus.withSyntheticMess(col("text"), col("doc_id"))
    val norm = Corpus.normalizeTextCol(messy)
    val withPii = Corpus.withSyntheticPii(norm, col("doc_id"))
    time("scan+mess+normalize")(
      Tables.documents(spark, dir).select(col("doc_id"), norm.as("t"))
        .agg(sum(length(col("t")))).collect())
    time("  +pii redact")(
      Tables.documents(spark, dir).select(col("doc_id"),
          Corpus.piiRedactCol(withPii).getField("redacted").as("t"))
        .agg(sum(length(col("t")))).collect())
    val base = Tables.documents(spark, dir).select(col("doc_id"),
      Corpus.piiRedactCol(withPii).getField("redacted").as("t"))
    time("  +gopher gate")(
      base.filter(coalesce(Corpus.gopherCol(col("t"))
        .getField("gopher_pass"), lit(false))).count())
    val gated = base.filter(coalesce(Corpus.gopherCol(col("t"))
      .getField("gopher_pass"), lit(false)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"))
    time("  +window dedup")(
      gated.withColumn("h", md5(col("t")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .count())
    time("P1 single-task")(
      Tables.documents(spark, dir)
        .select(col("doc_id"), md5(col("text")).as("h"),
          graft.functions.tokens(
            Corpus.piiRedactCol(withPii).getField("redacted")).as("ts"))
        .agg(sum(size(col("ts")))).collect())
    time("P1 repartitioned-32")(
      Tables.documents(spark, dir).repartition(32)
        .select(col("doc_id"), md5(col("text")).as("h"),
          graft.functions.tokens(
            Corpus.piiRedactCol(withPii).getField("redacted")).as("ts"))
        .agg(sum(size(col("ts")))).collect())
    time("full corpusBuild (warm contam)")(
      Corpus.corpusBuild(spark, dir).count())
    time("full corpusBuild again")(
      Corpus.corpusBuild(spark, dir).count())

    spark.stop()
  }

  /** Expression-level microbench (formerly CorpusProfile2): isolates
    * whether cost sits in the normalize/redact chain re-evaluation or
    * the gopher token math. */
  private def micro(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Unit = {
    import graft.functions.tokens
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[micro] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
  }
}
