package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.WinnowIndex
import graft.sources.Tables

/** Scratch profiler for the WinnowIndex lifecycle (dev tool): times
  * build / merge / compact / query in isolation so the
  * dedup_winnow_incremental perf work targets the real phase cost
  * instead of guesses. */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32, "winnow-profile")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("docs count")(Tables.documents(spark, dir).count())

    val root = java.nio.file.Files
      .createTempDirectory("graft-winnow-profile").toString
    val idx = s"$root/idx"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    (1 to 2).foreach { pass =>
      time(s"pass$pass build (90%)")(WinnowIndex.build(
        docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 7), idx))
      time(s"pass$pass merge (10%)")(WinnowIndex.merge(
        docs.filter(col("doc_id") % 10 === 7), idx))
      time(s"pass$pass compact")(WinnowIndex.compact(spark, idx))
      time(s"pass$pass query (10%)")(WinnowIndex.query(
        spark, idx, docs.filter(col("doc_id") % 10 === 3)).count())
    }

    graft.operators.Scratch.rm(new java.io.File(root))

    (1 to 3).foreach { pass =>
      time(s"pass$pass entry incremental")(
        WinnowIndex.incremental(spark, dir).count())
      time(s"pass$pass entry lifecycle")(
        WinnowIndex.lifecycle(spark, dir).count())
      time(s"pass$pass mh incremental")(
        graft.operators.MinhashIndex.incremental(spark, dir).count())
      time(s"pass$pass mh lifecycle")(
        graft.operators.MinhashIndex.lifecycle(spark, dir).count())
      time(s"pass$pass mh ingestChain")(
        graft.operators.MinhashIndex.ingestChain(spark, dir).count())
      time(s"pass$pass pq lifecycle")(
        graft.operators.PqIndex.lifecycle(spark, dir).count())
      time(s"pass$pass ivf lifecycle")(
        graft.operators.IvfIndex.lifecycle(spark, dir).count())
      time(s"pass$pass stream sessionize")(
        graft.streaming.StatefulSessionize.streamSessionize(spark, dir)
          .count())
      time(s"pass$pass termstats incremental")(
        graft.operators.TermStatsIndex.incremental(spark, dir).count())
      time(s"pass$pass admission pipeline")(
        graft.operators.Admission.pipeline(spark, dir).count())
    }
    spark.stop()
  }
}
