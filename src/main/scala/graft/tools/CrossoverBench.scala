package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Measures the exact-broadcast vs Bloom-prefilter decontamination
  * crossover (dev tool): at the oracle SFs the eval set is a few
  * thousand shingles and the broadcast join wins outright, so the Bloom
  * path's reason to exist — an eval set too large to broadcast — is
  * otherwise unexercised. This harness grows a synthetic eval set until
  * the crossover is visible and prints min-of-2 timings per size.
  *
  * Corpus docs deliberately share a small vocabulary slice with the
  * eval set (~matching rate of the real operator); eval docs are
  * near-unique so the distinct shingle frame grows linearly.
  */
object CrossoverBench {

  private def docs(spark: SparkSession, n: Int, prefix: String,
                   vocab: Int): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 40).map(j =>
          concat(lit(prefix),
            ((col("id") * 40 + j) % vocab).cast("string"))): _*)
        .as("text"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus, "graft-crossover")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val corpus = docs(spark, 20000, "w", 400000).cache()
    corpus.count()
    def time(f: => Long): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    println("[crossover] evalDocs evalShingles exactSec bloomSec")
    Seq(2000, 20000, 100000, 300000).foreach { ne =>
      // eval docs draw from a disjoint, much larger vocabulary so the
      // distinct shingle count scales with ne; a slice overlaps the
      // corpus vocabulary so matches exist
      val evalDocs = docs(spark, ne, "w", 40 * ne)
      val evalSh = Dedup.shinglesOf(evalDocs)
        .select(explode(col("sh")).as("s")).distinct().cache()
      val nSh = evalSh.count()
      val words = Dedup.bloomBuild(evalSh, "s", Dedup.bloomBitsFor(nSh))
      val exact = time(Dedup.decontaminateFrames(corpus, evalSh).count())
      val bloom = time(
        Dedup.decontaminateBloomFrames(corpus, evalSh, words).count())
      println(f"[crossover] $ne%8d $nSh%12d $exact%8.2f $bloom%8.2f")
      evalSh.unpersist()
    }
    spark.stop()
  }
}
