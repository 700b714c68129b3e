package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Phase timing for dedup_semantic (dev tool). */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32, "sem-profile")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("embeddings scan")(Tables.embeddings(spark, dir).count())
    for (round <- 1 to 3) {
      Similarity.clearCentsMemo()
      time(s"r$round full dedup_semantic")(
        Similarity.semanticDedup(spark, dir).count())
      time(s"r$round warm-model rerun")(
        Similarity.semanticDedup(spark, dir).count())
      time(s"r$round sim_kmeans warm")(
        Similarity.kmeans(spark, dir).count())
    }
    spark.stop()
  }
}
