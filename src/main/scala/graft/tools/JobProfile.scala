package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{GraftSession, SparkEntry}

/** Per-job wall-time profile of one [[SparkEntry.queries]] entry (dev
  * tool): runs the named query twice (cold, then warm with memos
  * populated) and prints every Spark job's duration and call site —
  * the fastest way to see whether a slow query is data-bound or
  * job-count-bound (each local job carries a ~0.1–0.3 s scheduling
  * floor).
  *
  * Usage: `runMain graft.tools.JobProfile <queryName> [sfDir]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: JobProfile <query> [sfDir]"))
    val dir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus, "graft-jobprofile")
    val starts = mutable.Map.empty[Int, (Long, String)]
    val jobs = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          jobs += ((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
    })
    // session warmup (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { round =>
      jobs.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"[jobprofile] $name round $round: $n rows, $total%.2f s, ${jobs.size} jobs")
      jobs.sortBy(_._1).foreach { case (id, sec, desc) =>
        println(f"[jobprofile]   job $id%3d  $sec%6.2f s  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
