package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Dev tool: snapshot plans for a list of queries to files — the
  * judge-reviewable `plans/<round>/<query>_<suffix>.txt` artifacts.
  * Each file holds the pre-execution `explain("formatted")` plan AND
  * the post-execution physical plan (AQE's final shape: coalesced
  * reads, runtime join strategy).
  *
  * Usage: `runMain graft.tools.PlanSnap <outDir> <suffix> <q1,q2,...>`
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, qlist) = args.take(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus, "graft-plansnap")
    // keep materialized operators' full lazy plans visible (see
    // Materialize.PlanInspectConf) — without this every operator that
    // checkpoints its result collapses to `Scan ExistingRDD` and the
    // artifact shows nothing
    spark.conf.set("graft.plan.inspect", "true")
    new java.io.File(outDir).mkdirs()
    qlist.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val sb = new StringBuilder
      sb.append(s"== $name ($suffix) — explain(formatted), pre-execution ==\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      try {
        df.count()
        sb.append(s"\n== $name ($suffix) — executed plan (AQE final) ==\n")
        sb.append(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable =>
        sb.append(s"\nEXECUTION FAILED: ${e.getMessage}\n")
      }
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), sb.toString)
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
