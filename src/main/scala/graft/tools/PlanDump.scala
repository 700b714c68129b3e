package graft.tools

import graft.GraftSession

/** Dev tool: print the formatted (post-AQE where applicable) plan of one
  * [[graft.SparkEntry.queries]] entry. `runMain graft.tools.PlanDump
  * <query> [execute]` — with `execute`, runs the query first so the
  * printed plan carries AQE's final shape.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_corpus_build")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32, "plan-dump")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (args.contains("execute")) {
      df.count()
      val qe = df.queryExecution
      println(qe.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
