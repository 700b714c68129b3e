package graft.operators

import org.apache.spark.sql.DataFrame

/** Scratch-dir lifecycle for oracle-harness queries that build state on
  * disk (table verbs, interchange exports, streaming sinks): collect
  * the report-sized result FIRST — the returned frame must outlive the
  * scratch tree — then delete the tree in `finally`, so a failing
  * materialization cannot leak temp dirs across a long harness run.
  * Harness-only shape: a production operator returns the lazy plan and
  * leaves storage lifecycle to the caller.
  */
object Scratch {

  def materializeAndClean(root: String, df: DataFrame): DataFrame =
    try {
      val rows = df.collect()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
    } finally rm(new java.io.File(root))

  def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }
}
