package graft.tools

import graft.{GraftSession, SparkEntry}

/** Replica of the driver's smoke gate: entry() must return rows (dev
  * tool). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(8, "entry-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
