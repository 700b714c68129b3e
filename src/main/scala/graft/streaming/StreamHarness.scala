package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the bounded streaming harnesses. */
private[graft] object StreamHarness {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value afterwards. The bounded harness
    * streams want a handful of state-store partitions, not the
    * session's 32: per-batch state commit cost scales with partitions ×
    * batches, and a harness stream holds only harness-sized state. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
