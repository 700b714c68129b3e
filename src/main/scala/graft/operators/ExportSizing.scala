package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared part-sizing policy for the interchange exports ([[Jsonl]],
  * [[ArrowInterchange]]): one exported part per partition, so the
  * frame is repartitioned UP when Catalyst's size estimate says a
  * partition would exceed the per-part byte cap — the cap is the read
  * parallelism contract for whole-file formats. Never repartitions
  * DOWN: a frame already wider than the target keeps its layout.
  */
private[graft] object ExportSizing {

  /** Max estimated (uncompressed) bytes of row data per exported part —
    * one comfortable read task. The single definition both exporters
    * alias, so the "same contract" claim can't silently diverge. */
  val DefaultMaxPartBytes: Long = 128L << 20

  /** Any estimate this large is Catalyst saying "no idea": leaves
    * without statistics (LogicalRDD, memory streams) report the
    * `spark.sql.defaultSizeInBytes` sentinel (Long.MaxValue ≈ 8 EiB),
    * and derived plans scale it — a projection can bring it well BELOW
    * the sentinel while still being garbage. 1 PiB is safely above any
    * real single-call export (the part cap tops out at 2^20 parts ×
    * 128 MiB = 128 TiB) and safely below the sentinel's plausible
    * scaled-down shadows. Trusting the sentinel once cost a spec run
    * 2^20 one-row tasks. */
  private val UnknownEstimate = BigInt(1L << 50)

  /** Number of partitions `df` will be written with under
    * `maxPartBytes`-sized parts. */
  def sizeUp(df: DataFrame, maxPartBytes: Long): DataFrame = {
    val plan = df.queryExecution.optimizedPlan
    // The size-only stats visitor MULTIPLIES child sizes through a
    // join, so a 2 MB⋈0.5 MB join "weighs" a terabyte and would fan a
    // 2000-row export into thousands of empty parts. An export can't
    // outweigh what its scans read (modulo explode, which inflates the
    // leaf sum's direction too, just honestly), so bound the output
    // estimate by the leaf sum — real file statistics joins can't
    // inflate. Filters/projections keep the smaller output estimate.
    val leafSum = plan.collectLeaves().map(_.stats.sizeInBytes).sum
    val est = plan.stats.sizeInBytes.min(leafSum)
    // current width from the physical plan's own partitioning when it
    // knows it; scans and unexecuted AQE plans report
    // UnknownPartitioning(0), and only then do we pay the df.rdd
    // instantiation to count
    val planned =
      df.queryExecution.executedPlan.outputPartitioning.numPartitions
    val current = if (planned > 0) planned else df.rdd.getNumPartitions
    val wanted =
      if (est >= UnknownEstimate) current
      else (est / maxPartBytes + 1).min(BigInt(1 << 20)).toInt
    if (current >= wanted) df else df.repartition(wanted)
  }
}
