package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's parquet COPY sink re-expressed as a partitioned write
  * (SURVEY §2.B B17/B18; /root/reference/main.go:101-125): zstd, 100 MB
  * row groups, hive layout `year=Y/month=M/day=D/hour=H`. One
  * `partitionBy` write replaces the reference's whole
  * partition-discovery → per-partition templated COPY loop; its
  * `{{rand}}` filenames + OVERWRITE_OR_IGNORE ≈ append of uniquely
  * named part files.
  *
  * Scale: batch writes ([[writeBatch]]) use dynamic partition overwrite
  * keyed by `batch_id` for replay idempotence; plain [[write]] keeps
  * append semantics. The write parallelism is the upstream
  * partitioning — repartition by the partition columns first when
  * writing many hours at once so each task writes few files (avoids
  * the many-small-files failure mode at 1000 executors).
  */
object ExportParquet {

  val PartitionCols: Seq[String] = Seq("year", "month", "day", "hour")

  /** Derive the reference's four partition columns from an epoch-millis
    * column (the `datepart(..., epoch_ms(...))` pattern of the export
    * queries, main.go:105-108,120-123). */
  def withPartitionCols(df: DataFrame, epochMs: Column): DataFrame = {
    val ts = timestamp_millis(epochMs)
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
      .withColumn("hour", hour(ts))
  }

  def write(df: DataFrame, path: String,
            coalescePartitions: Boolean = true): Unit = {
    val out =
      if (coalescePartitions)
        df.repartition(PartitionCols.map(col): _*)
      else df
    out.write
      .partitionBy(PartitionCols: _*)
      .option("compression", "zstd")
      .option("parquet.block.size", 100000000)
      .mode("append")
      .parquet(path)
  }

  /** Partition directory for replay-idempotent streaming writes. */
  val BatchCol = "batch_id"

  /** Exactly-once batch export for the streaming sinks: the micro-batch
    * id becomes the innermost partition directory and the write runs in
    * DYNAMIC partition-overwrite mode, so it replaces exactly the
    * `.../batch_id=N` directories its own data maps to and nothing
    * else. A checkpoint replay of batch N (crash anywhere between the
    * two sink writes, or between write and checkpoint commit) rewrites
    * the same directories instead of appending duplicates — the commit
    * protocol the reference approximates with OVERWRITE_OR_IGNORE +
    * `{{rand}}` names (/root/reference/main.go:108,125). Readers prune
    * on year/month/day/hour exactly as before; `batch_id` surfaces as
    * one more discoverable column.
    */
  def writeBatch(df: DataFrame, path: String, batchId: Long,
                 coalescePartitions: Boolean = true): Unit = {
    val out =
      if (coalescePartitions)
        df.repartition(PartitionCols.map(col): _*)
      else df
    out.withColumn(BatchCol, lit(batchId))
      .write
      .partitionBy((PartitionCols :+ BatchCol): _*)
      .option("compression", "zstd")
      .option("parquet.block.size", 100000000)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
  }
}
