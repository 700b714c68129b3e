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
  * Scale: dynamic partition overwrite is not needed (append semantics);
  * the write parallelism is the upstream partitioning — repartition by
  * the partition columns first when writing many hours at once so each
  * task writes few files (avoids the many-small-files failure mode at
  * 1000 executors).
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
}
