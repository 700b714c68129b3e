package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the streaming export tree — the
  * maintenance counterpart of the micro-batch sink (each batch appends
  * part files per hour partition; a long-running job accumulates many
  * small files, the classic object-store read-amplification problem at
  * cluster scale).
  *
  * Rewrites each hive partition's files into ~`targetFileBytes` outputs
  * using a size-derived file count, preserving the partition layout.
  * The rewrite is per-partition-directory and idempotent; a production
  * deployment would swap directories atomically (or use a table format
  * with transactional rewrite); here the committed-then-replace move is
  * kept simple and local.
  */
object Compaction {

  /** Returns (partitionPath, filesBefore, filesAfter) per rewritten
    * partition directory. */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[(String, Int, Int)] = {
    val base = new java.io.File(root)
    def leafPartitions(dir: java.io.File): Seq[java.io.File] = {
      val subs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
      if (subs.isEmpty) Seq(dir)
      else subs.toSeq.flatMap(leafPartitions)
    }
    val leaves = leafPartitions(base).filter(_ != base)
    leaves.flatMap { leaf =>
      val parts = Option(leaf.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
      if (parts.length <= 1) None
      else {
        val totalBytes = parts.map(_.length()).sum
        val nOut = math.max(1, math.ceil(
          totalBytes.toDouble / targetFileBytes).toInt)
        if (nOut >= parts.length) None
        else {
          val df = spark.read.parquet(leaf.toString)
          val tmp = leaf.toString + ".compacting"
          df.coalesce(nOut).write
            .option("compression", "zstd")
            .mode("overwrite").parquet(tmp)
          parts.foreach(_.delete())
          Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
            .filter(f => f.getName.endsWith(".parquet"))
            .foreach(f => java.nio.file.Files.move(
              f.toPath, new java.io.File(leaf, f.getName).toPath))
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(tmp))
          Some((leaf.toString, parts.length, nOut))
        }
      }
    }
  }
}
