package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the streaming export tree — the
  * maintenance counterpart of the micro-batch sink (each batch appends
  * part files per hour partition; a long-running job accumulates many
  * small files, the classic object-store read-amplification problem at
  * cluster scale).
  *
  * All file operations go through the Hadoop [[FileSystem]] API, so the
  * same code runs against local disk, HDFS, or an object store with an
  * HCFS connector.
  *
  * Crash safety — write, VERIFY, swap; never delete-before-move:
  *  1. compacted output is written to a dot-prefixed sibling directory
  *     (`.{leaf}.compacting`) that partition discovery ignores;
  *  2. the rewrite is verified (row count readback) and sealed with a
  *     `_VERIFIED` marker before anything visible changes;
  *  3. the swap is two directory renames (atomic on HDFS/local):
  *     `leaf → .{leaf}.old`, then `.{leaf}.compacting → leaf`, then the
  *     old directory is deleted.
  * A crash at any point leaves every row durable on disk: before the
  * swap the original directory is untouched; between the renames the
  * data lives in `.{leaf}.old` and [[recover]] (run automatically at the
  * start of every `compact`) promotes the verified rewrite or restores
  * the original.
  *
  * Streaming-export awareness: leaves written by
  * [[ExportParquet.writeBatch]] hold `batch_id=N` subdirectories; the
  * rewrite unit is then the hour directory and the merged output keeps a
  * single reserved `batch_id=-1` level so partition-discovery depth
  * stays consistent across compacted and uncompacted hours. Only compact
  * partitions the stream has finished writing (older than the pipeline's
  * replay horizon): replaying batch N after its directory was merged
  * away would re-create it.
  *
  * This operator serves PLAIN export trees (no commit log). Sinks
  * tracked by the transactional log compact through
  * [[graft.sources.GraftTable.compact]] instead, which publishes the
  * rewrite as a new version atomically, needs no rename-swap dance, and
  * keeps time travel to pre-compaction snapshots.
  */
object Compaction {

  private val CompactedBatchDir = s"${ExportParquet.BatchCol}=-1"
  private val Verified = "_VERIFIED"

  private def compactingPath(leaf: Path) =
    new Path(leaf.getParent, s".${leaf.getName}.compacting")
  private def oldPath(leaf: Path) =
    new Path(leaf.getParent, s".${leaf.getName}.old")

  /** Roll forward or back any swap a previous run left unfinished.
    * For every orphan `.X.old`: if `X` exists the swap completed (only
    * cleanup died) → drop the orphan; else promote `.X.compacting` when
    * it carries the `_VERIFIED` seal, otherwise restore the original.
    * Stray unverified/leftover `.X.compacting` dirs are removed. */
  def recover(fs: FileSystem, root: Path): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(dir: Path): Unit = {
      val entries = fs.listStatus(dir).filter(_.isDirectory)
      entries.foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(".") && name.endsWith(".old")) {
          val leafName = name.stripPrefix(".").stripSuffix(".old")
          val target = new Path(dir, leafName)
          val tmp = new Path(dir, s".$leafName.compacting")
          if (fs.exists(target)) {
            fs.delete(st.getPath, true)
            actions += s"cleaned $name"
          } else if (fs.exists(tmp) && fs.exists(new Path(tmp, Verified))) {
            fs.delete(new Path(tmp, Verified), false)
            fs.rename(tmp, target)
            fs.delete(st.getPath, true)
            actions += s"promoted $leafName"
          } else {
            fs.rename(st.getPath, target)
            if (fs.exists(tmp)) fs.delete(tmp, true)
            actions += s"restored $leafName"
          }
        } else if (name.startsWith(".") && name.endsWith(".compacting")) {
          val leafName = name.stripPrefix(".").stripSuffix(".compacting")
          if (fs.exists(new Path(dir, leafName))) {
            fs.delete(st.getPath, true)
            actions += s"cleaned $name"
          }
        } else if (!name.startsWith(".") && !name.startsWith("_")) {
          walk(st.getPath)
        }
      }
    }
    walk(root)
    actions.toSeq
  }

  /** Row count straight from the parquet footers — verification without
    * a Spark job per leaf. */
  private def footerRowCount(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                             files: Seq[Path]): Long =
    files.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum

  /** Returns (partitionPath, filesBefore, filesAfter) per rewritten
    * rewrite unit. Leaves rewrite concurrently (bounded pool): each
    * rewrite is an independent small Spark job + rename pair, so a
    * maintenance run over many partitions overlaps scheduling latency
    * instead of serializing it on the driver.
    */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              parallelism: Int = 8)
      : Seq[(String, Int, Int)] = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    recover(fs, rootPath)

    def parquetFilesUnder(dir: Path): Seq[Path] = {
      val it = fs.listFiles(dir, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
      }
      out.toSeq
    }

    // rewrite units: deepest visible dirs that hold parquet files either
    // directly or via batch_id= subdirectories
    def units(dir: Path): Seq[Path] = {
      val subs = fs.listStatus(dir).filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => !p.getName.startsWith(".") && !p.getName.startsWith("_"))
      val partSubs = subs.filter(_.getName.contains("="))
      if (partSubs.isEmpty) Seq(dir)
      else if (partSubs.forall(_.getName.startsWith(s"${ExportParquet.BatchCol}=")))
        Seq(dir) // hour dir over batch_id dirs: merge the whole hour
      else partSubs.toIndexedSeq.flatMap(units)
    }

    val leaves = units(rootPath).filter(_ != rootPath)
    def rewriteLeaf(leaf: Path): Option[(String, Int, Int)] = {
      val hasBatchDirs = fs.listStatus(leaf).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"${ExportParquet.BatchCol}="))
      val parts = parquetFilesUnder(leaf)
      if (parts.length <= 1) None
      else {
        val totalBytes = parts.map(p => fs.getFileStatus(p).getLen).sum
        val nOut = math.max(1, math.ceil(
          totalBytes.toDouble / targetFileBytes).toInt)
        if (nOut >= parts.length) None
        else {
          val tmp = compactingPath(leaf)
          if (fs.exists(tmp)) fs.delete(tmp, true)
          // 1. write the rewrite to an invisible sibling
          val df = spark.read.parquet(leaf.toString)
          val data = if (hasBatchDirs) df.drop(ExportParquet.BatchCol) else df
          val writeDir = if (hasBatchDirs) new Path(tmp, CompactedBatchDir) else tmp
          data.coalesce(nOut).write
            .option("compression", "zstd")
            .mode("overwrite").parquet(writeDir.toString)
          // 2. verify from the parquet footers (no extra Spark jobs),
          //    then seal
          val rewritten = footerRowCount(fs, conf, parquetFilesUnder(writeDir))
          val original = footerRowCount(fs, conf, parts)
          require(rewritten == original,
            s"compaction rewrite of $leaf lost rows: $rewritten != $original")
          fs.create(new Path(tmp, Verified), true).close()
          // 3. swap: two renames, delete last
          val old = oldPath(leaf)
          if (fs.exists(old)) fs.delete(old, true)
          fs.rename(leaf, old)
          fs.delete(new Path(tmp, Verified), false)
          fs.rename(tmp, leaf)
          fs.delete(old, true)
          Some((leaf.toString, parts.length, nOut))
        }
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, leaves.length)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = leaves.map(l => scala.concurrent.Future(rewriteLeaf(l)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).flatten
    } finally pool.shutdown()
  }
}
