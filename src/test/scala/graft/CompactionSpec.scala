package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, ExportParquet}
import graft.sources.Tables

/** Compaction: many small part files per hive partition → few, with
  * identical data readback. */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("compacts multi-file partitions preserving data and layout") {
    val out = Files.createTempDirectory("graft-compact").toString
    val ev = Tables.events(spark, sf0001)
    // write twice (append) so every partition has ≥ 2 files
    (1 to 2).foreach { _ =>
      ExportParquet.write(
        ExportParquet.withPartitionCols(
          ev, unix_millis(col("ts").cast("timestamp"))),
        out)
    }
    val before = spark.read.parquet(out)
    val beforeCount = before.count()
    val beforePartitions =
      before.select("year", "month", "day", "hour").distinct().count()
    assert(beforeCount == 2 * ev.count())

    val results = Compaction.compact(spark, out)
    assert(results.nonEmpty, "expected at least one compacted partition")
    results.foreach { case (_, nBefore, nAfter) =>
      assert(nAfter < nBefore)
    }

    val after = spark.read.parquet(out)
    assert(after.count() == beforeCount)
    // layout preserved: partition columns still readable
    assert(after.select("year", "month", "day", "hour").distinct().count() ==
      beforePartitions)
  }

  test("streaming batch tree: batch_id dirs merge into one compacted dir") {
    val out = Files.createTempDirectory("graft-compact-batch").toString
    // one day of events → a few dozen hour partitions, keeps the test fast
    val ev = ExportParquet.withPartitionCols(
      Tables.events(spark, sf0001).filter(dayofmonth(col("ts")) === 1),
      unix_millis(col("ts").cast("timestamp")))
    (0L to 3L).foreach(b => ExportParquet.writeBatch(ev, out, b))
    val beforeCount = spark.read.parquet(out).count()
    assert(beforeCount == 4 * Tables.events(spark, sf0001)
      .filter(dayofmonth(col("ts")) === 1).count())

    val results = Compaction.compact(spark, out)
    assert(results.nonEmpty)

    val after = spark.read.parquet(out)
    assert(after.count() == beforeCount)
    // every compacted hour collapsed to the reserved batch dir, and the
    // partition depth stayed consistent (read succeeds tree-wide)
    val batchIds = after.select("batch_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(batchIds == Set(-1))
  }

  test("crash mid-swap: recover promotes a verified rewrite or restores") {
    import org.apache.hadoop.fs.Path
    val out = Files.createTempDirectory("graft-compact-crash").toString
    val ev = ExportParquet.withPartitionCols(
      Tables.events(spark, sf0001).filter(dayofmonth(col("ts")) === 1),
      unix_millis(col("ts").cast("timestamp")))
    (1 to 2).foreach(_ => ExportParquet.write(ev, out))
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    val beforeCount = spark.read.parquet(out).count()

    val leaves = fs.listFiles(new Path(out), true)
    var leaf: Path = null
    while (leaves.hasNext) {
      val f = leaves.next().getPath
      if (f.getName.endsWith(".parquet")) leaf = f.getParent
    }
    val leafCount = spark.read.parquet(leaf.toString).count()

    // crash window A: old moved aside, VERIFIED rewrite staged → promote
    val tmpA = new Path(leaf.getParent, s".${leaf.getName}.compacting")
    spark.read.parquet(leaf.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmpA.toString)
    fs.create(new Path(tmpA, "_VERIFIED"), true).close()
    fs.rename(leaf, new Path(leaf.getParent, s".${leaf.getName}.old"))
    assert(!fs.exists(leaf))
    Compaction.compact(spark, out) // recover() runs first
    assert(fs.exists(leaf), "verified rewrite must be promoted")
    assert(spark.read.parquet(out).count() == beforeCount)
    assert(spark.read.parquet(leaf.toString).count() == leafCount)

    // crash window B: old moved aside, rewrite NOT verified → restore
    val tmpB = new Path(leaf.getParent, s".${leaf.getName}.compacting")
    spark.read.parquet(leaf.toString).limit(1)
      .write.mode("overwrite").parquet(tmpB.toString) // bogus partial
    fs.rename(leaf, new Path(leaf.getParent, s".${leaf.getName}.old"))
    Compaction.compact(spark, out)
    assert(fs.exists(leaf), "unverified rewrite must restore the original")
    assert(spark.read.parquet(out).count() == beforeCount)
    assert(spark.read.parquet(leaf.toString).count() == leafCount)
  }
}
