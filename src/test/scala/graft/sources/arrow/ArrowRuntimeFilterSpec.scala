package graft.sources.arrow

import java.nio.file.Files

import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.In
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime (join-side) filtering on the Arrow scan: a broadcast join's
  * build-side keys arrive as an IN-set AFTER planning, and zone maps
  * re-prune the file list at execution — the DSv2 contract that lets a
  * star-shape join scan only the shards that can hold surviving keys. */
class ArrowRuntimeFilterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("filter() re-prunes files with the same soundness law as " +
       "static pushdown") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-runtime-filter").toString
    (0L until 1000L).map(i => (i, i.toDouble, s"t$i", i % 2 == 0))
      .toDF("id", "d", "tag", "flag")
      .repartitionByRange(5, col("id"))
      .write.format("graft-arrow").mode("overwrite").save(out)
    val declared = spark.read.format("graft-arrow").load(out).schema
    def scan() = new ArrowScanBuilder(out, declared,
      new CaseInsensitiveStringMap(java.util.Map.of())).build()
    // zone-mapped columns are advertised — strings included (their
    // byte bounds prune IN-sets too); untracked (boolean) are not
    val attrs = scan().asInstanceOf[SupportsRuntimeFiltering]
      .filterAttributes().map(_.fieldNames().mkString(".")).toSet
    assert(attrs == Set("id", "d", "tag"))
    val full = scan().toBatch.planInputPartitions().length
    assert(full == 5, s"precondition: 5 files, got $full")
    // an IN-set landing in one file's range prunes to that file
    val s1 = scan()
    s1.asInstanceOf[SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](In("id", Array[Any](950L, 990L))))
    assert(s1.toBatch.planInputPartitions().length == 1)
    // every value provably out of range → zero partitions
    val s2 = scan()
    s2.asInstanceOf[SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](In("id", Array[Any](5000L, 6000L))))
    assert(s2.toBatch.planInputPartitions().length == 0)
    // a STRING IN-set provably outside every file's byte bounds
    // prunes everything — string join keys runtime-filter too
    val s4 = scan()
    s4.asInstanceOf[SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](In("tag", Array[Any]("zzz"))))
    assert(s4.toBatch.planInputPartitions().length == 0)
    // an unusable runtime filter keeps everything (sound degrade)
    val s3 = scan()
    s3.asInstanceOf[SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](In("flag", Array[Any](true))))
    assert(s3.toBatch.planInputPartitions().length == full)
  }

  test("a broadcast join's DPP filter reaches the scan and results " +
       "stay exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-runtime-join").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(5, col("id"))
      .write.format("graft-arrow").mode("overwrite").save(out)
    val dimDir = Files.createTempDirectory("graft-runtime-dim").toString
    (0L until 1000L).map(i => (i, i % 97)).toDF("id", "grp")
      .write.mode("overwrite").parquet(dimDir)
    // the injection heuristic needs a size estimate it believes in:
    // useStats=false routes it to the fallback filter ratio
    val before = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val fact = spark.read.format("graft-arrow").load(out)
      val dim = spark.read.parquet(dimDir).filter(col("grp") === 5)
      val joined = fact.join(broadcast(dim), "id")
      val rows = joined.collect()
      assert(rows.length == (0L until 1000L).count(_ % 97 == 5))
      // the executed scan must carry the injected runtime filter
      // (plan-string check: AQE nests the scan inside query stages
      // that plain collect() does not traverse)
      val plan = joined.queryExecution.executedPlan.toString
      val scanLine = plan.split('\n').find(_.contains("RuntimeFilters"))
      assert(scanLine.exists(l =>
        l.contains("RuntimeFilters: [") && !l.contains("RuntimeFilters: []")),
        s"no runtime filter reached the scan:\n$plan")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", before)
  }
}
