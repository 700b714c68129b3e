package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Streaming read over the GraftTable commit log via catalog-named
  * tables: version-id offsets, incremental resume, append-only
  * enforcement with the ignoreChanges escape hatch, admission capping —
  * the Delta-streaming-source analog. */
class GraftLogStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-logstream-wh").toString
    spark.conf.set("spark.sql.catalog.lcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lcat.db")
    dir
  }

  private def commitBatch(root: String, b: Long, lo: Long, hi: Long): Unit = {
    (lo until hi).map(i => (i, s"v$i", if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "v", "lang")
      .withColumn("batch_id", lit(b))
      .repartition(col("lang"))
      .write.mode("append").partitionBy("lang", "batch_id")
      .parquet(s"$root/raw")
    GraftTable.commit(spark, root, b)
    ()
  }

  private def drain(table: String, out: String, ckpt: String,
                    extraOpts: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream
    extraOpts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.table(table)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.withColumn("b", lit(id))
            .write.mode("append").parquet(out)
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("versions stream incrementally; resume reads only new commits; " +
       "partition columns ride along") {
    wh
    val root = Files.createTempDirectory("graft-logstream").toString
    commitBatch(root, 0L, 0L, 10L)
    commitBatch(root, 1L, 10L, 20L)
    spark.sql("DROP TABLE IF EXISTS lcat.db.feed")
    spark.sql("CREATE TABLE lcat.db.feed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    drain("lcat.db.feed", out, ckpt)
    val first = spark.read.parquet(out)
    assert(first.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 20L))
    // partition columns (lang) come through the streamed rows
    assert(first.where(col("lang") === "en").count() == 10L)
    // a later commit lands; the SAME checkpoint reads ONLY it
    commitBatch(root, 2L, 20L, 30L)
    drain("lcat.db.feed", out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 30L), "resume must read exactly the new version")
    // no version was read twice: per-id row counts are all 1
    assert(all.groupBy("id").count().where(col("count") > 1).count() == 0)
  }

  test("a rewrite version fails the stream by default; ignoreChanges " +
       "streams the re-materialized survivors") {
    wh
    val root = Files.createTempDirectory("graft-logstream-rw").toString
    commitBatch(root, 0L, 0L, 10L)
    spark.sql("DROP TABLE IF EXISTS lcat.db.rwfeed")
    spark.sql("CREATE TABLE lcat.db.rwfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    drain("lcat.db.rwfeed", s"$root/out", s"$root/ckpt")
    // a row-level DELETE publishes a rewrite version
    assert(GraftTable.deleteWhere(spark, root, "raw",
      col("id") === 4L).nonEmpty)
    val e = intercept[Exception](
      drain("lcat.db.rwfeed", s"$root/out", s"$root/ckpt"))
    assert(TestErrors.messageChain(e).exists(_.contains("append-only")),
      "a rewrite version must fail the stream loudly")
    // ignoreChanges: survivors of the rewritten files RE-deliver
    // (at-least-once; the consumer dedups). The DELETE itself is not
    // representable in an append stream — id 4 was delivered by
    // version 0 and simply never re-delivered, exactly Delta's
    // ignoreChanges contract.
    drain("lcat.db.rwfeed", s"$root/out2", s"$root/ckpt2",
      Map("ignoreChanges" -> "true"))
    val counts = spark.read.parquet(s"$root/out2")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until 10L).toSet)
    assert(counts(4L) == 1L, "the deleted row must not re-deliver")
    // the delete rewrote its containing files; every co-located
    // survivor re-delivers exactly once more
    assert(counts.count { case (id, n) => id != 4L && n == 2L } > 0,
      s"rewrite survivors must re-deliver, got $counts")
  }

  test("the path-based format(\"graft-log\") spelling reads and " +
       "streams without a catalog") {
    val root = Files.createTempDirectory("graft-logfmt").toString
    commitBatch(root, 0L, 0L, 10L)
    // uncommitted debris is invisible, exactly like the named table
    Seq((99L, "x", "en")).toDF("id", "v", "lang")
      .withColumn("batch_id", lit(7L))
      .write.mode("append").partitionBy("lang", "batch_id")
      .parquet(s"$root/raw")
    val batch = spark.read.format("graft-log")
      .option("sink", "raw").load(root)
    assert(batch.count() == 10L)
    // filters still push through the delegation
    assert(batch.where(col("id") === 3L).count() == 1L)
    // streaming spelling
    val q = spark.readStream.format("graft-log").option("sink", "raw")
      .load(root)
      .writeStream.format("memory").queryName("logfmt")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-logfmt-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM logfmt").head.getLong(0) == 10L)
    // a missing sink option fails loudly
    val e = intercept[Exception](
      spark.read.format("graft-log").load(root).count())
    assert(TestErrors.messageChain(e).exists(_.contains("sink")))
  }

  test("a rewrite on a SIBLING sink does not wedge the stream; an " +
       "emptied sink stays streamable") {
    wh
    val root = Files.createTempDirectory("graft-logstream-sib").toString
    commitBatch(root, 0L, 0L, 10L)
    // sibling sink 'other' gets its own commit + a row-level DELETE
    Seq((100L, "x")).toDF("id", "v")
      .withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$root/other")
    GraftTable.commit(spark, root, 1L)
    assert(GraftTable.deleteWhere(spark, root, "other",
      col("id") === 100L).nonEmpty)
    spark.sql("DROP TABLE IF EXISTS lcat.db.sib")
    spark.sql("CREATE TABLE lcat.db.sib USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // 'raw' is append-only even though the ROOT now has a rewrite
    // version (it removed only other/ files) — the stream must drain
    drain("lcat.db.sib", s"$root/out", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/out").count() == 10L)
    // an EMPTIED sink (schema recorded, zero files) still resolves
    // with MICRO_BATCH_READ: register 'other' post-delete and stream
    // it with ignoreChanges (its history contains the rewrite)
    spark.sql("DROP TABLE IF EXISTS lcat.db.emptied")
    spark.sql("CREATE TABLE lcat.db.emptied USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'other')")
    assert(spark.sql("SELECT count(*) FROM lcat.db.emptied")
      .head.getLong(0) == 0L)
    drain("lcat.db.emptied", s"$root/out2", s"$root/ckpt2",
      Map("ignoreChanges" -> "true"))
    // the one row streamed from version 1 (before its deletion);
    // the delete's rewrite added no survivors
    assert(spark.read.parquet(s"$root/out2").count() == 1L)
  }

  test("maxVersionsPerTrigger caps each micro-batch; AvailableNow " +
       "still drains to its pinned target") {
    wh
    val root = Files.createTempDirectory("graft-logstream-cap").toString
    (0L until 4L).foreach(b => commitBatch(root, b, b * 10, b * 10 + 10))
    spark.sql("DROP TABLE IF EXISTS lcat.db.capfeed")
    spark.sql("CREATE TABLE lcat.db.capfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    drain("lcat.db.capfeed", s"$root/out", s"$root/ckpt",
      Map("maxVersionsPerTrigger" -> "1"))
    val all = spark.read.parquet(s"$root/out")
    assert(all.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 40L))
    // the cap split the drain into one micro-batch per version
    assert(all.select("b").distinct().count() == 4,
      "expected 4 capped micro-batches")
  }
}
