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
    // mid-stream rewrite + ignoreChanges: the RESUMED consumer streams
    // the rewrite's re-materialized survivors (at-least-once; the
    // consumer dedups) — id 4's delete is not representable in an
    // append stream, it simply never re-delivers. Exactly Delta's
    // ignoreChanges contract. (Copy the pre-rewrite checkpoint+output
    // so the resume starts where the gated stream stood.)
    drain("lcat.db.rwfeed", s"$root/out2", s"$root/ckpt2")
    // … but ckpt2 was created AFTER the delete, so its bootstrap is the
    // post-delete snapshot: 9 rows, delivered once each
    val boot = spark.read.parquet(s"$root/out2")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(boot.keySet == (0L until 10L).toSet - 4L,
      "a fresh stream bootstraps from the CURRENT snapshot — the " +
        "deleted row must not appear, no ignoreChanges needed")
    assert(boot.values.forall(_ == 1L), s"snapshot rows deliver once: $boot")
    // now a SECOND delete lands mid-stream; the resumed ckpt2 consumer
    // needs ignoreChanges and re-receives the co-located survivors
    assert(GraftTable.deleteWhere(spark, root, "raw",
      col("id") === 6L).nonEmpty)
    val e2 = intercept[Exception](
      drain("lcat.db.rwfeed", s"$root/out2", s"$root/ckpt2"))
    assert(TestErrors.messageChain(e2).exists(_.contains("append-only")))
    drain("lcat.db.rwfeed", s"$root/out2", s"$root/ckpt2",
      Map("ignoreChanges" -> "true"))
    val counts = spark.read.parquet(s"$root/out2")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(!counts.contains(4L) && counts(6L) == 1L,
      s"deleted rows never re-deliver: $counts")
    // the second delete rewrote its containing files; every co-located
    // survivor re-delivers exactly once more
    assert(counts.count { case (id, n) => id != 6L && n == 2L } > 0,
      s"rewrite survivors must re-deliver, got $counts")
  }

  test("a fresh stream over a table with rewrite HISTORY bootstraps " +
       "from the snapshot — streamable without ignoreChanges") {
    wh
    val root = Files.createTempDirectory("graft-logstream-boot").toString
    commitBatch(root, 0L, 0L, 10L)
    assert(GraftTable.deleteWhere(spark, root, "raw",
      col("id") < 3L).nonEmpty)
    spark.sql("DROP TABLE IF EXISTS lcat.db.bootfeed")
    spark.sql("CREATE TABLE lcat.db.bootfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // the pre-stream DELETE is folded into the bootstrap snapshot: no
    // gate, no deleted rows, each survivor exactly once
    drain("lcat.db.bootfeed", s"$root/out", s"$root/ckpt")
    val got = spark.read.parquet(s"$root/out")
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      (3L until 10L))
    // tail continues incrementally after the bootstrap
    commitBatch(root, 99L, 100L, 105L)
    drain("lcat.db.bootfeed", s"$root/out", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/out").count() == 12L)
  }

  test("a lagging consumer whose planned files were removed from " +
       "storage gets the retention guidance error, not FileNotFound") {
    wh
    val root = Files.createTempDirectory("graft-logstream-ret").toString
    commitBatch(root, 0L, 0L, 10L)
    spark.sql("DROP TABLE IF EXISTS lcat.db.retfeed")
    spark.sql("CREATE TABLE lcat.db.retfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    drain("lcat.db.retfeed", s"$root/out", s"$root/ckpt")
    // a new version lands, a rewrite then REPLACES it in the snapshot,
    // and the superseded files are physically removed before the
    // lagging consumer catches up (an aggressive external retention
    // sweep — the in-tree vacuum keeps version-referenced files, so
    // this is how a history-only file disappears). The consumer's
    // offset predates the rewrite, so its next batch plans the deleted
    // files.
    commitBatch(root, 1L, 10L, 20L)
    val v1Files = GraftTable.history(spark, root)
      .find(_.batchId == 1L).get.files
    assert(GraftTable.deleteWhere(spark, root, "raw",
      col("id") >= 10L && col("id") < 12L).nonEmpty)
    val hfs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    v1Files.foreach(f => hfs.delete(
      new org.apache.hadoop.fs.Path(s"$root/$f"), false))
    val e = intercept[Exception](
      drain("lcat.db.retfeed", s"$root/out", s"$root/ckpt",
        Map("ignoreChanges" -> "true")))
    assert(TestErrors.messageChain(e).exists(_.contains("retention")),
      s"want the retention guidance error, got: ${TestErrors.messageChain(e)}")
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
    // it fresh — the bootstrap is the CURRENT (empty) snapshot, so the
    // row deleted before the stream existed is never delivered (the
    // pre-fix behavior replayed it from history)
    spark.sql("DROP TABLE IF EXISTS lcat.db.emptied")
    spark.sql("CREATE TABLE lcat.db.emptied USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'other')")
    assert(spark.sql("SELECT count(*) FROM lcat.db.emptied")
      .head.getLong(0) == 0L)
    drain("lcat.db.emptied", s"$root/out2", s"$root/ckpt2",
      Map("ignoreChanges" -> "true"))
    val out2 = new java.io.File(s"$root/out2")
    val streamed =
      if (out2.exists()) spark.read.parquet(s"$root/out2").count() else 0L
    assert(streamed == 0L,
      "a fresh stream over an emptied sink delivers NOTHING — its " +
        "snapshot is empty; history rows deleted pre-stream stay deleted")
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

  test("startingVersion / startingTimestamp place a fresh stream: " +
       "tail-from-version, tail-from-instant, latest-only") {
    wh
    val root = Files.createTempDirectory("graft-logstream-start").toString
    commitBatch(root, 0L, 0L, 10L)
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    commitBatch(root, 1L, 10L, 20L)
    commitBatch(root, 2L, 20L, 30L)
    spark.sql("DROP TABLE IF EXISTS lcat.db.startfeed")
    spark.sql("CREATE TABLE lcat.db.startfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // tail from version 1: v0's rows are never delivered
    drain("lcat.db.startfeed", s"$root/outv", s"$root/ckptv",
      Map("startingVersion" -> "1"))
    assert(spark.read.parquet(s"$root/outv")
      .select("id").as[Long].collect().sorted.toSeq == (10L until 30L))
    // tail from the between-commit instant: same cut, resolved by time
    drain("lcat.db.startfeed", s"$root/outt", s"$root/ckptt",
      Map("startingTimestamp" -> mid.toString))
    assert(spark.read.parquet(s"$root/outt")
      .select("id").as[Long].collect().sorted.toSeq == (10L until 30L))
    // latest: the first drain delivers nothing; commits after the
    // checkpoint exists arrive on the next drain
    drain("lcat.db.startfeed", s"$root/outl", s"$root/ckptl",
      Map("startingVersion" -> "latest"))
    assert(!new java.io.File(s"$root/outl").exists() ||
      spark.read.parquet(s"$root/outl").count() == 0L)
    commitBatch(root, 3L, 30L, 40L)
    drain("lcat.db.startfeed", s"$root/outl", s"$root/ckptl",
      Map("startingVersion" -> "latest"))
    assert(spark.read.parquet(s"$root/outl")
      .select("id").as[Long].collect().sorted.toSeq == (30L until 40L))
    // the two options are mutually exclusive
    val e = intercept[Exception](
      drain("lcat.db.startfeed", s"$root/oute", s"$root/ckpte",
        Map("startingVersion" -> "1", "startingTimestamp" -> "0")))
    assert(TestErrors.messageChain(e).exists(
      _.contains("mutually exclusive")))
  }

  test("maxFilesPerTrigger caps admission by file count; an over-cap " +
       "version still advances the stream") {
    wh
    val root = Files.createTempDirectory("graft-logstream-fcap").toString
    (0L until 4L).foreach(b => commitBatch(root, b, b * 10, b * 10 + 10))
    val perVersion = GraftTable.history(spark, root).head.files
      .count(_.startsWith("raw/"))
    assert(perVersion >= 1)
    spark.sql("DROP TABLE IF EXISTS lcat.db.fcapfeed")
    spark.sql("CREATE TABLE lcat.db.fcapfeed USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // budget for exactly two versions per trigger → 2 micro-batches
    drain("lcat.db.fcapfeed", s"$root/out", s"$root/ckpt",
      Map("maxFilesPerTrigger" -> (perVersion * 2).toString))
    val all = spark.read.parquet(s"$root/out")
    assert(all.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 40L))
    assert(all.select("b").distinct().count() == 2,
      "expected 2 file-capped micro-batches")
    // a cap below ONE version's file count: the first version always
    // admits (progress over starvation) → one version per batch
    drain("lcat.db.fcapfeed", s"$root/out1", s"$root/ckpt1",
      Map("maxFilesPerTrigger" -> "1"))
    val one = spark.read.parquet(s"$root/out1")
    assert(one.count() == 40L &&
      one.select("b").distinct().count() == 4,
      "an over-cap version must still advance, one version per batch")
  }
}
