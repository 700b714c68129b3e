package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** WRITES into named commit-log tables: INSERT INTO / INSERT OVERWRITE
  * through the V1 fallback, writeStream.toTable through per-task
  * parquet writers — every write one published version, idempotent
  * under checkpoint replay, partition layout preserved. The
  * reference's core loop is append-to-named-destination-table
  * (main.go:255); this is its SQL/stream spelling. */
class GraftLogWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-logwrite-wh").toString
    spark.conf.set("spark.sql.catalog.wcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wcat.db")
    dir
  }

  private def seed(root: String, lo: Long, hi: Long, b: Long = 0L): Unit = {
    (lo until hi).map(i => (i, s"v$i", if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "v", "lang")
      .withColumn("batch_id", lit(b))
      .repartition(col("lang"))
      .write.mode("append").partitionBy("lang", "batch_id")
      .parquet(s"$root/raw")
    GraftTable.commit(spark, root, b)
    ()
  }

  test("INSERT INTO a named log table publishes one version, keeps the " +
       "partition layout, and is visible to both the named table and " +
       "the path API") {
    wh
    val root = Files.createTempDirectory("graft-logwrite-ins").toString
    seed(root, 0L, 10L)
    spark.sql("DROP TABLE IF EXISTS wcat.db.t")
    spark.sql("CREATE TABLE wcat.db.t USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // batch_id is commit-log metadata, not a table column
    assert(!spark.table("wcat.db.t").columns.contains("batch_id"))
    val before = GraftTable.versions(spark, root).size
    spark.sql("INSERT INTO wcat.db.t VALUES " +
      "(100, 'x', 'en'), (101, 'y', 'fr'), (102, 'z', 'en')")
    assert(GraftTable.versions(spark, root).size == before + 1,
      "one INSERT = one published version")
    assert(spark.sql("SELECT count(*) FROM wcat.db.t").head.getLong(0) == 13L)
    // the path API sees the same rows, with batch_id lineage intact
    val byPath = GraftTable.read(spark, root, "raw")
    assert(byPath.count() == 13L)
    val newId = GraftTable.versions(spark, root).max
    assert(byPath.where(col("batch_id") === newId).count() == 3L,
      "appended rows carry the published version as batch_id")
    // the sink's hive layout survived: lang=…/batch_id=N directories
    assert(byPath.where(col("lang") === "en" && col("id") >= 100L)
      .count() == 2L)
    // the change feed tags the append as a plain insert
    val feed = GraftTable.readChanges(spark, root, "raw", newId - 1)
    assert(feed.where(col("_change_type") === "insert").count() == 3L)
    // uncommitted staging debris never leaks into reads
    assert(spark.sql("SELECT count(*) FROM wcat.db.t").head.getLong(0) == 13L)
  }

  test("INSERT OVERWRITE truncates atomically; time travel still sees " +
       "the pre-overwrite snapshot") {
    wh
    val root = Files.createTempDirectory("graft-logwrite-ovw").toString
    seed(root, 0L, 10L)
    spark.sql("DROP TABLE IF EXISTS wcat.db.ovw")
    spark.sql("CREATE TABLE wcat.db.ovw USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    val preVersion = GraftTable.versions(spark, root).max
    spark.sql("INSERT OVERWRITE wcat.db.ovw VALUES (7, 'q', 'en')")
    assert(spark.sql("SELECT id, v, lang FROM wcat.db.ovw")
      .as[(Long, String, String)].collect().toSeq == Seq((7L, "q", "en")))
    // the replaced snapshot stays addressable
    assert(GraftTable.readAsOf(spark, root, "raw", preVersion)
      .count() == 10L)
    // and the overwrite is a REWRITE version: a resumed stream gates
    val hist = GraftTable.history(spark, root)
    assert(hist.last.removed.nonEmpty,
      "INSERT OVERWRITE must publish the prior snapshot as removed")
  }

  test("writeStream.toTable appends one txn-stamped version per epoch; " +
       "a replayed epoch (checkpoint recovery) does not double-commit") {
    wh
    val root = Files.createTempDirectory("graft-logwrite-stream").toString
    seed(root, 0L, 4L)
    spark.sql("DROP TABLE IF EXISTS wcat.db.st")
    spark.sql("CREATE TABLE wcat.db.st USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    val srcDir = Files.createTempDirectory("graft-logwrite-src").toString
    val ckpt = Files.createTempDirectory("graft-logwrite-ckpt").toString
    Seq((200L, "s0", "en"), (201L, "s1", "fr")).toDF("id", "v", "lang")
      .write.mode("append").parquet(srcDir)
    def run(): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, v STRING, lang STRING")
        .parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("wcat.db.st")
      q.awaitTermination()
      // the manager deregisters asynchronously; a back-to-back restart
      // on the same checkpoint races its "concurrent use" guard
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
             System.nanoTime() < deadline) Thread.sleep(50)
    }
    run()
    assert(spark.sql("SELECT count(*) FROM wcat.db.st").head.getLong(0) == 6L)
    val hist1 = GraftTable.history(spark, root)
    assert(hist1.last.txn.isDefined, "epoch versions carry a txn marker")
    // partitioned layout preserved by the per-task writers: the new
    // rows live under lang=… directories and read back partition-typed
    val byPath = GraftTable.read(spark, root, "raw")
    assert(byPath.where(col("id") === 200L && col("lang") === "en")
      .count() == 1L)
    // REPLAY: drop the sink-side commit record of the last epoch so a
    // restart re-runs it (the classic crash window: epoch ran, sink
    // published, checkpoint commit was never written)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    commits.sortBy(_.getName.toLong).lastOption.foreach { f =>
      f.delete()
      // the local FS keeps a CRC sidecar; the replay's re-write renames
      // onto it
      new java.io.File(f.getParent, s".${f.getName}.crc").delete()
    }
    run()
    assert(spark.sql("SELECT count(*) FROM wcat.db.st").head.getLong(0) == 6L,
      "a replayed epoch must find its txn marker and skip")
    assert(GraftTable.history(spark, root).size == hist1.size,
      "no second version for the replayed epoch")
    // new data afterwards still streams: the replay skip is per-epoch
    Seq((202L, "s2", "en")).toDF("id", "v", "lang")
      .write.mode("append").parquet(srcDir)
    run()
    assert(spark.sql("SELECT count(*) FROM wcat.db.st").head.getLong(0) == 7L)
    // streaming a table fed by streaming: a downstream consumer tails
    // the versions this sink published
    val out = s"$root/downstream"
    val q2 = spark.readStream.table("wcat.db.st")
      .writeStream
      .option("checkpointLocation", s"$root/dckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 7L)
  }

  test("MemoryStream epochs into an UNPARTITIONED sink via " +
       "format(graft-log): multiple epochs, null-safe columns") {
    val root = Files.createTempDirectory("graft-logwrite-mem").toString
    // bootstrap an unpartitioned sink through the commit protocol
    Seq((1L, "a")).toDF("id", "v")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$root/ev")
    GraftTable.commit(spark, root, 0L)
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("id", "v")
      .writeStream
      .format("graft-log")
      .option("sink", "ev")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-logwrite-mem-ckpt").toString)
      .start(root)
    mem.addData((2L, "b"), (3L, null))
    q.processAllAvailable()
    mem.addData((4L, "d"))
    q.processAllAvailable()
    q.stop()
    val got = GraftTable.read(spark, root, "ev")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> null, 4L -> "d"))
    // one version per non-empty epoch
    assert(GraftTable.versions(spark, root).size == 3)
  }

  test("schema enforcement: an INSERT missing a column or with an " +
       "incompatible type is rejected at analysis, not staged") {
    wh
    val root = Files.createTempDirectory("graft-logwrite-schema").toString
    seed(root, 0L, 3L)
    spark.sql("DROP TABLE IF EXISTS wcat.db.se")
    spark.sql("CREATE TABLE wcat.db.se USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    val e = intercept[Exception](
      spark.sql("INSERT INTO wcat.db.se VALUES (1, 'only-two')"))
    assert(TestErrors.messageChain(e).exists(m =>
      m.contains("not enough data columns") || m.contains("expects")))
    assert(GraftTable.read(spark, root, "raw").count() == 3L,
      "a rejected insert must not publish anything")
  }
}
