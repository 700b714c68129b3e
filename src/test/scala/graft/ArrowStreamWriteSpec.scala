package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowInterchange

/** Streaming WRITE into Arrow shard trees
  * (`df.writeStream.format("graft-arrow")`): per-epoch shard commits
  * with markers, append mode builds the tree, complete mode replaces
  * it, and the tree is immediately consumable by every reader surface
  * (batch DSv2, readShards, the streaming source). */
class ArrowStreamWriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft-arrow-streamwrite").toString

  private val srcSchema = StructType(Seq(
    StructField("id", LongType), StructField("t", StringType)))

  test("append mode: one committed shard per micro-batch, lossless") {
    import spark.implicits._
    val root = tmp()
    (0L until 40L).map(i => (i, s"t$i")).toDF("id", "t")
      .repartition(4).write.parquet(s"$root/src")
    val q = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", 2).parquet(s"$root/src")
      .writeStream.format("graft-arrow")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start(s"$root/out")
    q.awaitTermination()
    val shards = new java.io.File(s"$root/out").listFiles()
      .filter(_.getName.startsWith("batch_id=")).sortBy(_.getName)
    assert(shards.length >= 2, "stream must really micro-batch")
    assert(shards.forall(d => new java.io.File(d, "_SUCCESS").exists()))
    assert(new java.io.File(s"$root/out").listFiles()
      .forall(!_.getName.contains("staging")), "staging debris left")
    // every reader surface consumes the tree identically
    assert(spark.read.format("graft-arrow").load(s"$root/out")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 40L))
    assert(ArrowInterchange.readShards(spark, s"$root/out")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 40L))
  }

  test("complete mode: the tree holds exactly the latest epoch's result") {
    import spark.implicits._
    val root = tmp()
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[Long]
    mem.addData(1L, 2L, 2L)
    val q = mem.toDF().groupBy(col("value")).count()
      .writeStream.format("graft-arrow").outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .start(s"$root/out")
    try {
      q.processAllAvailable()
      mem.addData(2L, 3L)
      q.processAllAvailable()
    } finally q.stop()
    val shards = new java.io.File(s"$root/out").listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(shards.length == 1,
      s"complete mode must retire earlier epochs: ${shards.toSeq}")
    val got = spark.read.format("graft-arrow").load(s"$root/out")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (2L, 3L), (3L, 1L)))
  }

  test("arrow-to-arrow relay: streaming source feeds the streaming sink") {
    import spark.implicits._
    val root = tmp()
    // producer tree
    ArrowInterchange.exportArrow((0L until 10L).toDF("v"),
      s"$root/in/batch_id=0")
    ArrowInterchange.exportArrow((10L until 20L).toDF("v"),
      s"$root/in/batch_id=1")
    val q = spark.readStream.format("graft-arrow").load(s"$root/in")
      .select(col("v"), (col("v") * 2).as("v2"))
      .writeStream.format("graft-arrow")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start(s"$root/out")
    q.awaitTermination()
    val back = spark.read.format("graft-arrow").load(s"$root/out")
      .orderBy("v").collect()
    assert(back.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 20L).map(v => (v, v * 2)))
  }
}
