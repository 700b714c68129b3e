package graft.sources.arrow

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.ArrowInterchange

/** Package-internal coverage for the streaming sink's run fencing and
  * the streaming source's strict shard admission — the zombie-driver
  * and producer-replay races a black-box stream run can't reproduce
  * deterministically. */
class ArrowZombieFenceSpec extends AnyFunSuite {
  import SparkTestSession._

  private val schema = StructType(Seq(StructField("v", LongType)))

  /** Drive one task of `w`'s epoch to a winning commit message. */
  private def writeEpoch(w: ArrowStreamingWrite, epochId: Long,
                         values: Seq[Long]): Array[WriterCommitMessage] = {
    val factory = w.createStreamingWriterFactory(null)
    val writer = factory.createWriter(0, 0L, epochId)
    values.foreach(v => writer.write(new GenericInternalRow(Array[Any](v))))
    Array(writer.commit())
  }

  test("a superseded run's commit is fenced off: it can never publish " +
       "over the live run's shards") {
    spark.sparkContext.setLogLevel("ERROR") // fail-loudly paths below
    try {
      val out = Files.createTempDirectory("graft-zombie-fence").toString
      // run 1 ("zombie"): tasks complete for epoch 0, driver stalls
      // before commit
      val w1 = new ArrowStreamingWrite(out, schema, 1024, truncating = false)
      val msgs1 = writeEpoch(w1, 0L, Seq(1L, 2L, 3L))

      // run 2 (the restart) claims the tree: sweeps run 1's staging,
      // stamps its own token, and replays epoch 0 for real
      val w2 = new ArrowStreamingWrite(out, schema, 1024, truncating = false)
      val msgs2 = writeEpoch(w2, 0L, Seq(1L, 2L, 3L))
      w2.commit(0L, msgs2)
      val shard0 = new java.io.File(s"$out/batch_id=0")
      assert(shard0.isDirectory && shard0.list().exists(_.endsWith(".arrows")))

      // the zombie wakes up in commit(): its staging is gone but its
      // tasks reported winners — it must fail, not synthesize an empty
      // shard over the live run's real one
      val e1 = intercept[IllegalArgumentException](w1.commit(0L, msgs1))
      assert(e1.getMessage.contains("superseded"))

      // the zombie replays a LATER all-empty epoch (no winners): the
      // token fence must still stop it before it deletes or renames
      // anything in the tree
      val e2 = intercept[IllegalArgumentException](
        w1.commit(1L, Array.empty[WriterCommitMessage]))
      assert(e2.getMessage.contains("no longer belongs"))
      assert(!new java.io.File(s"$out/batch_id=1").exists())

      // the live run's shard is intact and readable throughout
      val back = spark.read.format("graft-arrow").load(out)
      assert(back.count() == 3L)
    } finally spark.sparkContext.setLogLevel("WARN")
  }

  test("a shard directory that vanishes entirely inside an admitted " +
       "range fails the batch instead of silently dropping its rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vanished-shard").toString
    (0 to 2).foreach(i => ArrowInterchange.exportArrow(
      (i * 10L until i * 10L + 10L).toDF("v"), s"$root/batch_id=$i"))
    val s = spark.read.format("graft-arrow").load(root).schema
    val stream = new ArrowMicroBatchStream(root, s, s,
      ArrowInterchange.DefaultMaxPartBytes)
    // producer replay deletes shard 1 wholesale (publishStaged sits
    // between its delete and rename) after the range [0, 3) was admitted
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$root/batch_id=1"))
    val e = intercept[IllegalStateException](
      stream.planInputPartitions(ArrowShardOffset(0), ArrowShardOffset(3)))
    assert(e.getMessage.contains("vanished"))
  }

  test("a 0-checkpointed consumer of a late-start producer drains the " +
       "bootstrap gap as an empty batch instead of crash-looping; " +
       "every other hole fails loudly") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import spark.implicits._
    val root = Files.createTempDirectory("graft-below-min").toString
    // producer resumed at epoch 7: the tree's first shard is 7, but the
    // consumer's CHECKPOINTED offset is 0 (it started on an empty tree)
    ArrowInterchange.exportArrow((0L until 5L).toDF("v"), s"$root/batch_id=7")
    val s = spark.read.format("graft-arrow").load(root).schema
    val stream = new ArrowMicroBatchStream(root, s, s,
      ArrowInterchange.DefaultMaxPartBytes)
    // step 1: latestOffset from 0 hands out the never-existed gap
    // [0, 7) as its own batch…
    val gapEnd = stream.latestOffset(ArrowShardOffset(0),
      ReadLimit.allAvailable()).asInstanceOf[ArrowShardOffset].next
    assert(gapEnd == 7L)
    // …which reads as EMPTY (ids 0..6 never existed), not as a throw
    // on an offset no restart could change
    assert(stream.planInputPartitions(
      ArrowShardOffset(0), ArrowShardOffset(7)).isEmpty)
    // step 2: from the gap's end, admission is strict and reads shard 7
    assert(stream.planInputPartitions(
      ArrowShardOffset(7), ArrowShardOffset(8)).nonEmpty)
    // a hole anywhere PAST the bootstrap still fails loudly — both a
    // mid-range vanish…
    ArrowInterchange.exportArrow((5L until 9L).toDF("v"), s"$root/batch_id=9")
    val e = intercept[IllegalStateException](
      stream.planInputPartitions(ArrowShardOffset(7), ArrowShardOffset(10)))
    assert(e.getMessage.contains("vanished"))
    // …and a whole-range vanish from a non-zero offset (the lowest
    // admitted shard mid-replay must NOT be silently skipped)
    val e2 = intercept[IllegalArgumentException](
      stream.planInputPartitions(ArrowShardOffset(10), ArrowShardOffset(11)))
    assert(e2.getMessage.contains("vanished"))
  }

  test("a streaming commit refuses to replace or truncate a shard it " +
       "does not own") {
    import org.apache.spark.sql.functions.lit
    val out = Files.createTempDirectory("graft-foreign-shard").toString
    // a FOREIGN shard at batch_id=0 (e.g. a batch INSERT's claim, or a
    // schema-only create shard) — unstamped, so no query owns it
    ArrowInterchange.exportArrow(
      spark.range(3).select(lit(1L).as("v")), s"$out/batch_id=0")
    val w = new ArrowStreamingWrite(out, schema, 1024, truncating = false,
      queryId = "query-A")
    val msgs = writeEpoch(w, 0L, Seq(7L))
    val e = intercept[IllegalArgumentException](w.commit(0L, msgs))
    assert(e.getMessage.contains("not written by this query"))
    // the foreign shard is intact
    assert(spark.read.format("graft-arrow").load(s"$out/batch_id=0")
      .count() == 3L)
    // the same query replacing ITS OWN shard (a replay) is allowed
    val w2 = new ArrowStreamingWrite(out, schema, 1024, truncating = false,
      queryId = "query-B")
    w2.commit(5L, writeEpoch(w2, 5L, Seq(1L, 2L)))
    val w3 = new ArrowStreamingWrite(out, schema, 1024, truncating = false,
      queryId = "query-B")
    w3.commit(5L, writeEpoch(w3, 5L, Seq(1L, 2L)))
    assert(spark.read.format("graft-arrow").load(s"$out/batch_id=5")
      .count() == 2L)
    // Complete-mode truncation must also refuse foreign shards
    val wc = new ArrowStreamingWrite(out, schema, 1024, truncating = true,
      queryId = "query-C")
    val ec = intercept[IllegalArgumentException](
      wc.commit(9L, writeEpoch(wc, 9L, Seq(3L))))
    assert(ec.getMessage.contains("refusing to truncate"))
    assert(spark.read.format("graft-arrow").load(s"$out/batch_id=0")
      .count() == 3L)
  }

  test("initialOffset starts at the tree's first existing shard id, " +
       "not a hardcoded zero") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-late-start").toString
    // a Complete-mode-truncated tree: only batch_id=5 survives
    ArrowInterchange.exportArrow(Seq(1L, 2L).toDF("v"), s"$root/batch_id=5")
    val s = spark.read.format("graft-arrow").load(root).schema
    val stream = new ArrowMicroBatchStream(root, s, s,
      ArrowInterchange.DefaultMaxPartBytes)
    assert(stream.initialOffset().asInstanceOf[ArrowShardOffset].next == 5L)
    // the admitted range [5, 6) then reads cleanly under strict
    // per-id admission
    assert(stream.planInputPartitions(
      ArrowShardOffset(5), ArrowShardOffset(6)).nonEmpty)
    // an empty tree still starts at 0 (streamingArrowShards' first id)
    val empty = Files.createTempDirectory("graft-empty-start").toString
    val stream2 = new ArrowMicroBatchStream(empty, s, s,
      ArrowInterchange.DefaultMaxPartBytes)
    assert(stream2.initialOffset().asInstanceOf[ArrowShardOffset].next == 0L)
  }
}
