package graft.sources.arrow

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.ArrowInterchange

/** Package-internal regression coverage for the streaming source's
  * offset arithmetic — behaviors a black-box stream run can't pin down
  * deterministically (they depend on racing a producer replay against
  * a trigger). */
class ArrowStreamInternalsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("latestOffset never regresses below the consumer's position " +
       "while a replay shrinks the committed prefix") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-offset-clamp").toString
    (0 to 2).foreach(i => ArrowInterchange.exportArrow(
      (i * 10L until i * 10L + 10L).toDF("v"), s"$root/batch_id=$i"))
    val stream = new ArrowMicroBatchStream(root,
      spark.read.format("graft-arrow").load(root).schema,
      spark.read.format("graft-arrow").load(root).schema,
      ArrowInterchange.DefaultMaxPartBytes)
    // healthy tree: prefix end = 3
    assert(stream.latestOffset(ArrowShardOffset(0), ReadLimit.allAvailable())
      .asInstanceOf[ArrowShardOffset].next == 3L)
    // a producer replay momentarily removes shard 1: the committed
    // prefix shrinks to 1, but a consumer already at offset 3 must NOT
    // be handed a smaller "latest" (the next trigger would re-read
    // shards 1-2 once the replay lands — duplicated rows)
    assert(new java.io.File(s"$root/batch_id=1/_SUCCESS").delete())
    assert(stream.latestOffset(ArrowShardOffset(3), ReadLimit.allAvailable())
      .asInstanceOf[ArrowShardOffset].next == 3L)
    // a consumer NOT yet past the shrink point still sees the honest
    // prefix (admission stops at the uncommitted shard)
    assert(stream.latestOffset(ArrowShardOffset(0), ReadLimit.allAvailable())
      .asInstanceOf[ArrowShardOffset].next == 1L)
  }

  test("the streaming reader vends columnar batches like the batch " +
       "scan; nested pruning falls back to the by-name row reader") {
    import org.apache.spark.sql.types._
    val flat = StructType(Seq(StructField("v", LongType),
      StructField("s", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val root = Files.createTempDirectory("graft-stream-columnar").toString
    def factory(required: StructType) =
      new ArrowMicroBatchStream(root, flat, required,
        ArrowInterchange.DefaultMaxPartBytes).createReaderFactory()
    // full and TOP-LEVEL-pruned reads stay columnar (Arrow buffers vend
    // straight into ColumnarBatch, zero per-row boxing)
    assert(factory(flat).supportColumnarReads(null))
    assert(factory(StructType(flat.take(1))).supportColumnarReads(null))
    // a NESTED-pruned struct must fall back: ArrowColumnVector resolves
    // children by ORDINAL and a subset struct would read wrong children
    val nestedPruned = StructType(Seq(
      StructField("s", StructType(Seq(StructField("b", StringType))))))
    assert(!factory(nestedPruned).supportColumnarReads(null))
  }
}
