package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowInterchange

/** DSv2 surface over Arrow IPC directories: declared-schema reads,
  * column pruning pushed into the scan (the reason the source exists),
  * bin-packed task planning, marker semantics. */
class ArrowDataSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft-arrow-dsv2").toString

  private def export(out: String): Unit =
    ArrowInterchange.exportArrow(
      graft.sources.Tables.documents(spark, sf0001)
        .join(graft.sources.Tables.embeddings(spark, sf0001),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"), col("label"), col("embedding")),
      out)

  test("reads match the RDD reader row for row, schema declared") {
    val out = tmp()
    export(s"$out/t")
    val v2 = spark.read.format("graft-arrow").load(s"$out/t")
    val rdd = ArrowInterchange.readArrow(spark, s"$out/t")
    assert(v2.schema == rdd.schema)
    val a = v2.orderBy("doc_id").collect()
    val b = rdd.orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("column pruning reaches the scan: projected reads decode only " +
       "their columns") {
    val out = tmp()
    export(s"$out/t")
    val pruned = spark.read.format("graft-arrow").load(s"$out/t")
      .select(col("doc_id"), col("n_chars"))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.nonEmpty, "expected a DSv2 BatchScanExec")
    assert(scans.head.scan.readSchema().fieldNames.toSeq
      == Seq("doc_id", "n_chars"),
      s"scan did not prune: ${scans.head.scan.readSchema().fieldNames.toSeq}")
    // and the pruned read is still CORRECT
    val got = pruned.agg(sum(col("n_chars"))).head.getLong(0)
    val want = graft.sources.Tables.documents(spark, sf0001)
      .join(graft.sources.Tables.embeddings(spark, sf0001),
        col("doc_id") === col("vec_id"))
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(got == want)
  }

  test("lists, timestamps, and nulls come through catalyst-exact") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("af", ArrayType(FloatType))))
    val ts = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")
    val rows = Seq(
      org.apache.spark.sql.Row(1L, ts, Seq(1.5f, null, -2.0f)),
      org.apache.spark.sql.Row(2L, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val out = tmp()
    ArrowInterchange.exportArrow(df, s"$out/t")
    val back = spark.read.format("graft-arrow").load(s"$out/t")
      .orderBy("id").collect()
    assert(back(0).getTimestamp(1) == ts)
    assert(back(0).getSeq[Any](2) == Seq(1.5f, null, -2.0f))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
  }

  test("scans vend columnar batches; nested pruning falls back to rows") {
    val out = tmp()
    export(s"$out/t")
    // flat and top-level-pruned reads report columnar: Arrow buffers
    // flow into the plan as ColumnarBatch, no per-row boxing
    val flat = spark.read.format("graft-arrow").load(s"$out/t")
      .select(col("doc_id"), col("n_chars"), col("embedding"))
    val scan = flat.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }.head
    assert(scan.supportsColumnar, "top-level-pruned scan must be columnar")
    // …and the columnar path is value-exact, list column included
    val got = flat.select(col("doc_id"),
        aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x.cast(DoubleType)).as("s"))
      .orderBy("doc_id").collect()
    val want = ArrowInterchange.readArrow(spark, s"$out/t")
      .select(col("doc_id"),
        aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x.cast(DoubleType)).as("s"))
      .orderBy("doc_id").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (x, y) => assert(x == y) }
    // a NESTED-pruned struct read must not vend columnar batches:
    // ArrowColumnVector resolves struct children by ordinal against the
    // vector's full child list, so the pruned-subset schema would read
    // the wrong children — the factory falls back to the by-name row
    // reader for exactly those scans
    val nd = tmp()
    val nested = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        struct(col("lang").as("l"), col("source").as("s"),
          col("n_chars").as("nc")).as("meta"))
    ArrowInterchange.exportArrow(nested, s"$nd/t")
    val prunedNested = spark.read.format("graft-arrow").load(s"$nd/t")
      .select(col("doc_id"), col("meta.nc").as("nc"))
    val scan2 = prunedNested.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }.head
    val metaRead = scan2.scan.readSchema().find(_.name == "meta")
    metaRead.foreach { f =>
      val full = nested.schema("meta").dataType
      assert(scan2.supportsColumnar == (f.dataType == full),
        s"columnar flag must track nested pruning: read ${f.dataType}")
    }
    assert(prunedNested.agg(sum(col("nc"))).head.getLong(0)
      == graft.sources.Tables.documents(spark, sf0001)
        .agg(sum(col("n_chars"))).head.getLong(0))
  }

  test("marker semantics match the RDD reader") {
    import spark.implicits._
    val out = tmp()
    ArrowInterchange.exportArrow((0L until 6L).toDF("v"), s"$out/t")
    assert(new java.io.File(s"$out/t/_SUCCESS").delete())
    val e = intercept[Exception] {
      spark.read.format("graft-arrow").load(s"$out/t").count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("_SUCCESS"), s"unexpected failure: $msgs")
    assert(spark.read.format("graft-arrow")
      .option("requireMarker", "false").load(s"$out/t")
      .as[Long].collect().sorted.toSeq == (0L until 6L))
  }
}
