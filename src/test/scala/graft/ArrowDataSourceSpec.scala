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

  test("count(*) answers from footer row counts without decoding; " +
       "limit stops task-side decode") {
    import spark.implicits._
    val out = tmp()
    (0L until 1000L).toDF("v").repartition(4)
      .write.format("graft-arrow").mode("overwrite").save(s"$out/t")
    // count(*) pushes into the scan: the plan's scan is the count scan
    // (one partial row per task from footer metadata), and the result
    // is exact
    val cnt = spark.read.format("graft-arrow").load(s"$out/t")
      .groupBy().count()
    // the agg plan is AQE-wrapped, so inspect the optimized logical plan
    val scans = cnt.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }
    assert(scans.nonEmpty && scans.head.description().contains("count(*)"),
      s"count not pushed: ${scans.map(_.description())}")
    assert(cnt.head.getLong(0) == 1000L)
    assert(spark.read.format("graft-arrow").load(s"$out/t").count() == 1000L)
    // a filter blocks the pushdown (the source can't answer it) and the
    // count stays correct through the normal scan
    assert(spark.read.format("graft-arrow").load(s"$out/t")
      .where(col("v") < 10).count() == 10L)
    // limit pushes into the scan (partial: tasks stop decoding early;
    // Spark's global limit still finishes the job)
    val lim = spark.read.format("graft-arrow").load(s"$out/t").limit(7)
    val lscans = lim.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(lscans.nonEmpty && lscans.head.scan.description().contains("limit=7"),
      s"limit not pushed: ${lscans.map(_.scan.description())}")
    assert(lim.collect().length == 7)
    // a file WITHOUT the stamped row count (external writer) still
    // counts correctly via the batch-walk fallback
    val ext = tmp()
    locally {
      import org.apache.arrow.memory.RootAllocator
      import org.apache.arrow.vector.VectorSchemaRoot
      import org.apache.arrow.vector.ipc.ArrowFileWriter
      graft.operators.NioAccess.ensureOpen(classOf[RootAllocator])
      val alloc = new RootAllocator(Long.MaxValue)
      try {
        val schema = StructType(Seq(StructField("v", LongType)))
        val root = VectorSchemaRoot.create(
          graft.operators.ArrowInterchange.toArrowSchema(schema), alloc)
        val ch = java.nio.channels.Channels.newChannel(
          new java.io.FileOutputStream(s"$ext/part-00000.arrows"))
        val w = new ArrowFileWriter(root, null, ch) // 3-arg: no metadata
        try {
          w.start()
          val vec = root.getVector(0)
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          (0 until 5).foreach(i => vec.setSafe(i, i.toLong))
          root.setRowCount(5); w.writeBatch(); w.end()
        } finally { w.close(); ch.close(); root.close() }
      } finally alloc.close()
    }
    assert(spark.read.format("graft-arrow").option("requireMarker", "false")
      .load(ext).count() == 5L)
  }

  test("zone-map stats skip whole files against pushed filters") {
    import spark.implicits._
    val out = tmp()
    // range-partitioned export → disjoint per-file id ranges
    (0L until 1000L).map(i => (i, i.toDouble / 7.0, s"d$i"))
      .toDF("id", "score", "tag")
      .repartitionByRange(5, col("id"))
      .write.format("graft-arrow").mode("overwrite").save(s"$out/t")
    def partsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.getNumPartitions
    val all = spark.read.format("graft-arrow").load(s"$out/t")
    val full = partsOf(all.select("id"))
    assert(full == 5, s"precondition: 5 files/tasks, got $full")
    // a tight range predicate plans FEWER partitions and stays correct
    val narrow = all.where(col("id") >= 900L)
    assert(partsOf(narrow) < full,
      s"skip did not prune: ${partsOf(narrow)} of $full")
    assert(narrow.count() == 100L)
    assert(narrow.agg(min(col("id"))).head.getLong(0) == 900L)
    // double-typed stats prune too
    val hi = all.where(col("score") > 141.0)
    assert(partsOf(hi) < full)
    assert(hi.count() == (0L until 1000L).count(_ / 7.0 > 141.0))
    // a provably-empty predicate plans ZERO partitions
    assert(all.where(col("id") > 5000L).count() == 0L)
    // untracked (string) columns don't prune but stay correct
    assert(all.where(col("tag") === "d7").count() == 1L)
    // IN prunes when every value is provably out of range…
    val inNarrow = all.where(col("id").isin(950L, 990L))
    assert(partsOf(inNarrow) < full,
      s"IN did not prune: ${partsOf(inNarrow)} of $full")
    assert(inNarrow.count() == 2L)
    // …and stays correct when values straddle files
    assert(all.where(col("id").isin(5L, 995L)).count() == 2L)
    // the manifest is a cache, not the source of truth: with it gone,
    // pruning falls back to per-file footers and behaves identically
    assert(new java.io.File(s"$out/t/_stats.tsv").exists(),
      "writers must emit the stats manifest")
    assert(new java.io.File(s"$out/t/_stats.tsv").delete())
    val narrowNoManifest = all.where(col("id") >= 900L)
    assert(partsOf(narrowNoManifest) < full)
    assert(narrowNoManifest.count() == 100L)
    // a NaN anywhere in a double column disables its stats: Spark's
    // comparisons order NaN ABOVE every value, so `c > bound` MATCHES
    // NaN rows a finite [min,max] would wrongly prune
    val nd = tmp()
    Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "score")
      .coalesce(1).write.format("graft-arrow").mode("overwrite")
      .save(s"$nd/t")
    val nanHits = spark.read.format("graft-arrow").load(s"$nd/t")
      .where(col("score") > 5.0)
    assert(nanHits.count() == 1L,
      "the NaN row matches score > 5.0 and must not be file-skipped")
    assert(nanHits.head.getLong(0) == 2L)
    // the scan reports its pruning
    val scans = narrow.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.head.scan.description().contains("files="),
      scans.head.scan.description())
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
