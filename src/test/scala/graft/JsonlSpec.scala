package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jsonl

/** JSONL interchange: gzip parts on disk, declared-schema read-back,
  * and losslessness through the strings JSON escaping actually
  * mangles — quotes, backslashes, newlines, tabs, unicode incl.
  * non-BMP and combining marks. */
class JsonlSpec extends AnyFunSuite {
  import SparkTestSession._

  // the export probes the runtime for Hadoop-native zstd and falls
  // back to gzip — assert against whichever codec it actually picked
  private val partExt =
    if (Jsonl.exportCodec == "zstd") ".json.zst" else ".json.gz"

  test("roundtrip is lossless for hostile strings; parts are compressed") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text", "en", "s", 10L),
      (2L, "quote \" backslash \\ slash /", "en", "s", 27L),
      (3L, "newline\nand\ttab and\rcr", "en", "s", 22L),
      (4L, "unicode é́ snowman ☃ emoji 😀", "zh", "s", 25L),
      (5L, "", "de", "s", 0L),
      (6L, "ctrl  bytes", "fr", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft-jsonl-spec").toString
    Jsonl.exportJsonl(nasty, s"$out/d")
    // compressed parts with the probed codec's suffix
    val parts = new java.io.File(s"$out/d").listFiles()
      .filter(_.getName.endsWith(partExt))
    assert(parts.nonEmpty, s"export must write $partExt parts")

    val back = Jsonl.readJsonl(spark, s"$out/d")
      .orderBy("doc_id").collect()
    val orig = nasty.orderBy("doc_id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b == o, s"row ${o.getLong(0)} mutated in the roundtrip")
    }
  }

  test("size-capped export: a fat single partition splits into N parts " +
       "and reads back N-way parallel") {
    // documents at sf0.001 in ONE partition with a 64 KiB cap: the
    // size estimate forces multiple gzip parts, and because gzip is
    // non-splittable the read-back parallelism must equal the part
    // count — the 100 TB interchange contract (no serialized reads of
    // one giant .json.gz)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
    val out = Files.createTempDirectory("graft-jsonl-parts").toString
    Jsonl.exportJsonl(docs, s"$out/d", maxPartBytes = 8L << 10)
    val parts = new java.io.File(s"$out/d").listFiles()
      .filter(_.getName.endsWith(partExt))
    assert(parts.length > 1,
      s"8 KiB cap over the sf0.001 corpus must split; got ${parts.length}")
    // every part honors the cap (gzip only shrinks it further) …
    assert(parts.forall(_.length < (8L << 10)),
      "a part exceeded the size cap")
    // … and read-back parallelism survives: multiple tasks, none of
    // them a serialized scan of one giant gzip (Spark may still
    // bin-pack SMALL parts together — that is the correct behavior,
    // the contract is an upper bound on work per task, not 1:1 files)
    val back = Jsonl.readJsonl(spark, s"$out/d")
    assert(back.rdd.getNumPartitions > 1,
      s"read of ${parts.length} parts must plan >1 task")
    assert(back.count() == docs.count(), "no rows lost by the sizing")
  }

  test("stat-less frames export with their own layout, not the sentinel's") {
    // a parallelized local relation has NO size statistics: Catalyst
    // reports the defaultSizeInBytes sentinel (≈8 EiB), which taken at
    // face value asks for 2^20 one-row parts. The sizing must detect
    // the unknown estimate and keep the frame's own partitioning.
    import spark.implicits._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 10L).map(Tuple1(_)), 2))
      .toDF("v")
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes
      > BigInt(1L << 50), "precondition: the estimate IS the sentinel")
    val out = Files.createTempDirectory("graft-jsonl-nostats").toString
    Jsonl.exportJsonl(df, s"$out/d")
    val parts = new java.io.File(s"$out/d").listFiles()
      .filter(_.getName.endsWith(partExt))
    assert(parts.length <= 2, s"expected ≤2 parts, got ${parts.length}")
    assert(spark.read.schema("v LONG").json(s"$out/d")
      .as[Long].collect().sorted.toSeq == (0L until 10L))
  }

  test("declared schema wins over inference: missing fields are null") {
    val dir = Files.createTempDirectory("graft-jsonl-schema").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.json"),
      """{"doc_id": 9, "text": "no lang"}""" + "\n")
    val r = Jsonl.readJsonl(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 9L && r.head.isNullAt(2),
      "absent JSONL fields must surface as null under the declared schema")
  }
}
