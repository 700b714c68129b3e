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

  test("roundtrip is lossless for hostile strings; parts are gzip'd") {
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
    // compressed parts with the json.gz suffix
    val parts = new java.io.File(s"$out/d").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty, "export must write gzip'd json parts")

    val back = Jsonl.readJsonl(spark, s"$out/d")
      .orderBy("doc_id").collect()
    val orig = nasty.orderBy("doc_id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b == o, s"row ${o.getLong(0)} mutated in the roundtrip")
    }
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
