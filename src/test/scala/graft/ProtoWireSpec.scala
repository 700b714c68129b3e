package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.proto._

/** Wire-level roundtrip properties for the proto3 codec: for every value
  * kind (varint scalars incl. negatives, floats, strings, bools, packed
  * repeated scalars, repeated strings/messages, nested messages),
  * decode(encode(x)) must equal x up to proto3 default-elision (absent
  * scalar ≡ default, absent message ≡ null, absent repeated ≡ empty).
  */
class ProtoWireSpec extends AnyFunSuite {

  /** scalacheck without the scalatestplus bridge (offline cache): draw N
    * deterministic samples from a Gen and assert each. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def f(n: Int, name: String, t: PType, rep: Boolean = false) =
    PField(n, name, t, rep)

  val inner: PMessage = PMessage("Inner", Seq(
    f(1, "s", PString), f(2, "i", PInt32)))

  val msg: PMessage = PMessage("M", Seq(
    f(1, "s", PString),
    f(2, "i32", PInt32),
    f(3, "i64", PInt64),
    f(4, "fl", PFloat),
    f(5, "b", PBool),
    f(6, "ri", PInt32, rep = true),
    f(7, "rs", PString, rep = true),
    f(8, "rm", inner, rep = true),
    f(9, "nested", inner),
    f(1000, "bignum", PInt64))) // multi-byte tag

  private def utf8(s: String) = UTF8String.fromString(s)
  private def innerRow(s: String, i: Int): InternalRow =
    new GenericInternalRow(Array[Any](utf8(s), i))

  private def mkRow(s: String, i32: Int, i64: Long, fl: Float, b: Boolean,
                    ri: Seq[Int], rs: Seq[String], rm: Seq[(String, Int)],
                    nested: Option[(String, Int)], big: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      utf8(s), i32, i64, fl, b,
      new GenericArrayData(ri.toArray[Any]),
      new GenericArrayData(rs.map(utf8).toArray[Any]),
      new GenericArrayData(rm.map { case (a, c) => innerRow(a, c) }.toArray[Any]),
      nested.map { case (a, c) => innerRow(a, c) }.orNull,
      big))

  private val genRow = for {
    s <- Gen.asciiPrintableStr.map(_.take(20))
    i32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    i64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    fl <- Gen.chooseNum(-1e6f, 1e6f)
    b <- Gen.oneOf(true, false)
    ri <- Gen.listOfN(5, Gen.chooseNum(-1000, 1000))
    rs <- Gen.listOfN(3, Gen.alphaNumStr.map(_.take(8)))
    rm <- Gen.listOfN(2, Gen.zip(Gen.alphaNumStr.map(_.take(5)), Gen.posNum[Int]))
    nested <- Gen.option(Gen.zip(Gen.alphaNumStr.map(_.take(5)), Gen.posNum[Int]))
    big <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield (s, i32, i64, fl, b, ri, rs, rm, nested, big)

  private def getSeq(row: InternalRow, i: Int): Seq[Any] =
    row.getArray(i).toObjectArray(
      ProtoSchema.toStructType(msg).fields(i).dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType).toSeq

  test("roundtrip preserves all field kinds (incl. negative varints)") {
    forAllSeeded(genRow) { case (s, i32, i64, fl, b, ri, rs, rm, nested, big) =>
      val row = mkRow(s, i32, i64, fl, b, ri, rs, rm, nested, big)
      val out = ProtoWire.decode(ProtoWire.encode(row, msg), msg)
      assert(out.getUTF8String(0).toString == s)
      assert(out.getInt(1) == i32)
      assert(out.getLong(2) == i64)
      assert(out.getFloat(3) == fl)
      assert(out.getBoolean(4) == b)
      assert(getSeq(out, 5) == ri)
      assert(getSeq(out, 6).map(_.toString) == rs)
      val rmOut = (0 until out.getArray(7).numElements())
        .map(j => out.getArray(7).getStruct(j, 2))
        .map(r => (r.getUTF8String(0).toString, r.getInt(1)))
      assert(rmOut == rm)
      nested match {
        case Some((a, c)) =>
          val n = out.getStruct(8, 2)
          assert(n.getUTF8String(0).toString == a && n.getInt(1) == c)
        case None => assert(out.isNullAt(8))
      }
      assert(out.getLong(9) == big)
    }
  }

  test("proto3 default elision: empty message decodes to defaults") {
    val out = ProtoWire.decode(Array.emptyByteArray, msg)
    assert(out.getUTF8String(0).numBytes == 0)
    assert(out.getInt(1) == 0 && out.getLong(2) == 0L)
    assert(out.getFloat(3) == 0f && !out.getBoolean(4))
    assert(out.getArray(5).numElements() == 0)
    assert(out.isNullAt(8))
  }

  test("unknown fields are skipped (writer superset)") {
    // writer with an extra field number the reader doesn't know
    val writerMsg = PMessage("W", Seq(
      f(1, "s", PString), f(99, "extra", PString), f(2, "i32", PInt32)))
    val wrow = new GenericInternalRow(Array[Any](utf8("keep"), utf8("drop"), 7))
    val out = ProtoWire.decode(ProtoWire.encode(wrow, writerMsg), msg)
    assert(out.getUTF8String(0).toString == "keep")
    assert(out.getInt(1) == 7)
  }

  test("unpacked repeated scalars are accepted on decode") {
    // hand-encode field 6 (ri) as three separate varint tags
    val w = new ProtoWire.Writer()
    Seq(3, 5, 7).foreach { v =>
      w.writeVarint((6L << 3) | 0); w.writeVarint(v.toLong)
    }
    val out = ProtoWire.decode(w.toBytes, msg)
    assert(getSeq(out, 5) == Seq(3, 5, 7))
  }

  test("corrupt payloads: strict decode throws, lenient decode yields NULL (F1c)") {
    val garbage = Array[Byte](0x1a, 0x7f, -1, -1, -1, 0x02) // bad length
    intercept[Exception] {
      ProtoWire.decode(garbage, BidRequestSchema.bidrequest)
    }
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(garbage)
    assert(ProtoDecode(lit, BidRequestSchema.bidrequest, lenient = true)
      .eval(null) == null)
    // truncated real message: cut inside the trailing 9-byte varint
    val row = mkRow("hello", 1, 2L, 3f, b = true, Seq(1), Seq("a"),
      Seq(("x", 1)), Some(("y", 2)), Long.MaxValue)
    val good = ProtoWire.encode(row, msg)
    val cut = java.util.Arrays.copyOf(good, good.length - 2)
    assert(ProtoDecode(
      org.apache.spark.sql.catalyst.expressions.Literal(cut),
      msg, lenient = true).eval(null) == null)
  }

  test("nested message truncated mid-varint fails loudly in strict mode") {
    // nested Inner whose declared length cuts off a varint: field 9
    // (nested, wire 2), len 2, content = tag(2,varint) + continuation
    // byte with no terminator inside the slice
    val w = new ProtoWire.Writer()
    w.writeVarint((9L << 3) | 2)
    w.writeVarint(2L)
    w.writeByte(0x10) // Inner field 2 (i), wire 0
    w.writeByte(0x80) // varint continuation byte, then the slice ends
    w.writeByte(0x01) // continuation target lives OUTSIDE the nested len
    intercept[Exception] { ProtoWire.decode(w.toBytes, msg) }
  }

  test("LE uint64 suffix roundtrip") {
    val w = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(1705106337331L).array()
    val expr = LittleEndianLong(
      org.apache.spark.sql.catalyst.expressions.Literal(w))
    assert(expr.eval(null) == 1705106337331L)
  }

  test("codec expressions compile under codegen (no interpreted fallback)") {
    // CODEGEN_ONLY makes MutableProjection creation THROW if any
    // expression lacks a working doGenCode — the guard that the decode
    // hot path never silently drops back to the boxed eval route.
    val spark = SparkTestSession.spark
    val old = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = graft.operators.ProtoPipeline
        .roundtrip(spark, SparkTestSession.sf0001).limit(5).collect()
      assert(out.nonEmpty)
      // lenient decode of garbage through the generated path → NULL row
      import spark.implicits._
      val bad = Seq(Array[Byte](0x08, -1), Array[Byte](1, 2, 3)).toDF("b")
        .select(ProtoFunctions.protoDecode(
          org.apache.spark.sql.functions.col("b"), msg, lenient = true)
          .as("m"))
        .collect()
      assert(bad.forall(_.isNullAt(0)))
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
