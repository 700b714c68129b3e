package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.proto._

/** Whole-schema codec property: random message trees over the FULL
  * 22-message Bidrequest schema roundtrip through encode→decode up to
  * proto3 normalization (null/default scalar collapse, null/empty
  * repeated collapse, absent message null). Also: lenient decode of
  * random garbage never throws and always terminates.
  */
class ProtoWireFullSchemaSpec extends AnyFunSuite {

  private def genFor(t: PType, depth: Int): Gen[Any] = t match {
    case PString => Gen.oneOf(
      Gen.const(null),
      Gen.alphaNumStr.map(s => UTF8String.fromString(s.take(12))))
    case PInt32 => Gen.chooseNum(Int.MinValue, Int.MaxValue)
    case PInt64 => Gen.chooseNum(Long.MinValue, Long.MaxValue)
    case PBool => Gen.oneOf(true, false)
    case PFloat => Gen.chooseNum(-1e5f, 1e5f)
      .map(f => if (f == 0f) 0f else f) // avoid -0.0 (elided as default)
    case m: PMessage =>
      if (depth <= 0) Gen.const(null)
      else Gen.oneOf(Gen.const(null), genRow(m, depth - 1))
  }

  private def genField(f: PField, depth: Int): Gen[Any] =
    if (f.repeated) {
      val elem = f.t match {
        case m: PMessage => genRow(m, depth - 1)
        case PString => Gen.alphaNumStr.map(s => UTF8String.fromString(s.take(8)))
        case other => genFor(other, depth)
      }
      if (depth <= 0) Gen.const(new GenericArrayData(Array.empty[Any]))
      else Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, elem))
        .map(l => new GenericArrayData(l.toArray))
    } else genFor(f.t, depth)

  private def genRow(m: PMessage, depth: Int): Gen[InternalRow] =
    Gen.sequence[Vector[Any], Any](m.fields.map(genField(_, depth)))
      .map(vs => new GenericInternalRow(vs.toArray))

  /** proto3 normalization of an input row: what decode(encode(row))
    * must produce. */
  private def normalize(row: InternalRow, m: PMessage): InternalRow = {
    val out = new Array[Any](m.fields.length)
    m.fields.zipWithIndex.foreach { case (f, i) =>
      out(i) =
        if (f.repeated) {
          val arr = if (row.isNullAt(i)) new GenericArrayData(Array.empty[Any])
            else row.getArray(i)
          f.t match {
            case mm: PMessage =>
              new GenericArrayData(
                (0 until arr.numElements())
                  .map(j => normalize(arr.getStruct(j, mm.fields.length), mm))
                  .toArray[Any])
            case _ => arr
          }
        } else f.t match {
          case mm: PMessage =>
            if (row.isNullAt(i)) null
            else normalize(row.getStruct(i, mm.fields.length), mm)
          case PString =>
            if (row.isNullAt(i)) UTF8String.EMPTY_UTF8 else row.getUTF8String(i)
          case PInt32 => if (row.isNullAt(i)) 0 else row.getInt(i)
          case PInt64 => if (row.isNullAt(i)) 0L else row.getLong(i)
          case PFloat => if (row.isNullAt(i)) 0f else row.getFloat(i)
          case PBool  => if (row.isNullAt(i)) false else row.getBoolean(i)
        }
    }
    new GenericInternalRow(out)
  }

  private def assertSame(a: InternalRow, b: InternalRow, m: PMessage,
                         path: String): Unit =
    m.fields.zipWithIndex.foreach { case (f, i) =>
      val p = s"$path.${f.name}"
      if (f.repeated) {
        val (x, y) = (a.getArray(i), b.getArray(i))
        assert(x.numElements() == y.numElements(), s"$p size")
        f.t match {
          case mm: PMessage =>
            (0 until x.numElements()).foreach(j => assertSame(
              x.getStruct(j, mm.fields.length),
              y.getStruct(j, mm.fields.length), mm, s"$p[$j]"))
          case _ =>
            val dt = ProtoSchema.sparkType(f.t)
            assert(x.toObjectArray(dt).toSeq == y.toObjectArray(dt).toSeq, p)
        }
      } else f.t match {
        case mm: PMessage =>
          assert(a.isNullAt(i) == b.isNullAt(i), s"$p nullness")
          if (!a.isNullAt(i)) assertSame(
            a.getStruct(i, mm.fields.length),
            b.getStruct(i, mm.fields.length), mm, p)
        case PString => assert(a.getUTF8String(i) == b.getUTF8String(i), p)
        case PInt32  => assert(a.getInt(i) == b.getInt(i), p)
        case PInt64  => assert(a.getLong(i) == b.getLong(i), p)
        case PFloat  => assert(a.getFloat(i) == b.getFloat(i), p)
        case PBool   => assert(a.getBoolean(i) == b.getBoolean(i), p)
      }
    }

  test("random full-schema trees roundtrip up to proto3 normalization") {
    val bid = BidRequestSchema.bidrequest
    (0 until 60).foreach { seed =>
      val row = genRow(bid, 3)
        .pureApply(Gen.Parameters.default.withSize(6), Seed(seed.toLong))
      val decoded = ProtoWire.decode(ProtoWire.encode(row, bid), bid)
      assertSame(normalize(row, bid), decoded, bid, "bid")
    }
  }

  test("lenient decode of random garbage terminates without throwing") {
    val bid = BidRequestSchema.bidrequest
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      val e = ProtoDecode(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes),
        bid, lenient = true)
      e.eval(null) // must return null or a row, never throw/hang
    }
  }
}
