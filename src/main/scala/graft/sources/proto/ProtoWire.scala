package graft.sources.proto

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Proto3 wire-format codec working directly on Catalyst internal rows
  * (no intermediate object graph — the decoded message IS the Tungsten
  * row the query consumes, the Spark analogue of the reference's pooled
  * zero-copy vtproto decode, /root/reference/main.go:329-391 and
  * gen/bidrequest_vtproto.pb.go:12212).
  *
  * Implements the public protobuf encoding spec: varint (wire type 0),
  * fixed64 (1), length-delimited (2), fixed32 (5); packed and unpacked
  * repeated scalars are both accepted on decode, packed is produced on
  * encode (the proto3 default). Unknown fields are skipped.
  */
object ProtoWire {

  final class Cursor(var pos: Int)

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  def decode(bytes: Array[Byte], msg: PMessage): InternalRow =
    decodeMessage(bytes, 0, bytes.length, msg)

  private def readVarint(b: Array[Byte], c: Cursor, end: Int): Long = {
    var shift = 0
    var res = 0L
    while (shift < 64) {
      if (c.pos >= end) throw new IllegalArgumentException("truncated varint")
      val x = b(c.pos)
      c.pos += 1
      res |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) return res
      shift += 7
    }
    throw new IllegalArgumentException("malformed varint")
  }

  private def readFixed32(b: Array[Byte], c: Cursor, end: Int): Int = {
    if (c.pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
    val v = (b(c.pos) & 0xff) | ((b(c.pos + 1) & 0xff) << 8) |
      ((b(c.pos + 2) & 0xff) << 16) | ((b(c.pos + 3) & 0xff) << 24)
    c.pos += 4
    v
  }

  private def readFixed64(b: Array[Byte], c: Cursor, end: Int): Long = {
    if (c.pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(c.pos + i) & 0xffL) << (8 * i); i += 1 }
    c.pos += 8
    v
  }

  /** Length prefix with bounds check — corrupt input must fail fast,
    * never walk backwards or past the slice. */
  private def readLen(b: Array[Byte], c: Cursor, end: Int): Int = {
    val len = readVarint(b, c, end).toInt
    if (len < 0 || c.pos + len > end)
      throw new IllegalArgumentException(s"bad length $len")
    len
  }

  private def skipField(b: Array[Byte], c: Cursor, end: Int,
                        wireType: Int): Unit =
    wireType match {
      case 0 => readVarint(b, c, end)
      case 1 =>
        if (c.pos + 8 > end) throw new IllegalArgumentException("truncated")
        c.pos += 8
      case 2 =>
        // assign len first: `c.pos += readLen(…)` reads the OLD c.pos
        // before readLen advances it, silently losing the length byte
        val len = readLen(b, c, end)
        c.pos += len
      case 5 =>
        if (c.pos + 4 > end) throw new IllegalArgumentException("truncated")
        c.pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }

  private def scalarFromVarint(t: PType, v: Long): Any = t match {
    case PInt32 => v.toInt
    case PInt64 => v
    case PBool  => v != 0L
    case other  => throw new IllegalArgumentException(s"varint for $other")
  }

  private def defaultValue(f: PField): Any =
    if (f.repeated) new GenericArrayData(Array.empty[Any])
    else f.t match {
      case PString     => UTF8String.EMPTY_UTF8
      case PInt32      => 0
      case PInt64      => 0L
      case PFloat      => 0f
      case PBool       => false
      case _: PMessage => null
    }

  def decodeMessage(b: Array[Byte], start: Int, end: Int,
                    msg: PMessage): InternalRow = {
    val n = msg.fields.length
    val values = new Array[Any](n)
    var repeated: Array[ArrayBuffer[Any]] = null
    val c = new Cursor(start)
    while (c.pos < end) {
      val tag = readVarint(b, c, end)
      val fieldNo = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      val i = msg.ordinalOf(fieldNo)
      if (i < 0) skipField(b, c, end, wireType)
      else {
        val f = msg.fields(i)
          def addRepeated(v: Any): Unit = {
            if (repeated == null) repeated = new Array[ArrayBuffer[Any]](n)
            if (repeated(i) == null) repeated(i) = new ArrayBuffer[Any]
            repeated(i) += v
          }
          f.t match {
            case m: PMessage =>
              val len = readLen(b, c, end)
              val row = decodeMessage(b, c.pos, c.pos + len, m)
              c.pos += len
              if (f.repeated) addRepeated(row) else values(i) = row
            case PString =>
              val len = readLen(b, c, end)
              val s = UTF8String.fromBytes(b, c.pos, len)
              c.pos += len
              if (f.repeated) addRepeated(s) else values(i) = s
            case PFloat =>
              if (f.repeated && wireType == 2) { // packed
                val len = readLen(b, c, end)
                val stop = c.pos + len
                while (c.pos < stop)
                  addRepeated(java.lang.Float.intBitsToFloat(readFixed32(b, c, stop)))
              } else {
                val v = java.lang.Float.intBitsToFloat(readFixed32(b, c, end))
                if (f.repeated) addRepeated(v) else values(i) = v
              }
            case t => // varint scalars: int32 / int64 / bool
              if (f.repeated && wireType == 2) { // packed
                val len = readLen(b, c, end)
                val stop = c.pos + len
                while (c.pos < stop) addRepeated(scalarFromVarint(t, readVarint(b, c, stop)))
              } else {
                val v = scalarFromVarint(t, readVarint(b, c, end))
                if (f.repeated) addRepeated(v) else values(i) = v
              }
          }
      }
    }
    if (c.pos != end)
      throw new IllegalArgumentException("message overran its length")
    var i = 0
    while (i < n) {
      if (repeated != null && repeated(i) != null)
        values(i) = new GenericArrayData(repeated(i).toArray)
      else if (values(i) == null) values(i) = defaultValue(msg.fields(i))
      i += 1
    }
    new GenericInternalRow(values)
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  final class Writer(initial: Int = 256) {
    var buf = new Array[Byte](initial)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def writeByte(v: Int): Unit = { ensure(1); buf(len) = v.toByte; len += 1 }
    def writeVarint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7
      }
      buf(len) = v.toByte; len += 1
    }
    def writeFixed32(bits: Int): Unit = {
      ensure(4)
      buf(len) = bits.toByte; buf(len + 1) = (bits >>> 8).toByte
      buf(len + 2) = (bits >>> 16).toByte; buf(len + 3) = (bits >>> 24).toByte
      len += 4
    }
    def writeRaw(src: Array[Byte], n: Int): Unit = {
      ensure(n); System.arraycopy(src, 0, buf, len, n); len += n
    }
    def writeRawAll(src: Array[Byte]): Unit = writeRaw(src, src.length)
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  def encode(row: InternalRow, msg: PMessage): Array[Byte] = {
    val w = new Writer()
    encodeMessage(row, msg, w)
    w.toBytes
  }

  private def tag(fieldNo: Int, wireType: Int): Long =
    (fieldNo.toLong << 3) | wireType

  private def encodeMessage(row: InternalRow, msg: PMessage, w: Writer): Unit = {
    var i = 0
    val n = msg.fields.length
    while (i < n) {
      val f = msg.fields(i)
      if (!row.isNullAt(i)) {
        if (f.repeated) encodeRepeated(row.getArray(i), f, w)
        else f.t match {
          case m: PMessage =>
            val nested = new Writer(64)
            encodeMessage(row.getStruct(i, m.fields.length), m, nested)
            w.writeVarint(tag(f.number, 2))
            w.writeVarint(nested.len)
            w.writeRaw(nested.buf, nested.len)
          case PString =>
            val s = row.getUTF8String(i)
            if (s.numBytes > 0) {
              w.writeVarint(tag(f.number, 2))
              w.writeVarint(s.numBytes)
              w.writeRawAll(s.getBytes)
            }
          case PInt32 =>
            val v = row.getInt(i)
            if (v != 0) { w.writeVarint(tag(f.number, 0)); w.writeVarint(v.toLong) }
          case PInt64 =>
            val v = row.getLong(i)
            if (v != 0L) { w.writeVarint(tag(f.number, 0)); w.writeVarint(v) }
          case PBool =>
            if (row.getBoolean(i)) {
              w.writeVarint(tag(f.number, 0)); w.writeVarint(1L)
            }
          case PFloat =>
            val v = row.getFloat(i)
            if (v != 0f) {
              w.writeVarint(tag(f.number, 5))
              w.writeFixed32(java.lang.Float.floatToIntBits(v))
            }
        }
      }
      i += 1
    }
  }

  private def encodeRepeated(arr: ArrayData, f: PField, w: Writer): Unit = {
    val n = arr.numElements()
    if (n == 0) return
    f.t match {
      case m: PMessage =>
        var j = 0
        while (j < n) {
          val nested = new Writer(64)
          encodeMessage(arr.getStruct(j, m.fields.length), m, nested)
          w.writeVarint(tag(f.number, 2))
          w.writeVarint(nested.len)
          w.writeRaw(nested.buf, nested.len)
          j += 1
        }
      case PString =>
        var j = 0
        while (j < n) {
          val s = arr.getUTF8String(j)
          w.writeVarint(tag(f.number, 2))
          w.writeVarint(s.numBytes)
          w.writeRawAll(s.getBytes)
          j += 1
        }
      case PFloat => // packed
        w.writeVarint(tag(f.number, 2))
        w.writeVarint(4L * n)
        var j = 0
        while (j < n) {
          w.writeFixed32(java.lang.Float.floatToIntBits(arr.getFloat(j))); j += 1
        }
      case t => // packed varints
        val tmp = new Writer(16)
        var j = 0
        while (j < n) {
          t match {
            case PInt32 => tmp.writeVarint(arr.getInt(j).toLong)
            case PInt64 => tmp.writeVarint(arr.getLong(j))
            case PBool  => tmp.writeVarint(if (arr.getBoolean(j)) 1L else 0L)
            case other  => throw new IllegalArgumentException(s"$other")
          }
          j += 1
        }
        w.writeVarint(tag(f.number, 2))
        w.writeVarint(tmp.len)
        w.writeRaw(tmp.buf, tmp.len)
    }
  }
}
