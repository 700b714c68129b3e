package graft.sources.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Catalyst expressions wrapping [[ProtoWire]] — the engine's
  * `from_protobuf`/`to_protobuf` replacement (the spark-protobuf module
  * is not on this classpath). Schema-driven and generic: any [[PMessage]]
  * works, [[BidRequestSchema.bidrequest]] being the reference-parity one
  * (decode stage of /root/reference/main.go:329-391).
  *
  * CodegenFallback is acceptable here: the expression sits at the source
  * boundary (one eval per Kafka record), not inside per-row hot
  * expression trees, mirroring where the reference spends the same CPU.
  */
/** @param lenient malformed payloads decode to NULL instead of failing
  *   the task — the streaming pipeline's poison-message policy (the
  *   reference drops the row and continues on unmarshal error,
  *   main.go:335-337 / FIXTURES.md F1c). Keep strict for batch jobs
  *   where corrupt input should be loud.
  */
case class ProtoDecode(child: Expression, msg: PMessage,
                       lenient: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ProtoSchema.toStructType(msg)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    if (lenient)
      try ProtoWire.decode(input.asInstanceOf[Array[Byte]], msg)
      catch { case _: Exception => null }
    else ProtoWire.decode(input.asInstanceOf[Array[Byte]], msg)
  override protected def withNewChildInternal(c: Expression): ProtoDecode =
    copy(child = c)
  override def prettyName: String = "proto_decode"
}

case class ProtoEncode(child: Expression, msg: PMessage)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ProtoWire.encode(input.asInstanceOf[InternalRow], msg)
  override protected def withNewChildInternal(c: Expression): ProtoEncode =
    copy(child = c)
  override def prettyName: String = "proto_encode"
}

/** Reads an 8-byte little-endian unsigned integer — the reference's
  * Kafka reader appends the message timestamp as an 8-byte LE suffix and
  * the decoder strips it (`binary.LittleEndian.Uint64(m[len(m)-8:])`,
  * /root/reference/main.go:229,332-335).
  */
case class LittleEndianLong(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    require(b.length >= 8, s"need 8 bytes, got ${b.length}")
    val off = b.length - 8
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
  override protected def withNewChildInternal(c: Expression): LittleEndianLong =
    copy(child = c)
  override def prettyName: String = "le_uint64"
}

/** Writes a long as 8 little-endian bytes — inverse of
  * [[LittleEndianLong]], used to synthesize reference-framed messages
  * (timestamp suffix, main.go:229) in tests and the roundtrip query.
  */
case class LELongBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): LELongBytes =
    copy(child = c)
  override def prettyName: String = "le_uint64_bytes"
}

object ProtoFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def protoDecode(c: Column, msg: PMessage, lenient: Boolean = false): Column =
    column(ProtoDecode(expression(c), msg, lenient))
  def protoEncode(c: Column, msg: PMessage): Column =
    column(ProtoEncode(expression(c), msg))
  def leUint64(c: Column): Column = column(LittleEndianLong(expression(c)))
  def leUint64Bytes(c: Column): Column = column(LELongBytes(expression(c)))
}
