package graft.sources.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expressions wrapping [[ProtoWire]] — the engine's
  * `from_protobuf`/`to_protobuf` replacement (the spark-protobuf module
  * is not on this classpath). Schema-driven and generic: any [[PMessage]]
  * works, [[BidRequestSchema.bidrequest]] being the reference-parity one
  * (decode stage of /root/reference/main.go:329-391).
  *
  * All four expressions implement `doGenCode` (the codec object is
  * attached as a codegen reference and invoked directly), so the decode
  * stage stays inside whole-stage codegen: with `CodegenFallback` every
  * Kafka record would detour through the interpreted `eval` path with
  * per-row boxing — measurable at the reference's design envelope of
  * hundreds of thousands of messages per second per core.
  */
/** @param lenient malformed payloads decode to NULL instead of failing
  *   the task — the streaming pipeline's poison-message policy (the
  *   reference drops the row and continues on unmarshal error,
  *   main.go:335-337 / FIXTURES.md F1c). Keep strict for batch jobs
  *   where corrupt input should be loud.
  */
case class ProtoDecode(child: Expression, msg: PMessage,
                       lenient: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ProtoSchema.toStructType(msg)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    if (lenient)
      try ProtoWire.decode(input.asInstanceOf[Array[Byte]], msg)
      catch { case _: Exception => null }
    else ProtoWire.decode(input.asInstanceOf[Array[Byte]], msg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder call — no codegen reference to the (non-
    // serializable) ProtoWire singleton; only the PMessage schema ships
    val msgRef = ctx.addReferenceObj("protoMsg", msg,
      classOf[PMessage].getName)
    nullSafeCodeGen(ctx, ev, input =>
      if (lenient)
        s"""try {
           |  ${ev.value} =
           |    graft.sources.proto.ProtoWire.decode($input, $msgRef);
           |} catch (Exception e) {
           |  ${ev.isNull} = true;
           |}""".stripMargin
      else
        s"""${ev.value} =
           |  graft.sources.proto.ProtoWire.decode($input, $msgRef);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): ProtoDecode =
    copy(child = c)
  override def prettyName: String = "proto_decode"
}

case class ProtoEncode(child: Expression, msg: PMessage)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ProtoWire.encode(input.asInstanceOf[InternalRow], msg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msgRef = ctx.addReferenceObj("protoMsg", msg,
      classOf[PMessage].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"""${ev.value} = graft.sources.proto.ProtoWire.encode(
         |  (InternalRow) $input, $msgRef);""".stripMargin)
  }
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
    extends UnaryExpression {
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
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { input =>
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""if ($input.length < 8) {
         |  throw new IllegalArgumentException(
         |    "need 8 bytes, got " + $input.length);
         |}
         |int $off = $input.length - 8;
         |long $acc = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  $acc |= ((long) ($input[$off + $i] & 0xff)) << (8 * $i);
         |}
         |${ev.value} = $acc;""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): LittleEndianLong =
    copy(child = c)
  override def prettyName: String = "le_uint64"
}

/** Writes a long as 8 little-endian bytes — inverse of
  * [[LittleEndianLong]], used to synthesize reference-framed messages
  * (timestamp suffix, main.go:229) in tests and the roundtrip query.
  */
case class LELongBytes(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { input =>
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""byte[] $out = new byte[8];
         |for (int $i = 0; $i < 8; $i++) {
         |  $out[$i] = (byte) (($input >>> (8 * $i)) & 0xff);
         |}
         |${ev.value} = $out;""".stripMargin
    })
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
