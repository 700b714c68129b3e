package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — Spark
  * has no built-in for it, and a corpus pipeline needs canonical
  * composition BEFORE hashing/deduplication (the same text arriving as
  * precomposed `é` vs `e`+combining-accent must hash identically, or
  * exact dedup silently misses duplicates).
  *
  * Codegen'd (static-forwarder call, same pattern as the proto codec
  * expressions) so it rides inside whole-stage codegen rather than
  * forcing the interpreted path; DuckDB's `nfc_normalize` is the
  * oracle twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.NfcNormalize.normalize($in)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  /** Static forwarder for generated code. Fast path: NFC-normality is
    * checked first (one pass, no allocation) — real corpora are
    * overwhelmingly already composed, so the common case never copies. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
