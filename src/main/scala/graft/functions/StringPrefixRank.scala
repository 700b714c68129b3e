package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving numeric surrogate of a string — the bridge that
  * lets Z-ORDER cluster string keys through the SAME quantile pipeline
  * the numeric dimensions use (`percentile_approx` → [[QuantileBucket]]
  * binary search), instead of growing a parallel string-boundary path.
  *
  * The surrogate is the big-endian value of six UTF-8 bytes starting at
  * `skip`, as a double: 48 bits, exactly representable (a full 8 bytes
  * would exceed the 53-bit mantissa and silently tie values differing
  * in the low bits). Unsigned byte order IS Spark's string order
  * (UTF8String.compareTo), so the projection is monotone: a ≤ b ⇒
  * rank(a) ≤ rank(b). Ties (strings equal through byte skip+6) only
  * coarsen bucketing — clustering quality, never correctness, the same
  * degrade law as every other layout decision in the engine.
  *
  * `skip` exists because real string keys share long prefixes (URLs:
  * `https://…`): six bytes of `https:` discriminate nothing. The caller
  * ([[graft.sources.GraftTable.zorder]]) computes the common prefix of
  * the column's min and max — every value shares it, by the definition
  * of min/max — and ranks the bytes where values actually differ.
  *
  * Null in, null out. Strings shorter than the window rank as if
  * zero-padded, which sorts them below their extensions — consistent
  * with bytewise order on the window. */
case class StringPrefixRank(child: Expression, skip: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "string_prefix_rank"

  override protected def nullSafeEval(v: Any): Any =
    StringPrefixRank.rank(v.asInstanceOf[UTF8String], skip)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringPrefixRank.rank($c, $skip);")

  override protected def withNewChildInternal(newChild: Expression)
      : StringPrefixRank = copy(child = newChild)
}

object StringPrefixRank {
  /** Big-endian value of UTF-8 bytes [skip, skip+6) — 48 bits, exact
    * in a double; absent bytes contribute zero. */
  def rank(s: UTF8String, skip: Int): Double = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < 6) {
      acc <<= 8
      val p = skip + i
      if (p < n) acc |= (s.getByte(p) & 0xffL)
      i += 1
    }
    acc.toDouble
  }

  /** Byte length of the common prefix of two strings in UTF-8 —
    * the `skip` for a column whose min/max these are. */
  def commonPrefixBytes(a: UTF8String, b: UTF8String): Int = {
    val n = math.min(a.numBytes, b.numBytes)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    i
  }
}
