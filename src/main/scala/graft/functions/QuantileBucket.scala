package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bucket index of a double against SORTED quantile boundaries — the
  * skew-proof half of Z-ORDER bucketing. The result is
  * `#{boundaries ≤ value}` ∈ [0, B-1]: with B-1 interior quantiles as
  * boundaries this is the value's CDF rank scaled to the bucket range,
  * so every bucket holds ~1/B of the DISTRIBUTION and a zipfian column
  * spreads across the SAME bit range a uniform one does — uniform
  * width_bucket would cram the head into one bucket and cluster
  * nothing. Boundaries keep their DUPLICATES on purpose: a value
  * carrying 50% of the mass contributes ~B/2 equal boundaries, which
  * is exactly what centers it at rank B/2 and pushes its neighbors to
  * the range's ends (deduplicating would collapse the whole
  * distribution into `#distinct values` low indices and starve the
  * interleave of the dimension's high bits). Clamped by construction —
  * the max value can never overflow the interleave's bit budget (the
  * uniform-bucket max-edge bug class).
  *
  * Codegen'd upper-bound binary search against a referenced array:
  * O(log B) per row inside whole-stage codegen — the rewrite pass
  * stays scan-bound. Null in, null out; NaN compares false against
  * every boundary and lands in bucket 0, deterministically. */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bucket"

  override protected def nullSafeEval(v: Any): Any =
    QuantileBucket.bucketOf(boundaries, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantileBucket.bucketOf($bs, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : QuantileBucket = copy(child = newChild)
}

object QuantileBucket {
  /** `#{boundaries ≤ v}` — upper-bound binary search over a sorted
    * array that MAY hold duplicates (the rightmost insertion point;
    * `Arrays.binarySearch` returns an arbitrary duplicate). */
  def bucketOf(bs: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
