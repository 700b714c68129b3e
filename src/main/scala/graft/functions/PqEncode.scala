package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

import graft.operators.{Similarity, VectorOps}

/** PQ packed-code encoding as a native Catalyst expression — the
  * in-flight half of the PQ index's incremental path
  * ([[graft.operators.PqIndex.encodeStage]]): an embedding column is
  * L2-normalized and each subspace takes its argmin sub-centroid,
  * packed into one BIGINT.
  *
  * The first cut was a Scala UDF: correct, but every row paid the
  * encoder round-trip (ArrayData → Seq[Double] → boxed Long) on a
  * numeric kernel, in a streaming stage. Here the frozen codebooks
  * ride the plan as ONE codegen reference object (the same discipline
  * as [[BloomMightContain]] and [[ClassifierScore]]) and encoding is a
  * single static call per row inside whole-stage codegen, reading the
  * array column's primitive doubles directly.
  *
  * The kernel is byte-identical to the batch writer's
  * ([[Similarity.pqArgmin]] over [[VectorOps.l2Normalize]]) — asserted
  * in PqIndexSpec's stream-vs-index parity test and oracle-gated by
  * `sim_pq_incremental`. */
case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("pqCodebooks", cents, "double[][][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.PqEncode.encode($in, $c)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {
  /** Static forwarder for generated code: normalize → per-subspace
    * argmin → pack (CodeBits bits per subspace). */
  def encode(arr: ArrayData, cents: Array[Array[Array[Double]]]): Long = {
    val nv = VectorOps.l2Normalize(arr.toDoubleArray())
    val m0 = Similarity.PqM
    val sd = Similarity.PqSubDim
    var code = 0L
    var m = 0
    while (m < m0) {
      code |= Similarity.pqArgmin(cents(m), nv.slice(m * sd, (m + 1) * sd))
        .toLong << (Similarity.PqCodeBits * m)
      m += 1
    }
    code
  }
}
