package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership probe as a native Catalyst expression.
  *
  * The first cut of this predicate composed k SQL terms of
  * `element_at(lit(<16384 longs>), …)` — correct, but the 128 KiB
  * literal array lived in the expression TREE: every optimizer
  * traversal, AQE replan and codegen pass re-walked (and every task
  * binary re-shipped) it, and profiling showed the query spending more
  * wall time in driver plan processing than in its jobs. Here the word
  * array is a codegen REFERENCE OBJECT (`ctx.addReferenceObj`) — one
  * pointer in the plan, one tight static-forwarder call per row, still
  * inside whole-stage codegen.
  *
  * Hashing replicates `xxhash64(lit(i), s)` bit-for-bit (probe i's
  * seed is the xxhash64 of i under Spark's default seed 42), so a
  * filter BUILT with the SQL expression is probed compatibly — the
  * no-false-negatives contract the decontamination confirm join
  * depends on.
  */
case class BloomMightContain(child: Expression, words: Array[Long],
                             numHashes: Int, numBits: Long)
    extends UnaryExpression {
  private val seeds: Array[Long] = BloomMightContain.seedsFor(numHashes)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    BloomMightContain.probe(input.asInstanceOf[UTF8String],
      words, seeds, numBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val s = ctx.addReferenceObj("bloomSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.BloomMightContain.probe($in, $w, $s, ${numBits}L)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomMightContain {
  /** Probe seeds replaying `xxhash64(lit(i), s)`: Spark folds the
    * columns left-to-right with the running hash as seed, so probe i's
    * effective string seed is xxhash64's value of the int i under the
    * default seed 42. */
  def seedsFor(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i =>
      XxHash64Function.hash(i, IntegerType, 42L))

  /** Static forwarder for generated code: k hash-shift-test terms,
    * short-circuiting on the first clear bit. */
  def probe(s: UTF8String, words: Array[Long], seeds: Array[Long],
            numBits: Long): Boolean = {
    var i = 0
    while (i < seeds.length) {
      val h = XxHash64Function.hash(s, StringType, seeds(i))
      val pos = ((h % numBits) + numBits) % numBits
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
