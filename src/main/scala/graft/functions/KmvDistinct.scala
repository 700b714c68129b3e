package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * `TypedImperativeAggregate` — the sketch-aggregate extension point
  * SURVEY §7.2 anticipated. Keeps the k smallest 32-bit md5-derived
  * hashes of the input; estimate = (k−1)·2³² / h_k (or the exact set
  * size below k). Mergeable buffers → partial aggregation and shuffle
  * behave exactly like any built-in aggregate; memory is O(k) per
  * group regardless of cardinality.
  *
  * Unlike HLL (`approx_count_distinct`), the md5-based KMV estimate is
  * engine-reproducible, so the DuckDB oracle asserts the exact same
  * number — an *oracle-checkable* approximate aggregate.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def hash32(v: Any): Long = {
    val md = KmvDistinct.digest.get() // per-thread reuse: getInstance on
    // the per-row hot path costs a JCA lookup + allocation each call
    val d = md.digest(
      ("kmv:" + v.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  private def trim(buf: java.util.TreeSet[Long]): Unit =
    while (buf.size > k) buf.remove(buf.last)

  override def update(buf: java.util.TreeSet[Long],
                      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) { buf.add(hash32(v)); trim(buf) }
    buf
  }

  override def merge(b1: java.util.TreeSet[Long],
                     b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    b1.addAll(b2); trim(b1); b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      val hk = buf.last.toDouble
      BigDecimal((k - 1).toDouble * 4294967296.0 / hk)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(h => out.writeLong(h))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[Long]()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvDistinct = copy(child = c.head)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def kmvDistinct(c: Column, k: Int): Column =
    column(KmvDistinct(expression(c), k).toAggregateExpression())
}
