package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Shared typed dense-vector kernel for the similarity / dedup family.
  *
  * All scalar loops accumulate SEQUENTIALLY (index 0 → n-1) so results
  * are bit-identical with the DuckDB oracle's `list_sum(list_transform
  * (...))` left-folds, and all rounding is half-up to a fixed number of
  * decimals BEFORE any threshold or ranking — float-accumulation-order
  * differences can then never flip a comparison between engines.
  *
  * This is the one dot-product kernel used by brute-force, IVF and
  * SRP-LSH ANN and by the embedding near-dup operator (per-pair Catalyst
  * array folds measured 3-4× slower with much higher variance — see
  * commit 561e338).
  */
private[graft] object VectorOps {

  /** Sequential dot product. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Sequential sum of squares (= dot(v, v), kept explicit so the
    * accumulation shape mirrors the oracle's `list_sum(list_transform(v,
    * x -> x*x))`). */
  def sumSq(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  /** L2-normalized copy. */
  def l2Normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(sumSq(v))
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i) / n; i += 1 }
    out
  }

  /** Cosine over RAW vectors in the oracle's exact expression shape:
    * `dot / (sqrt(sumsq a) * sqrt(sumsq b))` — one division at the end. */
  def cosineRaw(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(sumSq(a)) * math.sqrt(sumSq(b)))

  /** Squared L2 distance, sequential. */
  def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Half-up rounding to `scale` decimals (matches both Spark `round`
    * and DuckDB `round`). */
  def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Bounded top-k accumulator ordered by (sim DESC, id ASC) — exactly
    * the `row_number() OVER (ORDER BY sim DESC, n_id)` ranking, so
    * keeping k entries per partition and re-ranking after the exchange
    * is lossless. Memory is O(k); used per (query × partition).
    */
  final class TopK(k: Int) {
    // min-heap on goodness: root = worst kept entry. "Worse" = lower
    // sim, or equal sim and larger id — i.e. max of (-sim, id).
    private val heap = scala.collection.mutable.PriorityQueue
      .empty[(Double, Long)](Ordering.by(t => (-t._1, t._2)))

    def insert(sim: Double, id: Long): Unit =
      if (heap.size < k) heap.enqueue((sim, id))
      else {
        val worst = heap.head
        if (sim > worst._1 || (sim == worst._1 && id < worst._2)) {
          heap.dequeue()
          heap.enqueue((sim, id))
        }
      }

    def drain(): Iterator[(Double, Long)] = heap.iterator
  }

  /** Fixed-point scale for branch-invariant centroid sums. Summing
    * `rint(v·10⁹)` longs is EXACT and order-independent (integer
    * addition is associative + commutative), unlike double sums whose
    * low bits depend on reduction order — which is what makes the
    * driver-side and distributed Lloyd branches bit-identical by
    * construction rather than by round-6 masking. Capacity: unit-scale
    * embedding coordinates overflow a long only past ~9·10⁹ members in
    * ONE cluster (2⁶³/10⁹) — k-means keeps K ∝ n well above that. The
    * 0.5·10⁻⁹ quantization error is three orders below the round-6
    * boundary the centroids are published at. */
  val CentroidQuantScale: Double = 1e9

  def quantize(x: Double): Long = math.rint(x * CentroidQuantScale).toLong

  /** The one shared sum→mean path both Lloyd branches must call so the
    * trained model is branch-invariant: same exact long sum, same
    * float ops, same rounding. */
  def qMean(sum: Long, cnt: Long): Double =
    roundAt(sum.toDouble / CentroidQuantScale / cnt, 6)

  /** Typed elementwise-mean aggregator (the IVF centroid pass): partial
    * sums merge associatively, so Catalyst runs it as a partial
    * aggregation before the (tiny, one-row-per-label) exchange — no row
    * explosion, no wide shuffle.
    */
  final class VecMean(dims: Int)
      extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)
    def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    def finish(r: (Array[Double], Long)): Array[Double] = {
      val out = new Array[Double](dims)
      var i = 0
      while (i < dims) { out(i) = r._1(i) / r._2; i += 1 }
      out
    }
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoders.doubleArray, Encoders.scalaLong)
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoders.doubleArray
  }

  /** Quantized twin of [[VecMean]] for the distributed Lloyd branch:
    * accumulates exact `quantize`d long sums, finishes through
    * [[qMean]]. Because every partial is an integer vector, the merge
    * tree's shape (partition order, AQE coalescing, speculative
    * re-runs) cannot change the result — the property the driver-side
    * branch gets for free from its sequential loop. */
  final class VecMeanQ(dims: Int)
      extends Aggregator[Array[Double], (Array[Long], Long), Array[Double]] {
    def zero: (Array[Long], Long) = (new Array[Long](dims), 0L)
    def reduce(b: (Array[Long], Long), v: Array[Double]): (Array[Long], Long) = {
      var i = 0
      while (i < dims) { b._1(i) += quantize(v(i)); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dims) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    def finish(r: (Array[Long], Long)): Array[Double] = {
      val out = new Array[Double](dims)
      var i = 0
      while (i < dims) { out(i) = qMean(r._1(i), r._2); i += 1 }
      out
    }
    def bufferEncoder: Encoder[(Array[Long], Long)] =
      Encoders.tuple(ExpressionEncoders.longArray, Encoders.scalaLong)
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoders.doubleArray
  }

  private object ExpressionEncoders {
    val doubleArray: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    val longArray: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
