package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent PQ index — the production lifecycle of
  * [[Similarity.pqTopK]]: train codebooks and encode once, write to
  * storage, query many times scanning ONLY the packed codes.
  *
  * Layout under `indexPath`:
  * {{{
  *   codebooks.parquet (m, cid, cv)    — PqM×PqK rows, a few KB
  *   codes.parquet     (vec_id, code)  — ONE BIGINT per vector
  * }}}
  *
  * The at-scale property this buys over the in-memory operator: the
  * per-query-batch scan reads 8 bytes per corpus vector (the packed
  * code) instead of the 512-byte float64 vector — a 100 TB embedding
  * corpus becomes a ~1.6 TB code table that a modest cluster scans
  * from memory. Raw vectors are touched only for the ≤ queries ×
  * PqRerank re-rank candidates (at scale, keep the raw table sorted by
  * vec_id so the candidate-id predicate prunes row groups).
  *
  * Determinism: codebooks round-trip parquet exactly (binary doubles),
  * encoding/ADC/re-rank reuse [[Similarity.pqTopK]]'s integer-exact
  * arithmetic — query results are bit-identical to the in-memory
  * operator over the same data (asserted in the spec).
  */
object PqIndex {

  /** Bits per subspace code (log₂ PqK). */
  private val CodeBits = 4

  /** Train codebooks over `dir`'s embeddings and write codebooks +
    * packed codes. */
  def build(spark: SparkSession, dir: String, indexPath: String): Unit = {
    import spark.implicits._
    val cents = Similarity.pqCodebooks(spark, dir)
    val m0 = Similarity.PqM
    val sd = Similarity.PqSubDim
    cents.zipWithIndex.flatMap { case (cb, m) =>
      cb.zipWithIndex.map { case (cv, cid) => (m, cid, cv) }
    }.toSeq.toDF("m", "cid", "cv")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$indexPath/codebooks.parquet")
    Similarity.normalized(spark, dir)
      .map { case (id, nv) =>
        var code = 0L
        var m = 0
        while (m < m0) {
          code |= Similarity
            .pqArgmin(cents(m), nv.slice(m * sd, (m + 1) * sd))
            .toLong << (CodeBits * m)
          m += 1
        }
        (id, code)
      }
      .toDF("vec_id", "code")
      .write.mode("overwrite").parquet(s"$indexPath/codes.parquet")
  }

  /** Codebooks back from storage: cents(m)(cid). */
  private[graft] def loadCodebooks(spark: SparkSession, indexPath: String)
      : Array[Array[Array[Double]]] = {
    import spark.implicits._
    val cbRows = spark.read.parquet(s"$indexPath/codebooks.parquet")
      .as[(Int, Int, Array[Double])].collect()
    val nCents = cbRows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Double]](Similarity.PqM, nCents)
    cbRows.foreach { case (m, cid, cv) => cents(m)(cid) = cv }
    cents
  }

  /** Stateless encode stage — batch OR streaming: annotate a frame
    * carrying an `embedding` array column with the packed PQ `code`,
    * using the persisted index's codebooks (read once at plan time,
    * riding the closure). The incremental-index-maintenance path: new
    * corpus vectors arriving on a stream are encoded in-flight and
    * appended to the code table; codes are bit-identical to
    * [[build]]'s (asserted in the spec), so the reader never knows
    * which path produced a code. */
  def encodeStage(vecs: org.apache.spark.sql.DataFrame,
                  indexPath: String): org.apache.spark.sql.DataFrame = {
    val cents = loadCodebooks(vecs.sparkSession, indexPath)
    val m0 = Similarity.PqM
    val sd = Similarity.PqSubDim
    val enc = udf((v: Seq[Double]) => {
      val nv = VectorOps.l2Normalize(v.toArray)
      var code = 0L
      var m = 0
      while (m < m0) {
        code |= Similarity.pqArgmin(cents(m), nv.slice(m * sd, (m + 1) * sd))
          .toLong << (CodeBits * m)
        m += 1
      }
      code
    })
    vecs.withColumn("code", enc(col("embedding").cast("array<double>")))
  }

  /** Top-k cosine neighbors from the persisted index for the standard
    * deterministic query set. The ADC scan touches only
    * `codes.parquet`; raw vectors are read for the query block and the
    * re-rank candidates. Bit-identical to [[Similarity.pqTopK]]. */
  def topK(spark: SparkSession, dir: String, indexPath: String)
      : DataFrame = {
    import spark.implicits._
    val m0 = Similarity.PqM
    val sd = Similarity.PqSubDim
    val cents = loadCodebooks(spark, indexPath)
    val nCents = cents(0).length
    val normed = Similarity.normalized(spark, dir)
    val qRows = normed.filter(_._1 % Similarity.QueryStride == 0)
      .collect().sortBy(_._1)
    require(qRows.length <= Similarity.MaxQueryBlock,
      s"PQ query block has ${qRows.length} vectors" +
        s" (cap ${Similarity.MaxQueryBlock})")
    val adcT: Array[Array[Array[Long]]] = qRows.map { case (_, qv) =>
      Array.tabulate(m0, nCents) { (m, c) =>
        math.floor(VectorOps.dist2(
          qv.slice(m * sd, (m + 1) * sd), cents(m)(c)) * 1e6).toLong
      }
    }
    val bc = spark.sparkContext.broadcast((qRows.map(_._1), adcT))
    val r = Similarity.PqRerank
    val codeMask = (1L << CodeBits) - 1
    // the hot scan: 8-byte codes only, ADC via table lookups
    val cand = spark.read.parquet(s"$indexPath/codes.parquet")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val (qIds, t) = bc.value
        val heaps = Array.fill(qIds.length)(new VectorOps.TopK(r))
        it.foreach { case (id, code) =>
          var qi = 0
          while (qi < qIds.length) {
            if (qIds(qi) != id) {
              var adc = 0L
              var m = 0
              while (m < m0) {
                adc += t(qi)(m)(((code >> (CodeBits * m)) & codeMask).toInt)
                m += 1
              }
              heaps(qi).insert(-adc.toDouble, id)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.drain().map { case (negAdc, nId) => (qIds(qi), nId, -negAdc.toLong) }
        }
      }.toDF("q_id", "n_id", "adc")
    val wCand = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("n_id"))
    val topCand = cand.withColumn("pr", row_number().over(wCand))
      .filter(col("pr") <= r).select(col("q_id"), col("n_id"))
    val qMap = spark.sparkContext.broadcast(qRows.toMap)
    val rer = normed.toDF("vec_id", "nv")
      .join(broadcast(topCand), col("vec_id") === col("n_id"))
      .select(col("q_id"), col("n_id"), col("nv"))
      .as[(Long, Long, Array[Double])]
      .map { case (qId, nId, nv) =>
        (qId, nId, VectorOps.roundAt(VectorOps.dot(qMap.value(qId), nv), 4))
      }
      .toDF("q_id", "n_id", "sim")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    rer.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Similarity.K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }
}
