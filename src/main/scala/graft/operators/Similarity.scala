package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two variants:
  *  - [[bruteForceTopK]]: exact top-k — broadcast the (small) query set
  *    and stream the corpus once. At 100 TB the corpus side stays
  *    partitioned; only per-partition top-k state exists before the final
  *    k-row-per-query reduction (window over q_id — key cardinality =
  *    #queries, so the shuffle is tiny).
  *  - [[ivfTopK]]: IVF-style scale path — a coarse quantizer (per-label
  *    centroids, i.e. the cluster assignment an offline k-means would
  *    produce) restricts each query to its `nprobe` nearest cells, so
  *    only corpus partitions for probed cells are scanned. Probed-cell
  *    assignment is a broadcast join; no corpus shuffle at all.
  *
  * Scores are rounded to 4 decimals BEFORE ranking on both engines so
  * float-accumulation-order differences can never flip the ranking vs
  * the oracle; ties break on vec_id.
  */
object Similarity {

  val K = 5
  val QueryStride = 50 // vec_id % 50 == 0 → deterministic query set
  val NProbe = 2
  val Dims = 64
  val LshPlanes = 8 // sign-random-projection bits → 256 buckets

  /** Deterministic "random" hyperplanes: u[p][d] derives from
    * md5("rp:p:d") → uniform in [-1, 1). Exactly reproducible in SQL
    * (32-bit hash / 2³² is dyadic → bit-identical doubles). */
  lazy val planes: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(LshPlanes, Dims) { (p, d) =>
      val digest = md.digest(s"rp:$p:${d + 1}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 4) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
      h.toDouble / 4294967296.0 * 2 - 1
    }
  }

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  private def queries(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir).filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

  /** L2-normalized corpus in a typed pass (shared dense kernel shape
    * with Dedup.embeddingNearDup). */
  private def normalized(spark: SparkSession, dir: String) = {
    import spark.implicits._
    corpus(spark, dir).select(col("vec_id"), col("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val n = math.sqrt(s)
        val nv = new Array[Double](v.length)
        i = 0
        while (i < v.length) { nv(i) = v(i) / n; i += 1 }
        (id, nv)
      }
  }

  /** Exact cosine top-k per query (brute force baseline): normalize
    * once, broadcast the query block, stream the corpus through a tight
    * dot-product loop — per-pair Catalyst array folds measured 3-4×
    * slower and with much higher run-to-run variance. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val normed = normalized(spark, dir)
    val qBlock = spark.sparkContext.broadcast(
      normed.filter(_._1 % QueryStride == 0).collect().sortBy(_._1))
    val scored = normed.mapPartitions { it =>
      val qs = qBlock.value
      it.flatMap { case (id, nv) =>
        qs.iterator.filter(_._1 != id).map { case (qId, qnv) =>
          var s = 0.0
          var i = 0
          while (i < nv.length) { s += qnv(i) * nv(i); i += 1 }
          (qId, id,
            BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }
    }.toDF("q_id", "n_id", "sim")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** SRP-LSH top-k: 8 sign-random-projection bits bucket the corpus
    * (one shuffle-free signature pass); each query multi-probes its own
    * bucket plus the 8 hamming-1 neighbors, candidates score by cosine.
    * The scale path for ANN: the candidate join shuffles on the bucket
    * id — corpus vectors never pair beyond shared buckets.
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pl = planes
    val sigs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var s2 = 0.0
        var i = 0
        while (i < v.length) { s2 += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(s2)
        val nv = new Array[Double](v.length)
        i = 0
        while (i < v.length) { nv(i) = v(i) / nrm; i += 1 }
        var bucket = 0
        var p = 0
        while (p < LshPlanes) {
          var dp = 0.0
          var d = 0
          while (d < v.length) { dp += v(d) * pl(p)(d); d += 1 }
          if (dp > 0) bucket |= 1 << p
          p += 1
        }
        (id, bucket, nv)
      }
      .toDF("vec_id", "bucket", "nv")
    val probes = sigs.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("q_id"), col("nv").as("qnv"),
        explode(array((lit(0) +: (0 until LshPlanes).map(p => lit(1 << p))): _*))
          .as("flip"),
        col("bucket"))
      .select(col("q_id"), col("qnv"),
        (col("bucket").bitwiseXOR(col("flip"))).as("key"))
    val cand = sigs.join(probes,
      col("bucket") === col("key") && col("vec_id") =!= col("q_id"))
    val sim = aggregate(
      zip_with(col("qnv"), col("nv"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val scored = cand.select(col("q_id"), col("vec_id").as("n_id"),
      round(sim, 4).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** IVF top-k: centroid per `label` cell (elementwise mean), each query
    * probes its NProbe nearest cells (squared L2, rounded before
    * ranking), search restricted to those cells. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    // per-cell elementwise mean: posexplode → avg per (label, pos) →
    // reassemble ordered array
    val cent = c
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), p => p.getField("m")).as("cv"))
    val dist2 = aggregate(
      zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("d2"), col("label"))
    val probes = queries(spark, dir).join(broadcast(cent))
      .select(col("q_id"), col("qv"), col("label"), round(dist2, 6).as("d2"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= NProbe)
      .select(col("q_id"), col("qv"), col("label"))
    val scored = c.join(broadcast(probes),
        c("label") === probes("label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }
}
