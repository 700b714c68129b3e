package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Persistent IVF index — the production lifecycle of [[Similarity.ivfTopK]]:
  * build once, write to storage, query many times without touching the
  * full corpus.
  *
  * Layout under `indexPath`:
  * {{{
  *   centroids.parquet            (label, cv) — one row per cell, tiny
  *   cells/label=<L>/part….parquet (vec_id, v) — corpus partitioned by cell
  * }}}
  *
  * The at-scale property this buys over the in-memory operator: queries
  * probe their `NProbe` nearest cells, the probed label set (bounded by
  * the cell count, NOT the corpus) becomes an `IN` predicate on the
  * hive partition column, and the scan reads ONLY the probed cells'
  * files — `PartitionFilters` pruning, asserted in the spec. A 100 TB
  * corpus with 10k cells reads ~`NProbe/10k` of its bytes per query
  * batch; nothing else changes, because scoring reuses the same typed
  * kernel + heap pre-reduction as the in-memory path.
  *
  * Determinism: centroids come from the same [[VectorOps.VecMean]]
  * partial aggregation, scores round to 4 decimals before ranking —
  * query results are bit-identical to [[Similarity.ivfTopK]] over the
  * same data (asserted in the spec).
  */
object IvfIndex {

  /** Build the index from the embeddings table: per-label centroids +
    * the corpus re-written partitioned by cell label. */
  def build(spark: SparkSession, dir: String, indexPath: String): Unit = {
    import spark.implicits._
    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding").cast("array<double>").as("v"))
    val cent = c.select(col("label"), col("v"))
      .as[(Long, Array[Double])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new VectorOps.VecMean(Similarity.Dims).toColumn.name("cv"))
      .toDF("label", "cv")
    cent.repartition(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids.parquet")
    c.repartition(col("label"))
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$indexPath/cells")
  }

  /** The probed-cells corpus scan for a query frame — exposed so the
    * spec can assert partition pruning on its physical plan. */
  private[graft] def probedCells(spark: SparkSession, indexPath: String,
                                 probedLabels: Seq[Long]): DataFrame =
    spark.read.parquet(s"$indexPath/cells")
      .filter(col("label").isin(probedLabels: _*))

  /** Top-k cosine neighbors from the persisted index for the standard
    * deterministic query set (`vec_id % QueryStride == 0`, read from
    * the index itself). Bit-identical to [[Similarity.ivfTopK]]. */
  def topK(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    val cent = spark.read.parquet(s"$indexPath/centroids.parquet")
    val cells = spark.read.parquet(s"$indexPath/cells")
    val q = cells.filter(col("vec_id") % Similarity.QueryStride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qc = q.join(broadcast(cent))
      .select(col("q_id"), col("qv"), col("label"), col("cv"))
      .as[(Long, Array[Double], Long, Array[Double])]
      .map { case (qId, qv, label, cv) =>
        (qId, label, VectorOps.roundAt(VectorOps.dist2(qv, cv), 6))
      }
      .toDF("q_id", "label", "d2")
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("d2"), col("label"))
    val probes = qc.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= Similarity.NProbe)
      .select(col("q_id"), col("label"))
      .join(q, "q_id")
      .select(col("q_id"), col("qv"), col("label"))
    // the probed LABEL SET is bounded by the cell count — collecting it
    // is O(cells), never O(corpus) — and becomes the pruning predicate
    val probedLabels = probes.select("label").distinct()
      .as[Long].collect().toSeq.sorted
    val cand = probedCells(spark, indexPath, probedLabels)
      .join(broadcast(probes),
        Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("vec_id").as("n_id"), col("v"))
      .as[(Long, Array[Double], Long, Array[Double])]
    val k = Similarity.K
    val scored = cand.mapPartitions { it =>
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[Long, VectorOps.TopK]
      it.foreach { case (qId, qv, nId, nv) =>
        heaps.getOrElseUpdate(qId, new VectorOps.TopK(k))
          .insert(VectorOps.roundAt(VectorOps.cosineRaw(qv, nv), 4), nId)
      }
      heaps.iterator.flatMap { case (qId, h) =>
        h.drain().map { case (sim, nId) => (qId, nId, sim) }
      }
    }.toDF("q_id", "n_id", "sim")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }
}
