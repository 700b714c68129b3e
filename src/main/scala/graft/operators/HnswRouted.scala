package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sharded (routed) HNSW — the DISTRIBUTED answer to [[HnswIndex]]'s
  * sequential-build bottleneck: instead of one driver-built graph over
  * the whole corpus, one graph PER IVF CELL, each built in parallel on
  * the executors (a cell's build is sequential, but cells don't talk
  * to each other), persisted label-partitioned on disk. A query
  * resolves its `NProbe` nearest cells from the centroid table (the
  * exact arithmetic of [[Similarity.ivfTopK]]), the scan reads ONLY
  * the probed cells' files, and each probed cell answers with its own
  * beam search; the per-cell top-k merge is the classic distributed
  * top-k. Build is `corpus / cells` wall-clock on enough executors;
  * nothing is ever collected to the driver but the centroid table and
  * the capped query block — at 100 TB this is the HNSW deployment
  * shape (FAISS's IVF+HNSW-per-list, Vespa/Milvus's segment graphs).
  *
  * Exactness contract: while every cell holds ≤ [[RoutedEf]] vectors,
  * the level-0 beam visits the whole cell and the per-cell top-k is
  * EXACT, so the composed result equals "probe cells, score exactly"
  * — i.e. [[Similarity.ivfTopK]]'s semantics with normalized-dot
  * scoring — and the `sim_hnsw_routed` oracle restates it
  * relationally. Past that cell size the graphs go genuinely
  * sub-linear per cell and recall follows the measured
  * `sim_recall_matrix` discipline instead (the same statement the flat
  * [[HnswIndex]] makes about [[HnswIndex.EfSearch]]).
  *
  * Layout under `indexPath`:
  * {{{
  *   centroids.v1.parquet        (label, cv) — raw-space cell means.
  *   cells.v1/label=<L>/…        (vec_id, level, nv, nbrs) — cell L's
  *                               graph rows, normalized vectors.
  *   _commits/{centroids.v1, cells.v1}
  * }}}
  */
object HnswRouted {

  /** Query-time beam width per cell — also the cell size up to which
    * the per-cell search is provably exhaustive (the oracle contract). */
  val RoutedEf = 256

  private val CellSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("level", IntegerType),
    StructField("nv", ArrayType(DoubleType)),
    StructField("nbrs", ArrayType(ArrayType(LongType))),
    StructField("label", LongType)))

  /** Build one graph per `label` cell, in parallel, from the standard
    * embeddings corpus under `dir`. */
  def build(spark: SparkSession, dir: String, indexPath: String): Unit =
    IndexStore.withLock(spark, indexPath) {
      import spark.implicits._
      val typed = Similarity.corpus(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("v"))
        .as[(Long, Long, Array[Double])]
      // raw-space centroids — the probe table (ivfTopK's arithmetic)
      val cents = typed.groupByKey(_._2).mapValues(_._3)
        .agg(new VectorOps.VecMean(Similarity.Dims).toColumn.name("cv"))
        .toDF("label", "cv")
      cents.coalesce(1).write.mode("overwrite")
        .parquet(s"$indexPath/centroids.v1.parquet")
      // one sequential graph build PER CELL, cells in parallel
      val cellRows = typed
        .map { case (id, label, v) => (label, id, VectorOps.l2Normalize(v)) }
        .groupByKey(_._1)
        .flatMapGroups { (label, rows) =>
          val sorted = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
          require(sorted.length <= HnswIndex.MaxBuild,
            s"cell $label exceeds the per-cell build gate " +
              s"(${HnswIndex.MaxBuild}) — re-cluster with more cells")
          val g = HnswIndex.buildGraph(sorted)
          g.nodes.toSeq.sortBy(_._1).iterator.map {
            case (id, (nv, per)) =>
              (id, per.length - 1, nv, per.map(_.toSeq).toSeq, label)
          }
        }
        .toDF("vec_id", "level", "nv", "nbrs", "label")
      cellRows.write.mode("overwrite").partitionBy("label")
        .parquet(s"$indexPath/cells.v1")
      val (hfs, p) = IndexStore.fs(spark, indexPath)
      IndexStore.mark(hfs, p, "centroids.v1")
      IndexStore.mark(hfs, p, "cells.v1")
    }

  /** Answer the standard query set: driver probe selection over the
    * centroid table (identical ordering to [[Similarity.ivfTopK]] —
    * round-6 d², ties by label), partition-pruned scan of the probed
    * cells, per-cell beam search, distributed top-k merge. */
  def query(spark: SparkSession, dir: String, indexPath: String): DataFrame = {
    import spark.implicits._
    IndexStore.requireVersion(spark, indexPath, "cells.v", "routed HNSW cells")
    val cents = spark.read.parquet(s"$indexPath/centroids.v1.parquet")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val qRows = Similarity.corpus(spark, dir)
      .select(col("vec_id"), col("v"))
      .filter(col("vec_id") % Similarity.QueryStride === 0)
      .as[(Long, Array[Double])]
      .limit(Similarity.MaxQueryBlock + 1).collect().sortBy(_._1)
    require(qRows.length <= Similarity.MaxQueryBlock,
      s"routed HNSW query block exceeds the cap " +
        s"(${Similarity.MaxQueryBlock})")
    // probes per cell: label -> [(q_id, normalized query)]
    val probes: Map[Long, Array[(Long, Array[Double])]] = qRows
      .flatMap { case (qId, qv) =>
        cents.map { case (l, cv) =>
            (VectorOps.roundAt(VectorOps.dist2(qv, cv), 6), l)
          }.sorted.take(Similarity.NProbe)
          .map { case (_, l) => (l, (qId, VectorOps.l2Normalize(qv))) }
      }
      .groupBy(_._1).map { case (l, hits) =>
        l -> hits.map(_._2).sortBy(_._1)
      }
    val probedLabels = probes.keys.toSeq.sorted
    val bc = spark.sparkContext.broadcast(probes)
    val k = Similarity.K
    val ef = RoutedEf
    // partition-pruned scan: only probed cells' files are read
    val cells = spark.read.schema(CellSchema)
      .option("basePath", s"$indexPath/cells.v1")
      .parquet(s"$indexPath/cells.v1")
      .filter(col("label").isin(probedLabels: _*))
      .as[(Long, Int, Array[Double], Array[Array[Long]], Long)]
    val scored = cells.groupByKey(_._5).flatMapGroups { (label, rows) =>
      val rs = rows.toArray
      val nodes = rs.iterator
        .map { case (id, _, nv, per, _) => id -> (nv, per) }.toMap
      val (entryLevel, entry) = rs.iterator
        .map { case (id, lvl, _, _, _) => (lvl, id) }
        .foldLeft((-1, Long.MaxValue)) { case ((bl, bi), (l, i)) =>
          if (l > bl || (l == bl && i < bi)) (l, i) else (bl, bi)
        }
      val g = HnswIndex.Graph(nodes, entry, entryLevel)
      bc.value.getOrElse(label, Array.empty).iterator.flatMap {
        case (qId, qnv) =>
          HnswIndex.searchTopK(g, qId, qnv, k, ef).map {
            case (_, nId, sim) => (qId, nId, sim)
          }
      }
    }.toDF("q_id", "n_id", "sim")
    // distributed top-k merge across the probed cells
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** `sim_hnsw_routed`: build the sharded graphs, answer the standard
    * query set. Memoized per (session, dir) like the other ANN rows. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    MemoStats.cached(memo, (spark, dir)) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-hnsw-routed").toString
      try {
        build(spark, dir, root)
        Scratch.materializeAndClean(root, query(spark, dir, root))
      } catch { case e: Throwable =>
        Scratch.rm(new java.io.File(root)); throw e
      }
    }

  private val memo = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), DataFrame]

  def clearMemo(): Unit = memo.clear()
}
