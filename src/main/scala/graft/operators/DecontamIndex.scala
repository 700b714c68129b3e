package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent decontamination index — the production lifecycle of
  * [[Dedup.decontaminateBloom]]: shingle the eval/benchmark set ONCE,
  * persist the distinct shingle table plus its built Bloom filter, and
  * decontaminate every corpus shard/run against the stored artifact.
  * An eval suite changes rarely; a 100 TB corpus is decontaminated
  * shard by shard, run after run — re-deriving the eval side each time
  * is pure waste, and shipping the filter as data (not rebuilding it
  * from documents) is what lets a thousand shard jobs share one build.
  *
  * Layout under `indexPath` (all paths via Hadoop FileSystem — local,
  * HDFS, or object store alike; see [[IndexStore]]):
  * {{{
  *   shingles.parquet/     (s)       distinct eval shingles (confirm
  *                         join side), append-only across [[merge]]s.
  *   bloom.v<N>.parquet/   (w, bits) filter VERSION N: the filter's
  *                         non-zero 64-bit words plus one geometry row
  *                         (w = -1, bits = dense word count — sparse
  *                         rows alone cannot encode trailing zero
  *                         words or an empty filter). ≤ m/64 + 1 rows
  *                         — the artifact is bounded by filter
  *                         geometry, ~128 KiB at the default m, and
  *                         fully self-describing: no sidecar file.
  *   _commits/bloom.v<N>   version N's publish marker; readers load
  *                         the newest marked version.
  * }}}
  *
  * Crash discipline — the one failure a Bloom must NEVER have is a
  * false negative (a silently missed contamination), so every write
  * order errs toward false positives:
  *  - [[merge]] publishes the NEW filter version (already OR-ing the
  *    incoming batch's bits) BEFORE appending the batch's shingles. A
  *    crash between the two leaves orphaned filter bits — harmless,
  *    the confirm join removes the extra probes — and queries answer
  *    exactly as before the merge; a retry re-derives the same delta
  *    (the anti-join sees the unchanged shingle table) and completes
  *    it. The reverse order would open a window where a stored shingle
  *    has no filter bits: a permanent false negative.
  *  - filter versions are write-new-then-retire ([[IndexStore]]): the
  *    superseded version is deleted only after the replacement's
  *    marker exists, so readers always find a complete filter.
  *
  * Query = [[Dedup.decontaminateBloomFrames]] over the loaded artifact:
  * codegen'd Bloom probe discards ~96 % of corpus shingles before any
  * shuffle, confirm join removes false positives — results
  * bit-identical to the from-scratch operator (no false negatives),
  * asserted in the spec and hash-gated as `dedup_decontam_persist`.
  *
  * Writers (build/merge) serialize per root via
  * [[IndexStore.withLock]]; readers never block.
  */
object DecontamIndex {

  private val BloomMarker = "bloom.v"

  private def bloomDir(root: String, v: Long) = s"$root/bloom.v$v.parquet"

  private def bloomVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (hfs, p) = IndexStore.fs(spark, root)
    IndexStore.markedIds(hfs, p, BloomMarker)
  }

  /** Shingle `evalDocs` (doc_id, text), build the filter, persist both,
    * replacing any prior index at `indexPath`. The Bloom is sized to
    * the DISTINCT shingle count ([[Dedup.bloomBitsFor]]) so a larger
    * eval suite gets a larger filter at build time. Shingles are
    * written first, the marked filter last: an interrupted build has
    * no committed filter and [[loadBloom]] fails loudly ("re-run
    * build") instead of probing a half-written artifact. */
  def build(evalDocs: DataFrame, indexPath: String): Unit =
    IndexStore.withLock(evalDocs.sparkSession, indexPath) {
      val spark = evalDocs.sparkSession
      val (hfs, p) = IndexStore.fs(spark, indexPath)
      IndexStore.resetRoot(hfs, p)
      val sh = Dedup.shinglesOf(evalDocs)
        .select(explode(col("sh")).as("s")).distinct()
      sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sh.write.mode("overwrite").parquet(s"$indexPath/shingles.parquet")
        val bits = Dedup.bloomBitsFor(sh.count())
        writeBloom(spark, indexPath, 1L, Dedup.bloomBuild(sh, "s", bits))
      } finally sh.unpersist(blocking = false)
    }

  /** Write filter version `v` (sparse words + geometry row) and mark
    * it — the version's atomic publish point. */
  private def writeBloom(spark: SparkSession, indexPath: String, v: Long,
                         words: Array[Long]): Unit = {
    import spark.implicits._
    val rows = words.zipWithIndex
      .collect { case (w, i) if w != 0L => (i, w) }.toSeq :+
      (-1, words.length.toLong)
    rows.toDF("w", "bits").coalesce(1)
      .write.mode("overwrite").parquet(bloomDir(indexPath, v))
    val (hfs, p) = IndexStore.fs(spark, indexPath)
    IndexStore.mark(hfs, p, s"$BloomMarker$v")
  }

  /** A planned merge: the genuinely new shingles (materialized,
    * lineage-free), the words of the next filter version, and that
    * version's id. */
  private[graft] case class MergePlan(fresh: DataFrame, words: Array[Long],
                                      version: Long)

  /** Compute what a merge would write, against the CURRENT committed
    * state: only the genuinely new distinct shingles (a duplicate
    * shingle row would double-count every `n_shared` the confirm join
    * produces), and the grown filter — updated by OR-ing the delta's
    * words (Bloom insertion is monotone) while the stored geometry
    * still satisfies [[Dedup.bloomBitsFor]] for the grown set, rebuilt
    * at the correct size over existing ∪ fresh when the set outgrows
    * it (never left undersized: an undersized filter stays CORRECT,
    * only its false-positive rate decays; the rebuild keeps the
    * probe's selectivity contract). Returns None when nothing is new. */
  private[graft] def planMerge(newEvalDocs: DataFrame,
                               indexPath: String): Option[MergePlan] = {
    val spark = newEvalDocs.sparkSession
    val existing = spark.read.parquet(s"$indexPath/shingles.parquet")
    // count BEFORE any write below, and pin `fresh` lineage-free
    // (Materialize = eager localCheckpoint): both frames read the very
    // path [[commitShingles]] appends to, so a lazy plan — or a
    // cache-evicted recompute — would silently see the appended files
    val nExisting = existing.count()
    val fresh = Materialize(
      Dedup.shinglesOf(newEvalDocs)
        .select(explode(col("sh")).as("s")).distinct()
        .join(existing, Seq("s"), "left_anti"))
    val nFresh = fresh.count()
    if (nFresh == 0) None
    else {
      val words = loadBloom(spark, indexPath)
      val bitsNeeded = Dedup.bloomBitsFor(nExisting + nFresh)
      val rebuilt =
        if (bitsNeeded > words.length * 64) {
          // geometry outgrown: rebuild over existing ∪ fresh — the
          // union FRAME, not the table path, which does not hold the
          // fresh shingles yet (the filter commits first)
          Dedup.bloomBuild(existing.union(fresh), "s", bitsNeeded)
        } else {
          val delta = Dedup.bloomBuild(fresh, "s", words.length * 64)
          var i = 0
          while (i < words.length) { words(i) |= delta(i); i += 1 }
          words
        }
      Some(MergePlan(fresh, rebuilt,
        bloomVersions(spark, indexPath).max + 1))
    }
  }

  /** Merge step 1: publish the grown filter as a new version. */
  private[graft] def commitBloom(spark: SparkSession, indexPath: String,
                                 plan: MergePlan): Unit =
    writeBloom(spark, indexPath, plan.version, plan.words)

  /** Merge step 2: append the new shingles — the merge's semantic
    * commit point (the confirm join now sees them). */
  private[graft] def commitShingles(indexPath: String,
                                    plan: MergePlan): Unit =
    plan.fresh.write.mode("append").parquet(s"$indexPath/shingles.parquet")

  /** Merge step 3: retire superseded filter versions, KEEPING the
    * immediately-previous one as a grace copy for readers that
    * resolved it just before the new version published (it falls out
    * at the next merge — bounded at two live ~128 KiB versions).
    * Crash-safe in any order after the new version is live. */
  private def retireBlooms(spark: SparkSession, indexPath: String,
                           keep: Long): Unit = {
    val (hfs, p) = IndexStore.fs(spark, indexPath)
    bloomVersions(spark, indexPath).filter(_ < keep - 1)
      .foreach(v => IndexStore.unmark(hfs, p, s"$BloomMarker$v"))
    // sweep every unmarked filter dir (incl. orphans of a crash between
    // a past retire's unmark and delete)
    val live = bloomVersions(spark, indexPath).toSet
    hfs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val orphan = n.startsWith("bloom.v") && n.endsWith(".parquet") &&
        scala.util.Try(n.stripPrefix("bloom.v").stripSuffix(".parquet").toLong)
          .toOption.exists(v => !live.contains(v))
      if (orphan) IndexStore.deleteTree(hfs, st.getPath)
    }
  }

  /** Extend the index with a NEW eval batch (benchmark suites grow):
    * filter version first, shingles second, retire last — see the
    * class doc's crash discipline. The result is bit-identical to a
    * fresh [[build]] over the union (spec'd, and the build→merge→query
    * lifecycle is oracle-gated by `dedup_decontam_persist`). */
  def merge(newEvalDocs: DataFrame, indexPath: String): Unit =
    IndexStore.withLock(newEvalDocs.sparkSession, indexPath) {
      val spark = newEvalDocs.sparkSession
      planMerge(newEvalDocs, indexPath).foreach { plan =>
        commitBloom(spark, indexPath, plan)
        commitShingles(indexPath, plan)
        retireBlooms(spark, indexPath, plan.version)
      }
    }

  /** Load the newest committed filter (dense word array, zero-filled). */
  def loadBloom(spark: SparkSession, indexPath: String): Array[Long] = {
    val vs = bloomVersions(spark, indexPath)
    require(vs.nonEmpty,
      s"no committed Bloom filter under $indexPath — interrupted build? " +
        "re-run build")
    val rows = spark.read.parquet(bloomDir(indexPath, vs.max)).collect()
    val nWords = rows.collectFirst {
      case r if r.getInt(0) < 0 => r.getLong(1).toInt
    }.getOrElse(throw new IllegalStateException(
      s"bloom artifact under $indexPath has no geometry row"))
    val arr = new Array[Long](nWords)
    rows.foreach(r => if (r.getInt(0) >= 0) arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** The newest committed filter's persisted sparse rows (sans the
    * geometry row) — spec helper for the artifact-size bound. */
  private[graft] def bloomTable(spark: SparkSession,
                                indexPath: String): DataFrame = {
    val vs = bloomVersions(spark, indexPath)
    require(vs.nonEmpty, s"no committed Bloom filter under $indexPath")
    spark.read.parquet(bloomDir(indexPath, vs.max)).filter(col("w") >= 0)
  }

  /** Per-doc shared-shingle counts + contamination flag for `corpus`
    * (doc_id, text) against the stored artifact — bit-identical to
    * [[Dedup.decontaminateBloom]] over the same eval set. */
  def query(spark: SparkSession, indexPath: String,
            corpus: DataFrame): DataFrame = {
    val evalSh = spark.read.parquet(s"$indexPath/shingles.parquet")
    val words = loadBloom(spark, indexPath)
    Dedup.decontaminateBloomFrames(corpus, evalSh, words)
      .select(col("doc_id"), col("n_shared"))
      .withColumn("contaminated", col("n_shared") >= Dedup.MinContamOverlap)
      .orderBy("doc_id")
  }

  /** STREAMING twin of [[query]]: decontaminate corpus shards AS THEY
    * LAND. A file stream of (doc_id, text) parquet shards runs the
    * exact batch operator per micro-batch inside `foreachBatch` —
    * per-doc shared-shingle counts are SHARD-COMPLETE (a document
    * arrives whole in one shard), so no streaming state exists at all:
    * the groupBy is a plain per-batch aggregate, the Bloom words are a
    * broadcast-sized reference loaded once at start, and the confirm
    * join's eval-shingle side is a static table. Output lands
    * replay-idempotent under `batch_id=N` dynamic overwrite (the same
    * exactly-once device as the bid pipeline's dual fan-out): a batch
    * replayed after a crash overwrites its own partition, never
    * duplicates it.
    *
    * This is the 100 TB ingest shape: every landed shard is gated
    * before it enters the corpus, against an artifact built once —
    * counts bit-identical to [[query]] over the same rows (spec'd and
    * oracle-gated as `q_stream_decontam`). */
  def streamingDecontam(spark: SparkSession, indexPath: String,
                        srcDir: String, outPath: String, checkpoint: String,
                        maxFilesPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val evalSh = spark.read.parquet(s"$indexPath/shingles.parquet")
    val words = loadBloom(spark, indexPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.decontaminateBloomFrames(batch, evalSh, words)
          .select(col("doc_id"), col("n_shared"),
            (col("n_shared") >= Dedup.MinContamOverlap).as("contaminated"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** q_stream_decontam: the [[streamingDecontam]] lifecycle under the
    * oracle gate. Builds the index from the eval split, stages the
    * corpus split as multiple shard files (so the stream takes multiple
    * micro-batches), runs the stream to completion, and returns the
    * union of the per-shard outputs — which must equal the batch
    * [[query]] row for row, i.e. the same relational oracle as
    * `dedup_decontam_persist`. */
  def streamDecontam(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-decontam").toString
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    try {
      build(docs.filter(col("doc_id") % Dedup.EvalStride === 0), s"$root/idx")
      docs.filter(col("doc_id") % Dedup.EvalStride =!= 0)
        .repartition(4) // ≥2 shard files → the stream really batches
        .write.parquet(s"$root/src")
      // keep the session's full shuffle width here: this stream holds
      // no state (no per-partition store commits to amortize) and each
      // micro-batch does real shingle+probe compute that wants the
      // parallelism — narrowing it measured SLOWER
      val q = streamingDecontam(spark, s"$root/idx", s"$root/src",
        s"$root/out", s"$root/ckpt", maxFilesPerTrigger = 2)
      q.awaitTermination()
      // declared schema, not inference: a clean corpus (zero shared
      // shingles) writes no parquet files at all, and the read must
      // return the batch operator's empty frame, not throw
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_shared",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("contaminated",
          org.apache.spark.sql.types.BooleanType)))
      Scratch.materializeAndClean(root,
        spark.read.schema(outSchema)
          .option("basePath", s"$root/out").parquet(s"$root/out")
          .select(col("doc_id"), col("n_shared"), col("contaminated"))
          .orderBy("doc_id"))
    } catch {
      case e: Throwable => Scratch.rm(new java.io.File(root)); throw e
    }
  }

  /** dedup_decontam_persist: the FULL index lifecycle under the oracle
    * gate — [[build]] over half the eval split (even EvalStride
    * multiples), [[merge]] the other half (odd multiples), persist,
    * reload, decontaminate the corpus split. The final artifact covers
    * exactly doc_id % EvalStride = 0, so the relational oracle is
    * unchanged and the store→merge→load→query chain — including the
    * monotone OR-in and the no-duplicate-shingle append — is
    * hash-gated by the driver, not just spec-asserted. */
  def persistedDecontam(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-decontam-idx").toString
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    try {
      val evalDocs = docs.filter(col("doc_id") % Dedup.EvalStride === 0)
      val stride2 = 2 * Dedup.EvalStride
      build(evalDocs.filter(col("doc_id") % stride2 === 0), s"$root/idx")
      merge(evalDocs.filter(col("doc_id") % stride2 =!= 0), s"$root/idx")
      Scratch.materializeAndClean(root,
        query(spark, s"$root/idx",
          docs.filter(col("doc_id") % Dedup.EvalStride =!= 0)))
    } catch {
      case e: Throwable => Scratch.rm(new java.io.File(root)); throw e
    }
  }
}
