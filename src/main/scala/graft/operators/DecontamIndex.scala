package graft.operators

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
  * Layout under `indexPath`:
  * {{{
  *   shingles.parquet (s)        — distinct eval shingles (confirm join)
  *   bloom.parquet    (w, bits)  — the filter's non-zero 64-bit words
  *                     (m/64 rows max — the artifact is bounded by
  *                     filter geometry, ~128 KiB at the default m)
  * }}}
  *
  * Query = [[Dedup.decontaminateBloomFrames]] over the loaded artifact:
  * codegen'd Bloom probe discards ~96 % of corpus shingles before any
  * shuffle, confirm join removes false positives — results
  * bit-identical to the from-scratch operator (no false negatives),
  * asserted in the spec and hash-gated as `dedup_decontam_persist`.
  */
object DecontamIndex {

  /** Shingle `evalDocs` (doc_id, text), build the filter, persist both.
    * The Bloom is sized to the DISTINCT shingle count
    * ([[Dedup.bloomBitsFor]]) so a larger eval suite gets a larger
    * filter at build time — the stored artifact is self-describing
    * (bit count = 64 × max word index capacity). */
  def build(evalDocs: DataFrame, indexPath: String): Unit = {
    val spark = evalDocs.sparkSession
    import spark.implicits._
    val sh = Dedup.shinglesOf(evalDocs)
      .select(explode(col("sh")).as("s")).distinct()
    sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sh.write.mode("overwrite").parquet(s"$indexPath/shingles.parquet")
      val bits = Dedup.bloomBitsFor(sh.count())
      Dedup.bloomBuild(sh, "s", bits).zipWithIndex
        .collect { case (w, i) if w != 0L => (i, w) }
        .toSeq.toDF("w", "bits")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$indexPath/bloom.parquet")
      // geometry sidecar: dense word count — the sparse rows alone
      // cannot encode trailing zero words (or an empty filter)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$indexPath/GEOMETRY"), (bits / 64).toString)
    } finally sh.unpersist(blocking = false)
  }

  /** Extend the index with a NEW eval batch (benchmark suites grow):
    * append only the genuinely new distinct shingles — a duplicate
    * shingle row would double-count every `n_shared` the confirm join
    * produces — and update the filter IN PLACE by OR-ing the delta's
    * words (Bloom insertion is monotone) while the stored geometry
    * still satisfies [[Dedup.bloomBitsFor]] for the grown set. When
    * the set outgrows the geometry, the filter is rebuilt at the
    * correct size from the full persisted shingle table — never left
    * undersized (an undersized filter stays CORRECT, only its
    * false-positive rate decays; the rebuild keeps the probe's
    * selectivity contract instead). Either way the result is
    * bit-identical to a fresh [[build]] over the union (spec'd). */
  def merge(newEvalDocs: DataFrame, indexPath: String): Unit = {
    val spark = newEvalDocs.sparkSession
    import spark.implicits._
    val existing = spark.read.parquet(s"$indexPath/shingles.parquet")
    // count BEFORE the append below, and pin `fresh` lineage-free
    // (Materialize = eager localCheckpoint): both frames read the very
    // path the append mutates, so a lazy plan — or a cache-evicted
    // recompute — would silently see the post-append files
    val nExisting = existing.count()
    val fresh = Materialize(
      Dedup.shinglesOf(newEvalDocs)
        .select(explode(col("sh")).as("s")).distinct()
        .join(existing, Seq("s"), "left_anti"))
    val nFresh = fresh.count()
    if (nFresh > 0) {
      val nTotal = nExisting + nFresh
      fresh.write.mode("append").parquet(s"$indexPath/shingles.parquet")
      val words = loadBloom(spark, indexPath)
      val bitsNeeded = Dedup.bloomBitsFor(nTotal)
      val rebuilt =
        if (bitsNeeded > words.length * 64) {
          // geometry outgrown: rebuild over the full persisted set
          Dedup.bloomBuild(
            spark.read.parquet(s"$indexPath/shingles.parquet"), "s",
            bitsNeeded)
        } else {
          val delta = Dedup.bloomBuild(fresh, "s", words.length * 64)
          var i = 0
          while (i < words.length) { words(i) |= delta(i); i += 1 }
          words
        }
      rebuilt.zipWithIndex
        .collect { case (w, i) if w != 0L => (i, w) }
        .toSeq.toDF("w", "bits")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$indexPath/bloom.parquet")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$indexPath/GEOMETRY"),
        rebuilt.length.toString)
    }
  }

  /** Load the persisted filter words (dense array, zero-filled). */
  def loadBloom(spark: SparkSession, indexPath: String): Array[Long] = {
    val nWords = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$indexPath/GEOMETRY"))
      .trim.toInt
    val arr = new Array[Long](nWords)
    spark.read.parquet(s"$indexPath/bloom.parquet")
      .collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
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

  /** dedup_decontam_persist: build the index from the eval split
    * (doc_id % EvalStride = 0), persist, reload, decontaminate the
    * corpus split — the whole store→load→query lifecycle under the
    * same relational oracle as the in-memory Bloom path. */
  def persistedDecontam(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-decontam-idx").toString
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    try {
      build(docs.filter(col("doc_id") % Dedup.EvalStride === 0), s"$root/idx")
      Scratch.materializeAndClean(root,
        query(spark, s"$root/idx",
          docs.filter(col("doc_id") % Dedup.EvalStride =!= 0)))
    } catch {
      case e: Throwable => Scratch.rm(new java.io.File(root)); throw e
    }
  }
}
