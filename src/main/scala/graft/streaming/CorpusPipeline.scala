package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityClassifier, TextAnalysis}

/** The curation family as one streaming pipeline — the incremental twin
  * of [[graft.operators.Curation.pipeline]] for a Kafka-fed corpus:
  *
  *  1. quality gate — the SAME Catalyst formula as the batch operator
  *     ([[TextAnalysis.qualityCol]]); stateless, codegen'd;
  *  2. benchmark decontamination — shared-shingle overlap against a
  *     broadcast eval-set shingle index; stateless typed filter, the
  *     streaming form of [[Dedup.decontaminate]]'s broadcast side;
  *  3. exact content dedup — watermark-bounded
  *     `dropDuplicatesWithinWatermark` on `md5(text)`, the streaming
  *     form of [[Dedup.exact]].
  *
  * Near-dup handling stays a SEPARATE stream ([[StreamingNearDup]]):
  * chaining a second stateful pass behind the dedup is where Structured
  * Streaming's multi-stateful-operator support gets restrictive, and a
  * candidate-pair stream is the more useful product anyway (consumers
  * choose drop policy). At 100 TB each stage scales independently: the
  * gates are narrow maps, the eval index is small by definition (it is
  * a benchmark suite — same broadcast bound as the batch operator), and
  * dedup state is one 32-char hash per surviving doc within the
  * watermark, sharded by the shuffle on the hash.
  */
object CorpusPipeline {

  /** Max eval-set shingles accepted for broadcast — the same "small by
    * definition" contract the batch decontamination relies on, made
    * explicit. */
  val MaxEvalShingles = 5000000

  /** Distinct shingles of an eval/benchmark corpus, collected for
    * broadcast. `require`-bounded: decontamination against a set this
    * size is a broadcast join in ANY engine. */
  def evalShingleSet(evalTexts: Dataset[String]): Set[String] = {
    val sh = scala.collection.mutable.HashSet.empty[String]
    evalTexts.collect().foreach(t => sh ++= Dedup.shinglesOfText(t))
    require(sh.size <= MaxEvalShingles,
      s"eval shingle set ${sh.size} exceeds broadcast bound $MaxEvalShingles")
    sh.toSet
  }

  /** Quality gate: keep docs whose score clears `threshold`. Stateless;
    * identical arithmetic to the batch gate. */
  def qualityGate(docs: DataFrame,
                  threshold: Double = graft.operators.Curation.QualityThreshold)
      : DataFrame =
    docs.filter(
      TextAnalysis.qualityCol(col("text")).getField("quality") >= threshold)

  /** PII redaction: rewrite `text` to its redacted form
    * ([[graft.operators.Corpus.piiRedactCol]] — emails, phone numbers,
    * IPv4). Stateless narrow map, codegen'd; runs BEFORE dedup so two
    * docs differing only in the PII they leak deduplicate as the same
    * content. */
  def redactPii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      graft.operators.Corpus.piiRedactCol(col("text")).getField("redacted"))

  /** Decontamination: drop docs sharing ≥ `minOverlap` distinct
    * shingles with the eval set. Stateless typed filter over the
    * broadcast index (task closure). */
  def decontaminate(docs: DataFrame, evalShingles: Set[String],
                    minOverlap: Int = Dedup.MinContamOverlap): DataFrame = {
    val textIdx = docs.columns.indexOf("text")
    require(textIdx >= 0, "corpus stream must carry a text column")
    docs.filter { r: org.apache.spark.sql.Row =>
      val sh = Dedup.shinglesOfText(r.getString(textIdx))
      var overlap = 0
      var i = 0
      while (i < sh.length && overlap < minOverlap) {
        if (evalShingles.contains(sh(i))) overlap += 1
        i += 1
      }
      overlap < minOverlap
    }
  }

  /** Distilled-model scoring: annotate the stream with the trained
    * quality classifier's score and verdict. The weight vector is
    * trained OFFLINE ([[QualityClassifier.weights]] over a landed
    * corpus) and rides the closure — the "train batch, score
    * in-flight" deployment every production quality classifier uses.
    * Stateless narrow map; identical arithmetic to the batch scorer,
    * so batch and stream verdicts can never disagree. */
  def scoreQuality(docs: DataFrame, weights: Array[Long]): DataFrame = {
    require(weights.length == QualityClassifier.NumFeatures,
      s"weight vector must be ${QualityClassifier.NumFeatures} long")
    // native codegen expression, not a UDF: the weights ride the plan
    // as ONE reference object and scoring is a static call per row
    // inside whole-stage codegen — no encoder round-trip in the
    // streaming curation hot path (kernel identical to the batch
    // scorer's, see graft.functions.ClassifierScore)
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val score = column(
      graft.functions.ClassifierScore(expression(col("text")), weights))
    docs
      .withColumn("score_micro", score)
      .withColumn("pred_pass",
        col("score_micro") >= QualityClassifier.LabelMicro / 2)
  }

  /** The composed stream: gate → PII redact → decontaminate → content
    * dedup. Input must carry `doc_id`, `text`, `event_tm` (epoch
    * millis) — the decoded-corpus contract. */
  def curate(docs: DataFrame, evalShingles: Set[String],
             watermarkDelay: String = "1 hour"): DataFrame = {
    val gated = redactPii(qualityGate(docs))
    val clean = decontaminate(gated, evalShingles)
    clean
      .withColumn("__content_hash", md5(col("text")))
      .withColumn("__event_ts", timestamp_millis(col("event_tm")))
      .withWatermark("__event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__event_ts", "__content_hash")
  }

  /** q_stream_curation: the whole composed curation stream under the
    * oracle gate. The corpus split (synthetic PII injected, so the
    * redactor does real work) arrives as a multi-shard file stream and
    * runs quality gate → PII redact → decontaminate-vs-eval-split →
    * watermarked content dedup; the per-batch outputs union to the
    * SURVIVOR SET, reported as (content_md5, n_chars) of the redacted
    * text — deterministic regardless of shard processing order or
    * which duplicate the stateful dedup kept first (duplicates share
    * the hash by definition). The DuckDB oracle restates every stage
    * relationally: same quality formula, same regex chain, same
    * distinct-shingle overlap, distinct hashes at the end — a wrong
    * gate threshold, a missed redaction, a decontamination leak, or a
    * duplicate surviving all hash-fail. */
  def streamCuration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-cur").toString
    try {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val evalShingles = evalShingleSet(
        docs.filter(col("doc_id") % Dedup.EvalStride === 0)
          .select(col("text"))
          .as[String](org.apache.spark.sql.Encoders.STRING))
      docs.filter(col("doc_id") % Dedup.EvalStride =!= 0)
        .withColumn("text", graft.operators.Corpus
          .withSyntheticPii(col("text"), col("doc_id")))
        .withColumn("event_tm", lit(1700000000000L))
        .repartition(4) // ≥2 shard files → the stream really batches
        .write.parquet(s"$root/src")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("event_tm", LongType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(s"$root/src")
      StreamHarness.withShufflePartitions(spark, 8) {
        val q = curate(stream, evalShingles)
          .select(md5(col("text")).as("content_md5"),
            length(col("text")).cast("long").as("n_chars"))
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(s"$root/out")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val outSchema = StructType(Seq(
        StructField("content_md5", StringType),
        StructField("n_chars", LongType)))
      graft.operators.Scratch.materializeAndClean(root,
        spark.read.schema(outSchema)
          .option("basePath", s"$root/out").parquet(s"$root/out")
          .select(col("content_md5"), col("n_chars"))
          .orderBy("content_md5"))
    } catch {
      case e: Throwable =>
        graft.operators.Scratch.rm(new java.io.File(root)); throw e
    }
  }
}
