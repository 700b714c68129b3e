package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** JSONL interchange — the format LLM training stacks actually ship
  * corpora in. The reference exports parquet only
  * (/root/reference/main.go:96-107); a training consumer needs the
  * same rows as gzip'd JSON-lines with a declared schema on the way
  * back in (schema inference over TBs is a scan nobody pays twice).
  *
  * Scale shape: both directions are narrow per-partition codec passes —
  * the export writes one `.json.gz` part per partition, the read is
  * schema'd so Spark plans it like any other text source. Gzip is NOT
  * splittable, so read parallelism equals the part count — which is
  * why [[exportJsonl]] enforces a size cap: when the plan's size
  * estimate says a partition would exceed [[DefaultMaxPartBytes]]
  * (uncompressed), the export repartitions UP so no single part
  * becomes a serialized read. The codec is probed at runtime
  * ([[exportCodec]]): Hadoop-native zstd when the deployment has it
  * (faster, better ratio), pure-JVM gzip otherwise — both are
  * whole-file codecs for text sources, so part SIZING is the portable
  * parallelism contract either way, spec-asserted as N parts → N read
  * partitions.
  */
object Jsonl {

  /** Max UNCOMPRESSED bytes of row data per exported part (gzip takes
    * it ~4× lower on disk) — the shared interchange part-sizing
    * contract, defined once on [[ExportSizing]]. */
  val DefaultMaxPartBytes: Long = ExportSizing.DefaultMaxPartBytes

  /** Export compression, probed once per JVM: Hadoop's ZStandardCodec
    * needs the native hadoop library, which plain-JVM deployments (and
    * this sandbox) lack — fall back to the always-available gzip. */
  private[graft] lazy val exportCodec: String =
    try {
      if (org.apache.hadoop.io.compress.ZStandardCodec.isNativeCodeLoaded)
        "zstd"
      else "gzip"
    } catch { case _: Throwable => "gzip" }

  /** The documents schema as the JSONL contract: declared, not
    * inferred. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def exportJsonl(df: DataFrame, path: String,
                  maxPartBytes: Long = DefaultMaxPartBytes): Unit = {
    ExportSizing.sizeUp(df, maxPartBytes).write.mode("overwrite")
      .option("compression", exportCodec)
      .json(path)
  }

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).json(path)

  /** q_jsonl_roundtrip: documents → gzip JSONL → read back with the
    * declared schema. The oracle is the source table itself — the
    * roundtrip must be LOSSLESS through JSON string escaping (the
    * corpus carries unicode, quotes, controls) and exact for int64.
    * Encoder quirks (non-BMP escapes,  control bytes) that
    * corrupt a single document hash-fail the whole row set. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft-jsonl").toString
    try {
      exportJsonl(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")), s"$out/docs")
      // materialize before deleting the scratch export — the returned
      // frame must outlive the temp dir, and a long harness run must not
      // accumulate exports in /tmp (Scratch deletes in finally)
      Scratch.materializeAndClean(out,
        readJsonl(spark, s"$out/docs").orderBy("doc_id"))
    } catch { case e: Throwable =>
      Scratch.rm(new java.io.File(out)); throw e
    }
  }
}
