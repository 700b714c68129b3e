package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batched per-partition decode, and the arithmetic
  * transforms (resize, frame sampling) a media pipeline applies to
  * metadata.
  *
  * The byte-level decode is a STUB: a real deployment decodes
  * image/audio bytes with native libs behind the same per-partition
  * batch boundary (mapPartitions here ≈ a Pandas-UDF/mapInPandas batch
  * worker in PySpark). This container ships no media libraries, so the
  * stub derives deterministic fake features from the raw bytes — the
  * Spark-side contract (schema, binary columns, partition-batched
  * decode, feature vector shape) is real and oracle-tested.
  *
  * Scale: everything here is a narrow map — no shuffle. Binary payloads
  * stay columnar (parquet binary), metadata travels in a struct so
  * column pruning drops the payload when only metadata is needed.
  */
object Multimodal {

  val TargetDim = 224 // resize box, longest side

  /** documents → a media table: payload bytes + typed metadata struct.
    * (Stand-in payload: utf-8 text bytes; real pipelines read image
    * bytes — the column types are what matters.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        ((col("n_chars") % 640) + 16).cast("int").as("width"),
        ((col("doc_id") * 37) % 480 + 16).cast("int").as("height"))
        .as("meta"))

  /** STUB decode: per-partition batch over the binary payload producing
    * a fixed-shape feature row (n_bytes, first/last byte, mean byte).
    * Replace the loop body with a real decoder (libjpeg/ffmpeg via FFI)
    * without touching the operator shape. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val decoded = media
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ??? real decode goes here; deterministic fake features:
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          (id, bytes.length.toLong,
            if (bytes.isEmpty) 0 else bytes(0) & 0xff,
            if (bytes.isEmpty) 0 else bytes(bytes.length - 1) & 0xff,
            BigDecimal(mean).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }
      .toDF("doc_id", "n_bytes", "first_byte", "last_byte", "mean_byte")
    media.join(decoded, "doc_id")
  }

  /** Aspect-preserving resize of the metadata dims to fit TargetDim
    * (longest side), plus a deterministic frame-sampling plan — pure
    * column arithmetic, no decode needed. */
  def withTransforms(df: DataFrame): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = lit(TargetDim.toDouble) / greatest(w, h)
    df.withColumn("rs_width",
        greatest(floor(w * scale).cast("int"), lit(1)))
      .withColumn("rs_height",
        greatest(floor(h * scale).cast("int"), lit(1)))
      .withColumn("n_frames",
        least((col("n_bytes") / 100).cast("int") + 1, lit(16)))
  }

  /** Oracle-checked entry: table → stub decode → transforms. */
  def features(spark: SparkSession, dir: String): DataFrame =
    withTransforms(decodeFeatures(mediaTable(spark, dir)))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("n_bytes"), col("first_byte"), col("last_byte"),
        col("mean_byte"), col("rs_width"), col("rs_height"), col("n_frames"))
      .orderBy("doc_id")

  /** REAL byte-level decode for the self-describing formats
    * ([[MediaCodec]]: PPM / BMP / WAV headers need no external
    * library): each document carries a synthesized spec-conformant
    * payload (modality cycles by doc_id, every 17th truncated), the
    * decoder parses the actual bytes, and corrupt payloads land on the
    * deterministic fallback instead of failing the task. The oracle
    * states the expected decode in closed form over doc_id — synthesis
    * and parsing are independent code paths, so a bug in either breaks
    * the hash. Narrow typed map, no shuffle; formats beyond the
    * self-describing slice stay behind [[decodeFeatures]]'s documented
    * stub. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes = MediaCodec.synth(id)
          val m = MediaCodec.parse(bytes)
          (id, m.format, m.width, m.height, m.channels, m.sampleRate,
            m.bitDepth, bytes.length)
        }
      }
      .toDF("doc_id", "format", "width", "height", "channels",
        "sample_rate", "bit_depth", "n_bytes")
      .orderBy("doc_id")
  }
}
