package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batched per-partition decode, and the arithmetic
  * transforms (resize, frame sampling) a media pipeline applies to
  * decoded facts.
  *
  * The byte-level decode is REAL: each document carries a synthesized
  * spec-conformant raster payload (PNG written by [[MediaCodec.png]]'s
  * hand-rolled encoder, BMP by [[MediaCodec]]'s writer; every 17th doc
  * truncated) and [[decodeFeatures]] decodes the actual bytes with the
  * JDK's independent `javax.imageio` readers behind a per-partition
  * batch boundary (mapPartitions here ≈ a Pandas-UDF/mapInPandas batch
  * worker in PySpark). Corrupt payloads land on the deterministic
  * [[MediaCodec.ImageFallback]] — a poison payload never fails a task.
  * Because the synthesized pixel ramp is closed-form in doc_id, the
  * DuckDB oracle states the expected pixel statistics analytically:
  * a bug in the writer OR the reader breaks the hash.
  *
  * Scale: everything here is a narrow map — no shuffle. Binary payloads
  * stay columnar (parquet binary), metadata travels in a struct so
  * column pruning drops the payload when only metadata is needed.
  */
object Multimodal {

  val TargetDim = 224 // resize box, longest side

  /** doc_id scan widened to the session's parallelism: the synth +
    * ImageIO decode passes cost ~0.5 ms/row, and the synthetic corpus
    * is one sub-MB file → one scan task, which would serialize the
    * whole decode on a single core. A real corpus arrives in enough
    * splits that this takes the no-op branch (same contract as
    * [[Tables.documentsWide]]). */
  private def docIds(spark: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
    val target = spark.sparkContext.defaultParallelism
    if (ids.rdd.getNumPartitions >= target) ids else ids.repartition(target)
  }

  /** documents → a media table: real raster payload bytes + the typed
    * CLAIMED metadata struct (what an upstream manifest would assert —
    * [[decodeFeatures]] reports what the bytes actually contain). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir).as[Long]
      .mapPartitions(_.map(id => (id, MediaCodec.synthImage(id))))
      .toDF("doc_id", "media")
      .withColumn("meta", struct(
        when(col("doc_id") % 2 === 0, "png").otherwise("bmp").as("format"),
        (lit(4) * (col("doc_id") % 8 + 1)).cast("int").as("width"),
        ((col("doc_id") * 5) % 14 + 2).cast("int").as("height")))
  }

  /** REAL decode: per-partition batch over the binary payload through
    * [[MediaCodec.decodeImage]] (ImageIO — an independent code path
    * from the synthesizing writers), producing the detected format,
    * true dimensions, and the raster-level mean that proves pixels were
    * actually decoded. Total: corrupt/truncated/hostile payloads map to
    * [[MediaCodec.ImageFallback]], never a task failure. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // one narrow pass appending the decode facts to each row — NOT a
    // decode-then-self-join, which would shuffle the binary payload
    // and (worse) recompute the upstream media synthesis once per join
    // side; at 100 TB the payload column must cross the wire zero times
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("px_mean", DoubleType, nullable = false)))
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { it =>
      it.map { r =>
        val f = MediaCodec.decodeImage(r.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(r.toSeq ++ Seq(f.format, f.width, f.height, f.nPx, f.pxMean))
      }
    }(Encoders.row(outSchema))
  }

  /** Aspect-preserving resize of the DECODED dims to fit TargetDim
    * (longest side), plus a deterministic frame-sampling plan — pure
    * column arithmetic over decode facts; fallback rows (0×0) resize
    * to 0×0 and sample 0 frames. */
  def withTransforms(df: DataFrame): DataFrame = {
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val scale = lit(TargetDim.toDouble) / greatest(w, h)
    val ok = col("width") > 0
    df.withColumn("rs_width",
        when(ok, greatest(floor(w * scale).cast("int"), lit(1)))
          .otherwise(lit(0)))
      .withColumn("rs_height",
        when(ok, greatest(floor(h * scale).cast("int"), lit(1)))
          .otherwise(lit(0)))
      .withColumn("n_frames",
        when(ok, least((col("n_px") / 100).cast("int") + 1, lit(16)))
          .otherwise(lit(0)))
  }

  /** Oracle-checked raster decode: table → real ImageIO decode. */
  def mediaImage(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(spark, dir))
      .select(col("doc_id"), col("meta.format").as("claimed_format"),
        col("format"), col("width"), col("height"), col("n_px"),
        col("px_mean"))
      .orderBy("doc_id")

  /** Oracle-checked entry: table → real decode → transforms. */
  def features(spark: SparkSession, dir: String): DataFrame =
    withTransforms(decodeFeatures(mediaTable(spark, dir)))
      .select(col("doc_id"), col("meta.format").as("claimed_format"),
        col("format"), col("width"), col("height"), col("n_px"),
        col("px_mean"), col("rs_width"), col("rs_height"), col("n_frames"))
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
    docIds(spark, dir).as[Long]
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
