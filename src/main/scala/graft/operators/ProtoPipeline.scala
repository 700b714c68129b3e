package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.sources.proto._
import graft.sources.proto.ProtoFunctions._

/** End-to-end exercise of the reference's ingest path on deterministic
  * synthetic messages: build Bidrequest structs from `events` rows,
  * encode them with the proto3 wire codec, frame them exactly like the
  * reference's Kafka reader (6-byte Confluent-style prefix + 8-byte LE
  * timestamp suffix — main.go:229-231), then run the consumer side:
  * strip prefix (A2), extract timestamp suffix (A3), wire-decode against
  * the FULL Bidrequest schema (A4/A5 — writer schema is a subset of the
  * reader schema, the standard proto evolution contract), append the
  * custom `event_tm` column (A10), and normalize (A6-A9).
  *
  * Because generation is deterministic from `events`, the DuckDB oracle
  * states the expected normalized output in plain SQL — the entire
  * encode→frame→strip→decode→normalize chain must be value-exact.
  */
object ProtoPipeline {

  import BidRequestSchema.timestamp

  private def f(n: Int, name: String, t: PType) = PField(n, name, t)
  private def rep(n: Int, name: String, t: PType) =
    PField(n, name, t, repeated = true)

  /** Writer-side schema: only the populated subtree, same field numbers
    * as [[BidRequestSchema]] — decoders with the full schema read it. */
  private val genDeal = PMessage("Deal", Seq(
    f(1, "id", PString), f(2, "bidfloor", PFloat)))
  private val genPmp = PMessage("Pmp", Seq(rep(2, "deals", genDeal)))
  private val genBanner = PMessage("Banner", Seq(
    f(2, "w", PInt32), f(3, "h", PInt32)))
  private val genVideo = PMessage("Video", Seq(
    f(5, "w", PInt32), f(6, "h", PInt32)))
  private val genImp = PMessage("Imp", Seq(
    f(3, "banner", genBanner), f(4, "video", genVideo),
    f(7, "pmp", genPmp), f(12, "bidfloor", PFloat)))
  private val genPub = PMessage("Publisher", Seq(f(1, "id", PString)))
  private val genSite = PMessage("Site", Seq(
    f(1, "id", PString), f(12, "publisher", genPub)))
  private val genDevice = PMessage("Device", Seq(f(24, "ifa", PString)))
  private val genUser = PMessage("User", Seq(f(1, "id", PString)))
  val genBid: PMessage = PMessage("Bidrequest", Seq(
    f(1, "id", PString), rep(2, "imp", genImp), f(3, "site", genSite),
    f(5, "device", genDevice), f(6, "user", genUser),
    f(20, "timestamp", timestamp)))

  /** Deterministic Bidrequest struct from an events row (column order =
    * [[genBid]] field order — the encoder reads ordinals). */
  def bidStruct: Column = {
    val eid = col("event_id")
    val isBanner = col("value") >= 50
    val w = when(isBanner, floor(col("value")) + 1)
      .otherwise(floor(col("value")) + 2).cast("int")
    val h = when(isBanner, (col("user_id") % 5 + 1) * 100)
      .otherwise((col("user_id") % 5 + 1) * 100 + 1).cast("int")
    val us = unix_micros(col("ts").cast("timestamp"))
    val seconds = ((us - pmod(us, lit(1000000L))) / lit(1000000L)).cast("long")
    val nanos = (pmod(us, lit(1000000L)) * lit(1000L)).cast("int")
    def deal(i: Int) = struct(
      concat(lit("deal_"), eid.cast("string"), lit(s"_$i")).as("id"),
      lit(0.5f * (i + 1)).as("bidfloor"))
    val deals = slice(array(deal(0), deal(1)), lit(1), (eid % 3).cast("int"))
    val imp = array(struct(
      when(isBanner, struct(w.as("w"), h.as("h"))).as("banner"),
      when(!isBanner, struct(w.as("w"), h.as("h"))).as("video"),
      struct(deals.as("deals")).as("pmp"),
      lit(1.5f).as("bidfloor")))
    struct(
      eid.cast("string").as("id"),
      imp.as("imp"),
      struct(
        concat(lit("site_"), (col("user_id") % 20).cast("string")).as("id"),
        struct(col("event_type").as("id")).as("publisher")).as("site"),
      struct(concat(lit("ifa_"), (eid % 7).cast("string")).as("ifa"))
        .as("device"),
      struct(when(col("user_id") % 4 === 0, lit(""))
        .otherwise(concat(lit("u"), col("user_id").cast("string"))).as("id"))
        .as("user"),
      struct(seconds.as("seconds"), nanos.as("nanos")).as("timestamp"))
  }

  /** Reference message framing: 6-byte prefix ++ payload ++ 8-byte LE
    * timestamp-millis suffix. The events scan is widened to session
    * parallelism ([[Tables.eventsWide]]): encode+decode dominate the
    * 2 MB single-file scan, which would otherwise run the whole codec
    * chain on one core. */
  def framedMessages(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWide(spark, dir).select(
      concat(
        lit(Array[Byte](0, 0, 0, 0, 0, 42)),
        protoEncode(bidStruct, genBid),
        leUint64Bytes(unix_millis(col("ts").cast("timestamp")))).as("value"))

  /** Consumer side: frame → raw nested bidreq frame (+ event_tm). */
  def decodeFrames(frames: DataFrame): DataFrame = {
    val payload = expr("substring(value, 7, length(value) - 14)")
    frames
      .select(
        protoDecode(payload, BidRequestSchema.bidrequest).as("bid"),
        leUint64(col("value")).as("event_tm"))
      .select(col("bid.*"), col("event_tm"))
  }

  /** The oracle-checked roundtrip: encode → frame → strip → decode →
    * normalize, ordered deterministically. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame =
    Normalize(decodeFrames(framedMessages(spark, dir)))
      .orderBy(col("bidreq_id").cast("long"), col("deal").asc_nulls_first)
}
