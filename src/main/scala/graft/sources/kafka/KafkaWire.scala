package graft.sources.kafka

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** Byte-level codec for the public Kafka wire protocol (KIP-98 record
  * batch format v2, "classic" non-flexible request encodings) —
  * implemented from the protocol specification, not from any Kafka
  * client library (none exists in this sandbox's classpath).
  *
  * This is the transport the reference consumes through franz-go
  * (/root/reference/main.go:221-232 builds the consumer). The engine
  * speaks the same protocol natively so the A1 surface is executable —
  * and wire-testable — without external artifacts.
  *
  * Only what a consumer needs is encoded: primitives, the v2 record
  * batch (uncompressed), and nothing transactional. All multi-byte
  * integers are big-endian per the spec; record-internal integers are
  * zigzag varints; the batch CRC is CRC32C (Castagnoli) over the bytes
  * from `attributes` to the end of the batch.
  */
object KafkaWire {

  // ---- primitive writer --------------------------------------------------

  /** Growable big-endian writer with length-prefix patching. */
  final class Writer(initial: Int = 256) {
    private var buf = new Array[Byte](initial)
    private var pos = 0

    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) {
        var cap = buf.length * 2
        while (cap < pos + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }

    def size: Int = pos

    def int8(v: Int): this.type = { ensure(1); buf(pos) = v.toByte; pos += 1; this }
    def int16(v: Int): this.type = {
      ensure(2); buf(pos) = (v >> 8).toByte; buf(pos + 1) = v.toByte; pos += 2; this
    }
    def int32(v: Int): this.type = {
      ensure(4)
      buf(pos) = (v >> 24).toByte; buf(pos + 1) = (v >> 16).toByte
      buf(pos + 2) = (v >> 8).toByte; buf(pos + 3) = v.toByte
      pos += 4; this
    }
    def int64(v: Long): this.type = { int32((v >> 32).toInt); int32(v.toInt) }

    /** Zigzag varint (protobuf wire format, as the record spec states). */
    def varInt(v: Int): this.type = varLongRaw(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varLong(v: Long): this.type = varLongRaw((v << 1) ^ (v >> 63))
    private def varLongRaw(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0) { int8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      int8(v.toInt)
    }

    /** Non-null STRING: INT16 length + UTF-8 bytes. */
    def string(s: String): this.type = {
      val b = s.getBytes(UTF_8); int16(b.length); raw(b)
    }
    /** NULLABLE_STRING: length -1 encodes null. */
    def nullableString(s: Option[String]): this.type =
      s.fold[this.type](int16(-1))(string)
    /** BYTES: INT32 length + payload; -1 encodes null. */
    def bytes(b: Array[Byte]): this.type =
      if (b == null) int32(-1) else { int32(b.length); raw(b) }

    def raw(b: Array[Byte]): this.type = {
      ensure(b.length); System.arraycopy(b, 0, buf, pos, b.length); pos += b.length; this
    }

    /** Reserve an INT32 slot now, patch it later (request size prefixes,
      * batchLength, CRC). Returns the slot position. */
    def reserveInt32(): Int = { val p = pos; int32(0); p }
    def patchInt32(at: Int, v: Int): Unit = {
      buf(at) = (v >> 24).toByte; buf(at + 1) = (v >> 16).toByte
      buf(at + 2) = (v >> 8).toByte; buf(at + 3) = v.toByte
    }

    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
    /** CRC32C over [from, size). */
    def crc32c(from: Int): Int = {
      val c = new CRC32C; c.update(buf, from, pos - from); c.getValue.toInt
    }
  }

  // ---- primitive reader --------------------------------------------------

  /** Big-endian reader over a response body. */
  final class Reader(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes)

    def remaining: Int = bb.remaining()
    def int8(): Byte = bb.get()
    def int16(): Short = bb.getShort()
    def int32(): Int = bb.getInt()
    def int64(): Long = bb.getLong()
    def uint32(): Long = bb.getInt().toLong & 0xffffffffL

    def varInt(): Int = { val v = varLongRaw(); ((v >>> 1) ^ -(v & 1)).toInt }
    def varLong(): Long = { val v = varLongRaw(); (v >>> 1) ^ -(v & 1) }
    private def varLongRaw(): Long = {
      var v = 0L; var shift = 0
      var b = bb.get()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint too long")
        b = bb.get()
      }
      v | ((b & 0x7fL) << shift)
    }

    def string(): String = {
      val n = int16()
      require(n >= 0, s"non-null string expected, length $n")
      rawString(n)
    }
    def nullableString(): Option[String] = {
      val n = int16()
      if (n < 0) None else Some(rawString(n))
    }
    private def rawString(n: Int): String = {
      val b = new Array[Byte](n); bb.get(b); new String(b, UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = int32()
      if (n < 0) null else { val b = new Array[Byte](n); bb.get(b); b }
    }
    def raw(n: Int): Array[Byte] = { val b = new Array[Byte](n); bb.get(b); b }
    def skip(n: Int): Unit = bb.position(bb.position() + n)
    def position: Int = bb.position()
  }

  // ---- record batch v2 ---------------------------------------------------

  /** One consumed record. `timestamp` is epoch millis; `timestampType`
    * is the batch's attributes bit 3 (0 = CreateTime, 1 =
    * LogAppendTime, matching the official source's column encoding);
    * `key`/`value` may be null per the spec. */
  final case class Record(offset: Long, timestamp: Long,
                          key: Array[Byte], value: Array[Byte],
                          timestampType: Int = 0)

  /** Bytes before the `records` array in a v2 batch:
    * baseOffset(8) batchLength(4) leaderEpoch(4) magic(1) crc(4)
    * attributes(2) lastOffsetDelta(4) baseTs(8) maxTs(8) producerId(8)
    * producerEpoch(2) baseSequence(4) recordCount(4). */
  private val BatchHeaderLen = 61
  /** Offset of the CRC field within a batch. */
  private val CrcOffset = 17
  /** CRC covers attributes..end — everything after the CRC field. */
  private val AttributesOffset = 21

  // ---- compression codecs (attributes bits 0-2) --------------------------

  /** Kafka compression codec ids. Every codec's library ships inside
    * Spark itself (java.util.zip, snappy-java, lz4-java, zstd-jni), so
    * supporting all four costs no dependency. Framings are the ones the
    * Java producer uses for message format v2: gzip stream, xerial
    * snappy stream, LZ4 Frame, zstd frame. */
  object Codec {
    val None = 0; val Gzip = 1; val Snappy = 2; val Lz4 = 3; val Zstd = 4
    def parse(name: String): Int = name.toLowerCase(java.util.Locale.ROOT) match {
      case "none" | "uncompressed" => None
      case "gzip" => Gzip
      case "snappy" => Snappy
      case "lz4" => Lz4
      case "zstd" => Zstd
      case other => throw new IllegalArgumentException(
        s"unknown compression codec '$other'")
    }
  }

  private def compressed(codec: Int, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val os: java.io.OutputStream = codec match {
      case Codec.Gzip => new java.util.zip.GZIPOutputStream(bos)
      case Codec.Snappy => new org.xerial.snappy.SnappyOutputStream(bos)
      case Codec.Lz4 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case Codec.Zstd => new com.github.luben.zstd.ZstdOutputStream(bos)
      case c => throw new IllegalArgumentException(s"codec $c")
    }
    os.write(data); os.close()
    bos.toByteArray
  }

  private def decompressed(codec: Int, data: Array[Byte]): Array[Byte] = {
    val bis = new java.io.ByteArrayInputStream(data)
    val is: java.io.InputStream = codec match {
      case Codec.Gzip => new java.util.zip.GZIPInputStream(bis)
      case Codec.Snappy => new org.xerial.snappy.SnappyInputStream(bis)
      case Codec.Lz4 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
      case Codec.Zstd => new com.github.luben.zstd.ZstdInputStream(bis)
      case c => throw new IllegalArgumentException(s"codec $c")
    }
    try is.readAllBytes() finally is.close()
  }

  /** Encode one v2 batch. `records` are (timestampMs, key, value);
    * offsets are assigned `baseOffset + index`. With a non-None codec
    * the records block (NOT the header) is compressed, per the spec.
    * `producerId >= 0` marks the batch transactional (attributes bit
    * 4); `control` additionally sets bit 5 — the transaction-marker
    * batches a broker writes when a coordinator ends a transaction. */
  def encodeBatch(baseOffset: Long,
                  records: Seq[(Long, Array[Byte], Array[Byte])],
                  codec: Int = Codec.None,
                  logAppendTime: Boolean = false,
                  producerId: Long = -1L,
                  control: Boolean = false): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val baseTs = records.iterator.map(_._1).min
    val maxTs = records.iterator.map(_._1).max
    val w = new Writer(64 + records.iterator.map {
      case (_, k, v) =>
        20 + (if (k == null) 0 else k.length) + (if (v == null) 0 else v.length)
    }.sum)

    w.int64(baseOffset)
    val lenSlot = w.reserveInt32() // batchLength
    w.int32(0)                     // partitionLeaderEpoch
    w.int8(2)                      // magic
    val crcSlot = w.reserveInt32()
    // attributes: codec bits 0-2, timestampType bit 3, transactional
    // bit 4, control bit 5
    w.int16((codec & 0x07) | (if (logAppendTime) 0x08 else 0) |
      (if (producerId >= 0L) 0x10 else 0) | (if (control) 0x20 else 0))
    w.int32(records.size - 1)      // lastOffsetDelta
    w.int64(baseTs)
    w.int64(maxTs)
    w.int64(producerId)
    w.int16(if (producerId >= 0L) 0 else -1) // producerEpoch
    w.int32(-1)                    // baseSequence
    w.int32(records.size)

    val body = new Writer(32 * records.size)
    records.iterator.zipWithIndex.foreach { case ((ts, key, value), i) =>
      // record body first — its length prefix is a varint of the body size
      val r = new Writer(24 +
        (if (key == null) 0 else key.length) +
        (if (value == null) 0 else value.length))
      r.int8(0)                    // record attributes
      r.varLong(ts - baseTs)       // timestampDelta
      r.varInt(i)                  // offsetDelta
      if (key == null) r.varInt(-1) else { r.varInt(key.length); r.raw(key) }
      if (value == null) r.varInt(-1) else { r.varInt(value.length); r.raw(value) }
      r.varInt(0)                  // headers
      val bytes = r.toBytes
      body.varInt(bytes.length)
      body.raw(bytes)
    }
    if (codec == Codec.None) w.raw(body.toBytes)
    else w.raw(compressed(codec, body.toBytes))

    w.patchInt32(lenSlot, w.size - (lenSlot + 4))
    w.patchInt32(crcSlot, w.crc32c(AttributesOffset))
    w.toBytes
  }

  /** Decode every complete batch in a fetched record set, verifying each
    * CRC. Brokers return whole batches from the log segment (zero-copy),
    * so the set may (a) start before the requested offset — callers skip
    * records below it — and (b) end with a truncated batch when
    * `maxBytes` cut mid-batch — ignored per the spec ("as efficient as
    * possible": clients tolerate a trailing partial batch). */
  def decodeBatches(recordSet: Array[Byte]): Seq[Record] =
    decodeBatchesWithNext(recordSet)._1

  /** [[decodeBatches]] plus the offset AFTER the last complete batch
    * (-1 when none decoded). The position must advance even when a
    * batch yields no consumable records — control batches (transaction
    * markers) and compacted batches whose surviving records all precede
    * the fetch offset are legal and common on a real broker; a consumer
    * that only advances via decoded records wedges on them forever. */
  def decodeBatchesWithNext(recordSet: Array[Byte]): (Seq[Record], Long) =
    decodeBatchesWithNext(recordSet, Nil)

  /** Isolation-aware decode: `aborted` is the fetch response's
    * aborted-transactions list, `(producerId, firstOffset)` pairs. The
    * official consumer's algorithm: walking batches in offset order, a
    * producer id becomes "aborted" once its entry's firstOffset is
    * reached, every TRANSACTIONAL data batch from an aborted producer
    * is dropped whole, and the producer leaves the set at its ABORT
    * control marker (so a later, committed transaction from the same
    * producer streams normally). Non-transactional batches are never
    * filtered. Pass Nil (read_uncommitted) and this is exactly the
    * 1-arg decode. */
  def decodeBatchesWithNext(recordSet: Array[Byte],
                            aborted: Seq[(Long, Long)]): (Seq[Record], Long) = {
    val abortQueue = aborted.sortBy(_._2)
    var abortIdx = 0
    val abortedPids = scala.collection.mutable.Set.empty[Long]
    if (recordSet == null || recordSet.isEmpty) return (Nil, -1L)
    val out = Vector.newBuilder[Record]
    var nextAfter = -1L
    var at = 0
    while (recordSet.length - at >= 12) {
      val bb = ByteBuffer.wrap(recordSet, at, recordSet.length - at)
      val baseOffset = bb.getLong
      val batchLength = bb.getInt
      val total = 12 + batchLength
      if (batchLength < BatchHeaderLen - 12 || at + total > recordSet.length) {
        at = recordSet.length // trailing partial batch — done
      } else {
        val magic = recordSet(at + 16)
        require(magic == 2, s"unsupported record batch magic $magic")
        val crcStored = ByteBuffer.wrap(recordSet, at + CrcOffset, 4).getInt
        val crc = new CRC32C
        crc.update(recordSet, at + AttributesOffset, total - AttributesOffset)
        require(crc.getValue.toInt == crcStored,
          s"record batch CRC mismatch at offset $baseOffset")
        val hdr = new Reader(java.util.Arrays.copyOfRange(recordSet, at + 21, at + total))
        val attributes = hdr.int16()
        val codec = attributes & 0x07
        val tsType = (attributes >> 3) & 1 // 0 CreateTime, 1 LogAppendTime
        // bit 5: control batch — transaction commit/abort markers. Its
        // records are protocol metadata, never data rows (the official
        // consumer filters them); decode NOTHING but still advance.
        val isControl = (attributes & 0x20) != 0
        val isTransactional = (attributes & 0x10) != 0
        val lastOffsetDelta = hdr.int32()
        val baseTs = hdr.int64()
        val maxTs = hdr.int64()      // broker append time under bit 3
        val producerId = hdr.int64()
        hdr.int16(); hdr.int32()     // producer epoch, baseSequence
        val count = hdr.int32()
        nextAfter = math.max(nextAfter, baseOffset + lastOffsetDelta + 1)
        // read_committed: producers whose aborted range starts at/before
        // this batch are active until their ABORT marker passes
        while (abortIdx < abortQueue.length &&
               abortQueue(abortIdx)._2 <= baseOffset) {
          abortedPids += abortQueue(abortIdx)._1
          abortIdx += 1
        }
        if (isControl) {
          // decode the marker key (int16 version, int16 type; 0 = ABORT)
          // only when its producer is being tracked — an abort marker
          // ends the range, so the producer's NEXT transaction streams
          if (abortedPids.contains(producerId) && count > 0) {
            val r =
              if (codec == Codec.None) hdr
              else new Reader(decompressed(codec, hdr.raw(hdr.remaining)))
            r.varInt()               // record length
            r.int8()                 // record attributes
            r.varLong(); r.varInt()  // ts/offset deltas
            val keyLen = r.varInt()
            if (keyLen >= 4) {
              val key = r.raw(keyLen)
              val markerType = ((key(2) & 0xff) << 8) | (key(3) & 0xff)
              if (markerType == 0) abortedPids -= producerId
            }
          }
        } else if (isTransactional && abortedPids.contains(producerId)) {
          // a whole data batch of an aborted transaction: dropped — its
          // rows were never committed. nextAfter already advanced.
        } else {
          val r =
            if (codec == Codec.None) hdr
            else new Reader(decompressed(codec, hdr.raw(hdr.remaining)))
          var i = 0
          while (i < count) {
            val len = r.varInt()
            val end = r.position + len
            r.int8()                 // record attributes
            val tsDelta = r.varLong()
            val offDelta = r.varInt()
            val keyLen = r.varInt()
            val key = if (keyLen < 0) null else r.raw(keyLen)
            val valLen = r.varInt()
            val value = if (valLen < 0) null else r.raw(valLen)
            val headers = r.varInt()
            var h = 0
            while (h < headers) { // skip headers
              val kl = r.varInt(); r.skip(kl)
              val vl = r.varInt(); if (vl > 0) r.skip(vl)
              h += 1
            }
            require(r.position == end, s"record length mismatch at $baseOffset+$offDelta")
            // LogAppendTime rewrites only the batch maxTimestamp on the
            // broker; per-record deltas still carry producer times. The
            // official consumer returns maxTimestamp for EVERY record
            // when bit 3 is set — match it, or the timestamp column
            // claims LogAppendTime while carrying CreateTime values.
            val ts = if (tsType == 1) maxTs else baseTs + tsDelta
            out += Record(baseOffset + offDelta, ts, key, value, tsType)
            i += 1
          }
        }
        at += total
      }
    }
    (out.result(), nextAfter)
  }

  /** Shared transient-failure classification for produce/fetch paths:
    * leadership moved or metadata is still propagating (re-resolve and
    * retry), or the connection dropped mid-roll. One definition so the
    * source and sink can never silently diverge on what is retriable. */
  def retriableError(e: Throwable): Boolean = e match {
    case k: KafkaWireException =>
      k.code == Err.NotLeaderOrFollower ||
        k.code == Err.UnknownTopicOrPartition
    case _: java.io.IOException => true
    case _ => false
  }

  // ---- api keys & error codes (public protocol constants) ----------------

  object Api {
    val Produce = 0; val Fetch = 1; val ListOffsets = 2; val Metadata = 3
    val SaslHandshake = 17; val ApiVersions = 18; val SaslAuthenticate = 36
  }

  object Err {
    val None = 0
    val UnknownTopicOrPartition = 3
    val OffsetOutOfRange = 1
    val NotLeaderOrFollower = 6
    val UnsupportedSaslMechanism = 33
    val IllegalSaslState = 34
    val SaslAuthenticationFailed = 58
    def check(code: Int, ctx: String): Unit =
      if (code != None) throw new KafkaWireException(code, ctx)
  }

  final class KafkaWireException(val code: Int, ctx: String)
    extends RuntimeException(s"kafka error $code in $ctx")

  /** SASL/PLAIN initial response: NUL authzid NUL authcid NUL passwd
    * (RFC 4616). */
  def saslPlainToken(user: String, pass: String): Array[Byte] =
    ("\u0000" + user + "\u0000" + pass).getBytes(UTF_8)
}
