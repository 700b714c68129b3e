package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.atomic.AtomicInteger

import KafkaWire._

/** A minimal blocking Kafka client over one TCP connection — the
  * consumer subset of the public protocol: ApiVersions, Metadata,
  * ListOffsets, Fetch, plus Produce (for tests/tools) and SASL/PLAIN
  * (the reference's auth mode, /root/reference/main.go:224-227).
  *
  * Deliberately uses the oldest non-flexible API versions (no tagged
  * fields): Metadata v0, ListOffsets v1, Fetch v4, Produce v3,
  * ApiVersions v0, SaslHandshake v1 + SaslAuthenticate v0. Every broker
  * since 0.11 (the first with record-batch v2) serves these.
  *
  * One instance = one connection = one thread's client; Spark-side
  * callers create one per partition reader (and one on the driver for
  * offset planning), matching the official connector's consumer-per-task
  * model. TLS (`SSL`/`SASL_SSL` protocols) wraps the socket with the
  * default JSSE context.
  */
final class KafkaWireClient(
    host: String,
    port: Int,
    clientId: String = "graft",
    sasl: Option[(String, String)] = None,
    tls: Boolean = false,
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 30000,
    tlsVerifyHostname: Boolean = true) extends AutoCloseable {

  private val socket: Socket = {
    val s =
      if (tls) {
        val ssl = javax.net.ssl.SSLSocketFactory.getDefault.createSocket()
          .asInstanceOf[javax.net.ssl.SSLSocket]
        // JSSE validates the chain but does NOT verify the hostname on
        // raw SSLSockets unless told to — without this, any valid cert
        // for any host passes and SASL credentials can be MITM'd. The
        // official client defaults ssl.endpoint.identification.algorithm
        // = https; "" in that option maps to tlsVerifyHostname = false.
        if (tlsVerifyHostname) {
          val params = ssl.getSSLParameters
          params.setEndpointIdentificationAlgorithm("HTTPS")
          ssl.setSSLParameters(params)
        }
        ssl
      } else new Socket()
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    s.setSoTimeout(requestTimeoutMs)
    s.setTcpNoDelay(true)
    s
  }
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(socket.getInputStream)
  private val correlation = new AtomicInteger(0)

  sasl.foreach { case (user, pass) => authenticate(user, pass) }

  override def close(): Unit = socket.close()

  /** Frame and send one request, read the matching response body. */
  private def send(apiKey: Int, apiVersion: Int)(body: Writer => Unit): Reader =
    synchronized {
      val corr = correlation.incrementAndGet()
      val w = new Writer()
      val sizeSlot = w.reserveInt32()
      w.int16(apiKey).int16(apiVersion).int32(corr).nullableString(Some(clientId))
      body(w)
      w.patchInt32(sizeSlot, w.size - 4)
      out.write(w.toBytes); out.flush()
      val respSize = in.readInt()
      require(respSize >= 4 && respSize <= (128 << 20), s"bad response size $respSize")
      val resp = new Array[Byte](respSize)
      in.readFully(resp)
      val r = new Reader(resp)
      val gotCorr = r.int32()
      require(gotCorr == corr, s"correlation mismatch: sent $corr got $gotCorr")
      r
    }

  // ---- sasl ----------------------------------------------------------------

  private def authenticate(user: String, pass: String): Unit = {
    val hs = send(Api.SaslHandshake, 1)(_.string("PLAIN"))
    val hsErr = hs.int16().toInt
    if (hsErr != Err.None) {
      val mechanisms = Seq.fill(hs.int32())(hs.string())
      throw new KafkaWireException(hsErr,
        s"SaslHandshake(PLAIN); broker offers ${mechanisms.mkString(",")}")
    }
    val auth = send(Api.SaslAuthenticate, 0)(_.bytes(saslPlainToken(user, pass)))
    val authErr = auth.int16().toInt
    if (authErr != Err.None) {
      val msg = auth.nullableString().getOrElse("")
      throw new KafkaWireException(authErr, s"SaslAuthenticate: $msg")
    }
  }

  // ---- api calls -----------------------------------------------------------

  import KafkaWireClient._

  def apiVersions(): Map[Int, (Int, Int)] = {
    val r = send(Api.ApiVersions, 0)(_ => ())
    Err.check(r.int16().toInt, "ApiVersions")
    Seq.fill(r.int32())((r.int16().toInt, (r.int16().toInt, r.int16().toInt))).toMap
  }

  def metadata(topics: Seq[String]): Metadata = {
    val r = send(Api.Metadata, 0) { w =>
      w.int32(topics.size); topics.foreach(w.string)
    }
    val brokers = Seq.fill(r.int32()) {
      BrokerMeta(r.int32(), r.string(), r.int32())
    }
    val topicMeta = Seq.fill(r.int32()) {
      val err = r.int16().toInt
      val name = r.string()
      val parts = Seq.fill(r.int32()) {
        val perr = r.int16().toInt
        val pm = PartitionMeta(r.int32(), r.int32())
        r.skip(4 * r.int32()) // replicas
        r.skip(4 * r.int32()) // isr
        Err.check(perr, s"Metadata($name-${pm.partition})")
        pm
      }
      Err.check(err, s"Metadata($name)")
      TopicMeta(name, parts)
    }
    Metadata(brokers, topicMeta)
  }

  /** ListOffsets v1: timestamp -2 = earliest, -1 = latest (log end). */
  def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
    val r = send(Api.ListOffsets, 1) { w =>
      w.int32(-1) // replica_id: consumer
      w.int32(1); w.string(topic)
      w.int32(1); w.int32(partition); w.int64(timestamp)
    }
    val topicCount = r.int32()
    require(topicCount == 1, s"ListOffsets returned $topicCount topics")
    r.string()
    val partCount = r.int32()
    require(partCount == 1, s"ListOffsets returned $partCount partitions")
    r.int32() // partition index
    Err.check(r.int16().toInt, s"ListOffsets($topic-$partition)")
    r.int64() // timestamp
    r.int64() // offset
  }

  def earliestOffset(topic: String, partition: Int): Long =
    listOffset(topic, partition, -2L)
  def latestOffset(topic: String, partition: Int): Long =
    listOffset(topic, partition, -1L)

  /** Fetch v4 from one partition. Returns whole batches as stored; the
    * caller filters records below `offset` (broker zero-copy contract,
    * see [[KafkaWire.decodeBatches]]).
    *
    * `isolation` 0 = read_uncommitted (franz-go's and the reference's
    * default), 1 = read_committed: the broker serves data only up to
    * the last stable offset plus the aborted-transactions list, and the
    * decode drops every data batch of an aborted transaction
    * ([[KafkaWire.decodeBatchesWithNext]]'s consumer-side half). */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 8 << 20, maxWaitMs: Int = 500,
            isolation: Int = 0): FetchResult = {
    val r = send(Api.Fetch, 4) { w =>
      w.int32(-1)          // replica_id
      w.int32(maxWaitMs)
      w.int32(1)           // min_bytes
      w.int32(maxBytes)    // max_bytes (whole response)
      w.int8(isolation.toByte)
      w.int32(1); w.string(topic)
      w.int32(1); w.int32(partition); w.int64(offset); w.int32(maxBytes)
    }
    r.int32() // throttle_time_ms
    val topicCount = r.int32()
    require(topicCount == 1, s"Fetch returned $topicCount topics")
    r.string()
    val partCount = r.int32()
    require(partCount == 1, s"Fetch returned $partCount partitions")
    r.int32() // partition index
    Err.check(r.int16().toInt, s"Fetch($topic-$partition@$offset)")
    val highWatermark = r.int64()
    val lastStable = r.int64()
    val abortedCount = r.int32()
    val aborted =
      if (abortedCount <= 0) Nil
      else Seq.fill(abortedCount)((r.int64(), r.int64()))
    val recordSet = r.bytes()
    val (records, nextAfter) = decodeBatchesWithNext(recordSet,
      if (isolation == 1) aborted else Nil)
    FetchResult(highWatermark,
      records.filter(_.offset >= offset), nextAfter, lastStable)
  }

  /** Produce v3 (acks=-1) — the test/tool producer twin. Returns the
    * assigned base offset. */
  def produce(topic: String, partition: Int,
              records: Seq[(Long, Array[Byte], Array[Byte])],
              codec: Int = KafkaWire.Codec.None): Long = {
    val batch = encodeBatch(0L, records, codec)
    val r = send(Api.Produce, 3) { w =>
      w.nullableString(None) // transactional_id
      w.int16(-1)            // acks: all
      w.int32(requestTimeoutMs)
      w.int32(1); w.string(topic)
      w.int32(1); w.int32(partition); w.bytes(batch)
    }
    val topicCount = r.int32()
    require(topicCount == 1, s"Produce returned $topicCount topics")
    r.string()
    val partCount = r.int32()
    require(partCount == 1, s"Produce returned $partCount partitions")
    r.int32() // partition index
    Err.check(r.int16().toInt, s"Produce($topic-$partition)")
    r.int64() // base_offset
  }
}

object KafkaWireClient {
  final case class PartitionMeta(partition: Int, leader: Int)
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class TopicMeta(name: String, partitions: Seq[PartitionMeta])
  final case class Metadata(brokers: Seq[BrokerMeta], topics: Seq[TopicMeta]) {
    def leaderFor(topic: String, partition: Int): BrokerMeta = {
      val leaderId = topics.find(_.name == topic)
        .flatMap(_.partitions.find(_.partition == partition))
        .getOrElse(throw new IllegalArgumentException(
          s"unknown partition $topic-$partition")).leader
      brokers.find(_.nodeId == leaderId).getOrElse(
        throw new IllegalStateException(s"no broker metadata for leader $leaderId"))
    }
  }
  /** One partition fetch: the post-filter records plus `nextOffset`,
    * the offset AFTER the last complete batch returned (-1 when none) —
    * the consumer's advance position even when every record was
    * filtered (control batches, compaction holes). `lastStableOffset`
    * is the broker's LSO (-1 on old brokers): under read_committed,
    * records at/after it are invisible until their transaction
    * resolves. */
  final case class FetchResult(highWatermark: Long, records: Seq[Record],
                               nextOffset: Long,
                               lastStableOffset: Long = -1L)
}
