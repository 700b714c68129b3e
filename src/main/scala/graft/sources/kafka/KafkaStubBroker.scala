package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import KafkaWire._

/** An in-JVM single-node Kafka broker speaking the same protocol subset
  * as [[KafkaWireClient]] — enough for wire-level end-to-end tests of
  * the A1 surface without external artifacts (the sandbox has no broker
  * and no Kafka jars; SURVEY §2.A A1). NOT a production broker: no
  * replication, retention, or consumer groups — the graft source manages
  * offsets itself (Spark checkpoints are the group state), so none of
  * those are needed to exercise the consumer path.
  *
  * Storage mirrors a real log segment: produced record batches are kept
  * as raw bytes, re-framed with their assigned base offset, and served
  * back whole on fetch (the zero-copy contract the client's
  * below-offset-skip handles). Partition count is fixed at
  * construction; topics auto-create on first produce, like the
  * reference's dev setup.
  *
  * Optional SASL/PLAIN: when credentials are set, every connection must
  * complete SaslHandshake + SaslAuthenticate before any other API —
  * wrong passwords get error 58, other APIs before auth get 34
  * (illegal SASL state), matching broker behavior.
  */
final class KafkaStubBroker(
    partitions: Int = 1,
    sasl: Option[(String, String)] = None,
    advertisedHost: String = "localhost",
    nodeId: Int = 0,
    cluster: Option[KafkaStubCluster] = None,
    tlsContext: Option[javax.net.ssl.SSLContext] = None)
    extends AutoCloseable {
  import KafkaStubBroker._

  /** Partition count, growable mid-test (`kafka-topics --alter`): new
    * partitions appear in the next Metadata response, which is exactly
    * how a live consumer discovers them. */
  @volatile private var partitionCount = partitions
  def growPartitions(to: Int): Unit = {
    require(to >= partitionCount, s"cannot shrink $partitionCount -> $to")
    partitionCount = to
  }

  private val store = cluster.map(_.store).getOrElse(new LogStore)
  private def logs = store.logs
  private def topics = store.topics
  // a TLS listener (`SSL`/`SASL_SSL`) wraps the accept socket with the
  // supplied context — the protocol bytes above the handshake are
  // identical, which is exactly what the wire client assumes
  private val server: ServerSocket = tlsContext match {
    case Some(ctx) => ctx.getServerSocketFactory.createServerSocket(0)
    case None => new ServerSocket(0)
  }
  @volatile private var running = true

  /** Who leads a partition: the cluster's (movable) assignment, or
    * this node when standalone. */
  private def leaderOf(topic: String, partition: Int): Int =
    cluster.map(_.leaderOf(topic, partition)).getOrElse(nodeId)

  /** Fault injection for failover tests: the next `n` fetched (or
    * produced) partitions answer NOT_LEADER_OR_FOLLOWER (what a broker
    * returns mid-leader-change) instead of data. */
  private val fetchFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  def failNextFetches(n: Int): Unit = fetchFailures.set(n)
  private val produceFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  def failNextProduces(n: Int): Unit = produceFailures.set(n)

  def port: Int = server.getLocalPort
  def bootstrapServers: String = s"$advertisedHost:$port"

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), s"kafka-stub-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed
      }
    }
  }, "kafka-stub-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { running = false; server.close() }

  /** Current log-end offset, for test assertions. */
  def endOffset(topic: String, partition: Int): Long = {
    val log = logs.get((topic, partition))
    if (log == null) 0L else log.synchronized(log.logEndOffset)
  }

  /** Test hook: append a batch stamped LogAppendTime (attributes bit 3)
    * — a broker-side rewrite a producer cannot express, so tests inject
    * it directly into the log as a real broker would have stored it. */
  def appendLogAppendTime(topic: String, partition: Int,
                          records: Seq[(Long, Array[Byte], Array[Byte])]): Unit = {
    val log = logFor(topic, partition)
    log.synchronized {
      val base = log.logEndOffset
      val bytes = encodeBatch(base, records, Codec.None, logAppendTime = true)
      log.batches += ((base, records.size, bytes))
      log.logEndOffset = base + records.size
    }
  }

  /** Test hook: append a TRANSACTIONAL data batch for `producerId` —
    * what a transactional producer sends mid-transaction. The
    * transaction stays open (pinning the last stable offset) until
    * [[endTxn]]. */
  def appendTransactional(topic: String, partition: Int, producerId: Long,
                          records: Seq[(Long, Array[Byte], Array[Byte])]): Unit = {
    val log = logFor(topic, partition)
    log.synchronized {
      val base = log.logEndOffset
      log.batches += ((base, records.size,
        encodeBatch(base, records, Codec.None, producerId = producerId)))
      log.logEndOffset = base + records.size
      if (!log.openTxns.contains(producerId))
        log.openTxns(producerId) = base
    }
  }

  /** Test hook: end `producerId`'s open transaction with a COMMIT or
    * ABORT control marker — the batch a transaction coordinator writes.
    * An abort is recorded in the log's aborted-transaction index, which
    * read_committed fetches serve. */
  def endTxn(topic: String, partition: Int, producerId: Long,
             commit: Boolean): Unit = {
    val log = logFor(topic, partition)
    log.synchronized {
      val first = log.openTxns.getOrElse(producerId,
        throw new IllegalStateException(
          s"no open transaction for producer $producerId"))
      val base = log.logEndOffset
      // control record: key = version int16 (0) + type int16
      // (0 abort, 1 commit); value = version int16 + coordinatorEpoch
      val key = Array[Byte](0, 0, 0, if (commit) 1 else 0)
      val value = Array[Byte](0, 0, 0, 0, 0, 0)
      log.batches += ((base, 1,
        encodeBatch(base, Seq((System.currentTimeMillis(), key, value)),
          Codec.None, producerId = producerId, control = true)))
      log.logEndOffset = base + 1
      log.openTxns -= producerId
      if (!commit) log.abortedTxns += ((producerId, first, base))
    }
  }

  private def logFor(topic: String, partition: Int): PartitionLog = {
    topics.add(topic)
    logs.computeIfAbsent((topic, partition), _ => new PartitionLog)
  }

  // ---- connection loop -----------------------------------------------------

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    var authenticated = sasl.isEmpty
    var authAttempted = false
    var handshaken = false
    try {
      while (running) {
        val size = in.readInt()
        require(size > 0 && size <= (128 << 20), s"bad request size $size")
        val req = new Array[Byte](size)
        in.readFully(req)
        val r = new Reader(req)
        val apiKey = r.int16().toInt
        val apiVersion = r.int16().toInt
        val corr = r.int32()
        r.nullableString() // client_id

        val w = new Writer()
        val sizeSlot = w.reserveInt32()
        w.int32(corr)
        apiKey match {
          case Api.ApiVersions => apiVersionsResp(w)
          case Api.SaslHandshake =>
            handshaken = handleHandshake(r, w)
          case Api.SaslAuthenticate =>
            authenticated = handleAuthenticate(r, w, handshaken)
            authAttempted = true
          case _ if !authenticated =>
            // non-SASL API before auth completes: kill with 34 in the
            // API's own error slot is api-specific; simplest faithful
            // behavior is closing after an auth failure — but for
            // pre-auth API calls brokers return IllegalSaslState on the
            // SASL exchange; here we close the connection.
            throw new IllegalStateException("API call before SASL auth")
          case Api.Metadata => metadataResp(r, w, apiVersion)
          case Api.ListOffsets => listOffsetsResp(r, w)
          case Api.Fetch => fetchResp(r, w)
          case Api.Produce => produceResp(r, w)
          case k => throw new IllegalStateException(s"unsupported api $k")
        }
        w.patchInt32(sizeSlot, w.size - 4)
        out.write(w.toBytes); out.flush()
        if (sasl.isDefined && authAttempted && !authenticated) {
          // failed SaslAuthenticate response already sent → broker closes
          return
        }
      }
    } catch {
      case _: EOFException | _: SocketException => // client went away
      case _: IllegalStateException => // protocol violation → drop conn
    } finally sock.close()
  }

  // ---- api handlers --------------------------------------------------------

  private def apiVersionsResp(w: Writer): Unit = {
    w.int16(Err.None)
    val apis = Seq(
      (Api.Produce, 3, 3), (Api.Fetch, 4, 4), (Api.ListOffsets, 1, 1),
      (Api.Metadata, 0, 1), (Api.SaslHandshake, 1, 1),
      (Api.ApiVersions, 0, 0), (Api.SaslAuthenticate, 0, 0))
    w.int32(apis.size)
    apis.foreach { case (k, lo, hi) => w.int16(k).int16(lo).int16(hi) }
  }

  private def handleHandshake(r: Reader, w: Writer): Boolean = {
    val mechanism = r.string()
    if (mechanism == "PLAIN") {
      w.int16(Err.None); w.int32(1); w.string("PLAIN"); true
    } else {
      w.int16(Err.UnsupportedSaslMechanism); w.int32(1); w.string("PLAIN"); false
    }
  }

  private def handleAuthenticate(r: Reader, w: Writer, handshaken: Boolean): Boolean = {
    val token = r.bytes()
    if (!handshaken) {
      w.int16(Err.IllegalSaslState)
      w.nullableString(Some("SaslAuthenticate before SaslHandshake"))
      w.bytes(Array.emptyByteArray)
      return false
    }
    val parts = new String(token, java.nio.charset.StandardCharsets.UTF_8)
      .split("\u0000", -1)
    val ok = sasl.exists { case (u, p) =>
      parts.length == 3 && parts(1) == u && parts(2) == p
    }
    if (ok) {
      w.int16(Err.None); w.nullableString(None); w.bytes(Array.emptyByteArray)
    } else {
      w.int16(Err.SaslAuthenticationFailed)
      w.nullableString(Some("invalid credentials"))
      w.bytes(Array.emptyByteArray)
    }
    ok
  }

  private def metadataResp(r: Reader, w: Writer, version: Int): Unit = {
    val requested = Seq.fill(r.int32())(r.string())
    val names =
      if (requested.isEmpty) topics.asScala.toSeq.sorted else requested
    // brokers: the whole cluster (any node serves full metadata, like a
    // real broker), or just this node standalone
    val brokerList = cluster.map(_.brokerList)
      .getOrElse(Seq((nodeId, advertisedHost, port)))
    w.int32(brokerList.size)
    brokerList.foreach { case (id, host, p) =>
      w.int32(id); w.string(host); w.int32(p)
      if (version >= 1) w.nullableString(None) // rack
    }
    if (version >= 1) w.int32(brokerList.head._1) // controller_id
    w.int32(names.size)
    names.foreach { t =>
      w.int16(Err.None); w.string(t)
      if (version >= 1) w.int8(0) // is_internal
      topics.add(t)
      val nParts = partitionCount
      w.int32(nParts)
      (0 until nParts).foreach { p =>
        logFor(t, p)
        w.int16(Err.None); w.int32(p); w.int32(leaderOf(t, p))
        w.int32(1); w.int32(leaderOf(t, p))        // replicas
        w.int32(1); w.int32(leaderOf(t, p))        // isr
      }
    }
  }

  private def listOffsetsResp(r: Reader, w: Writer): Unit = {
    r.int32() // replica_id
    val topicCount = r.int32()
    w.int32(topicCount)
    (0 until topicCount).foreach { _ =>
      val topic = r.string()
      val partCount = r.int32()
      w.string(topic); w.int32(partCount)
      (0 until partCount).foreach { _ =>
        val partition = r.int32()
        val timestamp = r.int64()
        val log = logFor(topic, partition)
        val offset = log.synchronized {
          if (timestamp == -2L) log.batches.headOption.map(_._1).getOrElse(0L)
          else if (timestamp == -1L) log.logEndOffset
          else {
            // timestamp lookup: earliest offset whose record ts >= query
            // (the log-segment semantics clients rely on); -1 when the
            // timestamp is past every record, per the protocol
            log.batches.iterator
              .flatMap { case (_, _, bytes) => decodeBatches(bytes) }
              .collectFirst { case rec if rec.timestamp >= timestamp => rec.offset }
              .getOrElse(-1L)
          }
        }
        w.int32(partition); w.int16(Err.None)
        w.int64(-1L) // timestamp (v1: match ts; -1 for earliest/latest probes)
        w.int64(offset)
      }
    }
  }

  private def fetchResp(r: Reader, w: Writer): Unit = {
    r.int32(); r.int32(); r.int32(); r.int32() // replica, wait, min, max
    val isolation = r.int8()
    val readCommitted = isolation == 1
    val topicCount = r.int32()
    w.int32(0) // throttle_time_ms
    w.int32(topicCount)
    (0 until topicCount).foreach { _ =>
      val topic = r.string()
      val partCount = r.int32()
      w.string(topic); w.int32(partCount)
      (0 until partCount).foreach { _ =>
        val partition = r.int32()
        val fetchOffset = r.int64()
        val partMaxBytes = r.int32()
        val log = logFor(topic, partition)
        if (leaderOf(topic, partition) != nodeId ||
            fetchFailures.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          w.int32(partition); w.int16(Err.NotLeaderOrFollower)
          w.int64(-1L); w.int64(-1L); w.int32(0)
          w.bytes(Array.emptyByteArray)
        } else {
        val (err, hwm, lso, abortedList, payload) = log.synchronized {
          val end = log.logEndOffset
          val stable = log.lastStableOffset
          // read_committed consumers see data only up to the LSO — a
          // batch of an OPEN transaction is invisible until resolved
          val visibleEnd = if (readCommitted) stable else end
          if (fetchOffset > end)
            (Err.OffsetOutOfRange, end, stable,
              Seq.empty[(Long, Long)], Array.emptyByteArray)
          else {
            // serve whole stored batches starting at the one containing
            // fetchOffset, up to partMaxBytes (always ≥ 1 batch)
            val fromIdx = log.batches.indexWhere {
              case (base, count, _) => base + count > fetchOffset
            }
            if (fromIdx < 0)
              (Err.None, end, stable,
                Seq.empty[(Long, Long)], Array.emptyByteArray)
            else {
              val out = new java.io.ByteArrayOutputStream()
              var i = fromIdx
              var servedThrough = fetchOffset
              while (i < log.batches.size &&
                     log.batches(i)._1 < visibleEnd &&
                     (out.size == 0 || out.size + log.batches(i)._3.length <= partMaxBytes)) {
                out.write(log.batches(i)._3)
                servedThrough = log.batches(i)._1 + log.batches(i)._2
                i += 1
              }
              // the aborted-txn index entries a reader of this range
              // needs: markers at/after the fetch offset (an older
              // marker means the whole aborted range precedes the
              // fetch), first offsets before the served end
              val aborted =
                if (!readCommitted) Seq.empty[(Long, Long)]
                else log.abortedTxns.collect {
                  case (pid, first, marker)
                    if marker >= fetchOffset && first < servedThrough =>
                      (pid, first)
                }.toSeq
              (Err.None, end, stable, aborted, out.toByteArray)
            }
          }
        }
        w.int32(partition); w.int16(err)
        w.int64(hwm)  // high_watermark
        w.int64(lso)  // last_stable_offset
        w.int32(abortedList.size)
        abortedList.foreach { case (pid, first) =>
          w.int64(pid); w.int64(first)
        }
        w.bytes(payload)
        }
      }
    }
  }

  private def produceResp(r: Reader, w: Writer): Unit = {
    r.nullableString() // transactional_id
    r.int16()          // acks
    r.int32()          // timeout
    val topicCount = r.int32()
    w.int32(topicCount)
    (0 until topicCount).foreach { _ =>
      val topic = r.string()
      val partCount = r.int32()
      w.string(topic); w.int32(partCount)
      (0 until partCount).foreach { _ =>
        val partition = r.int32()
        val batchBytes = r.bytes()
        if (leaderOf(topic, partition) != nodeId ||
            produceFailures.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          w.int32(partition); w.int16(Err.NotLeaderOrFollower)
          w.int64(-1L); w.int64(-1L)
        } else {
          // count records + re-base the batch at the assigned offset
          val records = decodeBatches(batchBytes)
          val log = logFor(topic, partition)
          val baseOffset = log.synchronized {
            val base = log.logEndOffset
            val rebased = rebase(batchBytes, base)
            log.batches += ((base, records.size, rebased))
            log.logEndOffset = base + records.size
            base
          }
          w.int32(partition); w.int16(Err.None)
          w.int64(baseOffset)
          w.int64(-1L) // log_append_time (CreateTime batches)
        }
      }
    }
    w.int32(0) // throttle_time_ms
  }

  /** Rewrite a produced batch's baseOffset to its assigned position —
    * what a real log does on append. The CRC does not cover baseOffset,
    * so no re-checksum is needed (that is WHY the spec excludes it). */
  private def rebase(batch: Array[Byte], baseOffset: Long): Array[Byte] = {
    val b = java.util.Arrays.copyOf(batch, batch.length)
    java.nio.ByteBuffer.wrap(b, 0, 8).putLong(baseOffset)
    b
  }
}

object KafkaStubBroker {
  /** One partition's log: synchronized on the buffer itself. */
  private[kafka] final class PartitionLog {
    val batches = new ArrayBuffer[(Long, Int, Array[Byte])] // (base, count, bytes)
    var logEndOffset = 0L
    // transaction bookkeeping, exactly what a broker's producer-state
    // and aborted-txn index keep: open transactions (pid → first
    // offset) pin the last stable offset; resolved aborts are served to
    // read_committed fetches as (pid, firstOffset, markerOffset)
    val openTxns = scala.collection.mutable.Map.empty[Long, Long]
    val abortedTxns = new ArrayBuffer[(Long, Long, Long)]
    def lastStableOffset: Long =
      if (openTxns.isEmpty) logEndOffset else openTxns.values.min
  }

  /** The log + topic registry — per broker standalone, shared across a
    * [[KafkaStubCluster]] (stand-in for replication: every node holds
    * the data, leadership decides who SERVES it). */
  private[kafka] final class LogStore {
    val logs = new ConcurrentHashMap[(String, Int), PartitionLog]()
    val topics: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()
  }
}

/** A multi-node stub cluster: N brokers share one [[KafkaStubBroker
  * .LogStore]] and a MOVABLE leader assignment — `moveLeader` is a real
  * mid-read leader change (the old leader starts answering NOT_LEADER,
  * fresh metadata from ANY node names the new one), which is the one
  * failure mode a single-node stub cannot exercise. */
final class KafkaStubCluster(
    brokers: Int,
    partitions: Int = 1,
    sasl: Option[(String, String)] = None) extends AutoCloseable {
  private[kafka] val store = new KafkaStubBroker.LogStore
  private val leaders = new ConcurrentHashMap[(String, Int), Integer]()
  val nodes: Seq[KafkaStubBroker] = (0 until brokers).map { id =>
    new KafkaStubBroker(partitions, sasl, "localhost", id, Some(this))
  }

  /** Default leadership spreads partitions round-robin over nodes. */
  def leaderOf(topic: String, partition: Int): Int =
    Option(leaders.get((topic, partition)))
      .map(_.intValue).getOrElse(partition % nodes.size)

  /** Move a partition's leadership — takes effect on the next request
    * to either node, like a controller-driven leader election. */
  def moveLeader(topic: String, partition: Int, toNode: Int): Unit =
    leaders.put((topic, partition), toNode)

  private[kafka] def brokerList: Seq[(Int, String, Int)] =
    nodes.zipWithIndex.map { case (b, id) => (id, "localhost", b.port) }

  def bootstrapServers: String = nodes.map(_.bootstrapServers).mkString(",")
  override def close(): Unit = nodes.foreach(_.close())
}
