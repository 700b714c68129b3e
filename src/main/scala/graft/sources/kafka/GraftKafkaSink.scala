package graft.sources.kafka

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The produce side of the `graft-kafka` format: batch
  * (`df.write.format("graft-kafka")`) and streaming
  * (`writeStream.format("graft-kafka")`) sinks over [[KafkaWireClient]],
  * mirroring the official connector's contract:
  *
  *  - input columns: `value` (required, binary or string), optional
  *    `key` (binary or string), optional `topic` (when no `topic`
  *    option is set), optional `partition` (int);
  *  - rows without an explicit partition route by the Java producer's
  *    default partitioner (murmur2 of the key bytes, positive-masked,
  *    mod partition count) so keyed data co-locates exactly as it
  *    would under the official stack; un-keyed rows stick to the Spark
  *    task (one target partition per task — the sticky partitioner's
  *    batching rationale);
  *  - delivery is at-least-once: writers flush per task and retries
  *    may re-produce a batch (Kafka offers no cross-partition atomic
  *    commit; the official sink is at-least-once too).
  *
  * Scale shape: each task writes straight to the partition leaders it
  * routes to (one connection per leader, batches of
  * [[GraftKafkaSink.FlushRecords]]), no driver involvement in the data
  * path. `kafka.compression.type` selects the batch codec — zstd by
  * default off, matching producer defaults.
  */
object GraftKafkaSink {
  /** Records buffered per (topic, partition) before a produce flush. */
  val FlushRecords = 500
  /** Leader re-resolution attempts per flush before giving the error
    * to Spark's task retry. */
  val MaxProduceRetries = 3

  /** The Java producer's default partitioner hash: murmur2 (public
    * algorithm, seed 0x9747b28c) over the key bytes, sign-masked. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val len4 = data.length / 4
    var i = 0
    while (i < len4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tail = data.length & 3
    if (tail == 3) h ^= (data((data.length & ~3) + 2) & 0xff) << 16
    if (tail >= 2) h ^= (data((data.length & ~3) + 1) & 0xff) << 8
    if (tail >= 1) { h ^= data(data.length & ~3) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  def partitionFor(key: Array[Byte], numPartitions: Int, taskSticky: Int): Int =
    if (key == null) math.floorMod(taskSticky, numPartitions)
    else (murmur2(key) & 0x7fffffff) % numPartitions

  /** Column plan resolved once per writer from the input schema. */
  final case class ColumnPlan(
      valueIdx: Int, valueIsString: Boolean,
      keyIdx: Int, keyIsString: Boolean,
      topicIdx: Int, partitionIdx: Int, timestampIdx: Int)

  def planColumns(schema: StructType, topicOption: Option[String]): ColumnPlan = {
    def find(name: String): Int = schema.fieldNames.indexWhere(_ == name)
    val v = find("value")
    require(v >= 0, "graft-kafka sink requires a 'value' column")
    val vStr = schema(v).dataType match {
      case StringType => true
      case BinaryType => false
      case t => throw new IllegalArgumentException(
        s"'value' must be STRING or BINARY, got $t")
    }
    val k = find("key")
    val kStr = k >= 0 && (schema(k).dataType match {
      case StringType => true
      case BinaryType => false
      case t => throw new IllegalArgumentException(
        s"'key' must be STRING or BINARY, got $t")
    })
    val t = find("topic")
    require(t >= 0 || topicOption.isDefined,
      "set a 'topic' option or provide a 'topic' column")
    val p = find("partition")
    if (p >= 0) require(schema(p).dataType == IntegerType,
      s"'partition' must be INT, got ${schema(p).dataType}")
    val ts = find("timestamp")
    // the writer reads micros via getLong; a LongType millis column
    // would be silently divided by 1000 — reject anything non-timestamp
    if (ts >= 0) require(schema(ts).dataType == TimestampType,
      s"'timestamp' must be TIMESTAMP, got ${schema(ts).dataType}")
    ColumnPlan(v, vStr, k, kStr, t, p, ts)
  }
}

final case class GraftKafkaWriterCommit(records: Long) extends WriterCommitMessage

/** Write implementation shared by batch and streaming. */
class GraftKafkaWrite(bootstrap: GraftKafka.ClientConfig,
                      topicOption: Option[String],
                      codec: Int, schema: StructType)
    extends Write with BatchWrite with StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this

  private def factory = new GraftKafkaWriterFactory(
    bootstrap, topicOption, codec, schema)

  // both parents declare a default; at-least-once needs no coordinator
  override def useCommitCoordinator(): Boolean = false

  // batch
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    factory
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()

  // streaming (epoch = micro-batch; produce is at-least-once, the
  // checkpoint replays the epoch on crash before commit)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    factory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftKafkaWriterFactory(bootstrap: GraftKafka.ClientConfig,
                              topicOption: Option[String], codec: Int,
                              schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftKafkaDataWriter(bootstrap, topicOption, codec, schema, partitionId)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftKafkaDataWriter(bootstrap, topicOption, codec, schema, partitionId)
}

/** One task's producer: routes rows to topic partitions, buffers, and
  * produces batches to each partition's leader. */
class GraftKafkaDataWriter(bootstrap: GraftKafka.ClientConfig,
                           topicOption: Option[String], codec: Int,
                           schema: StructType, taskSticky: Int)
    extends DataWriter[InternalRow] {
  import GraftKafkaSink._

  private val plan = planColumns(schema, topicOption)
  // reconnectable: the planner socket dies in the same broker rolls the
  // produce retry loop handles — dropPlanner() forces a fresh bootstrap
  // connect on next use instead of wedging on the dead socket
  private var plannerRef: KafkaWireClient = null
  private def planner: KafkaWireClient = {
    if (plannerRef == null)
      plannerRef = bootstrap.connect(s"graft-writer-$taskSticky")
    plannerRef
  }
  private def dropPlanner(): Unit = {
    if (plannerRef != null) {
      try plannerRef.close() catch { case _: java.io.IOException => () }
      plannerRef = null
    }
  }
  // topic → (partition count, partition → leader (host, port))
  private val topoCache = mutable.Map.empty[String, (Int, Map[Int, (String, Int)])]
  private val leaderClients = mutable.Map.empty[(String, Int), KafkaWireClient]
  private val buffers =
    mutable.Map.empty[(String, Int), mutable.ArrayBuffer[(Long, Array[Byte], Array[Byte])]]
  private var written = 0L

  private def topology(topic: String): (Int, Map[Int, (String, Int)]) =
    topoCache.getOrElseUpdate(topic, {
      val meta = planner.metadata(Seq(topic))
      val t = meta.topics.find(_.name == topic).getOrElse(
        throw new IllegalArgumentException(s"unknown topic $topic"))
      val leaders = t.partitions.map { p =>
        val b = meta.leaderFor(topic, p.partition)
        p.partition -> ((b.host, b.port))
      }.toMap
      (t.partitions.size, leaders)
    })

  private def bytesAt(row: InternalRow, idx: Int, isString: Boolean): Array[Byte] =
    if (idx < 0 || row.isNullAt(idx)) null
    else if (isString) row.getUTF8String(idx).getBytes
    else row.getBinary(idx)

  override def write(row: InternalRow): Unit = {
    val topic = plan.topicIdx match {
      case i if i >= 0 && !row.isNullAt(i) => row.getUTF8String(i).toString
      case _ => topicOption.getOrElse(
        throw new IllegalArgumentException("row has no topic"))
    }
    val (nParts, _) = topology(topic)
    val key = bytesAt(row, plan.keyIdx, plan.keyIsString)
    val value = bytesAt(row, plan.valueIdx, plan.valueIsString)
    val partition = plan.partitionIdx match {
      case i if i >= 0 && !row.isNullAt(i) =>
        val explicit = row.getInt(i)
        require(explicit >= 0 && explicit < nParts,
          s"explicit partition $explicit out of range for topic '$topic' " +
            s"($nParts partitions)")
        explicit
      case _ => partitionFor(key, nParts, taskSticky)
    }
    val ts = plan.timestampIdx match {
      case i if i >= 0 && !row.isNullAt(i) => row.getLong(i) / 1000L // micros→ms
      case _ => System.currentTimeMillis()
    }
    val buf = buffers.getOrElseUpdate((topic, partition),
      new mutable.ArrayBuffer[(Long, Array[Byte], Array[Byte])](FlushRecords))
    buf += ((ts, key, value))
    if (buf.size >= FlushRecords) flush(topic, partition)
  }

  /** Produce with leader failover, mirroring the reader: on
    * NOT_LEADER / transient metadata errors / connection loss, drop the
    * cached topology and leader connection, re-resolve through the
    * planner, retry with doubling backoff. Retries may duplicate a
    * batch the broker appended before the connection died — the
    * documented at-least-once contract. */
  private def flush(topic: String, partition: Int): Unit = {
    val buf = buffers((topic, partition))
    if (buf.isEmpty) return
    var attempt = 0
    while (buf.nonEmpty) {
      // topology() INSIDE the retry scope: it talks to the planner
      // connection, which dies in exactly the broker-roll scenario this
      // loop exists for — a metadata failure must consume a retry and
      // re-resolve, not propagate with zero retries
      var leader: (String, Int) = null
      try {
        val (_, leaders) = topology(topic)
        leader = leaders.getOrElse(partition,
          throw new IllegalArgumentException(s"no leader for $topic-$partition"))
        val client = leaderClients.getOrElseUpdate(leader,
          new KafkaWireClient(leader._1, leader._2,
            s"graft-writer-$taskSticky", bootstrap.sasl, bootstrap.tls,
            tlsVerifyHostname = bootstrap.tlsVerifyHostname))
        client.produce(topic, partition, buf.toSeq, codec)
        written += buf.size
        buf.clear()
      } catch {
        case e: Throwable if KafkaWire.retriableError(e) &&
            attempt < MaxProduceRetries =>
          attempt += 1
          if (leader != null)
            leaderClients.remove(leader).foreach(c =>
              try c.close() catch { case _: java.io.IOException => () })
          topoCache.remove(topic) // the leader may have moved
          dropPlanner() // its socket may be the dead one
          Thread.sleep(100L << (attempt - 1))
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    buffers.keys.toSeq.foreach { case (t, p) => flush(t, p) }
    GraftKafkaWriterCommit(written)
  }

  override def abort(): Unit = () // at-least-once: nothing to undo

  override def close(): Unit = {
    leaderClients.values.foreach(c => try c.close() catch {
      case _: java.io.IOException => ()
    })
    dropPlanner()
  }
}
