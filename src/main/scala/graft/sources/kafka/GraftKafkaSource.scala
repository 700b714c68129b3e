package graft.sources.kafka

import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.readStream.format("graft-kafka")` — a native DataSource V2
  * Kafka source built on [[KafkaWireClient]] (no external Kafka jars;
  * the sandbox classpath has none, and at 100 TB the consumer protocol
  * is simple enough that owning it removes a dependency wall).
  *
  * Drop-in option-compatible with the official connector for the subset
  * the reference uses (/root/reference/main.go:221-232 via franz-go):
  * `kafka.bootstrap.servers`, `subscribe`, `startingOffsets`
  * (earliest/latest/JSON), `endingOffsets` (batch), `minPartitions`,
  * `maxOffsetsPerTrigger`, `kafka.security.protocol`
  * (PLAINTEXT/SASL_PLAINTEXT/SSL/SASL_SSL), `kafka.sasl.mechanism`
  * (PLAIN), `kafka.sasl.jaas.config`. Output schema matches the
  * official source exactly, so [[graft.streaming.BidPipeline.decode]]
  * is agnostic to which provider produced the frame.
  *
  * Scale shape: the driver keeps ONE connection for metadata + offset
  * planning; each input partition is an offset range read by its own
  * executor-side connection straight from the partition leader — the
  * same consumer-per-task model as the official connector, so a
  * 1000-executor cluster fans out across brokers with no driver
  * involvement in the data path. `maxOffsetsPerTrigger` is enforced
  * through Spark's admission-control API with per-partition
  * proportional distribution; `minPartitions` splits large ranges so
  * a 5-partition topic can still feed 32 cores.
  */
class GraftKafkaSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafka.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftKafkaTable(new CaseInsensitiveStringMap(properties))
}

object GraftKafka {
  /** The official Kafka source schema, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  final case class ClientConfig(
      servers: Seq[(String, Int)],
      sasl: Option[(String, String)], tls: Boolean,
      tlsVerifyHostname: Boolean = true) {
    def host: String = servers.head._1
    def port: Int = servers.head._2
    /** Connect to the first reachable bootstrap server — the official
      * client's multi-server bootstrap contract (any one seed is enough
      * to discover the cluster; a down seed must not fail the query). */
    def connect(clientId: String): KafkaWireClient = {
      var last: Exception = null
      servers.foreach { case (h, p) =>
        try return new KafkaWireClient(h, p, clientId, sasl, tls,
          tlsVerifyHostname = tlsVerifyHostname)
        catch { case e: java.io.IOException => last = e }
      }
      throw new java.io.IOException(
        s"no bootstrap server reachable: ${servers.map(s => s"${s._1}:${s._2}")
          .mkString(",")}", last)
    }
  }

  /** The official connector's three subscription modes — exactly one
    * per query. */
  sealed trait Subscription {
    /** Resolve to concrete topic names (one Metadata call for
      * patterns — brokers list all topics for an empty request). */
    def topics(client: KafkaWireClient): Seq[String] = this match {
      case Subscribe(ts) => ts
      case Assign(parts) => parts.keys.toSeq.sorted
      case SubscribePattern(re) =>
        val all = client.metadata(Nil).topics.map(_.name)
        val matched = all.filter(re.pattern.matcher(_).matches()).sorted
        require(matched.nonEmpty,
          s"subscribePattern '$re' matches none of ${all.size} topics")
        matched
    }
    /** Partition filter: Assign restricts to the listed partitions. */
    def includes(topic: String, partition: Int): Boolean = this match {
      case Assign(parts) => parts.get(topic).exists(_.contains(partition))
      case _ => true
    }
  }
  final case class Subscribe(ts: Seq[String]) extends Subscription
  final case class SubscribePattern(re: scala.util.matching.Regex) extends Subscription
  final case class Assign(parts: Map[String, Set[Int]]) extends Subscription

  final case class Options(
      bootstrap: ClientConfig,
      subscription: Subscription,
      // raw user values; the per-mode default is applied at resolve time
      // (official semantics: batch defaults to earliest, stream to latest)
      startingOffsets: Option[String],
      endingOffsets: Option[String],
      maxOffsetsPerTrigger: Option[Long],
      minPartitions: Int,
      fetchMaxBytes: Int,
      // official precedence: byTimestamp > global timestamp > offsets
      startingTimestamp: Option[Long] = None,
      startingOffsetsByTimestamp: Option[OffsetMap] = None,
      endingTimestamp: Option[Long] = None,
      endingOffsetsByTimestamp: Option[OffsetMap] = None,
      // 0 = read_uncommitted (franz-go's and the reference's default),
      // 1 = read_committed: aborted transactions' rows are dropped at
      // the fetch decode and open transactions gate the readable end
      isolation: Int = 0)

  /** Bootstrap + security options — the subset both the read and write
    * paths need (`subscribe` is read-only; the sink takes `topic`). */
  def parseClient(options: CaseInsensitiveStringMap): ClientConfig = {
    val servers = Option(options.get("kafka.bootstrap.servers")).getOrElse(
      throw new IllegalArgumentException("kafka.bootstrap.servers is required"))
    val hps = servers.split(",").map(_.trim).filter(_.nonEmpty).map { s =>
      val hp = s.split(":")
      require(hp.length == 2, s"bad bootstrap server '$s' in '$servers'")
      (hp(0).trim, hp(1).trim.toInt)
    }.toSeq
    require(hps.nonEmpty, s"no bootstrap servers in '$servers'")
    val protocol = Option(options.get("kafka.security.protocol"))
      .getOrElse("PLAINTEXT").toUpperCase
    val tls = protocol.contains("SSL")
    val sasl =
      if (!protocol.contains("SASL")) None
      else {
        val mech = Option(options.get("kafka.sasl.mechanism")).getOrElse("PLAIN")
        require(mech.equalsIgnoreCase("PLAIN"),
          s"only SASL/PLAIN is supported (got $mech)")
        val jaas = Option(options.get("kafka.sasl.jaas.config")).getOrElse(
          throw new IllegalArgumentException(
            "kafka.sasl.jaas.config required for SASL"))
        val user = "username=\"([^\"]*)\"".r.findFirstMatchIn(jaas)
        val pass = "password=\"([^\"]*)\"".r.findFirstMatchIn(jaas)
        require(user.isDefined && pass.isDefined,
          "jaas config must carry username=\"..\" password=\"..\"")
        Some((user.get.group(1), pass.get.group(1)))
      }
    // official knob: ssl.endpoint.identification.algorithm defaults to
    // https (verify the server hostname against its cert); the empty
    // string disables verification — e.g. self-signed lab certs minted
    // for a different name
    val verify = Option(
        options.get("kafka.ssl.endpoint.identification.algorithm"))
      .map(_.trim).forall(_.nonEmpty)
    ClientConfig(hps, sasl, tls, verify)
  }

  def parseOptions(options: CaseInsensitiveStringMap): Options = {
    val modes = Seq(
      Option(options.get("subscribe")).map(s =>
        Subscribe(s.split(",").map(_.trim).filter(_.nonEmpty).toSeq)),
      Option(options.get("subscribePattern")).map(p =>
        SubscribePattern(p.r)),
      Option(options.get("assign")).map(j => Assign(assignFromJson(j)))
    ).flatten
    require(modes.size == 1,
      "exactly one of subscribe, subscribePattern, assign is required")
    Options(
      parseClient(options),
      modes.head,
      Option(options.get("startingOffsets")),
      Option(options.get("endingOffsets")),
      Option(options.get("maxOffsetsPerTrigger")).map(_.toLong),
      Option(options.get("minPartitions")).map(_.toInt).getOrElse(0),
      Option(options.get("kafka.max.partition.fetch.bytes"))
        .map(_.toInt).getOrElse(8 << 20),
      Option(options.get("startingTimestamp")).map(_.toLong),
      // same JSON shape as offsets: {"topic":{"0":<epoch-ms>}}
      Option(options.get("startingOffsetsByTimestamp")).map(offsetsFromJson),
      Option(options.get("endingTimestamp")).map(_.toLong),
      Option(options.get("endingOffsetsByTimestamp")).map(offsetsFromJson),
      Option(options.get("kafka.isolation.level"))
        .map(_.trim.toLowerCase) match {
        case None | Some("read_uncommitted") => 0
        case Some("read_committed") => 1
        case Some(other) => throw new IllegalArgumentException(
          s"kafka.isolation.level must be read_uncommitted or " +
            s"read_committed, got '$other'")
      })
  }

  /** Resolve the query's start offsets with the official precedence:
    * per-partition timestamps, then a global timestamp, then
    * `startingOffsets`. A timestamp past every record in a partition is
    * an error (the official `error` strategy) — silently starting at
    * latest would skip data the caller asked for by time.
    *
    * `default` is the per-mode fallback when no option was set: the
    * official connector starts BATCH queries at "earliest" (a bounded
    * read of latest→latest would always be empty) and STREAMS at
    * "latest" (only new data). */
  def resolveStart(client: KafkaWireClient, opts: Options,
                   default: String): OffsetMap = {
    def forTime(topic: String, partition: Int, ts: Long): Long = {
      val off = client.listOffset(topic, partition, ts)
      require(off >= 0L,
        s"no offset at or after timestamp $ts for $topic-$partition " +
          "(the log ends earlier); use startingOffsets instead")
      off
    }
    opts.startingOffsetsByTimestamp match {
      case Some(byTs) =>
        byTs.map { case ((t, p), ts) => (t, p) -> forTime(t, p, ts) }
      case None => opts.startingTimestamp match {
        case Some(ts) =>
          val meta = client.metadata(opts.subscription.topics(client))
          meta.topics.flatMap { t =>
            t.partitions
              .withFilter(p => opts.subscription.includes(t.name, p.partition))
              .map(p => (t.name, p.partition) -> forTime(t.name, p.partition, ts))
          }.toMap
        case None =>
          // lowercase ONLY for the latest/earliest literal comparison:
          // topic names inside the JSON form are case-sensitive, and a
          // lowercased key would miss the real topic in the offset map
          // (silently falling back to earliest)
          val raw = opts.startingOffsets.getOrElse(default).trim
          normalized(raw) match {
            case "latest" => snapshot(client, opts.subscription, earliest = false)
            case "earliest" => snapshot(client, opts.subscription, earliest = true)
            case _ => resolveSpecials(client, offsetsFromJson(raw))
          }
      }
    }
  }

  /** Resolve a bounded read's end offsets. A timestamp past every
    * record in a partition means "read to the log end" (the bound
    * excludes nothing), unlike the start side where it is an error. */
  def resolveEnd(client: KafkaWireClient, opts: Options): OffsetMap = {
    def forTime(topic: String, partition: Int, ts: Long): Long = {
      val off = client.listOffset(topic, partition, ts)
      if (off >= 0L) off else client.latestOffset(topic, partition)
    }
    opts.endingOffsetsByTimestamp match {
      case Some(byTs) =>
        byTs.map { case ((t, p), ts) => (t, p) -> forTime(t, p, ts) }
      case None => opts.endingTimestamp match {
        case Some(ts) =>
          val meta = client.metadata(opts.subscription.topics(client))
          meta.topics.flatMap { t =>
            t.partitions
              .withFilter(p => opts.subscription.includes(t.name, p.partition))
              .map(p => (t.name, p.partition) -> forTime(t.name, p.partition, ts))
          }.toMap
        case None =>
          // same case-preservation as resolveStart: see the note there
          val raw = opts.endingOffsets.getOrElse("latest").trim
          normalized(raw) match {
            case "latest" => snapshot(client, opts.subscription, earliest = false)
            case "earliest" => snapshot(client, opts.subscription, earliest = true)
            case _ => resolveSpecials(client, offsetsFromJson(raw))
          }
      }
    }
  }

  // ---- offset maps ---------------------------------------------------------

  type OffsetMap = Map[(String, Int), Long]

  /** Same JSON shape as the official source:
    * {"topic":{"0":42,"1":17}}, partitions sorted for determinism. */
  def offsetsToJson(m: OffsetMap): String =
    m.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (topic, parts) =>
      val inner = parts.toSeq.sortBy(_._1._2)
        .map { case ((_, p), off) => s""""$p":$off""" }.mkString(",")
      s""""$topic":{$inner}"""
    }.mkString("{", ",", "}")

  /** Official `assign` JSON: {"topicA":[0,1],"topicB":[2,4]}. */
  def assignFromJson(json: String): Map[String, Set[Int]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val out = mutable.Map[String, Set[Int]]()
    root.properties().asScala.foreach { e =>
      out(e.getKey) = e.getValue.elements().asScala.map(_.asInt()).toSet
    }
    require(out.nonEmpty && out.values.forall(_.nonEmpty),
      s"assign must list at least one partition per topic: $json")
    out.toMap
  }

  /** The official source trims and lowercases the starting/ending
    * offset option before matching "latest"/"earliest". */
  private def normalized(v: String): String =
    v.trim.toLowerCase(java.util.Locale.ROOT)

  /** Official JSON offset specials: -1 = latest, -2 = earliest, per
    * partition. Passing them through literally would silently plan an
    * empty range (-1 as an end) or fetch OFFSET_OUT_OF_RANGE (-2 as a
    * start). */
  private def resolveSpecials(client: KafkaWireClient,
                              m: OffsetMap): OffsetMap =
    m.map {
      case ((t, p), -1L) => (t, p) -> client.latestOffset(t, p)
      case ((t, p), -2L) => (t, p) -> client.earliestOffset(t, p)
      case other =>
        require(other._2 >= 0L,
          s"negative offset ${other._2} for ${other._1} " +
            "(only -1 latest / -2 earliest are special)")
        other
    }

  def offsetsFromJson(json: String): OffsetMap = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val out = mutable.Map[(String, Int), Long]()
    root.properties().asScala.foreach { e =>
      e.getValue.properties().asScala.foreach { p =>
        out((e.getKey, p.getKey.toInt)) = p.getValue.asLong()
      }
    }
    out.toMap
  }

  /** Snapshot offsets for all subscribed partitions in one driver pass. */
  def snapshot(client: KafkaWireClient, sub: Subscription,
               earliest: Boolean): OffsetMap = {
    val meta = client.metadata(sub.topics(client))
    meta.topics.flatMap { t =>
      t.partitions.withFilter(p => sub.includes(t.name, p.partition)).map { p =>
        val off =
          if (earliest) client.earliestOffset(t.name, p.partition)
          else client.latestOffset(t.name, p.partition)
        (t.name, p.partition) -> off
      }
    }.toMap
  }

  /** Proportional per-partition admission cap — the official source's
    * rate-limit semantics: each partition advances by
    * `lag * maxRows / totalLag` (at least 1 when it has lag, so no
    * partition starves). */
  def capOffsets(start: OffsetMap, latest: OffsetMap, maxRows: Long): OffsetMap = {
    val lags = latest.map { case (tp, end) =>
      tp -> math.max(0L, end - start.getOrElse(tp, end))
    }
    val total = lags.values.sum
    if (total <= maxRows) latest
    else latest.map { case (tp, end) =>
      val lag = lags(tp)
      val take =
        if (lag == 0) 0L
        else math.max(1L, (lag.toDouble * maxRows / total).toLong)
      tp -> math.min(end, start.getOrElse(tp, end) + take)
    }
  }
}

final class GraftKafkaOffset(val offsets: GraftKafka.OffsetMap) extends Offset {
  override def json(): String = GraftKafka.offsetsToJson(offsets)
  override def equals(o: Any): Boolean = o match {
    case g: GraftKafkaOffset => g.offsets == offsets
    case _ => false
  }
  override def hashCode(): Int = offsets.hashCode()
}

class GraftKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"graft-kafka:${Option(options.get("subscribe"))
      .orElse(Option(options.get("topic"))).getOrElse("?")}"
  override def schema(): StructType = GraftKafka.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA) // sink input ≠ source schema
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftKafkaScan(opts)
    }
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write = {
        val opts = info.options()
        val topicOption = Option(opts.get("topic"))
        val codec = KafkaWire.Codec.parse(
          Option(opts.get("kafka.compression.type")).getOrElse("none"))
        // validate the column plan at planning time, not in the task
        GraftKafkaSink.planColumns(info.schema(), topicOption)
        new GraftKafkaWrite(
          GraftKafka.parseClient(opts), topicOption, codec, info.schema())
      }
    }
}

class GraftKafkaScan(options: CaseInsensitiveStringMap) extends Scan {
  private val opts = GraftKafka.parseOptions(options)
  override def readSchema(): StructType = GraftKafka.schema
  override def description(): String =
    s"graft-kafka [${opts.subscription}]"
  override def toBatch: Batch = new GraftKafkaBatch(opts)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftKafkaMicroBatchStream(opts)
}

/** Bounded read: `startingOffsets` → `endingOffsets` resolved once at
  * planning. */
class GraftKafkaBatch(opts: GraftKafka.Options) extends Batch {
  import GraftKafka._

  override def planInputPartitions(): Array[InputPartition] = {
    val client = opts.bootstrap.connect("graft-batch-planner")
    try {
      val start = resolveStart(client, opts, default = "earliest")
      val end = resolveEnd(client, opts)
      GraftKafkaPlanner.plan(client, opts, start, end)
    } finally client.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKafkaReaderFactory(opts.fetchMaxBytes, opts.isolation)
}

class GraftKafkaMicroBatchStream(opts: GraftKafka.Options)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import GraftKafka._

  // the planner connection is re-established on failure: a broker roll
  // that kills this one socket must not kill the QUERY's offset
  // planning while other seeds are alive (the data-path readers already
  // fail over per task)
  @transient private var clientRef: KafkaWireClient = null
  private def client: KafkaWireClient = synchronized {
    if (clientRef == null)
      clientRef = opts.bootstrap.connect("graft-driver-planner")
    clientRef
  }
  private def dropClient(): Unit = synchronized {
    if (clientRef != null) {
      try clientRef.close() catch { case _: java.io.IOException => () }
      clientRef = null
    }
  }
  /** Run a planning call, reconnecting once on a transient failure. */
  private def planning[A](body: KafkaWireClient => A): A =
    try body(client) catch {
      case e: Throwable if KafkaWire.retriableError(e) =>
        dropClient()
        body(client)
    }
  /** Trigger.AvailableNow ceiling: offsets snapshotted at query start. */
  @transient private var availableNowCeiling: Option[OffsetMap] = None

  override def initialOffset(): Offset =
    new GraftKafkaOffset(planning(c => resolveStart(c, opts, default = "latest")))

  override def getDefaultReadLimit: ReadLimit =
    opts.maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(
      ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling =
      Some(planning(c => snapshot(c, opts.subscription, earliest = false)))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[GraftKafkaOffset].offsets
    val target = availableNowCeiling.getOrElse(
      planning(c => snapshot(c, opts.subscription, earliest = false)))
    // Topic partitions added after the stream started have no checkpoint
    // entry: start them at earliest (the official source's policy) so
    // their data is read rather than silently skipped as zero-lag.
    val fullStart = startMap ++ target.keysIterator
      .filterNot(startMap.contains)
      .map { case tp @ (t, p) => tp -> planning(_.earliestOffset(t, p)) }
    val capped = limit match {
      case m: ReadMaxRows => capOffsets(fullStart, target, m.maxRows())
      case _ => target
    }
    new GraftKafkaOffset(capped)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    planning(c => GraftKafkaPlanner.plan(c, opts,
      start.asInstanceOf[GraftKafkaOffset].offsets,
      end.asInstanceOf[GraftKafkaOffset].offsets))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKafkaReaderFactory(opts.fetchMaxBytes, opts.isolation)

  override def deserializeOffset(json: String): Offset =
    new GraftKafkaOffset(offsetsFromJson(json))

  override def commit(end: Offset): Unit = () // checkpoint is the group state

  override def stop(): Unit = dropClient()
}

/** One offset range of one topic-partition, read from its leader. The
  * bootstrap config (full seed list + auth) rides along so the reader
  * can re-resolve the leader if it changes mid-read (broker roll,
  * partition move). */
final case class GraftKafkaInputPartition(
    topic: String, partition: Int,
    startOffset: Long, endOffset: Long,
    leaderHost: String, leaderPort: Int,
    bootstrap: GraftKafka.ClientConfig)
  extends InputPartition

object GraftKafkaPlanner {
  import GraftKafka._

  /** Ranges from (start, end), split so at least `minPartitions` tasks
    * exist when the lag allows — proportional to range size, the
    * official connector's `minPartitions` semantics. */
  def plan(client: KafkaWireClient, opts: Options,
           start: OffsetMap, end: OffsetMap): Array[InputPartition] = {
    val meta = client.metadata(opts.subscription.topics(client))
    val ranges = end.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap {
      case ((topic, partition), until) =>
        // A partition present in `end` but absent from `start` was added
        // after the stream's checkpoint was written — read it from
        // earliest, don't collapse its range to empty.
        val from = start.getOrElse((topic, partition),
          client.earliestOffset(topic, partition))
        if (until > from) Some((topic, partition, from, until)) else None
    }
    val total = ranges.map { case (_, _, f, u) => u - f }.sum
    val want = opts.minPartitions
    val split: Seq[(String, Int, Long, Long)] =
      if (want <= ranges.size || total == 0) ranges
      else ranges.flatMap { case (t, p, f, u) =>
        val size = u - f
        val pieces = math.max(1L,
          math.min(size, math.round(size.toDouble * want / total))).toInt
        val step = math.max(1L, (size + pieces - 1) / pieces)
        (f until u by step).map(s => (t, p, s, math.min(u, s + step)))
      }
    split.map { case (t, p, f, u) =>
      val leader = meta.leaderFor(t, p)
      GraftKafkaInputPartition(t, p, f, u, leader.host, leader.port,
        opts.bootstrap): InputPartition
    }.toArray
  }
}

class GraftKafkaReaderFactory(fetchMaxBytes: Int, isolation: Int = 0)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftKafkaPartitionReader(
      partition.asInstanceOf[GraftKafkaInputPartition], fetchMaxBytes,
      isolation)
}

/** Executor-side reader: one connection to the range's leader, fetches
  * forward until `endOffset`. Records below `startOffset` were already
  * dropped by the client (whole-batch serving); records at or beyond
  * `endOffset` (same batch, next trigger's range) are left unread. */
object GraftKafkaPartitionReader {
  /** Leader re-resolution attempts per fetch before giving the error to
    * Spark's task retry; backoff doubles from [[RetryBackoffMs]]. */
  val MaxFetchRetries = 3
  val RetryBackoffMs = 100L
  /** read_committed open-transaction wait: polls of [[StableWaitMs]]
    * before declaring the transaction stuck. */
  val MaxStableWaits = 150
  val StableWaitMs = 200L
}

class GraftKafkaPartitionReader(p: GraftKafkaInputPartition,
                                fetchMaxBytes: Int,
                                isolation: Int = 0)
    extends PartitionReader[InternalRow] {
  import GraftKafkaPartitionReader._

  private val clientId = s"graft-reader-${p.topic}-${p.partition}"
  private var client: KafkaWireClient = new KafkaWireClient(
    p.leaderHost, p.leaderPort, clientId, p.bootstrap.sasl, p.bootstrap.tls,
    tlsVerifyHostname = p.bootstrap.tlsVerifyHostname)
  private var nextOffset = p.startOffset
  private var buffer: Iterator[KafkaWire.Record] = Iterator.empty
  private var current: KafkaWire.Record = _
  private var stableWaits = 0

  /** Fetch with leader-failover: on NotLeaderOrFollower / transient
    * metadata errors / connection loss, re-resolve the partition leader
    * through the bootstrap server and retry against it — what the
    * official consumer's metadata-refresh loop does. Non-retriable
    * errors and exhausted retries propagate; Spark's task retry is the
    * next line of defense. */
  private def fetchWithFailover(offset: Long): KafkaWireClient.FetchResult = {
    var attempt = 0
    while (true) {
      try {
        if (client == null) {
          val boot = p.bootstrap.connect(clientId)
          val leader =
            try boot.metadata(Seq(p.topic)).leaderFor(p.topic, p.partition)
            finally boot.close()
          client = new KafkaWireClient(leader.host, leader.port, clientId,
            p.bootstrap.sasl, p.bootstrap.tls,
            tlsVerifyHostname = p.bootstrap.tlsVerifyHostname)
        }
        return client.fetch(p.topic, p.partition, offset, fetchMaxBytes,
          isolation = isolation)
      } catch {
        case e: Throwable if retriable(e) && attempt < MaxFetchRetries =>
          attempt += 1
          if (client != null) {
            try client.close() catch { case _: java.io.IOException => () }
            client = null
          }
          Thread.sleep(RetryBackoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def retriable(e: Throwable): Boolean = KafkaWire.retriableError(e)

  override def next(): Boolean = {
    if (nextOffset >= p.endOffset) return false
    while (!buffer.hasNext) {
      val result = fetchWithFailover(nextOffset)
      if (result.records.isEmpty) {
        if (result.nextOffset > nextOffset) {
          // batches came back but none carried consumable records at or
          // past the position — control batches (transaction markers)
          // or compaction holes. Advance to the offset after the last
          // complete batch, exactly like the official consumer; a
          // reader that only advances via decoded records wedges here.
          nextOffset = result.nextOffset
          if (nextOffset >= p.endOffset) return false
        } else if (isolation == 1 && result.lastStableOffset >= 0 &&
                   nextOffset >= result.lastStableOffset) {
          // read_committed: the planned range extends past the last
          // stable offset — an OPEN transaction holds the tail back.
          // Offsets were planned from the log end (ListOffsets v1 has
          // no isolation), so wait for the producer to resolve, like
          // the official consumer blocking at the LSO.
          stableWaits += 1
          if (stableWaits > MaxStableWaits) throw new IllegalStateException(
            s"${p.topic}-${p.partition}: offsets up to ${p.endOffset} " +
              s"were planned but the last stable offset is stuck at " +
              s"${result.lastStableOffset} — an open transaction has " +
              "not committed or aborted within the wait budget")
          Thread.sleep(StableWaitMs)
        } else {
          // planned range but no bytes at all — truncated under us
          throw new IllegalStateException(
            s"data loss: ${p.topic}-${p.partition} empty at $nextOffset " +
              s"(planned until ${p.endOffset}, hwm ${result.highWatermark})")
        }
      } else buffer = result.records.iterator
    }
    current = buffer.next()
    if (current.offset >= p.endOffset) { nextOffset = p.endOffset; return false }
    nextOffset = current.offset + 1
    true
  }

  override def get(): InternalRow = {
    val r = current
    new GenericInternalRow(Array[Any](
      r.key, r.value, UTF8String.fromString(p.topic), p.partition,
      r.offset, r.timestamp * 1000L, r.timestampType))
  }

  // client may be null when failover exhausted retries mid-reconnect —
  // close() must not mask the task's real failure with an NPE
  override def close(): Unit = if (client != null) client.close()
}
