package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.kafka.{KafkaStubBroker, KafkaWireClient}
import graft.streaming.BidPipeline

/** The A1 transport oracle-checked END-TO-END over real sockets: the
  * reference's framed messages (Confluent prefix + proto payload,
  * event time as the broker CreateTime) produce to an in-JVM
  * [[KafkaStubBroker]], Spark reads them back through
  * `format("graft-kafka")` — executors fetching offset ranges from the
  * partition leader over TCP — then decodes, normalizes and aggregates
  * exactly like [[BidExports.hourlyAggFromWire]]. The transport is
  * lossless, so the DuckDB oracle for the wire aggregate verifies the
  * whole produce→fetch→decode chain bit-for-bit.
  *
  * The produce side collects to the driver (it plays the EXTERNAL
  * producer fleet the reference consumes from — not part of the
  * engine's data path); the read side is the real distributed source.
  * The result is materialized before the broker closes (the returned
  * frame must outlive the socket).
  */
object KafkaRoundtrip {

  private val Topic = "bids"
  private val Partitions = 4
  private val ProduceChunk = 2000

  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    // framed value carries the LE-ms suffix; the Kafka path replaces it
    // with the broker timestamp (BidPipeline.decode contract)
    val staged = ProtoPipeline.framedMessages(spark, dir)
      .select(
        expr("substring(value, 1, length(value) - 8)").as("payload"),
        graft.sources.proto.ProtoFunctions.leUint64(col("value")).as("tm"))
      .collect()
    val broker = new KafkaStubBroker(Partitions)
    try {
      // one producer thread per partition — like a real producer fleet,
      // and connections are one-per-thread by contract anyway
      val byPartition = staged.zipWithIndex.groupBy(_._2 % Partitions)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val threads = byPartition.map { case (p, rows) =>
        val t = new Thread(() => {
          try {
            val producer = new KafkaWireClient(
              "localhost", broker.port, s"roundtrip-producer-$p")
            try {
              rows.iterator.map { case (r, _) =>
                (r.getLong(1), null: Array[Byte], r.getAs[Array[Byte]](0))
              }.grouped(ProduceChunk).foreach { chunk =>
                producer.produce(Topic, p, chunk.toSeq)
              }
            } finally producer.close()
          } catch { case e: Throwable => failure.compareAndSet(null, e) }
        }, s"roundtrip-producer-$p")
        t.start(); t
      }
      threads.foreach(_.join())
      if (failure.get != null) throw failure.get

      val frames = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", Topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("minPartitions", "8")
        .load()
      val agg = BidExports.hourlyRequestsAgg(
          Normalize(BidPipeline.decode(frames, stripPrefix = true)))
        .orderBy(col("date"), col("hour"), col("pub_id"), col("device_id"),
          col("resolution"), col("deal").asc_nulls_first)
      val rows = agg.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), agg.schema)
    } finally broker.close()
  }
}
