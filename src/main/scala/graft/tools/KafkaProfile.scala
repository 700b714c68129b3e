package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{BidExports, KafkaRoundtrip, Normalize, ProtoPipeline}
import graft.sources.kafka.{KafkaStubBroker, KafkaWireClient}
import graft.streaming.BidPipeline

/** Scratch phase-level profiler for the Kafka roundtrip oracle (dev
  * tool): replicates q_kafka_hourly_agg's phases — distributed
  * encode+produce job, then fetch→decode→agg — so produce-side tuning
  * is measurable in isolation, plus the full window for reference.
  */
object KafkaProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(32, "graft-kafka-profile")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kprofile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val passes = args.headOption.map(_.toInt).getOrElse(3)
    for (pass <- 1 to passes) {
      println(s"--- pass $pass ---")
      import graft.sources.proto.ProtoFunctions.protoEncode
      val staged = graft.sources.Tables.events(spark, dir)
        .repartition(8)
        .select(
          concat(
            lit(Array[Byte](0, 0, 0, 0, 0, 42)),
            protoEncode(ProtoPipeline.bidStruct, ProtoPipeline.genBid)).as("payload"),
          unix_millis(col("ts").cast("timestamp")).as("tm"))
      val broker = new KafkaStubBroker(4)
      try {
        val port = broker.port
        time("encode+produce job") {
          staged.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            if (rows.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val producer = new KafkaWireClient("localhost", port, s"prof-$pid")
              try {
                rows.map { r =>
                  (r.getLong(1), null: Array[Byte], r.getAs[Array[Byte]](0))
                }.grouped(8192).foreach { chunk =>
                  producer.produce("bids", pid % 4, chunk.toSeq)
                }
              } finally producer.close()
            }
          }
        }
        val frames = spark.read.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "bids")
          .option("startingOffsets", "earliest")
          .option("endingOffsets", "latest")
          .option("minPartitions", "8")
          .load()
        time("fetch+decode+agg") {
          BidExports.hourlyRequestsAgg(
              Normalize(BidPipeline.decode(frames, stripPrefix = true)))
            .orderBy(col("date"), col("hour"), col("pub_id"),
              col("device_id"), col("resolution"),
              col("deal").asc_nulls_first)
            .collect()
        }
      } finally broker.close()
      time("full window")(KafkaRoundtrip.hourlyAgg(spark, dir).count())
    }
    spark.stop()
  }
}
