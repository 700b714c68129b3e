package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka._

/** Multi-node broker behavior — the surfaces a single-node stub cannot
  * prove: leadership split across brokers, metadata served by any
  * node, wrong-node requests refused, and a REAL mid-read leader move
  * (stale partition plan → NOT_LEADER → bootstrap re-resolution → the
  * NEW node completes the range). */
class KafkaClusterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def b(s: String) = s.getBytes("UTF-8")

  test("two brokers: sink routes to split leaders, source reads across nodes") {
    val cluster = new KafkaStubCluster(2, partitions = 2)
    try {
      import spark.implicits._
      // seed ONLY node0: the sink must discover node1's leadership of
      // partition 1 from metadata and connect to it directly
      (0 until 40).map(i => (s"user-$i", s"v$i")).toDF("key", "value")
        .write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", cluster.nodes(0).bootstrapServers)
        .option("topic", "t")
        .save()
      assert(cluster.nodes(0).endOffset("t", 0) +
        cluster.nodes(1).endOffset("t", 1) == 40,
        "murmur2 routing must land rows on both partitions")
      assert(cluster.nodes(0).endOffset("t", 1) ==
        cluster.nodes(1).endOffset("t", 1),
        "the store is cluster-shared")
      // seed ONLY node1 for the read: planning metadata still routes
      // partition 0's range to node0
      val got = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", cluster.nodes(1).bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string)").collect().map(_.getString(0)).toSet
      assert(got === (0 until 40).map(i => s"v$i").toSet)
    } finally cluster.close()
  }

  test("requests to a non-leader answer NOT_LEADER_OR_FOLLOWER") {
    val cluster = new KafkaStubCluster(2, partitions = 2)
    try {
      // partition 0 leads on node0; ask node1
      val wrong = new KafkaWireClient("localhost", cluster.nodes(1).port, "w")
      try {
        val e = intercept[KafkaWire.KafkaWireException](
          wrong.produce("t", 0, Seq((1L, null, b("x")))))
        assert(e.code === KafkaWire.Err.NotLeaderOrFollower)
      } finally wrong.close()
    } finally cluster.close()
  }

  test("mid-read leader move: stale plan fails over to the new leader") {
    val cluster = new KafkaStubCluster(2, partitions = 1)
    try {
      val right = new KafkaWireClient("localhost", cluster.nodes(0).port, "p")
      try right.produce("t", 0, (0 until 10).map(i => (i.toLong, null, b(s"m$i"))))
      finally right.close()
      // leadership moves AFTER the range was planned against node0
      cluster.moveLeader("t", 0, toNode = 1)
      val stale = GraftKafkaInputPartition("t", 0, 0L, 10L,
        "localhost", cluster.nodes(0).port, // the OLD leader
        GraftKafka.ClientConfig(
          Seq(("localhost", cluster.nodes(0).port)), None, tls = false))
      val reader = new GraftKafkaPartitionReader(stale, 1 << 20)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      try {
        while (reader.next())
          out += new String(reader.get().getBinary(1), "UTF-8")
      } finally reader.close()
      assert(out.toSeq === (0 until 10).map(i => s"m$i"),
        "the reader must re-resolve the leader and finish the range")
    } finally cluster.close()
  }
}
