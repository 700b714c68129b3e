package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka.{KafkaStubBroker, KafkaWire, KafkaWireClient}
import graft.sources.kafka.KafkaWire.KafkaWireException

/** Wire-level client ↔ broker conversations over real TCP: produce /
  * metadata / list-offsets / fetch, batch-boundary fetch semantics, and
  * the SASL/PLAIN handshake (success, bad password, wrong mechanism). */
class KafkaClientBrokerSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")
  private def s(b: Array[Byte]) = new String(b, "UTF-8")

  private def withBroker(partitions: Int = 1,
                         sasl: Option[(String, String)] = None)
                        (f: (KafkaStubBroker, KafkaWireClient) => Unit): Unit = {
    val broker = new KafkaStubBroker(partitions, sasl)
    try {
      val client = new KafkaWireClient("localhost", broker.port, "spec", sasl)
      try f(broker, client) finally client.close()
    } finally broker.close()
  }

  test("api versions advertises the consumer surface") {
    withBroker() { (_, client) =>
      val apis = client.apiVersions()
      assert(apis.contains(KafkaWire.Api.Fetch))
      assert(apis.contains(KafkaWire.Api.Metadata))
      assert(apis(KafkaWire.Api.Fetch) === (4, 4))
    }
  }

  test("produce then fetch roundtrips keys, values, timestamps, offsets") {
    withBroker() { (broker, client) =>
      val base = client.produce("t", 0, Seq(
        (1000L, b("k0"), b("v0")), (2000L, null, b("v1"))))
      assert(base === 0L)
      assert(client.produce("t", 0, Seq((3000L, b("k2"), b("v2")))) === 2L)
      assert(broker.endOffset("t", 0) === 3L)
      assert(client.earliestOffset("t", 0) === 0L)
      assert(client.latestOffset("t", 0) === 3L)

      val got = client.fetch("t", 0, 0L)
      assert(got.highWatermark === 3L)
      assert(got.records.map(_.offset) === Seq(0L, 1L, 2L))
      assert(got.records.map(_.timestamp) === Seq(1000L, 2000L, 3000L))
      assert(s(got.records(0).key) === "k0")
      assert(got.records(1).key === null)
      assert(got.records.map(r => s(r.value)) === Seq("v0", "v1", "v2"))
    }
  }

  test("fetch from mid-batch offset skips below-offset records (zero-copy)") {
    withBroker() { (_, client) =>
      client.produce("t", 0, (0 until 10).map(i => (i.toLong, null, b(s"m$i"))))
      val got = client.fetch("t", 0, 4L)
      assert(got.records.map(_.offset) === (4L until 10L))
      assert(s(got.records.head.value) === "m4")
    }
  }

  test("fetch honors maxBytes but always serves at least one batch") {
    withBroker() { (_, client) =>
      client.produce("t", 0, Seq((1L, null, new Array[Byte](4096))))
      client.produce("t", 0, Seq((2L, null, new Array[Byte](4096))))
      val first = client.fetch("t", 0, 0L, maxBytes = 100)
      assert(first.records.size === 1) // one whole batch despite tiny cap
      val second = client.fetch("t", 0, 1L, maxBytes = 100)
      assert(second.records.map(_.offset) === Seq(1L))
    }
  }

  test("metadata reports topic partitions and the leader address") {
    withBroker(partitions = 3) { (broker, client) =>
      val meta = client.metadata(Seq("topic-a"))
      assert(meta.topics.map(_.name) === Seq("topic-a"))
      assert(meta.topics.head.partitions.map(_.partition).sorted === Seq(0, 1, 2))
      val leader = meta.leaderFor("topic-a", 1)
      assert((leader.host, leader.port) === ("localhost", broker.port))
    }
  }

  test("partitions are independent logs") {
    withBroker(partitions = 2) { (_, client) =>
      client.produce("t", 0, Seq((1L, null, b("p0"))))
      client.produce("t", 1, Seq((1L, null, b("p1a"))))
      client.produce("t", 1, Seq((2L, null, b("p1b"))))
      assert(client.latestOffset("t", 0) === 1L)
      assert(client.latestOffset("t", 1) === 2L)
      assert(client.fetch("t", 1, 0L).records.map(r => s(r.value)) ===
        Seq("p1a", "p1b"))
    }
  }

  test("sasl plain authenticates and serves normally") {
    withBroker(sasl = Some(("svc", "hunter2"))) { (_, client) =>
      client.produce("t", 0, Seq((1L, null, b("authed"))))
      assert(s(client.fetch("t", 0, 0L).records.head.value) === "authed")
    }
  }

  test("sasl with a wrong password fails with error 58") {
    val broker = new KafkaStubBroker(1, Some(("svc", "hunter2")))
    try {
      val e = intercept[KafkaWireException] {
        new KafkaWireClient("localhost", broker.port, "spec",
          Some(("svc", "wrong")))
      }
      assert(e.code === KafkaWire.Err.SaslAuthenticationFailed)
    } finally broker.close()
  }

  test("compressed produce/fetch roundtrips under every codec") {
    withBroker() { (_, client) =>
      val codecs = Seq(
        KafkaWire.Codec.Gzip, KafkaWire.Codec.Snappy,
        KafkaWire.Codec.Lz4, KafkaWire.Codec.Zstd)
      codecs.zipWithIndex.foreach { case (codec, i) =>
        client.produce("tz", 0,
          (0 until 50).map(j => (j.toLong, null, b(s"c$i-m$j"))), codec)
      }
      val got = client.fetch("tz", 0, 0L)
      assert(got.records.size === 200)
      assert(got.records.map(_.offset) === (0L until 200L))
      assert(s(got.records(50).value) === "c1-m0") // snappy batch starts at 50
      assert(s(got.records(199).value) === "c3-m49")
    }
  }

  test("a fetch answered NOT_LEADER surfaces error 6 to the caller") {
    withBroker() { (broker, client) =>
      client.produce("t", 0, Seq((1L, null, b("x"))))
      broker.failNextFetches(1)
      val e = intercept[KafkaWireException](client.fetch("t", 0, 0L))
      assert(e.code === KafkaWire.Err.NotLeaderOrFollower)
      // next fetch succeeds — the fault was transient
      assert(s(client.fetch("t", 0, 0L).records.head.value) === "x")
    }
  }

  test("un-authenticated API calls are refused when SASL is required") {
    val broker = new KafkaStubBroker(1, Some(("svc", "hunter2")))
    try {
      val client = new KafkaWireClient("localhost", broker.port, "spec", None)
      try {
        intercept[Exception](client.metadata(Seq("t")))
      } finally client.close()
    } finally broker.close()
  }
}
