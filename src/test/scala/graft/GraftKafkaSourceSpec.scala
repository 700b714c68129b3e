package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka.{GraftKafka, KafkaStubBroker, KafkaWireClient}
import graft.streaming.BidPipeline

/** The A1 surface executed over real TCP: Spark reads the `graft-kafka`
  * format (batch and micro-batch) from [[KafkaStubBroker]] — offset
  * planning, minPartitions range splitting, maxOffsetsPerTrigger
  * admission control, SASL options, and the full BidPipeline
  * (produce proto frames → stream-decode → dual export). */
class GraftKafkaSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def b(s: String) = s.getBytes("UTF-8")

  private def withBroker(partitions: Int = 1,
                         sasl: Option[(String, String)] = None)
                        (f: KafkaStubBroker => Unit): Unit = {
    val broker = new KafkaStubBroker(partitions, sasl)
    try f(broker) finally broker.close()
  }

  private def produceStrings(broker: KafkaStubBroker, topic: String,
                             partition: Int, msgs: Seq[String],
                             sasl: Option[(String, String)] = None): Unit = {
    val c = new KafkaWireClient("localhost", broker.port, "spec-producer", sasl)
    try c.produce(topic, partition,
      msgs.zipWithIndex.map { case (m, i) => (1000L + i, b(s"k$i"), b(m)) })
    finally c.close()
  }

  test("batch read: earliest→latest delivers every record with metadata") {
    withBroker(partitions = 2) { broker =>
      produceStrings(broker, "t", 0, Seq("a", "b", "c"))
      produceStrings(broker, "t", 1, Seq("d", "e"))
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
      assert(df.schema.fieldNames.toSeq === Seq(
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType"))
      val rows = df.selectExpr(
          "cast(value as string) v", "partition", "offset",
          "cast(key as string) k", "unix_millis(timestamp) ts")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(rows === Set(
        ("a", 0, 0L), ("b", 0, 1L), ("c", 0, 2L), ("d", 1, 0L), ("e", 1, 1L)))
    }
  }

  test("batch read plans at least minPartitions tasks over one topic-partition") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, (0 until 64).map(i => s"m$i"))
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("minPartitions", "8")
        .load()
      assert(df.rdd.getNumPartitions >= 8)
      assert(df.count() === 64)
    }
  }

  test("batch read with SASL_PLAINTEXT credentials") {
    val creds = Some(("svc", "pw"))
    withBroker(sasl = creds) { broker =>
      produceStrings(broker, "t", 0, Seq("secret-payload"), sasl = creds)
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("kafka.security.protocol", "SASL_PLAINTEXT")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config",
          """org.apache.kafka.common.security.plain.PlainLoginModule required username="svc" password="pw";""")
        .load()
      assert(df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSeq === Seq("secret-payload"))
    }
  }

  test("official offset spellings: JSON -1/-2 specials and case-insensitive literals") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("x", "y", "z"))
      // -2 = earliest, -1 = latest inside the JSON maps (documented
      // official semantics); literals are trimmed + case-insensitive
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", """{"t":{"0":-2}}""")
        .option("endingOffsets", """{"t":{"0":-1}}""")
        .load()
      assert(df.count() === 3,
        "-2/-1 JSON specials must resolve to earliest/latest, not plan empty")
      val df2 = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", " Earliest ")
        .option("endingOffsets", "LATEST")
        .load()
      assert(df2.count() === 3)
      // any other negative offset is a loud error, not silence
      val e = intercept[Exception] {
        spark.read.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "t")
          .option("startingOffsets", """{"t":{"0":-7}}""")
          .option("endingOffsets", "latest")
          .load().count()
      }
      assert(e.getMessage.contains("-7"), e.getMessage)
    }
  }

  test("JSON offsets keep topic-name case: mixed-case topic honors requested start") {
    withBroker() { broker =>
      produceStrings(broker, "MixedCase", 0, Seq("a", "b", "c", "d"))
      // offsets JSON keyed by the real (mixed-case) topic name must be
      // honored — lowercasing the JSON would miss the topic and fall
      // back to earliest, returning 4 rows instead of 2
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "MixedCase")
        .option("startingOffsets", """{"MixedCase":{"0":2}}""")
        .option("endingOffsets", """{"MixedCase":{"0":4}}""")
        .load()
      assert(df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSeq.sorted === Seq("c", "d"),
        "start offset 2 for a mixed-case topic must not be dropped")
    }
  }

  test("SASL_SSL: TLS handshake wraps the wire, SASL authenticates, " +
       "batch read end-to-end") {
    // self-signed server identity minted by the JDK's own keytool — no
    // external artifacts; the same PKCS12 serves the broker's key
    // manager and the client's trust anchors (JSSE trusts a key entry's
    // leaf cert)
    val dir = Files.createTempDirectory("graft-tls")
    val ksPath = dir.resolve("server.p12").toString
    val keytool = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "keytool").getAbsolutePath
    // SAN=localhost: the client verifies the server hostname against
    // the certificate by default (endpoint identification — without it
    // any valid cert for any host would pass and credentials could be
    // MITM'd), so the identity must actually name the host under test
    val rc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ksPath, "-storepass", "graftpass", "-keypass",
      "graftpass", "-dname", "CN=localhost", "-validity", "2",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      .inheritIO().start().waitFor()
    assert(rc == 0, "keytool must mint the self-signed server cert")

    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(ksPath)
    try ks.load(in, "graftpass".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "graftpass".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val clientCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)

    val creds = Some(("svc", "pw"))
    val broker = new KafkaStubBroker(1, creds, tlsContext = Some(serverCtx))
    // the wire client rides the JVM-default JSSE context (exactly what
    // a deployment configures via javax.net.ssl.trustStore); pin the
    // test trust anchors there and restore after
    val prevDefault = javax.net.ssl.SSLContext.getDefault
    javax.net.ssl.SSLContext.setDefault(clientCtx)
    try {
      // produce OVER TLS with SASL — driver and data path share the stack
      val c = new KafkaWireClient("localhost", broker.port, "tls-producer",
        creds, tls = true)
      try c.produce("t", 0, Seq((1000L, b("k"), b("over-tls"))))
      finally c.close()

      // a PLAINTEXT client against the TLS listener must fail — the
      // handshake never completes, so no protocol bytes flow
      intercept[Exception] {
        val pc = new KafkaWireClient("localhost", broker.port, "plain",
          creds, tls = false, requestTimeoutMs = 2000)
        try pc.produce("t", 0, Seq((1000L, b("k"), b("nope"))))
        finally pc.close()
      }

      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config",
          """org.apache.kafka.common.security.plain.PlainLoginModule required username="svc" password="pw";""")
        .load()
      assert(df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSeq === Seq("over-tls"))

      // hostname verification is ON by default: a trusted cert minted
      // for a DIFFERENT host must fail the handshake when we connect by
      // IP literal not covered by the SAN... the test cert names
      // 127.0.0.1, so instead prove the negative via a second identity
      val badKs = dir.resolve("bad.p12").toString
      val rc2 = new ProcessBuilder(keytool, "-genkeypair", "-alias", "bad",
        "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
        "-keystore", badKs, "-storepass", "graftpass", "-keypass",
        "graftpass", "-dname", "CN=elsewhere.example", "-validity", "2",
        "-ext", "SAN=dns:elsewhere.example")
        .inheritIO().start().waitFor()
      assert(rc2 == 0)
      val badStore = java.security.KeyStore.getInstance("PKCS12")
      val in2 = new java.io.FileInputStream(badKs)
      try badStore.load(in2, "graftpass".toCharArray) finally in2.close()
      val badKmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      badKmf.init(badStore, "graftpass".toCharArray)
      val badServerCtx = javax.net.ssl.SSLContext.getInstance("TLS")
      badServerCtx.init(badKmf.getKeyManagers, null, null)
      val badTmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      badTmf.init(badStore)
      val badClientCtx = javax.net.ssl.SSLContext.getInstance("TLS")
      badClientCtx.init(null, badTmf.getTrustManagers, null)
      javax.net.ssl.SSLContext.setDefault(badClientCtx)
      val badBroker = new KafkaStubBroker(1, creds,
        tlsContext = Some(badServerCtx))
      try {
        // chain TRUSTED but name mismatched → endpoint identification
        // must refuse (this is the MITM case: a valid cert for the
        // wrong host)
        intercept[java.io.IOException] {
          val c2 = new KafkaWireClient("localhost", badBroker.port,
            "verify", creds, tls = true, requestTimeoutMs = 5000)
          try c2.produce("t", 0, Seq((1L, b("k"), b("nope"))))
          finally c2.close()
        }
        // the official escape hatch (ssl.endpoint.identification
        // .algorithm="") maps to tlsVerifyHostname=false: same cert,
        // same host, handshake succeeds
        val c3 = new KafkaWireClient("localhost", badBroker.port,
          "noverify", creds, tls = true, requestTimeoutMs = 5000,
          tlsVerifyHostname = false)
        try c3.produce("t", 0, Seq((1L, b("k"), b("lab-cert"))))
        finally c3.close()
      } finally badBroker.close()
    } finally {
      javax.net.ssl.SSLContext.setDefault(prevDefault)
      broker.close()
    }
  }

  test("micro-batch stream honors maxOffsetsPerTrigger admission control") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, (0 until 30).map(i => s"m$i"))
      val ckpt = Files.createTempDirectory("graft-kafka-ckpt").toString
      val out = Files.createTempDirectory("graft-kafka-out").toString
      val q = spark.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "10")
        .load()
        .selectExpr("cast(value as string) v", "offset")
        .writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val result = spark.read.parquet(out)
      assert(result.count() === 30)
      assert(result.select("offset").collect().map(_.getLong(0)).sorted.toSeq
        === (0L until 30L))
      // admission control: 30 rows at ≤10/trigger = ≥3 micro-batches
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      assert(commits >= 3, s"expected ≥3 micro-batches, got $commits")
    }
  }

  test("streaming resume: a second AvailableNow run picks up only new records") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("one", "two"))
      val ckpt = Files.createTempDirectory("graft-kafka-ckpt2").toString
      val out = Files.createTempDirectory("graft-kafka-out2").toString
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "t")
          .option("startingOffsets", "earliest")
          .load()
          .selectExpr("cast(value as string) v", "offset")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
      }
      runOnce()
      assert(spark.read.parquet(out).count() === 2)
      produceStrings(broker, "t", 0, Seq("three"))
      runOnce()
      val vs = spark.read.parquet(out).select("v").collect()
        .map(_.getString(0)).toSet
      assert(vs === Set("one", "two", "three")) // no re-read, no loss
    }
  }

  test("BidPipeline end-to-end over the wire: proto frames → dual export") {
    withBroker(partitions = 2) { broker =>
      // producer side: the reference's framing (Confluent prefix +
      // proto payload + LE timestamp suffix is replaced by the broker
      // timestamp in the Kafka path — BidPipeline.decode contract)
      val frames = graft.operators.ProtoPipeline
        .framedMessages(spark, SparkTestSession.sf0001)
        .limit(40)
        .select(expr("substring(value, 1, length(value) - 8)").as("payload"),
          lit(1723500000000L).as("ts"))
        .collect()
      val c = new KafkaWireClient("localhost", broker.port, "pipe-producer")
      try {
        frames.zipWithIndex.groupBy(_._2 % 2).foreach { case (p, part) =>
          c.produce("bids", p,
            part.map { case (r, _) => (r.getLong(1), null: Array[Byte],
              r.getAs[Array[Byte]](0)) }.toSeq)
        }
      } finally c.close()

      val ckpt = Files.createTempDirectory("bid-ckpt").toString
      val root = Files.createTempDirectory("bid-out").toString
      val cfg = BidPipeline.Config(
        bootstrapServers = broker.bootstrapServers,
        topic = "bids",
        checkpointLocation = ckpt,
        exportRoot = root,
        availableNow = true,
        connector = "graft",
        minPartitions = 4)
      val q = BidPipeline.start(spark, cfg)
      q.awaitTermination(120000)

      val raw = spark.read.parquet(s"$root/ortb.bid-requests/raw")
      assert(raw.count() === 40)
      // broker CreateTime becomes event_tm through the source timestamp
      assert(raw.select("event_tm").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(1723500000000L))
      val agg = spark.read.parquet(s"$root/ortb.bid-requests/hourly_requests_agg")
      assert(agg.count() > 0)
      // a request with N deals lands in N groups (outer-explode), so the
      // distinct-count sum is ≥ the 40 produced messages
      val total = agg.agg(sum("requests")).collect()(0).getLong(0)
      assert(total >= 40L)
    }
  }

  test("batch read decodes zstd-compressed batches transparently") {
    withBroker() { broker =>
      val c = new KafkaWireClient("localhost", broker.port, "spec-producer")
      try c.produce("t", 0,
        (0 until 100).map(i => (1000L + i, null: Array[Byte], b(s"z$i"))),
        graft.sources.kafka.KafkaWire.Codec.Zstd)
      finally c.close()
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
      val vs = df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSet
      assert(vs === (0 until 100).map(i => s"z$i").toSet)
    }
  }

  test("partition reader fails over past transient NOT_LEADER fetches") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, (0 until 20).map(i => s"m$i"))
      // two injected leader-change errors: the reader must re-resolve
      // the leader via bootstrap metadata and finish the planned range
      broker.failNextFetches(2)
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
      assert(df.count() === 20)
    }
  }

  test("batch sink: df.write lands keyed rows in murmur2 partitions") {
    withBroker(partitions = 4) { broker =>
      import spark.implicits._
      (0 until 100).map(i => (s"user-${i % 7}", s"event-$i"))
        .toDF("key", "value")
        .write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("topic", "out")
        .save()
      val back = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "out")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(key as string) k", "cast(value as string) v", "partition")
        .collect()
      assert(back.length === 100)
      assert(back.map(_.getString(1)).toSet ===
        (0 until 100).map(i => s"event-$i").toSet)
      // producer partitioner contract: one partition per key
      val partsPerKey = back.groupBy(_.getString(0))
        .map { case (k, rows) => k -> rows.map(_.getInt(2)).toSet }
      assert(partsPerKey.values.forall(_.size === 1), s"keys split: $partsPerKey")
      // murmur2 must match the Java producer's routing exactly
      partsPerKey.foreach { case (k, ps) =>
        val expected = (graft.sources.kafka.GraftKafkaSink.murmur2(
          k.getBytes("UTF-8")) & 0x7fffffff) % 4
        assert(ps.head === expected, s"key $k routed to ${ps.head}, want $expected")
      }
    }
  }

  test("batch sink honors explicit partition and topic columns + compression") {
    withBroker(partitions = 3) { broker =>
      import spark.implicits._
      Seq(("a", 0, "t1"), ("b", 2, "t1"), ("c", 1, "t2"))
        .toDF("value", "partition", "topic")
        .write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("kafka.compression.type", "zstd")
        .save()
      def readAll(topic: String) = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string) v", "partition")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(readAll("t1") === Set(("a", 0), ("b", 2)))
      assert(readAll("t2") === Set(("c", 1)))
    }
  }

  test("streaming sink: writeStream produces each micro-batch") {
    withBroker() { broker =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      val input = MemoryStream[String](spark)
      val ckpt = Files.createTempDirectory("graft-kafka-sink-ckpt").toString
      val q = input.toDF().withColumnRenamed("value", "value")
        .writeStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("topic", "stream-out")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        input.addData("m1", "m2")
        q.processAllAvailable()
        input.addData("m3")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "stream-out")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string)").collect().map(_.getString(0)).toSet
      assert(got === Set("m1", "m2", "m3"))
    }
  }

  test("sink retries past transient NOT_LEADER produces") {
    withBroker(partitions = 2) { broker =>
      import spark.implicits._
      broker.failNextProduces(2)
      (0 until 20).map(i => (s"k$i", s"v$i")).toDF("key", "value")
        .coalesce(1)
        .write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("topic", "retry-out")
        .save()
      val got = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "retry-out")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string)").collect().map(_.getString(0)).toSet
      assert(got === (0 until 20).map(i => s"v$i").toSet)
    }
  }

  test("sink schema validation fails fast") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("not_value")
    val e = intercept[Exception] {
      df.write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("topic", "t").save()
    }
    assert(e.getMessage.contains("value"))
  }

  test("assign reads only the listed partitions; subscribePattern matches topics") {
    withBroker(partitions = 3) { broker =>
      produceStrings(broker, "events.a", 0, Seq("a0"))
      produceStrings(broker, "events.a", 1, Seq("a1"))
      produceStrings(broker, "events.a", 2, Seq("a2"))
      produceStrings(broker, "events.b", 0, Seq("b0"))
      produceStrings(broker, "other", 0, Seq("x"))
      def read(mode: (String, String)) = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option(mode._1, mode._2)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSet
      assert(read(("assign", """{"events.a":[0,2]}""")) === Set("a0", "a2"))
      assert(read(("subscribePattern", "events\\..*")) ===
        Set("a0", "a1", "a2", "b0"))
      // exactly one subscription mode
      val e = intercept[Exception] {
        spark.read.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "events.a")
          .option("assign", """{"events.a":[0]}""")
          .option("startingOffsets", "earliest")
          .option("endingOffsets", "latest")
          .load().collect()
      }
      assert(e.getMessage.contains("exactly one"))
    }
  }

  test("startingTimestamp and startingOffsetsByTimestamp resolve via ListOffsets") {
    withBroker(partitions = 2) { broker =>
      val c = new KafkaWireClient("localhost", broker.port, "ts-producer")
      try {
        // partition 0: timestamps 1000,2000,3000; partition 1: 1500,2500
        c.produce("t", 0, Seq((1000L, null, b("p0-a")), (2000L, null, b("p0-b")),
          (3000L, null, b("p0-c"))))
        c.produce("t", 1, Seq((1500L, null, b("p1-a")), (2500L, null, b("p1-b"))))
      } finally c.close()
      def read(opts: (String, String)*) = {
        var r = spark.read.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "t")
          .option("endingOffsets", "latest")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        r.load().selectExpr("cast(value as string)").collect()
          .map(_.getString(0)).toSet
      }
      // global timestamp: records at or after 2000 in every partition
      assert(read(("startingTimestamp", "2000")) ===
        Set("p0-b", "p0-c", "p1-b"))
      // per-partition timestamps win over the global one
      assert(read(("startingOffsetsByTimestamp", """{"t":{"0":3000,"1":0}}"""),
        ("startingTimestamp", "99")) ===
        Set("p0-c", "p1-a", "p1-b"))
      // a timestamp past the whole log errors (official 'error' strategy)
      val e = intercept[Exception](read(("startingTimestamp", "99999")))
      assert(e.getMessage.contains("no offset at or after"))
      // a bounded time-window read: [2000, 3000) across both partitions
      assert(read(("startingTimestamp", "2000"),
        ("endingTimestamp", "3000")) === Set("p0-b", "p1-b"))
      // an ending timestamp past the log means "to the end", not error
      assert(read(("startingTimestamp", "2500"),
        ("endingTimestamp", "99999")) === Set("p0-c", "p1-b"))
    }
  }

  test("bootstrap falls back past a dead seed server") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("alive"))
      // reserve a port nothing listens on, then list it FIRST
      val dead = new java.net.ServerSocket(0)
      val deadPort = dead.getLocalPort
      dead.close()
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers",
          s"localhost:$deadPort,${broker.bootstrapServers}")
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
      assert(df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSeq === Seq("alive"))
    }
  }

  test("batch read without startingOffsets defaults to earliest (official semantics)") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("a", "b", "c"))
      // no startingOffsets/endingOffsets options at all: the official
      // connector reads earliest→latest for batch; latest→latest would
      // silently return zero rows
      val df = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .load()
      assert(df.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).toSet === Set("a", "b", "c"))
    }
  }

  test("LogAppendTime batches surface timestampType 1") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("create-time"))
      broker.appendLogAppendTime("t", 0, Seq((5000L, null, b("log-append-time"))))
      val rows = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .load()
        .selectExpr("cast(value as string) v", "timestampType",
          "unix_millis(timestamp) ts")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("create-time", 0, 1000L), ("log-append-time", 1, 5000L)))
    }
  }

  test("partitions added after the stream starts are read from earliest") {
    withBroker(partitions = 1) { broker =>
      produceStrings(broker, "t", 0, Seq("p0-a", "p0-b"))
      val ckpt = Files.createTempDirectory("graft-kafka-grow-ckpt").toString
      val out = Files.createTempDirectory("graft-kafka-grow-out").toString
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", "t")
          .option("startingOffsets", "earliest")
          .load()
          .selectExpr("cast(value as string) v", "partition")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
      }
      runOnce() // checkpoint now knows only partition 0
      broker.growPartitions(2)
      produceStrings(broker, "t", 1, Seq("p1-a", "p1-b"))
      runOnce() // partition 1 has no checkpoint entry → must start earliest
      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows === Set(("p0-a", 0), ("p0-b", 0), ("p1-a", 1), ("p1-b", 1)))
    }
  }

  test("sink rejects an out-of-range explicit partition") {
    withBroker(partitions = 2) { broker =>
      import spark.implicits._
      val e = intercept[Exception] {
        Seq(("v", 5)).toDF("value", "partition")
          .write.format("graft-kafka").mode("append")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("topic", "t").save()
      }
      assert(graft.TestErrors.messageChain(e).exists(_.contains("out of range")))
    }
  }

  test("sink rejects a non-timestamp 'timestamp' column at planning") {
    import spark.implicits._
    val e = intercept[Exception] {
      // LongType millis would be silently divided by 1000 — must fail fast
      Seq(("v", 1723500000000L)).toDF("value", "timestamp")
        .write.format("graft-kafka").mode("append")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("topic", "t").save()
    }
    assert(graft.TestErrors.messageChain(e).exists(_.contains("TIMESTAMP")))
  }

  test("read_committed drops aborted transactions' rows; " +
       "read_uncommitted surfaces them (franz-go default parity)") {
    withBroker() { broker =>
      // interleave: plain rows, an ABORTED transaction, a COMMITTED one
      // from the same producer, a second producer aborted, more plain
      produceStrings(broker, "t", 0, Seq("p0", "p1"))
      broker.appendTransactional("t", 0, producerId = 7L,
        Seq((2000L, b("ka"), b("aborted-1")), (2001L, b("kb"), b("aborted-2"))))
      broker.endTxn("t", 0, producerId = 7L, commit = false)
      broker.appendTransactional("t", 0, producerId = 7L,
        Seq((2002L, b("kc"), b("committed-1"))))
      broker.endTxn("t", 0, producerId = 7L, commit = true)
      broker.appendTransactional("t", 0, producerId = 9L,
        Seq((2003L, b("kd"), b("aborted-3"))))
      broker.endTxn("t", 0, producerId = 9L, commit = false)
      produceStrings(broker, "t", 0, Seq("p2"))
      def values(iso: String): Set[String] = spark.read
        .format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("kafka.isolation.level", iso)
        .load()
        .selectExpr("cast(value as string) v")
        .collect().map(_.getString(0)).toSet
      assert(values("read_uncommitted") == Set(
        "p0", "p1", "aborted-1", "aborted-2", "committed-1", "aborted-3",
        "p2"), "read_uncommitted (the default) surfaces aborted rows")
      assert(values("read_committed") == Set(
        "p0", "p1", "committed-1", "p2"),
        "read_committed must drop aborted transactions whole and keep " +
          "the same producer's later committed transaction")
      // bad spelling fails fast
      val e = intercept[Exception](values("read_repeatable"))
      assert(graft.TestErrors.messageChain(e)
        .exists(_.contains("kafka.isolation.level")))
    }
  }

  test("read_committed streaming waits out an open transaction instead " +
       "of declaring data loss") {
    withBroker() { broker =>
      produceStrings(broker, "t", 0, Seq("p0"))
      broker.appendTransactional("t", 0, producerId = 5L,
        Seq((3000L, b("k"), b("in-flight"))))
      // the open transaction pins the LSO at its first offset; a batch
      // read planned to the log end must WAIT, then deliver once the
      // producer commits
      val resolver = new Thread(() => {
        Thread.sleep(1500)
        broker.endTxn("t", 0, producerId = 5L, commit = true)
      })
      resolver.setDaemon(true); resolver.start()
      val vals = spark.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "t")
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("kafka.isolation.level", "read_committed")
        .load()
        .selectExpr("cast(value as string) v")
        .collect().map(_.getString(0)).toSet
      resolver.join()
      assert(vals == Set("p0", "in-flight"),
        "the committed transaction's rows must arrive after resolution")
    }
  }

  test("config surface errors: missing bootstrap, bad connector name") {
    intercept[IllegalArgumentException] {
      GraftKafka.parseOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("subscribe", "t")))
    }
    intercept[IllegalArgumentException] {
      BidPipeline.kafkaSource(spark, BidPipeline.Config(
        bootstrapServers = "localhost:1", topic = "t",
        checkpointLocation = "/tmp/x", exportRoot = "/tmp/y",
        connector = "flink"))
    }
  }
}
