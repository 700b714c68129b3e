package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka.KafkaWire
import graft.sources.kafka.KafkaWire._

/** Byte-level codec invariants: varint/zigzag, record batch v2
  * encode/decode, CRC verification, the broker zero-copy contracts. */
class KafkaWireSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def roundtripVarInt(v: Int): Int = {
    val w = new Writer(); w.varInt(v)
    new Reader(w.toBytes).varInt()
  }
  private def roundtripVarLong(v: Long): Long = {
    val w = new Writer(); w.varLong(v)
    new Reader(w.toBytes).varLong()
  }

  test("zigzag varint roundtrips the full int range") {
    Seq(0, 1, -1, 63, 64, -64, -65, Int.MaxValue, Int.MinValue).foreach { v =>
      assert(roundtripVarInt(v) === v)
    }
    (1 to 500).foreach { _ =>
      val v = rnd.nextInt(); assert(roundtripVarInt(v) === v)
    }
  }

  test("zigzag varlong roundtrips the full long range") {
    Seq(0L, -1L, Long.MaxValue, Long.MinValue, 1L << 35).foreach { v =>
      assert(roundtripVarLong(v) === v)
    }
    (1 to 500).foreach { _ =>
      val v = rnd.nextLong(); assert(roundtripVarLong(v) === v)
    }
  }

  test("small non-negative varints are single bytes (wire compat)") {
    // zigzag(0)=0, zigzag(-1)=1, zigzag(1)=2 — the protobuf contract
    val w = new Writer(); w.varInt(0); w.varInt(-1); w.varInt(1)
    assert(w.toBytes.toSeq === Seq[Byte](0, 1, 2))
  }

  test("primitive writer/reader agree on strings, bytes, ints") {
    val w = new Writer()
    w.int8(-2).int16(-300).int32(123456789).int64(-98765432101L)
      .string("héllo").nullableString(None).bytes(Array[Byte](1, 2, 3))
      .bytes(null)
    val r = new Reader(w.toBytes)
    assert(r.int8() === -2)
    assert(r.int16() === -300)
    assert(r.int32() === 123456789)
    assert(r.int64() === -98765432101L)
    assert(r.string() === "héllo")
    assert(r.nullableString() === None)
    assert(r.bytes().toSeq === Seq[Byte](1, 2, 3))
    assert(r.bytes() === null)
  }

  private def rec(ts: Long, k: String, v: String) =
    (ts, if (k == null) null else k.getBytes("UTF-8"),
      if (v == null) null else v.getBytes("UTF-8"))

  test("record batch v2 roundtrips offsets, timestamps, null keys/values") {
    val batch = encodeBatch(1000L, Seq(
      rec(1723500000000L, "k0", "v0"),
      rec(1723500000500L, null, "v1"),
      rec(1723499999000L, "k2", null)))
    val out = decodeBatches(batch)
    assert(out.map(_.offset) === Seq(1000L, 1001L, 1002L))
    assert(out.map(_.timestamp) ===
      Seq(1723500000000L, 1723500000500L, 1723499999000L))
    assert(new String(out(0).key, "UTF-8") === "k0")
    assert(out(1).key === null)
    assert(new String(out(1).value, "UTF-8") === "v1")
    assert(out(2).value === null)
  }

  test("multiple concatenated batches decode in sequence") {
    val a = encodeBatch(0L, Seq(rec(1L, "a", "1"), rec(2L, "b", "2")))
    val b = encodeBatch(2L, Seq(rec(3L, "c", "3")))
    val out = decodeBatches(a ++ b)
    assert(out.map(_.offset) === Seq(0L, 1L, 2L))
    assert(out.map(r => new String(r.value, "UTF-8")) === Seq("1", "2", "3"))
  }

  test("corrupted batch fails the CRC check") {
    val batch = encodeBatch(0L, Seq(rec(1L, "k", "payload")))
    batch(batch.length - 3) = (batch(batch.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](decodeBatches(batch))
    assert(e.getMessage.contains("CRC"))
  }

  test("flipping the baseOffset does NOT fail CRC (log re-base contract)") {
    // brokers rewrite baseOffset on append; the spec excludes it from
    // the CRC precisely so the log need not re-checksum
    val batch = encodeBatch(0L, Seq(rec(1L, "k", "v")))
    java.nio.ByteBuffer.wrap(batch, 0, 8).putLong(77L)
    val out = decodeBatches(batch)
    assert(out.head.offset === 77L)
  }

  test("a trailing partial batch is ignored (maxBytes mid-batch cut)") {
    val a = encodeBatch(0L, Seq(rec(1L, "a", "1")))
    val b = encodeBatch(1L, Seq(rec(2L, "b", "2")))
    val cut = a ++ b.take(b.length - 5)
    val out = decodeBatches(cut)
    assert(out.map(_.offset) === Seq(0L))
  }

  test("sasl plain token is NUL-delimited per RFC 4616") {
    val t = KafkaWire.saslPlainToken("user", "secret")
    assert(t.toSeq === ("\u0000user\u0000secret").getBytes("UTF-8").toSeq)
  }

  test("compressed batches roundtrip under every codec") {
    val records = (0 until 200).map { i =>
      rec(1723500000000L + i, s"key-$i", s"value-$i-" + ("x" * (i % 37)))
    }
    Seq(Codec.Gzip, Codec.Snappy, Codec.Lz4, Codec.Zstd).foreach { codec =>
      val batch = encodeBatch(500L, records, codec)
      // codec bits live in the batch attributes (low byte at offset 22)
      assert((batch(22) & 0x07) === codec, s"codec $codec in attributes")
      val out = decodeBatches(batch)
      assert(out.size === 200, s"codec $codec")
      assert(out.head.offset === 500L && out.last.offset === 699L)
      assert(out.map(r => new String(r.value, "UTF-8")) ===
        records.map(r => new String(r._3, "UTF-8")), s"codec $codec")
    }
  }

  test("compression actually shrinks a repetitive payload") {
    val records = (0 until 500).map(_ => rec(1L, null, "the same text " * 10))
    val plain = encodeBatch(0L, records)
    Seq(Codec.Gzip, Codec.Snappy, Codec.Lz4, Codec.Zstd).foreach { codec =>
      assert(encodeBatch(0L, records, codec).length < plain.length / 4,
        s"codec $codec should compress 500 identical records >4x")
    }
  }

  test("compressed batch CRC still covers the compressed records") {
    val batch = encodeBatch(0L, Seq(rec(1L, "k", "payload")), Codec.Zstd)
    batch(batch.length - 3) = (batch(batch.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](decodeBatches(batch))
    assert(e.getMessage.contains("CRC"))
  }

  test("codec names parse like the producer config") {
    assert(Codec.parse("none") === Codec.None)
    assert(Codec.parse("GZIP") === Codec.Gzip)
    assert(Codec.parse("snappy") === Codec.Snappy)
    assert(Codec.parse("lz4") === Codec.Lz4)
    assert(Codec.parse("zstd") === Codec.Zstd)
    intercept[IllegalArgumentException](Codec.parse("brotli"))
  }
}
