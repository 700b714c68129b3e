package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Multimodal}

/** The real self-describing-format decoders: spec-conformant round
  * trips, and total parsing — truncated, corrupt and hostile headers
  * must land on the deterministic fallback, never throw.
  */
class MediaCodecSpec extends AnyFunSuite {
  import SparkTestSession._
  import MediaCodec._

  test("synthesized payloads round-trip through the parser") {
    (0L until 600L).foreach { id =>
      val m = parse(synth(id))
      if (id % 17 == 0) assert(m == Fallback, s"doc $id must fall back")
      else (id % 3) match {
        case 0 =>
          assert(m == MediaMeta("ppm", synthWidth(id), synthHeight(id), 3, 0, 8))
        case 1 =>
          assert(m == MediaMeta("bmp", synthWidth(id), synthHeight(id), 3, 0, 24))
        case _ =>
          assert(m == MediaMeta("wav", 0, 0, synthChannels(id),
            synthSampleRate(id), synthBitDepth(id)))
      }
    }
  }

  test("hand-built headers parse field-exactly") {
    // P5 (grayscale) with a comment line — the layout image tools emit
    val p5 = "P5\n# made by hand\n13 7\n255\n".getBytes(StandardCharsets.US_ASCII) ++
      Array.fill[Byte](13 * 7)(1)
    assert(parse(p5) == MediaMeta("ppm", 13, 7, 1, 0, 8))
    // 16-bit P6
    val p6deep = "P6\n4 4\n65535\n".getBytes(StandardCharsets.US_ASCII) ++
      Array.fill[Byte](4 * 4 * 6)(0)
    assert(parse(p6deep) == MediaMeta("ppm", 4, 4, 3, 0, 16))
    // top-down BMP (negative height) still reports positive dims
    val bmp = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bmp.putInt(40).putInt(10).putInt(-5).putShort(1).putShort(32)
    assert(parse(bmp.array()) == MediaMeta("bmp", 10, 5, 4, 0, 32))
  }

  test("truncated, corrupt and hostile headers all fall back, never throw") {
    val cases = Seq[Array[Byte]](
      Array.empty,
      "P6".getBytes(StandardCharsets.US_ASCII),             // magic only
      "P6\n99999999999 3\n255\n".getBytes(StandardCharsets.US_ASCII), // dim overflow
      "P6\n0 5\n255\n".getBytes(StandardCharsets.US_ASCII), // zero dim
      "P6\n4 4\n999999\n".getBytes(StandardCharsets.US_ASCII), // maxval range
      "P7\n4 4\n255\n".getBytes(StandardCharsets.US_ASCII), // unknown magic
      "BM".getBytes(StandardCharsets.US_ASCII),             // truncated BMP
      {                                                     // bpp nonsense
        val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
        b.putInt(40).putInt(4).putInt(4).putShort(1).putShort(13)
        b.array()
      },
      "RIFF1234WAVE".getBytes(StandardCharsets.US_ASCII),   // truncated WAV
      {                                                     // zero-channel WAV
        val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
        b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(0)
        b.putInt(8000).putInt(8000).putShort(1).putShort(8)
        b.array()
      },
      null)
    cases.foreach(c => assert(parse(c) == Fallback))
  }

  test("synthesized rasters decode pixel-exactly through ImageIO") {
    (0L until 200L).foreach { id =>
      val f = decodeImage(synthImage(id))
      if (id % 17 == 0) assert(f == ImageFallback, s"doc $id must fall back")
      else {
        val w = imgWidth(id); val h = imgHeight(id)
        assert(f.format == (if (id % 2 == 0) "png" else "bmp"), s"doc $id")
        assert(f.width == w && f.height == h && f.nPx == 3L * w * h)
        var sum = 0L; var i = 0
        while (i < 3 * w * h) { sum += (id + i) % 256; i += 1 }
        val n = 3L * w * h
        assert(f.pxMean == ((200L * sum + n) / (2L * n)) / 100.0,
          s"doc $id pixel mean proves the raster was decoded")
      }
    }
  }

  test("hostile raster headers are refused before allocation") {
    def hugeBmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.array()
    }
    // 2^20 × 2^20 pixels: each dim inside MaxDim, raster past
    // MaxImagePixels — must be refused by the cap, not OOM
    assert(decodeImage(hugeBmp(1 << 20, 1 << 20)) == ImageFallback)
    // a single dim past MaxDim
    assert(decodeImage(hugeBmp(1 << 21, 4)) == ImageFallback)
    // spec-valid PNG signature + IHDR (correct CRC) claiming a huge
    // raster, no pixel data — header parses, cap refuses
    def hugePng(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      val ihdr = ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h)
      ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte)
      val tag = "IHDR".getBytes(StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(ihdr.array())
      val out = ByteBuffer.allocate(12 + 13)
      out.putInt(13).put(tag).put(ihdr.array()).putInt(crc.getValue.toInt)
      sig ++ out.array()
    }
    assert(decodeImage(hugePng(1 << 20, 1 << 20)) == ImageFallback)
    // corrupt and degenerate payloads never throw
    assert(decodeImage(null) == ImageFallback)
    assert(decodeImage(Array.empty[Byte]) == ImageFallback)
    assert(decodeImage(Array.fill[Byte](64)(0x5a)) == ImageFallback)
    assert(decodeImage(synthImage(2).take(30)) == ImageFallback)
  }

  test("mediaImage runs the real ImageIO decode distributed") {
    val out = Multimodal.mediaImage(spark, sf0001).collect()
    assert(out.length == 500)
    val fallback = out.filter(_.getString(2) == "unknown")
    assert(fallback.nonEmpty && fallback.forall(r =>
      r.getInt(3) == 0 && r.getLong(5) == 0L && r.getDouble(6) == 0.0),
      "truncated docs land on the fallback")
    val decoded = out.filter(_.getString(2) != "unknown")
    assert(decoded.forall(r => r.getString(1) == r.getString(2)),
      "claimed and detected formats agree for intact payloads")
    assert(decoded.forall(r => r.getDouble(6) > 0.0))
  }

  test("mediaDecode runs the real parse distributed, corrupt rows survive") {
    val out = Multimodal.mediaDecode(spark, sf0001).collect()
    assert(out.length == 500)
    val unknown = out.filter(_.getString(1) == "unknown")
    assert(unknown.nonEmpty && unknown.forall(_.getInt(7) == 6),
      "every 17th doc is truncated to 6 bytes and must fall back")
    assert(out.filter(_.getString(1) == "wav")
      .forall(r => r.getInt(5) >= 8000 && r.getInt(2) == 0))
    assert(out.filter(_.getString(1) == "ppm").forall(_.getInt(4) == 3))
  }
}
