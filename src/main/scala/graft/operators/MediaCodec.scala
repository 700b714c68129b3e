package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for SELF-DESCRIBING media formats — PPM (binary
  * netpbm), BMP (BITMAPINFOHEADER) and canonical WAV (RIFF/fmt) need no
  * external library to read their headers, which is exactly the slice
  * of real media decode this container can do honestly (everything
  * else stays behind the documented deterministic fallback).
  *
  * [[synth]] writes spec-conformant bytes and [[parse]] reads the spec
  * — two independent code paths, so the closed-form oracle over the
  * synthesized corpus catches a bug in either (a mis-written header or
  * a mis-read field both surface as a hash mismatch).
  *
  * Every parser is total: wrong magic, truncated header, or
  * out-of-range dimensions return [[Fallback]] — a corrupt payload
  * must never fail a task (the poison-message rule the streaming path
  * already follows).
  */
object MediaCodec {

  /** Decoded header facts, one shape for image and audio: images fill
    * width/height/channels/bitDepth, audio fills
    * channels/sampleRate/bitDepth. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, bitDepth: Int)

  val Fallback: MediaMeta = MediaMeta("unknown", 0, 0, 0, 0, 0)

  /** Dimension sanity bound: a header claiming a side past this is
    * corrupt (or hostile — a 2^31-pixel claim must not drive an
    * allocation). */
  val MaxDim = 1 << 20

  // --- deterministic synthesis (the test corpus's media payloads) ----

  /** Synthesized payload for a document: modality cycles with doc_id
    * (0 → PPM, 1 → BMP, 2 → WAV), dimensions and sample counts are
    * closed-form in doc_id so the DuckDB oracle can state the expected
    * decode without parsing bytes; every 17th doc is truncated to 6
    * bytes — the corrupt case that must land on [[Fallback]]. */
  def synth(docId: Long): Array[Byte] = {
    val w = synthWidth(docId)
    val h = synthHeight(docId)
    val full = (docId % 3) match {
      case 0 => ppm(w, h, docId)
      case 1 => bmp(w, h, docId)
      case _ => wav(synthChannels(docId), synthSampleRate(docId),
        synthBitDepth(docId), synthSamples(docId), docId)
    }
    if (docId % 17 == 0) full.take(6) else full
  }

  def synthWidth(docId: Long): Int = 2 + (docId % 14).toInt
  def synthHeight(docId: Long): Int = 2 + ((docId * 7) % 14).toInt
  def synthChannels(docId: Long): Int = 1 + (docId % 2).toInt
  def synthSampleRate(docId: Long): Int = 8000 + (docId % 4).toInt * 4000
  def synthBitDepth(docId: Long): Int = 8 * (1 + ((docId / 3) % 2).toInt)
  def synthSamples(docId: Long): Int = 8 + (docId % 32).toInt

  private def ppm(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = ((seed + i) % 256).toByte; i += 1 }
    header ++ px
  }

  private def bmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val imageSize = rowSize * h
    val buf = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + imageSize) // file size
    buf.putInt(0)              // reserved
    buf.putInt(54)             // pixel-data offset
    buf.putInt(40)             // BITMAPINFOHEADER size
    buf.putInt(w)
    buf.putInt(h)
    buf.putShort(1)            // planes
    buf.putShort(24)           // bpp
    buf.putInt(0)              // BI_RGB
    buf.putInt(imageSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)    // palette
    var i = 0
    while (i < imageSize) { buf.put(((seed + i) % 256).toByte); i += 1 }
    buf.array()
  }

  private def wav(channels: Int, rate: Int, bits: Int, samples: Int,
                  seed: Long): Array[Byte] = {
    val dataSize = samples * channels * (bits / 8)
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)             // PCM fmt chunk size
    buf.putShort(1)            // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * channels * (bits / 8)) // byte rate
    buf.putShort((channels * (bits / 8)).toShort) // block align
    buf.putShort(bits.toShort)
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataSize)
    var i = 0
    while (i < dataSize) { buf.put(((seed + i) % 256).toByte); i += 1 }
    buf.array()
  }

  // --- real raster images: hand-rolled PNG writer + ImageIO decode ---

  /** Pixel cap for [[decodeImage]]: a header claiming more pixels than
    * this must not drive an allocation (the same hostile-header rule as
    * [[MaxDim]], applied to the raster). 16 M pixels ≈ a 64 MB ARGB
    * buffer — comfortably inside an executor task's budget. */
  val MaxImagePixels: Long = 1L << 24

  /** Closed-form dims of the synthesized image corpus ([[synthImage]]).
    * Width is a multiple of 4 so BMP rows need no padding — then the
    * decoded pixel-byte sum has the SAME closed form for both formats
    * (the oracle's lever): Σ_{i<3wh} (doc_id + i) mod 256. */
  def imgWidth(docId: Long): Int = 4 * (1 + (docId % 8).toInt)
  def imgHeight(docId: Long): Int = 2 + ((docId * 5) % 14).toInt

  /** Raster payload for a document: PNG for even ids (hand-rolled
    * spec-conformant encoder — deliberately NOT ImageIO, so the
    * ImageIO read in [[decodeImage]] is an independent code path), BMP
    * for odd; every 17th truncated to 6 bytes (corrupt — must land on
    * [[ImageFallback]]). Pixel bytes follow the same (seed + i) % 256
    * ramp as [[synth]], in raster order, so pixel statistics are
    * closed-form in doc_id. */
  def synthImage(docId: Long): Array[Byte] = {
    val w = imgWidth(docId)
    val h = imgHeight(docId)
    val full = if (docId % 2 == 0) png(w, h, docId) else bmp(w, h, docId)
    if (docId % 17 == 0) full.take(6) else full
  }

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val tagB = tag.getBytes(StandardCharsets.US_ASCII)
    val out = ByteBuffer.allocate(12 + data.length) // PNG ints are BE
    out.putInt(data.length).put(tagB).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tagB)
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Minimal spec-conformant PNG: 8-bit truecolor, no interlace, one
    * IDAT, filter 0 on every scanline, zlib via `Deflater` (which emits
    * the zlib wrapper PNG requires). The ramp indexes PIXEL bytes only
    * — filter bytes don't consume it — so decoded values match
    * (seed + i) % 256 in RGB raster order exactly. */
  private[graft] def png(w: Int, h: Int, seed: Long): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    var i = 0
    while (y < h) {
      val rowOff = y * (1 + w * 3) // leading filter byte stays 0
      var k = 0
      while (k < w * 3) {
        raw(rowOff + 1 + k) = ((seed + i) % 256).toByte
        i += 1; k += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    sig ++ pngChunk("IHDR", ihdr.array()) ++
      pngChunk("IDAT", comp.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decoded raster facts: detected format, dims, and the pixel-level
    * statistic that proves the raster was actually decoded (a header
    * parse alone cannot produce it). */
  final case class ImageFacts(format: String, width: Int, height: Int,
                              nPx: Long, pxMean: Double)

  val ImageFallback: ImageFacts = ImageFacts("unknown", 0, 0, 0L, 0.0)

  /** TOTAL raster decode via the JDK's `javax.imageio` (registers
    * PNG/JPEG/GIF/TIFF/BMP readers — no external library): detected
    * format, dimensions, and the mean over every channel value of
    * every pixel, rounded half-up to 2 decimals. Corrupt or truncated
    * payloads, unknown formats, and hostile headers (dims past
    * [[MaxDim]] / rasters past [[MaxImagePixels]], refused BEFORE
    * allocation) all land on [[ImageFallback]] — never a task
    * failure. */
  /** The guarded ImageIO read shared by [[decodeImage]] and the
    * perceptual hash: None on corrupt/truncated/unknown payloads and
    * on hostile headers (dims past [[MaxDim]] / rasters past
    * [[MaxImagePixels]], refused BEFORE allocation). */
  def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxImagePixels) None
          else Some(reader.read(0))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  def decodeImage(bytes: Array[Byte]): ImageFacts = {
    if (bytes == null || bytes.length < 8) return ImageFallback
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory consults ImageIO.getUseCache() (default true) and
      // backs every stream with a TEMP FILE — one file create+delete
      // per decoded image, which turns a CPU-bound decode pass into
      // filesystem traffic that collapses under concurrent shuffle I/O.
      // Payloads here are in-heap byte arrays already (≤ MaxImagePixels
      // by the guards below), so the memory-backed stream is strictly
      // better at every scale.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return ImageFallback
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxImagePixels) return ImageFallback
          val img = reader.read(0)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          // Exact half-up to 2 decimals in integer arithmetic:
          // floor(sum/n * 100 + 1/2) = (200*sum + n) / (2*n). sum ≤
          // 255 * 3 * MaxImagePixels < 2^35, so 200*sum fits a Long.
          val n = 3L * w * h
          ImageFacts(reader.getFormatName.toLowerCase(java.util.Locale.ROOT), w, h, n,
            ((200L * sum + n) / (2L * n)) / 100.0)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => ImageFallback
    }
  }

  // --- parsing -------------------------------------------------------

  /** Total header parse: PPM/BMP/WAV by magic, [[Fallback]] otherwise. */
  def parse(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 2) return Fallback
    if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'))
      parsePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
             bytes(2) == 'F' && bytes(3) == 'F') parseWav(bytes)
    else Fallback
  }

  /** netpbm: magic, then whitespace-separated width, height, maxval,
    * with '#' comments legal between tokens. */
  private def parsePpm(bytes: Array[Byte]): MediaMeta = {
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
             (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      if (pos >= bytes.length || !bytes(pos).toChar.isDigit) return -1
      var v = 0L
      while (pos < bytes.length && bytes(pos).toChar.isDigit && v <= MaxDim) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      if (v > Int.MaxValue) -1 else v.toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        maxval <= 0 || maxval > 65535) Fallback
    else MediaMeta("ppm", w, h, if (bytes(1) == '6') 3 else 1, 0,
      if (maxval > 255) 16 else 8)
  }

  /** BMP with a BITMAPINFOHEADER (the 1987 layout everything writes):
    * width/height are signed LE int32 at 18/22 (negative height =
    * top-down rows), bpp LE uint16 at 28. */
  private def parseBmp(bytes: Array[Byte]): MediaMeta = {
    if (bytes.length < 54) return Fallback
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dibSize = buf.getInt(14)
    val w = buf.getInt(18)
    val h = math.abs(buf.getInt(22))
    val bpp = buf.getShort(28) & 0xffff
    if (dibSize < 40 || w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        !Set(1, 4, 8, 16, 24, 32).contains(bpp)) Fallback
    else MediaMeta("bmp", w, h, math.max(bpp / 8, 1), 0, bpp)
  }

  /** Canonical RIFF/WAVE with a leading fmt chunk (what every PCM
    * writer emits): channels LE16 @22, sample rate LE32 @24, bit depth
    * LE16 @34. */
  private def parseWav(bytes: Array[Byte]): MediaMeta = {
    if (bytes.length < 44) return Fallback
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val wave = new String(bytes, 8, 4, StandardCharsets.US_ASCII)
    val fmt = new String(bytes, 12, 4, StandardCharsets.US_ASCII)
    val channels = buf.getShort(22) & 0xffff
    val rate = buf.getInt(24)
    val bits = buf.getShort(34) & 0xffff
    if (wave != "WAVE" || fmt != "fmt " || channels < 1 || channels > 64 ||
        rate <= 0 || rate > 1000000 || bits < 1 || bits > 64) Fallback
    else MediaMeta("wav", 0, 0, channels, rate, bits)
  }
}
