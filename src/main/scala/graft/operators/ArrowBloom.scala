package graft.operators

import org.apache.spark.sql.types._

/** Per-file Bloom filters for EQUALITY file-skipping on high-cardinality
  * columns — the pruning zone maps can't do.
  *
  * Zone maps eliminate on RANGES: they're decisive when a file's values
  * are clustered (sorted exports, z-ordered tables) and useless when a
  * high-cardinality key is spread uniformly — every file's [min,max]
  * spans the whole domain and `WHERE key = 'x'` scans all of them. A
  * Bloom filter answers the other question: "is this exact value
  * POSSIBLY in this file?" — "no" is definite, so skipping on it is
  * elimination-sound exactly like the zone maps (false positives cost
  * a kept file, never a lost row; false negatives don't exist).
  *
  * Parquet's discipline, adapted to the Arrow-IPC artifact: opt-in per
  * column (`bloomcolumns`), fixed size chosen UP FRONT from an expected
  * per-file distinct count (`bloomndv`, like parquet's `…expected.ndv`)
  * and a target false-positive rate (`bloomfpp`) — insertion is then
  * O(m) memory per task with no value buffering, and overshooting the
  * NDV estimate only degrades the fpp (weaker pruning), never
  * soundness. The bits live in the file's own footer metadata and the
  * directory's `_stats.tsv` manifest, the same two-tier lookup the
  * zone maps use (one manifest read per directory at plan time).
  *
  * Hashing must be bit-stable across JVMs and releases: XXH64 (the
  * same implementation Spark's `xxhash64` function uses) over the
  * value's CANONICAL form — the zone-map long representation for
  * int/bigint/date-day/timestamp-micros, raw UTF-8 bytes for strings.
  * Doubles are excluded: NaN/-0.0 equality subtleties buy nothing on a
  * type nobody point-looks-up. Two independent seeds drive standard
  * double hashing (h1 + i·h2 mod m).
  */
object ArrowBloom {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  /** Footer/manifest key: `graft.bloom.<ordinal>` → `k:m:<base64 bits>`. */
  def bloomMetaKey(ordinal: Int): String = s"graft.bloom.$ordinal"

  val DefaultFpp: Double = 0.01
  /** Expected distinct values per FILE (not per table): at the default
    * fpp this sizes ~2.5 Mbit ≈ 314 KiB per opted-in column per file —
    * visible, which is why blooms are opt-in. */
  val DefaultNdv: Long = 1L << 18
  /** Hard cap on filter size: 2^23 bits = 1 MiB per column per file. */
  val MaxBits: Long = 1L << 23

  /** Column types a bloom can cover: exact-equality types with a
    * stable canonical form. */
  def bloomable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private val Seed1 = 0x9E3779B97F4A7C15L
  private val Seed2 = 0xC2B2AE3D27D4EB4FL

  def hashLongPair(v: Long): (Long, Long) =
    (XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2) | 1L)

  def hashBytesPair(b: Array[Byte]): (Long, Long) =
    (XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed1),
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length,
        Seed2) | 1L)

  /** Optimal geometry for `ndv` keys at `fpp`: m = -n·ln(p)/ln(2)²
    * rounded up to a word, capped; k = (m/n)·ln(2), clamped to [1,16]. */
  def geometry(ndv: Long, fpp: Double): (Int, Long) = {
    val n = math.max(1L, ndv)
    val p = math.min(0.5, math.max(1e-6, fpp))
    val mRaw = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
    val m = math.min(MaxBits, math.max(64L, (mRaw + 63) / 64 * 64))
    val k = math.max(1, math.min(16,
      math.round(m.toDouble / n * math.log(2)).toInt))
    (k, m)
  }

  /** One column's under-construction filter (task-side, mutable). */
  final class Builder(val k: Int, val m: Long) {
    private val words = new Array[Long]((m / 64).toInt)
    private var any = false
    def add(h: (Long, Long)): Unit = {
      var i = 0
      var acc = h._1
      while (i < k) {
        val bit = ((acc % m) + m) % m
        words((bit >>> 6).toInt) |= 1L << (bit & 63)
        acc += h._2
        i += 1
      }
      any = true
    }
    def nonEmpty: Boolean = any
    /** `k:m:<base64 of little-endian words>` */
    def serialize: String = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      words.foreach(bb.putLong)
      s"$k:$m:${java.util.Base64.getEncoder.encodeToString(bb.array())}"
    }
  }

  /** A stamped filter, parsed for probing. None on any malformed
    * input — an unreadable bloom is "no information", never an error
    * (the same degrade-to-unskipped contract as the zone maps). */
  final class Probe(k: Int, m: Long, words: Array[Long]) {
    def mightContain(h: (Long, Long)): Boolean = {
      var i = 0
      var acc = h._1
      while (i < k) {
        val bit = ((acc % m) + m) % m
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
          return false
        acc += h._2
        i += 1
      }
      true
    }
  }

  def parse(serialized: String): Option[Probe] =
    try {
      val parts = serialized.split(":", 3)
      if (parts.length != 3) return None
      val k = parts(0).toInt
      val m = parts(1).toLong
      val bytes = java.util.Base64.getDecoder.decode(parts(2))
      if (k < 1 || m < 64 || m % 64 != 0 || bytes.length.toLong * 8 != m)
        return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val words = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < words.length) { words(i) = bb.getLong; i += 1 }
      Some(new Probe(k, m, words))
    } catch { case _: Exception => None }

  /** Compact writer-side spec, shipped to tasks as one string:
    * `fpp:ndv:col1,col2`. Empty = no blooms. */
  def spec(cols: Seq[String], fpp: Double, ndv: Long): String =
    if (cols.isEmpty) "" else s"$fpp:$ndv:${cols.mkString(",")}"

  /** Parse a task-side spec against the write schema → per-ordinal
    * geometry. Unknown names were rejected at plan time; this re-check
    * just drops them defensively. */
  def specOrdinals(spec: String, schema: StructType)
      : (Double, Long, Array[Int]) =
    if (spec == null || spec.isEmpty) (DefaultFpp, DefaultNdv, Array.empty)
    else {
      val parts = spec.split(":", 3)
      val fpp = parts(0).toDouble
      val ndv = parts(1).toLong
      val ords = parts(2).split(',').flatMap { c =>
        val o = schema.fieldNames.indexOf(c)
        if (o >= 0 && bloomable(schema(o).dataType)) Some(o) else None
      }
      (fpp, ndv, ords)
    }

  /** Plan-time validation with the failing name in the message. */
  def validate(cols: Seq[String], schema: StructType): Unit =
    cols.foreach { c =>
      val o = schema.fieldNames.indexOf(c)
      require(o >= 0,
        s"bloomcolumns: '$c' is not a column of the write schema " +
          s"(${schema.fieldNames.mkString(", ")})")
      require(bloomable(schema(o).dataType),
        s"bloomcolumns: '$c' has type ${schema(o).dataType.simpleString} — " +
          "blooms cover string, int, bigint, date, and timestamp columns")
    }
}
