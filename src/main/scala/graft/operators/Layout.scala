package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-dimensional file layout — Z-order (Morton) clustering, the
  * data-skipping pass a 100 TB lakehouse runs so that point/box queries
  * on TWO columns prune files instead of scanning everything sorted by
  * only one of them.
  *
  * A linear sort on `x` gives perfect min/max pruning on `x` and none
  * on `y`; interleaving the bits of both ranks gives every file a small
  * rectangle in (x, y) space, so predicates on either column (or both)
  * skip most files via ordinary parquet/Delta min-max stats. This is
  * the same mechanism `OPTIMIZE ZORDER BY` provides in Delta/Iceberg —
  * expressed here as a plain Catalyst bit-interleave plus a range
  * exchange, no engine extension needed.
  */
object Layout {

  /** Bits per dimension in the interleave. 10 bits × 2 dims = 20-bit
    * Morton codes — 1M cells, plenty for file-level clustering (the
    * code only needs to out-resolve the file count, not the row
    * count). */
  val ZBits = 10

  /** Morton code of two bucketed non-negative ints: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. Pure shift/mask arithmetic —
    * codegen'd, engine-portable (the oracle spells the identical sum),
    * and monotone in the locality sense that matters: nearby (x, y)
    * cells share code prefixes. */
  def zValue(x: Column, y: Column, bits: Int = ZBits): Column =
    zValueN(Seq(x, y), bits)

  /** N-dimensional Morton code: bit i of dimension d lands at position
    * i·n + d — the 2-D form above, generalized. Callers shrink `bits`
    * as dimensions grow (bits·n ≤ 63) so the code stays in one long;
    * [[graft.sources.GraftTable.zorder]] uses `min(ZBits, 62/n)`. */
  def zValueN(dims: Seq[Column], bits: Int = ZBits): Column = {
    val n = dims.length
    require(n >= 1 && bits >= 1 && bits * n <= 63,
      s"interleave overflow: $n dims x $bits bits")
    dims.zipWithIndex.map { case (c, d) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d)
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** The two bucketed dimensions for the events-table layout: user and
    * value, each ranked into 2^[[ZBits]] buckets by cheap arithmetic
    * (a production deployment ranks by quantile sketch; bucketing only
    * has to spread values, not be uniform). */
  def eventBuckets(df: DataFrame): DataFrame =
    df.select(col("event_id"),
      pmod(col("user_id"), lit(1L << ZBits)).as("xb"),
      pmod(floor(col("value") * 10).cast("long"), lit(1L << ZBits)).as("yb"))

  /** Oracle-checked query form: the Morton code of every event, lowest
    * codes first — pins the bit-interleave arithmetic against the
    * DuckDB oracle. `TakeOrderedAndProject` shape: per-partition heaps,
    * K rows out, no global sort. */
  val ZOrderK = 200

  def zorderEvents(spark: SparkSession, dir: String): DataFrame =
    eventBuckets(Tables.events(spark, dir))
      .select(col("event_id"), col("xb"), col("yb"),
        zValue(col("xb"), col("yb")).as("z"))
      .orderBy(col("z"), col("event_id"))
      .limit(ZOrderK)

  /** Write `df` Z-ordered on the two bucketed dimensions: compute the
    * Morton code, range-partition on it (sampled range exchange — the
    * only shuffle), sort within partitions, write parquet. Every output
    * file covers a compact Morton range ⇒ a small (x, y) rectangle ⇒
    * min/max stats prune on both columns. The code column itself is
    * dropped from the files — it is layout, not data. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, outPath: String,
                  numFiles: Int): Unit =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)

  /** The derived high-cardinality string key both skipping queries
    * share — spelled identically in the oracle SQL
    * (`'doc-' || lpad(doc_id, 9, '0')`). */
  private def docKey: Column =
    concat(lit("doc-"), lpad(col("doc_id").cast("string"), 9, "0"))

  /** Per-file equality blooms end to end: export the documents under a
    * hash-SPREAD layout (each file's key range spans the whole domain —
    * the layout zone maps cannot prune) with `bloomcolumns` on the
    * key, then point-look-up a fixed key set. At 100 TB this is the
    * "find these N documents by id in an unsorted corpus" shape: the
    * blooms turn a full-corpus scan into opening only the files that
    * might hold the keys; the oracle pins the surviving rows. */
  def bloomLookup(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    try {
      Tables.documents(spark, dir)
        .select(docKey.as("key"), col("doc_id"), col("lang"), col("n_chars"))
        .repartition(8) // round-robin: per-file key ranges all overlap
        .write.format("graft-arrow")
        .option("bloomcolumns", "key")
        .mode("overwrite").save(s"$out/docs")
      val probes = Seq(3L, 57L, 123L, 222L, 404L)
        .map(i => f"doc-$i%09d")
      val back = spark.read.format("graft-arrow").load(s"$out/docs")
        .where(col("key").isin(probes: _*))
        .select(col("key"), col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("key")
      Scratch.materializeAndClean(out, back)
    } catch { case e: Throwable =>
      Scratch.rm(new java.io.File(out)); throw e
    }
  }

  /** String zone maps end to end: export the documents RANGE-CLUSTERED
    * on the derived key (repartitionByRange — each file covers a
    * disjoint key interval, the layout blooms don't need), then run a
    * key-range + prefix aggregate. The stamped string bounds prune the
    * files outside the range at plan time; the oracle pins the
    * aggregate. */
  def stringPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-sprune").toString
    try {
      Tables.documents(spark, dir)
        .select(docKey.as("key"), col("doc_id"), col("lang"), col("n_chars"))
        .repartitionByRange(8, col("key"))
        .sortWithinPartitions(col("key"))
        .write.format("graft-arrow").mode("overwrite").save(s"$out/docs")
      val back = spark.read.format("graft-arrow").load(s"$out/docs")
        .where(col("key") >= "doc-000000100" && col("key") < "doc-000000300"
          && col("key").startsWith("doc-0000001"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
      Scratch.materializeAndClean(out, back)
    } catch { case e: Throwable =>
      Scratch.rm(new java.io.File(out)); throw e
    }
  }
}
