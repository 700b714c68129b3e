package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Measures what the file-skipping stack is actually worth (dev tool):
  * one synthetic corpus, three layouts, the same point/range queries.
  *
  *   spread        hash-spread keys, no aids — every file's key range
  *                 spans the domain; a point lookup scans everything
  *   spread+bloom  same layout, per-file equality blooms on the key
  *   clustered     range-clustered on the key — string zone maps prune
  *
  * Prints per-case: files kept of total (from the scan's planned
  * partitions) and min-of-2 wall seconds. The kept/total ratio is the
  * number that transfers to 100 TB — wall time at local scale is
  * mostly fixed overhead, the file ratio is the scan cost multiplier.
  */
object SkipProfile {

  private def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("doc-"), lpad(((col("id") * 2654435761L) % 999999983L)
        .cast("string"), 10, "0")).as("key"),
      col("id"),
      (col("id") % 97).as("grp"),
      concat(lit("payload-"), col("id").cast("string")).as("payload"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.create(cpus, "graft-skip-profile")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = Files.createTempDirectory("graft-skip-profile").toString
    val files = 64

    val df = corpus(spark, n).cache(); df.count()
    df.repartition(files)
      .write.format("graft-arrow").mode("overwrite").save(s"$base/spread")
    df.repartition(files)
      .write.format("graft-arrow").option("bloomcolumns", "key")
      .mode("overwrite").save(s"$base/bloom")
    df.repartitionByRange(files, col("key")).sortWithinPartitions("key")
      .write.format("graft-arrow").mode("overwrite").save(s"$base/clustered")
    df.unpersist()

    // probe keys that exist (same derivation as the corpus)
    def keyOf(i: Long): String =
      f"doc-${(i * 2654435761L) % 999999983L}%010d"
    val probes = Seq(5L, n / 3, n - 7).map(keyOf)

    def measure(dir: String, label: String, q: DataFrame => DataFrame)
        : Unit = {
      def run(): (Long, Int) = {
        val plan = q(spark.read.format("graft-arrow").load(dir))
        val t0 = System.nanoTime()
        val rows = plan.count()
        val sec = System.nanoTime() - t0
        // planned partitions ~ files kept (whole files bin-packed one
        // per task at this size)
        (sec, q(spark.read.format("graft-arrow").load(dir))
          .rdd.getNumPartitions)
      }
      val r1 = run(); val r2 = run()
      val sec = math.min(r1._1, r2._1) / 1e9
      println(f"[skip] $label%-28s files=${r2._2}%3d/$files wall=$sec%.3f s")
    }

    println(s"[skip] corpus n=$n files=$files per layout")
    measure(s"$base/spread", "point spread (no aids)",
      _.where(col("key") === probes.head))
    measure(s"$base/bloom", "point spread+bloom",
      _.where(col("key") === probes.head))
    measure(s"$base/clustered", "point clustered (zone map)",
      _.where(col("key") === probes.head))
    measure(s"$base/spread", "IN(3) spread (no aids)",
      _.where(col("key").isin(probes: _*)))
    measure(s"$base/bloom", "IN(3) spread+bloom",
      _.where(col("key").isin(probes: _*)))
    measure(s"$base/clustered", "IN(3) clustered (zone map)",
      _.where(col("key").isin(probes: _*)))
    measure(s"$base/clustered", "range 1% clustered",
      _.where(col("key") >= "doc-0100000000" && col("key") < "doc-0110000000"))
    measure(s"$base/spread", "range 1% spread (no aids)",
      _.where(col("key") >= "doc-0100000000" && col("key") < "doc-0110000000"))
    graft.operators.Scratch.rm(new java.io.File(base))
    spark.stop()
  }
}
