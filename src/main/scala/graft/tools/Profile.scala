package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Scratch stage-level profiler for the heavy dedup plans (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())

    val sh = docs
      .select(col("doc_id"),
        array_distinct(wordNgrams(tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingle arrays")(sh.count())
    val shC = sh.cache()
    time("shingle arrays cached")(shC.count())

    val ex = shC.select(col("doc_id"), explode(col("sh")).as("s"))
    time("exploded shingles")(ex.count())

    val joined = ex.as("x").join(ex.as("y"),
      col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
    time("inverted-index join")(joined.count())

    val common = joined
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    time("pair counts")(common.count())

    // minhash stages
    val md = md5(concat(lit("mh:"), col("s")))
    val hashed = ex
      .withColumn("h1", conv(substring(md, 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(md, 9, 8), 16, 10).cast("long"))
    time("md5+conv")(hashed.count())
    val sigCols = (0 until 16).map(j =>
      min((col("h1") + lit(j.toLong) * col("h2"))
        .bitwiseAND(lit(0xffffffffL))).as(s"h$j"))
    val sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("16 min-aggs")(sig.count())

    // codec throughput: single-thread decode of real framed messages
    {
      import graft.operators.ProtoPipeline
      import graft.sources.proto.{BidRequestSchema, ProtoWire}
      val frames = ProtoPipeline.framedMessages(spark, dir)
        .limit(20000).collect().map(_.getAs[Array[Byte]](0))
      val payloads = frames.map(f => java.util.Arrays.copyOfRange(f, 6, f.length - 8))
      // warmup
      payloads.take(2000).foreach(p => ProtoWire.decode(p, BidRequestSchema.bidrequest))
      val t0 = System.nanoTime()
      payloads.foreach(p => ProtoWire.decode(p, BidRequestSchema.bidrequest))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] decode 1-thread              ${payloads.length / dt}%10.0f msg/s")
      val t1 = System.nanoTime()
      var bytes = 0L
      payloads.foreach(p => bytes += p.length)
      println(f"[profile] avg msg size                 ${bytes / payloads.length}%10d B")
    }

    spark.stop()
  }
}
