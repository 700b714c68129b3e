package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.ArrowInterchange

/** Throughput profile of the Arrow IPC interchange (dev tool): blows
  * the sf documents corpus up `Copies`×, materializes it (so the scan
  * doesn't pollute the write timing), then times exportArrow and the
  * readArrow round separately. Prints rows/s and MB/s per direction.
  *
  * Usage: `runMain graft.tools.ArrowProfile [sfDir] [copies]`
  */
object ArrowProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val copies = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus, "graft-arrowprofile")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
    val big = (1 to copies).map(i => docs.withColumn("copy", lit(i)))
      .reduce(_ unionByName _)
      .repartition(cpus).localCheckpoint()
    val rows = big.count()
    val bytes = big.agg(sum(length(col("text")))).head.getLong(0) +
      rows * 40 // text dominates; 40 ≈ the fixed-width columns
    val out = Files.createTempDirectory("graft-arrow-profile").toString
    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      ArrowInterchange.exportArrow(big, s"$out/t")
      val tw = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = ArrowInterchange.readArrow(spark, s"$out/t").count()
      val tr = (System.nanoTime() - t1) / 1e9
      require(n == rows, s"roundtrip lost rows: $n of $rows")
      println(f"[arrowprofile] pass $pass: $rows rows ~${bytes / 1e6}%.0f MB" +
        f" | export $tw%.2f s (${rows / tw / 1e3}%.0f krows/s, ${bytes / tw / 1e6}%.0f MB/s)" +
        f" | read $tr%.2f s (${rows / tr / 1e3}%.0f krows/s, ${bytes / tr / 1e6}%.0f MB/s)")
      // the pruning payoff: a 2-column aggregate through the DSv2
      // source (text never decoded) vs the RDD reader (decodes all)
      val t2 = System.nanoTime()
      spark.read.format("graft-arrow").load(s"$out/t")
        .agg(sum(col("n_chars"))).head
      val tp = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      ArrowInterchange.readArrow(spark, s"$out/t")
        .agg(sum(col("n_chars"))).head
      val tf = (System.nanoTime() - t3) / 1e9
      println(f"[arrowprofile]   2-col agg: dsv2-pruned $tp%.2f s vs " +
        f"rdd-full $tf%.2f s (${tf / tp}%.1f× from pruning)")
      // the columnar payoff, isolated: the SAME dsv2 scan (text decode
      // + length agg) vended as ColumnarBatch vs forced row mode
      val t4 = System.nanoTime()
      spark.read.format("graft-arrow").load(s"$out/t")
        .agg(sum(length(col("text")))).head
      val tc = (System.nanoTime() - t4) / 1e9
      val t5 = System.nanoTime()
      spark.read.format("graft-arrow").option("columnar", "false")
        .load(s"$out/t").agg(sum(length(col("text")))).head
      val trw = (System.nanoTime() - t5) / 1e9
      println(f"[arrowprofile]   text agg: dsv2-columnar $tc%.2f s vs " +
        f"dsv2-row $trw%.2f s (${trw / tc}%.1f× from columnar vend)")
      // the count(*) pushdown payoff: footer-metadata counting vs the
      // same count forced through a full scan (the filter blocks the
      // pushdown without changing the row set)
      val t6 = System.nanoTime()
      val c1 = spark.read.format("graft-arrow").load(s"$out/t").count()
      val tcnt = (System.nanoTime() - t6) / 1e9
      val t7 = System.nanoTime()
      val c2 = spark.read.format("graft-arrow").load(s"$out/t")
        .where(col("doc_id") =!= lit(-1L)).count()
      val tfull = (System.nanoTime() - t7) / 1e9
      require(c1 == rows && c2 == rows, s"count mismatch: $c1/$c2 vs $rows")
      println(f"[arrowprofile]   count(*): pushed $tcnt%.2f s vs " +
        f"scan-count $tfull%.2f s (${tfull / tcnt}%.1f× from footer counts)")
      // zone-map PLANNING cost at many files: a provably-empty filter
      // over a many-file export, planned from the directory manifest
      // (one read) vs per-file footers (manifest deleted)
      if (pass == 1) {
        // tiny parts force a many-file directory; on local FS footer
        // opens are cheap syscalls, so the manifest's win here is a
        // LOWER BOUND — object stores pay tens of ms per open
        ArrowInterchange.exportArrow(big, s"$out/many",
          maxPartBytes = 64L << 10)
        val nf = new java.io.File(s"$out/many").listFiles()
          .count(_.getName.endsWith(".arrows"))
        def planEmpty(): Double = {
          val t = System.nanoTime()
          val c = spark.read.format("graft-arrow").load(s"$out/many")
            .where(col("doc_id") < lit(-1L)).count()
          require(c == 0L)
          (System.nanoTime() - t) / 1e9
        }
        val tm = planEmpty()
        require(new java.io.File(s"$out/many/_stats.tsv").delete())
        val tf2 = planEmpty()
        println(f"[arrowprofile]   zone-map plan over $nf files: " +
          f"manifest $tm%.2f s vs per-file footers $tf2%.2f s " +
          f"(${tf2 / tm}%.1f× from the manifest)")
      }
    }
    graft.operators.Scratch.rm(new java.io.File(out))
    spark.stop()
  }
}
