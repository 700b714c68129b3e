package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Materialize}

/** Checkpoint-reliability seam: the iterative cluster loop must produce
  * identical results whether its per-round materialization uses fast
  * executor-local checkpoints (default) or durable reliable checkpoints
  * (`graft.checkpoint.dir` set — the cluster-deployment mode that
  * survives executor loss).
  */
class MaterializeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cluster loop under reliable checkpointing: same results, files on disk") {
    // collectCap=0 forces the DISTRIBUTED loop (the adaptive union-find
    // path needs no checkpoints — it is tested for parity below)
    System.setProperty("graft.clusters.collectCap", "0")
    try {
      val localResult = Dedup.clusters(Dedup.minhashLsh(spark, sf0001)).collect()

      val ckptDir = Files.createTempDirectory("graft-reliable-ckpt").toString
      spark.conf.set(Materialize.CheckpointDirConf, ckptDir)
      try {
        val reliableResult =
          Dedup.clusters(Dedup.minhashLsh(spark, sf0001)).collect()
        assert(reliableResult.sameElements(localResult),
          "reliable-checkpoint run must match the localCheckpoint run")
        // the loop actually wrote through the durable dir
        def countFiles(f: java.io.File): Int =
          if (f.isFile) 1
          else Option(f.listFiles()).map(_.map(countFiles).sum).getOrElse(0)
        assert(countFiles(new java.io.File(ckptDir)) > 0,
          s"no reliable checkpoint files written under $ckptDir")
      } finally spark.conf.unset(Materialize.CheckpointDirConf)
    } finally System.clearProperty("graft.clusters.collectCap")
  }

  test("adaptive union-find path matches the distributed loop exactly") {
    val pairs = Dedup.minhashLsh(spark, sf0001)
    val adaptive = Dedup.clusters(pairs) // tiny edge list → driver path
    System.setProperty("graft.clusters.collectCap", "0")
    val distributed =
      try Dedup.clusters(pairs)
      finally System.clearProperty("graft.clusters.collectCap")
    assert(adaptive.schema == distributed.schema,
      s"schema drift: ${adaptive.schema} vs ${distributed.schema}")
    assert(adaptive.collect().toSeq == distributed.collect().toSeq)
  }

  test("withCached leaves nothing registered in the cache manager") {
    val before = spark.sharedState.cacheManager.isEmpty
    val df = graft.sources.Tables.documents(spark, sf0001).limit(10)
    val out = Materialize.withCached(df) { df.select("doc_id") }
    assert(out.count() == 10)
    assert(before == spark.sharedState.cacheManager.isEmpty,
      "withCached must unpersist everything it persisted")
  }
}
