package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-truncating materialization + scoped caching for the iterative
  * and multi-branch operators (dedup, clustering).
  *
  * Spark does not reuse a DataFrame subtree across branches of one plan
  * (each self-join side / verification join recomputes the lineage), and
  * iterative loops grow lineage without bound. Operators that branch over
  * an expensive frame persist it via [[withCached]]; loops and returned
  * results truncate via [[apply]].
  *
  * Checkpoint reliability: by default [[apply]] uses `localCheckpoint`
  * (executor-local blocks — fast, but NOT tolerant to executor loss: a
  * lost executor kills the job). For a long-running cluster deployment
  * set `graft.checkpoint.dir` to a durable filesystem path (HDFS/object
  * store) and [[apply]] switches to reliable `checkpoint()`, which
  * survives executor loss at the cost of a write to the checkpoint dir.
  */
object Materialize {

  /** Runtime conf key: durable checkpoint directory. Unset → fast
    * executor-local checkpoints (single-node / interactive default). */
  val CheckpointDirConf = "graft.checkpoint.dir"

  /** Runtime conf key, dev tooling only (PlanSnap/ExplainAudit): when
    * "true", [[apply]] is a pass-through so a returned frame keeps its
    * full lazy plan for `explain` — checkpointing otherwise collapses
    * every materialized operator to `Scan ExistingRDD`, hiding the
    * plan the artifact exists to show. Never set in the bench/verify
    * path: results are identical, but lineage-truncation (and its
    * protection of iterative loops) is part of the measured shape. */
  val PlanInspectConf = "graft.plan.inspect"

  /** Eagerly compute `df`, truncate its lineage, and return the
    * materialized frame (reliable when [[CheckpointDirConf]] is set). */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(PlanInspectConf).contains("true"))
      return df
    spark.conf.getOption(CheckpointDirConf) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** Persist `frames` (memory-with-disk-spill), force them in order —
    * list upstream frames first so later counts read the already-cached
    * ancestors — run `body`, materialize its result via [[apply]], then
    * unpersist. The result carries no reference to the cached frames, so
    * the unpersist is safe and nothing leaks into the session's cache
    * manager beyond the call.
    */
  def withCached(frames: DataFrame*)(body: => DataFrame): DataFrame = {
    frames.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    frames.foreach(_.count())
    try apply(body)
    finally frames.foreach(_.unpersist(blocking = false))
  }
}
