package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The transactional-table contract the streaming dual-sink writes
  * through — and the seam where a production deployment swaps the
  * built-in mini-log ([[GraftTable]]) for Delta Lake or Apache Iceberg.
  *
  * BASELINE.md names Delta/Iceberg as the target sink format; this build
  * is offline (no external dependencies resolve), so [[GraftTable]]
  * implements the same protocol on raw parquet + atomic rename. The
  * contract is deliberately the intersection both formats provide, so
  * the swap is a drop-in reimplementation of five methods:
  *
  * | contract method    | GraftTable (this build)             | Delta Lake                                   | Iceberg                                   |
  * |--------------------|-------------------------------------|----------------------------------------------|-------------------------------------------|
  * | `writeBatch`       | dynamic overwrite of `batch_id=N`   | `df.write.format("delta")` + `txnAppId/txnVersion` (idempotent writes) | `df.writeTo(t).overwritePartitions()` |
  * | `commit`           | atomic rename of `v<N>.json`        | implicit — the transaction log commit IS the write's atomic rename of `_delta_log/<v>.json` | snapshot commit (atomic metadata pointer swap) |
  * | `isCommitted`      | commit-file existence               | `txnVersion` read via `DeltaLog.getLastTxnVersion(appId)` | snapshot summary property lookup |
  * | `committedFiles`   | checkpoint manifest + newer commits | `DeltaLog.snapshot.allFiles` (AddFile actions after checkpoint parquet) | current snapshot's manifest list |
  * | `checkpoint`       | fold commits into a versioned `checkpoint.v<N>.json` | automatic every 10 commits (`_delta_log/<v>.checkpoint.parquet`) | `expire_snapshots` / `rewrite_manifests` |
  * | `read`             | read exactly the committed files    | `spark.read.format("delta")` (log-driven file listing) | `spark.read.format("iceberg")` |
  *
  * Beyond this contract, [[GraftTable]] also provides the table-format
  * features a production corpus store leans on — time travel
  * (`readAsOf`, Delta's `versionAsOf`, surviving checkpoint folding),
  * additive schema evolution with Delta-style enforcement (type changes
  * and drops abort the commit; added columns merge, old files read them
  * as null), `vacuum` of unreferenced crash-window files behind a TTL,
  * and lost-file detection on replayed commits. What remains exclusive
  * to the real formats: multi-writer OPTIMISTIC concurrency (the
  * mini-log detects a destructive concurrent writer but cannot arbitrate
  * one — it is single-writer-per-batch by contract) and row-level
  * deletes/updates under concurrent readers. The engine never relies on
  * either — every caller goes through this trait's single-writer,
  * batch-granular protocol — which is exactly what makes the swap safe.
  *
  * To deploy against Delta: add the `delta-spark` dependency, implement
  * this trait with the mappings above (one ~100-line object), and pass
  * it to the pipeline in place of [[GraftTableFormat]]. No operator or
  * pipeline code changes — [[graft.streaming.BidPipeline.exportBatch]]
  * only speaks this contract.
  */
trait TableFormat {

  /** True when `batchId` is already durably committed under `root` —
    * the whole batch (all sinks) must then be skipped on replay. */
  def isCommitted(spark: SparkSession, root: String, batchId: Long): Boolean

  /** Atomically publish every file batch `batchId` landed under `root`
    * (across all sinks); idempotent on replay. Returns the published
    * root-relative file list. */
  def commit(spark: SparkSession, root: String, batchId: Long): Seq[String]

  /** Every committed root-relative data file (snapshot listing). */
  def committedFiles(spark: SparkSession, root: String): Seq[String]

  /** Fold commit history through `throughBatchId` into one manifest so
    * snapshot listing stays O(recent commits). */
  def checkpoint(spark: SparkSession, root: String, throughBatchId: Long): Unit

  /** Snapshot read of one sink under `root`: exactly the committed
    * files; in-flight batches are invisible. */
  def read(spark: SparkSession, root: String, sink: String): DataFrame
}

/** The built-in implementation — delegates to [[GraftTable]]'s
  * parquet + atomic-rename mini-log (the offline stand-in for
  * Delta/Iceberg; see the [[TableFormat]] swap table). */
object GraftTableFormat extends TableFormat {
  override def isCommitted(spark: SparkSession, root: String,
                           batchId: Long): Boolean =
    GraftTable.isCommitted(spark, root, batchId)
  override def commit(spark: SparkSession, root: String,
                      batchId: Long): Seq[String] =
    GraftTable.commit(spark, root, batchId)
  override def committedFiles(spark: SparkSession, root: String): Seq[String] =
    GraftTable.committedFiles(spark, root)
  override def checkpoint(spark: SparkSession, root: String,
                          throughBatchId: Long): Unit =
    GraftTable.checkpoint(spark, root, throughBatchId)
  override def read(spark: SparkSession, root: String, sink: String): DataFrame =
    GraftTable.read(spark, root, sink)
}
