package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DirJsonTableFormat, GraftTableFormat, TableFormat}

/** The transactional-table CONTRACT, written only against
  * [[graft.sources.TableFormat]] — the executable form of the
  * documented Delta/Iceberg swap seam. Any implementation a deployment
  * drops in (the built-in mini-log, the dirjson reference, a real
  * `delta-spark` adapter) extends this suite and must pass it
  * unchanged; the pipeline only speaks this protocol, so a green run
  * here is the whole safety argument for the swap.
  *
  * Asserted protocol, method by method:
  *  - crash window: files landed under `batch_id=N` with no commit are
  *    INVISIBLE to `read`/`committedFiles`/`isCommitted`;
  *  - `commit` publishes atomically across sinks and returns the
  *    root-relative file list;
  *  - replayed `commit` is idempotent: same file list, no duplication,
  *    no new state;
  *  - `read` returns exactly the committed rows per sink;
  *  - `checkpoint` is invisible to readers: same rows, same files.
  */
abstract class TableFormatContractSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The implementation under contract. */
  def format: TableFormat
  /** Display name for test labels. */
  def formatName: String

  private def tmp(): String =
    Files.createTempDirectory(s"tfc-$formatName").toString

  private def land(root: String, sink: String, batchId: Long,
                   rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$sink/batch_id=$batchId")
  }

  test(s"[$formatName] crash window: landed-but-uncommitted files are " +
    "invisible to every read surface") {
    val root = tmp()
    land(root, "docs", 0, Seq((1L, "a")))
    format.commit(spark, root, 0)
    // batch 1 lands but never commits (the crash window)
    land(root, "docs", 1, Seq((2L, "b")))
    assert(!format.isCommitted(spark, root, 1))
    assert(format.isCommitted(spark, root, 0))
    assert(format.committedFiles(spark, root)
      .forall(_.contains("batch_id=0")))
    val rows = format.read(spark, root, "docs")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L), s"uncommitted batch leaked: $rows")
  }

  test(s"[$formatName] commit publishes atomically across sinks and " +
    "returns the root-relative file list") {
    val root = tmp()
    land(root, "raw", 0, Seq((1L, "a"), (2L, "b")))
    land(root, "agg", 0, Seq((10L, "x")))
    val published = format.commit(spark, root, 0)
    assert(published.nonEmpty)
    assert(published.forall(f => f.startsWith("raw/") || f.startsWith("agg/")))
    assert(published.exists(_.startsWith("raw/")) &&
      published.exists(_.startsWith("agg/")), published)
    assert(published.forall(_.endsWith(".parquet")))
    assert(format.isCommitted(spark, root, 0))
    assert(format.committedFiles(spark, root).toSet == published.toSet)
    assert(format.read(spark, root, "raw").count() == 2)
    assert(format.read(spark, root, "agg").count() == 1)
  }

  test(s"[$formatName] replayed commit is idempotent: same files, no " +
    "duplication") {
    val root = tmp()
    land(root, "docs", 0, Seq((1L, "a")))
    val first = format.commit(spark, root, 0)
    val replay = format.commit(spark, root, 0)
    assert(replay == first)
    assert(format.committedFiles(spark, root).size == first.size)
    assert(format.read(spark, root, "docs").count() == 1)
  }

  test(s"[$formatName] multi-batch snapshot: read sees every committed " +
    "batch, exactly once") {
    val root = tmp()
    land(root, "docs", 0, Seq((1L, "a")))
    format.commit(spark, root, 0)
    land(root, "docs", 1, Seq((2L, "b"), (3L, "c")))
    format.commit(spark, root, 1)
    val ids = format.read(spark, root, "docs")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test(s"[$formatName] checkpoint is invisible to readers: same rows, " +
    "same committed files, later commits still land") {
    val root = tmp()
    (0L until 4L).foreach { b =>
      land(root, "docs", b, Seq((b, s"doc-$b")))
      format.commit(spark, root, b)
    }
    val filesBefore = format.committedFiles(spark, root).toSet
    format.checkpoint(spark, root, 3L)
    assert(format.committedFiles(spark, root).toSet == filesBefore)
    assert((0L until 4L).forall(format.isCommitted(spark, root, _)))
    val ids = format.read(spark, root, "docs")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 4L).toSeq)
    // the log keeps accepting commits after a checkpoint
    land(root, "docs", 4, Seq((4L, "doc-4")))
    format.commit(spark, root, 4)
    assert(format.read(spark, root, "docs").count() == 5)
  }

  test(s"[$formatName] commit of an empty batch publishes an empty " +
    "file list and still registers as committed") {
    val root = tmp()
    land(root, "docs", 0, Seq((1L, "a")))
    format.commit(spark, root, 0)
    val published = format.commit(spark, root, 7) // nothing landed
    assert(published.isEmpty)
    assert(format.isCommitted(spark, root, 7))
    assert(format.read(spark, root, "docs").count() == 1)
  }
}

/** The built-in mini-log under the shared contract. */
class GraftTableFormatContractSpec extends TableFormatContractSpec {
  override def format: TableFormat = GraftTableFormat
  override def formatName: String = "graft"
}

/** The dirjson reference implementation under the same contract — the
  * proof that the seam admits a second, structurally different
  * implementation without pipeline changes. */
class DirJsonTableFormatContractSpec extends TableFormatContractSpec {
  override def format: TableFormat = DirJsonTableFormat
  override def formatName: String = "dirjson"
}
