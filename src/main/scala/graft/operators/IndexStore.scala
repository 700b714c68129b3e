package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared Hadoop-FS plumbing for the persisted index artifacts
  * ([[MinhashIndex]], [[DecontamIndex]]): explicit commit markers plus
  * write-new-then-retire versioning — the same crash discipline the
  * table format's versioned checkpoints use (`GraftTable.checkpoint`).
  *
  * Everything goes through Hadoop [[FileSystem]], never `java.io.File`
  * or `java.nio.file`: a 100 TB index lives on HDFS or an object store,
  * where local-file renames simply don't exist. Commit markers are
  * explicit empty files under `_commits/` (not Spark's `_SUCCESS`,
  * which a committer conf can disable): a marker either exists
  * completely or not at all, so "marker present" is the atomic publish
  * point on every HCFS — no rename required, which also makes the
  * scheme object-store-safe (S3 rename is copy+delete, not atomic).
  *
  * Crash contract both indexes build on:
  *  - data files for a version/generation are written FIRST, into a
  *    directory no reader resolves yet;
  *  - the marker is created LAST — before it, a crash leaves only
  *    invisible orphan files (re-running the same step overwrites
  *    them);
  *  - retiring superseded artifacts happens only AFTER the replacement
  *    is marked — a crash between the two leaves two committed
  *    versions and readers pick the newest;
  *  - retires keep ONE grace version: a reader resolves the newest
  *    version and then scans it lazily, so the version it chose must
  *    survive until the NEXT maintenance pass (the same grace
  *    discipline as table-format vacuum). The residual race — a scan
  *    outliving two consecutive maintenance passes — fails loudly
  *    with a missing-file error, never with wrong data.
  *
  * Same-JVM writer arbitration: [[withLock]] interns one monitor per
  * normalized root so concurrent build/merge/compact calls against the
  * same index serialize instead of interleaving their write steps —
  * the per-root monitor the table format's commit log got, applied to
  * the index artifacts. (Cross-JVM writers need an external
  * coordinator, exactly as with the table format.)
  */
private[graft] object IndexStore {

  private val CommitsDir = "_commits"

  def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Publish marker `name` — the atomic commit point of a step.
    * `content` (optional) rides inside the marker, e.g. a batch
    * fingerprint for retry detection.
    *
    * Written to a dot-temp name first, then renamed into place: a plain
    * `create(name)` makes the marker VISIBLE (zero-length) before its
    * content lands, so a crash mid-write would commit a generation
    * without its retry token — the next delayed retry of that batch
    * would not match the (empty) fingerprint and double-commit it. A
    * crash anywhere in the temp path leaves the marker absent =
    * uncommitted, which errs in the safe direction (the retry re-merges
    * and overwrites the orphan dirs wholesale). Dot-prefixed temps are
    * invisible to [[markedIds]]' prefix filters. */
  def mark(hfs: FileSystem, root: Path, name: String,
           content: String = ""): Unit = {
    val dir = new Path(root, CommitsDir)
    if (!hfs.exists(dir)) hfs.mkdirs(dir)
    val tmp = new Path(dir, s".$name.tmp")
    val out = hfs.create(tmp, true)
    try if (content.nonEmpty)
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(dir, name)
    hfs.delete(dest, false) // re-mark (e.g. compact retry) replaces
    if (!hfs.rename(tmp, dest))
      throw new java.io.IOException(
        s"cannot publish marker $dest — rename from $tmp refused")
  }

  /** The marker's stored content, None when the marker is absent. */
  def markContent(hfs: FileSystem, root: Path,
                  name: String): Option[String] = {
    val p = new Path(new Path(root, CommitsDir), name)
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  def unmark(hfs: FileSystem, root: Path, name: String): Unit = {
    hfs.delete(new Path(new Path(root, CommitsDir), name), false)
    ()
  }

  /** Numeric ids of markers named `<prefix><id>` under the root. */
  def markedIds(hfs: FileSystem, root: Path, prefix: String): Seq[Long] = {
    val dir = new Path(root, CommitsDir)
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
  }

  /** Sorted committed generation ids (markers `g<G>`).
    *
    * DENSITY INVARIANT: generation ids are always assigned as
    * `committedGens.max + 1` and a crashed merge's orphan is retried at
    * the SAME id (its dirs are overwritten wholesale), so the committed
    * ids are exactly `0..max` with no holes, and the only id a physical
    * orphan dir can carry is `max + 1`. Readers therefore prune
    * uncommitted (crashed) dirs with the O(1) range predicate
    * `gen <= max` instead of an `isin` literal list that would grow by
    * one literal per merged batch forever (a daily-ingest index holds
    * thousands of generations after a few years — the markers
    * themselves are tiny files, but a thousand-literal IN predicate in
    * every query plan is not). */
  def committedGens(spark: SparkSession, root: String): Seq[Long] = {
    val (hfs, p) = fs(spark, root)
    markedIds(hfs, p, "g").sorted
  }

  /** The newest committed id of marker family `prefix`, failing loudly
    * when none is committed — a crashed build must never probe
    * half-written artifacts. */
  def requireVersion(spark: SparkSession, root: String, prefix: String,
                     what: String): Long = {
    val (hfs, p) = fs(spark, root)
    val vs = markedIds(hfs, p, prefix)
    require(vs.nonEmpty,
      s"no committed $what under $root — interrupted build? re-run build")
    vs.max
  }

  /** True when batch fingerprint `fp` rides inside ANY committed
    * generation marker. Retry detection must scan every generation, not
    * just the newest: an at-least-once orchestrator can re-deliver an
    * OLD batch after newer ones landed, and re-committing it would
    * silently double-count its rows in every subsequent query. */
  def generationCommitted(spark: SparkSession, root: String,
                          fp: String): Boolean = {
    val (hfs, p) = fs(spark, root)
    markedIds(hfs, p, "g")
      .exists(g => markContent(hfs, p, s"g$g").contains(fp))
  }

  /** Order-independent 64-bit digest of a batch's (id, payload) rows
    * plus its row count — the [[generationCommitted]] retry token.
    * `bit_xor`, not `sum`: order-independent AND overflow-free under
    * ANSI mode. */
  def batchFingerprint(df: org.apache.spark.sql.DataFrame,
                       idCol: String, payloadCol: String): String = {
    import org.apache.spark.sql.functions._
    val r = df.select(
      count(lit(1)).as("n"),
      expr(s"bit_xor(xxhash64($idCol, $payloadCol))").as("h")).head()
    s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  /** Physical `gen=` partition dirs under `dir` — 1 right after build
    * or compact (the common serving state), one per landed batch
    * between maintenance passes. NOT `committedGens.size`: compact
    * folds the data but keeps the generation markers (they carry the
    * retry fingerprints), so only the store layout says whether a
    * query-time re-fold over merged generations is still needed. */
  def physicalGens(spark: SparkSession, dir: String): Int = {
    val (hfs, p) = fs(spark, dir)
    if (!hfs.exists(p)) 0
    else hfs.listStatus(p).count(_.getPath.getName.startsWith("gen="))
  }

  /** Sweep orphan `gen=` dirs under `dir` left by crashed, never-retried
    * merges — everything not in `committed` is unreachable (readers
    * prune to `gen <= committedMax` and the density invariant pins any
    * orphan at `max + 1`). */
  def sweepOrphanGens(hfs: FileSystem, dir: Path,
                      committed: Set[Long]): Unit =
    if (hfs.exists(dir))
      hfs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        val orphan = n.startsWith("gen=") &&
          scala.util.Try(n.stripPrefix("gen=").toLong).toOption
            .exists(g => !committed.contains(g))
        if (orphan) deleteTree(hfs, st.getPath)
      }

  /** Retire superseded version trees of marker family `prefix` (tree
    * dir name == marker name, e.g. `store.v3`): unmark everything older
    * than `graceV` — the immediately-previous version is KEPT as a
    * grace copy for readers that resolved it just before the publish —
    * then sweep EVERY unmarked version tree, not just the ones just
    * unmarked (a crash between a past retire's unmark and delete leaves
    * an orphan tree no later explicit delete would target). */
  def retireVersions(spark: SparkSession, root: String, prefix: String,
                     graceV: Long): Unit = {
    val (hfs, p) = fs(spark, root)
    markedIds(hfs, p, prefix).filter(_ < graceV)
      .foreach(v => unmark(hfs, p, s"$prefix$v"))
    val live = markedIds(hfs, p, prefix).toSet
    hfs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val orphan = n.startsWith(prefix) &&
        scala.util.Try(n.stripPrefix(prefix).toLong).toOption
          .exists(v => !live.contains(v))
      if (orphan) deleteTree(hfs, st.getPath)
    }
  }

  def deleteTree(hfs: FileSystem, p: Path): Unit = {
    hfs.delete(p, true)
    ()
  }

  private val monitors =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Serialize same-JVM writers against one index root. The monitor is
    * keyed on the FULLY QUALIFIED path (scheme + authority resolved by
    * the root's FileSystem), so `file:///data/idx` and `/data/idx`
    * spellings of one physical root share a monitor instead of racing. */
  def withLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val (hfs, p) = fs(spark, root)
    monitors.getOrElseUpdate(
      hfs.makeQualified(p).toString, new Object).synchronized(body)
  }

  /** Submit independent Spark actions concurrently, wait for all, and
    * return their results in call order — the index artifacts written
    * (or gate frames computed) inside one step have no mutual
    * dependency, so the step costs max(job) instead of sum(job).
    * Failures propagate only after every job settles, so no work is
    * left running past the call. */
  def inParallel[T](actions: (() => T)*): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = actions.map(a => Future(a()))
    val settled = Future.traverse(fs)(f =>
      f.map(Right(_): Either[Throwable, T]).recover { case t => Left(t) })
    val results = Await.result(settled, Duration.Inf)
    results.collectFirst { case Left(t) => t }.foreach(throw _)
    results.collect { case Right(v) => v }
  }
}
