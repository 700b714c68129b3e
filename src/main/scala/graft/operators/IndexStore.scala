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
  * Writer arbitration, two layers under one chokepoint ([[withLock]]):
  *  - same-JVM: one interned monitor per normalized root serializes
  *    concurrent build/merge/compact calls;
  *  - cross-process: a WRITER LEASE under `_commits/_writer.lease`,
  *    acquired by HCFS atomic create-no-overwrite, carrying a
  *    monotonically increasing FENCE number and expiring TTL ms after
  *    the file's modification time. Contenders wait, then steal an
  *    expired lease by RENAME (rename-as-mutex: exactly one stealer's
  *    rename succeeds; create-after-delete would let two stealers
  *    delete each other's fresh lease). [[mark]] — the single commit
  *    point every index step publishes through — re-reads the lease
  *    before each publish: a writer that lost its lease (stalled past
  *    the TTL, then superseded) fails its commit with the two fence
  *    numbers instead of silently interleaving generations with the
  *    new holder. The residual window (steal between a winner's check
  *    and its rename) is milliseconds against a TTL of minutes, and
  *    errs as a double-commit RETRY failure, never silent corruption:
  *    the superseding writer re-runs the same generation id wholesale.
  *    TTL must exceed the longest maintenance op; operations outliving
  *    it fail loudly at their commit point and are safe to re-run.
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
    // fencing: if this JVM holds a writer lease for the root, it must
    // STILL hold it at every commit point — a writer that stalled past
    // the TTL and was superseded fails here, before publishing a marker
    // that would interleave with the new holder's generations
    activeLeases.get(hfs.makeQualified(root).toString)
      .foreach(l => requireLeaseHeld(hfs, root, l))
    markUnfenced(hfs, root, name, content)
  }

  /** [[mark]] without the lease check — for the lease machinery itself
    * (the fence bump runs under a lease that is not yet, or not, this
    * JVM's registered claim). */
  private def markUnfenced(hfs: FileSystem, root: Path, name: String,
                           content: String): Unit = {
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
    else Some(HadoopText.readUtf8(hfs, p))
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

  /** Wipe an index root for a fresh build WITHOUT destroying the writer
    * arbitration: everything goes except the live lease file (the
    * building writer is holding it — deleting it would hand the root to
    * a contender mid-build) and the `_fence` marker (fence numbers stay
    * monotone across rebuilds, so a pre-rebuild zombie still reads as
    * superseded). Build steps must call this, never a bare
    * [[deleteTree]] of the root. */
  def resetRoot(hfs: FileSystem, root: Path): Unit = {
    if (!hfs.exists(root)) return
    hfs.listStatus(root).foreach { st =>
      if (st.getPath.getName != CommitsDir) deleteTree(hfs, st.getPath)
    }
    val commits = new Path(root, CommitsDir)
    if (hfs.exists(commits))
      hfs.listStatus(commits).foreach { st =>
        val n = st.getPath.getName
        if (n != LeaseName && !n.startsWith(FencePrefix))
          deleteTree(hfs, st.getPath)
      }
  }

  // ------------------------------------------------------ writer lease

  /** Lease file name under `_commits/`. Dot-free so debugging `ls`
    * shows it, but [[markedIds]]' numeric parse skips it. */
  private[graft] val LeaseName = "_writer.lease"
  // fence numbers are ALLOCATED, not counted: each acquisition claims
  // `_fence.N` by atomic create-no-overwrite, so two holders can never
  // share a fence and no stalled writer can regress the counter by
  // overwriting a marker (a content-counter bump is delete+rename —
  // a loser waking from a GC pause could write an old value over a
  // newer one). Files below the new claim are swept on allocation, so
  // the set stays O(contenders), not O(history).
  private val FencePrefix = "_fence."

  /** TTL must exceed the longest build/merge/compact against the root;
    * an op outliving it can lose the lease and will fail loudly at its
    * next commit point (safe to re-run). Overridable for tests and for
    * slow maintenance via system property. */
  private def defaultTtlMs: Long =
    sys.props.get("graft.index.lease.ttlMs").map(_.toLong)
      .getOrElse(15L * 60 * 1000)
  private def defaultWaitMs: Long =
    sys.props.get("graft.index.lease.waitMs").map(_.toLong)
      .getOrElse(10L * 60 * 1000)

  /** One writer's claim on an index root. `fence` is a UNIQUE number
    * (allocated by atomic create of `_fence.N`) ordered by ALLOCATION
    * time — a claimant stalled between allocating and winning the
    * lease can hold a lower fence than an intervening holder, so fence
    * order is diagnostic, not the safety mechanism: validity is always
    * the token comparison in [[requireLeaseHeld]]. `ttlMs` rides in
    * the file so contenders use the HOLDER's TTL, not their own.
    * Expiry is measured from the lease FILE's modification time — the
    * filesystem's clock, not a writer-embedded timestamp, so
    * single-FS deployments don't depend on writer clock agreement
    * (cross-machine skew only shifts the steal point by the skew,
    * against a TTL of minutes). */
  private[graft] final case class WriterLease(token: String, fence: Long,
                                              ttlMs: Long, owner: String) {
    def serialized: String = s"$token $fence $ttlMs $owner"
  }

  private def parseLease(s: String): Option[WriterLease] =
    s.split(" ", 4) match {
      case Array(tok, f, t, o) if f.forall(_.isDigit) && t.forall(_.isDigit) =>
        Some(WriterLease(tok, f.toLong, t.toLong, o))
      case _ => None
    }

  private def leasePath(root: Path) =
    new Path(new Path(root, CommitsDir), LeaseName)

  /** The current lease with its expiry instant, None when absent. An
    * unparsable lease (a holder between create and write, or a torn
    * read) is reported as a fresh default-TTL claim — conservative:
    * contenders wait rather than steal a lease being born. */
  private[graft] def currentLease(hfs: FileSystem,
                                  root: Path): Option[(WriterLease, Long)] = {
    val p = leasePath(root)
    try {
      val st = hfs.getFileStatus(p)
      // full drain (HadoopText): torn lease content would make a
      // healthy writer's own fencing check fail spuriously
      val content = HadoopText.readUtf8(hfs, p)
      val lease = parseLease(content).getOrElse(
        WriterLease("<unreadable>", -1L, defaultTtlMs, "<unknown>"))
      Some((lease, st.getModificationTime + lease.ttlMs))
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Acquire the cross-process writer lease: atomic create-no-overwrite
    * wins; a present lease is waited on until `waitMs`, except an
    * EXPIRED one, which is broken by rename (exactly one stealer's
    * rename succeeds — create-after-delete would let two stealers
    * delete each other's fresh lease). The fence number is bumped and
    * persisted before the lease is returned, so every acquisition in
    * history is totally ordered even across steals. */
  private[graft] def acquireLease(hfs: FileSystem, root: Path,
                                  ttlMs: Long = defaultTtlMs,
                                  waitMs: Long = defaultWaitMs): WriterLease = {
    val dir = new Path(root, CommitsDir)
    if (!hfs.exists(dir)) hfs.mkdirs(dir)
    val p = leasePath(root)
    val deadline = System.currentTimeMillis() + waitMs
    var backoffMs = 50L
    while (true) {
      currentLease(hfs, root) match {
        case None =>
          // allocate the fence BEFORE creating the lease that carries
          // it: unique by atomic create, and allocation-ordered (a
          // claimant stalled between here and winning the lease can
          // hold a lower fence than an intervening holder — see the
          // WriterLease doc; safety is the token check, not the
          // number). A crash between the two leaves a harmless gap.
          val fence = allocateFence(hfs, root)
          val lease = WriterLease(java.util.UUID.randomUUID().toString,
            fence, ttlMs,
            s"${ProcessHandle.current().pid()}@${
              java.net.InetAddress.getLocalHost.getHostName}")
          val won =
            try {
              val out = hfs.create(p, false) // atomic fail-if-present
              try out.write(lease.serialized.getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
              true
            } catch { case _: java.io.IOException => false }
          if (won) return lease
        case Some((stale, expiresAt))
            if System.currentTimeMillis() > expiresAt =>
          // rename-as-mutex steal: the loser's rename fails (source
          // gone) and it loops back to the create race
          val broken = new Path(dir, s".$LeaseName.broken-${
            java.util.UUID.randomUUID()}")
          if (hfs.rename(p, broken)) hfs.delete(broken, false)
        case Some((held, expiresAt)) =>
          if (System.currentTimeMillis() >= deadline)
            throw new java.io.IOException(
              s"index root $root is write-locked by ${held.owner} " +
                s"(fence ${held.fence}, expires in " +
                s"${math.max(0, expiresAt - System.currentTimeMillis())} ms) " +
                "— another process is building/merging this index; " +
                "retry later or raise graft.index.lease.waitMs")
          Thread.sleep(math.min(backoffMs,
            math.max(1, deadline - System.currentTimeMillis())))
          backoffMs = math.min(backoffMs * 2, 2000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Claim the next fence number: atomic create of `_fence.N` for the
    * first free N above every existing claim. The create is the
    * allocation — no two claimants can hold the same N, and a stalled
    * claimant resuming an old loop skips occupied slots, so its claim
    * is still above everything that existed when it landed. Older
    * fence files are swept after the claim (max stays ours). */
  private def allocateFence(hfs: FileSystem, root: Path): Long = {
    val dir = new Path(root, CommitsDir)
    // seed above the pre-allocation scheme's content counter too (a
    // `_fence` marker holding the count), so fence ordering survives
    // the upgrade of an existing root; the legacy marker is retired
    // once a fence file exists above it
    val legacy = markContent(hfs, root, "_fence")
      .flatMap(c => scala.util.Try(c.toLong).toOption)
    var n = math.max(
      markedIds(hfs, root, FencePrefix).maxOption.getOrElse(0L),
      legacy.getOrElse(0L)) + 1
    while (true) {
      val claimed =
        try { hfs.create(new Path(dir, s"$FencePrefix$n"), false).close(); true }
        catch { case _: java.io.IOException => false }
      if (claimed) {
        markedIds(hfs, root, FencePrefix).filter(_ < n).foreach(o =>
          unmark(hfs, root, s"$FencePrefix$o"))
        if (legacy.isDefined) unmark(hfs, root, "_fence")
        return n
      }
      n += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fail if `lease` is no longer the root's current lease — called by
    * [[mark]] at every commit point (fencing). */
  private def requireLeaseHeld(hfs: FileSystem, root: Path,
                               lease: WriterLease): Unit =
    currentLease(hfs, root) match {
      case Some((cur, _)) if cur.token == lease.token => ()
      case Some((cur, _)) => throw new java.io.IOException(
        s"writer lease for $root lost: this writer's fence " +
          s"${lease.fence} was superseded by fence ${cur.fence} " +
          s"(${cur.owner}) — the operation stalled past the lease TTL " +
          "and was taken over; its work is safe to re-run")
      case None => throw new java.io.IOException(
        s"writer lease for $root lost (fence ${lease.fence}): the lease " +
          "expired and was released — the operation is safe to re-run")
    }

  /** Release only OUR lease: a stealer may already own the file, and
    * deleting their fresh claim would re-open the race we just lost. */
  private def releaseLease(hfs: FileSystem, root: Path,
                           lease: WriterLease): Unit =
    currentLease(hfs, root) match {
      case Some((cur, _)) if cur.token == lease.token =>
        hfs.delete(leasePath(root), false); ()
      case _ => ()
    }

  private val monitors =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  /** Roots this JVM currently holds a writer lease for — consulted by
    * [[mark]] for commit-point fencing. At most one writer per root is
    * inside the monitor, so plain get/put under it is race-free. */
  private val activeLeases =
    scala.collection.concurrent.TrieMap.empty[String, WriterLease]

  /** Serialize writers against one index root — same-JVM via an
    * interned monitor, cross-process via the writer lease (acquired
    * after the monitor, released before it). The key is the FULLY
    * QUALIFIED path (scheme + authority resolved by the root's
    * FileSystem), so `file:///data/idx` and `/data/idx` spellings of
    * one physical root share a claim instead of racing. Reentrant:
    * a writer step that invokes another step on the same root runs it
    * under the already-held claim. */
  def withLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val (hfs, p) = fs(spark, root)
    val key = hfs.makeQualified(p).toString
    monitors.getOrElseUpdate(key, new Object).synchronized {
      if (activeLeases.contains(key)) body // reentrant inner step
      else {
        val lease = acquireLease(hfs, p)
        activeLeases.put(key, lease)
        try body
        finally { activeLeases.remove(key); releaseLease(hfs, p, lease) }
      }
    }
  }

  /** Submit independent Spark actions concurrently, wait for all, and
    * return their results in call order — the index artifacts written
    * (or gate frames computed) inside one step have no mutual
    * dependency, so the step costs max(job) instead of sum(job).
    * Failures propagate only after every job settles, so no work is
    * left running past the call. Each call owns a dedicated pool sized
    * to its action count (daemon threads, shut down on exit): actions
    * block on Spark jobs, and parking them on a shared bounded pool —
    * the global ExecutionContext — would deadlock nested uses when the
    * pool's threads are all holding outer actions. */
  def inParallel[T](actions: (() => T)*): Seq[T] = {
    if (actions.isEmpty) return Seq.empty
    if (actions.sizeIs == 1) return Seq(actions.head())
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      actions.size,
      (r: Runnable) => {
        val t = new Thread(r, "graft-index-parallel")
        t.setDaemon(true); t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = actions.map(a => Future(a()))
      val settled = Future.traverse(fs)(f =>
        f.map(Right(_): Either[Throwable, T]).recover { case t => Left(t) })
      val results = Await.result(settled, Duration.Inf)
      results.collectFirst { case Left(t) => t }.foreach(throw _)
      results.collect { case Right(v) => v }
    } finally pool.shutdown()
  }
}
