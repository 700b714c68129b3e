package graft

import java.io.IOException
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexStore

/** Cross-process writer lease on the index roots: mutual exclusion via
  * atomic create, TTL expiry with rename-as-mutex stealing, monotone
  * fence numbers, commit-point fencing in mark(), release-only-own.
  * "Processes" here are simulated at the filesystem level — the lease
  * state lives entirely in `_commits/`, so a direct acquireLease against
  * the same root IS what a second JVM does. */
class IndexLeaseSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft-lease").toString

  test("second writer blocks until timeout while the lease is held") {
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    val a = IndexStore.acquireLease(hfs, p, ttlMs = 60000, waitMs = 100)
    assert(a.fence == 1)
    val t0 = System.currentTimeMillis()
    val e = intercept[IOException] {
      IndexStore.acquireLease(hfs, p, ttlMs = 60000, waitMs = 400)
    }
    assert(System.currentTimeMillis() - t0 >= 380,
      "contender must wait out waitMs before failing")
    assert(e.getMessage.contains("write-locked") &&
      e.getMessage.contains("fence 1"))
  }

  test("an expired lease is stolen; fences stay monotone across steals") {
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    val a = IndexStore.acquireLease(hfs, p, ttlMs = 150, waitMs = 100)
    assert(a.fence == 1)
    Thread.sleep(250) // a's TTL elapses
    val b = IndexStore.acquireLease(hfs, p, ttlMs = 60000, waitMs = 2000)
    assert(b.fence == 2, "steal must bump the persisted fence")
    assert(IndexStore.currentLease(hfs, p).exists(_._1.token == b.token))
  }

  test("a superseded writer fails at its commit point with both fences") {
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    System.setProperty("graft.index.lease.ttlMs", "200")
    try {
      IndexStore.withLock(spark, root) {
        // this writer's lease expires while it stalls…
        Thread.sleep(350)
        // …and "another process" (FS-level acquire) takes over
        val b = IndexStore.acquireLease(hfs, p, ttlMs = 60000, waitMs = 2000)
        assert(b.fence == 2)
        // the stalled writer's next commit point must fail loudly
        val e = intercept[IOException] {
          IndexStore.mark(hfs, p, "g99", "should-not-commit")
        }
        assert(e.getMessage.contains("superseded by fence 2"),
          s"got: ${e.getMessage}")
        assert(IndexStore.markedIds(hfs, p, "g").isEmpty,
          "the fenced-off marker must not exist")
      }
    } finally System.clearProperty("graft.index.lease.ttlMs")
  }

  test("release deletes only the releaser's own lease") {
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    System.setProperty("graft.index.lease.ttlMs", "150")
    try {
      var stolen: Option[IndexStore.WriterLease] = None
      IndexStore.withLock(spark, root) {
        Thread.sleep(250)
        stolen = Some(IndexStore.acquireLease(hfs, p,
          ttlMs = 60000, waitMs = 2000))
      } // withLock's finally releases — but the lease is B's now
      assert(IndexStore.currentLease(hfs, p).map(_._1.token)
        == stolen.map(_.token),
        "the loser's release must not delete the stealer's fresh lease")
    } finally System.clearProperty("graft.index.lease.ttlMs")
  }

  test("withLock is reentrant per root and releases on exit") {
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    val got = IndexStore.withLock(spark, root) {
      IndexStore.withLock(spark, root) { // an inner step of one writer
        IndexStore.mark(hfs, p, "g0", "ok")
        42
      }
    }
    assert(got == 42)
    assert(IndexStore.currentLease(hfs, p).isEmpty,
      "lease must be released after the outer step exits")
    assert(IndexStore.markedIds(hfs, p, "g") == Seq(0L))
    // and the root is immediately acquirable again
    IndexStore.withLock(spark, root) { () }
  }

  test("concurrent same-JVM writers serialize: generations stay dense") {
    import java.util.concurrent.Executors
    val root = tmp()
    val (hfs, p) = IndexStore.fs(spark, root)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val tasks = (0 until 8).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = IndexStore.withLock(spark, root) {
            val next = IndexStore.markedIds(hfs, p, "g")
              .maxOption.map(_ + 1).getOrElse(0L)
            Thread.sleep(10) // widen the window a lost race would hit
            IndexStore.mark(hfs, p, s"g$next", s"gen-$next")
          }
        })
      }
      tasks.foreach(_.get())
      assert(IndexStore.markedIds(hfs, p, "g").sorted == (0L until 8L),
        "racing writers must produce dense, non-colliding generations")
    } finally pool.shutdown()
  }
}
