package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Adversarial hot-key spec: 2000 byte-identical documents all landing
  * in the same band buckets / text group. Uncapped, every self-join
  * would push ~2M pair rows through single shuffle keys; with the
  * clique/star cap each operator must finish with bounded per-task
  * input and emit one spanning star per duplicate cluster.
  */
class DedupHotKeySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-hotkey").toString
    val dupes = (0L until 2000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val distinct = (2000L until 2005L).map(i =>
      (i, s"completely unrelated document number $i with its own words ${i * 31}"))
    (dupes ++ distinct).toDF("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Max (input + shuffle-read) records over all tasks of `action`. */
  private def maxTaskRecords(action: => Unit): Long = {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
          max.getAndUpdate(c => math.max(c, r))
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { action; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(l)
    max.get()
  }

  // the uncapped pair space is ~2M rows on ONE key; anything close to
  // that flowing through a task means the cap is not working
  private val TaskRecordBound = 100000L

  test("minhash LSH: hot band buckets emit a spanning star, bounded tasks") {
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRec = maxTaskRecords {
      rows = Dedup.minhashLsh(spark, dir).collect()
    }
    assert(rows.length == 1999, s"star over 2000 dupes, got ${rows.length}")
    assert(rows.forall(r => r.getLong(0) == 0L), "star center must be the min id")
    assert(rows.forall(_.getDouble(2) == 1.0))
    assert(maxRec < TaskRecordBound, s"a task saw $maxRec records")
  }

  test("exact dedup: hot content hash partial-aggregates, bounded tasks") {
    // one text owning ~all rows must cross the shuffle as one partial
    // (count, min) row per map task — never 2000 rows on one reduce
    // key. count/min are algebraic, so Spark's hash aggregate combines
    // map-side; this pins that plan property against regression (an
    // orderBy-window or collect_list rewrite would blow the bound).
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRec = maxTaskRecords {
      rows = Dedup.exact(spark, dir).collect()
    }
    assert(rows.length == 6, s"1 hot + 5 distinct groups, got ${rows.length}")
    val hot = rows.filter(_.getLong(1) == 2000L)
    assert(hot.length == 1 && hot.head.getLong(2) == 0L,
      "hot group: 2000 copies, keeper = min doc_id")
    assert(rows.filter(_.getLong(1) == 1L).length == 5)
    // input side reads ~2005/4 rows per task; a missing map-side
    // combine would push >=2000 shuffle rows through one task
    assert(maxRec < 1500, s"a task saw $maxRec records — partial agg lost")
  }

  test("simhash: hot band buckets emit a spanning star, bounded tasks") {
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRec = maxTaskRecords {
      rows = Dedup.simhash(spark, dir).collect()
    }
    assert(rows.length == 1999)
    assert(rows.forall(r => r.getLong(0) == 0L && r.getInt(2) == 0))
    assert(maxRec < TaskRecordBound, s"a task saw $maxRec records")
  }

  test("ngram Jaccard: identical texts collapse, bounded tasks") {
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRec = maxTaskRecords {
      rows = Dedup.ngramJaccard(spark, dir).collect()
    }
    assert(rows.length == 1999)
    assert(rows.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
    assert(maxRec < TaskRecordBound, s"a task saw $maxRec records")
  }

  test("cross-corpus join: right side caps, every left doc still flagged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 600 identical docs split odd/even: right bucket (300) exceeds the
    // cap (256) → 256 residents; every odd LEFT doc must still pair
    val d = Files.createTempDirectory("graft-crosshot").toString
    (0L until 600L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRec = maxTaskRecords {
      rows = Dedup.minhashJoin(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)).collect()
    }
    val expectedResidents = (0L until 600L by 2).take(Dedup.HotGroupCap).toSet
    assert(rows.length == 300 * Dedup.HotGroupCap,
      s"300 left x ${Dedup.HotGroupCap} residents, got ${rows.length}")
    val leftIds = rows.map(_.getLong(0)).toSet
    assert(leftIds == (1L until 600L by 2).toSet,
      "every left doc must be flagged — the left side is never capped")
    assert(rows.map(_.getLong(1)).toSet == expectedResidents,
      "right residents must be the cap smallest even ids")
    assert(rows.forall(_.getDouble(2) == 1.0))
    assert(maxRec < TaskRecordBound, s"a task saw $maxRec records")
  }

  test("oracle scale: cold groups still produce full cliques") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-coldkey").toString
    // 4 identical docs — well under the cap → all 6 pairs, not a star
    (0L until 4L).map(i => (i, "one two three four five six seven"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(Dedup.ngramJaccard(spark, d).count() == 6)
    assert(Dedup.minhashLsh(spark, d).count() == 6)
    assert(Dedup.simhash(spark, d).count() == 6)
  }
}
