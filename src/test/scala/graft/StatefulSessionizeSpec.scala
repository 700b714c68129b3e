package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.{Ev, Session}

/** Stateful streaming sessionization: state carries across micro-batches
  * (a session continued in a later batch stays one session) and gaps
  * split sessions; watermark-driven timeout closes idle sessions.
  */
class StatefulSessionizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  test("sessions continue across micro-batches and split on gaps") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark)
    val sessions = StatefulSessionize.sessions(
      stream.toDS().withWatermark("ts", "10 minutes").as[Ev])
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()

    // batch 1: user 1 events at t+0, t+10 (one open session)
    stream.addData(Ev(1, ts(0), 1.0), Ev(1, ts(10), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0, "session still open")

    // batch 2: t+20 continues the session; t+120 opens a new one →
    // the first session closes with 3 events spanning t+0..t+20
    stream.addData(Ev(1, ts(20), 3.0), Ev(1, ts(120), 4.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Session].collect()
    assert(closed.length == 1)
    assert(closed.head.n_events == 3)
    assert(closed.head.session_start == ts(0))
    assert(closed.head.session_end == ts(20))
    assert(closed.head.total_value == 6.0)

    // batch 3: far-future event advances the watermark past the open
    // session's timeout → it closes via EventTimeTimeout
    stream.addData(Ev(2, ts(1000), 9.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts(1001), 1.0))
    q.processAllAvailable()
    val after = spark.table("sess_out").as[Session].collect()
    assert(after.exists(s => s.user_id == 1 && s.session_start == ts(120)),
      s"timed-out session should have closed; got ${after.toSeq}")
    q.stop()
  }

  test("close-now branch removes carried state — no stale timeout emission") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // key with open state S0 receives a late-but-admitted event while
    // the eviction watermark has already jumped past the MERGED session
    // horizon: update() must emit the merged session AND remove the
    // carried state — otherwise the same batch's timed-out pass (which
    // does not exclude keys that just received data) fires on the stale
    // pre-merge state and emits a second, shorter session
    val s0 = StatefulSessionize.Open(
      start = 1700000000000000L, end = 1700000060000000L, n = 2, total = 3.0)
    val evT = new Timestamp(1700000120000L) // 60 s after s0.end → merges
    val horizonMs =
      (1700000120000000L + StatefulSessionize.GapUs) / 1000
    val state = TestGroupState.create[StatefulSessionize.Open](
      Optional.of(s0), GroupStateTimeout.EventTimeTimeout(),
      1L, Optional.of(java.lang.Long.valueOf(horizonMs + 1)),
      hasTimedOut = false)
    val out = StatefulSessionize.update(
      7L, Iterator(Ev(7, evT, 4.0)), state).toSeq
    assert(out.length == 1, s"exactly one merged session, got $out")
    assert(out.head.n_events == 3 && out.head.total_value == 7.0)
    assert(state.isRemoved,
      "carried state must be removed — a stale armed timeout would " +
        "re-emit the pre-merge session in the same batch's timeout pass")
  }
}
