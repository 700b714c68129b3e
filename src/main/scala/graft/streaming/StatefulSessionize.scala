package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit state
  * (`flatMapGroupsWithState`) — the stateful-operator capability the
  * reference has no analogue for (its aggregation is per-rotated-file
  * batch SQL, SURVEY §2.C). Sessions close when an inactivity gap
  * appears within the data, or via event-time timeout once the
  * watermark passes session end + gap.
  *
  * State per user is one open session (constant size) — at 100 TB the
  * state store scales with |active users|, not |events|.
  */
object StatefulSessionize {

  val GapMs: Long = 30L * 60 * 1000

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Open(start: Long, end: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     total_value: Double)

  private def toSession(uid: Long, s: Open): Session =
    Session(uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
      s.n, math.round(s.total * 100).toDouble / 100)

  def update(uid: Long, events: Iterator[Ev],
             state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.end > GapMs =>
          closed += toSession(uid, s)
          open = Some(Open(t, t, 1, e.value))
        case Some(s) =>
          open = Some(Open(s.start, math.max(s.end, t), s.n + 1,
            s.total + e.value))
        case None =>
          open = Some(Open(t, t, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.end + GapMs)
    }
    closed.result().iterator
  }

  /** events stream (with watermark on `ts`) → closed sessions. */
  def sessions(events: Dataset[Ev]): Dataset[Session] = {
    implicit val openEnc = Encoders.product[Open]
    implicit val sessEnc = Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
