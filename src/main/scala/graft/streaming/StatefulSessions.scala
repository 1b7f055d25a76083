package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY.md §2.9; the
  * KeyValueGroupedDataset path for semantics `groupBy(window)` can't express).
  *
  * Gap-based sessionizer with explicit state: per user, a session closes when
  * the next event arrives more than `gapSeconds` later; closed sessions are
  * emitted append-style. Complements `session_window` (st03) by exposing the
  * state machine — the shape any custom streaming operator (counters, CDC
  * folds, alert windows) reuses. State is one small record per active key, so
  * executor memory tracks active users, not history.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, events: Int)
  case class ClosedSession(user_id: Long, session_start: Timestamp, session_end: Timestamp, events: Int)

  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val gapMs = gapSeconds * 1000
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last >= gapMs =>
                closed += ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.events)
                cur = Some(SessionState(t, t, 1))
              case Some(s) =>
                cur = Some(SessionState(s.start, t, s.events + 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
