package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * arbitrary-state path for session logic that `session_window` can't
  * express (per-session custom payloads, mid-session emission rules).
  * Semantics match Q38: a gap >= `gapMillis` closes the session.
  *
  * State per key is O(1) (just the open session's accumulator), so state
  * store size is bounded by |active users|, not event volume — the knob
  * that matters at 100 TB/day.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  /** State keeps the ORIGINAL timestamps (micro precision) — epoch-millis
    * state would truncate session_start vs session_window's output.
    */
  final case class SessionState(start: Timestamp, lastTs: Timestamp, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMillis * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Batch/test form: events of the group arrive together; fold in
          // time order, emitting every closed session. In a true
          // incremental run the state carries the open session across
          // micro-batches and event-time timeout flushes it.
          val sorted = it.toSeq.sortBy(e => micros(e.ts))
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if micros(e.ts) - micros(s.lastTs) < gapMicros =>
                cur = Some(s.copy(lastTs = e.ts, n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.start, s.lastTs, s.n)
                cur = Some(SessionState(e.ts, e.ts, 1))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          // Closed-input (batch) semantics: flush the final open session.
          cur.foreach { s =>
            closed += Session(userId, s.start, s.lastTs, s.n)
            state.remove()
          }
          closed.result().iterator
      }
  }
}
