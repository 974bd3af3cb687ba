package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * arbitrary-state path for session logic that `session_window` can't
  * express (per-session custom payloads, mid-session emission rules).
  * Semantics match Q38: a gap >= `gapMillis` closes the session.
  *
  * Two entry points:
  *  - [[sessionize]]: CLOSED-INPUT form (batch replay / tests) — each
  *    group's events arrive in one invocation, so the final open session
  *    flushes at the end.
  *  - [[sessionizeStream]]: INCREMENTAL form — state carries the open
  *    session across micro-batches and an event-time timeout flushes it
  *    once the watermark passes lastTs + gap. Requires
  *    `withWatermark("ts", ...)` upstream.
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

  /** Fold this invocation's events into the open-session state, returning
    * (sessions closed by gaps, final open session).
    */
  private def fold(userId: Long, events: Seq[Event], open: Option[SessionState],
      gapMicros: Long): (Seq[Session], Option[SessionState]) = {
    val closed = Seq.newBuilder[Session]
    var cur = open
    events.sortBy(e => micros(e.ts)).foreach { e =>
      cur match {
        case Some(s) if micros(e.ts) - micros(s.lastTs) < gapMicros =>
          // Extend with min/max, never assignment: an in-watermark LATE
          // event (earlier than state carried from a previous micro-batch)
          // must not regress lastTs — that would emit end < start sessions
          // and split on the next in-order event — and may extend the
          // session's start backward (session_window merge semantics).
          cur = Some(SessionState(
            start = if (micros(e.ts) < micros(s.start)) e.ts else s.start,
            lastTs = if (micros(e.ts) > micros(s.lastTs)) e.ts else s.lastTs,
            n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start, s.lastTs, s.n)
          cur = Some(SessionState(e.ts, e.ts, 1))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1))
      }
    }
    (closed.result(), cur)
  }

  /** Closed-input form: every group arrives in one invocation; the final
    * open session flushes at the end (batch semantics — q38's contract).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMillis * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val (closed, open) = fold(userId, it.toSeq, state.getOption, gapMicros)
          state.remove()
          (closed ++ open.map(s => Session(userId, s.start, s.lastTs, s.n))).iterator
      }
  }

  /** Incremental streaming form: the open session lives in the state
    * store across micro-batches; an event-time timeout at lastTs + gap
    * (clamped above the current watermark) flushes it exactly when no
    * in-order event can extend it any more.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMillis * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.lastTs, s.n))
          } else {
            val (closed, open) = fold(userId, it.toSeq, state.getOption, gapMicros)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(
                  math.max(s.lastTs.getTime + gapMillis,
                    state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
