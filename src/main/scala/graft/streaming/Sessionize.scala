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
    *
    * Classic interval merge with session_window's overlap rule: the
    * carried open session enters the SORTED timeline as an interval
    * (point events are [ts, ts]); sorted by start, the next interval
    * merges into the current one iff `next.start < cur.lastTs + gap`.
    * This gets every late-event case right: an in-watermark late event
    * within gap of the open session extends it (possibly moving start
    * backward); one MORE than gap before the session's start forms its
    * own earlier session and is emitted closed — merging it (the old
    * lastTs-distance-only guard did) would glue two non-overlapping
    * windows together. Residual O(1)-state approximation, documented: a
    * session already emitted closed can't be reopened by a yet-later
    * event; replay-identical output would need per-key session LISTS
    * until the watermark passes, i.e. O(sessions) state.
    */
  private def fold(userId: Long, events: Seq[Event], open: Option[SessionState],
      gapMicros: Long): (Seq[Session], Option[SessionState]) = {
    val intervals = (events.map(e => SessionState(e.ts, e.ts, 1)) ++ open)
      .sortBy(s => (micros(s.start), micros(s.lastTs)))
    val closed = Seq.newBuilder[Session]
    var cur: Option[SessionState] = None
    intervals.foreach { iv =>
      cur match {
        case Some(s) if micros(iv.start) - micros(s.lastTs) < gapMicros =>
          cur = Some(SessionState(
            start = s.start, // sorted by start: s.start is the min
            lastTs = if (micros(iv.lastTs) > micros(s.lastTs)) iv.lastTs else s.lastTs,
            n = s.n + iv.n))
        case Some(s) =>
          closed += Session(userId, s.start, s.lastTs, s.n)
          cur = Some(iv)
        case None =>
          cur = Some(iv)
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
