package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful ordered-funnel tracking via flatMapGroupsWithState — the
  * streaming counterpart of the q129 batch contract (strict-order
  * stages under a conversion window), the CEP pattern-match shape
  * Flink users reach for.
  *
  * Emission model: one `StageReached(user, stage, ts)` row the moment
  * a user ADVANCES to a stage. Stages are monotone (a user reaches
  * stage k at most once), so the output is append-safe facts — no
  * update/retraction channel needed — and any aggregate over it
  * (per-stage user counts, conversion rates) derives downstream.
  *
  * In-order precondition, stated plainly: per user, events must be
  * PROCESSED in event-time order — within one invocation they are
  * sorted here; ACROSS micro-batches the caller must deliver epochs
  * in event-time order (the watermark-buffered reordering a CEP
  * runtime performs before its pattern automaton; a delivery pipeline
  * replaying a shard-ordered log satisfies it naturally — the
  * reference's Kinesis delivery is ordered within a shard,
  * iac/s2_app.py:707-718). Under that
  * precondition "first qualifying event" equals the batch contract's
  * "min-ts qualifying event", so final stages match q129 exactly —
  * `FunnelSpec` pins the automaton's unit semantics and
  * `StreamingTwinSpec` the end-to-end equality. An event
  * arriving out of order behind its user's current stage time is
  * ignored, exactly like a CEP automaton that has already advanced —
  * and, because a violated precondition at scale would otherwise be
  * SILENTLY wrong, every such behind-state event is counted into the
  * [[Tracked.outOfOrderBehindState]] accumulator: zero under an
  * in-order delivery, and a loud, monitorable number the moment the
  * precondition breaks.
  *
  * State per key is O(1) — the automaton's (stage, sinceMicros) pair —
  * so the state store is bounded by |users|, never event volume; for
  * unbounded user cardinality an optional processing-time TTL
  * ([[trackInstrumented]]'s `stateTtlMillis`) evicts users idle past
  * it. Pick a TTL well past conversion window + delivery lateness:
  * eviction forgets the automaton, so a completed user's late
  * duplicate stage-1 event after expiry would re-open the funnel and
  * re-emit facts (the bounded-state trade, stated rather than hidden).
  */
object Funnel {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelState(stage: Int, sinceMicros: Long)
  final case class StageReached(user_id: Long, stage: Int, ts: Timestamp)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Advance one user's automaton over this invocation's events
    * (sorted here), capturing each stage advance. Stage 1 is
    * unconditional on its window (the funnel STARTS at the first
    * stage-0 event); stage k+1 requires a stages(k) event strictly
    * after the previous advance and within `windowMicros` of it —
    * q129's exact predicate.
    */
  private def advance(st: FunnelState, events: Seq[Event],
      stages: IndexedSeq[String], windowMicros: Long):
      (FunnelState, Seq[StageReached]) = {
    var s = st
    val out = Seq.newBuilder[StageReached]
    events.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
      if (s.stage < stages.length && e.event_type == stages(s.stage)) {
        val t = micros(e.ts)
        val ok =
          if (s.stage == 0) true
          else t > s.sinceMicros && t <= s.sinceMicros + windowMicros
        if (ok) {
          s = FunnelState(s.stage + 1, t)
          out += StageReached(e.user_id, s.stage, e.ts)
        }
      }
    }
    (s, out.result())
  }

  /** The tracked stream plus its observability surface:
    * `outOfOrderBehindState` counts events whose timestamp was BEHIND
    * their user's automaton clock at invocation entry — possible only
    * when micro-batches violated the per-user in-order precondition
    * (within one invocation events are sorted first, so in-order
    * deliveries never increment it). Read it after processing; alert
    * on nonzero.
    */
  final case class Tracked(events: Dataset[StageReached],
      outOfOrderBehindState: org.apache.spark.util.LongAccumulator)

  /** Track the funnel over `events`. One function serves both forms:
    * on a closed input (batch replay / tests) every group arrives in
    * one invocation; on a stream the automaton state carries across
    * micro-batches and emissions append as stages are reached.
    */
  def track(spark: SparkSession, events: Dataset[Event],
      stages: Seq[String], windowMillis: Long): Dataset[StageReached] =
    trackInstrumented(spark, events, stages, windowMillis).events

  /** [[track]] with the full handle: the out-of-order violation
    * counter, and an optional PROCESSING-time state TTL
    * (`stateTtlMillis`) for unbounded user populations — a user whose
    * state saw no event for the TTL is evicted (their conversion
    * window has irrecoverably lapsed when TTL ≥ window + max delivery
    * lateness; see the class doc for the re-open trade). Timeouts
    * never fire on a batch (closed-input) run, so the batch contract
    * is unchanged by any TTL.
    */
  def trackInstrumented(spark: SparkSession, events: Dataset[Event],
      stages: Seq[String], windowMillis: Long,
      stateTtlMillis: Option[Long] = None): Tracked = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowMillis > 0, s"conversion window must be positive, got $windowMillis")
    stateTtlMillis.foreach(ttl =>
      require(ttl > 0, s"state TTL must be positive, got $ttl"))
    val stageArr = stages.toIndexedSeq
    val windowMicros = windowMillis * 1000L
    val behindAcc = spark.sparkContext
      .longAccumulator("graft.funnel.outOfOrderBehindState")
    val timeoutConf = stateTtlMillis
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    val tracked = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, timeoutConf) {
        (_: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st0 = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val evs = it.toSeq
            // Precondition probe BEFORE the sort: an event-time behind
            // the automaton clock proves a cross-batch order violation.
            val behind = evs.count(e => micros(e.ts) < st0.sinceMicros)
            if (behind > 0) behindAcc.add(behind.toLong)
            val (st1, out) = advance(st0, evs, stageArr, windowMicros)
            if (st1 != st0) state.update(st1)
            // Refresh the eviction clock on every visit, advance or not:
            // an active-but-stalled user stays; only TTL-silent users go.
            stateTtlMillis.foreach(ttl =>
              if (state.exists) state.setTimeoutDuration(ttl))
            out.iterator
          }
      }
    Tracked(tracked, behindAcc)
  }

  /** Per-user buffered state for [[trackReordered]]: the automaton
    * plus the not-yet-ripe events held for watermark-bounded
    * reordering.
    */
  final case class ReorderState(stage: Int, sinceMicros: Long,
      buf: Seq[Event])

  /** [[track]] with a WATERMARK-BOUNDED REORDER BUFFER — the CEP
    * runtime's pre-automaton reordering, so the in-order
    * precondition holds BY CONSTRUCTION for any cross-batch disorder
    * within `maxDelayMillis`: each user's events are held in state
    * until the event-time watermark passes them, then fed to the
    * automaton in timestamp order. Output equals [[track]] over the
    * same events delivered in order (twin-pinned). State cost, stated
    * fully: the in-horizon buffer (bounded by watermark delay × rate
    * per user) PLUS one O(1) automaton entry per user who ever started
    * the funnel — the latter persists for the query's life by default,
    * exactly like [[track]]'s; `evictLapsed = true` bounds it by
    * dropping a user once the watermark proves the automaton inert
    * (past since + window + delay no in-bound event can ever advance
    * it), at the stated trade that a user re-appearing after eviction
    * restarts at stage 0 — a post-lapse stage-1 event re-opens the
    * funnel and re-emits, which the default (matching the batch
    * contract: a funnel never re-opens) does not.
    *
    * STREAMING-ONLY (event-time timeouts need a watermark; on a
    * closed input use [[track]], which sorts within the single
    * invocation). Two lifecycle notes callers must know:
    *
    *  - the watermark advances BETWEEN micro-batches, so a run that
    *    ends right after its last data batch leaves that batch's
    *    events buffered (no later batch advanced the watermark past
    *    them) — the standard structured-streaming tail, same as a
    *    windowed aggregation's last window; deliver a later event (or
    *    keep the stream running) to flush;
    *  - an event arriving LATER than `maxDelayMillis` out of order
    *    (below the watermark) is DROPPED by Spark's standard
    *    stateful-operator late-data filter before this function sees
    *    it — observable in the streaming progress as
    *    `numRowsDroppedByWatermark`, the metric to alert on (the
    *    in-function [[Tracked.outOfOrderBehindState]] counter stays as
    *    defense-in-depth for watermark-boundary stragglers that pass
    *    the filter yet land behind a flushed automaton).
    */
  def trackReordered(spark: SparkSession, events: Dataset[Event],
      stages: Seq[String], windowMillis: Long,
      maxDelayMillis: Long, evictLapsed: Boolean = false): Tracked = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowMillis > 0, s"conversion window must be positive, got $windowMillis")
    require(maxDelayMillis >= 0, s"max delay must be >= 0, got $maxDelayMillis")
    val stageArr = stages.toIndexedSeq
    val windowMicros = windowMillis * 1000L
    val behindAcc = spark.sparkContext
      .longAccumulator("graft.funnel.outOfOrderBehindState")
    val tracked = events
      .withWatermark("ts", s"$maxDelayMillis milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ReorderState, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[ReorderState]) =>
          val st0 = state.getOption.getOrElse(ReorderState(0, Long.MinValue, Nil))
          val wmMs = state.getCurrentWatermarkMs()
          // Everything at or below the watermark is RIPE: no
          // earlier-timestamped event can arrive within the bound, so
          // processing ripe events in sorted order IS in-order
          // processing. (A bound-violating straggler below the
          // watermark lands directly in `ripe` — immediate, unsorted
          // against history, observable via the accumulator.)
          val (ripe, hold) = (st0.buf ++ it).partition(_.ts.getTime <= wmMs)
          val behind = ripe.count(e => micros(e.ts) < st0.sinceMicros)
          if (behind > 0) behindAcc.add(behind.toLong)
          val (a1, out) = advance(FunnelState(st0.stage, st0.sinceMicros),
            ripe, stageArr, windowMicros)
          val st1 = ReorderState(a1.stage, a1.sinceMicros, hold)
          if (hold.isEmpty && a1.stage == 0) {
            // Nothing to hold, automaton never started: keep the state
            // store empty rather than storing the zero state forever.
            if (state.exists) state.remove()
          } else {
            state.update(st1)
            if (hold.nonEmpty)
              // Flush trigger: fire when the watermark passes the
              // earliest held event (strictly greater than the current
              // watermark by the partition above, as the API requires).
              state.setTimeoutTimestamp(hold.map(_.ts.getTime).min)
            else if (evictLapsed) {
              // Stage > 0, nothing buffered: once the watermark passes
              // since + window + delay the automaton is INERT — any
              // still-in-bound event has ts > wm > since + window and
              // fails the window predicate, so no advance or emission
              // can ever happen. Evict then (see the scaladoc trade).
              val evictAtMs =
                a1.sinceMicros / 1000L + windowMillis + maxDelayMillis + 1L
              if (evictAtMs > wmMs) state.setTimeoutTimestamp(evictAtMs)
              else state.remove()
            }
          }
          out.iterator
      }
    Tracked(tracked, behindAcc)
  }
}
