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
}
