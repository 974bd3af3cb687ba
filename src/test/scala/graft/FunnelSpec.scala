package graft

import java.sql.Timestamp

import graft.streaming.Funnel

/** Unit semantics of the funnel automaton on closed inputs — the
  * batch-replay half the twin spec's end-to-end run builds on.
  */
class FunnelSpec extends SparkSpec {

  private def ts(minute: Long): Timestamp = new Timestamp(minute * 60000L)

  private def run(rows: Seq[(Long, Long, String)],
      window: Long = 60 * 60000L): Set[(Long, Int, Long)] = {
    import spark.implicits._
    val ev = rows.map { case (u, m, t) => Funnel.Event(u, ts(m), t) }.toDS()
    Funnel.track(spark, ev, Seq("view", "click", "purchase"), window)
      .collect().map(r => (r.user_id, r.stage, r.ts.getTime / 60000L)).toSet
  }

  test("strict order, conversion window, and first-qualifying-event semantics") {
    val got = run(Seq(
      // user 1: full funnel inside the 60-minute windows.
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: click BEFORE any view never counts; the later view starts it.
      (2L, 0L, "click"), (2L, 5L, "view"), (2L, 30L, "click"),
      // user 3: click outside the window — stalls at stage 1.
      (3L, 0L, "view"), (3L, 90L, "click"),
      // user 4: purchase without view/click — never enters.
      (4L, 0L, "purchase"),
      // user 5: FIRST qualifying click wins (the min-ts contract);
      // the later, also-qualifying click does not re-advance.
      (5L, 0L, "view"), (5L, 10L, "click"), (5L, 20L, "click"),
      (5L, 25L, "purchase")))
    assert(got == Set(
      (1L, 1, 0L), (1L, 2, 10L), (1L, 3, 20L),
      (2L, 1, 5L), (2L, 2, 30L),
      (3L, 1, 0L),
      (5L, 1, 0L), (5L, 2, 10L), (5L, 3, 25L)))
  }

  test("simultaneous timestamps and within-invocation disorder resolve like the batch contract") {
    // A click at EXACTLY the view's timestamp is not strictly after it.
    assert(run(Seq((1L, 0L, "view"), (1L, 0L, "click"))) == Set((1L, 1, 0L)))
    // Events handed to one invocation out of order are sorted first.
    assert(run(Seq((2L, 10L, "click"), (2L, 0L, "view"))) ==
      Set((2L, 1, 0L), (2L, 2, 10L)))
    // Guards.
    intercept[IllegalArgumentException] {
      import spark.implicits._
      Funnel.track(spark, Seq.empty[Funnel.Event].toDS(), Seq.empty, 1000L)
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      Funnel.track(spark, Seq.empty[Funnel.Event].toDS(), Seq("view"), 0L)
    }
  }

  test("a violated cross-batch in-order precondition is visible, not silent") {
    // Two micro-batches delivered AGAINST event-time order: batch 1
    // advances user 1 to stage 2 at t=10; batch 2 then carries a t=5
    // click — behind the automaton clock, so it is ignored (the CEP
    // already-advanced rule) AND counted into the violation
    // accumulator. In-order users never increment it.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Funnel.Event]
    val tracked = Funnel.trackInstrumented(spark, src.toDS(),
      Seq("view", "click", "purchase"), 60 * 60000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-ooo").toString
    val q = tracked.events.writeStream.outputMode("append")
      .format("memory").queryName("funnel_ooo")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      src.addData(Funnel.Event(1L, ts(0), "view"), Funnel.Event(1L, ts(10), "click"))
      q.processAllAvailable()
      assert(tracked.outOfOrderBehindState.value == 0L)
      src.addData(Funnel.Event(1L, ts(5), "click"), Funnel.Event(2L, ts(20), "view"))
      q.processAllAvailable()
      assert(tracked.outOfOrderBehindState.value == 1L)
      // The late event was ignored (no state regression, no re-emission).
      val got = spark.table("funnel_ooo")
        .as[Funnel.StageReached].collect()
        .map(r => (r.user_id, r.stage, r.ts.getTime / 60000L)).toSet
      assert(got == Set((1L, 1, 0L), (1L, 2, 10L), (2L, 1, 20L)))
    } finally q.stop()
  }

  test("watermark-bounded reorder buffer: out-of-order epochs yield the " +
      "in-order result; bound violations stay observable") {
    // Cross-batch disorder WITHIN the 30-minute bound: click@20 lands a
    // batch before view@10. The unbuffered tracker would ignore the
    // click forever (no view yet) and strand the user at stage 1; the
    // reorder buffer holds both until the watermark passes, replays
    // them in timestamp order, and completes the funnel — the CEP
    // pre-automaton reordering.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Funnel.Event]
    val tracked = Funnel.trackReordered(spark, src.toDS(),
      Seq("view", "click", "purchase"), windowMillis = 60 * 60000L,
      maxDelayMillis = 30 * 60000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-ro").toString
    val q = tracked.events.writeStream.outputMode("append")
      .format("memory").queryName("funnel_reorder")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      src.addData(Funnel.Event(1L, ts(20), "click"))
      q.processAllAvailable()
      src.addData(Funnel.Event(1L, ts(10), "view"))
      q.processAllAvailable()
      // Sentinel far ahead: advances the watermark past user 1's
      // events so the no-data batch flushes the buffer.
      src.addData(Funnel.Event(1L, ts(30), "purchase"),
        Funnel.Event(999L, ts(300), "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_reorder")
        .as[Funnel.StageReached].collect()
        .map(r => (r.user_id, r.stage, r.ts.getTime / 60000L)).toSet
      assert(got == Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)),
        s"got $got")
      assert(tracked.outOfOrderBehindState.value == 0L)
      // Beyond-bound straggler (t=5 under a watermark at 270): DROPPED
      // by Spark's stateful-op late-data filter before the automaton —
      // no output change, and the drop is observable in the streaming
      // progress metric (the thing to alert on at scale).
      src.addData(Funnel.Event(1L, ts(5), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_reorder").count() == 3) // no new rows
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, s"late drop not visible in progress: $dropped")
    } finally q.stop()
  }

  test("evictLapsed bounds reorder-buffer state: lapsed automatons leave the store") {
    // Window 1 minute, no reorder slack: u1's funnel lapses long before
    // the sentinel's watermark, so with eviction ON its automaton row is
    // dropped while the still-in-window sentinel's stays — numRowsTotal
    // proves it. Output is unaffected (eviction happens only once the
    // watermark shows no in-bound event could ever advance the user).
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Funnel.Event]
    val tracked = Funnel.trackReordered(spark, src.toDS(),
      Seq("view", "click"), windowMillis = 60000L, maxDelayMillis = 0L,
      evictLapsed = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-ev").toString
    val q = tracked.events.writeStream.outputMode("append")
      .format("memory").queryName("funnel_evict")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      src.addData(Funnel.Event(1L, ts(1), "view"))
      q.processAllAvailable()
      src.addData(Funnel.Event(999L, ts(10), "view"))
      q.processAllAvailable()
      // An empty nudge batch lets the eviction timeout fire after the
      // sentinel's watermark proved u1's window lapsed.
      src.addData(Funnel.Event(999L, ts(10), "noise"))
      q.processAllAvailable()
      val got = spark.table("funnel_evict")
        .as[Funnel.StageReached].collect().map(r => (r.user_id, r.stage)).toSet
      assert(got == Set((1L, 1)), s"got $got") // u999's view is still held
      val stateRows = q.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten).map(_.numRowsTotal).lastOption
      assert(stateRows.contains(1L),
        s"lapsed u1 should be evicted, leaving only u999's buffer: $stateRows")
    } finally q.stop()
  }

  test("processing-time state TTL keeps batch semantics and rejects bad values") {
    import spark.implicits._
    // On a closed input timeouts never fire: TTL-tracked results equal
    // the untracked contract.
    val rows = Seq((1L, 0L, "view"), (1L, 10L, "click"), (3L, 0L, "view"))
    val ev = rows.map { case (u, m, t) => Funnel.Event(u, ts(m), t) }.toDS()
    val withTtl = Funnel.trackInstrumented(spark, ev,
        Seq("view", "click", "purchase"), 60 * 60000L,
        stateTtlMillis = Some(3600000L))
      .events.collect().map(r => (r.user_id, r.stage)).toSet
    assert(withTtl == Set((1L, 1), (1L, 2), (3L, 1)))
    intercept[IllegalArgumentException] {
      Funnel.trackInstrumented(spark, ev, Seq("view"), 1000L,
        stateTtlMillis = Some(0L))
    }
  }
}
