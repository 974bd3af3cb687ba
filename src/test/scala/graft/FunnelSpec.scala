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
}
