package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's canary normalization, exercised on synthetic windows —
  * no Spark session needed ([[Bench.normalizedRegressions]] is pure).
  * The scenario that motivated it (VERDICT r10): a contended host
  * window inflates EVERY query ~2×, the driver flags 11 keys, and a
  * judge re-run shows all but the genuinely-regressed ones were
  * window noise. The canary must reproduce that adjudication inline.
  */
class BenchWindowSpec extends AnyFunSuite {

  private val pins = Map(
    Bench.CanaryKey -> 0.4,
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

  test("clean window: raw and normalized agree; a fast canary never " +
      "excuses or amplifies") {
    // Canary FASTER than pin (0.5×) while one key regressed 2×: the
    // excuse clamps at 1, so normalization must not divide by 0.5
    // (which would double every ratio into false flags) and must not
    // excuse the real regression either.
    val mins = Map(
      Bench.CanaryKey -> 0.2,
      "q44_lsh_pairs" -> 2.0,
      "q66_decontaminate" -> 2.0,
      "q86_hybrid_rrf" -> 0.8)
    val (wf, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(math.abs(wf - 0.5) < 1e-9)
    assert(raw == norm)
    assert(raw.keySet == Set("q44_lsh_pairs"))
    assert(math.abs(raw("q44_lsh_pairs") - 2.0) < 0.01)
  }

  test("missing canary pin or measurement: factor 1, raw behavior") {
    val noCanaryPins = pins - Bench.CanaryKey
    val mins = Map("q44_lsh_pairs" -> 3.0)
    val (wf1, raw1, norm1) = Bench.normalizedRegressions(mins, noCanaryPins)
    assert(wf1 == 1.0 && raw1 == norm1 && raw1.keySet == Set("q44_lsh_pairs"))
    val (wf2, _, _) = Bench.normalizedRegressions(
      Map("q44_lsh_pairs" -> 3.0), pins) // canary never measured
    assert(wf2 == 1.0)
  }

  test("sub-floor and sub-ratio moves stay unflagged in both maps") {
    val mins = Map(
      Bench.CanaryKey -> 0.4,
      "q86_hybrid_rrf" -> 0.8 * 1.4, // under the 1.5× ratio
      "q44_lsh_pairs" -> 1.25)       // 1.25× and only +0.25 s: under floor
    val (_, raw, norm) = Bench.normalizedRegressions(mins, pins)
    assert(raw.isEmpty && norm.isEmpty)
  }
}
