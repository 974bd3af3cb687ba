package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** [[graft.operators.Mixture.temperatureMix]] — the α=1/2
  * temperature-scaled source-sampling plan (q162). Asserts the math
  * against a local sequential replay (same source-ascending fold order
  * for the normalizer), the up-sampling property the rule exists for,
  * and the argument guard.
  */
class MixtureSpec extends SparkSpec {

  test("temperatureMix: √n weights, source-ordered normalizer fold, " +
      "rounded p drives the allocation") {
    import spark.implicits._
    // Sizes chosen so natural shares are 1%, 9%, 90%.
    val docs = Seq(
      ("web", 450000L), ("web", 450000L),
      ("wiki", 90000L), ("code", 10000L)).toDF("source", "n")
    val got = Mixture.temperatureMix(docs, col("n"), budgetTok = 1000000L)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    // Local replay: exact long sums, IEEE sqrt, normalizer folded in
    // ascending source order, p rounded at 1e-6 BEFORE the allocation.
    val sums = Map("web" -> 900000L, "wiki" -> 90000L, "code" -> 10000L)
    val w = sums.view.mapValues(n => math.sqrt(n.toDouble)).toMap
    val sumW = w.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    sums.keys.foreach { s =>
      val p = math.floor(w(s) / sumW * 1e6 + 0.5) / 1e6
      val alloc = math.floor(p * 1000000L + 0.5).toLong
      assert(got(s) == ((sums(s), w(s), p, alloc)), s"source $s: ${got(s)}")
    }

    // The point of temperature scaling: low-resource sources take a
    // LARGER share than their natural token share, high-resource a
    // smaller one — without the order ever flipping.
    val total = sums.values.sum.toDouble
    assert(got("code")._3 > sums("code") / total)   // 1% → ~7.5%
    assert(got("web")._3 < sums("web") / total)     // 90% → ~71%
    assert(got("web")._3 > got("wiki")._3 && got("wiki")._3 > got("code")._3)

    intercept[IllegalArgumentException] {
      Mixture.temperatureMix(docs, col("n"), budgetTok = 0L)
    }
  }
}
