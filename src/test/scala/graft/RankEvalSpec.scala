package graft

import org.apache.spark.sql.functions._

import graft.operators.RankEval

/** Hand-auditable fixtures + a local sequential-fold replay for the
  * rank_eval metrics (the corpus-level oracle is q172).
  */
class RankEvalSpec extends SparkSpec {

  import spark.implicits._

  private def gain(rel: Int): Double = rel match {
    case 0 => 0.0; case 1 => 1.0; case 2 => 3.0; case _ => 7.0
  }

  /** Local replay with the operator's exact op order:
    * Σ gain/ln(r+1)*ln(2), sequential left fold from 0.0. StrictMath,
    * not Math: Catalyst's `ln` evaluates via StrictMath.log (fdlibm),
    * which differs from the intrinsified Math.log by one ulp on some
    * inputs (ln 3 is one) — the same fdlibm semantics the DuckDB
    * oracle's libm ln lands on, which is WHY the cross-engine ln
    * agreement the q85/q172 gates rely on holds.
    */
  private def dcgLocal(rels: Seq[Int]): Double =
    rels.zipWithIndex.foldLeft(0.0) { case (acc, (rel, i)) =>
      acc + gain(rel) / StrictMath.log((i + 2).toDouble) * StrictMath.log(2.0)
    }

  private def run(page: Seq[(Long, Int)], labels: Seq[(Long, Int)], k: Int,
      thr: Int = 2) = {
    val top = page.toDF("doc_id", "rnk")
    val rel = labels.toDF("doc_id", "rel")
    RankEval.rankEval(top, rel, k, thr)
      .select("k", "hits", "total_relevant", "dcg", "idcg", "ndcg", "mrr",
        "p_at_k", "recall_at_k")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
  }

  test("rankEval matches the local fold on a hand-built page") {
    // labels: 1->3, 2->2, 3->1, 4->0, 5->2, 6->3 (corpus of 6)
    val labels = Seq(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 2, 6L -> 3)
    // page of 4: ranks 1..4 = docs 3 (rel 1), 1 (rel 3), 4 (rel 0), 5 (rel 2)
    val page = Seq(3L -> 1, 1L -> 2, 4L -> 3, 5L -> 4).map { case (d, r) => (d, r) }
    val (k, hits, tot, dcg, idcg, ndcg, mrr, p, r) = run(page, labels, k = 4)
    assert(k == 4L)
    assert(hits == 2L)          // docs 1 and 5 have rel >= 2
    assert(tot == 4L)           // corpus-wide rel >= 2: docs 1, 2, 5, 6
    assert(dcg == dcgLocal(Seq(1, 3, 0, 2)))
    assert(idcg == dcgLocal(Seq(3, 3, 2, 2))) // ideal top-4 grades
    assert(ndcg == dcg / idcg && ndcg > 0 && ndcg < 1)
    assert(mrr == 1.0 / 2.0)    // first rel>=2 at rank 2
    assert(p == 2.0 / 4)
    assert(r == 2.0 / 4.0)
  }

  test("rankEval partial labels: unlabeled page docs keep later hits at " +
      "their ACTUAL rank discount") {
    // Doc 9 (rank 1) has NO label row — the join drops it. A positional
    // fold would then discount doc 1 (rank 2) at ln(2) as if it ranked
    // first, overstating DCG; the rnk-keyed fold must charge ln(3).
    val labels = Seq(1L -> 3, 2L -> 2, 3L -> 0)
    val page = Seq(9L -> 1, 1L -> 2, 2L -> 3)
    val (_, hits, _, dcg, _, _, mrr, _, _) = run(page, labels, k = 3)
    assert(hits == 2L)
    // local replay at the true ranks: gain(3)/ln(3) + gain(2)/ln(4)
    val want = gain(3) / StrictMath.log(3.0) * StrictMath.log(2.0) +
      gain(2) / StrictMath.log(4.0) * StrictMath.log(2.0)
    assert(dcg == want, s"dcg=$dcg want=$want")
    assert(mrr == 1.0 / 2.0) // first labeled relevant sits at rank 2
  }

  test("rankEval edges: no relevant in page -> mrr 0; empty-ideal guard; threshold") {
    val labels = Seq(1L -> 1, 2L -> 0, 3L -> 1)
    val page = Seq(1L -> 1, 2L -> 2)
    val (_, hits, tot, dcg, idcg, ndcg, mrr, p, r) = run(page, labels, k = 2)
    assert(hits == 0L && tot == 0L && mrr == 0.0 && p == 0.0 && r == 0.0)
    assert(dcg == dcgLocal(Seq(1, 0)) && idcg == dcgLocal(Seq(1, 1)))
    assert(ndcg == dcg / idcg)
    // threshold 1 flips the binary metrics on the same frames
    val (_, h1, t1, _, _, _, m1, _, _) = run(page, labels, k = 2, thr = 1)
    assert(h1 == 1L && t1 == 2L && m1 == 1.0)
    // all-zero labels: idcg = 0 -> ndcg pinned to 0, no NaN
    val (_, _, _, _, i0, n0, _, _, _) =
      run(Seq(1L -> 1), Seq(1L -> 0, 2L -> 0), k = 1)
    assert(i0 == 0.0 && n0 == 0.0)
    intercept[IllegalArgumentException] { RankEval.rankEval(page.toDF("doc_id", "rnk"), labels.toDF("doc_id", "rel"), 0) }
    intercept[IllegalArgumentException] { RankEval.rankEval(page.toDF("doc_id", "rnk"), labels.toDF("doc_id", "rel"), 5, 0) }
  }
}
