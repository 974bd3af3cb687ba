package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline ranking evaluation — the `rank_eval` API of the search sink
  * the reference delivers into (`kds_example/iac/s2_app.py:841-858`
  * provisions the OpenSearch domain; its rank_eval endpoint scores
  * NDCG / MRR / precision / recall over a ranked result page and a
  * judgment set),
  * and equally the retrieval-quality gate a training-data pipeline
  * runs over its mined pairs (q139's hard negatives are only as good
  * as the retriever — this operator is how that is measured; Karpukhin
  * 2020 §5 reports exactly these metrics for DPR).
  *
  * Metrics, for a page of k ranked hits against graded relevance
  * labels (rel ≥ `relThreshold` counts as "relevant" for the binary
  * metrics):
  *
  *  - DCG@k  = Σ_{r=1..k} gain(rel_r) / log2(r + 1), Burges-style
  *    gain 2^rel − 1;
  *  - NDCG@k = DCG@k / IDCG@k, IDCG from the corpus-wide ideal
  *    ordering (top-k labels by grade — values only, so label ties
  *    need no tie-break);
  *  - MRR    = 1 / (first rank with rel ≥ threshold), 0 if the page
  *    has none;
  *  - P@k    = relevant-in-page / k;
  *  - R@k    = relevant-in-page / corpus-wide relevant count.
  *
  * Determinism discipline: every metric is scalar arithmetic over
  * EXACT integers except the two DCG sums, which are ≤ k doubles
  * folded SEQUENTIALLY in rank order via `aggregate` over a
  * rank-sorted array (the q162 normalizer recipe — an external
  * replayer lands on the identical binary value with
  * `list_sum(list(term ORDER BY rnk))`). Gains are spelled as a CASE
  * over the integer grade (never `pow`, whose one-ulp license breaks
  * bit-equal gates); log2 is `ln(r+1)` then one divide and one
  * multiply in fixed order, riding the cross-engine ln agreement the
  * BM25 chain already relies on.
  *
  * Scale shape: the page side is k rows (broadcast into the label
  * join); the label side is a corpus-sized scan the metric DEFINITION
  * requires (IDCG and recall's denominator are corpus-wide), reduced
  * by one mergeable agg and one TakeOrderedAndProject top-k — metric
  * state is O(k), never a corpus sort. At 100 TB an eval harness runs
  * many queries; each adds k broadcast rows against the same one
  * label pass.
  */
object RankEval {

  private def gainCase(x: String): String =
    s"CASE $x WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 ELSE 7.0 END"

  /** Sequential rank-ordered DCG fold over `arr` (array of int grades,
    * already in rank order): Σ gain(rel_r)/ln(r+1)*ln(2). Positional —
    * correct only when every rank slot is present (the IDEAL ordering,
    * which is positional by definition).
    */
  private def dcgFold(arr: String): String =
    s"""aggregate($arr,
       |  struct(CAST(0 AS INT) AS r, CAST(0.0 AS DOUBLE) AS s),
       |  (acc, x) -> struct(acc.r + 1 AS r,
       |    acc.s + (${gainCase("x")}) / ln(CAST(acc.r + 2 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE)) AS s),
       |  acc -> acc.s)""".stripMargin

  /** Page-side DCG fold over `arr` (array of struct(rnk, rel), already
    * rank-ascending): each hit is discounted by its ACTUAL rank,
    * Σ gain(p.rel)/ln(p.rnk+1)*ln(2) — not the fold's list position.
    * The two agree when every page doc carries a label row; under a
    * PARTIAL label set the inner join drops unlabeled page docs and a
    * positional fold would compress later hits' ranks, silently
    * overstating DCG (round-14 ADVICE fix). Sum order stays the
    * rank-ascending sequence, so complete-label values are
    * bit-identical to the positional fold (ln(p.rnk+1) = ln(acc.r+2)
    * at every step) and the oracle gate sees no change.
    */
  private def dcgFoldAt(arr: String): String =
    s"""aggregate($arr,
       |  CAST(0.0 AS DOUBLE),
       |  (acc, p) -> acc + (${gainCase("p.rel")}) / ln(CAST(p.rnk + 1 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE)))""".stripMargin

  /** One-row metrics frame from a ranked page `top` (doc_id, rnk with
    * rnk in 1..k) and graded labels `rel` (doc_id, rel — int grades,
    * one row per corpus doc). Columns: k, hits, total_relevant, dcg,
    * idcg, ndcg, mrr, p_at_k, recall_at_k (doubles unrounded — callers
    * apply the emission rounding).
    */
  def rankEval(top: DataFrame, rel: DataFrame, k: Int,
      relThreshold: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(relThreshold >= 1, s"relThreshold must be >= 1, got $relThreshold")
    val isRel = col("rel") >= relThreshold
    // Materialize the labels ONCE: three consumers below (page join,
    // relevant-count, ideal top-k), and callers always pass a COMPUTED
    // projection (a tokenize/contains pass over the corpus) — without
    // this the label derivation replays per consumer, 3 corpus passes
    // instead of 1 (the buildTextIndex discipline). What stays
    // resident is (doc_id, rel) — 2 longs per doc, far below the text.
    val relMat = rel.select(col("doc_id"), col("rel")).localCheckpoint(true)
    // Page-side aggregates: the label scan streams against the
    // broadcast k-row page; grades collect rank-sorted into ONE row.
    val page = relMat.join(broadcast(top.select(col("doc_id"), col("rnk"))), "doc_id")
      .agg(
        expr(s"${dcgFoldAt("sort_array(collect_list(struct(rnk, rel)))")}").as("dcg"),
        min(when(isRel, col("rnk"))).as("first_rel"),
        sum(when(isRel, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_page"))
    // Corpus-side: relevant count (mergeable agg) + ideal top-k grades
    // (TakeOrderedAndProject — grade VALUES only, ties immaterial).
    val totals = relMat.agg(sum(when(isRel, 1L).otherwise(0L)).as("total_relevant"))
    val ideal = relMat.orderBy(col("rel").desc).limit(k)
      .agg(expr(s"${dcgFold("reverse(array_sort(collect_list(rel)))")}").as("idcg"))
    page.crossJoin(broadcast(totals)).crossJoin(broadcast(ideal))
      .select(
        lit(k.toLong).as("k"),
        col("hits"), col("total_relevant"), col("dcg"), col("idcg"),
        when(col("idcg") === 0.0, 0.0)
          .otherwise(col("dcg") / col("idcg")).as("ndcg"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rel").cast("double")).as("mrr"),
        (col("hits").cast("double") / k).as("p_at_k"),
        when(col("total_relevant") === 0L, 0.0)
          .otherwise(col("hits").cast("double") / col("total_relevant").cast("double"))
          .as("recall_at_k"))
  }
}
