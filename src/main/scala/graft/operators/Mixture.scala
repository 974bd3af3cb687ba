package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-scaled source sampling — the multilingual/multi-domain
  * mixing rule from XLM-R / mT5 (Conneau 2020 §3.1, Xue 2021 §3.2):
  * sample source i with probability p_i ∝ n_i^α, α < 1, so low-resource
  * sources are up-sampled relative to their natural share without ever
  * dominating. Complements the registry's other mixing tools: q70 keeps
  * a fixed RATE per source, q91 a fixed token BUDGET per source, q84
  * reweights per-DOCUMENT by importance — this one sets the per-source
  * sampling distribution itself from the corpus's own size statistics.
  *
  * α is fixed at 1/2 and computed as `sqrt`: IEEE-754 requires sqrt to
  * be correctly rounded, so Spark (java.lang.Math) and any C-libm
  * replayer produce the SAME double from the same exact token count —
  * whereas a general `pow(n, 0.3)` is only faithfully rounded and may
  * legally differ in the last ulp across engines. The repo's oracle
  * discipline (bit-equal hash gates) makes that one-ulp license a real
  * hazard, so the operator pins the exponent the standard pins.
  *
  * The weight NORMALIZER Σ√n_i is the one order-sensitive double sum;
  * it folds over the per-source weights in ascending source order via
  * an explicit sequential `aggregate` over a sorted array — #sources
  * elements in ONE row, never a parallel agg — so an external replayer
  * (DuckDB `list(w ORDER BY source)` + sequential fold) lands on the
  * identical binary value. Everything downstream of the fold is scalar
  * per-source arithmetic in fixed op order.
  *
  * Scale shape: one corpus-sized shuffle (the per-source token-count
  * hash-agg, mergeable partial sums), then a #sources-row frame cross
  * joined with the 1-row normalizer — both broadcast. At 100 TB the
  * expensive part is the token count the pipeline computes anyway; the
  * mixing math is metadata-sized.
  */
object Mixture {

  /** Per-source α=1/2 temperature-scaled sampling plan over docs
    * carrying (source, n_tok): (source, n_tok, weight, p, alloc_tok)
    * where `p = √n_src / Σ√n` and `alloc_tok = floor(p·budget + 0.5)`
    * on the EMISSION-rounded p (r6 — probabilities live well above
    * 1e-6 for any real mixture), so the allocation a consumer computes
    * from the published plan is the allocation the plan states.
    */
  def temperatureMix(docs: DataFrame, nTok: Column, budgetTok: Long): DataFrame = {
    require(budgetTok > 0, s"token budget must be positive, got $budgetTok")
    val per = docs
      .groupBy(col("source"))
      .agg(sum(nTok.cast("long")).as("n_tok"))
      .select(col("source"), col("n_tok"),
        sqrt(col("n_tok").cast("double")).as("weight"))
    val norm = per
      .agg(aggregate(
        array_sort(collect_list(struct(col("source").as("s"), col("weight").as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("sum_w"))
    val p6 = floor(col("weight") / col("sum_w") * 1e6 + lit(0.5)) / 1e6
    per.crossJoin(broadcast(norm))
      .select(col("source"), col("n_tok"), col("weight"),
        p6.as("p"),
        floor(p6 * budgetTok + lit(0.5)).cast("long").as("alloc_tok"))
  }
}
