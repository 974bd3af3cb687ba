package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the TRAINED-classifier
  * rung of a curation pipeline (the GPT-3 data work filtered Common
  * Crawl with a linear quality classifier; CCNet ships a fastText
  * rung). The reference's only per-record classification hook is its
  * Lambda transform (`kds_example/kds_helper.py:43-51`), which routes
  * on exceptions — this operator supplies the statistical analogue a
  * 100 TB curation pipeline actually runs: learn class-conditional
  * term weights from a labeled sample, score every document, keep or
  * route by the score.
  *
  * The model is a CLOSED FORM over counts (Laplace-smoothed log-count
  * ratios) — the same property that makes the OPQ parametric rung
  * oracle-replayable makes this whole train+score chain expressible
  * in portable SQL: no iterative optimizer, every weight is
  * ln of exact long-count ratios evaluated in a fixed order.
  *
  * Scale shape: training is ONE corpus-sized shuffle (the per-term
  * label-count agg; the label bit rides the explode) + a vocab-sized
  * total agg; the weight table is vocab-sized — broadcast when small,
  * an ordinary term-keyed hash join otherwise. Scoring is the q34/q35
  * tf agg (corpus shuffle) + that join; nothing is per-pair or
  * iterative.
  */
object NaiveBayes {

  /** A trained binary model: `weights` = (term, w) with
    * w(t) = ln((c⁺(t)+1)/(T⁺+V)) − ln((c⁻(t)+1)/(T⁻+V)) over the
    * class-conditional token counts c, class token totals T and
    * vocabulary size V; `bias` = ln((N⁺+1)/(N⁻+1)), the smoothed
    * log-odds of the document priors (smoothed so a degenerate
    * single-class sample still trains instead of producing ±∞).
    */
  final case class NbModel(weights: DataFrame, bias: Double)

  /** Train on (doc_id, toks) with `isPos` any boolean Column over the
    * input frame (e.g. `col("lang") === "en"`). Null labels count as
    * negative (coalesce — Naive Bayes has no third class).
    */
  def train(toks: DataFrame, isPos: Column): NbModel = {
    val lab = toks.select(col("doc_id"), col("toks"),
      coalesce(isPos.cast("boolean"), lit(false)).as("pos"))
    val prior = lab.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("n")).head()
    val (np, n) = (prior.getLong(0), prior.getLong(1))
    val bias = math.log((np + 1.0) / (n - np + 1.0))
    // One corpus-sized shuffle: per-term counts with the label riding
    // the exploded rows. Totals derive from the vocab-sized result.
    val counts = lab
      .select(col("pos"), explode(col("toks")).as("term"))
      .groupBy("term")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pos_n"),
        count(lit(1)).as("all_n"))
    val totals = counts.agg(
      sum(col("pos_n")).cast("double").as("tp"),
      sum(col("all_n") - col("pos_n")).cast("double").as("tn"),
      count(lit(1)).cast("double").as("v"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        (log((col("pos_n") + lit(1.0)) / (col("tp") + col("v")))
          - log((col("all_n") - col("pos_n") + lit(1.0)) / (col("tn") + col("v"))))
          .as("w"))
    NbModel(weights, bias)
  }

  /** Score (doc_id, toks) against a trained model:
    * (doc_id, log_odds) with log_odds = bias + Σ_t tf(t)·w(t) over
    * the document's MODEL-KNOWN terms. Out-of-vocabulary terms are
    * skipped (the inner join) — the usual NB convention; a document
    * with no known terms at all is absent from the result (its
    * evidence is empty — callers needing every row left-join this
    * back). The per-doc sum is order-sensitive like every float agg
    * here — callers round emitted scores (q35 precedent).
    */
  def score(toks: DataFrame, model: NbModel): DataFrame =
    toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(model.weights, "term")
      .groupBy("doc_id")
      .agg((sum(col("tf") * col("w")) + lit(model.bias)).as("log_odds"))
}
