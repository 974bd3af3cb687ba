package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality gates — the Gopher filter set
  * (Rae et al. 2021, "Scaling Language Models", Appendix A1.1), the
  * standard first-pass curation stage a crawl corpus runs before any
  * model-based scoring ([[NgramLm]]) or dedup ([[Dedup]]).
  *
  * Every metric is a NARROW projection over one scan — no shuffle at
  * any corpus size: word metrics come from the shared analyzer
  * ([[graft.functions.TextFunctions.tokens]]), line metrics from a
  * newline split of the raw text, and each gate compares a
  * deterministically-rounded ratio ([[graft.queries.Par.r2]]) so the
  * pass/fail bit is engine-portable (an unrounded ratio's last ulp
  * could flip a threshold comparison between engines).
  */
object QualityRules {

  /** Gopher's "must contain ≥2 of" stop set (ibid., A1.1). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher rule metrics and gates over (doc_id, text).
    * Docs with zero analyzer tokens are excluded (the q41 exclusion —
    * no denominator). Thresholds are the paper's:
    * word count ∈ [50, 100k], mean word length ∈ [3, 10],
    * symbol-to-word ratio ≤ 0.1 ('#' and '...'), ≤ 90% of lines
    * bullet-started, ≤ 30% ellipsis-ended, ≥ 80% of words with an
    * alphabetic character, ≥ 2 distinct stop words. `passes` is the
    * conjunction.
    */
  def gopher(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import graft.queries.Par
    val stopsArr = array(GopherStops.map(lit): _*)
    val withToks = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
        split(col("text"), "\n").as("lines"))
      .filter(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("sum_len"),
        (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
          + (length(col("text"))
            - length(replace(col("text"), lit("..."), lit("")))) / 3)
          .as("n_symbols"),
        size(col("lines")).cast("long").as("n_lines"),
        expr("size(filter(lines, x -> ltrim(x) RLIKE '^[-•*]'))")
          .cast("long").as("n_bullet"),
        expr("size(filter(lines, x -> rtrim(x) RLIKE '([.]{3}|…)$'))")
          .cast("long").as("n_ellipsis"),
        expr("size(filter(toks, x -> x RLIKE '[a-z]'))")
          .cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(col("toks")), stopsArr))
          .cast("long").as("stop_hits"))
    val m = withToks.select(
      col("doc_id"), col("n_words"), col("stop_hits"),
      Par.r2(col("sum_len").cast("double") / col("n_words")).as("mean_word_len"),
      Par.r2(col("n_symbols").cast("double") / col("n_words")).as("symbol_ratio"),
      Par.r2(col("n_bullet").cast("double") / col("n_lines")).as("bullet_frac"),
      Par.r2(col("n_ellipsis").cast("double") / col("n_lines")).as("ellipsis_frac"),
      Par.r2(col("n_alpha").cast("double") / col("n_words")).as("alpha_frac"))
    m.select(col("doc_id"), col("n_words"), col("mean_word_len"),
      col("symbol_ratio"), col("bullet_frac"), col("ellipsis_frac"),
      col("alpha_frac"), col("stop_hits"),
      (col("n_words").between(50L, 100000L) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") <= 0.9 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2L).cast("int").as("passes"))
  }

  /** True when any analyzer token of the document is in the blocklist —
    * the C4-style "bad words" gate (Raffel et al. 2020 §2.2 run their
    * list over C4; every production crawl recipe carries one). Matching
    * is TOKEN-level, not substring-level, which is the semantic that
    * avoids the classic substring false positives (an innocent word
    * containing a listed word does not flag). `arrays_overlap` keeps the
    * whole gate a narrow scan-side predicate — the list is a plan
    * literal (the broadcast-free analogue of a tiny dim broadcast), so
    * there is no join and no shuffle at any corpus size.
    */
  def blocklistHit(toks: Column, words: Seq[String]): Column =
    arrays_overlap(toks, array(words.map(w => lit(w.toLowerCase)): _*))
}
