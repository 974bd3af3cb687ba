package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
  * ("Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
  * algorithm): hash every token k-gram, slide a window of `w`
  * consecutive hashes, and select each window's MINIMUM (rightmost
  * occurrence on ties), deduplicating selections shared by adjacent
  * windows. The selected set is the document's fingerprint, with the
  * paper's guarantee: any match of length ≥ w + k − 1 tokens between
  * two documents shares at least one selected fingerprint, while the
  * expected density is only 2/(w+1) of the grams — a sparse sketch
  * with a HARD detection floor, which is what separates winnowing from
  * plain min-sampling (q43's MinHash estimates resemblance; this
  * GUARANTEES local-match detection).
  *
  * Complements the dedup ladder: q42 fingerprints the whole doc (exact
  * dup), q43/q44 estimate set resemblance, q87 marks exact spans at
  * full gram density — winnowing is the plagiarism/overlap DETECTOR:
  * w+k−1 is the smallest overlap it promises to see, at ~2/(w+1) of
  * span-dedup's index size.
  *
  * Portability: gram hashes are the house 60-bit md5-derived
  * [[graft.functions.TextFunctions.h64]] (bit-equal in DuckDB), and
  * selection is pure integer argmin — no doubles anywhere, so the
  * fingerprint set replays exactly.
  *
  * Scale shape: [[fingerprints]] is entirely narrow per-document array
  * expressions riding the scan — ZERO shuffle at any corpus size (the
  * window scope is the document). [[sharedPairs]] joins selected
  * fingerprints like an LSH band join: a document-frequency cap drops
  * boilerplate fingerprints BEFORE the self-join (MOSS's own
  * "ignore fingerprints in too many documents" rule), bounding each
  * key's pair fan-out at maxDf², so no hot shared phrase can go
  * quadratic.
  */
object Winnow {

  /** Selected fingerprints of each document: (doc_id, pos, fp) where
    * `pos` is the 1-based gram index of the selected occurrence and
    * `fp` its h64 gram hash. `toks` carries (doc_id, toks). Documents
    * with fewer than k tokens yield no rows; documents with fewer than
    * w grams are one window (their global minimum is selected). Ties
    * inside a window select the RIGHTMOST occurrence (the paper's
    * rule); adjacent windows selecting the same (pos, fp) collapse to
    * one row.
    */
  def fingerprints(toks: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(w >= 1, s"window size must be >= 1, got $w")
    // Fused codegen'd gram-hash kernel (round-14): the transform HOF
    // ran md5 per gram through an interpreted lambda;
    // [[graft.functions.WordNgramH64Expr]] builds and hashes each gram
    // in one compiled pass without materializing the string
    // (value-identity pinned in NgramExprSpec).
    val gh = graft.functions.Ngrams.wordNgramH64s(col("toks"), k)
    // One window when n <= w, else n - w + 1; minimum per window with
    // the RIGHTMOST occurrence on ties (the paper's rule), adjacent
    // duplicate selections collapsed. Round-14: selection is the
    // codegen'd monotonic-deque sliding minimum
    // ([[graft.functions.WinnowSelectExpr]]) — O(n) compiled, replacing
    // an interpreted aggregate-fold per window (O(n·w) lambda evals on
    // the corpus scan; WinnowSpec pins value-identity against that SQL
    // spelling, and q164 hash-gates it corpus-wide).
    toks
      .filter(size(col("toks")) >= k)
      .withColumn("gh", gh)
      .select(col("doc_id"),
        explode(graft.functions.WinnowFunctions.winnowSelect(col("gh"), w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Cross-document overlap candidates from a [[fingerprints]] output:
    * (doc_a, doc_b, shared) with doc_a < doc_b and `shared` the count
    * of distinct fingerprint VALUES the pair selects in common.
    * Fingerprints selected by more than `maxDf` documents are dropped
    * before pairing (boilerplate suppression + the quadratic guard);
    * position is ignored — a fingerprint is a content witness, not a
    * location.
    */
  def sharedPairs(fps: DataFrame, maxDf: Int): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 to form any pair, got $maxDf")
    // Three consumers (the df gate + both self-join sides) — without a
    // cut the narrow-but-hot fingerprint extraction (gram hashing +
    // interpreted HOF window argmin) replays per consumer, 3 corpus
    // passes instead of 1 (the Decontaminate/components discipline;
    // localCheckpoint, not cache, so the lineage is truncated too).
    val dfp = fps.select(col("doc_id"), col("fp")).distinct().localCheckpoint()
    val keep = dfp.groupBy("fp").agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") >= 2 && col("dfc") <= maxDf)
      .select("fp")
    val kept = dfp.join(keep, "fp")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
  }
}
