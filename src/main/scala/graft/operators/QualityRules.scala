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
    * symbol-to-word ratio ≤ 0.1 ('#', '...' and the Unicode ellipsis
    * '…' — the paper counts both ellipsis forms, and the ellipsis-line
    * rule below already accepts both), ≤ 90% of lines
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
        graft.functions.Ngrams.tokenLengthSum(col("toks")).as("sum_len"),
        (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
          + (length(col("text"))
            - length(replace(col("text"), lit("..."), lit("")))) / 3
          + (length(col("text"))
            - length(replace(col("text"), lit("…"), lit("")))))
          .as("n_symbols"),
        size(col("lines")).cast("long").as("n_lines"),
        // Compiled count kernels (round-15): the size(filter(...))
        // spelling evaluated its RLIKE lambda INTERPRETED per
        // line/token; these run the identical java.util.regex call
        // compiled and count in place (CountExprSpec pins equality).
        graft.functions.CountFunctions.countMatching(col("lines"),
            "^[-•*]", graft.functions.CountKernels.TrimLeft)
          .cast("long").as("n_bullet"),
        graft.functions.CountFunctions.countMatching(col("lines"),
            "([.]{3}|…)$", graft.functions.CountKernels.TrimRight)
          .cast("long").as("n_ellipsis"),
        graft.functions.CountFunctions.countMatching(col("toks"), "[a-z]")
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

  /** Gopher's A1.2 repetition thresholds, by n: top-gram character
    * fraction bounds for n = 2..4, duplicate-gram character fraction
    * bounds for n = 5..10 (Rae 2021, Table A1).
    */
  val RepetitionThresholds: Map[Int, Double] = Map(
    2 -> 0.20, 3 -> 0.18, 4 -> 0.16,
    5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The OTHER half of the Gopher filter set ([[gopher]] is A1.1):
    * the A1.2 repetition battery. Per document and gram size n:
    *
    *  - n = 2..4: characters of the MOST FREQUENT n-gram × its count,
    *    over total token characters (ties: lexicographically smallest
    *    gram — deterministic and engine-portable);
    *  - n = 5..10: characters of every n-gram occurrence whose gram
    *    appears ≥ 2 times, over total token characters (the standard
    *    occurrence-sum form of Gopher's duplicate-gram fraction —
    *    overlapping occurrences all count, like [[Bpe]]'s pair counts).
    *    STRICTER THAN THE PAPER by construction: Rae 2021 Table A1
    *    calibrated thresholds against non-overlapping character
    *    coverage, while the occurrence sum counts a character once per
    *    overlapping occurrence, so a pathological doc (e.g. one word
    *    repeated 50×) can exceed the paper's fraction and the gate
    *    over-fires relative to the calibration — a conservative bias
    *    for a quality FILTER (it only ever drops more). The reported
    *    fraction is capped at 1.0 so the metric stays interpretable as
    *    a share; the cap binds only in the already-over-threshold
    *    regime, so it cannot flip a `passes` bit (every threshold
    *    ≤ 0.15 ≪ 1.0).
    *
    * Character accounting is over TOKEN characters (gram chars =
    * length(gram) − (n−1) separators; total = summed token lengths), so
    * every numerator and denominator is an exact integer and only the
    * final ratio rounds ([[graft.queries.Par.r2]]) — the gate bit can't
    * flip between engines. Docs with zero analyzer tokens are excluded
    * (no denominator), and a doc shorter than n tokens scores 0 for
    * that n.
    *
    * Scale shape: guarded explodes over n = 2..10 (9× the token stream
    * — linear, the q71 trigram shape generalized) feeding two keyed
    * branches: the top bands (n ≤ 4) count grams by STRING (the lex
    * tie-break needs it; 2–4-grams are short) with the winner a
    * `min(struct(-count, gram))` partial aggregate — never a window
    * inside a document; the duplicate bands (n ≥ 5, ~6/9 of gram
    * volume and nearly all the bytes) hash each gram to a 60-bit
    * digest BEFORE the exchange (the q31/q87 shuffle-digests-not-
    * documents discipline — counting hash groups is q87's contract,
    * replayed by the oracle with the same portable h64). A literal-n
    * pivot folds the bands back to one row per doc.
    */
  def ngramRepetition(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import graft.queries.Par
    // ONE compiled pass per document (round-15,
    // [[graft.functions.GopherReps]]): every aggregation in the
    // previous plan was doc_id-keyed — nothing corpus-wide — so the
    // two band explodes, both (doc, n, key) exchanges, the union, and
    // the 9-way pivot reconstructed per-document state a local pass
    // already has. The plan is now a narrow projection + the caller's
    // sort: zero exchanges at any corpus size. Value identity with the
    // exchange spelling is pinned band-by-band in QualityRulesSpec
    // against [[ngramRepetitionViaExchange]].
    val ns = (2 to 10)
    val r = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        graft.functions.GopherFunctions.gopherRepetitionNums(col("toks")).as("r"))
    val wide = r.select(col("doc_id") +: ns.map(n =>
      least(Par.r2(col(s"r.num$n").cast("double") / col("r.tot")), lit(1.0))
        .as(metricName(n))): _*)
    val passes = ns.map(n => col(metricName(n)) <= RepetitionThresholds(n))
      .reduce(_ && _)
    wide.select(col("doc_id") +: ns.map(n => col(metricName(n))) :+
      passes.cast("int").as("passes"): _*)
  }

  /** The pre-round-15 exchange spelling of [[ngramRepetition]] —
    * retained SOLELY as the value-identity cross-check
    * (QualityRulesSpec pins the fused kernel against it on the real
    * corpus; the Bpe `encodedLenSumFold` precedent). Two band explodes + two
    * (doc, n, key) aggregations + union + pivot.
    */
  private[graft] def ngramRepetitionViaExchange(docs: DataFrame): DataFrame = {
    import graft.functions.Ngrams
    import graft.functions.TextFunctions.tokens
    import graft.queries.Par
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        graft.functions.Ngrams.tokenLengthSum(col("toks")).as("tot"))
    val ns = (2 to 10)
    // Codegen'd gram kernels (round-14): the guarded-transform HOF
    // spelling evaluated its lambda INTERPRETED per gram × 9 bands —
    // the single biggest constant factor in the registry (q153 was
    // 13.7% of the whole sf1 suite). Each band FAMILY is one fused
    // band generator ([[graft.functions.WordNgramBandsExpr]] /
    // [[graft.functions.WordNgramH64CharsBandsExpr]]): one array of
    // struct(n, …) rows per document, ONE explode — no per-band
    // intermediate arrays, no nested explode over an
    // array-of-struct-of-array. Values are value-identical to the HOF
    // spelling per band (NgramExprSpec pins the kernels), including
    // the short-doc empty bands the IF guard used to provide.
    // Top bands (n = 2..4) keep the gram STRING through the exchange —
    // the lexicographic tie-break needs it, and 2-4-grams are short.
    val topPerN = base.select(col("doc_id"), col("tot"),
        explode(Ngrams.wordNgramBands(col("toks"), 2, 4)).as("g"))
      .select(col("doc_id"), col("tot"), col("g.n").as("n"),
        col("g.gram").as("gram"))
      .groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("cnt"), min("tot").as("tot"))
      .withColumn("chars", (length(col("gram")) - (col("n") - 1)).cast("long"))
      .groupBy("doc_id", "n")
      .agg(min("tot").as("tot"),
        min(struct((-col("cnt")).as("negc"), col("gram").as("g"),
          col("chars").as("ch"))).as("top"))
      .select(col("doc_id"), col("n"), col("tot"),
        ((-col("top.negc")) * col("top.ch")).as("num"))
    // Duplicate bands (n = 5..10) need no tie-break, so the exchange
    // carries a 60-bit DIGEST + the char count instead of up-to-10-word
    // strings (the q31/q87 shuffle-digests-not-documents discipline —
    // at corpus scale the n >= 5 grams are ~6/9 of the gram volume and
    // nearly all of the bytes). Counting hash groups is the q87
    // contract; the oracle replays the same h64. These bands never see
    // the gram STRING at all: [[graft.functions.WordNgramH64CharsExpr]]
    // emits (h64, token-chars) per gram in one compiled pass — the
    // string + builtin-md5-hex + conv-parse chain the old spelling ran
    // per gram was ~40% of the key's remaining wall after the first
    // round-14 swap.
    val dupPerN = base.select(col("doc_id"), col("tot"),
        explode(Ngrams.wordNgramH64CharsBands(col("toks"), 5, 10)).as("g"))
      .select(col("doc_id"), col("tot"), col("g.n").as("n"),
        col("g.gh").as("gh"), col("g.chars").as("chars"))
      .groupBy("doc_id", "n", "gh")
      .agg(count(lit(1)).as("cnt"), min("chars").as("chars"),
        min("tot").as("tot"))
      .groupBy("doc_id", "n")
      .agg(min("tot").as("tot"),
        sum(when(col("cnt") >= 2, col("cnt") * col("chars"))
          .otherwise(lit(0L))).as("num"))
      .select(col("doc_id"), col("n"), col("tot"), col("num"))
    val perN = topPerN.union(dupPerN)
      .select(col("doc_id"), col("n"),
        least(Par.r2(col("num").cast("double") / col("tot")), lit(1.0))
          .as("frac"))
    val wide = base.select("doc_id")
      .join(perN.groupBy("doc_id").pivot("n", ns)
        .agg(first("frac")), Seq("doc_id"), "left")
      .na.fill(0.0, ns.map(_.toString))
    val metricCols = ns.map(n => col(n.toString).as(metricName(n)))
    val passes = ns.map(n => col(n.toString) <= RepetitionThresholds(n))
      .reduce(_ && _)
    wide.select(col("doc_id") +: metricCols :+
      passes.cast("int").as("passes"): _*)
  }

  private def metricName(n: Int): String =
    if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"

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

  /** Flesch reading-ease profile — the readability rung of the quality
    * family (Flesch 1948; used as a curation signal beside the Gopher
    * gates: school-grade text scores 60–80, dense technical or
    * boilerplate text drifts low or negative). Per-doc score
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * with the classic cheap estimators: words = analyzer tokens,
    * sentences = `[.!?]+` runs in the raw text (min 1), syllables =
    * vowel-group runs `[aeiouy]+` of the lowercased text (a run never
    * crosses a non-letter, so the whole-text count equals the per-word
    * sum — one regexp, no explode). Zero-token docs are excluded (no
    * denominator, the q41 exclusion).
    *
    * Returns the per-bucket profile (bucket = floor(score/10)):
    * n_docs + EXACT BIGINT word/sentence/syllable sums, plus
    * `bucket_flesch`, the score of the bucket's summed counts — the
    * aggregate score is computed FROM the exact sums (the q140
    * data-card discipline), never as a mean of per-doc doubles whose
    * summation order an external replayer can't reproduce. The per-doc
    * score itself is scalar double arithmetic in fixed op order over
    * exact integers, so the bucket assignment (a floor of a
    * deterministic double) is engine-portable.
    *
    * Scale shape: counting is a narrow scan-side projection (three
    * codegen'd regex passes, no explode); the profile is ONE mergeable
    * hash-agg keyed by ~40 buckets. No join, no window, no second
    * corpus pass at any scale.
    */
  def fleschProfile(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val counted = docs.select(
        size(tokens(col("text"))).cast("long").as("w"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("s"),
        regexp_count(lower(col("text")), lit("[aeiouy]+"))
          .cast("long").as("syl"))
      .filter(col("w") >= 1)
    def flesch(w: Column, s: Column, syl: Column): Column =
      lit(206.835) - lit(1.015) * (w.cast("double") / s.cast("double")) -
        lit(84.6) * (syl.cast("double") / w.cast("double"))
    counted
      .withColumn("bucket",
        floor(flesch(col("w"), col("s"), col("syl")) / 10.0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
        sum("s").as("sentences"), sum("syl").as("syllables"))
      .withColumn("bucket_flesch",
        flesch(col("words"), col("sentences"), col("syllables")))
  }
}
