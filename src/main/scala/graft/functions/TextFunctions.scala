package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing primitives shared by the LLM-data-pipeline operators
  * (SURVEY.md §2B Q31–Q35 and the extended training-data queries).
  *
  * Everything here is pure Catalyst expressions (codegen'd, no UDFs) and —
  * critically for the DuckDB oracle — engine-portable: the 64-bit hash is
  * derived from md5 (identical bytes in any engine) rather than Spark's
  * murmur3 `hash()`, which DuckDB cannot reproduce.
  */
object TextFunctions {

  /** Lowercased word tokens; empty strings from consecutive separators are
    * dropped (mirrors `list_filter(string_split_regex(lower(x),'\W+'), ...)`).
    *
    * Spelled as ONE codegen'd regex extraction rather than
    * `filter(split(lower(x), '\\W+'), x -> x <> '')`: the filter is a
    * higher-order function whose lambda evaluates INTERPRETED per
    * token, and tokens() sits on the scan side of nearly every text
    * key (round-14 sweep). The two spellings are identical by
    * construction — the non-empty pieces between `\W+` separators ARE
    * the maximal `\w+` runs, under the same Java regex engine and the
    * same default flags — and every consumer is hash-gated against the
    * unchanged DuckDB `list_filter(string_split_regex(...))` oracle.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\w+"), lit(0))

  /** Portable 64-bit hash: first 15 hex digits of md5 → bigint (60 bits,
    * always positive). DuckDB spelling:
    * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`.
    */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL fragment of [[h64]] for oracle strings (DuckDB dialect).
    * Null-guarded to match Spark's null-in-null-out: DuckDB's concat()
    * SKIPS null arguments, so without the CASE a NULL input becomes
    * CAST('0x' AS BIGINT) — a hard conversion error that aborts the
    * whole oracle query instead of yielding a comparable NULL.
    */
  def h64sql(e: String): String =
    s"CASE WHEN $e IS NULL THEN NULL ELSE CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT) END"

  /** Character n-grams (overlapping, order-preserving) of a string
    * column — the fastText-style langid feature (Wenzek 2020 §2 gates
    * CCNet on a char-n-gram classifier). Round-14: one compiled
    * code-point sliding window ([[CharNgramsExpr]]). History of the
    * spelling, each step hash-gated identical: the obvious
    * `transform(sequence(...), i -> substr(...))` HOF evaluates its
    * lambda INTERPRETED per element; the round-13 regex-lookahead pass
    * `(?s)(?=(.{n})).` measured ~6× faster than that — but the regex
    * engine still runs a match attempt per position, and the kernel
    * removes it entirely. Substring semantics: every codepoint
    * position with ≥ n codepoints remaining; shorter strings yield an
    * empty array. The oracle replays plain substrings,
    * `list_transform(range(1, length(t) - n + 2), i -> substring(t, i, n))`,
    * and the hash gate proves the spellings agree.
    */
  def charNgrams(s: Column, n: Int): Column = Ngrams.charNgrams(s, n)

  /** Distinct word 3-shingles of a token array column named `toks`
    * (requires size >= 3 — callers filter; shorter docs now yield an
    * empty array rather than relying on the filter). Codegen'd kernel
    * ([[WordNgramsExpr]], round-14): the transform(sequence(...)) HOF
    * spelling evaluated interpreted per shingle on the q32 pair-graph
    * backbone; the kernel is value-identical (NgramExprSpec).
    */
  val shingleExpr: Column =
    array_distinct(Ngrams.wordNgrams(col("toks"), 3))
}
