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
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), x => x =!= "")

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
    * CCNet on a char-n-gram classifier). Pass a BOUND attribute (project
    * `lower(text)` under its own alias first): higher-order lambdas get
    * no common-subexpression elimination, so an unbound expression
    * argument would re-evaluate once per element. A string shorter than
    * n yields an empty array (`sequence(1, 0)` steps BACKWARD in Spark —
    * the q153 guard). DuckDB spelling (no guard needed — `range` is
    * empty when end ≤ start, and exclusive-end means `- n + 2`):
    * `list_transform(range(1, length(t) - n + 2), i -> substring(t, i, n))`.
    */
  def charNgrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word 3-shingles of a token array column named `toks`
    * (0-based Spark array indexing; requires size >= 3 — callers filter).
    */
  val shingleExpr: Column =
    expr("""array_distinct(transform(sequence(1, size(toks) - 2),
           |  g -> concat_ws(' ', toks[g-1], toks[g], toks[g+1])))""".stripMargin)
}
