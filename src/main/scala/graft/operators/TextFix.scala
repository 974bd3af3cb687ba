package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization/cleanup — the fix-the-bytes rung a curation
  * pipeline runs BEFORE tokenization and filtering (the ftfy/CCNet
  * preprocessing step: crawl text arrives with decomposed accents,
  * stray control bytes, and whitespace runs, and every downstream
  * signal — token counts, gram hashes, dedup — silently shifts if two
  * byte-different spellings of the same text reach it).
  *
  * Pipeline, in stated order (each step a narrow codegen'd expression
  * riding the text scan — zero shuffle):
  *
  *  1. Unicode NFC composition ([[graft.functions.NfcNormalizeExpr]] —
  *     `e` + COMBINING ACUTE becomes `é`, one codepoint, so gram
  *     hashes agree across spellings);
  *  2. control-character strip (C0 minus the whitespace family, plus
  *     DEL: `[\x00-\x08\x0B\x0E-\x1F\x7F]` — removed outright);
  *  3. whitespace squash (`[ \t\n\r\f]+` → one space — the explicit
  *     class, NOT `\s`, whose membership differs between Java regex
  *     and RE2 and would silently desync the oracle);
  *  4. edge trim.
  *
  * All patterns live in the Java-regex ∩ RE2 common subset (the
  * [[Redact]] discipline), and DuckDB's `nfc_normalize` matches
  * `java.text.Normalizer` NFC — the whole fix is oracle-replayable.
  */
object TextFix {

  val ControlPattern = "[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]"
  val WhitespacePattern = "[ \\t\\n\\r\\f]+"

  /** The cleaned text: NFC → strip control → squash whitespace → trim. */
  def fix(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.NormalizeFunctions.nfc(text),
        ControlPattern, ""),
      WhitespacePattern, " "))

  /** True when [[fix]] would change nothing — the cheap pre-filter for
    * a fix-only-the-dirty write pattern (most crawl text is clean; a
    * conditional rewrite touches only the dirty fraction).
    */
  def isClean(text: Column): Column = fix(text) === text

  /** Markup tag: `<` + anything tag-shaped up to the next `>`. The
    * first char is constrained ([A-Za-z/!?]) so a bare `<` in prose
    * ("5 < 7") survives extraction.
    */
  val TagPattern = "<[A-Za-z/!?][^>]*>"

  /** The 5 core character entities plus nbsp, decode order load-bearing:
    * `&amp;` LAST, so double-escaped text single-unescapes
    * (`&amp;lt;` → literal `&lt;`, never `<`).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Markup → text extraction (the WET-file step: what CCNet-class
    * pipelines consume is tag-stripped crawl payload, and every
    * downstream stage here — tokens, grams, dedup keys — assumes it
    * already happened). Tags become a space (so `a</p><p>b` keeps its
    * word boundary), entities decode once, whitespace re-squashes via
    * [[fix]]'s class. Narrow scan-side chain like the rest of the
    * module; the entity fold is literal `replace`, engine-portable.
    */
  def stripMarkup(text: Column): Column = {
    val untagged = regexp_replace(text, TagPattern, " ")
    val decoded = Entities.foldLeft(untagged) { case (acc, (e, c)) =>
      call_function("replace", acc, lit(e), lit(c))
    }
    trim(regexp_replace(decoded, WhitespacePattern, " "))
  }
}
