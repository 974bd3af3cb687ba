package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Within-document repeated-line removal — the Dolma/C4-style
  * boilerplate rung BELOW [[ParagraphDedup]]'s corpus-wide pass: inside
  * one document, every exact repeat of an earlier NON-BLANK line (nav
  * menus, cookie banners, footer blocks repeated per page section) is
  * dropped, keeping the FIRST occurrence. Empty and whitespace-only
  * lines are exempt — they are paragraph breaks, not boilerplate, and
  * deduping them would collapse `a\n\nb\n\nc` into `a\n\nb\nc`
  * (Dolma's and C4's line filters likewise operate on non-empty
  * lines). Complements q71 (repeated trigrams — a signal, not a
  * transform) and q138 (corpus-wide paragraph keys — a shuffle on the
  * paragraph hash): this rung needs no key exchange at all, because
  * the dedup scope is the document itself.
  *
  * Scale shape: pure narrow array expressions riding the text scan —
  * split, keep-first filter, re-join; zero shuffle at any corpus size.
  * Keep-first is expressed positionally (`filter` with the index
  * lambda: keep line i iff it is blank or `array_position` of its
  * first occurrence is i) — O(lines²) within one document, linear
  * across the corpus; the oracle replays the same rule via
  * min(ordinality) over non-blank lines, so any order drift would
  * hash-fail the gate.
  *
  * The reference has no curation surface (its transform is a
  * per-record identity/status map, `kds_example/lbd/common.py:7-33`);
  * this operator extends the pipeline the way every production crawl
  * pipeline does.
  */
object LineDedup {

  /** Newline-split lines, empty tail preserved (limit -1). */
  def lines(text: Column): Column = split(text, "\n", -1)

  /** Positional keep mask: blank lines always survive; a non-blank
    * line survives iff this index is its first occurrence.
    */
  private def keptLines(text: Column): Column = {
    val ls = lines(text)
    filter(ls, (x, i) => trim(x) === "" || array_position(ls, x) === i + 1)
  }

  /** The text with every repeat of an earlier non-blank line removed
    * (blank/whitespace-only lines — paragraph breaks — all survive,
    * in position).
    */
  def dedupLines(text: Column): Column = array_join(keptLines(text), "\n")

  /** (n_lines, n_kept_lines, dup_char_frac): line counts plus the
    * fraction of characters removed by the dedup — the per-doc
    * boilerplate-share signal (r2-rounded for portability; 0.0 for an
    * empty doc). Character accounting includes the removed lines'
    * newlines: length(text) − length(deduped). The rounding fold is
    * `floor(diff / len * 100 + 0.5) / 100` — the oracle replays the
    * SAME IEEE op order (divide first, then scale), the repo's
    * identical-fold portability rule.
    */
  def lineStats(text: Column): (Column, Column, Column) = {
    val n = size(lines(text)).cast("bigint")
    val u = size(keptLines(text)).cast("bigint")
    val frac = when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(dedupLines(text))).cast("double") /
        length(text).cast("double"))
    (n, u, floor(frac * 100 + lit(0.5)) / 100)
  }
}
