package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Within-document repeated-line removal — the Dolma/C4-style
  * boilerplate rung BELOW [[ParagraphDedup]]'s corpus-wide pass: inside
  * one document, every exact repeat of an earlier line (nav menus,
  * cookie banners, footer blocks repeated per page section) is dropped,
  * keeping the FIRST occurrence. Complements q71 (repeated trigrams —
  * a signal, not a transform) and q138 (corpus-wide paragraph keys —
  * a shuffle on the paragraph hash): this rung needs no key exchange at
  * all, because the dedup scope is the document itself.
  *
  * Scale shape: pure narrow array expressions riding the text scan —
  * split, order-preserving first-occurrence distinct, re-join; zero
  * shuffle at any corpus size. The keep-first contract is Spark's
  * `array_distinct` (documented de-dup, first-occurrence order — the
  * oracle replays it positionally via min(ordinality), so any order
  * drift would hash-fail the gate).
  *
  * The reference has no curation surface (its transform is a status
  * map, `lbd/s08_s3_backup/lbd/agg.py`-class per-record handling);
  * this operator extends the pipeline the way every production crawl
  * pipeline does.
  */
object LineDedup {

  /** Newline-split lines, empty tail preserved (limit -1). */
  def lines(text: Column): Column = split(text, "\n", -1)

  /** The text with every repeat of an earlier line removed. */
  def dedupLines(text: Column): Column =
    array_join(array_distinct(lines(text)), "\n")

  /** (n_lines, n_uniq_lines, dup_char_frac): line counts plus the
    * fraction of characters removed by the dedup — the per-doc
    * boilerplate-share signal (r2-rounded for portability; 0.0 for an
    * empty doc). Character accounting includes the removed lines'
    * newlines: length(text) − length(deduped).
    */
  def lineStats(text: Column): (Column, Column, Column) = {
    val n = size(lines(text)).cast("bigint")
    val u = size(array_distinct(lines(text))).cast("bigint")
    val frac = when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(dedupLines(text))).cast("double") /
        length(text).cast("double"))
    (n, u, floor(frac * 100 + lit(0.5)) / 100)
  }
}
