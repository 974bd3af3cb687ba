package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication — the rung between whole-document
  * exact dedup ([[graft.queries.TrainingData]] q31) and substring span
  * dedup ([[SpanDedup]]): CCNet (Wenzek 2020 §2) and Dolma
  * (Soldaini 2024 §3.2) both hash each newline-delimited paragraph and
  * drop every occurrence after the first, which removes boilerplate
  * (nav bars, cookie banners, footers) that repeats across millions of
  * pages without touching the documents that carry it.
  *
  * Plan shape (the q81 gram discipline): explode paragraphs (narrow),
  * ONE hash-agg on the paragraph key — `count` and `min(struct)` are
  * both algebraic, so Spark partial-aggregates map-side and a
  * boilerplate paragraph occurring a billion times arrives at its
  * reducer as one partial per map task, never a billion rows — then one
  * key-partitioned join back to attach each occurrence's verdict. The
  * join-back probe side IS hot on mega-duplicated keys; its per-row
  * work is a constant-width attach, and AQE's skew-join split handles
  * the residual partition imbalance (the same accepted shape as q81).
  *
  * The key is the full 128-bit `md5` hex of the paragraph, not the
  * 60-bit [[graft.functions.TextFunctions.h64]]: at 100 TB (~2^31
  * distinct paragraphs) a 60-bit key has birthday-collision odds near
  * 1, which would silently merge unrelated paragraphs; 128 bits keeps
  * them negligible and DuckDB's `md5()` replays it byte-for-byte.
  */
object ParagraphDedup {

  /** (doc_id, para_idx, para): raw `\n`-split position (0-based, stable
    * provenance into the source text), whitespace-trimmed content,
    * empty/blank paragraphs dropped.
    */
  def paragraphs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("para_idx", "para")))
      .select(col("doc_id"), col("para_idx").cast("long").as("para_idx"),
        trim(col("para")).as("para"))
      .filter(col("para") =!= "")

  /** Per-occurrence dedup verdicts: doc_id, para_idx, occ (corpus-wide
    * occurrence count of this paragraph), keep (1 iff this occurrence
    * is the canonical first — smallest (doc_id, para_idx) — so keeping
    * exactly the `keep=1` rows removes every duplicated paragraph once
    * and leaves singletons untouched).
    */
  def dedup(docs: DataFrame): DataFrame = {
    val p = paragraphs(docs)
      .select(col("doc_id"), col("para_idx"), md5(col("para")).as("ph"))
    val stats = p.groupBy("ph").agg(
      count(lit(1)).as("occ"),
      min(struct(col("doc_id"), col("para_idx"))).as("first"))
    p.join(stats, "ph")
      .select(col("doc_id"), col("para_idx"), col("occ"),
        (col("doc_id") === col("first.doc_id") &&
          col("para_idx") === col("first.para_idx")).cast("int").as("keep"))
  }
}
