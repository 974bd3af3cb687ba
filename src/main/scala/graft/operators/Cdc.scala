package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking — the LBFS/FastCDC boundary rule (Muthitacharoen
  * 2001 §3.1 "A Low-Bandwidth Network File System"; Xia 2016 FastCDC)
  * applied at token granularity: a chunk boundary falls AFTER token
  * `g + k − 1` wherever the k-gram hash at gram position `g` satisfies
  * `h ≡ 0 (mod m)` — so boundaries are a pure function of LOCAL content.
  * That is the property that separates CDC from fixed-size or structural
  * splitting (q90's chunker, q138's paragraphs): inserting or deleting a
  * token re-chunks only the neighborhood of the edit, leaving every other
  * chunk byte-identical — which is what makes chunk-hash dedup catch
  * SHIFTED duplication (boilerplate that moves around inside documents)
  * that paragraph keys miss and that whole-doc hashes (q31/q42) can never
  * see. With a uniform hash a boundary fires at each gram with
  * probability 1/m, so the expected chunk length is ~m tokens — tunable
  * by the modulus alone.
  *
  * Portability: gram hashes and chunk keys are the house 60-bit
  * md5-derived h64 ([[graft.functions.TextFunctions.h64]]) and boundary
  * selection is integer modular arithmetic — no doubles anywhere, so the
  * chunking replays bit-exactly in the DuckDB oracle (q174).
  *
  * Scale shape: [[chunks]] is entirely narrow per-document array
  * expressions riding the scan (the [[Winnow]] pattern) — ZERO shuffle at
  * any corpus size; [[dupReport]] is one chunk-keyed hash-agg (mergeable
  * counts over 60-bit keys, never chunk TEXT — the shuffle carries 24
  * bytes per chunk) plus a TakeOrderedAndProject report cut.
  */
object Cdc {

  private def h64Sql(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"

  /** Content-defined chunks of each document: (doc_id, idx, ch, n_toks)
    * with `idx` the 1-based chunk index, `ch` the h64 of the chunk's
    * space-joined tokens and `n_toks` its token count. `toks` carries
    * (doc_id, toks); zero-token documents yield no rows, documents
    * shorter than the gram size are one whole-doc chunk, and the final
    * chunk always closes at the document end (a tail without a content
    * boundary is still a chunk).
    */
  def chunks(toks: DataFrame, k: Int = 3, mod: Int = 64): DataFrame = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(mod >= 2, s"boundary modulus must be >= 2, got $mod")
    // Fused codegen'd gram-hash kernel (round-14; was an interpreted
    // transform HOF running md5 per gram). minOne = true replays the
    // clamped range the HOF spelled as greatest(size - k + 1, 1): a
    // sub-k doc yields ONE gram over whatever tokens exist (out-of-
    // range positions read as absent, the get()+concat_ws-null-skip
    // semantics — NgramExprSpec pins the lane), and the top-level IF
    // below still never reads that garbage hash.
    val gh = graft.functions.Ngrams.wordNgramH64s(col("toks"), k, minOne = true)
    val e0 = s"transform(filter(sequence(1, size(gh)), " +
      s"g -> element_at(gh, g) % $mod = 0), g -> g + ${k - 1})"
    val ends = s"IF(size(e0) > 0 AND element_at(e0, size(e0)) = size(toks), " +
      s"e0, concat(e0, array(size(toks))))"
    val spans =
      s"""IF(size(toks) < $k,
         |  array(named_struct('s', 1, 'e', size(toks))),
         |  transform(sequence(1, size(ends)), i -> named_struct(
         |    's', IF(i = 1, 1, element_at(ends, i - 1) + 1),
         |    'e', element_at(ends, i))))""".stripMargin
    toks
      .filter(size(col("toks")) >= 1)
      .withColumn("gh", gh)
      .withColumn("e0", expr(e0))
      .withColumn("ends", expr(ends))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(spans)).as(Seq("i0", "sp")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("idx"),
        expr(s"${h64Sql("concat_ws(' ', slice(toks, sp.s, sp.e - sp.s + 1))")}").as("ch"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("n_toks"))
  }

  /** Chunk-level duplication report from a [[chunks]] output: the top
    * `topN` duplicated chunk keys by (occurrences desc, key asc) —
    * (ch, n_occ, n_docs, n_toks) — each row carrying the corpus totals
    * (n_chunks, n_distinct, dup_tokens, total_tokens), where
    * `dup_tokens` counts every occurrence beyond a chunk's first (the
    * tokens CDC dedup would store once).
    */
  def dupReport(chunks: DataFrame, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    // One chunk-keyed agg, checkpointed for its two consumers (the
    // totals and the report cut) — the byh frame is distinct-chunk-
    // sized, far below corpus scale.
    val byh = chunks.groupBy("ch").agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("n_toks")).as("n_toks"))
      .localCheckpoint()
    val stats = byh.agg(
      sum(col("n_occ")).as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      sum((col("n_occ") - 1) * col("n_toks")).as("dup_tokens"),
      sum(col("n_occ") * col("n_toks")).as("total_tokens"))
    byh.orderBy(col("n_occ").desc, col("ch")).limit(topN)
      .crossJoin(broadcast(stats))
  }
}
