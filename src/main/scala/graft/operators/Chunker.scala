package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.h64

/** Fixed-size overlapping token chunking — the corpus-preparation stage
  * between curation and indexing: retrieval corpora (and context-window
  * packing, q68's companion) operate on bounded chunks, not whole
  * documents, and overlap (stride &lt; size) keeps answers that straddle a
  * boundary findable. The reference indexes whole records (its payloads
  * are small envelopes); a document engine needs the splitter.
  *
  * Pure narrow explode — zero shuffle, scales as a scan. Chunk starts
  * are 0, stride, 2·stride, … while &lt; |doc| (the tail chunk may be
  * short; every token is covered exactly ⌈size/stride⌉ times in the
  * interior). The chunk content is carried as a portable hash of the
  * space-joined tokens: downstream stages key on (doc_id, chunk_id) and
  * re-slice lazily, so chunk text is never duplicated across the
  * pipeline — at 100 TB, materializing size/stride ≈ 1.3× copies of the
  * corpus into a chunk table is the naive-splitter mistake this layout
  * avoids.
  */
object Chunker {

  /** The chunking rule itself: (doc_id, chunk_id, start_tok, ctoks)
    * with `ctoks` the chunk's token slice — the ONE place the
    * start/stride/slice contract lives. [[chunks]] projects it to the
    * hashed catalog row; retrieval consumers (q93's passage BM25) score
    * `ctoks` directly.
    */
  def chunkTokens(toks: DataFrame, size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size], got $stride")
    toks.filter(org.apache.spark.sql.functions.size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - 1, $stride)")).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("bigint").as("chunk_id"),
        col("start_tok").cast("bigint").as("start_tok"),
        expr(s"slice(toks, start_tok + 1, $size)").as("ctoks"))
  }

  /** (doc_id, chunk_id, start_tok, n_tok, chunk_hash) for every chunk
    * of `toks` = (doc_id, toks: array&lt;string&gt;). Docs with zero tokens
    * emit nothing.
    */
  def chunks(toks: DataFrame, size: Int, stride: Int): DataFrame =
    chunkTokens(toks, size, stride)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("ctoks")).cast("bigint").as("n_tok"),
        h64(concat(lit("ck|"), concat_ws(" ", col("ctoks")))).as("chunk_hash"))
}
