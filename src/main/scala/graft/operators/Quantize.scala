package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the memory-bound
  * scale path for similarity search.
  *
  * At 100 TB an embedding corpus is dominated by vector bytes: a
  * float32 d=1024 vector is 4 KiB; its int8 form is 1 KiB. Per-vector
  * symmetric scalar quantization (`q[i] = round(x[i] * 127 / max|x|)`)
  * keeps every component in [-127, 127] with one scale per vector —
  * the standard first rung of the quantization ladder (below it: PQ/OPQ
  * codebooks, which trade more recall for more compression).
  *
  * Two properties make it the right engine primitive:
  *  - **cosine is scale-invariant**: `cos(q_a/s_a, q_b/s_b) =
  *    dot(q_a,q_b) / (|q_a||q_b|)` — the per-vector scales cancel, so
  *    quantized search never needs the scales at all and the whole
  *    score is INTEGER arithmetic (exact, overflow-safe: |dot| <=
  *    127*127*d), portable bit-for-bit across engines and hardware.
  *    A float path drifts by summation order; an int path cannot.
  *  - the quantized column rides every existing ANN operator
  *    ([[Similarity]] LSH buckets, [[Ivf]] cells) unchanged — quantize
  *    once, search cheap, optionally re-rank the short candidate list
  *    with the full-precision vectors (the classic two-stage retrieval).
  *
  * Quantization math is all DOUBLE (each float widened once) with
  * explicit `floor(x + 0.5)` rounding, so an external oracle reproduces
  * the codes exactly — no dependence on an engine's round-half-to-even
  * default.
  */
object Quantize {

  /** `int8Codes(col)` — per-vector symmetric int8 codes as array<long>
    * (long keeps downstream integer dot products in one type; values
    * are in [-127, 127]). An all-zero vector quantizes to all zeros.
    */
  def int8Codes(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    transform(v, x =>
      when(mx === 0.0, lit(0L)).otherwise(
        least(lit(127L), greatest(lit(-127L),
          floor(x.cast("double") * 127.0 / mx + 0.5).cast("long")))))
  }

  /** Exact integer dot product of two code vectors — the codegen'd
    * [[graft.functions.DotProductL]] (a fused primitive loop; the
    * `aggregate(zip_with(...))` spelling pays interpreted lambdas and
    * an intermediate array per row-pair, which is the whole runtime of
    * a brute-force scorer).
    */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_l(a, b)

  /** Quantized cosine: integer dot over integer norms, zero-norm pairs
    * pinned to -1.0 (same contract as [[Similarity.cosSafe]] — a
    * directionless vector ranks last, never NaN).
    */
  def quantizedCos(qa: Column, na: Column, qb: Column, nb: Column): Column =
    when(na === 0L || nb === 0L, lit(-1.0))
      .otherwise(intDot(qa, qb).cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))

  /** Two-stage retrieval: quantized shortlist, full-precision re-rank.
    *
    * Stage 1 scans only the int8 codes (1/4 of the bytes, integer
    * score) and keeps `shortlist` candidates per probe; stage 2 fetches
    * float vectors for those few candidates (a join on the candidate
    * ids — O(probes × shortlist) rows, never the corpus) and re-scores
    * exactly. With `shortlist` a small multiple of k, stage 2 returns
    * the true float top-k whenever quantization error is below the
    * probe's k-th/shortlist-th cosine gap — the standard
    * retrieve-then-rerank trade: full-precision bytes are touched for
    * ~shortlist rows per probe instead of the whole corpus.
    *
    * `corpus`/`probes`: (id: bigint, embedding: array<float>).
    * Returns (probe_id, neighbor_id, cos, rnk) with exact float
    * cosines, ties on neighbor_id.
    */
  def topKReranked(corpus: DataFrame, probes: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.{dot_f, norm_f}
    val cand = topKQuantized(
        corpus.select(col("id"), int8Codes(col("embedding")).as("codes")),
        probes.select(col("id"), int8Codes(col("embedding")).as("codes")),
        shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("eb"),
      norm_f(col("embedding")).as("nb"))
    val p = probes.select(col("id").as("probe_id"), col("embedding").as("ea"),
      norm_f(col("embedding")).as("na"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(c, "neighbor_id").join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cosSafe(dot_f(col("ea"), col("eb")), col("na"), col("nb")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Top-k neighbors per probe by quantized cosine, brute force over the
    * coded corpus with the probe set broadcast — the q33 shape on 1/4 of
    * the bytes. `corpus`/`probes`: (id: bigint, codes: array<long>).
    */
  def topKQuantized(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val sqn = (c: Column) => intDot(c, c) // squared integer norm
    val cAll = corpus.select(col("id").as("neighbor_id"), col("codes").as("qb"),
      sqn(col("codes")).as("nb"))
    val pAll = probes.select(col("id").as("probe_id"), col("codes").as("qa"),
      sqn(col("codes")).as("na"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("qcos").desc, col("neighbor_id"))
    cAll.join(broadcast(pAll), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        quantizedCos(col("qa"), col("na"), col("qb"), col("nb")).as("qcos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
