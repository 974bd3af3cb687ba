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
    * Backed by the fused codegen'd [[graft.functions.Int8CodesExpr]]
    * (two O(d) passes); a Column-combinator spelling would re-evaluate
    * the per-vector max inside the per-element lambda — O(d²).
    */
  def int8Codes(v: Column): Column =
    graft.functions.VectorFunctions.quantize_i8(v)

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
    * Stage 1 scores only int8 codes (integer arithmetic) and keeps
    * `shortlist` candidates per probe; stage 2 fetches float vectors
    * for those candidates (a join on the candidate ids) and re-scores
    * exactly — norms included, computed AFTER the candidate join, so
    * full-precision arithmetic runs on O(probes × shortlist) rows.
    * With `shortlist` a small multiple of k, stage 2 returns the true
    * float top-k whenever quantization error is below the probe's
    * k-th/shortlist-th cosine gap — the standard retrieve-then-rerank
    * trade.
    *
    * Pass `coded` (id, codes — from [[int8Codes]], quantize ONCE and
    * reuse) to keep stage 1 off the float corpus entirely; without it
    * this convenience form codes the corpus inline, which scans the
    * float bytes once — correct, but the bandwidth win only
    * materializes with a pre-coded corpus.
    *
    * `corpus`/`probes`: (id: bigint, embedding: array<float>).
    * Returns (probe_id, neighbor_id, cos, rnk) with exact float
    * cosines, ties on neighbor_id.
    */
  def topKReranked(corpus: DataFrame, probes: DataFrame, k: Int,
      shortlist: Int, coded: Option[DataFrame] = None): DataFrame = {
    import graft.functions.VectorFunctions.{dot_f, norm_f}
    val codedCorpus = coded.getOrElse(
      corpus.select(col("id"), int8Codes(col("embedding")).as("codes")))
    val cand = topKQuantized(codedCorpus,
        probes.select(col("id"), int8Codes(col("embedding")).as("codes")),
        shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    // Float vectors join in by candidate id; the corpus-side norm is
    // computed on the joined (candidate) rows only — pulling it below
    // the join would fold norms for every corpus row. The candidate
    // list is the BROADCAST side (O(probes × shortlist) ids): left to
    // static planning, the window-derived cand has no size stats and
    // the join would sort-merge — shuffling every corpus float vector,
    // exactly the byte traffic stage 1 exists to avoid.
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("eb"))
    val p = probes.select(col("id").as("probe_id"), col("embedding").as("ea"),
      norm_f(col("embedding")).as("na"))
    val scored = c.join(broadcast(cand), "neighbor_id").join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cosSafe(dot_f(col("ea"), col("eb")),
          col("na"), norm_f(col("eb"))).as("cos"))
    Similarity.topKByScore(scored, "cos", k)
  }

  /** Top-k neighbors per probe by quantized cosine, brute force over the
    * coded corpus with the probe set broadcast — the q33 shape on 1/4 of
    * the bytes, sharing its rank-and-cut skeleton
    * ([[Similarity.topKByScore]]: map-side partial top-k, then a final
    * re-rank). `corpus`/`probes`: (id: bigint, codes: array<long>).
    */
  def topKQuantized(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val sqn = (c: Column) => intDot(c, c) // squared integer norm
    val cAll = corpus.select(col("id").as("neighbor_id"), col("codes").as("qb"),
      sqn(col("codes")).as("nb"))
    val pAll = probes.select(col("id").as("probe_id"), col("codes").as("qa"),
      sqn(col("codes")).as("na"))
    val scored = cAll.join(broadcast(pAll), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        quantizedCos(col("qa"), col("na"), col("qb"), col("nb")).as("qcos"))
    Similarity.topKByScore(scored, "qcos", k)
  }
}
