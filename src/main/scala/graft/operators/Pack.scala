package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing — the "concatenate the corpus and slice
  * fixed-length context windows" step that turns a curated document
  * set into model-ready training sequences (the GPT-2/T5 packing
  * recipe; see also Krell et al. 2021, "Efficient Sequence Packing").
  * The reference pipeline stops at delivering curated documents
  * (`kds_example/lbd/common.py:24-30` emits newline-terminated JSON
  * records that land as NDJSON batches); this is the rung a training
  * consumer runs immediately after.
  *
  * The corpus is laid out as one virtual token stream in ascending
  * `doc_id` order; sequence `i` is the token span
  * `[i*seqLen, (i+1)*seqLen)`. Each document maps to the sequences its
  * span intersects — `seq_first`/`seq_last`/`n_seqs` — which is both
  * the shard map a loader needs (which sequences contain doc X) and
  * the attrition account (a doc spanning many sequences crosses that
  * many boundaries).
  *
  * Scale shape: the ONLY corpus-wide dependency is the running token
  * total, computed by [[PrefixSum]]'s two-phase distributed form
  * (range exchange → P-long driver offsets → narrow add) — never a
  * single-partition `sum() OVER (ORDER BY ...)` window. Everything
  * after the prefix sum is a narrow projection. Zero-token docs are
  * excluded up front (they occupy no span; keeping them would emit an
  * inverted `seq_last < seq_first` row).
  */
object Pack {

  /** Map each doc of (doc_id, n_tokens) to its packed-sequence span.
    * Output: doc_id, n_tokens, start_tok (0-based offset in the
    * virtual stream), seq_first, seq_last, n_seqs.
    */
  def sequenceSpans(counts: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val c = PrefixSum.withRunningTotal(
      counts.filter(col("n_tokens") > 0), "doc_id", "n_tokens", "cum_tokens")
    // Token offsets stay well under 2^53 (100 TB of text is ~2^45
    // tokens), so the floor-of-double division below is exact and
    // engine-portable; integer division would be too, but the oracle's
    // `/` is double division, so both sides spell it the same way.
    val start = col("cum_tokens") - col("n_tokens")
    c.select(
      col("doc_id"), col("n_tokens"), start.as("start_tok"),
      floor(start / lit(seqLen.toDouble)).cast("long").as("seq_first"),
      floor((col("cum_tokens") - 1) / lit(seqLen.toDouble)).cast("long")
        .as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Deterministic training shard plan over (doc_id, n_toks): the
    * reproducible global shuffle a training run applies after packing.
    * Every doc gets `shard` (portable 60-bit hash of a salted doc_id,
    * mod `nShards`) and `sort_key` (an independent salted hash — the
    * within-shard shuffle order), plus its shard's doc/token totals
    * (the load-balance account: hash sharding keeps shards within
    * sampling noise of each other, and the totals PROVE it per run).
    *
    * Scale shape: shard/key are narrow projections; a writer
    * `repartition($"shard").sortWithinPartitions($"sort_key")`s —
    * never a rank window within a shard, which would put a whole
    * shard's docs in one task. The totals aggregate is mergeable and
    * nShards-sized; it broadcasts back onto the plan.
    */
  def shardPlan(counts: DataFrame, nShards: Int): DataFrame =
    withShardPlan(counts, nShards)
      .select("doc_id", "shard", "sort_key", "n_toks",
        "shard_docs", "shard_tokens")

  /** [[shardPlan]] with the input's OTHER columns preserved — the form
    * a chained pipeline composes (q154 appends shard assignment to the
    * packing spans without a doc-keyed self-join: shard/sort_key are
    * narrow projections and the nShards-sized totals broadcast back,
    * so chaining adds ONE mergeable aggregate to the upstream plan and
    * no new corpus shuffle).
    */
  def withShardPlan(counts: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import graft.functions.TextFunctions.h64
    // h64 is always non-negative (60-bit), so % needs no pmod guard.
    val planned = counts
      .withColumn("shard",
        h64(concat(lit("shard|"), col("doc_id").cast("string")))
          % nShards.toLong)
      .withColumn("sort_key",
        h64(concat(lit("order|"), col("doc_id").cast("string"))))
    val totals = planned.groupBy("shard").agg(
      count(lit(1)).as("shard_docs"), sum("n_toks").as("shard_tokens"))
    planned.join(broadcast(totals), "shard")
  }
}
