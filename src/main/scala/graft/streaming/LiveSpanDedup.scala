package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.SpanDedup

/** Cross-epoch exact-substring dedup state — the streaming form of
  * [[graft.operators.SpanDedup]]. The reference pipeline is streaming
  * end-to-end (`kds_example/iac/s2_app.py:313-317` wires source →
  * transform → sinks as one continuous flow); batch `duplicatedSpans`
  * can only judge a CLOSED corpus, so a span duplicated ACROSS
  * deliveries (epoch-3 boilerplate matching epoch-1 text) needs gram
  * state that outlives the epoch. This store keeps that state as
  * per-epoch deltas merged at read — the [[LiveTextIndex]] design
  * applied to gram counts:
  *
  *  - `<root>/occ/epoch=<e>`: (doc_id, pos, gh) — the epoch's gram
  *    occurrences, the SAME rows batch SpanDedup materializes, written
  *    once per delivery (one epoch-sized tokenize+explode — the corpus
  *    is never re-tokenized);
  *  - `<root>/counts/epoch=<e>`: (gh, cnt, _epoch) — the epoch's
  *    per-gram occurrence counts, one row per distinct gram.
  *
  * Read-side merge: corpus-wide count(gh) = Σ over epoch deltas — an
  * aggregate over per-epoch DISTINCT grams, cheaper than re-counting
  * raw occurrences — then the batch operator's own salted mark join +
  * interval merge over the occurrence union
  * ([[SpanDedup.markAndMerge]]), so cross-epoch spans are EXACTLY the
  * batch spans of the closed corpus delivered so far (twin-spec
  * pinned). Within-epoch duplicates, cross-epoch duplicates, and a
  * doc duplicated against itself all fall out of the same summed
  * counts.
  *
  * Crash tolerance mirrors the additive-state rule: count rows carry
  * their epoch identity and are deduplicated on (gh, _epoch) before
  * summing, so a crashed compaction's snapshot+victim coexistence
  * (identical rows, twice) cannot double a count; duplicate
  * OCCURRENCE rows need no dedup at all — they produce identical
  * marks and the interval merge collapses them.
  *
  * Write order inside a delta is occurrences BEFORE counts: counts
  * are what ACTIVATE detection (a gram reaches cnt &gt; 1 through the
  * summed counts), so a reader between the two writes sees the
  * previous consistent state — never a newly-duplicated gram whose
  * marking join then misses the epoch's occurrences.
  *
  * The corpus is APPEND-ONLY: re-delivering a doc_id adds a second
  * copy whose grams count (exactly like batch SpanDedup on a corpus
  * with a repeated doc). Upsert retraction — subtracting a retired
  * version's gram counts via negative deltas — is the designed next
  * step on this layout (per-epoch identity is what a retraction would
  * key on) but not yet implemented.
  */
object LiveSpanDedup {

  private def occRoot(root: String) = root.stripSuffix("/") + "/occ"
  private def countsRoot(root: String) = root.stripSuffix("/") + "/counts"

  private def occSchema(idType: DataType) = StructType(Seq(
    StructField("doc_id", idType),
    StructField("pos", IntegerType),
    StructField("gh", LongType)))
  private def countsSchema = StructType(Seq(
    StructField("gh", LongType),
    StructField("cnt", LongType),
    StructField("_epoch", LongType)))

  /** Append one epoch's gram state. `toks` is the epoch's delivered
    * docs as (doc_id, toks: array&lt;string&gt;); `k` is the span gram
    * length and MUST match across every delta of a root (the gram hash
    * and the span arithmetic both depend on it — mixing k values would
    * silently mark nothing, since k-gram hashes never collide across
    * k). Idempotent per (root, epoch): whole-directory overwrites, so
    * a replayed epoch lands identical content.
    */
  def writeDelta(toks: DataFrame, root: String, epoch: Long, k: Int,
      shards: Int = 4): Unit = {
    require(shards > 0, s"shard count must be positive, got $shards")
    val occ = SpanDedup.gramOccurrences(toks, k)
    occ.repartition(shards)
      .write.mode("overwrite").parquet(s"${occRoot(root)}/epoch=$epoch")
    // Counts LAST (see class doc) — and derived from the WRITTEN delta,
    // not the lazy plan, so the two files can never disagree about an
    // epoch's grams (and the tokenize+explode runs once, not twice).
    val spark = toks.sparkSession
    spark.read.schema(occSchema(toks.schema("doc_id").dataType))
      .parquet(s"${occRoot(root)}/epoch=$epoch")
      .groupBy("gh").agg(count(lit(1)).as("cnt"))
      .withColumn("_epoch", lit(epoch))
      .repartition(math.min(shards, 2))
      .write.mode("overwrite").parquet(s"${countsRoot(root)}/epoch=$epoch")
  }

  /** Maximal duplicated token spans over EVERYTHING delivered so far:
    * (doc_id, span_start, span_end) — `SpanDedup.duplicatedSpans`
    * contract, equal to running the batch operator on the closed
    * union of all delivered epochs, with no re-tokenize of any prior
    * epoch. `idType` is the doc_id type the deltas were written with.
    */
  def duplicatedSpans(spark: SparkSession, root: String, k: Int,
      idType: DataType = StringType): DataFrame = {
    EpochStore.heal(spark, occRoot(root))
    EpochStore.heal(spark, countsRoot(root))
    val dup = readStore(spark, countsRoot(root), countsSchema)
      .dropDuplicates("gh", "_epoch") // crash-window guard (class doc)
      .groupBy("gh").agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 1).select("gh")
    SpanDedup.markAndMerge(
      readStore(spark, occRoot(root), occSchema(idType)), dup, k)
  }

  /** Consolidate each store's epoch history into one snapshot (crash
    * protocol in [[EpochStore.compact]]). Counts KEEP their per-epoch
    * rows — the additive merge happens at read, and per-epoch identity
    * is both the crash-dedup key and the future retraction key — so
    * compaction here is file consolidation plus duplicate scrubbing,
    * the actual many-small-deltas pain at scale. Returns occurrence
    * rows kept.
    */
  def compact(spark: SparkSession, root: String, shards: Int = 4,
      leaseTtlMs: Long = MaintenanceLease.DefaultTtlMs,
      leaseTimeoutMs: Long = MaintenanceLease.DefaultAcquireTimeoutMs): Long = {
    require(shards > 0, s"shard count must be positive, got $shards")
    val kept = EpochStore.compact(spark, occRoot(root),
      resolve = _.dropDuplicates("doc_id", "pos"),
      writeSnapshot = (df, tmp) =>
        df.repartition(shards).write.mode("overwrite").parquet(tmp),
      leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs)
    EpochStore.compact(spark, countsRoot(root),
      resolve = _.dropDuplicates("gh", "_epoch"),
      writeSnapshot = (df, tmp) => df
        .repartition(math.max(1, shards / 2), col("gh"))
        .sortWithinPartitions("gh")
        .write.mode("overwrite").parquet(tmp),
      leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs)
    kept
  }

  /** Point-in-time listing read with explicit schema — empty store and
    * empty epoch dirs both read cleanly (the [[LiveTextIndex]] rule).
    */
  private def readStore(spark: SparkSession, root: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val epochs = EpochStore.listEpochs(fs, p)
    if (epochs.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    else spark.read.schema(schema).parquet(epochs.map(_.toString): _*)
  }
}
