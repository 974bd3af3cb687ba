package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Retrieval

/** Incrementally-maintained BM25 postings index over a delivered
  * corpus — the engine-side analogue of the reference's continuously-
  * indexing search sink (OpenSearch ingests each Firehose delivery and
  * is immediately queryable with live statistics — reference
  * `kds_example/iac/s2_app.py:841-858`). `Retrieval.buildTextIndex`
  * rebuilds its index from a full corpus pass per snapshot; this store
  * appends ONE EPOCH-SIZED DELTA per delivered epoch and merges at
  * read, so index maintenance cost tracks the delivery rate, not the
  * corpus size — the property that makes a query-heavy live corpus
  * affordable at 100 TB.
  *
  * Layout — two [[EpochStore]] roots under one index root:
  *
  *  - `<root>/postings/epoch=<e>`: (term, doc_id, tf, dl, _epoch) —
  *    the epoch's docs' postings, term-clustered within files so a
  *    query's `term IN (...)` filter prunes row groups;
  *  - `<root>/doclen/epoch=<e>`: (doc_id, dl, _epoch) — one row per
  *    delivered doc VERSION, including token-less docs.
  *
  * Upsert semantics (the OpenSearch contract: re-indexing a doc id
  * overwrites it): a doc's CURRENT version is its latest doclen epoch,
  * and a postings row counts only if its `_epoch` equals that — the
  * doclen table is the currency authority because a re-delivered doc
  * may simply LACK a term it used to contain (a per-term latest-epoch
  * rule would keep the stale posting forever). The doclen side is one
  * short row per doc version: its latest-per-doc resolution is a
  * doc-keyed window over O(docs) rows, never corpus-token-sized.
  *
  * Write order inside a delta is postings BEFORE doclen: currency is
  * what ACTIVATES an epoch's rows, so the marker lands only after the
  * rows it activates are durable — a reader between the two writes
  * sees the previous consistent state, never a doc with its old
  * postings deactivated and its new ones missing.
  *
  * [[read]] returns a plain [[Retrieval.TextIndex]], so the whole
  * existing query surface ([[Retrieval.bm25FromIndex]],
  * [[IndexSink.rankedMatch]]'s index overload) runs on the live index
  * unchanged — per-query cost stays bounded by the query terms'
  * postings (the term filter pushes below the currency join and the
  * df aggregate to the delta scans) plus one O(docs) doclen pass for
  * currency and stats.
  *
  * [[compact]] folds the epoch history into one resolved snapshot per
  * store under [[EpochStore]]'s crash-safe manifest + lease protocol,
  * bounding the per-query delta count between compactions.
  */
object LiveTextIndex {

  /** Where a live index keeps its two stores. */
  private def postingsRoot(root: String) = root.stripSuffix("/") + "/postings"
  private def doclenRoot(root: String) = root.stripSuffix("/") + "/doclen"

  private val postingsSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("doc_id", StringType),
    StructField("tf", LongType),
    StructField("dl", LongType),
    StructField("_epoch", LongType)))
  private val doclenSchema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("dl", LongType),
    StructField("_epoch", LongType)))

  /** Append one epoch's postings + doclen deltas. `toks` is the
    * epoch's delivered docs as (doc_id, toks: array&lt;string&gt;) —
    * EPOCH-sized, the whole point; the aggregation below is the same
    * shape as `Retrieval.buildTextIndex`'s corpus pass, applied to one
    * delivery. `doc_id` is stored as string (the delivery key is the
    * envelope recordId); callers with numeric keys cast on the way in
    * and out ([[IndexSink.start]]'s maintenance hook does).
    *
    * Both writes are whole-directory overwrites keyed by the epoch id,
    * so a replayed epoch (streaming restart) lands a CONSISTENT pair.
    * Docs repeated WITHIN one epoch collapse to one version via an
    * arbitrary pick (a single bulk request's per-id overwrite); the
    * pick is LOCAL-CHECKPOINTED so the postings job and the doclen job
    * read the same materialized choice — without it the two
    * independent jobs could each re-evaluate the nondeterministic
    * dropDuplicates and store version A's tf against version B's
    * length and currency.
    */
  def writeDelta(toks: DataFrame, root: String, epoch: Long,
      shards: Int = 4): Unit = {
    require(shards > 0, s"shard count must be positive, got $shards")
    // REPLAY FENCE (the LiveSpanDedup rule): an epoch at or below the
    // compaction watermark was already folded — its marker proved the
    // delivery complete — and re-writing it could re-pick a different
    // in-epoch version than the folded one, leaving two currencies for
    // one doc. The replay's only correct action is nothing.
    if (epoch <= EpochStore.readWatermark(toks.sparkSession, doclenRoot(root)))
      return
    // One in-epoch version per doc: postings from two versions of the
    // same doc in one epoch would double-count tf.
    val one = toks
      .select(col("doc_id").cast("string").as("doc_id"), col("toks"))
      .dropDuplicates("doc_id")
      .localCheckpoint() // epoch-sized; pin the arbitrary pick (scaladoc)
    val posted = one
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("_epoch", lit(epoch))
    posted
      .repartition(shards, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite")
      .parquet(s"${postingsRoot(root)}/epoch=$epoch")
    // Currency marker LAST (see class doc): only after the postings it
    // activates are durable.
    one.select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        lit(epoch).as("_epoch"))
      .repartition(math.min(shards, 2))
      .write.mode("overwrite")
      .parquet(s"${doclenRoot(root)}/epoch=$epoch")
  }

  /** The live index as a point-in-time [[Retrieval.TextIndex]] view
    * over the current epoch set (lazy frames — each query re-reads the
    * deltas it needs; heal-at-entry like every store read). Empty
    * store → empty index (queries return no rows).
    */
  def read(spark: SparkSession, root: String): Retrieval.TextIndex = {
    EpochStore.heal(spark, postingsRoot(root))
    EpochStore.heal(spark, doclenRoot(root))
    val doclen = EpochStore.readAll(spark, doclenRoot(root), doclenSchema)
    val postings = EpochStore.readAll(spark, postingsRoot(root), postingsSchema)
    // Currency: latest doclen epoch per doc (row_number, so a crashed
    // compaction's duplicated winner rows still yield ONE currency row).
    val cur = EpochStore.latestPerKey(doclen, "doc_id")
      .select(col("doc_id"), col("dl"), col("_epoch").as("_cur"))
    // Stats over CURRENT doc versions — the exact formula
    // buildTextIndex uses, so live scores match a batch rebuild's.
    val stats = cur.select(col("dl"))
      .agg(count(lit(1)).cast("double").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // A posting counts iff its epoch IS the doc's current version.
    // dropDuplicates guards the crashed-compaction window (snapshot +
    // victim epochs briefly coexist with identical rows) — keyed by
    // the same columns the query filters on, so its exchange runs over
    // the terms' postings only, not the corpus.
    val live = postings
      .join(cur.select("doc_id", "_cur"), Seq("doc_id"))
      .filter(col("_epoch") === col("_cur"))
      .select("term", "doc_id", "tf", "dl")
      .dropDuplicates("term", "doc_id")
    val df = live.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    Retrieval.TextIndex(live, df, stats)
  }

  /** Fold each store's epoch history into one snapshot (crash protocol
    * and serialization in [[EpochStore.compact]]). Postings resolve
    * against the doclen store's CURRENT epoch set — rows of superseded
    * doc versions are dropped. A delivery landing mid-compaction is
    * protected by the ACTIVATION rule: only postings epochs whose
    * doclen marker had landed when this compaction started are
    * eligible victims (the marker is written last, so an in-flight
    * epoch's data dir is listed but not yet activated — resolving it
    * against a currency that does not know it would drop its rows
    * from the snapshot and then delete the only copy). Ineligible
    * dirs simply ride to the next compaction. Snapshot rows keep
    * their original `_epoch` values so read-time resolution is
    * unchanged over any mix of snapshot and later deltas. Returns
    * postings rows kept.
    *
    * The whole two-store pass runs under ONE index-level lease
    * ([[EpochStore.withIndexLease]]): the postings resolution reads
    * the doclen store's epoch dirs, so a concurrent doclen compaction
    * in another process could delete them mid-read — the per-store
    * leases cannot see across stores.
    */
  def compact(spark: SparkSession, root: String, shards: Int = 4,
      leaseTtlMs: Long = MaintenanceLease.DefaultTtlMs,
      leaseTimeoutMs: Long = MaintenanceLease.DefaultAcquireTimeoutMs): Long = {
    require(shards > 0, s"shard count must be positive, got $shards")
    EpochStore.withIndexLease(spark, root, leaseTtlMs, leaseTimeoutMs) {
      // Point-in-time activated set: epochs whose currency marker rows
      // exist NOW, plus committed marker DIRS (a zero-row delivery has
      // no marker rows but its committed marker dir still proves the
      // epoch complete — without it the empty data dir would never
      // become a victim and would ride forever). Markers landing later
      // exclude their data epochs from this compaction — the safe
      // direction.
      val activated = EpochStore.rowEpochs(spark, doclenRoot(root)) ++
        EpochStore.committedEpochs(spark, doclenRoot(root))
      val kept = EpochStore.compact(spark, postingsRoot(root),
        resolve = posted => {
          val cur = EpochStore.latestPerKey(
              EpochStore.readAll(spark, doclenRoot(root), doclenSchema), "doc_id")
            .select(col("doc_id"), col("_epoch").as("_cur"))
          posted.join(cur, Seq("doc_id"))
            .filter(col("_epoch") === col("_cur"))
            .drop("_cur")
            .dropDuplicates("term", "doc_id")
        },
        writeSnapshot = (df, tmp) => df
          .repartition(shards, col("term")).sortWithinPartitions("term")
          .write.mode("overwrite").parquet(tmp),
        leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs,
        epochEligible = activated.contains)
      // The doclen store is self-contained (its rows ARE the markers):
      // every listed epoch is eligible. Folding it commits those epochs'
      // history — advance the replay fence under the lease.
      EpochStore.compact(spark, doclenRoot(root),
        resolve = dl => EpochStore.latestPerKey(dl, "doc_id"),
        writeSnapshot = (df, tmp) => df.repartition(math.min(shards, 2))
          .write.mode("overwrite").parquet(tmp),
        leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs,
        onCommit = folded => folded.reduceOption(_ max _)
          .foreach(EpochStore.advanceWatermark(spark, doclenRoot(root), _)))
      kept
    }
  }
}
