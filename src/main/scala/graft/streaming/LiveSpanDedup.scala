package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * applied to gram counts — WITH UPSERT RETRACTION: re-delivering a
  * doc_id replaces its text (the OpenSearch per-id overwrite contract
  * the rest of the delivery surface honors), its superseded version's
  * grams stop counting, and spans its old text used to co-duplicate
  * disappear retroactively.
  *
  * Three [[EpochStore]] roots:
  *
  *  - `<root>/occ/epoch=<e>`: (doc_id, pos, gh, bk, _epoch) — the
  *    epoch's gram occurrences (the rows batch SpanDedup
  *    materializes), written once per delivery: no corpus re-tokenize,
  *    ever. `bk` is the doc's hash bucket (`hash(doc_id) mod 64`),
  *    and files are bucket-clustered, so the per-upsert retraction
  *    lookup pushes `bk IN (re-delivered docs' buckets)` into the
  *    parquet scan — a ≤64-value driver-side filter that prunes
  *    files and row groups by footer min/max, instead of scanning the
  *    whole corpus-token-sized store under a broadcast join (which
  *    pushes nothing);
  *  - `<root>/counts/epoch=<e>`: (gh, cnt, _epoch) — the epoch's NET
  *    per-gram count delta: gross adds for the delivered text MINUS
  *    the full counts of each re-delivered doc's superseded version
  *    (computed at delivery from that version's stored occurrences —
  *    bounded by the epoch's re-delivered docs, found by doc-clustered
  *    row-group pruning after compaction);
  *  - `<root>/docs/epoch=<e>`: (doc_id, _epoch) — one short row per
  *    delivered doc VERSION: the currency authority (a re-delivered
  *    doc may emit NO grams at all — k-1 tokens — so occurrence
  *    presence cannot define currency).
  *
  * Read-side merge: corpus-wide count(gh) = Σ net deltas, and a doc's
  * occurrences mark only while its version is current — both EXACTLY
  * the values batch SpanDedup computes on the resolved corpus (each
  * version's grams are added once on delivery and subtracted once on
  * supersession, so the telescoped sum is the current corpus; the
  * currency join selects exactly the current occurrence rows). The
  * marking itself reuses the batch operator's salted join + interval
  * merge ([[SpanDedup.markAndMerge]]), twin-spec pinned equal to the
  * batch spans of the resolved corpus after every delivery.
  *
  * Crash tolerance (the additive-state rule): count rows are NET — one
  * row per (gh, epoch) — and deduplicate on (gh, _epoch) before
  * summing, so a crashed compaction's snapshot+victim coexistence
  * (identical rows, twice) cannot double a count; docs rows resolve by
  * max-epoch (duplicates harmless); duplicate OCCURRENCE rows need no
  * dedup at all — identical marks collapse in the interval merge.
  *
  * Delta write order is occ → counts → docs: the docs marker is what
  * ACTIVATES both the new occurrences (currency) and the retraction
  * (the old version stays current until it lands). A reader BETWEEN
  * the counts and docs writes sees a mixed transient — the counts
  * already reflect the epoch (its adds and its retractions) while
  * marking still runs over the pre-epoch currency — so a span can be
  * detected early (both copies will exist once the marker lands) or
  * missed briefly (a retracted copy's count is gone while its rows
  * still mark); the state converges the instant the marker lands, and
  * a crash inside the window converges on replay (writes are
  * whole-directory overwrites and the retraction reads only epochs
  * strictly earlier, so the replay rewrites identical content — see
  * [[writeDelta]]). Epochs must be written serially in increasing
  * order (what `foreachBatch` provides); the retraction of version v
  * assumes every delta before the current epoch is durable.
  */
object LiveSpanDedup {

  private def occRoot(root: String) = root.stripSuffix("/") + "/occ"
  private def countsRoot(root: String) = root.stripSuffix("/") + "/counts"
  private def docsRoot(root: String) = root.stripSuffix("/") + "/docs"

  private def occSchema(idType: DataType) = StructType(Seq(
    StructField("doc_id", idType),
    StructField("pos", IntegerType),
    StructField("gh", LongType),
    StructField("bk", IntegerType),
    StructField("_epoch", LongType)))

  /** Hash-bucket count for the occ store's retraction-pruning column —
    * an upper bound on the IN-list a retraction pushes into the scan,
    * and the granularity of the pruning. Fixed per store lifetime (the
    * bucket of a stored row must match the bucket a later lookup
    * computes for the same doc_id).
    */
  private val OccBuckets = 64
  private def bucketOf(docId: org.apache.spark.sql.Column) =
    pmod(xxhash64(docId), lit(OccBuckets)).cast("int")

  /** The stored occurrence rows relevant to `docs` (doc_id column):
    * the occ-store scan prefiltered to the docs' hash buckets — a
    * SUPERSET by bucket collision, exact after the caller's doc_id
    * join. The bucket set is collected driver-side (≤ [[OccBuckets]]
    * values — bounded metadata, the [[graft.operators.PrefixSum]]
    * rule) so it pushes into the parquet scan as a static IN filter:
    * footer min/max prunes the bucket-clustered files and row groups,
    * where the plain broadcast join this replaces scanned every row of
    * the store per upsert epoch.
    */
  def occForDocs(spark: SparkSession, root: String, idType: DataType,
      docs: DataFrame): DataFrame = {
    val bks = docs.select(bucketOf(col("doc_id")).as("bk"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val store = EpochStore.readAll(spark, occRoot(root), occSchema(idType))
    // The isNull arm keeps rows written before the bucket column
    // existed (legacy stores read them back as bk = null): they cannot
    // be pruned, but silently excluding them would skip their
    // retraction forever — graceful degradation, not silent loss.
    if (bks.isEmpty) store.filter(lit(false))
    else store.filter(col("bk").isNull || col("bk").isInCollection(bks))
  }
  private def countsSchema = StructType(Seq(
    StructField("gh", LongType),
    StructField("cnt", LongType),
    StructField("_epoch", LongType)))
  private def docsSchema(idType: DataType) = StructType(Seq(
    StructField("doc_id", idType),
    StructField("_epoch", LongType)))

  /** Append one epoch's gram state, retracting superseded versions.
    * `toks` is the epoch's delivered docs as (doc_id, toks:
    * array&lt;string&gt;) — docs repeated WITHIN the epoch collapse to
    * one version first via a DETERMINISTIC pick
    * ([[EpochStore.onePerKey]] on the token array — a single bulk
    * request's per-id overwrite, chosen so a replay re-running the
    * pick lands byte-identical content even after a compaction folded
    * the first attempt's counts into a snapshot; an arbitrary pick
    * replayed differently would coexist with the folded rows as
    * DIVERGENT duplicates under the same epoch id, which the
    * duplicate-tolerant read resolution would silently mix). `k` is
    * the span gram length and MUST match across every delta of a root
    * (k-gram hashes never collide across k, so mixing silently marks
    * nothing). Idempotent per (root, epoch): whole-directory
    * overwrites land identical content on a streaming replay —
    * including the retraction rows, which are computed from
    * strictly-earlier epochs' state.
    */
  def writeDelta(toks: DataFrame, root: String, epoch: Long, k: Int,
      shards: Int = 4): Unit = {
    require(shards > 0, s"shard count must be positive, got $shards")
    val spark = toks.sparkSession
    // A replay whose first attempt's marker landed takes the INDEX
    // lease and re-checks the fence under it: the epoch is activation-
    // eligible, so a concurrent compaction could otherwise fold it
    // between the fence check and the retraction lookup, leaving the
    // rewrite to re-derive gross-only counts from post-fold state (the
    // LiveTextIndex rule — see its writeDelta, including why the
    // marker probe must come BEFORE the fence read: the commit order
    // advances the watermark before a folded epoch's dirs die, so a
    // marker-absent probe guarantees the fence read after it sees the
    // fold). First deliveries stay lease-free: an unmarked epoch
    // cannot be folded under its writer.
    val markerDirExists = {
      val p = new org.apache.hadoop.fs.Path(s"${docsRoot(root)}/epoch=$epoch")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    if (markerDirExists)
      EpochStore.withIndexLease(spark, root) {
        // REPLAY FENCE, re-read under the lease: an epoch at or below
        // the watermark was already folded into snapshots, and its
        // input history — the superseded doc versions the retraction
        // would need — no longer exists. Re-writing it from
        // post-compaction state would land gross-only counts that
        // disagree with the folded net rows. The replay's only correct
        // action is nothing.
        if (epoch > EpochStore.readWatermark(spark, docsRoot(root)))
          writeDeltaBody(toks, root, epoch, k, shards)
      }
    else if (epoch > EpochStore.readWatermark(spark, docsRoot(root)))
      writeDeltaBody(toks, root, epoch, k, shards)
  }

  private def writeDeltaBody(toks: DataFrame, root: String, epoch: Long,
      k: Int, shards: Int): Unit = {
    val spark = toks.sparkSession
    val idType = toks.schema("doc_id").dataType
    // Heal BEFORE the retraction lookup: a crashed occ compaction
    // leaves snapshot + victim dirs whose identical rows would
    // double-count the superseded version (harmless for marking,
    // persisted-wrong for a NET count). The dropDuplicates below is
    // the second line of defense for the unreadable-manifest window
    // heal cannot close.
    EpochStore.heal(spark, occRoot(root))
    EpochStore.heal(spark, docsRoot(root))
    val one = EpochStore.onePerKey(toks, "doc_id", col("toks"))
      .localCheckpoint() // epoch-sized; one materialization, three consumers
    val occ = SpanDedup.gramOccurrences(one, k)
      .withColumn("bk", bucketOf(col("doc_id")))
      .withColumn("_epoch", lit(epoch))
    // Occurrences first (inactive until the docs marker lands) —
    // BUCKET-clustered (bk first, then doc_id, pos) so a later epoch's
    // retraction lookup prunes whole files and row groups with its
    // pushed bucket filter ([[occForDocs]]); docs stay contiguous
    // within a bucket.
    occ.repartition(shards, col("bk")).sortWithinPartitions("bk", "doc_id", "pos")
      .write.mode("overwrite").parquet(s"${occRoot(root)}/epoch=$epoch")
    // Gross adds from the delta just written (one tokenize, two files
    // that can never disagree) ...
    val gross = spark.read.schema(occSchema(idType))
      .parquet(s"${occRoot(root)}/epoch=$epoch")
      .groupBy("gh").agg(count(lit(1)).as("cnt"))
    // ... minus the superseded versions' counts: each re-delivered
    // doc's CURRENT version (max docs-store epoch STRICTLY BEFORE this
    // one) contributes the negation of its stored occurrence counts.
    // The strict filter is what makes a streaming REPLAY idempotent: a
    // crash after this epoch's docs marker but before the offset
    // commit re-runs writeDelta with the marker already present —
    // unfiltered, `prior` would resolve to the epoch's OWN version and
    // retract the grams it just added (net 0) while skipping the real
    // prior-version retraction, permanently corrupting the counts.
    // Restricted to epochs < this one, the replay reads exactly the
    // state the first attempt read and rewrites identical rows.
    // localCheckpoint: `prior` (the re-delivered docs — tiny) feeds
    // three consumers (the isEmpty probe, the bucket collection, the
    // retraction join); one materialization beats three docs-store
    // scans.
    val prior = EpochStore.readAll(spark, docsRoot(root), docsSchema(idType))
      .filter(col("_epoch") < epoch)
      .join(one.select("doc_id"), Seq("doc_id"))
      .groupBy("doc_id").agg(max(col("_epoch")).as("_prev"))
      .localCheckpoint()
    val net =
      if (prior.isEmpty) gross
      else {
        // Scan bounded to the re-delivered docs' hash buckets — the
        // pushed IN filter prunes the bucket-clustered store's files
        // and row groups ([[occForDocs]]), so the lookup reads ~(re-
        // delivered buckets / 64) of the store, not all of it.
        val occStore = occForDocs(spark, root, idType,
          prior.select("doc_id"))
        val retract = occStore
          .join(prior, occStore("doc_id") === prior("doc_id") &&
            occStore("_epoch") === prior("_prev"))
          // Crash-window dedup AFTER the join: each occ row matches at
          // most one prior version, so deduping the matched rows is
          // equivalent to deduping the store — but the exchange it
          // costs is bounded by the re-delivered docs' rows, not one
          // corpus-token-sized shuffle per delivery (prior is tiny, so
          // the join itself broadcasts over the pruned occ scan).
          .select(occStore("doc_id").as("doc_id"), col("pos"), col("gh"))
          .dropDuplicates("doc_id", "pos")
          .groupBy("gh").agg((-count(lit(1))).as("cnt"))
        gross.unionByName(retract).groupBy("gh")
          .agg(sum(col("cnt")).as("cnt")).filter(col("cnt") =!= 0)
      }
    net.withColumn("_epoch", lit(epoch))
      .repartition(math.min(shards, 2))
      .write.mode("overwrite").parquet(s"${countsRoot(root)}/epoch=$epoch")
    // Currency marker LAST (see class doc): activates the new rows and
    // the retraction together. Keyed like the doclen marker — one short
    // row per delivered doc, epoch-bounded but potentially large.
    one.select(col("doc_id"), lit(epoch).as("_epoch"))
      .repartition(math.max(1, shards / 2), col("doc_id"))
      .write.mode("overwrite").parquet(s"${docsRoot(root)}/epoch=$epoch")
  }

  /** Maximal duplicated token spans over the RESOLVED corpus delivered
    * so far (latest version per doc_id): (doc_id, span_start,
    * span_end) — `SpanDedup.duplicatedSpans` contract, equal to
    * running the batch operator on the closed resolved corpus, with no
    * re-tokenize of any prior epoch. `idType` is the doc_id type the
    * deltas were written with.
    */
  def duplicatedSpans(spark: SparkSession, root: String, k: Int,
      idType: DataType = StringType): DataFrame = {
    EpochStore.heal(spark, occRoot(root))
    EpochStore.heal(spark, countsRoot(root))
    EpochStore.heal(spark, docsRoot(root))
    val dup = EpochStore.readAll(spark, countsRoot(root), countsSchema)
      .dropDuplicates("gh", "_epoch") // crash-window guard (class doc)
      .groupBy("gh").agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 1).select("gh")
    // Salt regime decided from the occ STORE SCAN, not the currency
    // join (whose Catalyst estimate is the product of its children —
    // a tiny store would read as huge and always pay the salt).
    val salted = SpanDedup.saltRegime(
      EpochStore.readAll(spark, occRoot(root), occSchema(idType)))
    SpanDedup.markAndMerge(currentOcc(spark, root, idType), dup, k, salted)
  }

  /** The current-version occurrence rows: occ ⋈ (latest docs-store
    * epoch per doc) — the resolved corpus's occurrence table.
    */
  private def currentOcc(spark: SparkSession, root: String,
      idType: DataType): DataFrame = {
    val cur = EpochStore.latestPerKey(
        EpochStore.readAll(spark, docsRoot(root), docsSchema(idType)), "doc_id")
      .select(col("doc_id"), col("_epoch").as("_cur"))
    EpochStore.readAll(spark, occRoot(root), occSchema(idType))
      .join(cur, Seq("doc_id"))
      .filter(col("_epoch") === col("_cur"))
      .select("doc_id", "pos", "gh")
  }

  /** Operational snapshot of the state's three stores, keyed by store
    * name — pure metadata ([[EpochStore.status]]): delta backlog per
    * store, replay fence, crashed-compaction and lease indicators.
    */
  def status(spark: SparkSession, root: String): Map[String, EpochStore.Status] =
    Map(
      "occ" -> EpochStore.status(spark, occRoot(root)),
      "counts" -> EpochStore.status(spark, countsRoot(root)),
      "docs" -> EpochStore.status(spark, docsRoot(root)))

  /** Consolidate each store's epoch history into one snapshot (crash
    * protocol in [[EpochStore.compact]]). Occurrences drop superseded
    * versions and re-cluster by hash bucket (the retraction-lookup
    * pruning key — see [[occForDocs]]) —
    * restricted to ACTIVATED epochs (docs-marker rows present when
    * this compaction starts), so an in-flight delivery's occ dir is
    * neither resolved-empty nor deleted (the [[LiveTextIndex.compact]]
    * rule). Counts KEEP their per-epoch NET rows — the additive merge
    * happens at read, per-epoch identity is the crash-dedup key, and
    * their sum already reflects every retraction — so count compaction
    * is file consolidation plus duplicate scrubbing (and needs no
    * activation filter: moving count rows into a snapshot changes no
    * read-side sum); docs keep the latest row per doc. Returns
    * occurrence rows kept.
    *
    * The whole three-store pass runs under ONE index-level lease
    * ([[EpochStore.withIndexLease]]): the occ resolution reads the
    * docs store's epoch dirs, so a concurrent docs compaction in
    * another process could delete them mid-read — the per-store
    * leases cannot see across stores.
    */
  def compact(spark: SparkSession, root: String, shards: Int = 4,
      leaseTtlMs: Long = MaintenanceLease.DefaultTtlMs,
      leaseTimeoutMs: Long = MaintenanceLease.DefaultAcquireTimeoutMs): Long = {
    require(shards > 0, s"shard count must be positive, got $shards")
    EpochStore.withIndexLease(spark, root, leaseTtlMs, leaseTimeoutMs) {
      // Marker rows plus committed marker dirs: a zero-row delivery has
      // no docs rows, but its committed marker dir still proves the
      // epoch complete (the LiveTextIndex rule).
      val activated = EpochStore.rowEpochs(spark, docsRoot(root)) ++
        EpochStore.committedEpochs(spark, docsRoot(root))
      val kept = EpochStore.compact(spark, occRoot(root),
        resolve = occ => {
          val cur = EpochStore.latestPerKey(
              EpochStore.readAll(spark, docsRoot(root),
                docsSchema(occ.schema("doc_id").dataType)), "doc_id")
            .select(col("doc_id"), col("_epoch").as("_cur"))
          occ.join(cur, Seq("doc_id"))
            .filter(col("_epoch") === col("_cur")).drop("_cur")
            .dropDuplicates("doc_id", "pos")
        },
        writeSnapshot = (df, tmp) => df
          .repartition(shards, col("bk"))
          .sortWithinPartitions("bk", "doc_id", "pos")
          .write.mode("overwrite").parquet(tmp),
        leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs,
        epochEligible = activated.contains)
      EpochStore.compact(spark, countsRoot(root),
        resolve = _.dropDuplicates("gh", "_epoch"),
        writeSnapshot = (df, tmp) => df
          .repartition(math.max(1, shards / 2), col("gh"))
          .sortWithinPartitions("gh")
          .write.mode("overwrite").parquet(tmp),
        leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs)
      EpochStore.compact(spark, docsRoot(root),
        resolve = docs => EpochStore.latestPerKey(docs, "doc_id"),
        // O(resolved docs) rows — keyed + row-count-sized layout, never
        // a single-task rewrite of the whole currency store.
        writeSnapshot = (df, tmp) =>
          EpochStore.writeKeyedSnapshot(df, tmp, "doc_id"),
        leaseTtlMs = leaseTtlMs, leaseTimeoutMs = leaseTimeoutMs,
        // Folding the activation store commits those epochs' history:
        // advance the replay fence (still under the lease) so a late
        // at-least-once replay of a folded epoch becomes a no-op.
        onCommit = folded => folded.reduceOption(_ max _)
          .foreach(EpochStore.advanceWatermark(spark, docsRoot(root), _)))
      kept
    }
  }
}
