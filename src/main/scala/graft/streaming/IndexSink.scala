package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.Codecs
import graft.model.DeliveryStatus._

/** The reference's second delivery destination (A10): bulk-index the
  * transformed records into a queryable search index (`bank_account`, 24
  * shards — reference iac/s2_app.py:841-858,
  * debug/s2_inspect_data_in_oss.py:15-31).
  *
  * Spark-native: the "index" is a parquet table registered as a view —
  * the OpenSearch query surface (count / match_all / search / text
  * match) becomes plain SQL over it (SURVEY §3 EP3). The shard count maps
  * to file-layout parallelism via repartition; per-epoch subdirectories
  * keep replays idempotent like the NDJSON channels.
  */
object IndexSink {

  /** Start the index-delivery query: decode → route → append Ok payloads
    * to `indexPath` (parquet, `shards`-way), with the raw-backup channel
    * written alongside (reference backs up ALL documents on the oss
    * pipeline, iac/s2_app.py:858-868).
    *
    * `enrich` runs over each epoch's routed Ok frame (recordId +
    * payload columns) before the write — the incremental-encode hook: a
    * vector delivery passes [[graft.operators.Ivf.withCell]] /
    * [[graft.operators.IvfPq.withCellCodes]] against a frozen model so
    * every landed epoch is immediately ANN-searchable (the reference's
    * sink is a continuously queryable index, iac/s2_app.py:830-914 —
    * its Spark twin must not need a batch re-index between epochs).
    * Identity by default. Narrow transformations only: a shuffle here
    * would serialize inside the epoch commit.
    */
  def start(
      envelope: DataFrame,
      payloadSchema: StructType,
      indexPath: String,
      backupPath: String,
      checkpoint: String,
      shards: Int,
      dropIf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      trigger: Trigger = Trigger.AvailableNow(),
      enrich: DataFrame => DataFrame = identity): StreamingQuery =
    envelope.writeStream
      .queryName("graft-index-delivery")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val src = batch.persist()
        try {
          // Raw-backup fidelity: back up the PRE-transform source bytes
          // (the reference's backup is the source record, not the Lambda
          // output — iac/s2_app.py:858-868). Backing up the routed
          // frame would store re-encoded JSON: reordered keys, schema-
          // mismatched values nulled, injected schema fields — an audit
          // copy that has lost the original record.
          DeliveryPipeline.writeNdjson(
            src.select(col("data").cast("string").as("line")),
            s"$backupPath/epoch=$epochId")
          enrich(Codecs.transformEnvelope(src, payloadSchema, dropIf)
              .filter(col("result") === Ok)
              .select(col("recordId"), col("payload.*")))
            .withColumn("_epoch", lit(epochId))
            .repartition(shards)
            .write.mode("overwrite").parquet(s"$indexPath/epoch=$epochId")
        } finally src.unpersist()
      }
      .start()

  /** Register the delivered index as a queryable view (A14/A16). Heals
    * any crashed compaction first: a crash between compact()'s snapshot
    * rename and its epoch deletions leaves every latest-per-key row
    * DUPLICATED (snapshot + original epoch), which registerLatestView
    * masks but this raw view — and the A13 `_count` contract over it —
    * would report inflated.
    */
  def registerView(spark: SparkSession, indexPath: String, name: String): Unit = {
    healCompaction(spark, indexPath)
    spark.read.parquet(s"$indexPath/*").drop("_epoch").createOrReplaceTempView(name)
  }

  /** Last-write-per-key resolution over the epoch history (shared by the
    * query-time view and compaction so the two can never diverge).
    */
  private def latestPerKey(df: DataFrame, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("_epoch").desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** UPSERT semantics (the actual OpenSearch contract: indexing a doc id
    * again OVERWRITES it — reference iac/s2_app.py:841-858 delivers by
    * document id): last write per key wins, resolved at query time over
    * the epoch history. `compact` below materializes the same result.
    */
  def registerLatestView(spark: SparkSession, indexPath: String,
      name: String, key: String): Unit = {
    healCompaction(spark, indexPath)
    latestPerKey(spark.read.parquet(s"$indexPath/*"), key)
      .drop("_epoch")
      .createOrReplaceTempView(name)
  }

  /** Finish a compaction that crashed between its snapshot rename and
    * its epoch deletions (see [[compact]]'s manifest protocol): if the
    * in-flight manifest names a snapshot that exists, the listed victim
    * epochs are duplicates of snapshot rows — delete any that remain.
    * A manifest without its END terminator is an incomplete write from
    * a crash BEFORE the rename (the rename only runs after the manifest
    * is fully persisted): its victim list cannot be trusted and nothing
    * was renamed, so it is simply discarded. A manifest that cannot be
    * READ (readFullyUtf8 None on an existing path: checksum error,
    * transient FS fault) is NOT discarded — it may be a perfectly valid
    * manifest whose victim deletions are still pending, and deleting it
    * would leave the raw-count surface inflated until the next full
    * compact; the heal simply retries at the next entry. Idempotent;
    * no-op when no manifest exists.
    *
    * Serialized against [[compact]] at TWO scopes: the JVM-local lock
    * (cheap, same-process sessions) and the cross-process
    * [[MaintenanceLease]] — a registration's heal racing a LIVE
    * compaction would otherwise read — and then delete — the manifest
    * the compaction is still relying on, re-opening the crash window
    * the manifest exists to close. The registration-path heal is
    * OPPORTUNISTIC about the lease (try-once, no wait): a held-fresh
    * lease means a live maintainer that will finish its own deletions,
    * and a registration must not block behind (or fail because of) it;
    * a crashed maintainer's lease goes TTL-stale and the next
    * registration breaks it and heals. Readers themselves stay
    * unserialized, as always — the lease protects maintenance
    * mutations, not scans.
    */
  private def healCompaction(spark: SparkSession, indexPath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // Fast path OUTSIDE the locks: no manifest, nothing to heal — the
    // common case for every registration on a healthy index.
    if (!fs.exists(manifestPath(indexPath))) return
    maintenanceLock(indexPath).synchronized {
      MaintenanceLease.acquire(fs, leasePath(indexPath), timeoutMs = 0)
        .foreach { lease =>
          try healLocked(fs, root, indexPath) finally lease.close()
        }
    }
  }

  /** The heal body — caller must hold the JVM lock AND the lease. */
  private def healLocked(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, indexPath: String): Unit = {
    val mf = manifestPath(indexPath)
    if (!fs.exists(mf)) return
    BufferedChannel.readFullyUtf8(fs, mf).foreach { text =>
      val lines = text.split("\n", -1).toSeq.dropRight(1) // trailing \n
      if (lines.length >= 2 && lines.last == "END") {
        val snapshot = lines.head
        val victims = lines.tail.dropRight(1)
        if (fs.exists(new org.apache.hadoop.fs.Path(root, snapshot)))
          victims.foreach(v =>
            fs.delete(new org.apache.hadoop.fs.Path(root, v), true))
      }
      // Spent (or torn-and-untrusted) — only now that the read
      // SUCCEEDED. On a read failure the manifest survives for the
      // next heal attempt (see scaladoc).
      fs.delete(mf, false)
    }
  }

  /** OUTSIDE the index root, like `.compact.tmp`: a manifest inside the
    * root would be expanded by the raw-read star-glob as an explicit
    * root path (exempt from the hidden-file filter) and fail parquet
    * footer reads for the whole rename-to-deletion window.
    */
  private def manifestPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/") + ".compact.inflight")

  /** Sibling of the manifest, for the same star-glob reason. */
  private[streaming] def leasePath(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/") + ".maintenance.lease")

  /** One JVM-local lock per index path serializes compact() and the
    * heals embedded in view registration within THIS process — cheap,
    * and it also keeps same-process sessions from contending on the
    * cross-process [[MaintenanceLease]] underneath it. Unbounded growth
    * is not a concern: one entry per distinct index root ever touched.
    */
  private val maintenanceLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def maintenanceLock(indexPath: String): Object =
    maintenanceLocks.computeIfAbsent(indexPath.stripSuffix("/"), _ => new Object)

  /** Materialize upsert resolution like an index segment merge: the
    * epoch history is REPLACED by one snapshot directory (written
    * outside the index first — writing into the glob being read would
    * self-overwrite — then swapped in).
    *
    * Crash-safe ordering: the snapshot moves IN (under a fresh unique
    * epoch name) BEFORE the old epoch dirs are deleted, so the index is
    * readable at every instant — never a window where the only copy sits
    * outside the read glob. A crash mid-deletion leaves snapshot + some
    * old epochs coexisting: the rows are exact duplicates with their
    * original `_epoch` values, so `registerLatestView` still resolves
    * correctly — and the in-flight manifest written before the rename
    * lets [[healCompaction]] (run at every compact/registerView entry)
    * finish the deletions, so the raw-count surface self-heals instead
    * of reporting inflated until a manual re-compaction. Stale
    * `.compact.tmp` from a crashed attempt is dropped at entry.
    *
    * Concurrency-safe vs a live delivery query: the epoch set is listed
    * ONCE, up front, and both the snapshot read and the deletion use
    * exactly that set — an epoch the streaming query delivers while the
    * snapshot is being written (the window spans the whole shuffle +
    * parquet write) is neither read nor deleted; it simply rides until
    * the next compaction. Listing after the write would delete it —
    * permanent loss of everything delivered during compaction.
    *
    * All file mechanics go through the Hadoop [[org.apache.hadoop.fs
    * .FileSystem]] API like every other component here, so compaction
    * works unchanged on HDFS / S3A / local paths.
    * Returns rows in the snapshot.
    */
  def compact(spark: SparkSession, indexPath: String, key: String,
      shards: Int,
      leaseTtlMs: Long = MaintenanceLease.DefaultTtlMs,
      leaseTimeoutMs: Long = MaintenanceLease.DefaultAcquireTimeoutMs): Long =
      maintenanceLock(indexPath).synchronized {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // Cross-process exclusivity for the WHOLE maintenance window (heal
    // through deletions): unlike the registration heal, a compaction
    // WAITS for the lease — and throws past the timeout rather than
    // proceeding unserialized (two compactors listing, snapshotting,
    // and deleting the same epochs would lose whichever epochs landed
    // between their listings).
    val lease = MaintenanceLease.acquire(fs, leasePath(indexPath),
      ttlMs = leaseTtlMs, timeoutMs = leaseTimeoutMs)
      .getOrElse(throw new java.io.IOException( // unreachable: timeout>0 throws
        s"maintenance lease unavailable for $indexPath"))
    try compactLeased(spark, indexPath, key, shards, root, fs)
    finally lease.close()
  }

  /** The compaction body — caller holds the JVM lock AND the lease. */
  private def compactLeased(spark: SparkSession, indexPath: String,
      key: String, shards: Int, root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Long = {
    healLocked(fs, root, indexPath) // finish a crashed predecessor first
    val tmp = new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/") + ".compact.tmp")
    fs.delete(tmp, true)
    val old =
      if (!fs.exists(root)) Seq.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
    if (old.isEmpty) return 0L
    latestPerKey(spark.read.parquet(old.map(_.toString): _*), key)
      .repartition(shards)
      .write.mode("overwrite").parquet(tmp.toString)
    val gen = 1L + old.map(_.getName)
      .filter(_.startsWith("epoch=compact-"))
      .map(n => scala.util.Try(n.stripPrefix("epoch=compact-").toLong).getOrElse(0L))
      .foldLeft(0L)(math.max)
    val snapshot = new org.apache.hadoop.fs.Path(root, s"epoch=compact-$gen")
    // In-flight manifest BEFORE the rename: a crash between the rename
    // and the deletions below would otherwise leave every snapshot row
    // duplicated in the surviving epoch dirs with nothing to trigger
    // cleanup (healCompaction replays the deletions from this manifest;
    // the END terminator proves the write completed — see its scaladoc).
    val mf = manifestPath(indexPath)
    val out = fs.create(mf, true)
    try out.write((snapshot.getName +: old.map(_.getName) :+ "END")
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, snapshot)) {
      fs.delete(mf, false) // nothing renamed — retract the manifest
      throw new java.io.IOException(
        s"compact aborted: rename $tmp -> $snapshot failed")
    }
    old.foreach(p => fs.delete(p, true))
    fs.delete(mf, false) // deletions complete — the manifest is spent
    // Count the snapshot dir itself, not the whole glob: cheaper, and
    // correct when concurrent epochs landed during compaction.
    spark.read.parquet(snapshot.toString).count()
  }

  /** The live VECTOR view over an enriched delivery index (see
    * [[start]]'s `enrich`): upsert-resolved (last write per `key`, like
    * [[registerLatestView]]) with the ANN columns intact — feed it
    * straight to [[graft.operators.Ivf.search]] /
    * [[graft.operators.IvfPq.search]] as their `indexed`/`encoded`
    * side. Heals crashed compactions first, like every read entry.
    */
  def liveVectors(spark: SparkSession, indexPath: String,
      key: String): DataFrame = {
    healCompaction(spark, indexPath)
    latestPerKey(spark.read.parquet(s"$indexPath/*"), key).drop("_epoch")
  }

  /** A13: the `_count` + match_all surface over the index. */
  def count(spark: SparkSession, name: String): Long =
    spark.table(name).count()

  /** Analyzed full-text `match` query — the reference's index mapping
    * types `description` as analyzed `text` (debug/s2_inspect_data_in_oss
    * .py:20-31), so queries match at TOKEN level, not whole-string. Both
    * sides go through the same analyzer ([[graft.functions.TextFunctions
    * .tokens]]: lowercase, \\W+ split — the standard-analyzer shape), and
    * `_score` is the count of matched query tokens (descending, doc key
    * tie-break left to the caller). `operator`:
    *  - "or" (the match-query default): ≥1 query token present;
    *  - "and": every query token present.
    * All pure codegen'd expressions over the view — a narrow filter +
    * project that scales as a scan, no shuffle.
    */
  def matchQuery(spark: SparkSession, name: String, field: String,
      query: String, operator: String = "or"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val qToks = array_distinct(tokens(lit(query)))
    val dToks = array_distinct(tokens(col(field)))
    val score = size(array_intersect(dToks, qToks))
    val pred = operator.toLowerCase match {
      case "and" => size(array_except(qToks, dToks)) === 0 && size(qToks) > 0
      case _     => score > 0
    }
    spark.table(name)
      .withColumn("_score", score)
      .filter(pred)
      .orderBy(col("_score").desc)
  }

  /** BM25-RANKED analyzed match — what the reference's search endpoint
    * actually returns: OpenSearch scores a `match` query with BM25
    * (k1=1.2, b=0.75, the Lucene defaults) using the LIVE index's own
    * term/length statistics, so relevance shifts as deliveries land.
    * This runs [[graft.operators.Retrieval.bm25]] over the registered
    * view with the analyzed query tokens (same analyzer as
    * [[matchQuery]]: lowercase, \\W+ split, both sides) and returns the
    * top-k as (key, _score), score-descending with the key as
    * tie-break. `operator` as in [[matchQuery]]: "or" keeps any match
    * (BM25's natural domain), "and" keeps docs containing EVERY query
    * token — the distinct-matched-term count falls out of the scoring
    * agg, so AND costs no extra pass. Scale: one corpus-sized shuffle
    * (the tf agg) + TakeOrderedAndProject for the top-k — never a
    * global sort of the scored corpus.
    */
  def rankedMatch(spark: SparkSession, name: String, field: String,
      key: String, query: String, operator: String = "or",
      k: Int = 10): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(k > 0, s"top-k must be positive, got $k")
    val terms = analyzeQuery(query)
    val toks = spark.table(name)
      .select(col(key).as("doc_id"), tokens(col(field)).as("toks"))
    finishRanked(graft.operators.Retrieval.bm25(spark, toks, terms),
      key, terms.size, operator, k)
  }

  /** [[rankedMatch]] served from a PREBUILT postings index
    * ([[textIndex]] / `Retrieval.buildTextIndex`): same analyzer, same
    * scoring, but the query touches only its terms' postings instead
    * of re-scanning the view — the shape for a query-heavy endpoint.
    * Rebuild (or `Retrieval.writeTextIndex`-persist) the index per
    * delivered epoch batch; incremental per-epoch postings maintenance
    * is future work.
    */
  def rankedMatch(spark: SparkSession, index: graft.operators.Retrieval.TextIndex,
      key: String, query: String, operator: String, k: Int): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    val terms = analyzeQuery(query)
    finishRanked(graft.operators.Retrieval.bm25FromIndex(spark, index, terms),
      key, terms.size, operator, k)
  }

  /** One corpus pass over the registered view builds the reusable
    * postings index for the index-backed [[rankedMatch]] overload.
    */
  def textIndex(spark: SparkSession, name: String, field: String,
      key: String): graft.operators.Retrieval.TextIndex = {
    import graft.functions.TextFunctions.tokens
    graft.operators.Retrieval.buildTextIndex(spark,
      spark.table(name).select(col(key).as("doc_id"), tokens(col(field)).as("toks")))
  }

  /** Driver-side analyzer — identical semantics to tokens(): Java-
    * regex \\W+ split and LOCALE-ROOT lowercasing (Spark's lower() is
    * locale-independent; a bare toLowerCase under e.g. a Turkish
    * default locale folds I to dotless ı and silently matches
    * nothing). The term list must be a Scala value for bm25's isin
    * pushdown.
    */
  private def analyzeQuery(query: String): Seq[String] = {
    val terms = query.toLowerCase(java.util.Locale.ROOT)
      .split("\\W+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, s"query '$query' analyzes to no tokens")
    terms
  }

  /** Shared tail of both rankedMatch overloads: AND semantics from the
    * distinct-matched-term count, then rank and emit the ROUNDED score
    * (2 dp, key tie-break) — the raw per-doc float sum's addition
    * order is partition-dependent, so a last-ulp flip across runs of
    * the SAME live index could reorder or re-cut the top-k (the q85
    * lesson, applied to the live surface).
    */
  private def finishRanked(scored: DataFrame, key: String, nTerms: Int,
      operator: String, k: Int): DataFrame = {
    val kept = operator.toLowerCase(java.util.Locale.ROOT) match {
      case "and" => scored.filter(col("n_terms") === nTerms)
      case _     => scored
    }
    val r2 = floor(col("score") * 100 + lit(0.5)) / 100
    kept.select(col("doc_id").as(key), r2.as("_score"))
      .orderBy(col("_score").desc, col(key))
      .limit(k)
  }
}
