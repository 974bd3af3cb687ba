package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.Codecs
import graft.model.DeliveryStatus._

/** The reference pipeline, Spark-native (SURVEY.md §0/§3 EP2):
  *
  * {{{
  * source (envelope stream)
  *   ├── writeStream A: raw backup → 01-backup/            (A9)
  *   └── writeStream B: decode → transform → 3-way route   (A3–A5)
  *         └── foreachBatch: NDJSON fan-out                 (A6–A8)
  *               Ok               → 03-success/
  *               Dropped          → (counted, not delivered — Firehose
  *                                   drops these by contract)
  *               ProcessingFailed → 04-failed/
  * }}}
  *
  * Design notes, scale-first:
  * - ONE source lineage feeds both queries (reference fan-out A11: two
  *   delivery streams on the same Kinesis stream). Each micro-batch is a
  *   distributed DataFrame; the transform is a single codegen'd
  *   projection — no per-record driver work anywhere.
  * - Buffering (reference 5 MB / 60 s, iac/s2_app.py:810-815) maps to
  *   `Trigger.ProcessingTime` — time-based only; the size-OR-time flush
  *   is a documented deviation (SURVEY.md §4). Tests use AvailableNow.
  * - Delivery semantics: checkpointed replay = at-least-once; per-epoch
  *   overwrite subdirectories make retried epochs idempotent
  *   (effectively-once per channel, the reference's backup/retry model
  *   A12). `dedupByRecordId` upgrades a replayed source to
  *   effectively-once end-to-end.
  * - NDJSON framing: one JSON object + \n per line (the reference's
  *   invariant counted by debug/s2_inspect_data_in_s3.py:19-23) — text
  *   writer over `to_json` rows.
  */
object DeliveryPipeline {

  final case class Sinks(root: String) {
    val backup = s"$root/$BackupPrefix"
    val success = s"$root/$SuccessPrefix"
    val failed = s"$root/$FailedPrefix"
  }

  /** Effectively-once upgrade for at-least-once sources: drop replayed
    * recordIds inside the watermark horizon (SURVEY §2A A12 / Q31
    * streaming form). dropDuplicatesWithinWatermark is the variant whose
    * dedup state is actually EVICTED by the watermark — plain
    * dropDuplicates on a non-event-time subset keeps state forever.
    */
  def dedupByRecordId(envelope: DataFrame, arrivalCol: String = "arrivalTs",
      horizon: String = "10 minutes"): DataFrame =
    envelope
      .withWatermark(arrivalCol, horizon)
      .dropDuplicatesWithinWatermark("recordId")

  /** Start the full dual-sink graph over a streaming envelope frame
    * (columns: recordId, approximateArrivalTimestamp, data: binary).
    * Returns both queries (backup, delivery).
    */
  def start(
      envelope: DataFrame,
      payloadSchema: StructType,
      sinks: Sinks,
      checkpointRoot: String,
      dropIf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      trigger: Trigger = Trigger.AvailableNow()): (StreamingQuery, StreamingQuery) = {

    // A9: raw pre-transform copy, untouched bytes.
    val backupQ = envelope
      .select(col("recordId"), col("data").cast("string").as("line"))
      .writeStream
      .queryName("graft-backup")
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpointRoot/backup")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeChannel(batch.select("line"), s"${sinks.backup}/epoch=$epochId")
      }
      .start()

    // A3–A8: decode → route → fan-out.
    val deliveryQ = envelope.writeStream
      .queryName("graft-delivery")
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpointRoot/delivery")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val routed = Codecs
          .transformEnvelope(batch, payloadSchema, dropIf)
          .withColumn("line", col("data").cast("string"))
          .select("result", "line")
          .persist()
        try {
          writeChannel(routed.filter(col("result") === Ok).select("line"),
            s"${sinks.success}/epoch=$epochId")
          writeChannel(routed.filter(col("result") === ProcessingFailed).select("line"),
            s"${sinks.failed}/epoch=$epochId")
        } finally routed.unpersist()
      }
      .start()

    (backupQ, deliveryQ)
  }

  /** NDJSON channel write: per-epoch overwrite = idempotent on replay.
    * `line` already carries its trailing newline from the codec, so the
    * text writer's own line separator is trimmed via rtrim → write once.
    */
  private def writeChannel(lines: DataFrame, path: String): Unit =
    lines.select(rtrim(col("line"), "\n").as("value"))
      .write.mode("overwrite").text(path)

  /** Count records across all epoch subdirs of a channel — the
    * reference's newline-count check (debug/s2_inspect_data_in_s3.py:19-23).
    */
  def countChannel(spark: SparkSession, path: String): Long = {
    val dir = new java.io.File(path)
    if (!dir.exists || dir.listFiles == null || dir.listFiles.isEmpty) 0L
    else spark.read.text(path + "/*").count()
  }
}
