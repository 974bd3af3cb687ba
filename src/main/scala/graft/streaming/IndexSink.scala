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
    */
  def start(
      envelope: DataFrame,
      payloadSchema: StructType,
      indexPath: String,
      backupPath: String,
      checkpoint: String,
      shards: Int,
      dropIf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    envelope.writeStream
      .queryName("graft-index-delivery")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val routed = Codecs.transformEnvelope(batch, payloadSchema, dropIf).persist()
        try {
          routed
            .select(rtrim(col("data").cast("string"), "\n").as("value"))
            .write.mode("overwrite").text(s"$backupPath/epoch=$epochId")
          routed.filter(col("result") === Ok)
            .select(col("recordId"), col("payload.*"))
            .withColumn("_epoch", lit(epochId))
            .repartition(shards)
            .write.mode("overwrite").parquet(s"$indexPath/epoch=$epochId")
        } finally routed.unpersist()
      }
      .start()

  /** Register the delivered index as a queryable view (A14/A16). */
  def registerView(spark: SparkSession, indexPath: String, name: String): Unit =
    spark.read.parquet(s"$indexPath/*").drop("_epoch").createOrReplaceTempView(name)

  /** UPSERT semantics (the actual OpenSearch contract: indexing a doc id
    * again OVERWRITES it — reference iac/s2_app.py:841-858 delivers by
    * document id): last write per key wins, resolved at query time over
    * the epoch history. `compact` below materializes the same result.
    */
  def registerLatestView(spark: SparkSession, indexPath: String,
      name: String, key: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("_epoch").desc)
    spark.read.parquet(s"$indexPath/*")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_epoch")
      .createOrReplaceTempView(name)
  }

  /** Materialize upsert resolution: rewrite the epoch history into one
    * compacted snapshot (latest row per key), like an index segment
    * merge. Returns rows in the snapshot.
    */
  def compact(spark: SparkSession, indexPath: String, key: String,
      shards: Int): Long = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("_epoch").desc)
    val snapshot = spark.read.parquet(s"$indexPath/*")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .repartition(shards)
    snapshot.write.mode("overwrite").parquet(s"$indexPath/compacted")
    spark.read.parquet(s"$indexPath/compacted").count()
  }

  /** A13: the `_count` + match_all surface over the index. */
  def count(spark: SparkSession, name: String): Long =
    spark.table(name).count()
}
