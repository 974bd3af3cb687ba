package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The envelope-source contract: what ANY wire connector must produce
  * to feed [[graft.streaming.DeliveryPipeline.start]] — the seam that
  * makes the zero-egress non-goal (no real AWS connector in this
  * build, SURVEY §7) airtight. A streaming DataFrame with EXACTLY the
  * Firehose input envelope (reference `tests/test_lbd_to_s3.py:11-22`):
  *
  *  - `recordId`: string, unique per record (the replay/dedup key);
  *  - `approximateArrivalTimestamp`: epoch-millis long OR timestamp
  *    (both accepted by the pipeline's watermark stage);
  *  - `data`: binary payload — raw NDJSON bytes, or base64 text bytes
  *    when [[wireBase64]] is true (the Firehose wire form,
  *    `kds_example/lbd/common.py:14`).
  *
  * Binding a REAL Kinesis connector (e.g. a published
  * `spark-sql-kinesis` package) is a rename, not a port: implement
  * [[envelope]] as the connector's `readStream.format("kinesis").load()`
  * with `sequenceNumber AS recordId`, its arrival timestamp column
  * passed through, `data` as-is, and `wireBase64 = false` (connectors
  * hand raw bytes; base64 is Firehose's transport form). Everything
  * downstream — backup fan-out, transform/route, buffering, index
  * sinks — is connector-agnostic.
  */
trait EnvelopeSource {

  /** The streaming envelope frame (see the contract above). */
  def envelope(spark: SparkSession): DataFrame

  /** True when `data` carries base64 TEXT bytes rather than the raw
    * payload — decoded once at the head of the shared lineage.
    */
  def wireBase64: Boolean = false
}

/** The in-repo load generator as an [[EnvelopeSource]]: the reference's
  * 32×100-records/s Faker producer re-expressed over the rate source
  * ([[KinesisShaped.bankAccountProducer]]), shard-tagged per the
  * Kinesis hash contract. Raw NDJSON bytes (no transport base64).
  */
final case class ProducerEnvelopeSource(config: KinesisShaped.StreamConfig,
    recordsPerSecond: Int) extends EnvelopeSource {
  override def envelope(spark: SparkSession): DataFrame =
    KinesisShaped.bankAccountProducer(spark, config, recordsPerSecond)
      .select("recordId", "approximateArrivalTimestamp", "data")
}

/** File-replay [[EnvelopeSource]]: NDJSON envelope files of
  * `{"recordId": ..., "data": <base64>}` — the offline twin of the wire
  * (what a Firehose S3 backup restores, and what the benchmark replays).
  * `maxFilesPerTrigger` bounds micro-batch size (0 = all available).
  *
  * Arrival time: ONE clock per stream, never mixed per record. With
  * `reArrival = false` (default) every record must carry the file's
  * own `approximateArrivalTimestamp` (historical fidelity — a missing
  * field fails LOUD); with `reArrival = true` every record is stamped
  * at read time (the Kinesis semantics for re-ingested data). Both
  * choices keep downstream event-time watermarks coherent. The two
  * rejected designs are the instructive ones: a constant `lit(0)`
  * freezes every watermark at epoch (dedup state never evicts), and a
  * per-record `coalesce(file, now)` mixes clocks — one legacy file
  * without the field races the watermark to NOW and the late filter
  * then silently DROPS every historical record that follows.
  */
final case class FileReplayEnvelopeSource(path: String,
    maxFilesPerTrigger: Int = 0,
    reArrival: Boolean = false) extends EnvelopeSource {
  import org.apache.spark.sql.types.LongType
  override def wireBase64: Boolean = true
  override def envelope(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType),
        StructField("approximateArrivalTimestamp", LongType),
        StructField("data", StringType))))
    val tuned = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    else reader
    val arrival =
      if (reArrival) unix_millis(current_timestamp())
      else coalesce(col("approximateArrivalTimestamp"), raise_error(concat(
        lit("FileReplayEnvelopeSource: record "),
        // recordId may ALSO be null on a malformed record — a null
        // message would degrade raise_error to a bare messageless
        // exception, defeating the fail-loud diagnostic.
        coalesce(col("recordId"), lit("<no recordId>")),
        lit(" has no approximateArrivalTimestamp — historical replay " +
          "needs the field on every record (use reArrival = true to " +
          "stamp at read time instead)"))).cast("long"))
    tuned.json(path)
      .select(col("recordId"), arrival.as("approximateArrivalTimestamp"),
        col("data").cast("binary").as("data"))
  }
}
