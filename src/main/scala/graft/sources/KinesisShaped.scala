package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Kinesis-shaped streaming source surface (SURVEY §2A A1/A2/A18).
  *
  * Zero-egress environment: the real AWS connector cannot run here, so
  * the stream SEMANTICS are reproduced over Spark's own sources:
  *
  * - shard routing: `shard = hash(partitionKey) mod numShards` — the
  *   Kinesis contract the reference relies on (producer sets
  *   PartitionKey=id, data_producer/multi_process_producer.py:44; 10
  *   provisioned shards, iac/s2_app.py:713). Feeding this through
  *   `repartition(numShards, col("shard"))` reproduces per-shard ordering
  *   and hot-key behavior: a skewed partition key hot-shards here exactly
  *   as it would in Kinesis.
  * - load generation: the reference's 32×100-records/s Faker producer
  *   (multi_process_producer.py:26-76) becomes the `rate` source + column
  *   expressions — deterministic, backpressured, distributed.
  * - envelope: recordId + approximateArrivalTimestamp(millis) + data
  *   (NDJSON bytes), the Firehose input shape (tests/test_lbd_to_s3.py).
  */
object KinesisShaped {

  final case class StreamConfig(name: String, numShards: Int = 10)

  private val firstnames = typedLit(Seq("amy", "bob", "carol", "dan", "eve",
    "frank", "grace", "hank", "iris", "jack"))
  private val lastnames = typedLit(Seq("stone", "reed", "blake", "frost",
    "wolfe", "hayes", "cross", "lane", "moss", "pike"))
  private val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet")

  /** Record synthesis + envelope over any (value, timestamp) frame — ONE
    * definition shared by the streaming producer and its batch twin, so
    * the two can never drift apart.
    */
  private def synth(base: DataFrame, config: StreamConfig): DataFrame = {
    // Multipliers COPRIME with the 10-word table: a shared factor makes a
    // position degenerate (×10 ≡ one constant word, ×even cycles 5, ×5
    // cycles 2) — every description would carry artificial constant
    // n-grams no real corpus has.
    val descMults = Seq(1, 3, 7, 9, 11, 13, 17, 19, 21, 23)
    val descWords = (0 until 10).map(i =>
      element_at(typedLit(words), (pmod(col("value") * descMults(i) + i, lit(10)) + 1).cast("int")))
    val payload = struct(
      md5(concat(lit("id-"), col("value"))).as("id"),
      element_at(firstnames, (pmod(col("value"), lit(10)) + 1).cast("int")).as("firstname"),
      element_at(lastnames, (pmod(col("value") * 7, lit(10)) + 1).cast("int")).as("lastname"),
      concat_ws(" ", descWords: _*).as("description"),
      lit(0).as("balance"))
    base
      .withColumn("payload", payload)
      .select(
        col("value").cast("string").as("recordId"),
        unix_millis(col("timestamp")).as("approximateArrivalTimestamp"),
        concat(to_json(col("payload")), lit("\n")).cast("binary").as("data"),
        col("payload.id").as("partitionKey"))
      .withColumn("shard", pmod(hash(col("partitionKey")), lit(config.numShards)))
  }

  /** Deterministic `bank_account` record stream at a target rate: the
    * reference's load generator re-expressed as a declarative source.
    * Output: envelope columns + partitionKey + shard.
    */
  def bankAccountProducer(spark: SparkSession, config: StreamConfig,
      recordsPerSecond: Int): DataFrame =
    synth(
      spark.readStream.format("rate")
        .option("rowsPerSecond", recordsPerSecond.toString)
        .load(),
      config)

  /** Batch twin of the producer (same row synthesis from a value range) —
    * for tests and offline replay.
    */
  def bankAccountBatch(spark: SparkSession, config: StreamConfig, n: Long): DataFrame =
    synth(
      spark.range(n).select(col("id").as("value"),
        current_timestamp().as("timestamp")),
      config)

  /** Kinesis's physical layout: co-locate each shard's records
    * (hash-partitioned, per-shard ordered downstream).
    */
  def repartitionByShard(df: DataFrame, config: StreamConfig): DataFrame =
    df.repartition(config.numShards, col("shard"))

  /** A18 throughput metering: the reference's running-TPS counter
    * (multi_process_producer.py:53-59) as a StreamingQueryListener.
    *
    * @param queryName meter ONLY the query with this name — the listener
    *   bus is session-wide, so without a filter two concurrent queries
    *   (producer + index sink) pool into one inflated total. None =
    *   legacy pool-everything behavior for single-query sessions.
    */
  final class ThroughputListener(queryName: Option[String] = None)
      extends StreamingQueryListener {
    @volatile var totalRows: Long = 0L
    @volatile var lastRowsPerSecond: Double = 0.0
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (queryName.forall(_ == e.progress.name)) {
        totalRows += e.progress.numInputRows
        val r = e.progress.inputRowsPerSecond
        // The rate source's first progress event reports NaN (no elapsed
        // interval yet) — don't let it poison the last-seen gauge.
        if (!r.isNaN && !r.isInfinite) lastRowsPerSecond = r
      }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
