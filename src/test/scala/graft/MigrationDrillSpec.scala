package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.DeliveryPipeline

/** MIGRATION.md §1's connector-binding table, executable: a mock stream
  * bearing the EXACT column names a published `spark-sql-kinesis`
  * connector emits (`data` binary, `streamName`, `partitionKey`,
  * `sequenceNumber`, `approximateArrivalTimestamp` timestamp) feeds
  * [[DeliveryPipeline.start]] after applying ONLY the documented
  * renames — proving the table is sufficient and binding a real
  * connector is a column rename, not a port. This is the zero-egress
  * stand-in for the one piece a user deploying against actual AWS
  * writes themselves (the documented non-goal; reference wire shape:
  * `kds_example/kds_helper.py:8-23`).
  */
class MigrationDrillSpec extends SparkSpec {

  test("the §1 rename table alone binds a connector-shaped stream to the " +
      "delivery pipeline: conservation + routing hold with no other change") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-migration").toString
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))

    // 50 well-formed events + 3 malformed records, as the CONNECTOR
    // would hand them: raw NDJSON bytes in `data` (connectors hand raw
    // bytes; base64 is Firehose's transport form — hence
    // wireBase64 = false below, exactly as the table says), a
    // sequenceNumber per record, a real timestamp.
    import spark.implicits._
    val good = (1 to 50).map(i => (i.toLong, i.toDouble))
      .toDF("event_id", "value")
      .select(to_json(struct(col("event_id"), col("value"))).as("line"),
        col("event_id"))
    val bad = Seq(101L, 102L, 103L).toDF("event_id")
      .select(lit("definitely \u0000not json").as("line"), col("event_id"))
    good.unionByName(bad)
      .select(to_json(struct(
        col("line").as("data"),
        lit("drill-stream").as("streamName"),
        col("event_id").cast("string").as("partitionKey"),
        concat(lit("seq-"), lpad(col("event_id").cast("string"), 6, "0"))
          .as("sequenceNumber"),
        lit(1723600000000L).as("arrivalMillis"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$tmp/wire")

    // The connector-shaped frame: exact spark-sql-kinesis names/types.
    val kinesisShaped = spark.readStream
      .schema(StructType(Seq(
        StructField("data", StringType),
        StructField("streamName", StringType),
        StructField("partitionKey", StringType),
        StructField("sequenceNumber", StringType),
        StructField("arrivalMillis", LongType))))
      .json(s"$tmp/wire")
      .select(col("data").cast("binary").as("data"),
        col("streamName"), col("partitionKey"), col("sequenceNumber"),
        (col("arrivalMillis") / 1000).cast("timestamp")
          .as("approximateArrivalTimestamp"))

    // ——— THE DRILL: the §1 table, verbatim, and nothing else ———
    // sequenceNumber → recordId; approximateArrivalTimestamp passes
    // through (timestamp accepted directly); data passes through raw.
    val envelope = kinesisShaped.select(
      col("sequenceNumber").as("recordId"),
      col("approximateArrivalTimestamp"),
      col("data"))

    val sinks = DeliveryPipeline.Sinks(s"$tmp/out")
    val pipe = DeliveryPipeline.start(envelope, payloadSchema, sinks,
      s"$tmp/ckpt", dropIf = p => p.getField("value") < 10,
      wireBase64 = false)
    assert(pipe.awaitTermination(180000), "drill pipeline timed out")

    // Conservation across the 4-channel contract: 50 good (9 dropped
    // by the rule, 41 delivered Ok) + 3 unparseable (ProcessingFailed).
    val success = DeliveryPipeline.countChannel(spark, sinks.success)
    val failed = DeliveryPipeline.countChannel(spark, sinks.failed)
    val backup = DeliveryPipeline.countChannel(spark, sinks.backup)
    assert(success == 41L, s"success channel: $success")
    assert(failed == 3L, s"failed channel: $failed")
    assert(backup == 53L, s"raw backup must hold every source record: $backup")

    // And the delivered payloads round-trip: the Ok channel carries the
    // transformed NDJSON whose ids are exactly the non-dropped events.
    val delivered = spark.read.schema(payloadSchema)
      .json(sinks.success + "/object-*")
    assert(delivered.agg(collect_set(col("event_id"))).head().getSeq[Long](0)
      .toSet == (10L to 50L).toSet, "delivered ids diverged")
  }

  test("the same rename table binds the connector-shaped stream to the " +
      "index sink with ALL SIX maintenance hooks (current signature)") {
    // The drill must track [[graft.streaming.IndexSink.start]]'s real
    // surface as it grows (round-14: the r13 drill predated the
    // sketchState/rateState hooks — a rename table proven against a
    // four-hook signature says nothing about the sink a production
    // migration would actually start).
    import graft.streaming.{IndexSink, LiveRates, LiveSketch}
    val tmp = java.nio.file.Files.createTempDirectory("graft-migration-ix").toString
    val payloadSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("text", StringType),
      StructField("source", StringType)))
    import spark.implicits._
    Seq(
      ("d1", "spark streams deliver data", "web"),
      ("d2", "the index holds spark data", "web"),
      ("d3", "unrelated prose entirely", "book"))
      .toDF("doc_id", "text", "source")
      .select(to_json(struct(
        to_json(struct(col("doc_id"), col("text"), col("source"))).as("data"),
        lit("drill-stream").as("streamName"),
        col("doc_id").as("partitionKey"),
        concat(lit("seq-"), col("doc_id")).as("sequenceNumber"),
        lit(1723600000000L).as("arrivalMillis"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$tmp/wire")
    val kinesisShaped = spark.readStream
      .schema(StructType(Seq(
        StructField("data", StringType), StructField("streamName", StringType),
        StructField("partitionKey", StringType),
        StructField("sequenceNumber", StringType),
        StructField("arrivalMillis", LongType))))
      .json(s"$tmp/wire")
    // §1 renames, verbatim — identical to the pipeline drill above.
    val envelope = kinesisShaped.select(
      col("sequenceNumber").as("recordId"),
      (col("arrivalMillis") / 1000).cast("timestamp")
        .as("approximateArrivalTimestamp"),
      col("data").cast("binary").as("data"))
    val percQueries = Seq((1L, Seq("spark", "data"))).toDF("query_id", "terms")
    val q = IndexSink.start(envelope, payloadSchema,
      s"$tmp/index", s"$tmp/backup", s"$tmp/ckpt", shards = 2,
      dropIf = _ => org.apache.spark.sql.functions.lit(false),
      textIndex = Some(IndexSink.LiveIndexSpec(s"$tmp/tindex", "text",
        key = "doc_id", shards = 2)),
      spanState = Some(IndexSink.LiveSpanSpec(s"$tmp/sstate", "text",
        key = "doc_id", k = 3, shards = 2)),
      percolator = Some(IndexSink.PercolatorSpec(percQueries,
        s"$tmp/alerts", "text", key = "doc_id")),
      nearDupState = Some(IndexSink.LiveNearDupSpec(s"$tmp/ndstate",
        "text", key = "doc_id", shards = 2)),
      sketchState = Some(IndexSink.LiveSketchSpec(s"$tmp/sketch",
        "text", key = "doc_id")),
      rateState = Some(IndexSink.LiveRateSpec(s"$tmp/rates", "source")))
    assert(q.awaitTermination(180000), "index drill timed out")
    // Delivery conserved, and every one of the six maintained artifacts
    // materialized from the renamed stream.
    assert(spark.read.parquet(s"$tmp/index/*").count() == 3L)
    assert(graft.streaming.LiveTextIndex.read(spark, s"$tmp/tindex")
      .postings.count() > 0)
    assert(graft.streaming.LiveSpanDedup
      .occForDocs(spark, s"$tmp/sstate", StringType,
        Seq("d1", "d2", "d3").toDF("doc_id")).count() > 0)
    assert(spark.read.parquet(s"$tmp/alerts/*").count() == 2L,
      "percolator must alert on exactly d1 and d2")
    assert(graft.streaming.LiveNearDedup
      .currentSignatures(spark, s"$tmp/ndstate").count() == 3L)
    assert(LiveSketch.cells(spark, s"$tmp/sketch").count() > 0)
    assert(LiveRates.grid(spark, s"$tmp/rates")
      .agg(sum(col("cnt"))).head().getLong(0) == 3L,
      "rate grid must count every delivered record")
  }
}
