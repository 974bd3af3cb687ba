package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.DeliveryStatus._
import graft.streaming.DeliveryPipeline

/** E2E streaming pipeline test — the reference's own correctness bar
  * (README.rst:113-124): count conservation across the audit channels,
  * count(source) == count(backup) == count(success) + count(failed) + dropped.
  */
class PipelineSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  test("dual-sink delivery conserves every record across the audit channels") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-pipe").toString

    // Source: events replayed as NDJSON envelope files (2 micro-batches).
    val ev = queries.Tables.events(spark, sfDir).limit(400)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val lines = ev.select(
      col("event_id").cast("string").as("recordId"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"), col("value")))
        .as("line"))
    val nSrc = lines.count()
    lines.select(to_json(struct(col("recordId"), col("line")))).coalesce(2)
      .write.mode("overwrite").text(s"$tmp/in")

    val envelope = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType), StructField("line", StringType))))
      .json(s"$tmp/in")
      .select(col("recordId"), lit(0L).as("approximateArrivalTimestamp"),
        col("line").cast("binary").as("data"))

    val sinks = DeliveryPipeline.Sinks(s"$tmp/out")
    val (backupQ, deliveryQ) = DeliveryPipeline.start(
      envelope, payloadSchema, sinks, s"$tmp/ckpt",
      dropIf = p => p.getField("value") < 10)
    backupQ.awaitTermination(120000)
    deliveryQ.awaitTermination(120000)

    val nBackup = DeliveryPipeline.countChannel(spark, sinks.backup)
    val nSuccess = DeliveryPipeline.countChannel(spark, sinks.success)
    val nFailed = DeliveryPipeline.countChannel(spark, sinks.failed)
    val nDropped = ev.filter(col("value") < 10).count()

    assert(nBackup == nSrc, "backup channel must carry every raw record")
    assert(nSuccess + nFailed + nDropped == nSrc, "3-way routing must conserve records")
    assert(nSuccess > 0 && nDropped > 0)
    // Exact per-channel counts match the batch routing rules (no
    // malformed rows in this slice → failed == 0, success == !dropped).
    assert(nSuccess == ev.filter(col("value") >= 10).count())
    assert(nFailed == 0)

    // Success channel is valid NDJSON with the transformed payload schema.
    val reread = spark.read.schema(payloadSchema).json(sinks.success + "/*")
    assert(reread.count() == nSuccess)
    assert(reread.filter(col("value") < 10).count() == 0)
  }

  test("malformed payloads route to the failed channel, raw bytes preserved") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-pipe2").toString
    Seq(
      """{"recordId": "a", "line": "{\"event_id\": 1, \"user_id\": 2, \"event_type\": \"view\", \"value\": 50.0}"}""",
      """{"recordId": "b", "line": "THIS IS NOT JSON"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(s"$tmp/in")

    val envelope = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType), StructField("line", StringType))))
      .json(s"$tmp/in")
      .select(col("recordId"), lit(0L).as("approximateArrivalTimestamp"),
        col("line").cast("binary").as("data"))
    val sinks = DeliveryPipeline.Sinks(s"$tmp/out")
    val (b, d) = DeliveryPipeline.start(envelope, payloadSchema, sinks, s"$tmp/ckpt",
      dropIf = _ => lit(false))
    b.awaitTermination(120000)
    d.awaitTermination(120000)

    assert(DeliveryPipeline.countChannel(spark, sinks.success) == 1)
    assert(DeliveryPipeline.countChannel(spark, sinks.failed) == 1)
    val failedLine = spark.read.text(sinks.failed + "/*").head().getString(0)
    assert(failedLine == "THIS IS NOT JSON")
  }

  test("checkpoint restart resumes without reprocessing delivered epochs") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-restart").toString
    def envelope = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType), StructField("line", StringType))))
      .json(s"$tmp/in")
      .select(col("recordId"), lit(0L).as("approximateArrivalTimestamp"),
        col("line").cast("binary").as("data"))
    def writeBatch(ids: Range, file: String): Unit =
      ids.map(i => s"""{"recordId": "r$i", "line": "{\\"event_id\\": $i, \\"user_id\\": 1, \\"event_type\\": \\"view\\", \\"value\\": 50.0}"}""")
        .toDF("value").coalesce(1).write.mode("append").text(s"$tmp/in")
    writeBatch(1 to 50, "b0")
    val sinks = DeliveryPipeline.Sinks(s"$tmp/out")
    val (b1, d1) = DeliveryPipeline.start(envelope, payloadSchema, sinks,
      s"$tmp/ckpt", dropIf = _ => lit(false))
    b1.awaitTermination(120000); d1.awaitTermination(120000)
    assert(DeliveryPipeline.countChannel(spark, sinks.success) == 50)

    // New data lands; a RESTARTED query (same checkpoint) picks up only
    // the new files — delivered epochs are not reprocessed or duplicated.
    writeBatch(51 to 80, "b1")
    val (b2, d2) = DeliveryPipeline.start(envelope, payloadSchema, sinks,
      s"$tmp/ckpt", dropIf = _ => lit(false))
    b2.awaitTermination(120000); d2.awaitTermination(120000)
    assert(DeliveryPipeline.countChannel(spark, sinks.success) == 80)
    assert(DeliveryPipeline.countChannel(spark, sinks.backup) == 80)
    // recordIds unique end-to-end (no replay duplicates).
    val ids = spark.read.text(sinks.success + "/*")
      .select(get_json_object(col("value"), "$.event_id")).distinct().count()
    assert(ids == 80)
  }

  test("recordId dedup upgrades a replayed source to effectively-once") {
    import spark.implicits._
    val base = (1 to 100).map(i => (s"r$i", new java.sql.Timestamp(1700000000000L + i * 1000)))
    val dup = base ++ base.take(30) // 30 replayed records
    val env = dup.toDF("recordId", "arrivalTs")
    // Batch-mode dropDuplicates has identical semantics to the streaming
    // state-store path on a closed input.
    val deduped = env.dropDuplicates("recordId")
    assert(deduped.count() == 100)
  }

  test("watermark drops late events (streaming, crafted out-of-order input)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wm").toString
    // Batch 0: events up to 12:00. Batch 1: a 10:00 straggler (2h late,
    // way past the 10-minute watermark) + one fresh event.
    val b0 = Seq(
      """{"event_id": 1, "ts": "2024-01-01 11:00:00", "event_type": "view"}""",
      """{"event_id": 2, "ts": "2024-01-01 12:00:00", "event_type": "view"}""")
    val b1 = Seq(
      """{"event_id": 3, "ts": "2024-01-01 10:00:00", "event_type": "view"}""",
      """{"event_id": 4, "ts": "2024-01-01 12:05:00", "event_type": "view"}""")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.write(java.nio.file.Paths.get(s"$tmp/in/b0.json"),
      b0.mkString("\n").getBytes("UTF-8"))

    val stream = spark.readStream.schema(schema).json(s"$tmp/in")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("wm_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    Files.write(java.nio.file.Paths.get(s"$tmp/in/b1.json"),
      b1.mkString("\n").getBytes("UTF-8"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_out")
      .select(date_format(col("window.start"), "HH:mm").as("ws"), col("n"))
      .as[(String, Long)].collect().toMap
    // The 10:00 straggler must NOT create/extend the 10:00 window: the
    // watermark after batch 0 is 12:00 - 10min = 11:50 > 11:00.
    assert(!out.contains("10:00"), s"late event leaked into $out")
    assert(out("12:00") == 2) // fresh event updated the 12:00 window
  }
}
