package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{DeliveryStatus, RoutedRecord}
import graft.streaming.{DeliveryPipeline, LambdaStage}
import graft.streaming.DeliveryPipeline.Sinks
import graft.streaming.LambdaStage.Rec

/** Cross-JVM-visible state for the retry tests: the BatchFn closure is
  * serialized per task, so a captured counter would increment an
  * executor-side COPY; a static referenced through the companion object
  * stays shared in local mode. The fns live here too so the closures
  * capture nothing at all.
  */
object LambdaStageSpec {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)

  val transientFn: LambdaStage.BatchFn = batch => {
    if (attempts.getAndIncrement() == 0) sys.error("transient dependency hiccup")
    batch.map(r => RoutedRecord(r.recordId, DeliveryStatus.Ok, r.data))
  }

  val alwaysFailFn: LambdaStage.BatchFn = _ => {
    attempts.getAndIncrement()
    sys.error("persistent failure")
  }
}

/** The transform-Lambda invocation contract (reference iac/s2_app.py:
  * 814-815: 3 MB processing buffer; kds_helper.py:29-63: one status per
  * record per invocation; iac/s2_app.py:354-356: NumberOfRetries=1).
  */
class LambdaStageSpec extends SparkSpec {

  private def rec(id: String, n: Int): Rec = Rec(id, Array.fill[Byte](n)('x'))

  test("groupByBytes cuts before the byte budget; oversized records ride alone") {
    val recs = Seq(rec("a", 40), rec("b", 40), rec("c", 40), // 80+cut
      rec("d", 500), // oversized: solo
      rec("e", 10), rec("f", 10))
    val groups = LambdaStage.groupByBytes(recs.iterator, maxBytes = 100).toSeq
    assert(groups.map(_.map(_.recordId)) ==
      Seq(Seq("a", "b"), Seq("c"), Seq("d"), Seq("e", "f")))
    // Every non-solo group is within budget; order is preserved end-to-end.
    groups.filter(_.size > 1).foreach(g => assert(g.map(_.data.length).sum <= 100))
    assert(groups.flatten.map(_.recordId) == recs.map(_.recordId))
  }

  test("invoke: per-record statuses applied; throwing invocation fails ONLY its batch") {
    import spark.implicits._
    val df = (1 to 10).map(i => (s"r$i", s"payload-$i".getBytes("UTF-8")))
      .toDF("recordId", "data")
    // Solo invocations (budget < any record) isolate the poison record.
    val fn: LambdaStage.BatchFn = batch => {
      if (batch.exists(r => new String(r.data).contains("-7"))) sys.error("boom")
      batch.map(r => RoutedRecord(r.recordId, DeliveryStatus.Ok,
        (new String(r.data).toUpperCase + "\n").getBytes("UTF-8")))
    }
    val out = LambdaStage.invoke(df, fn, maxInvocationBytes = 1)
      .select(col("recordId"), col("result"), col("data").cast("string"))
      .as[(String, String, String)].collect().toSeq.sortBy(_._1)
    assert(out.size == 10)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId("r7")._2 == DeliveryStatus.ProcessingFailed)
    assert(byId("r7")._3 == "payload-7", "failed record must keep RAW bytes")
    (1 to 10).filter(_ != 7).foreach { i =>
      assert(byId(s"r$i")._2 == DeliveryStatus.Ok)
      assert(byId(s"r$i")._3 == s"PAYLOAD-$i\n")
    }
  }

  test("invoke: a result-per-record contract violation fails the invocation") {
    import spark.implicits._
    val df = Seq(("a", "1".getBytes), ("b", "2".getBytes))
      .toDF("recordId", "data").coalesce(1) // one partition → one invocation
    // fn drops record b from its response — Firehose treats that as a
    // failed transform batch, not a silent record loss.
    val fn: LambdaStage.BatchFn = batch =>
      batch.filter(_.recordId == "a")
        .map(r => RoutedRecord(r.recordId, DeliveryStatus.Ok, r.data))
    val out = LambdaStage.invoke(df, fn) // both records in one invocation
      .select("recordId", "result").as[(String, String)].collect().toMap
    assert(out == Map("a" -> DeliveryStatus.ProcessingFailed,
      "b" -> DeliveryStatus.ProcessingFailed))
  }

  test("invoke: a replayed recordId in one batch gets one result per occurrence") {
    import spark.implicits._
    // An at-least-once source without dedupByRecordId can deliver the
    // same recordId twice into one invocation batch; a conforming Lambda
    // returns one result per COPY, and neither copy (nor the rest of the
    // batch) may be misrouted to failed for it.
    val df = Seq(("r1", "a".getBytes), ("r1", "b".getBytes), ("r2", "c".getBytes))
      .toDF("recordId", "data").coalesce(1) // one partition → one invocation
    val fn: LambdaStage.BatchFn = batch =>
      batch.map(r => RoutedRecord(r.recordId, DeliveryStatus.Ok,
        (new String(r.data).toUpperCase + "\n").getBytes("UTF-8")))
    val out = LambdaStage.invoke(df, fn)
      .select(col("recordId"), col("result"), col("data").cast("string"))
      .as[(String, String, String)].collect().toSeq
    assert(out.size == 3)
    assert(out.forall(_._2 == DeliveryStatus.Ok), s"misrouted: $out")
    // Occurrence pairing: each copy keeps ITS transformed payload.
    assert(out.filter(_._1 == "r1").map(_._3).sorted == Seq("A\n", "B\n"))
    assert(out.filter(_._1 == "r2").map(_._3) == Seq("C\n"))
  }

  test("invoke: a transient invocation failure is retried and delivers Ok") {
    import spark.implicits._
    // The reference configures its transform processor with
    // NumberOfRetries=1 (iac/s2_app.py:354-356): one hiccup must not
    // route a healthy batch to 04-failed.
    val df = Seq(("a", "1".getBytes), ("b", "2".getBytes))
      .toDF("recordId", "data").coalesce(1) // one partition → one invocation
    LambdaStageSpec.attempts.set(0)
    val out = LambdaStage.invoke(df, LambdaStageSpec.transientFn)
      .select("recordId", "result").as[(String, String)].collect().toMap
    assert(out == Map("a" -> DeliveryStatus.Ok, "b" -> DeliveryStatus.Ok))
    assert(LambdaStageSpec.attempts.get() == 2,
      s"expected initial attempt + 1 retry, saw ${LambdaStageSpec.attempts.get()}")
  }

  test("invoke: a persistent failure stops after the configured retries") {
    import spark.implicits._
    val df = Seq(("a", "1".getBytes)).toDF("recordId", "data").coalesce(1)
    LambdaStageSpec.attempts.set(0)
    val out = LambdaStage.invoke(df, LambdaStageSpec.alwaysFailFn)
      .select("recordId", "result").as[(String, String)].collect().toMap
    assert(out == Map("a" -> DeliveryStatus.ProcessingFailed))
    assert(LambdaStageSpec.attempts.get() == 2,
      "default is exactly 1 retry — neither zero nor unbounded")
    // retries = 0 restores single-attempt semantics.
    LambdaStageSpec.attempts.set(0)
    LambdaStage.invoke(df, LambdaStageSpec.alwaysFailFn, retries = 0).collect()
    assert(LambdaStageSpec.attempts.get() == 1)
  }

  test("pipeline E2E with a ported batch Lambda: channels honor Lambda-declared statuses") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lambda-pipe").toString
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    (1 to 30).map(i =>
      s"""{"recordId": "r$i", "line": "{\\"event_id\\": $i, \\"value\\": $i.0}"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(s"$tmp/in")
    val envelope = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType),
        StructField("line", StringType))))
      .json(s"$tmp/in")
      .select(col("recordId"), lit(0L).as("approximateArrivalTimestamp"),
        col("line").cast("binary").as("data"))

    // The ported Lambda: event_id % 10 == 0 → Dropped, % 7 == 0 →
    // ProcessingFailed (raw preserved), else Ok with payload rewritten.
    val fn: LambdaStage.BatchFn = batch => batch.map { r =>
      val s = new String(r.data, "UTF-8")
      val id = "\"event_id\": (\\d+)".r.findFirstMatchIn(s).get.group(1).toInt
      if (id % 10 == 0) RoutedRecord(r.recordId, DeliveryStatus.Dropped, r.data)
      else if (id % 7 == 0) RoutedRecord(r.recordId, DeliveryStatus.ProcessingFailed, r.data)
      else RoutedRecord(r.recordId, DeliveryStatus.Ok,
        (s.stripSuffix("\n") + "\n").getBytes("UTF-8"))
    }
    val sinks = Sinks(s"$tmp/out")
    val pipe = DeliveryPipeline.start(envelope, payloadSchema, sinks,
      s"$tmp/ckpt", dropIf = _ => lit(false), lambdaFn = Some(fn))
    assert(pipe.awaitTermination(120000))

    val nSuccess = DeliveryPipeline.countChannel(spark, sinks.success)
    val nFailed = DeliveryPipeline.countChannel(spark, sinks.failed)
    val dropped = (1 to 30).count(_ % 10 == 0)
    val failed = (1 to 30).count(i => i % 7 == 0 && i % 10 != 0)
    assert(nFailed == failed)
    assert(nSuccess == 30 - dropped - failed)
    assert(nSuccess + nFailed + dropped == 30, "Lambda routing must conserve records")
    // Backup still carries every raw record (pre-transform channel).
    assert(DeliveryPipeline.countChannel(spark, sinks.backup) == 30)
  }
}
