package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.DeliveryPipeline

/** Per-round benchmark main (driver contract): one JSON line with total
  * seconds + per-query seconds over SPARK_GRAFT_SF_DIR, plus the
  * streaming-pipeline sustained throughput (records/s through decode →
  * transform → 3-way route → dual sink — the BASELINE.md headline).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table + one tiny agg so the first timed query
    // doesn't absorb FS-cache, codegen and scan-init costs.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => queries.Tables.t(spark, sfDir, t).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      finally spark.catalog.clearCache() // q32/q44 cache within their action
      name -> (System.nanoTime() - t0) / 1e9
    }

    val (pipeSecs, pipeRecs) = pipelineThroughput(spark, sfDir)
    val qs = (results :+ ("pipeline_stream" -> pipeSecs))
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSecs
    val rps = if (pipeSecs > 0) pipeRecs / pipeSecs else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_records":$pipeRecs,"pipeline_records_per_sec":$rps}""")
    spark.stop()
  }

  /** Replay the events table through the full streaming graph (NDJSON
    * envelope files → readStream → backup + transform/route sinks) and
    * report (wall seconds, records). Mirrors the reference benchmark's
    * E2E path (README.rst:100-124) on local storage.
    */
  private def pipelineThroughput(spark: SparkSession, sfDir: String): (Double, Long) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-pipe").toString
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val ev = queries.Tables.events(spark, sfDir)
    val n = ev.count()
    val par = spark.sparkContext.defaultParallelism
    // The events table is one small parquet file (1 scan partition);
    // spread the envelope over `par` input files so every micro-batch
    // stage runs wide instead of single-task.
    ev.select(col("event_id").cast("string").as("recordId"),
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("props"))).as("line"))
      .select(to_json(struct(col("recordId"), col("line"))).as("value"))
      .repartition(par)
      .write.mode("overwrite").text(s"$tmp/in")

    val envelope = spark.readStream
      .schema(StructType(Seq(StructField("recordId", StringType),
        StructField("line", StringType))))
      .json(s"$tmp/in")
      .select(col("recordId"), lit(0L).as("approximateArrivalTimestamp"),
        col("line").cast("binary").as("data"))
    val sinks = DeliveryPipeline.Sinks(s"$tmp/out")
    val t0 = System.nanoTime()
    val (b, d) = DeliveryPipeline.start(envelope, payloadSchema, sinks,
      s"$tmp/ckpt", dropIf = p => p.getField("value") < 10)
    val doneB = b.awaitTermination(600000)
    val doneD = d.awaitTermination(600000)
    val secs = (System.nanoTime() - t0) / 1e9
    // A timed-out run must not report a fabricated throughput.
    (secs, if (doneB && doneD) n else -1L)
  }
}
