package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Similarity}

/** The oracle-checked Q36/Q37 batch contracts re-executed as REAL
  * Structured Streaming queries (readStream → windowed agg → memory
  * sink) — proving Spark's batch/stream unification holds for our
  * operators: same code, same results, on the same closed input.
  */
class StreamingTwinSpec extends SparkSpec {

  private def eventsStream = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-twin").toString
    val ev = queries.Tables.events(spark, sfDir)
    ev.write.mode("overwrite").parquet(s"$tmp/in")
    spark.readStream.schema(ev.schema).parquet(s"$tmp/in")
  }

  test("q36 tumbling window: streaming output equals the batch contract") {
    import spark.implicits._
    val agg = eventsStream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), queries.Par.r2(sum("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("twin36").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("twin36")
      .as[(String, String, Long, Double)].collect().toSet
    val expect = SparkEntry.queries("q36_tumbling_window")(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q37 sliding window: streaming output equals the batch contract") {
    import spark.implicits._
    val agg = eventsStream
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), queries.Par.r2(sum("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("twin37").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("twin37").as[(String, Long, Double)].collect().toSet
    val expect = SparkEntry.queries("q37_sliding_window")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q11 stream-stream interval self-join equals the batch contract") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val ev = queries.Tables.events(spark, sfDir)
    ev.write.mode("overwrite").parquet(s"$tmp/in")
    def side(a: String, b: String, c: String) = spark.readStream
      .schema(ev.schema).parquet(s"$tmp/in")
      .select(col("user_id").as(a), col("ts").as(b), col("event_id").as(c))
      .withWatermark(b, "10 minutes")
    val s1 = side("u1", "ts1", "id1")
    val s2 = side("u2", "ts2", "id2")
    // Stream-stream inner join: watermarks + the time-range condition
    // bound the join state — the streaming form of q11's operator.
    val joined = s1.join(s2,
      col("u1") === col("u2") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
      .select("id1", "id2")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("twin11")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("twin11").as[(Long, Long)].collect().toSet
    val expect = SparkEntry.queries("q11_range_join")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("IVF search recall vs brute force (nprobe=4 of k=8 cells)") {
    import spark.implicits._
    val emb = queries.Tables.t(spark, sfDir, "embeddings")
    val model = Ivf.train(spark, emb, k = 8, iters = 3)
    val indexed = Ivf.index(spark, emb, model)
    assert(indexed.select(countDistinct(col("cell"))).head().getLong(0) > 1)
    val probes = emb.filter(col("vec_id") < 5)
    val ivfTop = Ivf.search(spark, indexed, model, probes, k = 10, nprobe = 4)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteTop = Similarity.topKPerProbe(
        emb.select(col("vec_id").as("id"), col("embedding")),
        emb.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")), 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Probing half the cells must recover a solid share of true top-10.
    val recalls = bruteTop.map { case (p, truth) =>
      ivfTop.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF mean recall too low: $mean")
  }
}
