package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Monitoring
import graft.streaming.{IndexSink, LiveRates}

/** [[graft.streaming.LiveRates]] — per-epoch exact rate maintenance.
  * Twin discipline: the merged grid must equal the densified
  * `groupBy(k, epoch).count` of the concatenated stream, exactly,
  * before and after compaction, through replays, and through the
  * delivery sink; the live anomaly report must equal the q177 scorer
  * over the batch grid.
  */
class LiveRatesSpec extends SparkSpec {

  import spark.implicits._

  private def keysDf(ks: Seq[String]): DataFrame = ks.toDF("k")

  private def gridOf(df: DataFrame): Set[(String, Long, Long)] =
    df.select("k", "_epoch", "cnt").as[(String, Long, Long)].collect().toSet

  /** Batch reference: dense grid of the concatenated (k, epoch) rows. */
  private def batchGrid(rows: Seq[(String, Long)]): Set[(String, Long, Long)] = {
    val ks = rows.map(_._1).distinct
    val es = rows.map(_._2).distinct
    val cnt = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (for (k <- ks; e <- es) yield (k, e, cnt.getOrElse((k, e), 0L))).toSet
  }

  private def epochDirs(root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("epoch="))
  }

  test("merged grid equals the dense batch grid, before/after compaction; " +
      "replays collapse; folded epochs fence") {
    val root = java.nio.file.Files.createTempDirectory("graft-lrt").toString
    val epochs = Seq(
      Seq("en", "en", "de", "en"),       // epoch 0: en 3, de 1, fr 0
      Seq("de", "de"),                    // epoch 1: de 2 — en/fr zero cells
      Seq("fr", "en"))                    // epoch 2
    epochs.zipWithIndex.foreach { case (ks, e) =>
      LiveRates.writeDelta(keysDf(ks), root, e.toLong)
    }
    val want = batchGrid(epochs.zipWithIndex.flatMap { case (ks, e) =>
      ks.map(_ -> e.toLong) })
    assert(gridOf(LiveRates.grid(spark, root)) == want)
    // per-key silence inside a delivered epoch densifies to zero
    assert(want.contains(("en", 1L, 0L)) && want.contains(("fr", 0L, 0L)))
    // replay of an epoch rewrites identical rows — grid unchanged
    LiveRates.writeDelta(keysDf(epochs(1)), root, 1L)
    assert(gridOf(LiveRates.grid(spark, root)) == want)
    // compaction folds history into ONE snapshot dir, grid unchanged
    LiveRates.compact(spark, root)
    assert(gridOf(LiveRates.grid(spark, root)) == want)
    assert(epochDirs(root) == 1)
    // a late replay of a folded epoch is fenced to a no-op
    LiveRates.writeDelta(keysDf(Seq("zz", "zz")), root, 0L)
    assert(epochDirs(root) == 1)
    assert(gridOf(LiveRates.grid(spark, root)) == want)
    // new epochs after the fold keep accumulating
    LiveRates.writeDelta(keysDf(Seq("en")), root, 3L)
    val want2 = batchGrid(epochs.zipWithIndex.flatMap { case (ks, e) =>
      ks.map(_ -> e.toLong) } :+ ("en" -> 3L))
    assert(gridOf(LiveRates.grid(spark, root)) == want2)
  }

  test("live anomalies equal the q177 scorer over the batch grid") {
    val root = java.nio.file.Files.createTempDirectory("graft-lrt2").toString
    // one spiky key (enough jitter that MAD > 0 — a lone spike in an
    // otherwise-constant series zeroes the MAD and self-masks, the
    // documented guard), one constant key, across 6 epochs
    val epochs = Seq(2, 3, 9, 2, 3, 2).zipWithIndex.map { case (n, e) =>
      (Seq.fill(n)("spiky") ++ Seq.fill(3)("flat"), e.toLong) }
    epochs.foreach { case (ks, e) => LiveRates.writeDelta(keysDf(ks), root, e) }
    val live = LiveRates.anomalies(spark, root, topN = 12)
      .select("key", "day", "cnt", "z", "rnk")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    val batch = Monitoring.robustAnomalies(
        LiveRates.grid(spark, root).select(col("k").as("key"),
          col("_epoch").as("day"), col("cnt")), topN = 12)
      .select("key", "day", "cnt", "z", "rnk")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(live == batch)
    // the spike is rank 1; the constant key scores exactly zero
    val top = live.find(_._5 == 1L).get
    assert(top._1 == "spiky" && top._2 == 2L && top._3 == 9L)
    live.filter(_._1 == "flat").foreach(r => assert(r._4 == 0.0, r))
  }

  test("delivery sink maintains the rate grid; scope is the delivery LOG") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-lrt3").toString
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType)))
    val spec = IndexSink.LiveRateSpec(s"$tmp/rates", field = "lang")

    def deliver(rows: Seq[(Long, String)], tag: String): Unit = {
      rows.toDF("doc_id", "lang")
        .select(to_json(struct(col("doc_id"), col("lang"))).as("value"))
        .coalesce(1).write.mode("append").text(s"$tmp/in")
      val env = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType))))
        .json(s"$tmp/in")
        .select(col("doc_id").cast("string").as("recordId"),
          lit(0L).as("approximateArrivalTimestamp"),
          to_json(struct(col("doc_id"), col("lang"))).cast("binary").as("data"))
      val q = IndexSink.start(env, payloadSchema, s"$tmp/index", s"$tmp/backup",
        s"$tmp/ckpt", shards = 2, dropIf = _ => lit(false),
        rateState = Some(spec))
      assert(q.awaitTermination(120000), s"delivery $tag timed out")
    }

    deliver(Seq(1L -> "en", 2L -> "en", 3L -> "de"), "epoch-1")
    // epoch 2 re-delivers doc 1 under a new lang: the LOG counts both
    deliver(Seq(1L -> "fr", 4L -> "en"), "epoch-2")
    val want = batchGrid(Seq(("en", 0L), ("en", 0L), ("de", 0L),
      ("fr", 1L), ("en", 1L)))
    assert(gridOf(LiveRates.grid(spark, spec.root)) == want)
  }
}
