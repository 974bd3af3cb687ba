package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketch
import graft.streaming.{IndexSink, LiveSketch}

/** [[graft.streaming.LiveSketch]] — per-epoch count-min + HLL
  * maintenance. Twin discipline: the merged state must equal the BATCH
  * sketch of the concatenated stream, exactly (frame equality, the
  * sketches are deterministic), before and after compaction, through
  * replays, and through the delivery sink.
  */
class LiveSketchSpec extends SparkSpec {

  private val Depth = 3
  private val Width = 32
  private val B = 4

  private def wordsDf(ws: Seq[String]): DataFrame = {
    import spark.implicits._
    ws.toDF("w")
  }

  private def cellsOf(df: DataFrame): Set[(Int, Long, Long)] = {
    import spark.implicits._
    df.as[(Int, Long, Long)].collect().toSet
  }
  private def regsOf(df: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toSet
  }
  private def epochDirs(root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("epoch="))
  }

  test("merged cells/registers equal the batch sketch of the stream, " +
      "before and after compaction; estimates agree") {
    val root = java.nio.file.Files.createTempDirectory("graft-lsk").toString
    val epochs = Seq(
      Seq("alpha", "beta", "alpha", "gamma"),
      Seq("beta", "delta", "delta", "delta"),
      Seq("alpha", "epsilon", "zeta", "beta", "beta"))
    epochs.zipWithIndex.foreach { case (ws, e) =>
      LiveSketch.writeDelta(wordsDf(ws), root, e.toLong, Depth, Width, B)
    }
    val all = wordsDf(epochs.flatten)
    def assertTwin(): Unit = {
      assert(cellsOf(LiveSketch.cells(spark, root)) ==
        cellsOf(Sketch.countMinCells(all, Depth, Width)))
      assert(regsOf(LiveSketch.registers(spark, root)) ==
        regsOf(Sketch.hllRegisters(all, B)))
    }
    assertTwin()
    // Point estimates ride the merged state through the SAME batch
    // estimators — and the count-min upper-bound contract holds live.
    import spark.implicits._
    val probes = Seq("alpha", "beta", "delta", "missing").toDF("term")
    val est = LiveSketch.estimateTerms(spark, root, probes, Depth, Width)
      .as[(String, Long)].collect().toMap
    val truth = Map("alpha" -> 3L, "beta" -> 4L, "delta" -> 3L, "missing" -> 0L)
    truth.foreach { case (t, n) => assert(est(t) >= n, s"$t: ${est(t)} < $n") }
    val dist = LiveSketch.distinctEstimate(spark, root, B)
      .select(col("est")).as[Double].collect().head
    assert(dist > 0.0)
    // Fold: history shrinks to the snapshot, state is bit-unchanged.
    assert(epochDirs(s"$root/cm") == 3 && epochDirs(s"$root/hll") == 3)
    LiveSketch.compact(spark, root)
    assert(epochDirs(s"$root/cm") == 1 && epochDirs(s"$root/hll") == 1)
    assertTwin()
    assert(LiveSketch.estimateTerms(spark, root, probes, Depth, Width)
      .as[(String, Long)].collect().toMap == est)
    // Post-fold deliveries keep merging.
    LiveSketch.writeDelta(wordsDf(Seq("alpha", "eta")), root, 3L, Depth, Width, B)
    val all4 = wordsDf(epochs.flatten ++ Seq("alpha", "eta"))
    assert(cellsOf(LiveSketch.cells(spark, root)) ==
      cellsOf(Sketch.countMinCells(all4, Depth, Width)))
    assert(regsOf(LiveSketch.registers(spark, root)) ==
      regsOf(Sketch.hllRegisters(all4, B)))
  }

  test("replays are safe by algebra: rewritten epochs collapse, folded " +
      "epochs fence to no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft-lsk2").toString
    val e0 = Seq("one", "two", "two")
    val e1 = Seq("three", "one")
    LiveSketch.writeDelta(wordsDf(e0), root, 0L, Depth, Width, B)
    LiveSketch.writeDelta(wordsDf(e1), root, 1L, Depth, Width, B)
    val want = cellsOf(Sketch.countMinCells(wordsDf(e0 ++ e1), Depth, Width))
    // At-least-once replay of a live epoch: identical rows, identical
    // merged state (the (r, b, _epoch) dedup rule).
    LiveSketch.writeDelta(wordsDf(e1), root, 1L, Depth, Width, B)
    assert(cellsOf(LiveSketch.cells(spark, root)) == want)
    // Fold, then replay a FOLDED epoch: the watermark fence skips the
    // write (no zombie dir) and the state is untouched.
    LiveSketch.compact(spark, root)
    LiveSketch.writeDelta(wordsDf(e0), root, 0L, Depth, Width, B)
    assert(epochDirs(s"$root/cm") == 1, "folded epoch must not be rewritten")
    assert(cellsOf(LiveSketch.cells(spark, root)) == want)
    assert(regsOf(LiveSketch.registers(spark, root)) ==
      regsOf(Sketch.hllRegisters(wordsDf(e0 ++ e1), B)))
  }

  test("delivery sink maintains the sketches; scope is the delivery LOG " +
      "(an upsert does not retract)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsk3").toString
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("body", StringType)))
    val spec = IndexSink.LiveSketchSpec(s"$tmp/sketch", field = "body",
      key = "doc_id", depth = Depth, width = Width, b = B)

    def deliver(rows: Seq[(Long, String)], tag: String): Unit = {
      rows.toDF("doc_id", "body")
        .select(to_json(struct(col("doc_id"), col("body"))).as("value"))
        .coalesce(1).write.mode("append").text(s"$tmp/in")
      val env = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("body", StringType))))
        .json(s"$tmp/in")
        .select(col("doc_id").cast("string").as("recordId"),
          lit(0L).as("approximateArrivalTimestamp"),
          to_json(struct(col("doc_id"), col("body"))).cast("binary").as("data"))
      val q = IndexSink.start(env, payloadSchema, s"$tmp/index", s"$tmp/backup",
        s"$tmp/ckpt", shards = 2, dropIf = _ => lit(false),
        sketchState = Some(spec))
      assert(q.awaitTermination(120000), s"delivery $tag timed out")
    }

    val epoch1 = Seq(1L -> "alpha beta alpha", 2L -> "gamma beta")
    deliver(epoch1, "epoch-1")
    // Epoch 2 upserts doc 1 — the LOG keeps both versions' words.
    val epoch2 = Seq(1L -> "delta only now", 3L -> "alpha zeta")
    deliver(epoch2, "epoch-2")
    val logWords = wordsDf((epoch1 ++ epoch2).flatMap(_._2.split(" ")))
    assert(cellsOf(LiveSketch.cells(spark, spec.root)) ==
      cellsOf(Sketch.countMinCells(logWords, Depth, Width)))
    assert(regsOf(LiveSketch.registers(spark, spec.root)) ==
      regsOf(Sketch.hllRegisters(logWords, B)))
    // The superseded version's words still count: stream scope, stated.
    val est = LiveSketch.estimateTerms(spark, spec.root,
        Seq("alpha").toDF("term"), Depth, Width)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 3L) // 2 from epoch-1 doc 1 + 1 from doc 3
  }
}
