package graft

import org.apache.spark.sql.functions._

import graft.streaming.{EpochStore, LiveTextIndex}

/** Protocol-SCALE gate for the epoch stores (VERDICT r12 #8): the
  * 4–6-epoch twin specs prove correctness of one maintenance cycle;
  * this suite drives the live text index through hundreds of epochs
  * with periodic compaction and asserts the properties that keep a
  * long-lived store serviceable:
  *
  *  1. per-epoch delivery cost stays FLAT — a delta write reads only
  *     epoch-count-bounded sidecars, and compaction keeps that count
  *     bounded, so epoch 400 costs what epoch 60 did;
  *  2. read and heal cost stay FLAT for the same reason;
  *  3. the epoch-directory count after compaction is bounded by the
  *     compaction interval, never by history depth;
  *  4. correctness survives depth: latest-per-key resolution and the
  *     global stats row are exact after ~400 write + 8 fold cycles.
  *
  * Wall-time assertions compare MEDIANS of two steady-state windows at
  * a loose 4× bound — CI noise moves individual epochs, not a
  * 50-epoch median. GRAFT_SCALE_EPOCHS overrides the depth (e.g. 1000
  * for a manual soak run).
  */
class EpochScaleSpec extends SparkSpec {

  private val Epochs =
    sys.env.get("GRAFT_SCALE_EPOCHS").map(_.toInt).getOrElse(400)
  private val CompactEvery = 50

  private def epochDirCount(path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("epoch="))
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  test(s"LiveTextIndex stays flat through $Epochs epochs with " +
      s"compaction every $CompactEvery (delivery, read, heal; " +
      "exact state at depth)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-epoch-scale")
      .toString + "/tindex"
    // Each epoch delivers one NEW doc and one UPDATE of a rolling hot
    // key, so latest-per-key resolution is exercised at every depth.
    def epochToks(e: Int) = Seq(
      (s"d$e", Seq("alpha", "beta", s"tok$e")),
      (s"hot${e % 10}", Seq("hot", s"v$e")))
      .toDF("doc_id", "toks")

    val wall = new Array[Double](Epochs)
    var healEarly = -1.0
    var healLate = -1.0
    var readEarly = -1.0
    (0 until Epochs).foreach { e =>
      val t0 = System.nanoTime()
      LiveTextIndex.writeDelta(epochToks(e), root, e.toLong, shards = 1)
      wall(e) = (System.nanoTime() - t0) / 1e9
      if ((e + 1) % CompactEvery == 0)
        LiveTextIndex.compact(spark, root, shards = 1)
      if (e + 1 == math.min(2 * CompactEvery, math.max(2, Epochs / 2))) {
        healEarly = time(EpochStore.heal(spark, s"$root/postings"))
        readEarly = time(
          assert(LiveTextIndex.read(spark, root).postings.count() > 0))
      }
    }
    healLate = time(EpochStore.heal(spark, s"$root/postings"))

    // 3. Directory count bounded by the compaction interval (+ the
    // snapshot dir and the epochs since the last fold), NOT by depth.
    for (store <- Seq("postings", "doclen", "stats"))
      assert(epochDirCount(s"$root/$store") <= CompactEvery + 5,
        s"$store epoch dirs grew with history depth")

    // 4. Exact state at depth: every d-doc plus the 10 hot keys, each
    // hot doc resolved to its LAST version.
    val t1 = System.nanoTime()
    val idx = LiveTextIndex.read(spark, root)
    val nDocs = idx.postings.select("doc_id").distinct().count()
    val readLate = (System.nanoTime() - t1) / 1e9
    assert(nDocs == Epochs + 10L, s"expected ${Epochs + 10} docs, got $nDocs")
    // The hot key written LAST must resolve to exactly its final
    // version's terms — a stale survivor here means currency broke at
    // depth or a fold resurrected a superseded row.
    val hotKey = s"hot${(Epochs - 1) % 10}"
    val hotTerms = idx.postings.filter(col("doc_id") === hotKey)
      .select("term").as[String].collect().toSet
    assert(hotTerms == Set("hot", s"v${Epochs - 1}"),
      s"$hotKey resolved to $hotTerms — a stale version survived")
    // Global stats row (telescoped net deltas): N == docs, exact.
    assert(idx.stats.select("n").as[Double].head() == (Epochs + 10).toDouble)

    // 1. Per-epoch delivery cost flat: median of the second
    // compaction window (or the first half at shallow soak depths)
    // vs the last one.
    val w = math.min(CompactEvery, Epochs / 2)
    val early = median(wall.slice(w, 2 * w))
    val late = median(wall.slice(Epochs - w, Epochs))
    assert(late <= early * 4 + 0.25,
      f"delivery cost grew with depth: early=$early%.3f s late=$late%.3f s")
    // 2. Read + heal flat (4x, plus an absolute floor for sub-100ms
    // noise).
    assert(readLate <= readEarly * 4 + 0.5,
      f"read cost grew with depth: early=$readEarly%.3f s late=$readLate%.3f s")
    assert(healLate <= healEarly * 4 + 0.5,
      f"heal cost grew with depth: early=$healEarly%.3f s late=$healLate%.3f s")
    assert(EpochStore.readWatermark(spark, s"$root/doclen") >= 0L)
  }

  test("expireEpochsBelow ages out a deep append-only log in one sweep " +
      "and leaves the kept tail readable") {
    import graft.operators.Maintenance
    val root = java.nio.file.Files.createTempDirectory("graft-log-scale")
      .toString + "/alerts"
    val depth = 300
    (0 until depth).foreach { e =>
      val d = java.nio.file.Paths.get(s"$root/epoch=$e")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve("part-0.json"),
        s"""{"epoch":$e,"alert":"a$e"}\n""")
    }
    assert(Maintenance.expireEpochsBelow(root, keepFrom = depth - 40L) ==
      depth - 40L)
    assert(epochDirCount(root) == 40)
    // The kept tail is intact and readable.
    val kept = spark.read.json(s"$root/epoch=*")
    assert(kept.count() == 40)
    assert(kept.agg(min("epoch")).head().getLong(0) == depth - 40L)
    // Idempotent: a second sweep removes nothing.
    assert(Maintenance.expireEpochsBelow(root, keepFrom = depth - 40L) == 0L)
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  test(s"LiveRates stays flat and exact through ${Epochs / 2} epochs " +
      s"with compaction every $CompactEvery") {
    import spark.implicits._
    import graft.streaming.LiveRates
    val root = java.nio.file.Files.createTempDirectory("graft-lrt-scale").toString
    val n = Epochs / 2
    val keys = Vector("en", "de", "fr")
    // deterministic per-epoch mix: key e%3 delivers 1 + e%4 records,
    // the others 1 each — every key present every epoch
    def epochKeys(e: Int): Seq[String] =
      keys.flatMap(k => Seq.fill(if (k == keys(e % 3)) 1 + e % 4 else 1)(k))
    val walls = (0 until n).map { e =>
      time {
        LiveRates.writeDelta(epochKeys(e).toDF("k"), root, e.toLong)
        if ((e + 1) % CompactEvery == 0) LiveRates.compact(spark, root)
      }
    }
    // flatness: the last 25-epoch median within 4x of the steady-state
    // window's (same protocol as the text-index soak)
    val steady = median(walls.slice(n / 4, n / 4 + 25).toSeq)
    val late = median(walls.takeRight(25).toSeq)
    assert(late <= steady * 4.0, f"delivery wall grew: $steady%.2f -> $late%.2f s")
    // dirs bounded by the compaction interval, never history depth
    assert(epochDirCount(root) <= CompactEvery + 1)
    // exactness at depth: the merged grid equals the closed form
    val got = LiveRates.grid(spark, root)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == keys.size * n)
    (0 until n).foreach { e =>
      keys.foreach { k =>
        val want = if (k == keys(e % 3)) 1L + e % 4 else 1L
        assert(got((k, e.toLong)) == want, s"cell ($k, $e)")
      }
    }
    // the anomaly read over the deep store stays cheap and total
    val an = LiveRates.anomalies(spark, root, topN = 10)
      .select("rnk").as[Long].collect().sorted.toSeq
    assert(an == (1L to 10L))
  }
}
