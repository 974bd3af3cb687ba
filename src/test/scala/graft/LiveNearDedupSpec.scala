package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.LiveNearDedup

/** Twin contract for the live near-dedup store: N delivered epochs +
  * an upsert chain produce EXACTLY the batch MinHash-LSH pairs
  * ([[graft.queries.TrainingData.lshPairs]], q44's oracle-checked
  * kernel) on the resolved corpus — before and after compaction — and
  * [[LiveNearDedup.deltaPairs]] is exactly the epoch-restricted slice
  * of those pairs.
  */
class LiveNearDedupSpec extends SparkSpec {

  import spark.implicits._

  private def batchPairs(rows: Seq[(Long, String)]): Set[(Long, Long, Double)] =
    graft.operators.Dedup.lshCandidatePairs(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet

  test("cross-epoch near-dedup: pairs over delivered epochs equal batch " +
      "lshPairs on the resolved corpus, before and after compaction") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-live-neardup").toString
    val root = s"$tmp/neardup"

    // A REAL streaming maintenance path (the LiveSpanDedup scaffold):
    // each delivery appends to the file source and one AvailableNow
    // pass writes that epoch's signature delta from inside
    // foreachBatch; the shared checkpoint carries epoch ids across
    // calls.
    def deliver(rows: Seq[(Long, String)], tag: String): Unit = {
      rows.toDF("doc_id", "text")
        .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
        .coalesce(1).write.mode("append").text(s"$tmp/in")
      val q = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
        .json(s"$tmp/in")
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
          LiveNearDedup.writeDelta(batch, root, epochId, shards = 2)
        }
        .start()
      assert(q.awaitTermination(120000), s"delivery $tag timed out")
    }
    def livePairs(): Set[(Long, Long, Double)] =
      LiveNearDedup.candidatePairs(spark, root, idType = LongType)
        .as[(Long, Long, Double)].collect().toSet
    def liveDelta(epoch: Long): Set[(Long, Long, Double)] =
      LiveNearDedup.deltaPairs(spark, root, epoch, idType = LongType)
        .as[(Long, Long, Double)].collect().toSet
    def dirs(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .listStatus(p).count(_.getPath.getName.startsWith("epoch="))
    }

    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val epoch1 = Seq(
      1L -> base,
      2L -> "wholly unrelated second text talking about spark query engines at scale")
    deliver(epoch1, "epoch-1")
    assert(livePairs().isEmpty && batchPairs(epoch1).isEmpty)

    // Epoch 2: a near-copy of doc 1 (one word changed) — the pair
    // CROSSES the epoch boundary, which batch lshPairs could only see
    // by re-shingling the closed corpus; the live store sees it from
    // the banded signatures alone. Also a short doc (< 3 tokens): no
    // shingles, no signature row — the batch exclusion, live.
    val epoch2 = Seq(
      3L -> base.replace("today", "tonight"),
      4L -> "too short")
    deliver(epoch2, "epoch-2")
    val closed2 = epoch1 ++ epoch2
    val live2 = livePairs()
    val batch2 = batchPairs(closed2)
    assert(live2 == batch2,
      s"cross-epoch pairs $live2 diverged from batch $batch2")
    assert(live2.map(p => (p._1, p._2)) == Set((1L, 3L)),
      s"the near-copy pair must be found: $live2")
    // deltaPairs(1) — epoch ids from foreachBatch start at 0 — is the
    // full pair set here (every pair touches doc 3).
    assert(liveDelta(1L) == live2)
    assert(liveDelta(0L) == live2) // doc 1's side
    // Epoch 3: a within-delivery near-dup pair, plus another copy of
    // the base text (three-way cluster with 1 and 3).
    val epoch3 = Seq(
      5L -> "completely different musings on minhash banding and lsh buckets here now",
      6L -> "completely different musings on minhash banding and lsh buckets here soon",
      7L -> base)
    deliver(epoch3, "epoch-3")
    val closed3 = closed2 ++ epoch3
    assert(livePairs() == batchPairs(closed3))
    assert(livePairs().map(p => (p._1, p._2)) ==
      Set((1L, 3L), (1L, 7L), (3L, 7L), (5L, 6L)))
    // The epoch-2 slice no longer includes (5,6)/(1,7)/(3,7).
    assert(liveDelta(1L) == livePairs().filter(p =>
      p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))

    // Compaction consolidates both stores to one snapshot and changes
    // nothing observable; a post-compaction delta composes.
    LiveNearDedup.compact(spark, root, shards = 2)
    assert(dirs("sig") == 1 && dirs("docs") == 1)
    assert(livePairs() == batchPairs(closed3))

    // Epoch 4 UPSERTS doc 3 to unrelated text: the (1,3)/(3,7) pairs
    // disappear RETROACTIVELY (currency retraction), docs 1/7 keep
    // their pair. Also upsert doc 6 away from doc 5 — the
    // within-epoch pair dissolves too.
    val epoch4 = Seq(
      3L -> "rewritten into something with no resemblance to the original words anymore",
      6L -> "also rewritten far away from its former partner text entirely")
    deliver(epoch4, "epoch-4")
    val resolved4 = Seq(
      1L -> base,
      2L -> "wholly unrelated second text talking about spark query engines at scale",
      3L -> "rewritten into something with no resemblance to the original words anymore",
      4L -> "too short",
      5L -> "completely different musings on minhash banding and lsh buckets here now",
      6L -> "also rewritten far away from its former partner text entirely",
      7L -> base)
    val live4 = livePairs()
    assert(live4 == batchPairs(resolved4),
      s"post-upsert pairs $live4 diverged from batch on the resolved corpus")
    assert(live4.map(p => (p._1, p._2)) == Set((1L, 7L)),
      s"retraction failed: $live4")
    // A superseded version anchors nothing: doc 3's current version is
    // epoch 4's, so deltaPairs(1) is now empty (doc 4 pairs with
    // nothing) while deltaPairs(3) sees only pairs of the rewritten
    // docs — none.
    assert(liveDelta(1L).isEmpty && liveDelta(3L).isEmpty)

    // Epoch 5 re-delivers doc 3 as a near-copy again — the pair chain
    // re-forms — and compaction after upserts stays equal.
    val epoch5 = Seq(3L -> base.replace("dog", "cat"))
    deliver(epoch5, "epoch-5")
    val resolved5 = resolved4.filterNot(_._1 == 3L) ++ epoch5
    assert(livePairs() == batchPairs(resolved5))
    assert(livePairs().map(p => (p._1, p._2)) ==
      Set((1L, 3L), (1L, 7L), (3L, 7L)))
    LiveNearDedup.compact(spark, root, shards = 2)
    assert(dirs("sig") == 1 && dirs("docs") == 1)
    assert(livePairs() == batchPairs(resolved5))
    // Survivor selection composes unchanged: components over the live
    // pairs picks min-id per cluster, the q72 contract.
    val comp = graft.operators.Dedup.components(
        LiveNearDedup.candidatePairs(spark, root, idType = LongType)
          .select(col("id1"), col("id2")))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 3L -> 1L, 7L -> 1L))

    // No cached-plan leak from the LIVE path (the r11 ADVICE finding:
    // a per-epoch cache() in deltaPairs leaked one CacheManager entry
    // per delivered epoch for a session's lifetime). The batch twin
    // above (lshPairs via batchPairs) caches BY DESIGN — the harness
    // clears between queries — so drop its entries first, then run the
    // per-epoch reads once more: the live path alone must leave the
    // CacheManager empty (it localCheckpoints its shared signature
    // frame instead of caching).
    spark.catalog.clearCache()
    liveDelta(4L)
    livePairs()
    assert(spark.sharedState.cacheManager.isEmpty,
      "deltaPairs/candidatePairs left entries in the CacheManager")
  }

  test("property: live pairs equal batch lshPairs over randomized upsert " +
      "histories with interleaved compactions") {
    // Seeded generator (reproducible): 6 epochs over a 12-doc id space
    // drawing texts from a pool with deliberate near-dup structure —
    // each base text has a one-word-changed variant — so every epoch
    // can create, extend, or dissolve clusters via upserts. After
    // every delivery the live pair set must equal the batch kernel on
    // the resolved corpus; a compaction fires mid-history and at the
    // end.
    val rnd = new scala.util.Random(421107)
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "spark shuffles partitions codegen catalyst tungsten exchange broadcast join scan filter agg",
      "rivers mountains valleys forests deserts oceans islands plains cliffs caves meadows springs")
    def draw(): String = {
      val b = bases(rnd.nextInt(bases.length))
      if (rnd.nextBoolean()) b
      else {
        val toks = b.split(" ")
        toks(rnd.nextInt(toks.length)) = "variant" + rnd.nextInt(3)
        toks.mkString(" ")
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-neardup-prop").toString
    val root = s"$tmp/state"
    var resolved = Map.empty[Long, String]
    (0 until 6).foreach { epoch =>
      val nDocs = 1 + rnd.nextInt(4)
      val delta = (0 until nDocs).map(_ => rnd.nextInt(12).toLong -> draw())
      LiveNearDedup.writeDelta(delta.toDF("doc_id", "text"), root,
        epoch.toLong, shards = 2)
      // In-epoch duplicates resolve by the deterministic max-text pick.
      delta.groupBy(_._1).foreach { case (id, versions) =>
        resolved += id -> versions.map(_._2).max
      }
      val live = LiveNearDedup.candidatePairs(spark, root, idType = LongType)
        .as[(Long, Long, Double)].collect().toSet
      val batch = batchPairs(resolved.toSeq)
      assert(live == batch,
        s"epoch $epoch: live $live != batch $batch over $resolved")
      if (epoch == 2) LiveNearDedup.compact(spark, root, shards = 2)
    }
    LiveNearDedup.compact(spark, root, shards = 2)
    assert(LiveNearDedup.candidatePairs(spark, root, idType = LongType)
      .as[(Long, Long, Double)].collect().toSet == batchPairs(resolved.toSeq))
  }

  test("delivery sink nearDupState hook: pairs over epochs delivered " +
      "through IndexSink.start equal batch lshPairs on the resolved corpus") {
    import graft.streaming.IndexSink
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink-neardup").toString
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("body", StringType)))
    // compactEvery = 2: the second delivery folds the stores inline.
    val spec = IndexSink.LiveNearDupSpec(s"$tmp/neardup", field = "body",
      key = "doc_id", shards = 2, compactEvery = 2)

    def deliver(rows: Seq[(Long, String)], tag: String): Unit = {
      rows.toDF("doc_id", "body")
        .select(to_json(struct(col("doc_id"), col("body"))).as("value"))
        .coalesce(1).write.mode("append").text(s"$tmp/in")
      val env = spark.readStream
        .schema(payloadSchema)
        .json(s"$tmp/in")
        .select(col("doc_id").cast("string").as("recordId"),
          lit(0L).as("approximateArrivalTimestamp"),
          to_json(struct(col("doc_id"), col("body"))).cast("binary").as("data"))
      val q = IndexSink.start(env, payloadSchema, s"$tmp/index", s"$tmp/backup",
        s"$tmp/ckpt", shards = 2, dropIf = _ => lit(false),
        nearDupState = Some(spec))
      assert(q.awaitTermination(120000), s"delivery $tag timed out")
    }
    // The hook stores doc_id as string (the delivery key contract);
    // normalize to canonical long pairs for the batch comparison —
    // string ordering ("10" < "9") differs from numeric, so the live
    // id1/id2 orientation is canonical in ITS id space, not longs'.
    def livePairs(): Set[(Long, Long, Double)] =
      LiveNearDedup.candidatePairs(spark, spec.root)
        .select(least(col("id1").cast("long"), col("id2").cast("long")),
          greatest(col("id1").cast("long"), col("id2").cast("long")),
          col("est_sim"))
        .as[(Long, Long, Double)].collect().toSet

    val base = "shared boilerplate paragraph that repeats across deliveries of this corpus stream"
    val epoch1 = Seq(
      1L -> base,
      2L -> "independent first epoch document about something else entirely today")
    deliver(epoch1, "epoch-1")
    assert(livePairs().isEmpty)
    // Epoch 2: near-copy of doc 1 + an upsert of doc 2 — the full
    // contract through the delivery sink, not a hand-rolled
    // foreachBatch.
    val epoch2 = Seq(
      2L -> base.replace("stream", "river"),
      3L -> "third doc closes quietly with novel words")
    deliver(epoch2, "epoch-2")
    val resolved = Seq(
      1L -> base,
      2L -> base.replace("stream", "river"),
      3L -> "third doc closes quietly with novel words")
    val live = livePairs()
    assert(live == batchPairs(resolved),
      s"sink-maintained pairs $live diverged from batch: ${batchPairs(resolved)}")
    assert(live.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // The compactEvery policy fired on the second delivery.
    def dirs(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"${spec.root}/$sub")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .listStatus(p).count(_.getPath.getName.startsWith("epoch="))
    }
    assert(dirs("sig") == 1 && dirs("docs") == 1,
      "compactEvery=2 should have folded the stores on the second epoch")
  }
}
