package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks over the full registry at sf0.001. The strong
  * correctness gate is the DuckDB oracle (tools/check_oracle.py / driver
  * t2); this suite guards the things the oracle can't see.
  */
class QueriesSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ANN tuned-path recall floors: multi-table LSH >= 0.4, IVF >= 0.6 " +
      "(VERDICT r13 #7)") {
    // The recall RUNGS honestly measure weak configs (q118's 8-plane
    // single-table reads 0.0 by design); these floors assert the TUNED
    // paths stay useful on regenerated data — a silent tuning
    // regression (plane count, table count, nprobe, centroid seed)
    // becomes a red test instead of a hash-pinned curiosity. Current
    // values at sf0.001: q121 mean 0.52, q83 mean 0.88 — floors leave
    // honest noise margin without excusing a real slide.
    def meanRecall(key: String): Double = {
      val r = SparkEntry.queries(key)(spark, sfDir)
        .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
      r
    }
    val lsh = meanRecall("q121_lsh_multi_recall")
    assert(lsh >= 0.4, s"tuned multi-table LSH recall slid to $lsh")
    val ivf = meanRecall("q83_ann_recall")
    assert(ivf >= 0.6, s"tuned IVF recall slid to $ivf")
  }

  test("quantized-rung recall floors: PQ/IVFPQ/OPQ/OPQ-learned/MRL/int8 " +
      "(VERDICT r14 #6)") {
    // The quantized rungs were hash-pinned curiosities only: a codebook
    // or rotation regression that HALVED their recall would have passed
    // every gate. Floors sit at ~75-80% of the sf0.001 measured means
    // (r15: q96 0.16, q97 0.16, q98 0.20, q100 0.20, q147 0.093 across
    // its three dims rungs, q119 0.96) — the corpus is tiny and the
    // quantizers deliberately coarse, so absolute recall is low; the
    // floor's job is to turn a halving into a red test, not to certify
    // retrieval quality (the sf0.01 tier and the ANN quality card carry
    // that).
    def meanRecall(key: String): Double =
      SparkEntry.queries(key)(spark, sfDir)
        .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    for ((key, floor) <- Seq(
        "q96_pq_recall" -> 0.12, "q97_ivfpq_recall" -> 0.12,
        "q98_opq_recall" -> 0.15, "q100_opq_learned_recall" -> 0.15,
        "q147_mrl_recall" -> 0.07, "q119_int8_recall" -> 0.75)) {
      val r = meanRecall(key)
      assert(r >= floor, s"$key recall slid to $r (floor $floor)")
    }
  }

  test("every registered query executes; oracle-checked ones return rows") {
    val empty = SparkEntry.registry.filter { q =>
      q.build(spark, sfDir).limit(1).collect().isEmpty
    }
    // q32/q44/q46 may legitimately be sparse at sf0.001; everything else
    // must produce rows.
    val allowedEmpty = Set("q32_neardup_jaccard", "q44_lsh_pairs", "q10_anti_join")
    assert(empty.map(_.name).filterNot(allowedEmpty).isEmpty,
      s"unexpected empty results: ${empty.map(_.name)}")
  }

  test("q110 returns the oracle's empty page, not a failure, when the ranking is short") {
    // The SQL oracle's `rnk BETWEEN 11 AND 20` yields zero rows on a
    // corpus with <= 10 BM25 hits; the Spark side must mirror that (a
    // search client stops paging on a short page) instead of aborting.
    val tmp = java.nio.file.Files.createTempDirectory("graft-q110").toString
    queries.Tables.t(spark, sfDir, "documents").limit(3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q110_search_after")(spark, tmp)
    assert(out.columns.sorted.toSeq == Seq("doc_id", "rank", "score"))
    assert(out.count() == 0)
  }

  test("oracle SQL exists for every query (q16 included, via tolerance column)") {
    // EVERY registry entry is oracle-checked — q73's Lloyd iterations
    // are replayed as chained CTEs with float-exact arithmetic, so even
    // the IVF ANN path hash-matches DuckDB. Any oracle-less query is a
    // gate regression.
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("q16 approx_count_distinct within 5% of exact (FIXTURES tolerance band)") {
    import spark.implicits._
    // The band on the raw estimate, independent of q16's tolerance-column
    // encoding (which the DuckDB oracle checks end-to-end).
    val approx = queries.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("n"))
      .as[(String, Long, Long)].collect()
    approx.foreach { case (k, a, n) =>
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: approx $a vs exact $n")
    }
    // And the emitted tolerance column itself must be all-1.
    val flags = SparkEntry.queries("q16_approx_distinct")(spark, sfDir)
      .select(col("within_tol")).as[Int].collect()
    assert(flags.nonEmpty && flags.forall(_ == 1), flags.toSeq.toString)
  }

  test("q33 top-k neighbors agree with the Similarity.topKPerProbe scale path") {
    import spark.implicits._
    val base = SparkEntry.queries("q33_similarity_topk")(spark, sfDir)
      .select("probe_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    val emb = queries.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val scale = operators.Similarity
      .topKPerProbe(emb, emb.filter(col("id") < 5), 10)
      .select(col("probe_id"), col("neighbor_id"), col("rnk").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(scale == base)
  }

  test("q44 LSH candidates cover all high-Jaccard pairs found exactly (recall check)") {
    import spark.implicits._
    val exact = SparkEntry.queries("q32_neardup_jaccard")(spark, "/root/testdata/sf0.01")
      .filter(col("jaccard") >= 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q44_lsh_pairs")(spark, "/root/testdata/sf0.01")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed near-identical pairs: $missed")
  }
}
