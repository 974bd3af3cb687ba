package graft

import graft.operators.Pack

/** Hand-computed span fixtures for training-sequence packing — the
  * corpus-level oracle is q137; these pin the boundary arithmetic the
  * hash gate can't localize (exact-fit boundaries, multi-sequence
  * spans, zero-token exclusion).
  */
class PackSpec extends SparkSpec {

  import spark.implicits._

  test("spans over a seqLen=10 stream: exact fit, straddle, multi-span") {
    // Stream layout (seqLen 10): doc 1 [0,10) exact fit; doc 2 [10,14);
    // doc 3 [14,23) straddles seq 1→2; doc 4 [23,48) spans 2..4;
    // doc 5 zero tokens (excluded); doc 6 [48,49).
    val counts = Seq(1L -> 10L, 2L -> 4L, 3L -> 9L, 4L -> 25L,
      5L -> 0L, 6L -> 1L).toDF("doc_id", "n_tokens")
    val out = Pack.sequenceSpans(counts, 10L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_tok"), r.getAs[Long]("seq_first"),
          r.getAs[Long]("seq_last"), r.getAs[Long]("n_seqs"))))
      .toMap

    assert(!out.contains(5L), "zero-token doc must be excluded")
    assert(out(1L) == ((0L, 0L, 0L, 1L)), s"exact fit: ${out(1L)}")
    assert(out(2L) == ((10L, 1L, 1L, 1L)), s"interior: ${out(2L)}")
    assert(out(3L) == ((14L, 1L, 2L, 2L)), s"straddle: ${out(3L)}")
    assert(out(4L) == ((23L, 2L, 4L, 3L)), s"multi-span: ${out(4L)}")
    assert(out(6L) == ((48L, 4L, 4L, 1L)), s"tail: ${out(6L)}")
  }

  test("shardPlan: hash shards are in range, deterministic, and the " +
      "totals account for every doc exactly once") {
    import org.apache.spark.sql.functions._
    val counts = (1L to 500L).map(i => i -> (i % 11 + 1))
      .toDF("doc_id", "n_toks")
    val plan1 = Pack.shardPlan(counts, 16).orderBy("doc_id").collect()
    val plan2 = Pack.shardPlan(counts.repartition(7), 16)
      .orderBy("doc_id").collect()
    assert(plan1.sameElements(plan2),
      "the plan must not depend on input partitioning")

    val shards = plan1.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s < 16))
    assert(shards.distinct.length > 8,
      "a 500-doc corpus should populate most of 16 shards")
    // Per-shard totals attached to each row equal the actual group
    // sizes, and they partition the corpus exactly.
    val byShard = plan1.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("shard_docs")).distinct.length == 1)
      assert(rows.head.getAs[Long]("shard_docs") == rows.length)
      assert(rows.head.getAs[Long]("shard_tokens") ==
        rows.map(_.getAs[Long]("n_toks")).sum)
    }
    assert(byShard.values.map(_.length).sum == 500)
    // sort_key is the within-shard order: independent of doc_id order
    // (hash), collision-free on this corpus.
    assert(plan1.map(_.getAs[Long]("sort_key")).distinct.length == 500)
  }

  test("withShardPlan preserves the input's other columns and agrees " +
      "with shardPlan on every shared value") {
    import org.apache.spark.sql.functions._
    val counts = (1L to 100L).map(i => (i, i % 11 + 1, s"extra$i"))
      .toDF("doc_id", "n_toks", "tag")
    val full = Pack.withShardPlan(counts, 8).orderBy("doc_id").collect()
    val bare = Pack.shardPlan(counts.select("doc_id", "n_toks"), 8)
      .orderBy("doc_id").collect()
    assert(full.length == 100 && bare.length == 100)
    full.zip(bare).foreach { case (f, b) =>
      Seq("doc_id", "shard", "sort_key", "n_toks", "shard_docs",
        "shard_tokens").foreach(c =>
        assert(f.getAs[Long](c) == b.getAs[Long](c), c))
    }
    assert(full.map(_.getAs[String]("tag")).toSeq ==
      (1L to 100L).map(i => s"extra$i"))
  }

  test("offsets are a partition-independent prefix sum in doc_id order") {
    val counts = (1L to 200L).map(i => i -> (i % 7 + 1)).toDF("doc_id", "n_tokens")
    val spans = Pack.sequenceSpans(counts.repartition(7), 16L)
      .orderBy("doc_id").collect()
    var expect = 0L
    spans.foreach { r =>
      assert(r.getAs[Long]("start_tok") == expect,
        s"doc ${r.getAs[Long]("doc_id")} offset drifted")
      expect += r.getAs[Long]("n_tokens")
    }
  }
}
