package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("exact dedup keeps min-id survivor per distinct text") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
  }

  test("components resolves transitive duplicate chains to min labels") {
    import spark.implicits._
    // Chain 1-2-3-4 plus isolated pair 10-11: transitivity matters.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("components on an empty pair list returns empty and terminates") {
    import spark.implicits._
    // Exercises the null-sum (empty graph) branch of the convergence
    // certificate: two empty iterations certify the fixpoint; without
    // the None == None case the loop would spin to maxIters and throw.
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.components(empty).count() == 0)
  }

  test("nearDedup drops every planted near-duplicate, keeps one per cluster") {
    import spark.implicits._
    val docs = queries.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val deduped = Dedup.nearDedup(spark, docs, "doc_id", "text", minEstSim = 0.5)
    val pairs = SparkEntry.queries("q44_lsh_pairs")(spark, "/root/testdata/sf0.01")
      .filter(col("est_sim") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val kept = deduped.select("doc_id").as[Long].collect().toSet
    // No surviving pair is still a near-dup of each other...
    assert(!pairs.exists { case (a, b) => kept.contains(a) && kept.contains(b) })
    // ...and every cluster kept exactly its min-id representative.
    val comp = Dedup.components(pairs.toSeq.toDF("id1", "id2"))
      .as[(Long, Long)].collect()
    comp.groupBy(_._2).foreach { case (root, members) =>
      val ids = members.map(_._1).toSet
      assert(kept.intersect(ids) == Set(root),
        s"cluster $root kept ${kept.intersect(ids)}")
    }
  }
}
