package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashAggregator
import graft.functions.TextFunctions

class MinHashAggSpec extends SparkSpec {

  test("Aggregator sketches equal the declarative q43 signatures") {
    import spark.implicits._
    val sig43 = SparkEntry.queries("q43_minhash_sig")(spark, sfDir)
    // Rebuild via the typed Aggregator over the same pre-hashed shingles.
    val docs = queries.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(TextFunctions.shingleExpr).as("shingle"))
      .distinct()
      .select(col("doc_id"),
        (TextFunctions.h64(col("shingle")) % MinHashAggregator.P).as("hm"))
      .as[(Long, Long)]
    val sketches = docs.groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.agg.toColumn.name("sketch"))
      .map { case (id, sk) => (id, sk.mins.toSeq) }
      .collect().toMap
    val expected = sig43.collect().map { r =>
      r.getLong(0) -> (1 until 17).map(r.getLong).toSeq
    }.toMap
    assert(sketches == expected)
  }

  test("sketch merge is associative across arbitrary splits (shardable dedup)") {
    import MinHashAggregator._
    val hashes = (1L to 200L).map(h => (h * 7919) % P)
    val whole = hashes.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = hashes.splitAt(67)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(whole.toSeq == merged.toSeq)
    // Jaccard estimate of identical sets is exactly 1.
    assert(Sketch(whole).estJaccard(Sketch(merged.clone())) == 1.0)
  }
}
