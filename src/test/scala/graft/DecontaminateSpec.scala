package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate
import graft.queries.TrainingData

class DecontaminateSpec extends SparkSpec {

  test("bloom-prefiltered contamination equals the exact unfiltered join") {
    import spark.implicits._
    // The whole point of the prefilter is moving bytes, not semantics:
    // on the real corpus it must reproduce the plain gram-join result
    // id-for-id (false positives die in the verification join; Bloom
    // filters have no false negatives).
    val docs = queries.Tables.t(spark, sfDir, "documents")
    val g8 = TrainingData.gram8Df(docs)
    val benchGrams = g8
      .join(docs.filter(col("source") === "src0").select("doc_id"), "doc_id")
      .select("gram").distinct()
    val exact = g8.join(benchGrams, "gram")
      .select("doc_id").distinct().as[Long].collect().toSet
    val bloomed = Decontaminate.contaminatedIds(spark, g8, benchGrams)
      .as[Long].collect().toSet
    assert(exact.nonEmpty, "fixture has no contamination — test is vacuous")
    assert(bloomed == exact)
  }

  test("planted contamination is caught; gram-disjoint docs survive") {
    import spark.implicits._
    val corpus = Seq(
      // shares the benchmark's full 8-gram
      (10L, "one two three four five six seven eight tail"),
      // 7-token overlap only — NOT contaminated at n=8
      (11L, "two three four five six seven eight other words padding"),
      (12L, "completely different tokens nine ten eleven twelve thirteen fourteen")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "prefix one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminatedIds(spark,
      TrainingData.gram8Df(corpus), TrainingData.gram8Df(bench).select("gram"))
      .as[Long].collect().toSet
    assert(out == Set(10L))
  }

  test("empty benchmark yields zero contaminated ids") {
    import spark.implicits._
    val corpus = Seq((10L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val empty = Seq.empty[String].toDF("gram")
    assert(Decontaminate.contaminatedIds(spark,
      TrainingData.gram8Df(corpus), empty).count() == 0)
  }
}
