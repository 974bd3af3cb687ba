package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum
import graft.streaming.LambdaStage
import graft.streaming.LambdaStage.Rec

/** Property tests for the two imperative kernels added this round —
  * the pieces that DON'T get a DuckDB oracle row and whose edge cases
  * (duplicate keys, nulls, odd batch boundaries) are exactly where
  * hand-picked examples miss. Deterministic seeds, CodecSpec-style.
  */
class KernelPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  test("PrefixSum equals the global window form on arbitrary inputs (dups + nulls)") {
    import spark.implicits._
    val rows = Gen.listOfN(60,
      for {
        k <- Gen.choose(0L, 15L) // dense keys → plenty of duplicates
        v <- Gen.option(Gen.choose(-50L, 50L))
      } yield (k, v))
    samples(rows, 6).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("k", "v")
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0),
            Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]))) // cum NULL until first value
          .sortBy(t => (t._1, t._2.getOrElse(Long.MinValue),
            t._3.getOrElse(Long.MinValue))).toSeq
      val expected = canon(df
        .withColumn("cum", sum("v").over(Window.orderBy("k")))
        .select("k", "v", "cum").collect())
      val got = canon(PrefixSum.withRunningTotal(df, "k", "v", "cum", partitions = 4)
        .select("k", "v", "cum").collect())
      assert(got == expected, s"mismatch for input ${data.take(8)}...")
    }
  }

  test("groupByBytes: conserves records and order; bounds every multi-record batch") {
    val recGen = Gen.listOf(for {
      id <- Gen.identifier
      n <- Gen.choose(0, 120)
    } yield Rec(id, Array.fill[Byte](n)('x')))
    val cases = samples(Gen.zip(recGen, Gen.choose(1L, 200L)), 40)
    assert(cases.size >= 30, "generator drought")
    cases.foreach { case (rs, budget) =>
      val groups = LambdaStage.groupByBytes(rs.iterator, budget).toSeq
      // Conservation + order.
      assert(groups.flatten.map(_.recordId) == rs.map(_.recordId))
      // Bound: any batch of >1 record fits the budget (solo batches may
      // legitimately exceed it — oversized records ride alone).
      groups.filter(_.size > 1).foreach { g =>
        assert(g.map(_.data.length.toLong).sum <= budget,
          s"batch of ${g.size} exceeded $budget")
      }
      // Greedy: no empty batches.
      assert(groups.forall(_.nonEmpty))
    }
  }
}
