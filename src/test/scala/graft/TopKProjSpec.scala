package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.operators.RandomProjection

/** [[graft.functions.TopKAggregator]] (q167) and
  * [[graft.operators.RandomProjection]] (q168): the mergeable group
  * top-k against the rank-window ground truth over multi-partition
  * input, and the JL projection against a local replay of the sign
  * matrix and fold.
  */
class TopKProjSpec extends SparkSpec {

  test("topK equals the rank window on multi-partition data; ties break " +
      "score-desc key-asc; short groups return whole groups in order") {
    import spark.implicits._
    // Deterministic pseudo-random scores with planted ties; 13
    // partitions force real partial/merge traffic through the buffer.
    val rows = (1 to 500).map { i =>
      val g = s"g${i % 7}"
      val score = ((i * 2654435761L) % 97).toDouble
      (g, s"k$i", score)
    }
    val df = rows.toDF("g", "key", "score").repartition(13)
    val top = TopKAggregator.topK(5)
    val got = df.groupBy("g")
      .agg(top(col("score"), col("key")).as("tk"))
      .select(col("g"), posexplode(col("tk.entries")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).as("rnk"),
        col("e.score").as("score"), col("e.key").as("key"))
      .as[(String, Int, Double, String)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("key"))
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("g"), col("rnk"), col("score"), col("key"))
      .as[(String, Int, Double, String)].collect().toSet
    assert(got == want)

    // A group smaller than k comes back whole, in order.
    val small = Seq(("a", "x", 1.0), ("a", "y", 3.0)).toDF("g", "key", "score")
    val tk2 = TopKAggregator.topK(10)
    val whole = small.groupBy("g")
      .agg(tk2(col("score"), col("key")).as("tk"))
      .select(explode(col("tk.entries")).as("e"))
      .select(col("e.score"), col("e.key"))
      .as[(Double, String)].collect().toSeq
    assert(whole == Seq((3.0, "y"), (1.0, "x")))
    intercept[IllegalArgumentException] { TopKAggregator.agg(0) }
  }

  test("random projection matches a local replay; sign matrix " +
      "regenerates identically; norm is JL-preserved in expectation") {
    import spark.implicits._
    val d = 8; val dOut = 4
    val signs = RandomProjection.signMatrix(dOut, d)
    assert(signs.map(_.toSeq).toSeq ==
      RandomProjection.signMatrix(dOut, d).map(_.toSeq).toSeq)
    assert(signs.flatten.forall(s => s == 1.0f || s == -1.0f))

    val vecs = Seq(
      0L -> Array(1.0f, 2.0f, -3.0f, 0.5f, 0.25f, -1.5f, 4.0f, -0.125f),
      1L -> Array.fill(8)(0.0f),
      2L -> Array(-1.0f, 1.0f, -1.0f, 1.0f, -1.0f, 1.0f, -1.0f, 1.0f))
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        RandomProjection.project(col("embedding"), signs).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = signs.map(row =>
        v.indices.foldLeft(0.0)((acc, i) => acc + v(i).toDouble * row(i).toDouble))
      assert(got(id) == want.toSeq, s"vec $id")
    }
    // v and -v project to exact negatives (linearity, sign-exactness).
    val neg = vecs.head._2.map(x => -x)
    val gotNeg = Seq(9L -> neg).toDF("vec_id", "embedding")
      .select(RandomProjection.project(col("embedding"), signs).as("p"))
      .as[Seq[Double]].collect().head
    assert(gotNeg == got(0L).map(x => -x))
    // JL in expectation: E[proj_j²] = ‖v‖², so ‖p‖²/d' tracks ‖v‖²
    // within a loose constant on a non-degenerate vector.
    val v0 = vecs.head._2
    val normSq = v0.map(x => x.toDouble * x.toDouble).sum
    val pNormSq = got(0L).map(x => x * x).sum / dOut
    assert(pNormSq > normSq / 5 && pNormSq < normSq * 5,
      s"projected norm² $pNormSq vs $normSq")
    intercept[IllegalArgumentException] { RandomProjection.signMatrix(0, 8) }
  }
}
