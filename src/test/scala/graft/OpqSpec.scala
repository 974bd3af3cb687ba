package graft

import org.apache.spark.sql.functions._

import graft.operators.Opq

class OpqSpec extends SparkSpec {

  private lazy val emb = queries.Tables.t(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val rot = Opq.rotation(64)

  test("rotation is orthogonal: norms and pairwise dots are preserved") {
    import spark.implicits._
    val orig = emb.as[(Long, Array[Float])].collect().toMap
    val rotd = Opq.rotate(spark, emb, rot).as[(Long, Array[Float])].collect().toMap
    assert(rotd.keySet == orig.keySet)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // Norm preservation per vector (float32 re-rounding budget only).
    orig.foreach { case (id, v) =>
      val n0 = math.sqrt(dot(v, v)); val n1 = math.sqrt(dot(rotd(id), rotd(id)))
      assert(math.abs(n0 - n1) <= 1e-4 * math.max(1.0, n0),
        s"vec $id norm moved: $n0 -> $n1")
    }
    // Dot preservation on a pair sample — cosines (the search metric)
    // are invariant, so a rotated index answers the same queries.
    val ids = orig.keys.toSeq.sorted.take(10)
    for (a <- ids; b <- ids if a < b) {
      val d0 = dot(orig(a), orig(b)); val d1 = dot(rotd(a), rotd(b))
      assert(math.abs(d0 - d1) <= 1e-3 * math.max(1.0, math.abs(d0)),
        s"dot($a,$b) moved: $d0 -> $d1")
    }
  }

  test("Householder reflection is an involution: rotate twice = identity") {
    import spark.implicits._
    val orig = emb.as[(Long, Array[Float])].collect().toMap
    val twice = Opq.rotate(spark, Opq.rotate(spark, emb, rot), rot)
      .as[(Long, Array[Float])].collect().toMap
    orig.foreach { case (id, v) =>
      v.zip(twice(id)).zipWithIndex.foreach { case ((x, y), d) =>
        assert(math.abs(x - y) <= 1e-3 * math.max(1.0, math.abs(x.toDouble)),
          s"vec $id dim $d: $x != $y after double rotation")
      }
    }
  }

  test("rotate matches a driver-side sequential replay bit-for-bit") {
    import spark.implicits._
    // The portability contract behind q78's oracle: same fold order,
    // same double ops, same float32 cast — EXACT equality, no tolerance.
    val got = Opq.rotate(spark, emb, rot).as[(Long, Array[Float])].collect().toMap
    emb.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += rot.u(i) * v(i).toDouble; i += 1 }
      val expect = Array.tabulate(v.length)(d =>
        (v(d).toDouble - 2.0 * rot.u(d) * s).toFloat)
      assert(got(id).sameElements(expect), s"vec $id rotation not bit-exact")
    }
    // And u itself is exact at dim 64: ±0.125, no rounding at all.
    assert(rot.u.forall(u => math.abs(u) == 0.125))
  }

  test("rotate fails loud on vectors wider than the rotation") {
    import spark.implicits._
    val wide = Seq((1L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      Opq.rotate(spark, wide, rot).collect()
    }
    assert(ex.getMessage != null)
  }
}
