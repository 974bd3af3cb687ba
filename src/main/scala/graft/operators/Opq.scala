package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ-style rotation ahead of product quantization (Ge et al.,
  * "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", CVPR 2013): PQ's quantization error depends on how variance
  * and correlation spread ACROSS the subspaces, and an orthogonal
  * rotation applied before slicing rebalances them without changing any
  * geometry (norms, dots, and cosines are invariant, so the rotated
  * index answers the same queries). Full OPQ alternates the rotation
  * and the codebooks; the rotation rung implemented here is the
  * paper's data-independent baseline (§2, "RR" — also PQ's standard
  * pre-conditioner in practice): a fixed orthogonal transform shared by
  * corpus and probes.
  *
  * The transform is a HOUSEHOLDER reflection R = I − 2·u·uᵀ with a
  * deterministic unit direction u: signs from the same md5 rule as the
  * LSH planes ([[Similarity.planeWeight]] — engine-portable, no RNG
  * state), scaled by 1/√dim. Exactly orthogonal by construction
  * (R·Rᵀ = I in real arithmetic; R is its own inverse), it mixes every
  * input dimension into every subspace, and — unlike a dense d×d
  * matmul — applies in O(d) per vector:
  *
  *   y = x − 2·u·(u·x)
  *
  * one shared fold for s = u·x, then one multiply-subtract per
  * dimension. Every step is a sequential double op in a fixed order, so
  * an external engine replays the rotation bit-for-bit (q78's oracle
  * does, then replays the whole PQ chain of q76 over the rotated
  * corpus).
  *
  * Scale shape: `u` is dim-sized (driver constant, broadcast with the
  * task binary); [[rotate]] is one narrow map — no shuffle, no model
  * state. Compose as rotate → [[Pq.train]]/[[Pq.encode]]/[[Pq.search]]
  * (rotating probes with the same rotation), or ahead of [[IvfPq]] the
  * same way.
  */
object Opq {

  /** The unit Householder direction (doubles — scaling by 1/√dim leaves
    * float range, and the SQL twin divides in double too).
    */
  final case class Rotation(u: Array[Double])

  /** Deterministic direction for `dim` dimensions: u[d] = ±1/√dim with
    * the sign of [[Similarity.planeWeight]](seed, d) — the md5 bit an
    * engine computes in SQL. At dim = 64 (the embeddings table) 1/√64
    * is exactly 0.125, so u is exact; at other dims both engines
    * compute the same correctly-rounded `sign / sqrt(dim)` double.
    */
  def rotation(dim: Int, seed: Int = 0): Rotation = {
    require(dim > 0, s"rotation dim must be positive, got $dim")
    val s = math.sqrt(dim.toDouble)
    Rotation(Array.tabulate(dim)(d => Similarity.planeWeight(seed, d).toDouble / s))
  }

  /** Apply y = x − 2·u·(u·x), per-component cast back to float32 — the
    * narrow rotation pass over (vec_id, embedding). Fold order is
    * fixed (ascending dimension, u[i]·x[i] products into a double
    * accumulator; then x[d] − 2·u[d]·s left-to-right), matching the
    * oracle's spelling exactly. Vectors SHORTER than u rotate in their
    * leading subspace (the fold stops at the shorter length, like
    * [[graft.functions.DotProductF]]); longer ones fail loud — silently
    * leaving tail dimensions unmixed would corrupt the PQ slices
    * downstream.
    */
  def rotate(spark: SparkSession, embeddings: DataFrame,
      rot: Rotation): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rot.u)
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val u = bc.value
        require(v == null || v.length <= u.length,
          s"Opq.rotate: vec $id has dim ${v.length} > rotation dim ${u.length}")
        if (v == null) (id, null)
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += u(i) * v(i).toDouble; i += 1 }
          (id, Array.tabulate(v.length)(d =>
            (v(d).toDouble - 2.0 * u(d) * s).toFloat))
        }
      }
      .toDF("vec_id", "embedding")
  }
}
