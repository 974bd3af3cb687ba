package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signed random projection (Achlioptas 2003 / the
  * Johnson–Lindenstrauss lemma with a ±1 matrix): project
  * d-dimensional float vectors to d' ≪ d dimensions as
  * `proj_j = Σ_i s_ij · v_i`, s_ij ∈ {+1, −1} — the database-friendly
  * JL construction (no Gaussians, no multiplies beyond a sign flip)
  * that preserves pairwise distances within (1 ± ε) for
  * d' = O(log n / ε²). The cheap-first-pass rung of the ANN
  * compression ladder beside int8 (precision loss), PQ/OPQ (codebook
  * loss) and MRL (training-time truncation): JL needs NO training and
  * no model artifact at all — the sign matrix regenerates from the
  * seed formula anywhere, which is what makes it the zero-coordination
  * option on a 1000-executor cluster.
  *
  * Determinism/portability: s_ij derives from the house md5 hash of
  * `"jl|j|i"` (parity of [[graft.functions.TextFunctions.h64]]'s
  * value), computed DRIVER-side into literal arrays; each output
  * coordinate is one [[graft.functions.VectorFunctions.dot_f]] against
  * a constant ±1 vector — codegen'd, and bit-identical to the SQL
  * replay `Σ CAST(v_i AS DOUBLE) · (±1.0)` because a float times ±1
  * is exact, so the fold sees identical doubles in identical order.
  *
  * Scale shape: the projection is d' codegen'd scan-side folds —
  * narrow, zero shuffle, 4× less downstream I/O at d'/d = 16/64
  * before any index even enters (compose with IVF/PQ freely: project
  * first, index the projections).
  */
object RandomProjection {

  /** The deterministic ±1 sign matrix (dOut rows × dIn columns):
    * s(j)(i) = +1 iff h64("jl|j|i") is even. Regenerates identically
    * anywhere from the formula — there is no model to ship.
    */
  def signMatrix(dOut: Int, dIn: Int): Array[Array[Float]] = {
    require(dOut > 0 && dIn > 0, s"bad projection shape: $dIn -> $dOut")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut, dIn) { (j, i) =>
      val hex = md.digest(s"jl|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0f
      else -1.0f
    }
  }

  /** The projected vector as `array<double>` of length signs.length —
    * one codegen'd dot_f per output coordinate against the constant
    * sign row.
    */
  def project(emb: Column, signs: Array[Array[Float]]): Column =
    array(signs.map(row =>
      graft.functions.VectorFunctions.dot_f(emb, typedlit(row.toSeq))): _*)
}
