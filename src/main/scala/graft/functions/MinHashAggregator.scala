package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash sketch as a typed, MERGEABLE aggregator: the buffer is the
  * running 16-minima vector, `merge` is elementwise min — so sketches
  * union across partitions, across documents, or across whole corpora
  * (the property that lets 100 TB dedup shard freely and still combine).
  *
  * Input is the pre-hashed shingle value (`TextFunctions.h64(shingle) % P`
  * — same base hash as queries/TrainingData.signatures, so sketches built
  * here agree exactly with the oracle-checked q43 signatures).
  */
object MinHashAggregator {

  val NumHashes = 16
  val P: Long = 1073741789L

  final case class Sketch(mins: Array[Long]) {
    def estJaccard(other: Sketch): Double = {
      var agree = 0
      var i = 0
      while (i < NumHashes) {
        if (mins(i) == other.mins(i)) agree += 1
        i += 1
      }
      agree.toDouble / NumHashes
    }
  }

  private def empty: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  private def mix(hm: Long, j: Int): Long = (hm * (2 * j + 1) + j * 7919L) % P

  /** The j-th mix over a pre-reduced hash COLUMN — the single source of
    * truth TrainingData's q43/q44 signatures build from, so the
    * Aggregator and the oracle-checked queries can never drift apart.
    */
  def mixCol(hm: org.apache.spark.sql.Column, j: Int): org.apache.spark.sql.Column =
    (hm * (2 * j + 1) + j * 7919L) % P

  /** DuckDB spelling of [[mixCol]] for oracle SQL strings. */
  def mixSql(hmExpr: String, j: Int): String =
    s"($hmExpr * ${2 * j + 1} + ${j * 7919}) % $P"

  val agg: Aggregator[Long, Array[Long], Sketch] =
    new Aggregator[Long, Array[Long], Sketch] {
      override def zero: Array[Long] = empty
      override def reduce(b: Array[Long], hm: Long): Array[Long] = {
        var j = 0
        while (j < NumHashes) {
          val v = mix(hm, j)
          if (v < b(j)) b(j) = v
          j += 1
        }
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var j = 0
        while (j < NumHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
        a
      }
      override def finish(b: Array[Long]): Sketch = Sketch(b)
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    }
}
