package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Top-k per group as a MERGEABLE aggregate — the window-free form of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`. The
  * buffer is the group's running top-k list (score desc, key asc on
  * ties), `reduce` inserts, `merge` merges two lists and re-cuts — so
  * the aggregation combines map-side like any hash aggregate: each
  * task ships at most k rows per group to the exchange, where the
  * rank-window form ships EVERY row of every group and then sorts
  * each group's partition. At 100 TB "top 3 terms per source" the
  * window shuffles the whole (source, term) count table and sorts
  * per source; this ships ≤ k·sources rows past the partial agg.
  * (The repo's min(struct) trick is this with k = 1; the heap buffer
  * generalizes it.)
  *
  * Determinism: the (−score, key) struct order is total, so the kept
  * set and its order never depend on partitioning or task order —
  * the parallelism-independence bar every registry key passes.
  *
  * The buffer is a sorted vector, not a heap: k is small (page-sized)
  * by contract, inserts are O(k), and a vector round-trips the
  * Aggregator's buffer encoder cheaply. Scores are doubles; exact
  * long counts up to 2^53 pass through unchanged.
  */
object TopKAggregator {

  final case class Entry(score: Double, key: String)
  final case class TopK(entries: Seq[Entry])

  /** `entries` sorted (score desc, key asc), length ≤ k. */
  private def insert(buf: Vector[Entry], e: Entry, k: Int): Vector[Entry] = {
    val idx = buf.indexWhere(b =>
      b.score < e.score || (b.score == e.score && b.key > e.key))
    val at = if (idx < 0) buf.length else idx
    if (at >= k) buf
    else {
      val withE = (buf.take(at) :+ e) ++ buf.drop(at)
      if (withE.length > k) withE.take(k) else withE
    }
  }

  def agg(k: Int): Aggregator[Entry, Vector[Entry], TopK] = {
    require(k > 0, s"k must be positive, got $k")
    new Aggregator[Entry, Vector[Entry], TopK] {
      override def zero: Vector[Entry] = Vector.empty
      override def reduce(b: Vector[Entry], e: Entry): Vector[Entry] =
        insert(b, e, k)
      override def merge(a: Vector[Entry], b: Vector[Entry]): Vector[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      override def finish(b: Vector[Entry]): TopK = TopK(b)
      override def bufferEncoder: Encoder[Vector[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Entry]]()
      override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
    }
  }

  /** The aggregate as an untyped column for DataFrame groupBy:
    * `topK(3)(col("score"), col("term"))` → a TopK struct whose
    * `entries` the caller explodes (each entry carries score + key).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(agg(k), Encoders.product[Entry])
    (score, key) => fn(score, key)
  }
}
