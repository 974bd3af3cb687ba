package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (a hot Kinesis partition key
  * hot-shards in the reference exactly the same way — SURVEY §4).
  *
  * AQE's skew-join handles sort-merge skew at runtime; salting is the
  * static fallback for the shapes AQE can't split (e.g. a huge build
  * side, or aggregations): the left side gets a random salt in
  * [0, factor), the right side is replicated `factor` times, and the
  * join key becomes (key, salt) — a hot key now spreads over `factor`
  * reducers.
  */
object Skew {

  /** Inner equi-join with a salted key. `saltFactor` multiplies the
    * right side — keep it small (8–32) and apply only when a key is
    * known-hot.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val l = left.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: partial-aggregate on (key, salt)
    * then finish on key — bounds any single reducer's input to
    * |distinct keys hitting it| × factor partials.
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("_salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("n"))
}
