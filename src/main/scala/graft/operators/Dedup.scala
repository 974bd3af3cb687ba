package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-facing dedup API over a `(idCol: bigint, textCol: string)`
  * corpus — the operator forms behind the oracle-checked q31/q32/q43/q44
  * queries, plus the piece a real pipeline needs on top: SURVIVOR
  * selection (keep exactly one document per duplicate CLUSTER, not per
  * pair).
  *
  * Cluster resolution is distributed min-label propagation over the
  * near-dup pair graph: each node repeatedly adopts the smallest label
  * among itself and its neighbors until fixpoint. Duplicate clusters are
  * short-diameter (near-copies of one source), so this converges in a
  * handful of iterations; each iteration is one join + one aggregate —
  * no driver-side graph ever materializes.
  */
object Dedup {

  /** Exact dedup: one row per distinct text, min id survives (q31). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col(textCol), col("n_copies"))

  /** Near-dup candidate pairs via MinHash-LSH banding (q44's operator):
    * (id1, id2, est_sim), id1 < id2.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    graft.queries.TrainingData.lshPairs(docs)
  }

  /** Connected components over a pair list by min-label propagation.
    * @param pairs (id1, id2) edges
    * @return (id, component) — component = min id reachable
    */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id1"), col("id2"))
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .distinct().cache()
    try {
      var labels = edges.select(col("id1").as("id")).distinct()
        .withColumn("component", col("id"))
      var prevCache: Option[DataFrame] = None
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        // Each node adopts min(own label, neighbors' labels).
        val next = edges
          .join(labels.withColumnRenamed("id", "id2")
            .withColumnRenamed("component", "nbr_label"), Seq("id2"))
          .groupBy(col("id1").as("id"))
          .agg(min(col("nbr_label")).as("nbr_min"))
          .join(labels, Seq("id"))
          .select(col("id"), least(col("component"), col("nbr_min")).as("component"))
          .cache()
        val changed = next.join(labels.withColumnRenamed("component", "old"), Seq("id"))
          .filter(col("component") < col("old")).limit(1).count()
        prevCache.foreach(_.unpersist()) // don't pile one cache per iteration
        prevCache = Some(next)
        labels = next
        converged = changed == 0
        i += 1
      }
      // Silent truncation would keep extra "survivors" from one cluster —
      // fail loudly so callers raise maxIters instead of trusting a
      // wrong dedup.
      if (!converged)
        throw new IllegalStateException(
          s"components() did not converge within $maxIters iterations " +
            "(duplicate-cluster diameter exceeds maxIters — raise it)")
      // Materialize + truncate the O(iterations)-deep join lineage before
      // releasing the iteration caches the result was built from.
      val result = labels.localCheckpoint()
      prevCache.foreach(_.unpersist())
      result
    } finally edges.unpersist()
  }

  /** Full near-dedup: keep ONE survivor (min id) per LSH near-dup
    * cluster with estimated similarity >= `minEstSim`; unique docs
    * survive untouched. Returns the deduplicated corpus.
    */
  def nearDedup(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, minEstSim: Double): DataFrame = {
    val pairs = lshCandidatePairs(df, idCol, textCol)
      .filter(col("est_sim") >= minEstSim)
    val comp = components(pairs)
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
