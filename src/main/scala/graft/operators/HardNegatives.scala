package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive hard-negative mining — the training-pair prep stage for
  * embedding/retriever models (Karpukhin et al. 2020 "Dense Passage
  * Retrieval" §4.2; the E5/GTE recipe): for each query vector, the
  * highest-cosine corpus candidates that are NOT near-duplicates of it.
  * The top of the retrieval list splits into two bands — candidates
  * above `dupCos` are the query's own copies/paraphrases (using them as
  * negatives would be a false negative and poison the contrastive
  * loss), and the band just below is exactly the "hard" region where a
  * retriever learns its margins.
  *
  * Scale shape: mining rides the SAME shared IVF index the search
  * queries use ([[Ivf.search]] — cell-pruned candidate generation,
  * never an all-pairs scan; the model trains once on the corpus and a
  * mining pass must not move centroids, the q89 shared-index
  * discipline). The retrieval depth `kRetrieve` bounds every
  * per-probe frame, so the exclusion filter and the re-rank window are
  * O(kRetrieve)-bounded per probe — no corpus-sized window anywhere.
  */
object HardNegatives {

  /** Mine up to `n` hard negatives per probe from a `kRetrieve`-deep
    * cell-pruned retrieval, excluding the near-duplicate band.
    *
    * @param indexed corpus with `cell` assignments ([[Ivf.index]])
    * @param dupCos  exclusion threshold compared on the RAW cosine
    *                (identical IEEE fold on any engine — the q33
    *                selection discipline)
    * Output: probe_id, neighbor_id, cos, neg_rank (1-based among the
    * kept negatives, cos desc / neighbor_id tie-break).
    */
  def mine(spark: SparkSession, indexed: DataFrame, model: Ivf.Model,
      probes: DataFrame, kRetrieve: Int, dupCos: Double, n: Int,
      nprobe: Int): DataFrame = {
    require(n <= kRetrieve, s"n=$n must not exceed kRetrieve=$kRetrieve")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    Ivf.search(spark, indexed, model, probes, kRetrieve, nprobe)
      .filter(col("cos") < dupCos)
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= n)
      .select("probe_id", "neighbor_id", "cos", "neg_rank")
  }
}
