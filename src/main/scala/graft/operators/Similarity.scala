package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor scale paths for embedding columns
  * (`Array[Float]`). Q33/Q46 give the brute-force oracle-checked
  * baselines; these operators are the 100 TB variants:
  *
  * - [[topKPerProbe]]: partial top-k BELOW the exchange — each partition
  *   keeps only its local top-k per probe before the shuffle, so the
  *   exchange carries O(partitions × probes × k) rows, not the corpus.
  * - [[hyperplaneLsh]]: random-hyperplane signatures; candidates share a
  *   bucket → pair generation is a hash join on bucket keys (IVF-style
  *   coarse quantization with deterministic, engine-portable planes).
  */
object Similarity {

  /** Sequential-fold dot product / L2 norm over array<float> — the
    * codegen'd [[graft.functions.DotProductF]] expression (same op order
    * as DuckDB's list_sum, keeping floats bit-portable).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot_f(a, b)

  def norm(a: Column): Column = graft.functions.VectorFunctions.norm_f(a)

  /** Exact top-k neighbors per probe with partial (map-side) top-k.
    *
    * @param corpus  (id: bigint, embedding: array<float>)
    * @param probes  same schema; must be small enough to broadcast
    */
  def topKPerProbe(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("eb"),
      norm(col("embedding")).as("nb"))
    val p = probes.select(col("id").as("probe_id"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val scored = c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
    // Partial top-k per (input partition × probe): spark_partition_id in
    // the window key bounds every partition's contribution to k rows per
    // probe BEFORE the exchange; the final window re-ranks k×P rows.
    val partial = Window.partitionBy(col("probe_id"), spark_partition_id())
      .orderBy(col("cos").desc, col("neighbor_id"))
    val finalW = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("prnk", row_number().over(partial)).filter(col("prnk") <= k)
      .withColumn("rnk", row_number().over(finalW)).filter(col("rnk") <= k)
      .drop("prnk")
  }

  /** Random-hyperplane LSH bucket key (deterministic planes derived from
    * md5 of (plane index, dimension index) — engine-portable, no RNG
    * state). Vectors sharing all `nPlanes` sign bits land in one bucket.
    */
  def hyperplaneLsh(embeddings: DataFrame, nPlanes: Int): DataFrame = {
    // plane p, dim d weight ∈ {-1, +1} from a hash bit — a cheap
    // deterministic rademacher projection.
    val sigBits = (0 until nPlanes).map { p =>
      val proj = expr(
        s"""aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
           |  (x, d) -> cast(x as double) *
           |    (cast((cast(conv(substring(md5(concat('$p', '|', d)), 1, 15), 16, 10) as bigint) & 1) * 2 - 1 as double))),
           |  cast(0.0 as double), (acc, v) -> acc + v)""".stripMargin)
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    embeddings.withColumn("bucket", concat(sigBits: _*))
  }

  /** Candidate near-dup pairs via LSH buckets: all-pairs only WITHIN a
    * bucket (hash join on bucket key), then exact cosine on candidates.
    */
  def lshNearDupPairs(embeddings: DataFrame, nPlanes: Int, minCos: Double): DataFrame = {
    val withBucket = hyperplaneLsh(
      embeddings.select(col("vec_id"), col("embedding")), nPlanes)
    val a = withBucket.select(col("vec_id").as("id1"), col("embedding").as("ea"), col("bucket"))
    val b = withBucket.select(col("vec_id").as("id2"), col("embedding").as("eb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb")))).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
