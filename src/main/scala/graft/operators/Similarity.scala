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

  /** All-pairs cosine, block-partitioned kernel form: broadcast the
    * packed corpus once, give each task a slice of row indices, and run
    * the O(slice × n) dot products as a primitive loop — no per-pair
    * array materialization through a join (which is pure memcpy cost in
    * the declarative formulation). The per-pair arithmetic is the exact
    * sequential fold of [[graft.functions.DotProductF]], so results stay
    * bit-identical to the SQL oracle.
    *
    * The broadcast bounds this to corpora that fit an executor (~1e6 ×
    * 64f = 256 MB); past that, [[lshNearDupPairs]] / block-matrix tiling
    * is the path — this kernel then runs per (bucket/block) instead.
    *
    * @return (id1, id2, cos) for the global top-`k` pairs, id1 < id2,
    *         ordered by (cos desc, id1, id2).
    */
  def bruteForceTopPairs(spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val packed: Array[(Long, Array[Float], Double)] = embeddings
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(s))
      }
    val bc = spark.sparkContext.broadcast(packed)
    val n = packed.length
    spark.range(0, n, 1, math.min(n, 64)).as[Long]
      .mapPartitions { idxs =>
        val arr = bc.value
        idxs.flatMap { li =>
          val i = li.toInt
          val (id1, a, na) = arr(i)
          (i + 1 until arr.length).iterator.map { j =>
            val (id2, b, nb) = arr(j)
            var s = 0.0; var d = 0
            val len = math.min(a.length, b.length)
            while (d < len) { s += a(d).toDouble * b(d).toDouble; d += 1 }
            (id1, id2, s / (na * nb))
          }
        }
      }
      .toDF("id1", "id2", "cos")
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(k) // TakeOrderedAndProject: per-partition top-k, driver merge
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
    // Norms computed ONCE per vector before the join — recomputing them
    // inside the joined projection would redo O(dim) work per pair.
    val withBucket = hyperplaneLsh(
      embeddings.select(col("vec_id"), col("embedding")), nPlanes)
      .withColumn("nrm", norm(col("embedding")))
    val a = withBucket.select(col("vec_id").as("id1"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = withBucket.select(col("vec_id").as("id2"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
