package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc (not CI): decompose q86_hybrid_rrf into its two retrieval
  * halves and time each beside the fused query, plus the q71 cold/warm
  * probe and the window canary — the VERDICT r10 #3/#4 adjudication
  * run. Usage: Test/runMain graft.HybridProbe [sfDir]
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import graft.functions.VectorFunctions.{dot_f, norm_f}
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        println(f"rep$rep $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("q01_canary") { SparkEntry.queries("q01_scan")(spark, dir) }
    // Text half: the q85 registry query IS the BM25 top-k half.
    time("text_half") { SparkEntry.queries("q85_bm25")(spark, dir) }
    // Vector half: per-probe brute cosine top-20, q86's exact shape.
    time("vector_half") {
      val nrm = graft.queries.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          norm_f(col("embedding")).as("nrm"))
      val probes = nrm.filter(col("vec_id") < 3).select(
        col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("nrm").as("pn"))
      val vw = Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("neighbor_id"))
      nrm.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          (dot_f(col("pe"), col("embedding")) / (col("pn") * col("nrm")))
            .as("cos"))
        .withColumn("rnk", row_number().over(vw))
        .filter(col("rnk") <= 20)
    }
    time("q86_full") { SparkEntry.queries("q86_hybrid_rrf")(spark, dir) }
    time("q71_repetition") { SparkEntry.queries("q71_repetition")(spark, dir) }
    spark.stop()
  }
}
