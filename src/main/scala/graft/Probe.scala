package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler (developer tool, not a driver contract):
  * `sbt "runMain graft.Probe q28_json q52_correlated_subquery"` times the
  * named registry queries on SPARK_GRAFT_SF_DIR exactly the way Bench
  * does (noop sink, median of 3) and prints the formatted physical plan,
  * so a slow bench line can be read plan-first instead of guessed at.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-x")
    val names = args.filterNot(_.startsWith("-"))
    // Same session shape as Bench (cpu-derived master + shuffle
    // partitions), so a probed plan/time corresponds to the bench line
    // being investigated — a fixed local[32] on a smaller host would
    // oversubscribe and plan differently.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => queries.Tables.t(spark, sfDir, t).count())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"PROBE $name%-28s median=${samples.sorted.apply(1)}%.3f  all=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
