package graft

/** Ad-hoc: time a subset of registry keys (not part of CI).
  * Usage: Test/runMain graft.TimeProbe <sfDir> <key> [key...]
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    (1 to 2).foreach { rep =>
      keys.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        println(f"rep$rep $n%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
