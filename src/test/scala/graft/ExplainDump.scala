package graft

/** Ad-hoc: dump formatted plans for manual review (not part of CI). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.01"
    // Default set, or any registry keys passed as args.
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("q02_project", "q03_filter", "q06_broadcast_join",
        "q07_multijoin", "q13_agg", "q18_sort_limit", "q33_similarity_topk")
    keys.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
