package graft

/** Ad-hoc: dump formatted plans for manual review (not part of CI). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.01"
    Seq("q02_project", "q03_filter", "q06_broadcast_join", "q07_multijoin",
      "q13_agg", "q18_sort_limit", "q33_similarity_topk").foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
