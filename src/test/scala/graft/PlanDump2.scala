package graft

import org.apache.spark.sql.functions._

object PlanDump2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    val ev = queries.Tables.events(spark, dir)
    val e1 = ev.select(col("user_id"), col("ts").as("ts1"), col("event_id").as("id1"))
    val e2 = ev.select(col("user_id"), col("ts").as("ts2"), col("event_id").as("id2"))
    val naive = e1.join(e2,
      e1("user_id") === e2("user_id") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
    println(naive.queryExecution.analyzed.treeString)
    println("----optimized----")
    println(naive.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
