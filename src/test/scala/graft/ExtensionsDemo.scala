package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked end-to-end proof of the SparkSessionExtensions wiring (must run
  * in its own JVM — a session built elsewhere wins inside a shared suite):
  * `sbt 'Test/runMain graft.ExtensionsDemo'`.
  * Exercised by VerifyExtensionsSpec via a plan-level check; this main
  * additionally proves builder-level injection.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-demo")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. dot_f resolves through the SQL function registry.
    val d = spark.sql(
      "SELECT dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
    require(d == 11.0, s"dot_f via SQL returned $d")

    // 2. The interval-join rule fires automatically on the naive shape.
    val ev = queries.Tables.events(spark, "/root/testdata/sf0.001")
    val e1 = ev.select(col("user_id"), col("ts").as("ts1"), col("event_id").as("id1"))
    val e2 = ev.select(col("user_id"), col("ts").as("ts2"), col("event_id").as("id2"))
    val naive = e1.join(e2,
      e1("user_id") === e2("user_id") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
      .select("id1", "id2")
    val optimized = naive.queryExecution.optimizedPlan.toString
    require(optimized.contains("_graft_jb"),
      s"BucketedIntervalJoin did not fire in extensions session:\n$optimized")
    val n = naive.count()
    require(n > 0, "rewritten join returned no rows")
    println(s"EXTENSIONS-OK dot_f=$d intervalJoinRows=$n")
    spark.stop()
  }
}
