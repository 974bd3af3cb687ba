package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {

  test("two-phase running total equals the single-partition window form") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong * 7 % 1000, (i % 13).toLong))
      .toDF("k", "v").dropDuplicates("k")
    val expected = df
      .withColumn("cum", sum("v").over(Window.orderBy("k")))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    // 8 range partitions — the distributed path, not one task.
    val got = PrefixSum.withRunningTotal(df, "k", "v", "cum", partitions = 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("-0.0 and 0.0 sort keys are ONE SQL peer group (RANGE frame)") {
    import spark.implicits._
    // Java boxed equals (and Double.compare) split -0.0 from 0.0; SQL
    // RANGE peers don't. Both zero rows must share the group-closing
    // total, and many partitions force the range-boundary case too.
    val df = Seq((-0.0, 1L), (0.0, 2L), (-1.0, 10L), (1.0, 100L)).toDF("k", "v")
    val out = PrefixSum.withRunningTotal(df, "k", "v", "cum", partitions = 4)
      .select("v", "cum").as[(Long, Long)].collect().toMap
    assert(out(1L) == 13L && out(2L) == 13L,
      s"zero peers split across groups: $out")
    assert(out(10L) == 10L && out(100L) == 113L)
  }

  test("nulls are skipped like SQL sum; an all-null prefix yields NULL, not 0") {
    import spark.implicits._
    val df = Seq((0L, None), (1L, Some(5L)), (2L, None), (3L, Some(2L)), (4L, None), (5L, Some(1L)))
      .toDF("k", "v")
    val out = PrefixSum.withRunningTotal(df, "k", "v", "cum", partitions = 3)
      .select("k", "cum").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((0L, None), (1L, Some(5L)), (2L, Some(5L)),
      (3L, Some(7L)), (4L, Some(7L)), (5L, Some(8L))))
  }

  test("duplicate sort keys: peers share the group-closing total (SQL RANGE frame)") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (2L, 10L), (2L, 20L), (3L, 5L))
      .toDF("k", "v")
    val expected = df
      .withColumn("cum", sum("v").over(Window.orderBy("k"))) // RANGE default
      .select("k", "v", "cum").as[(Long, Long, Long)].collect().sorted
    val got = PrefixSum.withRunningTotal(df, "k", "v", "cum", partitions = 3)
      .select("k", "v", "cum").as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == expected.toSeq)
    // Explicitly: both k=1 rows read 3, both k=2 rows read 33.
    assert(got.filter(_._1 == 1L).map(_._3).toSet == Set(3L))
    assert(got.filter(_._1 == 2L).map(_._3).toSet == Set(33L))
  }

  test("non-long value column and output-name collisions are rejected loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(Seq((1L, 1)).toDF("k", "v"), "k", "v", "cum")
    }
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(Seq((1L, 1L)).toDF("k", "v"), "k", "v", "v")
    }
  }
}
