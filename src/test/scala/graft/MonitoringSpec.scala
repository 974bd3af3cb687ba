package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.{Monitoring, SearchDsl}

/** Hand-computed fixtures for the date-histogram pipeline aggregations
  * and the robust anomaly report (corpus-level oracles: q176/q177).
  */
class MonitoringSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 9): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // type a: days 1..5 = 2,4,1,0(gap),3 events; type b: day 2 and 5 only.
  private val events = (
    Seq.fill(2)(("a", ts(1))) ++ Seq.fill(4)(("a", ts(2))) ++
    Seq.fill(1)(("a", ts(3))) ++ Seq.fill(3)(("a", ts(5))) ++
    Seq.fill(5)(("b", ts(2))) ++ Seq.fill(1)(("b", ts(5)))
  ).toDF("event_type", "ts")

  test("dateHistogramPipeline: dense zero buckets, cumsum, derivative, trailing mean") {
    val got = SearchDsl.dateHistogramPipeline(events, "event_type", "ts", window = 3)
      .select("key", "day", "cnt", "cum_cnt", "deriv", "mov_avg")
      .as[(String, Date, Long, Long, Option[Long], Double)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4, r._5, r._6))).toMap
    // grid is 2 types x 5 days = 10 dense buckets
    assert(got.size == 10)
    // the silent day 4 of type a is an explicit zero bucket
    assert(got(("a", "2024-01-04")) == ((0L, 7L, Some(-1L), (4L + 1L + 0L) / 3.0)))
    // first bucket: no derivative, window of one
    assert(got(("a", "2024-01-01")) == ((2L, 2L, None, 2.0)))
    // type b day 1 is zero (b starts at day 2 but the grid is corpus-bounded)
    assert(got(("b", "2024-01-01")) == ((0L, 0L, None, 0.0)))
    assert(got(("b", "2024-01-02")) == ((5L, 5L, Some(5L), 2.5)))
    // cumulative telescopes to the type total on the last day
    assert(got(("a", "2024-01-05"))._2 == 10L && got(("b", "2024-01-05"))._2 == 6L)
    intercept[IllegalArgumentException] {
      SearchDsl.dateHistogramPipeline(events, "event_type", "ts", window = 0)
    }
  }

  test("robustAnomalies: median/MAD replay, zero-MAD guard, rounded-|z| ranking") {
    // counts c: a -> [2,4,1,0,3] (med 2, |d| = [0,2,1,2,1] -> mad 1)
    //           b -> [0,5,0,0,1] (med 0, |d| = [0,5,0,0,1] -> mad 0 -> z pinned 0)
    val grid = SearchDsl.dateHistogramGrid(events, "event_type", "ts")
    val got = Monitoring.robustAnomalies(grid, topN = 10)
      .select("key", "day", "cnt", "med", "mad", "z", "rnk")
      .as[(String, Date, Long, Double, Double, Double, Long)].collect()
    assert(got.length == 10)
    val byKey = got.map(r => (r._1, r._2.toString) -> r).toMap
    // type a day 2: z = (4 - 2) / (1.4826 * 1)
    val za = byKey(("a", "2024-01-02"))
    assert(za._4 == 2.0 && za._5 == 1.0 && za._6 == (4.0 - 2.0) / (1.4826 * 1.0))
    // type b: mad 0 -> all z exactly 0, even the 5-count spike
    got.filter(_._1 == "b").foreach(r => assert(r._6 == 0.0, r))
    // rank 1 is the largest rounded |z| with (key, day) tie-break: a day 2
    val top = got.find(_._7 == 1L).get
    assert((top._1, top._2.toString) == (("a", "2024-01-02")))
    // ranking is total and contiguous
    assert(got.map(_._7).sorted.toSeq == (1L to 10L))
    intercept[IllegalArgumentException] { Monitoring.robustAnomalies(grid, 0) }
  }
}
