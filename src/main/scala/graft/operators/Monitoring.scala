package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delivery-rate anomaly detection — the analytical half of the
  * monitoring surface the reference provisions around its delivery
  * streams (`kds_example/iac/s2_app.py:91-118` grants the CloudWatch
  * metric/logging statements; the operational question those metrics
  * answer is "did a stream's rate go weird today"). Detection is the
  * robust z-score over a bucketed rate series: per key,
  *
  *   z = (cnt − median) / (1.4826 · MAD),   MAD = median(|cnt − median|)
  *
  * — the median/MAD pair instead of mean/stddev because rate series
  * CONTAIN the anomalies one is looking for, and moment statistics
  * chase them (one spike drags the mean and explodes the stddev,
  * masking itself; the breakdown point of the median is 50%). 1.4826
  * is the standard consistency constant that scales MAD to σ under
  * normality.
  *
  * Determinism discipline: buckets are exact long counts on the DENSE
  * grid ([[SearchDsl.dateHistogramPipeline]]'s zero-fill — a silent
  * day IS an anomaly and must score, not vanish); medians are
  * `percentile_cont` interpolation (one lerp between order statistics,
  * the q123-gated cross-engine form); z is scalar double arithmetic in
  * fixed op order, and the report ranks on the ROUNDED |z| (the q85
  * discipline) with (key, day) tie-breaks.
  *
  * Scale shape: the input grid is days × keys (time-bounded metadata);
  * both median passes are mergeable sort-based aggs over that grid
  * with key-count-sized outputs joined back broadcast. Nothing here
  * ever touches the event corpus — callers pay the one count shuffle
  * inside the grid builder.
  */
object Monitoring {

  /** Top-`topN` anomalous (key, day) buckets of a dense rate grid
    * (key, day, cnt) by rounded robust |z|: (key, day, cnt, med, mad,
    * z, rnk). Keys whose MAD is 0 (at least half the days identical)
    * pin z to 0 rather than dividing by zero — a constant series has
    * no scale to score against, the conventional guard.
    */
  def robustAnomalies(grid: DataFrame, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    import graft.queries.Par
    val med = grid.groupBy("key")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt)").as("med"))
    val withMed = grid.join(broadcast(med), "key")
    val mad = withMed.groupBy("key")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(CAST(cnt AS DOUBLE) - med))")
        .as("mad"))
    val z = withMed.join(broadcast(mad), "key")
      .withColumn("z",
        when(col("mad") === 0.0, 0.0)
          .otherwise((col("cnt").cast("double") - col("med")) /
            (lit(1.4826) * col("mad"))))
    z.orderBy(Par.r4(abs(col("z"))).desc, col("key"), col("day")).limit(topN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(Par.r4(abs(col("z"))).desc, col("key"), col("day")))
        .cast("long"))
  }
}
