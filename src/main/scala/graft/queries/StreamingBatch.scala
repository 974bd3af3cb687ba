package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q36–Q40: the streaming semantics of SURVEY.md §2B, expressed as batch
  * computations over the closed `events` table so the DuckDB oracle can
  * replay them exactly (arrival order := event_id — FIXTURES.md §3).
  *
  * The genuinely streaming execution of the same graph — readStream,
  * triggers, watermarks, checkpoints, the 4-channel audit sink — lives in
  * [[graft.streaming.DeliveryPipeline]] and is exercised by ScalaTest;
  * these batch forms are the oracle-checkable contracts for the same
  * operators (Spark's own batch/streaming unification makes the
  * `window`/`session_window` aggregations literally the same code).
  */
object StreamingBatch {
  import Tables.t

  private def q(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle))(build)

  private val hourFmt = "yyyy-MM-dd HH:mm"
  private val microFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val q36_tumbling_window: QueryDef = q(
    "q36_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws, event_type,
      |  count(*) AS n, floor(sum(value) * 100 + 0.5) / 100 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Par.r2(sum("value")).as("sum_value"))
      .select(date_format(col("window.start"), hourFmt).as("ws"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  val q37_sliding_window: QueryDef = q(
    "q37_sliding_window",
    """WITH w AS (SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(CAST(k * 15 AS BIGINT)) AS wstart, value
      |           FROM events CROSS JOIN unnest(range(0, 4)) AS u(k))
      |SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS ws, count(*) AS n,
      |  floor(sum(value) * 100 + 0.5) / 100 AS sum_value
      |FROM w GROUP BY wstart ORDER BY ws""".stripMargin
  ) { (s, dir) =>
    // 1-hour window sliding every 15 min: each event lands in exactly 4
    // windows; Spark's window() generates them directly (epoch-aligned,
    // same as DuckDB time_bucket).
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), Par.r2(sum("value")).as("sum_value"))
      .select(date_format(col("window.start"), hourFmt).as("ws"),
        col("n"), col("sum_value"))
      .orderBy("ws")
  }

  val q38_session_window: QueryDef = q(
    "q38_session_window",
    """WITH x AS (SELECT user_id, ts, event_id,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM x)
      |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
  ) { (s, dir) =>
    // Spark session semantics: an event extends the session iff its ts is
    // strictly inside [start, last_ts + gap); a gap of exactly 30 min
    // starts a NEW session — hence `>=` in the oracle's lag test.
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), microFmt).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val q39_watermark_late: QueryDef = q(
    "q39_watermark_late",
    """WITH x AS (SELECT event_id, ts, event_type,
      |        max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
      |      FROM events)
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws, event_type, count(*) AS n
      |FROM x WHERE mx IS NULL OR ts >= mx - INTERVAL 10 MINUTE
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  ) { (s, dir) =>
    // Watermark semantics made deterministic: arrival order := event_id,
    // watermark := running max(ts) - 10 min over STRICTLY EARLIER
    // arrivals; late rows are excluded from the tumbling aggregation.
    // The running max is the range-partitioned two-phase scan
    // (PrefixSum.withRunningMaxExclusive) — the naive
    // Window.orderBy(event_id) form is a single-partition WindowExec
    // that would serialize the whole corpus through one task. The
    // streaming twin (DeliveryPipeline) uses the real distributed
    // withWatermark.
    graft.operators.PrefixSum
      .withRunningMaxExclusive(t(s, dir, "events"), "event_id", "ts", "mx")
      .filter(col("mx").isNull || col("ts") >= col("mx") - expr("INTERVAL 10 MINUTES"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), hourFmt).as("ws"),
        col("event_type"), col("n"))
      .orderBy("ws", "event_type")
  }

  val q40_pipeline_e2e: QueryDef = q(
    "q40_pipeline_e2e",
    """WITH r AS (SELECT event_id,
      |        CASE WHEN event_type = 'error' THEN 'ProcessingFailed'
      |             WHEN value < 10 THEN 'Dropped' ELSE 'Ok' END AS status,
      |        concat_ws('|', CAST(event_id AS VARCHAR), strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
      |          CAST(user_id AS VARCHAR), event_type,
      |          CAST(CAST(floor(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS VARCHAR), props) AS payload
      |      FROM events)
      |SELECT status, count(*) AS n, md5(string_agg(payload, chr(10) ORDER BY event_id)) AS payload_md5
      |FROM r GROUP BY status ORDER BY status""".stripMargin
  ) { (s, dir) =>
    // The reference's whole delivery semantics as one relational contract
    // (reference: kds_example/kds_helper.py:29-63 3-way routing;
    // README.rst:113-124 count-conservation): transform + route every
    // record to exactly one of Ok/Dropped/ProcessingFailed, then
    // content-hash each channel. The streaming twin writes these channels
    // as the 4-prefix NDJSON audit layout.
    val r = t(s, dir, "events").select(
      col("event_id"),
      when(col("event_type") === "error", "ProcessingFailed")
        .when(col("value") < 10, "Dropped")
        .otherwise("Ok").as("status"),
      concat_ws("|", col("event_id").cast("string"),
        date_format(col("ts"), microFmt), col("user_id").cast("string"),
        // DECIMAL, never double→string: Java flips to scientific
        // notation at 1e7 ("1.0E7") where DuckDB's repr stays plain —
        // a fixed-scale decimal renders identically in both engines.
        col("event_type"), Par.r2(col("value")).cast("decimal(18,2)").cast("string"),
        col("props")).as("payload"))
    // GATE-ONLY SHAPE (the q33 brute-force-oracle discipline): the
    // per-status collect_list materializes a whole channel's payloads
    // in one aggregation buffer — at 100× one buffer would hold a
    // third of the corpus. That shape is FORCED by the oracle contract
    // (DuckDB `string_agg ... ORDER BY` under md5 needs the full
    // ordered concatenation on both sides); the production path is
    // DeliveryPipeline's distributed per-channel NDJSON write, which
    // never aggregates a channel into one row.
    r.groupBy("status")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws("\n",
          expr("transform(array_sort(collect_list(struct(event_id, payload))), x -> x.payload)")))
          .as("payload_md5"))
      .orderBy("status")
  }

  val all: Seq[QueryDef] = Seq(
    q36_tumbling_window, q37_sliding_window, q38_session_window,
    q39_watermark_late, q40_pipeline_e2e)
}
