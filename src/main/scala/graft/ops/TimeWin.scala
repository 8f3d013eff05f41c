package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10: event-time windowing semantics on `events`, batch
  * form (the oracle-able twins of the streaming pipeline in
  * `graft.streaming.StreamDemo` / q47).
  *
  * Scale notes: `window()` / bucket arithmetic is a per-row projection
  * followed by a partial-agg groupBy — one shuffle keyed by (window,
  * type), exactly the aggregation a Structured Streaming job would run
  * incrementally with watermark-bounded state. Sessionization (q46) is
  * the lag→flag→running-sum idiom partitioned by user, so session state
  * never leaves its user partition.
  */
object TimeWin extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // 1-hour tumbling counts/sums per event_type.
    "q44_window_tumble" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
        .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_v"))
        .orderBy(col("w_start"), col("event_type"))),

    // ------------------------------------------------------------------
    // 1-hour windows sliding every 15 min: each event lands in 4
    // windows. DuckDB twin generates the same 4 shifted buckets per row.
    "q45_window_slide" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
        .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_v"))
        .orderBy(col("w_start"), col("event_type"))),

    // ------------------------------------------------------------------
    // Sessionization with a 30-min inactivity gap: lag → new-session
    // flag → running sum = session id → per-session count + duration.
    "q46_sessionize" -> ((s, dir) =>
      Tables.events(s, dir)
        .selectExpr("user_id", "ts", "event_id")
        .selectExpr("user_id", "ts", "event_id",
          "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_sess")
        .selectExpr("user_id", "ts", "event_id",
          "sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id")
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"),
          (unix_micros(max(col("ts")).cast("timestamp")) - unix_micros(min(col("ts")).cast("timestamp"))).as("dur_us"))
        .orderBy(col("user_id"), col("sess_id"))),
  )

  def oracles: Map[String, String] = Map(
    "q44_window_tumble" ->
      ("SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start, event_type, count(*) AS cnt, "
        + "round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_v FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"),
    "q45_window_slide" ->
      ("SELECT w_start, event_type, count(*) AS cnt, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_v FROM ("
        + "SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts - k * (INTERVAL 15 MINUTE)) + k * (INTERVAL 15 MINUTE) AS TIMESTAMP) AS w_start, event_type, value "
        + "FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)) GROUP BY 1, 2 ORDER BY w_start, event_type"),
    "q46_sessionize" ->
      ("SELECT user_id, sess_id, count(*) AS n_events, min(ts) AS sess_start, "
        + "CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur_us FROM ("
        // CAST: DuckDB's integer window-sum returns HUGEINT → pandas float64
        // on the driver side, breaking the byte hash vs Spark's int64.
        + "SELECT user_id, ts, event_id, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM ("
        + "SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        + "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events)) "
        + "GROUP BY user_id, sess_id ORDER BY user_id, sess_id"),
  )
}
