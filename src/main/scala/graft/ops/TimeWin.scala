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

    // ------------------------------------------------------------------
    // Ordered-event funnel with a 24 h conversion window per step: first
    // view → first click within 24 h of it → first purchase within 24 h
    // of THAT. Three per-user partial-agg mins chained by user-keyed
    // joins — no window over raw events, no per-user state beyond one
    // timestamp per step, so the funnel scales with user count.
    "q78_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val s1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"))
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------------------
    // Daily cohort retention: users grouped by first-active day, then
    // per (cohort, day-offset) the distinct active users and the
    // retention rate vs cohort size. Classic engagement matrix — one
    // user-keyed agg, one join back, one distinct, one final agg.
    "q79_retention" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val firstd = e.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      val cSize = firstd.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
      e.join(firstd, "user_id")
        .select(col("user_id"), col("cohort"),
          datediff(date_trunc("day", col("ts")).cast("date"), col("cohort").cast("date")).as("d"))
        .distinct()
        .groupBy(col("cohort"), col("d")).agg(count(lit(1)).as("n_users"))
        .join(broadcast(cSize), "cohort")
        .select(col("cohort"), col("d"), col("n_users"), col("cohort_size"),
          round(col("n_users") / col("cohort_size"), 6).as("rate"))
        .orderBy(col("cohort"), col("d"))
    }),
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
    "q78_funnel" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), "
        + "s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id) "
        + "WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 24 HOUR GROUP BY e.user_id), "
        + "s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id) "
        + "WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL 24 HOUR GROUP BY e.user_id) "
        + "SELECT s1.user_id, t1, t2, t3 FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id "
        + "LEFT JOIN s3 ON s1.user_id = s3.user_id ORDER BY s1.user_id"),
    "q79_retention" ->
      ("WITH firstd AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort FROM events GROUP BY user_id), "
        + "csize AS (SELECT cohort, count(*) AS cohort_size FROM firstd GROUP BY cohort), "
        + "act AS (SELECT DISTINCT e.user_id, f.cohort, date_diff('day', CAST(f.cohort AS DATE), CAST(date_trunc('day', e.ts) AS DATE)) AS d "
        + "FROM events e JOIN firstd f USING (user_id)), "
        + "agg AS (SELECT cohort, d, count(*) AS n_users FROM act GROUP BY cohort, d) "
        + "SELECT a.cohort, a.d, a.n_users, c.cohort_size, round(CAST(a.n_users AS DOUBLE) / c.cohort_size, 6) AS rate "
        + "FROM agg a JOIN csize c USING (cohort) ORDER BY a.cohort, a.d"),
  )
}
