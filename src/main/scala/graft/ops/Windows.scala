package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6: window functions — ranking, analytic, and frame
  * specifications.
  *
  * Scale notes: every window here is PARTITIONED (by customer / user /
  * event_type), so window state is bounded per key and the plan is one
  * hash-partitioned shuffle + per-partition sort — no global single-task
  * window anywhere. Ranking + filter(rn<=k) is the distributed top-k-per-
  * group idiom (WindowGroupLimit pushes the limit into the sort at
  * execution).
  *
  * Determinism: every ORDER BY inside a window carries a unique tiebreak
  * key (o_orderkey / event_id), per SURVEY.md §4.3.1.
  */
object Windows extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Top-3 orders per customer with all three rank flavors.
    "q25_rank_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ------------------------------------------------------------------
    // lag/lead/first/last/ntile/percent_rank/cume_dist in one pass —
    // one shuffle by user_id, one sort, all analytics share the frame.
    "q26_analytic" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("lag_v", lag(col("value"), 1).over(w))
        .withColumn("lead_v", lead(col("value"), 1).over(w))
        .withColumn("first_ts", first(col("ts")).over(w))
        .withColumn("last_ts", last(col("ts")).over(wAll))
        .withColumn("tile4", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .drop("value")
        .orderBy(col("event_id"))
    }),

    // ------------------------------------------------------------------
    // Frame tour on daily per-type sums: running total (ROWS unbounded),
    // 7-row moving average, and a RANGE frame over a 7-day interval.
    // Daily sums are decimal (exact, partition-order-proof); the window
    // sums over them stay decimal until the final cast.
    "q27_frames" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
        .selectExpr(
          "event_type", "day",
          "round(cast(v as double), 6) AS day_sum",
          "round(cast(sum(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double), 6) AS run_sum",
          "round(cast(sum(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS double) / count(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS sma7",
          "round(cast(sum(v) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS double), 6) AS rng7")
        .orderBy(col("event_type"), col("day"))),

    // ------------------------------------------------------------------
    // Period-over-period growth (the reporting staple): monthly revenue
    // with month-over-month and year-over-year percent change. MoM lags
    // over the GLOBAL month sequence — unpartitioned but bounded by the
    // ≤#months monthly contraction (PlanGuard-allowlisted); YoY lags
    // within each calendar-month partition. Revenue is DECIMAL-exact;
    // each pct divides two exact decimals in double at the end, so the
    // NULL leading rows and every ratio match DuckDB bit-for-bit.
    "q197_period_growth" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val wSeq = Window.orderBy(col("yr"), col("mo"))
      val wYoy = Window.partitionBy(col("mo")).orderBy(col("yr"))
      monthly
        .withColumn("prev_m", lag(col("rev"), 1).over(wSeq))
        .withColumn("prev_y", lag(col("rev"), 1).over(wYoy))
        .select(col("yr"), col("mo"),
          round(col("rev").cast("double"), 2).as("revenue"),
          round((col("rev") - col("prev_m")).cast("double")
            / col("prev_m").cast("double") * 100, 6).as("mom_pct"),
          round((col("rev") - col("prev_y")).cast("double")
            / col("prev_y").cast("double") * 100, 6).as("yoy_pct"))
        .orderBy(col("yr"), col("mo"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q25_rank_topk" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk "
        + "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q26_analytic" ->
      ("SELECT event_id, user_id, ts, lag(value, 1) OVER w AS lag_v, lead(value, 1) OVER w AS lead_v, "
        + "first_value(ts) OVER w AS first_ts, last_value(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ts, "
        + "ntile(4) OVER w AS tile4, round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd "
        + "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id"),
    "q27_frames" ->
      ("SELECT event_type, day, round(CAST(v AS DOUBLE), 6) AS day_sum, "
        + "round(CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS run_sum, "
        + "round(CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / count(v) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS sma7, "
        + "round(CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS rng7 "
        + "FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, sum(CAST(value AS DECIMAL(18,2))) AS v FROM events GROUP BY 1, 2) "
        + "ORDER BY event_type, day"),
    "q197_period_growth" ->
      ("WITH m AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo, "
        + "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders GROUP BY 1, 2), "
        + "t AS (SELECT yr, mo, rev, lag(rev, 1) OVER (ORDER BY yr, mo) AS prev_m, "
        + "lag(rev, 1) OVER (PARTITION BY mo ORDER BY yr) AS prev_y FROM m) "
        + "SELECT yr, mo, round(CAST(rev AS DOUBLE), 2) AS revenue, "
        + "round(CAST(rev - prev_m AS DOUBLE) / CAST(prev_m AS DOUBLE) * 100, 6) AS mom_pct, "
        + "round(CAST(rev - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE) * 100, 6) AS yoy_pct "
        + "FROM t ORDER BY yr, mo"),
  )
}
