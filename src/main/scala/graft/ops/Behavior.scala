package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics: market-basket association rules, last-touch
  * revenue attribution, and a sweep-line concurrency profile — the
  * product-analytics trio that sits on top of the fact tables every
  * warehouse ships (SURVEY.md §2.15).
  *
  * Scale notes (100 TB north star):
  *  - q147's pair generation is a self-join co-partitioned on the order
  *    key; pairs per order are bounded by basket size squared (TPC-H
  *    baskets are ≤12 items), so the blow-up factor is a small constant,
  *    never n². Item counts and the 1-row total are broadcast.
  *  - q148 is one user-partitioned ordered window (ignore-nulls `last`
  *    over preceding rows) — the attribution lookback never leaves the
  *    user's partition, and the final rollup is a 4-row aggregate.
  *  - q149 contracts sessions to per-(day, minute) boundary deltas
  *    BEFORE any window: the running-concurrency cumsum runs on ≤1441
  *    rows per day partition regardless of how many billion sessions a
  *    day holds — the sweep-line shape that survives any scale.
  */
object Behavior extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Market-basket association rules over order baskets: for every
    // co-occurring part pair (ante < cons), support / confidence / lift
    // against the single-item frequencies. pair_cnt >= 2, top-50 by
    // lift via orderBy+limit (TakeOrderedAndProject — distributed
    // heaps, no global window). Lift is computed in one DOUBLE
    // expression identical in both engines, then rounded.
    "q147_assoc_rules" -> ((s, dir) => {
      val baskets = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .distinct()
        .localCheckpoint() // item counts + both sides of the pair join
      val itemCnt = baskets.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      val totals = baskets.agg(countDistinct(col("okey")).as("n_orders"))
      val pairs = baskets.as("a")
        .join(baskets.as("b"),
          col("a.okey") === col("b.okey") && col("a.item") < col("b.item"))
        .select(col("a.item").as("ante"), col("b.item").as("cons"))
        .groupBy(col("ante"), col("cons"))
        .agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= 2)
      pairs
        .join(broadcast(itemCnt.select(col("item").as("ante"), col("cnt").as("cnt_a"))), "ante")
        .join(broadcast(itemCnt.select(col("item").as("cons"), col("cnt").as("cnt_b"))), "cons")
        .crossJoin(broadcast(totals))
        .select(col("ante"), col("cons"), col("pair_cnt"),
          round(col("pair_cnt") / col("n_orders"), 6).as("support"),
          round(col("pair_cnt") / col("cnt_a"), 6).as("confidence"),
          round((col("pair_cnt") * col("n_orders")) / (col("cnt_a") * col("cnt_b")), 6).as("lift"))
        .orderBy(col("lift").desc, col("ante"), col("cons"))
        .limit(50)
    }),

    // ------------------------------------------------------------------
    // Last-touch revenue attribution: each purchase credits its value
    // to the user's most recent click/view within a 3-day lookback,
    // else to 'none'. The touch is found with an ignore-nulls `last`
    // over the user-partitioned event sequence (rows preceding the
    // purchase in (ts, event_id) order); the lookback cutoff is applied
    // AFTER selection, matching "last touch, if fresh enough"
    // semantics. Purchase values are quantized to DECIMAL(18,4) before
    // the sum so merge order can never move a ULP.
    "q148_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .filter(col("event_type").isin("purchase", "click", "view"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touched = ev
        .withColumn("lt", last(
          when(col("event_type").isin("click", "view"),
            struct(col("ts").as("tts"), col("event_id").as("tid"),
              col("event_type").as("ttype"))),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("touch",
          when(col("lt").isNotNull &&
            col("lt.tts") >= col("ts") - expr("INTERVAL 3 DAY"),
            col("lt.ttype")).otherwise(lit("none")))
      touched.groupBy(col("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast("decimal(18,4)")).as("rev_x"))
        .select(col("touch"), col("n_purchases"),
          round(col("rev_x").cast("double"), 4).as("revenue"))
        .orderBy(col("touch"))
    }),

    // ------------------------------------------------------------------
    // Concurrency profile (sweep-line): sessions = per-(user, day)
    // [first, last] event minute; each contributes +1 at its start
    // minute and -1 one minute after its end. Deltas contract to
    // per-(day, minute) BEFORE the running sum, so the cumsum window
    // runs on at most 1441 rows per day partition no matter the session
    // count. Output: per day, session count, peak concurrency, and the
    // earliest minute that reaches the peak.
    "q149_concurrency" -> ((s, dir) => {
      val sess = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(date_trunc("minute", min(col("ts"))).as("smin"),
          date_trunc("minute", max(col("ts"))).as("emin"))
        .localCheckpoint() // boundary deltas + per-day session counts
      val deltas = sess.select(col("day"), col("smin").as("m"), lit(1L).as("d"))
        .unionAll(sess.select(col("day"),
          (col("emin") + expr("INTERVAL 1 MINUTE")).as("m"), lit(-1L).as("d")))
        .groupBy(col("day"), col("m")).agg(sum(col("d")).as("delta"))
      val conc = deltas.withColumn("c",
        sum(col("delta")).over(Window.partitionBy(col("day"))
          .orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val peak = conc.withColumn("rn",
          row_number().over(Window.partitionBy(col("day"))
            .orderBy(col("c").desc, col("m"))))
        .filter(col("rn") === 1)
        .select(col("day"), col("c").as("peak_conc"), col("m").as("peak_minute"))
      val nSess = sess.groupBy(col("day")).agg(count(lit(1)).as("n_sessions"))
      nSess.join(peak, "day")
        .select(col("day"), col("n_sessions"), col("peak_conc"), col("peak_minute"))
        .orderBy(col("day"))
    }),

    // ------------------------------------------------------------------
    // Time-to-convert: per user, first view → first SUBSEQUENT
    // purchase; the latency distribution (exact percentiles rounded
    // 6dp, the q162 convention; mean from a DECIMAL-quantized sum) is
    // what an experimenter reads before setting attribution windows.
    // Two user-keyed contractions + one user-keyed join; second
    // differences are integer seconds (identical truncation semantics:
    // unix_seconds diff ≡ DuckDB date_diff('second')).
    "q188_time_to_convert" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
        .localCheckpoint() // consumed twice: join + viewer count
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
        .join(v, "user_id").filter(col("pts") >= col("vts"))
        .groupBy(col("user_id"))
        .agg(min(col("pts")).as("pts"), min(col("vts")).as("vts"))
        .withColumn("delta_s", expr(
          "unix_seconds(cast(pts as timestamp)) - unix_seconds(cast(vts as timestamp))"))
      val a = conv.agg(count(lit(1)).as("n_converted"),
        expr("round(percentile(delta_s, 0.25), 6)").as("p25_s"),
        expr("round(percentile(delta_s, 0.5), 6)").as("p50_s"),
        expr("round(percentile(delta_s, 0.75), 6)").as("p75_s"),
        sum(expr("cast(delta_s as decimal(18,2))")).as("sum_s"))
      val nv = v.agg(count(lit(1)).as("n_viewed"))
      a.crossJoin(broadcast(nv))
        .select(col("n_viewed"), col("n_converted"),
          col("p25_s"), col("p50_s"), col("p75_s"),
          round(expr("cast(sum_s as double) / n_converted"), 6).as("mean_s"))
    }),

    // ------------------------------------------------------------------
    // Burstiness: top-20 users by the Fano factor (variance-to-mean
    // dispersion index) of their daily event counts — Fano ≫ 1 flags
    // bot-like bursts, ≈ 1 is Poisson-regular. Two user-keyed
    // partial-agg contractions; the sample variance comes from EXACT
    // integer Σc and Σc² (never a distributed var_samp whose merge
    // order could wobble), doubles only in the final closed form;
    // orderBy+limit compiles to TakeOrderedAndProject.
    "q230_burstiness" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n_events"),
          sum(col("c") * col("c")).as("sc2"))
        .filter(col("n_days") >= 2)
        .select(col("user_id"), col("n_days"), col("n_events"),
          round(expr("n_events / cast(n_days as double)"), 6).as("mean_daily"),
          round(expr(
            "((sc2 - cast(n_events as double) * n_events / n_days) / (n_days - 1)) / " +
              "(n_events / cast(n_days as double))"), 6).as("fano"))
        .orderBy(col("fano").desc, col("user_id")).limit(20)),

    // ------------------------------------------------------------------
    // Inter-arrival time profile: the distribution of consecutive
    // same-user event gaps (quartiles + mean + max, seconds) — the
    // number that sizes session timeouts (q46/q110's 30-minute gap) and
    // state-store TTLs from data instead of folklore. One
    // user-partitioned lag window (never global); gaps are integer
    // seconds (identical truncation both engines, q188's recipe), mean
    // from a DECIMAL-quantized sum, exact percentiles rounded 6dp.
    "q234_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("pts", lag(col("ts"), 1).over(w))
        .filter(col("pts").isNotNull)
        .withColumn("gap_s", expr(
          "unix_seconds(cast(ts as timestamp)) - unix_seconds(cast(pts as timestamp))"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("round(percentile(gap_s, 0.25), 6)").as("p25_s"),
          expr("round(percentile(gap_s, 0.5), 6)").as("p50_s"),
          expr("round(percentile(gap_s, 0.75), 6)").as("p75_s"),
          sum(expr("cast(gap_s as decimal(18,2))")).as("sum_s"),
          max(col("gap_s")).as("max_s"))
        .select(col("n_gaps"), col("p25_s"), col("p50_s"), col("p75_s"),
          round(expr("cast(sum_s as double) / n_gaps"), 6).as("mean_s"),
          col("max_s"))
    }),

    // ------------------------------------------------------------------
    // Shapley channel attribution — the order-free, coalition-fair
    // credit split q148's last-touch heuristic approximates. Channels =
    // {view, click, signup} (purchase is the conversion); each user
    // contracts to a 3-bit touched-set mask + converted flag (ONE
    // user-keyed shuffle to ≤8 coalition cells). v(S) = cumulative
    // conversion rate reachable with channel set S (Σ_{T⊆S} conv_T /
    // N, an 8×8 bitmask-subset join over bounded cells); φᵢ is the
    // exact 3-player Shapley sum with weights |S|!(2−|S|)!/3!. Terms
    // DECIMAL-quantized; efficiency (Σφ = v_full − v_base) holds by
    // construction and the spec asserts it.
    "q266_shapley_attribution" -> ((s, dir) => {
      val cells = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "view", 1).otherwise(0)).as("bv"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("bc"),
          max(when(col("event_type") === "signup", 1).otherwise(0)).as("bs"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        .selectExpr("bv * 1 + bc * 2 + bs * 4 AS mask", "conv")
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("u"), sum(col("conv")).as("c"))
        .localCheckpoint() // v-table subset join + the user total
      val tot = cells.agg(sum(col("u")).as("n_users"))
      val sframe = s.range(8).select(col("id").cast("int").as("ss"))
      val vtab = sframe.join(broadcast(cells), expr("(mask & ss) = mask"), "left")
        .groupBy(col("ss")).agg(sum(coalesce(col("c"), lit(0L))).as("cc"))
        .crossJoin(broadcast(tot))
        .selectExpr("ss", "cast(cc as double) / n_users AS v")
        .localCheckpoint() // joined twice per channel term + the ends
      val channels = s.range(1).select(explode(expr(
        "array(named_struct('bit', 1, 'channel', 'view'), "
          + "named_struct('bit', 2, 'channel', 'click'), "
          + "named_struct('bit', 4, 'channel', 'signup'))")).as("ch"))
        .select(col("ch.bit").as("bit"), col("ch.channel").as("channel"))
      val terms = channels
        .join(broadcast(sframe), expr("(ss & bit) = 0"))
        .join(broadcast(vtab.select(col("ss").as("s1"), col("v").as("vs"))),
          col("ss") === col("s1"))
        .join(broadcast(vtab.select(col("ss").as("s2"), col("v").as("vsi"))),
          expr("(ss | bit) = s2"))
        .withColumn("w", expr(
          "CASE bit_count(ss) WHEN 0 THEN 2.0/6.0 WHEN 1 THEN 1.0/6.0 ELSE 2.0/6.0 END"))
        .groupBy(col("channel"))
        .agg(sum(expr("cast(w * (vsi - vs) as decimal(28,12))")).as("phiq"))
      val ends = vtab.agg(
        sum(when(col("ss") === 7, col("v"))).as("v_full"),
        sum(when(col("ss") === 0, col("v"))).as("v_base"))
      terms.crossJoin(broadcast(ends))
        .selectExpr("channel", "round(cast(phiq as double), 6) AS phi",
          // nullif: a coalition structure where conversion is channel-
          // independent makes v_full == v_base (no credit to split) —
          // share is NULL there, never an ANSI divide-by-zero throw
          // (surfaced by the generated-structure ScalaCheck property)
          "round(cast(phiq as double) / nullif(v_full - v_base, 0.0d), 6) AS share",
          "round(v_full, 6) AS v_full", "round(v_base, 6) AS v_base")
        .orderBy(col("channel"))
    }),

    // ------------------------------------------------------------------
    // Exponential time-decay activity scoring (7-day half-life) — the
    // feature-store recency weighting every ranking/CRM system
    // computes (q168's RFM buckets recency; decay makes it continuous):
    // score(u) = Σ value·2^(−age/7) with age = days before the
    // corpus's LAST day (data-anchored, so the query is deterministic
    // and re-runnable). The decay factor is exp(−ln2·age/7) — exp/ln
    // only, cross-engine-identical doubles; per-event terms quantize
    // DECIMAL(28,12) before the per-user sum; top-15 via TakeOrdered.
    // ONE fact pass + a broadcast 1-row anchor.
    "q352_decay_score" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      val anchor = ev.agg(max(col("ts").cast("date")).as("d0"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age", datediff(col("d0"), col("ts").cast("date")))
        .withColumn("w", expr(
          "cast(cast(value as decimal(18,2)) as double) * exp(-ln(2.0d) * age / 7.0d)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("cast(w as decimal(28,12))")).as("wq"),
          min(col("age")).as("days_since_last"))
        .select(col("user_id"), col("n_events"), col("days_since_last"),
          round(expr("cast(wq as double)"), 6).as("decayed_score"))
        .orderBy(col("decayed_score").desc, col("user_id"))
        .limit(15)
    }),
  )

  def oracles: Map[String, String] = Map(
    "q352_decay_score" ->
      ("WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS d0 FROM events WHERE value IS NOT NULL), "
        + "w AS (SELECT user_id, date_diff('day', CAST(ts AS DATE), d0) AS age, "
        + "CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) * exp(-ln(2.0) * date_diff('day', CAST(ts AS DATE), d0) / 7.0) AS wv "
        + "FROM events CROSS JOIN anchor WHERE value IS NOT NULL), "
        + "per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        + "CAST(sum(CAST(wv AS DECIMAL(28,12))) AS DOUBLE) AS wq, "
        + "CAST(min(age) AS INT) AS days_since_last FROM w GROUP BY user_id) "
        + "SELECT user_id, n_events, days_since_last, round(wq, 6) AS decayed_score FROM per "
        + "ORDER BY decayed_score DESC, user_id LIMIT 15"),
    "q266_shapley_attribution" ->
      ("WITH per AS (SELECT user_id, max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS bv, "
        + "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS bc, "
        + "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS bs, "
        + "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv FROM events GROUP BY user_id), "
        + "cells AS (SELECT bv * 1 + bc * 2 + bs * 4 AS mask, CAST(count(*) AS BIGINT) AS u, CAST(sum(conv) AS BIGINT) AS c FROM per GROUP BY 1), "
        + "tot AS (SELECT CAST(sum(u) AS BIGINT) AS n_users FROM cells), "
        + "sframe AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS ss), "
        + "vtab AS MATERIALIZED (SELECT ss, CAST(sum(coalesce(c, 0)) AS DOUBLE) / any_value(n_users) AS v "
        + "FROM sframe LEFT JOIN cells ON (mask & ss) = mask CROSS JOIN tot GROUP BY ss), "
        + "ch AS (SELECT * FROM (VALUES (1, 'view'), (2, 'click'), (4, 'signup')) AS t(bit, channel)), "
        + "terms AS (SELECT channel, sum(CAST(w * (vsi - vs) AS DECIMAL(28,12))) AS phiq FROM ("
        + "SELECT ch.channel, CASE bit_count(s.ss) WHEN 0 THEN 2.0/6.0 WHEN 1 THEN 1.0/6.0 ELSE 2.0/6.0 END AS w, "
        + "a.v AS vs, b.v AS vsi FROM ch, sframe s, vtab a, vtab b "
        + "WHERE a.ss = s.ss AND b.ss = (s.ss | ch.bit) AND (s.ss & ch.bit) = 0) GROUP BY channel), "
        + "ends AS (SELECT sum(CASE WHEN ss = 7 THEN v END) AS v_full, sum(CASE WHEN ss = 0 THEN v END) AS v_base FROM vtab) "
        + "SELECT channel, round(CAST(phiq AS DOUBLE), 6) AS phi, "
        + "round(CAST(phiq AS DOUBLE) / nullif(v_full - v_base, 0.0), 6) AS share, "
        + "round(v_full, 6) AS v_full, round(v_base, 6) AS v_base "
        + "FROM terms CROSS JOIN ends ORDER BY channel"),
    "q147_assoc_rules" ->
      ("WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem), "
        + "ic AS (SELECT item, count(*) AS cnt FROM b GROUP BY item), "
        + "tot AS (SELECT count(DISTINCT okey) AS n_orders FROM b), "
        + "p AS (SELECT a.item AS ante, c.item AS cons, count(*) AS pair_cnt "
        + "FROM b a JOIN b c ON a.okey = c.okey AND a.item < c.item GROUP BY 1, 2 HAVING count(*) >= 2) "
        + "SELECT ante, cons, pair_cnt, "
        + "round(CAST(pair_cnt AS DOUBLE) / n_orders, 6) AS support, "
        + "round(CAST(pair_cnt AS DOUBLE) / ia.cnt, 6) AS confidence, "
        + "round((CAST(pair_cnt AS DOUBLE) * n_orders) / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 6) AS lift "
        + "FROM p JOIN ic ia ON p.ante = ia.item JOIN ic ib ON p.cons = ib.item CROSS JOIN tot "
        + "ORDER BY lift DESC, ante, cons LIMIT 50"),
    "q148_attribution" ->
      ("WITH ev AS (SELECT event_id, ts, user_id, event_type, value FROM events "
        + "WHERE event_type IN ('purchase', 'click', 'view')), "
        + "p AS (SELECT event_id, ts, user_id, value FROM ev WHERE event_type = 'purchase'), "
        + "t AS (SELECT event_id, ts, user_id, event_type FROM ev WHERE event_type IN ('click', 'view')), "
        + "lt AS (SELECT p.event_id AS pid, p.ts AS pts, p.value, t.ts AS tts, t.event_type AS ttype, "
        + "row_number() OVER (PARTITION BY p.event_id ORDER BY t.ts DESC, t.event_id DESC) AS rn "
        + "FROM p JOIN t ON p.user_id = t.user_id "
        + "AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))), "
        + "att AS (SELECT p.event_id, p.value, "
        + "CASE WHEN lt.pid IS NOT NULL AND lt.tts >= p.ts - INTERVAL 3 DAY THEN lt.ttype ELSE 'none' END AS touch "
        + "FROM p LEFT JOIN (SELECT * FROM lt WHERE rn = 1) lt ON p.event_id = lt.pid) "
        + "SELECT touch, count(*) AS n_purchases, "
        + "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue "
        + "FROM att GROUP BY touch ORDER BY touch"),
    "q149_concurrency" ->
      ("WITH sess AS (SELECT user_id, CAST(ts AS DATE) AS day, "
        + "date_trunc('minute', min(ts)) AS smin, date_trunc('minute', max(ts)) AS emin "
        + "FROM events GROUP BY 1, 2), "
        + "deltas AS (SELECT day, m, CAST(sum(d) AS BIGINT) AS delta FROM ("
        + "SELECT day, smin AS m, 1 AS d FROM sess "
        + "UNION ALL SELECT day, emin + INTERVAL 1 MINUTE AS m, -1 AS d FROM sess) GROUP BY 1, 2), "
        + "conc AS (SELECT day, m, CAST(sum(delta) OVER (PARTITION BY day ORDER BY m "
        + "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c FROM deltas), "
        + "peak AS (SELECT day, c AS peak_conc, m AS peak_minute FROM ("
        + "SELECT day, c, m, row_number() OVER (PARTITION BY day ORDER BY c DESC, m) AS rn FROM conc) WHERE rn = 1), "
        + "ns AS (SELECT day, count(*) AS n_sessions FROM sess GROUP BY day) "
        + "SELECT ns.day, n_sessions, peak_conc, peak_minute FROM ns JOIN peak ON ns.day = peak.day ORDER BY ns.day"),
    "q188_time_to_convert" ->
      ("WITH v AS (SELECT user_id, min(ts) AS vts FROM events WHERE event_type = 'view' GROUP BY 1), "
        + "pc AS (SELECT e.user_id, min(e.ts) AS pts, min(vts) AS vts FROM events e JOIN v ON e.user_id = v.user_id "
        + "WHERE e.event_type = 'purchase' AND e.ts >= v.vts GROUP BY 1), "
        + "d AS (SELECT date_diff('second', vts, pts) AS delta_s FROM pc), "
        + "a AS (SELECT count(*) AS n_converted, round(quantile_cont(delta_s, 0.25), 6) AS p25_s, "
        + "round(quantile_cont(delta_s, 0.5), 6) AS p50_s, round(quantile_cont(delta_s, 0.75), 6) AS p75_s, "
        + "sum(CAST(delta_s AS DECIMAL(18,2))) AS sum_s FROM d), "
        + "nv AS (SELECT count(*) AS n_viewed FROM v) "
        + "SELECT n_viewed, n_converted, p25_s, p50_s, p75_s, "
        + "round(CAST(sum_s AS DOUBLE) / n_converted, 6) AS mean_s FROM a CROSS JOIN nv"),
    "q230_burstiness" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1, 2), "
        + "pu AS (SELECT user_id, count(*) AS n_days, CAST(sum(c) AS BIGINT) AS n_events, "
        + "CAST(sum(c * c) AS BIGINT) AS sc2 FROM daily GROUP BY user_id HAVING count(*) >= 2) "
        + "SELECT user_id, n_days, n_events, "
        + "round(n_events / CAST(n_days AS DOUBLE), 6) AS mean_daily, "
        + "round(((sc2 - CAST(n_events AS DOUBLE) * n_events / n_days) / (n_days - 1)) / "
        + "(n_events / CAST(n_days AS DOUBLE)), 6) AS fano "
        + "FROM pu ORDER BY fano DESC, user_id LIMIT 20"),
    "q234_interarrival" ->
      ("WITH g AS (SELECT user_id, ts, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM events), "
        + "d AS (SELECT date_diff('second', pts, ts) AS gap_s FROM g WHERE pts IS NOT NULL) "
        + "SELECT count(*) AS n_gaps, round(quantile_cont(gap_s, 0.25), 6) AS p25_s, "
        + "round(quantile_cont(gap_s, 0.5), 6) AS p50_s, round(quantile_cont(gap_s, 0.75), 6) AS p75_s, "
        + "round(CAST(sum(CAST(gap_s AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean_s, "
        + "CAST(max(gap_s) AS BIGINT) AS max_s FROM d"),
  )
}
