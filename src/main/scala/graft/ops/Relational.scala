package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1–§2.4 + §2.7: scans, filters, joins, aggregations,
  * sort/limit, set ops.
  *
  * Determinism contract (SURVEY.md §4.3): every query ends in a total
  * ORDER BY; money sums go through decimal(18,2) so the distributed sum is
  * exact and matches DuckDB's single-threaded sum bit-for-bit; every float
  * output is a DOUBLE rounded to 6 dp on both sides.
  *
  * Scale notes: all dimension joins (region/nation/customer/supplier) are
  * broadcast-able at any SF and AQE picks broadcast automatically; the
  * fact-fact self-join (q08) carries an equi key (user_id) so it plans as
  * a shuffled sort-merge join, never a cartesian.
  */
object Relational extends QueryPack {

  /** Exact distributed money sum: decimal in, double out. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dec(c: Column): Column  = c.cast("decimal(18,2)")

  /** q240's raw frame: per-event-type Datasketches HLL sketches (lgK=12)
    * with exact counts, plus an 'ALL' row whose estimate comes from
    * hll_union_agg over the per-type sketches — a true sketch MERGE,
    * not a rescan. Kept separate so HllMergeSpec can assert the
    * estimates and the merge itself; the query surface reduces it to
    * the cross-engine-safe (exact, bound-bool) readout. */
  private[graft] def hllMergeRaw(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val per = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .localCheckpoint() // consumed twice: per-type rows + the union row
    val perRows = per.select(col("event_type"), col("exact_users"),
      expr("cast(hll_sketch_estimate(sk) as double)").as("est"))
    val allExact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    val allRow = per
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as double)").as("est"))
      .crossJoin(broadcast(allExact))
      .select(lit("ALL").as("event_type"), col("exact_users"), col("est"))
    perRows.union(allRow)
  }

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    "q01_scan_project" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // ------------------------------------------------------------------
    "q02_scan_events_ns" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
        .limit(200)),

    // ------------------------------------------------------------------
    "q03_filter_pred" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("O", "P")
          && col("o_totalprice").between(50000, 200000)
          && col("o_orderpriority").like("%URGENT")
          && col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_custkey").isNotNull)
        .orderBy(col("o_orderkey"))),

    // ------------------------------------------------------------------
    "q04_case_expr" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy(when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("c_acctbal")) / count(lit(1)), 6).as("avg_bal"))
        .orderBy(col("bucket"))),

    // ------------------------------------------------------------------
    "q05_join_star" -> ((s, dir) => {
      val r = Tables.region(s, dir); val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      r.join(n, n("n_regionkey") === r("r_regionkey"))
        .join(c, c("c_nationkey") === n("n_nationkey"))
        .join(o, o("o_custkey") === c("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(dsum(col("o_totalprice")), 6).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ------------------------------------------------------------------
    // Left outer (customer→orders, count survives as 0) UNION full outer
    // (nation⟗supplier) — both outer flavors + null handling in one result.
    "q06_join_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir);   val su = Tables.supplier(s, dir)
      val left = c.join(o, o("o_custkey") === c("c_custkey"), "left")
        .groupBy(c("c_custkey").as("key"))
        .agg(count(o("o_orderkey")).as("matches"))
        .select(lit("cust_orders").as("kind"), col("key"), col("matches"))
      val full = n.join(su, su("s_nationkey") === n("n_nationkey"), "full")
        .groupBy(coalesce(n("n_nationkey"), lit(-1)).as("key"))
        .agg(count(su("s_suppkey")).as("matches"))
        .select(lit("nation_supp").as("kind"), col("key").cast("long"), col("matches"))
      left.unionAll(full).orderBy(col("kind"), col("key"))
    }),

    // ------------------------------------------------------------------
    "q07_join_semi_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(lit("has_orders").as("tag"), col("c_custkey"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(lit("no_orders").as("tag"), col("c_custkey"))
      semi.unionAll(anti).orderBy(col("tag"), col("c_custkey"))
    }),

    // ------------------------------------------------------------------
    // Theta/range self-join: same-user event pairs ≤10 min apart.
    // Scale design (the standard distributed range-join rewrite): joining
    // on user_id alone pairs EVERY two events of a user before the time
    // residual filters them — O(events_per_user²), 17.7 s at sf0.1 and
    // quadratic blow-up beyond. Instead each row gets a 10-minute time
    // bucket; the probe side fans out to (bucket, bucket+1), the join key
    // becomes (user_id, bucket) — any qualifying pair lands in exactly
    // one of the two probe buckets, so results are identical while the
    // join only ever pairs events ≤20 min apart. Bounded per key ⇒ holds
    // at 100 TB.
    "q08_join_theta_range" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("bkt", expr("unix_micros(cast(ts as timestamp)) div 600000000"))
      val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"),
          explode(array(col("bkt"), col("bkt") + 1)).as("probe_bkt"))
      val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"), col("bkt").as("b_bkt"))
      a.join(b, col("user_id") === col("b_user")
          && col("probe_bkt") === col("b_bkt")
          && col("b_ts") > col("a_ts")
          && col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("a_id"), col("b_id"), col("user_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ------------------------------------------------------------------
    // As-of join via the single-shuffle window pattern: latest purchase
    // at-or-before each event per user. Identical windowed SQL on the
    // DuckDB side (ties broken by event_id → fully deterministic).
    "q09_join_asof" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_purchase_ts",
          last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
        .orderBy(col("event_id"))
    }),

    // ------------------------------------------------------------------
    "q10_join_broadcast" -> ((s, dir) => {
      val n = Tables.nation(s, dir); val c = Tables.customer(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(dsum(col("c_acctbal")), 6).as("total_bal"))
        .orderBy(col("n_name"))
    }),

    // ------------------------------------------------------------------
    // TPC-H Q1 shape: partial aggregation map-side, exact decimal sums.
    "q11_agg_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(dsum(col("l_extendedprice")), 6).as("sum_base"),
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double"), 6).as("sum_disc"),
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax")))).cast("double"), 6).as("sum_charge"),
          round(sum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(dsum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // ------------------------------------------------------------------
    "q12_agg_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .agg(
          countDistinct(col("l_orderkey")).as("d_orders"),
          countDistinct(col("l_partkey")).as("d_parts"),
          countDistinct(col("l_suppkey")).as("d_supps"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("d_flag_status"))),

    // ------------------------------------------------------------------
    // HLL sketch, cross-engine-gated: sketch INTERNALS differ per
    // engine, so the raw estimate can never hash-match a DuckDB run —
    // but `|est − exact| ≤ max(5, 15%·exact)` CAN (default rsd 0.05,
    // 3σ ≈ 15%): Spark computes the bool from its own estimate, the
    // oracle emits literal TRUE, and the row hash-matches iff the HLL
    // bound actually held. Exact + approx distinct ride the same
    // partial-agg shuffle (both states are mergeable).
    "q13_agg_hll" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("est"),
          countDistinct(col("user_id")).as("d_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_events"), col("d_users"),
          (abs(col("est") - col("d_users")) <=
            greatest(lit(5.0), lit(0.15) * col("d_users"))).as("hll_ok"))
        .orderBy(col("event_type"))),

    // ------------------------------------------------------------------
    // MERGEABLE HLL sketches (Datasketches hll_sketch_agg / hll_union_agg
    // — the upgrade of q13's opaque approx_count_distinct): per-group
    // sketches materialize as BINARY values that UNION without rescanning
    // — at 100 TB this is THE distinct-count pattern (per-partition/
    // per-day sketches persisted once, merged on demand). The 'ALL' row
    // IS a sketch merge, never a second scan. Oracle-gated like
    // q13/q208: exact value + a bound bool both engines agree on
    // (lgK=12 ⇒ RSE ≈ 1.6%; 5σ + small-count slack); the raw estimates
    // live behind [[hllMergeRaw]] for the spec's mergeability assertion.
    "q240_hll_merge" -> ((s, dir) =>
      hllMergeRaw(s, dir)
        .select(col("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            greatest(lit(3.0), lit(0.09) * col("exact_users"))).as("hll_ok"))
        .orderBy(col("event_type"))),

    // ------------------------------------------------------------------
    // HLL set-INTERSECTION estimates via inclusion–exclusion — the
    // audience-overlap question (q240 merges sketches for the union;
    // real dashboards need "how many users did BOTH?"): |A∩B| ≈
    // est(A) + est(B) − est(A∪B), three Datasketches HLLs per pair,
    // union via the pairwise hll_union. The POINT is the error
    // profile: an intersection estimate differences two large
    // numbers, so its relative error is amplified by |A∪B|/|A∩B| —
    // the accuracy gate scales with the UNION (q13/q240's
    // within-bound-bool oracle discipline; the oracle pins exact
    // values + TRUE). Exact sides come from ONE per-user flag
    // contraction; sketches from ONE per-type contraction.
    "q348_hll_intersection" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
      val per = ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
        .localCheckpoint() // both sides of the pair self-join
      val exact = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("fv"),
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("fc"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("fp"))
        .agg(sum(col("fv")).as("nv"), sum(col("fc")).as("nc"), sum(col("fp")).as("np"),
          sum(expr("fv * fc")).as("ivc"), sum(expr("fv * fp")).as("ivp"),
          sum(expr("fc * fp")).as("icp"),
          sum(expr("least(fv + fc, 1L)")).as("uvc"),
          sum(expr("least(fv + fp, 1L)")).as("uvp"),
          sum(expr("least(fc + fp, 1L)")).as("ucp"))
      per.select(col("event_type").as("ta"), col("sk").as("ska"))
        .join(per.select(col("event_type").as("tb"), col("sk").as("skb")),
          expr("(ta = 'view' AND tb = 'click') OR (ta = 'view' AND tb = 'purchase') " +
            "OR (ta = 'click' AND tb = 'purchase')"))
        .withColumn("est_i", expr(
          "cast(hll_sketch_estimate(ska) as double) + cast(hll_sketch_estimate(skb) as double) " +
            "- cast(hll_sketch_estimate(hll_union(ska, skb)) as double)"))
        .crossJoin(broadcast(exact))
        .withColumn("exact_a", expr("CASE ta WHEN 'view' THEN nv WHEN 'click' THEN nc ELSE np END"))
        .withColumn("exact_b", expr("CASE tb WHEN 'click' THEN nc ELSE np END"))
        .withColumn("exact_i", expr(
          "CASE WHEN ta = 'view' AND tb = 'click' THEN ivc WHEN ta = 'view' AND tb = 'purchase' THEN ivp ELSE icp END"))
        .withColumn("exact_u", expr(
          "CASE WHEN ta = 'view' AND tb = 'click' THEN uvc WHEN ta = 'view' AND tb = 'purchase' THEN uvp ELSE ucp END"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("exact_a"), col("exact_b"), col("exact_u").as("exact_union"),
          col("exact_i").as("exact_inter"),
          (abs(col("est_i") - col("exact_i")) <=
            greatest(lit(6.0), lit(0.1) * col("exact_u"))).as("hll_inter_ok"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // ------------------------------------------------------------------
    "q14_rollup_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("cnt"),
          round(dsum(col("l_extendedprice")), 6).as("revenue"))
        .orderBy(col("g_rf"), col("g_ls"),
          asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // ------------------------------------------------------------------
    // Pivot with a FIXED value list (no extra distinct-scan job, stable
    // column order); nulls for absent cells filled to 0 to match the
    // FILTER-count oracle.
    "q15_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------------------
    // Plans as TakeOrderedAndProject: no global sort, per-partition top-k
    // then merge on the driver — the right plan at 100 TB too.
    "q28_sort_limit" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    // ------------------------------------------------------------------
    "q29_setops" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("k"))
      val both = c.intersect(su).select(lit("both").as("tag"), col("k"))
      val custOnly = c.except(su).select(lit("cust_only").as("tag"), col("k"))
      val all = c.unionAll(su).groupBy().agg(count(lit(1)).as("k"))
        .select(lit("union_all_cnt").as("tag"), col("k").cast("int"))
      both.unionAll(custOnly).unionAll(all).orderBy(col("tag"), col("k"))
    }),

    // ------------------------------------------------------------------
    // BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL,
    // SQL:1999 multisets) — the half of the set-op surface q29's
    // distinct-semantics intersect/except can't express: multiplicity
    // MATTERS (intersect-all keeps min(count_L, count_R) copies per
    // value, except-all subtracts counts clamped at 0) — the
    // reconciliation shape for "how many of my rows survive in the
    // other table, counting duplicates". Spark plans both as
    // aggregate+join (no row explosion); the readout contracts each
    // result to (value, multiplicity) so the hash pins the bag
    // algebra, not an arbitrary row order.
    "q355_setops_bag" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("k"))
      val ia = c.intersectAll(su).groupBy(col("k")).agg(count(lit(1)).as("mult"))
        .select(lit("intersect_all").as("tag"), col("k"), col("mult"))
      val ea = c.exceptAll(su).groupBy(col("k")).agg(count(lit(1)).as("mult"))
        .select(lit("except_all").as("tag"), col("k"), col("mult"))
      ia.unionByName(ea).orderBy(col("tag"), col("k"))
    }),

    // ------------------------------------------------------------------
    // Three-valued-logic semantics surface — the NULL traps every SQL
    // engine must agree on and every migration audit checks: (a)
    // `x = NULL` is UNKNOWN, never true; (b) NULL-SAFE equality (<=> /
    // IS NOT DISTINCT FROM) does match NULLs; (c) the NOT IN trap — a
    // single NULL in the IN-list makes NOT IN return ZERO rows (every
    // comparison is at best UNKNOWN), while the equivalent NOT EXISTS
    // correlates row-by-row and returns the real complement (a NULL is
    // FORCED into the probe so the trap fires at every SF); (d) a
    // null-safe join matches NULL keys to each other. One readout row
    // of the five counts plus the trap gap — the regression pin for
    // anyone refactoring NOT IN into a join.
    "q358_null_semantics" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"), expr("nullif(c_nationkey % 5, 4)").as("k5"))
        .createOrReplaceTempView("nulls_cv")
      s.sql("""
        WITH pv AS (SELECT DISTINCT k5 FROM (
                      SELECT k5 FROM nulls_cv WHERE c_custkey % 100 = 0
                      UNION ALL SELECT CAST(NULL AS INT)))
        SELECT
          (SELECT count(*) FROM nulls_cv WHERE k5 = NULL) AS n_eq_null,
          (SELECT count(*) FROM nulls_cv WHERE k5 <=> NULL) AS n_null_safe_null,
          (SELECT count(*) FROM nulls_cv WHERE k5 NOT IN (SELECT k5 FROM pv)) AS n_not_in,
          (SELECT count(*) FROM nulls_cv c
             WHERE NOT EXISTS (SELECT 1 FROM pv p WHERE p.k5 = c.k5)) AS n_not_exists,
          (SELECT count(*) FROM nulls_cv a JOIN pv b ON a.k5 <=> b.k5) AS n_null_safe_join,
          (SELECT count(*) FROM nulls_cv c
             WHERE NOT EXISTS (SELECT 1 FROM pv p WHERE p.k5 = c.k5))
            - (SELECT count(*) FROM nulls_cv WHERE k5 NOT IN (SELECT k5 FROM pv)) AS trap_gap""")
    }),

    // ------------------------------------------------------------------
    // The SQL-string entry point (spark.sql over a registered view) with
    // the canonical warehouse query: TPC-H Q1 pricing summary. Same
    // Catalyst plan as the DataFrame form — this declares the textual
    // SQL surface itself as driver-visible. Determinism: every sum runs
    // over exact decimals (2/4/6-dp casts make the per-row products
    // exact), averages derive from those sums, 6-dp rounds on output.
    "q83_sql_tpch_q1" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_qty,
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_base_price,
          round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price,
          round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
          round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
          count(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP_NTZ)
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    }),

    // ------------------------------------------------------------------
    // Ordered list aggregation (LISTAGG/string_agg): per nation, the
    // sorted distinct market segments as one string. collect_set is
    // partial-agg (bounded by |segments| per group); the explicit
    // array_sort makes the nondeterministic collection order canonical
    // — the only way a collected-list agg can ever be oracle-stable.
    "q109_stringagg" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("c_mktsegment")).as("n_segs"),
          array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segs"))
        .orderBy(col("n_name"))),

    // ------------------------------------------------------------------
    // Recursive CTE (Spark 4's WITH RECURSIVE / UnionLoop execution):
    // doubling chains k → 2k from seed keys 1..7, joined back to the
    // data to count which chain nodes exist as customers. Recursion
    // depth is bounded by the literal cap (≤17 levels); DuckDB runs
    // the IDENTICAL statement — the textual SQL surface is the
    // operator under test, like q83.
    "q118_recursive_cte" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""
        WITH RECURSIVE chain(k, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_v WHERE c_custkey BETWEEN 1 AND 7
          UNION ALL
          SELECT k * 2, root, depth + 1 FROM chain WHERE k * 2 <= 100000
        )
        SELECT root, count(*) AS chain_len, max(depth) AS max_depth,
          CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_existing
        FROM chain LEFT JOIN customer_v c ON chain.k = c.c_custkey
        GROUP BY root ORDER BY root""")
    }),

    // ------------------------------------------------------------------
    // Correlated LATERAL subquery (top-2 customers by balance per
    // nation): the SQL-standard per-row subtable form; Catalyst
    // rewrites the correlation into a join + per-group limit rather
    // than executing the subquery per row. DuckDB runs the identical
    // statement.
    "q119_lateral" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_v n,
        LATERAL (SELECT c_name, c_acctbal FROM customer_v c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    }),

    // ------------------------------------------------------------------
    // UNPIVOT / melt (wide measures → long rows) through the Dataset
    // unpivot API. The measures are exact-decimal sums cast to double
    // (magnitudes < 2^53 cents, so the cast is exact); the unpivot
    // itself is a per-row Expand — no shuffle beyond the agg's own.
    "q134_unpivot" -> ((s, dir) => {
      val agg = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)").as("sum_qty"),
          expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)").as("sum_price"),
          expr("cast(sum(cast(l_discount as decimal(18,2))) as double)").as("sum_disc"))
      agg.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")), "measure", "val")
        .select(col("l_returnflag"), col("measure"), round(col("val"), 2).as("val"))
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // ------------------------------------------------------------------
    // TPC-H Q3 shape (shipping-priority top-10) through the textual SQL
    // surface, adapted to the driver schema (no o_shippriority column).
    // Revenue rides per-row-exact DECIMAL(18,6) products, the top-10 is
    // ORDER BY exact decimal + LIMIT → TakeOrderedAndProject
    // (distributed heaps), and only the output is rounded.
    "q138_sql_tpch_q3" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        WITH r AS (
          SELECT l_orderkey, o_orderdate, o_orderpriority,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
          FROM customer_v JOIN orders_v ON c_custkey = o_custkey
                          JOIN lineitem_v ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < CAST('1998-07-01' AS TIMESTAMP_NTZ)
            AND l_shipdate > CAST('1998-07-01' AS TIMESTAMP_NTZ)
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
        )
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(CAST(rev AS DOUBLE), 2) AS revenue
        FROM r ORDER BY rev DESC, l_orderkey LIMIT 10""")
    }),

    // ------------------------------------------------------------------
    // Explicit GROUPING SETS (beyond q14's rollup/cube): the
    // (nation × priority), (nation), () lattice in one pass. Subtotal
    // rows are labeled via coalesce → 'ALL' so the output needs no
    // engine-specific grouping_id encoding. One Expand + one shuffle.
    "q139_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM orders_v JOIN customer_v ON o_custkey = c_custkey
                      JOIN nation_v ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
        ORDER BY nation, priority""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q5 shape (local-supplier volume): revenue per nation where
    // the customer and the line's supplier share the nation, restricted
    // to one region and one order year. Plan shape at scale: the two
    // fact tables (orders, lineitem) hash-join on the order key; every
    // dim (customer, supplier, nation, region) broadcasts; the
    // region/date filters reach the scans. Revenue is quantized to
    // DECIMAL(18,4) per row so the distributed sum is exact.
    "q153_sql_tpch_q5" -> ((s, dir) => {
      val jf = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      jf.groupBy(col("n_name"))
        .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(18,4))")).as("rev_x"))
        .select(col("n_name"), round(col("rev_x").cast("double"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ------------------------------------------------------------------
    // TPC-H Q6 shape (forecast revenue change): the pure
    // filter-selectivity + single-agg query — every predicate reaches
    // the parquet scan (date range + two numeric band predicates), the
    // aggregate is one map-side partial + 1-row merge, zero joins and
    // zero data-sized shuffles. The canonical "is your scan layer
    // doing its job" probe.
    "q157_sql_tpch_q6" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
               count(*) AS n_rows
        FROM lineitem_v
        WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP_NTZ)
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q18 shape (large-volume customers): groupBy-HAVING on the
    // fact table FIRST (the order-quantity contraction), then only the
    // qualifying order keys join customers/orders — the
    // aggregate-then-join ordering that keeps the join input tiny at
    // any scale. Top-10 via orderBy+limit.
    "q158_sql_tpch_q18" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ------------------------------------------------------------------
    // TPC-H Q14 shape (promo revenue share): one month of lineitem
    // joins `part` on partkey — lineitem is filtered BEFORE the join so
    // only the month's rows shuffle, and part (the smaller side at any
    // scale) broadcasts under AQE. Revenue terms are quantized to
    // DECIMAL(18,4) pre-sum; the percentage is a raw-ratio composite of
    // the two exact decimal sums (§4.3).
    "q163_sql_tpch_q14" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      s.sql("""
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS promo_revenue_pct,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS total_revenue,
               count(*) AS n_rows
        FROM lineitem_v JOIN part_v ON l_partkey = p_partkey
        WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND l_shipdate < CAST('1996-02-01' AS TIMESTAMP_NTZ)""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q19 shape (disjunctive brand/size/quantity predicates):
    // the classic OR-of-conjunctions that defeats naive pushdown. The
    // join key predicate stays conjunctive (partkey equi-join, part
    // broadcast); each disjunct mixes part-side and lineitem-side
    // columns so Catalyst evaluates it post-join while still pruning
    // both scans to the referenced columns only.
    "q164_sql_tpch_q19" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      s.sql("""
        SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
               count(*) AS n_rows
        FROM lineitem_v JOIN part_v ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q10 shape (returned-item reporting): half a year of orders
    // filtered BEFORE the joins, returned lineitems only, top-20
    // customers by lost revenue. Orders⋈lineitem is the one fact-fact
    // shuffle; customer and nation broadcast; the top-20 orders on the
    // ROUNDED revenue (both engines rank identical values) with
    // custkey tiebreak, via orderBy+limit → TakeOrderedAndProject.
    "q169_sql_tpch_q10" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT c_custkey, c_name, n_name,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
               count(*) AS n_items
        FROM customer_v
        JOIN orders_v ON c_custkey = o_custkey
        JOIN lineitem_v ON l_orderkey = o_orderkey
        JOIN nation_v ON c_nationkey = n_nationkey
        WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND o_orderdate < CAST('1996-07-01' AS TIMESTAMP_NTZ)
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    }),

    // ------------------------------------------------------------------
    // Correlated scalar subquery (the TPC-H Q2/Q17 idiom): cheapest
    // order within each priority class, expressed as a per-row
    // correlated min. Catalyst's RewriteCorrelatedScalarSubquery turns
    // this into ONE aggregate-then-join (the priority-keyed min table
    // joined back) — never a per-row re-scan; PlanGuard asserts the
    // plan contains a single join and no nested-loop.
    "q172_correlated_subq" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice = (SELECT min(o2.o_totalprice)
                              FROM orders_v o2
                              WHERE o2.o_orderpriority = o.o_orderpriority)
        ORDER BY o_orderpriority, o_orderkey""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q7 shape (volume shipping between nation groups): the
    // nation table joins TWICE in different roles (supplier side vs
    // customer side) — the self-joined-dimension pattern. Both nation
    // filters prune their broadcast before the fact-fact join; revenue
    // per (supp_nation, cust_nation, year) from exact decimal sums.
    "q176_sql_tpch_q7" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               round(CAST(sum(volume) AS DOUBLE), 4) AS revenue,
               count(*) AS n_rows
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
              FROM lineitem_v
              JOIN supplier_v ON s_suppkey = l_suppkey
              JOIN orders_v ON o_orderkey = l_orderkey
              JOIN customer_v ON c_custkey = o_custkey
              JOIN nation_v n1 ON s_nationkey = n1.n_nationkey
              JOIN nation_v n2 ON c_nationkey = n2.n_nationkey
              WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
                AND n2.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q22 shape (global sales opportunity): an UNCORRELATED
    // scalar subquery (the positive-balance average) combined with a
    // NOT EXISTS anti-join against recent orders — q172's correlated
    // rewrite plus the semi-join infrastructure in one statement.
    // The anti-join side is keyed on custkey and the average is a
    // broadcast 1-row scalar at any scale.
    "q177_sql_tpch_q22" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_cust,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
        FROM customer_v c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_v o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= CAST('1999-01-01' AS TIMESTAMP_NTZ))
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q4 shape (order-priority checking): correlated EXISTS over
    // the fact table — the SQL-surface twin of q07's DataFrame semi
    // join. Catalyst plans a LeftSemi on the order key; the quarter
    // filter and returnflag both push to their scans.
    "q183_sql_tpch_q4" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_v o
        WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND o_orderdate < CAST('1996-04-01' AS TIMESTAMP_NTZ)
          AND EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }),

    // ------------------------------------------------------------------
    // Join-strategy hint + FILTER-clause aggregates: SHUFFLE_HASH
    // forces a ShuffledHashJoin where stats would pick broadcast
    // (PlanGuard-asserted) — the knob a tuner reaches for when the
    // "small" side is too big to broadcast but cheap to hash. The
    // conditional aggregates use the ANSI FILTER clause (identical in
    // DuckDB, where the hint is an inert comment).
    "q185_join_hints" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT /*+ SHUFFLE_HASH(c) */ c_mktsegment,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 2) AS urgent_rev
        FROM orders_v o JOIN customer_v c ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q15 shape (top supplier): a CTE referenced twice — once as
    // the join input, once inside the scalar max subquery. The equality
    // is on the EXACT decimal revenue (never the rounded double), so
    // ties and the max row set are engine-independent.
    "q187_sql_tpch_q15" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
          FROM lineitem_v
          WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
            AND l_shipdate < CAST('1996-04-01' AS TIMESTAMP_NTZ)
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 4) AS total_revenue
        FROM supplier_v JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        ORDER BY s_suppkey""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q13 shape (customer order distribution): count over a LEFT
    // join — count(o_orderkey) skips the null-extended rows, so
    // order-less customers land in the c_count=0 bucket instead of
    // vanishing. The histogram-of-counts double aggregation.
    "q189_sql_tpch_q13" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        WITH c_orders AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer_v LEFT JOIN orders_v ON c_custkey = o_custkey
          GROUP BY c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED
    // scalar AGGREGATE subquery — each lineitem compares against the
    // 20%-of-average-quantity threshold of ITS OWN part. Catalyst
    // decorrelates it into a per-partkey aggregate joined back
    // (PlanGuard: no nested-loop/cartesian). The threshold is
    // engine-independent because l_quantity is integer-valued (1..50):
    // every per-part sum is an exact integer in IEEE double regardless
    // of partial-agg merge order, so avg — and 0.2*avg — is bit-equal
    // in Spark and DuckDB. Grouped by brand (the original returns one
    // global row; the group-by gives the same shape a richer surface).
    "q194_sql_tpch_q17" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      s.sql("""
        SELECT p_brand, count(*) AS n_small,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
        WHERE p.p_size < 11
          AND l.l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem_v li
                              WHERE li.l_partkey = p.p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q8 shape (national market share): the deepest dim chain in
    // the battery — lineitem⋈orders fact-fact, then customer→nation→
    // region on the demand side, supplier→nation on the supply side,
    // and part, ALL broadcast (PlanGuard: exactly one sort-merge join).
    // Share = NATION_7's volume over total per order year; both sums
    // DECIMAL(18,4)-exact, the ratio taken in double at the end.
    "q195_sql_tpch_q8" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      Tables.region(s, dir).createOrReplaceTempView("region_v")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      s.sql("""
        WITH all_sales AS (
          SELECT year(o.o_orderdate) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
                 ns.n_name AS supp_nation
          FROM lineitem_v l
          JOIN orders_v o ON o.o_orderkey = l.l_orderkey
          JOIN customer_v c ON c.c_custkey = o.o_custkey
          JOIN nation_v nc ON nc.n_nationkey = c.c_nationkey
          JOIN region_v r ON r.r_regionkey = nc.n_regionkey
          JOIN supplier_v s ON s.s_suppkey = l.l_suppkey
          JOIN nation_v ns ON ns.n_nationkey = s.s_nationkey
          JOIN part_v p ON p.p_partkey = l.l_partkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        FROM all_sales
        GROUP BY o_year
        ORDER BY o_year""")
    }),

    // ------------------------------------------------------------------
    // TPC-H Q21 shape (suppliers who kept orders waiting): BOTH
    // correlated quantifiers in one statement — EXISTS (another
    // supplier contributed to the order) plans LeftSemi, NOT EXISTS
    // (…and was ALSO late) plans LeftAnti, each with a non-equi
    // correlated term referencing the outer order date (the snapshot
    // has no commit/receipt dates, so "late" = shipped >180 days after
    // the order date). Top-10 by wait count with a name tiebreak.
    "q196_sql_tpch_q21" -> ((s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier_v s
        JOIN lineitem_v l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders_v o ON o.o_orderkey = l1.l_orderkey
        JOIN nation_v n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 180 DAY
          AND n.n_name IN ('NATION_18', 'NATION_19')
          AND EXISTS (SELECT 1 FROM lineitem_v l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 180 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10""")
    }),

    // ------------------------------------------------------------------
    // Modern SQL aggregate surface: GROUP BY ALL (keys inferred from
    // the non-aggregate select items — the 2023-era convenience both
    // Spark 4 and DuckDB resolve identically) combined with per-
    // aggregate FILTER clauses (SQL:2003 T612), which beat the
    // CASE-WHEN-ELSE-NULL encoding by keeping the predicate inside the
    // aggregate where codegen fuses it into the partial-agg pass.
    // Sums quantize to DECIMAL(18,2) before aggregation (q83's
    // discipline) so cell values are accumulation-order-free; the
    // conditional sum coalesces to 0 for cells where no row passes.
    "q293_groupby_all" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ga")
      s.sql("""
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n_events,
               count(*) FILTER (WHERE value > 100) AS n_hi,
               round(CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                 FILTER (WHERE value > 100), 0.0) AS DOUBLE), 6) AS sum_hi,
               count(DISTINCT user_id) AS n_users
        FROM events_ga
        GROUP BY ALL
        ORDER BY event_type, day""")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q293_groupby_all" ->
      ("SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events, "
        + "count(*) FILTER (WHERE value > 100) AS n_hi, "
        + "round(CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 100), 0.0) AS DOUBLE), 6) AS sum_hi, "
        + "count(DISTINCT user_id) AS n_users "
        + "FROM events GROUP BY ALL ORDER BY event_type, day"),
    "q134_unpivot" ->
      ("WITH a AS (SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        + "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, "
        + "CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc "
        + "FROM lineitem GROUP BY l_returnflag) "
        + "SELECT l_returnflag, measure, val FROM ("
        + "SELECT l_returnflag, 'sum_qty' AS measure, round(sum_qty, 2) AS val FROM a "
        + "UNION ALL SELECT l_returnflag, 'sum_price', round(sum_price, 2) FROM a "
        + "UNION ALL SELECT l_returnflag, 'sum_disc', round(sum_disc, 2) FROM a) "
        + "ORDER BY l_returnflag, measure"),
    "q138_sql_tpch_q3" ->
      ("WITH r AS (SELECT l_orderkey, o_orderdate, o_orderpriority, "
        + "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev "
        + "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey "
        + "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < CAST('1998-07-01' AS TIMESTAMP) "
        + "AND l_shipdate > CAST('1998-07-01' AS TIMESTAMP) "
        + "GROUP BY l_orderkey, o_orderdate, o_orderpriority) "
        + "SELECT l_orderkey, o_orderdate, o_orderpriority, round(CAST(rev AS DOUBLE), 2) AS revenue "
        + "FROM r ORDER BY rev DESC, l_orderkey LIMIT 10"),
    "q139_grouping_sets" ->
      ("SELECT coalesce(n_name, 'ALL') AS nation, coalesce(o_orderpriority, 'ALL') AS priority, "
        + "count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total "
        + "FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey "
        + "GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ()) "
        + "ORDER BY nation, priority"),
    "q109_stringagg" ->
      ("SELECT n_name, count(*) AS n_cust, count(DISTINCT c_mktsegment) AS n_segs, "
        + "string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs "
        + "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        + "GROUP BY n_name ORDER BY n_name"),
    "q118_recursive_cte" ->
      ("WITH RECURSIVE chain(k, root, depth) AS ("
        + "SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey BETWEEN 1 AND 7 "
        + "UNION ALL SELECT k * 2, root, depth + 1 FROM chain WHERE k * 2 <= 100000) "
        + "SELECT root, count(*) AS chain_len, max(depth) AS max_depth, "
        + "CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_existing "
        + "FROM chain LEFT JOIN customer c ON chain.k = c.c_custkey "
        + "GROUP BY root ORDER BY root"),
    "q119_lateral" ->
      ("SELECT n.n_name, t.c_name, t.c_acctbal FROM nation n, "
        + "LATERAL (SELECT c_name, c_acctbal FROM customer c WHERE c.c_nationkey = n.n_nationkey "
        + "ORDER BY c_acctbal DESC, c_name LIMIT 2) t "
        + "ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"),
    "q83_sql_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, "
        + "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_qty, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_base_price, "
        + "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price, "
        + "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge, "
        + "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price, "
        + "round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc, "
        + "count(*) AS count_order FROM lineitem "
        + "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        + "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "q02_scan_events_ns" ->
      "SELECT event_id, ts, user_id, event_type, value FROM events ORDER BY event_id LIMIT 200",
    "q03_filter_pred" ->
      "SELECT * FROM orders WHERE o_orderstatus IN ('O','P') AND o_totalprice BETWEEN 50000 AND 200000 AND o_orderpriority LIKE '%URGENT' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_custkey IS NOT NULL ORDER BY o_orderkey",
    "q04_case_expr" ->
      "SELECT CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket, count(*) AS n, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6) AS avg_bal FROM customer GROUP BY 1 ORDER BY bucket",
    "q05_join_star" ->
      "SELECT r_name, n_name, count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue FROM region JOIN nation ON n_regionkey = r_regionkey JOIN customer ON c_nationkey = n_nationkey JOIN orders ON o_custkey = c_custkey GROUP BY r_name, n_name ORDER BY r_name, n_name",
    "q06_join_outer" ->
      "SELECT * FROM (SELECT 'cust_orders' AS kind, c_custkey AS key, count(o_orderkey) AS matches FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey UNION ALL SELECT 'nation_supp' AS kind, coalesce(n_nationkey, -1) AS key, count(s_suppkey) AS matches FROM nation FULL JOIN supplier ON s_nationkey = n_nationkey GROUP BY coalesce(n_nationkey, -1)) ORDER BY kind, key",
    "q07_join_semi_anti" ->
      "SELECT * FROM (SELECT 'has_orders' AS tag, c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) UNION ALL SELECT 'no_orders' AS tag, c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) ORDER BY tag, c_custkey",
    "q08_join_theta_range" ->
      "SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id FROM events a JOIN events b ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE ORDER BY a_id, b_id",
    "q09_join_asof" ->
      "SELECT event_id, user_id, ts, last_purchase_ts FROM (SELECT event_id, user_id, ts, last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts FROM events) ORDER BY event_id",
    "q10_join_broadcast" ->
      "SELECT n_name, count(*) AS n_cust, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_bal FROM nation JOIN customer ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q11_agg_pricing" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_base, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS sum_disc, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 6) AS sum_charge, "
        + "round(sum(l_quantity)/count(*), 6) AS avg_qty, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6) AS avg_price, "
        + "count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' "
        + "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q12_agg_distinct" ->
      "SELECT count(DISTINCT l_orderkey) AS d_orders, count(DISTINCT l_partkey) AS d_parts, count(DISTINCT l_suppkey) AS d_supps, count(DISTINCT (l_returnflag, l_linestatus)) AS d_flag_status FROM lineitem",
    // q13: the raw HLL estimate can't cross-engine-match, but the
    // within-bound bool can — the oracle pins hll_ok to TRUE and the
    // hash matches iff Spark's estimate actually met the bound.
    "q13_agg_hll" ->
      ("SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS d_users, "
        + "TRUE AS hll_ok FROM events GROUP BY event_type ORDER BY event_type"),
    // q240: sketch estimates can't cross-engine-match; the exact counts
    // + the accuracy-bound bool can (q13/q208's pattern).
    "q358_null_semantics" ->
      ("WITH cv AS (SELECT c_custkey, nullif(c_nationkey % 5, 4) AS k5 FROM customer), "
        + "pv AS (SELECT DISTINCT k5 FROM (SELECT k5 FROM cv WHERE c_custkey % 100 = 0 UNION ALL SELECT CAST(NULL AS INT))) "
        + "SELECT "
        + "(SELECT count(*) FROM cv WHERE k5 = NULL) AS n_eq_null, "
        + "(SELECT count(*) FROM cv WHERE k5 IS NOT DISTINCT FROM NULL) AS n_null_safe_null, "
        + "(SELECT count(*) FROM cv WHERE k5 NOT IN (SELECT k5 FROM pv)) AS n_not_in, "
        + "(SELECT count(*) FROM cv c WHERE NOT EXISTS (SELECT 1 FROM pv p WHERE p.k5 = c.k5)) AS n_not_exists, "
        + "(SELECT count(*) FROM cv a JOIN pv b ON a.k5 IS NOT DISTINCT FROM b.k5) AS n_null_safe_join, "
        + "(SELECT count(*) FROM cv c WHERE NOT EXISTS (SELECT 1 FROM pv p WHERE p.k5 = c.k5)) "
        + "- (SELECT count(*) FROM cv WHERE k5 NOT IN (SELECT k5 FROM pv)) AS trap_gap"),
    "q355_setops_bag" ->
      ("WITH c AS (SELECT c_nationkey AS k FROM customer), "
        + "s AS (SELECT s_nationkey AS k FROM supplier), "
        + "ia AS (SELECT 'intersect_all' AS tag, k, CAST(count(*) AS BIGINT) AS mult "
        + "FROM (SELECT k FROM c INTERSECT ALL SELECT k FROM s) GROUP BY k), "
        + "ea AS (SELECT 'except_all' AS tag, k, CAST(count(*) AS BIGINT) AS mult "
        + "FROM (SELECT k FROM c EXCEPT ALL SELECT k FROM s) GROUP BY k) "
        + "SELECT * FROM ia UNION ALL SELECT * FROM ea ORDER BY tag, k"),
    "q348_hll_intersection" ->
      ("WITH flags AS (SELECT user_id, max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS fv, "
        + "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS fc, "
        + "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS fp "
        + "FROM events WHERE event_type IN ('view', 'click', 'purchase') GROUP BY user_id), "
        + "e AS (SELECT CAST(sum(fv) AS BIGINT) AS nv, CAST(sum(fc) AS BIGINT) AS nc, CAST(sum(fp) AS BIGINT) AS np, "
        + "CAST(sum(fv * fc) AS BIGINT) AS ivc, CAST(sum(fv * fp) AS BIGINT) AS ivp, CAST(sum(fc * fp) AS BIGINT) AS icp, "
        + "CAST(sum(least(fv + fc, 1)) AS BIGINT) AS uvc, CAST(sum(least(fv + fp, 1)) AS BIGINT) AS uvp, "
        + "CAST(sum(least(fc + fp, 1)) AS BIGINT) AS ucp FROM flags), "
        + "p AS (SELECT unnest([struct_pack(ta := 'view', tb := 'click'), "
        + "struct_pack(ta := 'view', tb := 'purchase'), struct_pack(ta := 'click', tb := 'purchase')]) AS pr) "
        + "SELECT pr.ta AS type_a, pr.tb AS type_b, "
        + "CASE pr.ta WHEN 'view' THEN nv WHEN 'click' THEN nc ELSE np END AS exact_a, "
        + "CASE pr.tb WHEN 'click' THEN nc ELSE np END AS exact_b, "
        + "CASE WHEN pr.ta = 'view' AND pr.tb = 'click' THEN uvc WHEN pr.ta = 'view' AND pr.tb = 'purchase' THEN uvp ELSE ucp END AS exact_union, "
        + "CASE WHEN pr.ta = 'view' AND pr.tb = 'click' THEN ivc WHEN pr.ta = 'view' AND pr.tb = 'purchase' THEN ivp ELSE icp END AS exact_inter, "
        + "TRUE AS hll_inter_ok FROM p CROSS JOIN e ORDER BY type_a, type_b"),
    "q240_hll_merge" ->
      ("SELECT event_type, exact_users, TRUE AS hll_ok FROM ("
        + "SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY event_type "
        + "UNION ALL SELECT 'ALL', count(DISTINCT user_id) FROM events) "
        + "ORDER BY event_type"),
    "q14_rollup_cube" ->
      "SELECT l_returnflag, l_linestatus, CAST(grouping(l_returnflag) AS INT) AS g_rf, CAST(grouping(l_linestatus) AS INT) AS g_ls, count(*) AS cnt, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q15_pivot" ->
      "SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS click, count(*) FILTER (WHERE event_type = 'error') AS error, count(*) FILTER (WHERE event_type = 'purchase') AS purchase, count(*) FILTER (WHERE event_type = 'signup') AS signup, count(*) FILTER (WHERE event_type = 'view') AS view FROM events GROUP BY user_id ORDER BY user_id",
    "q28_sort_limit" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "q29_setops" ->
      "SELECT * FROM (SELECT 'both' AS tag, k FROM ((SELECT c_nationkey AS k FROM customer) INTERSECT (SELECT s_nationkey FROM supplier)) UNION ALL SELECT 'cust_only' AS tag, k FROM ((SELECT c_nationkey AS k FROM customer) EXCEPT (SELECT s_nationkey FROM supplier)) UNION ALL SELECT 'union_all_cnt' AS tag, CAST(count(*) AS INT) AS k FROM (SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)) ORDER BY tag, k",
    "q153_sql_tpch_q5" ->
      ("SELECT n_name, round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue "
        + "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        + "JOIN customer ON o_custkey = c_custkey "
        + "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        + "JOIN nation ON s_nationkey = n_nationkey "
        + "JOIN region ON n_regionkey = r_regionkey "
        + "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' "
        + "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q157_sql_tpch_q6" ->
      ("SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue, count(*) AS n_rows "
        + "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        + "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25"),
    "q158_sql_tpch_q18" ->
      ("WITH big AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty "
        + "FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) "
        + "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, CAST(sum_qty AS DOUBLE) AS total_qty "
        + "FROM big JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey "
        + "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q163_sql_tpch_q14" ->
      ("SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' "
        + "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) "
        + "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
        + "/ CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue_pct, "
        + "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_revenue, "
        + "count(*) AS n_rows "
        + "FROM lineitem JOIN part ON l_partkey = p_partkey "
        + "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'"),
    "q164_sql_tpch_q19" ->
      ("SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue, "
        + "count(*) AS n_rows "
        + "FROM lineitem JOIN part ON l_partkey = p_partkey "
        + "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) "
        + "OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30) "
        + "OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)"),
    "q169_sql_tpch_q10" ->
      ("SELECT c_custkey, c_name, n_name, "
        + "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue, "
        + "count(*) AS n_items "
        + "FROM customer JOIN orders ON c_custkey = o_custkey "
        + "JOIN lineitem ON l_orderkey = o_orderkey "
        + "JOIN nation ON c_nationkey = n_nationkey "
        + "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' "
        + "AND l_returnflag = 'R' "
        + "GROUP BY c_custkey, c_name, n_name "
        + "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q172_correlated_subq" ->
      ("SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders o "
        + "WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM orders o2 "
        + "WHERE o2.o_orderpriority = o.o_orderpriority) "
        + "ORDER BY o_orderpriority, o_orderkey"),
    "q176_sql_tpch_q7" ->
      ("SELECT supp_nation, cust_nation, l_year, round(CAST(sum(volume) AS DOUBLE), 4) AS revenue, count(*) AS n_rows "
        + "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, year(l_shipdate) AS l_year, "
        + "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume "
        + "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        + "JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey "
        + "JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        + "WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3') "
        + "AND n2.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')) "
        + "GROUP BY supp_nation, cust_nation, l_year ORDER BY supp_nation, cust_nation, l_year"),
    "q177_sql_tpch_q22" ->
      ("SELECT c_mktsegment, count(*) AS n_cust, "
        + "round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal "
        + "FROM customer c "
        + "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0) "
        + "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        + "AND o.o_orderdate >= TIMESTAMP '1999-01-01') "
        + "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q183_sql_tpch_q4" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders o "
        + "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' "
        + "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
        + "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q185_join_hints" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, "
        + "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished, "
        + "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 2) AS urgent_rev "
        + "FROM orders o JOIN customer c ON o_custkey = c_custkey "
        + "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q187_sql_tpch_q15" ->
      ("WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        + "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev "
        + "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' "
        + "GROUP BY l_suppkey) "
        + "SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 4) AS total_revenue "
        + "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        + "WHERE total_rev = (SELECT max(total_rev) FROM revenue) ORDER BY s_suppkey"),
    "q189_sql_tpch_q13" ->
      ("WITH c_orders AS (SELECT c_custkey, count(o_orderkey) AS c_count "
        + "FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) "
        + "SELECT c_count, count(*) AS custdist FROM c_orders "
        + "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q194_sql_tpch_q17" ->
      ("SELECT p_brand, count(*) AS n_small, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly "
        + "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        + "WHERE p.p_size < 11 "
        + "AND l.l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem li WHERE li.l_partkey = p.p_partkey) "
        + "GROUP BY p_brand ORDER BY p_brand"),
    "q195_sql_tpch_q8" ->
      ("WITH all_sales AS (SELECT year(o.o_orderdate) AS o_year, "
        + "CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume, "
        + "ns.n_name AS supp_nation "
        + "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        + "JOIN customer c ON c.c_custkey = o.o_custkey "
        + "JOIN nation nc ON nc.n_nationkey = c.c_nationkey "
        + "JOIN region r ON r.r_regionkey = nc.n_regionkey "
        + "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        + "JOIN nation ns ON ns.n_nationkey = s.s_nationkey "
        + "JOIN part p ON p.p_partkey = l.l_partkey "
        + "WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY') "
        + "SELECT o_year, "
        + "round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
        + "/ CAST(sum(volume) AS DOUBLE), 6) AS mkt_share "
        + "FROM all_sales GROUP BY o_year ORDER BY o_year"),
    "q196_sql_tpch_q21" ->
      ("SELECT s_name, count(*) AS numwait "
        + "FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey "
        + "JOIN orders o ON o.o_orderkey = l1.l_orderkey "
        + "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        + "WHERE o.o_orderstatus = 'F' "
        + "AND l1.l_shipdate > o.o_orderdate + INTERVAL 180 DAY "
        + "AND n.n_name IN ('NATION_18', 'NATION_19') "
        + "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        + "AND l2.l_suppkey <> l1.l_suppkey) "
        + "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        + "AND l3.l_suppkey <> l1.l_suppkey "
        + "AND l3.l_shipdate > o.o_orderdate + INTERVAL 180 DAY) "
        + "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"),
  )
}
