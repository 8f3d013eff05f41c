package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8: the scalar-function tour — string, date, math, array
  * (incl. higher-order functions), explode/unnest, and JSON extraction.
  *
  * Numeric parity: transcendentals (ln/exp/sqrt/pow) are libm-dependent
  * and may differ by 1 ULP between JVM and DuckDB, so they only appear
  * AVERAGED over many rows (per-row 1e-16 relative noise sums far below
  * the 6-dp round); all per-row outputs are exact ops (floor/ceil/abs/
  * integer arithmetic). Rounding-mode traps (Spark HALF_UP vs DuckDB
  * half-away on `round(x, 0)`) are avoided entirely.
  *
  * Scale notes: everything here is a narrow projection or a partial-agg
  * groupBy — filters sit directly on scan columns so they push into the
  * parquet reader, and the HOF lambdas run inside whole-stage codegen
  * (no UDF SerDe boundary).
  */
object Scalars extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    "q30_string_fns" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 4).as("sub"),
          concat(col("p_type"), lit("_"), col("p_brand")).as("cat"),
          regexp_replace(col("p_name"), lit(" "), lit("-")).as("rep"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          levenshtein(col("p_name"), lit("cold widget")).as("lev"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
          length(col("p_name")).as("len"))
        .orderBy(col("p_partkey"))),

    // ------------------------------------------------------------------
    // Date/time kitchen sink per order (filter pushed to the scan).
    // ISO day-of-week: Spark weekday() is 0=Mon..6=Sun; DuckDB isodow is
    // 1=Mon..7=Sun — reconciled as weekday()+1.
    "q31_date_fns" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey") <= 300)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          (weekday(col("o_orderdate")) + 1).as("dow_iso"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"))
        .orderBy(col("o_orderkey"))),

    // ------------------------------------------------------------------
    "q32_math_fns" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .agg(
          round(avg(log(col("l_extendedprice"))), 6).as("avg_ln_price"),
          round(avg(sqrt(col("l_quantity"))), 6).as("avg_sqrt_qty"),
          round(avg(exp(col("l_discount"))), 6).as("avg_exp_disc"),
          round(avg(pow(col("l_quantity"), 1.5)), 6).as("avg_pow_qty"),
          sum(floor(col("l_extendedprice")).cast("bigint")).as("sum_floor"),
          sum(ceil(col("l_extendedprice")).cast("bigint")).as("sum_ceil"),
          sum(abs(col("l_quantity") - 25).cast("bigint")).as("sum_absdev"),
          sum(col("l_orderkey") % 7).as("sum_mod7"))),

    // ------------------------------------------------------------------
    // Array ops + higher-order functions over the embedding vectors.
    // The fold inside `aggregate` runs sequentially per row, so the
    // double accumulation order is identical to DuckDB's list_sum over
    // the same list — bit-stable across engines.
    "q33_array_fns" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(sqrt(expr("aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")), 6).as("l2"),
          size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
          round(array_max(col("embedding")).cast("double"), 6).as("mx"),
          // Rendered as a comma-joined fixed-scale string: array-typed output
          // columns crash the driver's pandas sort (unhashable ndarray), and
          // decimal(18,6)->string renders identically in Spark and DuckDB.
          expr("array_join(transform(slice(embedding, 1, 3), x -> cast(cast(round(cast(x as double), 6) as decimal(18,6)) as string)), ',')").as("head3"))
        .orderBy(col("vec_id"))),

    // ------------------------------------------------------------------
    // explode/unnest (UDTF shape): global top-50 tokens. Tokenize →
    // explode → count is one shuffle with map-side partial aggregation.
    "q34_explode" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(50)),

    // ------------------------------------------------------------------
    "q35_json_fns" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          round(sum(col("k")) / count(col("k")), 6).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // ------------------------------------------------------------------
    // VARIANT (Spark 4's columnar semi-structured type): props parsed
    // ONCE into a variant column, fields then extracted with typed
    // variant_get — at 100 TB this is the parse-once / extract-many
    // layout that replaces per-extraction JSON re-parsing (q35's
    // get_json_object shape). The oracle extracts the same fields from
    // the JSON text — values must agree exactly.
    "q121_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), expr("parse_json(props)").as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'int')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type"))),

    // ------------------------------------------------------------------
    // Collation-aware grouping (Spark 4 collations): deterministic
    // mixed-case variants of the market segment (initcap on even keys,
    // lower on odd) regroup to the case-insensitive segments under
    // UTF8_LCASE — grouping semantics live in the TYPE, not in a
    // lower() rewrite. The group key's surviving representative casing
    // is nondeterministic by definition, so the output key is
    // canonicalized via lower(); the oracle groups by lower() directly.
    "q122_collation" -> ((s, dir) =>
      Tables.customer(s, dir)
        .withColumn("seg_mixed",
          when(col("c_custkey") % 2 === 0, initcap(lower(col("c_mktsegment"))))
            .otherwise(lower(col("c_mktsegment"))))
        .select(expr("seg_mixed COLLATE UTF8_LCASE").as("seg_ci"),
          col("c_acctbal"))
        .groupBy(col("seg_ci"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).as("bal"))
        .select(lower(col("seg_ci")).as("segment"), col("n"), col("bal"))
        .orderBy(col("segment"))),

    // ------------------------------------------------------------------
    // Map-typed column surface (§2.8's map family): per-doc token→count
    // maps built with map_from_entries over a canonically SORTED entry
    // array (collect_list order is partition-dependent — array_sort is
    // the only way a collected map is ever deterministic), filtered with
    // a map_filter lambda, then exploded back to rows. The oracle is
    // plain relational SQL — DuckDB never sees a map, which proves the
    // map pipeline is semantics-preserving, not just dialect-mirrored.
    "q140_map_fns" -> ((s, dir) => {
      val tc = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      tc.groupBy(col("doc_id"))
        .agg(map_from_entries(array_sort(collect_list(struct(col("tok"), col("cnt"))))).as("m"))
        .withColumn("m2", expr("map_filter(m, (k, v) -> v >= 2)"))
        .select(col("doc_id"), size(col("m")).as("n_distinct"),
          explode(col("m2")).as(Seq("tok", "cnt")))
        .orderBy(col("doc_id"), col("tok"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q140_map_fns" ->
      ("WITH tc AS (SELECT doc_id, tok, count(*) AS cnt FROM ("
        + "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
        + "WHERE tok <> '' GROUP BY doc_id, tok), "
        + "nd AS (SELECT doc_id, count(*) AS n_distinct FROM tc GROUP BY doc_id) "
        + "SELECT tc.doc_id, n_distinct, tok, cnt FROM tc JOIN nd ON tc.doc_id = nd.doc_id "
        + "WHERE cnt >= 2 ORDER BY tc.doc_id, tok"),
    "q121_variant" ->
      ("SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, "
        + "count(DISTINCT k) AS n_distinct_k "
        + "FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) "
        + "GROUP BY event_type ORDER BY event_type"),
    "q122_collation" ->
      ("SELECT lower(seg_mixed) AS segment, count(*) AS n, "
        + "round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal "
        + "FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN "
        + "upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) "
        + "ELSE lower(c_mktsegment) END AS seg_mixed, c_acctbal FROM customer) "
        + "GROUP BY lower(seg_mixed) ORDER BY segment"),
    "q30_string_fns" ->
      ("SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, substring(p_name, 1, 4) AS sub, "
        + "p_type || '_' || p_brand AS cat, regexp_replace(p_name, ' ', '-', 'g') AS rep, "
        + "regexp_extract(p_name, '(\\w+)$', 1) AS last_word, levenshtein(p_name, 'cold widget') AS lev, "
        + "trim('  ' || p_name || '  ') AS trimmed, length(p_name) AS len FROM part ORDER BY p_partkey"),
    "q31_date_fns" ->
      ("SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, year(o_orderdate) AS y, month(o_orderdate) AS m, "
        + "dayofmonth(o_orderdate) AS d, quarter(o_orderdate) AS q, isodow(o_orderdate) AS dow_iso, "
        + "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since, o_orderdate + INTERVAL 30 DAY AS plus30 "
        + "FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey"),
    "q32_math_fns" ->
      ("SELECT round(avg(ln(l_extendedprice)), 6) AS avg_ln_price, round(avg(sqrt(l_quantity)), 6) AS avg_sqrt_qty, "
        + "round(avg(exp(l_discount)), 6) AS avg_exp_disc, round(avg(pow(l_quantity, 1.5)), 6) AS avg_pow_qty, "
        // DuckDB sum() over integers returns HUGEINT, which the driver's
        // pandas bridge renders as float64 ("18606.0" vs Spark's "18606") —
        // cast the OUTER sum back to BIGINT to pin the dtype.
        + "CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor, "
        + "CAST(sum(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil, "
        + "CAST(sum(CAST(abs(l_quantity - 25) AS BIGINT)) AS BIGINT) AS sum_absdev, "
        + "CAST(sum(l_orderkey % 7) AS BIGINT) AS sum_mod7 FROM lineitem"),
    "q33_array_fns" ->
      ("SELECT vec_id, len(embedding) AS dim, round(CAST(embedding[1] AS DOUBLE), 6) AS e1, "
        + "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2, "
        + "len(list_filter(embedding, x -> x > 0)) AS n_pos, round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx, "
        + "array_to_string(list_transform(embedding[1:3], x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) AS VARCHAR)), ',') AS head3 FROM embeddings ORDER BY vec_id"),
    "q34_explode" ->
      ("SELECT tok, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
        + "WHERE tok <> '' GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50"),
    "q35_json_fns" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(k) AS BIGINT) AS sum_k, round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k, "
        + "min(k) AS min_k, max(k) AS max_k FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) "
        + "GROUP BY event_type ORDER BY event_type"),
  )
}
