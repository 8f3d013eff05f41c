package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.{CorrAggregator, CorrMatrixAggregator, KmvAggregator}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 (q48): the custom typed-UDAF surface. The
  * Welford/Chan one-pass correlation Aggregator must agree with Spark's
  * built-in `corr` AND the DuckDB oracle at 6 dp — both are emitted so
  * the oracle checks the custom code, not just the built-in.
  */
object Udaf extends QueryPack {

  def queries: Map[String, Q] = Map(
    "q48_udaf_welford" -> ((s, dir) => {
      val corrUdaf = udaf(CorrAggregator,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      Tables.lineitem(s, dir)
        .agg(
          round(corrUdaf(col("l_quantity"), col("l_extendedprice")), 6).as("corr_udaf"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_builtin"))
    }),
    // ------------------------------------------------------------------
    // One-pass 4-column correlation MATRIX in a single mergeable buffer
    // (4 means + 10 co-moments) — vs q17's 6 independent corr states.
    // Must reproduce q17's oracle-validated values exactly at 6 dp.
    "q64_corr_matrix_onepass" -> ((s, dir) => {
      val cm = udaf(CorrMatrixAggregator, Encoders.tuple(
        Encoders.scalaDouble, Encoders.scalaDouble,
        Encoders.scalaDouble, Encoders.scalaDouble))
      Tables.lineitem(s, dir)
        .agg(cm(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")).as("m"))
        .select(
          round(element_at(col("m"), 1), 6).as("corr_q_e"),
          round(element_at(col("m"), 2), 6).as("corr_q_d"),
          round(element_at(col("m"), 3), 6).as("corr_q_t"),
          round(element_at(col("m"), 4), 6).as("corr_e_d"),
          round(element_at(col("m"), 5), 6).as("corr_e_t"),
          round(element_at(col("m"), 6), 6).as("corr_d_t"))
    }),

    // ------------------------------------------------------------------
    // KMV (bottom-k) distinct-user sketch per event type + a true
    // sketch-union 'ALL' row built by re-aggregating the per-type
    // sketches (explode → same Aggregator — k longs per type, NEVER a
    // rescan of events). Because the hashes are md5-deterministic the
    // estimate (k−1)/(kth_min/2^60) cross-engine matches EXACTLY — the
    // mergeable-distinct pattern of q240 with a fully oracle-able
    // estimate instead of a bound boolean. Types with <k distinct
    // users carry the whole hash set, so their estimate is exact by
    // construction (the sf0.001 path); ≥k types exercise estimation
    // (sf0.01+). n_exact is the audit column.
    "q245_kmv_sketch" -> ((s, dir) => {
      val kmv = udaf(KmvAggregator, Encoders.scalaLong)
      val pairs = Tables.events(s, dir)
        .select(col("event_type").as("grp"), col("user_id")).distinct()
        .withColumn("h", expr(
          "md5_mod(cast(user_id as string), 9223372036854775807L)"))
        .localCheckpoint() // per-type agg + the ALL exact count
      val perType = pairs.groupBy(col("grp"))
        .agg(countDistinct(col("user_id")).as("n_exact"), kmv(col("h")).as("sk"))
        .localCheckpoint() // emitted per type AND exploded for the union
      val all = perType.select(explode(col("sk")).as("h"))
        .agg(kmv(col("h")).as("sk"))
        .crossJoin(broadcast(pairs.agg(countDistinct(col("user_id")).as("n_exact"))))
        .select(lit("ALL").as("grp"), col("n_exact"), col("sk"))
      perType.select(col("grp"), col("n_exact"), col("sk")).union(all)
        .select(col("grp"), col("n_exact"), size(col("sk")).as("sk_size"),
          expr("CASE WHEN size(sk) = 64 THEN element_at(sk, -1) ELSE NULL END").as("kth_hash"))
        .selectExpr("grp", "n_exact", "sk_size", "kth_hash",
          "CASE WHEN sk_size < 64 THEN cast(sk_size as double) "
            + "ELSE round(63.0 / (cast(kth_hash as double) / 1152921504606846976.0), 6) END AS est")
        .orderBy(col("grp"))
    }),

    // ------------------------------------------------------------------
    // KMV set-similarity: pairwise Jaccard of the per-type distinct-user
    // SETS estimated purely from the q245 sketches — K(A∪B) is the
    // bottom-64 of the two k-long arrays merged IN-ROW, the estimate is
    // |{h ∈ K(A∪B) : h ∈ K(A) ∧ h ∈ K(B)}| / |K(A∪B)| — i.e. set
    // overlap between 100 TB partitions answered from two 512-byte
    // sketches, no raw-data rescan. The exact Jaccard (one user-keyed
    // self-join of the distinct (type,user) frame — co-partitioned,
    // ≤|types|² output) rides along as the audit; md5-determinism makes
    // BOTH columns cross-engine exact. Pair frame is ≤|types|²/2 rows.
    "q252_kmv_jaccard" -> ((s, dir) => {
      val kmv = udaf(KmvAggregator, Encoders.scalaLong)
      val pairs = Tables.events(s, dir)
        .select(col("event_type").as("grp"), col("user_id")).distinct()
        .withColumn("h", expr(
          "md5_mod(cast(user_id as string), 9223372036854775807L)"))
        .localCheckpoint() // sketch agg + exact-audit joins consume it
      val perType = pairs.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_exact"), kmv(col("h")).as("sk"))
      val sketchPairs = perType.select(col("grp").as("ta"), col("n_exact").as("na"), col("sk").as("ska"))
        .join(broadcast(perType.select(col("grp").as("tb"), col("n_exact").as("nb"), col("sk").as("skb"))),
          col("ta") < col("tb"))
        .withColumn("un", expr("slice(array_sort(array_union(ska, skb)), 1, 64)"))
        .withColumn("k_union", size(col("un")))
        .withColumn("k_inter", expr(
          "size(filter(un, x -> array_contains(ska, x) AND array_contains(skb, x)))"))
      val exact = pairs.select(col("grp").as("ta"), col("user_id"))
        .join(pairs.select(col("grp").as("tb"), col("user_id")), "user_id")
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("inter_exact"))
      sketchPairs.join(broadcast(exact), Seq("ta", "tb"), "left")
        .withColumn("ie", coalesce(col("inter_exact"), lit(0L))) // disjoint pair => jaccard 0, not a dropped row
        .selectExpr("ta", "tb", "k_union", "k_inter",
          "round(cast(k_inter as double) / k_union, 6) AS est_jaccard",
          "round(cast(ie as double) / (na + nb - ie), 6) AS exact_jaccard",
          "round(abs(cast(k_inter as double) / k_union "
            + "- cast(ie as double) / (na + nb - ie)), 6) AS abs_err")
        .orderBy(col("ta"), col("tb"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q48_udaf_welford" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_udaf, "
        + "round(corr(l_quantity, l_extendedprice), 6) AS corr_builtin FROM lineitem"),
    "q64_corr_matrix_onepass" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_q_e, round(corr(l_quantity, l_discount), 6) AS corr_q_d, "
        + "round(corr(l_quantity, l_tax), 6) AS corr_q_t, round(corr(l_extendedprice, l_discount), 6) AS corr_e_d, "
        + "round(corr(l_extendedprice, l_tax), 6) AS corr_e_t, round(corr(l_discount, l_tax), 6) AS corr_d_t FROM lineitem"),
    "q245_kmv_sketch" ->
      ("WITH pairs AS (SELECT DISTINCT event_type AS grp, user_id FROM events), "
        + "hh AS (SELECT DISTINCT grp, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM pairs), "
        + "rk AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hh), "
        + "pt AS (SELECT r.grp, p.n_exact, CAST(least(max(r.rn), 64) AS BIGINT) AS sk_size, "
        + "max(CASE WHEN r.rn = 64 THEN r.h END) AS kth_hash FROM rk r "
        + "JOIN (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact FROM pairs GROUP BY grp) p USING (grp) GROUP BY r.grp, p.n_exact), "
        + "ar AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (SELECT DISTINCT h FROM hh)), "
        + "allr AS (SELECT 'ALL' AS grp, (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM pairs) AS n_exact, "
        + "CAST(least(max(rn), 64) AS BIGINT) AS sk_size, max(CASE WHEN rn = 64 THEN h END) AS kth_hash FROM ar), "
        + "u AS (SELECT * FROM pt UNION ALL SELECT * FROM allr) "
        + "SELECT grp, n_exact, sk_size, kth_hash, "
        + "CASE WHEN sk_size < 64 THEN CAST(sk_size AS DOUBLE) "
        + "ELSE round(63.0 / (CAST(kth_hash AS DOUBLE) / 1152921504606846976.0), 6) END AS est "
        + "FROM u ORDER BY grp"),
    "q252_kmv_jaccard" ->
      ("WITH pairs AS (SELECT DISTINCT event_type AS grp, user_id FROM events), "
        + "hh AS (SELECT DISTINCT grp, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM pairs), "
        + "rk AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hh), "
        + "sk AS (SELECT grp, list(h ORDER BY h) AS sk FROM rk WHERE rn <= 64 GROUP BY grp), "
        + "nn AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact FROM pairs GROUP BY grp), "
        + "pr AS (SELECT a.grp AS ta, b.grp AS tb, a.sk AS ska, b.sk AS skb, na.n_exact AS na, nb.n_exact AS nb "
        + "FROM sk a JOIN sk b ON a.grp < b.grp JOIN nn na ON na.grp = a.grp JOIN nn nb ON nb.grp = b.grp), "
        + "u AS (SELECT ta, tb, na, nb, ska, skb, list_sort(list_distinct(ska || skb))[1:64] AS un FROM pr), "
        + "est AS (SELECT ta, tb, na, nb, len(un) AS k_union, "
        + "len(list_filter(un, x -> list_contains(ska, x) AND list_contains(skb, x))) AS k_inter FROM u), "
        + "ex AS (SELECT a.grp AS ta, b.grp AS tb, CAST(count(*) AS BIGINT) AS inter_exact "
        + "FROM pairs a JOIN pairs b ON a.user_id = b.user_id AND a.grp < b.grp GROUP BY 1, 2), "
        + "co AS (SELECT ta, tb, k_union, k_inter, coalesce(inter_exact, 0) AS ie, na, nb "
        + "FROM est LEFT JOIN ex USING (ta, tb)) "
        + "SELECT ta, tb, k_union, k_inter, "
        + "round(CAST(k_inter AS DOUBLE) / k_union, 6) AS est_jaccard, "
        + "round(CAST(ie AS DOUBLE) / (na + nb - ie), 6) AS exact_jaccard, "
        + "round(abs(CAST(k_inter AS DOUBLE) / k_union "
        + "- CAST(ie AS DOUBLE) / (na + nb - ie)), 6) AS abs_err "
        + "FROM co ORDER BY ta, tb"),
  )
}
