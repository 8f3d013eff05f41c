package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.{CorrAggregator, CorrMatrixAggregator}
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
  )

  def oracles: Map[String, String] = Map(
    "q48_udaf_welford" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_udaf, "
        + "round(corr(l_quantity, l_extendedprice), 6) AS corr_builtin FROM lineitem"),
    "q64_corr_matrix_onepass" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_q_e, round(corr(l_quantity, l_discount), 6) AS corr_q_d, "
        + "round(corr(l_quantity, l_tax), 6) AS corr_q_t, round(corr(l_extendedprice, l_discount), 6) AS corr_e_d, "
        + "round(corr(l_extendedprice, l_tax), 6) AS corr_e_t, round(corr(l_discount, l_tax), 6) AS corr_d_t FROM lineitem"),
  )
}
