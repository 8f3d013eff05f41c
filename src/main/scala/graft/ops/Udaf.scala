package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.CorrAggregator
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
  )

  def oracles: Map[String, String] = Map(
    "q48_udaf_welford" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_udaf, "
        + "round(corr(l_quantity, l_extendedprice), 6) AS corr_builtin FROM lineitem"),
  )
}
