package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module per SURVEY.md §2 category. `queries` keys are the stable
  * qNN_* names; `oracles` holds the DuckDB-dialect SQL for every
  * oracle-able key (omit a key → driver records rows-only check).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
