package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SURVEY.md §2.1 (formats): csv / json / parquet read-write
  * capability — roundtrip the orders table through each format and
  * prove schema + content survive.
  */
class SourcesSpec extends AnyFunSuite with Matchers with SharedSpark {

  private val tmp = java.nio.file.Files.createTempDirectory("graft_sources").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey")).collect().map(_.toString)

  test("csv roundtrip preserves rows (schema re-applied on read)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").option("header", "true").csv(s"$tmp/orders_csv")
    val back = spark.read.option("header", "true").schema(orders.schema).csv(s"$tmp/orders_csv")
    canon(back) shouldBe canon(orders)
  }

  test("json roundtrip preserves rows") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").json(s"$tmp/orders_json")
    val back = spark.read.schema(orders.schema).json(s"$tmp/orders_json")
    canon(back) shouldBe canon(orders)
  }

  test("orc roundtrip preserves rows") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").orc(s"$tmp/orders_orc")
    canon(spark.read.orc(s"$tmp/orders_orc")) shouldBe canon(orders)
  }

  test("partitioned parquet write prunes partitions on read") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part").filter(col("status") === "O")
    pruned.count() shouldBe orders.filter(col("o_orderstatus") === "O").count()
    // partition filter must reach the file index, not a post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    plan should not include "Filter (status"
  }
}
