package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketing for co-located joins (the 100 TB fact⋈fact answer when
  * neither side broadcasts): both tables bucketed+sorted on the join
  * key at write time → the join planner reuses the layout and the
  * physical plan contains NO shuffle at all.
  */
class BucketingSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("join of co-bucketed tables plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bkt.orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bkt.lineitem_b")

      val joined = spark.table("graft_bkt.lineitem_b")
        .join(spark.table("graft_bkt.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume the bucketed layout directly —
      // no Exchange keyed on either join key anywhere in the plan (the
      // downstream groupBy legitimately exchanges on o_orderstatus)
      plan should include("SortMergeJoin")
      plan should include("Bucketed: true")
      plan should not include "Exchange hashpartitioning(l_orderkey"
      plan should not include "Exchange hashpartitioning(o_orderkey"

      // same rows as the unbucketed join
      val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      joined.collect().map(_.toString).sorted shouldBe expect
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
      spark.sql("DROP DATABASE IF EXISTS graft_bkt")
    }
  }

  test("SQL surface: spark.sql over temp views equals the DataFrame pack result") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql(
      "SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price FROM lineitem_v")
      .head().getDouble(0)
    val viaDf = SparkEntry.queries("q16_corr_pair")(spark, sf).head().getDouble(0)
    viaSql shouldBe viaDf
  }
}
