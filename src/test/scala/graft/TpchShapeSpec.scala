package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hand-computed fixtures for the round-5 TPC-H shapes q194/q195/q196 —
  * the DuckDB oracle proves ENGINE parity, not formula correctness, so
  * each query's defining semantics (the correlated threshold, the share
  * ratio, the semi/anti quantifier pair) is pinned here on a tiny star
  * schema where every expected row is derivable by hand.
  */
class TpchShapeSpec extends AnyFunSuite with Matchers with SharedSpark {

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tpchfx_").toString
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

    Seq((2L, "ASIA"), (3L, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.parquet(s"$dir/region.parquet")
    Seq((7L, "NATION_7", 2L), (12L, "NATION_12", 2L),
        (18L, "NATION_18", 3L), (19L, "NATION_19", 3L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 7L, 0.0, "SEG"), (2L, "c2", 18L, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((1L, "Supp#1", 18L, 0.0), (2L, "Supp#2", 19L, 0.0),
        (3L, "Supp#3", 7L, 0.0), (4L, "Supp#4", 12L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.parquet(s"$dir/supplier.parquet")
    // part 10: small-qty candidate · 11: size >= 11 excluded from q194 ·
    // 12: no line under its 20%-avg threshold · 13: the ECONOMY part q195 prices
    Seq((10L, "pA", "Brand#1", "MEDIUM", 5, 1.0),
        (11L, "pB", "Brand#1", "MEDIUM", 20, 1.0),
        (12L, "pC", "Brand#2", "MEDIUM", 3, 1.0),
        (13L, "pD", "Brand#3", "ECONOMY", 30, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    // o1: one late supplier among two → the only q196 wait
    // o2: BOTH late → NOT EXISTS kills it · o3: status 'O' excluded +
    // the non-ASIA customer q195 must drop · o4: sole supplier → EXISTS
    // kills it · o5: the q195 revenue order (year 2025)
    Seq((1L, 1L, "F", 0.0, ts("2024-01-01"), "1-URGENT"),
        (2L, 1L, "F", 0.0, ts("2024-01-01"), "1-URGENT"),
        (3L, 2L, "O", 0.0, ts("2025-01-01"), "1-URGENT"),
        (4L, 1L, "F", 0.0, ts("2024-01-01"), "1-URGENT"),
        (5L, 1L, "P", 0.0, ts("2025-06-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // late = shipped > orderdate + 180d; partkey 99 keeps the q196 rows
    // out of the part joins, orderkeys 100+ keep the q194 rows out of
    // the order joins.
    Seq(
      (1L, 99L, 1L, 1, 5.0, 100.0, 0.0, 0.0, "N", "F", ts("2024-12-01")),
      (1L, 99L, 2L, 2, 5.0, 100.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (2L, 99L, 1L, 1, 5.0, 100.0, 0.0, 0.0, "N", "F", ts("2024-12-01")),
      (2L, 99L, 2L, 2, 5.0, 100.0, 0.0, 0.0, "N", "F", ts("2024-12-01")),
      (4L, 99L, 1L, 1, 5.0, 100.0, 0.0, 0.0, "N", "F", ts("2024-12-01")),
      (3L, 99L, 2L, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", ts("2025-12-01")),
      (5L, 13L, 3L, 1, 5.0, 200.0, 0.0, 0.0, "N", "O", ts("2025-07-01")),
      (5L, 13L, 4L, 2, 5.0, 300.0, 0.5, 0.0, "N", "O", ts("2025-07-01")),
      (3L, 13L, 3L, 2, 5.0, 1000.0, 0.0, 0.0, "N", "O", ts("2025-02-01")),
      (100L, 10L, 1L, 1, 1.0, 700.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (100L, 10L, 1L, 2, 10.0, 500.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (101L, 10L, 2L, 1, 10.0, 500.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (101L, 10L, 2L, 2, 10.0, 500.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (102L, 12L, 1L, 1, 5.0, 400.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (102L, 12L, 2L, 2, 5.0, 400.0, 0.0, 0.0, "N", "F", ts("2024-02-01")),
      (103L, 11L, 1L, 1, 1.0, 900.0, 0.0, 0.0, "N", "F", ts("2024-02-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, fx)

  test("q194 Q17: only the line under 20% of its part's avg quantity counts") {
    // part 10 quantities (1,10,10,10): avg 7.75, threshold 1.55 → only
    // the qty-1 line (price 700) qualifies; part 12's threshold is 1.0
    // (nothing under); part 11 is size-excluded. 700/7 = 100.
    val r = q("q194_sql_tpch_q17").collect()
    r should have length 1
    r.head.getAs[String]("p_brand") shouldBe "Brand#1"
    r.head.getAs[Long]("n_small") shouldBe 1L
    r.head.getAs[Double]("avg_yearly") shouldBe 100.0 +- 1e-9
  }

  test("q195 Q8: share is NATION_7's exact-decimal volume over the ASIA total") {
    // order 5 (ASIA customer, 2025): supp3/NATION_7 volume 200, supp4
    // volume 300*(1-0.5)=150 → share 200/350; order 3's 1000-line
    // belongs to the EUROPE customer and must be excluded.
    val r = q("q195_sql_tpch_q8").collect()
    r should have length 1
    r.head.getAs[Int]("o_year") shouldBe 2025
    r.head.getAs[Double]("mkt_share") shouldBe
      BigDecimal(200.0 / 350.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q197 period growth: MoM crosses the year boundary, YoY matches months") {
    // monthly revenue 2024-01: 100, 2024-02: 150, 2025-01: 110.
    // MoM(2025-01) lags the SEQUENCE (2024-02): (110-150)/150 = -26.666667%;
    // YoY(2025-01) lags the month partition (2024-01): +10%.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_growthfx_").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq((1L, 1L, "F", 100.0, ts("2024-01-05"), "1-URGENT"),
        (2L, 1L, "F", 150.0, ts("2024-02-05"), "1-URGENT"),
        (3L, 1L, "F", 110.0, ts("2025-01-05"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q197_period_growth")(spark, dir).collect()
    r should have length 3
    r.map(row => (row.getAs[Int]("yr"), row.getAs[Int]("mo"))).toSeq shouldBe
      Seq((2024, 1), (2024, 2), (2025, 1))
    r(0).isNullAt(r(0).fieldIndex("mom_pct")) shouldBe true
    r(0).isNullAt(r(0).fieldIndex("yoy_pct")) shouldBe true
    r(1).getAs[Double]("mom_pct") shouldBe 50.0 +- 1e-9
    r(1).isNullAt(r(1).fieldIndex("yoy_pct")) shouldBe true
    r(2).getAs[Double]("mom_pct") shouldBe -26.666667 +- 1e-9
    r(2).getAs[Double]("yoy_pct") shouldBe 10.0 +- 1e-9
  }

  test("q196 Q21: only the sole-late supplier in a multi-supplier order waits") {
    // o1: supp1 late, supp2 on time → supp1 waits. o2: both late → NOT
    // EXISTS fails. o4: sole supplier → EXISTS fails. o3: status 'O'.
    val r = q("q196_sql_tpch_q21").collect()
    r should have length 1
    r.head.getAs[String]("s_name") shouldBe "Supp#1"
    r.head.getAs[Long]("numwait") shouldBe 1L
  }
}
