package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Invariants for the round-3 analysis pack (q101–q108) that the
  * DuckDB oracle can't express: statistical bounds, the Bloom-prune ≡
  * plain-join equivalence, calendar completeness, and the blocked
  * fuzzy join never degenerating into a cartesian plan.
  */
class AnalysisSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q101 chi-square: dof matches level counts, V in [0,1]") {
    val r = SparkEntry.queries("q101_chi2")(spark, sf).collect().head
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val nSt = o.select(col("o_orderstatus")).distinct().count()
    val nPr = o.select(col("o_orderpriority")).distinct().count()
    r.getAs[Long]("dof") shouldBe (nSt - 1) * (nPr - 1)
    r.getAs[Double]("chi2") should be >= 0.0
    r.getAs[Double]("cramers_v") should (be >= 0.0 and be <= 1.0)
  }

  test("q103 bloom-pruned join result is identical to the plain join") {
    val pruned = SparkEntry.queries("q103_bloom_join")(spark, sf).collect().toSet
    val plain = {
      val ok = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
      Tables.lineitem(spark, sf)
        .join(ok, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev_d"))
        .select(col("l_returnflag"), col("n"),
          round(col("rev_d").cast("double"), 2).as("revenue"))
        .collect().toSet
    }
    pruned shouldBe plain
  }

  test("q104 profile: null-free key column is unique, distincts bounded") {
    val rows = SparkEntry.queries("q104_profile")(spark, sf).collect()
    rows should have length 6
    for (r <- rows) {
      r.getAs[Long]("n_distinct") should be <= r.getAs[Long]("n_rows")
      r.getAs[Long]("n_null") shouldBe 0L
    }
    val ok = rows.find(_.getAs[String]("col_name") == "o_orderkey").get
    ok.getAs[Long]("n_distinct") shouldBe ok.getAs[Long]("n_rows")
  }

  test("q105 gap-fill: calendar is dense and averages are window-true") {
    val rows = SparkEntry.queries("q105_gapfill")(spark, sf)
      .orderBy(col("day")).collect()
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1
    rows.length.toLong shouldBe span // no missing and no duplicate days
    rows.head.getAs[Double]("mavg7") shouldBe rows.head.getAs[Double]("rev")
    // a 7-row window mid-series: mean of the 7 trailing revs
    val i = 10
    val expect = BigDecimal(rows.slice(i - 6, i + 1).map(_.getAs[Double]("rev")).sum / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows(i).getAs[Double]("mavg7") shouldBe expect +- 1e-6
  }

  test("q106 zipf: frequency decays in rank (negative slope), r2 valid") {
    val r = SparkEntry.queries("q106_zipf")(spark, sf).collect().head
    r.getAs[Double]("slope") should be < 0.0
    r.getAs[Double]("r2") should (be >= 0.0 and be <= 1.0)
  }

  test("q107 transition rows are proper conditional distributions") {
    val rows = SparkEntry.queries("q107_transition")(spark, sf).collect()
    val byPrev = rows.groupBy(_.getAs[String]("prev"))
    byPrev.size should be >= 2
    for ((prev, rs) <- byPrev) {
      val pSum = rs.map(_.getAs[Double]("p")).sum
      withClue(prev) { pSum shouldBe 1.0 +- 1e-4 }
    }
  }

  test("q108 fuzzy join: blocked plan (no cartesian), distances in [1,2]") {
    val df = SparkEntry.queries("q108_fuzzy_join")(spark, sf)
    df.queryExecution.executedPlan.toString should not include "CartesianProduct"
    val rows = df.collect()
    rows.map(_.getAs[Int]("d")).foreach(d => d should (be >= 1 and be <= 2))
    // every example pair really shares the 16-char block prefix
    for (r <- rows) {
      val Array(a, b) = r.getAs[String]("example").split('|')
      a.take(16) shouldBe b.take(16)
    }
  }

  test("q102 heavy hitters: support-bounded output, shares consistent") {
    val rows = SparkEntry.queries("q102_heavy_hitters")(spark, sf).collect()
    rows.length should be <= 50 // θ=2% → at most 1/θ heavy hitters
    val tot = rows.head.getAs[Long]("tot")
    for (r <- rows) {
      r.getAs[Long]("c").toDouble / tot should be > 0.02 - 1e-9
      r.getAs[Double]("share") shouldBe
        BigDecimal(r.getAs[Long]("c").toDouble / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}
