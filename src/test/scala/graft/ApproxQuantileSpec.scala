package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q63 has no cross-engine oracle (sketch internals differ), so its
  * correctness contract is the Greenwald-Khanna guarantee itself: each
  * reported quantile's RANK in the exact sorted data must be within
  * n/accuracy of the requested rank.
  */
class ApproxQuantileSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("approx quantiles respect the rank-error bound per group") {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val acc = 10000.0
    org.apache.spark.sql.GraftFunctions.register(spark)
    val approx = ops.Stats.approxQuantileEst(spark, sf).collect()
    approx.length should be > 0
    val data = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for (row <- approx) {
      val flag = row.getString(0)
      val got = (1 to 4).map(row.getDouble) // p25, p50, p75, p90
      val n = row.getLong(5)
      val sorted = data(flag)
      for ((q, v) <- qs.zip(got)) {
        val rank = sorted.count(_ <= v).toDouble
        withClue(s"$flag q=$q v=$v") {
          math.abs(rank - q * n) should be <= math.max(n / acc, 1.0)
        }
      }
    }
  }

  test("q63's query surface emits all-true rank-bound booleans (the oracle contract)") {
    val rows = SparkEntry.queries("q63_approx_quantile")(spark, sf).collect()
    rows.length should be > 0
    for (r <- rows; c <- Seq("p25_ok", "p50_ok", "p75_ok", "p90_ok")) {
      withClue(s"${r.getAs[String]("l_returnflag")} $c: ") {
        r.getAs[Boolean](c) shouldBe true
      }
    }
  }
}
