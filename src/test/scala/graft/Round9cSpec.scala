package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 third tranche (q302–q304; q305's
  * aggregate pushdown is machine-checked in DsV2Spec).
  */
class Round9cSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def events: Array[(Long, Long, Double)] =
    Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("q302 DiD: matches the scalar four-cell estimator with pooled SE") {
    val evs = events
    val post0 = 1705363200000000L
    def cell(t: Int, p: Int): Array[Double] = evs.collect {
      case (u, ts, v) if (u % 2).toInt == t && (if (ts >= post0) 1 else 0) == p =>
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def mv(xs: Array[Double]): (Double, Double) = {
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (m, v / n)
    }
    val (mtp, vtp) = mv(cell(1, 1)); val (mt0, vt0) = mv(cell(1, 0))
    val (mcp, vcp) = mv(cell(0, 1)); val (mc0, vc0) = mv(cell(0, 0))
    val did = (mtp - mt0) - (mcp - mc0)
    val se = math.sqrt(vtp + vt0 + vcp + vc0)
    val r = SparkEntry.queries("q302_did")(spark, sf).collect().head
    r.getLong(0) shouldBe evs.length.toLong
    r.getDouble(1) shouldBe mt0 +- 1e-6
    r.getDouble(2) shouldBe mtp +- 1e-6
    r.getDouble(3) shouldBe mc0 +- 1e-6
    r.getDouble(4) shouldBe mcp +- 1e-6
    r.getDouble(5) shouldBe did +- 1e-6
    r.getDouble(6) shouldBe se +- 1e-6
    r.getDouble(7) shouldBe did / se +- 1e-5
  }

  test("q303 Mantel-Haenszel: matches the scalar pooled OR and CMH statistic") {
    val strata = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), (r.getLong(1) % 2).toInt, if (r.getDouble(2) > 100) 1 else 0))
      .groupBy(_._1)
    var sad = 0.0; var sbc = 0.0; var sa = 0L; var se1 = 0.0; var sv = 0.0
    for ((_, rows) <- strata) {
      val a = rows.count(t => t._2 == 1 && t._3 == 1).toLong
      val b = rows.count(t => t._2 == 1 && t._3 == 0).toLong
      val c = rows.count(t => t._2 == 0 && t._3 == 1).toLong
      val d = rows.count(t => t._2 == 0 && t._3 == 0).toLong
      val n = (a + b + c + d).toDouble
      sad += a.toDouble * d / n
      sbc += b.toDouble * c / n
      sa += a
      se1 += (a + b).toDouble * (a + c) / n
      sv += (a + b).toDouble * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    }
    val orMh = sad / sbc
    val chi2 = math.pow(math.abs(sa.toDouble - se1) - 0.5, 2) / sv
    val r = SparkEntry.queries("q303_mantel_haenszel")(spark, sf).collect().head
    r.getLong(0) shouldBe strata.size.toLong
    r.getDouble(1) shouldBe orMh +- 1e-6
    r.getDouble(2) shouldBe chi2 +- 1e-5
    r.getBoolean(3) shouldBe (chi2 > 3.841459)
  }

  test("q304 inequality: matches scalar Theil/Atkinson/Hoover and known orderings") {
    val xs = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double")).collect()
      .map(_.getDouble(0)).filter(_ > 0)
    val n = xs.length
    val mu = xs.sum / n
    val theil = xs.map(x => (x / mu) * math.log(x / mu)).sum / n
    val atk = 1.0 - math.pow(xs.map(math.sqrt).sum / n, 2) / mu
    val hoover = xs.map(x => math.abs(x - mu)).sum / (2.0 * n * mu)
    val r = SparkEntry.queries("q304_inequality")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe mu +- 1e-4
    r.getDouble(2) shouldBe theil +- 1e-6
    r.getDouble(3) shouldBe atk +- 1e-6
    r.getDouble(4) shouldBe hoover +- 1e-6
    // indices live in their theoretical ranges for positive data
    r.getDouble(2) should be > 0.0
    r.getDouble(3) should (be > 0.0 and be < 1.0)
    r.getDouble(4) should (be > 0.0 and be < 1.0)
  }
}
