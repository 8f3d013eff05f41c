package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 fourth tranche (q307–q310;
  * q306's limit pushdown is machine-checked in DsV2Spec).
  */
class Round9dSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q307 Friedman: matches the scalar complete-block rank statistic") {
    val cells = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("ts").cast("date").cast("string"), col("event_type"),
        col("value").cast("decimal(18,2)")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDecimal(2)))
      .groupBy(_._1).map { case ((d, t), xs) =>
        (d, t, xs.map(_._2.doubleValue()).sum / xs.size)
      }.toSeq
    val k = cells.map(_._2).distinct.size
    val complete = cells.groupBy(_._1).filter(_._2.size == k)
    val rj = scala.collection.mutable.Map.empty[String, Long]
    for ((_, day) <- complete) {
      val ranked = day.sortBy { case (_, t, m) => (m, t) }.zipWithIndex
      for (((_, t, _), i) <- ranked) rj(t) = rj.getOrElse(t, 0L) + i + 1
    }
    val n = complete.size
    val chi2 = 12.0 / (n * k * (k + 1.0)) * rj.values.map(r => r * r).sum - 3.0 * n * (k + 1.0)
    val r = SparkEntry.queries("q307_friedman")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getLong(1) shouldBe k.toLong
    r.getDouble(2) shouldBe chi2 +- 1e-6
  }

  test("q308 McNemar: matches the scalar discordant-pair statistic") {
    val per = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, xs) =>
        (u, xs.exists(t => t._2 < 1705363200000000L && t._3 > 300),
          xs.exists(t => t._2 >= 1705363200000000L && t._3 > 300))
      }
    val b = per.count(t => t._2 && !t._3).toLong
    val c = per.count(t => !t._2 && t._3).toLong
    val chi2 = math.pow(math.abs(b.toDouble - c) - 1.0, 2) / (b + c)
    val r = SparkEntry.queries("q308_mcnemar")(spark, sf).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((per.size.toLong, b, c))
    r.getDouble(3) shouldBe chi2 +- 1e-6
    r.getBoolean(4) shouldBe (chi2 > 3.841459)
  }

  test("q309 residual diagnostics: matches scalar OLS + Durbin-Watson + Breusch-Pagan") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(r => r.getLong(1).toDouble)
    val n = daily.length
    val xs = (0 until n).map(_.toDouble)
    val (sx, sy) = (xs.sum, daily.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(daily).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val e = xs.zip(daily).map { case (x, y) => y - (icept + slope * x) }
    val dw = e.sliding(2).map { case Seq(a, b) => (b - a) * (b - a) }.sum / e.map(v => v * v).sum
    val z = e.map(v => v * v)
    val (sz, szz, szx) = (z.sum, z.map(v => v * v).sum, z.zip(xs).map { case (a, x) => a * x }.sum)
    val rAux = (n * szx - sx * sz) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * szz - sz * sz))
    val bp = n * rAux * rAux
    val r = SparkEntry.queries("q309_resid_diag")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe slope +- 1e-6
    r.getDouble(2) shouldBe dw +- 1e-6
    r.getDouble(3) shouldBe bp +- 1e-4
    // DW lives in [0, 4] by construction
    r.getDouble(2) should (be >= 0.0 and be <= 4.0)
  }

  test("q310 Bartlett: matches the scalar pooled-variance statistic") {
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size
    val nTot = groups.map(_.length).sum
    def s2(g: Seq[Double]): Double = {
      val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum / (g.length - 1)
    }
    val sp2 = groups.map(g => (g.length - 1) * s2(g)).sum / (nTot - k)
    val num = (nTot - k) * math.log(sp2) - groups.map(g => (g.length - 1) * math.log(s2(g))).sum
    val cc = 1.0 + (groups.map(g => 1.0 / (g.length - 1)).sum - 1.0 / (nTot - k)) / (3.0 * (k - 1))
    val stat = num / cc
    val r = SparkEntry.queries("q310_bartlett")(spark, sf).collect().head
    r.getLong(0) shouldBe k.toLong
    r.getLong(1) shouldBe nTot.toLong
    r.getDouble(2) shouldBe stat +- 1e-5
  }
}
