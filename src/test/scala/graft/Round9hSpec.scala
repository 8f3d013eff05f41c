package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 eighth tranche (q329–q332): the
  * oracle proves cross-engine agreement; these prove the FORMULAS by
  * recomputing each statistic independently — naive sorts and O(n²)
  * pair loops the distributed plans must never use, feasible at
  * sf0.001.
  */
class Round9hSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def md5arm(id: Long, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
  }

  /** Zelen–Severo Φ with the identical double literals the query uses. */
  private def phi(z: Double): Double = {
    val az = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * az)
    val q = 0.3989422804014327 * math.exp(-(az * az) / 2.0) *
      (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
        - 1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t)
    if (z >= 0.0) 1.0 - q else q
  }

  test("q329 Anderson-Darling matches a naive sorted-sample recompute") {
    val xs = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("value").cast("decimal(18,2)").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = xs.length
    val mu = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    // the textbook per-rank sum (ties resolved by sort order — lnΦ is
    // constant within a tie group, so any order gives the same sum,
    // which is exactly why the query's closed-form tie fold is valid)
    val s = xs.zipWithIndex.map { case (x, i0) =>
      val i = i0 + 1
      (2.0 * i - 1.0) * math.log(phi((x - mu) / sd)) +
        (2.0 * (n - i) + 1.0) * math.log(1.0 - phi((x - mu) / sd))
    }.sum
    val a2 = -n - s / n
    val a2s = a2 * (1.0 + 0.75 / n + 2.25 / (n.toDouble * n))
    val r = SparkEntry.queries("q329_anderson_darling")(spark, sf).collect().head
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Double]("mean") shouldBe mu +- 1e-5
    r.getAs[Double]("sd") shouldBe sd +- 1e-5
    r.getAs[Double]("a2") shouldBe a2 +- 1e-4
    r.getAs[Double]("a2_star") shouldBe a2s +- 1e-4
    r.getAs[Boolean]("reject_5pct") shouldBe (a2s > 0.752)
  }

  test("q330 energy distance matches a brute-force O(n^2) pair recompute") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase") && col("value").isNotNull)
      .select(col("event_type"), col("value").cast("decimal(18,2)").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = rows.filter(_._1 == "click").map(_._2)
    val b = rows.filter(_._1 == "purchase").map(_._2)
    def meanAbs(u: Array[Double], v: Array[Double]): Double =
      u.flatMap(x => v.map(y => math.abs(x - y))).sum / (u.length.toDouble * v.length)
    val exy = meanAbs(a, b); val exx = meanAbs(a, a); val eyy = meanAbs(b, b)
    val r = SparkEntry.queries("q330_energy_distance")(spark, sf).collect().head
    r.getAs[Long]("n1") shouldBe a.length.toLong
    r.getAs[Long]("n2") shouldBe b.length.toLong
    r.getAs[Double]("e_xy") shouldBe exy +- 1e-6
    r.getAs[Double]("e_xx") shouldBe exx +- 1e-6
    r.getAs[Double]("e_yy") shouldBe eyy +- 1e-6
    val d = 2 * exy - exx - eyy
    r.getAs[Double]("energy_dist") shouldBe d +- 1e-6
    // the energy distance is a metric on distributions: nonnegative
    r.getAs[Double]("energy_dist") should be >= 0.0
  }

  test("q331 delta-method ratio matches a scalar per-user recompute") {
    val per = Tables.events(spark, sf)
      .select(col("user_id"), col("value"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) 0.0
        else BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .groupBy(_._1).map { case (u, xs) => (md5arm(u, 2), xs.length.toLong, xs.map(_._2).sum) }
      .toSeq
    def stats(arm: Long): (Long, Double, Double) = {
      val g = per.filter(_._1 == arm)
      val k = g.size
      val (ns, ys) = (g.map(_._2.toDouble), g.map(_._3))
      val (sn, sy) = (ns.sum, ys.sum)
      val r = sy / sn
      val nbar = sn / k
      val snn = ns.map(x => (x - nbar) * (x - nbar)).sum / (k - 1)
      val ybar = sy / k
      val syy = ys.map(x => (x - ybar) * (x - ybar)).sum / (k - 1)
      val sny = ns.zip(ys).map { case (x, y) => (x - nbar) * (y - ybar) }.sum / (k - 1)
      (k.toLong, r, (syy - 2 * r * sny + r * r * snn) / (k * nbar * nbar))
    }
    val (k0, r0, v0) = stats(0); val (k1, r1, v1) = stats(1)
    val z = (r1 - r0) / math.sqrt(v0 + v1)
    val r = SparkEntry.queries("q331_delta_ratio")(spark, sf).collect().head
    r.getAs[Long]("users_ctrl") shouldBe k0
    r.getAs[Long]("users_treat") shouldBe k1
    r.getAs[Double]("ratio_ctrl") shouldBe r0 +- 1e-6
    r.getAs[Double]("ratio_treat") shouldBe r1 +- 1e-6
    r.getAs[Double]("se_delta") shouldBe math.sqrt(v0 + v1) +- 1e-6
    r.getAs[Double]("z_stat") shouldBe z +- 1e-5
    r.getAs[Boolean]("reject_5pct") shouldBe (math.abs(z) > 1.959964)
  }

  test("q332 ADF matches a scalar OLS on the lagged daily series") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    val y1 = daily.dropRight(1)
    val dy = daily.drop(1).zip(y1).map { case (y, p) => y - p }
    val n = y1.length
    val (m1, md) = (y1.sum / n, dy.sum / n)
    val c11 = y1.map(x => (x - m1) * (x - m1)).sum
    val c1d = y1.zip(dy).map { case (x, d) => (x - m1) * (d - md) }.sum
    val cdd = dy.map(d => (d - md) * (d - md)).sum
    val beta = c1d / c11
    val se = math.sqrt((cdd - beta * c1d) / (n - 2) / c11)
    val df = beta / se
    val r = SparkEntry.queries("q332_adf_test")(spark, sf).collect().head
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Double]("beta") shouldBe beta +- 1e-6
    r.getAs[Double]("df_stat") shouldBe df +- 1e-5
    r.getAs[Boolean]("reject_unit_root_5pct") shouldBe (df < -2.86)
    // a daily COUNT series is mean-reverting by construction: β ∈ (−2, 0)
    beta should (be > -2.0 and be < 0.0)
  }
}
