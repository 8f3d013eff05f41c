package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 fifth tranche (q314–q318). */
class Round9eSpec extends AnyFunSuite with Matchers with SharedSpark {

  private val cutoffUs = 1705363200000000L

  test("q314 Wilcoxon signed-rank: matches the scalar midrank statistic") {
    val per = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))"),
        col("value").cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1)
    val ds = per.values.flatMap { xs =>
      val pre = xs.filter(_._2 < cutoffUs).map(_._3.doubleValue())
      val post = xs.filter(_._2 >= cutoffUs).map(_._3.doubleValue())
      if (pre.isEmpty || post.isEmpty) None
      else {
        val d = post.sum / post.size - pre.sum / pre.size
        if (d == 0.0) None else Some(d)
      }
    }.toSeq
    val n = ds.size
    // midranks over |d| with average-rank ties
    val sorted = ds.map(d => (math.abs(d), d)).sortBy(_._1)
    val ranks = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)] // (rank, d)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._1 == sorted(i)._1) j += 1
      val r = (i + 1 + j) / 2.0 // average of 1-based ranks i+1..j
      (i until j).foreach(k => ranks += ((r, sorted(k)._2)))
      i = j
    }
    val wPlus = ranks.filter(_._2 > 0).map(_._1).sum
    val tie = sorted.groupBy(_._1).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val z = (wPlus - n * (n + 1.0) / 4.0) /
      math.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tie / 48.0)
    val r = SparkEntry.queries("q314_wilcoxon_signed")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe wPlus +- 1e-6
    r.getDouble(2) shouldBe z +- 1e-6
    r.getBoolean(3) shouldBe (math.abs(z) > 1.959964)
  }

  test("q315 log-rank: matches the scalar hypergeometric O-E/V statistic") {
    val users = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-01')").as("ed"),
        (col("event_type") === lit("purchase") && col("value") > 150).as("hit"))
      .collect().map(r => (r.getLong(0), r.getInt(1), !r.isNullAt(2) && r.getBoolean(2)))
      .groupBy(_._1).map { case (u, xs) =>
        val d0 = xs.map(_._2).min
        val p1 = xs.filter(_._3).map(_._2).minOption
        // death = first >150 purchase; else censored at last observed day
        (u % 2 == 0, p1.getOrElse(xs.map(_._2).max) - d0, p1.isDefined)
      }.toSeq
    // per-lifetime cells: (deaths, censored) per group
    val cells = users.groupBy(_._2)
      .map { case (t, xs) =>
        (t,
          xs.count(u => u._1 && u._3).toLong, xs.count(u => u._1 && !u._3).toLong,
          xs.count(u => !u._1 && u._3).toLong, xs.count(u => !u._1 && !u._3).toLong)
      }.toSeq.sortBy(_._1)
    var n1r = cells.map(c => c._2 + c._3).sum
    var n2r = cells.map(c => c._4 + c._5).sum
    var (o1, e1, v) = (0L, 0.0, 0.0)
    for ((_, e1c, x1c, e2c, x2c) <- cells) {
      val dj = e1c + e2c
      val nj = n1r + n2r
      if (dj > 0 && nj > 1) {
        o1 += e1c
        e1 += n1r.toDouble * dj / nj
        v += n1r.toDouble * n2r * dj * (nj - dj) / (nj.toDouble * nj * (nj - 1))
      }
      n1r -= e1c + x1c
      n2r -= e2c + x2c
    }
    val chi2 = math.pow(o1 - e1, 2) / v
    val r = SparkEntry.queries("q315_logrank")(spark, sf).collect().head
    r.getLong(0) shouldBe o1
    r.getDouble(1) shouldBe e1 +- 1e-6
    r.getDouble(2) shouldBe chi2 +- 1e-5
    r.getBoolean(3) shouldBe (chi2 > 3.841459)
  }

  test("q316 Tukey HSD: every pair matches the scalar Tukey-Kramer q") {
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2)) }
    val k = groups.size
    val nTot = groups.values.map(_.length).sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum
    }.sum
    val msw = ssw / (nTot - k)
    val stats = groups.map { case (p, g) => p -> (g.length, g.sum / g.length) }
    val rows = SparkEntry.queries("q316_tukey_hsd")(spark, sf).collect()
    rows.length shouldBe k * (k - 1) / 2
    for (r <- rows) {
      val (na, ma) = stats(r.getString(0))
      val (nb, mb) = stats(r.getString(1))
      val q = math.abs(ma - mb) / math.sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb))
      r.getString(0) should be < r.getString(1)
      r.getDouble(2) shouldBe (ma - mb) +- 1e-5
      r.getDouble(3) shouldBe q +- 1e-5
      r.getBoolean(4) shouldBe (q > 3.858296) // k = 5 studentized-range critical
    }
  }

  test("q317 Cochran-Armitage: matches the scalar dose-trend z") {
    val rows = Tables.orders(spark, sf)
      .select(expr("cast(substring(o_orderpriority, 1, 1) as int)"),
        col("o_totalprice").cast("decimal(18,2)"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1).doubleValue() > 250000.0))
    val n = rows.length.toLong
    val a = rows.count(_._2).toLong
    val cells = rows.groupBy(_._1).map { case (s, xs) =>
      (s.toLong, xs.length.toLong, xs.count(_._2).toLong)
    }
    val sns = cells.map { case (s, ni, _) => ni * s }.sum
    val sns2 = cells.map { case (s, ni, _) => ni * s * s }.sum
    val sas = cells.map { case (s, _, ai) => ai * s }.sum
    val tnum = sas.toDouble - a.toDouble * sns / n
    val p = a.toDouble / n
    val tvar = p * (1.0 - p) * (sns2.toDouble - sns.toDouble * sns / n)
    val z = tnum / math.sqrt(tvar)
    val r = SparkEntry.queries("q317_cochran_armitage")(spark, sf).collect().head
    r.getLong(0) shouldBe n
    r.getLong(1) shouldBe a
    r.getDouble(2) shouldBe z +- 1e-6
    r.getDouble(3) shouldBe z * z +- 1e-6
    r.getBoolean(4) shouldBe (z * z > 3.841459)
  }

  test("q318 Brier decomposition: matches scalar and the residual is the within-bin variance") {
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("value"), (col("event_type") === "purchase").cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val vmax = ev.map(_._1).max
    val n = ev.length
    val ps = ev.map { case (v, y) => (v / vmax, y) }
    val brier = ps.map { case (p, y) => (p - y) * (p - y) }.sum / n
    val ybar = ps.map(_._2).sum.toDouble / n
    val unc = ybar * (1.0 - ybar)
    val bins = ps.groupBy { case (p, _) => math.min(math.floor(p * 10).toInt, 9) }
    val rel = bins.values.map { b =>
      val conf = b.map(_._1).sum / b.size
      val acc = b.map(_._2).sum.toDouble / b.size
      b.size * (conf - acc) * (conf - acc)
    }.sum / n
    val res = bins.values.map { b =>
      val acc = b.map(_._2).sum.toDouble / b.size
      b.size * (acc - ybar) * (acc - ybar)
    }.sum / n
    // the within-bin forecast variance lost by binning, always >= 0
    val wbv = brier - (rel - res + unc)
    val r = SparkEntry.queries("q318_brier_decomp")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe brier +- 1e-6
    r.getDouble(2) shouldBe rel +- 1e-6
    r.getDouble(3) shouldBe res +- 1e-6
    r.getDouble(4) shouldBe unc +- 1e-6
    r.getDouble(5) shouldBe wbv +- 1e-5
    r.getDouble(5) should be >= -1e-9
  }
}
