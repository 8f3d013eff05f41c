package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 seventh tranche (q326–q328;
  * q325's streaming read is machine-checked in DsV2Spec: batch count,
  * admission control, kill-and-resume).
  */
class Round9gSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q326 KM-Greenwood: matches the scalar product-limit curve, SEs, and log-log CIs") {
    val users = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-01')").as("ed"),
        (col("event_type") === lit("purchase") && col("value") > 150).as("hit"))
      .collect().map(r => (r.getLong(0), r.getInt(1), !r.isNullAt(2) && r.getBoolean(2)))
      .groupBy(_._1).values.map { xs =>
        val d0 = xs.map(_._2).min
        val p1 = xs.filter(_._3).map(_._2).minOption
        // NOT .map on the Map itself: a Tuple2-valued map would collapse
        // users with equal (t, death) into one entry
        (p1.getOrElse(xs.map(_._2).max) - d0, p1.isDefined)
      }.toSeq
    val cells = users.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = users.size.toLong
    var (lnS, g) = (0.0, 0.0)
    var dead = false
    val expected = cells.map { case (t, d, c) =>
      val nr = atRisk
      if (d > 0 && d < nr) {
        lnS += math.log(1.0 - d.toDouble / nr)
        g += d.toDouble / (nr.toDouble * (nr - d))
      }
      if (d >= nr) dead = true
      atRisk -= d + c
      val s = if (dead) 0.0 else math.exp(lnS)
      val se = if (dead) None else Some(math.exp(lnS) * math.sqrt(g))
      val ci = if (!dead && lnS < 0.0) {
        val tau = math.sqrt(g) / (-lnS)
        Some((math.exp(math.exp(1.959964 * tau) * lnS),
          math.exp(math.exp(-1.959964 * tau) * lnS)))
      } else None
      (t, nr, d, c, s, se, ci)
    }
    val rows = SparkEntry.queries("q326_km_greenwood")(spark, sf).collect()
    rows.length shouldBe expected.length
    for ((r, (t, nr, d, c, s, se, ci)) <- rows.zip(expected)) {
      r.getInt(0) shouldBe t
      r.getLong(1) shouldBe nr
      (r.getLong(2), r.getLong(3)) shouldBe ((d, c))
      r.getDouble(4) shouldBe s +- 1e-6
      se match {
        case Some(v) => r.getDouble(5) shouldBe v +- 1e-6
        case None => r.isNullAt(5) shouldBe true
      }
      ci match {
        case Some((lo, hi)) =>
          r.getDouble(6) shouldBe lo +- 1e-6
          r.getDouble(7) shouldBe hi +- 1e-6
          // the interval brackets the point estimate
          r.getDouble(6) should be <= s
          r.getDouble(7) should be >= s
        case None =>
          r.isNullAt(6) shouldBe true
          r.isNullAt(7) shouldBe true
      }
    }
  }

  test("q327 Cronbach alpha: matches the scalar item/total variance decomposition") {
    val cells = Tables.events(spark, sf)
      .select(col("ts").cast("date").cast("string"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case ((d, t), xs) => (d, t, xs.size.toLong) }.toSeq
    val days = cells.map(_._1).distinct
    val nd = days.size
    val types = cells.map(_._2).distinct
    val k = types.size
    def svar(xs: Seq[Long]): Double = {
      // absent cells are genuine zeros: pad to all nd days
      val full = xs ++ Seq.fill(nd - xs.size)(0L)
      val m = full.sum.toDouble / nd
      full.map(x => (x - m) * (x - m)).sum / (nd - 1)
    }
    val sumVar = types.map(t => svar(cells.filter(_._2 == t).map(_._3))).sum
    val totals = days.map(d => cells.filter(_._1 == d).map(_._3).sum)
    val mt = totals.sum.toDouble / nd
    val varT = totals.map(x => (x - mt) * (x - mt)).sum / (nd - 1)
    val alpha = k.toDouble / (k - 1) * (1.0 - sumVar / varT)
    val r = SparkEntry.queries("q327_cronbach_alpha")(spark, sf).collect().head
    r.getLong(0) shouldBe k.toLong
    r.getLong(1) shouldBe nd.toLong
    r.getDouble(2) shouldBe sumVar +- 1e-5
    r.getDouble(3) shouldBe varT +- 1e-5
    r.getDouble(4) shouldBe alpha +- 1e-5
  }

  test("q328 periodogram: matches the scalar DFT powers and Fisher's g") {
    val y = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    val n = y.length
    val nf = (n - 1) / 2
    val ps = (1 to nf).map { k =>
      val sc = y.zipWithIndex.map { case (v, i) => v * math.cos(2.0 * math.Pi * k * i / n) }.sum
      val ss = y.zipWithIndex.map { case (v, i) => v * math.sin(2.0 * math.Pi * k * i / n) }.sum
      (k, sc * sc + ss * ss)
    }
    val ptot = ps.map(_._2).sum
    val (kStar, pMax) = ps.minBy { case (k, p) => (-p, k) }
    val g = pMax / ptot
    val pf = nf * math.exp((nf - 1) * math.log(1.0 - g))
    val r = SparkEntry.queries("q328_periodogram")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getLong(1) shouldBe nf.toLong
    r.getInt(2) shouldBe kStar
    r.getDouble(3) shouldBe pMax +- 1e-3
    r.getDouble(4) shouldBe g +- 1e-6
    r.getDouble(5) shouldBe pf +- 1e-6
    // g is a share of total power
    r.getDouble(4) should (be >= 0.0 and be <= 1.0)
  }
}
