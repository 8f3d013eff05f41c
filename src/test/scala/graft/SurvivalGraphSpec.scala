package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula tests for q171 (Kaplan–Meier), q173 (cohort LTV) and q174
  * (degree assortativity) on fixtures built so the statistics are
  * hand-derivable: an 8-day activity window with real deaths AND real
  * censoring (the driver's 30-day corpus censors nearly everyone, so
  * the oracle alone never exercises the death branch), and a 3-node
  * path graph whose assortativity is exactly −1.
  */
class SurvivalGraphSpec extends AnyFunSuite with Matchers with SharedSpark {

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmfx_").toString
    import spark.implicits._

    def ns(day: Int, hour: Int): Long = {
      val t = java.time.LocalDateTime.of(2024, 1, day, hour, 0, 0)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    }
    // lifetimes (d0→d1, dmax=8, censor horizon = last 3 days):
    //   A 1→8 censored t=7 · B 1→2 death t=1 · C 1→4 death t=3
    //   D 2→3 death t=1   · E 7→7 censored t=0 · F 1→6 censored t=5
    // purchases: B day2 ×5.0 (cohort 0, age 0), A day8 ×7.0 (age 1)
    Seq(
      (1L, ns(1, 1), 1L, "view", Option(1.0), "{}"),
      (2L, ns(8, 1), 1L, "purchase", Option(7.0), "{}"),
      (3L, ns(1, 2), 2L, "view", Option(2.0), "{}"),
      (4L, ns(2, 2), 2L, "purchase", Option(5.0), "{}"),
      (5L, ns(1, 3), 3L, "view", Option(1.0), "{}"),
      (6L, ns(4, 3), 3L, "click", Option(2.0), "{}"),
      (7L, ns(2, 4), 4L, "view", Option(1.0), "{}"),
      (8L, ns(3, 4), 4L, "click", Option(3.0), "{}"),
      (9L, ns(7, 5), 5L, "view", Option(2.0), "{}"),
      (10L, ns(1, 6), 6L, "view", Option(1.0), "{}"),
      (11L, ns(6, 6), 6L, "click", Option(4.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // path graph via shared 5-word shingles: d1–d2 share "a b c d e",
    // d2–d3 share "b c d e y1", d1–d3 share nothing.
    Seq(
      (1L, "a b c d e x1 x2", "en", "src0", 15L),
      (2L, "a b c d e y1 y2", "en", "src0", 15L),
      (3L, "b c d e y1 z1", "en", "src0", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q171 Kaplan–Meier: at-risk counts and product-limit steps by hand") {
    // S: t0 1.0 (censor only) · t1 ×(1−2/5)=0.6 · t3 ×(1−1/3)=0.4 ·
    // t5/t7 censoring leaves S at 0.4
    val r = SparkEntry.queries("q171_survival_km")(spark, fx).collect()
    r.map(_.getAs[Int]("t")).toSeq shouldBe Seq(0, 1, 3, 5, 7)
    r.map(_.getAs[Long]("n_risk")).toSeq shouldBe Seq(6L, 5L, 3L, 2L, 1L)
    r.map(_.getAs[Long]("deaths")).toSeq shouldBe Seq(0L, 2L, 1L, 0L, 0L)
    r.map(_.getAs[Long]("censored_n")).toSeq shouldBe Seq(1L, 0L, 0L, 1L, 1L)
    val s = r.map(_.getAs[Double]("survival")).toSeq
    s(0) shouldBe 1.0 +- 1e-6
    s(1) shouldBe 0.6 +- 1e-6
    s(2) shouldBe 0.4 +- 1e-6
    s(3) shouldBe 0.4 +- 1e-6
    s(4) shouldBe 0.4 +- 1e-6
  }

  test("q173 cohort LTV: revenue lands in the right age cell and accumulates") {
    // one cohort week; B's 5.0 at age 0, A's 7.0 at age 1 (day 8 is the
    // 8th day of A's life → (8−1)/7 = 1); 6 users active at age 0.
    val r = SparkEntry.queries("q173_cohort_ltv")(spark, fx).collect()
    r should have length 2
    r.map(_.getAs[Int]("cohort_week")).distinct.toSeq shouldBe Seq(0)
    val a0 = r.find(_.getAs[Int]("age_week") == 0).get
    a0.getAs[Long]("n_users") shouldBe 6L
    a0.getAs[Double]("revenue") shouldBe 5.0 +- 1e-9
    a0.getAs[Double]("cum_revenue") shouldBe 5.0 +- 1e-9
    val a1 = r.find(_.getAs[Int]("age_week") == 1).get
    a1.getAs[Long]("n_users") shouldBe 1L
    a1.getAs[Double]("revenue") shouldBe 7.0 +- 1e-9
    a1.getAs[Double]("cum_revenue") shouldBe 12.0 +- 1e-9
  }

  test("q175 containment flags the subset pair Jaccard-only dedup ranks low") {
    // d2 (3 shingles) ⊇-ish d3 (2 shingles, 1 shared): C(d3→d2) = 1/2
    // hits the 0.5 gate while Jaccard is only 1/4; d1–d2 (1 of 3+3)
    // stays below on both containments.
    val r = SparkEntry.queries("q175_containment")(spark, fx).collect()
    r should have length 1
    r.head.getAs[Long]("doc_a") shouldBe 2L
    r.head.getAs[Long]("doc_b") shouldBe 3L
    r.head.getAs[Double]("cont_a_in_b") shouldBe (1.0 / 3) +- 1e-6
    r.head.getAs[Double]("cont_b_in_a") shouldBe 0.5 +- 1e-6
  }

  test("q186 RANGE frame skips calendar gaps a ROWS frame would span") {
    // views land on days 1(×4), 2, 7: the trailing-3-day sum at day 7
    // must be 1 (days 5–7 hold nothing else), while a ROWS 2-PRECEDING
    // frame would have dragged in day 1+2; at day 2 it's 4+1=5.
    val r = SparkEntry.queries("q186_range_window")(spark, fx).collect()
      .filter(_.getAs[String]("et") == "view")
      .map(row => row.getAs[java.sql.Date]("day").toString -> row.getAs[Long]("n_3day"))
      .toMap
    r("2024-01-01") shouldBe 4L
    r("2024-01-02") shouldBe 5L
    r("2024-01-07") shouldBe 1L
  }

  test("q188 time-to-convert: the two converting users by hand") {
    // u1 first view d1 01:00 → purchase d8 01:00 (604800 s); u2 first
    // view d1 02:00 → purchase d2 02:00 (86400 s); 6 viewers total.
    val r = SparkEntry.queries("q188_time_to_convert")(spark, fx).collect().head
    r.getAs[Long]("n_viewed") shouldBe 6L
    r.getAs[Long]("n_converted") shouldBe 2L
    r.getAs[Double]("p25_s") shouldBe 216000.0 +- 1e-6
    r.getAs[Double]("p50_s") shouldBe 345600.0 +- 1e-6
    r.getAs[Double]("p75_s") shouldBe 475200.0 +- 1e-6
    r.getAs[Double]("mean_s") shouldBe 345600.0 +- 1e-6
  }

  test("q193 seasonal decompose: the one full-window day by hand") {
    // 7 daily cells (days 1,2,3,4,6,7,8) → only day 4 has a full ±3-row
    // frame; trend = 11/7, det = 1 − 11/7 = −4/7, its weekday group is
    // a singleton so seasonal = det and the residual is exactly 0.
    val r = SparkEntry.queries("q193_seasonal_decompose")(spark, fx).collect()
    r should have length 1
    r.head.getAs[java.sql.Date]("day").toString shouldBe "2024-01-04"
    r.head.getAs[Double]("trend") shouldBe (11.0 / 7) +- 1e-6
    r.head.getAs[Double]("seasonal") shouldBe (1.0 - 11.0 / 7) +- 1e-6
    r.head.getAs[Double]("residual") shouldBe 0.0 +- 1e-9
  }

  test("q182 regression diagnostics match an independent OLS recompute") {
    // daily counts on the fixture: x=(0,1,2,3,5,6,7), y=(4,2,1,1,1,1,1)
    val pts = Seq((0, 4L), (1, 2L), (2, 1L), (3, 1L), (5, 1L), (6, 1L), (7, 1L))
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1 * p._2.toDouble).sum
    val syy = pts.map(p => p._2.toDouble * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val xbar = sx / n
    val sxxc = sxx - sx * sx / n
    val s2e = (syy - icept * sy - slope * sxy) / (n - 2)
    val diag = pts.map { case (x, y) =>
      val e = y - (icept + slope * x)
      val h = 1.0 / n + (x - xbar) * (x - xbar) / sxxc
      (x, e * e * h / (2.0 * s2e * (1.0 - h) * (1.0 - h)))
    }.sortBy { case (x, d) => (-d, x) }.take(5)

    val r = SparkEntry.queries("q182_regression_diag")(spark, fx).collect()
    r should have length 5
    r.map(_.getAs[Double]("cooks_d")).zip(diag.map(_._2)).foreach {
      case (got, want) => got shouldBe want +- 1e-6
    }
  }

  test("q190 minhash estimates match an exact md5 signature recompute") {
    val p = 1000000007L
    def tokHash(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % p
    }
    def sig(text: String): Seq[Long] = {
      val hs = text.split(" ").filter(_.nonEmpty).distinct.map(tokHash)
      (0 until 16).map(i => hs.map(h => ((2 * i + 3) * h + (5 * i + 7)) % p).min)
    }
    val texts = Map(1L -> "a b c d e x1 x2", 2L -> "a b c d e y1 y2", 3L -> "b c d e y1 z1")
    def est(a: Long, b: Long): Double =
      sig(texts(a)).zip(sig(texts(b))).count { case (x, y) => x == y } / 16.0

    val r = SparkEntry.queries("q190_minhash_eval")(spark, fx).collect()
    r.map(row => (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))).toSet shouldBe
      Set((1L, 2L), (2L, 3L))
    r.foreach { row =>
      val want = est(row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))
      row.getAs[Double]("mh_est") shouldBe want +- 1e-9
      row.getAs[Double]("abs_err") shouldBe
        (want - row.getAs[Double]("jaccard")).abs +- 1e-6
    }
  }

  test("q174 assortativity of a path graph is exactly -1") {
    val r = SparkEntry.queries("q174_assortativity")(spark, fx).collect().head
    r.getAs[Long]("n_nodes") shouldBe 3L
    r.getAs[Long]("n_edges_directed") shouldBe 4L
    r.getAs[Double]("assortativity") shouldBe -1.0 +- 1e-9
  }
}
