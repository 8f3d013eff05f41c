package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula-level tests for the Science pack (q123–q133) on tiny
  * hand-computed fixtures — the DuckDB oracle proves ENGINE parity,
  * not formula correctness (both engines computing the same wrong
  * formula still hash-match), so every statistic here is checked
  * against either a hand-derived constant or an independent scalar
  * recompute in plain Scala math over the known fixture rows.
  *
  * The fixture tables are written as parquet into a temp dir and the
  * REAL `SparkEntry.queries` lambdas run against that dir — the same
  * code path the driver exercises, including Tables.events' ns→µs
  * timestamp conversion (ts is written as int64 nanoseconds).
  */
class ScienceSpec extends AnyFunSuite with Matchers with SharedSpark {

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sciencefx_").toString
    import spark.implicits._

    def ns(day: Int, hour: Int): Long = {
      val t = java.time.LocalDateTime.of(2024, 1, day, hour, 0, 0)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    }
    // view values (non-null): 1,2,2,3 · click values: 2,3,4 · plus one
    // purchase row and one NULL-value view row (the NULL contract).
    // Daily counts 2/3/4, per-user spread drives q127's DAU/WAU.
    Seq(
      (1L, ns(1, 1), 1L, "view", Option(1.0), "{}"),
      (2L, ns(1, 2), 2L, "view", Option(2.0), "{}"),
      (3L, ns(2, 1), 1L, "view", Option(2.0), "{}"),
      (4L, ns(2, 2), 3L, "click", Option(2.0), "{}"),
      (5L, ns(2, 3), 1L, "purchase", Option(9.0), "{}"),
      (6L, ns(3, 1), 4L, "view", Option(3.0), "{}"),
      (7L, ns(3, 2), 1L, "view", None: Option[Double], "{}"),
      (8L, ns(3, 3), 2L, "click", Option(3.0), "{}"),
      (9L, ns(3, 4), 3L, "click", Option(4.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // corpus of 5 docs: d1/d2 hit the fixed BM25 query terms
    // {spark, join, filter}; d4/d5 carry the src0-vs-src1 JSD tokens.
    Seq(
      (1L, "spark join spark", "en", "src2", 16L),
      (2L, "filter spark x", "en", "src2", 14L),
      (3L, "y z", "en", "src2", 3L),
      (4L, "a b b b", "en", "src1", 7L),
      (5L, "a a b", "en", "src0", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // first digits 1,1,2,1,3 after the <1 exclusion
    Seq(
      (1L, 1L, "O", 10.5), (2L, 1L, "O", 19.9), (3L, 2L, "O", 22.0),
      (4L, 2L, "O", 0.5), (5L, 3L, "O", 100.0), (6L, 3L, "F", 315.2)
    ).map { case (k, c, s0, p) =>
      (k, c, s0, p, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

    // customers 1-3 hold two orders each; customer 4 has none and must
    // land in q189's c_count=0 bucket via the LEFT join
    Seq(
      (1L, "cust1", 0L, 10.0, "SEG_A"), (2L, "cust2", 0L, 20.0, "SEG_A"),
      (3L, "cust3", 1L, 30.0, "SEG_B"), (4L, "cust4", 1L, 40.0, "SEG_B")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")

    // skyline of (max size, min price): only (size 3, price 9) survives
    // — (1,10) dominated by (2,9), (2,9) dominated by (3,9) via <=
    Seq(
      (1L, "p1", "B", "T", 1, 10.0), (2L, "p2", "B", "T", 1, 12.0),
      (3L, "p3", "B", "T", 2, 9.0), (4L, "p4", "B", "T", 3, 9.0),
      (5L, "p5", "B", "T", 3, 15.0), (6L, "p6", "B", "T", 2, 11.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    dir
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, fx)

  test("q179 source overlap: only intersecting source pairs appear, Jaccard exact") {
    // src0 {a,b} and src1 {a,b} are identical token sets (J=1); src2's
    // tokens are disjoint from both, so no src2 pair row exists.
    val r = q("q179_source_overlap").collect()
    r should have length 1
    r.head.getAs[String]("src_a") shouldBe "src0"
    r.head.getAs[String]("src_b") shouldBe "src1"
    r.head.getAs[Long]("inter") shouldBe 2L
    r.head.getAs[Double]("jaccard") shouldBe 1.0
  }

  test("q161 Kruskal–Wallis: H and tie correction match the hand-derived ranks") {
    // pooled sorted values 1,2,2,2,3,3,4,9 (view {1,2,2,3}, click
    // {2,3,4}, purchase {9}; NULL view row excluded). Midranks: 1→1,
    // 2→3, 3→5.5, 4→7, 9→8, so R = (12.5, 15.5, 8), N = 8.
    val r = q("q161_kruskal_wallis").collect()
    r should have length 1
    r.head.getAs[Long]("n1") shouldBe 4L
    r.head.getAs[Long]("n2") shouldBe 3L
    r.head.getAs[Long]("n3") shouldBe 1L
    val h = 12.0 / (8 * 9) *
      (12.5 * 12.5 / 4 + 15.5 * 15.5 / 3 + 8.0 * 8.0 / 1) - 3 * 9
    // ties: value 2 (t=3) and value 3 (t=2) → Σ(t³−t) = 24 + 6 = 30
    val c = 1.0 - 30.0 / (8.0 * 8 * 8 - 8)
    r.head.getAs[Double]("h_stat") shouldBe h +- 1e-6
    r.head.getAs[Double]("h_adj") shouldBe h / c +- 1e-6
  }

  test("q162 Brown–Forsythe: W = 0.5 by hand from the group medians") {
    // medians: view {1,2,2,3}→2, click {2,3,4}→3, purchase {9}→9.
    // |dev| sums: (2,2,0) over n=(4,3,1); z̄_g=(.5,2/3,0), z̄=.5;
    // num = 3·(1/6)² + 1·(.5)² = 1/3, den = 1 + 2/3 + 0 = 5/3;
    // W = ((8−3)/(3−1))·(1/3)/(5/3) = 0.5.
    val r = q("q162_levene").collect()
    r should have length 1
    r.head.getAs[Long]("n_total") shouldBe 8L
    r.head.getAs[Long]("k") shouldBe 3L
    r.head.getAs[Double]("w_stat") shouldBe 0.5 +- 1e-6
  }

  test("q167 SAX: segments, z-scores and symbols by hand (sd exactly 1)") {
    // daily counts 2/3/4 over 3 days: mean 3, sample sd 1; 3 days map
    // to segments 0/2/4 of 6; z = −1, 0, 1 → symbols a, c, d (z=0 is
    // NOT < 0, so it falls in the [0, 0.6745) 'c' band).
    val r = q("q167_sax").collect()
    r.map(_.getAs[Int]("seg")).toSeq shouldBe Seq(0, 2, 4)
    r.map(_.getAs[Long]("n_days")).toSeq shouldBe Seq(1L, 1L, 1L)
    r.map(_.getAs[Double]("paa_z")).toSeq shouldBe Seq(-1.0, 0.0, 1.0)
    r.map(_.getAs[String]("symbol")).toSeq shouldBe Seq("a", "c", "d")
  }

  test("q168 RFM: degenerate R/F plus a real monetary quartile split") {
    // all orders share one date → r=0, f=2 for every customer → scores
    // (4, 1, ·); monetary 30.4 / 22.5 / 415.2 → m-quartiles 26.45 /
    // 30.4 / 222.8 → m_scores 2 / 1 / 4.
    val r = q("q168_rfm").collect()
    r should have length 3
    r.foreach { row =>
      row.getAs[Int]("r_score") shouldBe 4
      row.getAs[Int]("f_score") shouldBe 1
      row.getAs[Long]("n_cust") shouldBe 1L
    }
    val byM = r.map(row => row.getAs[Int]("m_score") -> row.getAs[Double]("avg_monetary")).toMap
    byM(1) shouldBe 22.5 +- 1e-9
    byM(2) shouldBe 30.4 +- 1e-9
    byM(4) shouldBe 415.2 +- 1e-9
  }

  test("q189 Q13: order-less customers survive the LEFT join into the 0 bucket") {
    val rows = SparkEntry.queries("q189_sql_tpch_q13")(spark, fx).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    rows shouldBe Map(2L -> 3L, 0L -> 1L)
  }

  test("q192 two-proportion z: arms and statistic match an md5 recompute") {
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
    }
    // fixture events 1-9; event 5 is the only purchase
    val ids = (1L to 9L)
    val n1 = ids.count(arm(_) == 0); val n2 = 9 - n1
    val c1 = if (arm(5L) == 0) 1 else 0; val c2 = 1 - c1
    val (p1, p2) = (c1.toDouble / n1, c2.toDouble / n2)
    val pp = (c1 + c2).toDouble / 9
    val z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    val r = q("q192_prop_ztest").collect().head
    r.getAs[Long]("n1") shouldBe n1.toLong
    r.getAs[Long]("n2") shouldBe n2.toLong
    r.getAs[Long]("c1") shouldBe c1.toLong
    r.getAs[Long]("c2") shouldBe c2.toLong
    r.getAs[Double]("z_stat") shouldBe z +- 1e-6
  }

  test("q180 Grubbs: the 315.2 order is the outlier with the exact G") {
    val xs = Seq(10.5, 19.9, 22.0, 0.5, 100.0, 315.2)
    val n = xs.size
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val r = q("q180_grubbs").collect().head
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Long]("outlier_key") shouldBe 6L
    r.getAs[Double]("outlier_value") shouldBe 315.2 +- 1e-9
    r.getAs[Double]("g_stat") shouldBe ((315.2 - mean).abs / sd) +- 1e-6
  }

  test("q124 KS: D and statistic match the hand-derived ECDF gap") {
    // views {1,2,2,3} vs clicks {2,3,4}: ECDF gap peaks at v=2 with
    // |3/4 − 1/3| = 5/12; the NULL-value view row must be excluded
    val r = q("q124_ks_test").collect()
    r should have length 1
    r.head.getAs[Long]("n1") shouldBe 4L
    r.head.getAs[Long]("n2") shouldBe 3L
    r.head.getAs[Double]("ks_d") shouldBe (5.0 / 12) +- 1e-6
    r.head.getAs[Double]("ks_stat") shouldBe math.sqrt(12.0 / 7) * (5.0 / 12) +- 1e-6
  }

  test("q130 MWU: closed-form midranks reproduce the textbook U and z") {
    // pooled sorted {1,2,2,2,3,3,4} → midranks 1,3,3,3,5.5,5.5,7
    // view ranks 1+3+3+5.5 = 12.5 → U = 12.5 − 4·5/2 = 2.5
    val r = q("q130_mann_whitney").collect()
    r should have length 1
    r.head.getAs[Long]("n1") shouldBe 4L
    r.head.getAs[Long]("n2") shouldBe 3L
    r.head.getAs[Double]("rank_sum_view") shouldBe 12.5 +- 1e-6
    r.head.getAs[Double]("u_stat") shouldBe 2.5 +- 1e-6
    r.head.getAs[Double]("z_stat") shouldBe (2.5 - 6.0) / math.sqrt(8.0) +- 1e-6
  }

  test("q128 Welch: t = -sqrt(2), df = 27/7, and NULL values leave n") {
    // view {1,2,2,3}: m=2, s²=2/3 · click {2,3,4}: m=3, s²=1
    // t = −1/sqrt(1/6 + 1/3) = −sqrt(2); df = (1/2)²/((1/6)²/3 + (1/3)²/2)
    val r = q("q128_welch_ttest").collect()
    r should have length 1
    r.head.getAs[Long]("n1") shouldBe 4L // NOT 5: the NULL-value view row
    r.head.getAs[Long]("n2") shouldBe 3L
    r.head.getAs[Double]("mean_view") shouldBe 2.0 +- 1e-6
    r.head.getAs[Double]("mean_click") shouldBe 3.0 +- 1e-6
    r.head.getAs[Double]("t_stat") shouldBe -math.sqrt(2.0) +- 1e-6
    r.head.getAs[Double]("welch_df") shouldBe 27.0 / 7 +- 1e-6
  }

  test("q125 CUSUM: argmax |S_i| with earliest-day tie-break") {
    // daily counts 2/3/4, μ=3 → S = (−1, −1, 0): tie on |−1| → day 1
    val r = q("q125_changepoint").collect()
    r should have length 1
    r.head.getAs[java.sql.Date]("cp_day").toString shouldBe "2024-01-01"
    r.head.getAs[Long]("n_that_day") shouldBe 2L
    r.head.getAs[Double]("cusum") shouldBe -1.0 +- 1e-6
    r.head.getAs[Long]("n_days") shouldBe 3L
    r.head.getAs[Long]("n_events") shouldBe 9L
  }

  test("q132 Theil–Sen: median pairwise slope per type; singleton types drop") {
    // view daily 2,1,2 at i=0,1,2 → slopes {−1, 0, 1} → median 0
    // click daily 1,2 at i=1,2 → slope {1} · purchase has 1 day → absent
    val rows = q("q132_theil_sen").collect()
    rows.map(_.getAs[String]("et")).toSeq shouldBe Seq("click", "view")
    val byT = rows.map(r => r.getAs[String]("et") ->
      (r.getAs[Long]("n_pairs"), r.getAs[Double]("ts_slope"))).toMap
    byT("view")._1 shouldBe 3L
    byT("view")._2 shouldBe 0.0 +- 1e-6
    byT("click")._1 shouldBe 1L
    byT("click")._2 shouldBe 1.0 +- 1e-6
  }

  test("q127 rolling distinct: DAU and trailing-7d WAU per day") {
    val rows = q("q127_rolling_distinct").collect()
    rows.map(r => (r.getAs[java.sql.Date]("day").toString,
      r.getAs[Long]("dau"), r.getAs[Long]("wau7"))).toSeq shouldBe Seq(
      ("2024-01-01", 2L, 2L), // users {1,2}
      ("2024-01-02", 2L, 3L), // day: {1,3}; window: {1,2,3}
      ("2024-01-03", 4L, 4L)) // day: {1,2,3,4}; window: all
  }

  test("q129 Benford: digit shares and z vs an independent scalar recompute") {
    // digits 1,1,2,1,3 (0.5 excluded): counts 3/1/1 over n=5
    val rows = q("q129_benford").collect()
    val cnt = Map(1 -> 3L, 2 -> 1L, 3 -> 1L)
    rows.map(_.getAs[Int]("digit")).toSeq shouldBe Seq(1, 2, 3)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val exp = math.log(1.0 + 1.0 / d) / math.log(10.0)
      val obs = cnt(d).toDouble / 5
      r.getAs[Long]("cnt") shouldBe cnt(d)
      r.getAs[Long]("n") shouldBe 5L
      r.getAs[Double]("obs_share") shouldBe obs +- 1e-6
      r.getAs[Double]("benford_share") shouldBe exp +- 1e-6
      r.getAs[Double]("z_dev") shouldBe
        (obs - exp) / math.sqrt(exp * (1 - exp) / 5) +- 1e-6
    }
  }

  test("q131 JSD: divergence matches the scalar p·ln(p/m) recompute") {
    // src0 "a a b" vs src1 "a b b b": p=(2/3,1/3), q=(1/4,3/4)
    val r = q("q131_jsd_domains").collect()
    r should have length 1
    val jsd = Seq((2.0 / 3, 1.0 / 4), (1.0 / 3, 3.0 / 4)).map { case (p, qq) =>
      val m = (p + qq) / 2
      0.5 * (p * math.log(p / m) + qq * math.log(qq / m))
    }.sum
    r.head.getAs[Long]("n1") shouldBe 3L
    r.head.getAs[Long]("n2") shouldBe 4L
    r.head.getAs[Long]("vocab") shouldBe 2L
    r.head.getAs[Double]("jsd_nats") shouldBe jsd +- 1e-6
    r.head.getAs[Double]("jsd_bits") shouldBe jsd / math.log(2.0) +- 1e-6
  }

  test("q123 BM25: ranks and scores match the scalar Robertson formula") {
    // corpus: N=5 docs, sumdl=15, avgdl=3; df(spark)=2, df(join)=df(filter)=1
    val rows = q("q123_bm25").collect()
    def idf(df: Int) = math.log((5 - df + 0.5) / (df + 0.5) + 1.0)
    def ts(tf: Int, df: Int, dl: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    val d1 = ts(2, 2, 3) + ts(1, 1, 3) // "spark join spark"
    val d2 = ts(1, 2, 3) + ts(1, 1, 3) // "filter spark x"
    rows.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"))).toSeq shouldBe
      Seq((1, 1L), (2, 2L))
    rows(0).getAs[Double]("score") shouldBe d1 +- 1e-6
    rows(1).getAs[Double]("score") shouldBe d2 +- 1e-6
    rows.map(_.getAs[Long]("dl")).toSeq shouldBe Seq(3L, 3L)
  }

  test("q133 skyline: <=-dominance leaves exactly the (3, 9.0) corner") {
    val rows = q("q133_skyline").collect()
    rows.map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("p_size"),
      r.getAs[Double]("p_retailprice"))).toSeq shouldBe Seq((4L, 3, 9.0))
  }

  test("q126 ANN recall invariants on sf0.001: 20 probes, recall in [0,1], hits <= candidates") {
    val rows = SparkEntry.queries("q126_ann_recall")(spark, sf).collect()
    rows should have length 20
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      hit should be <= 10L
      hit should be <= r.getAs[Long]("n_cand")
      r.getAs[Double]("recall_at_10") shouldBe hit / 10.0 +- 1e-9
    }
  }
}
