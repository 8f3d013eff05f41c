package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula-level tests for the Evaluation pack (q198–q204) on tiny
  * hand-computed fixtures — the oracle proves engine parity, not
  * formula correctness, so AUC/kappa/MCC/lift/ECE/Lorenz/TTR/PSI are
  * each checked against hand-derived constants (or an independent
  * plain-Scala recompute) over known fixture rows. The REAL
  * `SparkEntry.queries` lambdas run against the fixture dir.
  */
class EvaluationSpec extends AnyFunSuite with Matchers with SharedSpark {

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_evalfx_").toString
    import spark.implicits._

    def ns(day: Int, hour: Int): Long = {
      val t = java.time.LocalDateTime.of(2024, 1, day, hour, 0, 0)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    }
    // AUC fixture: neg (view) values {1,2}, pos (purchase) {2,3} →
    // pairwise wins 3 + 1 tie·½ = 3.5 of 4 → AUC 0.875. The click and
    // the NULL-value view exercise the type/null filters; days 1/2 vs
    // 20 split the PSI periods.
    Seq(
      (1L, ns(1, 1), 1L, "view", Option(1.0), "{}"),
      (2L, ns(1, 2), 2L, "view", Option(2.0), "{}"),
      (3L, ns(2, 1), 3L, "purchase", Option(2.0), "{}"),
      (4L, ns(20, 1), 4L, "purchase", Option(3.0), "{}"),
      (5L, ns(20, 2), 5L, "click", Option(2.0), "{}"),
      (6L, ns(1, 3), 1L, "view", None: Option[Double], "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // Rater fixture: A = n_chars >= 300, B = >= 55 tokens →
    // n11=2 (d1,d5), n10=1 (d3), n01=1 (d4), n00=1 (d2).
    // Token counts double as the q203 TTR corpus (hand-counted below).
    Seq(
      (1L, Seq.fill(60)("a").mkString(" "), "en", "s1", 400L),
      (2L, "a b a", "en", "s1", 100L),
      (3L, "c d", "en", "s2", 350L),
      (4L, Seq.fill(70)("e").mkString(" "), "en", "s2", 200L),
      (5L, Seq.fill(58)("f").mkString(" "), "en", "s2", 320L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // Pareto fixture: 10 customers, revenues 10..100 — every customer
    // lands in their own decile; total 550.
    (1 to 10).map { i =>
      (i.toLong, i.toLong, "O", i * 10.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

    dir
  }

  /** Second fixture (q205–q209): a perfect-line lineitem for the
    * train/test OLS, and 8 paired view/click days for the sign-flip,
    * effect-size and PACF series — kept separate so the q198–q204
    * hand computations above stay untouched.
    */
  private lazy val fx2: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_evalfx2_").toString
    import spark.implicits._

    def ns(day: Int, hour: Int): Long = {
      val t = java.time.LocalDateTime.of(2024, 1, day, hour, 0, 0)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    }
    // one view and one click per day, view − click = +1 every day →
    // t_obs = 1 exactly; the series a+b drives the PACF recompute; the
    // two day-20/21 pairs populate q212's second half-month.
    val days = Seq(1, 2, 3, 4, 5, 6, 7, 8, 20, 21)
    val a = Seq(2.0, 3.0, 4.0, 5.0, 4.0, 3.0, 2.0, 3.0, 4.0, 3.0)
    val b = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 2.0)
    days.zipWithIndex.flatMap { case (d, i) =>
      Seq((d * 10L, ns(d, 1), d.toLong, "view", Option(a(i)), "{}"),
        (d * 10L + 1, ns(d, 2), d.toLong, "click", Option(b(i)), "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // q210 corpus: 3 correct predictions, d4 defaults to 'en' on zero
    // hits (true fr), d5's French stopwords flip a true-de doc to fr.
    Seq(
      (1L, "the a of", "en", "s", 8L),
      (2L, "der und ist", "de", "s", 11L),
      (3L, "el los y", "es", "s", 8L),
      (4L, "xyz", "fr", "s", 3L),
      (5L, "le les", "de", "s", 6L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // y = 2x + 3 exactly on every row → any md5 split trains the true
    // line and evaluates with zero residual. 40 rows so q219's
    // three-way split leaves ≥9 calibration rows (the minimum for a
    // finite 90% conformal radius).
    (1 to 40).map { i =>
      (i.toLong, i % 10 + 1, (i % 10 + 1).toDouble, 2.0 * (i % 10 + 1) + 3.0)
    }.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(key: String) = SparkEntry.queries(key)(spark, fx)
  private def run2(key: String) = SparkEntry.queries(key)(spark, fx2)

  private def md5mod(s0: String, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16) % m
  }

  test("q205: train/test OLS on a perfect line recovers it with zero residual") {
    val r = run2("q205_regression_eval").collect()(0)
    (r.getAs[Long]("n_train") + r.getAs[Long]("n_test")) shouldBe 40L
    r.getAs[Double]("slope") shouldBe 2.0
    r.getAs[Double]("icept") shouldBe 3.0
    r.getAs[Double]("rmse") shouldBe 0.0
    r.getAs[Double]("mae") shouldBe 0.0
    r.getAs[Double]("r2") shouldBe 1.0
  }

  test("q206: sign-flip test — t_obs exact, p matches an independent md5 recompute") {
    val r = run2("q206_sign_flip").collect()(0)
    r.getAs[Long]("n_days") shouldBe 10L
    r.getAs[Double]("t_obs") shouldBe 1.0
    // recompute the 200 flip means with the same md5 signs
    val days = Seq(1, 2, 3, 4, 5, 6, 7, 8, 20, 21).map(d => f"2024-01-$d%02d")
    val nGe = (1 to 200).count { bb =>
      val t = days.map { day =>
        if (md5mod(s"sf|$bb|$day", 2) == 0) -1.0 else 1.0
      }.sum / 10.0
      math.abs(t) >= 1.0
    }
    r.getAs[Long]("n_ge") shouldBe nGe.toLong
    // 1-ULP slack: Spark's Round goes through BigDecimal.decimal
    // (shortest-repr) while the recompute rounds the exact expansion
    r.getAs[Double]("p_value") shouldBe ((1.0 + nGe) / 201.0).round6 +- 1e-9
  }

  test("q207: Cohen's d / Hedges' g match the closed-form recompute") {
    val a = Seq(2.0, 3.0, 4.0, 5.0, 4.0, 3.0, 2.0, 3.0, 4.0, 3.0)
    val b = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 2.0)
    def v(x: Seq[Double]) = {
      val m = x.sum / x.size
      x.map(e => (e - m) * (e - m)).sum / (x.size - 1)
    }
    val sp = math.sqrt(((a.size - 1) * v(a) + (b.size - 1) * v(b)) / (a.size + b.size - 2))
    val d = (a.sum / a.size - b.sum / b.size) / sp
    val r = run2("q207_effect_size").collect()(0)
    r.getAs[Long]("n1") shouldBe 10L
    r.getAs[Long]("n2") shouldBe 10L
    r.getAs[Double]("cohens_d") shouldBe d.round6 +- 1e-6
    r.getAs[Double]("hedges_g") shouldBe ((1.0 - 3.0 / (4.0 * 20 - 9.0)) * d).round6 +- 1e-6
    val se = math.sqrt(20.0 / 100.0 + d * d / 40.0)
    r.getAs[Double]("ci_lo") shouldBe (d - 1.96 * se).round6 +- 1e-6
    r.getAs[Double]("ci_hi") shouldBe (d + 1.96 * se).round6 +- 1e-6
  }

  test("q208: count-min estimates match a definitional sketch recompute and never undercount") {
    val counts = Map("a" -> 62L, "b" -> 1L, "c" -> 1L, "d" -> 1L, "e" -> 70L, "f" -> 58L)
    val cells = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((tok, c) <- counts; r <- 0 to 3) {
      val k = (r.toLong, md5mod(s"$r|$tok", 1024))
      cells(k) = cells.getOrElse(k, 0L) + c
    }
    val expected = counts.map { case (tok, c) =>
      tok -> (0 to 3).map(r => cells((r.toLong, md5mod(s"$r|$tok", 1024)))).min
    }
    // raw estimates via the helper (the query surface now emits the
    // oracle-able CM-bound boolean instead of the estimates)
    val rows = ops.Evaluation.countMinRaw(spark, fx).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("true_c"), r.getAs[Long]("est_c"))).toMap
    rows.keySet shouldBe counts.keySet
    for ((tok, (tc, ec)) <- rows) {
      tc shouldBe counts(tok)
      ec shouldBe expected(tok)
      ec should be >= tc // CM never undercounts
      (ec - tc) should be <= (4L * counts.values.sum / 1024 + 1)
    }
    // and the query surface's cm_ok bool holds on every emitted row
    val surf = run("q208_countmin").collect()
    surf.length should be > 0
    surf.foreach(r => r.getAs[Boolean]("cm_ok") shouldBe true)
  }

  test("q209: PACF(1..3) matches a Durbin-Levinson recompute over the daily series") {
    val series = Seq(3.0, 5.0, 7.0, 9.0, 7.0, 5.0, 3.0, 5.0, 7.0, 5.0) // a+b per day
    def corrLag(k: Int): Double = {
      val x = series.drop(k); val y = series.dropRight(k)
      val (mx, my) = (x.sum / x.size, y.sum / y.size)
      val num = x.zip(y).map { case (xi, yi) => (xi - mx) * (yi - my) }.sum
      num / math.sqrt(x.map(e => (e - mx) * (e - mx)).sum * y.map(e => (e - my) * (e - my)).sum)
    }
    val (r1, r2, r3) = (corrLag(1), corrLag(2), corrLag(3))
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p2)
    val p3 = (r3 - p21 * r2 - p2 * r1) / (1.0 - p21 * r1 - p2 * r2)
    val r = run2("q209_pacf").collect()(0)
    r.getAs[Double]("pacf1") shouldBe r1.round6 +- 1e-6
    r.getAs[Double]("pacf2") shouldBe p2.round6 +- 1e-6
    r.getAs[Double]("pacf3") shouldBe p3.round6 +- 1e-6
  }

  test("q198: AUC via rank-sum matches the pairwise-wins hand count (ties = 1/2)") {
    val r = run("q198_roc_auc").collect()(0)
    r.getAs[Long]("n_pos") shouldBe 2L
    r.getAs[Long]("n_neg") shouldBe 2L
    r.getAs[Double]("auc") shouldBe 0.875
    r.getAs[Double]("gini_idx") shouldBe 0.75
  }

  test("q198: AUC equals the brute-force pairwise definition on 5 seeded random datasets") {
    // the rank-sum identity vs the DEFINITION (wins + ties/2 over all
    // pos×neg pairs) — ties included on purpose: values draw from a
    // small integer grid so midranks actually matter
    val rnd = new scala.util.Random(7)
    for (case_ <- 1 to 5) {
      val rows = (1 to 30).map { i =>
        val isPos = rnd.nextBoolean()
        (i.toLong, if (isPos) "purchase" else "view", (rnd.nextInt(6) + 1).toDouble)
      }
      if (rows.exists(_._2 == "purchase") && rows.exists(_._2 == "view")) {
        val dir = java.nio.file.Files.createTempDirectory(s"graft_aucprop${case_}_").toString
        locally {
          import spark.implicits._
          rows.map { case (id, t, v) =>
            (id, 1704067200000000000L + id * 1000000000L, id, t, Option(v), "{}")
          }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(1).write.parquet(s"$dir/events.parquet")
        }
        val pos = rows.filter(_._2 == "purchase").map(_._3)
        val neg = rows.filter(_._2 == "view").map(_._3)
        val wins = (for (p <- pos; n <- neg) yield {
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0
        }).sum
        val want = (wins / (pos.size.toDouble * neg.size)).round6
        val r = SparkEntry.queries("q198_roc_auc")(spark, dir).collect()(0)
        withClue(s"case $case_: ") {
          r.getAs[Long]("n_pos") shouldBe pos.size.toLong
          r.getAs[Long]("n_neg") shouldBe neg.size.toLong
          r.getAs[Double]("auc") shouldBe want +- 1e-6
        }
      }
    }
  }

  test("q199: kappa and MCC match the hand-computed confusion matrix") {
    val r = run("q199_rater_agreement").collect()(0)
    (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) shouldBe ((2L, 1L, 1L, 1L))
    r.getAs[Double]("po") shouldBe 0.6
    r.getAs[Double]("pe") shouldBe 0.52
    // kappa = (0.6-0.52)/0.48 = 1/6; mcc = (2·1−1·1)/√(3·2·3·2) = 1/6
    r.getAs[Double]("kappa") shouldBe 0.166667
    r.getAs[Double]("mcc") shouldBe 0.166667
  }

  test("q200: decile lift on values {1,2,2,2,3} — boundaries interpolated on 5 points") {
    val rows = run("q200_decile_lift").collect()
      .map(r => r.getAs[Int]("decile") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("lift"), r.getAs[Double]("cum_capture"))).toMap
    // quantile_cont deciles of [1,2,2,2,3] = [1.4,1.8,2,2,2,2,2,2.2,2.6]
    // → v=1 ⇒ decile 1, v=2 ⇒ 3, v=3 ⇒ 10; global rate 2/5
    rows.keySet shouldBe Set(1, 3, 10)
    rows(1) shouldBe ((1L, 0L, 0.0, 1.0))
    rows(3)._1 shouldBe 3L
    rows(3)._2 shouldBe 1L
    rows(3)._3 shouldBe 0.833333 // (1/3)/(2/5)
    rows(3)._4 shouldBe 1.0
    rows(10) shouldBe ((1L, 1L, 2.5, 0.5))
  }

  test("q201: reliability bins and ECE match the hand computation") {
    val rows = run("q201_calibration").collect()
      .map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("conf"),
          r.getAs[Double]("acc"), r.getAs[Double]("ece"))).toMap
    // vmax=3 → p ∈ {1/3, 2/3·(×3), 1} → bins 3, 6, 9
    rows.keySet shouldBe Set(3, 6, 9)
    rows(3)._2 shouldBe 0.333333
    rows(3)._3 shouldBe 0.0
    rows(6)._1 shouldBe 3L
    rows(6)._2 shouldBe 0.666667
    rows(6)._3 shouldBe 0.333333
    rows(9)._2 shouldBe 1.0
    rows(9)._3 shouldBe 1.0
    // ECE = (1/5)·(1/3) + (3/5)·(1/3) + (1/5)·0 = 4/15 = 0.266667
    rows(3)._4 shouldBe 0.266667
  }

  test("q202: Lorenz deciles on revenues 10..100 — one customer per decile") {
    val rows = run("q202_pareto_revenue").collect()
      .map(r => r.getAs[Int]("decile") ->
        (r.getAs[Long]("n_cust"), r.getAs[Double]("revenue"),
          r.getAs[Double]("share"), r.getAs[Double]("cum_share_from_top"))).toMap
    rows.keySet shouldBe (1 to 10).toSet
    rows.values.foreach(_._1 shouldBe 1L)
    rows(10)._2 shouldBe 100.0
    rows(10)._3 shouldBe (100.0 / 550).round6
    rows(9)._4 shouldBe (190.0 / 550).round6 // top 20% hold 34.5%
    rows(1)._4 shouldBe 1.0
  }

  test("q203: TTR and hapax share match hand counts per source") {
    val rows = run("q203_lexical_stats").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("types"), r.getAs[Long]("tokens"),
          r.getAs[Long]("hapax"), r.getAs[Double]("ttr"),
          r.getAs[Double]("hapax_share"))).toMap
    // s1: "a"×62 + "b"×1 → 2 types / 63 tokens / 1 hapax
    rows("s1") shouldBe ((2L, 63L, 1L, (2.0 / 63).round6, 0.5))
    // s2: c:1 d:1 e:70 f:58 → 4 types / 130 tokens / 2 hapax
    rows("s2") shouldBe ((4L, 130L, 2L, (4.0 / 130).round6, 0.5))
  }

  test("q204: PSI matches an independent plain-Scala recompute of the smoothed terms") {
    val rows = run("q204_psi_drift").collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Double]("psi_term"), r.getAs[Double]("psi")))
    // Period A (days ≤15): values {1,2,2}; B: {3,2}. Deciles of A put
    // v=1 in bin 1, v=2 in bin 5, v=3 in bin 10.
    rows.map(r => (r._1, r._2, r._3)).toSet shouldBe
      Set((1, 1L, 0L), (5, 2L, 1L), (10, 0L, 1L))
    val expected = rows.map { r =>
      val p1 = (r._2 + 0.5) / (3 + 5.0); val p2 = (r._3 + 0.5) / (2 + 5.0)
      BigDecimal((p1 - p2) * math.log(p1 / p2))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    rows.map(_._4) should contain theSameElementsAs
      expected.map(t => (t.toDouble).round6)
    val psiTotal = expected.sum.toDouble.round6
    rows.foreach(_._5 shouldBe psiTotal)
    psiTotal should be > 0.0
  }

  test("q210: per-class P/R/F1, accuracy and macro-F1 match the hand confusion") {
    val rows = run2("q210_classifier_eval").collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_pred"), r.getAs[Long]("tp"),
          r.getAs[Double]("prec"), r.getAs[Double]("recall"), r.getAs[Double]("f1"),
          r.getAs[Double]("accuracy"), r.getAs[Double]("macro_f1"))).toMap
    // (lang,pred): (en,en) (de,de) (es,es) (fr,en) (de,fr)
    rows.keySet shouldBe Set("en", "de", "es", "fr")
    rows("en") ._1 shouldBe 1L; rows("en")._2 shouldBe 2L; rows("en")._3 shouldBe 1L
    rows("en")._4 shouldBe 0.5; rows("en")._5 shouldBe 1.0; rows("en")._6 shouldBe 0.666667
    rows("de")._4 shouldBe 1.0; rows("de")._5 shouldBe 0.5; rows("de")._6 shouldBe 0.666667
    rows("es")._6 shouldBe 1.0
    rows("fr")._4 shouldBe 0.0; rows("fr")._5 shouldBe 0.0; rows("fr")._6 shouldBe 0.0
    rows("en")._7 shouldBe 0.6 // accuracy 3/5
    // macro = (2/3 + 2/3 + 1 + 0)/4 with DECIMAL(28,12)-quantized terms
    rows("en")._8 shouldBe 0.583333
  }

  test("q211: SRM chi-square matches an independent md5 arm recompute") {
    val ids = Seq(1, 2, 3, 4, 5, 6, 7, 8, 20, 21).flatMap(d => Seq(d * 10L, d * 10L + 1))
    val obs = ids.groupBy(id => md5mod(id.toString, 10)).view.mapValues(_.size.toLong).toMap
    val exp = ids.size / 10.0
    val chi2 = obs.values.map { n =>
      BigDecimal((n - exp) * (n - exp) / exp).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val rows = run2("q211_srm_check").collect()
    rows.map(_.getAs[Long]("n_obs")).sum shouldBe 20L
    rows.map(r => r.getAs[Int]("arm") -> r.getAs[Long]("n_obs")).toMap shouldBe
      obs.map { case (k, v) => k.toInt -> v }
    rows.foreach { r =>
      r.getAs[Double]("expected") shouldBe 2.0
      r.getAs[Double]("chi2") shouldBe chi2.round6 +- 1e-6
    }
  }

  test("q212: BH step-up over the two-type family — ranks, criticals, rejection monotone") {
    val rows = run2("q212_bh_fdr").collect()
    rows should have length 2 // only view/click exist in fx2
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    byRank.map(_.getAs[Int]("rank")).toSeq shouldBe Seq(1, 2)
    byRank(0).getAs[Double]("bh_crit") shouldBe 0.025
    byRank(1).getAs[Double]("bh_crit") shouldBe 0.05
    // p sorted ascending by construction
    assert(byRank(0).getAs[Double]("p_value") <= byRank(1).getAs[Double]("p_value"))
    byRank.foreach { r =>
      val p = r.getAs[Double]("p_value")
      p should be >= 0.0
      p should be <= 1.0
      r.getAs[Long]("n1") shouldBe 8L
      r.getAs[Long]("n2") shouldBe 2L
    }
    // rejection is a prefix of the ranking (BH step-up property)
    val rej = byRank.map(_.getAs[Boolean]("rejected"))
    if (rej(1)) rej(0) shouldBe true
  }

  /** Third fixture (q216): 40 twelve-token docs with overlapping
    * vocabulary, so the md5 90/10 split yields val docs whose 8-grams
    * are a mix of seen and novel — the spec recomputes the whole
    * readout definitionally in plain Scala. */
  private lazy val fx3: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_evalfx3_").toString
    import spark.implicits._
    fx3Docs.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }
  private lazy val fx3Docs: Seq[(Long, String)] =
    (1 to 40).map(i => (i.toLong, (i until i + 12).map(n => "t" + (n % 15)).mkString(" ")))

  test("q213: per-type decile map — medians and shifts by hand") {
    val rows = run2("q213_quantile_map").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("q")) ->
        (r.getAs[Double]("group_q"), r.getAs[Double]("global_q"), r.getAs[Double]("shift"))).toMap
    rows should have size 18 // 2 types x 9 deciles
    // view values [2,2,3,3,3,3,4,4,4,5] → median 3; pooled median 3
    rows(("view", 0.5)) shouldBe ((3.0, 3.0, 0.0))
    // click values [1,1,2,2,2,2,3,3,3,4] → median 2, shift −1
    rows(("click", 0.5)) shouldBe ((2.0, 3.0, -1.0))
  }

  test("q214: jackknife CV replicates match the closed-form plain-Scala recompute") {
    val xs = Seq(3.0, 5.0, 7.0, 9.0, 7.0, 5.0, 3.0, 5.0, 7.0, 5.0)
    val n = xs.size
    val (s1, s2) = (xs.sum, xs.map(x => x * x).sum)
    val cvI = xs.map { x =>
      val m = (s1 - x) / (n - 1)
      math.sqrt((s2 - x * x - (n - 1) * m * m) / (n - 2)) / m
    }
    def q12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val (sc, sc2) = (cvI.map(q12).sum.toDouble, cvI.map(c => q12(c * c)).sum.toDouble)
    val mFull = s1 / n
    val cvFull = math.sqrt((s2 - n * mFull * mFull) / (n - 1)) / mFull
    val cvBar = sc / n
    val r = run2("q214_jackknife_cv").collect()(0)
    r.getAs[Long]("n_days") shouldBe n.toLong
    r.getAs[Double]("cv") shouldBe cvFull.round6 +- 1e-6
    r.getAs[Double]("cv_bias_corrected") shouldBe (n * cvFull - (n - 1) * cvBar).round6 +- 1e-6
    r.getAs[Double]("se_jack") shouldBe
      math.sqrt((n - 1.0) / n * (sc2 - n * cvBar * cvBar)).round6 +- 1e-6
  }

  test("q215: MDE closed form on the purchase-free fixture degenerates cleanly") {
    val r = run2("q215_power_mde").collect()(0)
    (r.getAs[Long]("n1") + r.getAs[Long]("n2")) shouldBe 20L
    r.getAs[Double]("base_rate") shouldBe 0.0
    r.getAs[Double]("se") shouldBe 0.0
    r.getAs[Double]("mde_abs") shouldBe 0.0
    assert(r.isNullAt(r.fieldIndex("mde_rel"))) // no conversions observed
  }

  test("q216: novelty rate matches a definitional plain-Scala recompute of the split + grams") {
    def grams(text: String): Set[Long] = {
      val w = text.split(" ").filter(_.nonEmpty)
      // 15 hex chars < 2^60, so no modulus is needed for set identity
      w.sliding(8).filter(_.length == 8).map { g =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(d.substring(0, 15), 16)
      }.toSet
    }
    val byDoc = fx3Docs.map { case (id, text) =>
      (id, md5mod(id.toString, 10), grams(text))
    }
    val train = byDoc.filter(_._2 < 9).flatMap(_._3).toSet
    val valDocs = byDoc.filter(_._2 >= 9).filter(_._3.nonEmpty)
    valDocs should not be empty // fixture guarantees a populated val split
    val nG = valDocs.map(_._3.size).sum
    val nNov = valDocs.map(d => d._3.count(!train(_))).sum
    val r = SparkEntry.queries("q216_ngram_novelty")(spark, fx3).collect()(0)
    r.getAs[Long]("n_val_docs") shouldBe valDocs.size.toLong
    r.getAs[Long]("n_grams") shouldBe nG.toLong
    r.getAs[Long]("n_novel") shouldBe nNov.toLong
    r.getAs[Double]("novelty_rate") shouldBe (nNov.toDouble / nG).round6 +- 1e-6
  }

  test("q218: CUPED theta and variance reduction match the closed-form recompute") {
    // per-user (pre, post): users 1-8 have x=a+b on their day, y=0;
    // users 20/21 have x=0, y=a+b
    val pre = Seq(3.0, 5.0, 7.0, 9.0, 7.0, 5.0, 3.0, 5.0).map((_, 0.0))
    val post = Seq(7.0, 5.0).map((0.0, _))
    val u = pre ++ post
    val n = u.size
    val (sx, sy) = (u.map(_._1).sum, u.map(_._2).sum)
    val sxy = u.map(p => p._1 * p._2).sum
    val (sxx, syy) = (u.map(p => p._1 * p._1).sum, u.map(p => p._2 * p._2).sum)
    val dx = n * sxx - sx * sx
    val cv = n * sxy - sx * sy
    val theta = cv / dx
    val varY = (syy - sy * sy / n) / (n - 1)
    val varAdj = varY - theta * cv / (n.toDouble * (n - 1))
    val r = run2("q218_cuped").collect()(0)
    r.getAs[Long]("n_users") shouldBe n.toLong
    r.getAs[Double]("theta") shouldBe theta.round6 +- 1e-6
    r.getAs[Double]("mean_post") shouldBe (sy / n).round6 +- 1e-6
    r.getAs[Double]("var_post") shouldBe varY.round6 +- 1e-6
    r.getAs[Double]("var_cuped") shouldBe varAdj.round6 +- 1e-6
    r.getAs[Double]("var_reduction") shouldBe (1.0 - varAdj / varY).round6 +- 1e-6
    r.getAs[Double]("var_reduction") should be > 0.0 // pre explains some post variance
  }

  test("q219: conformal on the perfect line — zero radius, full coverage, parts partition") {
    val r = run2("q219_conformal").collect()(0)
    (r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") + r.getAs[Long]("n_test")) shouldBe 40L
    r.getAs[Long]("n_cal") should be >= 9L
    r.getAs[Long]("n_test") should be > 0L
    // y = 2x+3 exactly → every |residual| = 0 → q̂ = 0 and the interval
    // still covers every test point (explicit non-null first: a NULL
    // would also unbox to 0.0 through getAs[Double])
    r.isNullAt(r.fieldIndex("qhat")) shouldBe false
    r.getAs[Double]("qhat") shouldBe 0.0
    r.getAs[Double]("coverage") shouldBe 1.0
    r.getAs[Double]("interval_width") shouldBe 0.0
  }

  test("q219: a calibration set below 9 rows yields NULL radius/coverage, not zero") {
    // 12 rows → md5 %3 parts: train {4,6,11} (3), cal {3,8,9,10} (4),
    // test {1,2,5,7,12} (5); ⌈(4+1)·0.9⌉ = 5 > 4 ⇒ no finite 90% radius
    val dir = java.nio.file.Files.createTempDirectory("graft_evalfx4_").toString
    locally {
      import spark.implicits._
      (1 to 12).map { i =>
        (i.toLong, i % 10 + 1, (i % 10 + 1).toDouble, 2.0 * (i % 10 + 1) + 3.0)
      }.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    }
    val r = SparkEntry.queries("q219_conformal")(spark, dir).collect()(0)
    r.getAs[Long]("n_train") shouldBe 3L
    r.getAs[Long]("n_cal") shouldBe 4L
    r.getAs[Long]("n_test") shouldBe 5L
    r.isNullAt(r.fieldIndex("qhat")) shouldBe true
    r.isNullAt(r.fieldIndex("coverage")) shouldBe true
    r.isNullAt(r.fieldIndex("interval_width")) shouldBe true
  }

  private implicit class R6(val d: Double) {
    def round6: Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
