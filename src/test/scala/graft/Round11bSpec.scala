package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-11 second-widening keys
  * (q386 MMD, q387 Yule–Walker, q388 readability).
  */
class Round11bSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def q2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The daily (type, sum-of-2dp-values) contraction both q386 and the
    * spec recompute from raw events — 2dp rounding applied per value
    * exactly like CAST(value AS DECIMAL(18,2)).
    */
  private def dailySums(types: Set[String]): Map[(String, String), Double] =
    Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type").as("t"), col("value"))
      .collect()
      .filter(r => types.isEmpty || types(r.getString(1)))
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(rs => rs.map(r => BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      .toMap

  test("q386 MMD² matches a scalar recompute of the RBF kernel sums") {
    val daily = dailySums(Set("view", "click"))
    val xs = daily.collect { case ((_, "view"), v) => v }.toSeq
    val ys = daily.collect { case ((_, "click"), v) => v }.toSeq
    val all = xs ++ ys
    val nn = all.size
    val sv = all.map(BigDecimal(_)).sum.toDouble
    val sv2 = all.map(v => BigDecimal(v * v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val sigma2 = (sv2 - sv * sv / nn) / (nn - 1)
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def kern(a: Double, b: Double) = q12(math.exp(-((a - b) * (a - b)) / (2.0 * sigma2)))
    val sxx = (for (i <- xs.indices; j <- xs.indices if i != j) yield kern(xs(i), xs(j))).sum
    val syy = (for (i <- ys.indices; j <- ys.indices if i != j) yield kern(ys(i), ys(j))).sum
    val sxy = (for (x <- xs; y <- ys) yield kern(x, y)).sum
    val m = xs.size.toDouble
    val n = ys.size.toDouble
    val mmd2 = sxx.toDouble / (m * (m - 1)) + syy.toDouble / (n * (n - 1)) -
      2.0 * sxy.toDouble / (m * n)

    val row = SparkEntry.queries("q386_mmd_rbf")(spark, sf).collect().head
    row.getAs[Long]("m") shouldBe xs.size.toLong
    row.getAs[Long]("n") shouldBe ys.size.toLong
    row.getAs[Double]("sigma2") shouldBe sigma2 +- 1e-3
    row.getAs[Double]("kxx") shouldBe sxx.toDouble / (m * (m - 1)) +- 1e-7
    row.getAs[Double]("kyy") shouldBe syy.toDouble / (n * (n - 1)) +- 1e-7
    row.getAs[Double]("kxy") shouldBe sxy.toDouble / (m * n) +- 1e-7
    row.getAs[Double]("mmd2") shouldBe mmd2 +- 1e-7
    // kernel sanity: each normalized kernel mean sits in (0, 1]
    Seq("kxx", "kyy", "kxy").foreach { c =>
      row.getAs[Double](c) should be > 0.0
      row.getAs[Double](c) should be <= 1.0
    }
  }

  test("q387 Yule–Walker AR(2) matches the closed form over the daily series") {
    val daily = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(rs => rs.map(r => BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.size
    val mu = daily.map(BigDecimal(_)).sum.toDouble / n
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def cov(k: Int): Double =
      (k until n).map(t => q6((daily(t) - mu) * (daily(t - k) - mu))).sum.toDouble
    val (c0, c1, c2) = (cov(0), cov(1), cov(2))
    val r1 = c1 / c0
    val r2 = c2 / c0
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val forecast = mu + phi1 * (daily(n - 1) - mu) + phi2 * (daily(n - 2) - mu)

    val row = SparkEntry.queries("q387_yule_walker")(spark, sf).collect().head
    row.getAs[Long]("n_days") shouldBe n.toLong
    row.getAs[Double]("mean_v") shouldBe mu +- 1e-3
    row.getAs[Double]("r1") shouldBe r1 +- 1e-5
    row.getAs[Double]("r2") shouldBe r2 +- 1e-5
    row.getAs[Double]("phi1") shouldBe phi1 +- 1e-5
    row.getAs[Double]("phi2") shouldBe phi2 +- 1e-5
    row.getAs[Double]("forecast") shouldBe forecast +- 1e-2
    // stationarity sanity on a mixing daily series: |r1| < 1, AR(2)
    // coefficients inside the stationary triangle
    math.abs(row.getAs[Double]("r1")) should be < 1.0
    (row.getAs[Double]("phi2") + row.getAs[Double]("phi1")) should be < 1.0
    (row.getAs[Double]("phi2") - row.getAs[Double]("phi1")) should be < 1.0
  }

  test("q393 stream semi join ≡ batch EXISTS, and is pair-suppressing vs q90's inner join") {
    val semi = SparkEntry.queries("q393_stream_semi_join")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_views")).toMap
    // batch EXISTS ground truth recomputed in Spark over the same table
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getString(2)))
    val clicks = ev.filter(_._3 == "click").groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val exp = ev.filter(_._3 == "view").filter { case (u, t, _) =>
      clicks.getOrElse(u, Array.empty[java.time.LocalDateTime]).exists(c =>
        c.isAfter(t) && !c.isAfter(t.plusMinutes(30)))
    }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    semi shouldBe exp
    // semi emits each view at most once → per-user count ≤ the inner
    // join's pair count (pair suppression, the operator's point)
    val pairs = SparkEntry.queries("q90_stream_join")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_pairs")).toMap
    semi.foreach { case (u, n) => n should be <= pairs(u) }
  }

  test("q394 silhouette: full corpus coverage, scores in [0, 1), runner-up beats own cell") {
    val rows = SparkEntry.queries("q394_silhouette")(spark, sf).collect()
    rows.map(_.getAs[Long]("n_vecs")).sum shouldBe
      Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      // centroid-form silhouette: a = own (min) distance, so s ∈ [0, 1)
      r.getAs[Double]("min_sil") should be >= 0.0
      r.getAs[Double]("max_sil") should be < 1.0
      r.getAs[Double]("mean_sil") should (be >= r.getAs[Double]("min_sil")
        and be <= r.getAs[Double]("max_sil"))
    }
    // k = 10 trained cells, all non-empty on this corpus
    rows.length shouldBe 10
  }

  test("q396 cluster extraction is consistent with q381's cells and conserves vectors") {
    val rows = SparkEntry.queries("q396_hdbscan_clusters")(spark, sf).collect()
    val mst = SparkEntry.queries("q381_hdbscan_cells")(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vecs")).toMap
    rows.length shouldBe mst.size // same cells, nothing dropped
    rows.foreach { r =>
      val (cell, n) = (r.getAs[Long]("cell"), r.getAs[Long]("n_vecs"))
      n shouldBe mst(cell) // identical cell assignment across both stages
      val (k, noise, maxc) = (r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_noise"), r.getAs[Long]("max_cluster"))
      // conservation: clustered + noise = cell population; min size 3
      (n - noise) should be >= 3L * k
      if (k > 0) {
        maxc should be >= 3L
        maxc should be <= n - noise
      } else {
        noise shouldBe n
        maxc shouldBe 0L
      }
    }
    // the ε cut must actually split: not every cell may be one cluster
    // covering everything, and at least one real cluster must exist
    rows.map(_.getAs[Long]("n_clusters")).sum should be >= 1L
    rows.map(_.getAs[Long]("n_noise")).sum should be >= 1L
  }

  test("q399 PR-AUC matches a scalar trapezoid over the tied-score curve") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase") && col("value").isNotNull)
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val blocks = ev.groupBy(_._1).view
      .mapValues(rs => (rs.count(!_._2), rs.count(_._2)))
      .toSeq.sortBy(-_._1) // descending score
    val nPos = blocks.map(_._2._2).sum.toDouble
    val nNeg = blocks.map(_._2._1).sum.toDouble
    var (tp, fp) = (0L, 0L)
    var (prevPrec, area) = (1.0, BigDecimal(0))
    blocks.foreach { case (_, (c1, c2)) =>
      tp += c2; fp += c1
      val prec = tp.toDouble / (tp + fp)
      area += BigDecimal((c2 / nPos) * (prec + prevPrec) / 2.0)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      prevPrec = prec
    }
    val row = SparkEntry.queries("q399_pr_auc")(spark, sf).collect().head
    row.getAs[Long]("n_pos") shouldBe nPos.toLong
    row.getAs[Long]("n_neg") shouldBe nNeg.toLong
    row.getAs[Double]("pr_auc") shouldBe area.toDouble +- 1e-5
    // PR-AUC of a random scorer ≈ prevalence; the curve must dominate
    // chance here and lift must agree with the ratio
    row.getAs[Double]("prevalence") shouldBe nPos / (nPos + nNeg) +- 1e-6
    row.getAs[Double]("lift") shouldBe
      (area.toDouble / (nPos / (nPos + nNeg))) +- 1e-3
    row.getAs[Double]("pr_auc") should be > 0.0
    row.getAs[Double]("pr_auc") should be <= 1.0
  }

  test("q401 threshold tuning matches a scalar profit sweep over every cutoff") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase") && col("value").isNotNull)
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val cutoffs = ev.map(_._1).distinct.sorted
    val best = cutoffs.map { t =>
      val tp = ev.count { case (v, p) => p && v >= t }
      val fp = ev.count { case (v, p) => !p && v >= t }
      (t, tp, fp, 5L * tp - fp)
    }.maxBy { case (t, _, _, pr) => (pr, -t) }
    val row = SparkEntry.queries("q401_threshold_tuning")(spark, sf).collect().head
    row.getAs[Double]("threshold") shouldBe
      BigDecimal(best._1).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    row.getAs[Long]("tp") shouldBe best._2.toLong
    row.getAs[Long]("fp") shouldBe best._3.toLong
    row.getAs[Long]("profit") shouldBe best._4
    // the chosen point must beat the trivial all-positive/none policies
    val nPos = ev.count(_._2).toLong
    val nNeg = ev.size - nPos
    best._4 should be >= 5L * nPos - nNeg
    best._4 should be >= 0L
    row.getAs[Long]("fn") shouldBe nPos - best._2
    row.getAs[Long]("tn") shouldBe nNeg - best._3
  }

  test("q402 Fleiss kappa matches the closed form over hand-computed votes") {
    val docs = Tables.documents(spark, sf).select("n_chars", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1).filter(_.nonEmpty)
        Seq(r.getAs[Number]("n_chars").longValue >= 300,
          toks.length >= 55, toks.distinct.length >= 45).count(identity)
      }
    val n = docs.length.toDouble
    val pPos = docs.sum / (3 * n)
    val pBar = docs.map(c => c * (c - 1) + (3 - c) * (2 - c)).sum / (6 * n)
    val pE = pPos * pPos + (1 - pPos) * (1 - pPos)
    val row = SparkEntry.queries("q402_fleiss_kappa")(spark, sf).collect().head
    row.getAs[Long]("n_docs") shouldBe docs.length.toLong
    row.getAs[Long]("n_unanimous_pos") shouldBe docs.count(_ == 3).toLong
    row.getAs[Long]("n_unanimous_neg") shouldBe docs.count(_ == 0).toLong
    row.getAs[Double]("p_pos") shouldBe pPos +- 1e-6
    row.getAs[Double]("p_bar") shouldBe pBar +- 1e-6
    row.getAs[Double]("fleiss_kappa") shouldBe (pBar - pE) / (1 - pE) +- 1e-5
    // correlated length lenses must agree above chance on this corpus
    row.getAs[Double]("fleiss_kappa") should be > 0.0
  }

  test("q404 Weibull fit matches a scalar median-rank regression over inter-event gaps") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { rs =>
      val o = rs.sortBy(r => (r._3, r._2)).map(_._3)
      o.sliding(2).collect { case Array(a, b) => (b - a) / 60000000L }
    }.toSeq
    val dropped = gaps.count(_ == 0L)
    val cells = gaps.filter(_ >= 1).groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    val n = cells.map(_._2).sum.toDouble
    def q12(v: Double) = BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var i = 0L
    val pts = cells.map { case (t, d) =>
      i += d
      (math.log(t.toDouble), math.log(-math.log(1.0 - (i - 0.3) / (n + 0.4))))
    }
    val m = pts.size.toDouble
    val sx = pts.map(p => q12(p._1)).sum.toDouble
    val sy = pts.map(p => q12(p._2)).sum.toDouble
    val sxy = pts.map(p => q12(p._1 * p._2)).sum.toDouble
    val sxx = pts.map(p => q12(p._1 * p._1)).sum.toDouble
    val k = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val b = (sy - k * sx) / m
    val row = SparkEntry.queries("q404_weibull_fit")(spark, sf).collect().head
    row.getAs[Long]("n_gaps") shouldBe n.toLong
    row.getAs[Long]("n_dropped") shouldBe dropped.toLong
    row.getAs[Long]("n_cells") shouldBe pts.size.toLong
    row.getAs[Double]("shape_k") shouldBe k +- 1e-5
    row.getAs[Double]("scale_lambda") shouldBe math.exp(-b / k) +- 1e-2
    // a sane renewal fit: positive shape near the exponential regime
    // and a linearization that explains most of the variance
    row.getAs[Double]("shape_k") should be > 0.0
    row.getAs[Double]("r2") should be > 0.9
  }

  test("q388 readability matches per-document regex counts recomputed in Scala") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def countGroups(s: String, pat: String): Long =
      pat.r.findAllIn(s).size.toLong
    case class D(lang: String, words: Long, syl: Long, sent: Long)
    val per = docs.map { case (lang, text) =>
      val t = text.toLowerCase.replaceAll("[^a-z ]", " ")
      D(lang, countGroups(t, "[a-z]+"), countGroups(t, "[aeiouy]+"),
        math.max(1L, countGroups(text, "[.!?]+")))
    }.filter(_.words >= 1)
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp = per.groupBy(_.lang).map { case (lang, ds) =>
      val ease = ds.map(d => q6(206.835 - 1.015 * (d.words.toDouble / d.sent)
        - 84.6 * (d.syl.toDouble / d.words))).sum.toDouble / ds.size
      val grade = ds.map(d => q6(0.39 * (d.words.toDouble / d.sent)
        + 11.8 * (d.syl.toDouble / d.words) - 15.59)).sum.toDouble / ds.size
      lang -> (ds.size.toLong, ds.map(_.words).sum, ds.map(_.syl).sum, ease, grade)
    }
    val rows = SparkEntry.queries("q388_readability")(spark, sf).collect()
    rows.length shouldBe exp.size
    rows.foreach { r =>
      val (nd, w, syl, ease, grade) = exp(r.getAs[String]("lang"))
      r.getAs[Long]("n_docs") shouldBe nd
      r.getAs[Long]("n_words") shouldBe w
      r.getAs[Long]("n_syllables") shouldBe syl
      r.getAs[Double]("mean_ease") shouldBe ease +- 1e-3
      r.getAs[Double]("mean_grade") shouldBe grade +- 1e-3
      // unpunctuated corpus: the degenerate sentence count is exactly
      // the documented behavior, not an accident
      per.filter(_.lang == r.getAs[String]("lang")).forall(_.sent == 1L) shouldBe true
    }
  }
}
