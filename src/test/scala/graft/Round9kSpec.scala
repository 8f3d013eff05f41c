package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes + cross-checks for the round-9 eleventh tranche
  * (q339–q341).
  */
class Round9kSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def md5arm(s0: String, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
  }

  /** Zelen–Severo two-sided p with the query's literals. */
  private def p2(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    2.0 * (0.3989422804014327 * math.exp(-(z * z) / 2.0) *
      (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
        - 1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t))
  }

  test("q339 SemDeDup: bills are consistent and cell sizes equal the kmeans key's cells") {
    val rows = SparkEntry.queries("q339_semdedup")(spark, sf)
      .orderBy(col("cell")).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    rows.map(_.getAs[Long]("n_vecs")).sum shouldBe nVecs // cells partition the corpus
    rows.foreach { r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") shouldBe r.getAs[Long]("n_vecs")
      r.getAs[Double]("drop_rate") shouldBe
        (r.getAs[Long]("n_dropped").toDouble / r.getAs[Long]("n_vecs")) +- 1e-6
      // keep-lowest-id can never drop everything: the lowest id survives
      r.getAs[Long]("n_kept") should be >= 1L
    }
    // τ=0.35 must actually cut at this SF — an all-kept bill is vacuous
    rows.map(_.getAs[Long]("n_dropped")).sum should be > 0L
    // same index as q65: cell populations must agree cell-for-cell
    val km = SparkEntry.queries("q65_kmeans_train")(spark, sf)
      .orderBy(col("cid")).collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("n_vecs"))).toMap
    rows.foreach { r =>
      km(r.getAs[Int]("cell")) shouldBe r.getAs[Long]("n_vecs")
    }
  }

  test("q340 Dunn matches a scalar midrank recompute") {
    val data = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase") && col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = data.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.length }
    val groups = Seq("view", "click", "purchase")
    val n = groups.map(g => g -> data.count(_._1 == g).toLong).toMap
    val mr = groups.map(g => g -> {
      val xs = data.filter(_._1 == g).map(x => rankOf(x._2))
      xs.sum / xs.length
    }).toMap
    val nt = data.length.toDouble
    val ties = data.map(_._2).groupBy(identity).values
      .map(v => v.length.toDouble).map(t => t * t * t - t).sum
    val s2 = nt * (nt + 1) / 12.0 - ties / (12.0 * (nt - 1))
    val rows = SparkEntry.queries("q340_dunn_posthoc")(spark, sf)
      .orderBy(col("group_a"), col("group_b")).collect()
    rows.length shouldBe 3
    for (r <- rows) {
      val (a, b) = (r.getAs[String]("group_a"), r.getAs[String]("group_b"))
      r.getAs[Long]("n_a") shouldBe n(a)
      r.getAs[Long]("n_b") shouldBe n(b)
      r.getAs[Double]("mean_rank_a") shouldBe mr(a) +- 1e-4
      r.getAs[Double]("mean_rank_b") shouldBe mr(b) +- 1e-4
      val z = (mr(a) - mr(b)) / math.sqrt(s2 * (1.0 / n(a) + 1.0 / n(b)))
      r.getAs[Double]("z_stat") shouldBe z +- 1e-4
      r.getAs[Double]("p_value") shouldBe p2(z) +- 1e-4
      r.getAs[Boolean]("reject_bonf") shouldBe (p2(z) < 0.05 / 3)
    }
  }

  test("q341 TOST matches a scalar recompute; equivalence iff the 90% CI is inside the margin") {
    val xs = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("value")).collect()
      .map(r => (md5arm(r.getLong(0).toString, 2),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    def st(arm: Long) = {
      val v = xs.filter(_._1 == arm).map(_._2)
      val m = v.sum / v.length
      (v.length.toLong, m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1) / v.length)
    }
    val (n0, m0, v0) = st(0); val (n1, m1, v1) = st(1)
    val se = math.sqrt(v0 + v1)
    val d = m1 - m0
    val r = SparkEntry.queries("q341_tost_equivalence")(spark, sf).collect().head
    r.getAs[Long]("n0") shouldBe n0
    r.getAs[Long]("n1") shouldBe n1
    r.getAs[Double]("diff") shouldBe d +- 1e-5
    r.getAs[Double]("se") shouldBe se +- 1e-5
    r.getAs[Double]("z_lower") shouldBe (d + 2.0) / se +- 1e-4
    r.getAs[Double]("z_upper") shouldBe (d - 2.0) / se +- 1e-4
    val ciIn = d - 1.644854 * se > -2.0 && d + 1.644854 * se < 2.0
    r.getAs[Boolean]("equivalent_margin2") shouldBe ciIn
    // CI formulation and z formulation are the SAME decision
    ((d + 2.0) / se > 1.644854 && (d - 2.0) / se < -1.644854) shouldBe ciIn
  }
}
