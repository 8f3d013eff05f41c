package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 ninth tranche (q333–q334; q335's
  * clustered V2 write is machine-checked in DsV2Spec: shard count,
  * key-disjointness, in-file ordering).
  */
class Round9iSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def md5mod(s: String, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
  }

  test("q333 JM bigram LM matches a scalar train/held-out recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val (ho, train) = docs.partition { case (id, _) => md5mod(id.toString, 10) == 0 }
    ho should not be empty   // the fixture must actually exercise the split
    train should not be empty
    val uc = train.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bigN = uc.values.sum
    val bigV = uc.size.toLong
    val bc = train.flatMap(_._2.sliding(2).filter(_.length == 2).map(w => (w(0), w(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = ho.filter(_._2.length >= 2).map { case (id, w) =>
      val nlls = w.sliding(2).filter(_.length == 2).map { bg =>
        val pBi = bc.get((bg(0), bg(1))) match {
          case Some(cb) if uc.contains(bg(0)) => cb.toDouble / uc(bg(0))
          case _ => 0.0
        }
        val p = 0.7 * pBi + 0.3 * (uc.getOrElse(bg(1), 0L) + 1.0) / (bigN + bigV + 1.0)
        -math.log(p)
      }.toSeq
      (id, nlls.size.toLong, nlls.sum / nlls.size)
    }.sortBy(_._1)
    val rows = SparkEntry.queries("q333_jm_bigram_lm")(spark, sf).collect()
    rows.length shouldBe expected.length
    for ((r, (id, nb, avg)) <- rows.zip(expected)) {
      r.getAs[Long]("doc_id") shouldBe id
      r.getAs[Long]("n_bigrams") shouldBe nb
      r.getAs[Double]("avg_nll") shouldBe avg +- 1e-6
      r.getAs[Double]("ppl") shouldBe math.exp(avg) +- 1e-4
      // the JM floor keeps every probability strictly positive
      r.getAs[Double]("avg_nll") should be > 0.0
    }
  }

  test("q334 Gumbel fit matches a scalar block-maxima recompute") {
    val daily = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(max(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .collect().map(_.getDouble(1))
    val nd = daily.length
    val m = daily.sum / nd
    val sd = math.sqrt(daily.map(x => (x - m) * (x - m)).sum / (nd - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = m - 0.5772156649015329 * beta
    val rl30 = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
    val pex = 1.0 - math.exp(-math.exp(-(daily.max - mu) / beta))
    val r = SparkEntry.queries("q334_gumbel_maxima")(spark, sf).collect().head
    r.getAs[Long]("n_days") shouldBe nd.toLong
    r.getAs[Double]("mean_max") shouldBe m +- 1e-6
    r.getAs[Double]("sd_max") shouldBe sd +- 1e-6
    r.getAs[Double]("gumbel_mu") shouldBe mu +- 1e-6
    r.getAs[Double]("gumbel_beta") shouldBe beta +- 1e-6
    r.getAs[Double]("return_level_30d") shouldBe rl30 +- 1e-5
    r.getAs[Double]("p_exceed_observed_max") shouldBe pex +- 1e-6
    // the 30-day return level sits ABOVE the fitted location: ln(-ln(1-1/30)) < 0
    r.getAs[Double]("return_level_30d") should be > r.getAs[Double]("gumbel_mu")
  }
}
