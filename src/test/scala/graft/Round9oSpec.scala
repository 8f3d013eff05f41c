package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 fifteenth tranche (q352–q353;
  * q351's time travel is machine-checked in DsV2Spec: snapshot
  * immutability under overwrite, loud missing-version failure,
  * write-through-pin refusal).
  */
class Round9oSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q352 decayed scores match a scalar recompute; decay strictly discounts") {
    val evs = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts").cast("date").cast("string"), col("value"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val d0 = evs.map(_._2).maxBy(_.toEpochDay)
    val per = evs.groupBy(_._1).map { case (u, xs) =>
      val score = xs.map { case (_, d, v) =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, d0)
        v * math.exp(-math.log(2.0) * age / 7.0)
      }.sum
      val raw = xs.map(_._3).sum
      (u, xs.length.toLong, xs.map(x =>
        java.time.temporal.ChronoUnit.DAYS.between(x._2, d0)).min, score, raw)
    }.toSeq
    val top = per.sortBy { case (u, _, _, s0, _) => (-s0, u) }.take(15)
    val rows = SparkEntry.queries("q352_decay_score")(spark, sf).collect()
    rows.length shouldBe 15
    for ((r, (u, n, last, s0, raw)) <- rows.zip(top)) {
      r.getAs[Long]("user_id") shouldBe u
      r.getAs[Long]("n_events") shouldBe n
      r.getAs[Int]("days_since_last").toLong shouldBe last
      r.getAs[Double]("decayed_score") shouldBe s0 +- 1e-4
      // decay can only discount: score <= undecayed spend
      r.getAs[Double]("decayed_score") should be <= raw + 1e-9
    }
  }

  test("q353 Wilson CI matches a scalar recompute; Wilson brackets p-hat and stays in [0,1]") {
    val evs = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val z = 1.959964
    val rows = SparkEntry.queries("q353_wilson_ci")(spark, sf).collect()
    rows.length shouldBe 5
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val n = evs.count(_._1 == t).toDouble
      val x = evs.count(e => e._1 == t && e._2 > 100).toDouble
      val p = x / n
      val z2 = z * z
      val cen = (p + z2 / (2 * n)) / (1 + z2 / n)
      val hw = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n)
      r.getAs[Long]("n") shouldBe n.toLong
      r.getAs[Long]("x") shouldBe x.toLong
      r.getAs[Double]("p_hat") shouldBe p +- 1e-6
      r.getAs[Double]("wilson_lo") shouldBe cen - hw +- 1e-5
      r.getAs[Double]("wilson_hi") shouldBe cen + hw +- 1e-5
      // structural guarantees Wald lacks: bounds in [0,1], bracket p̂
      r.getAs[Double]("wilson_lo") should (be >= 0.0 and be <= p)
      r.getAs[Double]("wilson_hi") should (be <= 1.0 and be >= p)
    }
  }
}
