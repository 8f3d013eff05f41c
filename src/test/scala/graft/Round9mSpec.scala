package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 thirteenth tranche (q345–q347).
  */
class Round9mSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q345 NB fit matches a scalar per-user recompute with explicit zero cells") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = evs.map(_._1).distinct
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = SparkEntry.queries("q345_negbin_fit")(spark, sf)
      .orderBy(col("event_type")).collect()
    rows.length shouldBe 5
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      types should contain(t)
      val counts = users.map(u => evs.count(e => e._1 == u && e._2 == t).toDouble)
      val n = counts.length
      val m = counts.sum / n
      val v = counts.map(c => (c - m) * (c - m)).sum / (n - 1)
      r.getAs[Long]("n_users") shouldBe n.toLong
      r.getAs[Double]("mean_c") shouldBe m +- 1e-5
      r.getAs[Double]("var_c") shouldBe v +- 1e-5
      r.getAs[Double]("p0_obs") shouldBe counts.count(_ == 0.0).toDouble / n +- 1e-6
      if (v > m) {
        val rr = m * m / (v - m)
        r.getAs[Double]("nb_r") shouldBe rr +- 1e-3
        r.getAs[Double]("p0_pred") shouldBe math.exp(-rr * math.log1p(m / rr)) +- 1e-5
      } else {
        // under-dispersed: the fit columns must be NULL, not garbage
        r.isNullAt(r.fieldIndex("nb_r")) shouldBe true
        r.isNullAt(r.fieldIndex("p0_pred")) shouldBe true
      }
    }
  }

  test("q346 backtest matches a scalar lag recompute; both methods share one eval window") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    val idx = 7 until daily.length
    val en = idx.map(i => math.abs(daily(i) - daily(i - 1)))
    val es = idx.map(i => math.abs(daily(i) - daily(i - 7)))
    val r = SparkEntry.queries("q346_forecast_backtest")(spark, sf).collect().head
    r.getAs[Long]("n_eval") shouldBe idx.length.toLong
    r.getAs[Double]("mae_naive") shouldBe en.sum / en.length +- 1e-6
    r.getAs[Double]("mae_snaive") shouldBe es.sum / es.length +- 1e-6
    r.getAs[Double]("rmse_naive") shouldBe math.sqrt(en.map(e => e * e).sum / en.length) +- 1e-6
    r.getAs[Double]("mase_snaive") shouldBe es.sum / en.sum +- 1e-6
  }

  test("q347 modularity: contributions sum to Q; all-intra partition would score 1 - sum((d/2m)^2)") {
    val rows = SparkEntry.queries("q347_graph_modularity")(spark, sf).collect()
    rows should not be empty
    val m = rows.map(_.getAs[Long]("degree_sum")).sum / 2
    m should be > 0L // the fixture graph must be non-empty
    rows.map(_.getAs[Long]("intra_edges")).sum should be <= m
    val q = rows.head.getAs[Double]("modularity")
    rows.foreach(_.getAs[Double]("modularity") shouldBe q) // grand total on every row
    val sumContrib = rows.map { r =>
      r.getAs[Long]("intra_edges").toDouble / m -
        math.pow(r.getAs[Long]("degree_sum").toDouble / (2.0 * m), 2)
    }.sum
    q shouldBe sumContrib +- 1e-5
    // modularity is bounded: Q in [-1, 1)
    q should (be >= -1.0 and be < 1.0)
  }
}
