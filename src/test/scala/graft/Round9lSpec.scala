package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 twelfth tranche (q342–q344). The
  * closed forms these queries ship (MI from cells, correlations from
  * per-group sums, Horvitz–Thompson from stratum shares) are each
  * re-derived here from MATERIALIZED per-row frames the distributed
  * plans never build.
  */
class Round9lSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q342 per-dim MI matches a scalar recompute from materialized bins") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = rows.head._2.length
    val mi = (1 to dims).map { d =>
      val xs = rows.map { case (l, v) => (l, v(d - 1).toDouble) }
      val lo = xs.map(_._2).min; val hi = xs.map(_._2).max
      val binned = xs.map { case (l, x) =>
        (math.min(math.floor((x - lo) / ((hi - lo) / 4.0)).toInt, 3), l)
      }
      val n = binned.length.toDouble
      val joint = binned.groupBy(identity).view.mapValues(_.length / n).toMap
      val pb = binned.groupBy(_._1).view.mapValues(_.length / n).toMap
      val pl = binned.groupBy(_._2).view.mapValues(_.length / n).toMap
      d -> joint.map { case ((b, l), p) => p * math.log(p / (pb(b) * pl(l))) }.sum
    }.toMap
    val top = SparkEntry.queries("q342_mi_dims")(spark, sf)
      .orderBy(col("mi").desc, col("dim")).collect()
    top.length shouldBe 10
    for (r <- top)
      r.getAs[Double]("mi") shouldBe mi(r.getAs[Int]("dim")) +- 1e-5
    // the returned dims are the true top-10 (ties broken by dim asc)
    val expectTop = mi.toSeq.sortBy { case (d, v) => (-v, d) }.take(10).map(_._1)
    top.map(_.getAs[Int]("dim")).toSeq shouldBe expectTop
  }

  test("q343 target-encoding closed forms equal correlations of MATERIALIZED encodings") {
    val data = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val g = data.groupBy(_._1).view.mapValues { xs =>
      (xs.length, xs.map(_._2).sum)
    }.toMap
    val naive = data.map { case (grp, _) => g(grp)._2 / g(grp)._1 }
    val loo = data.map { case (grp, y) => (g(grp)._2 - y) / (g(grp)._1 - 1) }
    val ys = data.map(_._2)
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum * b.map(y => (y - mb) * (y - mb)).sum)
    }
    val r = SparkEntry.queries("q343_target_encoding")(spark, sf).collect().head
    r.getAs[Long]("n") shouldBe data.length.toLong
    r.getAs[Double]("corr_naive") shouldBe corr(naive.toArray, ys.toArray) +- 1e-5
    r.getAs[Double]("corr_loo") shouldBe corr(loo.toArray, ys.toArray) +- 1e-5
    // self-leakage only ever inflates: naive ≥ loo
    r.getAs[Double]("leakage_gap") should be >= 0.0
  }

  test("q344 IPW matches a scalar Horvitz-Thompson recompute") {
    val per = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) 0.0
        else BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .groupBy(_._1).map { case (_, xs) =>
        val nu = xs.length
        val t = if (xs.count(_._2 == "purchase") * 5 > nu) 1 else 0
        val y = xs.filter(_._2 != "purchase").map(_._3).sum
        (math.min(nu / 20, 4), t, y)
      }.toSeq
    val cells = per.groupBy(_._1).view.mapValues { xs =>
      (xs.size, xs.map(_._2).sum)
    }.toMap
    val used = per.filter { case (s0, _, _) =>
      val (n, t) = cells(s0); t > 0 && t < n
    }
    val nUsed = used.size
    val ht1 = used.map { case (s0, t, y) =>
      t * y / (cells(s0)._2.toDouble / cells(s0)._1) }.sum
    val ht0 = used.map { case (s0, t, y) =>
      (1 - t) * y / (1.0 - cells(s0)._2.toDouble / cells(s0)._1) }.sum
    val nt = used.count(_._2 == 1)
    val naive = used.filter(_._2 == 1).map(_._3).sum / nt -
      used.filter(_._2 == 0).map(_._3).sum / (nUsed - nt)
    val r = SparkEntry.queries("q344_ipw_ate")(spark, sf).collect().head
    r.getAs[Long]("n_users") shouldBe per.size.toLong
    r.getAs[Long]("n_used") shouldBe nUsed.toLong
    r.getAs[Long]("n_treated") shouldBe nt.toLong
    r.getAs[Double]("naive_diff") shouldBe naive +- 1e-5
    r.getAs[Double]("ipw_ate") shouldBe (ht1 - ht0) / nUsed +- 1e-5
    // both arms must be populated for the contrast to mean anything
    nt should be > 0
    (nUsed - nt) should be > 0
  }
}
