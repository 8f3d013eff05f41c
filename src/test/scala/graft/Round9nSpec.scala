package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 fourteenth tranche (q348–q349).
  * q349's recompute replays the ENTIRE index chain — label-mean init,
  * one Lloyd iteration, assignment, within-cell 5th-NN — with the
  * query's exact rounding discipline, so a drift anywhere in the
  * shared machinery (centroids, assign, sqdist) also fails here.
  */
class Round9nSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q348 HLL intersection: exact sides match a scalar recompute and every estimate is in-bound") {
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def users(t: String) = evs.filter(_._2 == t).map(_._1).toSet
    val (v, c, p) = (users("view"), users("click"), users("purchase"))
    val expected = Map(
      ("view", "click") -> (v, c), ("view", "purchase") -> (v, p),
      ("click", "purchase") -> (c, p))
    val rows = SparkEntry.queries("q348_hll_intersection")(spark, sf).collect()
    rows.length shouldBe 3
    for (r <- rows) {
      val (a, b) = expected((r.getAs[String]("type_a"), r.getAs[String]("type_b")))
      r.getAs[Long]("exact_a") shouldBe a.size.toLong
      r.getAs[Long]("exact_b") shouldBe b.size.toLong
      r.getAs[Long]("exact_union") shouldBe (a union b).size.toLong
      r.getAs[Long]("exact_inter") shouldBe (a intersect b).size.toLong
      // lgK=12 sketches on a few hundred keys: inclusion-exclusion must land in-bound
      r.getAs[Boolean]("hll_inter_ok") shouldBe true
    }
  }

  test("q349 kNN outliers match a full scalar replay of the index chain") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s0 += d * d; i += 1 }
      s0
    }
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray.map(_.toDouble)))
    val dim = rows.head._3.length
    def meansBy(groups: Map[Int, Array[Array[Double]]]): Map[Int, Array[Double]] =
      groups.map { case (k, vs) =>
        k -> Array.tabulate(dim)(i => r6(vs.map(_(i)).sum / vs.length))
      }
    def assignTo(cent: Map[Int, Array[Double]]): Map[Long, Int] =
      rows.map { case (id, _, v) =>
        id -> cent.toSeq.map { case (cid, cv) => (r6(sq(v, cv)), cid) }.min._2
      }.toMap
    val cent0 = meansBy(rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap)
    val a1 = assignTo(cent0)
    val cent1 = meansBy(rows.groupBy(r => a1(r._1)).view.mapValues(_.map(_._3)).toMap)
    val cells = assignTo(cent1)
    val byCell = rows.groupBy(r => cells(r._1))
    val knn5 = rows.flatMap { case (id, _, v) =>
      val nbrs = byCell(cells(id)).filter(_._1 != id)
        .map(n => (r6(sq(v, n._3)), n._1)).sorted
      if (nbrs.length >= 5) Some((id, cells(id), nbrs(4)._1)) else None
    }
    val top = knn5.sortBy { case (id, _, d) => (-d, id) }.take(10)
    val got = SparkEntry.queries("q349_knn_outliers")(spark, sf)
      .orderBy(col("rk")).collect()
    got.length shouldBe math.min(10, top.length)
    for ((g, (id, cell, d)) <- got.zip(top)) {
      g.getAs[Long]("vec_id") shouldBe id
      g.getAs[Int]("cell") shouldBe cell
      g.getAs[Double]("knn5_dist") shouldBe d +- 1e-6
    }
    // scores are emitted most-isolated first
    val ds = got.map(_.getAs[Double]("knn5_dist"))
    ds.sliding(2).foreach { case Array(x, y) => y should be <= x }
  }
}
