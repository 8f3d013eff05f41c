package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes + hand fixtures for the round-9 sixteenth tranche
  * (q354–q356).
  */
class Round9pSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q354 pooling: hand-built raster pools to hand-computed values; odd edges drop") {
    // 5x3 raster (w=5, h=3), pixels 0..14 row-major: pooled = 2x1
    // (odd col 4 and odd row 2 drop); p(0,0) = avg(0,1,5,6) = 3,
    // p(0,1) = avg(2,3,7,8) = 5
    val w = 5; val h = 3
    val bytes = scala.collection.mutable.ArrayBuffer[Byte](
      'G', 'R', 'F', 'T', 1,
      (w >> 8).toByte, (w & 0xff).toByte, (h >> 8).toByte, (h & 0xff).toByte)
    (0 until w * h).foreach { v => bytes += 1; bytes += v.toByte } // RLE runs of 1
    val p = graft.ops.MultimodalCodec.pool2x(bytes.toArray)
    p.w2 shouldBe 2
    p.h2 shouldBe 1
    p.nPx2 shouldBe 2L
    p.sumPx2 shouldBe 3L + 5L
    p.checksum2 shouldBe (3L * 1 + 5L * 2) % 1000000007L
    // and the query's full chain agrees with a formula-side recompute
    val r = SparkEntry.queries("q354_multimodal_pool")(spark, sf)
      .filter(col("doc_id") === 0L).collect().head
    val (w0, h0) = graft.ops.MultimodalCodec.dims(0L)
    val px = Array.tabulate(w0 * h0)(i => graft.ops.MultimodalCodec.pixel(0L, i))
    var sum = 0L; var ck = 0L; var j = 0
    for (rr <- 0 until h0 / 2; cc <- 0 until w0 / 2) {
      val b = 2 * rr * w0 + 2 * cc
      val v = (px(b) + px(b + 1) + px(b + w0) + px(b + w0 + 1)) / 4
      j += 1; sum += v; ck = (ck + v.toLong * j) % 1000000007L
    }
    r.getAs[Long]("w2") shouldBe (w0 / 2).toLong
    r.getAs[Long]("h2") shouldBe (h0 / 2).toLong
    r.getAs[Long]("sum_px2") shouldBe sum
    r.getAs[Long]("checksum2") shouldBe ck
  }

  test("q355 bag set-ops match scalar multiset algebra") {
    val c = Tables.customer(spark, sf).select(col("c_nationkey")).collect()
      .map(_.getInt(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val s0 = Tables.supplier(spark, sf).select(col("s_nationkey")).collect()
      .map(_.getInt(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = SparkEntry.queries("q355_setops_bag")(spark, sf).collect()
    val ia = rows.filter(_.getAs[String]("tag") == "intersect_all")
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("mult")).toMap
    val ea = rows.filter(_.getAs[String]("tag") == "except_all")
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("mult")).toMap
    val expIa = (c.keySet intersect s0.keySet)
      .map(k => k -> math.min(c(k), s0(k))).filter(_._2 > 0).toMap
    val expEa = c.keys.map(k => k -> (c(k) - s0.getOrElse(k, 0L)))
      .filter(_._2 > 0).toMap
    ia shouldBe expIa
    ea shouldBe expEa
    // bag identity: |C| = |C except-all S| + |C intersect-all S|
    ea.values.sum + ia.values.sum shouldBe c.values.sum
  }

  test("q356 WoE/IV matches a scalar recompute; terms sum to the total") {
    val rows = SparkEntry.queries("q356_woe_iv")(spark, sf)
      .orderBy(col("decile")).collect()
    rows.length shouldBe 10
    val gt = rows.map(_.getAs[Long]("n_good")).sum.toDouble
    val bt = rows.map(_.getAs[Long]("n_bad")).sum.toDouble
    var iv = 0.0
    for (r <- rows) {
      val g = r.getAs[Long]("n_good").toDouble
      val b = r.getAs[Long]("n_bad").toDouble
      val woe = math.log((g / gt) / (b / bt))
      r.getAs[Double]("woe") shouldBe woe +- 1e-5
      val term = (g / gt - b / bt) * woe
      r.getAs[Double]("iv_term") shouldBe term +- 1e-5
      // each IV term is nonnegative by construction (x·ln y with x, ln y same sign)
      r.getAs[Double]("iv_term") should be >= -1e-9
      iv += term
    }
    rows.head.getAs[Double]("iv_total") shouldBe iv +- 1e-4
    rows.map(_.getAs[Double]("iv_total")).distinct.length shouldBe 1
  }
}
