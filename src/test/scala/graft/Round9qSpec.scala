package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recompute for q357 (Holt–Winters additive): the in-row
  * decimal-quantized fold replayed with BigDecimal, including the
  * textbook week-1 init and the rotating 7-slot seasonal vector.
  */
class Round9qSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def r6(x: BigDecimal): BigDecimal =
    x.setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q357 Holt-Winters matches a BigDecimal replay of the seasonal fold") {
    val ys = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(r => BigDecimal(r.getLong(1)))
    ys.length should be >= 14 // need a full init week + a folded week
    var l = r6(ys.take(7).sum / 7)
    var b = BigDecimal(0)
    var s0 = ys.take(7).map(y => r6(y - l)).toVector
    var sse = BigDecimal(0)
    for (y <- ys.drop(7)) {
      val e = y - (l + b + s0.head)
      sse += e * e
      val lNew = r6(BigDecimal("0.5") * (y - s0.head) + BigDecimal("0.5") * (l + b))
      val bNew = r6(BigDecimal("0.25") * (lNew - l) + BigDecimal("0.75") * b)
      val sNew = r6(BigDecimal("0.3") * (y - lNew) + BigDecimal("0.7") * s0.head)
      s0 = s0.tail :+ sNew
      l = lNew; b = bNew
    }
    val rows = SparkEntry.queries("q357_holt_winters")(spark, sf)
      .orderBy(col("h")).collect()
    rows.length shouldBe 7
    for ((r, h) <- rows.zip(1 to 7)) {
      r.getAs[Int]("h") shouldBe h
      r.getAs[Long]("n_days") shouldBe ys.length.toLong
      r.getAs[Double]("level") shouldBe l.toDouble +- 1e-6
      r.getAs[Double]("trend") shouldBe b.toDouble +- 1e-6
      r.getAs[Double]("sse") shouldBe sse.toDouble +- 1e-4
      r.getAs[Double]("season_h") shouldBe s0(h - 1).toDouble +- 1e-6
      // the forecast composition identity
      r.getAs[Double]("forecast") shouldBe
        (l + h * b + s0(h - 1)).toDouble +- 1e-6
    }
    // the seasonal vector is a zero-mean decomposition at init; after
    // folding it stays bounded by the data's range (sanity envelope)
    val span = ys.max - ys.min
    s0.foreach(sv => sv.abs.toDouble should be <= span.toDouble)
  }
}
