package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for [[Science.cumCounts]] — the range-partitioned
  * two-counter prefix-sum machinery under q124 (KS), q130 (MWU), and
  * q135 (Gini). A sequential scan over the sorted counts is the
  * executable spec; the property must hold for ANY distinct-value
  * frame, including single-row, zero-in-one-counter, and frames
  * smaller than the partition count (empty range partitions). Frames
  * are drawn from a FIXED-seed generator so failures reproduce.
  */
class CumCountsPropSpec extends AnyFunSuite with Matchers with graft.SharedSpark {

  private def randomFrames(seed: Long, n: Int): Seq[List[(Double, Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val size = 1 + rnd.nextInt(40)
      val vs = List.fill(size)(rnd.nextInt(2001) - 1000).distinct
      vs.map(v => (v.toDouble, rnd.nextInt(6).toLong, rnd.nextInt(6).toLong))
    }
  }

  test("cumCounts equals the sequential prefix-sum spec on 20 random frames") {
    import spark.implicits._
    // hand-picked edge frames first: single row, one counter all-zero
    val edges = Seq(
      List((0.0, 1L, 0L)),
      List((1.0, 0L, 3L), (2.0, 0L, 1L)),
      List((-5.0, 2L, 2L), (0.0, 0L, 0L), (5.0, 1L, 4L)))
    (edges ++ randomFrames(42L, 20)).foreach { rows =>
      val g = rows.toDF("v", "c1", "c2")
        .repartition(7) // deliberately misaligned input partitioning
      val got = Science.cumCounts(spark, g).collect()
        .map(r => (r.getAs[Double]("v"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Long]("below"), r.getAs[Long]("cum1"), r.getAs[Long]("cum2"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2")))
        .sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      val n1 = sorted.map(_._2).sum; val n2 = sorted.map(_._3).sum
      var cum1 = 0L; var cum2 = 0L
      val want = sorted.map { case (v, c1, c2) =>
        val below = cum1 + cum2
        cum1 += c1; cum2 += c2
        (v, c1, c2, below, cum1, cum2, n1, n2)
      }
      withClue(s"frame=$rows ") { got.toSeq shouldBe want }
    }
  }

  test("midranks derived from cumCounts equal brute-force pooled ranks") {
    import spark.implicits._
    randomFrames(7L, 10).map(_.filter(r => r._2 + r._3 > 0)).filter(_.nonEmpty)
      .foreach { pos =>
        val g = pos.toDF("v", "c1", "c2")
        val got = Science.cumCounts(spark, g)
          .withColumn("ar", expr("cast(below + (c1 + c2 + 1) / 2.0 as double)"))
          .collect().map(r => r.getAs[Double]("v") -> r.getAs[Double]("ar")).toMap
        // brute force: expand every (v, count) to rows, rank 1..n, avg per v
        val expanded = pos.flatMap(r => List.fill((r._2 + r._3).toInt)(r._1)).sorted
        val want = expanded.zipWithIndex.map { case (v, i) => (v, (i + 1).toDouble) }
          .groupBy(_._1).view.mapValues(l => l.map(_._2).sum / l.size).toMap
        withClue(s"frame=$pos ") {
          got.keySet shouldBe want.keySet
          got.foreach { case (v, ar) => ar shouldBe want(v) +- 1e-9 }
        }
      }
  }
}
