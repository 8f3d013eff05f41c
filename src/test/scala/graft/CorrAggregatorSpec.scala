package graft

import graft.functions.CorrAggregator
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q48: the Welford/Chan Aggregator must agree with Spark's built-in
  * corr on arbitrary data and handle the degenerate cases built-ins
  * handle. Property-style: many seeded random datasets, any partition
  * count — merge order must not matter.
  */
class CorrAggregatorSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def corrOf(rows: Seq[(Double, Double)], parts: Int): (Double, Double) = {
    import spark.implicits._
    val cu = udaf(CorrAggregator, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    val df = spark.createDataset(rows).repartition(parts).toDF("x", "y")
    val r = df.agg(cu(col("x"), col("y")).as("u"), corr(col("x"), col("y")).as("b")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("matches built-in corr on seeded random data across partitionings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val n = 50 + rnd.nextInt(500)
      val rows = Seq.fill(n)((rnd.nextDouble() * 100, rnd.nextGaussian() * 10 + trial))
      for (parts <- Seq(1, 3, 7)) {
        val (u, b) = corrOf(rows, parts)
        math.abs(u - b) should be < 1e-9
      }
    }
  }

  test("perfect linear relation gives corr 1 / -1") {
    val xs = (1 to 100).map(i => (i.toDouble, 2.0 * i + 5))
    corrOf(xs, 4)._1 shouldBe 1.0 +- 1e-12
    val neg = (1 to 100).map(i => (i.toDouble, -3.0 * i))
    corrOf(neg, 4)._1 shouldBe -1.0 +- 1e-12
  }

  test("constant column yields NaN (built-in corr THROWS under ANSI)") {
    import spark.implicits._
    val cu = udaf(CorrAggregator, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    val rows = (1 to 50).map(i => (i.toDouble, 7.0))
    val df = spark.createDataset(rows).repartition(4).toDF("x", "y")
    df.agg(cu(col("x"), col("y"))).head().getDouble(0).isNaN shouldBe true
    // the built-in, by contrast, hits ANSI DIVIDE_BY_ZERO (SURVEY §1.2 trap 3)
    an[Exception] should be thrownBy df.agg(corr(col("x"), col("y"))).head()
  }

  test("corr is within [-1, 1] on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextDouble(), rnd.nextDouble()))
    val (u, _) = corrOf(rows, 5)
    u should (be >= -1.0 and be <= 1.0)
  }
}
