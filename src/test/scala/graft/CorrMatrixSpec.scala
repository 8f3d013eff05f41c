package graft

import graft.functions.CorrMatrixAggregator
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The one-pass matrix Aggregator must agree with six independent
  * built-in corr aggregates on arbitrary data, for any partitioning
  * (merge-order independence of the Chan combine).
  */
class CorrMatrixSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("matrix aggregator == pairwise built-in corr across partitionings") {
    import spark.implicits._
    val cm = udaf(CorrMatrixAggregator, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble))
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(400)((rnd.nextDouble() * 10, rnd.nextGaussian(),
      rnd.nextDouble() - 0.5, rnd.nextInt(5).toDouble))
    for (parts <- Seq(1, 4, 9)) {
      val df = spark.createDataset(rows).repartition(parts).toDF("a", "b", "c", "d")
      val m = df.agg(cm(col("a"), col("b"), col("c"), col("d"))).head().getSeq[Double](0)
      val pairs = Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"))
      val builtin = df.agg(
        corr(col("a"), col("b")), corr(col("a"), col("c")), corr(col("a"), col("d")),
        corr(col("b"), col("c")), corr(col("b"), col("d")), corr(col("c"), col("d"))).head()
      for (t <- pairs.indices) {
        withClue(s"pair ${pairs(t)} parts=$parts") {
          math.abs(m(t) - builtin.getDouble(t)) should be < 1e-9
        }
      }
    }
  }

  test("q64 equals q17 on real data") {
    val a = SparkEntry.queries("q64_corr_matrix_onepass")(spark, sf).head()
    val b = SparkEntry.queries("q17_corr_matrix")(spark, sf).head()
    for (i <- 0 until 6) a.getDouble(i) shouldBe b.getDouble(i)
  }
}
