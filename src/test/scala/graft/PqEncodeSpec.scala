package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q89 product quantization: every vector gets one code per sub-block
  * from the trained sub-codebooks, the code space is the k=10 cell id
  * domain, and the reported error is a true squared-distance (≥ 0,
  * and 0 only if a vector coincides with a centroid).
  */
class PqEncodeSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q89 encodes every vector with in-domain codes and non-negative error") {
    val rows = SparkEntry.queries("q89_pq_encode")(spark, sf).collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.length.toLong shouldBe nVecs
    for (r <- rows; b <- 0 until 4) {
      val code = r.getAs[Int](s"c$b")
      code should (be >= 0 and be <= 9)
    }
    all(rows.map(_.getAs[Double]("err"))) should be >= 0.0
  }

  test("q89 PQ error is below the single whole-vector codebook's (finer quantization wins)") {
    // sum of per-vector PQ errors vs q65's whole-vector inertia over the
    // same trained-k=10 regime: 4 independent 16-dim codebooks must fit
    // at least as well in aggregate as one 64-dim codebook.
    val pqTotal = SparkEntry.queries("q89_pq_encode")(spark, sf)
      .agg(sum(col("err"))).collect()(0).getDouble(0)
    val ivfTotal = SparkEntry.queries("q65_kmeans_train")(spark, sf)
      .agg(sum(col("inertia"))).collect()(0).getDouble(0)
    pqTotal should be <= ivfTotal
  }
}
