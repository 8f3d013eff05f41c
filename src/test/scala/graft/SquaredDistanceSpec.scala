package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native codegen'd sq_dist expression must be bit-identical to the
  * aggregate(zip_with(...)) HOF fold it replaced in the k-means / IVF /
  * centroid hot loops — otherwise the q42/q61/q65 oracle matches would
  * silently depend on which path planned.
  */
class SquaredDistanceSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("sq_dist == HOF fold, bit for bit, on float×double vector pairs") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // mixed types like the real queries: float corpus vec × double centroid
    val cent = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> round(cast(x as double), 6))").as("cvec"))
    val both = e.crossJoin(broadcast(cent))
      .withColumn("native", expr("sq_dist(embedding, cvec)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(embedding, cvec, (x, c) -> (cast(x as double) - cast(c as double)) * (cast(x as double) - cast(c as double))), cast(0 as double), (a, v) -> a + v)"))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0L
    both.count() should be > 0L
    val q = both.select(col("native"))
    q.collect()
    q.queryExecution.executedPlan.toString should fullyMatch regex
      ("(?s).*\\*\\(\\d+\\) Project \\[sq_dist.*")
  }

  test("null contract: length mismatch and null elements → NULL, like the HOF") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0, 2.0, 3.0)),          // ragged → null
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0, 2.0)),          // ragged (other side)
      (Seq(1.0f, 2.0f), Seq(1.0, 2.0)))                // equal dims → value
      .toDF("a", "b")
      .withColumn("d", expr("sq_dist(a, b)"))
    df.collect().map(r => r.isNullAt(2)).toSeq shouldBe Seq(true, true, false)
    // null ELEMENT → null result (zip_with/aggregate propagated it too)
    val withNullElem = spark.sql(
      "SELECT sq_dist(array(cast(1.0 as double), cast(null as double)), "
        + "array(cast(1.0 as double), cast(2.0 as double))) AS d")
    withNullElem.collect()(0).isNullAt(0) shouldBe true
    // codegen path: force a non-literal plan over a real scan slice
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(8)
    val ragged = e.select(col("embedding").as("a"),
        expr("slice(embedding, 1, 32)").as("b"))
      .withColumn("d", expr("sq_dist(a, b)"))
    ragged.filter(col("d").isNotNull).count() shouldBe 0L
  }

  test("interpreted eval: identical vectors → 0, unit offset → 1") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0, 2.0)),
      (Array(1.0f, 2.0f), Array(1.0, 3.0)))
      .toDF("a", "b")
      .withColumn("d", expr("sq_dist(a, b)"))
    df.collect().map(_.getDouble(2)).toSeq shouldBe Seq(0.0, 1.0)
  }
}
