package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native codegen'd cosine_sim expression must be bit-identical to
  * the HOF fold it replaced (same left-to-right double accumulation) —
  * otherwise q41's oracle match would silently depend on which path
  * planned.
  */
class CosineSimilaritySpec extends AnyFunSuite with Matchers with SharedSpark {

  test("cosine_sim == HOF fold, bit for bit, on real embeddings") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val both = e.crossJoin(broadcast(probes))
      .withColumn("native", expr("cosine_sim(embedding, p_emb)"))
      .withColumn("dot", expr("aggregate(zip_with(embedding, p_emb, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (a, v) -> a + v)"))
      .withColumn("n1", expr("sqrt(aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double) * cast(x as double)))"))
      .withColumn("n2", expr("sqrt(aggregate(p_emb, cast(0 as double), (a, x) -> a + cast(x as double) * cast(x as double)))"))
      .withColumn("hof", col("dot") / (col("n1") * col("n2")))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0L
    both.count() should be > 0L
    // the parquet-backed plan must run the expression inside codegen
    // (collect first so AQE finalizes the physical plan)
    val q = both.select(col("native"))
    q.collect()
    // the `*(n)` prefix marks a WholeStageCodegen stage in plan strings
    q.queryExecution.executedPlan.toString should fullyMatch regex
      ("(?s).*\\*\\(\\d+\\) Project \\[cosine_sim.*")
  }

  test("interpreted eval handles orthogonal, parallel, and zero vectors") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
      .withColumn("c", expr("cosine_sim(a, b)"))
    val rs = df.collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    rs(0) shouldBe Some(1.0)
    rs(1) shouldBe Some(0.0)
    rs(2) shouldBe None // zero-norm → NULL, not NaN
  }
}
