package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-11 surfaces: the native Bloom pair behind q103 (no closure udf
  * in the fact-pruning path), plus the connector's changelog /
  * evolution / partition additions (tests added alongside each).
  */
class Round11Spec extends AnyFunSuite with Matchers with SharedSpark {

  /** Every physical node including subquery plans (PlanGuardSpec's
    * tolerant walk). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    val subs = here
      .flatMap(_.expressions)
      .flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => pe.plan
      })
      .collect { case sp: SparkPlan => allNodes(sp) }
      .flatten
    here ++ subs
  }

  test("q103: fact pruning probes the native Bloom pair — no ScalaUDF anywhere in the plan") {
    val plan = SparkEntry.queries("q103_bloom_join")(spark, sf)
      .queryExecution.sparkPlan
    val exprs = allNodes(plan).flatMap(_.expressions)
      .flatMap(_.collect { case e => e })
    withClue("serialized-closure udf found in the q103 plan: ") {
      exprs.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      } shouldBe empty
    }
    withClue("native might_contain probe missing from the q103 plan: ") {
      exprs.collect {
        case m: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => m
      } should not be empty
    }
  }

  test("bloom_filter_agg + might_contain registry round-trip agrees with exact membership") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    spark.range(0, 1000).createOrReplaceTempView("bfkeys11")
    // every inserted key must probe TRUE (Bloom filters have no false negatives)
    val misses = spark.sql(
      """SELECT count(*) AS n FROM bfkeys11 WHERE NOT might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(id), 1000L, 10000L) FROM bfkeys11),
        |  xxhash64(id))""".stripMargin).collect().head.getLong(0)
    misses shouldBe 0L
  }
}
