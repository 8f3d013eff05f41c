package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Definitional tests for the native `sliding_gen` generator (the
  * table-function surface): equivalence with the HOF idiom it replaced
  * in q38/q92/q146, and the edge contract (short arrays, NULL arrays,
  * n=1, invalid n fails analysis).
  */
class SlidingGenSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def registered() = { org.apache.spark.sql.GraftFunctions.register(spark); spark }

  test("sliding windows match the positional-HOF definition on real docs") {
    val s = registered()
    import s.implicits._
    val docs = Tables.documents(s, sf).select(split(col("text"), " ").as("w"))
    val gen = docs.select(expr("sliding_gen(w, 3)").as(Seq("pos", "win")))
      .select(expr("concat_ws(' ', win)").as("g")).as[String].collect().sorted
    val hof = docs.filter(expr("size(w) >= 3"))
      .select(explode(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))")).as("g"))
      .as[String].collect().sorted
    gen.length should be > 0
    gen.toSeq shouldBe hof.toSeq
  }

  test("pos is 0-based and windows preserve order") {
    val s = registered()
    import s.implicits._
    val out = Seq(Seq("a", "b", "c", "d")).toDF("w")
      .select(expr("sliding_gen(w, 2)").as(Seq("pos", "win")))
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).mkString("+")))
    out.toSeq shouldBe Seq((0, "a+b"), (1, "b+c"), (2, "c+d"))
  }

  test("arrays shorter than the window emit zero rows; n=1 emits every element") {
    val s = registered()
    import s.implicits._
    Seq(Seq("only")).toDF("w")
      .select(expr("sliding_gen(w, 2)")).count() shouldBe 0L
    Seq(Seq("a", "b")).toDF("w")
      .select(expr("sliding_gen(w, 1)")).count() shouldBe 2L
    // NULL array → no rows (outer-generator semantics are explode's
    // concern; the generator itself contributes nothing)
    Seq((1, null: Seq[String])).toDF("id", "w")
      .select(expr("sliding_gen(w, 2)")).count() shouldBe 0L
  }

  test("a non-literal or non-positive window size fails analysis, not execution") {
    val s = registered()
    import s.implicits._
    val df = Seq(Seq("a", "b")).toDF("w")
    an[Exception] should be thrownBy
      df.select(expr("sliding_gen(w, 0)")).queryExecution.analyzed
    an[Exception] should be thrownBy
      df.withColumn("k", lit(2)).select(expr("sliding_gen(w, k + 0)")).collect()
  }
}
