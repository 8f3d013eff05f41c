package graft

import graft.functions.Md5Mod
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The [[graft.plans.RewriteMd5Chain]] optimizer rule: the portable SQL
  * chain must compile to the native Md5Mod expression (plan-asserted),
  * produce bit-identical results, and leave non-matching / degenerate
  * shapes untouched.
  *
  * All fixtures read PARQUET relations: over a LocalRelation the
  * ConvertToLocalRelation optimizer batch evaluates projections
  * eagerly, so no symbolic tree would ever reach the rule.
  */
class RewriteMd5ChainSpec extends AnyFunSuite with Matchers with SharedSpark {

  private val chain =
    "cast(conv(substr(md5(cast(lang as binary)), 1, 15), 16, 10) as bigint)"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteMd5Chain
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.RewriteMd5Chain)
  }

  private def hasMd5Mod(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[Md5Mod]))

  test("the chain with a literal modulus rewrites to Md5Mod with identical results") {
    val ref = docs.selectExpr("doc_id", s"$chain % 1000003L AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    withRule {
      val df = docs.selectExpr("doc_id", s"$chain % 1000003L AS h")
      hasMd5Mod(df) shouldBe true
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe ref
    }
  }

  test("an INT literal modulus also rewrites (post-analysis both sides are long)") {
    withRule {
      val df = docs.selectExpr(s"$chain % 64 AS h")
      hasMd5Mod(df) shouldBe true
      all(df.collect().map(_.getLong(0))) should (be >= 0L and be < 64L)
    }
  }

  test("a zero modulus is NOT rewritten (ANSI % must keep its error semantics)") {
    withRule {
      hasMd5Mod(docs.selectExpr(s"$chain % 0L AS h")) shouldBe false
    }
  }

  test("a non-matching substring length is NOT rewritten") {
    withRule {
      hasMd5Mod(docs.selectExpr(
        "cast(conv(substr(md5(cast(lang as binary)), 1, 14), 16, 10) as bigint) % 7L AS h"))
        .shouldBe(false)
    }
  }

  test("a non-literal modulus is NOT rewritten but still evaluates correctly") {
    val ref = docs.selectExpr("doc_id", s"$chain % 13L AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    withRule {
      val df = docs.selectExpr("doc_id", s"$chain % (n_chars - n_chars + 13L) AS h")
      // modulus is a column expression → no rewrite
      hasMd5Mod(df) shouldBe false
    }
    // and the 13-modulus chain agrees with the rewritten run above
    withRule {
      docs.selectExpr("doc_id", s"$chain % 13L AS h")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe ref
    }
  }
}
