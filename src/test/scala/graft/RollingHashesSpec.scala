package graft

import graft.functions.RollingWindowHashes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native rolling_win_hashes expression must agree with the
  * definitional per-window fold (a=7; a = a·131 + c mod p) — the same
  * contract q66/q73's DuckDB oracle uses — on every window, through
  * both the interpreted eval and the codegen path.
  */
class RollingHashesSpec extends AnyFunSuite with Matchers with SharedSpark {

  private val P = RollingWindowHashes.P

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.spark.sql.GraftFunctions.register(spark)
  }

  /** Definitional fold over CODE POINTS (what DuckDB's unicode() sees). */
  private def refFold(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - 64).map { i =>
      cps.slice(i, i + 64).foldLeft(7L)((a, c) => (a * 131 + c) % P)
    }
  }

  test("matches the definitional fold on synthetic strings") {
    import spark.implicits._
    val docs = Seq(
      "a" * 64,                                  // minimal, uniform
      ('a' to 'z').mkString * 5,                 // 130 chars, cyclic
      (0 until 200).map(i => ('0' + i % 79).toChar).mkString, // wider alphabet
      "x" * 63                                   // below window → empty
    )
    val got = docs.toDF("text")
      .select(expr("rolling_win_hashes(text)").as("h"))
      .collect().map(_.getSeq[Long](0))
    for ((doc, hs) <- docs.zip(got)) {
      hs shouldBe refFold(doc)
    }
  }

  test("first window hash equals q66's rhash64 on the real corpus") {
    val joined = Tables.documents(spark, sf)
      .filter(expr("length(text) >= 64"))
      .select(col("doc_id"), expr("rolling_win_hashes(text)[0]").as("h0"))
      .join(SparkEntry.queries("q66_rolling_hash")(spark, sf)
        .select(col("doc_id"), col("rhash64")), "doc_id")
    joined.filter(col("h0") =!= col("rhash64")).count() shouldBe 0L
    joined.count() should be > 0L
  }

  test("supplementary-plane chars count as ONE unit (matches length()/unicode())") {
    import spark.implicits._
    // 🎉 = U+1F389 (two UTF-16 units, one code point). 63 ASCII + one
    // astral char: UTF-16-unit iteration would see 65 units → 2 windows
    // with wrong char values; code-point iteration sees exactly 64 → 1.
    val doc = "a" * 63 + new String(Character.toChars(0x1F389))
    val got = Seq(doc).toDF("text")
      .select(expr("rolling_win_hashes(text)").as("h"),
        expr("length(text)").as("n"))
      .collect()(0)
    got.getInt(1) shouldBe 64 // Spark length() counts code points
    got.getSeq[Long](0) shouldBe refFold(doc)
    got.getSeq[Long](0).length shouldBe 1
  }

  test("eval path agrees with the codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = "the quick brown fox jumps over the lazy dog " * 4 // 176 chars
    val viaEval = RollingWindowHashes.compute(UTF8String.fromString(s)).toLongArray.toSeq
    viaEval shouldBe refFold(s)
  }
}
