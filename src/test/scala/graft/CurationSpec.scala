package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Curation pack behavior on constructed corpora (the oracle gate covers
  * the real corpus; these prove the semantics on known inputs). */
class CurationSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def stage(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation_").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q75 flags exactly the docs sharing an 8-gram with the eval set") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (7L, evalText), // doc_id % 101 == 7 → eval set
      (1L, "prefix words " + evalText), // contaminated (contains eval 8-grams)
      (2L, "totally different words that never overlap with the benchmark text here"))
    val rows = SparkEntry.queries("q75_decontaminate")(spark, stage(docs)).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L)
    rows.head.getLong(1) should be >= 1L // n_hits
    rows.head.getLong(2) shouldBe 1L     // n_bench_docs
  }

  test("q76 computes top-bigram and duplicate fractions exactly") {
    // "a b a b a" → bigrams: (a b)×2, (b a)×2 → n=4, top=2, dup=4
    val rows = SparkEntry.queries("q76_repetition")(spark, stage(Seq((1L, "a b a b a"))))
      .collect()
    rows.length shouldBe 1
    val r = rows.head
    r.getLong(1) shouldBe 4L // n_bigrams
    r.getLong(2) shouldBe 2L // top_c
    r.getDouble(3) shouldBe 0.5
    r.getDouble(4) shouldBe 1.0
  }

  test("q77 scrubs every injected PII token and reports zero leftovers") {
    val docs = Seq((3L, "some text"), (6L, "other text"), (5L, "clean text"))
    val rows = SparkEntry.queries("q77_pii_scrub")(spark, stage(docs)).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    byId(3L).getInt(1) shouldBe 1 // email injected & found
    byId(6L).getInt(2) shouldBe 1 // phone injected & found
    byId(5L).getInt(1) shouldBe 0
    rows.map(_.getInt(3)).sum shouldBe 0 // no leftovers anywhere
    byId(3L).getInt(5) should be > 0 // redaction shortened the text
  }
}
