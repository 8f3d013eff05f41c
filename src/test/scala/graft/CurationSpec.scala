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

  test("q150 gopher rule signals and keep flag on hand-computed docs") {
    // fail-doc: 5 words, mean_wlen (3+2+2+2+3)/5 = 2.4, stops {the, of}
    val failDoc = "the of aa bb the"
    // pass-doc: 20 words = "the of" + 18 distinct 4-letter words,
    // mean_wlen 77/20 = 3.85, distinct_ratio 1.0 → every rule passes
    val passDoc = "the of " + (1 to 18).map(i => f"w$i%03d").mkString(" ")
    val rows = SparkEntry.queries("q150_gopher_rules")(
      spark, stage(Seq((1L, failDoc), (2L, passDoc)))).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val f = byId(1L)
    f.getAs[Long]("n_words") shouldBe 5L
    f.getAs[Double]("mean_wlen") shouldBe 2.4
    f.getAs[Long]("stop_hits") shouldBe 2L
    f.getAs[Double]("distinct_ratio") shouldBe 0.8
    (f.getAs[Int]("r_nwords"), f.getAs[Int]("r_wlen")) shouldBe ((0, 0))
    f.getAs[Int]("keep") shouldBe 0
    val p = byId(2L)
    p.getAs[Long]("n_words") shouldBe 20L
    p.getAs[Double]("mean_wlen") shouldBe 3.85
    p.getAs[Int]("keep") shouldBe 1
  }

  test("q151 shared-ngram fraction counts only cross-doc 8-grams") {
    val d1 = "w1 w2 w3 w4 w5 w6 w7 w8 tail1" // 8-grams: [w1..w8], [w2..tail1]
    val d2 = "w1 w2 w3 w4 w5 w6 w7 w8 tail2" // shares exactly [w1..w8]
    val rows = SparkEntry.queries("q151_interdoc_dup")(
      spark, stage(Seq((1L, d1), (2L, d2), (3L, "too short")))).collect()
    rows.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L)
    rows.foreach { r =>
      r.getAs[Long]("n_ngrams") shouldBe 2L
      r.getAs[Long]("n_shared") shouldBe 1L
      r.getAs[Double]("shared_frac") shouldBe 0.5
    }
  }

  test("q152 bucket profile matches an independent md5 recompute") {
    // independent scalar recompute of the md5→bucket map
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 15), 16) % 64).toLong
    }
    val rows = SparkEntry.queries("q152_feature_hash")(
      spark, stage(Seq((1L, "x x y"), (2L, "x")))).collect()
    val byB = rows.map(r => r.getAs[Long]("bucket") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_cnt"), r.getAs[Long]("max_cnt")))).toMap
    rows.map(_.getAs[Long]("total_cnt")).sum shouldBe 4L // every token counted
    byB(bucket("x")) shouldBe ((2L, 3L, 2L)) // x: both docs, 3 tokens, max 2 in d1
    byB(bucket("y")) shouldBe ((1L, 1L, 1L))
  }
}
