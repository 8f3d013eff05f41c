package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q73: two docs sharing a long verbatim span must surface as a
  * candidate pair with containment reflecting the overlap; docs with no
  * 64-char common window must not pair. */
class RollingDedupSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("shared 64-char spans produce pairs with the right containment") {
    import spark.implicits._
    // 100-char shared span → windows of it appear in both docs; doc 3 is
    // disjoint text of the same length.
    val span = ("the quick brown fox jumps over the lazy dog again and again " +
      "until the fence breaks down completely x").take(100)
    span.length shouldBe 100
    val docs = Seq(
      (1L, span + " unique tail one that runs on for a while longer"),
      (2L, "different head here " + span),
      (3L, "z" * 150))
    val dir = java.nio.file.Files.createTempDirectory("rolling_dedup_").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q73_rolling_dedup")(spark, dir).collect()
    rows.length shouldBe 1
    val r = rows.head
    (r.getLong(0), r.getLong(1)) shouldBe ((1L, 2L))
    // the shared span contributes exactly 100-64+1 = 37 shared windows
    r.getLong(2) shouldBe 37L
    val containment = r.getDouble(5)
    containment should be > 0.0
    containment should be <= 1.0
  }
}
