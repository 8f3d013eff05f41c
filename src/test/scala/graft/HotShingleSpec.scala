package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The q40 hot-bucket guard: a shingle shared by more docs than
  * Text.maxShingleDf must be DROPPED as a blocking key before the
  * collect_list group is materialized, so one ubiquitous shingle (the
  * "click here to" boilerplate at 100 TB) can never OOM a task with an
  * unbounded group — and can never explode into O(df²) candidate pairs.
  */
class HotShingleSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("a shingle above the df cap produces no candidate pairs; rare shingles still do") {
    val nHot = (ops.Text.maxShingleDf + 100).toInt
    // nHot docs all sharing ONE 5-word shingle (plus per-doc unique tail),
    // and 2 docs sharing a rare shingle (a genuine near-dup pair).
    val hot = (1 to nHot).map(i => (i.toLong, s"hot1 hot2 hot3 hot4 hot5 u${i}a u${i}b"))
    val rare = Seq(
      (100001L, "rare1 rare2 rare3 rare4 rare5 x1"),
      (100002L, "rare1 rare2 rare3 rare4 rare5 x2"))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hot_shingle_").toString
    (hot ++ rare).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val result = SparkEntry.queries("q40_dedup_near")(spark, dir).collect()

    // Without the cap this would be nHot*(nHot-1)/2 ≈ 600k pairs from the
    // hot shingle alone (each hot pair shares 1 of 3+3 shingles → jaccard
    // 0.2 ≥ the 0.01 keep-threshold, so the threshold would NOT save us).
    result.length shouldBe 1
    val row = result.head
    row.getLong(0) shouldBe 100001L // doc_a
    row.getLong(1) shouldBe 100002L // doc_b
    row.getLong(2) shouldBe 1L      // inter: the shared rare shingle
  }
}
