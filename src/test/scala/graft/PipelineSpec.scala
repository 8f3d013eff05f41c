package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Invariants of the pipeline-mechanics operators beyond their oracle
  * matches: split mass balance, packing capacity, sample size bounds,
  * fingerprint stability.
  */
class PipelineSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("hash split covers every doc once and is roughly 80/10/10") {
    val rows = SparkEntry.queries("q58_sample_split")(spark, sf).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = bySplit.values.sum
    total shouldBe spark.read.parquet(s"$sf/documents.parquet").count()
    bySplit("train").toDouble / total shouldBe 0.8 +- 0.06
    bySplit("val").toDouble / total shouldBe 0.1 +- 0.05
    bySplit("test").toDouble / total shouldBe 0.1 +- 0.05
  }

  test("sequence packing conserves tokens and respects the chunk start grid") {
    val chunks = SparkEntry.queries("q60_seq_pack")(spark, sf).collect()
    val totTok = chunks.map(_.getAs[Long]("sum_tok")).sum
    val expect = spark.sql(
      s"SELECT sum(size(filter(split(text, ' '), x -> x <> ''))) FROM parquet.`$sf/documents.parquet`")
      .head().getLong(0)
    totTok shouldBe expect
    // chunk ids per source are dense from 0
    for ((src, cs) <- chunks.groupBy(_.getAs[String]("source"))) {
      val ids = cs.map(_.getAs[Long]("chunk")).sorted
      withClue(src) { ids shouldBe (0L until ids.length.toLong).toArray }
    }
  }

  test("stratified sample takes at most 20 per lang and is deterministic") {
    val a = SparkEntry.queries("q68_stratified_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q68_stratified_sample")(spark, sf).collect()
    a.map(_.toString) shouldBe b.map(_.toString)
    for ((lang, rs) <- a.groupBy(_.getAs[String]("lang")))
      withClue(lang) { rs.length should be <= 20 }
  }

  test("rolling hash is order-sensitive (unlike the canonical fingerprint)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("rh_docs")
    val hs = spark.sql(
      "SELECT doc_id, aggregate(split(text, ''), cast(7 as bigint), (a, c) -> (a * 131 + ascii(c)) % 1000000007) AS h FROM rh_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hs(1L) should not be hs(2L)
  }

  test("q159 k-fold: complete partition, complement arithmetic, shares sum to 1") {
    val rows = SparkEntry.queries("q159_kfold")(spark, sf).collect()
    rows.map(_.getAs[Long]("fold")).toSeq shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    val nTot = rows.map(_.getAs[Long]("n_val")).sum
    nTot shouldBe spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { r =>
      r.getAs[Long]("n_train") shouldBe nTot - r.getAs[Long]("n_val")
    }
    rows.map(_.getAs[Double]("val_share")).sum shouldBe 1.0 +- 1e-4
  }

  test("q160 span profile matches an independent md5 recompute of the mask") {
    import spark.implicits._
    // same coin as the query: md5("<doc>:<pos>") first 15 hex digits % 100 < 15
    def masked(doc: Long, pos: Int): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$doc:$pos".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16) % 100 < 15
    }
    val dir = java.nio.file.Files.createTempDirectory("spanfx_").toString
    val n = 200
    Seq((1L, (0 until n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q160_span_mask")(spark, dir).collect().head
    val mask = (0 until n).map(masked(1L, _))
    // independent span derivation: run-length encode the mask sequence
    val runs = mask.foldLeft(List.empty[(Boolean, Int)]) {
      case ((b, c) :: t, m) if b == m => (b, c + 1) :: t
      case (acc, m) => (m, 1) :: acc
    }.filter(_._1).map(_._2)
    r.getAs[Long]("n_tokens") shouldBe n.toLong
    r.getAs[Long]("n_masked") shouldBe mask.count(identity).toLong
    r.getAs[Long]("n_spans") shouldBe runs.length.toLong
    r.getAs[Long]("max_span") shouldBe (if (runs.isEmpty) 0L else runs.max.toLong)
  }
}
