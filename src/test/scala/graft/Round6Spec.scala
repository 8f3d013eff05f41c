package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/semantics tests for the round-6 widening (q221–q223) beyond
  * the DuckDB oracle: q221's dual ranking is recomputed vector-by-vector
  * in plain Scala over the real sf0.001 corpus, and q222/q223 run on
  * tiny hand-computed fixtures (the oracle proves engine parity; these
  * prove the formulas themselves).
  */
class Round6Spec extends AnyFunSuite with Matchers with SharedSpark {

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q221: overlap@10 and top-1 ids match a plain-Scala dual-ranking recompute") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val rows = SparkEntry.queries("q221_matryoshka_recall")(spark, sf).collect()
    rows should have length 5
    for (r <- rows) {
      val p = r.getAs[Long]("probe_id")
      val cands = emb.keys.filter(_ != p).toSeq
      def top10(d: Int): Seq[Long] =
        cands.map(v => (v, cos(emb(v), emb(p), d)))
          .sortBy { case (v, c) => (-c, v) }.take(10).map(_._1)
      val (tf, tt) = (top10(64), top10(16))
      r.getAs[Long]("overlap10") shouldBe tf.toSet.intersect(tt.toSet).size.toLong
      r.getAs[Long]("top1_full") shouldBe tf.head
      r.getAs[Long]("top1_trunc") shouldBe tt.head
      r.getAs[Double]("recall10") shouldBe r6(tf.toSet.intersect(tt.toSet).size / 10.0)
    }
  }

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r6fx_").toString
    import spark.implicits._
    // q222: lang "aa" has 2 docs, 3+2 = 5 tokens, 14+5 = 19 chars/bytes
    // (ASCII → bytes == chars); lang "bb" has 1 doc, 2 tokens, 5 chars.
    // The double-space in d2 exercises the empty-token filter.
    // q223: d10/d11 share 5-shingle "a b c d e" → q40 candidate pair
    // (jaccard 1/3); bigram sets {ab,bc,cd,de,ef} vs {ab,bc,cd,de,eg}
    // → 4 common of 5/5 → P = R = F1 = 0.8.
    Seq(
      (1L, "alpha beta gamma", "aa"),
      (2L, "de  fg", "aa"),
      (3L, "hi jk", "bb"),
      (10L, "a b c d e f", "cc"),
      (11L, "a b c d e g", "cc")
    ).map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q222: per-lang fertility by hand (empty tokens excluded, bytes==chars on ASCII)") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q222_token_fertility")(spark, fx).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    rows.keySet should contain allOf ("aa", "bb", "cc")
    val aa = rows("aa")
    aa.getAs[Long]("n_docs") shouldBe 2L
    aa.getAs[Long]("toks") shouldBe 5L
    aa.getAs[Double]("bytes_per_tok") shouldBe r6((16 + 6) / 5.0)
    aa.getAs[Double]("chars_per_tok") shouldBe r6((16 + 6) / 5.0)
    val bb = rows("bb")
    bb.getAs[Long]("toks") shouldBe 2L
    bb.getAs[Double]("bytes_per_tok") shouldBe 2.5
  }

  test("q223: ROUGE-2 of the hand-built candidate pair is exactly 0.8/0.8/0.8") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q223_rouge_pairs")(spark, fx).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("doc_a") shouldBe 10L
    r.getAs[Long]("doc_b") shouldBe 11L
    r.getAs[Long]("n_common") shouldBe 4L
    r.getAs[Double]("rouge2_p") shouldBe 0.8
    r.getAs[Double]("rouge2_r") shouldBe 0.8
    r.getAs[Double]("rouge2_f1") shouldBe 0.8
  }
}
