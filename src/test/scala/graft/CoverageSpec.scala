package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula tests for the vocabulary operators (q165 coverage histogram,
  * q166 Heaps-law growth) on a fixture whose corpus has MORE types than
  * the vocab size, so the top-K boundary actually cuts — the driver
  * corpus has only 31 types and the oracle alone can't prove the
  * boundary logic. q166 is cross-checked against an independent scalar
  * recompute of the md5 buckets and the ln–ln regression.
  */
class CoverageSpec extends AnyFunSuite with Matchers with SharedSpark {

  // 12 types; counts c1=4, c2..c9=3, m=2, r1=r2=1 → top-10 vocab is
  // {c1..c9, m} and the boundary drops exactly {r1, r2}.
  private val docs = Seq(
    (1L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 m"),
    (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 m"),
    (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
    (4L, "r1 r2 c1")
  )

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_covfx_").toString
    import spark.implicits._
    docs.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q165 vocab coverage: the top-10 boundary and histogram by hand") {
    // d1/d2: 10/10 in-vocab, d3: 9/9 → bucket 9; d4: 1/3 → bucket 3.
    val rows = SparkEntry.queries("q165_vocab_coverage")(spark, fx).collect()
    rows should have length 2
    val b3 = rows.find(_.getAs[Int]("bucket") == 3).get
    b3.getAs[Long]("n_docs") shouldBe 1L
    b3.getAs[Long]("tokens") shouldBe 3L
    b3.getAs[Long]("oov_tokens") shouldBe 2L
    b3.getAs[Double]("oov_rate") shouldBe (2.0 / 3) +- 1e-6
    val b9 = rows.find(_.getAs[Int]("bucket") == 9).get
    b9.getAs[Long]("n_docs") shouldBe 3L
    b9.getAs[Long]("tokens") shouldBe 29L
    b9.getAs[Long]("oov_tokens") shouldBe 0L
    b9.getAs[Double]("oov_rate") shouldBe 0.0
  }

  test("q166 heaps law matches an independent scalar recompute of buckets + regression") {
    // Same md5 bucket as the query: first 15 hex chars of md5(doc_id
    // string) as a base-16 long, mod 20 (q58's splitter formula).
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 20
    }
    val toks = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (bucket(id), t))
    }
    val tk = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val firstB = toks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val tv = firstB.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bs = (tk.keySet ++ tv.keySet).toSeq.sorted
    var (ct, cv) = (0L, 0L)
    val pts = bs.map { b =>
      ct += tk.getOrElse(b, 0L); cv += tv.getOrElse(b, 0L)
      (math.log(ct.toDouble), math.log(cv.toDouble))
    }
    val k = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)

    val r = SparkEntry.queries("q166_heaps_law")(spark, fx).collect().head
    r.getAs[Long]("n_points") shouldBe k.toLong
    r.getAs[Long]("tokens_total") shouldBe 32L
    r.getAs[Long]("vocab_total") shouldBe 12L
    r.getAs[Double]("heaps_beta") shouldBe slope +- 1e-6
    r.getAs[Double]("heaps_k") shouldBe math.exp((sy - slope * sx) / k) +- 1e-6
  }

  test("q178 packing efficiency: closed-form fill rates on the 32-token corpus") {
    // lens 10/10/9/3 = 32 tokens; at ctx=128 nothing truncates, the
    // lower bound is one bin (fill 32/128) and naive is 4 bins.
    val r = SparkEntry.queries("q178_packing_eff")(spark, fx).collect()
    r.map(_.getAs[Int]("ctx")).toSeq shouldBe Seq(128, 256, 512)
    val c128 = r.head
    c128.getAs[Long]("n_docs") shouldBe 4L
    c128.getAs[Long]("total_tokens") shouldBe 32L
    c128.getAs[Long]("kept_tokens") shouldBe 32L
    c128.getAs[Long]("n_truncated") shouldBe 0L
    c128.getAs[Long]("bins_lb") shouldBe 1L
    c128.getAs[Double]("fill_lb") shouldBe 0.25 +- 1e-9
    c128.getAs[Double]("fill_naive") shouldBe 0.0625 +- 1e-9
  }

  test("q181 co-occurrence PMI matches an independent pair-generation recompute") {
    // recompute over the REAL sf0.001 corpus (500 docs) — the tiny
    // fixtures never reach the c_ab >= 5 support floor
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq).toSeq
    val pairs = toks.flatMap { w =>
      for {
        i <- w.indices.dropRight(1)
        j <- (i + 1) to math.min(i + 4, w.size - 1)
      } yield {
        val (a, b) = (w(i), w(j))
        if (a <= b) (a, b) else (b, a)
      }
    }
    val cab = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val np = pairs.size.toDouble
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = toks.flatten.size.toDouble
    val expected = cab.filter(_._2 >= 5).toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(30)
      .map { case ((a, b), c) =>
        ((a, b), c, math.log((c / np) / ((uni(a) / nt) * (uni(b) / nt))))
      }

    val r = SparkEntry.queries("q181_cooccur_pmi")(spark, sf).collect()
    r.length shouldBe expected.length
    r.length should be > 0
    r.zip(expected).foreach { case (row, ((a, b), c, pmi)) =>
      row.getAs[String]("ta") shouldBe a
      row.getAs[String]("tb") shouldBe b
      row.getAs[Long]("c_ab") shouldBe c
      row.getAs[Double]("pmi") shouldBe pmi +- 1e-6
    }
  }

  // two-class corpus for the naive-Bayes classifier; token sets overlap
  // (doc 5 mixes both classes' tokens) so the argmax is non-trivial.
  private val nbDocs = Seq(
    (1L, "a b a", "en"), (2L, "a b", "en"), (3L, "c d c", "fr"),
    (4L, "c d", "fr"), (5L, "a c", "en")
  )

  private lazy val nbFx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nbfx_").toString
    import spark.implicits._
    nbDocs.map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q170 naive Bayes: confusion matrix matches an independent scalar recompute") {
    val toks = nbDocs.map { case (id, text, lang) =>
      (id, lang, text.split(" ").filter(_.nonEmpty).toSeq)
    }
    val langs = nbDocs.map(_._3).distinct.sorted
    val vocab = toks.flatMap(_._3).distinct
    val prior = langs.map(l => l -> nbDocs.count(_._3 == l)).toMap
    val tokCnt = langs.map { l =>
      l -> toks.filter(_._2 == l).flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
    }.toMap
    val clsTot = langs.map(l => l -> tokCnt(l).values.sum).toMap
    def logp(l: String, t: String): Double =
      math.log((tokCnt(l).getOrElse(t, 0) + 1).toDouble / (clsTot(l) + vocab.size))
    // the query's argmax tiebreak is score DESC then class ASC; the
    // per-term products mimic the DECIMAL(28,12) quantization
    val expected = toks.map { case (_, actual, ts) =>
      val scoredL = langs.map { l =>
        val ll = ts.groupBy(identity).map { case (t, xs) =>
          BigDecimal(xs.size * logp(l, t)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble + math.log(prior(l).toDouble / nbDocs.size)
        (l, ll)
      }
      val top = scoredL.sortBy { case (l, ll) => (-ll, l) }.head._1
      (actual, top)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val rows = SparkEntry.queries("q170_naive_bayes")(spark, nbFx).collect()
    val got = rows.map(r => (r.getAs[String]("actual"), r.getAs[String]("predicted")) -> r.getAs[Long]("n_docs")).toMap
    got shouldBe expected
    got.values.sum shouldBe nbDocs.size.toLong
  }
}
