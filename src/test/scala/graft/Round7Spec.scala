package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/invariant tests for the round-7 pack (q242–q251) — each new
  * operator checked against an independent plain-Scala recompute or a
  * mathematical invariant the oracle alone can't see (SURVEY.md §5.2).
  */
class Round7Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("KmvAggregator: split-reduce + merge equals bottom-k of the distinct union") {
    import graft.functions.{KmvAggregator => K, KmvBuf}
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(5000)(rnd.nextLong() & Long.MaxValue) ++ Array.fill(500)(7L) // dups
    val (l, r) = xs.splitAt(1700)
    val merged = K.merge(l.foldLeft(K.zero)(K.reduce), r.foldLeft(K.zero)(K.reduce))
    val expected = xs.distinct.sorted.take(K.k)
    K.finish(merged).toSeq shouldBe expected.toSeq
    // merge is commutative and duplicate-insensitive
    val swapped = K.merge(r.foldLeft(K.zero)(K.reduce), l.foldLeft(K.zero)(K.reduce))
    K.finish(swapped).toSeq shouldBe expected.toSeq
    K.finish(K.merge(merged, KmvBuf(expected))).toSeq shouldBe expected.toSeq
  }

  test("q242 Jarque-Bera matches a plain-Scala moment recompute per flag") {
    val rows = SparkEntry.queries("q242_jarque_bera")(spark, sf).collect()
    val data = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    for (row <- rows) {
      val flag = row.getString(0)
      val xs = data(flag).map(_._2)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => math.pow(x - mu, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2) - 3
      row.getLong(1) shouldBe xs.length.toLong
      row.getDouble(2) shouldBe skew +- 1e-5
      row.getDouble(3) shouldBe kurt +- 1e-5
      val jb = n / 6.0 * (row.getDouble(2) * row.getDouble(2) + row.getDouble(3) * row.getDouble(3) / 4.0)
      row.getDouble(4) shouldBe jb +- 1e-5
    }
  }

  test("q243 Cramer's V matches a plain-Scala contingency recompute and sits in [0,1]") {
    val row = SparkEntry.queries("q243_cramers_v")(spark, sf).head()
    val events = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "pmod(datediff(cast(ts as date), date'1970-01-01'), 7) as dw")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = events.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val n = events.length.toDouble
    val rowTot = events.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val colTot = events.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val chi2 = cells.map { case ((et, dw), o) =>
      val e = rowTot(et) * colTot(dw) / n; (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(rowTot.size, colTot.size) - 1)))
    row.getAs[Double]("chi2") shouldBe chi2 +- 1e-4
    row.getAs[Double]("cramers_v") shouldBe v +- 1e-5
    row.getAs[Double]("cramers_v") should (be >= 0.0 and be <= 1.0)
  }

  test("q244 keyness: G2 nonnegative, direction consistent with the rate comparison") {
    val rows = SparkEntry.queries("q244_gtest_keyness")(spark, sf).collect()
    rows should have length 20
    all(rows.map(_.getAs[Double]("g2"))) should be >= 0.0
    // rows arrive sorted by g2 desc
    rows.map(_.getAs[Double]("g2")).toSeq shouldBe rows.map(_.getAs[Double]("g2")).sorted.reverse.toSeq
  }

  test("q245 KMV: below-k groups are exact; ALL row merges the per-type sketches") {
    val rows = SparkEntry.queries("q245_kmv_sketch")(spark, sf).collect()
    rows.map(_.getString(0)) should contain("ALL")
    for (r <- rows) {
      val (nExact, skSize, est) = (r.getLong(1), r.getInt(2), r.getDouble(4))
      skSize should be <= 64
      if (skSize < 64) est shouldBe nExact.toDouble // sketch holds the whole set
      else est shouldBe nExact.toDouble +- 0.4 * nExact // 5-sigma of RSE 1/sqrt(k-2)
    }
  }

  test("q246 histogram quantile estimates land within one bin width of the exact percentile") {
    val rows = SparkEntry.queries("q246_hist_quantile_merge")(spark, sf).collect()
    rows should have length 5
    val mm = spark.read.parquet(s"$sf/events.parquet")
      .agg(min(col("value")), max(col("value"))).head()
    val binWidth = (mm.getDouble(1) - mm.getDouble(0)) / 128.0
    all(rows.map(_.getAs[Double]("abs_err"))) should be <= binWidth
  }

  test("q247 int8 recall: bounded metrics and a sane reconstruction error") {
    val rows = SparkEntry.queries("q247_int8_recall")(spark, sf).collect()
    rows should have length 5
    for (r <- rows) {
      r.getAs[Long]("n_overlap") should (be >= 0L and be <= 10L)
      r.getAs[Double]("recall_at_10") should (be >= 0.0 and be <= 1.0)
    }
    // mean abs error can't exceed half the largest quantization step
    val maxScale = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(posexplode(col("embedding")).as(Seq("p", "x")))
      .agg(max(abs(col("x").cast("double")))).head().getDouble(0)
    all(rows.map(_.getAs[Double]("mean_abs_err"))) should be <= maxScale / 254.0
  }

  test("q248 runs test: counts conserve and the run count is feasible") {
    val r = SparkEntry.queries("q248_runs_test")(spark, sf).head()
    val (nd, na, nb, runs) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    na + nb shouldBe nd
    runs should be >= 1L
    runs should be <= nd
    // median split on a continuous series: above/below differ by at most the dropped ties
    math.abs(na - nb) should be <= 2L
  }

  test("q249 Mann-Kendall: S within pair bounds, variance positive") {
    val r = SparkEntry.queries("q249_mann_kendall")(spark, sf).head()
    val (nd, s) = (r.getLong(0), r.getLong(1))
    math.abs(s) should be <= nd * (nd - 1) / 2
    r.getAs[Double]("var_s") should be > 0.0
  }

  test("q250 z-order layout beats natural insertion order on BOTH pruning dimensions") {
    val rows = SparkEntry.queries("q250_zorder_layout")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("avg_cust_span"), r.getAs[Double]("avg_date_span"))).toMap
    rows("zorder")._1 should be < rows("natural")._1
    rows("zorder")._2 should be < rows("natural")._2
  }

  test("q251 label separation equals a brute-force pair recompute on the rounded unit vectors") {
    val out = SparkEntry.queries("q251_label_separation")(spark, sf).collect()
    // independent recompute: all-pairs mean cosine over 6dp-rounded unit vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect().map { r =>
      val e = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      val nrm = math.sqrt(e.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (r.getAs[Int]("label"), e.map(x => math.rint(x / nrm * 1e6) / 1e6))
    }
    def dot(a: Array[Double], b: Array[Double]) = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val byLabel = vecs.groupBy(_._1)
    for (row <- out) {
      val vs = byLabel(row.getInt(0)).map(_._2)
      val pairs = for (i <- vs.indices; j <- vs.indices if i != j) yield dot(vs(i), vs(j))
      row.getAs[Double]("within_mean_cos") shouldBe (pairs.sum / pairs.length) +- 1e-5
    }
    val between = for {
      (la, va) <- vecs; (lb, vb) <- vecs if la != lb
    } yield dot(va, vb)
    out.head.getAs[Double]("between_mean_cos") shouldBe (between.sum / between.length) +- 1e-5
  }
}
