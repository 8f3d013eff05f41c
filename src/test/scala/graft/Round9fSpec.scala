package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 sixth tranche (q319–q323;
  * q324's offset pushdown is machine-checked in DsV2Spec).
  */
class Round9fSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q319 CvM: matches the scalar integrated-square EDF statistic") {
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click") && col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val v1 = vals.filter(_._1 == "view").map(_._2)
    val v2 = vals.filter(_._1 == "click").map(_._2)
    val (n1, n2) = (v1.length, v2.length)
    val pooled = (v1 ++ v2).distinct.sorted
    var t = 0.0
    for (x <- pooled) {
      val f1 = v1.count(_ <= x).toDouble / n1
      val f2 = v2.count(_ <= x).toDouble / n2
      val w = v1.count(_ == x) + v2.count(_ == x) // tied-point weight
      t += w * (f1 - f2) * (f1 - f2)
    }
    val cvm = n1.toDouble * n2 / ((n1 + n2).toDouble * (n1 + n2)) * t
    val r = SparkEntry.queries("q319_cvm_test")(spark, sf).collect().head
    r.getLong(0) shouldBe n1.toLong
    r.getLong(1) shouldBe n2.toLong
    r.getDouble(2) shouldBe cvm +- 1e-6
    r.getBoolean(3) shouldBe (cvm > 0.461)
    // T is a sum of squares scaled by positive constants
    r.getDouble(2) should be >= 0.0
  }

  test("q320 Granger: matches the scalar restricted-vs-unrestricted OLS F") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("xc"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("yc"))
      .orderBy(col("day"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val rows = daily.sliding(2).map { case Array((x0, y0), (_, y1)) => (y1, y0, x0) }.toSeq
    val n = rows.length
    def c(f: ((Double, Double, Double)) => Double,
          g: ((Double, Double, Double)) => Double): Double =
      rows.map(r => f(r) * g(r)).sum - rows.map(f).sum * rows.map(g).sum / n
    val (y, a, b) = ((r: (Double, Double, Double)) => r._1,
      (r: (Double, Double, Double)) => r._2, (r: (Double, Double, Double)) => r._3)
    val (caa, cbb, cab, cay, cby, cyy) = (c(a, a), c(b, b), c(a, b), c(a, y), c(b, y), c(y, y))
    val det = caa * cbb - cab * cab
    val ba = (cay * cbb - cby * cab) / det
    val bb = (cby * caa - cay * cab) / det
    val ssrUr = cyy - ba * cay - bb * cby
    val ssrR = cyy - cay * cay / caa
    val f = (ssrR - ssrUr) * (n - 3) / ssrUr
    val r = SparkEntry.queries("q320_granger")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe ba +- 1e-6
    r.getDouble(2) shouldBe bb +- 1e-6
    r.getDouble(3) shouldBe f +- 1e-5
    // the extra regressor can only shrink SSR: F >= 0
    r.getDouble(3) should be >= 0.0
  }

  test("q321 Chow: matches the scalar split-vs-pooled trend F and SSR_pooled >= SSR_split") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .select(expr("datediff(day, date'2024-01-01')"), col("y"),
        expr("day < date'2024-01-16'"))
      .collect().map(r => (r.getInt(0).toDouble, r.getLong(1).toDouble, r.getBoolean(2)))
    def ssr(g: Seq[(Double, Double)]): Double = {
      val n = g.length
      val (st, sy) = (g.map(_._1).sum, g.map(_._2).sum)
      val ctt = g.map(p => p._1 * p._1).sum - st * st / n
      val cty = g.map(p => p._1 * p._2).sum - st * sy / n
      val cyy = g.map(p => p._2 * p._2).sum - sy * sy / n
      cyy - cty * cty / ctt
    }
    val pre = daily.filter(_._3).map(p => (p._1, p._2)).toSeq
    val post = daily.filterNot(_._3).map(p => (p._1, p._2)).toSeq
    val n = daily.length
    val ssrSplit = ssr(pre) + ssr(post)
    val ssrPooled = ssr(daily.map(p => (p._1, p._2)).toSeq)
    val f = ((ssrPooled - ssrSplit) / 2.0) / (ssrSplit / (n - 4))
    val r = SparkEntry.queries("q321_chow")(spark, sf).collect().head
    r.getLong(0) shouldBe n.toLong
    r.getDouble(1) shouldBe ssrPooled +- 1e-4
    r.getDouble(2) shouldBe ssrSplit +- 1e-4
    r.getDouble(3) shouldBe f +- 1e-5
    // the split fit nests the pooled one: its SSR can only be lower
    r.getDouble(1) should be >= r.getDouble(2)
  }

  test("q322 DSIR: matches the scalar hashed-bigram importance weights") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def buckets(text: String): Seq[Long] = {
      val w = text.split(" ").filter(_.nonEmpty)
      w.sliding(2).filter(_.length == 2).map { pair =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(pair.mkString(" ").getBytes("UTF-8"))
        val hex = h.take(8).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 512
      }.toSeq
    }
    val perDoc = docs.filter(_._3.split(" ").count(_.nonEmpty) >= 2)
      .map { case (id, src, text) => (id, src, buckets(text)) }
    val raw = perDoc.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tgt = perDoc.filter(_._2 == "src1").flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val nr = raw.values.sum
    val nt = tgt.values.sum
    def lw(b: Long): Double =
      math.log((tgt.getOrElse(b, 0L) + 1.0) / (nt + 512.0)) -
        math.log((raw(b) + 1.0) / (nr + 512.0))
    val scored = perDoc.map { case (id, src, bs) => (id, src, bs.map(lw).sum, bs.size) }
      .sortBy { case (id, _, w, _) => (-w, id) }.take(20)
    val rows = SparkEntry.queries("q322_dsir_weights")(spark, sf).collect()
    rows.length shouldBe 20
    for ((r, (id, src, w, nb)) <- rows.zip(scored)) {
      r.getLong(1) shouldBe id
      r.getString(2) shouldBe src
      r.getLong(3) shouldBe nb.toLong
      r.getDouble(4) shouldBe w +- 1e-5
    }
  }

  test("q323 QLM: matches the scalar Dirichlet-smoothed query likelihood, zero-tf terms included") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val q = Seq("spark", "data", "query")
    val ctot = docs.map(_._2.size).sum
    val cf = q.map(t => t -> docs.map(_._2.count(_ == t)).sum).filter(_._2 > 0).toMap
    val mpc = cf.map { case (t, c) => t -> 300.0 * c / ctot }
    val scored = docs.map { case (id, toks) =>
      val dl = toks.size
      val s = mpc.map { case (t, m) =>
        math.log((toks.count(_ == t) + m) / (dl + 300.0))
      }.sum
      (id, dl, mpc.keys.count(t => toks.contains(t)), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(15)
    val rows = SparkEntry.queries("q323_qlm_dirichlet")(spark, sf).collect()
    rows.length shouldBe 15
    for ((r, (id, dl, nhit, s)) <- rows.zip(scored)) {
      r.getLong(1) shouldBe id
      r.getLong(2) shouldBe dl.toLong
      r.getLong(3) shouldBe nhit.toLong
      r.getDouble(4) shouldBe s +- 1e-5
    }
  }
}
