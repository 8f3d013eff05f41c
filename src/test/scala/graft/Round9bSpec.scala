package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes + machinery properties for the round-9 second
  * tranche (q294/q295/q298/q299/q300) — each query's math re-derived
  * with plain Scala collections from the same raw rows, so a plan bug
  * and an oracle bug can't agree by accident.
  */
class Round9bSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q299 L-moments: hockey-stick tie-group path equals the direct order-statistic estimator") {
    val xs = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val n = xs.length
    // direct textbook estimator: b_r = (1/n) Σ x_(i) C(i-1,r)/C(n-1,r)
    def comb(m: Long, k: Int): Double = {
      var r = 1.0
      for (i <- 0 until k) r = r * (m - i) / (i + 1)
      r
    }
    val b = (0 to 3).map { r =>
      val s = xs.zipWithIndex.map { case (x, i) => x * comb(i.toLong, r) }.sum
      s / (n * comb((n - 1).toLong, r))
    }
    val lam = Seq(
      b(0),
      2 * b(1) - b(0),
      6 * b(2) - 6 * b(1) + b(0),
      20 * b(3) - 30 * b(2) + 12 * b(1) - b(0))
    val row = SparkEntry.queries("q299_lmoments")(spark, sf).collect().head
    row.getLong(0) shouldBe n.toLong
    for (i <- 0 to 3) withClue(s"lam${i + 1}") {
      row.getDouble(1 + i) shouldBe lam(i) +- math.max(1e-6, math.abs(lam(i)) * 1e-9)
    }
    row.getDouble(5) shouldBe lam(1) / lam(0) +- 1e-6
    row.getDouble(6) shouldBe lam(2) / lam(1) +- 1e-6
    row.getDouble(7) shouldBe lam(3) / lam(1) +- 1e-6
    // sanity: λ2 > 0 (any non-degenerate sample), |τ3| < 1, |τ4| < 1
    row.getDouble(2) should be > 0.0
    math.abs(row.getDouble(6)) should be < 1.0
    math.abs(row.getDouble(7)) should be < 1.0
  }

  test("q294 BM25-PRF: matches a full scalar recompute (seed pass, RSJ expansion, rescore)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.nonEmpty)
    val seeds = Seq("spark", "join", "filter")
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val nDocs = dl.size
    val sumdl = dl.values.map(_.toLong).sum
    val avgdl = sumdl.toDouble / nDocs
    val df = docs.flatMap { case (_, ts) => ts.distinct }.groupBy(identity).map { case (t, o) => t -> o.size }
    def bm25(tf: Int, dfT: Int, dlD: Int): Double =
      math.log((nDocs - dfT + 0.5) / (dfT + 0.5) + 1.0) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dlD) / avgdl))
    def score(terms: Map[String, Double]): Map[Long, BigDecimal] =
      docs.flatMap { case (id, ts) =>
        val s = ts.groupBy(identity).collect {
          case (t, occ) if terms.contains(t) =>
            BigDecimal(terms(t) * bm25(occ.size, df(t), dl(id)))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        if (s.isEmpty) None else Some(id -> s.sum)
      }.toMap
    val s1 = score(seeds.map(_ -> 1.0).toMap)
    val fb = s1.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    val rn = fb.size
    val rCounts = docs.filter(d => fb(d._1)).flatMap(_._2.distinct)
      .groupBy(identity).map { case (t, o) => t -> o.size }
    val exp = rCounts.toSeq.collect {
      case (t, r) if !seeds.contains(t) && r >= 3 && df(t) >= 5 &&
        (nDocs - df(t) - rn + r + 0.5) > 0 =>
        val w = math.log(((r + 0.5) * (nDocs - df(t) - rn + r + 0.5)) /
          ((df(t) - r + 0.5) * (rn - r + 0.5)))
        (t, w)
    }.filter(_._2 > 0).sortBy { case (t, w) => (-w, t) }.take(5).map(_._1)
    val s2 = score((seeds.map(_ -> 1.0) ++ exp.map(_ -> 0.5)).toMap)
    val expected = s2.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(15)
      .zipWithIndex.map { case ((id, sc), i) => (i + 1, id, r6(sc.toDouble)) }
    val got = SparkEntry.queries("q294_bm25_prf")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe expected
    exp should not be empty // the PRF stage actually expanded the query
  }

  test("q295 core distances: matches a scalar LSH-bucket kNN recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val w2 = Array.tabulate(8, 64) { (j, d0) =>
      val c = md5hex(s"${j}_${d0 + 1}").charAt(0)
      2 * "0123456789abcdef".indexOf(c) - 15
    }
    val bucket = vecs.map { case (id, e) =>
      val bits = (0 until 8).map { j =>
        val dot = (0 until 64).map(d => math.floor(e(d) * 1e6).toLong * w2(j)(d)).sum
        if (dot >= 0) 1L << j else 0L
      }.sum
      id -> bits
    }.toMap
    val byB = vecs.map(_._1).groupBy(bucket).filter { case (_, m) => m.length > 1 && m.length <= 1000 }
    val emb = vecs.toMap
    def d2(a: Long, b: Long): Double =
      r6((0 until 64).map(i => { val d = emb(a)(i) - emb(b)(i); d * d }).sum)
    val pairs = byB.values.flatMap { ms =>
      val s = ms.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j), d2(s(i), s(j)))
    }.toSeq
    val nbrs = pairs.flatMap { case (a, b, d) => Seq((a, b, d), (b, a, d)) }
    val core = nbrs.groupBy(_._1).collect { case (v, ns) if ns.size >= 4 =>
      v -> ns.map(t => (t._3, t._2)).sorted.apply(3)._1
    }
    val edges = pairs.collect { case (a, b, d) if core.contains(a) && core.contains(b) =>
      (math.max(math.max(core(a), core(b)), d), a, b, d, core(a), core(b))
    }.sortBy { case (m, a, b, _, _, _) => (m, a, b) }.take(20)
    val expected = edges.zipWithIndex.map { case ((m, a, b, d, ca, cb), i) =>
      (i + 1, a, b, d, ca, cb, m)
    }
    val got = SparkEntry.queries("q295_core_distance")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    got shouldBe expected
  }

  test("q298 dynamic-gap streaming sessionization equals batch session_window, and the dynamic gap matters") {
    val streamed = SparkEntry.queries("q298_stream_session_gap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, sf)
      .withColumn("ts2", expr("cast(ts as timestamp)"))
      .groupBy(col("user_id"),
        session_window(col("ts2"),
          when(col("event_type") === "view", "10 minutes").otherwise("20 minutes")))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("s"),
        expr("unix_micros(session_window.end)").as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    streamed shouldBe batch
    // non-vacuous: a static 10-minute gap yields a different session set
    val static10 = Tables.events(spark, sf)
      .withColumn("ts2", expr("cast(ts as timestamp)"))
      .groupBy(col("user_id"), session_window(col("ts2"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("s"),
        expr("unix_micros(session_window.end)").as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    streamed should not be static10
  }

  test("q300 RRF fusion: cosine list matches a scalar recompute; rrf is the rank identity") {
    val rows = SparkEntry.queries("q300_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows should not be empty
    // rrf identity from the output's own rank columns
    for ((_, id, rb, rv, rrf) <- rows) withClue(s"id=$id") {
      val expect = (if (rb >= 0) 1.0 / (60 + rb) else 0.0) +
        (if (rv >= 0) 1.0 / (60 + rv) else 0.0)
      rrf shouldBe r6(expect)
    }
    // ranks strictly ordered by rrf desc, id asc
    rows.sliding(2).foreach {
      case Array((_, id1, _, _, f1), (_, id2, _, _, f2)) =>
        assert(f1 > f2 || (f1 == f2 && id1 < id2))
      case _ =>
    }
    // scalar recompute of the cosine top-50 ranking
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val probe = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = (0 until 64).map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      r6(dot / (na * nb))
    }
    val topV = vecs.filter(_._1 != 0L).map { case (id, e) => (id, cos(e, probe)) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    for ((_, id, _, rv, _) <- rows) withClue(s"id=$id") {
      topV.get(id).getOrElse(-1L) shouldBe rv
    }
  }
}
