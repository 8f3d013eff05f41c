package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/invariant tests for the second round-7 widening (q252–q260):
  * each operator checked against an independent plain-Scala recompute
  * or a mathematical invariant the DuckDB oracle alone can't see
  * (SURVEY.md §5.2) — the oracle proves cross-engine agreement, these
  * prove the formula is the INTENDED one.
  */
class Round7bSpec extends AnyFunSuite with Matchers with SharedSpark {

  /** First 15 hex chars of md5 as a 60-bit long — the repo's md5_mod
    * hash (CoverageSpec's bucket helper, generalized). */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q252 KMV Jaccard: exact column matches a set recompute; estimate is consistent") {
    val typeUsers = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = SparkEntry.queries("q252_kmv_jaccard")(spark, sf).collect()
    rows.length shouldBe typeUsers.size * (typeUsers.size - 1) / 2
    for (r <- rows) {
      val (ta, tb) = (r.getAs[String]("ta"), r.getAs[String]("tb"))
      val (a, b) = (typeUsers(ta), typeUsers(tb))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      r.getAs[Double]("exact_jaccard") shouldBe exact +- 1e-6
      val est = r.getAs[Double]("est_jaccard")
      est should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("abs_err") shouldBe math.abs(est - exact) +- 2e-6
      // the estimator reads the union sketch: k_inter <= k_union <= 64
      r.getAs[Int]("k_inter") should be <= r.getAs[Int]("k_union")
      r.getAs[Int]("k_union") should be <= 64
    }
  }

  test("q253 stationary distribution matches a plain-Scala 5-squaring recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) AS tsu", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val states = ev.map(_._4).distinct.sorted
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, g) <- ev.groupBy(_._1)) {
      val seq = g.sortBy(t => (t._2, t._3)).map(_._4)
      for (Array(p, c) <- seq.sliding(2).map(_.toArray) if seq.length >= 2)
        counts((p, c)) = counts.getOrElse((p, c), 0L) + 1
    }
    val rowTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var p = states.map(i => states.map(j =>
      counts.getOrElse((i, j), 0L).toDouble / rowTot(i)).toArray).toArray
    for (_ <- 1 to 5) {
      val n = states.length
      p = Array.tabulate(n, n)((i, k) =>
        (0 until n).map(j => p(i)(j) * p(j)(k)).sum)
    }
    val rows = SparkEntry.queries("q253_markov_stationary")(spark, sf).collect()
    rows.map(_.getString(0)).toSeq shouldBe states
    for ((r, k) <- rows.zipWithIndex) {
      val pi = states.indices.map(i => p(i)(k)).sum / states.length
      r.getAs[Double]("pi") shouldBe pi +- 1e-5
      r.getAs[Double]("spread") should be < 1e-3 // converged: start state forgotten
    }
    rows.map(_.getAs[Double]("pi")).sum shouldBe 1.0 +- 1e-4
  }

  test("q254 stump: split counts are conserved and the gain formula recomputes") {
    val rows = SparkEntry.queries("q254_decision_stump")(spark, sf).collect()
    rows.length shouldBe 5
    def hy(p: Double): Double =
      if (p > 0 && p < 1) -(p * math.log(p) + (1 - p) * math.log(1 - p)) else 0.0
    val gains = rows.map(_.getAs[Double]("gain"))
    gains.toSeq shouldBe gains.sortBy(-_).toSeq // ranked output
    for (r <- rows) {
      val (nl, posl) = (r.getAs[Long]("nl"), r.getAs[Long]("posl"))
      val (nr, posr) = (r.getAs[Long]("nr"), r.getAs[Long]("posr"))
      val (nt, pt) = (nl + nr, posl + posr)
      val gain = hy(pt.toDouble / nt) -
        (nl.toDouble / nt) * hy(posl.toDouble / nl) -
        (nr.toDouble / nt) * hy(posr.toDouble / nr)
      r.getAs[Double]("gain") shouldBe gain +- 1e-5
      gain should be >= -1e-9 // information gain is non-negative
    }
  }

  test("q255 EB shrinkage matches a scalar recompute and always pulls toward the prior") {
    val cells = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ps = cells.map { case (_, n, x) => x.toDouble / n }
    val m = ps.sum / ps.length
    val v = ps.map(p => p * p).sum / ps.length - m * m
    val common = m * (1 - m) / v - 1.0
    common should be > 0.0 // sanity of the fixture
    val rows = SparkEntry.queries("q255_eb_shrinkage")(spark, sf).collect()
    rows.length shouldBe cells.length
    val byS = cells.map(c => c._1 -> c).toMap
    for (r <- rows) {
      val (_, n, x) = byS(r.getAs[String]("source"))
      val raw = x.toDouble / n
      val shrunk = (x + m * common) / (n + common)
      r.getAs[Double]("raw_rate") shouldBe raw +- 1e-5
      r.getAs[Double]("prior_mean") shouldBe m +- 1e-5
      r.getAs[Double]("shrunk_rate") shouldBe shrunk +- 1e-4
      // shrinkage moves toward the prior, never past it
      math.abs(shrunk - m) should be <= math.abs(raw - m) + 1e-9
      if (raw != m) ((shrunk - raw) * (m - raw)) should be >= -1e-12
    }
  }

  test("q256 Good-Turing matches a scalar frequency-of-frequencies recompute") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
      .flatMap(w => w.sliding(3).filter(_.length == 3).map(_.mkString(" ")))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fof = counts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nToks = toks.length.toLong
    val rows = SparkEntry.queries("q256_good_turing")(spark, sf).collect()
    rows.map(_.getAs[Long]("r")).toSeq shouldBe
      fof.keys.filter(_ <= 10).toSeq.sorted
    for (r <- rows) {
      val rr = r.getAs[Long]("r")
      r.getAs[Long]("n_r") shouldBe fof(rr)
      r.getAs[Long]("n_next") shouldBe fof.getOrElse(rr + 1, 0L)
      r.getAs[Long]("n_toks") shouldBe nToks
      r.getAs[Long]("vocab") shouldBe counts.size.toLong
      if (fof.contains(rr + 1)) {
        r.getAs[Double]("r_star") shouldBe
          (rr + 1) * fof(rr + 1).toDouble / fof(rr) +- 1e-5
      } else r.isNullAt(r.fieldIndex("r_star")) shouldBe true
      if (rr == 1L)
        r.getAs[Double]("p_unseen") shouldBe fof(1L).toDouble / nToks +- 1e-5
    }
  }

  test("q257 KN continuation matches a scalar bigram-type recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    val pairs = docs.flatMap(w => w.sliding(2).collect { case Seq(a, b) => (a, b) }).toSet
    val cont = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val raw = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTypes = pairs.size
    val expected = cont.toSeq
      .map { case (t, c) =>
        (t, c, BigDecimal(c.toDouble / nTypes).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
      }
      .sortBy { case (t, _, p) => (-p, t) }.take(20)
    val rows = SparkEntry.queries("q257_kn_continuation")(spark, sf).collect()
    rows.length shouldBe expected.length
    rows.zip(expected).foreach { case (r, (t, c, p)) =>
      r.getAs[String]("tok") shouldBe t
      r.getAs[Long]("cont") shouldBe c
      r.getAs[Long]("raw_count") shouldBe raw(t)
      r.getAs[Double]("p_cont") shouldBe p +- 1e-6
    }
  }

  test("q258 context sweep: exact token conservation at every candidate length") {
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ").count(_.nonEmpty).toLong)
    val rows = SparkEntry.queries("q258_context_sweep")(spark, sf).collect()
    rows.map(_.getAs[Int]("ctx_len")).toSeq shouldBe Seq(16, 32, 64, 96, 128)
    var lastTrunc = Long.MaxValue
    for (r <- rows) {
      val l = r.getAs[Int]("ctx_len")
      r.getAs[Long]("n_docs") shouldBe lens.length.toLong
      r.getAs[Long]("docs_truncated") shouldBe lens.count(_ > l).toLong
      r.getAs[Long]("toks_total") shouldBe lens.sum
      r.getAs[Long]("toks_kept") shouldBe lens.map(math.min(_, l.toLong)).sum
      r.getAs[Long]("toks_lost") shouldBe lens.map(n => math.max(n - l, 0L)).sum
      r.getAs[Long]("toks_kept") + r.getAs[Long]("toks_lost") shouldBe lens.sum
      r.getAs[Long]("docs_truncated") should be <= lastTrunc
      lastTrunc = r.getAs[Long]("docs_truncated")
    }
  }

  test("q259 Hurst matches a plain-Scala rescaled-range recompute") {
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("cast(o_totalprice as decimal(18,2))")).as("x"))
      .orderBy(col("day")).collect().map(_.getDecimal(1).doubleValue())
    val wsizes = Seq(8, 16, 32, 64)
    val meanRs = wsizes.map { w =>
      val nb = daily.length / w
      val rss = (0 until nb).flatMap { b =>
        val xs = daily.slice(b * w, b * w + w)
        val m = xs.sum / w
        val z = xs.scanLeft(0.0)(_ + _).tail.zipWithIndex.map { case (cx, i) => cx - (i + 1) * m }
        val sd = math.sqrt(xs.map(x => x * x).sum / w - m * m)
        if (sd > 0) Some((z.max - z.min) / sd) else None
      }
      w -> (rss.sum / rss.size, rss.size)
    }.toMap
    val pts = wsizes.map(w => (math.log(w.toDouble), math.log(meanRs(w)._1)))
    val k = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val slope = (k * pts.map(p => p._1 * p._2).sum - sx * sy) /
      (k * pts.map(p => p._1 * p._1).sum - sx * sx)
    val rows = SparkEntry.queries("q259_hurst")(spark, sf).collect()
    rows.map(_.getAs[Int]("w")).toSeq shouldBe wsizes
    for (r <- rows) {
      val w = r.getAs[Int]("w")
      r.getAs[Long]("n_blocks") shouldBe meanRs(w)._2.toLong
      r.getAs[Double]("mean_rs") shouldBe meanRs(w)._1 +- 1e-5
      r.getAs[Double]("hurst") shouldBe slope +- 1e-5
    }
  }

  test("q260 Bloom FPP matches an exact bit-set recompute per config") {
    val members = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate").cast("date") < lit("1996-01-01").cast("date"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val probes = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).filterNot(members)
    val rows = SparkEntry.queries("q260_bloom_fpp")(spark, sf).collect()
    rows.length shouldBe 3
    for (r <- rows) {
      val (m, k) = (r.getAs[Int]("m"), r.getAs[Int]("k"))
      def pos(u: Long): Seq[Long] = (1 to k).map(t => h60(s"bf$t|$u") % m)
      val bitset = members.flatMap(pos)
      val fp = probes.count(u => pos(u).forall(bitset))
      r.getAs[Long]("n_keys") shouldBe members.size.toLong
      r.getAs[Long]("bits_set") shouldBe bitset.size.toLong
      r.getAs[Long]("n_probes") shouldBe probes.length.toLong
      r.getAs[Long]("false_pos") shouldBe fp.toLong
      val theory = math.exp(k * math.log(1 - math.exp(k * members.size * math.log(1 - 1.0 / m))))
      r.getAs[Double]("fpp_theory") shouldBe theory +- 1e-6
      r.getAs[Double]("fill_ratio") should be <= 1.0
    }
  }
}
