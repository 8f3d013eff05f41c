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

  /** Spark `percentile`'s linear interpolation at rank q·(n−1). */
  private def pct(sorted: Array[Double], q: Double): Double = {
    val r = q * (sorted.length - 1)
    val lo = r.toInt
    if (lo == sorted.length - 1) sorted(lo)
    else sorted(lo) + (r - lo) * (sorted(lo + 1) - sorted(lo))
  }

  test("q261 Cochran's Q matches a scalar block/treatment recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val types = ev.map(_._2).distinct.sorted
    val p90 = types.map { t =>
      val xs = ev.filter(_._2 == t).map(_._3).sorted
      t -> BigDecimal(pct(xs, 0.9)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val x = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).max).toMap
      .filter { case ((_, t), m) => m > p90(t) }.keys.toSeq
    val k = types.size
    val cj = x.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ru = x.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (sr, sr2) = (ru.values.sum, ru.values.map(r => r * r).sum)
    val q = k * (k - 1) * types.map(t => math.pow(cj.getOrElse(t, 0L) - sr.toDouble / k, 2)).sum /
      (k * sr - sr2)
    val row = SparkEntry.queries("q261_cochran_q")(spark, sf).head()
    row.getAs[Long]("k") shouldBe k.toLong
    row.getAs[Long]("n_users") shouldBe ru.size.toLong
    row.getAs[Double]("q_stat") shouldBe q +- 1e-4
    row.getAs[Boolean]("reject_equal_reach_5pct") shouldBe (q > 9.487729)
  }

  test("q262 entropy rate: matches the chain recompute and is bounded by H0") {
    // transition matrix + pi exactly as in the q253 test
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
    val p0 = states.map(i => states.map(j =>
      counts.getOrElse((i, j), 0L).toDouble / rowTot(i)).toArray).toArray
    var p = p0.map(_.clone())
    val n = states.length
    for (_ <- 1 to 5)
      p = Array.tabulate(n, n)((i, k) => (0 until n).map(j => p(i)(j) * p(j)(k)).sum)
    val pi = (0 until n).map(k => (0 until n).map(i => p(i)(k)).sum / n)
    val h0 = pi.map(x => if (x > 0) -x * math.log(x) else 0.0).sum
    val hr = (0 until n).map(i => pi(i) * p0(i).map(x =>
      if (x > 0) -x * math.log(x) else 0.0).sum).sum
    val row = SparkEntry.queries("q262_markov_entropy_rate")(spark, sf).head()
    row.getAs[Long]("n_states") shouldBe n.toLong
    row.getAs[Double]("h_rate") shouldBe hr +- 1e-5
    row.getAs[Double]("h0") shouldBe h0 +- 1e-5
    row.getAs[Double]("h_rate") should be <= row.getAs[Double]("h0") + 1e-9
    row.getAs[Double]("predictability") should (be >= 0.0 and be <= 1.0)
  }

  test("q263 sequential A/B: z path matches a scalar recompute; OBF crossing never precedes naive") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("cast(ts as date) AS day", "user_id", "event_type").collect()
      .map(r => (r.getDate(0).toString, h60(r.getLong(1).toString) % 2, r.getString(2)))
    val days = ev.map(_._1).distinct.sorted
    var (cn0, cx0, cn1, cx1) = (0L, 0L, 0L, 0L)
    val expected = days.map { d =>
      val dd = ev.filter(_._1 == d)
      cn0 += dd.count(_._2 == 0); cx0 += dd.count(e => e._2 == 0 && e._3 == "purchase")
      cn1 += dd.count(_._2 == 1); cx1 += dd.count(e => e._2 == 1 && e._3 == "purchase")
      val pp = (cx0 + cx1).toDouble / (cn0 + cn1)
      val z = (cx0.toDouble / cn0 - cx1.toDouble / cn1) /
        math.sqrt(pp * (1 - pp) * (1.0 / cn0 + 1.0 / cn1))
      (d, cn0, cx0, cn1, cx1, z)
    }
    val rows = SparkEntry.queries("q263_sequential_ab")(spark, sf).collect()
    rows.length shouldBe days.length
    val bigT = days.length
    rows.zip(expected).foreach { case (r, (d, n0, x0, n1, x1, z)) =>
      r.getAs[java.sql.Date]("day").toString shouldBe d
      r.getAs[Long]("cn0") shouldBe n0
      r.getAs[Long]("cx0") shouldBe x0
      r.getAs[Long]("cn1") shouldBe n1
      r.getAs[Long]("cx1") shouldBe x1
      r.getAs[Double]("z_stat") shouldBe z +- 1e-5
      val t = r.getAs[Int]("t")
      r.getAs[Double]("obf_bound") shouldBe 1.959964 * math.sqrt(bigT.toDouble / t) +- 1e-5
    }
    // the OBF boundary is stricter at every interim look, so its first
    // crossing can never precede the naive one
    val fn = rows.head.get(rows.head.fieldIndex("first_naive_t"))
    val fo = rows.head.get(rows.head.fieldIndex("first_obf_t"))
    if (fo != null) {
      assert(fn != null, "naive must cross whenever OBF crosses")
      fo.asInstanceOf[Int] should be >= fn.asInstanceOf[Int]
    }
  }

  test("q264 Hill alpha matches a scalar top-order-statistics recompute") {
    val vs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice", "o_orderkey").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (v, k) => (-v, k) }.map(_._1)
    // fixture sanity: q264 joins each k-slice to its x_(k+1) cut over limit(401);
    // fewer than 401 orders would silently drop k-rows in BOTH engines
    assert(vs.length >= 401, s"orders fixture too small for the Hill cut: ${vs.length} < 401")
    val rows = SparkEntry.queries("q264_hill_tail")(spark, sf).collect()
    rows.map(_.getAs[Int]("k")).toSeq shouldBe Seq(100, 200, 400)
    for (r <- rows) {
      val k = r.getAs[Int]("k")
      val xmin = vs(k) // rank k+1, 0-indexed
      val alpha = k / (0 until k).map(i => math.log(vs(i) / xmin)).sum
      r.getAs[Double]("xmin") shouldBe
        BigDecimal(xmin).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      r.getAs[Double]("alpha") shouldBe alpha +- 1e-5
      r.getAs[Double]("alpha") should be > 0.0
    }
  }

  test("q265 source novelty matches an exact first-claimer recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getString(2).drop(3).toInt, r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val sg = docs.flatMap { case (si, w) =>
      if (w.length < 8) Seq.empty
      else w.sliding(8).map(g => (si, h60(g.mkString(" ")))).toSeq
    }.distinct
    val tot = sg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val firstClaim = sg.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val newG = firstClaim.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = firstClaim.size.toLong
    val rows = SparkEntry.queries("q265_source_novelty")(spark, sf).collect()
    rows.map(_.getAs[Int]("source_id")).toSeq shouldBe tot.keys.toSeq.sorted
    var cum = 0L
    for (r <- rows) {
      val si = r.getAs[Int]("source_id")
      r.getAs[Long]("n_grams") shouldBe tot(si)
      r.getAs[Long]("new_grams") shouldBe newG.getOrElse(si, 0L)
      cum += newG.getOrElse(si, 0L)
      r.getAs[Long]("cum_new") shouldBe cum
      r.getAs[Double]("cum_share") shouldBe cum.toDouble / uni +- 1e-5
    }
    cum shouldBe uni // every gram is claimed exactly once
  }

  test("q266 Shapley attribution matches an exact coalition recompute and is efficient") {
    val per = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val masks = per.values.toSeq.map { ts =>
      val m = (if (ts("view")) 1 else 0) + (if (ts("click")) 2 else 0) + (if (ts("signup")) 4 else 0)
      (m, if (ts("purchase")) 1L else 0L)
    }
    val nUsers = masks.size.toDouble
    val convByMask = masks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def v(set: Int): Double =
      convByMask.filter { case (m, _) => (m & set) == m }.values.sum / nUsers
    val w = Map(0 -> 2.0 / 6.0, 1 -> 1.0 / 6.0, 2 -> 2.0 / 6.0)
    val channels = Seq((1, "view"), (2, "click"), (4, "signup"))
    val phi = channels.map { case (bit, name) =>
      name -> (0 until 8).filter(s0 => (s0 & bit) == 0)
        .map(s0 => w(Integer.bitCount(s0)) * (v(s0 | bit) - v(s0))).sum
    }.toMap
    val rows = SparkEntry.queries("q266_shapley_attribution")(spark, sf).collect()
    rows.length shouldBe 3
    for (r <- rows) {
      val c = r.getAs[String]("channel")
      r.getAs[Double]("phi") shouldBe phi(c) +- 1e-5
      r.getAs[Double]("v_full") shouldBe v(7) +- 1e-5
      r.getAs[Double]("v_base") shouldBe v(0) +- 1e-5
    }
    // efficiency: the three credits split exactly v(full) - v(base)
    rows.map(_.getAs[Double]("phi")).sum shouldBe (v(7) - v(0)) +- 1e-4
  }

  test("q267 threshold sweep matches an exact union-find recompute at every threshold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val sh = docs.flatMap { case (id, w) =>
      if (w.length < 5) Seq.empty
      else w.sliding(5).map(g => (g.mkString(" "), id)).toSeq
    }.distinct
    val sizes = sh.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = docs.map { case (id, w) => id -> w.count(_.nonEmpty).toLong }.toMap
    val corpusToks = nt.values.sum
    val pairInter = sh.groupBy(_._1).values
      .filter(g => g.size > 1 && g.size <= 1000)
      .flatMap { g =>
        val ds = g.map(_._2).sorted
        for (i <- ds.indices; j <- (i + 1) until ds.size) yield (ds(i), ds(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val jac = pairInter.map { case ((a, b), i) =>
      (a, b) -> BigDecimal(i.toDouble / (sizes(a) + sizes(b) - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 >= 0.01)
    val rows = SparkEntry.queries("q267_dedup_threshold_sweep")(spark, sf).collect()
    rows.map(_.getAs[Double]("threshold")).toSeq shouldBe Seq(0.01, 0.02, 0.05, 0.1)
    for (r <- rows) {
      val t = r.getAs[Double]("threshold")
      val edges = jac.filter(_._2 >= t).keys.toSeq
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a)) = find(b)
      val comps = nodes.groupBy(find)
      r.getAs[Long]("n_pairs") shouldBe edges.size.toLong
      r.getAs[Long]("docs_flagged") shouldBe nodes.size.toLong
      r.getAs[Long]("n_clusters") shouldBe comps.size.toLong
      r.getAs[Long]("docs_removable") shouldBe (nodes.size - comps.size).toLong
      val removed = comps.values.map(c => c.map(nt).sum - nt(c.min)).sum
      r.getAs[Long]("tokens_removed") shouldBe removed
      r.getAs[Double]("pct_corpus_tokens") shouldBe removed.toDouble / corpusToks +- 1e-5
    }
  }

  test("q268 daily drift: day-point evaluation equals a brute-force sup over ALL jump points") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .selectExpr("cast(ts as date) AS day", "value").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1)))
    val global = ev.map(_._2).sorted
    val ng = global.length
    val rows = SparkEntry.queries("q268_daily_drift")(spark, sf).collect()
    rows.length shouldBe ev.map(_._1).distinct.length
    for (r <- rows) {
      val d = r.getAs[java.sql.Date]("day").toString
      val xs = ev.filter(_._1 == d).map(_._2).sorted
      val nd = xs.length
      r.getAs[Long]("n_day") shouldBe nd.toLong
      // brute force: evaluate |F_d - F_g| at EVERY global jump point
      // and its left limit — the true sup of the step-function gap
      val pts = global.distinct
      val sup = pts.flatMap { x =>
        val fd = xs.count(_ <= x).toDouble / nd
        val fg = global.count(_ <= x).toDouble / ng
        val fdm = xs.count(_ < x).toDouble / nd
        val fgm = global.count(_ < x).toDouble / ng
        Seq(math.abs(fd - fg), math.abs(fdm - fgm))
      }.max
      r.getAs[Double]("ks_d") shouldBe sup +- 1e-5
    }
  }

  test("q269 hash uniformity matches an exact bucket recompute for both key populations") {
    val rows = SparkEntry.queries("q269_hash_uniformity")(spark, sf).collect()
    rows.length shouldBe 2
    val pops = Map(
      "event_id" -> spark.read.parquet(s"$sf/events.parquet").select("event_id")
        .collect().map(_.getLong(0)),
      "o_orderkey" -> spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey")
        .collect().map(_.getLong(0)))
    for (r <- rows) {
      val keys = pops(r.getAs[String]("key_name"))
      val buckets = keys.map(k => h60(k.toString) % 64)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = keys.length.toDouble
      val e = n / 64.0
      val chi2 = buckets.values.map(c => (c - e) * (c - e) / e).sum
      r.getAs[Long]("n") shouldBe keys.length.toLong
      r.getAs[Long]("n_buckets") shouldBe buckets.size.toLong
      r.getAs[Long]("min_bucket_n") shouldBe buckets.values.min
      r.getAs[Long]("max_bucket_n") shouldBe buckets.values.max
      r.getAs[Double]("chi2") shouldBe chi2 +- 1e-4
      r.getAs[Boolean]("uniform_ok_5pct") shouldBe (chi2 < 82.529)
    }
  }

  test("q270 median CI matches exact order-statistic ranks and brackets the median") {
    val vs = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull).select("value").collect()
      .map(_.getDouble(0)).sorted
    val n = vs.length
    val rl = math.floor((n - 1.959964 * math.sqrt(n)) / 2.0).toLong
    val ru = math.ceil(1.0 + (n + 1.959964 * math.sqrt(n)) / 2.0).toLong
    val r = SparkEntry.queries("q270_median_ci")(spark, sf).head()
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Long]("rank_lo") shouldBe rl
    r.getAs[Long]("rank_hi") shouldBe ru
    r.getAs[Double]("ci_lo") shouldBe vs((rl - 1).toInt) +- 1e-5
    r.getAs[Double]("ci_hi") shouldBe vs((ru - 1).toInt) +- 1e-5
    r.getAs[Double]("median") shouldBe pct(vs, 0.5) +- 1e-5
    r.getAs[Boolean]("contains_median") shouldBe true
  }

  test("q271 LSH tuning matches an exact signature/banding recompute; candidates shrink as bands merge") {
    val p = 1000000007L
    val sigs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val hs = r.getString(1).split(" ").filter(_.nonEmpty).distinct.map(t => h60(t) % p)
        (0 until 16).map(i => hs.map(h => ((2 * i + 3) * h + (5 * i + 7)) % p).min).toVector
      }
    val rows = SparkEntry.queries("q271_lsh_tuning")(spark, sf).collect()
    rows.map(_.getAs[Int]("bands")).toSeq shouldBe Seq(2, 4, 8, 16)
    for (r <- rows) {
      val b = r.getAs[Int]("bands")
      val rr = 16 / b
      val buckets = sigs.flatMap(sig => (0 until b).map(j =>
        (j, sig.slice(rr * j, rr * j + rr)))).groupBy(identity).view.mapValues(_.length.toLong)
      r.getAs[Int]("rows_per_band") shouldBe rr
      r.getAs[Long]("n_buckets") shouldBe buckets.size.toLong
      r.getAs[Long]("n_cand_pairs") shouldBe buckets.values.map(k => k * (k - 1) / 2).sum
      r.getAs[Long]("max_bucket") shouldBe buckets.values.max
      for ((j, c) <- Seq(("p_detect_j30", 0.3), ("p_detect_j50", 0.5), ("p_detect_j80", 0.8)))
        r.getAs[Double](j) shouldBe
          (1.0 - math.exp(b * math.log(1.0 - math.exp(rr * math.log(c))))) +- 1e-5
    }
    // more rows per band = stricter: candidate load must not increase
    val cands = rows.sortBy(-_.getAs[Int]("rows_per_band")).map(_.getAs[Long]("n_cand_pairs"))
    cands.toSeq shouldBe cands.sorted
  }

  test("q272 skew audit matches an exact per-key/bucket recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perKey = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nRows = ev.length.toLong
    val raw = perKey.toSeq.groupBy { case (u, _) => h60(u.toString) % 32 }
      .view.mapValues(_.map(_._2).sum).values.max
    val salted = ev.groupBy { case (u, e) =>
      h60(s"$u#${h60(e.toString) % 8}") % 32
    }.view.mapValues(_.length.toLong).values.max
    val r = SparkEntry.queries("q272_skew_audit")(spark, sf).head()
    r.getAs[Long]("n_keys") shouldBe perKey.size.toLong
    r.getAs[Long]("n_rows") shouldBe nRows
    r.getAs[Long]("max_key_rows") shouldBe perKey.values.max
    r.getAs[Double]("p99_key_rows") shouldBe
      pct(perKey.values.toArray.sorted.map(_.toDouble), 0.99) +- 1e-4
    r.getAs[Double]("top1_share") shouldBe perKey.values.max.toDouble / nRows +- 1e-5
    r.getAs[Double]("max_bucket_share_raw") shouldBe raw.toDouble / nRows +- 1e-5
    r.getAs[Double]("max_bucket_share_salted") shouldBe salted.toDouble / nRows +- 1e-5
    r.getAs[Double]("balance_gain") shouldBe raw.toDouble / salted +- 1e-4
  }

  test("q273 weighted quantiles match an exact weighted-CDF recompute") {
    val rows0 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice", "l_quantity").collect()
      .map(r => (r.getDouble(0), r.getDouble(1).toLong))
    val byV = rows0.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val w = byV.map(_._2).sum
    def wq(q: Double): Double = {
      var cum = 0L
      byV.find { case (_, c) => cum += c; cum >= q * w }.get._1
    }
    val rows = SparkEntry.queries("q273_weighted_quantile")(spark, sf).collect()
    rows.map(_.getAs[Double]("q")).toSeq shouldBe Seq(0.25, 0.5, 0.75, 0.9)
    var last = Double.MinValue
    for (r <- rows) {
      val q = r.getAs[Double]("q")
      r.getAs[Long]("total_weight") shouldBe w
      r.getAs[Double]("weighted_q") shouldBe wq(q) +- 1e-5
      r.getAs[Double]("weighted_q") should be >= last // quantiles monotone
      last = r.getAs[Double]("weighted_q")
    }
  }

  test("q274 Ljung-Box matches a plain-Scala classical-ACF recompute") {
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("cast(o_totalprice as decimal(18,2))")).as("xd"))
      .orderBy(col("day")).collect().map(_.getDecimal(1).doubleValue())
    val n = daily.length
    val mu = daily.sum / n
    val x = daily.map(_ - mu)
    val d0 = x.map(v => v * v).sum
    val rks = (1 to 7).map(k => (0 until n - k).map(i => x(i + k) * x(i)).sum / d0)
    val lb = n * (n + 2.0) * (1 to 7).map(k => rks(k - 1) * rks(k - 1) / (n - k)).sum
    val r = SparkEntry.queries("q274_ljung_box")(spark, sf).head()
    r.getAs[Long]("n") shouldBe n.toLong
    for (k <- 1 to 7) r.getAs[Double](s"r$k") shouldBe rks(k - 1) +- 1e-5
    r.getAs[Double]("lb_stat") shouldBe lb +- 1e-3
    r.getAs[Boolean]("reject_white_5pct") shouldBe (lb > 14.067140)
  }

  test("q275 lognormal fit matches a scalar MLE + exact one-sample-KS recompute") {
    val ys = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0).select("n_chars").collect()
      .map(r => math.log(r.getLong(0).toDouble)).sorted
    val n = ys.length
    val mu = ys.sum / n
    val sigma = math.sqrt(ys.map(y => y * y).sum / n - mu * mu)
    def phi(z: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
      val tail = 0.3989422804014327 * math.exp(-z * z / 2.0) *
        (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
          - 1.821255978 * math.pow(t, 4) + 1.330274429 * math.pow(t, 5))
      if (z >= 0) 1.0 - tail else tail
    }
    val ks = ys.distinct.map { v =>
      val le = ys.count(_ <= v).toDouble / n
      val lt = ys.count(_ < v).toDouble / n
      math.max(math.abs(le - phi((v - mu) / sigma)), math.abs(lt - phi((v - mu) / sigma)))
    }.max
    val r = SparkEntry.queries("q275_lognormal_fit")(spark, sf).head()
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Double]("mu") shouldBe mu +- 1e-5
    r.getAs[Double]("sigma") shouldBe sigma +- 1e-5
    r.getAs[Double]("ks_stat") shouldBe ks +- 1e-5
    r.getAs[Boolean]("lognormal_ok_5pct") shouldBe (ks < 0.886 / math.sqrt(n.toDouble))
  }

  test("q276 design effect matches a scalar one-way-ANOVA ICC recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "cast(cast(value as decimal(18,2)) as double) AS v").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val grp = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (k, n) = (grp.size, ev.length)
    val sx = ev.map(_._2).sum
    val ssb = grp.values.map(xs => math.pow(xs.sum, 2) / xs.length).sum - sx * sx / n
    val ssw = ev.map(e => e._2 * e._2).sum - grp.values.map(xs => math.pow(xs.sum, 2) / xs.length).sum
    val m0 = (n - grp.values.map(xs => math.pow(xs.length, 2)).sum / n) / (k - 1)
    val (msb, msw) = (ssb / (k - 1), ssw / (n - k))
    val icc = (msb - msw) / (msb + (m0 - 1) * msw)
    val r = SparkEntry.queries("q276_design_effect")(spark, sf).head()
    r.getAs[Long]("n_clusters") shouldBe k.toLong
    r.getAs[Long]("n_events") shouldBe n.toLong
    r.getAs[Double]("m0") shouldBe m0 +- 1e-4
    r.getAs[Double]("icc") shouldBe icc +- 1e-4
    r.getAs[Double]("deff") shouldBe (1 + (r.getAs[Double]("m0") - 1) * r.getAs[Double]("icc")) +- 1e-4
    r.getAs[Double]("deff") should be > 0.0
  }

  test("q277 QTE matches a per-arm interpolated-quantile recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select("user_id", "value").collect()
      .map(r => (h60(r.getLong(0).toString) % 2, r.getDouble(1)))
    val a0 = ev.filter(_._1 == 0).map(_._2).sorted
    val a1 = ev.filter(_._1 == 1).map(_._2).sorted
    val rows = SparkEntry.queries("q277_qte")(spark, sf).collect()
    rows.length shouldBe 9
    for ((r, i) <- rows.zipWithIndex) {
      val q = (i + 1) / 10.0
      r.getAs[Double]("q") shouldBe q +- 1e-9
      r.getAs[Long]("n0") shouldBe a0.length.toLong
      r.getAs[Long]("n1") shouldBe a1.length.toLong
      val (v0, v1) = (pct(a0, q), pct(a1, q))
      r.getAs[Double]("v0") shouldBe v0 +- 1e-5
      r.getAs[Double]("v1") shouldBe v1 +- 1e-5
      r.getAs[Double]("qte") shouldBe (r.getAs[Double]("v1") - r.getAs[Double]("v0")) +- 1e-5
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
