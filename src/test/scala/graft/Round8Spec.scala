package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/invariant tests for the round-8 widening:
  *  - q278 write-side MERGE vs a plain-Scala set-algebra recompute
  *  - q279 bounded-hop BFS on a crafted CHAIN corpus (the bench corpus
  *    has chain depth 1, so hops 2..4 and the −1 overflow bucket are
  *    only provable on a fixture) vs a scalar BFS recompute that
  *    rebuilds the shingle pair graph independently.
  */
class Round8Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("q278 merge result matches a scalar set-algebra recompute of the upsert") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3), r.getString(4)))
    def dec2(x: Double): BigDecimal = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    // merged = base rows with key%10 ∉ {1,2}, plus updated %10=1 rows,
    // plus inserts re-keyed +1000000 — the same algebra as the oracle,
    // executed in plain Scala
    val merged =
      cust.filter(c => c._1 % 10 != 1 && c._1 % 10 != 2) ++
        cust.filter(_._1 % 10 == 1).map(c => c.copy(_4 = (dec2(c._4) + 100).toDouble)) ++
        cust.filter(_._1 % 10 == 3).map(c => (c._1 + 1000000L, "new|" + c._2, c._3, c._4, c._5))
    val expect = merged.groupBy(_._5).map { case (seg, rows) =>
      (seg, rows.length.toLong, rows.map(r => dec2(r._4)).sum.toDouble,
        rows.map(_._1).min, rows.map(_._1).max,
        rows.count(_._2.startsWith("new|")).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q278_merge_upsert")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    got.length shouldBe expect.length
    got.zip(expect).foreach { case (g, e) =>
      g._1 shouldBe e._1
      g._2 shouldBe e._2
      g._3 shouldBe e._3 +- 1e-6
      (g._4, g._5, g._6) shouldBe ((e._4, e._5, e._6))
    }
    // the merge must actually exercise all three ops: inserts present,
    // deletes absent, updates shift the balance sums
    got.map(_._6).sum should be > 0L
  }

  // --- q279 chain fixture ------------------------------------------------

  /** 10 docs over a sliding 20-token window with stride 8: adjacent docs
    * share 12 tokens (8 full 5-gram shingles, jaccard 8/24 = 0.33 ≥ 0.01);
    * docs two apart share only 4 tokens (no full 5-gram) — a PATH graph
    * 0-1-…-9. The only greedy-survivor seed is doc 0 (every other doc has
    * a smaller neighbor), so hop levels 0..4 hold docs 0..4 and docs 5..9
    * overflow to −1. */
  private lazy val chainFx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_chainfx_").toString
    import spark.implicits._
    val words = (0 until 100).map(i => f"w$i%03d")
    val docs = (0 until 10).map { k =>
      val text = words.slice(8 * k, 8 * k + 20).mkString(" ")
      (k.toLong, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q279 BFS on the chain fixture: hop levels and overflow match a scalar recompute") {
    // independent scalar pair graph: 5-gram shingle sets + jaccard >= 0.01
    val texts = (0 until 10).map { k =>
      val words = (0 until 100).map(i => f"w$i%03d")
      k.toLong -> words.slice(8 * k, 8 * k + 20).sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val pairs = for {
      a <- texts.keys.toSeq; b <- texts.keys.toSeq if a < b
      inter = texts(a).intersect(texts(b)).size
      if inter > 0 &&
        BigDecimal(inter.toDouble / (texts(a).size + texts(b).size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.01")
    } yield (a, b)
    pairs.sorted shouldBe (0L until 9L).map(i => (i, i + 1)) // the path graph, exactly
    // scalar BFS from the greedy-survivor seeds (no smaller neighbor)
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = pairs.map(_._1).distinct.filterNot(pairs.map(_._2).toSet)
    var dist = seeds.map(_ -> 0).toMap
    for (i <- 1 to 4) {
      val frontier = dist.filter(_._2 == i - 1).keys
      val next = frontier.flatMap(adj.getOrElse(_, Seq.empty)).toSet -- dist.keySet
      dist = dist ++ next.map(_ -> i)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = nodes.groupBy(n => dist.getOrElse(n, -1)).map { case (d, ns) =>
      (d, ns.length.toLong, ns.min, ns.max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q279_graph_reach")(spark, chainFx).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expect
    // the fixture must actually reach depth: all 5 hop levels plus overflow
    got.map(_._1) shouldBe Seq(-1, 0, 1, 2, 3, 4)
    got.find(_._1 == -1).get._2 shouldBe 5L // docs 5..9 beyond 4 hops
  }

  // --- round-8 widening recomputes -------------------------------------

  test("q280 line-dedup matches a scalar stride-segment recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val segs = docs.flatMap { case (id, src, text) =>
      text.split(" ").grouped(8).map(g => (id, src, g.mkString(" "), g.length))
    }
    val df = segs.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val expect = segs.groupBy(_._2).map { case (src, ss) =>
      val boiler = ss.filter(s => df(s._3) >= 2)
      val toksTotal = ss.map(_._4).sum.toLong
      val toksRemoved = boiler.map(_._4).sum.toLong
      (src, docs.count(_._2 == src).toLong, ss.length.toLong,
        boiler.map(_._3).distinct.length.toLong, boiler.length.toLong,
        toksTotal, toksRemoved,
        BigDecimal(toksRemoved.toDouble / toksTotal)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ss.map(s => df(s._3)).max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q280_line_dedup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7), r.getLong(8))).toSeq
    got shouldBe expect
    // the corpus must actually contain cross-doc boilerplate
    got.map(_._7).sum should be > 0L
  }

  test("q282 Holt fold matches a scalar BigDecimal recompute of the quantized recursion") {
    import org.apache.spark.sql.functions._
    val ys = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val half = BigDecimal("0.5"); val q1 = BigDecimal("0.25"); val q3 = BigDecimal("0.75")
    var l = BigDecimal(ys.head).setScale(6)
    var b = BigDecimal(0).setScale(6)
    var sse = BigDecimal(0)
    for (y <- ys.tail) {
      val e = BigDecimal(y) - (l + b)
      sse += e * e
      val lp = (half * y + half * (l + b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      b = (q1 * (lp - l) + q3 * b).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      l = lp
    }
    val rows = SparkEntry.queries("q282_holt_forecast")(spark, sf).collect()
    rows.length shouldBe 7
    rows.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      r.getAs[Int]("h") shouldBe h
      r.getAs[Long]("n_days") shouldBe ys.length.toLong
      r.getAs[Double]("level") shouldBe l.toDouble
      r.getAs[Double]("trend") shouldBe b.toDouble
      r.getAs[Double]("sse") shouldBe
        sse.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Double]("forecast") shouldBe (l + b * h).toDouble
    }
    // the corpus must exercise a genuine trend state
    rows.head.getAs[Double]("trend") should !==(0.0)
  }

  private def md5Arm(uid: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(uid.toString.getBytes("UTF-8"))
    BigInt(d.map("%02x".format(_)).mkString.substring(0, 15), 16).toLong % 2
  }

  test("q283 Qini curve matches a scalar recompute from raw events") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong, if (es.exists(_._2 == "purchase")) 1L else 0L, md5Arm(u))
    }.toArray
    // Spark percentile: rank p(n-1) linear interpolation, 6dp half-up
    val sorted = users.map(_._2).sorted
    val bs = (1 to 9).map { d =>
      val rank = d / 10.0 * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val frac = rank - lo
      val v = sorted(lo) + (sorted(math.min(lo + 1, sorted.length - 1)) - sorted(lo)) * frac
      BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cells = users.groupBy(u => bs.count(u._2 > _) + 1).map { case (d, us) =>
      (d, us.count(_._4 == 1).toLong, us.count(_._4 == 0).toLong,
        us.filter(_._4 == 1).map(_._3).sum, us.filter(_._4 == 0).map(_._3).sum)
    }.toSeq.sortBy(-_._1)
    var (cnt, cnc, cxt, cxc) = (0L, 0L, 0L, 0L)
    val expect = cells.map { case (d, nt, nc, xt, xc) =>
      cnt += nt; cnc += nc; cxt += xt; cxc += xc
      val qini = if (cnc == 0) None
        else Some(BigDecimal(java.math.BigDecimal.valueOf(cxt - (cxc.toDouble * cnt) / cnc))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (d, nt, nc, xt, xc, cnt, cnc, qini)
    }
    val got = SparkEntry.queries("q283_uplift_qini")(spark, sf).collect().map { r =>
      (r.getAs[Int]("decile"), r.getAs[Long]("nt"), r.getAs[Long]("nc"),
        r.getAs[Long]("xt"), r.getAs[Long]("xc"), r.getAs[Long]("cnt"),
        r.getAs[Long]("cnc"),
        if (r.isNullAt(r.fieldIndex("qini"))) None else Some(r.getAs[Double]("qini")))
    }.toSeq
    got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)) shouldBe
      expect.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7))
    got.map(_._8).zip(expect.map(_._8)).foreach {
      case (Some(g), Some(e)) => g shouldBe e +- 1e-6
      case (g, e) => g shouldBe e
    }
  }

  test("q284 minimax isotonic fit equals a scalar pooling PAVA and is monotone") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), if (r.getString(1) == "purchase") 1L else 0L))
    val vmax = ev.map(_._1).max
    val bins = ev.groupBy(t => math.min(math.floor(t._1 / vmax * 10).toInt, 9))
      .map { case (b, es) => (b, es.length.toLong, es.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    // classic pooling PAVA over the occupied-bin sequence (weighted L2)
    case class Block(bins: List[Int], n: Long, pos: Long) {
      def rate: Double = pos.toDouble / n
    }
    var stack = List.empty[Block]
    for ((b, n, pos) <- bins) {
      stack ::= Block(List(b), n, pos)
      while (stack.size >= 2 && stack.tail.head.rate > stack.head.rate) {
        val top :: prev :: rest = stack
        stack = Block(prev.bins ++ top.bins, prev.n + top.n, prev.pos + top.pos) :: rest
      }
    }
    val pava = stack.flatMap(bl => bl.bins.map(_ -> bl.rate)).toMap
    val got = SparkEntry.queries("q284_isotonic_calibration")(spark, sf).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"), r.getAs[Long]("pos"),
        r.getAs[Double]("iso_rate"))).toSeq.sortBy(_._1)
    got.map(t => (t._1, t._2, t._3)) shouldBe bins
    got.foreach { case (b, _, _, iso) => iso shouldBe pava(b) +- 1e-6 }
    withClue("isotonic fit must be monotone non-decreasing: ") {
      got.map(_._4).sliding(2).foreach {
        case Seq(a, b2) => a should be <= b2 + 1e-12
        case _ =>
      }
    }
    withClue("the corpus reliability curve must actually violate monotonicity somewhere " +
      "(otherwise the fit is vacuous): ") {
      val raw = bins.map(t => t._3.toDouble / t._2)
      raw.sliding(2).exists { case Seq(a, b2) => a > b2; case _ => false } shouldBe true
    }
  }

  test("q287 imputation bill: mask is non-trivial and mean_after interpolates toward the median") {
    val rows = SparkEntry.queries("q287_missing_impute")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (n, miss) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_missing"))
      val (mObs, mAfter, med) = (r.getAs[Double]("mean_obs"),
        r.getAs[Double]("mean_after"), r.getAs[Double]("median_imputed"))
      withClue(s"${r.getString(0)}: ") {
        miss should be > 0L
        miss should be < n
        // mean_after is the miss/n-weighted pull of mean_obs toward med
        mAfter shouldBe (mObs * (n - miss) + med * miss) / n +- 1e-5
        (mAfter >= math.min(mObs, med) - 1e-9 &&
          mAfter <= math.max(mObs, med) + 1e-9) shouldBe true
      }
    }
  }

  test("q288 dispersion matches a scalar variance recompute from raw events") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"), col("event_type")).count()
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, cells) =>
      val ns = cells.map(_._2.toDouble)
      val nd = ns.length
      val mean = ns.sum / nd
      val variance = ns.map(x => (x - mean) * (x - mean)).sum / (nd - 1)
      (t, nd.toLong, ns.sum.toLong, mean, variance, variance / mean)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q288_poisson_dispersion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("nd"), r.getAs[Long]("tot"),
        r.getAs[Double]("mean_daily"), r.getAs[Double]("var_daily"),
        r.getAs[Double]("dispersion"), r.getAs[Double]("z_disp"),
        r.getAs[Boolean]("overdispersed"))).toSeq
    got.map(_._1) shouldBe expect.map(_._1)
    got.zip(expect).foreach { case (g, e) =>
      (g._2, g._3) shouldBe ((e._2, e._3))
      g._4 shouldBe e._4 +- 1e-6
      g._5 shouldBe e._5 +- 1e-4
      g._6 shouldBe e._6 +- 1e-6
      // z and the flag must be self-consistent
      g._7 shouldBe ((g._6 - 1.0) * math.sqrt((g._2 - 1) / 2.0)) +- 1e-4
      g._8 shouldBe (g._7 > 1.644854)
    }
  }

  test("q289 adjusted difference matches a scalar standardization and differs from naive") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // (user, score, errs, purchases)
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong, es.count(_._2 == "error").toLong,
        es.count(_._2 == "purchase").toLong)
    }.toArray
    // Spark percentile (rank p(n-1), linear interpolation, 6dp round)
    def pct(xs: Array[Long], p: Double): Double = {
      val s0 = xs.sorted
      val rank = p * (s0.length - 1)
      val lo = math.floor(rank).toInt
      val v = s0(lo) + (s0(math.min(lo + 1, s0.length - 1)) - s0(lo)) * (rank - lo)
      BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val med = pct(users.map(_._3), 0.5)
    val bs = Seq(0.25, 0.5, 0.75).map(pct(users.map(_._2), _))
    // (stratum, treated, purchases)
    val withT = users.map(u =>
      (bs.count(u._2 > _) + 1, if (u._3 > med) 1 else 0, u._4))
    val cells = withT.groupBy(_._1).map { case (s0, us) =>
      (s0, us.count(_._2 == 1).toLong, us.count(_._2 == 0).toLong,
        us.filter(_._2 == 1).map(_._3).sum, us.filter(_._2 == 0).map(_._3).sum)
    }.toSeq
    val nUsers = users.length.toLong
    val nT = withT.count(_._2 == 1).toLong
    val naive = withT.filter(_._2 == 1).map(_._3).sum.toDouble / nT -
      withT.filter(_._2 == 0).map(_._3).sum.toDouble / (nUsers - nT)
    val adj = cells.collect { case (_, nt, nc, xt, xc) if nt > 0 && nc > 0 =>
      (nt + nc).toDouble * (xt.toDouble / nt - xc.toDouble / nc)
    }.sum / nUsers
    val r = SparkEntry.queries("q289_stratified_adjust")(spark, sf).head()
    r.getAs[Long]("n_users") shouldBe nUsers
    r.getAs[Long]("n_treated") shouldBe nT
    r.getAs[Double]("naive_diff") shouldBe naive +- 1e-6
    r.getAs[Double]("adj_diff") shouldBe adj +- 1e-6
    withClue("activity must actually confound (naive != adjusted), else the key is vacuous: ") {
      math.abs(naive - adj) should be > 1e-4
    }
  }
}
