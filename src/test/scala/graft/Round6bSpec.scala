package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/semantics tests for the §2.20 widening (q224–q231) beyond the
  * DuckDB oracle: every statistic is recomputed by hand (or in plain
  * Scala) on tiny fixtures whose answers are derivable on paper — the
  * oracle proves engine parity; these prove the formulas themselves.
  */
class Round6bSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** DECIMAL(28,12) quantization as the queries apply pre-sum. */
  private def q12(v: Double): BigDecimal =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r6bfx_").toString
    import spark.implicits._
    import java.time.LocalDateTime
    // documents: q225 lang×source cells en×s1=2, en×s2=1, fr×s2=1;
    // q226 tokens of doc 1&2: "a a b c" ∪ "d" → a:2,b:1,c:1,d:1;
    // q231 doc 4 carries one non-ASCII char (©) of 3 chars.
    Seq(
      (1L, "a a b", "en", "s1", 5L),
      (2L, "c d", "en", "s1", 3L),
      (3L, "e", "en", "s2", 1L),
      (4L, "ab©", "fr", "s2", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // events: q224 user 1 → (v=5 purchase, v=4 view, v=3 purchase),
    // user 2 → (v=9 view, v=1 purchase), user 3 views only (excluded);
    // q230 day counts: user 1 → (3, 1) on two days, user 2 → (2, 2),
    // user 3 → one day only (excluded).
    def t(day: Int, h: Int) = LocalDateTime.of(2025, 1, day, h, 0, 0)
    Seq(
      (1L, t(1, 1), 1L, "purchase", Some(5.0)),
      (2L, t(1, 2), 1L, "view", Some(4.0)),
      (3L, t(1, 3), 1L, "purchase", Some(3.0)),
      (4L, t(2, 1), 1L, "view", None),
      (5L, t(1, 1), 2L, "view", Some(9.0)),
      (6L, t(1, 2), 2L, "purchase", Some(1.0)),
      (7L, t(2, 1), 2L, "view", None),
      (8L, t(2, 2), 2L, "view", None),
      (9L, t(1, 1), 3L, "view", Some(2.0))
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q224: nDCG@10 / MRR / MAP@10 match the hand-derived two-user means") {
    val ln2 = math.log(2.0)
    def dcgT(r: Int) = ln2 / math.log(r + 1.0)
    // user 1: rel at ranks 1,3 of (5,4,3); R=2
    val ndcg1 = (q12(dcgT(1)) + q12(dcgT(3))).toDouble /
      (dcgT(1) + dcgT(2))
    val ap1 = (q12(1.0 / 1.0) + q12(2.0 / 3.0)).toDouble / 2.0
    // user 2: rel at rank 2 of (9,1); R=1
    val ndcg2 = q12(dcgT(2)).toDouble / dcgT(1)
    val ap2 = q12(1.0 / 2.0).toDouble / 1.0
    val rows = SparkEntry.queries("q224_ranking_eval")(spark, fx).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_users") shouldBe 2L
    r.getAs[Double]("ndcg10") shouldBe r6((q12(ndcg1) + q12(ndcg2)).toDouble / 2.0)
    r.getAs[Double]("mrr") shouldBe r6((q12(1.0) + q12(0.5)).toDouble / 2.0)
    r.getAs[Double]("map10") shouldBe r6((q12(ap1) + q12(ap2)).toDouble / 2.0)
  }

  test("q225: entropies and Theil's U match the closed-form 2×2-cell values") {
    def h(ps: Seq[Double]) = ps.map(p => (q12(-p * math.log(p))).toDouble).sum
    val hl = h(Seq(0.75, 0.25)) // en 3/4, fr 1/4
    val hs = h(Seq(0.5, 0.5)) // s1 2/4, s2 2/4
    val hj = h(Seq(0.5, 0.25, 0.25)) // cells 2,1,1 of 4
    val mi = hl + hs - hj
    val rows = SparkEntry.queries("q225_theils_u")(spark, fx).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Double]("h_lang") shouldBe r6(hl)
    r.getAs[Double]("h_source") shouldBe r6(hs)
    r.getAs[Double]("h_joint") shouldBe r6(hj)
    r.getAs[Double]("u_lang_given_source") shouldBe r6(mi / hl)
    r.getAs[Double]("u_source_given_lang") shouldBe r6(mi / hs)
    r.getAs[Double]("u_symmetric") shouldBe r6(2.0 * mi / (hl + hs))
  }

  test("q226: Chao1 and Good–Turing from a:2 plus five singletons") {
    val rows = SparkEntry.queries("q226_chao1")(spark, fx).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("vocab") shouldBe 6L // a b c d e ab©
    r.getAs[Long]("n_tokens") shouldBe 7L
    r.getAs[Long]("n1") shouldBe 5L // b c d e ab©
    r.getAs[Long]("n2") shouldBe 1L // a
    // chao1 = V + n1(n1−1)/(2(n2+1)) = 6 + 20/4 = 11
    r.getAs[Double]("chao1") shouldBe 11.0
    r.getAs[Double]("gt_unseen_mass") shouldBe r6(5.0 / 7.0)
    r.getAs[Double]("gt_coverage") shouldBe r6(1.0 - 5.0 / 7.0)
  }

  test("q227: temperature shares flatten toward uniform and epochs are share/p") {
    // chars: s1 = 5+3 = 8, s2 = 1+3 = 4 → p = 2/3, 1/3
    val (p1, p2) = (8.0 / 12.0, 4.0 / 12.0)
    def share(a: Double, p: Double, po: Double) = {
      val (w, wo) = (q12(math.pow(p, a)), q12(math.pow(po, a)))
      (w.toDouble / (w + wo).toDouble, wo.toDouble / (w + wo).toDouble)
    }
    val (s1a7, s2a7) = share(0.7, p1, p2)
    val (s1a3, s2a3) = share(0.3, p1, p2)
    val rows = SparkEntry.queries("q227_temperature_mix")(spark, fx).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    rows.keySet shouldBe Set("s1", "s2")
    rows("s1").getAs[Double]("share_raw") shouldBe r6(p1)
    rows("s1").getAs[Double]("share_t07") shouldBe r6(s1a7)
    rows("s2").getAs[Double]("share_t07") shouldBe r6(s2a7)
    rows("s1").getAs[Double]("share_t03") shouldBe r6(s1a3)
    rows("s2").getAs[Double]("epochs_t03") shouldBe r6(s2a3 / p2)
    // temperature must flatten: minority share grows monotonically as α↓
    s2a7 should be > p2
    s2a3 should be > s2a7
    rows("s2").getAs[Double]("epochs_t07") shouldBe r6(s2a7 / p2)
  }

  test("q228: a single-pair graph peels to empty at k=2 and stays empty") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    // graph fixture: the Round6Spec d10/d11 pair corpus (one edge)
    val rows = SparkEntry.queries("q228_kcore")(spark, fxPair).collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
      .sortBy(_._1)
    rows shouldBe Seq((0, 2L, 1L), (1, 0L, 0L), (2, 0L, 0L), (3, 0L, 0L), (4, 0L, 0L))
  }

  test("q229: the single candidate pair rolls up to one cluster of size 2") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q229_cluster_sizes")(spark, fxPair).collect()
    rows should have length 1
    rows.head.getAs[Long]("cluster_size") shouldBe 2L
    rows.head.getAs[Long]("n_clusters") shouldBe 1L
  }

  /** Two docs sharing the 5-gram "a b c d e" → exactly one q40 pair
    * (Round6Spec's q223 fixture shape, rebuilt standalone so the two
    * suites stay independent). */
  private lazy val fxPair: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r6bpair_").toString
    import spark.implicits._
    Seq(
      (10L, "a b c d e f", "cc", "src0", 11L),
      (11L, "a b c d e g", "cc", "src0", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q230: Fano factor from exact integer sums (burst user 1, regular user 2)") {
    val rows = SparkEntry.queries("q230_burstiness")(spark, fx).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    rows.keySet shouldBe Set(1L, 2L) // user 3 has one day → excluded
    val u1 = rows(1L) // days (3,1): mean 2, var (10−8)/1 = 2, fano 1
    u1.getAs[Long]("n_days") shouldBe 2L
    u1.getAs[Long]("n_events") shouldBe 4L
    u1.getAs[Double]("mean_daily") shouldBe 2.0
    u1.getAs[Double]("fano") shouldBe 1.0
    val u2 = rows(2L) // days (2,2): var 0 → fano 0
    u2.getAs[Double]("fano") shouldBe 0.0
  }

  /** 2-D embeddings with hand-tractable geometry: [3,4]/[4,3] (norm 5)
    * for isotropy; [1,0],[−1,0],[0,2],[0,−2] (zero-mean, cov diag(0.5,2))
    * for effective-dim and the power iteration. */
  private lazy val fxVec: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r6bvec_").toString
    import spark.implicits._
    Seq(
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array(4.0f, 3.0f), 0)
    ).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val fxVec2: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r6bvec2_").toString
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(-1.0f, 0.0f), 0),
      (3L, Array(0.0f, 2.0f), 0), (4L, Array(0.0f, -2.0f), 0)
    ).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q232: anisotropy of two unit-similar vectors is ‖mean unit vec‖² = 0.98") {
    val rows = SparkEntry.queries("q232_isotropy")(spark, fxVec).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_vecs") shouldBe 2L
    r.getAs[Long]("dim") shouldBe 2L
    r.getAs[Double]("mean_norm") shouldBe 5.0
    r.getAs[Double]("std_norm") shouldBe 0.0
    // units (0.6,0.8) and (0.8,0.6) → mean (0.7,0.7) → 2·0.49 = 0.98
    r.getAs[Double]("anisotropy") shouldBe 0.98
  }

  test("q233: participation ratio of λ=(0.5, 2) is 6.25/4.25") {
    val rows = SparkEntry.queries("q233_effective_dim")(spark, fxVec2).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_vecs") shouldBe 4L
    r.getAs[Long]("dim") shouldBe 2L
    r.getAs[Double]("total_var") shouldBe 2.5
    r.getAs[Double]("mean_var") shouldBe 1.25
    r.getAs[Double]("effective_dim") shouldBe r6(6.25 / 4.25)
  }

  test("q234: gap quartiles/mean/max over the six hand-listed inter-arrival gaps") {
    // user 1: 3600, 3600, 79200; user 2: 3600, 82800, 3600; user 3: none
    val gaps = Seq(3600.0, 3600.0, 3600.0, 3600.0, 79200.0, 82800.0)
    def qc(q: Double): Double = { // quantile_cont on the sorted list
      val h = (gaps.size - 1) * q
      val lo = gaps(h.toInt)
      r6(lo + (h - h.toInt) * (gaps(math.min(h.toInt + 1, gaps.size - 1)) - lo))
    }
    val rows = SparkEntry.queries("q234_interarrival")(spark, fx).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_gaps") shouldBe 6L
    r.getAs[Double]("p25_s") shouldBe qc(0.25)
    r.getAs[Double]("p50_s") shouldBe qc(0.5)
    r.getAs[Double]("p75_s") shouldBe qc(0.75)
    r.getAs[Double]("mean_s") shouldBe r6(gaps.sum / 6.0)
    r.getAs[Long]("max_s") shouldBe 82800L
  }

  test("q235: power iteration on cov diag(0.5, 2) converges toward λ₁ = 2, dim 2") {
    // replicate: v0 = (1,1); w = C·v with terms quantized to 12dp;
    // v = w/‖w‖ with ‖w‖ from quantized squares — 3 iterations + final
    val c = Array(0.5, 2.0)
    var v = Array(1.0, 1.0)
    def matvec(v: Array[Double]) = Array(
      q12(c(0) * v(0)).toDouble, q12(c(1) * v(1)).toDouble)
    def nrm(w: Array[Double]) =
      math.sqrt((q12(w(0) * w(0)) + q12(w(1) * w(1))).toDouble)
    for (_ <- 1 to 3) { val w = matvec(v); val n = nrm(w); v = w.map(_ / n) }
    val lam = nrm(matvec(v))
    val rows = SparkEntry.queries("q235_pca_power")(spark, fxVec2).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_vecs") shouldBe 4L
    r.getAs[Double]("trace") shouldBe 2.5
    r.getAs[Double]("lambda1") shouldBe r6(lam)
    r.getAs[Double]("explained_share") shouldBe r6(lam / 2.5)
    r.getAs[Int]("top_dim") shouldBe 2
    r.getAs[Double]("top_loading") shouldBe r6(math.abs(v(1)))
    lam should be > 1.9 // converging to the true λ₁ = 2
  }

  test("q236: 60-bit SimHash banding dedup matches a plain-Scala signature recompute") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    // replicate the signature pipeline on fxPair's two token sets
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def sig(toks: Set[String]): Long = {
      var out = 0L
      for (j <- 0 until 60) {
        val votes = toks.toSeq.map { t =>
          val hexv = "0123456789abcdef".indexOf(md5hex(t).charAt(j / 4))
          if (((hexv >> (3 - j % 4)) & 1) == 1) 1 else -1
        }.sum
        if (votes >= 0) out |= 1L << j
      }
      out
    }
    val sa = sig("a b c d e f".split(" ").toSet)
    val sb = sig("a b c d e g".split(" ").toSet)
    val sharesBand = (0 until 4).exists(b => ((sa >> (15 * b)) & 32767) == ((sb >> (15 * b)) & 32767))
    val hamming = java.lang.Long.bitCount(sa ^ sb)
    val rows = SparkEntry.queries("q236_simhash_dedup")(spark, fxPair).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("n_docs") shouldBe 2L
    r.getAs[Long]("n_distinct_sigs") shouldBe (if (sa == sb) 1L else 2L)
    r.getAs[Long]("n_cand_pairs") shouldBe (if (sharesBand) 1L else 0L)
    if (sharesBand) {
      r.getAs[Int]("min_hamming") shouldBe hamming
      r.getAs[Long]("n_dup_pairs") shouldBe (if (hamming <= 3) 1L else 0L)
      r.getAs[Double]("mean_hamming") shouldBe hamming.toDouble
    }
  }

  test("q237: cross-source 8-gram jaccard/containment on a hand-built overlap") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_r6bsrc_").toString
    import spark.implicits._
    // src_a grams {w1..w8, w2..w9}; src_b grams {w1..w8, w2..x9, z1..z8}
    // → inter 1, na 2, nb 3 → jaccard 1/4, containment 1/2
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "src_a", 26L),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 x9", "en", "src_b", 26L),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "src_b", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q237_source_gram_overlap")(spark, dir).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[String]("src_a") shouldBe "src_a"
    r.getAs[String]("src_b") shouldBe "src_b"
    r.getAs[Long]("inter") shouldBe 1L
    r.getAs[Long]("na") shouldBe 2L
    r.getAs[Long]("nb") shouldBe 3L
    r.getAs[Double]("jaccard") shouldBe 0.25
    r.getAs[Double]("containment") shouldBe 0.5
  }

  test("q238: PPMI spectral axis matches a full plain-Scala recompute on sf0.001") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    // independent recompute: tokenize → window-4 pairs → PPMI(6dp) →
    // 3 power iterations with the same DECIMAL(28,12) quantization
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    val uni = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts) {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length >= 2) {
        w.foreach(tok => uni(tok) = uni.getOrElse(tok, 0L) + 1)
        for (i <- w.indices; j <- (i + 1) to math.min(i + 4, w.length - 1)) {
          val k = (if (w(i) <= w(j)) (w(i), w(j)) else (w(j), w(i)))
          pair(k) = pair.getOrElse(k, 0L) + 1
        }
      }
    }
    val np = pair.values.sum.toDouble
    val nt = uni.values.sum.toDouble
    val half = pair.toSeq.collect { case ((a, b), c) if c >= 5 =>
      val p = r6(math.max(
        math.log((c / np) / ((uni(a) / nt) * (uni(b) / nt))), 0.0))
      ((a, b), p)
    }.filter(_._2 > 0.0)
    val cells = half ++ half.collect { case ((a, b), p) if a != b => ((b, a), p) }
    val nodes = cells.map(_._1._1).distinct.sorted
    var v = nodes.map(_ -> 1.0).toMap
    def matvec(v: Map[String, Double]): Map[String, Double] =
      cells.groupBy(_._1._1).map { case (i, cs) =>
        i -> cs.map { case ((_, j), p) => q12(p * v(j)) }.sum.toDouble
      }
    def nrm(w: Map[String, Double]): Double =
      math.sqrt(w.values.map(x => q12(x * x)).sum.toDouble)
    for (_ <- 1 to 3) { val w = matvec(v); val n = nrm(w); v = w.map { case (k, x) => k -> x / n } }
    val lam = nrm(matvec(v))
    val expTop = v.toSeq.map { case (k, x) => (k, r6(math.abs(x))) }
      .sortBy { case (k, l) => (-l, k) }.take(5)
    val rows = SparkEntry.queries("q238_ppmi_spectral")(spark, sf).collect()
    rows should have length 5
    rows.head.getAs[Long]("n_tokens") shouldBe nodes.size.toLong
    rows.head.getAs[Long]("n_cells") shouldBe cells.size.toLong
    rows.head.getAs[Double]("lambda1") shouldBe r6(lam)
    rows.map(r => (r.getAs[String]("tok"), r.getAs[Double]("loading"))).toSeq shouldBe expTop
  }

  test("q239: dedup savings on the single-pair cluster by hand") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q239_dedup_savings")(spark, fxPair).collect()
    rows should have length 1
    val r = rows.head
    r.getAs[Long]("corpus_docs") shouldBe 2L
    r.getAs[Long]("corpus_chars") shouldBe 22L
    r.getAs[Long]("n_clusters") shouldBe 1L
    r.getAs[Long]("docs_in_clusters") shouldBe 2L
    r.getAs[Long]("docs_removed") shouldBe 1L
    r.getAs[Long]("chars_removed") shouldBe 11L // survivor = min doc 10
    r.getAs[Double]("docs_removed_frac") shouldBe 0.5
    r.getAs[Double]("chars_removed_frac") shouldBe 0.5
  }

  test("q240: HLL estimates sit inside the bound and the union row IS a faithful merge") {
    import org.apache.spark.sql.functions._
    val raw = graft.ops.Relational.hllMergeRaw(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("exact_users"), r.getAs[Double]("est"))).toMap
    raw.keySet should contain("ALL")
    for ((et, (exact, est)) <- raw) {
      withClue(s"$et: est $est vs exact $exact") {
        math.abs(est - exact) should be <= math.max(3.0, 0.09 * exact)
      }
    }
    // mergeability: the union-of-sketches estimate equals a direct
    // whole-column sketch estimate (same lgK) to well under the RSE
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(user_id, 12)) as double)"))
      .collect().head.getDouble(0)
    math.abs(raw("ALL")._2 - direct) / direct should be <= 0.01
  }

  test("q241: every rolling-week HLL estimate is in-bound and the merge is faithful") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q241_hll_rolling")(spark, sf).collect()
    rows.length should be > 0
    all(rows.map(_.getAs[Boolean]("hll_ok"))) shouldBe true
    // mergeability: per-day union-of-daily-sketches estimate vs a
    // direct sketch over that day's trailing-week rows (same lgK)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("ts").cast("date").as("eday"), col("user_id"))
    val days = ev.select(col("eday").as("day")).distinct()
    val direct = ev
      .join(broadcast(days), expr("day >= eday AND datediff(day, eday) <= 6"))
      .groupBy(col("day"))
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(user_id, 12)) as double)").as("d"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("d")).toMap
    val merged = ev.groupBy(col("eday"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .join(broadcast(days), expr("day >= eday AND datediff(day, eday) <= 6"))
      .groupBy(col("day"))
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as double)").as("m"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("m")).toMap
    merged.keySet shouldBe direct.keySet
    for ((d, m) <- merged) {
      withClue(s"day $d: merged $m vs direct ${direct(d)}") {
        math.abs(m - direct(d)) / direct(d) should be <= 0.02
      }
    }
  }

  test("§2.20 invariants hold on the real sf0.001 corpus") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    // Chao1 can never project FEWER types than observed; GT mass ∈ [0,1]
    val c = SparkEntry.queries("q226_chao1")(spark, sf).collect().head
    c.getAs[Double]("chao1") should be >= c.getAs[Long]("vocab").toDouble
    c.getAs[Double]("gt_unseen_mass") should (be >= 0.0 and be <= 1.0)
    // anisotropy of unit-mean-vector norm² ∈ [0,1]
    val iso = SparkEntry.queries("q232_isotropy")(spark, sf).collect().head
    iso.getAs[Double]("anisotropy") should (be >= 0.0 and be <= 1.0)
    // participation ratio ∈ [1, dim]
    val ed = SparkEntry.queries("q233_effective_dim")(spark, sf).collect().head
    ed.getAs[Double]("effective_dim") should (be >= 1.0 and
      be <= ed.getAs[Long]("dim").toDouble)
    // temperature shares are distributions; lower α is flatter (higher
    // entropy pull toward uniform) so every minority share grows as α↓
    val tm = SparkEntry.queries("q227_temperature_mix")(spark, sf).collect()
    math.abs(tm.map(_.getAs[Double]("share_t07")).sum - 1.0) should be <= 1e-4
    math.abs(tm.map(_.getAs[Double]("share_t03")).sum - 1.0) should be <= 1e-4
    // λ₁ is at most the trace and explains a share in (0, 1]
    val pca = SparkEntry.queries("q235_pca_power")(spark, sf).collect().head
    pca.getAs[Double]("lambda1") should be <= pca.getAs[Double]("trace")
    pca.getAs[Double]("explained_share") should (be > 0.0 and be <= 1.0)
    // Theil's U coefficients ∈ [0, 1]
    val u = SparkEntry.queries("q225_theils_u")(spark, sf).collect().head
    u.getAs[Double]("u_lang_given_source") should (be >= 0.0 and be <= 1.0)
    u.getAs[Double]("u_source_given_lang") should (be >= 0.0 and be <= 1.0)
  }

  test("q231: non-ASCII ratio means and doc shares per source") {
    val rows = SparkEntry.queries("q231_encoding_audit")(spark, fx).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    rows.keySet shouldBe Set("s1", "s2")
    val s1 = rows("s1") // "a a b", "c d" — pure ASCII
    s1.getAs[Long]("n_docs") shouldBe 2L
    s1.getAs[Double]("mean_nonascii_ratio") shouldBe 0.0
    s1.getAs[Double]("pct_nonascii_docs") shouldBe 0.0
    val s2 = rows("s2") // "e" (0/1), "ab©" (1/3)
    s2.getAs[Double]("mean_nonascii_ratio") shouldBe r6((q12(0.0) + q12(1.0 / 3.0)).toDouble / 2.0)
    s2.getAs[Double]("pct_nonascii_docs") shouldBe 0.5
  }
}
