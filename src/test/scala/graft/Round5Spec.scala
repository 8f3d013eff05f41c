package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/semantics tests for the round-5 queries (q134–q141) beyond
  * the DuckDB oracle, on tiny hand-computed parquet fixtures (same
  * discipline as ScienceSpec: the oracle proves engine parity; these
  * prove the formulas and operator semantics themselves).
  */
class Round5Spec extends AnyFunSuite with Matchers with SharedSpark {

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r5fx_").toString
    import spark.implicits._

    def ns(day: Int, hour: Int): Long = {
      val t = java.time.LocalDateTime.of(2024, 1, day, hour, 0, 0)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    }
    // daily (views, clicks) = (2,0), (1,1), (2,2) — kendall fixture
    Seq(
      (1L, ns(1, 1), 1L, "view", Option(1.0), "{}"),
      (2L, ns(1, 2), 2L, "view", Option(2.0), "{}"),
      (3L, ns(2, 1), 1L, "view", Option(2.0), "{}"),
      (4L, ns(2, 2), 3L, "click", Option(2.0), "{}"),
      (5L, ns(3, 1), 4L, "view", Option(3.0), "{}"),
      (6L, ns(3, 2), 1L, "view", Option(3.5), "{}"),
      (7L, ns(3, 3), 2L, "click", Option(3.0), "{}"),
      (8L, ns(3, 4), 3L, "click", Option(4.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // gini fixture: prices .5, 10.5, 19.9, 22, 100, 315.2 (no filter)
    Seq(
      (1L, 1L, "O", 10.5), (2L, 1L, "O", 19.9), (3L, 2L, "O", 22.0),
      (4L, 2L, "O", 0.5), (5L, 3L, "O", 100.0), (6L, 3L, "F", 315.2)
    ).map { case (k, c, st, p) =>
      (k, c, st, p, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

    Seq(
      (1L, "spark join spark", "en", "src2", 16L),
      (2L, "filter spark x", "en", "src2", 14L),
      (3L, "y z", "en", "src2", 3L),
      (4L, "a b b b", "en", "src1", 7L),
      (5L, "a a b", "en", "src0", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // two flags, hand-summable measures (only the referenced columns)
    Seq(
      ("A", 1.0, 10.0, 0.10), ("A", 2.0, 20.0, 0.20), ("R", 3.0, 30.0, 0.30)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, fx)

  test("q134 unpivot melts each aggregated measure into its own row") {
    val rows = q("q134_unpivot").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("measure"),
        r.getAs[Double]("val"))).toSeq
    rows shouldBe Seq(
      ("A", "sum_disc", 0.3), ("A", "sum_price", 30.0), ("A", "sum_qty", 3.0),
      ("R", "sum_disc", 0.3), ("R", "sum_price", 30.0), ("R", "sum_qty", 3.0))
  }

  test("q135 gini matches the hand-computed rank formula with a tie-free frame") {
    // sorted .5, 10.5, 19.9, 22, 100, 315.2 → Σi·x = 2560.4, Σx = 468.1
    val r = q("q135_gini").collect()
    r should have length 1
    r.head.getAs[Long]("n") shouldBe 6L
    r.head.getAs[Double]("total") shouldBe 468.1 +- 1e-9
    r.head.getAs[Double]("gini") shouldBe
      (2.0 * 2560.4 / (6 * 468.1) - 7.0 / 6) +- 1e-6
  }

  test("q135 gini handles ties via the tie-block closed form") {
    // sanity against a direct per-row recompute on sf0.001 (has ties):
    // G from sorted row_number is tie-order-invariant since tied v equal
    val g = SparkEntry.queries("q135_gini")(spark, sf).collect().head
    val xs = Tables.orders(spark, sf).select(col("o_totalprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = xs.length
    val t = BigDecimal(xs.map(BigDecimal(_)).sum.toString)
    val s2 = xs.zipWithIndex.map { case (x, i) => BigDecimal(x) * 2 * (i + 1) }.sum
    g.getAs[Long]("n") shouldBe n.toLong
    g.getAs[Double]("gini") shouldBe
      (s2.toDouble / (n * t.toDouble) - (n + 1.0) / n) +- 1e-6
  }

  test("q136 kendall tau-b: concordant/discordant/tie counts by hand") {
    // daily (x,y): (2,0),(1,1),(2,2) → 1 concordant, 1 discordant, 1 x-tie
    val r = q("q136_kendall_tau").collect()
    r should have length 1
    r.head.getAs[Long]("n0") shouldBe 3L
    r.head.getAs[Long]("nc") shouldBe 1L
    r.head.getAs[Long]("nd") shouldBe 1L
    r.head.getAs[Double]("tau_b") shouldBe 0.0 +- 1e-9
  }

  test("q137 weighted sample: A-Res key recomputed from md5 for every row") {
    val rows = SparkEntry.queries("q137_weighted_sample")(spark, sf).collect()
    rows should have length 20
    val ks = rows.map(_.getAs[Double]("key_x1000"))
    ks.toSeq shouldBe ks.sortBy(-_).toSeq // descending
    val mdig = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val hex = mdig.digest(r.getAs[Long]("doc_id").toString
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val u = (h + 0.5) / 1152921504606846976.0
      val k = math.log(u) / r.getAs[Long]("n_chars") * 1000.0
      r.getAs[Double]("key_x1000") shouldBe k +- 1e-9
    }
  }

  test("q138 SQL TPC-H Q3: top-10 by revenue, descending, consistent with a recompute") {
    val rows = SparkEntry.queries("q138_sql_tpch_q3")(spark, sf).collect()
    rows.length should be <= 10
    rows.length should be > 0
    val revs = rows.map(_.getAs[Double]("revenue"))
    revs.toSeq shouldBe revs.sortBy(-_).toSeq
    // cross-check the top row against a DataFrame-API recompute
    val top = rows.head
    val df = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("c_mktsegment") === "BUILDING"
        && col("o_orderdate") < lit("1998-07-01").cast("timestamp_ntz")
        && col("l_shipdate") > lit("1998-07-01").cast("timestamp_ntz"))
      .filter(col("l_orderkey") === top.getAs[Long]("l_orderkey"))
      .agg(round(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(18,6))"))
        .cast("double"), 2).as("rev"))
      .collect().head.getAs[Double]("rev")
    top.getAs[Double]("revenue") shouldBe df +- 1e-6
  }

  test("q139 grouping sets: the ALL/ALL row equals the joined grand total") {
    val rows = SparkEntry.queries("q139_grouping_sets")(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("nation") == "ALL"
      && r.getAs[String]("priority") == "ALL")
    grand should have length 1
    val joined = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
    grand.head.getAs[Long]("n_orders") shouldBe joined.count()
    // per-nation subtotals sum to the grand total
    val perNation = rows.filter(r => r.getAs[String]("nation") != "ALL"
      && r.getAs[String]("priority") == "ALL")
    perNation.map(_.getAs[Long]("n_orders")).sum shouldBe grand.head.getAs[Long]("n_orders")
  }

  test("q140 map_fns: map_filter keeps exactly the cnt>=2 entries") {
    val rows = q("q140_map_fns").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_distinct"),
        r.getAs[String]("tok"), r.getAs[Long]("cnt"))).toSeq
    rows shouldBe Seq((1L, 2, "spark", 2L), (4L, 2, "b", 3L), (5L, 2, "a", 2L))
  }

  test("q142 IVF-PQ search: approx ranks from codes, exact re-rank verified brute-force") {
    val rows = SparkEntry.queries("q142_ivfpq_search")(spark, sf).collect()
    rows.length should be > 0
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      rs.length should be <= 3
      val ds = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("d2"))
      ds.toSeq shouldBe ds.sorted.toSeq // exact distances ascend with rank
    }
    // the reported exact d2 must equal a brute-force recompute for every row
    val e = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    rows.foreach { r =>
      val p = e(r.getAs[Long]("probe_id")); val v = e(r.getAs[Long]("vec_id"))
      var acc = 0.0
      for (i <- p.indices) { val dd = v(i) - p(i); acc += dd * dd }
      r.getAs[Double]("d2") shouldBe
        (BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) +- 1e-6
    }
  }

  test("q143 distance correlation matches a scalar double-centering recompute") {
    // daily (x,y) = (2,0),(1,1),(2,2) on the fixture
    val r = q("q143_distance_corr").collect()
    r should have length 1
    val xs = Array(2.0, 1.0, 2.0); val ys = Array(0.0, 1.0, 2.0); val n = 3
    def centered(v: Array[Double]): Array[Array[Double]] = {
      val a = Array.tabulate(n, n)((i, j) => math.abs(v(i) - v(j)))
      val rm = a.map(_.sum / n)
      val g = a.flatten.sum / (n * n)
      Array.tabulate(n, n)((i, j) => a(i)(j) - rm(i) - rm(j) + g)
    }
    val aa = centered(xs); val bb = centered(ys)
    def m2(p: Array[Array[Double]], q2: Array[Array[Double]]) =
      (for (i <- 0 until n; j <- 0 until n) yield p(i)(j) * q2(i)(j)).sum / (n * n)
    val dcov2 = m2(aa, bb)
    val dcor = math.sqrt(dcov2 / math.sqrt(m2(aa, aa) * m2(bb, bb)))
    r.head.getAs[Long]("n_days") shouldBe 3L
    r.head.getAs[Double]("dcov2") shouldBe dcov2 +- 1e-6
    r.head.getAs[Double]("dcor") shouldBe dcor +- 1e-6
  }

  test("q144 event paths: the only 3-step path on the fixture is u1's view chain") {
    val rows = q("q144_event_paths").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    rows shouldBe Seq((1, "view>view>view", 1L))
  }

  test("q145 transformWithState sessionizer emits exactly q81's sessions") {
    val tws = SparkEntry.queries("q145_stream_sessionize_tws")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
    val fmgws = SparkEntry.queries("q81_stream_sessionize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
    tws.size should be > 0
    tws shouldBe fmgws
  }

  test("q146 perplexity matches a scalar add-1 bigram LM recompute") {
    // corpus = the 5 fixture docs; recompute counts + scores in plain Scala
    val docs = Map(1L -> "spark join spark", 2L -> "filter spark x",
      3L -> "y z", 4L -> "a b b b", 5L -> "a a b")
    val toks = docs.view.mapValues(_.split(" ").filter(_.nonEmpty).toSeq).toMap
    val uc = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = uc.size
    val bigrams = toks.values.flatMap(w => w.zip(w.tail)).toSeq
    val bc = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val rows = q("q146_perplexity").collect()
    rows.length shouldBe docs.count(d => toks(d._1).length >= 2)
    rows.foreach { r =>
      val w = toks(r.getAs[Long]("doc_id"))
      val pairs = w.zip(w.tail)
      val nll = pairs.map { p =>
        val q6 = BigDecimal(-math.log((bc(p) + 1.0) / (uc(p._1).toDouble + vocab)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        q6
      }.sum.toDouble / pairs.length
      r.getAs[Long]("n_bigrams") shouldBe pairs.length.toLong
      r.getAs[Double]("avg_nll") shouldBe nll +- 1e-6
      r.getAs[Double]("ppl") shouldBe math.exp(nll) +- 1e-5
    }
  }

  test("q141 streaming dedup emits exactly the batch distinct key set") {
    val streamed = SparkEntry.queries("q141_stream_dedup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString)).toSeq.sorted
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts").cast("date").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString)).toSeq.sorted
    streamed shouldBe batch
  }
}
