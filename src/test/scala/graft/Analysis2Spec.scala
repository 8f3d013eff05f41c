package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Invariants for the second round-3 batch (q109–q113) beyond the
  * DuckDB oracle: session_window's exclusive-end boundary, PageRank
  * mass conservation, and observe-vs-recompute consistency.
  */
class Analysis2Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("session_window merges an exactly-gap-sized step (boundary is <=)") {
    import spark.implicits._
    // +30min exactly → still the SAME session; +30min1s → a new one
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val df = Seq(
      (1L, t0),
      (1L, t0.plusSeconds(30 * 60)),
      (1L, t0.plusSeconds(30 * 60 + 30 * 60 + 1))
    ).toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("sw.start"))
      .collect()
    sessions.map(_.getAs[Long]("n")).toSeq shouldBe Seq(2L, 1L)
  }

  test("q110 session count matches the > gaps-and-islands recompute") {
    val viaBuiltin = SparkEntry.queries("q110_session_window")(spark, sf).count()
    val manual = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id",
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
          "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS ns")
      .agg(sum(col("ns"))).collect().head.getLong(0)
    viaBuiltin shouldBe manual
  }

  test("q112 pagerank conserves probability mass and ranks the hubs") {
    val rows = SparkEntry.queries("q112_pagerank")(spark, sf).collect()
    rows.length should be > 0
    // with no dangling nodes, total rank stays 1 up to rounding
    rows.map(_.getAs[Double]("rank")).sum shouldBe 1.0 +- 1e-3
    // rank should correlate with degree: the top-ranked node's degree
    // must be >= the median degree (hubs rise)
    val degs = rows.map(_.getAs[Long]("deg")).sorted
    rows.head.getAs[Long]("deg") should be >= degs(degs.length / 2)
  }

  test("q113 observed metrics equal a direct recompute") {
    val r = SparkEntry.queries("q113_observe")(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
    r.getAs[Long]("n_rows") shouldBe li.count()
    r.getAs[Long]("n_hi_disc") shouldBe li.filter(col("l_discount") > 0.05).count()
    r.getAs[Long]("n_null_price") shouldBe 0L
  }

  test("q114 reconcile partitions the key space exactly") {
    val rows = SparkEntry.queries("q114_reconcile")(spark, sf).collect()
    val byStatus = rows.map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    byStatus.keySet shouldBe Set("added", "removed", "changed", "unchanged")
    val o = Tables.orders(spark, sf).select(col("o_orderkey")).collect().map(_.getLong(0))
    // full outer join covers every key present in either version once
    byStatus.values.sum shouldBe o.count(k => k % 97 != 0 || k % 89 != 0)
    byStatus("added") shouldBe o.count(k => k % 97 == 0 && k % 89 != 0)
    byStatus("removed") shouldBe o.count(k => k % 89 == 0 && k % 97 != 0)
    byStatus("changed") shouldBe o.count(k => k % 7 == 0 && k % 97 != 0 && k % 89 != 0)
  }

  test("q115 equal-frequency bins cover all rows with near-equal mass") {
    val rows = SparkEntry.queries("q115_eqfreq_bins")(spark, sf).collect()
    rows should have length 10
    val n = Tables.orders(spark, sf).count()
    rows.map(_.getAs[Long]("n")).sum shouldBe n
    // deciles: each bin within 2% of n/10 (ties can shift boundaries)
    for (r <- rows) r.getAs[Long]("n").toDouble shouldBe (n / 10.0) +- (n * 0.02)
    // bins are ordered ranges: hi(bin) <= lo(bin+1)
    rows.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Double]("hi") should be <= b.getAs[Double]("lo")
    }
  }

  test("q116 anova decomposition: ssb + ssw = sst and F >= 0") {
    val r = SparkEntry.queries("q116_anova")(spark, sf).collect().head
    r.getAs[Long]("k") shouldBe 5L
    r.getAs[Double]("f_stat") should be >= 0.0
    r.getAs[Double]("eta_sq") should (be >= 0.0 and be <= 1.0)
    // eta² = ssb/sst ⇒ sst ≈ ssb/eta²; check additivity through it
    val sst = r.getAs[Double]("ssb") / r.getAs[Double]("eta_sq")
    (r.getAs[Double]("ssb") + r.getAs[Double]("ssw")) shouldBe sst +- sst * 1e-4
  }

  test("q117 mutual information bounds: 0 <= MI <= min(H), NMI in [0,1]") {
    val r = SparkEntry.queries("q117_mutual_info")(spark, sf).collect().head
    val (mi, hx, hy) = (r.getAs[Double]("mi"), r.getAs[Double]("h_x"), r.getAs[Double]("h_y"))
    mi should be >= -1e-9 // 6-dp rounding can graze zero from below
    mi should be <= math.min(hx, hy) + 1e-9
    r.getAs[Double]("nmi") should (be >= -1e-9 and be <= 1.0 + 1e-9)
  }

  test("q118 recursive chains have the closed-form length per root") {
    val rows = SparkEntry.queries("q118_recursive_cte")(spark, sf).collect()
    rows should have length 7
    for (r <- rows) {
      val root = r.getAs[Long]("root")
      // k, 2k, 4k, ... <= 100000  ⇒  floor(log2(100000/root)) + 1 nodes
      val expLen = (math.log(100000.0 / root) / math.log(2.0)).toInt + 1
      r.getAs[Long]("chain_len") shouldBe expLen
      r.getAs[Int]("max_depth").toLong shouldBe expLen - 1
    }
  }

  test("q119 lateral returns exactly top-2 per nation, correctly ranked") {
    val rows = SparkEntry.queries("q119_lateral")(spark, sf).collect()
    val nNations = Tables.nation(spark, sf).count()
    rows.length.toLong shouldBe 2 * nNations
    for (Array(a, b) <- rows.grouped(2).map(_.toArray)) {
      a.getAs[String]("n_name") shouldBe b.getAs[String]("n_name")
      a.getAs[Double]("c_acctbal") should be >= b.getAs[Double]("c_acctbal")
    }
  }

  test("q120 triangle identities: edges from degrees, 3·tri <= triads") {
    val r = SparkEntry.queries("q120_triangles")(spark, sf).collect().head
    val (nodes, edges) = (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))
    edges should be >= nodes / 2 // every node in the pair graph has deg >= 1
    (3L * r.getAs[Long]("n_triangles")) should be <= r.getAs[Long]("n_triads")
    r.getAs[Double]("clustering") should (be >= 0.0 and be <= 1.0)
  }

  test("q109 segs strings are sorted and consistent with n_segs") {
    val rows = SparkEntry.queries("q109_stringagg")(spark, sf).collect()
    for (r <- rows) {
      val segs = r.getAs[String]("segs").split(',').toSeq
      segs.sorted shouldBe segs
      segs.distinct.length.toLong shouldBe r.getAs[Long]("n_segs")
    }
  }
}
