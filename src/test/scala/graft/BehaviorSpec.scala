package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula-level tests for the Behavior pack (q147–q149) on tiny
  * hand-computed fixtures: association-rule support/confidence/lift,
  * last-touch attribution (freshness cutoff, same-timestamp tie-break,
  * no-touch fallback), and the sweep-line concurrency peak. Fixtures
  * are parquet in a temp dir and the REAL SparkEntry.queries lambdas
  * run against it (same code path as the driver, including the ns→µs
  * events timestamp conversion).
  */
class BehaviorSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def ns(day: Int, hour: Int, min: Int, sec: Int = 0): Long = {
    val t = java.time.LocalDateTime.of(2024, 1, day, hour, min, sec)
    t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
  }

  private lazy val fx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_behaviorfx_").toString
    import spark.implicits._

    // Baskets: o1={10,20,30} o2={10,20} o3={10,30} o4={20,30} o5={10}
    // → n_orders=5, cnt(10)=4, cnt(20)=3, cnt(30)=3,
    //   pair counts all 2: (10,20) (10,30) (20,30).
    Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 20L), (4L, 30L),
      (5L, 10L)
    ).toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")

    // user 1: click, view, purchase(10) on day 1 → last touch 'view';
    //         purchase(20) on day 5 → last touch is day-1 view, older
    //         than the 3-day cutoff → 'none'.
    // user 2: purchase(5) with no preceding touch → 'none';
    //         view, then click and purchase at the SAME ts (ids 7 < 8:
    //         the click precedes in (ts, event_id) order) → 'click'(7.5).
    // The 'error' row must be ignored entirely.
    Seq(
      (1L, ns(1, 1, 0), 1L, "click", Option(1.0), "{}"),
      (2L, ns(1, 2, 0), 1L, "view", Option(1.0), "{}"),
      (3L, ns(1, 3, 0), 1L, "purchase", Option(10.0), "{}"),
      (4L, ns(5, 1, 0), 1L, "purchase", Option(20.0), "{}"),
      (5L, ns(1, 1, 0), 2L, "purchase", Option(5.0), "{}"),
      (6L, ns(2, 1, 0), 2L, "view", Option(1.0), "{}"),
      (7L, ns(2, 2, 0), 2L, "click", Option(1.0), "{}"),
      (8L, ns(2, 2, 0), 2L, "purchase", Option(7.5), "{}"),
      (9L, ns(2, 3, 0), 2L, "error", Option(99.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  // Separate events fixture for q149 — the concurrency shape needs
  // controlled minutes, not the attribution scenario above.
  private lazy val fxConc: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_concfx_").toString
    import spark.implicits._
    // day 1: u1 session spans minutes [01,03]; u2 session is the single
    // minute [02,02] → concurrency 1,2,1 over minutes 01..03, peak 2
    // at 00:02. day 2: one single-event session → peak 1.
    Seq(
      (1L, ns(1, 0, 1, 30), 1L, "view", Option(1.0), "{}"),
      (2L, ns(1, 0, 3, 10), 1L, "click", Option(1.0), "{}"),
      (3L, ns(1, 0, 2, 5), 2L, "view", Option(1.0), "{}"),
      (4L, ns(2, 0, 7, 0), 3L, "view", Option(1.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q147 support/confidence/lift on a hand-computed basket set") {
    val rows = SparkEntry.queries("q147_assoc_rules")(spark, fx).collect()
    rows.length shouldBe 3
    // highest lift first: (20,30) lift = 2*5/(3*3)
    val r0 = rows(0)
    (r0.getAs[Long]("ante"), r0.getAs[Long]("cons")) shouldBe ((20L, 30L))
    r0.getAs[Long]("pair_cnt") shouldBe 2L
    r0.getAs[Double]("support") shouldBe 0.4
    r0.getAs[Double]("confidence") shouldBe (2.0 / 3 +- 1e-6)
    r0.getAs[Double]("lift") shouldBe (10.0 / 9 +- 1e-6)
    // ties on lift = 2*5/(4*3) break by (ante, cons)
    val tied = rows.drop(1).map(r =>
      (r.getAs[Long]("ante"), r.getAs[Long]("cons"), r.getAs[Double]("lift")))
    tied.map(t => (t._1, t._2)) shouldBe Array((10L, 20L), (10L, 30L))
    tied.foreach(_._3 shouldBe (10.0 / 12 +- 1e-6))
  }

  test("q148 last-touch attribution: cutoff, tie-break, none-fallback") {
    val rows = SparkEntry.queries("q148_attribution")(spark, fx).collect()
      .map(r => r.getAs[String]("touch") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("revenue")))).toMap
    rows.keySet shouldBe Set("click", "none", "view")
    rows("view") shouldBe ((1L, 10.0))   // fresh last touch
    rows("click") shouldBe ((1L, 7.5))   // same-ts, smaller id precedes
    rows("none") shouldBe ((2L, 25.0))   // stale touch (20) + no touch (5)
  }

  test("q149 sweep-line peak concurrency per day") {
    val rows = SparkEntry.queries("q149_concurrency")(spark, fxConc).collect()
    rows.length shouldBe 2
    val d1 = rows(0)
    d1.getAs[Long]("n_sessions") shouldBe 2L
    d1.getAs[Long]("peak_conc") shouldBe 2L
    d1.getAs[Any]("peak_minute").toString should startWith("2024-01-01 00:02:00")
    val d2 = rows(1)
    d2.getAs[Long]("n_sessions") shouldBe 1L
    d2.getAs[Long]("peak_conc") shouldBe 1L
  }
}
