package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Per-operator edge cases on tiny in-memory data plus invariants of
  * the declared query pack on sf0.001 (SURVEY.md §5.2/§5.3).
  */
class OperatorSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("every declared query returns rows and every oracle key has a query") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keySet.diff(qs.keySet) shouldBe empty
    // spot-run a representative subset end-to-end (full set = Verify)
    for (k <- Seq("q16_corr_pair", "q25_rank_topk", "q36_wordcount",
      "q44_window_tumble", "q49_minhash_lsh", "q55_ann_lsh")) {
      withClue(k) { qs(k)(spark, sf).limit(5).count() should be > 0L }
    }
  }

  test("spearman rank formulation equals the naive window formulation") {
    import org.apache.spark.sql.expressions.Window
    // naive avg-rank via unpartitioned windows (correct but unscalable)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"))
    val wq = Window.orderBy(col("l_quantity"))
    val wp = Window.orderBy(col("l_extendedprice"))
    val naive = li
      .withColumn("rq", rank().over(wq) + (count(lit(1)).over(Window.partitionBy(col("l_quantity"))) - 1) / 2.0)
      .withColumn("rp", rank().over(wp) + (count(lit(1)).over(Window.partitionBy(col("l_extendedprice"))) - 1) / 2.0)
      .agg(round(corr(col("rq"), col("rp")), 6)).head().getDouble(0)
    val scaled = SparkEntry.queries("q22_spearman")(spark, sf).head().getDouble(0)
    scaled shouldBe naive
  }

  test("sessionize: gap of exactly 30 min stays in-session; >30 min splits") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000)
    val events = Seq(
      (1L, at(0), 1L), (2L, at(30), 1L),   // gap == 30 → same session
      (3L, at(61), 1L),                    // gap 31 → new session
      (4L, at(0), 2L))                     // singleton user
      .toDF("event_id", "ts", "user_id")
    events.createOrReplaceTempView("tiny_events")
    val sess = spark.sql(
      """SELECT user_id, sess_id, count(*) AS n FROM (
        |  SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTES
        |      THEN 1 ELSE 0 END AS new_sess FROM tiny_events))
        |GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sess shouldBe Array((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L))
  }

  test("dedup is idempotent and fingerprint ignores token order/duplication") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a c"), (2L, "a b c c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"), md5(expr(
      "cast(array_join(array_sort(array_distinct(filter(split(text, ' '), x -> x <> ''))), ' ') as binary)")).as("fp"))
    val fps = fp.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fps(1L) shouldBe fps(2L) // same canonical token set
    fps(1L) should not be fps(3L)
    val dd = docs.dropDuplicates("text")
    dd.dropDuplicates("text").count() shouldBe dd.count()
  }

  test("near-dup jaccard is symmetric and bounded") {
    val rows = SparkEntry.queries("q40_dedup_near")(spark, sf).collect()
    all(rows.map(_.getAs[Double]("jaccard"))) should (be >= 0.0 and be <= 1.0)
    // doc_a < doc_b canonical ordering means no pair appears twice
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    pairs.distinct.length shouldBe pairs.length
    all(pairs.map { case (a, b) => a < b }) shouldBe true
  }

  test("window running-sum final value equals the group sum") {
    val frames = SparkEntry.queries("q27_frames")(spark, sf).collect()
    val lastPerType = frames.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.maxBy(_.getAs[Any]("day").toString).getAs[Double]("run_sum") }
    val daySums = frames.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> BigDecimal(rs.map(_.getAs[Double]("day_sum")).sum).setScale(4, BigDecimal.RoundingMode.HALF_UP) }
    for ((t, rs) <- lastPerType)
      BigDecimal(rs).setScale(4, BigDecimal.RoundingMode.HALF_UP) shouldBe daySums(t)
  }

  test("ANN buckets are deterministic and partition the vector set") {
    val r1 = SparkEntry.queries("q55_ann_lsh")(spark, sf).collect()
    val r2 = SparkEntry.queries("q55_ann_lsh")(spark, sf).collect()
    r1.map(_.toString) shouldBe r2.map(_.toString)
    r1.length shouldBe 3 // one row per probe
  }

  test("simhash of identical token multisets is identical") {
    val sims = SparkEntry.queries("q50_simhash")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    sims.size should be > 0
    all(sims.values.map(v => v >= 0L && v < (1L << 16))) shouldBe true
  }
}
