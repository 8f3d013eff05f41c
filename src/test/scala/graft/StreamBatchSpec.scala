package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stream/batch equivalence (SURVEY.md §5.6): every window the
  * streaming pipeline (q47, append mode, 10-min watermark) emits must
  * carry exactly the counts/sums the batch twin (q44) computes for that
  * window, and the windows it withholds must all be at the tail the
  * watermark hadn't closed.
  */
class StreamBatchSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q191 outer join actually exercises the null-emission path") {
    // the oracle proves stream ≡ batch; this pins that the OUTER part
    // is non-trivial — some views have no qualifying click and their
    // null-extended rows must have flushed before termination.
    val rows = SparkEntry.queries("q191_stream_outer_join")(spark, sf).collect()
    rows.length should be > 0
    rows.map(_.getAs[Long]("n_unmatched")).sum should be > 0L
    rows.foreach { r =>
      r.getAs[Long]("n_rows") shouldBe
        r.getAs[Long]("n_matched") + r.getAs[Long]("n_unmatched")
    }
  }

  test("q47 emits exactly the batch replay of the lagged late-drop, and drops are real") {
    import org.apache.spark.sql.functions._
    val stream = SparkEntry.queries("q47_stream_demo")(spark, sf).collect()
      .map(r => (r.getAs[Long]("w_start_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v"))).toMap
    // batch replay of the documented semantics: moved rows (early,
    // user_id%7==3, staged two tranches late) survive iff their
    // hour-window END exceeds wm0 = floor(maxTsUs(b0)/1000)ms − 10 min
    val b1 = 1704931200000000L
    val e = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        col("event_type"), col("value"))
    val movedC = col("ts_us") <= b1 && col("user_id") % 7 === 3
    val wm0 = (e.filter(col("ts_us") <= b1 && !(col("user_id") % 7 === 3))
      .agg(max(col("ts_us"))).first().getLong(0) / 1000L - 600000L) * 1000L
    val hourUs = 3600L * 1000000L
    val winEnd = (floor(col("ts_us") / hourUs) + 1) * hourUs
    val kept = e.filter(!movedC).union(e.filter(movedC && winEnd > wm0))
    val batch = kept
      .groupBy((floor(col("ts_us") / hourUs) * hourUs).as("w_start_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
      .collect()
      .map(r => (r.getAs[Long]("w_start_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v"))).toMap
    stream.size should be > 0
    stream shouldBe batch
    // the drop is non-trivial: some moved rows must actually have been
    // discarded by the watermark (emitted total < full no-drop total)
    val full = e.count()
    val emitted = stream.values.map(_._1).sum
    emitted should be < full
    emitted shouldBe kept.count()
  }

  test("q90 stream-stream join emits exactly the batch interval join") {
    import org.apache.spark.sql.functions._
    val stream = SparkEntry.queries("q90_stream_join")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("first_view"), r.getAs[Double]("click_value"))).toMap
    val e = Tables.events(spark, sf)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"), col("value").as("c_value"))
    val batch = v.join(c, col("user_id") === col("c_user")
        && col("cts") > col("vts")
        && col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), min(col("view_id")).as("first_view"),
        round(sum(col("c_value").cast("decimal(18,2)")).cast("double"), 6).as("click_value"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("first_view"), r.getAs[Double]("click_value"))).toMap
    stream.size should be > 0
    // inner stream-stream join under AvailableNow = the batch join, no
    // more (state never evicts a live match) and no less (all emitted)
    stream shouldBe batch
  }

  test("q156 stream-static enrichment emits exactly the batch dim join") {
    import org.apache.spark.sql.functions._
    val stream = SparkEntry.queries("q156_stream_enrich")(spark, sf).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    val batch = Tables.events(spark, sf)
      .withColumn("nk", col("user_id") % 25)
      .join(Tables.nation(spark, sf), col("nk") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4).as("sum_value"))
      .collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    stream.size should be > 0
    // stateless per-batch broadcast join: emitted rows are exactly the
    // batch inner join regardless of tranche boundaries
    stream shouldBe batch
  }
}
