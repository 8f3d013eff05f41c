package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The late-data contract (SURVEY.md §5.6): an event arriving after
  * the watermark has passed its window is DROPPED from the aggregation
  * — asserted by replaying two files where the second carries an event
  * far older than the watermark established by the first.
  */
class WatermarkSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("event older than the watermark is dropped from the windowed agg") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_late").toString
    def ns(min: Long): Long = min * 60L * 1000000000L // minutes → ns epoch

    // batch 0: two on-time events at t=0h and t=5h → watermark ≈ 4h50m
    Seq((1L, ns(0), 1L, "click", 1.0, "{}"), (2L, ns(300), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$in/b0")
    Thread.sleep(1100) // distinct mod-times → deterministic file order
    // batch 1: on-time filler (watermark propagation to the operator
    // filter lags one batch boundary in AvailableNow replays)
    Seq((3L, ns(305), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(1100)
    // batch 2: a LATE event for the t=1h window (far below the
    // established watermark) plus an on-time one
    Seq((5L, ns(60), 1L, "click", 1.0, "{}"), (6L, ns(310), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$in/b2")

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.catalog.dropTempView("late_agg")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*/")
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("cnt"))
      .writeStream.format("memory").queryName("late_agg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    info("batches: " + q.recentProgress.map(p =>
      s"[batch ${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}]").mkString(" "))

    val byWindow = spark.table("late_agg").collect()
      .map(r => r.getAs[java.sql.Timestamp]("w_start").toString -> r.getAs[Long]("cnt")).toMap
    // t=0h window emitted with ONLY the on-time event; the late t=1h
    // event produced no window at all (dropped, not resurrected)
    byWindow.keySet.exists(_.startsWith("1970-01-01 00:00")) shouldBe true
    byWindow.filter(_._1.startsWith("1970-01-01 01:00")) shouldBe empty
    byWindow.count(_ => true) should be >= 1
  }
}
