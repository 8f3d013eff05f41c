package graft.streaming

import graft.QueryPack
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** SURVEY.md §2.10 (q47): a real Structured Streaming pipeline — file
  * source → event-time watermark → tumbling-window aggregation → memory
  * sink, driven to completion with Trigger.AvailableNow so the query fn
  * can return the final result as a batch DataFrame.
  *
  * Semantics demonstrated:
  *  - event-time processing: the 1-hour windows are computed on the
  *    event's own `ts`, not arrival time;
  *  - watermarking: `withWatermark("ets", "10 minutes")` bounds state —
  *    in append mode only windows closed by the watermark emit, so the
  *    trailing open window is (correctly) withheld; at 100 TB/day this
  *    is what keeps the state store finite;
  *  - exactly the same aggregation as the batch twin q44 — stream/batch
  *    equivalence over the emitted (closed) windows is asserted in the
  *    test suite.
  *
  * No DuckDB oracle (a stream can't be replayed in DuckDB) → driver
  * records a rows-only check, per the SparkEntry contract.
  */
object Streaming extends QueryPack {

  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // INT64 TIMESTAMP(NANOS) read as ns-long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def queries: Map[String, Q] = Map(
    "q47_stream_demo" -> ((s, dir) => {
      s.catalog.dropTempView("q47_mem")
      // The file source monitors a DIRECTORY for arriving files; stage
      // the (read-only) events file into one, as a real ingest dir would.
      // Per-run temp dir: a fixed shared path would ingest stale files
      // from earlier runs (and concurrent runs at different SFs would
      // corrupt each other's window counts).
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val in = Files.createTempDirectory("graft_stream_in_")
      in.toFile.deleteOnExit()
      Files.copy(Paths.get(s"$dir/events.parquet"),
        in.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      val q = s.readStream
        .schema(rawSchema)
        .parquet(in.toString)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ets", "10 minutes")
        // watermark-bounded dedup state: an event_id reappearing within
        // the watermark window is dropped; state for ids older than the
        // watermark is evicted (exactly-once-per-id at bounded memory)
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
        .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_v"))
        .writeStream
        .format("memory")
        .queryName("q47_mem")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("q47_mem").orderBy(col("w_start"), col("event_type"))
    }),
  )

  def oracles: Map[String, String] = Map.empty
}
