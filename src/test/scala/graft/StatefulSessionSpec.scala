package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Ev, Sess, SessState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Drives the flatMapGroupsWithState sessionizer through a real
  * multi-microbatch stream (3 time-ordered files, maxFilesPerTrigger=1,
  * so sessions MUST be stitched across batches via the state store) and
  * checks it against the batch q46 result: every closed session matches
  * exactly; only each user's final (still-open) session is unemitted.
  */
class StatefulSessionSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("stateful streaming sessionization matches batch q46 on closed sessions") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_stateful").toString

    // stage the events as 3 event-time-ordered files (tercile split)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("event_id"))
    val Array(t1, t2) = evs.stat.approxQuantile("ts_us", Array(1.0 / 3, 2.0 / 3), 0.0)
    evs.filter(col("ts_us") <= t1).coalesce(1).write.parquet(s"$in/b0")
    evs.filter(col("ts_us") > t1 && col("ts_us") <= t2).coalesce(1).write.parquet(s"$in/b1")
    evs.filter(col("ts_us") > t2).coalesce(1).write.parquet(s"$in/b2")

    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_id", LongType)))
    spark.catalog.dropTempView("stateful_sess")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*/")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Sess](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(StatefulSessions.sessionize)
      .writeStream.format("memory").queryName("stateful_sess")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // AvailableNow + maxFilesPerTrigger=1 → one microbatch per file
    q.recentProgress.map(_.batchId).distinct.length should be >= 3

    val streamed = spark.table("stateful_sess").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap

    val batch = SparkEntry.queries("q46_sessionize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
    val lastPerUser = batch.keySet.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

    streamed.size should be > 0
    for ((k, v) <- streamed) withClue(k) { batch(k) shouldBe v }
    val unemitted = batch.keySet.diff(streamed.keySet)
    // exactly the final open session per user is withheld
    unemitted shouldBe lastPerUser.map { case (u, s) => (u, s) }.toSet

    // --- same pipeline on the transformWithState successor API ------
    // (requires the RocksDB state store provider)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.catalog.dropTempView("tws_sess")
      val q2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*/")
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new graft.streaming.TwsSessionizer,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_sess")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      val tws = spark.table("tws_sess").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
      tws shouldBe streamed // both stateful APIs emit identical sessions
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
