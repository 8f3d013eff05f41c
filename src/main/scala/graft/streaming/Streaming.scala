package graft.streaming

import graft.{QueryPack, Tables}
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
  *  - watermarking with a REAL late-data drop: a deterministic subset
  *    of early rows (user_id % 7 == 3) is staged one tranche late, so
  *    the 10-minute watermark advanced by tranche 0 drops every moved
  *    row whose hour-window already closed — at 100 TB/day this is
  *    what keeps the state store finite;
  *  - append-mode emission: only watermark-closed windows emit; a
  *    far-future sentinel tranche (q191's idiom) closes all real
  *    windows before AvailableNow terminates.
  *
  * Since round 8 this carries a FULL DuckDB hash oracle: the surviving
  * row set is deterministic — Spark's watermark after tranche 0 is
  * floor(maxTsUs/1000)·ms − 10 min (EventTimeWatermarkExec tracks max
  * event time in MILLISECONDS), and a late row is dropped iff its
  * window end ≤ that watermark — so the emitted windows equal a batch
  * aggregate over (on-time rows ∪ surviving moved rows), which is the
  * oracle SQL. StreamBatchSpec pins stream ≡ oracle semantics.
  */
object Streaming extends QueryPack {

  /** Stateful streaming creates one state store per shuffle partition
    * per stateful operator per microbatch; at the session's 32
    * partitions that fixed machinery dominates these bounded-keyspace
    * demos' wall time. Pin state partitioning to 8 for the streaming
    * stage and restore after — at real scale this is the same decision
    * of sizing `spark.sql.shuffle.partitions` to the key cardinality.
    */
  private def withStateParts[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Far-future watermark-sentinel timestamp (µs): max(events.ts) + 30
    * days. Used by q191/q217/q220 to stage a final tranche that pushes
    * every watermark past all real data so pending state flushes before
    * AvailableNow terminates. Previously triplicated as a per-query
    * 1-row collect; now computed ONCE per (session, sfDir) via
    * Memo.perSession over the pruned ts column. Driver-side `.first()`
    * by design: the aggregate is a single scalar, bounded by
    * construction.
    */
  /** q285's per-batch state merge, extracted so StreamRecoverySpec can
    * drive the IDENTICAL code through kill/resume and replay scenarios:
    * contract the batch to per-user deltas, full-outer-merge into the
    * previous state version, write state/v{batchId}. Writing to a
    * BATCH-ID-KEYED path is the idempotence mechanism — a replayed
    * batch (restart after a sink write that never reached the commit
    * log) deterministically rewrites v{id} from the same v{id−1} + the
    * same data instead of double-counting.
    */
  private[graft] def mergeBatchIntoState(s: org.apache.spark.sql.SparkSession,
      st: String, batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      id: Long): Unit = {
    val delta = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("d_n"),
        sum(col("value").cast("decimal(18,2)")).as("d_sv"),
        max(col("ts_us")).as("d_mts"))
    val merged = (if (id == 0) {
      delta.select(col("user_id"), col("d_n").as("n"),
        col("d_sv").cast("decimal(28,2)").as("sv"), col("d_mts").as("mts"))
    } else {
      s.read.parquet(s"$st/v${id - 1}")
        .join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
          (coalesce(col("sv"), lit(BigDecimal(0)).cast("decimal(28,2)"))
            + coalesce(col("d_sv").cast("decimal(28,2)"),
              lit(BigDecimal(0)).cast("decimal(28,2)"))).cast("decimal(28,2)").as("sv"),
          greatest(coalesce(col("mts"), lit(Long.MinValue)),
            coalesce(col("d_mts"), lit(Long.MinValue))).as("mts"))
    })
    merged.write.mode("overwrite").parquet(s"$st/v$id")
  }

  /** Stage the tranche directories CONCURRENTLY (independent single-task
    * write jobs — guide §2.6 overlap), then stamp strictly increasing
    * modification times in tranche order. The file stream source orders
    * arrivals by mtime and tranche order is load-bearing (watermark
    * evolution / late-data drop), which is why the old code serialized
    * the writes; explicit mtime stamps keep that order deterministic —
    * strictly stronger than relying on write completion order — while
    * letting the writes overlap.
    */
  private def stageTranches(in: String,
      tranches: Seq[(String, org.apache.spark.sql.DataFrame)]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.traverse(tranches) { case (name, df) =>
      Future(df.coalesce(1).write.mode("overwrite").parquet(s"$in/$name"))
    }, Duration.Inf)
    // stamps sit 1 h in the PAST so a sentinel tranche some keys write
    // AFTER this call is newest by wall clock without its own stamp
    // (well under the source's 7-day maxFileAge window)
    val base = System.currentTimeMillis() - 3600000L
    tranches.zipWithIndex.foreach { case ((name, _), i) =>
      val t = java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L)
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(in, name))
      try st.forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
      finally st.close()
    }
  }

  private def farSentinelUs(s: org.apache.spark.sql.SparkSession, dir: String): Long =
    graft.ops.Memo.perSession(s, s"stream_far_sentinel_us:$dir") {
      Tables.events(s, dir)
        .agg(max(expr("unix_micros(cast(ts as timestamp))")))
        .first().getLong(0) + 30L * 86400 * 1000000L
    }

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Watermarked hour-window aggregation with a REAL late-data drop
    // and a full hash oracle. 4 tranches, one microbatch each:
    //   b0 = early rows (ts ≤ Jan 11) EXCEPT the moved set,
    //   b1 = mid rows,
    //   b2 = the rest + the MOVED set (early rows with user_id%7==3,
    //        arriving TWO tranches late),
    //   b3 = far-future sentinel (flushes all windows).
    // Spark 4 runs TWO watermarks per batch (so chained stateful
    // operators see consistent input): eviction uses the watermark from
    // data through batch N−1, but the LATE-EVENT filter uses the
    // previous batch's value — data through batch N−2 (measured here:
    // one-tranche-late rows are never dropped). Hence the moved set is
    // staged two tranches late: at batch b2 the late filter holds
    // exactly wm0 = floor(maxTsUs(b0)/1000)ms − 10 min, and drops every
    // moved row whose hour-window end ≤ wm0; moved rows in b0's final
    // open hour survive and merge into their (not yet evicted) windows.
    // That kept set is exactly batch-expressible → the oracle. w_start
    // is emitted as epoch MICROS (bigint) — tz-representation-proof
    // across the parquet/pandas/DuckDB compare path.
    "q47_stream_demo" -> ((s, dir) => {
      s.catalog.dropTempView("q47_mem")
      val inP = graft.ops.Stage.fresh("q47")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_type"), col("value"))
        .localCheckpoint() // shared by the 3 tranche writes
      val moved = col("ts_us") <= b1 && col("user_id") % 7 === 3
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1 && !moved),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2 || moved)))
      val far = farSentinelUs(s, dir)
      import s.implicits._
      Seq((-1L, far, "zz_sentinel", 0.0))
        .toDF("user_id", "ts_us", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b3")
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val q = withStateParts(s)(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
        .withColumn("ets", timestamp_micros(col("ts_us")))
        .withWatermark("ets", "10 minutes")
        .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
          col("cnt"), col("sum_v"))
        .writeStream
        .format("memory")
        .queryName("q47_mem")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start())
      q.awaitTermination()
      // results now live in the memory sink — drop the staged ingest
      // tree eagerly instead of holding it until JVM exit
      graft.ops.Stage.release(inP)
      s.table("q47_mem")
        .filter(col("event_type") =!= "zz_sentinel")
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    // ------------------------------------------------------------------
    // Stateful streaming sessionization — flatMapGroupsWithState with
    // per-user session state stitched ACROSS microbatches: events are
    // staged as 3 event-time-ordered files consumed one per microbatch
    // (maxFilesPerTrigger=1), so sessions spanning a file boundary must
    // survive in the state store. Emitted = every session CLOSED by an
    // observed >30-min gap; each user's trailing open session stays in
    // state. That set is exactly SQL-expressible (all batch q46
    // sessions minus each user's last), so unlike q47 this streaming
    // query has a full DuckDB hash oracle.
    "q81_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StatefulSessions.{Ev, Sess, SessState}
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      s.catalog.dropTempView("q81_mem")
      val inP = graft.ops.Stage.fresh("q81")
      val in = inP.toString
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("event_id"))
      // fixed event-time split boundaries (data spans 2024-01): each
      // tranche becomes one microbatch, deterministically
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType)))
      val q = withStateParts(s)(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*/")
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[SessState, Sess](
          OutputMode.Update(), GroupStateTimeout.NoTimeout)(
          graft.streaming.StatefulSessions.sessionize)
        .writeStream.format("memory").queryName("q81_mem")
        .outputMode("update").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q81_mem").orderBy(col("user_id"), col("sess_id"))
    }),

    // ------------------------------------------------------------------
    // Streaming session_window with a DYNAMIC per-event gap (the API's
    // closure form): views close after 10 min of quiet, everything
    // else after 20 — the per-event-type session policy a real
    // clickstream runs. Spark models each event as the interval
    // [ts, ts+gap(event)) and merges overlapping intervals in state
    // (UpdatingSessionsIterator), so a long-gap event can hold a
    // session open past a later short-gap one: session end = MAX event
    // end, not last-event end — exactly what the running-max oracle
    // replays. Three time-ordered tranches carry sessions across
    // microbatch boundaries through the session-state store; the
    // far-future sentinel (q191's idiom, filtered from the output)
    // advances the global watermark so append mode flushes every real
    // session before AvailableNow terminates. Window bounds emit as
    // epoch-µs bigints (q47's tz-proof recipe).
    "q298_stream_session_gap" -> ((s, dir) => {
      s.catalog.dropTempView("q298_mem")
      val inP = graft.ops.Stage.fresh("q298")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (q81's split)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_type"), col("value"))
        .localCheckpoint() // shared by the 3 tranche writes
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      s.range(1).select(lit(-1L).as("user_id"), lit(farSentinelUs(s, dir)).as("ts_us"),
          lit("view").as("event_type"), lit(0.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b3")
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val q = withStateParts(s)(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*/")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"),
          session_window(col("ts"),
            when(col("event_type") === "view", "10 minutes").otherwise("20 minutes")))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
        .select(col("user_id"),
          expr("unix_micros(session_window.start)").as("s_start_us"),
          expr("unix_micros(session_window.end)").as("s_end_us"),
          col("n_events"), col("sv"))
        .writeStream.format("memory").queryName("q298_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP)
      s.table("q298_mem").filter(col("user_id") >= 0)
        .select(col("user_id"), col("s_start_us"), col("s_end_us"),
          col("n_events"), round(col("sv").cast("double"), 2).as("sum_value"))
        .orderBy(col("user_id"), col("s_start_us"))
    }),

    // ------------------------------------------------------------------
    // STREAM-STREAM interval join with a full hash oracle: views ⋈
    // clicks (same user, click within 30 min after the view) as two
    // watermarked streams over 3 event-time-ordered microbatches, so
    // boundary matches must come from join STATE carried across
    // batches. Because the tranches are time-split and the 1 h
    // watermark exceeds the 30 min join window, state eviction can
    // never drop a legitimate match — the streaming inner join emits
    // exactly the batch join, which is the DuckDB oracle.
    "q90_stream_join" -> ((s, dir) => {
      s.catalog.dropTempView("q90_mem")
      val inP = graft.ops.Stage.fresh("q90")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      // tranche order b0<b1<b2 is load-bearing; stageTranches overlaps
      // the writes and stamps the order explicitly.
      // localCheckpoint so the 3 filter+write jobs share one events scan.
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def src() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("vts"),
          col("event_id").as("view_id"))
        .withWatermark("vts", "1 hour")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("cts"),
          col("value").as("c_value"))
        .withWatermark("cts", "1 hour")
      // the join keeps 4 state stores per shuffle partition per batch
      val q = withStateParts(s)(views.join(clicks,
          col("user_id") === col("c_user")
            && col("cts") > col("vts")
            && col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
        .writeStream.format("memory").queryName("q90_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q90_mem")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"), min(col("view_id")).as("first_view"),
          round(sum(col("c_value").cast("decimal(18,2)")).cast("double"), 6).as("click_value"))
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------------------
    // STREAMING DEDUP with bounded state — dropDuplicatesWithinWatermark
    // on (user_id, event_type, day) over the same 3 event-time-ordered
    // tranches as q81/q90. All rows of one key share one calendar day,
    // so the 25 h delay guarantees exact dedup (duplicates are never
    // farther apart than the watermark) while state for past days is
    // EVICTED as the watermark advances — the 100 TB shape, vs plain
    // dropDuplicates whose state grows forever. The output is projected
    // to the key alone, so whichever physical row is kept first the
    // emitted set is exactly DISTINCT(user, type, day) — the full-hash
    // DuckDB oracle. Time-split tranches mean no row is ever late
    // (batch N+1's events all exceed batch N's watermark), so nothing
    // is dropped.
    "q141_stream_dedup" -> ((s, dir) => {
      s.catalog.dropTempView("q141_mem")
      val inP = graft.ops.Stage.fresh("q141")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("event_type"))
        .localCheckpoint() // shared by the 3 tranche writes
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType)))
      val q = withStateParts(s)(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*/")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ets"))
        .withColumn("day", col("ets").cast("date"))
        .withWatermark("ets", "25 hours")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
        .select(col("user_id"), col("event_type"), col("day"))
        .writeStream.format("memory").queryName("q141_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q141_mem").orderBy(col("user_id"), col("event_type"), col("day"))
    }),

    // ------------------------------------------------------------------
    // q81's sessionizer on Spark 4's transformWithState — the successor
    // stateful API (named typed ValueState from the
    // StatefulProcessorHandle, RocksDB state store): identical fold,
    // identical emission contract, identical full DuckDB hash oracle.
    // Declaring BOTH APIs proves the state semantics, not one
    // operator's implementation detail. The provider conf is scoped to
    // this query and restored after (the default store serves every
    // other streaming query in the session).
    "q145_stream_sessionize_tws" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StatefulSessions.{Ev, Sess}
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      s.catalog.dropTempView("q145_mem")
      val inP = graft.ops.Stage.fresh("q145")
      val in = inP.toString
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("event_id"))
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType)))
      val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val q = withStateParts(s)(s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$in/*/")
          .as[Ev]
          .groupByKey(_.user_id)
          .transformWithState[Sess](new graft.streaming.TwsSessionizer,
            TimeMode.None(), OutputMode.Update())
          .writeStream.format("memory").queryName("q145_mem")
          .outputMode("update").trigger(Trigger.AvailableNow()).start())
        q.awaitTermination()
      } finally {
        prev match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None    => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q145_mem").orderBy(col("user_id"), col("sess_id"))
    }),

    // ------------------------------------------------------------------
    // STREAM-STATIC enrichment join — the remaining streaming join
    // shape after q90's stream-stream: every arriving event is enriched
    // against a static dimension (users→nation via a deterministic
    // user_id % 25 key) by a BROADCAST hash join inside each
    // microbatch. Stateless: no watermark, no state store — the static
    // side is planned once and re-broadcast per batch, which is exactly
    // how a 1000-executor deployment enriches a firehose against a dim
    // table. Emitted rows = batch join rows (inner join, append mode),
    // so the aggregate over the sink has a full DuckDB hash oracle.
    "q156_stream_enrich" -> ((s, dir) => {
      s.catalog.dropTempView("q156_mem")
      val inP = graft.ops.Stage.fresh("q156")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_type"), col("value"))
        .localCheckpoint() // shared by the 3 tranche writes
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val dim = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*/")
        .withColumn("nk", col("user_id") % 25)
        .join(broadcast(dim), col("nk") === col("n_nationkey"))
        .select(col("n_name"), col("event_type"), col("value"))
        .writeStream.format("memory").queryName("q156_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q156_mem")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4).as("sum_value"))
        .orderBy(col("n_name"))
    }),

    // ------------------------------------------------------------------
    // STREAM-STREAM LEFT OUTER join — the remaining join-mode surface
    // after q90's inner: views left-join clicks in a (0, 30 min]
    // window; a view with NO qualifying click must emit a null-extended
    // row, which the engine can only do once the watermark has
    // definitively passed the view's join window. A SENTINEL tranche
    // (one far-future view + click with negative ids, staged LAST)
    // advances both watermarks past all real data so every real
    // unmatched view flushes before AvailableNow terminates; the
    // sentinels themselves are filtered from the rollup. Oracle: the
    // equivalent BATCH left join — stream ≡ batch is the whole claim.
    // ------------------------------------------------------------------
    // Watermarked tumbling-window aggregation with a FULL hash oracle —
    // the oracle-gated upgrade of q47's rows-only demo: 1-day
    // event-time windows over 3 time-split microbatches, and a
    // far-future sentinel tranche staged LAST (q191's idiom) advances
    // the watermark past every real day so ALL January windows close
    // and emit in append mode before AvailableNow terminates. The
    // emitted set is then exactly the batch daily aggregate = the
    // DuckDB oracle; the sentinel's own still-open window is withheld
    // by append mode (and filtered, belt-and-braces).
    "q217_stream_window_agg" -> ((s, dir) => {
      s.catalog.dropTempView("q217_mem")
      val inP = graft.ops.Stage.fresh("q217")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q90)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("value"))
        .localCheckpoint() // shared by the 3 tranche writes + max scan
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val far = farSentinelUs(s, dir)
      import s.implicits._
      Seq(("zz_sentinel", far, 0.0)).toDF("event_type", "ts_us", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b3")
      val schema = StructType(Seq(StructField("event_type", StringType),
        StructField("ts_us", LongType), StructField("value", DoubleType)))
      val q = withStateParts(s)(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
        .withColumn("ets", timestamp_micros(col("ts_us")))
        .withWatermark("ets", "1 hour")
        .groupBy(window(col("ets"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("sum_v"))
        .select(col("w.start").cast("date").as("day"), col("event_type"),
          col("cnt"), col("sum_v"))
        .writeStream.format("memory").queryName("q217_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP) // results live in the memory sink now
      s.table("q217_mem")
        .filter(col("event_type") =!= "zz_sentinel")
        .orderBy(col("day"), col("event_type"))
    }),

    // ------------------------------------------------------------------
    // STREAM-STREAM FULL OUTER join — completes the join-mode matrix
    // (inner q90, left outer q191): unmatched rows from EITHER side
    // emit null-extended once the watermark passes their join window,
    // so the far-future sentinel tranche (one view + one click)
    // advances both watermarks and flushes both null paths before
    // AvailableNow terminates. Group key is coalesce(view user, click
    // user) since full-outer rows carry exactly one side for the
    // unmatched cases. Oracle = the equivalent batch FULL JOIN.
    "q220_stream_full_outer" -> ((s, dir) => {
      s.catalog.dropTempView("q220_mem")
      val inP = graft.ops.Stage.fresh("q220")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q90)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val far = farSentinelUs(s, dir)
      import s.implicits._
      Seq((-1L, far, -1L, "view", 0.0), (-2L, far, -2L, "click", 0.0))
        .toDF("user_id", "ts_us", "event_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b3")
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def src() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("vts"),
          col("event_id").as("view_id"))
        .withWatermark("vts", "1 hour")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("cts"),
          col("value").as("c_value"))
        .withWatermark("cts", "1 hour")
      val q = withStateParts(s)(views.join(clicks,
          col("user_id") === col("c_user")
            && col("cts") > col("vts")
            && col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"),
          "full_outer")
        .writeStream.format("memory").queryName("q220_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP)
      s.table("q220_mem")
        .withColumn("u", coalesce(col("user_id"), col("c_user")))
        .filter(col("u") >= 0) // drop the watermark sentinels
        .groupBy(col("u"))
        // match status keyed on cts (never null on a real click row),
        // NOT c_value: events.value is nullable, so a matched click
        // with NULL value must still count as matched
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("view_id").isNotNull && col("cts").isNotNull, 1).otherwise(0)).as("n_matched"),
          sum(when(col("cts").isNull, 1).otherwise(0)).as("n_view_only"),
          sum(when(col("view_id").isNull, 1).otherwise(0)).as("n_click_only"),
          round(sum(col("c_value").cast("decimal(18,2)")).cast("double"), 6).as("click_value"))
        .orderBy(col("u"))
    }),

    "q191_stream_outer_join" -> ((s, dir) => {
      s.catalog.dropTempView("q191_mem")
      val inP = graft.ops.Stage.fresh("q191")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q90)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val far = farSentinelUs(s, dir)
      import s.implicits._
      Seq((-1L, far, -1L, "view", 0.0), (-2L, far, -2L, "click", 0.0))
        .toDF("user_id", "ts_us", "event_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b3")
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def src() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("vts"),
          col("event_id").as("view_id"))
        .withWatermark("vts", "1 hour")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("cts"),
          col("value").as("c_value"))
        .withWatermark("cts", "1 hour")
      val q = withStateParts(s)(views.join(clicks,
          col("user_id") === col("c_user")
            && col("cts") > col("vts")
            && col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        .writeStream.format("memory").queryName("q191_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP)
      s.table("q191_mem")
        .filter(col("user_id") >= 0) // drop the watermark sentinels
        .groupBy(col("user_id"))
        // match status keyed on cts (never null on a real click row),
        // NOT c_value: events.value is nullable, so a matched click
        // with NULL value must still count as matched
        .agg(count(lit(1)).as("n_rows"),
          count(col("cts")).as("n_matched"),
          sum(when(col("cts").isNull, 1).otherwise(0)).as("n_unmatched"),
          round(sum(col("c_value").cast("decimal(18,2)")).cast("double"), 6).as("click_value"))
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------------------
    // foreachBatch idempotent merge sink — the custom-sink surface the
    // memory/parquet-sink keys never touch: the canonical "streaming
    // upsert into a keyed table" pattern when the target store has no
    // transactional MERGE. Events stream in 3 time-ordered tranches
    // (one per microbatch); each batch contracts to per-user deltas
    // (n, Σvalue DECIMAL, max ts) and full-outer-merges them into a
    // VERSIONED parquet state table (state/v{batchId} = merge of
    // v{batchId-1} + delta) — version-by-batchId is what makes replay
    // idempotent: re-running batch N deterministically rewrites v{N}
    // instead of double-counting, exactly the epoch-id recipe the
    // foreachBatch docs prescribe. No watermark/state store: the state
    // IS the sink. The final readout re-reads the last version and
    // contracts to user_id%10 buckets; count/Σ-DECIMAL/max are exactly
    // mergeable, so the 3-way incremental merge must equal DuckDB's
    // one-shot batch aggregate — any double-apply or dropped delta
    // breaks the hash.
    "q285_stream_foreach_merge" -> ((s, dir) => {
      val inP = graft.ops.Stage.fresh("q285in")
      val in = inP.toString
      val stP = graft.ops.Stage.fresh("q285st")
      val st = stP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (q90's split)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("value"))
        .localCheckpoint()
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("value", DoubleType)))
      @volatile var lastVersion = -1L
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          Streaming.mergeBatchIntoState(s, st, batch, id)
          lastVersion = math.max(lastVersion, id)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      require(lastVersion >= 0,
        "q285: stream produced no batches — no versioned state was written")
      graft.ops.Stage.release(inP)
      val out = s.read.parquet(s"$st/v$lastVersion")
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
          round(sum(col("sv")).cast("double"), 6).as("sum_value"),
          max(col("mts")).as("last_ts_us"))
        .orderBy(col("bucket"))
      out
    }),

    // ------------------------------------------------------------------
    // STREAM–STREAM LEFT SEMI join — the "which views converted?" read
    // q90's inner join answers with pair EXPANSION; semi answers it
    // with pair SUPPRESSION: each view row is emitted AT MOST ONCE (on
    // its first matching click inside the 30-min window) and never
    // duplicated however many clicks follow — at 100 TB the state is
    // the same watermark-bounded store as q90's, but the OUTPUT stays
    // view-sized instead of pair-sized, which is exactly why semi is
    // the funnel-entry operator of choice. Same 3 event-time-ordered
    // tranches; batch equivalence = EXISTS, the DuckDB oracle.
    "q393_stream_semi_join" -> ((s, dir) => {
      s.catalog.dropTempView("q393_mem")
      val inP = graft.ops.Stage.fresh("q393")
      val in = inP.toString
      val b1 = 1704931200000000L // 2024-01-11 UTC, µs (same split as q81/q90)
      val b2 = 1705795200000000L // 2024-01-21 UTC, µs
      val evs = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      stageTranches(in, Seq(
        "b0" -> evs.filter(col("ts_us") <= b1),
        "b1" -> evs.filter(col("ts_us") > b1 && col("ts_us") <= b2),
        "b2" -> evs.filter(col("ts_us") > b2)))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def src() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/")
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("vts"),
          col("event_id").as("view_id"), col("value").as("v_value"))
        .withWatermark("vts", "1 hour")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("cts"))
        .withWatermark("cts", "1 hour")
      val q = withStateParts(s)(views.join(clicks,
          col("user_id") === col("c_user")
            && col("cts") > col("vts")
            && col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"),
          "left_semi")
        .writeStream.format("memory").queryName("q393_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())
      q.awaitTermination()
      graft.ops.Stage.release(inP)
      s.table("q393_mem")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view"),
          round(sum(col("v_value").cast("decimal(18,2)")).cast("double"), 6).as("view_value"))
        .orderBy(col("user_id"))
    }),
  )

  def oracles: Map[String, String] = Map(
    // q285: the incremental per-batch merge telescopes to the one-shot
    // batch aggregate — count/Σ/max are exactly mergeable.
    "q285_stream_foreach_merge" ->
      ("WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
        + "sum(CAST(value AS DECIMAL(18,2))) AS sv, max(epoch_us(ts)) AS mts FROM events GROUP BY user_id) "
        + "SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_users, "
        + "CAST(sum(n) AS BIGINT) AS n_events, "
        + "round(CAST(sum(sv) AS DOUBLE), 6) AS sum_value, "
        + "CAST(max(mts) AS BIGINT) AS last_ts_us FROM per GROUP BY 1 ORDER BY 1"),
    // q47: the batch replay of the watermark's late-drop. Spark tracks
    // max event time in MILLISECONDS (µs floor-divided by 1000), and
    // the LATE-EVENT filter at batch N uses the watermark from data
    // through batch N−2, so the moved rows (staged two tranches late,
    // in b2) are filtered against (max_ts_us(b0)//1000 − 600000)·1000
    // µs; a moved row survives iff its hour-window END exceeds that.
    // On-time rows are never late (time-ordered tranches + lagged
    // filter), and the sentinel closes every real window, so emitted =
    // this kept-set aggregate exactly.
    "q47_stream_demo" ->
      ("WITH mv AS (SELECT ts, event_type, value FROM events "
        + "WHERE ts <= TIMESTAMP '2024-01-11 00:00:00' AND user_id % 7 = 3), "
        + "wm AS (SELECT (epoch_us(max(ts)) // 1000 - 600000) * 1000 AS wm_us FROM events "
        + "WHERE ts <= TIMESTAMP '2024-01-11 00:00:00' AND user_id % 7 <> 3), "
        + "kept AS (SELECT ts, event_type, value FROM events "
        + "WHERE NOT (ts <= TIMESTAMP '2024-01-11 00:00:00' AND user_id % 7 = 3) "
        + "UNION ALL SELECT m.ts, m.event_type, m.value FROM mv m, wm "
        + "WHERE epoch_us(date_trunc('hour', m.ts) + INTERVAL 1 HOUR) > wm.wm_us) "
        + "SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type, "
        + "count(*) AS cnt, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_v "
        + "FROM kept GROUP BY 1, 2 ORDER BY w_start_us, event_type"),
    "q191_stream_outer_join" ->
      ("WITH v AS (SELECT user_id, ts AS vts, event_id AS view_id FROM events WHERE event_type = 'view'), "
        + "c AS (SELECT user_id AS c_user, ts AS cts, value AS c_value FROM events WHERE event_type = 'click'), "
        + "j AS (SELECT v.user_id, c.cts, c.c_value FROM v LEFT JOIN c ON v.user_id = c.c_user "
        + "AND c.cts > v.vts AND c.cts <= v.vts + INTERVAL 30 MINUTE) "
        + "SELECT user_id, count(*) AS n_rows, count(cts) AS n_matched, "
        + "CAST(sum(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched, "
        + "round(CAST(sum(CAST(c_value AS DECIMAL(18,2))) AS DOUBLE), 6) AS click_value "
        + "FROM j GROUP BY user_id ORDER BY user_id"),
    "q156_stream_enrich" ->
      ("SELECT n_name, count(*) AS n_events, "
        + "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value "
        + "FROM events JOIN nation ON user_id % 25 = n_nationkey "
        + "GROUP BY n_name ORDER BY n_name"),
    "q141_stream_dedup" ->
      ("SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day FROM events "
        + "ORDER BY user_id, event_type, day"),
    "q217_stream_window_agg" ->
      ("SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt, "
        + "round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_v "
        + "FROM events GROUP BY 1, 2 ORDER BY day, event_type"),
    "q220_stream_full_outer" ->
      ("WITH v AS (SELECT user_id, ts AS vts, event_id AS view_id FROM events WHERE event_type = 'view'), "
        + "c AS (SELECT user_id AS c_user, ts AS cts, value AS c_value FROM events WHERE event_type = 'click'), "
        + "j AS (SELECT coalesce(v.user_id, c.c_user) AS u, v.view_id, c.cts, c.c_value FROM v FULL JOIN c ON v.user_id = c.c_user "
        + "AND c.cts > v.vts AND c.cts <= v.vts + INTERVAL 30 MINUTE) "
        + "SELECT u, count(*) AS n_rows, "
        + "CAST(sum(CASE WHEN view_id IS NOT NULL AND cts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched, "
        + "CAST(sum(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_only, "
        + "CAST(sum(CASE WHEN view_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_only, "
        + "round(CAST(sum(CAST(c_value AS DECIMAL(18,2))) AS DOUBLE), 6) AS click_value "
        + "FROM j GROUP BY u ORDER BY u"),
    "q90_stream_join" ->
      ("SELECT v.user_id, count(*) AS n_pairs, min(v.event_id) AS first_view, "
        + "round(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 6) AS click_value "
        + "FROM events v JOIN events c ON v.user_id = c.user_id "
        + "AND v.event_type = 'view' AND c.event_type = 'click' "
        + "AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE "
        + "GROUP BY 1 ORDER BY 1"),
    // q393: semi-join emission ≡ EXISTS over the batch — at most one
    // output row per view, however many clicks land in its window.
    "q393_stream_semi_join" ->
      ("SELECT v.user_id, count(*) AS n_views, min(v.event_id) AS first_view, "
        + "round(CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE), 6) AS view_value "
        + "FROM events v WHERE v.event_type = 'view' AND EXISTS ("
        + "SELECT 1 FROM events c WHERE c.user_id = v.user_id AND c.event_type = 'click' "
        + "AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE) "
        + "GROUP BY 1 ORDER BY 1"),
    "q81_stream_sessionize" -> closedSessionsSql,
    // same emission contract, same oracle: closed sessions are an API-
    // independent property of the event stream
    "q145_stream_sessionize_tws" -> closedSessionsSql,
    // q298: batch replay of dynamic-gap interval-merge sessionization.
    // Each event is [ts, ts+gap); a row starts a NEW session iff its
    // start ≥ the running MAX end of all prior rows in its user
    // partition (strict overlap merges, touching does not — Spark's
    // merge condition is start < end); session end = max event end.
    // The sentinel flushes everything, so emitted = all sessions.
    "q298_stream_session_gap" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
        + "CASE WHEN event_type = 'view' THEN 600000000 ELSE 1200000000 END AS gap_us, value FROM events), "
        + "m AS (SELECT user_id, event_id, ts_us, gap_us, value, "
        + "max(ts_us + gap_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM e), "
        + "sfl AS (SELECT user_id, event_id, ts_us, gap_us, value, "
        + "CASE WHEN prev_end IS NULL OR ts_us >= prev_end THEN 1 ELSE 0 END AS new_sess FROM m), "
        + "s2 AS (SELECT user_id, ts_us, gap_us, value, "
        + "CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM sfl) "
        + "SELECT user_id, CAST(min(ts_us) AS BIGINT) AS s_start_us, CAST(max(ts_us + gap_us) AS BIGINT) AS s_end_us, "
        + "count(*) AS n_events, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value "
        + "FROM s2 GROUP BY user_id, sid ORDER BY user_id, s_start_us"),
  )

  /** Shared q81/q145 oracle: every gaps-and-islands session CLOSED by an
    * observed >30-min gap (all sessions minus each user's trailing open
    * one) — what BOTH stateful APIs emit. */
  private val closedSessionsSql: String =
    ("WITH sess AS (SELECT user_id, sess_id, count(*) AS n_events, "
      + "CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur_us FROM ("
      + "SELECT user_id, ts, event_id, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM ("
      + "SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
      + "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events)) "
      + "GROUP BY user_id, sess_id) "
      + "SELECT user_id, sess_id, n_events, dur_us FROM ("
      + "SELECT user_id, sess_id, n_events, dur_us, max(sess_id) OVER (PARTITION BY user_id) AS mx FROM sess) "
      + "WHERE sess_id < mx ORDER BY user_id, sess_id")
}
