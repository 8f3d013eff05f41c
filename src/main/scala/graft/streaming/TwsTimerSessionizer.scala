package graft.streaming

import graft.streaming.StatefulSessions.{Ev, Sess, SessState}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven variant of [[TwsSessionizer]]: runs under
  * `TimeMode.EventTime` and registers an EVENT-TIME TIMER at
  * `last + gap` for every open session, so the trailing session of a
  * user is emitted by TIME (the watermark passing the gap) instead of
  * staying in state forever waiting for a successor event — the
  * mechanism a real 24/7 sessionization job needs for users who simply
  * leave. Expiry-driven emission produces the SAME session (same id,
  * count, duration) the batch fold would have produced had a
  * gap-breaking event arrived, so streamed = batch on the COMPLETE
  * session set (TwsTimerSpec proves it, kill/resume included).
  *
  * Timer discipline: at most one live timer per key — each batch
  * deletes the previous registration before folding (the open session
  * it guarded was extended or closed by this batch's rows) and
  * re-registers at the new `last + gap`. Within a microbatch Spark
  * processes input rows BEFORE expired timers, so a session extended in
  * the same batch its old timer would have fired in is never
  * double-emitted: the old timer is gone by timer-processing time.
  *
  * At 100 TB state stays one record + one timer per active user; timer
  * expiry is handled by the state store's range scan, not a
  * per-key poll.
  */
class TwsTimerSessionizer extends StatefulProcessor[Long, Ev, Sess] {

  @transient private var state: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessState](
      "session", Encoders.product[SessState], TTLConfig.NONE)

  /** First ms instant strictly after the session's gap deadline (timers
    * are ms-granular; state µs-granular). */
  private def expiryMs(st: SessState): Long =
    (st.last + StatefulSessions.gapUs) / 1000L + 1L

  override def handleInputRows(user: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Sess] = {
    val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
    val st0 = if (state.exists()) state.get() else SessState(-1L, -1L, 0L, 0L)
    if (st0.n > 0L) getHandle.deleteTimer(expiryMs(st0))
    val (st, out) = StatefulSessions.fold(user, st0, sorted)
    state.update(st)
    if (st.n > 0L) getHandle.registerTimer(expiryMs(st))
    out.iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Sess] = {
    // the event-time gap elapsed with no successor event: close the open
    // session exactly as a gap-breaking event would have
    if (!state.exists()) return Iterator.empty
    val st = state.get()
    if (st.n == 0L || expiryMs(st) != expiredTimerInfo.getExpiryTimeInMs) return Iterator.empty
    state.update(SessState(-1L, -1L, 0L, st.emitted + 1))
    Iterator.single(Sess(user, st.emitted + 1, st.n, st.last - st.start))
  }
}
