package graft.streaming

import graft.streaming.StatefulSessions.{Ev, Sess, SessState}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, ValueState}

/** The same sessionizer on Spark 4's `transformWithState` API (the
  * successor to flatMapGroupsWithState): state is a named, typed
  * `ValueState` obtained from the StatefulProcessorHandle, which the
  * engine persists in the (RocksDB) state store per key. Same fold,
  * same emission contract as StatefulSessions.sessionize — asserted
  * identical in StatefulSessionSpec.
  */
class TwsSessionizer extends StatefulProcessor[Long, Ev, Sess] {

  @transient private var state: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessState](
      "session", Encoders.product[SessState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Ev],
                               timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Sess] = {
    val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
    val st0 = if (state.exists()) state.get() else SessState(-1L, -1L, 0L, 0L)
    val (st, out) = StatefulSessions.fold(user, st0, sorted)
    state.update(st)
    out.iterator
  }
}
