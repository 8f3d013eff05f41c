package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Custom-state streaming sessionization via `flatMapGroupsWithState`
  * (the KeyValueGroupedDataset stateful API): per-user session state
  * lives in the state store and survives across microbatches, so a
  * session that spans two file arrivals is stitched correctly — the
  * property the batch lag-window formulation (q46) gets for free and a
  * streaming job must carry explicitly. Closed sessions are emitted the
  * moment a >30-min gap arrives; the trailing open session stays in
  * state (StatefulSessionSpec asserts emitted == batch sessions minus
  * each user's final open one).
  *
  * At 100 TB/day the state store holds ONE small record per active
  * user, and the group iterator only ever sees one microbatch of one
  * user's events — memory is bounded by (active users × state size),
  * not data volume.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  /** Open-session state: [start,last] µs bounds, event count, and how
    * many sessions this user has already closed (→ next sess_id). */
  case class SessState(start: Long, last: Long, n: Long, emitted: Long)
  case class Sess(user_id: Long, sess_id: Long, n_events: Long, dur_us: Long)

  val gapUs: Long = 30L * 60 * 1000000

  /** The core fold, shared by the flatMapGroupsWithState and
    * transformWithState frontends: consume one batch of a user's
    * events, emit sessions closed by an observed gap, return the
    * still-open session state.
    */
  def fold(user: Long, st0: SessState, sorted: Seq[Ev]): (SessState, List[Sess]) = {
    var out = List.empty[Sess]
    var st = st0
    for (e <- sorted) {
      if (st.n == 0L) {
        st = SessState(e.ts_us, e.ts_us, 1L, st.emitted)
      } else if (e.ts_us - st.last > gapUs) {
        out ::= Sess(user, st.emitted + 1, st.n, st.last - st.start)
        st = SessState(e.ts_us, e.ts_us, 1L, st.emitted + 1)
      } else {
        st = st.copy(last = e.ts_us, n = st.n + 1)
      }
    }
    (st, out.reverse)
  }

  /** Batch iterators carry no ordering guarantee → sort within the
    * batch; cross-batch ordering is the file source's responsibility
    * (event-time-ordered arrivals; late data would need the
    * watermarked q47-style pipeline instead).
    */
  def sessionize(user: Long, evs: Iterator[Ev],
                 state: GroupState[SessState]): Iterator[Sess] = {
    val sorted = evs.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
    val (st, out) = fold(user, state.getOption.getOrElse(SessState(-1L, -1L, 0L, 0L)), sorted)
    state.update(st)
    out.iterator
  }
}
