package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** E11 — session finalization on the Spark 4 `transformWithState` API
  * (SPARK-46815, the arbitrary-state successor to
  * `flatMapGroupsWithState`): per user, an open-session accumulator in
  * typed `ValueState` plus ONE registered event-time timer at
  * `last_event + gap`; when the WATERMARK passes the timer, the processor
  * emits the closed session exactly once — count, bounds, duration — and
  * clears its state. This is the emit-on-close shape windowed aggregation
  * can't give (a session-window agg emits on the engine's schedule with
  * aggregate columns only; here the close row is a custom payload emitted
  * the moment the session PROVABLY cannot grow) and the old
  * `GroupStateTimeout` API could only approximate with processing-time
  * timeouts that fire on wall-clock, not stream progress.
  *
  * Timer discipline: exactly one live timer per key — each new event
  * deletes the previous timer and registers `ep*1000 + gapMs`. State per
  * key is one (count, first_ep, last_ep) triple + one timer; both are
  * freed on close, so state is bounded by OPEN sessions, not by users
  * ever seen (tighter than the flatMapGroupsWithState twins, whose state
  * lives until explicitly timed out).
  *
  * Semantics match `CurationQueries.q_session_stats` (30-min gap) on
  * ordered replay — StreamTwsSpec proves closed sessions equal the batch
  * session rollup and that a post-close event opens a NEW session.
  */
object StreamTws {

  final case class SessEv(user_id: Long, ts: java.sql.Timestamp, ord: Long) {
    def ep: Long = ts.getTime / 1000L
  }
  final case class OpenSession(n: Long, firstEp: Long, lastEp: Long)
  final case class ClosedSession(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, duration_secs: Long)

  final class SessionFinalizer(gapSecs: Long)
    extends StatefulProcessor[Long, SessEv, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessEv],
        timers: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ep, e.ord))
      var closed = List.empty[ClosedSession]
      var st = if (open.exists()) Option(open.get()) else None
      sorted.foreach { e =>
        st match {
          case Some(s) if e.ep - s.lastEp <= gapSecs =>
            st = Some(OpenSession(s.n + 1, s.firstEp, math.max(s.lastEp, e.ep)))
          case Some(s) =>
            // gap exceeded INSIDE the batch: close eagerly, open anew —
            // the timer path below handles the cross-batch case
            closed ::= ClosedSession(key, s.firstEp, s.lastEp, s.n,
              s.lastEp - s.firstEp)
            st = Some(OpenSession(1L, e.ep, e.ep))
          case None =>
            st = Some(OpenSession(1L, e.ep, e.ep))
        }
      }
      st.foreach { s =>
        open.update(s)
        // one live timer per key: replace whatever was registered
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.lastEp * 1000L + gapSecs * 1000L)
      }
      closed.reverse.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out =
        if (open.exists()) {
          val s = open.get()
          // the watermark passed last_event + gap: no admissible event can
          // extend this session any more — close exactly once
          Iterator.single(ClosedSession(key, s.firstEp, s.lastEp, s.n,
            s.lastEp - s.firstEp))
        } else Iterator.empty
      open.clear()
      out
    }
  }

  /** Closed sessions for an event stream carrying an event-time `ts`
    * column; the watermark applied here is what drives the event-time
    * timers (a timer fires when the watermark passes its expiry).
    */
  def closedSessions(events: Dataset[SessEv], gapSecs: Long = 1800L,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionFinalizer(gapSecs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
