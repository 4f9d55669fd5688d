package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful streaming path. */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Open-session accumulator kept in [[GroupState]] between triggers. */
case class SessionAcc(startMs: Long, lastMs: Long, n: Long)

/** A closed session emitted downstream. */
case class SessionOut(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long)

/** True streaming sessionization — `KeyValueGroupedDataset
  * .flatMapGroupsWithState` with event-time timeout: per-user state holds
  * the open session; a gap > `gapSeconds` closes it (emitted immediately),
  * and the watermark timeout closes sessions whose users go quiet.
  *
  * The batch-equivalent formulation is [[EventStream.sessionize]] (same
  * gap semantics, lag+cumsum) — used as the differential oracle in tests.
  */
object Sessionize {

  def apply(events: Dataset[Event], gapSeconds: Long,
            watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapSeconds * 1000L))
  }

  /** Per-trigger state transition for one user. */
  private[streaming] def updateUser(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionAcc]): Iterator[SessionOut] = {

    def close(acc: SessionAcc): SessionOut =
      SessionOut(userId, new Timestamp(acc.startMs), new Timestamp(acc.lastMs), acc.n)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toIterator
      state.remove()
      return out
    }

    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open = open match {
        case Some(acc) if t - acc.lastMs > gapMs =>
          closed += close(acc)
          Some(SessionAcc(t, t, 1))
        case Some(acc) =>
          Some(acc.copy(lastMs = math.max(acc.lastMs, t), n = acc.n + 1))
        case None =>
          Some(SessionAcc(t, t, 1))
      }
    }
    open.foreach { acc =>
      state.update(acc)
      // flatMapGroupsWithState does NOT drop late rows itself, so a very
      // late event can put acc.lastMs + gapMs BEHIND the current watermark —
      // and setTimeoutTimestamp throws on a timestamp <= watermark, killing
      // the query. Clamp to watermark + 1ms: the session then times out on
      // the next trigger, which is the correct semantics for a session that
      // (by watermark time) is already over.
      state.setTimeoutTimestamp(
        math.max(acc.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.result().iterator
  }
}
