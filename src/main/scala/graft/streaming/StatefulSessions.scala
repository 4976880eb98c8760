package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for stateful sessionization (event time as TimestampType so
  * watermarks apply).
  */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session accumulator kept in the state store per user. */
final case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)

/** A closed (gap-expired) session, the operator's output row. */
final case class ClosedSession(
    user_id: Long,
    session_start_us: Long,
    session_end_us: Long,
    n_events: Long,
    sum_value: Double)

/** Gap-based sessionization as CUSTOM streaming state —
  * `flatMapGroupsWithState` with event-time timeout.
  *
  * The batch engine answers "how many sessions did each user have?" with a
  * lag()-window pass (q15). On an unbounded stream that window never closes,
  * so the session boundary has to live in the state store instead: one
  * `OpenSession` per user, extended while events arrive within `gapUs`,
  * emitted and dropped when the watermark passes `last + gap` (the timeout
  * fires). State size is O(active users), not O(events) — the property that
  * lets this run forever on a cluster. Events inside one micro-batch may
  * arrive unordered; each batch's slice is sorted per user before folding
  * (bounded by batch size, not stream length).
  *
  * Reference analog: the importer's incremental loop is itself a stream of
  * event windows (main.py:301-372); downstream session/engagement rollups on
  * Farcaster casts/reactions are the natural consumers of this shape.
  */
object StatefulSessions {

  /** events must carry a watermark on `ts` before calling (the caller picks
    * the lateness bound, e.g. `.withWatermark("ts", "30 minutes")`).
    */
  def sessions(events: Dataset[SessionEvent], gapUs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap with no new events: the session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.startUs, s.lastUs, s.n, s.sum))
          } else {
            val batch = it.toArray.sortBy(e => (e.ts.getTime, e.value))
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            batch.foreach { e =>
              val tUs = e.ts.getTime * 1000L
              open match {
                case Some(s) if tUs - s.lastUs <= gapUs =>
                  open = Some(OpenSession(s.startUs, math.max(s.lastUs, tUs), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += ClosedSession(user, s.startUs, s.lastUs, s.n, s.sum)
                  open = Some(OpenSession(tUs, tUs, 1L, e.value))
                case None =>
                  open = Some(OpenSession(tUs, tUs, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire when the watermark clears the gap after the newest event
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
            }
            closed.result().iterator
          }
        })
  }
}
