package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for trailing-window metrics. `ts` (TimestampType) drives the
  * watermark; `ts_us` (epoch microseconds) is the authoritative event time —
  * the same cross-engine-safe representation the batch engine uses
  * (Tables.events adds `ts_us = ts div 1000` over the nanos-as-long scan).
  */
final case class MetricEvent(user_id: Long, event_id: Long, ts: Timestamp, ts_us: Long, value: Double)

/** One output row per input event: the trailing-horizon count and exact
  * 1e-2-scaled sum, identical to the batch q44 RANGE-window row.
  */
final case class TrailingMetric(
    user_id: Long,
    event_id: Long,
    ts_us: Long,
    n_24h: Long,
    sum_value_24h: Double)

/** Per-user state: events still inside `watermark - horizon`, ascending by
  * (ts_us, event_id), value pre-scaled to an exact 1e-2 integer.
  */
final case class TrailingBuf(tsUs: Array[Long], eventId: Array[Long], v2: Array[Long])

/** Streaming twin of the batch q44 trailing-24h RANGE window.
  *
  * Batch answers "count/sum over [t−24h, t] per event" with a window frame;
  * on an unbounded stream that frame never closes, so the frame lives in the
  * state store instead: per user, the events newer than `watermark − horizon`.
  * Each arriving event is merged into the buffer (event-time order — a
  * micro-batch may deliver unordered) and its frame is answered from prefix
  * sums over the merged buffer in exact scaled-integer arithmetic, so the
  * emitted row is bit-identical to the batch engine's.
  *
  * Frame ties follow the batch RANGE semantics: every event with the same
  * ts_us is in every tied event's frame, because the whole micro-batch is
  * merged before any of its rows are answered. (A tie split across
  * micro-batches cannot retro-update an already-emitted row — the documented
  * append-mode boundary, same as every streaming aggregation.)
  *
  * State is O(events within horizon + allowed lateness) per user — bounded by
  * data rate, not stream length; eviction is driven by the watermark, so a
  * late-but-admissible event still finds its full frame. Idle users are
  * dropped wholesale by event-time timeout at `last + horizon`. That bounded
  * footprint is what lets the operator run forever on a cluster, where the
  * batch window's global sort could not.
  *
  * Reference analog: the importer's per-entity freshness/rate metrics
  * (main.py incremental loop), generalized to a sliding horizon — q44 is the
  * batch form; this is the same contract on the live stream.
  */
object TrailingWindow {

  val DayUs: Long = 86400000000L

  /** events must carry a watermark on `ts` before calling (the caller picks
    * the lateness bound, e.g. `.withWatermark("ts", "10 minutes")`).
    */
  def metrics(events: Dataset[MetricEvent], horizonUs: Long = DayUs): Dataset[TrailingMetric] = {
    implicit val outEnc = Encoders.product[TrailingMetric]
    implicit val bufEnc = Encoders.product[TrailingBuf]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[MetricEvent], state: GroupState[TrailingBuf]) => {
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last + horizon: no future frame can reach back
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            val prev = state.getOption.getOrElse(TrailingBuf(Array.empty, Array.empty, Array.empty))

            // merge prev (sorted) + batch (sorted) into one sorted buffer
            val n = prev.tsUs.length + batch.length
            val ts = new Array[Long](n); val id = new Array[Long](n); val v2 = new Array[Long](n)
            var i = 0; var j = 0; var k = 0
            while (k < n) {
              val takePrev = j >= batch.length || (i < prev.tsUs.length &&
                (prev.tsUs(i) < batch(j).ts_us ||
                  (prev.tsUs(i) == batch(j).ts_us && prev.eventId(i) <= batch(j).event_id)))
              if (takePrev) { ts(k) = prev.tsUs(i); id(k) = prev.eventId(i); v2(k) = prev.v2(i); i += 1 }
              else {
                ts(k) = batch(j).ts_us; id(k) = batch(j).event_id
                v2(k) = math.round(batch(j).value * 100.0); j += 1
              }
              k += 1
            }

            // prefix sums → each event's frame is two binary searches
            val cum = new Array[Long](n + 1)
            k = 0
            while (k < n) { cum(k + 1) = cum(k) + v2(k); k += 1 }
            def lowerBound(t: Long): Int = { // first idx with ts(idx) >= t
              var lo = 0; var hi = n
              while (lo < hi) { val m = (lo + hi) >>> 1; if (ts(m) < t) lo = m + 1 else hi = m }
              lo
            }
            def upperBound(t: Long): Int = { // first idx with ts(idx) > t
              var lo = 0; var hi = n
              while (lo < hi) { val m = (lo + hi) >>> 1; if (ts(m) <= t) lo = m + 1 else hi = m }
              lo
            }
            val out = batch.iterator.map { e =>
              val lo = lowerBound(e.ts_us - horizonUs)
              val hi = upperBound(e.ts_us)
              TrailingMetric(user, e.event_id, e.ts_us,
                (hi - lo).toLong, (cum(hi) - cum(lo)).toDouble / 100.0)
            }.toVector

            // evict what no admissible future event can still frame
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val keepFrom = lowerBound(wmUs - horizonUs)
            state.update(TrailingBuf(
              ts.slice(keepFrom, n), id.slice(keepFrom, n), v2.slice(keepFrom, n)))
            // drop the whole user once the watermark clears last + horizon
            // (must be strictly beyond the current watermark or Spark throws)
            val lastMs = ts(n - 1) / 1000L + horizonUs / 1000L
            state.setTimeoutTimestamp(math.max(lastMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
        })
  }
}
