package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.expressions.{KmvBuffer, KmvSketch}

/** Pre-hashed sketch input: `key` is the group, `h` = splitmix64(member). */
final case class SketchInput(key: String, h: Long)

/** One estimate row per (key, micro-batch): the sketch's view after that
  * batch. `n_state` is the k-min set size (= exact distinct below fill).
  */
final case class SketchEstimate(key: String, est: Long, n_state: Long)

/** Persisted per-key state: the k-min set, unsigned ascending. */
final case class KmvStateRow(hashes: Array[Long])

/** Streaming twin of the q63 KMV distinct sketch — the unbounded-stream
  * member of the sketch family.
  *
  * A streaming `countDistinct` needs one state entry per key EVER SEEN —
  * O(stream), the state-store failure mode the engine's API deliberately
  * avoids (see dedupWithinWatermark's scaladoc). The KMV buffer is the
  * principled fix: O(k) longs per group FOREVER, no watermark eviction
  * needed because the state never grows past k — this operator runs for
  * months without a state-store compaction story.
  *
  * Prefix-parity contract (spec-asserted): the sketch state after batch i
  * is a pure function of the SET of members seen in batches 0..i — the
  * same merge-exactness behind q64's rollup — so each emitted estimate
  * equals the batch q63 aggregate over the stream's prefix, hash-exactly,
  * and the final estimate equals the batch run over the whole data.
  */
object StreamingSketch {

  def distinctEstimates(events: Dataset[SketchInput], k: Int): Dataset[SketchEstimate] = {
    implicit val outEnc = Encoders.product[SketchEstimate]
    implicit val stEnc = Encoders.product[KmvStateRow]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[SketchInput], state: GroupState[KmvStateRow]) => {
          val buf = new KmvBuffer(k)
          state.getOption.foreach(_.hashes.foreach(buf.insert))
          it.foreach(e => buf.insert(e.h))
          val hs = new Array[Long](buf.set.size())
          val iter = buf.set.iterator()
          var i = 0
          while (iter.hasNext) { hs(i) = iter.next(); i += 1 }
          state.update(KmvStateRow(hs))
          val (est, _) = KmvSketch.estimate(buf)
          Iterator(SketchEstimate(key, est, hs.length.toLong))
        })
  }
}
