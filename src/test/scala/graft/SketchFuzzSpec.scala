package graft

import scala.util.Random

import graft.expressions.{KmvBuffer, KmvSketch, KvBuffer}

/** Differential fuzz of the sketch buffers against brute-force references:
  * random values, random merge-tree shapes — the buffer must land on the
  * exact k smallest DISTINCT hashes in unsigned order regardless of
  * insertion order or merge topology (the determinism contract the q63/q64
  * oracles rely on).
  */
class SketchFuzzSpec extends SparkSpec {

  private def unsignedSorted(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)

  test("KmvBuffer == brute-force k-min under random inserts and merges") {
    val rnd = new Random(0xC0FFEE)
    for (trial <- 1 to 200) {
      val k = 2 + rnd.nextInt(20)
      val n = rnd.nextInt(300)
      // mix of full-range longs (sign-boundary coverage) and small ints
      // (duplicate coverage)
      val vals = Seq.fill(n)(if (rnd.nextBoolean()) rnd.nextLong() else rnd.nextInt(20).toLong)
      val expect = unsignedSorted(vals).take(k)

      // random merge topology: split into 1..5 chunks, fill buffers, merge
      // in random order
      val chunks = (0 until 1 + rnd.nextInt(5)).map(_ => Seq.newBuilder[Long])
      vals.foreach(v => chunks(rnd.nextInt(chunks.length)) += v)
      val bufs = chunks.map { c =>
        val b = new KmvBuffer(k)
        c.result().foreach(b.insert)
        b
      }
      val acc = bufs.head
      rnd.shuffle(bufs.tail).foreach(acc.mergeIn)

      val got = {
        val it = acc.set.iterator()
        Iterator.continually(if (it.hasNext) Some(it.next(): Long) else None)
          .takeWhile(_.isDefined).map(_.get).toSeq
      }
      assert(got == expect, s"trial $trial k=$k: $got vs $expect")
      // estimator consistency: below fill est == exact distinct
      val (est, kth) = KmvSketch.estimate(acc)
      val distinct = vals.distinct.length
      if (distinct < k) assert(est == distinct && kth.isEmpty)
      else assert(kth.contains(expect.last))
    }
  }

  test("KvBuffer == brute-force bottom-k-by-hash sample under random merges") {
    val rnd = new Random(0xBEEF)
    for (trial <- 1 to 200) {
      val k = 2 + rnd.nextInt(16)
      val n = rnd.nextInt(200)
      // unique hashes (the row-key contract), arbitrary values
      val entries = Seq.fill(n)(rnd.nextLong()).distinct.map(h => h -> rnd.nextInt(100).toLong)
      val expect = entries
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
        .take(k)

      val chunks = (0 until 1 + rnd.nextInt(4)).map(_ => Seq.newBuilder[(Long, Long)])
      entries.foreach(e => chunks(rnd.nextInt(chunks.length)) += e)
      val bufs = chunks.map { c =>
        val b = new KvBuffer(k)
        c.result().foreach { case (h, v) => b.insert(h, v) }
        b
      }
      val acc = bufs.head
      rnd.shuffle(bufs.tail).foreach(acc.mergeIn)

      val got = {
        val it = acc.map.entrySet().iterator()
        Iterator.continually(
          if (it.hasNext) Some { val e = it.next(); (e.getKey: Long, e.getValue: Long) } else None)
          .takeWhile(_.isDefined).map(_.get).toSeq
      }
      assert(got == expect, s"trial $trial k=$k: $got vs $expect")
    }
  }
}
