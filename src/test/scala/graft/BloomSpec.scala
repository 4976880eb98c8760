package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom
import graft.expressions.HashExprs

/** Exact-integer Bloom contamination (t17 / operators.Bloom). */
class BloomSpec extends SparkSpec {

  test("positions rejects non-power-of-two sizes") {
    intercept[IllegalArgumentException] { Bloom.positions(col("h"), 100) }
    intercept[IllegalArgumentException] { Bloom.positions(col("h"), 32) }
  }

  test("a doc sharing a 5-gram with the eval set is flagged; disjoint text with a tiny filter is not") {
    import spark.implicits._
    val mBits = 1 << 16
    val eval = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      .select(explode(HashExprs.tokenShingleHashes(col("text"), 5)).as("h"))
    val words = Bloom.buildWords(eval, mBits)
    // filter stays constant-size: at most mBits/64 words
    assert(words.count() <= mBits / 64)

    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps and more"), // shares "the quick brown fox jumps"
      (2L, "completely different tokens nothing shared here at all"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(HashExprs.tokenShingleHashes(col("text"), 5)).as("h"))
    val flagged = Bloom.probeCount(corpus, words, "doc_id", mBits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(1L), s"true collision missed (Bloom has no false negatives): $flagged")
    // doc 2 COULD false-positive in principle; with 9 eval shingles in 2^16
    // bits the odds are ~(36/65536)^4 per shingle — vanishing, and the
    // assertion documents the expectation rather than luck
    assert(!flagged.contains(2L), s"unexpected false positive at this load factor: $flagged")
  }

  test("t17 never misses a t08 true collision, and counts at least as many shingles") {
    // Bloom membership is a superset of exact membership: every doc t08
    // flags must appear in t17 with n_flagged >= n_shared_shingles.
    val exact = SparkEntry.queries("t08_contamination")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("t17_bloom_contamination")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (doc, n) =>
      assert(bloom.contains(doc), s"doc $doc flagged by exact screen but not by Bloom")
      assert(bloom(doc) >= n, s"doc $doc: bloom=${bloom(doc)} < exact=$n")
    }
  }
}
