package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-integer Bloom filter over 64-bit shingle hashes — the constant-size
  * broadcast form of eval-set contamination screening (t08 broadcasts the
  * eval set's distinct shingle hashes; at 100 TB an eval suite can carry
  * hundreds of millions of shingles, and this caps the broadcast at
  * `mBits/64` longs — 128 KB for 2^20 bits — regardless of eval size).
  *
  * Design for determinism: the four probe positions come from
  * Kirsch–Mitzenmacher double hashing over the two 32-bit halves of the
  * shingle's splitmix64-finalized hash — p_i = (lo + i·hi) mod mBits — no
  * second hash family, no RNG, so filter contents, membership answers, AND
  * the false-positive set are a pure integer function of the input texts:
  * bit-identical across engines, partitionings and retries. That makes the
  * operator hash-exact against a DuckDB oracle (the d02 rule: an oracle is a
  * re-derivation, not a re-run), where a library Bloom filter (Spark's own
  * `BloomFilterAggregate`, Guava) would be implementation-defined.
  *
  * Scale shape: build = one scan over the eval set + a ≤`mBits/64`-row
  * aggregate; probe = pure corpus scan + broadcast hash join on the word
  * index + one bounded per-doc aggregate. The corpus never shuffles raw
  * text — only (doc_id, shingle-hash) pairs that survive all four bit
  * tests reach the final aggregate.
  */
object Bloom {
  /** The four probe positions of hash `h` in an `mBits`-bit filter
    * (Kirsch & Mitzenmacher 2006: two base hashes — here the unsigned
    * 32-bit halves of h — generate k independent-enough probes as
    * lo + i·hi, with no FP-rate penalty). All arithmetic stays in
    * non-negative 63-bit range: lo + 3·hi < 2^34.
    */
  def positions(h: Column, mBits: Int): Seq[Column] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    val lo = h.bitwiseAND(lit(0xFFFFFFFFL))
    val hi = shiftrightunsigned(h, 32)
    (0 until 4).map(i => (lo + hi * lit(i.toLong)).bitwiseAND(lit((mBits - 1).toLong)))
  }

  /** Filter words (word index → 64-bit OR of member bits) from a DataFrame
    * of 64-bit hashes in column `h`. ≤ mBits/64 rows — broadcast-small.
    */
  def buildWords(hashes: DataFrame, mBits: Int): DataFrame = {
    val pos = hashes.select(explode(array(positions(col("h"), mBits): _*)).as("p")).distinct()
    pos.groupBy(shiftright(col("p"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p & 63 as int)))").as("bits"))
  }

  /** Per-document count of distinct shingle hashes whose four probe bits are
    * ALL set in the filter. `corpusShingles` must carry (`docId`, `h`).
    * Output: (docId, n_flagged), rows only for docs with ≥1 flagged shingle.
    */
  def probeCount(corpusShingles: DataFrame, filterWords: DataFrame,
                 docId: String, mBits: Int): DataFrame = {
    val probed = corpusShingles
      .select(col(docId), col("h"), posexplode(array(positions(col("h"), mBits): _*)))
      .withColumnRenamed("col", "p")
      .join(broadcast(filterWords), shiftright(col("p"), 6) === col("w"), "left")
      .withColumn("hit",
        col("bits").isNotNull && expr("(bits & shiftleft(1L, cast(p & 63 as int))) != 0"))
    probed
      .groupBy(col(docId), col("h"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("nhit"))
      .where(col("nhit") === 4)
      .groupBy(col(docId))
      .agg(count(lit(1)).as("n_flagged"))
  }
}
