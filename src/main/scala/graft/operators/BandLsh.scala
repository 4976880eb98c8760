package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared hyperplane-LSH banding machinery for the embedding operators —
  * [[Dedup.embeddingNearDupBucketed]] (d07), [[Dedup.embeddingNearDupDelta]]
  * (d09), and [[Similarity.lshRangeSearch]] (s05) all band the same way and
  * prune band-collision duplicates with the same bit trick. One definition
  * keeps the three paths' recall contracts from silently diverging (the
  * same reasoning as the shared ngram candidate constants in [[Dedup]]).
  */
private[graft] object BandLsh {

  /** `(id, sig, band)` rows: one packed hyperplane signature per vector
    * (a single codegen scan pass), exploded to `nBands` band keys packed
    * into ONE long — `band = (j << bandBits) | v`. A long join key plans
    * through LongHashedRelation (dense array-indexed lookup) where the
    * former `struct(j, v)` key forced the generic binary-key
    * UnsafeHashedRelation on every band join — measured r18 at sf0.1:
    * the d07 candidate join over ~16M bucket matches ran 3.03 s on the
    * struct key, 2.3 s packed. `barrier = true` inserts a repartition on
    * the id so the signature materializes once when the output feeds a
    * self-join; `false` keeps it scan-fused — the right call for
    * index/broadcast sides that are read once (the d08/d09 no-barrier
    * pattern).
    */
  def banded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      idAs: String,
      sigAs: String,
      dim: Int,
      bandBits: Int,
      nBands: Int,
      barrier: Boolean): DataFrame = {
    val bits = bandBits * nBands
    require(bits >= 1 && bits <= 64, s"signature must pack into one long, got $bits bits")
    val mask = (1L << bandBits) - 1
    val sigs = df.select(col(idCol).as(idAs), Similarity.hyperplaneSig(col(vecCol), bits, dim).as(sigAs))
    val base = if (barrier) sigs.repartition(col(idAs)) else sigs
    base.select(col(idAs), col(sigAs),
      explode(array((0 until nBands).map(j =>
        lit(j.toLong << bandBits).bitwiseOR(
          shiftrightunsigned(col(sigAs), j * bandBits).bitwiseAND(lit(mask)))): _*)).as("band"))
  }

  /** Shared exact-cosine re-rank over candidate pairs — one vector fetch
    * per surviving pair per side, identical threshold/rounding everywhere
    * (the d07/d09/s05 equality and recall contracts depend on the re-rank
    * being byte-identical across paths, like [[Dedup.exactJaccardOnCandidates]]
    * for the ngram family). `aVecs`/`bVecs` are `(id, v)` frames;
    * `broadcastB = true` marks a small (query) side — bounded by the
    * operator's CONTRACT (a query batch), which is what justifies a
    * static hint. Candidate sides are deliberately NOT hinted: they are
    * delta-seeded but grow with match density (r12 measured a forced
    * candidate broadcast 2.4× slower at sf1 and unbounded toward the
    * 8 GiB cap on densified corpora) — AQE's runtime choice is the
    * correct behavior at every scale.
    */
  def exactCosineOnCandidates(
      cand: DataFrame,
      aVecs: DataFrame,
      bVecs: DataFrame,
      aCol: String,
      bCol: String,
      minCosine: Double,
      broadcastB: Boolean = false): DataFrame = {
    // r19: per-row norms computed on each vector side BELOW the join — the
    // per-PAIR score is one dot loop instead of the fused kernel's three
    // accumulators (bit-identical by the cosinePre contract; pairs always
    // outnumber the vectors that survive to a re-rank)
    val left = cand.join(aVecs.select(col("id").as(aCol), col("v").as("_va"),
      Similarity.norm(col("v")).as("_na")), Seq(aCol))
    val right = bVecs.select(col("id").as(bCol), col("v").as("_vb"),
      Similarity.norm(col("v")).as("_nb"))
    val joined = if (broadcastB) left.join(broadcast(right), Seq(bCol)) else left.join(right, Seq(bCol))
    joined
      .select(col(aCol), col(bCol),
        Similarity.cosinePre(col("_va"), col("_vb"), col("_na"), col("_nb")).as("cos"))
      .where(col("cos") >= lit(minCosine))
      .select(col(aCol), col(bCol), round(col("cos"), 4).as("cos"))
  }

  /** True iff this row's band is the pair's LOWEST matching band — the
    * stateless dedup of band-collision duplicates (a pair colliding in k
    * bands comes out of the band join k times; keeping exactly the lowest
    * matching band avoids a distinct over the full collision volume).
    * From `x = sigA XOR sigB`, fold each band's bits onto its low bit,
    * invert, mask to the per-band marker bits: `zeros` has bit
    * (bandBits·j) set iff band j matches; the row survives iff no marker
    * below its own band index is set.
    */
  def firstMatchingBand(
      sigA: Column,
      sigB: Column,
      band: Column,
      bandBits: Int,
      nBands: Int): Column = {
    val groupBits = (0 until nBands).map(j => 1L << (bandBits * j))
    // this row's band index j rides in the packed band key's high bits
    // (see [[banded]]); its earlier-bands mask is (1 << bandBits·j) − 1,
    // computed by shift instead of the former literal-array element_at
    val j = shiftrightunsigned(band, bandBits)
    val x = sigA.bitwiseXOR(sigB)
    val folded = (0 until bandBits).map(s => shiftrightunsigned(x, s)).reduce(_ bitwiseOR _)
    val zeros = bitwise_not(folded).bitwiseAND(lit(groupBits.sum))
    zeros.bitwiseAND(
      call_function("shiftleft", lit(1L), (j * lit(bandBits)).cast("int")) - lit(1L)) === lit(0L)
  }
}
