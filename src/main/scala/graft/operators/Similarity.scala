package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VectorExprs

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small) query set
  * against the candidate corpus — one scan of the corpus, no shuffle of the
  * big side. The scale path buckets candidates with random-hyperplane LSH so
  * each query only scores its own buckets.
  *
  * All scoring goes through the codegen'd [[graft.expressions.VectorExprs]]
  * (fused single-pass loops); the interpreted higher-order-function route is
  * ~1000× slower on an O(N²·d) scan.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VectorExprs.dotFF(a, b)
  def cosine(a: Column, b: Column): Column = VectorExprs.cosineFF(a, b)

  /** sqrt(Σ v²) — [[cosine]]'s per-row factor, hoisted (r19). dotFF(v, v)
    * accumulates the identical left-to-right square sum CosineSimilarityFF
    * interleaves, and Spark's Sqrt is the same java.lang.Math.sqrt — so a
    * norm computed ONCE per row equals the one the fused kernel recomputes
    * per PAIR, bit for bit.
    */
  def norm(v: Column): Column = sqrt(VectorExprs.dotFF(v, v))

  /** cosineFF(a, b) recomposed from precomputed norms — bit-identical for
    * equal-length arrays (every call site scores fixed-dim embeddings):
    * same left-to-right dot, same zero-norm contract (sqrt(x) = 0 ⟺
    * x = 0 on non-negatives), same null contract (null vector → null
    * norm → null cosine), same dot / (na * nb) association. Per PAIR this
    * evaluates one dot loop instead of the fused kernel's three
    * accumulators — the §1.2 per-task-work lever for every operator whose
    * pair count exceeds its row count (candidate re-ranks, cell-local
    * prunes, query fan-outs). Spec-pinned against cosineFF on adversarial
    * and real vectors (CosinePreSpec).
    */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na.isNull || nb.isNull, lit(null).cast("double"))
      .when(na === lit(0.0) || nb === lit(0.0), lit(0.0))
      .otherwise(VectorExprs.dotFF(a, b) / (na * nb))

  /** The deterministic ±1 hyperplanes behind [[hyperplaneSig]] — public so
    * the SQL oracle generator embeds the IDENTICAL planes (one definition,
    * or the engine and its oracle could silently diverge).
    */
  def hyperplanes(bits: Int, dim: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(0x5EED5EED)
    Seq.fill(bits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** Deterministic random-hyperplane signature (seeded, reproducible
    * across runs); bit j = sign of dot(v, plane_j). One fused codegen
    * kernel ([[graft.expressions.HyperplaneSigFL]]) — the former unrolled
    * `bits`× dotFF CASE-WHEN sum blew Janino's 64 KB method limit and
    * silently interpreted the whole signature scan (r18 measurement:
    * 1.07 s for 2,000 rows at sf0.1, ~0.5 ms/row); the kernel is
    * bit-identical by the [[graft.expressions.HyperplaneSigFL]] FP
    * contract (spec-asserted against the unrolled form).
    */
  def hyperplaneSig(v: Column, bits: Int, dim: Int): Column =
    VectorExprs.hyperplaneSigFL(v, hyperplanes(bits, dim).map(_.toArray).toArray)

  /** The unrolled expression tree [[hyperplaneSig]] replaced — kept as the
    * spec's equality reference (never planned by queries).
    */
  private[graft] def hyperplaneSigUnrolled(v: Column, bits: Int, dim: Int): Column = {
    val planes = hyperplanes(bits, dim)
    (0 until bits)
      .map(j => when(VectorExprs.dotFF(v, typedlit(planes(j))) >= lit(0.0), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries` must be small enough to broadcast.
    * Output: (q_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // r19: norms hoisted to the per-row projections — the query fan-out
    // (|corpus| × |queries| pairs) pays one dot loop per pair
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("_cn"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("_qn"))
    val scored = cand
      .join(broadcast(q), col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): from each query's `kCand` most-relevant candidates, greedily
    * pick `k` items maximizing `lamRel·rel − lamDiv·max_cos_to_selected` —
    * the diverse-sample selection a training-data pipeline runs so one
    * dense region can't monopolize a retrieval budget.
    *
    * The greedy loop is INHERENTLY sequential in k, so k lives on the
    * driver as loop control (k is a small constant; every step is a fully
    * distributed join + grouped argmax keyed by q_id — millions of queries
    * advance one pick per step in parallel). The candidate pool
    * materializes once (`localCheckpoint`) and each step touches
    * pool-sized data only, never the corpus.
    *
    * `lamRel`/`lamDiv` are taken as separate literals rather than
    * (λ, 1−λ): 1.0−0.7 is 0.30000000000000004 in IEEE — an oracle writing
    * the decimal 0.3 would diverge on ties.
    *
    * Ties break to the lower candidate id at every argmax (struct-ordered
    * `max_by`), so the selection is engine- and partitioning-independent.
    */
  def mmrSelect(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kCand: Int,
      k: Int,
      lamRel: Double,
      lamDiv: Double): DataFrame = {
    // r19: norms ride the pool checkpoint (8 bytes/row) and the selected
    // set — every penalty cosine is one dot loop per (candidate × selected)
    val qv = broadcast(queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("_qn")))
    val scored = corpus.select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("_cn"))
      .join(qv, col("q_id") =!= col("cid"))
      .select(col("q_id"), col("cid"), col("cv"), col("_cn"),
        cosinePre(col("cv"), col("qv"), col("_cn"), col("_qn")).as("rel"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("cid").asc)
    val pool = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= kCand).drop("rn")
      .localCheckpoint(true)
    def argmax(df: DataFrame, score: org.apache.spark.sql.Column, pick: Int): DataFrame =
      df.groupBy(col("q_id"))
        .agg(max_by(struct(col("cid"), col("cv"), col("rel"), col("_cn")),
          struct(score.as("s"), (-col("cid")).as("tie"))).as("best"))
        .select(col("q_id"), col("best.cid").as("cid"), col("best.cv").as("cv"),
          col("best.rel").as("rel"), col("best._cn").as("_cn"), lit(pick.toLong).as("pick"))
    var out = argmax(pool, col("rel"), 1)
    for (step <- 2 to k) {
      val sel = out.select(col("q_id"), col("cid").as("sid"), col("cv").as("sv"),
        col("_cn").as("_sn"))
      // one q_id-keyed join + one grouped aggregate per step (r18): the
      // former separate (q_id, cid) LEFT ANTI against the selected set
      // cost its own exchange pair per step — fused here into the penalty
      // aggregation, which already sees every (candidate × selected) row:
      // a candidate that IS selected joins itself (cid = sid), so
      // max(cid = sid) marks it and the post-aggregate filter drops it.
      // Identical semantics: pen is unchanged by computing it for
      // selected rows and discarding them after.
      val withPen = pool.join(sel, Seq("q_id"))
        .groupBy(col("q_id"), col("cid"))
        .agg(first(col("cv")).as("cv"), first(col("rel")).as("rel"),
          first(col("_cn")).as("_cn"),
          max(cosinePre(col("cv"), col("sv"), col("_cn"), col("_sn"))).as("pen"),
          max(when(col("cid") === col("sid"), 1).otherwise(0)).as("_is_sel"))
        .where(col("_is_sel") === 0)
        .drop("_is_sel")
      out = out.union(
        argmax(withPen, lit(lamRel) * col("rel") - lit(lamDiv) * col("pen"), step))
    }
    out.select(col("q_id"), col("pick"), col("cid").as("neighbor_id"),
      round(col("rel"), 4).as("rel"))
  }

  /** Product-quantization encoding (Jégou et al. 2011): the vector splits
    * into `nSeg` subspaces, each encoded as the index of its nearest
    * codeword — 64 float dims become 8 nibbles, the compression that makes
    * billion-scale ANN indexes fit in memory. Codebooks are deterministic
    * (each segment's codewords are the `nCodes` lowest-id vectors' segments
    * — the s03/d11 stand-in for a trained k-means codebook).
    *
    * The encode pass is a pure scan: codeword segments and their norms are
    * driver-side literals (nCodes rows, not data), and per segment the
    * argmin is `array_min` over `struct(m, j)` with
    * m = (0 − 2·x·c) + ‖c‖² (the ‖x‖²-free argmin key — ‖x‖² is constant
    * within a segment). Reconstruction error per segment is ‖x‖² + m.
    * Every FP expression is shaped EXACTLY as the oracle writes it, so
    * codes and errors are engine-identical; ties break to the lower
    * codeword index.
    *
    * Output: one row per (vector, segment) — per-segment rows avoid any
    * cross-engine aggregation-order dependence; a packed code is an exact
    * integer rollup (`sum(code << 4·seg)`) the caller can apply.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nSeg: Int = 8,
      nCodes: Int = 16): DataFrame = {
    require(dim % nSeg == 0, s"dim $dim must split into $nSeg segments")
    val segDim = dim / nSeg
    val codewords: Array[Seq[Float]] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long").asc)
      .limit(nCodes)
      .collect()
      .map(_.getSeq[Float](1).toSeq)
    // ONE fused kernel evaluation per vector: all-segment argmin + segment
    // norms from PqSegBest (the unrolled slice/dotFF/array_min tree blew
    // Janino's 64 KB method limit and silently de-codegen'd the whole
    // stage — see the PqSegBest scaladoc); posexplode its array directly,
    // so seg indices and struct fields land exactly as before
    val best = VectorExprs.pqSegBest(col(vecCol), codewords, nSeg, segDim)
    corpus
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(best).as(Seq("seg", "b")))
      .select(col("vec_id"), col("seg").cast("long").as("seg"),
        col("b.j").as("code"), round(col("b.x2") + col("b.m"), 4).as("err"))
  }

  /** All-segment code assignment (array<long>) via the shared
    * [[graft.expressions.PqSegBest]] kernel — [[pqEncode]], [[adcSearch]]
    * and [[ivfPqSearch]] all assign codes through this one definition.
    */
  private def segCodes(
      vecCol: Column, codewords: Array[Seq[Float]],
      nSeg: Int, segDim: Int): Column = {
    val best = VectorExprs.pqSegBest(vecCol, codewords, nSeg, segDim)
    array((0 until nSeg).map(s => element_at(best, s + 1).getField("j")): _*)
  }

  /** Asymmetric-distance PQ search (the search half of [[pqEncode]]):
    * corpus vectors are reduced to their nibble codes, queries stay raw,
    * and each (query, segment, codeword) distance is precomputed into a
    * lookup table — scoring a coded vector is `nSeg` table lookups instead
    * of a `dim`-wide float scan, which is why PQ indexes serve
    * billion-vector corpora from RAM.
    *
    * Scale shape: codes are a pure scan (the [[segCodes]] kernel,
    * codebook as literals); the LUTs are (queries × nSeg × nCodes)
    * doubles — driver-computed from the broadcast-small query set and
    * broadcast-joined, so the corpus never shuffles; top-k per query is
    * the WindowGroupLimit path. The ADC sum runs s=0..7 left-to-right and
    * the oracle reassembles it with `list_sum(list(d2 ORDER BY s))` — the
    * one aggregation in the operator whose FP order is pinned on BOTH
    * engines.
    */
  def adcSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nSeg: Int = 8,
      nCodes: Int = 16): DataFrame = {
    require(dim % nSeg == 0, s"dim $dim must split into $nSeg segments")
    val segDim = dim / nSeg
    val codewords: Array[Seq[Float]] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long").asc)
      .limit(nCodes)
      .collect()
      .map(_.getSeq[Float](1).toSeq)
    val codes = segCodes(col(vecCol), codewords, nSeg, segDim)
    // materialize the code assignment BEFORE the query fan-out: the
    // broadcast join would otherwise re-evaluate the 8×16-codeword argmin
    // scan once per query row it pairs with
    val coded = corpus.select(col(idCol).cast("long").as("cid"), codes.as("codes"))
      .localCheckpoint(true)
    val luts: Seq[(Long, Seq[Seq[Double]])] = queries
      .select(col(idCol).cast("long"), col(vecCol)).collect().toSeq
      .map { r =>
        val qv = r.getSeq[Float](1)
        r.getLong(0) -> (0 until nSeg).map { s =>
          val qs = qv.slice(s * segDim, (s + 1) * segDim)
          (0 until nCodes).map { j =>
            val cs = codewords(j).slice(s * segDim, (s + 1) * segDim)
            qs.zip(cs).foldLeft(0.0) { case (a, (qd, cd)) =>
              val d = qd.toDouble - cd.toDouble; a + d * d
            }
          }.toSeq
        }.toSeq
      }
    val session = corpus.sparkSession
    import session.implicits._
    val qdf = broadcast(luts.toDF("q_id", "lut"))
    val adc = (0 until nSeg).map { s =>
      element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1).cast("int") + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("cid").asc)
    coded.crossJoin(qdf)
      .where(col("q_id") =!= col("cid"))
      .select(col("q_id"), col("cid"), adc.as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("cid").as("neighbor_id"),
        round(col("adc"), 4).as("adc"), col("rank"))
  }

  /** IVF-PQ search (Jégou et al. 2011, the composed index): [[ivfTopK]]'s
    * coarse quantizer in front of [[adcSearch]]'s table-lookup scoring —
    * the billion-scale layout, where PQ-flat ([[adcSearch]] alone) still
    * touches every coded vector per query. Each corpus vector carries a
    * cell id (argmax cosine against `nCells` coarse centroids) AND its
    * `nSeg` nibble codes; a query probes only its `nProbe` nearest cells
    * and ADC-scores just those cells' codes — per-query work drops by
    * ~nCells/nProbe, on top of PQ's dim→nSeg lookup compression.
    *
    * Scale shape: cell assignment + PQ encode fuse into ONE corpus scan
    * (both argmax kernels in the same projection), materialized once
    * (`localCheckpoint` — the s09 rule, or the probe fan-out would
    * re-run the encode per matched query). Probes + LUTs ride a broadcast
    * keyed by cell, so the corpus never shuffles; top-k per query is the
    * WindowGroupLimit path. The ADC sum runs s=0..nSeg-1 left-to-right
    * (the oracle pins the same order). Centroids and codebooks are the
    * deterministic lowest-id stand-ins shared with s03/s08/s09 (see
    * [[kmeansTrain]] for the trained alternative).
    */
  def ivfPqSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nSeg: Int = 8,
      nCodes: Int = 16,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    require(dim % nSeg == 0, s"dim $dim must split into $nSeg segments")
    val segDim = dim / nSeg
    val model: Array[Seq[Float]] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long").asc)
      .limit(math.max(nCodes, nCells))
      .collect()
      .map(_.getSeq[Float](1).toSeq)
    val codewords = model.take(nCodes)
    val centroids = model.take(nCells)
    // r19: literal centroid norms + one per-row norm (same accumulation
    // as the fused kernel — bit-identical; see ivfTopK)
    val cnorm: Array[Double] = centroids.map { cv =>
      math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    }
    def cellScores(v: Column, vn: Column): Column = array(centroids.zipWithIndex.map {
      case (cv, ci) =>
        struct(cosinePre(v, typedlit(cv), vn, lit(cnorm(ci))).as("cos"), lit(ci.toLong).as("cid"))
    }: _*)
    // ONE fused scan assigns cell + codes; materialize before the fan-out
    val coded = corpus.select(col(idCol).cast("long").as("cid"),
        col(vecCol).as("_v"), norm(col(vecCol)).as("_vn"))
      .select(col("cid"),
        array_max(cellScores(col("_v"), col("_vn"))).getField("cid").as("cell"),
        segCodes(col("_v"), codewords, nSeg, segDim).as("codes"))
      .localCheckpoint(true)
    val luts: Seq[(Long, Seq[Seq[Double]])] = queries
      .select(col(idCol).cast("long"), col(vecCol)).collect().toSeq
      .map { r =>
        val qv = r.getSeq[Float](1)
        r.getLong(0) -> (0 until nSeg).map { s =>
          val qs = qv.slice(s * segDim, (s + 1) * segDim)
          (0 until nCodes).map { j =>
            val cs = codewords(j).slice(s * segDim, (s + 1) * segDim)
            qs.zip(cs).foldLeft(0.0) { case (a, (qd, cd)) =>
              val d = qd.toDouble - cd.toDouble; a + d * d
            }
          }.toSeq
        }.toSeq
      }
    // probed cells come from the same cosine kernel as the corpus cells
    // (descending (cos, cid) — ties resolve identically on both sides)
    val probes = queries
      .select(col(idCol).cast("long").as("q_id"),
        col(vecCol).as("_qv"), norm(col(vecCol)).as("_qn"))
      .select(col("q_id"),
        slice(reverse(array_sort(cellScores(col("_qv"), col("_qn")))), 1, nProbe).as("_top"))
      .select(col("q_id"), explode(col("_top").getField("cid")).as("cell"))
    val session = corpus.sparkSession
    import session.implicits._
    val qdf = broadcast(luts.toDF("q_id", "lut").join(probes, Seq("q_id")))
    val adc = (0 until nSeg).map { s =>
      element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1).cast("int") + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("cid").asc)
    coded.join(qdf, Seq("cell"))
      .where(col("q_id") =!= col("cid"))
      .select(col("q_id"), col("cid"), adc.as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("cid").as("neighbor_id"),
        round(col("adc"), 4).as("adc"), col("rank"))
  }

  /** Exact-integer Lloyd k-means (the trained replacement for the
    * lowest-id codebook/centroid stand-ins in s03/s08/s09/d11): `iters`
    * assign-recompute rounds over 1e-6-scaled integer vectors. Because
    * every operation is integer (scaled components, long squared-L2,
    * long sums, truncating division), the trajectory is bit-exact across
    * engines, partitionings and retries — an unrolled SQL oracle
    * hash-matches the final centroids, the q52 PageRank rule applied to
    * the one "model fit" a pipeline otherwise can't oracle.
    *
    * Distributed shape (the MLlib broadcast pattern): per iteration the
    * assignment is a PURE SCAN — a fused codegen long-L2 kernel
    * ([[graft.expressions.VectorExprs.l2LL]]) against k broadcast
    * centroid literals, argmin via struct `array_min` (ties to the lower
    * centroid id) — and the recompute is ONE shuffle whose map-side
    * partials reduce to k×dim groups. Between iterations only the k×dim
    * centroid ints visit the driver (a bounded model read, never data).
    * Init = the k lowest-id vectors (the s03/s08 convention). Training at
    * 100 TB runs this on a sample; the scaled ints come from one linear
    * `transform` materialized once up front (`localCheckpoint`), the only
    * non-codegen step.
    *
    * Output: one row per (cluster_id, dim) with the final scaled-integer
    * centroid component `c6` and the final assignment's `n_members`
    * (empty clusters keep their previous centroid, n_members = 0).
    */
  def kmeansTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 8,
      iters: Int = 3): DataFrame = {
    require(k > 0 && iters >= 1)
    // r19: the scaled-integer conversion through the fused array kernel —
    // the transform(...) higher-order lambda evaluated interpreted per
    // ELEMENT (N×dim tree walks into this checkpoint); element-identical
    // by the ScaleRoundFL/MoneyRound contract
    val v6 = corpus.select(col(idCol).cast("long").as("vec_id"),
        VectorExprs.scaleRoundFL(col(vecCol), 1000000L).as("v6"))
      .localCheckpoint(true)
    var cents: Array[Seq[Long]] = v6.orderBy(col("vec_id").asc).limit(k)
      .collect().map(_.getSeq[Long](1).toSeq)
    def recomputed(): DataFrame = {
      val scores = array(cents.zipWithIndex.map { case (c6, ci) =>
        struct(VectorExprs.l2LL(col("v6"), typedlit(c6)).as("d2"), lit(ci.toLong).as("ci"))
      }: _*)
      v6.select(array_min(scores).getField("ci").as("ci"), posexplode(col("v6")).as(Seq("dim", "x6")))
        .groupBy(col("ci"), col("dim").cast("long").as("dim"))
        .agg(sum(col("x6")).as("sum6"), count(lit(1)).as("n"))
    }
    for (_ <- 1 until iters) {
      val upd = recomputed().select(col("ci"), col("dim"), expr("sum6 div n").as("c6")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      cents = Array.tabulate(k)(ci =>
        Seq.tabulate(dim)(d => upd.getOrElse((ci.toLong, d.toLong), cents(ci)(d))))
    }
    // final round stays distributed: the (k×dim)-row aggregate IS the
    // output; empty clusters coalesce to the previous centroids
    val session = corpus.sparkSession
    import session.implicits._
    val prev = cents.zipWithIndex.flatMap { case (c6, ci) =>
      c6.zipWithIndex.map { case (v, d) => (ci.toLong, d.toLong, v) }
    }.toSeq.toDF("cluster_id", "dim", "prev_c6")
    val comp = recomputed()
      .select(col("ci").as("cluster_id"), col("dim"), expr("sum6 div n").as("new_c6"), col("n"))
    // both sides are k×dim rows — no hint needed (build-left is unsupported
    // for left-outer anyway)
    prev.join(comp, Seq("cluster_id", "dim"), "left_outer")
      .select(col("cluster_id"), col("dim"),
        coalesce(col("new_c6"), col("prev_c6")).as("c6"),
        coalesce(col("n"), lit(0L)).as("n_members"))
  }

  /** [[kmeansTrain]] reduced to a driver-side model handle: the final
    * centroids as float vectors, consumable by [[ivfTopK]] /
    * [[graft.operators.Dedup.semanticDedup]] in place of their lowest-id
    * stand-ins (k×dim values — a bounded model read, never data).
    */
  def kmeansCentroidVectors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 8,
      iters: Int = 3): Seq[Seq[Float]] = {
    val cells = kmeansTrain(corpus, idCol, vecCol, dim, k, iters)
      .select(col("cluster_id"), col("dim"), col("c6")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq.tabulate(k)(ci =>
      Seq.tabulate(dim)(d => (cells((ci.toLong, d.toLong)).toDouble / 1e6).toFloat))
  }

  /** IVF-style ANN: a coarse quantizer of `nCentroids` centroid vectors
    * partitions the corpus into cells; each query exactly scores only the
    * `nProbe` cells nearest to it. Centroids default to the deterministic
    * lowest-id stand-in (keeps the operator oracle-checkable); pass
    * `trained` (e.g. [[kmeansCentroidVectors]]) to use a real model.
    * At scale: cell assignment is a pure scan (fused cosine kernels against
    * broadcast centroid literals), and the candidate join shuffles only
    * cell keys — the IVF index structure without a vector-DB dependency.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      trained: Option[Seq[Seq[Float]]] = None): DataFrame = {
    val centroids: Array[(Long, Seq[Float])] = trained match {
      case Some(cs) => cs.zipWithIndex.map { case (v, i) => i.toLong -> v }.toArray
      case None => corpus
        .select(col(idCol).cast("long"), col(vecCol))
        .orderBy(col(idCol).cast("long").asc)
        .limit(nCentroids)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
    }
    // per-centroid scores as an array<struct<cos,cid>>; struct ordering
    // (cos first) makes array_max the argmax — no window, no shuffle.
    // r19: the row norm is computed once per row and the centroid norms
    // are driver-side literals (same left-to-right double accumulation +
    // Math.sqrt as the fused kernel — bit-identical), so the k-way score
    // array and the exact re-rank pay one dot loop per comparison
    val cnorm: Array[Double] = centroids.map { case (_, cv) =>
      math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    }
    def cellScores(v: Column, vn: Column): Column = array(centroids.zipWithIndex.map {
      case ((_, cv), ci) =>
        struct(cosinePre(v, typedlit(cv), vn, lit(cnorm(ci))).as("cos"), lit(ci.toLong).as("cid"))
    }: _*)
    val cells = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"), norm(col(vecCol)).as("_cn"))
      .select(col("neighbor_id"), col("cv"), col("_cn"),
        array_max(cellScores(col("cv"), col("_cn"))).getField("cid").as("cell"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), norm(col(vecCol)).as("_qn"))
      .select(col("q_id"), col("qv"), col("_qn"),
        slice(reverse(array_sort(cellScores(col("qv"), col("_qn")))), 1, nProbe).as("_top"))
      .select(col("q_id"), col("qv"), col("_qn"), explode(col("_top").getField("cid")).as("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cells
      .join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates sharing a hyperplane-signature band with
    * the query are scored exactly; top-k of those per query. Recall < 1 by
    * construction; at 100 TB this turns an all-pairs scan into a few
    * bucket-local joins.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      bits: Int = 16,
      bandBits: Int = 4): DataFrame = {
    val nBands = bits / bandBits
    // shared banding: vectors stay OUT of the band explode — only
    // (band, id, sig) meets the broadcast join, and band-collision
    // duplicates are dropped by the stateless first-matching-band filter
    // instead of a groupBy-max exchange over the collision volume. Each
    // candidate pair is scored exactly once by the one vector re-join.
    val c = BandLsh.banded(corpus, idCol, vecCol, "neighbor_id", "cs", dim, bandBits, nBands, barrier = false)
    val q = BandLsh.banded(queries, idCol, vecCol, "q_id", "qs", dim, bandBits, nBands, barrier = false)
    val cand = c
      .join(broadcast(q), Seq("band"))
      .where(col("q_id") =!= col("neighbor_id"))
      .where(BandLsh.firstMatchingBand(col("qs"), col("cs"), col("band"), bandBits, nBands))
      .select(col("q_id"), col("neighbor_id"))
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("_cn")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("_qn"))), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Range similarity search over LSH buckets: EVERY corpus vector with
    * cosine ≥ `minCosine` of each query — the retrieval contract a
    * blocklist screen or kNN-graph expansion needs, where top-k would
    * silently truncate the answer set.
    *
    * Shape at 100 TB: the corpus side is banded scan-side (signature is
    * one codegen pass; only (band, id, sig) enters the join — vectors stay
    * home) and the QUERY side is banded and broadcast, so the corpus never
    * shuffles — the s01/t08 broadcast pattern applied to banding. A pair
    * colliding in k bands is kept once by the same stateless
    * first-matching-band XOR filter as the d07 pair path (no distinct over
    * the collision volume); survivors re-join the corpus vectors once for
    * the exact cosine re-rank. Full recall needs d07's operating point
    * (2-bit × 32 bands at cos ≥ 0.35 ⇒ per-pair miss ≈ 3e-7); the driver
    * oracle — brute force over the query set — doubles as the recall
    * assertion, exactly like d07's.
    */
  def lshRangeSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      dim: Int,
      bandBits: Int = 2,
      nBands: Int = 32): DataFrame = {
    def banded(df: DataFrame, id: String, sig: String): DataFrame =
      BandLsh.banded(df, idCol, vecCol, id, sig, dim, bandBits, nBands, barrier = false)
    val cand = banded(corpus, "neighbor_id", "cs")
      .join(broadcast(banded(queries, "q_id", "qs")), Seq("band"))
      .where(col("q_id") =!= col("neighbor_id"))
      .where(BandLsh.firstMatchingBand(col("qs"), col("cs"), col("band"), bandBits, nBands))
      .select(col("q_id"), col("neighbor_id"))
    BandLsh.exactCosineOnCandidates(cand,
        corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
        queries.select(col(idCol).as("id"), col(vecCol).as("v")),
        "neighbor_id", "q_id", minCosine, broadcastB = true)
      .select(col("q_id"), col("neighbor_id"), col("cos"))
  }
}
