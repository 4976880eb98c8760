package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balancing operators for training-data pipelines: downsample
  * dominant strata (language/source/domain) and cap per-group document
  * counts. Both are deterministic — a re-run selects the same rows, which
  * is what makes a 100 TB sampling job resumable and its output
  * reproducible (RNG-based `sample()` re-draws on every retry/recompute,
  * so a lost partition silently changes the corpus).
  */
object Sampling {

  /** Keep a per-stratum fraction of rows, chosen by a deterministic
    * selector. `selector` must be (or derive from) a stable per-row value;
    * `pmod(selector, 100) < rate%` keeps ~rate% of each stratum with zero
    * coordination — a pure scan filter, no shuffle, no state.
    *
    * For unbiased selection at scale use a mixed hash of the row key
    * (`xxhash64(key, seed)`) as the selector; the oracle-checked query uses
    * the raw key so DuckDB can reproduce the choice function exactly.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      selector: Column,
      ratePercent: Map[String, Int],
      defaultPercent: Int): DataFrame = {
    val rate = ratePercent.foldLeft(lit(defaultPercent)) { case (acc, (k, v)) =>
      when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    df.where(pmod(selector, lit(100)) < rate)
  }

  /** Cap each group at `k` rows, keeping the first `k` in `ord` order —
    * representative selection (e.g. N docs per source, one canonical doc
    * per dedup cluster). The `row_number <= k` form hits Spark's
    * WindowGroupLimit rewrite: map tasks ship at most k rows per group into
    * the exchange, so shuffle volume is O(groups × k), not O(rows).
    * `ord` must end in a unique column for determinism.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column], ord: Seq[Column], k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(groupCols: _*).orderBy(ord: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Sequence packing — assign documents to fixed-token-budget training
    * packs (the pretraining batcher's unit of work): a running token count
    * in `ord` order, chunked every `budget` tokens. The boundary rule is
    * the standard greedy fill: a document belongs to the pack its FIRST
    * token lands in (packs may overflow by at most one document's tail,
    * which the trainer truncates or wraps).
    *
    * Scale shape (r8): the running token count comes from
    * `Binning.prefixSumInClass`'s two-pass range-partitioned sum, NOT a
    * `PARTITION BY source` window — with a handful of sources that window
    * is a one-task external sort per source (the q26/q70 scale-killer,
    * just wearing a running-sum hat). The two-pass form spreads the sort
    * over the full parallelism and still never materializes a global
    * order. All-integer arithmetic → oracle-exact: the pack index is long
    * `div` long (never a double round-trip, which loses exactness past
    * 2^53 of cumulative tokens). `ordCol` must be unique within a group.
    */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    Binning.prefixSumInClass(
      df.withColumn("_tok", col(tokensCol).cast("long")),
      groupCol, ordCol, ordCol, "_tok")
      .withColumn("pack_id", expr(s"(cum - _tok) div ${budget}L"))
      .drop("cum", "_tok")
  }

  /** Mixture rebalancing: select per-source quotas PROPORTIONAL to target
    * weights, bounded by availability — the data-mixing step that turns a
    * raw crawl into a weighted training mixture. λ = min_s ⌊cnt_s·10⁴/w_s⌋
    * is the largest feasible mixture size (the scarcest source relative to
    * its weight binds); source s keeps its first ⌊λ·w_s/10⁴⌋ docs by id.
    * All-integer arithmetic → quota decisions are engine-exact.
    *
    * This is the QUOTA-EXACT variant (a mixture must hit its proportions,
    * so ranks are materialized — via `Binning.rankInClass`'s two-pass
    * range-partitioned rank, r8: a `PARTITION BY source` window rank is a
    * one-task sort per source at scale, the q26/q70 shape). When expected
    * rates suffice, [[stratifiedSample]]'s hash-filter form is the pure
    * scan alternative. Per-source stats and quotas are broadcast
    * (|sources| rows); no global order exists anywhere.
    */
  def mixtureSample(
      docs: DataFrame,
      sourceCol: String,
      weightExpr: Column,
      idCol: String): DataFrame = {
    val d = docs.withColumn("_wt", weightExpr.cast("long"))
    val stats = d.groupBy(col(sourceCol), col("_wt"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col(sourceCol).as("_src"), col("_wt").as("_w2"),
        expr("(_cnt * 10000) div _wt").as("_ratio"))
    val lam = stats.agg(min(col("_ratio")).as("_lam"))
    val keeps = stats.crossJoin(broadcast(lam))
      .select(col("_src"), expr("(_lam * _w2) div 10000").as("_keep"))
    // r18: rank the SKINNY (source, id) projection, not the full frame —
    // rankInClass's running-rank pass is an opaque mapPartitions, so
    // Spark can neither prune columns through it nor keep them out of
    // its range exchange: every payload byte (document text) rode the
    // shuffle AND the per-row external-Row encoder hop. Ranking the
    // two-column projection and joining the kept ids back by `idCol`
    // moves only ids through the rank pipeline; the payload meets one
    // ordinary equi-join (broadcast when the keep set fits, AQE's call
    // at scale), and column pruning from the CALLER's projection now
    // reaches the parquet scan. Same rows out: `idCol` is unique, the
    // keep decision is a pure function of (source, id, weight).
    val keptIds = Binning.rankInClass(
        d.select(col(sourceCol), col(idCol)), sourceCol, idCol, idCol)
      .join(broadcast(keeps), col(sourceCol) === col("_src"))
      .where(col("rn") <= col("_keep"))
      .select(col(idCol).as("_keep_id"))
    docs.join(keptIds, col(idCol) === col("_keep_id")).drop("_keep_id")
  }
}
