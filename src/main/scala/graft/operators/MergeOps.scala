package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins merge semantics.
  *
  * The reference upserts every row group with
  * `INSERT ... ON CONFLICT (pk) DO UPDATE ... WHERE excluded.updated_at >=
  * existing.updated_at` (db.py:884-893) — i.e. the current state of a table
  * is the latest row per primary key, ordered by updated_at. Declaratively
  * that is a grouped argmax, which Spark executes as ONE shuffle with
  * map-side partial aggregation (each input partition pre-reduces to at most
  * one candidate row per key before the exchange) — strictly better at scale
  * than a window + filter, which must sort whole partitions.
  */
object MergeOps {

  /** Latest row per `keys`, ordered lexicographically by `ord` (descending).
    * `ord` should end in a unique tie-breaker column for determinism.
    * Output keeps the original column order.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], rawOrd: Seq[String]): DataFrame = {
    val ord = rawOrd.filterNot(keys.contains)
    if (ord.isEmpty) return df.dropDuplicates(keys) // PK-unique table: no ordering needed
    val rest = df.columns.toSeq.filterNot(c => keys.contains(c) || ord.contains(c))
    val packed = struct((ord ++ rest).map(col): _*)
    val agg = df
      .groupBy(keys.map(col): _*)
      .agg(max(packed).as("_latest"))
    val unpacked = keys.map(col) ++ (ord ++ rest).map(c => col(s"_latest.$c").as(c))
    agg.select(unpacked: _*).select(df.columns.map(col).toSeq: _*)
  }

  /** SCD-type-2 history derivation: where the reference's upsert keeps only
    * the newest row per key (db.py:884-893 — SCD1), this emits every
    * version with its validity window —
    * `valid_from` = the row's own timestamp, `valid_to` = the next version's
    * timestamp (NULL while current). The reference's upsert stream implies
    * exactly this history; deriving it is one window function over a single
    * shuffle+sort on the key, linear in input.
    */
  def scd2Intervals(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
  }

  /** Full-snapshot + incremental merge (main.py:102-404): the current state
    * after a full export plus a stream of incremental slices is the
    * latest-wins union. Incrementals win ties (they are newer files), which
    * the reference's `>=` upsert guard also guarantees; we encode that as a
    * priority column appended to the ordering.
    */
  def snapshotMerge(
      full: DataFrame,
      incremental: DataFrame,
      keys: Seq[String],
      ord: Seq[String]): DataFrame = {
    val cols = full.columns.toSeq
    val u = full
      .withColumn("_prio", lit(0))
      .unionByName(incremental.select(cols.map(col): _*).withColumn("_prio", lit(1)))
    latestByKey(u, keys, ord :+ "_prio").drop("_prio")
  }

  /** Incremental maintenance of a sum/count rollup: fold ONE new slice into
    * the prior aggregate state without rescanning history.
    *
    * At 100 TB the difference between "re-aggregate everything nightly" and
    * "combine yesterday's state with today's slice" is the whole job: the
    * slice-side aggregation is a scan of the new data only, and the combine
    * shuffles |state| + |slice-groups| rows — both tiny next to the corpus.
    * Works for any decomposable aggregate carried as (sum, count); avg and
    * friends derive at read time (`sum_<c>/n_rows`). The spec proves the
    * fold equals a from-scratch groupBy at every step.
    */
  def foldAggState(
      state: DataFrame, // schema: keys, n_rows, sum_<c>... (or empty)
      slice: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sliceAgg = slice
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
    state
      .unionByName(sliceAgg)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
  }
}
