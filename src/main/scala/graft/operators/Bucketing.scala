package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) table layout — the shuffle-elimination lever
  * for repeated big joins.
  *
  * The reference re-imports the same hot tables (casts, reactions, links)
  * continuously and every consumer joins them on the same keys (fid /
  * target_fid). At 100 TB, re-shuffling both sides per query is the
  * dominant cost; writing the table bucketed by its join key once makes
  * every subsequent equi-join on that key exchange-free: Spark's bucketed
  * scan exposes `HashPartitioning(key, n)` so the planner drops the
  * `Exchange` on both sides (and with `sortBy` metadata, often the sort).
  * This is the batch analog of the reference keeping Postgres tables
  * indexed by PK — paid on write, amortized over every read.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * catalog. `numBuckets` should be sized so one bucket of the LARGEST
    * co-bucketed table fits an executor's memory at target scale (e.g.
    * 100 TB / 4096 buckets ≈ 25 GB per bucket pre-projection — size to the
    * post-pruning width, not the raw row width).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Join two co-bucketed catalog tables on their bucket keys. The plan
    * this produces is the point: SortMergeJoin with NO Exchange on either
    * side (see the plan-shape spec).
    */
  def coBucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
