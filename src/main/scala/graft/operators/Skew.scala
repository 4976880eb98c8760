package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * At 100 TB a handful of hot keys (a viral cast's reactions, one power
  * user's follows) can make a single reducer the whole job's critical path.
  * AQE's skew-join splitting handles join inputs; for aggregations the
  * classic fix is salting: spread each key over `buckets` sub-keys, do the
  * cheap partial aggregate per (key, salt), then a second tiny aggregate
  * over the per-salt partials. Both shuffles have bounded reducer size.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row columns —
    * deterministic so re-runs and the DuckDB oracle agree (rand() would
    * break the correctness compare).
    */
  def salt(buckets: Int, saltSource: Column*): Column =
    pmod(xxhash64(saltSource: _*), lit(buckets))

  /** Two-stage salted aggregation: sum/count-style partials per
    * (keys, salt), then final combine per keys. Returns
    * count/sum columns named n_rows / sum_<valueCol>.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int,
      saltSource: Seq[String]): DataFrame = {
    val stage1 = df
      .withColumn("_salt", salt(buckets, saltSource.map(col): _*))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    stage1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as(s"sum_$valueCol"))
  }
}
