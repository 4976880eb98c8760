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

  /** Salted equi-join for a skewed fact side: the fact's join key is
    * extended with a salt derived from stable fact columns, and the (small
    * or moderate) dimension side is replicated across all `buckets` salt
    * values — every hot fact key then spreads over `buckets` reducers
    * instead of melting one. Result equals `facts.join(dim, key)` exactly.
    * Use when AQE's skew-join splitting can't see the skew (e.g. the skewed
    * exchange feeds an aggregation, or stats are missing); replication
    * multiplies the dim shuffle volume by `buckets`, so size accordingly.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int,
      saltSource: Seq[String]): DataFrame = {
    val salted = facts.withColumn("_salt", salt(buckets, saltSource.map(col): _*))
    val replicated = dim
      .withColumn("_salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation: sum/count-style partials per
    * (keys, salt), then final combine per keys. Returns
    * count/sum columns named n_rows / sum_<valueCol>.
    * `wide=true` accumulates both stages in decimal(38,0) (the xsum rule) —
    * the integer-cents output escape's always-wide sum contract.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int,
      saltSource: Seq[String],
      wide: Boolean = false): DataFrame = {
    val term = if (wide) col(valueCol).cast("decimal(38,0)") else col(valueCol)
    val stage1 = df
      .withColumn("_salt", salt(buckets, saltSource.map(col): _*))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(term).as("_s"))
    stage1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as(s"sum_$valueCol"))
  }
}
