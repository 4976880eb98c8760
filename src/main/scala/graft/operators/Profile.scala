package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass data profiling — the ingest-side data-quality gate.
  *
  * The reference trusts its exports; a 100 TB pipeline can't (a bad export
  * with 90% NULL keys must be caught before the merge). Everything here is
  * ONE aggregate over ONE scan: Spark computes all requested statistics in
  * the same partial-aggregation pass, so profiling costs a single read of
  * the slice being admitted no matter how many columns are profiled.
  * count_distinct columns each add a distinct-expand; keep that list to key
  * columns (or swap to approx_count_distinct at extreme cardinalities).
  */
object Profile {

  def summary(
      df: DataFrame,
      distinctCols: Seq[String],
      numericCols: Seq[String]): DataFrame = {
    val aggs =
      distinctCols.flatMap(c =>
        Seq(count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"))) ++
        numericCols.flatMap(c =>
          Seq(
            min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"),
            // numeric columns are 2-decimal by contract: sum exact scaled
            // integers (a double sum drifts with accumulation order — the
            // q16 sf1 lesson), divide once
            round(sum(round(col(c) * lit(100)).cast("long")).cast("double") / lit(100.0), 2)
              .as(s"sum_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
