package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream join.
  *
  * The reference's tables arrive as parallel incremental streams (casts,
  * reactions, links — each its own export series); joining "reactions to
  * the cast they react to within N minutes" across two live streams is the
  * remaining streaming shape the other modules don't cover. The join state
  * Spark must hold is bounded by watermark + the time-range predicate: each
  * side evicts rows once the other side's watermark passes `ts + maxDelay`,
  * so state is O(rows in the delay window), not O(stream).
  */
object StreamJoins {

  /** Inner-join `right` rows onto `left` rows with the same `key` where
    * `right.tsCol` lands in `[left.tsCol, left.tsCol + maxDelay]`.
    *
    * Both inputs MUST already carry watermarks on their respective `tsCol`
    * (the caller owns lateness policy). Column names are prefixed `l_`/`r_`
    * to keep the output schema collision-free.
    */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      maxDelay: String): DataFrame = {
    val l = left.columns.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    l.join(
      r,
      expr(
        s"l_$key = r_$key AND r_$tsCol >= l_$tsCol AND r_$tsCol <= l_$tsCol + interval $maxDelay"),
      "inner")
  }
}
