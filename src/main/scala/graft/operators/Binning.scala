package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics without per-class sort tasks.
  *
  * The naive per-class rank — `row_number() OVER (PARTITION BY class ORDER
  * BY v)` — is a ONE-TASK external sort per class when the class key's
  * cardinality is below the cluster's parallelism (VERDICT r7 on q26/q70:
  * five priority classes ⇒ five tasks each sorting |orders|/5 — at 100 TB a
  * multi-TB single-task sort, the global-sort killer divided by five).
  *
  * Two-pass distributed rank instead:
  *
  *  1. `repartitionByRange(P, class, v, tie)` splits the data into P
  *     contiguous key ranges (P = configured shuffle parallelism, explicit
  *     so AQE never coalesces it away). Within a class, every row in range
  *     partition i sorts before every row in partition i+1 — so a row's
  *     global rank is its LOCAL rank plus the count of same-class rows in
  *     earlier partitions.
  *  2. Local ranks come from a window over (partition-id, class): P×|class|
  *     groups, each bounded by the range-chunk size — the sort work is
  *     spread over P tasks regardless of how few classes exist.
  *  3. The per-(partition, class) counts aggregate to P×|class| rows; their
  *     running sums (the rank offsets) and class totals broadcast back.
  *
  * Rank values are a pure function of the row set (the tie column must make
  * (class, v, tie) unique): range boundaries, partition count and AQE
  * decisions cannot change the output — the determinism contract (SURVEY
  * §4) holds for any partitioning.
  */
object Binning {

  /** Adds `rn` (1-based dense rank of (orderCol, tieCol) ascending within
    * classCol) and `n` (class row count) to `df` — the building block for
    * equal-frequency binning (q70) and type-1 quantile picks (q26).
    * All input columns pass through.
    *
    * ONE row-data exchange total: the range repartition. Local ranks come
    * from a per-partition running counter over the partition-sorted rows —
    * the canonical justified `mapPartitions` (a window over (chunk-id,
    * class) computes the same thing but EnsureRequirements cannot see that
    * every (chunk, class) group is already co-located, so it would
    * re-exchange 100% of the rows a second time). The rank scan runs once
    * per consumer branch over the REUSED exchange; only P×|class| count
    * rows and the broadcast offsets move after the range shuffle.
    */
  def rankInClass(df: DataFrame, classCol: String, orderCol: String, tieCol: String): DataFrame = {
    val withRank = localRunning(df, classCol, orderCol, tieCol, None)
    // P×|class| rank offsets: per-(chunk, class) sizes are each chunk's
    // MAX local rank (no second count pass), cumulative-summed in range
    // order; the offset windows run over statistics rows, never data
    val counts = withRank.groupBy(col("_pid"), col(classCol)).agg(max(col("_lrn")).as("_cnt"))
    val wOff = Window.partitionBy(col(classCol)).orderBy(col("_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("_cnt")).over(Window.partitionBy(col(classCol))))
      .select(col("_pid"), col(classCol), col("_off"), col("n"))
    // null-safe class equality (<=>): a window PARTITION BY ranks null-class
    // rows as their own group, and an equi-join here would silently drop them
    withRank
      .join(broadcast(offsets
          .withColumnRenamed("_pid", "_opid").withColumnRenamed(classCol, "_ocls")),
        col("_pid") === col("_opid") && col(classCol) <=> col("_ocls"))
      .withColumn("rn", col("_lrn") + col("_off"))
      .drop("_pid", "_opid", "_ocls", "_lrn", "_off")
  }

  /** Adds `cum` — the inclusive per-class prefix sum of `valueCol` (long)
    * in (orderCol, tieCol) order — with the same one-exchange two-pass
    * shape as [[rankInClass]]: range partition, per-partition running sum,
    * P×|class| chunk totals broadcast back as offsets. The running-sum
    * twin that fixes the OTHER low-cardinality window-sort shape
    * (packSequences' per-source token accumulation): a window
    * `PARTITION BY source ORDER BY ord` is a one-task sort per source at
    * scale; here the sort work spreads over the full parallelism and
    * only statistics move after the range shuffle.
    */
  def prefixSumInClass(
      df: DataFrame,
      classCol: String,
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val withCum = localRunning(df, classCol, orderCol, tieCol, Some(valueCol))
    // per-(chunk, class) value totals (sum, not max — sign-safe),
    // cumulative-summed in range order as the chunk offsets
    val totals = withCum.groupBy(col("_pid"), col(classCol))
      .agg(sum(col(valueCol).cast("long")).as("_tot"))
    val wOff = Window.partitionBy(col(classCol)).orderBy(col("_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
      .select(col("_pid"), col(classCol), col("_off"))
    // null-safe class equality — same contract as rankInClass
    withCum
      .join(broadcast(offsets
          .withColumnRenamed("_pid", "_opid").withColumnRenamed(classCol, "_ocls")),
        col("_pid") === col("_opid") && col(classCol) <=> col("_ocls"))
      .withColumn("cum", col("_lrn") + col("_off"))
      .drop("_pid", "_opid", "_ocls", "_lrn", "_off")
  }

  /** Shared first pass: range-partition + partition-sort on (class, order,
    * tie), then a per-partition running accumulator — rank when `valueCol`
    * is None, inclusive value sum otherwise — emitted as `_lrn` next to
    * the chunk id `_pid`. The canonical justified `mapPartitions`: a
    * window over (chunk-id, class) computes the same thing, but
    * EnsureRequirements cannot see that every (chunk, class) group is
    * already co-located and would re-exchange 100% of the rows a second
    * time. Rows arrive grouped by class (the sort's leading key), so the
    * accumulator is O(1) state; the result is a pure function of the row
    * set for any partitioning (the tie column makes the sort total).
    */
  private def localRunning(
      df: DataFrame,
      classCol: String,
      orderCol: String,
      tieCol: String,
      valueCol: Option[String]): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, col(classCol).asc, col(orderCol).asc, col(tieCol).asc)
      .sortWithinPartitions(col(classCol).asc, col(orderCol).asc, col(tieCol).asc)
    val outSchema = org.apache.spark.sql.types.StructType(ranged.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_pid", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_lrn", org.apache.spark.sql.types.LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val clsIdx = ranged.schema.fieldIndex(classCol)
    val valIdx = valueCol.map(ranged.schema.fieldIndex)
    ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var cur: Any = null
      var started = false
      var acc = 0L
      rows.map { r =>
        val cls = r.get(clsIdx)
        if (!started || cls != cur) { cur = cls; started = true; acc = 0L }
        acc += (valIdx match {
          // null values contribute 0 — the window sum(...) this replaces
          // skips nulls; getAs would NPE on them
          case Some(i) => if (r.isNullAt(i)) 0L else r.getAs[Number](i).longValue()
          case None => 1L
        })
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ acc)
      }
    }(enc)
  }

  /** SQL-standard NTILE(b) from a global rank: with n rows the first
    * (n mod b) buckets hold ⌈n/b⌉ rows, the rest ⌊n/b⌋ — pure integer
    * arithmetic on the [[rankInClass]] output, no further sort or shuffle.
    * (When n < b, every row is its own bucket: the first branch covers it
    * with q = 0.)
    */
  def ntileFromRank(rn: String, n: String, b: Int): org.apache.spark.sql.Column =
    // `div` (exact integer floor on non-negatives), never `/` (DOUBLE on
    // longs — the q69 rule); rn, n ≥ 1 so every operand is non-negative
    expr(
      s"""CASE WHEN $rn <= ($n % $b) * (($n div $b) + 1)
         |     THEN ($rn + ($n div $b)) div (($n div $b) + 1)
         |     ELSE ($n % $b) +
         |          ($rn - ($n % $b) * (($n div $b) + 1) + ($n div $b) - 1) div ($n div $b)
         |END""".stripMargin)
}
