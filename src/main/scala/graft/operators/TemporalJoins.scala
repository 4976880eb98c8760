package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins.
  *
  * As-of join: for every probe row, the newest build row with
  * `buildTime <= probeTime` on the same key. The naive formulation is a
  * range join (O(n·m) worst case); this one is the scalable composition:
  * union both sides, one shuffle+sort per key, and a running `last_value
  * (ignoreNulls)` carries the newest build attributes forward — linear in
  * input size, no pair explosion, AQE-friendly. (DuckDB/kdb ship ASOF JOIN
  * natively; the oracle uses exactly that.)
  */
object TemporalJoins {

  private val strategyLock = new Object

  /** @param build  (key, time, payload...) — the "quotes" side
    * @param probe  (key, time, id...)     — the "trades" side
    * @return one row per probe row: probe columns + `asof_<payloadCol>`
    *         (null when no build row precedes it)
    */
  def asofJoin(
      build: DataFrame,
      probe: DataFrame,
      keyCol: String,
      timeCol: String,
      buildPayload: Seq[String],
      probeId: Seq[String]): DataFrame = {
    // the payload travels as ONE struct so the carried values always come
    // from the same (newest-preceding) build row — carrying each column
    // independently with last(ignoreNulls) would resurrect older rows'
    // values wherever the newest row holds a NULL, mixing rows in a way
    // ASOF semantics forbid
    val payloadType = org.apache.spark.sql.types.StructType(
      buildPayload.map(c => build.schema(build.schema.fieldIndex(c))))
    val b = build.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as("_side"),
        struct(buildPayload.map(col): _*).as("_bp")) ++
        probeId.map(c => lit(null).cast(probe.schema(c).dataType).as(c))): _*)
    val p = probe.select(
      (Seq(col(keyCol), col(timeCol), lit(1).as("_side"),
        lit(null).cast(payloadType).as("_bp")) ++
        probeId.map(col)): _*)
    // at equal timestamps the build row sorts first (_side 0 < 1), giving
    // the reference's inclusive `<=` semantics
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("_asof", last(col("_bp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(
        (Seq(col(keyCol), col(timeCol)) ++ probeId.map(col) ++
          buildPayload.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }

  /** As-of join through the native Catalyst operator
    * ([[graft.plans.AsOfJoinPlan]]): same contract and output as
    * [[asofJoin]], but each side keeps its own schema and the planner
    * co-partitions + sorts them like a sort-merge join, with a streaming
    * per-partition merge. Payload column names must not collide with probe
    * columns (they are exposed as `asof_<name>`).
    */
  def asofJoinNative(
      build: DataFrame,
      probe: DataFrame,
      keyCol: String,
      timeCol: String,
      buildPayload: Seq[String],
      probeId: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = probe.sparkSession
    // extraStrategies is shared session state and read-modify-write is not
    // atomic — serialize registration so concurrent callers can't duplicate
    // or drop it. (The strategy only matches AsOfJoinPlan nodes, so staying
    // registered is inert for other queries. Preferred production path:
    // graft.GraftExtensions via spark.sql.extensions at session build.)
    strategyLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      }
    }
    val p = probe.select((Seq(col(keyCol), col(timeCol)) ++ probeId.map(col)): _*)
    val b = build.select((Seq(col(keyCol), col(timeCol)) ++ buildPayload.map(col)): _*)
    val pPlan = ColumnBridge.planOf(p)
    val bPlan = ColumnBridge.planOf(b)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = graft.plans.AsOfJoinPlan(
      pPlan, bPlan,
      attr(pPlan, keyCol), attr(pPlan, timeCol),
      attr(bPlan, keyCol), attr(bPlan, timeCol),
      buildPayload.map(attr(bPlan, _)))
    ColumnBridge.ofRows(spark, node).select(
      (Seq(col(keyCol), col(timeCol)) ++ probeId.map(col) ++
        buildPayload.map(c => col(c).as(s"asof_$c"))): _*)
  }

  /** Range join of a fact table against a small ranges table
    * (lo <= value < hi): broadcast the ranges so the fact side never
    * shuffles — at 100 TB the only viable plan for band joins.
    */
  def rangeJoin(
      facts: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String): DataFrame =
    facts.join(
      broadcast(ranges),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}
