package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator.
  *
  * The composition in [[graft.operators.TemporalJoins.asofJoin]] (union +
  * window) is linear and correct, but it forces both sides through one
  * union schema and a window sort. This operator is the native form: each
  * side keeps its own schema, Catalyst co-partitions them on the key
  * (`requiredChildDistribution`) and sorts by (key, time)
  * (`requiredChildOrdering`), and a streaming per-partition merge emits,
  * for every probe row, the newest build row with `buildTime <= probeTime`
  * — the same plan shape a sort-merge join gets, so at 100 TB it inherits
  * exchange reuse, AQE coalescing, and never materializes a pair explosion.
  * (DuckDB/kdb ship ASOF JOIN natively; the oracle uses DuckDB's.)
  */
case class AsOfJoinPlan(
    probe: LogicalPlan,
    build: LogicalPlan,
    probeKey: Expression,
    probeTime: Expression,
    buildKey: Expression,
    buildTime: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  override def left: LogicalPlan = probe
  override def right: LogicalPlan = build
  override def output: Seq[Attribute] = probe.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(probe = newLeft, build = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. Registered either through
  * `spark.experimental.extraStrategies` (TemporalJoins does this lazily) or
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(probe, build, pk, pt, bk, bt, payload) =>
      AsOfJoinExec(pk, pt, bk, bt, payload, planLater(probe), planLater(build)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    probeKey: Expression,
    probeTime: Expression,
    buildKey: Expression,
    buildTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  /** Both sides cluster on the join key — EnsureRequirements inserts (or
    * reuses) one hash exchange per side, exactly like a shuffled join.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(probeKey)), ClusteredDistribution(Seq(buildKey)))

  /** Sorted by (key, time) within partitions — the merge is then one
    * forward pass; ties on (key, time) resolve to the last build row in
    * sort order, matching the window-composition's `last()` semantics.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(probeKey, Ascending), SortOrder(probeTime, Ascending)),
    Seq(SortOrder(buildKey, Ascending), SortOrder(buildTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(probeKey, Ascending), SortOrder(probeTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyType = probeKey.dataType
    val timeType = probeTime.dataType
    require(buildKey.dataType == keyType && buildTime.dataType == timeType,
      "as-of join key/time types must match on both sides")
    val pOut = left.output
    val bOut = right.output
    val payloadAttrs = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val pKeyProj = UnsafeProjection.create(Seq(probeKey, probeTime), pOut)
      val bKeyProj = UnsafeProjection.create(Seq(buildKey, buildTime), bOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, bOut)
      // bind the payload slots as NULLABLE: unmatched probes feed a null row
      // through them, and a nullable=false binding would read garbage zeros
      val outProj = UnsafeProjection.create(
        outAttrs, pOut ++ payloadAttrs.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      // current build cursor (key/time of the not-yet-consumed build row)
      var bRow: InternalRow = null
      var bKey: Any = null
      var bTime: Any = null
      def advanceBuild(): Unit =
        if (buildIter.hasNext) {
          bRow = buildIter.next()
          // copy: the projection reuses its buffer, and bKey outlives this
          // call (it's retained as matchKey and compared against later probe
          // rows) — buffer-backed values (UTF8String/Decimal) would otherwise
          // silently mutate under us on the next advance
          val kt = bKeyProj(bRow).copy()
          bKey = if (kt.isNullAt(0)) null else kt.get(0, keyType)
          bTime = if (kt.isNullAt(1)) null else kt.get(1, timeType)
        } else { bRow = null; bKey = null; bTime = null }
      advanceBuild()

      // newest matching build payload seen so far, and the key it belongs to
      var matchKey: Any = null
      var matchPayload: UnsafeRow = null

      probeIter.map { pRow =>
        val kt = pKeyProj(pRow)
        val pKey: Any = if (kt.isNullAt(0)) null else kt.get(0, keyType)
        val pTime: Any = if (kt.isNullAt(1)) null else kt.get(1, timeType)
        if (pKey == null || pTime == null) {
          // null keys never match (SQL equality); a null probe time is
          // "unknown", not "+infinity" — both keep the row with null payload,
          // matching the window-composition asofJoin
          outProj(joined(pRow, nullPayload))
        } else {
          // advance the build side past irrelevant keys and up through all
          // rows at or before the probe time (null build times sort first
          // and can never match: a NULL ts is "unknown", not "-infinity")
          var continue = bRow != null
          while (continue) {
            val c = if (bKey == null) -1 else keyOrd.compare(bKey, pKey)
            if (c < 0) advanceBuild()
            else if (c == 0 && (bTime == null || timeOrd.compare(bTime, pTime) <= 0)) {
              if (bTime != null) { matchKey = bKey; matchPayload = payloadProj(bRow).copy() }
              advanceBuild()
            } else continue = false
            if (bRow == null) continue = false
          }
          val hit = matchPayload != null && matchKey != null && keyOrd.compare(matchKey, pKey) == 0
          outProj(joined(pRow, if (hit) matchPayload else nullPayload))
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
