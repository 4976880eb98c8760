package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}

/** Executed-plan readings of every BroadcastExchange a query actually
  * built — the decade-2 residual from the static-broadcast guard
  * (PlanSpec's 64 MB dataSize bound asserts at spec SF only; VERDICT r12/r13
  * task 3 asks for the same reading at sf10 so an inflation regression is
  * caught at the scale where the static file estimate goes wrong).
  *
  * Semantics mirror the PlanSpec guard:
  *  - `runtimeSized` — every path from the exchange to a leaf crosses a
  *    materialized stage (QueryStageExec/ReusedExchange), i.e. AQE sized
  *    this broadcast from REAL bytes; those cannot misestimate.
  *  - `inflatedBelow` — a Generate (explode) sits below with no
  *    materialized stage between: the static size estimate misses the
  *    inflation factor entirely — the decade-2 hard-fail class.
  *  - `builtBytes` — the executed exchange's dataSize metric: the bytes
  *    actually shipped to every executor, the ground truth the bound reads.
  */
object BroadcastAudit {

  /** `carriesArray` scopes the guard exactly like PlanSpec's: the banded
    * designs put the exploded ARRAY column next to the broadcast decision,
    * so only array-carrying broadcasts are in the dangerous class; scalar
    * LUT/dim broadcasts are recorded for the artifact but never alarmed. */
  final case class Reading(builtBytes: Long, runtimeSized: Boolean,
      inflatedBelow: Boolean, carriesArray: Boolean)

  /** Executes the DataFrame's OWN QueryExecution (toRdd action — a
    * df.write would plan a separate execution whose metrics this reader
    * never sees) so AQE settles and the dataSize metrics carry the
    * executed values, then walks the final plan. */
  def execute(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }

  /** Must be called AFTER [[execute]] (or df.collect()) materialized the
    * SAME QueryExecution. */
  def readings(df: DataFrame): Seq[Reading] = {
    def broadcasts(p: SparkPlan): Seq[BroadcastExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => broadcasts(a.executedPlan)
      case q: QueryStageExec => broadcasts(q.plan)
      case _: ReusedExchangeExec => Nil
      case b: BroadcastExchangeExec => b +: b.children.flatMap(broadcasts)
      case other => other.children.flatMap(broadcasts) ++ other.subqueries.flatMap(broadcasts)
    }
    def runtimeSized(p: SparkPlan): Boolean = p match {
      case _: QueryStageExec | _: ReusedExchangeExec => true
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(runtimeSized)
    }
    def inflated(p: SparkPlan): Boolean = p match {
      case _: QueryStageExec | _: ReusedExchangeExec => false
      case _: GenerateExec => true
      case other => other.children.exists(inflated)
    }
    broadcasts(df.queryExecution.executedPlan).map { b =>
      Reading(
        builtBytes = b.metrics.get("dataSize").map(_.value).getOrElse(-1L),
        runtimeSized = runtimeSized(b.child),
        inflatedBelow = inflated(b.child),
        carriesArray = b.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    }
  }
}
