package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column <-> Expression converters, so custom
  * Catalyst expressions (graft.expressions.*) can be used from the public
  * Column API. Lives under org.apache.spark.sql for package-private access —
  * the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (private[sql] Dataset.ofRows). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The logical plan behind a DataFrame. */
  def planOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Drop the block-manager blocks behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only consults the CacheManager, so checkpoint
    * blocks leak until RDD GC; iterative algorithms that checkpoint per
    * iteration must release the previous iteration explicitly. Only call
    * this once nothing will read the frame again — a local checkpoint
    * truncates lineage, so the data is unrecoverable after unpersist.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    planOf(df).foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
