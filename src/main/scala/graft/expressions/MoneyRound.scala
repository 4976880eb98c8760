package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `round(x * factor).cast("long")` — the per-row money/rate scaling every
  * monetary scan runs — with the BigDecimal string path off the hot path.
  *
  * Spark's `Round` on a DOUBLE goes through
  * `BigDecimal.valueOf(v).setScale(0, HALF_UP)`: a `Double.toString`
  * (shortest-decimal) conversion plus BigDecimal arithmetic PER ROW, on
  * every money column of every scan (measured ~3× the cost of the pure
  * double form on a 20M-row microbench). This kernel computes the same
  * value through `Math.rint` whenever the input is provably far from a
  * rounding tie, and DELEGATES to the exact BigDecimal path inside the
  * tie band — so it is bit-identical to `round(x*factor).cast("long")`
  * for EVERY input, not just the money domain:
  *
  *  - fast region: |v| < 1e8 and the fractional part of v is ≥ 1e-5 away
  *    from 0.5. There the exact-binary nearest integer (`Math.rint`, ties
  *    impossible), HALF_UP on the exact binary value, and HALF_UP on the
  *    shortest-decimal representation (Spark's semantics — drift from the
  *    binary value ≤ ulp/2 ≤ 7.5e-9 at this magnitude) all coincide. The
  *    fractional part v − floor(v) is computed with error ≤ ulp(v)
  *    ≤ 1.5e-8 at |v| < 1e8 — three orders below the band, so the band
  *    test itself cannot misclassify a true near-tie as far.
  *  - everything else (near-tie, |v| ≥ 1e8, NaN/±Inf handled first as
  *    Spark's Round passes them through to the cast): the exact same
  *    `BigDecimal.valueOf(v).setScale(0, HALF_UP).doubleValue().toLong`
  *    chain Spark's `round(...).cast("long")` runs.
  *
  * A fuzz spec (MoneyRoundSpec) pins equality against the builtin form on
  * uniform randoms, money-shaped values, planted near-ties on both sides
  * of k.5, negatives, NaN/±Inf and ≥1e8 magnitudes.
  */
object MoneyRound {

  def scaledLong(x: Column, factor: Long): Column =
    ColumnBridge.column(RoundScaledLong(ColumnBridge.expression(x), factor))

  /** Static helper shared by eval and generated code (one call per row —
    * tiny, CSE-friendly generated expression). */
  def eval(x: Double, factor: Long): Long = {
    val v = x * factor
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return v.toLong
    val d = v - Math.floor(v)
    if (Math.abs(v) < 1e8 && Math.abs(d - 0.5) > 1e-5) Math.rint(v).toLong
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }
}

case class RoundScaledLong(child: Expression, factor: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"round_scaled_long requires a DOUBLE child, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "round_scaled_long"

  override def nullSafeEval(input: Any): Any =
    MoneyRound.eval(input.asInstanceOf[Double], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MoneyRound.eval($c, ${factor}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
