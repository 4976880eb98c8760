package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deployment-time guard for the scaled-integer exactness contract.
  *
  * The engine's determinism contract is "64-bit sums of scaled integers"
  * (SURVEY §4): every exact-arithmetic family has a documented overflow
  * ceiling, reached only 100–1000× beyond the verified SF range. The audit
  * here turns that prose into a check a deployment can RUN against its
  * actual data: each family's worst-case 64-bit magnitude is computed from
  * the loaded tables' true row counts and maxima (in decimal(38,0), so the
  * audit itself cannot wrap), and anything past 10% of the 2⁶³−1 ceiling
  * fails loudly — the "flip the documented widening switch" moment is
  * detected, not remembered.
  *
  * Families (the §4 audit, mechanized):
  *  - `revenue_sum` — q12/q40/q48/q49-class grouped sums. Worst case is the
  *    GLOBAL sum of the largest per-row term (q12's sum_charge product,
  *    price_c2·(100+tax_c2)·(100−disc_c2)); any groupBy splits it smaller.
  *  - `qty_sum` — q1-style quantity sums, same shape, smaller terms.
  *  - `gate_cross_mult` — q68's value4·n_parts vs 2·total4 integer gate:
  *    both factors grow with SF, so this family hits the ceiling first
  *    (~sf100 where the linear sums last to ~sf1000).
  * Sketch/hash arithmetic (KMV, Bloom, band keys) is scale-independent —
  * bounded by k/mBits/2⁶⁴, never by data volume — and has no audit entry.
  */
object OverflowAudit {

  val Ceiling: BigDecimal = BigDecimal(Long.MaxValue)

  /** One family's worst-case magnitude on the audited data. `fraction` is
    * worst/2⁶³; [[ok]] holds while it stays under the 10% alarm line.
    */
  final case class Headroom(family: String, worst: BigDecimal) {
    def fraction: Double = (worst / Ceiling).toDouble
    def ok: Boolean = fraction < 0.10
    override def toString: String = f"$family: worst=$worst%.3e (${fraction * 100}%.4f%% of 2^63)"
  }

  /** Worst-case magnitude of a 64-bit SUM over `term`: Σ|term| computed in
    * decimal(38,0) — exact for any realistic table, immune to the very
    * wraparound it measures.
    */
  def sumHeadroom(family: String, df: DataFrame, term: Column): Headroom = {
    val r = df.agg(sum(abs(term).cast("decimal(38,0)")).as("s")).head()
    val worst = Option(r.getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    Headroom(family, worst)
  }

  /** Worst-case magnitude of an integer cross-multiplication gate
    * `a·b`: max|a| · max|b| over the frame, in exact BigDecimal.
    */
  def crossMultHeadroom(family: String, df: DataFrame, a: Column, b: Column): Headroom = {
    val r = df.agg(
      max(abs(a).cast("decimal(38,0)")).as("ma"),
      max(abs(b).cast("decimal(38,0)")).as("mb")).head()
    val worst = (for {
      ma <- Option(r.getDecimal(0))
      mb <- Option(r.getDecimal(1))
    } yield BigDecimal(ma) * BigDecimal(mb)).getOrElse(BigDecimal(0))
    Headroom(family, worst)
  }

  private def c2(c: Column): Column = round(c * lit(100)).cast("decimal(38,0)")

  /** The full audit over a loaded testdata/deployment directory. */
  def audit(spark: SparkSession, dir: String): Seq[Headroom] = {
    val li = Tables.lineitem(spark, dir)
    // q12's sum_charge product is the largest per-row revenue-family term
    val charge = c2(col("l_extendedprice")) *
      (lit(100) - c2(col("l_discount"))) * (lit(100) + c2(col("l_tax")))
    val revenue = sumHeadroom("revenue_sum", li, charge)
    val qty = sumHeadroom("qty_sum", li, c2(col("l_quantity")))
    // q68's gate: per-part value4 (Σ q_c·price_c over the part's shipments,
    // here bounded by the UNFILTERED per-part aggregate — the audited worst
    // case over any nation filter) cross-multiplied with the part count
    val perPart = li
      .select(col("l_partkey"), c2(col("l_quantity")).as("q_c"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), c2(col("p_retailprice")).as("price_c"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("q_c") * col("price_c")).as("value4"), count(lit(1)).as("n"))
    val nParts = perPart.agg(count(lit(1)).cast("decimal(38,0)").as("np"),
      sum(col("value4")).as("tot")).head()
    val np = BigDecimal(nParts.getDecimal(0))
    val tot = Option(nParts.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    val maxV = perPart.agg(max(abs(col("value4")).cast("decimal(38,0)"))).head()
    val mv = Option(maxV.getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    // both sides of the gate: value4·n_parts and 2·total4
    val gate = Headroom("gate_cross_mult", (mv * np).max(tot * 2))
    Seq(revenue, qty, gate)
  }

  /** Table rendering of [[audit]] for ops surfaces: one row per family. */
  def auditDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audit(spark, dir)
      .map(h => (h.family, h.worst.toDouble, h.fraction, h.ok))
      .toDF("family", "worst_case", "fraction_of_ceiling", "ok")
  }
}
