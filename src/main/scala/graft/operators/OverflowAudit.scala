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
    *
    * `worst = None` means the audit could not measure the family — a null
    * aggregate over NON-EMPTY input (all-null terms, or the audit's own
    * decimal(38,0) arithmetic wrapping in non-ANSI mode), or ANY per-row
    * null term among non-null rows (sum/max silently skip those, so a
    * partially-null measurement would understate the worst case). The guard
    * fails CLOSED there: the regimes that null out the measurement are
    * exactly the extreme ones it exists to detect, so `ok` is false and the
    * render says UNMEASURABLE instead of silently reporting zero.
    */
  final case class Headroom(family: String, worst: Option[BigDecimal]) {
    def fraction: Double = worst.map(w => (w / Ceiling).toDouble).getOrElse(Double.NaN)
    // NaN < 0.10 is false, so the unmeasurable case stays failed-closed.
    def ok: Boolean = fraction < 0.10
    override def toString: String = worst match {
      case Some(w) => f"$family: worst=$w%.3e (${fraction * 100}%.4f%% of 2^63)"
      case None => s"$family: UNMEASURABLE (null aggregate over non-empty input — failing closed)"
    }
  }

  /** Worst-case magnitude of a 64-bit SUM over `term`: Σ|term| computed in
    * decimal(38,0) — exact for any realistic table. Empty input is a
    * measured zero (nothing can overflow); a null sum with rows present OR
    * any per-row null term (sum would silently skip it, understating the
    * worst case) is unmeasurable and fails closed (see [[Headroom]]).
    */
  def sumHeadroom(family: String, df: DataFrame, term: Column): Headroom = {
    val t = abs(term).cast("decimal(38,0)")
    val r = df.agg(sum(t).as("s"), count(lit(1)).as("n"), count(t).as("nn")).head()
    val rows = r.getLong(1)
    val worst =
      if (rows == 0L) Some(BigDecimal(0))
      else if (r.getLong(2) != rows) None // per-row nulls dropped by sum
      else Option(r.getDecimal(0)).map(BigDecimal(_))
    Headroom(family, worst)
  }

  /** Worst-case magnitude of an integer cross-multiplication gate
    * `a·b`: max|a| · max|b| over the frame, in exact BigDecimal. Same
    * empty-is-zero / null-with-rows-fails-closed contract as [[sumHeadroom]].
    */
  def crossMultHeadroom(family: String, df: DataFrame, a: Column, b: Column): Headroom = {
    val (ta, tb) = (abs(a).cast("decimal(38,0)"), abs(b).cast("decimal(38,0)"))
    val r = df.agg(
      max(ta).as("ma"), max(tb).as("mb"),
      count(lit(1)).as("n"), count(ta).as("na"), count(tb).as("nb")).head()
    val rows = r.getLong(2)
    val worst =
      if (rows == 0L) Some(BigDecimal(0))
      else if (r.getLong(3) != rows || r.getLong(4) != rows) None // nulls dropped by max
      else for {
        ma <- Option(r.getDecimal(0))
        mb <- Option(r.getDecimal(1))
      } yield BigDecimal(ma) * BigDecimal(mb)
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
      .agg(sum(col("q_c") * col("price_c")).as("value4"),
        count(lit(1)).as("n"), count(col("q_c") * col("price_c")).as("nn"))
    val nParts = perPart.agg(count(lit(1)).cast("decimal(38,0)").as("np"),
      sum(col("value4")).as("tot"),
      sum(col("n")).as("rows_total"), sum(col("nn")).as("rows_nonnull"),
      count(col("value4")).as("np_nonnull"), count(lit(1)).as("np_l")).head()
    val np = BigDecimal(nParts.getDecimal(0))
    val tot = Option(nParts.getDecimal(1)).map(BigDecimal(_))
    // Fail closed on ANY dropped term: per-row null products (skipped by the
    // per-part sum) or per-part null value4 (skipped by sum(tot)/max below).
    val allMeasured = np == 0 ||
      (nParts.getLong(2) == nParts.getLong(3) && nParts.getLong(4) == nParts.getLong(5))
    val maxV = perPart.agg(max(abs(col("value4")).cast("decimal(38,0)"))).head()
    val mv = Option(maxV.getDecimal(0)).map(BigDecimal(_))
    // both sides of the gate: value4·n_parts and 2·total4. Empty perPart is
    // a measured zero; a null or partially-null aggregate with parts present
    // fails closed.
    val gateWorst =
      if (np == 0) Some(BigDecimal(0))
      else if (!allMeasured) None
      else for { t <- tot; m <- mv } yield (m * np).max(t * 2)
    val gate = Headroom("gate_cross_mult", gateWorst)
    Seq(revenue, qty, gate)
  }

  /** Table rendering of [[audit]] for ops surfaces: one row per family. */
  def auditDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audit(spark, dir)
      .map(h => (h.family, h.worst.map(_.toDouble).getOrElse(Double.NaN), h.fraction, h.ok))
      .toDF("family", "worst_case", "fraction_of_ceiling", "ok")
  }
}
