package graft

import scala.util.Random
import org.apache.spark.sql.functions.col
import graft.operators.RowFilter

/** Differential fuzz of the RowFilter compiler against an independent
  * reference evaluator implementing the Python semantics of
  * row_filters.py (membership/equality never yield SQL "unknown"; a NULL
  * passes $ne/$nin unless NULL is listed). One documented deviation: the
  * reference CRASHES on NULL with range ops (None < x TypeError); we
  * exclude the row instead.
  */
class RowFilterFuzzSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait F
  private case class Leaf(field: String, op: String, v: Any) extends F
  private case class Lst(field: String, op: String, vs: Seq[Any]) extends F
  private case class Bool(op: String, subs: Seq[F]) extends F

  private def renderVal(v: Any): String = v match {
    case null      => "null"
    case s: String => "\"" + s + "\""
    case other     => other.toString
  }

  private def render(f: F): String = f match {
    case Leaf(field, op, v) => s"""{"data.$field": {"$op": ${renderVal(v)}}}"""
    case Lst(field, op, vs) =>
      s"""{"data.$field": {"$op": [${vs.map(renderVal).mkString(", ")}]}}"""
    case Bool(op, subs) => s"""{"$op": [${subs.map(render).mkString(", ")}]}"""
  }

  /** Python-semantics evaluation over (x: Option[Long], s: Option[String]). */
  private def eval(f: F, x: Option[Long], s: Option[String]): Boolean = {
    def get(field: String): Option[Any] = if (field == "x") x else s
    f match {
      case Bool("$and", subs) => subs.forall(eval(_, x, s))
      case Bool("$or", subs)  => subs.exists(eval(_, x, s))
      case Bool(op, _)        => sys.error(op)
      case Lst(field, "$in", vs)  => vs.map(Option(_)).contains(get(field).map(identity))
      case Lst(field, "$nin", vs) => !vs.map(Option(_)).contains(get(field).map(identity))
      case Lst(f2, op, _)         => sys.error(s"$f2 $op")
      case Leaf(field, op, v) =>
        val cur = get(field)
        op match {
          case "$eq" => cur == Option(v)
          case "$ne" => cur != Option(v)
          case "$lt" | "$lte" | "$gt" | "$gte" =>
            cur match {
              case Some(l: Long) =>
                val rv = v.asInstanceOf[Long]
                op match {
                  case "$lt" => l < rv; case "$lte" => l <= rv
                  case "$gt" => l > rv; case _      => l >= rv
                }
              case _ => false // NULL + range op: reference crashes; we drop
            }
          case other => sys.error(other)
        }
    }
  }

  test("compiled filters agree with the reference evaluator on 40 random DSL docs") {
    val rnd = new Random(42)
    val strPool = Seq("click", "view", "purchase", "error")

    def genLeaf(): F = {
      if (rnd.nextBoolean()) { // x: numeric
        rnd.nextInt(4) match {
          case 0 =>
            val op = Seq("$lt", "$lte", "$gt", "$gte")(rnd.nextInt(4))
            Leaf("x", op, rnd.nextInt(11).toLong - 5L)
          case 1 => Leaf("x", if (rnd.nextBoolean()) "$eq" else "$ne",
            if (rnd.nextInt(5) == 0) null else rnd.nextInt(11).toLong - 5L)
          case _ =>
            val vs = Seq.fill(rnd.nextInt(3) + 1)(
              if (rnd.nextInt(5) == 0) null else rnd.nextInt(11).toLong - 5L: Any)
            Lst("x", if (rnd.nextBoolean()) "$in" else "$nin", vs)
        }
      } else { // s: string
        rnd.nextInt(3) match {
          case 0 => Leaf("s", if (rnd.nextBoolean()) "$eq" else "$ne",
            if (rnd.nextInt(5) == 0) null else strPool(rnd.nextInt(strPool.length)))
          case _ =>
            val vs = Seq.fill(rnd.nextInt(3) + 1)(
              if (rnd.nextInt(5) == 0) null else strPool(rnd.nextInt(strPool.length)): Any)
            Lst("s", if (rnd.nextBoolean()) "$in" else "$nin", vs)
        }
      }
    }
    def genF(depth: Int): F =
      if (depth == 0 || rnd.nextInt(3) == 0) genLeaf()
      else Bool(if (rnd.nextBoolean()) "$and" else "$or",
        Seq.fill(rnd.nextInt(2) + 2)(genF(depth - 1)))

    val rows = (0 until 150).map { i =>
      (i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(11).toLong - 5L),
        if (rnd.nextInt(5) == 0) None else Some(strPool(rnd.nextInt(strPool.length))))
    }
    val df = rows.toDF("id", "x", "s").cache()
    df.count()

    (0 until 40).foreach { _ =>
      val f = genF(2)
      val json = render(f)
      val sparkIds = df.where(RowFilter.compile(json))
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val refIds = rows.collect {
        case (id, x, s) if eval(f, x, s) => id
      }.toSet
      assert(sparkIds == refIds,
        s"divergence on $json\nonly-spark: ${(sparkIds -- refIds).toSeq.sorted.take(5)}" +
          s"\nonly-ref: ${(refIds -- sparkIds).toSeq.sorted.take(5)}")
    }
    df.unpersist()
    ()
  }
}
