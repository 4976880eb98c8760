package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema drift across export versions.
  *
  * The reference's exports evolve: new npe versions add columns, and a full
  * export written months before an incremental can be narrower than it
  * (db.py binds rows to whatever columns the DB table has; missing values
  * become NULL). Union-merging slices of different widths therefore needs
  * by-NAME alignment with NULL fill — positional union would silently put
  * values in the wrong columns — plus numeric widening where an export
  * changed a column's physical type (int32 file → int64 table).
  */
object SchemaEvolution {

  /** The widened common type for two parquet-compatible types, if the pair
    * is safely reconcilable without data loss (numeric up-widening and
    * nullability only — no string coercions that would mask real drift).
    */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (n: NumericType, m: NumericType) =>
      val order: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      (order.indexOf(n), order.indexOf(m)) match {
        case (i, j) if i >= 0 && j >= 0 => Some(order(math.max(i, j)))
        case _ => None // decimals etc.: require exact match
      }
    case _ => None
  }

  /** Union an ordered sequence of slices whose schemas may differ by added
    * columns and widened numeric types. Output schema = first slice's column
    * order plus later-added columns in first-seen order; every column takes
    * the widened type; missing columns read as typed NULLs. Fails loudly on
    * irreconcilable drift (same name, incompatible types) — the analog of
    * the reference failing a row bind rather than corrupting a column.
    */
  def unionEvolving(slices: Seq[DataFrame]): DataFrame = {
    require(slices.nonEmpty, "no slices")
    val fields = scala.collection.mutable.LinkedHashMap[String, DataType]()
    slices.foreach(_.schema.fields.foreach { f =>
      fields.get(f.name) match {
        case None => fields(f.name) = f.dataType
        case Some(t) =>
          fields(f.name) = widen(t, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"irreconcilable schema drift on '${f.name}': $t vs ${f.dataType}"))
      }
    })
    val target = fields.toSeq
    slices
      .map { df =>
        val have = df.schema.fieldNames.toSet
        df.select(target.map { case (name, t) =>
          if (have.contains(name)) col(name).cast(t).as(name)
          else lit(null).cast(t).as(name)
        }: _*)
      }
      .reduce(_.unionByName(_))
  }
}
