package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Multi-table sync registry — the Spark analog of the reference's
  * ALL_TABLES map (main.py:46-99): every table the engine keeps in sync,
  * with its primary key and updated-at ordering. The reference spawns a
  * thread pool per table; here each table is one declarative merge plan and
  * the cluster schedules them (a driver loop can submit them concurrently —
  * Spark jobs from one session run in parallel).
  */
object Registry {

  /** (primary key columns, ordering columns) per syncable table. The
    * TPC-H-ish testdata stands in for the reference's Farcaster tables;
    * `events` is the one with real upsert churn (multiple rows per key).
    */
  val syncTables: Map[String, (Seq[String], Seq[String])] = Map(
    "events" -> (Seq("user_id"), Seq("ts_us", "event_id")),
    "orders" -> (Seq("o_orderkey"), Seq("o_orderdate", "o_orderkey")),
    "customer" -> (Seq("c_custkey"), Seq("c_custkey")),
    "supplier" -> (Seq("s_suppkey"), Seq("s_suppkey")),
    "lineitem" -> (Seq("l_orderkey", "l_linenumber"), Seq("l_shipdate", "l_orderkey")))

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    if (table == "events") Tables.events(spark, dir) else Tables.load(spark, dir, table)

  /** Current state of one registered table = latest-wins over its PK. */
  def currentState(spark: SparkSession, dir: String, table: String): DataFrame = {
    val (pk, ord) = syncTables(table)
    MergeOps.latestByKey(load(spark, dir, table), pk, ord)
  }

  /** Sync summary across every registered table (one job per table; a real
    * deployment would also write each state out through JdbcUpsertSink).
    */
  def syncAll(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    syncTables.keys.toSeq.sorted
      .map { t =>
        currentState(spark, dir, t)
          .agg(count(lit(1)).as("n_current"))
          .select(lit(t).as("table_name"), col("n_current"))
      }
      .reduce(_.unionByName(_))
  }
}
