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

  /** Per-table JSONB cleaning config — the analog of the reference's
    * JSON_COLUMNS list (db.py:45-51) consumed by clean_jsonb_data
    * (db.py:261-282). The reference keeps one GLOBAL column-name list and
    * its own TODO says "this should be a dict of table names to column
    * names"; here it is that dict, and each column also carries the struct
    * schema (as DDL) its cleaned JSON parses into, so a synced table lands
    * with typed columns instead of raw JSON strings.
    */
  val jsonColumns: Map[String, Map[String, String]] = Map(
    "events" -> Map("props" -> "k BIGINT"))

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    if (table == "events") Tables.events(spark, dir) else Tables.load(spark, dir, table)

  /** Current state of one registered table = latest-wins over its PK. */
  def currentState(spark: SparkSession, dir: String, table: String): DataFrame = {
    val (pk, ord) = syncTables(table)
    MergeOps.latestByKey(load(spark, dir, table), pk, ord)
  }

  /** Current state with the table's configured JSONB columns landed as
    * TYPED structs: py_json_normalize repairs Python-literal payloads (the
    * literal_eval branch of clean_jsonb_data), then from_json parses into
    * the declared schema. Both are scan-stage expressions — no shuffle
    * beyond the latest-wins merge itself.
    */
  def currentStateTyped(spark: SparkSession, dir: String, table: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types.StructType
    jsonColumns.getOrElse(table, Map.empty).foldLeft(currentState(spark, dir, table)) {
      case (df, (c, ddl)) =>
        df.withColumn(c,
          from_json(graft.expressions.PyLiteralJson.pyJsonNormalize(col(c)), StructType.fromDDL(ddl)))
    }
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

  /** Settings-driven sync: only the configured TABLES subset, each with its
    * configured row filter applied BEFORE the latest-wins merge — the
    * filter-then-import order of the reference (filters prune rows as
    * files land, so the merge never sees excluded keys), and scan-stage
    * predicates here, so they push down to parquet.
    */
  def syncConfigured(
      spark: SparkSession,
      dir: String,
      settings: graft.GraftSettings,
      filters: Map[String, org.apache.spark.sql.Column] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    val names = settings.registrySyncTables.keys.toSeq.sorted
    require(names.nonEmpty, s"no configured table is registered: ${settings.tables.mkString(",")}")
    names
      .map { t =>
        val (pk, ord) = syncTables(t)
        val in = filters.get(t).fold(load(spark, dir, t))(load(spark, dir, t).where(_))
        MergeOps.latestByKey(in, pk, ord)
          .agg(count(lit(1)).as("n_current"))
          .select(lit(t).as("table_name"), col("n_current"))
      }
      .reduce(_.unionByName(_))
  }
}
