package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated testdata tables.
  *
  * The reference engine's scan layer (neynar_parquet_importer/s3.py — chunked
  * parallel S3 download + pyarrow row-group iteration) is re-expressed as
  * Spark's distributed parquet scan: on a real cluster `spark.read.parquet`
  * already does parallel ranged reads from object storage, with predicate
  * pushdown and column pruning that the reference lacks entirely.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it as a
      // long (epoch nanos) behind this flag. Set lazily so callers with a
      // driver-owned session still work.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts_us` (epoch microseconds) added — the cross-engine-safe
    * timestamp representation (DuckDB oracle uses epoch_us(ts)).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events").withColumn("ts_us", expr("ts div 1000"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
