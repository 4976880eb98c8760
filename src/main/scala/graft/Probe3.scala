package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: A/B the asof-join payload carry (per-column last vs struct last). */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val probe = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      pmod(col("o_custkey"), lit(100)).as("uid"),
      (lit(1704067200000000L) +
        pmod(unix_millis(col("o_orderdate").cast("timestamp")), lit(2592000000L)) * 1000L).as("t_us"))
    val build = Tables.events(spark, sfDir).select(
      col("user_id").as("uid"), col("ts_us").as("t_us"), col("event_id"), col("value"))

    val w = Window.partitionBy(col("uid"))
      .orderBy(col("t_us").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // variant A: per-column last (round-1 shape)
      val bA = build.select(col("uid"), col("t_us"), lit(0).as("_side"),
        col("event_id"), col("value"), lit(null).cast("long").as("o_orderkey"))
      val pA = probe.select(col("uid"), col("t_us"), lit(1).as("_side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"), col("o_orderkey"))
      val vA = bA.unionByName(pA).select(col("uid"), col("t_us"), col("_side"), col("o_orderkey"),
        last(col("event_id"), ignoreNulls = true).over(w).as("asof_event_id"),
        last(col("value"), ignoreNulls = true).over(w).as("asof_value"))
        .where(col("_side") === 1).drop("_side")
      time("A per-column last")(vA.write.format("noop").mode("overwrite").save())

      // variant B: struct last (current shape)
      val st = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      val bB = build.select(col("uid"), col("t_us"), lit(0).as("_side"),
        struct(col("event_id"), col("value")).as("_bp"),
        lit(null).cast("long").as("o_orderkey"))
      val pB = probe.select(col("uid"), col("t_us"), lit(1).as("_side"),
        lit(null).cast(st).as("_bp"), col("o_orderkey"))
      val vB = bB.unionByName(pB)
        .withColumn("_asof", last(col("_bp"), ignoreNulls = true).over(w))
        .where(col("_side") === 1)
        .select(col("uid"), col("t_us"), col("o_orderkey"),
          col("_asof.event_id").as("asof_event_id"), col("_asof.value").as("asof_value"))
      time("B struct last")(vB.write.format("noop").mode("overwrite").save())

      // variant C: struct last, single window evaluation via named column
      time("C shipped asofJoin")(SparkEntry.queries("q21_asof_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
