package graft

import org.apache.spark.sql.functions._
import graft.operators.MergeOps

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps the row with the max ordering tuple per key") {
    val df = Seq(
      (1L, 10L, 100L, "a"),
      (1L, 20L, 101L, "b"),
      (1L, 20L, 99L, "c"), // same ts, lower id -> loses
      (2L, 5L, 50L, "d")
    ).toDF("k", "ts", "id", "v")
    val out = MergeOps.latestByKey(df, Seq("k"), Seq("ts", "id"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq((1L, "b"), (2L, "d")))
    assert(out.head.schema.fieldNames.toSeq == Seq("k", "ts", "id", "v"))
  }

  test("snapshotMerge: incremental wins ties, full survives otherwise") {
    val full = Seq((1L, 10L, "full-v"), (2L, 10L, "full-keep")).toDF("k", "ts", "v")
    val inc = Seq((1L, 10L, "inc-v")).toDF("k", "ts", "v") // exact ts tie with full
    val out = MergeOps.snapshotMerge(full, inc, Seq("k"), Seq("ts"))
      .orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 10L, "inc-v"), (2L, 10L, "full-keep")))
  }

  test("scd2Intervals: abutting validity windows, newest version current") {
    val df = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"), (1L, 30L, 102L, "v3"),
      (2L, 5L, 50L, "only")
    ).toDF("k", "ts", "id", "v")
    val out = MergeOps.scd2Intervals(df, Seq("k"), "ts", Seq("id"))
      .orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSeq
    assert(out == Seq(
      (1L, "v1", 10L, 20L, false), (1L, "v2", 20L, 30L, false), (1L, "v3", 30L, -1L, true),
      (2L, "only", 5L, -1L, true)))
    // exactly one current row per key; the current row is the SCD1 winner
    val cur = MergeOps.scd2Intervals(df, Seq("k"), "ts", Seq("id")).where(col("is_current"))
    val scd1 = MergeOps.latestByKey(df, Seq("k"), Seq("ts", "id"))
    assert(cur.select("k", "v").collect().toSet == scd1.select("k", "v").collect().toSet)
  }

  test("latestByKey on events matches groupBy count invariant") {
    val ev = Tables.events(spark, sfDir)
    val merged = MergeOps.latestByKey(ev, Seq("user_id"), Seq("ts_us", "event_id"))
    assert(merged.count() == ev.select("user_id").distinct().count())
  }

  test("foldAggState: slice-by-slice fold equals from-scratch aggregation") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("ts_us"))
    val cut1 = 1703000000000000L; val cut2 = 1704000000000000L
    val slices = Seq(
      ev.where(col("ts_us") < cut1),
      ev.where(col("ts_us") >= cut1 && col("ts_us") < cut2),
      ev.where(col("ts_us") >= cut2))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "event_type STRING, n_rows BIGINT, sum_value DOUBLE"))
    val folded = slices.foldLeft(empty)((st, sl) =>
      MergeOps.foldAggState(st, sl, Seq("event_type"), Seq("value")))
    val full = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("n_rows"), round(col("sum_value"), 6))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(norm(folded) == norm(full))
  }

  test("unionEvolving aligns drifted slices by name, widens, fails loudly") {
    import graft.operators.SchemaEvolution
    val old = Seq((1, "a")).toDF("k", "v") // k: int
    val wide = Seq((2L, "b", 0.5)).toDF("k", "v", "score") // k: long, +score
    val out = SchemaEvolution.unionEvolving(Seq(old, wide)).orderBy("k")
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("k", "bigint"), ("v", "string"), ("score", "double")))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq
    assert(rows(0) == (1L, "a", Double.NaN) || rows(0)._3.isNaN)
    assert(rows(1) == (2L, "b", 0.5))
    // same name, irreconcilable types → loud failure, not silent coercion
    val bad = Seq(("x", 1)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      SchemaEvolution.unionEvolving(Seq(old, bad))
    }
    ()
  }
}
