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

  test("latestByKey on events matches groupBy count invariant") {
    val ev = Tables.events(spark, sfDir)
    val merged = MergeOps.latestByKey(ev, Seq("user_id"), Seq("ts_us", "event_id"))
    assert(merged.count() == ev.select("user_id").distinct().count())
  }
}
