package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: newest build row at or before each probe time, else null") {
    val build = Seq((1L, 10L, 100L, 1.0), (1L, 20L, 200L, 2.0), (2L, 50L, 500L, 5.0))
      .toDF("k", "t", "event_id", "value")
    val probe = Seq((1L, 5L, 901L), (1L, 10L, 902L), (1L, 15L, 903L), (1L, 25L, 904L), (2L, 49L, 905L))
      .toDF("k", "t", "pid")
    val out = TemporalJoins.asofJoin(build, probe, "k", "t", Seq("event_id", "value"), Seq("pid"))
      .select(col("pid"), col("asof_event_id"), col("asof_value"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(901L -> -1L, 902L -> 100L, 903L -> 100L, 904L -> 200L, 905L -> -1L))
  }

  test("asofJoin takes the matched build row wholesale — NULL payload fields stay NULL") {
    // newest preceding build row (t=20) has a NULL value: ASOF must carry
    // (200, NULL), not resurrect 1.0 from the older t=10 row
    val build = Seq((1L, 10L, Some(100L), Some(1.0)), (1L, 20L, Some(200L), None))
      .toDF("k", "t", "event_id", "value")
    val probe = Seq((1L, 25L, 901L)).toDF("k", "t", "pid")
    val r = TemporalJoins.asofJoin(build, probe, "k", "t", Seq("event_id", "value"), Seq("pid"))
      .select(col("asof_event_id"), col("asof_value")).collect().head
    assert(r.getLong(0) == 200L && r.isNullAt(1))
  }

  test("asofJoin output cardinality equals probe cardinality") {
    val out = SparkEntry.queries("q21_asof_join")(spark, sfDir)
    assert(out.count() == Tables.orders(spark, sfDir).count())
  }

  test("native asof operator matches the window composition exactly") {
    val build = Seq((1L, 10L, 100L, 1.0), (1L, 20L, 200L, 2.0), (2L, 50L, 500L, 5.0))
      .toDF("k", "t", "event_id", "value")
    val probe = Seq((1L, 5L, 901L), (1L, 10L, 902L), (1L, 15L, 903L), (1L, 25L, 904L), (2L, 49L, 905L))
      .toDF("k", "t", "pid")
    val native = TemporalJoins.asofJoinNative(build, probe, "k", "t", Seq("event_id", "value"), Seq("pid"))
      .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(native == Map(901L -> -1L, 902L -> 100L, 903L -> 100L, 904L -> 200L, 905L -> -1L))

    // full-table cross-check against the composition
    val p2 = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      pmod(col("o_custkey"), lit(100)).as("uid"),
      (lit(1704067200000000L) +
        pmod(unix_millis(col("o_orderdate").cast("timestamp")), lit(2592000000L)) * 1000L).as("t_us"))
    val b2 = Tables.events(spark, sfDir).select(
      col("user_id").as("uid"), col("ts_us").as("t_us"), col("event_id"), col("value"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey", "asof_event_id", "asof_value").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    val viaWindow = rows(TemporalJoins.asofJoin(b2, p2, "uid", "t_us", Seq("event_id", "value"), Seq("o_orderkey")))
    val viaNative = rows(TemporalJoins.asofJoinNative(b2, p2, "uid", "t_us", Seq("event_id", "value"), Seq("o_orderkey")))
    assert(viaNative == viaWindow)
  }

  test("native asof with string keys: retained match key survives build-buffer reuse") {
    // regression: matchKey used to alias bKeyProj's reused buffer, so a
    // UTF8String key saved for probe "a" silently mutated into "b" when the
    // build cursor advanced — the hit-check then compared the wrong key.
    // Needs >1 distinct string key per partition and a probe that arrives
    // after the cursor moved past its key.
    val build = Seq(("a", 10L, 1L), ("b", 10L, 2L), ("c", 10L, 3L))
      .toDF("k", "t", "event_id").coalesce(1)
    val probe = Seq(("a", 20L, 901L), ("b", 20L, 902L), ("c", 20L, 903L), ("d", 20L, 904L))
      .toDF("k", "t", "pid").coalesce(1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "asof_event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expected = Map(901L -> 1L, 902L -> 2L, 903L -> 3L, 904L -> -1L)
    assert(rows(TemporalJoins.asofJoinNative(build, probe, "k", "t", Seq("event_id"), Seq("pid"))) == expected)
    assert(rows(TemporalJoins.asofJoin(build, probe, "k", "t", Seq("event_id"), Seq("pid"))) == expected)
  }

  test("native asof with null probe key or time keeps the row with null payload") {
    val build = Seq((Some(1L), Some(10L), 100L)).toDF("k", "t", "event_id")
    val probe = Seq(
      (Some(1L), Some(15L), 901L),  // normal hit
      (Some(1L), None, 902L),       // null time: unknown, no match, row kept
      (None, Some(15L), 903L))      // null key: no match, row kept
      .toDF("k", "t", "pid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "asof_event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expected = Map(901L -> 100L, 902L -> -1L, 903L -> -1L)
    assert(rows(TemporalJoins.asofJoinNative(build, probe, "k", "t", Seq("event_id"), Seq("pid"))) == expected)
    assert(rows(TemporalJoins.asofJoin(build, probe, "k", "t", Seq("event_id"), Seq("pid"))) == expected)
  }

  test("native asof plan co-partitions both sides (shuffle exchanges, no pair join)") {
    val df = SparkEntry.queries("q28_asof_native")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("rangeJoin broadcasts the ranges side") {
    val df = SparkEntry.queries("q22_range_join")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }
}
