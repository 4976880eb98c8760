package graft

import org.apache.spark.sql.functions._
import graft.operators.{Registry, Skew}

class RegistrySkewSpec extends SparkSpec {
  import spark.implicits._

  test("registry syncAll reports current-state counts for every table") {
    val out = Registry.syncAll(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Registry.syncTables.keySet)
    assert(out("events") == Tables.events(spark, sfDir).select("user_id").distinct().count())
    assert(out("customer") == Tables.customer(spark, sfDir).count())
  }

  test("typed registry sync lands configured JSONB columns as structs") {
    val typed = Registry.currentStateTyped(spark, sfDir, "events")
    // the props column must be a STRUCT after sync, not a JSON string
    val propsField = typed.schema("props")
    assert(propsField.dataType.isInstanceOf[org.apache.spark.sql.types.StructType],
      s"props should land typed, got ${propsField.dataType}")
    // every current-state row parsed (strict JSON and Python-literal forms
    // both repair through py_json_normalize → from_json)
    val n = typed.count()
    assert(n == Tables.events(spark, sfDir).select("user_id").distinct().count())
    assert(typed.where(col("props.k").isNull).count() == 0, "no row may lose its payload")
    // unconfigured tables pass through currentStateTyped unchanged
    val cust = Registry.currentStateTyped(spark, sfDir, "customer")
    assert(cust.schema == Registry.currentState(spark, sfDir, "customer").schema)
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.events(spark, sfDir)
    val salted = Skew.saltedSumCount(ev, Seq("event_type"), "value", 8, Seq("event_id"))
      .select(col("event_type"), col("n_rows"), round(col("sum_value"), 2).as("s"))
      .as[(String, Long, Double)].collect().toSet
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), round(sum(col("value")), 2).as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("salted join equals plain join (including rows-per-pair multiplicity)") {
    val facts = Seq((1L, 10.0, 100L), (1L, 20.0, 101L), (1L, 30.0, 102L),
      (2L, 5.0, 103L), (3L, 7.0, 104L)).toDF("k", "v", "rid")
    val dim = Seq((1L, "one"), (2L, "two"), (9L, "nine")).toDF("k", "name")
    val salted = Skew.saltedJoin(facts, dim, "k", buckets = 4, saltSource = Seq("rid"))
      .select("k", "v", "rid", "name").as[(Long, Double, Long, String)].collect().sorted.toSeq
    val plain = facts.join(dim, Seq("k"))
      .select("k", "v", "rid", "name").as[(Long, Double, Long, String)].collect().sorted.toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("salt is deterministic and bounded") {
    val df = Seq(1L, 2L, 3L).toDF("id")
    val s1 = df.select(Skew.salt(8, col("id")).as("s")).as[Long].collect().toSeq
    val s2 = df.select(Skew.salt(8, col("id")).as("s")).as[Long].collect().toSeq
    assert(s1 == s2 && s1.forall(s => s >= 0 && s < 8))
  }

  test("empty incremental slice merges as a no-op (the reference's .empty files)") {
    val full = Seq((1L, 10L, "a")).toDF("k", "ts", "v")
    val empty = full.where(lit(false))
    val merged = graft.operators.MergeOps.snapshotMerge(full, empty, Seq("k"), Seq("ts"))
    assert(merged.as[(Long, Long, String)].collect().toSeq == Seq((1L, 10L, "a")))
  }
}
