package graft

import org.apache.spark.sql.functions._
import graft.expressions.{KmvBuffer, KmvSketch}

/** KMV distinct sketch (q63 / expressions/KmvSketch.scala). */
class KmvSketchSpec extends SparkSpec {

  test("mix matches the JDK SplittableRandom/splitmix64 reference values") {
    // reference values computed from the published splitmix64 algorithm
    // (Steele, Lea & Flood 2014) with seed = input, one next() step
    def ref(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(KmvSketch.mix(v) == ref(v))
    }
    // bijectivity smoke: no collisions over a contiguous input range
    val outs = (0L until 10000L).map(KmvSketch.mix).toSet
    assert(outs.size == 10000)
  }

  test("buffer keeps the k smallest in UNSIGNED order and evicts correctly") {
    val buf = new KmvBuffer(3)
    // -1L is the LARGEST unsigned value; 1,2,3 are small
    Seq(-1L, 3L, 1L, 2L).foreach(buf.insert)
    assert(buf.set.size() == 3)
    assert(!buf.set.contains(-1L), "signed comparison leaked into the sketch")
    buf.insert(0L) // new minimum evicts current max (3)
    assert(buf.set.contains(0L) && !buf.set.contains(3L))
    buf.insert(1L) // duplicate: no-op
    assert(buf.set.size() == 3)
  }

  test("below fill the sketch is exact; above fill the estimate tracks truth") {
    import spark.implicits._
    val k = 64
    val small = (1L to 20L).toDF("v")
      .select(KmvSketch.splitmix64(col("v")).as("h"))
      .agg(KmvSketch.kmvDistinct(col("h"), k).as("kmv"))
      .select(col("kmv.est"), col("kmv.kth")).head()
    assert(small.getLong(0) == 20L && small.isNullAt(1))

    val n = 5000L
    val big = (1L to n).toDF("v")
      .select(KmvSketch.splitmix64(col("v")).as("h"))
      .agg(KmvSketch.kmvDistinct(col("h"), k).as("kmv"))
      .select(col("kmv.est")).head().getLong(0)
    // KMV relative std error ~ 1/sqrt(k-2) ≈ 0.13; 4 sigma bound
    assert(math.abs(big - n) < n * 0.52, s"estimate $big too far from $n")
  }

  test("sketch output is invariant to partitioning (merge-tree independence)") {
    import spark.implicits._
    val data = (1L to 3000L).map(v => (v % 7, v)).toDF("g", "v")
      .select(col("g"), KmvSketch.splitmix64(col("v")).as("h"))
    def run(parts: Int): Map[Long, (Long, Long)] =
      data.repartition(parts)
        .groupBy("g").agg(KmvSketch.kmvDistinct(col("h"), 32).as("kmv"))
        .select(col("g"), col("kmv.est"), col("kmv.kth"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1 partition (no merge) vs 16 (serialize + partial merge tree):
    // identical k-min sets, identical estimates
    assert(run(1) == run(16))
  }

  test("state → merge equals the direct sketch (union-merge exactness)") {
    import spark.implicits._
    val k = 32
    val data = (1L to 4000L).map(v => (v % 10, v)).toDF("g", "v")
      .select(col("g"), KmvSketch.splitmix64(col("v")).as("h"))
      .repartition(8)
    val direct = data.agg(KmvSketch.kmvDistinct(col("h"), k).as("kmv"))
      .select(col("kmv.est"), col("kmv.kth")).head()
    val viaStates = data.groupBy("g").agg(KmvSketch.kmvState(col("h"), k).as("state"))
      .agg(KmvSketch.kmvMerge(col("state"), k).as("kmv"))
      .select(col("kmv.est"), col("kmv.kth")).head()
    assert(direct == viaStates,
      s"k-min(union) must equal k-min(union of k-mins): $direct vs $viaStates")
    // state shape: each group's state is its k smallest distinct hashes,
    // unsigned ascending, capped at k
    val states = data.groupBy("g").agg(KmvSketch.kmvState(col("h"), k).as("state"))
      .select(col("state")).collect().map(_.getSeq[Long](0))
    states.foreach { st =>
      assert(st.length <= k)
      assert(st.sliding(2).forall(p => p.length < 2 ||
        java.lang.Long.compareUnsigned(p(0), p(1)) < 0), "state not unsigned-sorted")
    }
  }

  test("q64 runs: union estimate equals direct estimate") {
    val r = SparkEntry.queries("q64_kmv_mergeable")(spark, sfDir).head()
    assert(r.getLong(r.fieldIndex("est_union")) == r.getLong(r.fieldIndex("est_direct")))
  }

  test("quantile sketch: below-fill exactness and merge-tree invariance") {
    // sf0.001 has ~200 events per type < k=256: the sample IS the data, so
    // sketch quantiles must equal the exact full-data quantiles. The exact
    // reference lives HERE, not in the shipped query (sketch-only output —
    // the exact branch is the per-class full sort the sketch replaces).
    val rows = SparkEntry.queries("q65_sketch_quantiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.events(spark, sfDir)
        .select(col("event_type"),
          KmvSketch.splitmix64(col("event_id")).as("h"),
          round(col("value") * lit(100)).cast("long").as("v_c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("v_c").asc, col("h").bitwiseXOR(lit(Long.MinValue)).asc)
      val wn = Window.partitionBy(col("event_type"))
      base.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === ceil(col("n") * lit(0.5)), col("v_c"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * lit(0.9)), col("v_c"))).as("p90"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    rows.foreach { r =>
      val (p50, p90) = exact(r.getString(r.fieldIndex("event_type")))
      assert(r.getLong(r.fieldIndex("p50_c")) == p50, r)
      assert(r.getLong(r.fieldIndex("p90_c")) == p90, r)
    }
    // above fill: identical output for 1 partition (no merge) vs 16
    import spark.implicits._
    val df = (1L to 5000L).map(v => (v % 3, v, (v * 37) % 1000)).toDF("g", "id", "v")
      .select(col("g"), KmvSketch.splitmix64(col("id")).as("h"), col("v"))
    def run(p: Int) = df.repartition(p).groupBy("g")
      .agg(KmvSketch.quantileSketch(col("h"), col("v"), 64).as("qs"))
      .select(col("g"), col("qs.n_sample"), col("qs.p50"), col("qs.p90"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(1) == run(16))
    // sample quantile tracks truth: p50 of 0..999-uniform within ±25%
    val p50 = run(16).head._3
    assert(p50 > 250 && p50 < 750, s"sample p50 $p50 implausible for uniform 0..999")
  }

  test("q63 runs on testdata: estimate equals exact below fill") {
    // sf0.001 has 15 users per event_type < k=64 — the sketch IS the
    // distinct set, so est must equal the exact countDistinct. The exact
    // reference lives HERE (sketch-only shipped output): at 100 TB the
    // countDistinct rider is the every-distinct-key shuffle the sketch
    // exists to avoid.
    val rows = SparkEntry.queries("q63_kmv_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val est = r.getLong(r.fieldIndex("est_users"))
      assert(est == exact(r.getString(r.fieldIndex("event_type"))),
        s"below-fill estimate must be exact: $r")
      assert(r.isNullAt(r.fieldIndex("kth_hash")))
    }
  }

  test("q69 intersection estimate equals the exact intersection below fill") {
    // sf0.001: ≤30 distinct users across both types < k=64 — the union
    // sketch is below fill, so est_intersection must equal the true
    // |click ∩ purchase| (the exact rider moved here from the shipped query)
    val r = SparkEntry.queries("q69_kmv_intersection")(spark, sfDir).head()
    val ev = Tables.events(spark, sfDir)
    val exact = ev.where(col("event_type") === "click").select(col("user_id")).distinct()
      .join(ev.where(col("event_type") === "purchase").select(col("user_id")).distinct(),
        Seq("user_id"))
      .count()
    assert(r.getLong(r.fieldIndex("est_intersection")) == exact,
      s"below-fill intersection estimate must be exact: $r vs $exact")
  }

  test("q64 merged estimate tracks the exact distinct count (accuracy, sf-gated)") {
    // the exact countDistinct rider moved here from the shipped query;
    // below fill (sf0.001: 150 users < k... 150 users ≥ 64 — above fill)
    // the KMV bound applies: relative error within 4σ ≈ 4/√(k−2)
    val r = SparkEntry.queries("q64_kmv_mergeable")(spark, sfDir).head()
    val est = r.getLong(r.fieldIndex("est_union"))
    val exact = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.52).toLong),
      s"estimate $est implausibly far from exact $exact")
  }
}
