package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Corpus-balancing operators: deterministic selection (the property that
  * makes a 100 TB sampling job resumable) and bounded per-group shuffles.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample is deterministic and hits per-stratum rates") {
    val d = Tables.documents(spark, sfDir)
    def run() = Sampling.stratifiedSample(d, col("lang"), col("doc_id"),
      Map("en" -> 30), defaultPercent = 100)
      .select("doc_id").as[Long].collect().toSet
    val a = run(); val b = run()
    assert(a == b, "re-running the sample must select the same rows")
    val byLang = d.where(col("doc_id").isInCollection(a))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    // non-en strata are untouched; en is cut to ~30% (sequential ids → the
    // mod selector is exact up to the id range's remainder)
    for ((l, n) <- total if l != "en") assert(byLang(l) == n, s"stratum $l must be kept whole")
    val enRate = byLang("en").toDouble / total("en")
    assert(enRate > 0.2 && enRate < 0.4, s"en rate $enRate")
  }

  test("capPerGroup keeps the first k per group, deterministically") {
    val df = Seq(
      ("s1", 5L), ("s1", 1L), ("s1", 3L), ("s1", 2L),
      ("s2", 9L), ("s2", 8L)
    ).toDF("src", "id")
    val out = Sampling.capPerGroup(df, Seq(col("src")), Seq(col("id").asc), 2)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("s1", 1L), ("s1", 2L), ("s2", 8L), ("s2", 9L)))
  }

  test("t07 plan: the window limit runs before the exchange (WindowGroupLimit)") {
    val df = SparkEntry.queries("t07_cap_per_source")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "row_number<=k must hit the WindowGroupLimit rewrite:\n" + p)
  }

  test("packSequences: greedy fill by first-token position, per group") {
    import org.apache.spark.sql.functions.col
    // budget 10; source a docs of 4,4,4,4 tokens → prefix starts 0,4,8,12
    // → packs 0,0,0,1; source b: 12,5 → starts 0,12 → packs 0,1 (oversize
    // doc overflows its own pack — the trainer's truncate/wrap case)
    val docs = Seq(
      (1L, "a", 4L), (2L, "a", 4L), (3L, "a", 4L), (4L, "a", 4L),
      (10L, "b", 12L), (11L, "b", 5L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.packSequences(docs, "source", "doc_id", "n_tokens", budget = 10L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 10L -> 0L, 11L -> 1L))
    // packs are contiguous doc ranges and pack overflow is bounded by one
    // document: pack_tokens < budget + that pack's largest doc
    val packs = Sampling.packSequences(docs, "source", "doc_id", "n_tokens", budget = 10L)
      .groupBy(col("source"), col("pack_id"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("t"),
        org.apache.spark.sql.functions.max(col("n_tokens")).as("m"))
      .as[(String, Long, Long, Long)].collect()
    packs.foreach { case (src, pid, t, m) =>
      assert(t < 10L + m, s"pack $src/$pid overflows by more than one doc: $t tokens")
    }
  }
}
