package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BandLsh, Dedup}

/** R18 optimization instrument: decompose the heavy operators' wall time
  * into their pipeline stages (guide §1 — measure first, isolate with the
  * noop sink). Each stage is timed as min over `passes` noop-sink runs at
  * `SPARK_GRAFT_SF_DIR`, after one untimed warmup, in one JVM — the same
  * methodology as Bench, restricted to sub-plans.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.OptProbe d07"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prep(spark)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt

    def time(name: String)(mk: => DataFrame): Unit = {
      // construction is INSIDE the timed region (Bench's methodology):
      // eager-checkpoint operators (pageRank, connectedComponents) do
      // their work while the plan is being built
      mk.write.format("noop").mode("overwrite").save() // warmup (codegen/JIT)
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s min=${ts.min}%.3f med=${ts.sorted.apply(ts.length / 2)}%.3f")
    }

    val which = if (args.isEmpty) "d07" else args(0)
    which match {
      case "d07" =>
        val emb = Tables.embeddings(spark, sfDir)
        // stage 1: signature scan alone (no barrier)
        time("sigs") {
          emb.select(col("vec_id").as("id"),
            graft.operators.Similarity.hyperplaneSig(col("embedding"), 64, 64).as("sig"))
        }
        // stage 2: banded (sig + barrier + explode)
        time("banded(barrier)") {
          BandLsh.banded(emb, "vec_id", "embedding", "id", "_sig", 64, 2, 32, barrier = true)
        }
        // stage 3: candidate pairs (band self-join + first-band filter)
        time("candidates") {
          Dedup.hyperplaneCandidates(emb, "vec_id", "embedding", 64, 2, 32)
        }
        // stage 4: full d07 (candidates + exact cosine re-rank)
        time("full d07") {
          Dedup.embeddingNearDupBucketed(emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
        }
        // stage 5: d06 = d07 + connected components
        time("full d06") {
          val pairs = Dedup.embeddingNearDupBucketed(emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
          Dedup.connectedComponents(pairs, "a", "b")
        }
      case "q52" =>
        time("q52 pagerank") {
          SparkEntry.queries("q52_pagerank")(spark, sfDir)
        }
      case "one" =>
        // time any single declared query: OptProbe one <name>
        val n = args(1)
        time(n) { SparkEntry.queries(n)(spark, sfDir) }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
