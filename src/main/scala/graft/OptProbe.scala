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
      case "sum128" =>
        val base = spark.range(0, 10000000).select(
          (col("id") % 32).as("g"), (col("id") * 3 - 5000000L).as("x"))
          .localCheckpoint(true)
        time("sum(long)") { base.groupBy(col("g")).agg(sum(col("x"))) }
        time("sum(decimal38)") { base.groupBy(col("g")).agg(sum(col("x").cast("decimal(38,0)"))) }
        time("sum128") {
          base.groupBy(col("g")).agg(
            org.apache.spark.sql.graft.ColumnBridge.column(
              graft.expressions.Sum128(
                org.apache.spark.sql.graft.ColumnBridge.expression(col("x")))
                .toAggregateExpression()))
        }
      case "sum128b" =>
        // q74-shaped child: double round + cast arithmetic per row
        val base = spark.range(0, 10000000).select(
          (col("id") % 32).as("g"),
          (col("id") % 1000).cast("double").divide(7.0).as("p"),
          (col("id") % 97).cast("double").divide(100.0).as("d"))
          .localCheckpoint(true)
        val term = (round(col("p") * 100).cast("long")) * (lit(100L) - round(col("d") * 100).cast("long"))
        time("sum(decimal38) q74-term") { base.groupBy(col("g")).agg(sum(term.cast("decimal(38,0)"))) }
        time("sum128 q74-term") {
          base.groupBy(col("g")).agg(
            org.apache.spark.sql.graft.ColumnBridge.column(
              graft.expressions.Sum128(
                org.apache.spark.sql.graft.ColumnBridge.expression(term.cast("long")))
                .toAggregateExpression()))
        }
      case "cgmini" =>
        val base = spark.range(0, 1000).select((col("id") % 8).as("g"), col("id").as("x"))
        val s128 = base.groupBy(col("g")).agg(
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("x")))
              .toAggregateExpression()))
        s128.write.format("noop").mode("overwrite").save()
        println("=== sum128 mini ===")
        org.apache.spark.sql.execution.debug.DebugQuery(s128).debugCodegen()
        val sdec = base.groupBy(col("g")).agg(sum(col("x").cast("decimal(38,0)")))
        sdec.write.format("noop").mode("overwrite").save()
        println("=== decimal mini ===")
        org.apache.spark.sql.execution.debug.DebugQuery(sdec).debugCodegen()
      case "rank" =>
        // decompose t14's rankInClass: how much is the range-partition
        // sort alone vs the mapPartitions external-Row running-rank hop?
        val docs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text"))
        val p = spark.sessionState.conf.numShufflePartitions
        time("ranged sort only") {
          docs.repartitionByRange(p, col("source").asc, col("doc_id").asc, col("doc_id").asc)
            .sortWithinPartitions(col("source").asc, col("doc_id").asc, col("doc_id").asc)
        }
        time("rankInClass (sort + mapPartitions + offsets)") {
          graft.operators.Binning.rankInClass(docs, "source", "doc_id", "doc_id")
        }
      case "round" =>
        val base = spark.range(0, 20000000).select(
          (col("id") % 100000).cast("double").divide(7.0).as("x"))
          .localCheckpoint(true)
        time("round(x*100) [BigDecimal]") {
          base.agg(sum(round(col("x") * 100).cast("long")))
        }
        time("floor(x*100+0.5) [double]") {
          base.agg(sum(floor(col("x") * 100 + lit(0.5d)).cast("long")))
        }
      case "codegen" =>
        // print the executed plan with codegen spans + generated-code sizes
        val df = SparkEntry.queries(args(1))(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
        org.apache.spark.sql.execution.debug.DebugQuery(df).debugCodegen()
      case "one" =>
        // time any single declared query: OptProbe one <name>
        val n = args(1)
        time(n) { SparkEntry.queries(n)(spark, sfDir) }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
