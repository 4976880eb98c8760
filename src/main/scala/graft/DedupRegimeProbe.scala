package graft

import org.apache.spark.sql.SparkSession

/** Keep-dominated-regime probe for the production-k SemDeDup pair
  * (d14 stand-in quantizer vs d15 Lloyd-trained): the cell-local prune's
  * cost model is two-sided — REMOVED vectors short-circuit at their first
  * lower-id match (the left-semi rewrite), KEPT vectors must probe their
  * whole cell to prove no match exists, so prune work ≈ Σ_kept |cell| and
  * its worst case is Σ|cell|². The bench corpus is replica-dense (~98%
  * removed at eps 0.35 by sf10+), which hides quantizer imbalance almost
  * entirely: d14's sf100 magnet cell (1.23M of 2M vectors under lowest-id
  * init) costs nearly nothing there because its members are duplicates
  * that exit at probe one. A 100 TB curation corpus is the OPPOSITE
  * regime — most documents survive — so this probe grades the quantizers
  * where kept vectors dominate: eps above any attainable cosine (2.0)
  * makes EVERY vector a kept vector and the prune cost exactly the
  * cell-size profile the quantizer produced.
  *
  * Prints one JSON line with per-variant wall seconds (min over passes).
  * Exit 0 always — this is an instrument, not a gate; readings land in
  * the round's BENCH notes.
  *
  * Usage: runMain graft.DedupRegimeProbe <sfDir> [eps] [passes] [variantsCsv]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS
  */
object DedupRegimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val eps = if (args.length > 1) args(1).toDouble else 2.0
    val passes = if (args.length > 2) args(2).toInt else 3
    val variants =
      if (args.length > 3) args(3).split(',').toSeq else Seq("d14", "d15")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Bench's session climate (the sf10 OOM lesson: probes that run
      // bench-family plans must match the bench's broadcast threshold)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prep(spark)
    val emb = Tables.embeddings(spark, sfDir)
    def run(variant: String): Long = variant match {
      case "d14" => operators.Dedup
        .semanticDedupScaled(emb, "vec_id", "embedding", eps = eps)
        .write.format("noop").mode("overwrite").save(); 0L
      case "d15" => operators.Dedup
        .semanticDedupLloyd(emb, "vec_id", "embedding", eps = eps)
        .write.format("noop").mode("overwrite").save(); 0L
      case other => sys.error(s"unknown variant '$other' (d14|d15)")
    }
    val mins = variants.map { v =>
      val ts = (1 to passes).map { p =>
        val t0 = System.nanoTime()
        run(v)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[regime-probe] pass$p $v $dt%.2fs")
        dt
      }
      v -> ts.min
    }
    spark.stop()
    val qs = mins.map { case (v, t) => f""""$v":$t%.3f""" }.mkString(",")
    println(s"""{"metric":"dedup_regime_probe","sf":"$sfDir","eps":$eps,""" +
      s""""passes":$passes,"queries":{$qs}}""")
  }
}
