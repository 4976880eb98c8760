package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: d02/d04 under exact Bench session configs, timed repeatedly,
  * with the executed (adaptive-final) plan of the hot stage printed.
  */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // mimic suite order: warm small, then repeat at target SF
    for (q <- Seq("d02_dedup_minhash", "d04_ngram_jaccard")) {
      time(s"$q warm@0.001")(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save())
      for (i <- 1 to 4) {
        time(s"$q r$i")(SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
    }
    val df = SparkEntry.queries("d02_dedup_minhash")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Reused"))
      .mkString("\n"))
    spark.stop()
  }
}
