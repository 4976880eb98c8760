package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool: reproduce the suite-context d04 slowdown, with per-stage wall
  * times from a listener to localize which stage eats the time.
  */
object Probe5 {
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

    val stages = mutable.Buffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.take(60), wall, si.numTasks))
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def run(q: String, label: String): Unit =
      time(label)(SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save())

    // suite-ish prefix
    for (q <- Seq("d01_dedup_exact", "d02_dedup_minhash", "d03_dedup_simhash")) run(q, q)
    stages.clear()
    run("d04_ngram_jaccard", "d04 (suite ctx) r1")
    val slow = stages.sortBy(-_._3).take(8)
    slow.foreach { case (id, name, wall, n) => println(f"  stage $id%4d $wall%7dms tasks=$n $name") }
    stages.clear()
    run("d04_ngram_jaccard", "d04 (suite ctx) r2")
    stages.sortBy(-_._3).take(8).foreach { case (id, name, wall, n) =>
      println(f"  stage $id%4d $wall%7dms tasks=$n $name")
    }
    spark.stop()
  }
}
