package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expressions.HashExprs
import graft.functions.TextFns

/** Dev tool: stage-by-stage timing of d02 minhashLsh as shipped (kernel
  * pipeline), to localize the sf0.1 bench hotspot.
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    println("docs: " + time("docs.count")(docs.count()))
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sigs = docs.select(
        col("doc_id").as("id"),
        HashExprs.minhashSignature(HashExprs.tokenShingleHashes(col("text"), 3), 64).as("sig"))
      time("signatures")(sigs.write.format("noop").mode("overwrite").save())
      val rep = sigs.repartition(col("id"))
        .withColumn("band", explode(TextFns.lshBands(col("sig"), 16, 4)))
      time("repart+bands")(rep.write.format("noop").mode("overwrite").save())
      val left = rep.select(col("id").as("a"), col("sig").as("sig_a"), col("band"))
      val right = rep.select(col("id").as("b"), col("sig").as("sig_b"), col("band"))
      val joined = left.join(right, Seq("band")).where(col("a") < col("b"))
      println("banded pairs: " + time("join.count")(joined.count()))
      val est = joined
        .select(col("a"), col("b"),
          HashExprs.arrayMatchFraction(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .groupBy(col("a"), col("b")).agg(max(col("est_jaccard")).as("est_jaccard"))
        .where(col("est_jaccard") >= 0.5)
      println("pairs: " + time("full d02")(est.count()))
      time("d02 as benched")(SparkEntry.queries("d02_dedup_minhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      time("t01 as benched")(SparkEntry.queries("t01_langid")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      time("t04 as benched")(SparkEntry.queries("t04_fingerprint")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
