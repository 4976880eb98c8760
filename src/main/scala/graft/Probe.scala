package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Dev tool: stage-by-stage timing of the minhash pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    time("docs.count")(docs.count())
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    time("tokens")(toks.write.format("noop").mode("overwrite").save())
    val sh = docs.select(col("doc_id"), TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val hashes = docs.select(col("doc_id"),
      TextFns.shingleHashes(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("h"))
    time("shingleHashes")(hashes.write.format("noop").mode("overwrite").save())
    val sig = docs.select(col("doc_id"),
      TextFns.minhashSignature(
        TextFns.shingleHashes(TextFns.shingles(TextFns.tokens(col("text")), 3)), 64).as("sig"))
    time("minhashSignature")(sig.write.format("noop").mode("overwrite").save())
    val sig2 = sig.repartition(col("doc_id"))
    val banded = sig2.withColumn("band", explode(TextFns.lshBands(col("sig"), 16, 4)))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val left = banded.select(col("doc_id").as("a"), col("sig").as("sig_a"), col("band"))
    val right = banded.select(col("doc_id").as("b"), col("sig").as("sig_b"), col("band"))
    val joined = left.join(right, Seq("band")).where(col("a") < col("b"))
    println("join rows: " + time("join.count")(joined.count()))
    val est = joined.select(col("a"), col("b"),
      TextFns.minhashJaccard(col("sig_a"), col("sig_b")).as("j"))
    time("est_jaccard")(est.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
