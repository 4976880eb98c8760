package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: demonstrates the SQL-registered kernels end-to-end, the way a
  * pure-SQL user of the library would call them.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark)
    GraftFunctions.register(spark)
    Tables.documents(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      .createOrReplaceTempView("docs")
    spark.sql(
      """SELECT count(DISTINCT simhash64(token_shingle_hashes(text, 1))) AS n_distinct_sigs,
        |       avg(size(minhash_signature(token_shingle_hashes(text, 3), 64))) AS sig_len
        |FROM docs""".stripMargin).show()
    spark.stop()
  }
}
