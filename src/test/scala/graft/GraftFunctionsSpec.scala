package graft

class GraftFunctionsSpec extends SparkSpec {

  test("kernels are callable from pure SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_similarity_ff(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                       array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |  size(minhash_signature(token_shingle_hashes('a b c d e', 3), 64)) AS sig_len,
        |  simhash64(token_shingle_hashes('hello world', 1)) AS sh,
        |  array_match_fraction(array(1L, 2L, 3L, 4L), array(1L, 2L, 9L, 4L)) AS mf,
        |  long_set_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
        |""".stripMargin).collect().head
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Int]("sig_len") == 64)
    assert(r.getAs[Double]("mf") == 0.75)
    assert(r.getAs[Double]("j") == 0.5)
  }

  test("SQL and Scala-API kernels agree on the documents table") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_v")
    val sqlOut = spark.sql(
      "SELECT doc_id, simhash64(token_shingle_hashes(text, 1)) AS sh FROM docs_v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val apiOut = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.expressions.HashExprs.simhash64(
          graft.expressions.HashExprs.tokenShingleHashes(
            org.apache.spark.sql.functions.col("text"), 1)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlOut == apiOut)
  }
}
