package graft

import org.apache.spark.sql.functions.{col, get_json_object}

class JsonKernelSpec extends SparkSpec {
  import spark.implicits._

  test("jsonLongField matches CAST(get_json_object(..) AS BIGINT) row for row") {
    val inputs = Seq(
      """{"k": 69}""", """{"k":-7}""", """{ "k" : 123 }""", """{"k": "42"}""",
      """{"j": 1, "k": 2}""", """{"k": 1, "j": 2}""", """{"j": 5}""",
      """{"k": 1.5}""", """{"k": -2.75}""", """{"k": "3.5"}""", """{"k": 1e3}""",
      """{"k": "xyz"}""", """{"k": null}""", """{"k": true}""",
      """{"other": "k", "k": 9}""", """{"note": "the \"k\" char", "k": 3}""",
      """{"nested": {"k": 99}}""", """{"nested": {"k": 99}, "k": 1}""",
      """{"arr": [1,2], "k": 4}""", """{}""", """""", """not json""",
      """{"k": 9223372036854775}""", """{"kk": 5}""", """{"k": 5x}"""
    ).toDF("js")
    val rows = inputs.select(
      graft.expressions.JsonKernels.jsonLongField(col("js"), "k").as("kernel"),
      get_json_object(col("js"), "$.k").cast("long").as("builtin")
    ).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"row $i: kernel=${r.get(0)} builtin=${r.get(1)}")
    }
  }

  test("jsonLongField agrees with the builtin across the whole events table") {
    val ev = Tables.events(spark, sfDir)
    val diff = ev.select(
      graft.expressions.JsonKernels.jsonLongField(col("props"), "k").as("a"),
      get_json_object(col("props"), "$.k").cast("long").as("b"))
      .where(!(col("a") <=> col("b")))
    assert(diff.count() == 0)
  }
}

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
    val r2 = spark.sql(
      """SELECT json_long_field('{"k": 42, "j": 1}', 'k') AS k,
        |       size(winnow_fingerprint('some long enough document text here', 8, 4)) AS nfp
        |""".stripMargin).collect().head
    assert(r2.getAs[Long]("k") == 42L)
    assert(r2.getAs[Int]("nfp") > 0)
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

  test("sketch aggregates are callable from pure SQL and match the Scala API") {
    import org.apache.spark.sql.functions._
    import graft.expressions.KmvSketch
    GraftFunctions.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("events_v")
    val sqlOut = spark.sql(
      """SELECT event_type, kmv_distinct(splitmix64(user_id), 64).est AS est
        |FROM events_v GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val apiOut = Tables.events(spark, sfDir)
      .select(col("event_type"), KmvSketch.splitmix64(col("user_id")).as("h"))
      .groupBy("event_type").agg(KmvSketch.kmvDistinct(col("h"), 64).as("kmv"))
      .select(col("event_type"), col("kmv.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlOut == apiOut && sqlOut.nonEmpty)
    // quantile sketch + two-level state/merge from SQL
    val q = spark.sql(
      """SELECT kmv_merge(state, 64).est AS est FROM (
        |  SELECT event_type, kmv_state(splitmix64(user_id), 64) AS state
        |  FROM events_v GROUP BY event_type)""".stripMargin).head().getLong(0)
    val direct = spark.sql(
      "SELECT kmv_distinct(splitmix64(user_id), 64).est FROM events_v").head().getLong(0)
    assert(q == direct)
    val qs = spark.sql(
      """SELECT event_type, quantile_sketch(splitmix64(event_id),
        |         CAST(round(value * 100) AS BIGINT), 256).p50 AS p50
        |FROM events_v GROUP BY event_type""".stripMargin).collect()
    assert(qs.nonEmpty && qs.forall(!_.isNullAt(1)))
  }
}
