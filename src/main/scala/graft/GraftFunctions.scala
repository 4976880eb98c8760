package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions._

/** SQL-surface registration of the codegen kernels, so pure-SQL users get
  * the same operators as the Scala API:
  *
  *   SELECT minhash_signature(token_shingle_hashes(text, 3), 64) FROM docs
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide injection at session build);
  *  - [[GraftFunctions.register]] for an existing session.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(s"$name must be a string literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity_ff" -> (es => CosineSimilarityFF(es(0), es(1))),
    "dot_product_ff" -> (es => DotProductFF(es(0), es(1))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intArg(es(1), "numHashes"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "token_shingle_hashes" -> (es => TokenShingleHashes(es(0), intArg(es(1), "k"))),
    "array_match_fraction" -> (es => ArrayMatchFraction(es(0), es(1))),
    "long_set_jaccard" -> (es => LongSetJaccard(es(0), es(1))),
    "json_long_field" -> (es => JsonKernels.JsonLongField(es(0), strArg(es(1), "key"))),
    "py_json_normalize" -> (es => PyJsonNormalize(es(0))),
    "winnow_fingerprint" -> (es =>
      TextKernels.WinnowFingerprint(es(0), intArg(es(1), "k"), intArg(es(2), "window"))),
    "splitmix64" -> (es => Splitmix64(es(0))),
    // aggregates: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression, exactly as for builtin aggs — SQL users get
    //   SELECT kmv_distinct(splitmix64(user_id), 64).est FROM events
    "kmv_distinct" -> (es => KmvDistinct(es(0), intArg(es(1), "k"))),
    "kmv_state" -> (es => KmvState(es(0), intArg(es(1), "k"))),
    "kmv_merge" -> (es => KmvMerge(es(0), intArg(es(1), "k"))),
    "quantile_sketch" -> (es => QuantileSketch(es(0), es(1), intArg(es(2), "k"))))

  /** Register every kernel as a temp function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — injects the SQL
  * kernels AND graft's planner strategies at session build, atomically.
  * (`TemporalJoins.asofJoinNative` also self-registers its strategy under a
  * lock for ad-hoc sessions, but build-time injection is the production
  * path.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
