package graft

import org.apache.spark.sql.functions._
import graft.expressions.MoneyRound

/** RoundScaledLong ≡ round(x * factor).cast("long") — the bit-exactness
  * contract the money-scan kernel rests on. The fast/slow split is an
  * internal detail; equality must hold for EVERY input, so the fuzz set
  * plants values on both sides of every boundary the kernel reasons
  * about: rounding ties k.5 and near-ties at ±1ulp/±1e-6/±1e-4 (inside
  * and outside the delegation band), negatives (HALF_UP is away from
  * zero), magnitudes past the 1e8 fast-region cutoff, 2^52-adjacent
  * integers, NaN/±Inf, and plain money-shaped 2-decimal values.
  */
class MoneyRoundSpec extends SparkSpec {

  private def check(xs: Seq[java.lang.Double], factor: Long): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(xs.map(org.apache.spark.sql.Row(_)): _*), schema)
    val got = df.select(MoneyRound.scaledLong(col("x"), factor).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val want = df.select(round(col("x") * lit(factor)).cast("long").as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    got.zip(want).zip(xs).foreach { case ((g, w), x) =>
      assert(g == w, s"x=$x factor=$factor kernel=$g builtin=$w")
    }
  }

  test("kernel equals round(x*factor).cast(long) on adversarial inputs") {
    // ulp-adjacent probes per boundary value t (ADVICE r18: a fixed
    // ulp(0.5) added to |t| >= 1 rounds back to t under ties-to-even, so
    // those cases degenerated to the exact tie — nextUp/nextDown are the
    // true ulp-neighbors of EVERY t)
    val boundary: Seq[java.lang.Double] = (-3 to 3).flatMap { k =>
      val t = k + 0.5
      Seq[java.lang.Double](t, java.lang.Math.nextDown(t), java.lang.Math.nextUp(t),
        t - 1e-6, t + 1e-6, t - 1e-4, t + 1e-4, t - 2e-5, t + 2e-5)
    }
    val money: Seq[java.lang.Double] =
      Seq(0.01, 0.005, 1234.56, -1234.56, 99999.99, -0.005, 949.5, -949.5)
    val big: Seq[java.lang.Double] = Seq(
      1e8 - 0.5, 1e8 + 0.5, 4.2e9, -4.2e9, 9.007199254740992e15,
      9.007199254740993e15, 1e300, -1e300)
    val weird: Seq[java.lang.Double] = Seq(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, null)
    val rnd = new scala.util.Random(18)
    val fuzz: Seq[java.lang.Double] =
      Seq.fill(2000)(java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 2e6)) ++
      Seq.fill(2000)(java.lang.Double.valueOf(rnd.nextInt(2000000) / 100.0)) ++
      Seq.fill(500)(java.lang.Double.valueOf((rnd.nextInt(4001) - 2000) + 0.5))
    for (f <- Seq(100L, 10000L, 64L, 1L))
      check(boundary ++ money ++ big ++ weird ++ fuzz, f)
  }

  test("ScaleRoundFL array kernel equals the transform(round(x*f)) lambda") {
    import graft.expressions.VectorExprs
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType),
        nullable = true)))
    val rnd = new scala.util.Random(19)
    val rows: Seq[Seq[java.lang.Float]] =
      Seq(null, Seq.empty[java.lang.Float],
        Seq[java.lang.Float](1.5f, -1.5f, 0.0f, -0.0f, null,
          Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
          1.23456789f, -9.87654e-7f, 3.4e8f)) ++
      Seq.fill(200)(Seq.fill(16)(
        java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 4f)): Seq[java.lang.Float])
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(org.apache.spark.sql.Row(_)): _*), schema)
    for (f <- Seq(1000000L, 100L)) {
      val diff = df.select(
          VectorExprs.scaleRoundFL(col("v"), f).as("k"),
          expr(s"transform(v, x -> cast(round(cast(x as double) * $f) as bigint))").as("l"))
        .where(!(col("k") <=> col("l"))).count()
      assert(diff == 0L, s"factor $f: $diff rows diverge")
    }
    // and on the real embeddings — the exact call shape the Lloyd loops run
    val emb = Tables.embeddings(spark, sfDir)
    val diff = emb.select(
        VectorExprs.scaleRoundFL(col("embedding"), 1000000L).as("k"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))").as("l"))
      .where(!(col("k") <=> col("l"))).count()
    assert(diff == 0L, s"$diff embedding rows diverge")
  }

  test("kernel matches c2's exact call shape on the real money columns") {
    val li = Tables.lineitem(spark, sfDir).limit(5000)
    for (c <- Seq("l_extendedprice", "l_discount", "l_quantity", "l_tax")) {
      val diff = li.select(
          MoneyRound.scaledLong(col(c), 100).as("k"),
          round(col(c) * lit(100)).cast("long").as("b"))
        .where(!(col("k") <=> col("b"))).count()
      assert(diff == 0L, s"column $c: $diff rows diverge")
    }
  }
}
