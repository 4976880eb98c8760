package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Binning

/** Two-pass distributed rank (operators/Binning.scala): must equal the
  * per-class window row_number exactly, for any input partitioning — the
  * determinism contract that lets q26/q70 drop the per-class sort task.
  */
class BinningSpec extends SparkSpec {

  test("rankInClass equals the window row_number, for any input partitioning") {
    import spark.implicits._
    // 3 classes, skewed sizes, duplicate order values (the tie column
    // decides), class sizes straddling the partition count
    val rows = (1L to 997L).map { i =>
      (s"c${i % 3}", (i * 37) % 50, i)
    }
    val df = rows.toDF("cls", "v", "id")
    val w = Window.partitionBy(col("cls")).orderBy(col("v").asc, col("id").asc)
    val expected = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cls"))))
      .select(col("cls"), col("id"), col("rn"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    Seq(1, 4, 32).foreach { parts =>
      val got = Binning.rankInClass(df.repartition(parts), "cls", "v", "id")
        .select(col("cls"), col("id"), col("rn"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == expected, s"parts=$parts: rank mismatch, e.g. " +
        (got.toSet -- expected.toSet).take(3))
    }
  }

  test("rankInClass ranks null-class rows as their own group (window parity)") {
    import spark.implicits._
    // the window PARTITION BY groups nulls together; the offsets join must
    // be null-safe (<=>) or these rows vanish from the output
    val rows: Seq[(Option[String], Long, Long)] =
      (1L to 200L).map(i => (if (i % 5 == 0) None else Some(s"c${i % 3}"), (i * 37) % 50, i))
    val df = rows.toDF("cls", "v", "id")
    val w = Window.partitionBy(col("cls")).orderBy(col("v").asc, col("id").asc)
    val expected = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cls"))))
      .select(col("id"), col("rn"), col("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Binning.rankInClass(df.repartition(7), "cls", "v", "id")
      .select(col("id"), col("rn"), col("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 200, s"null-class rows dropped: ${got.size} of 200 survive")
    assert(got == expected)
  }

  test("prefixSumInClass treats null values as 0 (window-sum parity)") {
    import spark.implicits._
    val rows: Seq[(String, Long, Long, Option[Long])] =
      (1L to 100L).map(i => (s"s${i % 2}", i, i, if (i % 7 == 0) None else Some(i % 13)))
    val df = rows.toDF("src", "ord", "id", "tok")
    val w = Window.partitionBy(col("src")).orderBy(col("ord").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum", coalesce(sum(col("tok")).over(w), lit(0L)))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Binning.prefixSumInClass(df.repartition(5), "src", "ord", "id", "tok")
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q71 sketch bins: near-uniform sizes, exhaustive coverage, partition-invariant") {
    val rows = SparkEntry.queries("q71_sketch_bins")(spark, sfDir).collect()
      .map(r => r.getLong(r.fieldIndex("bin")) -> r.getLong(r.fieldIndex("n_orders"))).toMap
    val n = rows.values.sum
    // every order lands in exactly one bin; boundaries come from a
    // 256-point sample so sizes are near-uniform (±~n/√k), not exact —
    // a loose band documents the contract without flaking
    assert(rows.keys.forall(b => b >= 1 && b <= 10))
    assert(n > 0)
    rows.values.foreach(c => assert(c > n / 50 && c < n / 3,
      s"bin size $c implausible for n=$n: $rows"))
    // determinism: the sample is a pure function of the row set (partition
    // invariance of the TakeOrdered bottom-k is covered by the oracle
    // hash-match at two SFs); a re-run must be bit-stable
    val again = SparkEntry.queries("q71_sketch_bins")(spark, sfDir).collect()
      .map(r => r.getLong(r.fieldIndex("bin")) -> r.getLong(r.fieldIndex("n_orders"))).toMap
    assert(again == rows)
  }

  test("ntileFromRank reproduces SQL NTILE bucket sizes, including n < b") {
    import spark.implicits._
    // n = 43, b = 10: first 3 buckets of 5, then 7 of 4; n = 7 < b = 10:
    // each row its own bucket
    Seq((43, 10), (7, 10), (100, 10), (10, 10)).foreach { case (n, b) =>
      val df = (1L to n.toLong).toDF("id").withColumn("cls", lit("x"))
      val w = Window.partitionBy(col("cls")).orderBy(col("id").asc)
      val viaWindow = df.withColumn("t", ntile(b).over(w).cast("long"))
        .select(col("id"), col("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaRank = df
        .withColumn("rn", col("id")).withColumn("n", lit(n.toLong))
        .withColumn("t", Binning.ntileFromRank("rn", "n", b))
        .select(col("id"), col("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaRank == viaWindow, s"n=$n b=$b")
    }
  }
}
