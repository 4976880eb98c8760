package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Pins Tables.events' ts normalization across the two physical encodings
  * the driver's testdata generator has shipped: TIMESTAMP(NANOS) (read as an
  * epoch-nanos long under nanosAsLong) and TIMESTAMP(MICROS) (read natively
  * as TIMESTAMP_NTZ). A generator change flipped the encoding between rounds
  * and silently dropped every events query from the correctness gate; this
  * spec makes the next flip a loud local failure.
  */
class TablesSpec extends SparkSpec {

  private val us = 1704103200000000L // 2024-01-01T10:00:00Z in epoch micros

  test("events ts_us is identical for long-nanos and timestamp-micros encodings") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()

    // long-nanos shape (what nanosAsLong yields for TIMESTAMP(NANOS) files)
    val longDir = s"${dir.getAbsolutePath}/long"
    Seq((1L, us * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$longDir/events.parquet")

    // timestamp-micros shape (TIMESTAMP_NTZ on read)
    val ntzDir = s"${dir.getAbsolutePath}/ntz"
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(us)).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$ntzDir/events.parquet")

    val fromLong = Tables.events(spark, longDir).select("ts_us").as[Long].head()
    val fromNtz  = Tables.events(spark, ntzDir).select("ts_us").as[Long].head()
    assert(fromLong == us)
    assert(fromNtz == us)
  }

  test("the live testdata loads with a ts_us column in micros range") {
    val ev = Tables.events(spark, sfDir).select(col("ts_us")).limit(5)
    val vals = ev.collect().map(_.getLong(0))
    assert(vals.nonEmpty)
    // epoch micros for any plausible generator date (2000..2100)
    assert(vals.forall(v => v > 946684800000000L && v < 4102444800000000L))
  }
}
