package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.MergeOps

/** Structured-Streaming re-expression of the reference's incremental loop.
  *
  * The reference polls S3 for `{schema}-{table}-{start}-{end}.parquet`
  * windows and upserts each as it lands (main.py:301-372). In Spark that
  * polling loop IS the Structured Streaming file source: `readStream` on a
  * directory discovers new files exactly once (checkpointed — the analog of
  * the `parquet_import_tracking` table), and `foreachBatch` applies the
  * same latest-wins merge used in batch. `.empty` marker files need no
  * special case — the file source simply never emits rows for them.
  */
object IncrementalStream {

  /** Tail `inputDir` for new parquet slices and maintain a latest-wins state
    * table at `stateDir` (parquet, overwritten per micro-batch after merging
    * with the previous state — a MERGE INTO in Delta/Iceberg deployments).
    */
  def run(
      spark: SparkSession,
      inputDir: String,
      schemaSample: DataFrame,
      keys: Seq[String],
      ord: Seq[String],
      stateDir: String,
      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaSample.schema)
      .parquet(inputDir)

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val merged =
          if (new java.io.File(stateDir).exists()) {
            val prev = batch.sparkSession.read.parquet(stateDir)
            MergeOps.snapshotMerge(prev, batch, keys, ord)
          } else MergeOps.latestByKey(batch, keys, ord)
        // stage-then-swap so a failed batch never corrupts the state table
        val tmp = stateDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(stateDir)
        if (fs.exists(dst)) fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
      .start()
  }

  /** Watermarked sliding-window event counts — the streaming aggregation
    * shape (event-time windows + late-data handling) on the events stream.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
