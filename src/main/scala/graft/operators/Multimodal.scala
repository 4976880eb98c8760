package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns travelling next to typed metadata —
  * the layout a 100 TB training-data pipeline needs: the bytes shuffle only
  * when strictly necessary, all filtering happens on the metadata columns,
  * and decode/feature-extraction runs batched per partition (the Scala
  * analog of `mapInPandas`).
  *
  * The decode step is a clearly-marked STUB (no image/audio libraries in
  * this container): a deterministic fake that derives "decoded" properties
  * from the bytes. The Spark-side plumbing — schema, batch iteration,
  * partition-parallel execution — is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true)))

  /** Build a synthetic media table from documents: the text bytes stand in
    * for an encoded image payload. Deterministic, and the metadata derivation
    * is plain integer arithmetic (not an engine-specific hash) so any SQL
    * engine can reproduce it — which is what lets the resize-plan query have
    * a real DuckDB oracle instead of a rows-only check.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, lit("image"))
        .when(pmod(col(idCol), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(col(idCol).cast("long") * lit(2654435761L), lit(1024L)) + 1).cast("int").as("meta_width"),
      (pmod(col(idCol).cast("long") * lit(2246822519L), lit(1024L)) + 1).cast("int").as("meta_height"))

  /** STUB decode: in production this would call an image/audio codec on each
    * payload batch. Here it derives deterministic pseudo-features so the
    * pipeline shape (batched per-partition decode → feature columns) is
    * fully exercised.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Double) = {
    // ??? <- real codec goes here; deterministic fake below
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val nFrames = math.abs(h % 64).toInt + 1
    val meanLuma = math.abs((h / 64) % 10000).toDouble / 10000.0
    (nFrames, meanLuma)
  }

  /** Batched per-partition "decode" + feature extraction. Runs as one pass
    * over each partition (no per-row task overhead), emitting typed feature
    * columns alongside the metadata.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("payload_bytes", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (nFrames, meanLuma) = fakeDecode(payload)
        Row(
          r.getAs[Long]("media_id"),
          r.getAs[String]("kind"),
          r.getAs[Int]("meta_width"),
          r.getAs[Int]("meta_height"),
          payload.length.toLong,
          nFrames,
          meanLuma)
      }
    }(enc)
  }

  /** Frame sampling for video media: every `stride`-th frame index from the
    * decoded frame count (STUB decode — indices are real plumbing, the
    * frames themselves would come from the codec). Explodes to one row per
    * sampled frame, the shape a frame-level training pipeline consumes.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .where(col("kind") === "video")
      .select(
        col("media_id"),
        col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize planning for image media: target box fit preserving aspect
    * ratio (pure metadata arithmetic — the pixel work is the stubbed codec's
    * job; the point is that filtering/partitioning happens on metadata
    * without touching payload bytes).
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media
      .where(col("kind") === "image")
      .select(
        col("media_id"), col("meta_width"), col("meta_height"),
        least(lit(maxSide) / greatest(col("meta_width"), col("meta_height")).cast("double"), lit(1.0)).as("_scale"))
      .select(
        col("media_id"), col("meta_width"), col("meta_height"),
        round(col("meta_width") * col("_scale")).cast("int").as("out_width"),
        round(col("meta_height") * col("_scale")).cast("int").as("out_height"))

  /** Per-kind feature rollup over the decoded features. */
  def featureStats(decoded: DataFrame): DataFrame =
    decoded
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("payload_bytes")).as("total_bytes"),
        round(avg(col("n_frames")), 4).as("avg_frames"),
        round(avg(col("mean_luma")), 4).as("avg_luma"))
}
