package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sinks.JdbcUpsertSink

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, sfDir), "doc_id", "text")
  private lazy val decoded = Multimodal.decodeFeatures(spark, media)

  test("decode is deterministic and preserves cardinality") {
    val a = decoded.orderBy("media_id").collect()
    val b = Multimodal.decodeFeatures(spark, media).orderBy("media_id").collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sfDir).count())
    assert(a.forall(r => r.getAs[Int]("n_frames") >= 1 && r.getAs[Long]("payload_bytes") > 0))
  }

  test("frame sampling emits ceil(n_frames/stride) rows per video") {
    val sampled = Multimodal.sampleFrames(decoded, stride = 8)
    val perMedia = sampled.groupBy("media_id")
      .agg(max("n_frames").as("nf"), count(lit(1)).as("ns"))
      .collect()
    assert(perMedia.nonEmpty)
    perMedia.foreach { r =>
      val nf = r.getAs[Int]("nf"); val ns = r.getAs[Long]("ns")
      assert(ns == (nf + 7) / 8, s"media ${r.get(0)}: $nf frames, $ns sampled")
    }
  }

  test("resize plan preserves aspect ratio and bounds the long side") {
    val plans = Multimodal.resizePlan(media, maxSide = 256).collect()
    assert(plans.nonEmpty)
    plans.foreach { r =>
      val (w, h) = (r.getAs[Int]("meta_width"), r.getAs[Int]("meta_height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(ow <= 257 && oh <= 257)
      if (w <= 256 && h <= 256) assert(ow == w && oh == h) // no upscale
    }
  }

  test("upsert batch size is clamped to the 65535-parameter Postgres limit") {
    assert(JdbcUpsertSink.maxRowsPerStatement(10) == 6553)
    assert(JdbcUpsertSink.maxRowsPerStatement(1) == 65535)
    assert(JdbcUpsertSink.maxRowsPerStatement(100000) == 1)
  }
}
