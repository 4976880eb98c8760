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

  test("RAWM round-trip: pack → decode recovers header and exact pixel stats") {
    import graft.operators.Multimodal
    // hand-built 2×2 single-channel, 2 frames: samples 10,20,30,40 / 50,60,70,80
    val samples = Array(10, 20, 30, 40, 50, 60, 70, 80).map(_.toByte)
    val d = Multimodal.decodeRaw(Multimodal.packRawMedia(2, 2, 1, samples)).get
    assert(d.width == 2 && d.height == 2 && d.channels == 1 && d.nFrames == 2)
    assert(d.meanSample == 45.0 && d.minSample == 10 && d.maxSample == 80)
    // high-byte dims survive the u16 big-endian encoding
    val big = Multimodal.packRawMedia(300, 2, 1, new Array[Byte](600))
    assert(Multimodal.decodeRaw(big).get.width == 300)
  }

  test("RAWM decode rejects corrupt payloads as None, never throws") {
    import graft.operators.Multimodal
    assert(Multimodal.decodeRaw(null).isEmpty)
    assert(Multimodal.decodeRaw(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeRaw("JPEGnot-a-rawm-payload".getBytes).isEmpty)
    // right magic, truncated body (partial frame)
    val good = Multimodal.packRawMedia(2, 2, 1, new Array[Byte](8))
    assert(Multimodal.decodeRaw(good.dropRight(1)).isEmpty)
    // zero-dim header
    val zero = good.clone(); zero(4) = 0; zero(5) = 0
    assert(Multimodal.decodeRaw(zero).isEmpty)
    // adversarial dims whose frame size overflows Int (32768×32768×4 = 2^32)
    // must reject cleanly, not divide-by-zero on the wrapped value
    val evil = good.clone()
    evil(4) = 0x80.toByte; evil(5) = 0; evil(6) = 0x80.toByte; evil(7) = 0; evil(8) = 4
    assert(Multimodal.decodeRaw(evil).isEmpty)
  }

  test("decodeRawFeatures: real byte stats match the generator's closed form") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    val out = Multimodal.decodeRawFeatures(spark, Multimodal.syntheticRawMedia(spark, 60))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.size == 60)
    for (id <- Seq(0L, 1L, 2L, 59L)) {
      val r = out(id)
      val w = id % 7 + 2; val h = id % 5 + 2
      val c = if (id % 3 == 1) 1 else 3
      val frames = if (id % 3 == 2) id % 4 + 1 else 1
      val len = (w * h * c * frames).toInt
      val smp = (0 until len).map(i => (id * 31 + i * 17) % 251)
      assert(r.getAs[Long]("payload_bytes") == 9L + len)
      assert(r.getAs[Int]("n_frames") == frames.toInt)
      assert(r.getAs[Double]("mean_sample") == smp.sum.toDouble / len)
      assert(r.getAs[Int]("min_sample") == smp.min.toInt)
      assert(r.getAs[Int]("max_sample") == smp.max.toInt)
    }
  }

  test("upsert batch size is clamped to the 65535-parameter Postgres limit") {
    assert(JdbcUpsertSink.maxRowsPerStatement(10) == 6553)
    assert(JdbcUpsertSink.maxRowsPerStatement(1) == 65535)
    assert(JdbcUpsertSink.maxRowsPerStatement(100000) == 1)
  }

  test("m06 fingerprints: one row per decoded frame") {
    val media = Multimodal.syntheticRawMedia(spark, 60)
    val fp = Multimodal.frameFingerprints(spark, media).collect()
    val frames = Multimodal.decodeRawFeatures(spark, media)
      .agg(sum(col("n_frames").cast("long"))).collect()(0).getLong(0)
    assert(fp.length.toLong == frames && frames > 0)
  }
}
