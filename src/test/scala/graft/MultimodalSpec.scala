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

  test("m07 quarantine: sub-width fingerprints never band, pairs still equal all-pairs") {
    import spark.implicits._
    // a short-payload-heavy batch: 200 sub-width fingerprints (width 40 —
    // bits 40..63 are structural zero padding) + 40 full-width. Without
    // the quarantine every sub-width frame lands in the (chunk 3, 0)
    // bucket: one bucket of 200+ members, a quadratic hot spot.
    val sub = (0L until 200L).map(i => (i, (i % 16) | ((i % 8) << 20), 40))
    val fullW = (1000L until 1040L).map(i => (i, i * 0x9E3779B97F4A7C15L | (1L << 63), 64))
    val fps = (sub ++ fullW).toDF("id", "fp", "width")
    val pairs = Multimodal.phashNearDupPairs(fps, "id", "fp", "width")
      .select(col("a"), col("b"), col("hamming")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force all-pairs reference
    val all = (sub ++ fullW).map { case (id, fp, _) => (id, fp) }
    val expected = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(pairs == expected,
      s"quarantine split lost/invented pairs: only-got=${(pairs -- expected).take(3)} " +
        s"only-expected=${(expected -- pairs).take(3)}")
    // bounded buckets: the BANDED set (width >= 64 only) has no hot
    // bucket, while naive banding of the same batch would put all 200
    // sub-width frames into the zero chunk-3 bucket
    def bucketSizes(rows: Seq[(Long, Long)]): Map[(Int, Long), Int] =
      rows.flatMap { case (_, fp) =>
        (0 until 4).map(j => (j, (fp >>> (j * 16)) & 0xFFFFL))
      }.groupBy(identity).view.mapValues(_.size).toMap
    val bandedMax = bucketSizes(fullW.map(t => (t._1, t._2))).values.max
    val naiveMax = bucketSizes(all).values.max
    assert(naiveMax >= 200, s"testbed must exhibit the hot bucket naively (got $naiveMax)")
    assert(bandedMax <= 40, s"banded path bucket sizes must stay bounded (got $bandedMax)")
  }
}
