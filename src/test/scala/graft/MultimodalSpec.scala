package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: metadata wrapping, partition-local decode
  * (schema + determinism), frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, "another payload".getBytes("UTF-8"))
  ).toDF("id", "payload")

  test("aHash: deterministic, phase twins hamming-near, distinct images far, corrupt null") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a0 = Multimodal.aHash(Multimodal.synthGradientPng(33, 35, 0)).get
    assert(a0 == Multimodal.aHash(Multimodal.synthGradientPng(33, 35, 0)).get)
    val a1 = Multimodal.aHash(Multimodal.synthGradientPng(33, 35, 1)).get
    assert(ham(a0, a1) <= 2) // one-gray-level shift: a near-duplicate
    val b0 = Multimodal.aHash(Multimodal.synthGradientPng(34, 38, 0)).get
    assert(ham(a0, b0) > 6) // different raster → different 8×8 profile
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aHash(Multimodal.synthGradientPng(7, 7, 0)).isEmpty) // sub-8×8
  }

  test("imageAHash + hammingNearDup pair perceptual twins only, dropping undecodable rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(1L, Multimodal.synthGradientPng(33, 35, 0)),
      Row(1000001L, Multimodal.synthGradientPng(33, 35, 1)), // perceptual twin of 1
      Row(2L, Multimodal.synthGradientPng(34, 38, 0)),
      Row(9L, Array[Byte](9, 9, 9)) // undecodable
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
    val hashed = Multimodal.imageAHash(df, "payload")
    assert(hashed.filter(col("doc_id") === 9L).head().isNullAt(2))
    val pairs = graft.operators.Dedup
      .hammingNearDup(hashed.select(col("doc_id"), col("ahash")), "doc_id", "ahash",
        maxHamming = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 1000001L)))
    assert(pairs.head._3 <= 2)
  }

  test("videoFrameHashes: repeated scenes hash equal; hammingNearDup pairs them cross-video") {
    // synthAviDib pixel v(y) = (base + 7f + y) % 256, so video B at
    // base+7 replays video A's scenes shifted by one frame
    val a = Multimodal.synthAviDib(32, 24, totalFrames = 3, usPerFrame = 33333, base = 10)
    val b = Multimodal.synthAviDib(32, 24, totalFrames = 3, usPerFrame = 33333, base = 17)
    val ha = Multimodal.aviDibFrameHashes(a)
    val hb = Multimodal.aviDibFrameHashes(b)
    assert(ha.length == 3 && hb.length == 3)
    assert(ha(1) == hb(0) && ha(2) == hb(1)) // bit-identical repeated scenes
    assert(Multimodal.aviDibFrameHashes(Array[Byte](1, 2, 3)).isEmpty)
    // refactor guard: the layout-based sum decode still matches the
    // closed form (frame f: Σ_y 3·w·((base+7f+y)%256))
    val sums = Multimodal.aviDibFrames(a).map(_._3)
    val expect = (0 until 3).map(f =>
      (0 until 24).map(y => 3L * 32 * ((10 + 7 * f + y) % 256)).sum)
    assert(sums == expect)

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, a), Row(2L, b)), 2),
      StructType(Seq(StructField("video_id", LongType), StructField("payload", BinaryType))))
    val hashed = Multimodal
      .videoFrameHashes(df, "payload")
      .select(
        (col("video_id") * 1000 + col("frame_idx")).as("fid"),
        col("frame_ahash"))
    val pairs = graft.operators.Dedup
      .hammingNearDup(hashed, "fid", "frame_ahash", maxHamming = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(exact.contains((1001L, 2000L)) && exact.contains((1002L, 2001L)))
  }

  test("audioFingerprint: ramp twins near, different profiles far, flat/corrupt degenerate") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a = Multimodal.audioFingerprint(
      Multimodal.synthWavRamp(8000, 1, 4000, base = 0, step = 3)).get
    assert(a == Multimodal.audioFingerprint(
      Multimodal.synthWavRamp(8000, 1, 4000, base = 0, step = 3)).get)
    val twin = Multimodal.audioFingerprint(
      Multimodal.synthWavRamp(8000, 1, 4000, base = 40, step = 3)).get
    assert(ham(a, twin) <= 3)
    val other = Multimodal.audioFingerprint(
      Multimodal.synthWavRamp(8000, 1, 4000, base = 0, step = 11)).get
    assert(ham(a, other) > 6)
    // constant amplitude: every window equals the mean → 0 bits (a
    // documented degenerate — all flat tracks share the profile)
    assert(Multimodal.audioFingerprint(Multimodal.synthWav(8000, 1, 4000, 500)).get == 0L)
    assert(Multimodal.audioFingerprint(Array[Byte](1, 2)).isEmpty)

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Multimodal.synthWavRamp(8000, 1, 4000, 0, 3)),
        Row(1000001L, Multimodal.synthWavRamp(8000, 1, 4000, 40, 3)),
        Row(2L, Multimodal.synthWavRamp(8000, 1, 4000, 0, 11)),
        Row(9L, Array[Byte](9))), 2),
      StructType(Seq(StructField("clip_id", LongType), StructField("payload", BinaryType))))
    val hashed = Multimodal.audioAHash(df, "payload")
    assert(hashed.filter(col("clip_id") === 9L).head().isNullAt(2))
    val pairs = graft.operators.Dedup
      .hammingNearDup(hashed.select(col("clip_id"), col("audio_ahash")), "clip_id",
        "audio_ahash", maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs == Set((1L, 1000001L)))
  }

  test("withMetadata produces the typed metadata struct") {
    val df = Multimodal.withMetadata(media, "payload", "image/png")
    val r = df.filter(col("id") === 1).select("media_meta.*").collect().head
    assert(r.getAs[String]("media_type") == "image/png")
    assert(r.getAs[Long]("byte_len") == 11L)
    assert(r.getAs[String]("sha256").length == 64)
  }

  test("headerDims parses real PNG/BMP/GIF headers with codegen'd byte math") {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le32(v: Int) = be32(v).reverse
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

    // real format layouts: PNG signature + IHDR chunk header, BMP
    // BITMAPFILEHEADER+INFOHEADER prefix, GIF89a logical screen
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480)
    // 14-byte BITMAPFILEHEADER, then the DIB header: size field first
    def bmpInfo(w: Int, h: Int) =
      "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++ le32(w) ++ le32(h)
    val bmp = bmpInfo(1024, 768)
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200)
    val junk = "just text".getBytes

    val rows = Seq((1L, png), (2L, bmp), (3L, gif), (4L, junk))
      .toDF("id", "payload")
      .select($"id", Multimodal.headerDims($"payload").as("d"))
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getStruct(1).getString(0),
        Option(r.getStruct(1).get(1)), Option(r.getStruct(1).get(2))))
    assert(rows(0) == ((1L, "png", Some(640), Some(480))))
    assert(rows(1) == ((2L, "bmp", Some(1024), Some(768))))
    assert(rows(2) == ((3L, "gif", Some(320), Some(200))))
    assert(rows(3) == ((4L, "unknown", None, None)))

    // top-down BMP: negative (two's-complement) height whose MSB is
    // 0xFF — must parse as |height|, not die in ANSI int overflow
    val topDown = bmpInfo(800, -600)
    // corrupt PNG claiming width > Int.MaxValue — null dims, no crash
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ be32(10)
    // OS/2 BITMAPCOREHEADER: size field 12, u16 dims right after
    val core = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(12) ++ le16(64) ++ le16(48)
    // unrecognized DIB variant: format identified, dims null
    val oddDib = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(64) ++ le32(5) ++ le32(7)
    val edge = Seq((1L, topDown), (2L, corrupt), (3L, core), (4L, oddDib))
      .toDF("id", "payload")
      .select($"id", Multimodal.headerDims($"payload").as("d"))
      .orderBy($"id")
      .collect()
      .map(r => (r.getStruct(1).getString(0), Option(r.getStruct(1).get(1)), Option(r.getStruct(1).get(2))))
    assert(edge(0) == (("bmp", Some(800), Some(600))))
    assert(edge(1) == (("png", None, Some(10))))
    assert(edge(2) == (("bmp", Some(64), Some(48))))
    assert(edge(3) == (("bmp", None, None)))
  }

  test("decodeFeatures appends the feature struct deterministically") {
    val out1 = Multimodal.decodeFeatures(media, "payload")
      .select("id", "features.*").collect().sortBy(_.getLong(0))
    val out2 = Multimodal.decodeFeatures(media, "payload")
      .select("id", "features.*").collect().sortBy(_.getLong(0))
    assert(out1.toSeq == out2.toSeq) // same bytes -> same features
    val r = out1.head
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 2048)
    assert(r.getAs[Int]("n_frames") >= 1)
    val b = r.getAs[Double]("brightness")
    assert(b >= 0.0 && b <= 1.0)
  }

  test("resizeStub scales dims aspect-preserved and never upsizes") {
    val out = Multimodal.resizeStub(media, "payload", maxSide = 256)
      .select("id", "resized_width", "resized_height").collect()
    out.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w <= 256 && h <= 256 && w >= 1 && h >= 1)
    }
    // deterministic across runs
    val again = Multimodal.resizeStub(media, "payload", maxSide = 256)
      .select("id", "resized_width", "resized_height").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("real decode: synthesized PNG/GIF round-trip exact dims, frames, brightness") {
    // PNG: single frame, constant gray fill → mean luminance exactly g/255
    val Some((pw, ph, pn, pb)) = Multimodal.decodeImage(Multimodal.synthPng(37, 21, 200))
    assert((pw, ph, pn) == ((37, 21, 1)))
    assert(pb == 200.0 / 255.0)
    // animated GIF: frame count from the real image descriptors
    val Some((gw, gh, gn, gb)) = Multimodal.decodeImage(Multimodal.synthGif(24, 16, 64, frames = 3))
    assert((gw, gh, gn) == ((24, 16, 3)))
    assert(gb == 64.0 / 255.0)
    // non-image bytes → None, no throw
    assert(Multimodal.decodeImage("just text".getBytes("UTF-8")).isEmpty)
    // TRUNCATED PNG (valid signature, body cut mid-IDAT): the reader
    // throws mid-decode — caught, None, the scan survives corrupt rows
    val whole = Multimodal.synthPng(40, 40, 77)
    val truncated = java.util.Arrays.copyOf(whole, whole.length / 2)
    assert(Multimodal.decodeImage(truncated).isEmpty)
    // truncated WAV: header promises more frames than the body carries;
    // decodeAudio reports only what is actually there, or None — never
    // a crash (javax.sound tolerates short reads)
    val wav = Multimodal.synthWav(8000, 1, 100, 500)
    val shortWav = java.util.Arrays.copyOf(wav, wav.length - 100)
    Multimodal.decodeAudio(shortWav).foreach { case (_, _, _, _, peak, _) =>
      assert(peak == 500.0)
    }
  }

  test("decodeImages appends real features; undecodable rows get null fields") {
    val df = Seq(
      (1L, Multimodal.synthPng(40, 30, 100)),
      (2L, Multimodal.synthGif(20, 20, 50, frames = 2)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val out = Multimodal.decodeImages(df, "payload")
      .select("id", "features.*").collect().sortBy(_.getLong(0))
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == ((40, 30, 1)))
    assert(out(0).getDouble(4) == 100.0 / 255.0)
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == ((20, 20, 2)))
    assert(out(2).isNullAt(1) && out(2).isNullAt(3))
  }

  test("resizeImages produces real resampled PNG bytes that re-decode to the new dims") {
    val df = Seq((1L, Multimodal.synthPng(100, 60, 150))).toDF("id", "payload")
    val r = Multimodal.resizeImages(df, "payload", maxSide = 50).collect().head
    val (nw, nh) = (r.getAs[Int]("resized_width"), r.getAs[Int]("resized_height"))
    assert((nw, nh) == ((50, 30)))
    // the payload is a REAL PNG: javax.imageio re-decodes it to the
    // claimed dims, and bilinear resample of a constant image is exact
    val Some((dw, dh, dn, db)) =
      Multimodal.decodeImage(r.getAs[Array[Byte]]("resized_payload"))
    assert((dw, dh, dn) == ((50, 30, 1)))
    assert(db == 150.0 / 255.0)
    // never upsizes: an image already within maxSide is size-preserved
    val small = Seq((1L, Multimodal.synthPng(30, 20, 10))).toDF("id", "payload")
    val s = Multimodal.resizeImages(small, "payload", maxSide = 50).collect().head
    assert((s.getAs[Int]("resized_width"), s.getAs[Int]("resized_height")) == ((30, 20)))
  }

  test("withSyntheticImages payload parameters are closed-form in the id") {
    val df = Seq(0L, 1L, 5L, 6L).toDF("doc_id")
    val out = Multimodal.decodeImages(
      Multimodal.withSyntheticImages(df, "doc_id"), "payload")
      .select("doc_id", "features.*").collect().sortBy(_.getLong(0))
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (16 + id % 40).toInt)
      assert(r.getInt(2) == (16 + (id * 3) % 40).toInt)
      val expFrames = if (id % 3 == 0) (1 + id % 4).toInt else 1
      assert(r.getInt(3) == expFrames)
      assert(r.getDouble(4) == (id % 256).toDouble / 255.0)
    }
  }

  test("real audio: synthesized WAV round-trips through javax.sound.sampled exactly") {
    // stereo 11025 Hz, 300 frames, constant amplitude 4000
    val wav = Multimodal.synthWav(sampleRate = 11025, channels = 2, frames = 300, amplitude = 4000)
    val Some((c, sr, bits, frames, peak, rms)) = Multimodal.decodeAudio(wav)
    assert((c, sr, bits, frames) == ((2, 11025, 16, 300L)))
    assert(peak == 4000.0 && rms == 4000.0) // constant signal: exact
    // silence: peak = rms = 0
    val Some((_, _, _, _, p0, r0)) =
      Multimodal.decodeAudio(Multimodal.synthWav(8000, 1, 64, 0))
    assert(p0 == 0.0 && r0 == 0.0)
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
  }

  test("decodeAudioFeatures recovers the closed form and agrees with audioMeta") {
    // the gated q_multimodal_audio row carries only the header byte
    // math (environment-proof); THIS pins the javax.sound.sampled
    // decode path that moved to the q_multimodal_audio_decode bench
    // twin: the Spark-side mapPartitions decode must recover the
    // withSyntheticAudio closed form exactly and agree with the header
    val ids = Seq(0L, 1L, 7L, 42L, 999L, 1003L).toDF("doc_id")
    val out = Multimodal
      .decodeAudioFeatures(Multimodal.withSyntheticAudio(ids, "doc_id"), "payload")
      .withColumn("meta", Multimodal.audioMeta($"payload"))
      .select($"doc_id", $"audio.*", $"meta")
      .collect().sortBy(_.getLong(0))
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (1 + id % 2).toInt, s"channels id=$id")
      assert(r.getInt(2) == (8000 + (id % 8) * 1000).toInt, s"rate id=$id")
      assert(r.getInt(3) == 16)
      assert(r.getLong(4) == 256 + id % 256, s"frames id=$id")
      // constant amplitude ⇒ peak = rms = amplitude, exact in double
      val amp = ((id % 1000) * 16).toDouble
      assert(r.getDouble(5) == amp && r.getDouble(6) == amp, s"peak/rms id=$id")
      // decode and header byte math agree column-for-column
      val m = r.getStruct(7)
      assert(m.toSeq == Seq("wav", r.getInt(1), r.getInt(2), 16, r.getLong(4)))
    }
  }

  test("audioMeta parses the canonical WAV header with codegen'd byte math") {
    val rows = Seq(
      (1L, Multimodal.synthWav(16000, 1, 500, 100)),
      (2L, Multimodal.synthWav(44100, 2, 1000, 2)),
      (3L, "RIFFjunk that is not wave".getBytes("UTF-8"))
    ).toDF("id", "payload")
      .select($"id", Multimodal.audioMeta($"payload").as("m"))
      .orderBy($"id")
      .collect()
    assert(rows(0).getStruct(1).toSeq == Seq("wav", 1, 16000, 16, 500L))
    assert(rows(1).getStruct(1).toSeq == Seq("wav", 2, 44100, 16, 1000L))
    assert(rows(2).getStruct(1).getString(0) == "unknown")
    assert(rows(2).getStruct(1).isNullAt(1))
  }

  test("videoMeta parses the canonical AVI MainAVIHeader with codegen'd byte math") {
    val rows = Seq(
      (1L, Multimodal.synthAvi(640, 480, 1500, 33333)),
      (2L, Multimodal.synthAvi(1920, 1080, 250, 40000)),
      (3L, "RIFF but not an avi container".getBytes("UTF-8"))
    ).toDF("id", "payload")
      .select($"id", Multimodal.videoMeta($"payload").as("m"))
      .orderBy($"id")
      .collect()
    assert(rows(0).getStruct(1).toSeq == Seq("avi", 640, 480, 1500, 33333))
    assert(rows(1).getStruct(1).toSeq == Seq("avi", 1920, 1080, 250, 40000))
    assert(rows(2).getStruct(1).getString(0) == "unknown")
    assert(rows(2).getStruct(1).isNullAt(1))
  }

  test("real video frame decode: synthesized uncompressed AVI round-trips the closed form") {
    // width 8 (stride 24, no padding), height 4, 3 frames, base 250
    // (forces the % 256 wrap inside the frame): channel value in image
    // row y of frame f is (250 + 7f + y) % 256
    val payload = Multimodal.synthAviDib(8, 4, 3, 33333, base = 250L)
    def v(f: Int, y: Int): Long = (250L + 7 * f + y) % 256
    val out = Seq((1L, payload)).toDF("id", "payload")
    val frames = Multimodal.decodeVideoFrames(out, "payload")
      .orderBy($"frame_idx")
      .select($"frame_idx", $"frame_width", $"frame_height", $"brightness_sum", $"top_row_sum")
      .as[(Int, Int, Int, Long, Long)]
      .collect()
    assert(frames.length == 3)
    for (f <- 0 until 3) {
      val expectedTotal = 3L * 8 * (0 until 4).map(v(f, _)).sum
      assert(frames(f) == ((f, 8, 4, expectedTotal, 3L * 8 * v(f, 0))),
        s"frame $f decoded ${frames(f)}")
    }
    // the container is ALSO a valid videoMeta subject (same avih layout)
    val meta = out.select(Multimodal.videoMeta($"payload").as("m")).collect()(0).getStruct(0)
    assert(meta.toSeq == Seq("avi", 8, 4, 3, 33333))
  }

  test("video frame decode pins bottom-up row order, not just order-invariant totals") {
    // two heights → top row (y=0) is the LAST stored DIB row; a
    // top-down misread returns v(h-1) instead of v(0)
    val payload = Multimodal.synthAviDib(4, 6, 1, 40000, base = 10L)
    val row = Multimodal.decodeVideoFrames(Seq((1L, payload)).toDF("id", "payload"), "payload")
      .select($"top_row_sum").as[Long].collect()(0)
    assert(row == 3L * 4 * 10, "top_row_sum must be the y=0 (last stored) row")
    assert(row != 3L * 4 * 15, "a top-down misread would have summed y=5")
  }

  test("video frame decode yields zero rows for malformed or compressed payloads") {
    val good = Multimodal.synthAviDib(8, 4, 2, 33333, base = 0L)
    // flip the strf biCompression field (offset: strf data + 16) to a
    // non-BI_RGB fourcc — a compressed stream must be skipped, not decoded
    val compressed = good.clone()
    val strfData = {
      // RIFF(12) + LIST hdr(8+4) + avih(8+56) + LIST strl hdr(8+4) + strh(8+56) + strf id/size(8)
      12 + 12 + 64 + 12 + 64 + 8
    }
    compressed(strfData + 16) = 'M'.toByte
    val truncated = good.take(good.length / 2)
    val rows = Seq(
      (1L, compressed),
      (2L, truncated),
      (3L, "not media at all".getBytes("UTF-8")),
      (4L, good)
    ).toDF("id", "payload")
    val decoded = Multimodal.decodeVideoFrames(rows, "payload")
      .groupBy($"id").count().as[(Long, Long)].collect().toMap
    assert(decoded == Map(4L -> 2L),
      s"only the intact uncompressed AVI may decode — got $decoded")
  }

  test("real MJPEG frame decode: per-frame JPEGs recover the closed form within JPEG loss") {
    // base 40, heights small → no % 256 wrap inside a frame, so the
    // raster is a smooth gradient JPEG reproduces closely; expected
    // brightness is the DIB closed form, tolerance-banded for loss
    val payload = Multimodal.synthAviMjpeg(32, 24, 3, 33333, base = 40L)
    val frames = Multimodal.decodeMjpegFrames(Seq((1L, payload)).toDF("id", "payload"), "payload")
      .orderBy($"frame_idx")
      .select($"frame_idx", $"frame_width", $"frame_height", $"brightness_sum")
      .as[(Int, Int, Int, Long)]
      .collect()
    assert(frames.length == 3, "every movi chunk must decode to a frame")
    for (f <- 0 until 3) {
      val (idx, w, h, sum) = frames(f)
      assert((idx, w, h) == ((f, 32, 24)))
      val expected = 3L * 32 * (0 until 24).map(y => 40L + 7 * f + y).sum
      val perChannelErr = math.abs(sum - expected).toDouble / (3 * 32 * 24)
      assert(perChannelErr < 3.0,
        s"frame $f brightness $sum vs closed-form $expected: mean channel error $perChannelErr")
    }
    // decode is deterministic within the JVM
    val again = Multimodal.decodeMjpegFrames(Seq((1L, payload)).toDF("id", "payload"), "payload")
      .orderBy($"frame_idx").select($"brightness_sum").as[Long].collect()
    assert(again.toSeq == frames.map(_._4).toSeq)

    // a DIB AVI of the SAME scene hashes within a small Hamming band of
    // the MJPEG frames (codec-agnostic scene identity), and
    // videoFrameHashes picks the right codec path for each container
    val dib = Multimodal.synthAviDib(32, 24, 3, 33333, base = 40L)
    val hashes = Multimodal
      .videoFrameHashes(
        Seq((1L, payload), (2L, dib)).toDF("doc_id", "payload"), "payload")
      .select($"doc_id", $"frame_idx", $"frame_ahash")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(hashes(1L).length == 3 && hashes(2L).length == 3)
    for (f <- 0 until 3) {
      val ham = java.lang.Long.bitCount(hashes(1L)(f) ^ hashes(2L)(f))
      assert(ham <= 16, s"frame $f: MJPEG vs DIB aHash hamming $ham — same scene must be near")
    }
    // non-MJPG payloads yield zero rows from the MJPEG path
    assert(Multimodal.decodeMjpegFrames(Seq((9L, dib)).toDF("id", "payload"), "payload")
      .count() == 0)
  }

  test("real image decode runs unchanged on a stream (stateless, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Array[Byte])]
    val decoded = Multimodal.decodeImages(
      mem.toDF().toDF("id", "payload"), "payload")
      .select($"id", $"features.width", $"features.height", $"features.n_frames")
    val q = decoded.writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, Multimodal.synthPng(33, 44, 9)),
        (2L, Multimodal.synthGif(10, 12, 7, frames = 4)))
      q.processAllAvailable()
      mem.addData((3L, "junk".getBytes("UTF-8"))) // second micro-batch
      q.processAllAvailable()
      val out = spark.table("mm_stream").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
        .toMap
      assert(out(1L) == ((Some(33), Some(44), Some(1))))
      assert(out(2L) == ((Some(10), Some(12), Some(4))))
      assert(out(3L) == ((None, None, None)))
    } finally q.stop()
  }

  test("sampleFrames expands every Nth frame without payload duplication in plan") {
    val withFrames = media.withColumn("n_frames", lit(10))
    val frames = Multimodal.sampleFrames(withFrames, "n_frames", everyNth = 3)
    val idx = frames.filter(col("id") === 1).select("frame_idx")
      .collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == Seq(0, 3, 6, 9))
  }
}
