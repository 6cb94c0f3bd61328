package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `BinaryType` columns with a typed metadata
  * struct alongside — the layout a 100 TB multimodal corpus needs:
  * payloads stay out of every shuffle (metadata-only projections prune
  * them at the parquet scan), and decode runs partition-local.
  *
  * IMAGE decode/resize is REAL: `decodeImage`/`decodeImages`/
  * `resizeImages` run javax.imageio (stock JDK readers: PNG, GIF, BMP,
  * JPEG, WBMP) partition-local — actual raster dims, frame counts, mean
  * luminance, bilinear resample + PNG re-encode. AUDIO decode is REAL
  * (`decodeAudio`). VIDEO frame decode is REAL for uncompressed AVI
  * (`decodeVideoFrames`: RIFF chunk walk + raw 24-bpp DIB rows) AND for
  * Motion-JPEG AVI (`decodeMjpegFrames`: every movi chunk is a complete
  * JPEG through the stock javax.imageio path). Inter-frame codecs
  * (H.264…) stay stubbed (`decodeStub`) — no such codec ships in a
  * bare JVM; swap in a JNI/FFmpeg kernel (or a Python `mapInPandas`
  * stage in PySpark) without touching the plan shape — schema, batch
  * shape, partition-local execution, and metadata pruning are the same
  * contract on all paths.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("sha256", StringType)
  ))

  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("brightness", DoubleType)
  ))

  /** Spread a fixture ID frame across the session's cores before a
    * per-row codec SYNTH kernel (r19 optimization round; guide §2.5's
    * input-skew remedy). The testdata tables ship as ONE single-row-
    * group parquet file, so without this every `withSynthetic*`
    * generator — and the whole partition-local synth→decode chain built
    * on top of it — ran on ONE core (measured: the gradient-PNG synth +
    * aHash kernels cost 1.5 s single-threaded vs 0.15 s at 32 threads
    * for the q_image_neardup fixture set; q_multimodal_decode fell
    * 3.4 s → 0.7 s warm-solo from this change alone). The shuffle moves
    * only the id rows — payloads do not exist yet, and everything
    * downstream stays partition-local — so the cost is bounded by the
    * id-frame width at ANY scale, unlike spreading the corpus tables
    * themselves (measured and rejected: shuffling raw `documents` text
    * regressed every text-kernel query; see OPTIMIZATION_r19.md).
    */
  private def spreadIds(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Wrap a binary column with its typed metadata struct. */
  def withMetadata(df: DataFrame, payloadCol: String, mediaType: String): DataFrame =
    df.withColumn(
      "media_meta",
      struct(
        lit(mediaType).as("media_type"),
        length(col(payloadCol)).cast("long").as("byte_len"),
        sha2(col(payloadCol), 256).as("sha256")
      )
    )

  // -- real header sniffing (no codec required) ----------------------

  // LongType arithmetic: a dimension field with its top byte >= 0x80
  // (e.g. a top-down BMP's negative height) would overflow IntegerType,
  // which under Spark 4's default ANSI mode kills the whole scan
  private def byteAt(payload: org.apache.spark.sql.Column, pos: Int) =
    conv(hex(substring(payload, pos, 1)), 16, 10).cast("long")
  private def be32(p: org.apache.spark.sql.Column, pos: Int) =
    byteAt(p, pos) * 16777216L + byteAt(p, pos + 1) * 65536L +
      byteAt(p, pos + 2) * 256L + byteAt(p, pos + 3)
  private def le32(p: org.apache.spark.sql.Column, pos: Int) =
    byteAt(p, pos + 3) * 16777216L + byteAt(p, pos + 2) * 65536L +
      byteAt(p, pos + 1) * 256L + byteAt(p, pos)
  /** Signed little-endian 32-bit (BMP dims are signed; a negative
    * height means a top-down DIB whose magnitude is the height).
    */
  private def le32s(p: org.apache.spark.sql.Column, pos: Int) = {
    val u = le32(p, pos)
    when(u > Int.MaxValue.toLong, u - 4294967296L).otherwise(u)
  }
  private def le16(p: org.apache.spark.sql.Column, pos: Int) =
    byteAt(p, pos + 1) * 256L + byteAt(p, pos)

  /** REAL image-dimension extraction from fixed-offset headers — the
    * dimension/format filter a pipeline runs over billions of images
    * BEFORE any decode: pure byte arithmetic on the binary column
    * (substring/hex/conv — codegen'd, scan speed, payload never leaves
    * the scan). PNG (IHDR big-endian at 17/21), BMP (BITMAPINFOHEADER
    * little-endian at 19/23), GIF (logical screen little-endian u16 at
    * 7/9). JPEG dims live in a variable-offset SOF segment — that scan
    * belongs in the partition-local decode kernel, not column math, so
    * JPEG reports format "unknown" here. Returns struct(format, width,
    * height); non-image bytes → ("unknown", null, null).
    */
  def headerDims(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nullInt = lit(null).cast("int")
    // corrupt headers must yield null dims, not an ANSI cast overflow
    def dim(v: org.apache.spark.sql.Column) =
      when(v.between(0, Int.MaxValue.toLong), v).otherwise(lit(null)).cast("int")
    when(hex(substring(payload, 1, 4)) === "89504E47",
      struct(lit("png").as("format"),
        dim(be32(payload, 17)).as("width"),
        dim(be32(payload, 21)).as("height")))
      // BMP dims depend on the DIB header variant: the 4-byte size
      // field at offset 15 (1-based) is 12 for BITMAPCOREHEADER (u16
      // dims at 19/21) and 40/52/56/108/124 for the INFOHEADER family
      // (signed 32-bit dims at 19/23). Parsing INFOHEADER offsets on a
      // CORE bitmap would combine width+height into plausible garbage.
      .when(
        hex(substring(payload, 1, 2)) === "424D" && le32(payload, 15) === 12,
        struct(lit("bmp").as("format"),
          dim(le16(payload, 19)).as("width"),
          dim(le16(payload, 21)).as("height")))
      .when(
        hex(substring(payload, 1, 2)) === "424D" &&
          le32(payload, 15).isin(40L, 52L, 56L, 108L, 124L),
        struct(lit("bmp").as("format"),
          dim(le32s(payload, 19)).as("width"),
          dim(abs(le32s(payload, 23))).as("height")))
      .when(hex(substring(payload, 1, 2)) === "424D",
        struct(lit("bmp").as("format"), nullInt.as("width"), nullInt.as("height")))
      .when(hex(substring(payload, 1, 4)) === "47494638",
        struct(lit("gif").as("format"),
          dim(le16(payload, 7)).as("width"),
          dim(le16(payload, 9)).as("height")))
      .otherwise(struct(lit("unknown").as("format"), nullInt.as("width"), nullInt.as("height")))
  }

  // -- real image codec (javax.imageio — pure JDK, no new deps) ------

  /** Synthesize a REAL single-frame PNG: `width`×`height`, filled with
    * the constant gray level `gray` (0..255). The PNG bytes are a real
    * encoder output — `decodeImage` (or any PNG reader) recovers the
    * exact dims and, because the fill is constant, a mean luminance of
    * exactly gray/255. Used to build image fixtures whose ground truth
    * is closed-form (so a SQL oracle can check a real decode).
    */
  def synthPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
    val img = grayImage(width, height, gray)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a REAL animated GIF with `frames` identical frames of
    * constant gray. A GIF palette built from a single used color is
    * lossless, so frame 0 decodes to mean luminance exactly gray/255,
    * and `decodeImage` counts `frames` image descriptors.
    */
  def synthGif(width: Int, height: Int, gray: Int, frames: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
    val img = grayImage(width, height, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < frames) {
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def grayImage(width: Int, height: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    img
  }

  /** Synthesize a REAL PNG with a deterministic per-pixel GRADIENT —
    * the fixture generator for perceptual hashing, where the
    * constant-fill [[synthPng]] degenerates (every cell equals the
    * mean, aHash = 0 for all images). Pixel (x, y) carries gray level
    * `(x*7 + y*13 + phase) % 256`: spatial structure that survives a
    * real encode/decode round trip, with `phase` as the
    * small-perturbation dial (a +1 phase shifts every pixel one gray
    * level — a near-duplicate in aHash space).
    */
  def synthGradientPng(
      width: Int,
      height: Int,
      phase: Int,
      ax: Int = 7,
      by: Int = 13
  ): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (x * ax + y * by + phase) % 256
        px(y * width + x) = (g << 16) | (g << 8) | g
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint of a decoded
    * image — the standard LAION-style pre-embedding image dedup key:
    * decode, block-average the luminance raster onto an 8×8 grid, and
    * set bit (r·8 + c) when the cell mean exceeds the global mean.
    * Robust to re-encoding, resizing and small edits; pair with
    * [[graft.operators.Dedup.hammingNearDup]] for banded candidate
    * generation (never an all-pairs compare).
    *
    * Partition-local `mapPartitions` like [[decodeImages]]: payload
    * never shuffles, undecodable rows get a null hash (and are dropped
    * by the pairing stage, not silently hashed to 0).
    */
  def imageAHash(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("ahash", LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val h: Any = aHash(r.getAs[Array[Byte]](payloadIdx)).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** The aHash kernel: 8×8 block-mean luminance, bit = cell > mean. */
  def aHash(payload: Array[Byte]): Option[Long] = {
    // null binary column value → null hash, same contract as
    // audioFingerprint/aviDibLayout (a corpus column WILL have nulls)
    if (payload == null) return None
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          // dimension peek BEFORE any raster allocation: corpus payloads
          // are untrusted bytes, and a few-KB decompression-bomb header
          // declaring a 50k×50k raster would otherwise OOM the executor
          // instead of mapping to null (the AVI path's 1<<20 guard)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w < 8 || h < 8 || w.toLong * h > (1L << 26)) None
          else {
            val img = reader.read(0)
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val sums = new Array[Double](64)
            val counts = new Array[Long](64)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val rgb = px(y * w + x)
                val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                val cell = cy * 8 + x * 8 / w
                sums(cell) += lum
                counts(cell) += 1
                x += 1
              }
              y += 1
            }
            Some(thresholdBits(sums, counts))
          }
        } catch {
          case scala.util.control.NonFatal(_) => None
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None } finally iis.close()
  }

  /** Shared tail of every 64-cell profile hash ([[aHash]],
    * [[aviDibFrameHashes]], [[audioFingerprint]]): per-cell means, the
    * equal-weight 64-cell global mean, bit i = cell i above it. The bit
    * LAYOUT must stay identical across modalities — the hashes meet in
    * one generic [[graft.operators.Dedup.hammingNearDup]].
    */
  private def thresholdBits(sums: Array[Double], counts: Array[Long]): Long = {
    var mean = 0.0
    var i = 0
    while (i < 64) { sums(i) /= counts(i); mean += sums(i) / 64.0; i += 1 }
    var bits = 0L
    i = 0
    while (i < 64) { if (sums(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Attach REAL gradient-PNG payloads for perceptual-hash work: dims
    * AND gradient coefficients closed-form in `idCol % 1_000_000` (so a
    * twin registered at id + 1e6 renders the SAME raster), gradient
    * phase from `phaseCol` (phase-1 twins are aHash near-duplicates).
    * The coefficient periods (61, 67 — coprime with the 16-cycle dims)
    * give a joint raster period of 16·61·67 = 65,392 ids, so corpora up
    * to sf1 scale render (near-)unique images and the only engineered
    * hash collisions are the phase twins — a low-period fixture would
    * flood the pairing stage with true-but-unintended identical-image
    * pairs that grow quadratically with corpus size. Partition-local,
    * like every fixture generator here.
    */
  def withSyntheticGradientImages(df: DataFrame, idCol: String, phaseCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val phIdx = df.schema.fieldIndex(phaseCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx) % 1000000L
        val payload = synthGradientPng(
          (32 + id % 16).toInt, (32 + (id * 3) % 16).toInt, r.getInt(phIdx),
          ax = (1 + 2 * (id % 61)).toInt, by = (1 + 2 * (id % 67)).toInt)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  /** Attach a REAL synthetic image payload derived from a numeric id
    * column — the fixture generator for oracle-checked decode: every
    * parameter is closed-form in the id, so a SQL oracle can compute
    * the ground truth that the real decoder must recover.
    *   width  = 16 + (id % 40)
    *   height = 16 + ((id * 3) % 40)
    *   gray   = id % 256
    *   id % 3 == 0 → animated GIF with 1 + (id % 4) frames
    *   otherwise  → single-frame PNG
    * Runs partition-local (mapPartitions); payload never shuffles.
    */
  def withSyntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (16 + id % 40).toInt
        val h = (16 + (id * 3) % 40).toInt
        val gray = (id % 256).toInt
        val payload =
          if (id % 3 == 0) synthGif(w, h, gray, frames = (1 + id % 4).toInt)
          else synthPng(w, h, gray)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  /** REAL image decode: javax.imageio parses the container (PNG / GIF /
    * BMP / JPEG / WBMP with the stock JDK readers), returning the raster
    * dims, the number of frames in the stream (animated GIF > 1), and
    * the mean luminance of frame 0 ((r+g+b)/3 averaged over every
    * pixel, normalized to [0,1]). Returns None for undecodable bytes.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (payload == null) return None
    // in-memory streams only: the default ImageIO stream cache spills
    // through temp FILES, which would put a disk round-trip in a
    // per-row executor loop
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          // bulk pixel grab — one call instead of w*h getRGB round-trips
          // through the color model
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0.0
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            i += 1
          }
          Some((w, h, n, sum / (w.toLong * h) / 255.0))
        } catch {
          case scala.util.control.NonFatal(_) => None
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Partition-local REAL decode over an image payload column: appends
    * the `features` struct (width, height, n_frames, brightness) from an
    * actual javax.imageio parse of the bytes. Undecodable payloads get a
    * null-field struct. Same plan shape as `decodeFeatures`: rows are
    * processed in partition batches, no shuffle, payload never leaves
    * the executor.
    */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", featureType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feat = decodeImage(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((w, h, n, b)) => Row(w, h, n, b)
          case None               => Row(null, null, null, null)
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Partition-local REAL resize: decode frame 0, bilinear-resample so
    * the longer side fits `maxSide` (never upsizes), re-encode as PNG.
    * Output columns: `resized_payload` (real PNG bytes — re-decodable),
    * `resized_width`, `resized_height`. Undecodable payloads pass
    * through with nulls. Dims math matches `resizeStub`:
    * scale = min(1, maxSide/max(w,h)); dim' = max(1, floor(dim*scale)).
    */
  def resizeImages(df: DataFrame, payloadCol: String, maxSide: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized_payload", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)
    ))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
            val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            val out = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, nw, nh, null)
            } finally g2.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row.fromSeq(r.toSeq ++ Seq(bos.toByteArray, nw, nh))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  // -- real audio codec (RIFF/WAV via javax.sound.sampled) -----------

  /** Synthesize a REAL canonical RIFF/WAVE PCM16 payload: 44-byte
    * header + `frames` constant-amplitude samples per channel. Constant
    * amplitude makes the decoded peak AND RMS exactly `amplitude` (in
    * int16 units), so a SQL oracle can check a real decode.
    */
  def synthWav(sampleRate: Int, channels: Int, frames: Int, amplitude: Int): Array[Byte] = {
    val dataLen = frames * channels * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort)  // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < frames * channels) { bb.putShort(amplitude.toShort); i += 1 }
    bb.array()
  }

  /** REAL WAV header sniffing — the audio face of [[headerDims]]: pure
    * codegen'd byte math over the canonical 44-byte RIFF/WAVE PCM
    * layout, the pre-decode format/rate filter a pipeline runs over
    * billions of clips BEFORE any decode. Returns struct(format,
    * channels, sample_rate, bits_per_sample, n_frames); non-WAV (or
    * non-canonical chunk order) → ("unknown", nulls).
    */
  def audioMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nullInt = lit(null).cast("int")
    val isWav = hex(substring(payload, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(payload, 9, 8)) === "57415645666D7420"      // "WAVEfmt "
    val channels = le16(payload, 23)
    val bits = le16(payload, 35)
    val dataLen = le32(payload, 41)
    val frameBytes = channels * (bits / lit(8L))
    when(isWav && hex(substring(payload, 37, 4)) === "64617461" && frameBytes > 0,
      struct(
        lit("wav").as("format"),
        channels.cast("int").as("channels"),
        le32(payload, 25).cast("int").as("sample_rate"),
        bits.cast("int").as("bits_per_sample"),
        // `/` on numeric Columns is DOUBLE division; the frame count must
        // ship as an exact BIGINT (the driver's hasher distinguishes
        // 256.0 from 256 — the round-8/9 red-row root cause)
        (dataLen / frameBytes).cast("long").as("n_frames")))
      .otherwise(struct(
        lit("unknown").as("format"), nullInt.as("channels"),
        nullInt.as("sample_rate"), nullInt.as("bits_per_sample"),
        lit(null).cast("long").as("n_frames")))
  }

  /** `AudioSystem.getAudioInputStream`'s provider lookup goes through
    * `JDK13Services.getProviders` — a class-global SYNCHRONIZED method
    * that builds a fresh ServiceLoader on EVERY call, so 32 decode
    * threads serialize on one JVM lock (r19 measured the spread audio
    * fixture 2.7× SLOWER than single-partition because of it). Resolve
    * the `AudioFileReader` providers ONCE per JVM and iterate them
    * exactly the way `AudioSystem` does — first reader that does not
    * throw `UnsupportedAudioFileException` wins — so the per-row decode
    * is lock-free with identical semantics (r20; unlocks spreading the
    * audio fixture like every other codec fixture).
    */
  private lazy val audioFileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val loaded = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
    // WAV-capable readers FIRST (relative order preserved within each
    // group): the JDK's provider order puts SoftMidiAudioFileReader
    // ahead of WaveFileReader, and its per-call MIDI probe goes through
    // MidiSystem's own JDK13Services lookup — the SAME global lock —
    // plus a thrown UnsupportedAudioFileException per non-MIDI payload.
    // Reordering cannot change which reader WINS for any payload: the
    // container magics (RIFF / FORM / .snd / MThd) are mutually
    // exclusive, so at most one reader group ever accepts a given
    // stream (measured: provider-chain decode 0.14 s/5k single-thread
    // and 0.23 s at 32 threads vs 0.023 s flat for the wave reader
    // alone).
    val (wave, rest) = loaded.partition(_.getClass.getName.contains("Wave"))
    wave ++ rest
  }

  private def audioInputStream(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    audioFileReaders.foreach { r =>
      try return r.getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** REAL audio decode via the JDK's sampled-audio API: parse the
    * stream with the JDK's `AudioFileReader` SPI (resolved once — see
    * [[audioFileReaders]]), pull the PCM16
    * frames, and compute peak amplitude and RMS (both in int16 units —
    * sqrt of an exact integer mean, so constant-amplitude fixtures
    * round-trip exactly). Returns None for undecodable bytes.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Long, Double, Double)] = {
    try {
      val ais = audioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val frames = ais.getFrameLength
          val bytes = ais.readAllBytes()
          var peak = 0L
          var sumSq = 0.0
          var i = 0
          val n = bytes.length / 2
          while (i < n) {
            val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toLong
            if (math.abs(s) > peak) peak = math.abs(s)
            sumSq += s.toDouble * s
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          Some((fmt.getChannels, fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
            frames, peak.toDouble, rms))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val audioFeatureType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("peak", DoubleType),
    StructField("rms", DoubleType)
  ))

  /** Partition-local REAL audio decode over a payload column — appends
    * an `audio` struct from an actual javax.sound.sampled parse. Same
    * plan contract as [[decodeImages]]: no shuffle, payload never
    * leaves the executor, undecodable rows get null fields.
    */
  def decodeAudioFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio", audioFeatureType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feat = decodeAudio(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((c, sr, b, f, p, m)) => Row(c, sr, b, f, p, m)
          case None                      => Row(null, null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Attach a REAL synthetic WAV payload derived from a numeric id
    * column — closed-form parameters, like [[withSyntheticImages]]:
    *   sample_rate = 8000 + (id % 8) * 1000
    *   channels    = 1 + id % 2
    *   n_frames    = 256 + id % 256
    *   amplitude   = (id % 1000) * 16   (constant ⇒ peak = rms = amp)
    */
  def withSyntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // spreadIds like every other codec fixture (r20): the r19 reason to
    // stay single-partition — AudioSystem.getAudioInputStream's
    // per-call SPI lookup serializing 32 decode threads on a JDK-global
    // lock (2.45 s vs 0.92 s warm-solo q_multimodal_audio_decode) — is
    // gone now that decodeAudio resolves the AudioFileReader providers
    // once per JVM ([[audioFileReaders]]).
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = synthWav(
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          channels = (1 + id % 2).toInt,
          frames = (256 + id % 256).toInt,
          amplitude = ((id % 1000) * 16).toInt)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  /** Synthesize a REAL canonical WAV whose samples RAMP —
    * s(i) = ((base + i·step) mod 4096) − 2048 — the audio analog of
    * [[synthGradientPng]]: the constant-amplitude [[synthWav]] is
    * degenerate for energy-profile hashing (every window identical).
    * A small `base` shift is a near-duplicate; a different `step` is a
    * different loudness profile.
    */
  def synthWavRamp(sampleRate: Int, channels: Int, frames: Int, base: Int, step: Int): Array[Byte] = {
    val n = frames * channels
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1)
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2)
    bb.putShort((channels * 2).toShort)
    bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      val v = ((base.toLong + i.toLong * step) % 4096).toInt - 2048
      bb.putShort(v.toShort)
      i += 1
    }
    bb.array()
  }

  /** 64-bit loudness-profile fingerprint of a canonical PCM16 WAV —
    * the audio face of [[aHash]]: split the sample stream into 64
    * equal windows, mean |amplitude| per window, bit w set when window
    * w is louder than the track mean. Robust to gain-preserving edits
    * and re-containering; pair with
    * [[graft.operators.Dedup.hammingNearDup]] for near-dup detection.
    *
    * PURE BYTE MATH over the canonical 44-byte RIFF/WAVE PCM16 layout
    * (the [[audioMeta]] contract) — deliberately NOT
    * `javax.sound.sampled`, whose SPI resolution proved
    * environment-dependent (the round-8 red-row lesson). Non-canonical
    * or sub-64-sample payloads → None.
    */
  def audioFingerprint(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 44 + 128) return None
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 8) != "WAVEfmt " || ascii(36, 4) != "data")
      return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getShort(34) != 16) return None // PCM16 only
    val dataLen = math.min(bb.getInt(40).toLong, (payload.length - 44).toLong).toInt
    val n = dataLen / 2
    if (n < 64) return None
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = bb.getShort(44 + 2 * i).toInt
      val w = (i.toLong * 64 / n).toInt
      sums(w) += math.abs(s)
      counts(w) += 1
      i += 1
    }
    Some(thresholdBits(sums, counts))
  }

  /** [[audioFingerprint]] over a payload column — adds `audio_ahash`
    * (null for non-canonical payloads). Partition-local; bytes never
    * shuffle, only the 8-byte hash does.
    */
  def audioAHash(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio_ahash", LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val h: Any = audioFingerprint(r.getAs[Array[Byte]](payloadIdx)).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  // -- real video container sniffing (RIFF/AVI header math) ----------

  /** Synthesize a REAL canonical RIFF/AVI header (RIFF → "AVI " →
    * LIST/hdrl → avih MainAVIHeader) followed by an opaque body. The
    * header layout is the genuine AVI container format; the BODY is
    * filler — synthesizing decodable video frames needs a codec a bare
    * JVM does not ship. Good enough for what a pipeline does at scan
    * time: dimension/fps/frame-count filtering BEFORE any decode.
    */
  def synthAvi(
      width: Int,
      height: Int,
      totalFrames: Int,
      usPerFrame: Int,
      bodyLen: Int = 64
  ): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(72 + bodyLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(64 + bodyLen)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(4 + 8 + 56)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")); bb.putInt(56)
    bb.putInt(usPerFrame)  // dwMicroSecPerFrame  (33-36, 1-based)
    bb.putInt(0)           // dwMaxBytesPerSec
    bb.putInt(0)           // dwPaddingGranularity
    bb.putInt(0)           // dwFlags
    bb.putInt(totalFrames) // dwTotalFrames       (49-52)
    bb.putInt(0)           // dwInitialFrames
    bb.putInt(1)           // dwStreams
    bb.putInt(0)           // dwSuggestedBufferSize
    bb.putInt(width)       // dwWidth             (65-68)
    bb.putInt(height)      // dwHeight            (69-72)
    var i = 0
    while (i < bodyLen) { bb.put(((width + i) % 251).toByte); i += 1 }
    bb.array()
  }

  /** REAL AVI container sniffing — the video face of [[headerDims]] /
    * [[audioMeta]]: codegen'd byte math over the canonical RIFF/AVI
    * MainAVIHeader, extracting struct(format, width, height, n_frames,
    * frame_us) at scan speed with the payload never leaving the scan.
    * Non-AVI (or non-canonical chunk order) → ("unknown", nulls).
    * Frame DECODE stays [[decodeStub]] — that needs a codec.
    */
  def videoMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nullInt = lit(null).cast("int")
    def dim(v: org.apache.spark.sql.Column) =
      when(v.between(0, Int.MaxValue.toLong), v).otherwise(lit(null)).cast("int")
    val isAvi = hex(substring(payload, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(payload, 9, 4)) === "41564920" &&           // "AVI "
      hex(substring(payload, 13, 4)) === "4C495354" &&          // "LIST"
      hex(substring(payload, 21, 8)) === "6864726C61766968"     // "hdrlavih"
    when(isAvi,
      struct(
        lit("avi").as("format"),
        dim(le32(payload, 65)).as("width"),
        dim(le32(payload, 69)).as("height"),
        dim(le32(payload, 49)).as("n_frames"),
        dim(le32(payload, 33)).as("frame_us")))
      .otherwise(struct(
        lit("unknown").as("format"), nullInt.as("width"), nullInt.as("height"),
        nullInt.as("n_frames"), nullInt.as("frame_us")))
  }

  /** Attach a REAL synthetic AVI-header payload derived from a numeric
    * id column — closed-form parameters, like [[withSyntheticImages]]:
    *   width    = 160 + (id % 16) * 16
    *   height   = 120 + (id % 9) * 8
    *   n_frames = 100 + id % 900
    *   frame_us = 33333 (id even) | 40000 (id odd)   (≈30 / 25 fps)
    */
  def withSyntheticVideo(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = synthAvi(
          width = (160 + (id % 16) * 16).toInt,
          height = (120 + (id % 9) * 8).toInt,
          totalFrames = (100 + id % 900).toInt,
          usPerFrame = if (id % 2 == 0) 33333 else 40000)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  // -- real video frame decode (uncompressed RIFF/AVI, 'DIB ' codec) --

  /** Synthesize a COMPLETE uncompressed RIFF/AVI file: the genuine
    * container layout (hdrl with avih + strl(strh 'vids'/'DIB ' +
    * strf BITMAPINFOHEADER) and a movi LIST of raw '00db' frames,
    * 24-bpp BI_RGB bottom-up DIB rows) — a real player opens it. Pixel
    * value is closed-form for oracle checking: every channel of every
    * pixel in row y of frame f is `(base + 7·f + y) % 256` (x-invariant
    * so frame sums stay integer-exact and SQL-expressible).
    */
  def synthAviDib(
      width: Int,
      height: Int,
      totalFrames: Int,
      usPerFrame: Int,
      base: Long
  ): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val frameBytes = stride * height
    val strlLen = 4 + (8 + 56) + (8 + 40)      // "strl" + strh + strf
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen) // "hdrl" + avih + LIST strl
    val moviLen = 4 + totalFrames * (8 + frameBytes)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val bb = java.nio.ByteBuffer
      .allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(totalFrames); bb.putInt(0); bb.putInt(1); bb.putInt(frameBytes)
    bb.putInt(width); bb.putInt(height); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)      // flags, prio/lang, initial
    bb.putInt(usPerFrame); bb.putInt(1000000)     // dwScale / dwRate
    bb.putInt(0); bb.putInt(totalFrames)          // start, length
    bb.putInt(frameBytes); bb.putInt(-1); bb.putInt(0) // sugBuf, quality, sampleSize
    bb.putShort(0); bb.putShort(0)                // rcFrame
    bb.putShort(width.toShort); bb.putShort(height.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24)               // planes, bpp
    bb.putInt(0); bb.putInt(frameBytes)           // BI_RGB, sizeImage
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
    var f = 0
    while (f < totalFrames) {
      fourcc("00db"); bb.putInt(frameBytes)
      var row = 0
      while (row < height) {
        val y = height - 1 - row // DIB rows are stored bottom-up
        val v = ((base + 7L * f + y) % 256).toByte
        var xb = 0
        while (xb < stride) { bb.put(if (xb < width * 3) v else 0.toByte); xb += 1 }
        row += 1
      }
      f += 1
    }
    bb.array()
  }

  /** REAL video frame decode for uncompressed AVI ('DIB ' / BI_RGB
    * 24-bpp) — walks the RIFF chunk tree (strf BITMAPINFOHEADER out of
    * hdrl/strl, then the movi LIST), and for every '00db'/'00dc' frame
    * sums the bottom-up BGR rows. One output row per frame:
    * `(frame_idx, frame_width, frame_height, brightness_sum,
    * top_row_sum)` — both sums exact integers (Σ of unsigned channel
    * bytes), deliberately NO float surface (the round-8 audio red-row
    * lesson: environment-proof gated columns are integers).
    * `top_row_sum` covers the image's TOP row, which is the LAST stored
    * DIB row — it pins the bottom-up orientation the frame-order-
    * invariant total cannot. Compressed codecs are out of scope (no JVM
    * video codec); non-BI_RGB/non-24bpp or malformed payloads yield
    * zero rows. Partition-local like every decode here: the payload
    * never leaves the scan, no shuffle.
    */
  def decodeVideoFrames(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_width", IntegerType),
      StructField("frame_height", IntegerType),
      StructField("brightness_sum", LongType),
      StructField("top_row_sum", LongType)
    ))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        aviDibFrames(bytes).zipWithIndex.map { case ((w, h, total, top), i) =>
          Row.fromSeq(r.toSeq ++ Seq[Any](i, w, h, total, top))
        }
      }
    }(enc)
  }

  /** Parse an uncompressed AVI; returns per-frame (width, height,
    * brightness_sum, top_row_sum) or Nil for anything malformed /
    * compressed. Bounds-checked at every step — corpus payloads are
    * untrusted bytes.
    */
  private[graft] def aviDibFrames(bytes: Array[Byte]): Seq[(Int, Int, Long, Long)] =
    aviDibLayout(bytes).map { case (width, height, stride, frames) =>
      frames.map { frameOff =>
        var total = 0L
        var row = 0
        while (row < height) {
          val rowOff = frameOff + row * stride
          var x = 0
          while (x < width * 3) { total += (bytes(rowOff + x) & 0xff); x += 1 }
          row += 1
        }
        // image TOP row = LAST stored row (bottom-up DIB)
        var top = 0L
        val topOff = frameOff + (height - 1) * stride
        var x = 0
        while (x < width * 3) { top += (bytes(topOff + x) & 0xff); x += 1 }
        (width, height, total, top)
      }
    }.getOrElse(Nil)

  /** Per-frame 64-bit average hash ([[aHash]] kernel) over decoded AVI
    * DIB frames, in IMAGE orientation (stored rows are bottom-up, so
    * stored row r is image row height-1-r — cell rows must follow the
    * image, or a vertically-flipped encode of the same scene would hash
    * differently). Nil for malformed/compressed payloads or rasters
    * under 8×8.
    */
  private[graft] def aviDibFrameHashes(bytes: Array[Byte]): Seq[Long] =
    aviDibLayout(bytes).filter { case (w, h, _, _) => w >= 8 && h >= 8 }.map {
      case (width, height, stride, frames) =>
        frames.map { frameOff =>
          val sums = new Array[Double](64)
          val counts = new Array[Long](64)
          var row = 0
          while (row < height) {
            val imgY = height - 1 - row
            val cy = imgY * 8 / height
            val rowOff = frameOff + row * stride
            var x = 0
            while (x < width) {
              val p = rowOff + x * 3
              val lum =
                ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3.0
              val cell = cy * 8 + x * 8 / width
              sums(cell) += lum
              counts(cell) += 1
              x += 1
            }
            row += 1
          }
          thresholdBits(sums, counts)
        }
    }.getOrElse(Nil)

  /** Per-frame scene fingerprints as a DataFrame: one row per decoded
    * frame with `(frame_idx, frame_ahash)` appended — feed the hash
    * into [[graft.operators.Dedup.hammingNearDup]] keyed by
    * (video_id, frame_idx) for cross-video repeated-scene detection.
    * Partition-local; pixels never leave the scan, only 8-byte hashes.
    */
  def videoFrameHashes(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_ahash", LongType)
    ))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // codec-agnostic: uncompressed 'DIB ' first, then 'MJPG' — the
        // downstream Hamming pairing never sees which codec produced
        // the 8-byte hash
        val hashes = {
          val dib = aviDibFrameHashes(bytes)
          if (dib.nonEmpty) dib else aviMjpegFrameHashes(bytes)
        }
        hashes.zipWithIndex.map { case (hsh, i) =>
          Row.fromSeq(r.toSeq ++ Seq[Any](i, hsh))
        }
      }
    }(enc)
  }

  /** Shared container parse behind [[aviDibFrames]] /
    * [[aviDibFrameHashes]]: validates the RIFF/AVI tree and returns
    * (width, height, stride, frame byte-offsets into the movi LIST), or
    * None for malformed/compressed/absurd-dimension payloads.
    */
  private[graft] def aviDibLayout(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Int])] = {
    if (bytes == null || bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None

    var width, height, bpp = 0
    var compression = -1
    var moviStart, moviEnd = -1
    // walk a chunk range; LIST chunks recurse, strf and movi are captured
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > to) return // malformed: stop
        if (id == "LIST" && size >= 4) {
          val listType = cc(off + 8)
          if (listType == "movi") { moviStart = off + 12; moviEnd = off + 8 + size }
          else walk(off + 12, off + 8 + size)
        } else if (id == "strf" && size >= 40 && compression == -1) {
          width = bb.getInt(off + 8 + 4)
          height = bb.getInt(off + 8 + 8)
          bpp = bb.getShort(off + 8 + 14).toInt
          compression = bb.getInt(off + 8 + 16)
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    if (moviStart < 0 || compression != 0 || bpp != 24 ||
        width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20)) return None
    val stride = ((width * 3 + 3) / 4) * 4
    val frameBytes = stride.toLong * height
    if (frameBytes > Int.MaxValue) return None

    val out = Seq.newBuilder[Int]
    var off = moviStart
    var truncated = false
    while (!truncated && off + 8 <= moviEnd) {
      val id = cc(off)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > moviEnd) truncated = true
      else {
        val isFrame = id.length == 4 &&
          id(0).isDigit && id(1).isDigit && (id.endsWith("db") || id.endsWith("dc"))
        if (isFrame && size >= frameBytes) out += (off + 8)
        off += 8 + size + (size & 1)
      }
    }
    Some((width, height, stride, out.result()))
  }

  /** Attach a COMPLETE synthetic uncompressed AVI payload (headers +
    * real decodable DIB frames, [[synthAviDib]]) derived from a numeric
    * id column — closed-form parameters:
    *   width    = 32 + (id % 8) * 8     (multiple of 4: no row padding)
    *   height   = 24 + (id % 6) * 4
    *   n_frames = 2 + id % 4
    *   frame_us = 33333 (id even) | 40000 (id odd)
    *   base     = id % 200              (pixel seed, see synthAviDib)
    */
  def withSyntheticVideoFrames(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = synthAviDib(
          width = (32 + (id % 8) * 8).toInt,
          height = (24 + (id % 6) * 4).toInt,
          totalFrames = (2 + id % 4).toInt,
          usPerFrame = if (id % 2 == 0) 33333 else 40000,
          base = id % 200)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  // -- compressed video: Motion-JPEG ('MJPG') ------------------------

  /** Parse an AVI whose stream is Motion-JPEG: every '00dc'/'00db'
    * chunk in the movi LIST is a COMPLETE baseline JPEG. Returns the
    * (offset, length) of each frame chunk, or None when the strf
    * BITMAPINFOHEADER does not declare biCompression = 'MJPG'.
    * Bounds-checked like [[aviDibLayout]] — untrusted corpus bytes.
    */
  private[graft] def aviMjpegLayout(bytes: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (bytes == null || bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int): String =
      if (off + 4 > bytes.length) "" else new String(bytes, off, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val MJPG = 0x47504a4d // 'MJPG' little-endian
    var compression = -1
    var moviStart, moviEnd = -1
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > to) return
        if (id == "LIST" && size >= 4) {
          val listType = cc(off + 8)
          if (listType == "movi") { moviStart = off + 12; moviEnd = off + 8 + size }
          else walk(off + 12, off + 8 + size)
        } else if (id == "strf" && size >= 40 && compression == -1) {
          compression = bb.getInt(off + 8 + 16)
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    if (moviStart < 0 || compression != MJPG) return None
    val out = Seq.newBuilder[(Int, Int)]
    var off = moviStart
    var truncated = false
    while (!truncated && off + 8 <= moviEnd) {
      val id = cc(off)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > moviEnd) truncated = true
      else {
        val isFrame = id.length == 4 &&
          id(0).isDigit && id(1).isDigit && (id.endsWith("db") || id.endsWith("dc"))
        if (isFrame && size > 0) out += ((off + 8, size))
        off += 8 + size + (size & 1)
      }
    }
    Some(out.result())
  }

  /** Synthesize a COMPLETE Motion-JPEG AVI: the genuine container
    * (hdrl with avih + strl(strh 'vids'/'MJPG' + strf with
    * biCompression='MJPG') and a movi LIST of '00dc' chunks), each
    * frame a real baseline JPEG (javax.imageio, quality 0.92) of the
    * same closed-form raster as [[synthAviDib]]: every channel of every
    * pixel in image row y of frame f is `(base + 7·f + y) % 256`.
    * JPEG is lossy — oracles on the decode are tolerance-banded, not
    * exact (MultimodalSpec).
    */
  def synthAviMjpeg(
      width: Int,
      height: Int,
      totalFrames: Int,
      usPerFrame: Int,
      base: Long
  ): Array[Byte] = {
    val frames = (0 until totalFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        val v = ((base + 7L * f + y) % 256).toInt
        val rgb = (v << 16) | (v << 8) | v
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.92f)
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      } finally { writer.dispose(); ios.close() }
      baos.toByteArray
    }
    val maxFrame = frames.map(_.length).max
    val padded = frames.map(fb => fb.length + (fb.length & 1))
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + padded.map(8 + _).sum
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val bb = java.nio.ByteBuffer
      .allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(totalFrames); bb.putInt(0); bb.putInt(1); bb.putInt(maxFrame)
    bb.putInt(width); bb.putInt(height); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(usPerFrame); bb.putInt(1000000)
    bb.putInt(0); bb.putInt(totalFrames)
    bb.putInt(maxFrame); bb.putInt(-1); bb.putInt(0)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(width.toShort); bb.putShort(height.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24)
    bb.putInt(0x47504a4d); bb.putInt(0) // biCompression = 'MJPG'
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
    frames.foreach { fb =>
      fourcc("00dc"); bb.putInt(fb.length)
      bb.put(fb)
      if ((fb.length & 1) == 1) bb.put(0.toByte) // RIFF word alignment
    }
    bb.array()
  }

  /** Attach synthetic MJPEG AVIs ([[synthAviMjpeg]]) — same closed-form
    * parameter cycles as [[withSyntheticVideoFrames]].
    */
  def withSyntheticVideoMjpeg(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    spreadIds(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = synthAviMjpeg(
          width = (32 + (id % 8) * 8).toInt,
          height = (24 + (id % 6) * 4).toInt,
          totalFrames = (2 + id % 4).toInt,
          usPerFrame = if (id % 2 == 0) 33333 else 40000,
          base = id % 200)
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  /** REAL compressed-video frame decode for Motion-JPEG AVI: each movi
    * frame chunk is a complete JPEG, decoded by the same javax.imageio
    * path as still images ([[decodeImage]]) — no external codec. One
    * output row per frame: `(frame_idx, frame_width, frame_height,
    * brightness_sum)` with brightness the integer Σ of RGB channel
    * bytes (deterministic within a JVM; JPEG loss makes it
    * tolerance-banded, not bit-pinned, across decoders). Partition-
    * local; payloads never shuffle. Non-MJPG payloads yield zero rows —
    * compose with [[decodeVideoFrames]] for 'DIB ' streams.
    */
  def decodeMjpegFrames(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_width", IntegerType),
      StructField("frame_height", IntegerType),
      StructField("brightness_sum", LongType)
    ))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        mjpegFrameStats(bytes).zipWithIndex.map { case ((w, h, sum), i) =>
          Row.fromSeq(r.toSeq ++ Seq[Any](i, w, h, sum))
        }
      }
    }(enc)
  }

  private[graft] def mjpegFrameStats(bytes: Array[Byte]): Seq[(Int, Int, Long)] =
    aviMjpegLayout(bytes).map { chunks =>
      chunks.flatMap { case (off, len) =>
        val jpeg = java.util.Arrays.copyOfRange(bytes, off, off + len)
        // ONE decode per frame: the integer channel sum comes from the
        // same bulk-grabbed raster as the dimensions (a decodeImage +
        // re-read pair would JPEG-decode every frame twice — measured
        // as the suite's costliest row before round 12)
        javax.imageio.ImageIO.setUseCache(false)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
          catch { case scala.util.control.NonFatal(_) => null }
        Option(img).map { i =>
          val (w, h) = (i.getWidth, i.getHeight)
          val px = i.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0L
          var p = 0
          while (p < px.length) {
            val rgb = px(p)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            p += 1
          }
          (w, h, sum)
        }
      }
    }.getOrElse(Nil)

  /** Per-frame aHash for an MJPEG AVI — each frame chunk IS a JPEG, so
    * the still-image [[aHash]] kernel applies directly.
    */
  private[graft] def aviMjpegFrameHashes(bytes: Array[Byte]): Seq[Long] =
    aviMjpegLayout(bytes).map { chunks =>
      chunks.flatMap { case (off, len) =>
        aHash(java.util.Arrays.copyOfRange(bytes, off, off + len))
      }
    }.getOrElse(Nil)

  /** Deterministic fake decode: features derived from payload bytes.
    * STUB retained for codecs with no JVM decoder (H.264 etc.) —
    * image decode is REAL (`decodeImage`), audio decode is REAL
    * (`decodeAudio`), video CONTAINER metadata is REAL ([[videoMeta]]),
    * UNCOMPRESSED-AVI frame decode is REAL ([[decodeVideoFrames]]), and
    * COMPRESSED Motion-JPEG frame decode is REAL
    * ([[decodeMjpegFrames]] — per-frame JPEGs through the stock
    * javax.imageio path). Signature and batch shape are the real
    * contract.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    def u(i: Int): Int = h(i) & 0xff
    val width = 64 + (u(0) * 256 + u(1)) % 1984   // 64..2047
    val height = 64 + (u(2) * 256 + u(3)) % 1984
    val frames = 1 + u(4) % 64
    val brightness = (u(5) * 256 + u(6)).toDouble / 65535.0
    (width, height, frames, brightness)
  }

  /** Partition-local decode/feature-extract over the payload column —
    * the Scala analog of a Pandas-UDF `mapInPandas` stage: rows are
    * processed in partition batches, no shuffle, payload never leaves
    * the executor.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", featureType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, f, b) = decodeStub(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, f, b))
      }
    }(enc)
  }

  /** Partition-local "resize": recompute target dimensions preserving
    * aspect ratio and produce a derived payload. STUB — the pixel
    * resample is faked as a deterministic byte slice (no codec in this
    * container); the contract (payload in → payload out + new dims,
    * partition-local, no shuffle) is real.
    */
  def resizeStub(df: DataFrame, payloadCol: String, maxSide: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized_payload", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)
    ))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, _, _) = decodeStub(bytes)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val resized = java.util.Arrays.copyOf(bytes, math.max(1, (bytes.length * scale).toInt))
        Row.fromSeq(r.toSeq ++ Seq(resized, nw, nh))
      }
    }(enc)
  }

  /** Frame sampling plan for video payloads: expand to (frame_idx, ts)
    * rows WITHOUT duplicating the payload — downstream per-frame decode
    * re-reads the payload column once per partition, not per frame.
    */
  def sampleFrames(df: DataFrame, nFramesCol: String, everyNth: Int): DataFrame =
    df.withColumn(
      "frame_idx",
      explode(expr(s"sequence(0, greatest($nFramesCol - 1, 0), $everyNth)"))
    )
}
