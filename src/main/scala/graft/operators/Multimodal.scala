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
  * The decode kernel itself is STUBBED (`decodeStub`): this container
  * ships no image/audio codecs, so the stub derives deterministic fake
  * features from the bytes (size, sha-derived dims). The Spark-side
  * contract — schema, batch shape, partition-local execution via
  * `mapPartitions`, metadata pruning — is real and is what the tests
  * cover. Swap `decodeStub` for a JNI/FFmpeg/Pillow-equivalent kernel
  * (or a Python `mapInPandas` stage in PySpark) without touching the
  * plan shape.
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

  /** Deterministic fake decode: features derived from payload bytes.
    * STUB — replace with a real codec kernel; signature and batch shape
    * are the real contract.
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
