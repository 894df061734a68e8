package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (north-star operator family): image/audio/
 * video payloads ride as opaque `binary` columns beside a typed metadata
 * struct; decode / feature-extract / resize / frame-sample run as
 * `mapPartitions` stages (the Scala analog of arrow-batched UDFs) so one
 * decoder instance amortizes across a whole partition.
 *
 * The codec step itself is STUBBED (this container ships no image/audio
 * libraries): `StubCodec` derives deterministic fake pixels/samples from
 * the payload bytes. Everything around it — schema, batching, partition
 * sizing, null handling — is real and tested, so swapping in a JNI/javacv
 * decoder is a one-class change.
 */
object Multimodal {

  /** Canonical multimodal schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true))), nullable = true)))

  /** Pluggable decode boundary. */
  trait MediaCodec extends Serializable {
    /** payload bytes → (width, height, channels, pixels) */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** Deterministic fake decoder: "pixels" are a splitmix64 stream seeded
    * by the payload hash — stable across runs, cheap, library-free. */
  object StubCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val seed = java.util.Arrays.hashCode(bytes).toLong
      val w = 8; val h = 8; val c = 3
      val px = new Array[Float](w * h * c)
      var i = 0
      while (i < px.length) {
        px(i) = ((graft.functions.HashFunctions.mix64(seed + i) >>> 40).toInt % 256) / 255.0f
        i += 1
      }
      (w, h, c, px)
    }
  }

  /** SQL-replayable fake decoder: seed = Σ byte_i·((i·131+7) mod P) mod P,
    * pixel i = ((seed + (i+1)·2654435761) mod P mod 256)/255 — plain
    * non-overflowing int64 arithmetic, so the DuckDB correctness oracle can
    * recompute the exact same "image" from the payload bytes and the whole
    * decode→featurize pipeline gets a hash-exact cross-engine check. */
  object OracleCodec extends MediaCodec {
    private val P = graft.functions.HashFunctions.P
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var seed = 0L
      var i = 0
      while (i < bytes.length) {
        seed += (bytes(i) & 0xff).toLong * ((i.toLong * 131L + 7L) % P)
        i += 1
      }
      seed %= P
      val w = 8; val h = 8; val c = 3
      val px = new Array[Float](w * h * c)
      i = 0
      while (i < px.length) {
        px(i) = (((seed + (i + 1).toLong * 2654435761L) % P) % 256L).toInt / 255.0f
        i += 1
      }
      (w, h, c, px)
    }
  }

  /**
   * REAL image decoder for the netpbm binary formats — P6 (RGB) and P5
   * (grayscale), the classic uncompressed interchange format — built
   * from the published spec (netpbm "ppm"/"pgm" format pages): ASCII
   * header `P6 <width> <height> <maxval>` with `#` comments and
   * arbitrary whitespace, then `width·height·channels` raw samples (one
   * byte each for maxval ≤ 255, the supported range). Pixels normalize
   * to [0,1] by maxval. This is the proof that the codec boundary takes
   * actual image bytes — the oracled queries stay on OracleCodec
   * (mod-P replayability), and a JPEG/PNG decoder drops in the same way
   * via JNI/javacv where those libraries exist.
   */
  object PpmCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var pos = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"PPM/PGM decode: $msg")
      if (bytes.length < 2 || bytes(0) != 'P') fail("missing magic")
      val channels = bytes(1) match {
        case '6' => 3
        case '5' => 1
        case m => fail(s"unsupported magic P${m.toChar}")
      }
      pos = 2
      // header tokens: whitespace-separated integers; '#' starts a
      // comment running to end-of-line (per the netpbm grammar)
      def nextInt(): Int = {
        while (pos < bytes.length &&
            (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#')
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = 0
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        if (pos == start) fail("malformed header integer")
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
      if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
      // exactly ONE whitespace byte separates the header from the raster
      if (pos >= bytes.length || !bytes(pos).toChar.isWhitespace)
        fail("missing raster separator")
      pos += 1
      val n = w * h * channels
      if (bytes.length - pos < n)
        fail(s"raster truncated: need $n bytes, have ${bytes.length - pos}")
      val px = new Array[Float](n)
      var i = 0
      while (i < n) {
        px(i) = (bytes(pos + i) & 0xff).toFloat / maxval
        i += 1
      }
      (w, h, channels, px)
    }

    /** Encode (the spec's round-trip half): pixels in [0,1] → P6/P5
      * bytes with maxval 255. */
    def encodeImage(w: Int, h: Int, channels: Int,
        px: Array[Float]): Array[Byte] = {
      require(channels == 3 || channels == 1, s"channels $channels")
      require(px.length == w * h * channels, "pixel count mismatch")
      val magic = if (channels == 3) "P6" else "P5"
      val header = s"$magic\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + px.length)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = 0
      while (i < px.length) {
        out(header.length + i) =
          math.max(0, math.min(255, math.round(px(i) * 255.0f))).toByte
        i += 1
      }
      out
    }
  }

  /** Wrap any binary column of `df` into the canonical media schema. */
  def toMediaFrame(df: DataFrame, idCol: String, binCol: String,
      format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(binCol).cast(BinaryType).as("content"),
      struct(
        lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("n_channels")).as("meta"))

  /**
   * Decode + feature-extract: per partition, one codec instance processes
   * every row; output is (media_id, width, height, n_channels, mean_rgb
   * array, embedding array). Arrow-style batching is implicit in Spark's
   * columnar scan; the mapPartitions boundary is where a real decoder's
   * native buffers would live.
   */
  def decodeAndFeaturize(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("mean_channel", ArrayType(DoubleType, containsNull = false), nullable = false),
      // exact 8-bit channel sums (Σ round(px·255) per channel): the
      // integer twin of mean_channel, used for float-free oracle checks
      StructField("channel_sum", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null) Iterator.empty
        else {
          val (w, h, c, px) = codec.decodeImage(bytes)
          val means = new Array[Double](c)
          val sums = new Array[Long](c)
          var i = 0
          while (i < px.length) {
            means(i % c) += px(i)
            sums(i % c) += math.round(px(i) * 255.0f).toLong
            i += 1
          }
          var j = 0
          while (j < c) { means(j) /= (w * h); j += 1 }
          Iterator(Row(r.getLong(0), w, h, c, means.toIndexedSeq, sums.toIndexedSeq))
        }
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video-like payloads: every
    * `stride`-th frame index up to `maxFrames` — pure projection, the
    * actual frame decode sits behind the same codec boundary. */
  def sampleFrameIndexes(media: DataFrame, nFrames: Int, stride: Int,
      maxFrames: Int = 64): DataFrame =
    media.withColumn("frame_idx",
      explode(slice(sequence(lit(0), lit(maxFrames - 1), lit(stride)), 1, nFrames)))

  /**
   * Resize: 8×8 → 4×4 by 2×2 block aggregation over the decoded
   * channel-0 plane — the downsample step of an image pipeline, kept in
   * INTEGER block sums (the mean is sum/4, a caller-side projection) so
   * the resampling arithmetic is exact and SQL-replayable. Emits the
   * corner blocks and the plane total per media.
   */
  def resizeFeatures(media: DataFrame, codec: MediaCodec = OracleCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("b00_sum", LongType, nullable = false),
      StructField("b33_sum", LongType, nullable = false),
      StructField("c0_total", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null) Iterator.empty
        else {
          val (w, h, c, px) = codec.decodeImage(bytes)
          // channel-0 plane as exact 8-bit ints
          def p(row: Int, colI: Int): Long =
            math.round(px((row * w + colI) * c) * 255.0f).toLong
          def block(bi: Int, bj: Int): Long =
            p(2 * bi, 2 * bj) + p(2 * bi, 2 * bj + 1) +
              p(2 * bi + 1, 2 * bj) + p(2 * bi + 1, 2 * bj + 1)
          var total = 0L
          var i = 0
          while (i < h) { var j = 0; while (j < w) { total += p(i, j); j += 1 }; i += 1 }
          Iterator(Row(r.getLong(0), block(0, 0), block(3, 3), total))
        }
      }
    }(enc)
  }

  /**
   * Frame sampling + per-frame featurization for video-like payloads:
   * the sampled frame's "decode" derives a frame seed from the payload
   * seed (same fold as OracleCodec) offset by frame_idx·524287 mod P, so
   * the whole explode→decode→aggregate shape is exercised with
   * SQL-replayable integers. One codec pass per (row, frame) inside
   * mapPartitions — exactly where a real video decoder would seek and
   * decode its keyframes.
   */
  def frameFeatures(media: DataFrame, nFrames: Int, stride: Int): DataFrame = {
    val P = graft.functions.HashFunctions.P
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("c0_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    sampleFrameIndexes(media.select(col("media_id"), col("content")),
      nFrames, stride)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes == null) Iterator.empty
          else {
            var seed = 0L
            var i = 0
            while (i < bytes.length) {
              seed += (bytes(i) & 0xff).toLong * ((i.toLong * 131L + 7L) % P)
              i += 1
            }
            val idx = r.getAs[Int]("frame_idx")
            val fseed = (seed % P + idx.toLong * 524287L) % P
            // channel-0 pixel sum of the 8×8×3 deterministic frame
            var s = 0L
            i = 1
            while (i <= 192) {
              if ((i - 1) % 3 == 0) s += ((fseed + i.toLong * 2654435761L) % P) % 256L
              i += 1
            }
            Iterator(Row(r.getLong(0), idx, s))
          }
        }
      }(enc)
  }
}
