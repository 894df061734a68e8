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
 * The codec boundary ships FIVE codecs, four of them real decoders built
 * on the JDK alone (no image/audio libraries in this container): `PngCodec`
 * (RFC 2083 — zlib inflate via `java.util.zip`, all five scanline
 * filters, greyscale + truecolor), `PpmCodec` (binary P5/P6 netpbm),
 * `WavCodec` (RIFF PCM), `AviCodec` (RIFF/AVI frame walk), plus the
 * deterministic `StubCodec`/`OracleCodec` (mod-P fake pixels, kept for
 * cross-engine oracle replayability — the one codec DuckDB can re-derive
 * in SQL). Everything around the boundary — schema, batching, partition
 * sizing, null handling — is codec-agnostic, so a JNI/javacv decoder for
 * formats beyond this subset remains a one-class change.
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

  /** Pluggable decode boundary.
    *
    * OUTPUT-SIZE CONTRACT (CodecFuzzSpec drives it adversarially): a
    * decoder's allocations are bounded by the payload's DECLARED
    * dimensions, and the declared dimensions themselves are capped at
    * [[MaxSide]] per side / [[MaxPixels]] total — a crafted header
    * claiming a 100k×100k raster fails loudly instead of allocating.
    * On any malformed input the decoder throws an `Exception` (which
    * `decodeWithQuarantine` routes to a quarantine row); it never spins,
    * never allocates beyond the cap, never exits the JVM. */
  trait MediaCodec extends Serializable {
    /** payload bytes → (width, height, channels, pixels) */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** Declared-dimension caps shared by every shipped decoder (image and
    * video): 32768 per side, 64M pixels total — 192 MB of 8-bit RGB
    * raster, the upper bound of one decode's transient allocation. */
  val MaxSide: Int = 32768
  val MaxPixels: Long = 64L * 1024 * 1024

  /** Pluggable audio decode boundary — the audio twin of `MediaCodec`. */
  trait AudioCodec extends Serializable {
    /** payload bytes → (sampleRate, nChannels, interleaved samples in [-1,1]) */
    def decodeAudio(bytes: Array[Byte]): (Int, Int, Array[Float])
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
        var v = 0L
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
          // overflow guard: a 40-digit header integer must fail, not wrap
          // Int into a small positive that passes the truncation check
          if (v > Int.MaxValue) fail("header integer out of range")
        }
        if (pos == start) fail("malformed header integer")
        v.toInt
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide ||
          w.toLong * h > MaxPixels)
        fail(s"bad dimensions ${w}x$h")
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

  /**
   * Real PNG decode (RFC 2083) behind the same `MediaCodec` boundary:
   * 8-bit greyscale (color type 0) and truecolor (type 2),
   * non-interlaced — the deterministic subset a curation pipeline
   * actually stores. The zlib stream inflates through `java.util.zip`
   * (no new dependency) and filter reconstruction implements all five
   * per-scanline filters (None/Sub/Up/Average/Paeth). Everything outside
   * the subset — 16-bit, palette, alpha, interlace — fails loudly, the
   * WavCodec non-PCM precedent: a training pipeline wants a quarantine
   * row, not silently garbage pixels.
   */
  object PngCodec extends MediaCodec {
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
      b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
    }

    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PNG decode: $msg")
      if (bytes.length < 8 || !bytes.take(8).sameElements(Sig))
        fail("missing signature")
      var pos = 8
      var w = 0; var h = 0; var channels = 0; var seenIhdr = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        if (pos + 8 > bytes.length) fail("truncated chunk header")
        val len = be32(bytes, pos)
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        if (len < 0 || pos + 12 + len > bytes.length)
          fail(s"truncated $typ chunk")
        val data = pos + 8
        typ match {
          case "IHDR" =>
            if (len != 13) fail("bad IHDR length")
            w = be32(bytes, data); h = be32(bytes, data + 4)
            val depth = bytes(data + 8) & 0xff
            val ct = bytes(data + 9) & 0xff
            if (depth != 8) fail(s"unsupported bit depth $depth")
            channels = ct match {
              case 0 => 1
              case 2 => 3
              case c => fail(s"unsupported color type $c")
            }
            if ((bytes(data + 10) & 0xff) != 0 || (bytes(data + 11) & 0xff) != 0)
              fail("unsupported compression/filter method")
            if ((bytes(data + 12) & 0xff) != 0) fail("interlaced PNG unsupported")
            // declared-dimension cap (MediaCodec contract): without it a
            // 12-byte IHDR claiming 100k×100k drives a multi-GB raster
            // allocation before one IDAT byte inflates
            if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide ||
                w.toLong * h > MaxPixels)
              fail(s"bad dimensions ${w}x$h")
            seenIhdr = true
          case "IDAT" => idat.write(bytes, data, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks (tEXt, pHYs, ...) are skippable
        }
        pos = data + len + 4 // skip CRC (integrity is the store's job here)
      }
      if (!seenIhdr) fail("no IHDR chunk")
      if (idat.size == 0) fail("no IDAT data")
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val k =
            try inf.inflate(raw, off, raw.length - off)
            catch { case e: java.util.zip.DataFormatException =>
              fail(s"corrupt zlib stream: ${e.getMessage}") }
          if (k == 0) {
            // zero progress with the stream unfinished: fail loudly, never
            // spin (ADVICE r12 — an FDICT preset-dictionary stream returns
            // 0 with needsInput()==false forever)
            if (inf.needsDictionary())
              fail("zlib preset dictionary (FDICT) unsupported")
            if (inf.needsInput()) fail("zlib stream truncated")
            fail("corrupt zlib stream: inflate made no progress")
          }
          off += k
        }
      } finally inf.end()
      if (off != raw.length)
        fail(s"raster size mismatch: inflated $off of ${raw.length} bytes")
      // reconstruct scanlines (filters are defined on the BYTE stream;
      // bpp = channels at 8-bit depth)
      val out = new Array[Byte](stride * h)
      val bpp = channels
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        val rowIn = y * (stride + 1) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
          val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
          val rec = f match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + b
            case 3 => cur + ((a + b) >> 1)
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case other => fail(s"unknown filter $other on scanline $y")
          }
          out(rowOut + x) = rec.toByte
          x += 1
        }
        y += 1
      }
      val px = new Array[Float](stride * h)
      var i = 0
      while (i < px.length) { px(i) = (out(i) & 0xff) / 255.0f; i += 1 }
      (w, h, channels, px)
    }

    /** Encode (the spec's round-trip half): pixels in [0,1] → one-IDAT
      * PNG. `rowFilter` applies that filter (0–4) to EVERY scanline so
      * the spec can prove each reconstruction path against a round trip,
      * not just the filter-0 identity. */
    def encodeImage(w: Int, h: Int, channels: Int, px: Array[Float],
        rowFilter: Int = 0): Array[Byte] = {
      require(channels == 1 || channels == 3, s"channels $channels")
      require(px.length == w * h * channels, "pixel count mismatch")
      require(rowFilter >= 0 && rowFilter <= 4, s"filter $rowFilter")
      val stride = w * channels
      val bpp = channels
      val pix = new Array[Byte](stride * h)
      var i = 0
      while (i < pix.length) {
        pix(i) = math.max(0, math.min(255, math.round(px(i) * 255.0f))).toByte
        i += 1
      }
      val raw = new Array[Byte]((stride + 1) * h)
      var y = 0
      while (y < h) {
        raw(y * (stride + 1)) = rowFilter.toByte
        var x = 0
        while (x < stride) {
          val cur = pix(y * stride + x) & 0xff
          val a = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
          val b = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) & 0xff else 0
          val pred = rowFilter match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          raw(y * (stride + 1) + 1 + x) = (cur - pred).toByte
          x += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
      defl.end()
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val c = new Array[Byte](12 + data.length)
        putBe32(c, 0, data.length)
        System.arraycopy(typ.getBytes("US-ASCII"), 0, c, 4, 4)
        System.arraycopy(data, 0, c, 8, data.length)
        val crc = new java.util.zip.CRC32()
        crc.update(c, 4, 4 + data.length)
        putBe32(c, 8 + data.length, crc.getValue.toInt)
        c
      }
      val ihdr = new Array[Byte](13)
      putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
      ihdr(8) = 8; ihdr(9) = (if (channels == 3) 2 else 0).toByte
      Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
  }

  /** SQL-replayable fake audio decoder (the audio twin of `OracleCodec`):
    * seed = Σ byte_i·((i·131+7) mod P) mod P over the payload, then 256
    * mono samples at 16 kHz where quantized sample i (1-based) is
    * q_i = ((seed + i·2654435761) mod P) mod 4096 − 2048 and the float
    * sample is q_i/2048 — exact in float32 (|q_i| ≤ 2048 and the divisor
    * is a power of two), so `audioFeatures`' round(s·2048) recovers q_i
    * bit-exactly and the DuckDB oracle recomputes identical integers. */
  object OracleAudioCodec extends AudioCodec {
    private val P = graft.functions.HashFunctions.P
    def decodeAudio(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      var seed = 0L
      var i = 0
      while (i < bytes.length) {
        seed += (bytes(i) & 0xff).toLong * ((i.toLong * 131L + 7L) % P)
        i += 1
      }
      seed %= P
      val n = 256
      val out = new Array[Float](n)
      i = 0
      while (i < n) {
        val q = ((seed + (i + 1).toLong * 2654435761L) % P) % 4096L - 2048L
        out(i) = q.toInt / 2048.0f
        i += 1
      }
      (16000, 1, out)
    }
  }

  /**
   * REAL audio decoder for RIFF/WAVE PCM — the uncompressed interchange
   * format every audio toolchain emits — built from the published RIFF
   * spec: `RIFF <size> WAVE`, then chunks; `fmt ` carries
   * (audioFormat=1 PCM, nChannels, sampleRate, bitsPerSample ∈ {8, 16}),
   * `data` carries the interleaved frames (8-bit unsigned, 16-bit signed
   * little-endian). Samples normalize to [-1,1]. Proof that the audio
   * boundary takes actual audio bytes — the oracled query stays on
   * OracleAudioCodec (mod-P replayability); an MP3/FLAC decoder drops in
   * the same way via JNI where those libraries exist.
   */
  /** Little-endian RIFF primitives shared by the WAV and AVI codecs —
    * one definition, so a bounds/endianness fix reaches both. */
  private object Riff {
    def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def tag(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")
  }

  object WavCodec extends AudioCodec {
    import Riff.{tag, u16, u32}
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"WAV decode: $msg")

    def decodeAudio(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
        fail("missing RIFF/WAVE header")
      var pos = 12
      var sampleRate = -1; var channels = -1; var bits = -1
      var data: (Int, Int) = null // (offset, length)
      // chunk walk: <4-byte id><4-byte LE size><payload, word-aligned>
      while (pos + 8 <= bytes.length) {
        val id = tag(bytes, pos)
        val sz = u32(bytes, pos + 4).toInt
        val body = pos + 8
        if (sz < 0 || body + sz > bytes.length) fail(s"chunk $id overruns payload")
        id match {
          case "fmt " =>
            if (sz < 16) fail("fmt chunk truncated")
            val fmt = u16(bytes, body)
            if (fmt != 1) fail(s"unsupported audioFormat $fmt (PCM only)")
            channels = u16(bytes, body + 2)
            sampleRate = u32(bytes, body + 4).toInt
            bits = u16(bytes, body + 14)
            if (channels <= 0) fail(s"bad channel count $channels")
            if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
            if (bits != 8 && bits != 16) fail(s"unsupported bitsPerSample $bits")
          case "data" => data = (body, sz)
          case _ => // LIST/INFO/fact… — skipped, per the spec
        }
        pos = body + sz + (sz & 1) // chunks are word-aligned
      }
      if (bits < 0) fail("no fmt chunk")
      if (data == null) fail("no data chunk")
      val (off, len) = data
      val bytesPer = bits / 8
      val n = len / bytesPer
      val out = new Array[Float](n)
      var i = 0
      if (bits == 8) {
        // 8-bit WAV is UNSIGNED (the format's one asymmetry)
        while (i < n) { out(i) = ((bytes(off + i) & 0xff) - 128) / 128.0f; i += 1 }
      } else {
        while (i < n) {
          out(i) = u16(bytes, off + 2 * i).toShort / 32768.0f
          i += 1
        }
      }
      (sampleRate, channels, out)
    }

    /** Encode (the spec's round-trip half): samples in [-1,1] →
      * 16-bit PCM little-endian WAV. */
    def encodeAudio(sampleRate: Int, channels: Int,
        samples: Array[Float]): Array[Byte] = {
      require(sampleRate > 0 && channels > 0, "bad rate/channels")
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) {
        val v = math.max(-32768, math.min(32767, math.round(samples(i) * 32768.0f)))
        buf.putShort(v.toShort)
        i += 1
      }
      buf.array()
    }
  }

  /** Pluggable video decode boundary — frames come back frame-major. */
  trait VideoCodec extends Serializable {
    /** payload bytes → (width, height, channels, frames as [0,1] pixels) */
    def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, IndexedSeq[Array[Float]])

    /** Bounded decode for frame sampling: implementations SHOULD stop
      * parsing after `maxFrames` (AviCodec does); the default truncates
      * after a full decode, which is correct but unbounded in memory. */
    def decodeVideo(bytes: Array[Byte],
        maxFrames: Int): (Int, Int, Int, IndexedSeq[Array[Float]]) = {
      val (w, h, c, f) = decodeVideo(bytes)
      (w, h, c, f.take(maxFrames))
    }
  }

  /**
   * REAL video decoder for RIFF/AVI with uncompressed BI_RGB 24-bit
   * frames — the same RIFF chunk grammar as WavCodec, one level deeper
   * (`LIST` chunks nest): `RIFF 'AVI '` → `LIST hdrl` carrying `avih`
   * (dwWidth/dwHeight at byte 32/36) and `LIST strl` → `strf`
   * (BITMAPINFOHEADER; biCompression must be 0 = BI_RGB, biBitCount 24),
   * then `LIST movi` whose `..db`/`..dc` chunks are the frames: DIB
   * bottom-UP rows of BGR bytes, each row padded to a 4-byte boundary.
   * Decoded frames come back top-down RGB in [0,1]. Proof that the video
   * boundary takes a real container; compressed codecs drop in via JNI
   * where those libraries exist.
   */
  object AviCodec extends VideoCodec {
    import Riff.{tag, u16, u32}
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"AVI decode: $msg")

    def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, IndexedSeq[Array[Float]]) =
      decodeVideo(bytes, Int.MaxValue)

    /** Bounded decode: parsing STOPS after `maxFrames` frame chunks, so
      * sampling k frames of a long payload never materializes the rest
      * (a decoded frame is 12 bytes/pixel vs 3 in the container). */
    override def decodeVideo(bytes: Array[Byte],
        maxFrames: Int): (Int, Int, Int, IndexedSeq[Array[Float]]) = {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
        fail("missing RIFF/AVI header")
      var w = -1; var h = -1; var bpp = -1
      // last-seen strh stream type gates strf interpretation: an AVI
      // interleaves video ('vids') and audio ('auds') stream headers, and
      // an audio format block must not be misread as BITMAPINFOHEADER
      var strhType = ""
      var nFrames = 0
      val frames = IndexedSeq.newBuilder[Array[Float]]
      // recursive chunk walk; LIST bodies start with a 4-byte list type
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = tag(bytes, pos)
          val sz = u32(bytes, pos + 4).toInt
          val body = pos + 8
          if (sz < 0 || body + sz > to) fail(s"chunk $id overruns payload")
          id match {
            case "LIST" => walk(body + 4, body + sz) // skip the list type
            case "avih" =>
              if (sz < 40) fail("avih truncated")
              w = u32(bytes, body + 32).toInt
              h = u32(bytes, body + 36).toInt
              // dimension cap (MaxSide/MaxPixels, the MediaCodec
              // contract): Long-safe here, and keeps every derived size
              // (stride·h, w·h·3) inside Int — a crafted 65536×65536
              // header would otherwise wrap the frame-size check to 0 and
              // crash with an array error instead of failing loudly
              if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide ||
                  w.toLong * h > MaxPixels)
                fail(s"bad dimensions ${w}x$h")
            case "strh" =>
              if (sz >= 4) strhType = tag(bytes, body)
            case "strf" if strhType == "vids" =>
              // BITMAPINFOHEADER of the VIDEO stream — gated on the
              // preceding strh fccType, because an audio strf (e.g. an
              // extended WAVEFORMATEX) can pass any size/field heuristic
              if (sz < 20) fail("video strf truncated")
              bpp = u16(bytes, body + 14)
              val compression = u32(bytes, body + 16)
              if (compression != 0) fail(s"unsupported biCompression $compression (BI_RGB only)")
              if (bpp != 24) fail(s"unsupported biBitCount $bpp (24-bit only)")
            case frameId if nFrames < maxFrames && frameId.length == 4 &&
                (frameId.endsWith("db") || frameId.endsWith("dc")) =>
              if (w < 0 || bpp < 0) fail("frame chunk before headers")
              val stride = ((w * 3 + 3) / 4) * 4
              if (sz < stride * h) fail(s"frame truncated: need ${stride * h}, have $sz")
              nFrames += 1
              val px = new Array[Float](w * h * 3)
              var row = 0
              while (row < h) {
                val src = body + (h - 1 - row) * stride // bottom-up
                var c = 0
                while (c < w) {
                  val o = (row * w + c) * 3
                  px(o) = (bytes(src + c * 3 + 2) & 0xff) / 255.0f     // R
                  px(o + 1) = (bytes(src + c * 3 + 1) & 0xff) / 255.0f // G
                  px(o + 2) = (bytes(src + c * 3) & 0xff) / 255.0f     // B
                  c += 1
                }
                row += 1
              }
              frames += px
            case _ => // idx1, strh, strn, JUNK… — skipped
          }
          pos = body + sz + (sz & 1)
        }
      }
      walk(12, bytes.length)
      if (w < 0) fail("no avih header")
      val out = frames.result()
      if (out.isEmpty) fail("no frame chunks")
      (w, h, 3, out)
    }

    /** Encode (the spec's round-trip half): frames of [0,1] RGB pixels →
      * minimal uncompressed AVI (avih + vids strl + movi of 00db DIBs). */
    def encodeVideo(w: Int, h: Int, frames: Seq[Array[Float]]): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h * 3), "frame shape")
      val stride = ((w * 3 + 3) / 4) * 4
      def dib(px: Array[Float]): Array[Byte] = {
        val out = new Array[Byte](stride * h)
        for (row <- 0 until h; c <- 0 until w) {
          val o = ((h - 1 - row) * stride) + c * 3
          val i = (row * w + c) * 3
          def q(v: Float) = math.max(0, math.min(255, math.round(v * 255.0f))).toByte
          out(o) = q(px(i + 2)); out(o + 1) = q(px(i + 1)); out(o + 2) = q(px(i))
        }
        out
      }
      val buf = new java.io.ByteArrayOutputStream()
      val le = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def put4(s: String) = buf.write(s.getBytes("US-ASCII"))
      def putI(v: Int) = { le.clear(); le.putInt(v); buf.write(le.array(), 0, 4) }
      // sizes: avih 56-byte body; strh 56; strf 40; headers assembled inner-out
      val strl = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
      val hdrl = 4 + (8 + 56) + (8 + strl) // 'hdrl' + avih + LIST strl
      val movi = 4 + frames.size * (8 + stride * h)
      val riff = 4 + (8 + hdrl) + (8 + movi)
      put4("RIFF"); putI(riff); put4("AVI ")
      put4("LIST"); putI(hdrl); put4("hdrl")
      put4("avih"); putI(56)
      putI(40000); putI(0); putI(0); putI(0); putI(frames.size); putI(0)
      putI(1); putI(0); putI(w); putI(h); putI(0); putI(0); putI(0); putI(0)
      put4("LIST"); putI(strl); put4("strl")
      put4("strh"); putI(56)
      put4("vids"); put4("DIB "); putI(0); putI(0); putI(0)
      putI(1); putI(25); putI(0); putI(frames.size); putI(stride * h)
      putI(-1); putI(0); putI(0); putI(0)
      put4("strf"); putI(40)
      putI(40); putI(w); putI(h)
      le.clear(); le.putShort(1).putShort(24); buf.write(le.array(), 0, 4) // planes, bpp
      putI(0); putI(stride * h); putI(0); putI(0); putI(0); putI(0)
      put4("LIST"); putI(movi); put4("movi")
      frames.foreach { f => put4("00db"); putI(stride * h); buf.write(dib(f)) }
      buf.toByteArray
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

  /**
   * JDK-backed general image codec: `javax.imageio` ships IN the JDK
   * (no container dependency) with readers for JPEG, BMP, GIF, and PNG
   * beyond the hand-rolled subset — palette, alpha (composited over
   * black by channel truncation: we emit 1 or 3 channels), interlace.
   * Output matches the codec contract: row-major interleaved channels,
   * [0,1] floats at 8-bit resolution. The hand-rolled PngCodec stays the
   * default for PNG because its arithmetic is documented and
   * deterministic by construction; MultimodalSpec cross-validates the
   * two bit-for-bit on shared ground. Unrecognized bytes fail loudly
   * (ImageIO.read returns null — mapped to the codec contract's error),
   * which is what `decodeWithQuarantine` catches.
   */
  object ImageIoCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          "ImageIO decode: unrecognized or corrupt image payload")
      val w = img.getWidth; val h = img.getHeight
      val gray = img.getColorModel.getNumColorComponents == 1
      if (gray) {
        val px = new Array[Float](w * h)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = raster.getSample(x, y, 0) / 255.0f
            x += 1
          }
          y += 1
        }
        (w, h, 1, px)
      } else {
        val px = new Array[Float](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val o = (y * w + x) * 3
            px(o) = ((rgb >> 16) & 0xff) / 255.0f
            px(o + 1) = ((rgb >> 8) & 0xff) / 255.0f
            px(o + 2) = (rgb & 0xff) / 255.0f
            x += 1
          }
          y += 1
        }
        (w, h, 3, px)
      }
    }
  }

  /**
   * Quarantine-aware decode: the codec contract fails loudly on
   * malformed payloads, and at 100 TB a curation pipeline wants those
   * failures as ROWS (routed to a quarantine table for re-crawl or
   * audit), not as task aborts that kill the whole stage after four
   * retries. Same shape as `decodeAndFeaturize` plus `ok`/`error`
   * columns: ok rows carry the features with error null, failed rows
   * carry nulls with the codec's message. One narrow mapPartitions
   * stage; `.filter(col("ok"))` / `.filter(!col("ok"))` split the
   * streams downstream with no second decode.
   */
  def decodeWithQuarantine(media: DataFrame,
      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("mean_channel", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("channel_sum", ArrayType(LongType, containsNull = false), nullable = true),
      StructField("error", StringType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null)
          Row(id, false, null, null, null, null, null, "null payload")
        else {
          try {
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
            Row(id, true, w, h, c, means.toIndexedSeq, sums.toIndexedSeq, null)
          } catch {
            case e: Exception =>
              Row(id, false, null, null, null, null, null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
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

  /** Frame featurization over REAL container bytes — the real-bytes twin
    * of `frameFeatures`' seeded fake: one decode per payload inside
    * mapPartitions, then every `stride`-th frame (up to `nFrames`) emits
    * its channel-0 8-bit integer sum. Same schema, same scale shape (one
    * row-linear stage, payloads never shuffle). */
  def videoFrameFeatures(media: DataFrame, codec: VideoCodec,
      nFrames: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("c0_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null) Iterator.empty
        else {
          // bounded decode: nothing past the last sampled index is
          // materialized (decoded frames are 12 bytes/pixel vs 3 raw)
          val (w, h, c, frames) =
            codec.decodeVideo(bytes, (nFrames - 1) * stride + 1)
          (0 until nFrames).iterator.map(_ * stride)
            .filter(_ < frames.length).map { idx =>
              val px = frames(idx)
              var s = 0L
              var i = 0
              while (i < w * h) {
                s += math.round(px(i * c) * 255.0f).toLong
                i += 1
              }
              Row(r.getLong(0), idx, s)
            }
        }
      }
    }(enc)
  }

  /**
   * Audio decode + feature-extract — the audio leg of the multimodal
   * family: per partition, one codec instance decodes every payload;
   * features are computed on the 12-bit quantization q = round(s·2048)
   * (exact integers, so the cross-engine oracle hash-compares rather than
   * float-compares): `abs_sum` (Σ|q|, loudness), `dc_sum` (Σq, DC offset),
   * and `zero_cross` (sign changes over the interleaved stream — the
   * classic voiced/unvoiced discriminator). Same 100-TB shape as the
   * image path: a narrow row-linear mapPartitions stage, no shuffle.
   */
  def audioFeatures(media: DataFrame, codec: AudioCodec = OracleAudioCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("abs_sum", LongType, nullable = false),
      StructField("dc_sum", LongType, nullable = false),
      StructField("zero_cross", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null) Iterator.empty
        else {
          val (sr, ch, smp) = codec.decodeAudio(bytes)
          var absSum = 0L; var dcSum = 0L; var zc = 0L
          var prevNeg = false
          var i = 0
          while (i < smp.length) {
            val q = math.round(smp(i) * 2048.0f).toLong
            absSum += math.abs(q); dcSum += q
            val neg = q < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          Iterator(Row(r.getLong(0), sr, ch, smp.length, absSum, dcSum, zc))
        }
      }
    }(enc)
  }
}
