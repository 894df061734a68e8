package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/**
 * Adversarial fuzz for the codec boundary (VERDICT r13 next #7): mutate
 * VALID PNG/PPM/WAV/AVI fixtures — truncations, byte flips, corrupted
 * 4-byte length/dimension fields, junk tails — and assert the
 * MediaCodec output-size contract holds on every mutation:
 *
 *   - the decoder either decodes (within the declared-dimension caps,
 *     MaxSide/MaxPixels) or throws an `Exception` that
 *     `decodeWithQuarantine` would route to a quarantine row;
 *   - it never throws an `Error` (OOM from a crafted header, stack
 *     overflow), never spins (each decode is wall-clock-bounded far
 *     below the no-progress guards' worst case), never kills the JVM.
 *
 * This is the poison-byte half of the quarantine story: Multimodal's
 * decode runs inside executor tasks at 100 TB, where one unbounded
 * allocation is a stage-killing OOM, not a caught row.
 */
class CodecFuzzSpec extends AnyFunSuite with graft.PropHelper {

  import Multimodal._

  // deterministic valid fixtures, one per container
  private val pngRgb: Array[Byte] = {
    val px = Array.tabulate(8 * 8 * 3)(i => ((i * 37) % 256) / 255.0f)
    PngCodec.encodeImage(8, 8, 3, px, rowFilter = 3)
  }
  private val ppm: Array[Byte] = {
    val px = Array.tabulate(6 * 4 * 3)(i => ((i * 29) % 256) / 255.0f)
    PpmCodec.encodeImage(6, 4, 3, px)
  }
  private val wav: Array[Byte] = {
    val samples = Array.tabulate(256)(i => math.sin(i / 8.0).toFloat * 0.8f)
    WavCodec.encodeAudio(8000, 1, samples)
  }
  private val avi: Array[Byte] = {
    val frame = Array.tabulate(4 * 4 * 3)(i => ((i * 53) % 256) / 255.0f)
    AviCodec.encodeVideo(4, 4, Seq(frame, frame.map(v => 1.0f - v)))
  }

  /** Apply one mutation; returns the mutated copy. */
  private def mutate(base: Array[Byte], kind: Int, off: Int, v: Int): Array[Byte] =
    kind match {
      case 0 => // truncate
        base.take(math.max(0, off % math.max(1, base.length)))
      case 1 => // flip one byte
        val b = base.clone(); b(off % b.length) = v.toByte; b
      case 2 => // corrupt a 4-byte window (length fields, dimensions)
        val b = base.clone()
        val o = off % math.max(1, b.length - 4)
        b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
        b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
        b
      case 3 => // huge-length bomb: 0xFFFFFFFF into a 4-byte window
        val b = base.clone()
        val o = off % math.max(1, b.length - 4)
        java.util.Arrays.fill(b, o, o + 4, 0xff.toByte)
        b
      case _ => // junk tail
        base ++ Array.tabulate(32)(i => ((v + i * 17) % 256).toByte)
    }

  /** The contract assertion: decode completes promptly with bounded
    * output, or throws an Exception. Errors propagate and fail. */
  private def contained(label: String)(decode: => (Long, Long)): Unit = {
    val t0 = System.nanoTime()
    try {
      val (pixels, outLen) = decode
      assert(pixels <= MaxPixels, s"$label: $pixels pixels exceeds MaxPixels")
      assert(outLen <= MaxPixels * 3, s"$label: output $outLen exceeds the raster cap")
    } catch {
      case _: Exception => () // the quarantine route — by contract
    }
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ms < 5000, s"$label: decode took ${ms}ms on a mutated payload — spin?")
  }

  private val mutationGen = for {
    kind <- Gen.choose(0, 4)
    off <- Gen.choose(0, 4096)
    v <- Gen.choose(Int.MinValue, Int.MaxValue)
  } yield (kind, off, v)

  test("fuzz PNG: every mutation decodes or quarantines — never hangs, never over-allocates") {
    forAllG(mutationGen) { case (kind, off, v) =>
      val b = mutate(pngRgb, kind, off, v)
      contained(s"png k=$kind o=$off v=$v") {
        val (w, h, c, px) = PngCodec.decodeImage(b)
        (w.toLong * h, px.length.toLong.max(w.toLong * h * c))
      }
    }
  }

  test("fuzz PPM: header-integer overflow and dimension bombs fail loudly") {
    forAllG(mutationGen) { case (kind, off, v) =>
      val b = mutate(ppm, kind, off, v)
      contained(s"ppm k=$kind o=$off v=$v") {
        val (w, h, c, px) = PpmCodec.decodeImage(b)
        (w.toLong * h, px.length.toLong.max(w.toLong * h * c))
      }
    }
    // directed: a 40-digit width must fail, not wrap into a small Int
    val bomb = ("P6\n" + "9" * 40 + " 4\n255\n" + "x" * 64).getBytes("US-ASCII")
    val e = intercept[IllegalArgumentException](PpmCodec.decodeImage(bomb))
    assert(e.getMessage.contains("out of range"))
  }

  test("fuzz WAV: chunk-walk mutations decode or quarantine; output bounded by payload") {
    forAllG(mutationGen) { case (kind, off, v) =>
      val b = mutate(wav, kind, off, v)
      contained(s"wav k=$kind o=$off v=$v") {
        val (_, _, samples) = WavCodec.decodeAudio(b)
        // audio output is bounded by the payload itself (≤ 1 float/byte)
        assert(samples.length <= b.length, "WAV output exceeds payload bound")
        (0L, 0L)
      }
    }
  }

  test("fuzz AVI: nested-list mutations decode or quarantine; frame dims capped") {
    forAllG(mutationGen) { case (kind, off, v) =>
      val b = mutate(avi, kind, off, v)
      contained(s"avi k=$kind o=$off v=$v") {
        val (w, h, c, frames) = AviCodec.decodeVideo(b, maxFrames = 4)
        (w.toLong * h, frames.map(_.length.toLong).sum.max(w.toLong * h * c))
      }
    }
  }

  test("directed dimension bombs: headers claiming huge rasters fail before allocating") {
    // PNG: IHDR says 100000×100000 — must fail on the cap, not allocate 30 GB
    val png = pngRgb.clone()
    // IHDR data starts at offset 16 (8 sig + 4 len + 4 type)
    def putBe32(b: Array[Byte], o: Int, x: Int): Unit = {
      b(o) = (x >>> 24).toByte; b(o + 1) = (x >>> 16).toByte
      b(o + 2) = (x >>> 8).toByte; b(o + 3) = x.toByte
    }
    putBe32(png, 16, 100000); putBe32(png, 20, 100000)
    val e1 = intercept[IllegalArgumentException](PngCodec.decodeImage(png))
    assert(e1.getMessage.contains("bad dimensions"))
    // PPM: 40000×40000 passes per-side but not MaxPixels
    val ppmBomb = ("P6\n40000 40000\n255\n" + "x" * 128).getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException](PpmCodec.decodeImage(ppmBomb))
    assert(e2.getMessage.contains("bad dimensions"))
  }
}
