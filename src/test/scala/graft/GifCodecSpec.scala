package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GifCodec

/** Animated-GIF contract — the LOSSLESS animated leg: exact pixel round
  * trips (palette formats reproduce bytes, unlike JPEG), per-frame GCE
  * delays survive the container, and malformed payloads classify as
  * None. */
class GifCodecSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, g: Int): Array[Byte] =
    Array.fill(w * h * 3)(g.toByte)

  private def quadrants(w: Int, h: Int, gs: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val q = (if (y < h / 2) 0 else 2) + (if (x < w / 2) 0 else 1)
      val p = (y * w + x) * 3
      val g = gs(q).toByte
      out(p) = g; out(p + 1) = g; out(p + 2) = g
    }
    out
  }

  test("animated round trip: EXACT pixels, frame count, delays, loop") {
    val fs = Seq(solid(24, 16, 32), quadrants(24, 16, Seq(48, 96, 144, 192)),
      solid(24, 16, 240))
    val bytes = GifCodec.encode(24, 16, 7, fs)
    assert(new String(bytes, 0, 6, "ISO-8859-1") === "GIF89a")
    val v = GifCodec.decode(bytes).getOrElse(fail("must decode"))
    assert(v.width === 24 && v.height === 16 && v.frames.length === 3)
    assert(v.delaysCs === Seq(7, 7, 7), "GCE delay survives per frame")
    // losslessness is the point: byte-for-byte equality, all frames
    fs.zip(v.frames).zipWithIndex.foreach { case ((in, out), i) =>
      assert(java.util.Arrays.equals(in, out), s"frame $i not exact")
    }
    assert(GifCodec.colorCount(v.frames(1)) === 4)
    assert(GifCodec.colorCount(v.frames(0)) === 1)
  }

  test("palette contract: >256 distinct colors is the caller's error") {
    val w = 32; val h = 32 // 1024 px, all distinct colors
    val rainbow = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      rainbow(3 * i) = (i & 0xFF).toByte
      rainbow(3 * i + 1) = ((i >> 8) & 0xFF).toByte
      rainbow(3 * i + 2) = 7
    }
    intercept[IllegalArgumentException] {
      GifCodec.encode(w, h, 5, Seq(rainbow))
    }
  }

  test("malformed payloads classify as None, never throw") {
    val good = GifCodec.encode(16, 16, 5, Seq(solid(16, 16, 64),
      solid(16, 16, 160)))
    assert(GifCodec.decode(Array.empty[Byte]).isEmpty, "empty")
    assert(GifCodec.decode("NOTGIF".getBytes("ISO-8859-1")).isEmpty,
      "bad magic")
    assert(GifCodec.decode(java.util.Arrays.copyOf(good, 20)).isEmpty,
      "truncated after header")
    val badVersion = good.clone(); badVersion(4) = '7'; badVersion(5) = 'x'
    assert(GifCodec.decode(badVersion).isEmpty, "unknown version")
  }

  test("decoded GIF frames run the shared temporal ops") {
    import graft.ops.VideoCodec
    val scenes = Seq(solid(16, 16, 40), solid(16, 16, 40),
      solid(16, 16, 200))
    val g = GifCodec.decode(GifCodec.encode(16, 16, 5, scenes)).get
    // adapt to the flat-buffer video shape the temporal ops consume
    val flat = g.frames.flatten.toArray
    val v = VideoCodec.DecodedVideo(g.width, g.height, 20, g.frames.length,
      flat)
    assert(VideoCodec.frameAbsDiff(v, 0, 1) === 0L)
    assert(VideoCodec.keyframes(v, 16L * v.frameLen) === Seq(0, 2))
  }
}
