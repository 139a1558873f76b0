package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, VideoCodec}

/** GVID container contract: exact round trip, strict corrupt
  * classification (None, never throw), stride sampling, and
  * scene-change keyframes ≡ temporal dedup survivors. */
class VideoCodecSpec extends AnyFunSuite {

  private def frames(seeds: Long*): Seq[Array[Byte]] =
    seeds.map(s => ImageCodec.content(s, 16, 12))

  test("encode/decode round trip preserves every frame byte") {
    val fs = frames(1, 1, 2, 2, 2, 3)
    val bytes = VideoCodec.encode(16, 12, 24, fs)
    assert(bytes.length === VideoCodec.videoFileSize(16, 12, 6))
    val v = VideoCodec.decode(bytes).getOrElse(fail("must decode"))
    assert(v.width === 16 && v.height === 12 && v.fps === 24 &&
      v.nFrames === 6)
    fs.zipWithIndex.foreach { case (f, i) =>
      val off = i * v.frameLen
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(v.data, off, off + v.frameLen), f),
        s"frame $i must round-trip byte-exact")
    }
  }

  test("malformed payloads classify as None, never throw") {
    val good = VideoCodec.encode(16, 12, 24, frames(1, 2))
    assert(VideoCodec.decode(java.util.Arrays.copyOf(good, 10)).isEmpty,
      "truncated header")
    assert(VideoCodec.decode(java.util.Arrays.copyOf(good, 200)).isEmpty,
      "truncated frames")
    assert(VideoCodec.decode(good ++ Array[Byte](0)).isEmpty,
      "trailing garbage — strict length")
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(VideoCodec.decode(badMagic).isEmpty, "wrong magic")
    def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
      a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
    }
    // crafted frame count near 2^31: w·h·n must be checked in 64-bit —
    // an int-wrapped size could pass the length check and crash later
    val huge = good.clone(); putIntLE(huge, 12, Int.MaxValue - 1)
    assert(VideoCodec.decode(huge).isEmpty, "overflowing frame count")
    val zeroDim = good.clone(); putIntLE(zeroDim, 4, 0)
    assert(VideoCodec.decode(zeroDim).isEmpty, "zero width")
    val negFps = good.clone(); putIntLE(negFps, 16, -24)
    assert(VideoCodec.decode(negFps).isEmpty, "negative fps")
    assert(VideoCodec.decode(Array.empty[Byte]).isEmpty, "empty")
  }

  test("stride sampling always includes frame 0 and honors the stride") {
    assert(VideoCodec.sampleIndices(10, 4) === Seq(0, 4, 8))
    assert(VideoCodec.sampleIndices(1, 4) === Seq(0))
    assert(VideoCodec.sampleIndices(8, 1) === (0 until 8))
    intercept[IllegalArgumentException] { VideoCodec.sampleIndices(5, 0) }
  }

  test("keyframes cut exactly at scene changes; single scene = one keyframe") {
    val v = VideoCodec.decode(
      VideoCodec.encode(16, 12, 24, frames(1, 1, 2, 2, 2, 3))).get
    assert(VideoCodec.keyframes(v, 1L) === Seq(0, 2, 5),
      "frame 0 + each first-frame-of-scene")
    val single = VideoCodec.decode(
      VideoCodec.encode(16, 12, 24, frames(7, 7, 7))).get
    assert(VideoCodec.keyframes(single, 1L) === Seq(0))
    // threshold semantics: a diff below minDiff is NOT a scene change
    val tiny = frames(1).head.clone()
    tiny(0) = ((tiny(0) & 0xFF) + 2).toByte // L1 distance exactly 2
    val nearDup = VideoCodec.decode(
      VideoCodec.encode(16, 12, 24, Seq(frames(1).head, tiny))).get
    assert(VideoCodec.keyframes(nearDup, 3L) === Seq(0),
      "sub-threshold jitter is temporal-dedup'd, not a new scene")
    assert(VideoCodec.keyframes(nearDup, 2L) === Seq(0, 1))
    assert(VideoCodec.frameAbsDiff(nearDup, 0, 1) === 2L)
  }
}
