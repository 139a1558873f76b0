package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, MjpegAvi, VideoCodec}

/** MJPEG/AVI contract — the REAL-codec video leg. The container must
  * mux/demux losslessly at the structural level (dims, fps, frame
  * count), reproduce pixels within JPEG tolerance (exactly, for
  * DC-only solid frames), classify every malformed payload as None,
  * and keep the rampContent dHash seed-stable under compression —
  * the property the q238 perceptual-dedup oracle reasons from. */
class MjpegAviSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, g: Int): Array[Byte] =
    Array.fill(w * h * 3)(g.toByte)

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
    a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
  }

  test("container round trip: structure exact, solid frames pixel-exact") {
    val fs = Seq(solid(48, 32, 64), solid(48, 32, 64), solid(48, 32, 160))
    val bytes = MjpegAvi.encode(48, 32, 18, fs)
    // a real RIFF/AVI envelope, not a private format
    assert(new String(bytes, 0, 4, "ISO-8859-1") === "RIFF")
    assert(new String(bytes, 8, 4, "ISO-8859-1") === "AVI ")
    val v = MjpegAvi.decode(bytes).getOrElse(fail("must decode"))
    assert(v.width === 48 && v.height === 32 && v.fps === 18 &&
      v.nFrames === 3)
    // solid frames are DC-only: the JPEG round trip is exact, so the
    // temporal ops see in-scene diff 0 and a full-amplitude scene cut
    assert(VideoCodec.frameAbsDiff(v, 0, 1) === 0L)
    assert(VideoCodec.frameAbsDiff(v, 1, 2) === 96L * v.frameLen)
    assert(VideoCodec.keyframes(v, minDiff = 16L * v.frameLen) === Seq(0, 2))
  }

  test("lossy tolerance: ramp content round-trips within JPEG error") {
    val rgb = MjpegAvi.rampContent(36, 32, 0xA5)
    val v = MjpegAvi.decode(MjpegAvi.encode(36, 32, 12, Seq(rgb))).get
    val meanErr = rgb.indices.map(i =>
      math.abs((v.data(i) & 0xFF) - (rgb(i) & 0xFF))).sum.toDouble / rgb.length
    assert(meanErr <= 4.0, s"smooth-ramp JPEG mean error $meanErr")
  }

  test("rampContent dHash equals the seed's bit pattern for ALL 256 " +
      "seeds after JPEG + resize — the q238 oracle's load-bearing fact") {
    for (seed <- 0 until 256) {
      val v = MjpegAvi.decode(
        MjpegAvi.encode(36, 32, 12, Seq(MjpegAvi.rampContent(36, 32, seed)))).get
      val small = ImageCodec.resizeNearest(
        ImageCodec.Decoded("jpeg", 36, 32,
          java.util.Arrays.copyOfRange(v.data, 0, v.frameLen)), 18, 16)
      val bands = ImageCodec.dHashBands(small)
      val expected = new Array[Long](4)
      for (r <- 0 until 8; c <- 0 until 8)
        if (((seed >> (r % 8)) & 1) == 1)
          expected(r / 2) |= 1L << (8 * (r % 2) + c)
      assert(bands.toSeq === expected.toSeq, s"seed $seed hash drift")
    }
  }

  private def hashOf(rgb: Array[Byte]): Seq[Long] = {
    val v = MjpegAvi.decode(MjpegAvi.encode(36, 32, 12, Seq(rgb))).get
    val small = ImageCodec.resizeNearest(
      ImageCodec.Decoded("jpeg", 36, 32,
        java.util.Arrays.copyOfRange(v.data, 0, v.frameLen)), 18, 16)
    ImageCodec.dHashBands(small).toSeq
  }

  test("blockContent dHash equals the closed-form 16-bit seed mapping " +
      "after JPEG + resize — the corpus-scaling scene vocabulary's " +
      "load-bearing fact (q238/q240 oracles reason in seed arithmetic)") {
    // rows interact vertically inside shared 8×8 DCT blocks (each DCT
    // block spans two 4-px content rows), so the sample must cover
    // byte PAIRS, not just bytes: all 256 uniform seeds (b|b<<8), all
    // 256 complement pairs (b | ~b<<8) — the max-contrast vertical
    // neighbor — and an LCG sweep of the mixed space.
    def check(seed: Int): Unit =
      assert(hashOf(MjpegAvi.blockContent(36, 32, seed)) ===
        MjpegAvi.blockContentBands(seed).toSeq, s"seed $seed hash drift")
    for (b <- 0 until 256) { check(b | (b << 8)); check(b | ((b ^ 0xFF) << 8)) }
    var x = 12345
    for (_ <- 0 until 512) {
      x = (x * 1103515245 + 12345) & 0x7FFFFFFF
      check(x & 0xFFFF)
    }
    // the single-bit frontier: every pair of seeds one bit apart must
    // land at Hamming exactly 4 — the q238 ≤3 verify's separation
    for (k <- 0 until 16) {
      val a = MjpegAvi.blockContentBands(0)
      val b = MjpegAvi.blockContentBands(1 << k)
      val ham = (0 until 4).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum
      assert(ham === 4, s"bit $k inter-seed Hamming")
    }
  }

  test("blockContent dHash is invariant under the q238 corner watermark") {
    // per-doc watermark: +amp (amp ≤ 8) on the bottom-right 4×4 block —
    // rides far below the 28-level step separating adjacent cells
    for (seed <- Seq(0x0000, 0xFFFF, 0xA5C3, 0x5A3C, 0x8001);
         amp <- Seq(1, 4, 8)) {
      val c = MjpegAvi.blockContent(36, 32, seed)
      var y = 28
      while (y < 32) {
        var x = 32
        while (x < 36) {
          val p = (y * 36 + x) * 3
          var k = 0
          while (k < 3) {
            c(p + k) = math.min(255, (c(p + k) & 0xFF) + amp).toByte
            k += 1
          }
          x += 1
        }
        y += 1
      }
      assert(hashOf(c) === MjpegAvi.blockContentBands(seed).toSeq,
        s"seed $seed amp $amp watermark flipped a hash bit")
    }
  }

  test("malformed payloads classify as None, never throw") {
    val good = MjpegAvi.encode(48, 32, 12, Seq(solid(48, 32, 64),
      solid(48, 32, 160)))
    assert(MjpegAvi.decode(Array.empty[Byte]).isEmpty, "empty")
    assert(MjpegAvi.decode(java.util.Arrays.copyOf(good, 8)).isEmpty,
      "truncated before AVI fourcc")
    assert(MjpegAvi.decode(java.util.Arrays.copyOf(good, 64)).isEmpty,
      "truncated inside hdrl")
    assert(MjpegAvi.decode(java.util.Arrays.copyOf(good, good.length - 4))
      .isEmpty, "truncated tail — RIFF size must match the buffer")
    assert(MjpegAvi.decode(good ++ Array[Byte](0, 0)).isEmpty,
      "trailing garbage — strict envelope")
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(MjpegAvi.decode(badMagic).isEmpty, "wrong RIFF magic")
    val badForm = good.clone(); badForm(8) = 'W' // 'WVI ' form
    assert(MjpegAvi.decode(badForm).isEmpty, "wrong form type")
    // fixed header layout: RIFF(12) LIST/hdrl(12) avih(8+56)
    // LIST/strl(12) strh(8+56) — so strh data begins at byte 108
    val badHandler = good.clone()
    assert(new String(badHandler, 108, 4, "ISO-8859-1") === "vids",
      "layout guard: strh stream type offset")
    badHandler(112) = 'D'; badHandler(113) = 'I'; badHandler(114) = 'B'
    badHandler(115) = ' '
    assert(MjpegAvi.decode(badHandler).isEmpty, "non-MJPG handler")
    // frame-count drift: avih dwTotalFrames at data offset 32+16 = 48
    val drift = good.clone(); putIntLE(drift, 48, 7)
    assert(MjpegAvi.decode(drift).isEmpty,
      "header frame count must match movi chunks")
    // zero time scale: strh dwScale at 108+20 = 128
    val zeroScale = good.clone(); putIntLE(zeroScale, 128, 0)
    assert(MjpegAvi.decode(zeroScale).isEmpty, "zero time scale")
    // corrupt a byte inside the first JPEG's header region: the frame
    // either fails to decode (None) — it must never throw
    val movi = {
      // find first '00dc' chunk
      var i = 12
      var found = -1
      while (found < 0 && i < good.length - 4) {
        if (good(i) == '0' && good(i + 1) == '0' && good(i + 2) == 'd' &&
          good(i + 3) == 'c') found = i
        i += 1
      }
      found
    }
    assert(movi > 0, "fixture must contain a 00dc chunk")
    val badJpeg = good.clone()
    badJpeg(movi + 8) = 0x00 // SOI first byte destroyed
    assert(MjpegAvi.decode(badJpeg).isEmpty, "undecodable frame bytes")
  }

  test("the shared temporal ops run unchanged on the MJPEG container") {
    // same scene structure through BOTH containers → same keyframe set
    val scenes = Seq(solid(48, 32, 48), solid(48, 32, 48),
      solid(48, 32, 128), solid(48, 32, 128), solid(48, 32, 208))
    val viaMjpeg = MjpegAvi.decode(MjpegAvi.encode(48, 32, 24, scenes)).get
    val viaGvid = VideoCodec.decode(VideoCodec.encode(48, 32, 24, scenes)).get
    val t = 16L * viaGvid.frameLen
    assert(VideoCodec.keyframes(viaMjpeg, t) ===
      VideoCodec.keyframes(viaGvid, t))
    assert(VideoCodec.sampleIndices(viaMjpeg.nFrames, 2) ===
      VideoCodec.sampleIndices(viaGvid.nFrames, 2))
  }
}
