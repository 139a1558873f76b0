package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AudioCodec

/** Byte-level contract of the WAV/PCM codec: canonical header layout,
  * exact round trip, a proper RIFF chunk walk (not offset-44
  * assumptions), and None-never-throw on malformed payloads. */
class AudioCodecSpec extends AnyFunSuite {

  test("canonical 44-byte PCM header matches the RIFF layout") {
    val bytes = AudioCodec.encodeWav(8000, AudioCodec.content(3L, 10))
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = u16(o) | (u16(o + 2) << 16)
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(u32(4) === bytes.length - 8, "RIFF size field")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    assert(new String(bytes, 12, 4, "US-ASCII") === "fmt ")
    assert(u32(16) === 16 && u16(20) === 1 && u16(22) === 1, "PCM mono")
    assert(u32(24) === 8000 && u32(28) === 16000, "rate / byte rate")
    assert(u16(32) === 2 && u16(34) === 16, "block align / bits")
    assert(new String(bytes, 36, 4, "US-ASCII") === "data")
    assert(u32(40) === 20, "data chunk size = 2 bytes x 10 samples")
    assert(bytes.length === AudioCodec.wavFileSize(10))
  }

  test("round trip is sample-exact, including int16 extremes") {
    for (n <- Seq(1, 2, 255, 1024)) {
      val content = AudioCodec.content(n * 7L, n)
      val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(44100, content))
        .getOrElse(fail(s"decode failed at n=$n"))
      assert(dec.sampleRate === 44100)
      assert(dec.samples.toSeq === content.toSeq)
    }
    // explicit extremes survive the sign handling
    val edge = Array[Short](Short.MinValue, Short.MaxValue, 0, -1)
    val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(8000, edge)).get
    assert(dec.samples.toSeq === edge.toSeq)
  }

  test("chunk walk skips unknown chunks a foreign writer inserted") {
    val base = AudioCodec.encodeWav(8000, AudioCodec.content(5L, 8))
    // splice a LIST chunk (odd size → tests the 2-byte alignment rule)
    // between fmt and data
    val listBody = Array[Byte]('I', 'N', 'F', 'O', 7)
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(base, 0, 36) // RIFF..fmt chunk end
    buf.write("LIST".getBytes("US-ASCII"))
    buf.write(Array[Byte](listBody.length.toByte, 0, 0, 0))
    buf.write(listBody)
    buf.write(0) // alignment pad for the odd-sized chunk
    buf.write(base, 36, base.length - 36) // data chunk
    val spliced = buf.toByteArray
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val dec = AudioCodec.decodeWav(spliced)
      .getOrElse(fail("decoder must skip the LIST chunk"))
    assert(dec.samples.toSeq === AudioCodec.content(5L, 8).toSeq)
  }

  test("malformed payloads decode to None, never throw") {
    val good = AudioCodec.encodeWav(8000, AudioCodec.content(1L, 16))
    assert(AudioCodec.decodeWav(java.util.Arrays.copyOf(good, 30)).isEmpty,
      "truncated mid-header")
    assert(AudioCodec.decodeWav(java.util.Arrays.copyOf(good, 50)).isEmpty,
      "data chunk shorter than declared")
    assert(AudioCodec.decodeWav(Array.fill[Byte](16)(0x42)).isEmpty,
      "not RIFF at all")
    val stereo = good.clone(); stereo(22) = 2
    assert(AudioCodec.decodeWav(stereo).isEmpty, "stereo unsupported")
    val notPcm = good.clone(); notPcm(20) = 3
    assert(AudioCodec.decodeWav(notPcm).isEmpty, "non-PCM format code")
    assert(AudioCodec.decodeWav(Array.empty[Byte]).isEmpty, "empty payload")
    // an odd data-chunk byte count can't be whole 16-bit frames: the
    // trailing byte means a truncated sample — classify, don't trim.
    // Shrink the declared size by 1 (buffer keeps the byte, so bounds
    // pass and ONLY the oddness is under test)
    val odd = good.clone()
    putIntLE3(odd, 40, 16 * 2 - 1)
    assert(AudioCodec.decodeWav(odd).isEmpty, "odd-sized PCM-16 data chunk")
  }

  private def putIntLE3(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
    a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
  }

  test("crafted chunk sizes and zero sample rates classify as None, never crash") {
    val good = AudioCodec.encodeWav(8000, AudioCodec.content(1L, 100))
    def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
      a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
    }
    // a declared chunk size near Int.MaxValue wraps the int bounds sum
    // negative — the 64-bit guard must return None, not walk off the end
    val hugeChunk = good.clone()
    putIntLE(hugeChunk, 16, Int.MaxValue - 4) // fmt chunk claims ~2GB
    assert(AudioCodec.decodeWav(hugeChunk).isEmpty, "overflowing chunk size")
    // sampleRate = 0 would make downstream duration math divide by zero
    val zeroRate = good.clone()
    putIntLE(zeroRate, 24, 0)
    assert(AudioCodec.decodeWav(zeroRate).isEmpty, "zero sample rate")
    val negRate = good.clone()
    putIntLE(negRate, 24, -8000)
    assert(AudioCodec.decodeWav(negRate).isEmpty, "negative sample rate")
  }

  test("contentSample is SQL-mirrorable closed-form arithmetic") {
    for (seed <- Seq(0L, 1L, 65535L, 65536L, 4999L); i <- Seq(0L, 1L, 65535L, 70000L))
      assert(AudioCodec.contentSample(seed, i) ===
        ((((seed % 65536) * 11 + (i % 65536) * 17) % 65536) - 32768).toInt)
  }

  test("mu-law: exhaustive companding laws over the full int16 range") {
    // G.711's defining properties, checked against the spec's closed
    // forms for EVERY 16-bit sample: (1) quantization error bounded by
    // half the segment step; (2) re-encoding a decoded sample is a
    // fixed point (enc . dec . enc == enc); (3) monotone: companding
    // preserves sample order on magnitudes
    var x = -32768
    var prevDec = Int.MinValue
    while (x <= 32767) {
      val b = AudioCodec.mulawEncodeSample(x)
      assert((b & ~0xFF) == 0, s"byte range for $x")
      val y = AudioCodec.mulawDecodeSample(b)
      val xb = math.min(math.abs(x), 32635) + 132
      val seg = 31 - Integer.numberOfLeadingZeros(xb) - 7
      val step = 1 << (seg + 3)
      assert(math.abs(y - (if (math.abs(x) > 32635) math.signum(x) * 32635 else x)) <= step,
        s"error bound for $x: dec=$y step=$step")
      // fixed point, modulo G.711's one alias: byte 0x7F is "negative
      // zero" — it decodes to 0, which re-encodes as positive zero 0xFF
      if (!(y == 0 && b == 0x7F))
        assert(AudioCodec.mulawEncodeSample(y) === b, s"fixed point for $x")
      assert(y >= prevDec, s"monotonicity broken at $x")
      prevDec = y
      x += 1
    }
    // wire-format anchors from the G.711 tables
    assert(AudioCodec.mulawEncodeSample(0) === 0xFF)
    assert(AudioCodec.mulawEncodeSample(32767) === 0x80)
    assert(AudioCodec.mulawEncodeSample(-32768) === 0x00)
    assert(AudioCodec.mulawDecodeSample(0xFF) === 0)
  }

  test("mu-law WAV: format-7 container round trip and strictness") {
    val samples = AudioCodec.content(7L, 101) // odd count: pad exercised
    val bytes = AudioCodec.encodeWavMulaw(8000, samples)
    assert(bytes.length === AudioCodec.wavMulawFileSize(101))
    val dec = AudioCodec.decodeWav(bytes).getOrElse(fail("must decode"))
    assert(dec.codec === "mulaw" && dec.sampleRate === 8000 &&
      dec.samples.length === 101)
    // decoded samples are the codec's own expansion of each byte
    samples.indices.foreach { i =>
      assert(dec.samples(i).toInt ===
        AudioCodec.mulawDecodeSample(
          AudioCodec.mulawEncodeSample(samples(i).toInt)), s"sample $i")
    }
    // format 7 with 16 bits (or stereo) is malformed, not guessed at
    val bad16 = bytes.clone(); bad16(34) = 16
    assert(AudioCodec.decodeWav(bad16).isEmpty, "mulaw must be 8-bit")
    val stereo = bytes.clone(); stereo(22) = 2
    assert(AudioCodec.decodeWav(stereo).isEmpty, "mono only")
    assert(AudioCodec.decodeWav(
      java.util.Arrays.copyOf(bytes, bytes.length - 20)).isEmpty,
      "truncated data chunk")
  }
}
