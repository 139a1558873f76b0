package graft.ops

/** Pure-JVM WAV/PCM audio codec — the audio leg of the multimodal
  * surface (SURVEY.md §7.6), same design as [[ImageCodec]]: a REAL
  * container format written and parsed byte-by-byte (canonical 44-byte
  * RIFF/WAVE header + 16-bit little-endian PCM mono), with synthetic
  * sample content chosen closed-form so a SQL oracle can re-derive
  * every decoded statistic. The parser walks the chunk list properly
  * (fmt / data discovered by id, unknown chunks skipped by their
  * declared size), so WAVs from other writers — extra LIST/INFO
  * chunks — decode too; anything malformed returns None, never throws.
  */
object AudioCodec {

  /** Decoded audio payload: mono 16-bit samples in order. `codec` names
    * the wire format the samples came from — "pcm16" (exact) or
    * "mulaw" (G.711-expanded; samples carry the codec's quantization,
    * which is deterministic and closed-form, so oracles mirror it). */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Short],
                                codec: String = "pcm16")

  /** The i-th synthetic sample for `seed`:
    * `((seed*11 + i*17) mod 65536) − 32768` — full int16 range, exact
    * in int64 SQL arithmetic. */
  def contentSample(seed: Long, i: Long): Int =
    ((((seed % 65536) * 11 + (i % 65536) * 17) % 65536) - 32768).toInt

  def content(seed: Long, n: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = contentSample(seed, i).toShort; i += 1 }
    out
  }

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit =
    LittleEndian.putInt(a, off, v)
  private def putShortLE(a: Array[Byte], off: Int, v: Int): Unit =
    LittleEndian.putShort(a, off, v)
  private def getIntLE(a: Array[Byte], off: Int): Int =
    LittleEndian.getInt(a, off)
  private def getShortLE(a: Array[Byte], off: Int): Int =
    LittleEndian.getShort(a, off)

  private def putTag(a: Array[Byte], off: Int, tag: String): Unit =
    tag.getBytes("US-ASCII").copyToArray(a, off)
  private def tagAt(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  /** Total file size of a canonical mono-16-bit WAV: 44-byte header +
    * 2 bytes per sample — the closed form the oracle mirrors. */
  def wavFileSize(nSamples: Int): Int = 44 + 2 * nSamples

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF"); putIntLE(out, 4, 36 + dataLen)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putIntLE(out, 16, 16)
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * 2) // byte rate
    putShortLE(out, 32, 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    putTag(out, 36, "data"); putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + 2 * i, samples(i) & 0xFFFF); i += 1
    }
    out
  }

  /** Parse a WAV payload: RIFF/WAVE magic, then the chunk walk — fmt
    * must declare PCM mono 16-bit before data is accepted. None for
    * anything truncated, non-PCM, multi-channel, or with a data chunk
    * shorter than declared. */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes.length < 44 || tagAt(bytes, 0) != "RIFF" ||
      tagAt(bytes, 8) != "WAVE") return None
    var off = 12
    var sampleRate = -1
    var fmtOk = false
    var mulaw = false
    while (off + 8 <= bytes.length) {
      val tag = tagAt(bytes, off)
      val size = getIntLE(bytes, off + 4)
      // 64-bit bounds: a declared size near Int.MaxValue would wrap the
      // int sum negative, pass this guard, and crash the walk instead
      // of returning the promised None
      if (size < 0 || off.toLong + 8L + size > bytes.length) return None
      tag match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = getShortLE(bytes, off + 8)
          val channels = getShortLE(bytes, off + 10)
          val bits = getShortLE(bytes, off + 22)
          // two REAL wire formats: PCM-16 (WAVE_FORMAT_PCM = 1) and
          // G.711 µ-law (WAVE_FORMAT_MULAW = 7, 8 bits/sample — what
          // `sox -e mu-law` / `ffmpeg -c:a pcm_mulaw` write)
          if (channels != 1) return None
          if (audioFormat == 1 && bits == 16) mulaw = false
          else if (audioFormat == 7 && bits == 8) mulaw = true
          else return None
          sampleRate = getIntLE(bytes, off + 12)
          // a zero/negative rate is malformed, and downstream derives
          // duration by dividing by it — classify, don't crash later
          if (sampleRate <= 0) return None
          fmtOk = true
        case "data" =>
          if (!fmtOk) return None // data before fmt: malformed
          if (mulaw) {
            val samples = new Array[Short](size)
            var i = 0
            while (i < size) {
              samples(i) = mulawDecodeSample(bytes(off + 8 + i) & 0xFF)
                .toShort
              i += 1
            }
            return Some(DecodedAudio(sampleRate, samples, "mulaw"))
          }
          // an ODD byte count cannot be whole 16-bit PCM frames —
          // classify as malformed rather than silently truncating the
          // trailing byte (the "None for anything truncated" contract)
          if ((size & 1) != 0) return None
          val n = size / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = getShortLE(bytes, off + 8 + 2 * i).toShort; i += 1
          }
          return Some(DecodedAudio(sampleRate, samples))
        case _ => () // unknown chunk (LIST, INFO, ...): skip by size
      }
      off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    None
  }

  /** Sample-rate conversion, the decimate-by-2 box form: each output
    * sample is the FLOOR mean of its input pair ((a+b) >> 1 — the
    * arithmetic shift floors, matching SQL `//`), halving the rate.
    * This is the exact-integer member of the resampler family (a
    * production polyphase FIR is a float pipeline and belongs behind a
    * perceptual gate like q238's); the box prefilter is what makes the
    * op oracle-gateable sample-for-sample. Odd trailing samples drop —
    * a decimator emits ⌊n/2⌋ by definition. */
  def downsample2(a: DecodedAudio): DecodedAudio = {
    val m = a.samples.length / 2
    val out = new Array[Short](m)
    var i = 0
    while (i < m) {
      out(i) = ((a.samples(2 * i) + a.samples(2 * i + 1)) >> 1).toShort
      i += 1
    }
    DecodedAudio(a.sampleRate / 2, out, a.codec)
  }

  // ---- G.711 µ-law (WAVE_FORMAT_MULAW = 7) ---------------------------
  //
  // The standard lossy telephony codec, implemented from the G.711
  // spec's closed forms (no tables): logarithmic companding to 8 bits —
  // sign + 3-bit segment (exponent) + 4-bit mantissa, bias 132, clip
  // 32635, the whole byte ones-complemented on the wire. Both
  // directions are exact integer arithmetic, so a SQL oracle mirrors
  // the quantization with an 8-branch CASE ladder for the segment and
  // shifts for the mantissa — which is what makes a LOSSY audio path
  // oracle-gateable (q239): the decoded value is deterministic, not
  // approximate.

  private val MU_BIAS = 132
  private val MU_CLIP = 32635

  /** Compand one 16-bit sample to its µ-law byte. */
  def mulawEncodeSample(x0: Int): Int = {
    val sign = if (x0 < 0) 0x80 else 0
    var x = if (x0 < 0) -x0 else x0
    if (x > MU_CLIP) x = MU_CLIP
    x += MU_BIAS // x ∈ [132, 32767]
    val e = 24 - Integer.numberOfLeadingZeros(x) // MSB index − 7 ∈ [0,7]
    val m = (x >> (e + 3)) & 0x0F
    (~(sign | (e << 4) | m)) & 0xFF
  }

  /** Expand one µ-law byte back to its (quantized) 16-bit sample. */
  def mulawDecodeSample(b: Int): Int = {
    val u = (~b) & 0xFF
    val e = (u >> 4) & 7
    val m = u & 0x0F
    val mag = (((m << 3) + MU_BIAS) << e) - MU_BIAS
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Total file size of a canonical mono µ-law WAV: 44-byte header +
    * 1 byte per sample + RIFF even-padding. */
  def wavMulawFileSize(nSamples: Int): Int = 44 + nSamples + (nSamples & 1)

  /** Encode mono 16-bit PCM as a real G.711 µ-law RIFF/WAVE file
    * (format code 7, 8 bits/sample, odd data chunks even-padded). */
  def encodeWavMulaw(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length
    val pad = dataLen & 1
    val out = new Array[Byte](44 + dataLen + pad)
    putTag(out, 0, "RIFF"); putIntLE(out, 4, 36 + dataLen + pad)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putIntLE(out, 16, 16)
    putShortLE(out, 20, 7) // WAVE_FORMAT_MULAW
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate) // byte rate: 1 byte per sample
    putShortLE(out, 32, 1) // block align
    putShortLE(out, 34, 8) // bits per sample
    putTag(out, 36, "data"); putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + i) = mulawEncodeSample(samples(i).toInt).toByte; i += 1
    }
    out
  }
}
