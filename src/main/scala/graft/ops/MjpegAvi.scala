package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** REAL-codec video container: MJPEG inside AVI (RIFF), the standard
  * lossy sibling of [[VideoCodec]]'s exact raw "GVID" path. Motion-JPEG
  * in an AVI is what `ffmpeg -c:v mjpeg out.avi` and countless webcams
  * and dashcams produce: a RIFF file with an `hdrl` header list
  * (`avih` main header + one `strl` stream with `strh`/`strf`), a
  * `movi` list whose `00dc` chunks each hold one complete baseline
  * JFIF image, and an `idx1` index. Frames are compressed with the
  * JDK's built-in ImageIO JPEG codec (present in every full JDK,
  * headless-safe — the same zero-native-deps pattern as
  * [[ImageCodec]]'s PNG leg), so both the container AND the per-frame
  * codec are real standard formats here.
  *
  * Parsing discipline matches the other codecs (the q205/q234 corrupt-
  * classify contract): every chunk walk uses 64-bit bounds math, a
  * truncated or inflated payload, a malformed header, a non-`vids`/
  * non-`MJPG` stream, dimension drift between `avih`/`strf` and the
  * decoded frames, or an undecodable frame classifies the payload as
  * corrupt (`None`) — never an exception, never an out-of-bounds read.
  *
  * Decoded output reuses [[VideoCodec.DecodedVideo]] (logical-order
  * RGB frames in one flat buffer), so the temporal operators — stride
  * [[VideoCodec.sampleIndices]], scene-cut [[VideoCodec.keyframes]],
  * [[VideoCodec.frameAbsDiff]] — run unchanged on either container:
  * the container is an input format detail, the curation ops are
  * shared. The one semantic difference is JPEG's lossiness: exact
  * content digests are meaningless on this path, so downstream dedup
  * must verify PERCEPTUALLY (dHash distance — see
  * q238_mjpeg_scene_dedup), not byte-exactly.
  *
  * Reference anchor: media handled as opaque payload pointers in
  * zetadex-serving-v2.py:628; the in-pipeline decode is the
  * training-data-curation extension SURVEY.md §7.6 mandates.
  */
object MjpegAvi {

  import LittleEndian.{getInt, putInt, putShort}

  private def fourcc(a: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < 4) { a(off + i) = s.charAt(i).toByte; i += 1 }
  }
  private def isFourcc(a: Array[Byte], off: Int, s: String): Boolean = {
    if (off + 4 > a.length) return false
    var i = 0
    while (i < 4) { if (a(off + i) != s.charAt(i).toByte) return false; i += 1 }
    true
  }

  // ---- JPEG frame codec (JDK ImageIO) --------------------------------

  /** Encode one logical-RGB frame as a baseline JFIF JPEG at the given
    * quality. Deterministic within a JVM (the curation pipelines and
    * the oracle-gated queries rely on per-row determinism, not
    * cross-build byte equality — decoded PIXELS carry the contract,
    * and only perceptually). */
  def encodeJpegFrame(w: Int, h: Int, rgb: Array[Byte],
                      quality: Float = 0.85f): Array[Byte] = {
    require(rgb.length == w * h * 3, "content must be w*h*3 channel bytes")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xFF) << 16) |
          ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    // memory-cached stream, NOT ImageIO.createImageOutputStream: the
    // convenience factory defaults to a temp-FILE-backed cache — one
    // disk file create/write/delete per frame, which dominates a
    // per-frame codec at corpus scale
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.flush()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Decode one JPEG frame to logical RGB; None on malformed bytes. */
  private def decodeJpegFrame(bytes: Array[Byte]): Option[ImageCodec.Decoded] = {
    // JFIF sanity before handing to ImageIO: SOI marker leads, EOI ends
    if (bytes.length < 4 || bytes(0) != 0xFF.toByte ||
      bytes(1) != 0xD8.toByte) return None
    // explicit reader + memory-cached stream (ImageIO.read's stream
    // factory defaults to a temp-file cache — see encodeJpegFrame)
    val img =
      try {
        val reader = ImageIO.getImageReadersByFormatName("jpeg").next()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try { reader.setInput(iis); reader.read(0) }
        finally { iis.close(); reader.dispose() }
      } catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val p = (y * w + x) * 3
        rgb(p) = ((px >>> 16) & 0xFF).toByte
        rgb(p + 1) = ((px >>> 8) & 0xFF).toByte
        rgb(p + 2) = (px & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(ImageCodec.Decoded("jpeg", w, h, rgb))
  }

  // ---- deterministic JPEG-stable test content ------------------------

  /** Synthetic scene content whose dHash is PROVABLY stable under JPEG
    * loss (the lossy-path sibling of [[ImageCodec.content]], which is
    * high-frequency and exact-path-only): cell row `r` (of 8) is a
    * horizontal luminance ramp with slope +4/px from 40 when bit
    * `r mod 8` of `seed` is set, else −4/px from 184. After JPEG at
    * q0.85 and nearest-resize to the 18×16 hash target, adjacent dHash
    * cells differ by ≥16 mean levels while measured JPEG error on the
    * smooth ramp is ≤3 — hash bit (r, c) equals bit r of the seed for
    * all 256 seeds (verified exhaustively in MjpegAviSpec), so the
    * perceptual-dedup oracle can reason in seed arithmetic. */
  def rampContent(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(h % 8 == 0, "ramp rows must divide into the 8 dHash cell rows")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val r = y / (h / 8)
      val up = ((seed >> (r % 8)) & 1) == 1
      var x = 0
      while (x < w) {
        val l = if (up) 40 + 4 * x else 184 - 4 * x
        val p = (y * w + x) * 3
        out(p) = l.toByte; out(p + 1) = l.toByte; out(p + 2) = l.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-BIT scene content, JPEG-stable like [[rampContent]] but with a
    * content space that can SCALE WITH THE CORPUS — the fix for the
    * quadratic candidate cliff an 8-bit scene vocabulary hits (with 256
    * possible scenes, same-scene classes grow linearly with corpus size
    * and candidate pairs quadratically; a real growing corpus gains
    * mostly NEW scenes). Encoding: the frame is an 8×9 grid of FLAT
    * blocks (each h/8 px tall × w/9 px wide — flat blocks are
    * DC-dominant, the most JPEG-robust content there is). Hash row `r`
    * carries byte `(seed >>> 8*(r%2)) & 0xFF` — low byte on even rows,
    * high on odd — via a level WALK: block 0 sits at level index
    * `zeros(byte)`, and each step goes +1 if the row-byte's bit `c` is
    * set, else −1, so dHash bit (r,c) = [cell(r,c) < cell(r,c+1)] =
    * bit c of the row byte. Starting at `zeros(byte)` pins the walk to
    * [0,8] (downs ≤ zeros, ups ≤ ones), so 9 luminance levels at a
    * 28-step (14..238) suffice — adjacent blocks always differ by a
    * full step, far above JPEG ringing at q0.85 (verified across seeds
    * in MjpegAviSpec). Consequences the dedup queries lean on:
    * each 16-bit band of [[ImageCodec.dHashBands]] spans one even and
    * one odd row = ALL 16 seed bits, so distinct seeds agree on NO
    * band, equal seeds on ALL four — band-equality candidate
    * generation is exact; and two seeds differing in one bit sit at
    * Hamming 4 (4 row replicas), so a perceptual verify at ≤3 cleanly
    * separates while still absorbing single-bit JPEG upsets via the
    * 3-intact-band pigeonhole. */
  def blockContent(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w % 9 == 0, "block columns must divide into the 9 dHash cells")
    require(h % 8 == 0, "block rows must divide into the 8 dHash cell rows")
    require(seed >= 0 && seed < 65536, "seed is 16-bit")
    val out = new Array[Byte](w * h * 3)
    val bw = w / 9
    val rowH = h / 8
    // per-row-byte level walk, precomputed once per 8 rows
    val levels = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      val b = (seed >>> (8 * (r % 2))) & 0xFF
      var wk = 8 - Integer.bitCount(b) // zeros(byte): pins walk to [0,8]
      levels(r)(0) = 14 + 28 * wk
      var c = 0
      while (c < 8) {
        wk += (if (((b >> c) & 1) == 1) 1 else -1)
        levels(r)(c + 1) = 14 + 28 * wk
        c += 1
      }
      r += 1
    }
    var y = 0
    while (y < h) {
      val row = levels(y / rowH)
      var x = 0
      while (x < w) {
        val l = row(x / bw).toByte
        val p = (y * w + x) * 3
        out(p) = l; out(p + 1) = l; out(p + 2) = l
        x += 1
      }
      y += 1
    }
    out
  }

  /** The dHash band values [[blockContent]] produces for `seed`, closed
    * form — what the oracle and the specs reason against. */
  def blockContentBands(seed: Int): Array[Long] = {
    val bands = new Array[Long](4)
    var r = 0
    while (r < 8) {
      val b = (seed >>> (8 * (r % 2))) & 0xFF
      var c = 0
      while (c < 8) {
        if (((b >> c) & 1) == 1) bands(r / 2) |= 1L << (8 * (r % 2) + c)
        c += 1
      }
      r += 1
    }
    bands
  }

  // ---- AVI muxer ------------------------------------------------------

  private val AVIF_HASINDEX = 0x10
  private val AVIIF_KEYFRAME = 0x10

  /** Mux logical-RGB frames into an MJPEG AVI: each frame is JPEG-
    * compressed and written as a `00dc` chunk (even-padded, per RIFF),
    * with a full `hdrl` (avih + strh/strf) and an `idx1` index — every
    * MJPEG frame is independently decodable, so every index entry is a
    * keyframe. Plays in anything that reads AVI. */
  def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]],
             quality: Float = 0.85f): Array[Byte] = {
    require(frames.nonEmpty, "a video has at least one frame")
    require(fps > 0, "fps must be positive")
    val jpegs = frames.map { f => encodeJpegFrame(w, h, f, quality) }
    val n = jpegs.length

    def chunkLen(dataLen: Int): Int = 8 + dataLen + (dataLen & 1)
    val avihLen = chunkLen(56)
    val strhLen = chunkLen(56)
    val strfLen = chunkLen(40)
    val strlLen = 12 + strhLen + strfLen // LIST hdr + subchunks
    val hdrlLen = 12 + avihLen + strlLen
    val moviLen = 12 + jpegs.map(j => chunkLen(j.length)).sum
    val idx1Len = chunkLen(16 * n)
    val riffDataLen = 4 + hdrlLen + moviLen + idx1Len // 'AVI ' + lists
    val total = 8 + riffDataLen
    val out = new Array[Byte](total)
    var o = 0
    def wFourcc(s: String): Unit = { fourcc(out, o, s); o += 4 }
    def wInt(v: Int): Unit = { putInt(out, o, v); o += 4 }
    def wShort(v: Int): Unit = { putShort(out, o, v); o += 2 }

    wFourcc("RIFF"); wInt(riffDataLen); wFourcc("AVI ")
    // hdrl
    wFourcc("LIST"); wInt(hdrlLen - 8); wFourcc("hdrl")
    wFourcc("avih"); wInt(56)
    wInt((1000000L / fps).toInt) // dwMicroSecPerFrame
    wInt(0) // dwMaxBytesPerSec (advisory)
    wInt(0) // dwPaddingGranularity
    wInt(AVIF_HASINDEX) // dwFlags
    wInt(n) // dwTotalFrames
    wInt(0) // dwInitialFrames
    wInt(1) // dwStreams
    wInt(jpegs.map(_.length).max) // dwSuggestedBufferSize
    wInt(w); wInt(h)
    wInt(0); wInt(0); wInt(0); wInt(0) // dwReserved[4]
    // strl
    wFourcc("LIST"); wInt(strlLen - 8); wFourcc("strl")
    wFourcc("strh"); wInt(56)
    wFourcc("vids"); wFourcc("MJPG")
    wInt(0) // dwFlags
    wShort(0); wShort(0) // wPriority, wLanguage
    wInt(0) // dwInitialFrames
    wInt(1) // dwScale
    wInt(fps) // dwRate — fps = rate/scale
    wInt(0) // dwStart
    wInt(n) // dwLength (frames)
    wInt(jpegs.map(_.length).max) // dwSuggestedBufferSize
    wInt(-1) // dwQuality (default)
    wInt(0) // dwSampleSize (0 = one sample per chunk)
    wShort(0); wShort(0); wShort(w); wShort(h) // rcFrame
    // strf = BITMAPINFOHEADER with biCompression 'MJPG'
    wFourcc("strf"); wInt(40)
    wInt(40) // biSize
    wInt(w); wInt(h)
    wShort(1) // biPlanes
    wShort(24) // biBitCount
    fourcc(out, o, "MJPG"); o += 4 // biCompression
    wInt(w * h * 3) // biSizeImage (nominal)
    wInt(0); wInt(0); wInt(0); wInt(0) // resolution + palette fields
    // movi
    wFourcc("LIST"); wInt(moviLen - 8); wFourcc("movi")
    val offsets = new Array[Int](n) // chunk offsets relative to 'movi'
    val moviListStart = o - 4 // position of the 'movi' fourcc
    var i = 0
    while (i < n) {
      offsets(i) = o - moviListStart
      wFourcc("00dc"); wInt(jpegs(i).length)
      System.arraycopy(jpegs(i), 0, out, o, jpegs(i).length)
      o += jpegs(i).length
      if ((jpegs(i).length & 1) == 1) { out(o) = 0; o += 1 } // even pad
      i += 1
    }
    // idx1
    wFourcc("idx1"); wInt(16 * n)
    i = 0
    while (i < n) {
      wFourcc("00dc"); wInt(AVIIF_KEYFRAME); wInt(offsets(i))
      wInt(jpegs(i).length)
      i += 1
    }
    assert(o == total, s"muxer layout drift: wrote $o of $total")
    out
  }

  // ---- AVI demuxer ----------------------------------------------------

  private final case class Hdr(w: Int, h: Int, fps: Int, nFrames: Int)

  /** Strict demux + per-frame JPEG decode. Returns the decoded video in
    * [[VideoCodec.DecodedVideo]] form (shared temporal ops) or None for
    * anything malformed: bad RIFF/AVI magic, chunk walks that escape
    * the buffer (all bounds math 64-bit), missing or non-MJPG stream
    * headers, zero/negative dims or rates, frame-count drift between
    * `avih`, `strh` and the `movi` chunks, undecodable JPEG bytes, or
    * decoded frame dims that contradict the headers. */
  def decode(bytes: Array[Byte]): Option[VideoCodec.DecodedVideo] = {
    if (bytes.length < 12 || !isFourcc(bytes, 0, "RIFF")) return None
    val riffLen = getInt(bytes, 4).toLong & 0xFFFFFFFFL
    // strict envelope: the RIFF size must account for the whole buffer
    // (truncated tail or trailing garbage both classify as corrupt)
    if (8L + riffLen != bytes.length.toLong) return None
    if (!isFourcc(bytes, 8, "AVI ")) return None

    var hdr: Option[Hdr] = None
    var strhOk = false
    var strfOk = false
    var fps = 0
    var strhFrames = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    // walk one chunk sequence in [from, until); returns false on any
    // structural violation
    def walk(from: Long, until: Long,
             onChunk: (String, Long, Int) => Boolean): Boolean = {
      var off = from
      while (off < until) {
        if (off + 8 > until) return false
        val cc = new String(bytes, off.toInt, 4, "ISO-8859-1")
        val size = getInt(bytes, off.toInt + 4).toLong & 0xFFFFFFFFL
        val dataOff = off + 8
        if (dataOff + size > until) return false
        if (!onChunk(cc, dataOff, size.toInt)) return false
        off = dataOff + size + (size & 1) // RIFF chunks are even-aligned
      }
      true
    }

    def parseAvih(off: Long, size: Int): Boolean = {
      if (size < 56) return false
      val o = off.toInt
      val nF = getInt(bytes, o + 16)
      val w = getInt(bytes, o + 32)
      val h = getInt(bytes, o + 36)
      if (w <= 0 || h <= 0 || nF <= 0) return false
      hdr = Some(Hdr(w, h, 0, nF))
      true
    }
    def parseStrh(off: Long, size: Int): Boolean = {
      if (size < 56) return false
      val o = off.toInt
      if (!isFourcc(bytes, o, "vids") || !isFourcc(bytes, o + 4, "MJPG"))
        return false
      val scale = getInt(bytes, o + 20)
      val rate = getInt(bytes, o + 24)
      strhFrames = getInt(bytes, o + 32)
      if (scale <= 0 || rate <= 0 || rate % scale != 0 || strhFrames <= 0)
        return false
      fps = rate / scale
      strhOk = true
      true
    }
    def parseStrf(off: Long, size: Int): Boolean = {
      if (size < 40) return false
      val o = off.toInt
      val w = getInt(bytes, o + 4)
      val h = getInt(bytes, o + 8)
      if (!isFourcc(bytes, o + 16, "MJPG")) return false
      if (!hdr.exists(hd => hd.w == w && hd.h == h)) return false
      strfOk = true
      true
    }

    val structureOk = walk(12, bytes.length.toLong, {
      case ("LIST", off, size) =>
        if (size < 4) false
        else {
          val listType = new String(bytes, off.toInt, 4, "ISO-8859-1")
          listType match {
            case "hdrl" => walk(off + 4, off + size, {
              case ("avih", o2, s2) => parseAvih(o2, s2)
              case ("LIST", o2, s2) if s2 >= 4 &&
                  isFourcc(bytes, o2.toInt, "strl") =>
                walk(o2 + 4, o2 + s2, {
                  case ("strh", o3, s3) => parseStrh(o3, s3)
                  case ("strf", o3, s3) => parseStrf(o3, s3)
                  case _ => true // tolerate strn etc.
                })
              case _ => true
            })
            case "movi" => walk(off + 4, off + size, {
              case (cc, o2, s2) if cc == "00dc" || cc == "00db" =>
                frames += ((o2.toInt, s2)); true
              case _ => true // non-video chunks in movi are skippable
            })
            case _ => true
          }
        }
      case ("idx1", _, _) => true
      case ("JUNK", _, _) => true
      case _ => true // unknown top-level chunk: structurally skippable
    })
    if (!structureOk || hdr.isEmpty || !strhOk || !strfOk) return None
    val h0 = hdr.get
    if (frames.isEmpty || frames.length != h0.nFrames ||
      frames.length != strhFrames) return None

    val frameLen = 3 * h0.w * h0.h
    if (frameLen.toLong * frames.length > Int.MaxValue - 64) return None
    val data = new Array[Byte](frameLen * frames.length)
    var f = 0
    while (f < frames.length) {
      val (off, size) = frames(f)
      val dec = decodeJpegFrame(
        java.util.Arrays.copyOfRange(bytes, off, off + size))
      dec match {
        case Some(d) if d.width == h0.w && d.height == h0.h =>
          System.arraycopy(d.channels, 0, data, f * frameLen, frameLen)
        case _ => return None // undecodable frame or dim drift: corrupt
      }
      f += 1
    }
    Some(VideoCodec.DecodedVideo(h0.w, h0.h, fps, frames.length, data))
  }
}
