package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JVM image codecs for the multimodal surface (SURVEY.md §7.6).
  *
  * Two REAL codecs, no native deps:
  *  - BMP (24-bit BI_RGB): hand-rolled BITMAPFILEHEADER/BITMAPINFOHEADER
  *    writer and parser — every field read from the actual little-endian
  *    byte layout, including bottom-up row order and 4-byte row padding.
  *  - PNG: the JDK's built-in `javax.imageio` codec (real DEFLATE
  *    compression, lossless 24-bit round trip) — present in every full
  *    JDK, headless-safe.
  *
  * The reference treats media as opaque blobs next to typed metadata
  * (zeta-etl stores payload pointers, never decodes in-pipeline); here
  * the decode IS in-pipeline, which is the training-data-curation shape:
  * width/height/channel stats, pixel sums, corrupt-payload detection.
  *
  * Decoded pixel content is exposed in LOGICAL order — row-major,
  * top-down, R,G,B per pixel — regardless of the container's storage
  * order, so payload stats are format-independent (a BMP and a PNG of
  * the same image produce identical pixel stats).
  */
object ImageCodec {

  /** Parsed image: logical-order pixel channels (row-major top-down,
    * RGB interleaved). */
  final case class Decoded(format: String, width: Int, height: Int,
                           channels: Array[Byte])

  // ---- deterministic test-content generator --------------------------

  /** The i-th logical channel byte of seed's synthetic image:
    * `(seed*7 + i*13) mod 256`. Deliberately closed-form in 64-bit-safe
    * arithmetic so a SQL oracle can reproduce pixel sums/histograms with
    * GENERATE_SERIES — the gate then verifies the full
    * encode → parquet → decode round trip, not just the happy path. */
  def contentByte(seed: Long, i: Long): Int =
    (((seed % 256) * 7 + (i % 256) * 13) % 256).toInt

  /** Synthetic logical-content array for (seed, w, h). */
  def content(seed: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < out.length) { out(i) = contentByte(seed, i).toByte; i += 1 }
    out
  }

  // ---- BMP ------------------------------------------------------------

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit =
    LittleEndian.putInt(a, off, v)
  private def putShortLE(a: Array[Byte], off: Int, v: Int): Unit =
    LittleEndian.putShort(a, off, v)
  private def getIntLE(a: Array[Byte], off: Int): Int =
    LittleEndian.getInt(a, off)
  private def getShortLE(a: Array[Byte], off: Int): Int =
    LittleEndian.getShort(a, off)

  /** Row stride of a 24bpp BMP: 3 bytes/pixel rounded up to 4. */
  def bmpRowSize(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Total file size of a 24bpp BI_RGB BMP — the closed form the oracle
    * mirrors: `54 + ((3w+3)//4)*4 * h`. */
  def bmpFileSize(w: Int, h: Int): Int = 54 + bmpRowSize(w) * h

  /** Encode logical RGB content as a real 24-bit BMP (bottom-up rows,
    * padded, full headers). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "content must be w*h*3 channel bytes")
    val rowSize = bmpRowSize(w)
    val fileSize = bmpFileSize(w, h)
    val out = new Array[Byte](fileSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, fileSize)
    putIntLE(out, 10, 54) // pixel data offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, w)
    putIntLE(out, 22, h) // positive height = bottom-up storage
    putShortLE(out, 26, 1) // planes
    putShortLE(out, 28, 24) // bits per pixel
    putIntLE(out, 30, 0) // BI_RGB, uncompressed
    putIntLE(out, 34, rowSize * h)
    putIntLE(out, 38, 2835); putIntLE(out, 42, 2835) // 72 DPI
    var y = 0
    while (y < h) {
      val srcRow = y // logical top-down row
      val dstOff = 54 + (h - 1 - y) * rowSize // stored bottom-up
      var x = 0
      while (x < w) {
        val p = (srcRow * w + x) * 3
        out(dstOff + x * 3) = rgb(p + 2) // B
        out(dstOff + x * 3 + 1) = rgb(p + 1) // G
        out(dstOff + x * 3 + 2) = rgb(p) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit BI_RGB BMP back to logical-order content. Returns
    * None for anything that is not a well-formed payload this parser
    * understands (truncated, wrong magic, compressed, non-24bpp) — the
    * corrupt-payload path is a first-class outcome, not an exception. */
  def decodeBmp(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = getIntLE(bytes, 10)
    val w = getIntLE(bytes, 18)
    val h = getIntLE(bytes, 22)
    val bpp = getShortLE(bytes, 28)
    val compression = getIntLE(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // all size math in 64-bit: crafted headers with dims near 2^16
    // would overflow the int products, slip past the bounds check, and
    // turn the promised None into an out-of-bounds crash
    if (dataOff < 54 || dataOff > bytes.length) return None
    val rowSizeL = ((3L * w + 3) / 4) * 4
    // reject each dimension against the payload length BEFORE the
    // product — rowSizeL * h itself overflows Long for w, h both near
    // Int.MaxValue; after this guard both factors are <= bytes.length
    // so the product stays below 2^62
    if (rowSizeL > bytes.length || h > bytes.length) return None
    if (bytes.length < dataOff.toLong + rowSizeL * h) return None
    val rowSize = rowSizeL.toInt // <= bytes.length, int-safe
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcOff = dataOff + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = bytes(srcOff + x * 3 + 2) // R
        rgb(p + 1) = bytes(srcOff + x * 3 + 1) // G
        rgb(p + 2) = bytes(srcOff + x * 3) // B
        x += 1
      }
      y += 1
    }
    Some(Decoded("bmp", w, h, rgb))
  }

  // ---- PNG (JDK ImageIO) ---------------------------------------------

  /** Encode logical RGB content as a PNG via the JDK codec (real
    * DEFLATE; byte-for-byte output may vary by JDK build, but the
    * DECODED pixels are exact — round-trip stats are the contract). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
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
    val bos = new ByteArrayOutputStream()
    // memory-cached stream: ImageIO.write's convenience path wraps the
    // OutputStream in a temp-FILE-backed cache by default — one disk
    // file per image, which dominates per-payload codec work at corpus
    // scale (same fix as MjpegAvi.encodeJpegFrame)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private val PNG_MAGIC = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  /** Decode a PNG payload via the JDK codec; None on malformed input. */
  def decodePng(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 8 ||
      !PNG_MAGIC.indices.forall(i => bytes(i) == PNG_MAGIC(i))) return None
    val img =
      try {
        // explicit reader + memory-cached stream (ImageIO.read defaults
        // to a temp-file-backed stream cache — see encodePng)
        val reader = ImageIO.getImageReadersByFormatName("png").next()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
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
    Some(Decoded("png", w, h, rgb))
  }

  /** Magic-byte dispatch: BMP, PNG, or None for unrecognized payloads. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else decodePng(bytes)

  /** Real pixel-space resize (nearest neighbor) over decoded logical
    * channels — the decode → RESIZE → re-encode middle stage of a media
    * pipeline normalizing arbitrary-geometry inputs to the 18×16
    * hash/embedding target. Integer source-index math (`y·srcH/dstH`,
    * `x·srcW/dstW`) so the mapping is exactly reproducible in SQL. */
  def resizeNearest(dec: Decoded, dstW: Int, dstH: Int): Decoded = {
    require(dstW > 0 && dstH > 0, "resize target must be positive")
    val out = new Array[Byte](3 * dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * dec.height / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * dec.width / dstW).toInt
        val s = 3 * (sy * dec.width + sx)
        val t = 3 * (y * dstW + x)
        out(t) = dec.channels(s)
        out(t + 1) = dec.channels(s + 1)
        out(t + 2) = dec.channels(s + 2)
        x += 1
      }
      y += 1
    }
    Decoded(dec.format, dstW, dstH, out)
  }

  // ---- perceptual hash (dHash) ---------------------------------------

  /** 64-bit difference hash over logical RGB content, returned as FOUR
    * positive 16-bit band values (the LSH-ready shape — see
    * q224_phash_neardup): the image is reduced to a 9×8 grid of
    * 2×2-pixel-cell brightness SUMS (sums of equal-size cells order the
    * same as means and stay integer-exact), and bit (r, c) of the hash
    * is `cell(r,c) < cell(r,c+1)`. Band `r/2` packs rows 2r and 2r+1.
    * Requires w = 18, h = 16 (the canonical pre-hash resize target —
    * a production pipeline resizes first; the synthetic corpus is
    * GENERATED at target size). Hamming distance between two hashes =
    * Σ bit_count(band XOR band); ≤ 3 bit flips can disturb at most 3
    * of the 4 bands, so band equality is an exact pigeonhole candidate
    * filter. */
  /** The q231 fixed linear encoder: project logical channel bytes
    * through the deterministic weight table w(i, j) = ((i·(j+3)) mod
    * 11) − 5 into an 8-dim integer embedding — the ViT patch-embedding
    * shape with a constant table in place of learned weights. ONE
    * implementation for the query and the MediaPipeline stage (a
    * weight-table change must never have to be applied twice). */
  def linearEmbedding(dec: Decoded): Array[Long] = {
    val e = new Array[Long](8)
    var i = 0
    while (i < dec.channels.length) {
      val v = dec.channels(i) & 0xFF
      var j = 0
      while (j < 8) {
        e(j) += v.toLong * (((i.toLong * (j + 3)) % 11) - 5)
        j += 1
      }
      i += 1
    }
    e
  }

  def dHashBands(dec: Decoded): Array[Long] = {
    require(dec.width == 18 && dec.height == 16,
      s"dHash expects the 18x16 resize target, got ${dec.width}x${dec.height}")
    val cell = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val p0 = (y * 18 + x) * 3
        cell(y / 2)(x / 2) += (dec.channels(p0) & 0xFF) +
          (dec.channels(p0 + 1) & 0xFF) + (dec.channels(p0 + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    val bands = new Array[Long](4)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cell(r)(c) < cell(r)(c + 1))
          bands(r / 2) |= 1L << (8 * (r % 2) + c)
        c += 1
      }
      r += 1
    }
    bands
  }
}
