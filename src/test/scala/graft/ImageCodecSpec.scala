package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ImageCodec

/** Byte-level contract of the pure-JVM codecs: the BMP writer/parser
  * must agree with the published BITMAPFILEHEADER/BITMAPINFOHEADER
  * layout (not merely with each other), the PNG path must round-trip
  * losslessly through the JDK codec, and both formats must expose the
  * SAME logical pixel order so payload stats are format-independent.
  */
class ImageCodecSpec extends AnyFunSuite {

  test("BMP header fields match the published layout byte-for-byte") {
    val w = 5; val h = 3 // w=5 → row 15 B → padded to 16
    val bytes = ImageCodec.encodeBmp(w, h, ImageCodec.content(7L, w, h))
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    assert(u32(2) === bytes.length, "file-size field")
    assert(u32(10) === 54, "pixel data offset")
    assert(u32(14) === 40, "info header size")
    assert(u32(18) === w && u32(22) === h)
    assert(u16(26) === 1 && u16(28) === 24)
    assert(u32(30) === 0, "BI_RGB")
    assert(u32(34) === 16 * h, "padded image size")
    assert(bytes.length === ImageCodec.bmpFileSize(w, h))
  }

  test("BMP round trip is exact, including padded odd widths") {
    for ((w, h) <- Seq((1, 1), (3, 2), (4, 4), (5, 7), (31, 23), (64, 1))) {
      val content = ImageCodec.content(w * 31L + h, w, h)
      val dec = ImageCodec.decodeBmp(ImageCodec.encodeBmp(w, h, content))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(dec.format === "bmp")
      assert(dec.width === w && dec.height === h)
      assert(dec.channels.toSeq === content.toSeq,
        s"pixel bytes corrupted at ${w}x$h (row padding / BGR order)")
    }
  }

  test("BMP pixel storage is bottom-up BGR (a top-down reader would fail)") {
    // 1x2 image: logical top pixel RGB=(1,2,3), bottom=(4,5,6)
    val content = Array[Byte](1, 2, 3, 4, 5, 6)
    val bytes = ImageCodec.encodeBmp(1, 2, content)
    // stored first row is the BOTTOM logical row, as B,G,R
    assert(bytes(54) === 6 && bytes(55) === 5 && bytes(56) === 4)
    assert(bytes(58) === 3 && bytes(59) === 2 && bytes(60) === 1)
  }

  test("PNG round trip through the JDK codec is lossless") {
    for ((w, h) <- Seq((1, 1), (8, 8), (31, 23))) {
      val content = ImageCodec.content(w * 17L + h, w, h)
      val png = ImageCodec.encodePng(w, h, content)
      assert(png.length >= 8 && (png(0) & 0xFF) === 0x89 &&
        png(1) === 'P'.toByte, "PNG magic")
      val dec = ImageCodec.decodePng(png).getOrElse(fail("png decode"))
      assert(dec.format === "png" && dec.width === w && dec.height === h)
      assert(dec.channels.toSeq === content.toSeq)
    }
  }

  test("same logical content → identical stats across formats") {
    val (w, h) = (13, 9)
    val content = ImageCodec.content(42L, w, h)
    val viaBmp = ImageCodec.decode(ImageCodec.encodeBmp(w, h, content)).get
    val viaPng = ImageCodec.decode(ImageCodec.encodePng(w, h, content)).get
    assert(viaBmp.channels.toSeq === viaPng.channels.toSeq,
      "format-independence of the logical pixel order")
  }

  test("corrupt payloads decode to None, never throw") {
    val good = ImageCodec.encodeBmp(4, 4, ImageCodec.content(1L, 4, 4))
    assert(ImageCodec.decode(java.util.Arrays.copyOf(good, 40)).isEmpty,
      "truncated mid-header")
    assert(ImageCodec.decode(java.util.Arrays.copyOf(good, 60)).isEmpty,
      "headers intact but pixel data missing")
    assert(ImageCodec.decode(Array.fill[Byte](16)(0xFF.toByte)).isEmpty,
      "not an image at all")
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty, "empty payload")
    val wrongDepth = good.clone()
    wrongDepth(28) = 8 // claim 8bpp — parser only understands 24-bit
    assert(ImageCodec.decode(wrongDepth).isEmpty, "unsupported bit depth")
    val truncPng = java.util.Arrays.copyOf(
      ImageCodec.encodePng(8, 8, ImageCodec.content(2L, 8, 8)), 20)
    assert(ImageCodec.decode(truncPng).isEmpty, "truncated PNG")
  }

  test("crafted headers with overflowing size math classify as None, never crash") {
    // dims near 2^16 overflow int products (rowSize*h, w*h*3) — the
    // 64-bit bounds check must reject them instead of AIOOBE/OOM
    val bomb = ImageCodec.encodeBmp(8, 8, ImageCodec.content(1L, 8, 8))
    def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
      a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
    }
    val hugeDims = bomb.clone()
    putIntLE(hugeDims, 18, 65536); putIntLE(hugeDims, 22, 65536)
    assert(ImageCodec.decode(hugeDims).isEmpty, "overflowing dims")
    val negOff = bomb.clone()
    putIntLE(negOff, 10, -100)
    assert(ImageCodec.decode(negOff).isEmpty, "negative data offset")
    val hugeOff = bomb.clone()
    putIntLE(hugeOff, 10, Int.MaxValue - 4)
    assert(ImageCodec.decode(hugeOff).isEmpty, "offset past the payload")
  }

  test("contentByte is SQL-mirrorable closed-form arithmetic") {
    // the exact expression the DuckDB oracles replay per pixel
    for (seed <- Seq(0L, 1L, 255L, 256L, 4999L); i <- Seq(0L, 1L, 255L, 256L, 3000L))
      assert(ImageCodec.contentByte(seed, i) ===
        (((seed % 256) * 7 + (i % 256) * 13) % 256).toInt)
  }
}
