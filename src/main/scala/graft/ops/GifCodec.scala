package graft.ops

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

/** Animated GIF — the LOSSLESS palette-indexed animation format (the
  * third real container of the media leg, next to MJPEG/AVI's lossy
  * path and GVID's raw path): frames are LZW-coded INDEX streams over
  * an explicit color table, so for palette-sized content the decode
  * reproduces pixels EXACTLY — exact digests and exact color counts
  * are meaningful here, unlike JPEG (q238's perceptual-verify
  * argument in reverse). Muxed/demuxed with the JDK's ImageIO GIF
  * plugin (zero native deps, the ImageCodec-PNG pattern); per-frame
  * timing rides the Graphic Control Extension (centiseconds) and
  * looping the NETSCAPE 2.0 application extension — what every
  * browser-playable GIF carries.
  *
  * The writer receives logical-RGB frames and palettizes them with an
  * explicit per-frame IndexColorModel built from the frame's OWN
  * distinct colors (≤256 required — this is the format's contract,
  * not a codec shortcut): handing the JDK writer a TYPE_INT_RGB image
  * would invite its default web-safe-palette dither and silently break
  * exactness. Decode classifies malformed payloads as None (magic,
  * frame decode, dimension drift between frames — the q205/q234
  * corrupt-classify discipline).
  *
  * Reference anchor: media as opaque payloads (zetadex-serving-v2.py:
  * 628); in-pipeline decode per SURVEY.md §7.6.
  */
object GifCodec {

  final case class DecodedGif(width: Int, height: Int,
                              delaysCs: Seq[Int],
                              frames: Seq[Array[Byte]])

  /** Build a palettized BufferedImage from logical RGB; requires ≤256
    * distinct colors (the GIF contract). */
  private def palettize(w: Int, h: Int, rgb: Array[Byte]): BufferedImage = {
    require(rgb.length == w * h * 3, "content must be w*h*3 channel bytes")
    val colors = scala.collection.mutable.LinkedHashMap.empty[Int, Byte]
    val idx = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val c = ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) |
        (rgb(3 * i + 2) & 0xFF)
      idx(i) = colors.getOrElseUpdate(c, {
        require(colors.size < 256, "GIF frames carry at most 256 colors")
        colors.size.toByte
      })
      i += 1
    }
    // pad to the next power of two: GIF color tables are 2^n entries by
    // format definition, and the JDK writer mis-encodes LZW minimum
    // code sizes for odd-sized index models (rows after the first come
    // back wrong — caught by the round-trip property on 6-color frames)
    val n = math.max(2, Integer.highestOneBit(colors.size * 2 - 1))
    val r = new Array[Byte](n); val g = new Array[Byte](n)
    val b = new Array[Byte](n)
    colors.keysIterator.zipWithIndex.foreach { case (c, j) =>
      r(j) = ((c >> 16) & 0xFF).toByte; g(j) = ((c >> 8) & 0xFF).toByte
      b(j) = (c & 0xFF).toByte
    }
    val cm = new IndexColorModel(8, n, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, w, h, idx)
    img
  }

  /** GCE + NETSCAPE-loop metadata for one frame. */
  private def frameMeta(writer: javax.imageio.ImageWriter,
                        spec: ImageTypeSpecifier,
                        delayCs: Int, first: Boolean) = {
    val meta = writer.getDefaultImageMetadata(spec, null)
    val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image
    val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
    def child(name: String): IIOMetadataNode = {
      var n = root.getFirstChild
      while (n != null && n.getNodeName != name) n = n.getNextSibling
      if (n != null) n.asInstanceOf[IIOMetadataNode]
      else { val c = new IIOMetadataNode(name); root.appendChild(c); c }
    }
    // the default ImageDescriptor leaves interlace engaged, and the JDK
    // writer's interlaced row reordering corrupts short images (h < 8:
    // rows came back permuted with one lost — caught by the round-trip
    // property); sequential row order is what this encoder means anyway
    val desc = child("ImageDescriptor")
    desc.setAttribute("imageLeftPosition", "0")
    desc.setAttribute("imageTopPosition", "0")
    desc.setAttribute("imageWidth", spec.getSampleModel.getWidth.toString)
    desc.setAttribute("imageHeight", spec.getSampleModel.getHeight.toString)
    desc.setAttribute("interlaceFlag", "FALSE")
    val gce = child("GraphicControlExtension")
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", delayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    if (first) { // NETSCAPE 2.0 infinite loop, once, on the lead frame
      val apps = child("ApplicationExtensions")
      val app = new IIOMetadataNode("ApplicationExtension")
      app.setAttribute("applicationID", "NETSCAPE")
      app.setAttribute("authenticationCode", "2.0")
      app.setUserObject(Array[Byte](1, 0, 0))
      apps.appendChild(app)
    }
    meta.setFromTree(fmt, root)
    meta
  }

  /** Mux logical-RGB frames into an animated GIF with the given
    * per-frame delay (centiseconds, the GIF clock). */
  def encode(w: Int, h: Int, delayCs: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "an animation has at least one frame")
    require(delayCs >= 0 && delayCs <= 0xFFFF, "delay is a 16-bit field")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zipWithIndex.foreach { case (f, i) =>
        val img = palettize(w, h, f)
        val spec = new ImageTypeSpecifier(img)
        writer.writeToSequence(
          new IIOImage(img, null, frameMeta(writer, spec, delayCs, i == 0)),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Demux an animated GIF to logical-RGB frames + per-frame delays;
    * None on anything malformed (magic, undecodable frame, dimension
    * drift across frames). Frames here are full-replacement (our
    * encoder's disposal "none" over full-size frames); a partial-frame
    * GIF from elsewhere still decodes — ImageIO composites per spec —
    * but dimension drift between LOGICAL frames classifies as corrupt,
    * because downstream temporal ops assume one frame geometry. */
  def decode(bytes: Array[Byte]): Option[DecodedGif] = {
    if (bytes.length < 6) return None
    val magic = new String(bytes, 0, 6, "ISO-8859-1")
    if (magic != "GIF89a" && magic != "GIF87a") return None
    try {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        var w = -1; var h = -1
        val frames = Seq.newBuilder[Array[Byte]]
        val delays = Seq.newBuilder[Int]
        for (i <- 0 until n) {
          val img = reader.read(i)
          if (w < 0) { w = img.getWidth; h = img.getHeight }
          else if (img.getWidth != w || img.getHeight != h) return None
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
          frames += rgb
          // delay off the frame's GCE; absent extension = 0 per spec
          val meta = reader.getImageMetadata(i)
          val root = meta.getAsTree(meta.getNativeMetadataFormatName)
          var d = 0
          var c = root.getFirstChild
          while (c != null) {
            if (c.getNodeName == "GraphicControlExtension")
              d = c.asInstanceOf[IIOMetadataNode]
                .getAttribute("delayTime").toIntOption.getOrElse(0)
            c = c.getNextSibling
          }
          delays += d
        }
        Some(DecodedGif(w, h, delays.result(), frames.result()))
      } finally { iis.close(); reader.dispose() }
    } catch { case _: Exception => None }
  }

  /** Distinct-color count of one logical-RGB frame — palette
    * introspection (≤256 by the format's contract on our payloads). */
  def colorCount(frame: Array[Byte]): Int = {
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var i = 0
    while (i + 2 < frame.length) {
      seen += ((frame(i) & 0xFF) << 16) | ((frame(i + 1) & 0xFF) << 8) |
        (frame(i + 2) & 0xFF)
      i += 3
    }
    seen.size
  }
}
