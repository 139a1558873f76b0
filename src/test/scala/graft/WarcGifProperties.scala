package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.{GifCodec, WarcCodec}
import graft.ops.WarcCodec.WarcRecord
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Property armor for the round-13 containers: WARC and animated GIF
  * must round-trip ARBITRARY content (not just each query's closed-form
  * generators), and random single-byte tampering of the WARC plaintext
  * must classify as corrupt or decode to something structurally sane —
  * never throw (the mutation discipline MjpegAviSpec applies to AVI). */
object WarcGifProperties extends Properties("graft.r13.containers") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  // ---- WARC ----------------------------------------------------------

  private val bodyGen: Gen[Array[Byte]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127)).map(_.map(_.toByte).toArray))

  private val recordGen: Gen[WarcRecord] = for {
    id <- Gen.choose(0, 1 << 20)
    status <- Gen.oneOf(200, 301, 404, 500)
    ctype <- Gen.oneOf("text/html", "text/plain", "image/png",
      "application/octet-stream")
    body <- bodyGen
    isInfo <- Gen.prob(0.15)
  } yield
    if (isInfo)
      WarcRecord("warcinfo", s"<urn:uuid:info-$id>", None,
        "2026-01-01T00:00:00Z", httpOk = true, 0, "", body)
    else
      WarcRecord("response", s"<urn:uuid:$id>",
        Some(s"https://site$id.example/p/$id"), "2026-01-01T00:00:00Z",
        httpOk = true, status, ctype, body)

  private val fileGen: Gen[List[WarcRecord]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, recordGen))

  property("WARC round-trips arbitrary records: types, statuses, " +
      "content types, bodies") =
    Prop.forAll(fileGen) { recs =>
      val out = WarcCodec.decodeGz(WarcCodec.encodeGz(recs))
      out.exists { got =>
        got.length == recs.length && got.zip(recs).forall { case (g, w) =>
          g.warcType == w.warcType && g.recordId == w.recordId &&
            g.targetUri == w.targetUri && g.httpOk &&
            (w.warcType != "response" ||
              (g.httpStatus == w.httpStatus && g.contentType == w.contentType)) &&
            java.util.Arrays.equals(g.body, w.body)
        }
      }
    }

  private val tamperGen = for {
    recs <- fileGen
    pos <- Gen.choose(0, 10000)
    bit <- Gen.choose(0, 7)
  } yield (recs, pos, bit)

  property("random single-bit tamper of the WARC plaintext NEVER throws " +
      "— it classifies as corrupt or stays structurally sane") =
    Prop.forAll(tamperGen) { case (recs, pos, bit) =>
      // inflate, flip one bit, re-gzip: tampering the PLAINTEXT tests the
      // WARC grammar walk (tampering gzip bytes only tests the gzip CRC)
      val gz = WarcCodec.encodeGz(recs)
      val inflated = {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(gz))
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      }
      val bad = inflated.clone()
      bad(pos % bad.length) = (bad(pos % bad.length) ^ (1 << bit)).toByte
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(bad); g.finish()
      WarcCodec.decodeGz(out.toByteArray) match {
        case None => true // classified corrupt: the contract
        case Some(got) => // a benign flip (e.g. inside a body): sane shape
          got.length <= recs.length + 1 && got.forall(_.recordId != null)
      }
    }

  property("extractText never throws on arbitrary tag soup and never " +
      "leaks script/style content") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      "<p>", "</p>", "<script>", "</script>", "<style>", "</style>",
      "<b", ">", "txt", "&amp;", "&bogus;", " ", "<", "LEAK_S")),
      Gen.prob(0.5)) { (parts, wrap) =>
      val html =
        if (wrap) "<script>LEAK_X</script>" + parts.mkString
        else parts.mkString
      val t = WarcCodec.extractText(html)
      !t.contains("LEAK_X")
    }

  // ---- GIF -----------------------------------------------------------

  private val gifGen = for {
    w <- Gen.choose(1, 20)
    h <- Gen.choose(1, 14)
    nFrames <- Gen.choose(1, 5)
    nColors <- Gen.choose(1, 8)
    palette <- Gen.listOfN(nColors * 3, Gen.choose(-128, 127))
    delay <- Gen.choose(0, 600)
    frames <- Gen.listOfN(nFrames,
      Gen.listOfN(w * h, Gen.choose(0, nColors - 1)))
  } yield {
    val pal = palette.map(_.toByte).toArray
    val fs = frames.map { idx =>
      val rgb = new Array[Byte](w * h * 3)
      idx.zipWithIndex.foreach { case (c, i) =>
        rgb(3 * i) = pal(3 * c); rgb(3 * i + 1) = pal(3 * c + 1)
        rgb(3 * i + 2) = pal(3 * c + 2)
      }
      rgb
    }
    (w, h, delay, fs)
  }

  property("animated GIF round-trips ARBITRARY palette frames exactly, " +
      "with the delay on every frame") =
    Prop.forAll(gifGen) { case (w, h, delay, frames) =>
      val v = GifCodec.decode(GifCodec.encode(w, h, delay, frames)).get
      v.width == w && v.height == h && v.frames.length == frames.length &&
        v.delaysCs.forall(_ == delay) &&
        v.frames.zip(frames).forall { case (g, f) =>
          java.util.Arrays.equals(g, f)
        }
    }

  property("GIF decode never throws on arbitrary byte soup") =
    Prop.forAll(bodyGen) { bytes =>
      // seed with the magic sometimes so the parser gets past the header
      val withMagic = "GIF89a".getBytes(ISO_8859_1) ++ bytes
      GifCodec.decode(bytes); GifCodec.decode(withMagic)
      true // the property IS "no throw"
    }
}
