package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.WarcCodec
import graft.ops.WarcCodec.WarcRecord
import java.nio.charset.StandardCharsets.ISO_8859_1

/** WARC contract — the web-corpus ingest leg. The codec must round-trip
  * the Common Crawl shape (per-record gzip members, HTTP response
  * payloads), classify file-level damage as None and HTTP-level damage
  * as a flagged record (two independent failure layers, like real
  * crawls), and extract text with the closed-form semantics the q241
  * oracle reasons from. */
class WarcCodecSpec extends AnyFunSuite {

  private def resp(id: Int, status: Int, ctype: String,
                   body: String): WarcRecord =
    WarcRecord("response", s"<urn:uuid:$id>",
      Some(s"https://site$id.example/page/$id"),
      "2026-01-01T00:00:00Z", httpOk = true, status, ctype,
      body.getBytes(ISO_8859_1))

  test("warc.gz round trip: records, HTTP layers, bodies survive") {
    val in = Seq(
      WarcRecord("warcinfo", "<urn:uuid:info>", None,
        "2026-01-01T00:00:00Z", httpOk = true, 0, "",
        "software: graft\r\n".getBytes(ISO_8859_1)),
      resp(1, 200, "text/html", "<html><body>hello</body></html>"),
      resp(2, 404, "text/html", "<html>gone</html>"),
      resp(3, 200, "image/png", "PNG fake"))
    val bytes = WarcCodec.encodeGz(in)
    // a real multi-member gzip stream: magic leads, >1 member present
    assert(bytes(0) == 0x1F.toByte && bytes(1) == 0x8B.toByte)
    assert(bytes.sliding(2).count(w =>
      w(0) == 0x1F.toByte && w(1) == 0x8B.toByte) >= in.length)
    val out = WarcCodec.decodeGz(bytes).getOrElse(fail("must decode"))
    assert(out.length === 4)
    assert(out.head.warcType === "warcinfo")
    val r1 = out(1)
    assert(r1.httpOk && r1.httpStatus === 200 &&
      r1.contentType === "text/html" &&
      new String(r1.body, ISO_8859_1).contains("hello"))
    assert(out(2).httpStatus === 404)
    assert(out(3).contentType === "image/png")
    assert(out(1).targetUri === Some("https://site1.example/page/1"))
  }

  test("file-level damage classifies as None, never throws") {
    val good = WarcCodec.encodeGz(Seq(resp(1, 200, "text/html", "<p>x</p>")))
    assert(WarcCodec.decodeGz(Array.empty[Byte]).isEmpty, "empty")
    assert(WarcCodec.decodeGz("not gzip".getBytes(ISO_8859_1)).isEmpty,
      "bad magic")
    assert(WarcCodec.decodeGz(
      java.util.Arrays.copyOf(good, good.length - 3)).isEmpty,
      "truncated gzip member")
    // inflate, corrupt the WARC grammar, re-gzip: version line
    def regzTampered(tamper: Array[Byte] => Array[Byte]): Option[_] = {
      val plainRec = resp(7, 200, "text/html", "<p>y</p>")
      val gz = WarcCodec.encodeGz(Seq(plainRec))
      val inflated = {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(gz))
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      }
      val bad = tamper(inflated)
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(bad); g.finish()
      WarcCodec.decodeGz(out.toByteArray)
    }
    assert(regzTampered { a => a(5) = '9'; a }.isEmpty, "wrong version")
    assert(regzTampered { a =>
      val s = new String(a, ISO_8859_1)
      s.replaceFirst("Content-Length: \\d+", "Content-Length: 999999")
        .getBytes(ISO_8859_1)
    }.isEmpty, "length past the buffer")
    assert(regzTampered(a => java.util.Arrays.copyOf(a, a.length - 2))
      .isEmpty, "missing record terminator")
    assert(regzTampered { a =>
      new String(a, ISO_8859_1).replaceFirst("WARC-Type", "WARCXType")
        .getBytes(ISO_8859_1)
    }.isEmpty, "mandatory header gone")
    // hostile length near Long.MaxValue: must classify, never wrap the
    // 64-bit walk into a throwing negative index
    assert(regzTampered { a =>
      val s = new String(a, ISO_8859_1)
      s.replaceFirst("Content-Length: \\d+",
        "Content-Length: 9223372036854775800").getBytes(ISO_8859_1)
    }.isEmpty, "overflow-scale declared length")
  }

  test("HTTP-level damage flags the record, keeps the file") {
    // declared entity length ≠ body: a truncated transfer
    val drift = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Length: 999\r\n\r\n<p>short</p>"
    val noStatus = "HTTP-1.1 garbage\r\n\r\nbody"
    val recs = Seq(
      resp(1, 200, "text/html", "<p>fine</p>"),
      resp(2, 200, "text/html", "ignored")
        .copy(rawHttp = Some(drift.getBytes(ISO_8859_1))),
      resp(3, 200, "text/html", "ignored")
        .copy(rawHttp = Some(noStatus.getBytes(ISO_8859_1))))
    val out = WarcCodec.decodeGz(WarcCodec.encodeGz(recs))
      .getOrElse(fail("file layer must survive"))
    assert(out.length === 3)
    assert(out(0).httpOk)
    assert(!out(1).httpOk && out(1).httpStatus === 200 &&
      out(1).body.isEmpty, "length drift → flagged, body dropped")
    assert(!out(2).httpOk && out(2).httpStatus === 0, "unparseable status")
  }

  test("extractText: script/style subtrees drop, tags strip, entities " +
      "decode, whitespace collapses") {
    val html = "<html><head><title>Doc 9</title>" +
      "<style>p{color:red}</style></head><body>\n" +
      "<p>alpha &amp; beta</p><script>var x = '<p>no</p>';</script>" +
      "<p>gamma&nbsp;delta</p></body></html>"
    assert(WarcCodec.extractText(html) ===
      "Doc 9 alpha & beta gamma delta")
    assert(WarcCodec.extractText("") === "")
    assert(WarcCodec.extractText("plain no tags") === "plain no tags")
    assert(WarcCodec.extractText("<p>unterminated <b") === "unterminated")
    // script with attributes still drops its subtree
    assert(WarcCodec.extractText(
      "<script type=\"module\">hidden</script>shown") === "shown")
    // a dropped subtree is still a WORD BOUNDARY
    assert(WarcCodec.extractText("foo<script>x=1</script>bar") ===
      "foo bar")
    // escaped entity text must not double-decode: &amp;lt; is the
    // LITERAL four characters "&lt;"
    assert(WarcCodec.extractText("<p>write &amp;lt;b&amp;gt; here</p>") ===
      "write &lt;b&gt; here")
  }
}
