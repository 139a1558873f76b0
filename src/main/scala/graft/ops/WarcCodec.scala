package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500) — the container 100-TB-scale training
  * corpora actually arrive in: Common Crawl ships `.warc.gz` files of
  * per-record gzip members, each member one WARC record whose payload
  * for `WARC-Type: response` is a raw HTTP/1.1 response (status line +
  * headers + entity body). This codec writes and reads exactly that
  * shape with the repo's corrupt-classify discipline (the q205/q234
  * contract): strict header grammar, Content-Length-bounded payload
  * walks in 64-bit math, and every malformed input — truncated member,
  * bad magic, missing mandatory header, length drift, non-numeric
  * status — classifies as `None`/skip, never throws, never reads out
  * of bounds.
  *
  * Design notes for the 100 TB path: records are INDEPENDENT gzip
  * members, so a crawl file splits at member boundaries and each
  * partition decompresses only its slice — the property that makes
  * warc.gz the de-facto distributed-ingest format. Here whole payloads
  * arrive as one binary cell and the demux is row-local inside
  * `mapPartitions`; a production reader would mount member offsets as
  * the split index. HTML→text extraction ([[extractText]]) is the
  * curation step every web corpus runs first: drop `<script>`/`<style>`
  * subtrees, strip tags, decode the core entities, collapse whitespace.
  *
  * Reference anchor: media/payload columns as opaque binary with typed
  * metadata (zetadex-serving-v2.py:628); the ingest-side extension is
  * SURVEY.md §7.6's training-data mandate.
  */
object WarcCodec {

  /** One parsed WARC record. `httpStatus`/`contentType`/`body` are
    * populated for `response` records with a parseable HTTP payload;
    * a response whose HTTP envelope is malformed keeps the record but
    * flags it (`httpOk = false`) — crawl reality: the WARC layer and
    * the HTTP layer fail independently. */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      date: String,
      httpOk: Boolean,
      httpStatus: Int,
      contentType: String,
      body: Array[Byte],
      /** encoder-only seam: a verbatim HTTP payload (used by the specs
        * and the q241 synthesis to write records whose HTTP layer is
        * deliberately damaged — declared-length drift, bad status —
        * while the WARC layer stays well-formed, the way real crawls
        * break). Ignored by the parser. */
      rawHttp: Option[Array[Byte]] = None)

  private val CRLF = "\r\n"

  // ---- writer ---------------------------------------------------------

  /** Serialize one record's WARC block (headers + payload + blank-line
    * terminator), uncompressed. */
  private def recordBytes(r: WarcRecord): Array[Byte] = {
    val http =
      if (r.rawHttp.isDefined) r.rawHttp.get
      else if (r.warcType == "response") {
        val head = s"HTTP/1.1 ${r.httpStatus} ${
          if (r.httpStatus == 200) "OK" else "NOT OK"}$CRLF" +
          s"Content-Type: ${r.contentType}$CRLF" +
          s"Content-Length: ${r.body.length}$CRLF$CRLF"
        head.getBytes(ISO_8859_1) ++ r.body
      } else r.body
    val headers = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: ").append(r.warcType).append(CRLF)
      .append("WARC-Record-ID: ").append(r.recordId).append(CRLF)
      .append("WARC-Date: ").append(r.date).append(CRLF)
    r.targetUri.foreach(u =>
      headers.append("WARC-Target-URI: ").append(u).append(CRLF))
    if (r.warcType == "response")
      headers.append("Content-Type: application/http;msgtype=response")
        .append(CRLF)
    headers.append("Content-Length: ").append(http.length).append(CRLF)
      .append(CRLF)
    headers.toString.getBytes(ISO_8859_1) ++ http ++
      (CRLF + CRLF).getBytes(ISO_8859_1)
  }

  /** Mux records into a `.warc.gz` crawl file: one gzip MEMBER per
    * record, members concatenated — the Common Crawl layout (members
    * are the distributed-split boundaries). */
  def encodeGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      // close() releases the native Deflater (finalization-only release
      // leaks off-heap memory on long-lived executors); closing the
      // wrapper is a no-op for the shared ByteArrayOutputStream
      try { gz.write(recordBytes(r)); gz.finish() } finally gz.close()
    }
    out.toByteArray
  }

  // ---- reader ---------------------------------------------------------

  /** Inflate a multi-member gzip stream (GZIPInputStream consumes
    * concatenated members per the gzip spec); None on corrupt bytes. */
  private def gunzipAll(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 2 || bytes(0) != 0x1F.toByte ||
      bytes(1) != 0x8B.toByte) return None
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
      // finally, not success-path: corrupt members throw mid-read and
      // the Inflater's native memory must still be released
      try {
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  private def indexOfCrlfCrlf(a: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < a.length) {
      if (a(i) == '\r' && a(i + 1) == '\n' && a(i + 2) == '\r' &&
        a(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse `Name: value` header lines (case-insensitive names, single
    * line per header — WARC continuation lines are deprecated and
    * treated as malformed here); None on any line that is not a
    * well-formed header. */
  private def parseHeaders(s: String): Option[Map[String, String]] = {
    val m = Map.newBuilder[String, String]
    for (line <- s.split(CRLF)) {
      val i = line.indexOf(':')
      if (i <= 0) return None
      m += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
    }
    Some(m.result())
  }

  /** Parse the HTTP response payload of a response record. Returns
    * (httpOk, status, contentType, body); a malformed envelope yields
    * httpOk = false with empty body — the record survives, the HTTP
    * layer is flagged (crawls are full of these). */
  private def parseHttp(p: Array[Byte]): (Boolean, Int, String, Array[Byte]) = {
    val bad = (false, 0, "", Array.empty[Byte])
    val hEnd = indexOfCrlfCrlf(p, 0)
    if (hEnd < 0) return bad
    val head = new String(p, 0, hEnd, ISO_8859_1)
    val lines = head.split(CRLF)
    if (lines.isEmpty) return bad
    val status = lines(0).split(" ")
    if (status.length < 2 || !status(0).startsWith("HTTP/")) return bad
    val code = status(1).toIntOption.getOrElse(-1)
    if (code < 100 || code > 599) return bad
    parseHeaders(lines.drop(1).mkString(CRLF)) match {
      case None => bad
      case Some(h) =>
        val body = java.util.Arrays.copyOfRange(p, hEnd + 4, p.length)
        h.get("content-length") match {
          // an entity shorter/longer than its declared length is a
          // truncated transfer — flag, keep the record
          case Some(l) if l.toLongOption.fold(true)(_ != body.length) =>
            (false, code, h.getOrElse("content-type", ""), Array.empty[Byte])
          case _ =>
            (true, code, h.getOrElse("content-type", ""), body)
        }
    }
  }

  /** Demux a `.warc.gz` crawl file. `None` = the FILE is corrupt (bad
    * gzip, bad WARC grammar, length drift, truncated tail — the walk
    * never reads past a declared bound); within a well-formed file,
    * per-record HTTP-layer damage is carried on the record
    * (`httpOk = false`), not fatal to the file. */
  def decodeGz(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    gunzipAll(bytes).flatMap(decodePlain)

  private def decodePlain(a: Array[Byte]): Option[Seq[WarcRecord]] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < a.length) {
      val hEnd = indexOfCrlfCrlf(a, pos)
      if (hEnd < 0) return None
      val head = new String(a, pos, hEnd - pos, ISO_8859_1)
      if (!head.startsWith("WARC/1.0" + CRLF)) return None
      val headers = parseHeaders(head.substring(10)) match {
        case None => return None
        case Some(h) => h
      }
      val wtype = headers.getOrElse("warc-type", return None)
      val rid = headers.getOrElse("warc-record-id", return None)
      val date = headers.getOrElse("warc-date", return None)
      val len = headers.get("content-length")
        .flatMap(_.toLongOption).getOrElse(return None)
      val bodyStart = hEnd + 4L
      // reject the length BEFORE adding: a near-Long.MaxValue value
      // would wrap bodyEnd negative and slip past the upper-bound check
      // into a throwing array index — the 64-bit walk must stay in
      // [0, a.length] at every step
      if (len < 0 || len > a.length) return None
      val bodyEnd = bodyStart + len
      if (bodyEnd + 4 > a.length) return None
      if (a(bodyEnd.toInt) != '\r' || a(bodyEnd.toInt + 1) != '\n' ||
        a(bodyEnd.toInt + 2) != '\r' || a(bodyEnd.toInt + 3) != '\n')
        return None
      val payload = java.util.Arrays.copyOfRange(
        a, bodyStart.toInt, bodyEnd.toInt)
      val (ok, code, ctype, body) =
        if (wtype == "response") parseHttp(payload)
        else (true, 0, "", payload)
      out += WarcRecord(wtype, rid, headers.get("warc-target-uri"), date,
        ok, code, ctype, body)
      pos = bodyEnd.toInt + 4
    }
    Some(out.result())
  }

  // ---- HTML → text ----------------------------------------------------

  /** The first curation step of every web corpus: drop `<script>` and
    * `<style>` subtrees, strip remaining tags, decode the core
    * entities, collapse runs of whitespace. Row-local, allocation-lean
    * (one pass + one builder); semantics intentionally simple enough
    * to mirror closed-form in an oracle. */
  def extractText(html: String): String = {
    val n = html.length
    val sb = new StringBuilder(n / 2)
    var i = 0
    var skipUntil: String = null
    while (i < n) {
      val ch = html.charAt(i)
      if (ch == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag: drop the tail
        else {
          val tag = html.substring(i + 1, close).toLowerCase
          if (skipUntil == null && (tag == "script" ||
            tag.startsWith("script "))) { skipUntil = "/script"; sb.append(' ') }
          else if (skipUntil == null && (tag == "style" ||
            tag.startsWith("style "))) { skipUntil = "/style"; sb.append(' ') }
          else if (skipUntil != null && tag == skipUntil) {
            skipUntil = null
            // the close tag is a word boundary too — without it,
            // foo<script>x</script>bar fuses to one token "foobar"
            sb.append(' ')
          }
          else if (skipUntil == null) sb.append(' ')
          i = close + 1
        }
      } else {
        if (skipUntil == null) sb.append(ch)
        i += 1
      }
    }
    // &amp; decodes LAST: decoding it first double-decodes escaped
    // entity text (&amp;lt; must yield the literal "&lt;", not "<")
    sb.toString
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&nbsp;", " ")
      .replace("&amp;", "&")
      .split("\\s+").filter(_.nonEmpty).mkString(" ")
  }
}
