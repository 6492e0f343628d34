package graft.serve

import java.nio.charset.StandardCharsets

/** Minimal RFC 7578 `multipart/form-data` decoder for the serving
  * layer's S3 source analog (the reference receives uploads via Flask's
  * `request.files` / `request.form`,
  * `/root/reference/extract_and_search_v2.py:303-341`). Parses the raw
  * request body into named parts; file parts keep their bytes opaque
  * (the PDF payload goes straight to the extractor, never through a
  * string decode).
  *
  * Scope: exactly what `curl --form` / browsers / `java.net.http`
  * emit — CRLF line breaks, one `Content-Disposition: form-data` header
  * per part with optional `filename`, no nested multiparts.
  */
object Multipart {

  /** One decoded body part: form field (`filename` empty) or file. */
  final case class Part(name: String, filename: Option[String],
                        contentType: Option[String], data: Array[Byte]) {
    def text: String = new String(data, StandardCharsets.UTF_8)
  }

  /** Boundary token of a `multipart/form-data; boundary=…` content
    * type, `None` when the header is not multipart.
    */
  def boundary(contentType: String): Option[String] = {
    val ct = Option(contentType).getOrElse("")
    if (!ct.toLowerCase.startsWith("multipart/form-data")) None
    else ct.split(';').map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("boundary=") =>
        val v = p.substring("boundary=".length)
        if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
          v.substring(1, v.length - 1)
        else v
    }.filter(_.nonEmpty)
  }

  /** Decode `body` against `boundary`. Malformed bodies yield the parts
    * that do parse (mirroring Flask's lenient Werkzeug parser rather
    * than failing the whole request).
    */
  def parse(body: Array[Byte], boundary: String): Seq[Part] = {
    val delim = ("--" + boundary).getBytes(StandardCharsets.ISO_8859_1)
    val parts = Vector.newBuilder[Part]
    var pos = indexOf(body, delim, 0)
    while (pos >= 0) {
      var cursor = pos + delim.length
      // terminal delimiter is `--boundary--`
      val terminal = cursor + 1 < body.length &&
        body(cursor) == '-' && body(cursor + 1) == '-'
      if (terminal) pos = -1
      else {
        cursor = skipCrlf(body, cursor)
        val headerEnd = indexOf(body, CrlfCrlf, cursor)
        val next = indexOf(body, delim, cursor)
        if (headerEnd < 0 || next < 0 || headerEnd > next) pos = next
        else {
          val headers = new String(body, cursor, headerEnd - cursor,
            StandardCharsets.ISO_8859_1)
          // payload runs up to the CRLF that precedes the next delimiter
          val dataStart = headerEnd + CrlfCrlf.length
          val dataEnd = math.max(dataStart, next - 2)
          partOf(headers, java.util.Arrays.copyOfRange(body, dataStart, dataEnd))
            .foreach(parts += _)
          pos = next
        }
      }
    }
    parts.result()
  }

  private val CrlfCrlf = "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)

  private def skipCrlf(body: Array[Byte], at: Int): Int =
    if (at + 1 < body.length && body(at) == '\r' && body(at + 1) == '\n') at + 2
    else at

  private def partOf(headers: String, data: Array[Byte]): Option[Part] = {
    val lines = headers.split("\r\n").toSeq
    val disp = lines.find(_.toLowerCase.startsWith("content-disposition:"))
    val ctype = lines.find(_.toLowerCase.startsWith("content-type:"))
      .map(_.split(":", 2)(1).trim)
    disp.flatMap { d =>
      val attrs = dispositionAttrs(d.split(":", 2)(1))
      attrs.get("name").map(n => Part(n, attrs.get("filename"), ctype, data))
    }
  }

  /** `form-data; name="a"; filename="b.pdf"` → attribute map. Values
    * may be quoted (with `\"` escapes) or bare tokens.
    */
  private def dispositionAttrs(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      val eq = s.indexOf('=', i)
      if (eq < 0) i = s.length
      else {
        // attribute name = the token right before '='; anything earlier
        // ("form-data;", prior attrs) falls away
        val key = s.substring(i, eq).replace(";", " ").trim
          .split("\\s+").last.toLowerCase
        var j = eq + 1
        while (j < s.length && s(j) == ' ') j += 1
        if (j < s.length && s(j) == '"') {
          val sb = new StringBuilder
          j += 1
          while (j < s.length && s(j) != '"') {
            if (s(j) == '\\' && j + 1 < s.length) { sb.append(s(j + 1)); j += 2 }
            else { sb.append(s(j)); j += 1 }
          }
          out += key -> sb.toString
          i = j + 1
        } else {
          val end = s.indexOf(';', j) match { case -1 => s.length; case e => e }
          out += key -> s.substring(j, end).trim
          i = end
        }
      }
    }
    out.result()
  }

  /** First index of `needle` in `hay` at or after `from`, else -1. */
  private[serve] def indexOf(hay: Array[Byte], needle: Array[Byte],
                             from: Int): Int = {
    if (needle.isEmpty) return math.min(from, hay.length)
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
