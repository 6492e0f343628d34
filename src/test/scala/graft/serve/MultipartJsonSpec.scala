package graft.serve

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the serving layer's wire-format helpers: the
  * multipart decoder against curl-shaped bodies (binary payloads with
  * embedded CRLFs, quoted boundaries, escaped filenames) and the JSON
  * writer's Flask-parity conventions (sorted keys, `80.0` doubles).
  */
class MultipartJsonSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  test("boundary extraction handles bare and quoted forms") {
    assert(Multipart.boundary("multipart/form-data; boundary=abc") ==
      Some("abc"))
    assert(Multipart.boundary("multipart/form-data; boundary=\"a b\"") ==
      Some("a b"))
    assert(Multipart.boundary("Multipart/Form-Data; charset=utf-8; boundary=x") ==
      Some("x"))
    assert(Multipart.boundary("application/json").isEmpty)
    assert(Multipart.boundary(null).isEmpty)
  }

  test("parses fields and a binary file part with embedded CRLFs") {
    val payload = Array[Byte](1, 13, 10, 45, 45, 2) // contains \r\n--
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes("--B\r\nContent-Disposition: form-data; name=\"court_level\"\r\n\r\n3\r\n"))
    out.write(bytes("--B\r\nContent-Disposition: form-data; name=\"file\"; filename=\"a.pdf\"\r\n" +
      "Content-Type: application/pdf\r\n\r\n"))
    out.write(payload)
    out.write(bytes("\r\n--B--\r\n"))
    val parts = Multipart.parse(out.toByteArray, "B")
    assert(parts.map(_.name) == Seq("court_level", "file"))
    assert(parts.head.text == "3")
    assert(parts.head.filename.isEmpty)
    val file = parts(1)
    assert(file.filename == Some("a.pdf"))
    assert(file.contentType == Some("application/pdf"))
    assert(file.data.toSeq == payload.toSeq)
  }

  test("escaped quotes in filenames and no trailing CRLF after terminal") {
    val body = bytes(
      "--B\r\nContent-Disposition: form-data; name=\"f\"; filename=\"q\\\"x.pdf\"\r\n\r\nhi\r\n--B--")
    val parts = Multipart.parse(body, "B")
    assert(parts.size == 1)
    assert(parts.head.filename == Some("q\"x.pdf"))
    assert(parts.head.text == "hi")
  }

  test("empty and malformed bodies parse to no parts") {
    assert(Multipart.parse(Array.emptyByteArray, "B").isEmpty)
    assert(Multipart.parse(bytes("--B--"), "B").isEmpty)
    assert(Multipart.parse(bytes("garbage with no boundary"), "B").isEmpty)
  }

  test("json writer sorts keys and renders flask-style doubles") {
    val j = JObj.of(
      "z" -> JLong(2),
      "a" -> JDouble(80.0),
      "m" -> JArr(Seq(JStr("x\"y"), JBool(true), JNull)),
      "pct" -> JDouble(66.67))
    assert(j.render ==
      """{"a": 80.0, "m": ["x\"y", true, null], "pct": 66.67, "z": 2}""")
  }

  test("json writer escapes control characters") {
    assert(JObj.of("s" -> JStr("a\nb\u0001")).render ==
      "{\"s\": \"a\\nb\\u0001\"}")
  }
}
