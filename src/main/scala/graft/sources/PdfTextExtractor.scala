package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable
import scala.util.matching.Regex

/** S1 — real PDF text extraction
  * (`/root/reference/extract_and_search.py:40-47`: `fitz.open`, then
  * per-page `get_text()` joined by `"\n"`), as a dependency-free JVM
  * parser suitable for a `mapPartitions` extractor.
  *
  * Resolution order in [[extract]]:
  *  1. Apache PDFBox, loaded REFLECTIVELY when the jar is on the
  *     executor classpath (none ships in this offline container, so
  *     the path is exercised only where the deployment provides it —
  *     the classpath check costs one cached `Class.forName`);
  *  2. the built-in minimal parser below.
  *
  * The built-in parser targets digitally-born PDFs — the class the
  * reference ingests (court-issued digital judgments): objects scanned
  * from the raw bytes (no xref needed, which also makes it tolerant of
  * incrementally-updated files), page order from the /Root → /Pages →
  * /Kids tree (falling back to document order), content streams
  * decoded through /FlateDecode (`java.util.zip.Inflater` — in the
  * JDK) or raw, text assembled from BT…ET blocks: `Tj`/`'`/`"` string
  * shows, `TJ` arrays (kerning numbers dropped), `Td`/`TD`/`T*`/`'`
  * line moves → `"\n"`. Literal strings handle the full escape set
  * (octal, line continuations); hex strings decode pairwise. Bytes map
  * through Latin-1 — correct for the WinAnsi/ASCII text these
  * documents carry; CID/Type0 composite fonts need the PDFBox path.
  * Scanned (image-only) PDFs correctly produce "" — there is no text.
  */
object PdfTextExtractor {

  /** `%PDF-` magic, possibly after a UTF-8 BOM or junk prologue the
    * spec allows within the first 1 KiB.
    */
  def looksLikePdf(data: Array[Byte]): Boolean = {
    val limit = math.min(data.length - 4, 1024)
    var i = 0
    while (i >= 0 && i < limit) {
      if (data(i) == '%' && data(i + 1) == 'P' && data(i + 2) == 'D' &&
        data(i + 3) == 'F') return true
      i += 1
    }
    false
  }

  /** Page texts joined by `"\n"`, matching the reference's
    * `"\n".join(page.get_text() for page in doc)`.
    */
  def extract(data: Array[Byte]): String =
    pdfbox(data).getOrElse(extractBuiltin(data))

  // ---- optional PDFBox path ------------------------------------------

  // 3.x (org.apache.pdfbox.Loader) and 2.x (PDDocument.load) entry
  // points, probed once per JVM.
  private lazy val pdfboxLoader: Option[Array[Byte] => AnyRef] = {
    def tryLoad(cls: String, method: String): Option[Array[Byte] => AnyRef] =
      try {
        val m = Class.forName(cls).getMethod(method, classOf[Array[Byte]])
        Some((bytes: Array[Byte]) => m.invoke(null, bytes))
      } catch { case _: Throwable => None }
    tryLoad("org.apache.pdfbox.Loader", "loadPDF")
      .orElse(tryLoad("org.apache.pdfbox.pdmodel.PDDocument", "load"))
  }

  private def pdfbox(data: Array[Byte]): Option[String] =
    pdfboxLoader.flatMap { load =>
      try {
        val doc = load(data)
        try {
          val stripperCls = Class.forName("org.apache.pdfbox.text.PDFTextStripper")
          val stripper = stripperCls.getDeclaredConstructor().newInstance()
          stripperCls.getMethod("setLineSeparator", classOf[String])
            .invoke(stripper, "\n")
          val nPages = doc.getClass.getMethod("getNumberOfPages")
            .invoke(doc).asInstanceOf[Int]
          val docCls = Class.forName("org.apache.pdfbox.pdmodel.PDDocument")
          val pages = (1 to nPages).map { p =>
            stripperCls.getMethod("setStartPage", classOf[Int]).invoke(stripper, p)
            stripperCls.getMethod("setEndPage", classOf[Int]).invoke(stripper, p)
            stripperCls.getMethod("getText", docCls)
              .invoke(stripper, doc).asInstanceOf[String]
              .stripSuffix("\n")
          }
          Some(pages.mkString("\n"))
        } finally doc.getClass.getMethod("close").invoke(doc)
      } catch { case _: Throwable => None } // fall back to the built-in
    }

  // ---- document metadata (/Info dictionary) --------------------------

  /** The PDF /Info dictionary — the other half of the reference's S2
    * metadata scan (`extract_pdf_metadata`,
    * `/root/reference/extract_and_embed_v2.py:395-399` reads
    * `doc.metadata`: title/author/subject/keywords/creator/producer/
    * dates; the first-page regexes are [[graft.classify.CaseMetadata]]).
    * Keys are returned lower-cased to match fitz's dict key style.
    * Empty map when the file has no /Info (common for generated PDFs).
    */
  def info(data: Array[Byte]): Map[String, String] = {
    val latin = new String(data, StandardCharsets.ISO_8859_1)
    val objects = parseObjects(data, latin)
    val byNum = objects.map(o => o.num -> o).toMap
    val infoNum = """/Info\s+(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(latin).map(_.group(1).toInt)
    infoNum.flatMap(byNum.get) match {
      case None => Map.empty
      case Some(obj) =>
        val keys = Seq("Title", "Author", "Subject", "Keywords",
          "Creator", "Producer", "CreationDate", "ModDate")
        keys.flatMap { k =>
          (s"/$k\\s*(\\(|<)").r.findFirstMatchIn(obj.dict).map { m =>
            val at = m.start(1)
            val (v, _) =
              if (obj.dict.charAt(at) == '(') literalString(obj.dict, at)
              else hexString(obj.dict, at)
            k.toLowerCase -> v
          }
        }.toMap
    }
  }

  // ---- built-in minimal parser ---------------------------------------

  private final case class Obj(num: Int, dict: String, stream: Option[Array[Byte]])

  private val objStart: Regex = """(?s)(\d+)\s+\d+\s+obj\b""".r
  private val refPat: Regex = """(\d+)\s+\d+\s+R""".r

  private[sources] def extractBuiltin(data: Array[Byte]): String = {
    val latin = new String(data, StandardCharsets.ISO_8859_1)
    val objects = parseObjects(data, latin)
    if (objects.isEmpty) return ""
    val byNum = objects.map(o => o.num -> o).toMap

    // page order: walk /Root → /Pages → /Kids when the tree resolves,
    // else every /Type /Page object (or raw content stream) in
    // document order
    val pageObjs: Seq[Obj] = pageTreeOrder(latin, byNum).getOrElse {
      val typed = objects.filter(_.dict.contains("/Type") )
        .filter(o => """/Type\s*/Page\b""".r.findFirstIn(o.dict).isDefined)
      if (typed.nonEmpty) typed else objects.filter(_.stream.isDefined)
    }

    val pages = pageObjs.flatMap { page =>
      val streams: Seq[Array[Byte]] =
        if (page.dict.matches("(?s).*\\/Contents\\b.*")) contentsOf(page, byNum)
        else page.stream.toSeq.map(s => decodeStream(page.dict, s))
      val text = streams.map(s => textFromContent(s)).mkString
      Some(text)
    }
    pages.mkString("\n")
  }

  private def parseObjects(data: Array[Byte], latin: String): Seq[Obj] = {
    val out = mutable.ArrayBuffer[Obj]()
    for (m <- objStart.findAllMatchIn(latin)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val end = latin.indexOf("endobj", bodyStart)
      val bodyEnd = if (end >= 0) end else latin.length
      val body = latin.substring(bodyStart, bodyEnd)
      val streamKw = body.indexOf("stream")
      if (streamKw >= 0 && !body.startsWith("endstream", streamKw)) {
        val dict = body.substring(0, streamKw)
        // stream data starts after the CRLF/LF following the keyword
        var s = bodyStart + streamKw + "stream".length
        if (s < data.length && data(s) == '\r') s += 1
        if (s < data.length && data(s) == '\n') s += 1
        val se = latin.indexOf("endstream", s)
        if (se >= 0) {
          var e = se
          // trim the EOL that precedes "endstream"
          if (e > s && data(e - 1) == '\n') e -= 1
          if (e > s && data(e - 1) == '\r') e -= 1
          out += Obj(num, dict, Some(java.util.Arrays.copyOfRange(data, s, e)))
        } else out += Obj(num, dict, None)
      } else out += Obj(num, body, None)
    }
    out.toSeq
  }

  /** /Root → /Pages → recursive /Kids walk; None when any link is
    * missing (corrupt or exotic file → document-order fallback).
    */
  private def pageTreeOrder(latin: String, byNum: Map[Int, Obj]): Option[Seq[Obj]] = {
    def firstRef(dict: String, key: String): Option[Int] =
      (key + """\s+(\d+)\s+\d+\s+R""").r.findFirstMatchIn(dict).map(_.group(1).toInt)
    val rootNum = firstRef(latin, "/Root")
      .orElse(byNum.values.find(o => o.dict.contains("/Catalog")).map(_.num))
    for {
      root <- rootNum.flatMap(byNum.get)
      pagesNum <- firstRef(root.dict, "/Pages")
      pagesRoot <- byNum.get(pagesNum)
    } yield {
      val out = mutable.ArrayBuffer[Obj]()
      def walk(o: Obj, depth: Int): Unit = {
        if (depth > 64) return // cycle guard
        val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict)
        kids match {
          case Some(k) =>
            refPat.findAllMatchIn(k.group(1)).foreach { r =>
              byNum.get(r.group(1).toInt).foreach(walk(_, depth + 1))
            }
          case None => out += o
        }
      }
      walk(pagesRoot, 0)
      out.toSeq
    }
  }

  /** Content streams of a page: /Contents as one ref or an array. */
  private def contentsOf(page: Obj, byNum: Map[Int, Obj]): Seq[Array[Byte]] = {
    val c = """/Contents\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)""".r
      .findFirstMatchIn(page.dict).map(_.group(1)).getOrElse("")
    refPat.findAllMatchIn(c).map(_.group(1).toInt).toSeq
      .flatMap(byNum.get)
      .flatMap(o => o.stream.map(s => decodeStream(o.dict, s)))
  }

  private def decodeStream(dict: String, raw: Array[Byte]): Array[Byte] =
    if (dict.contains("/FlateDecode")) inflate(raw) else raw

  private[sources] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: Exception => Array.emptyByteArray // not deflate after all
    } finally inf.end()
  }

  /** Text from one decoded content stream: BT…ET blocks only. */
  private[sources] def textFromContent(content: Array[Byte]): String = {
    val s = new String(content, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')

    var i = 0
    var inText = false
    // operand stack of decoded strings since the last operator — `Tj`
    // consumes one, `TJ` is handled at the array level, `"` takes the
    // last string operand
    var pendingStrings = List.empty[String]
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '(' =>
          val (str, next) = literalString(s, i)
          pendingStrings ::= str; i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val (str, next) = hexString(s, i)
          pendingStrings ::= str; i = next
        case '<' => i += 2 // dict open «<<»
        case '[' if inText =>
          val (txt, next) = tjArray(s, i)
          sb.append(txt); i = next
          pendingStrings = Nil
        case '%' => // comment to EOL
          while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        case _ if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(s.charAt(i))) i += 1
          val op = s.substring(start, i)
          op match {
            case "BT" => // new text block → new line (if any text yet)
              inText = true; pendingStrings = Nil; newline()
            case "ET" => inText = false; pendingStrings = Nil
            case "Tj" if inText =>
              pendingStrings.headOption.foreach(sb.append(_)); pendingStrings = Nil
            case "'" if inText =>
              newline(); pendingStrings.headOption.foreach(sb.append(_)); pendingStrings = Nil
            case "\"" if inText =>
              newline(); pendingStrings.headOption.foreach(sb.append(_)); pendingStrings = Nil
            case "Td" | "TD" | "T*" if inText =>
              newline(); pendingStrings = Nil
            case _ => pendingStrings = Nil // any other operator clears operands
          }
        case _ => i += 1
      }
    }
    sb.toString
  }

  /** `(...)` literal string at `from`; returns (decoded, index-after). */
  private def literalString(s: String, from: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = from + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0; var k = 0
              while (j < s.length && k < 3 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1; k += 1
              }
              sb.append((v & 0xFF).toChar); i = j
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  /** `<hex>` string at `from`; returns (decoded, index-after). */
  private def hexString(s: String, from: Int): (String, Int) = {
    var i = from + 1
    val hex = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val sb = new StringBuilder
    var j = 0
    while (j + 2 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (sb.toString, i + 1)
  }

  /** `[ (a) -120 (b) ] TJ` array at `from`: strings concatenated,
    * kerning numbers dropped. Consumes through the closing `]` (the
    * following `TJ` operator is then a no-op with no operands).
    */
  private def tjArray(s: String, from: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = from + 1
    while (i < s.length && s.charAt(i) != ']') {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i); sb.append(str); i = next
        case '<' =>
          val (str, next) = hexString(s, i); sb.append(str); i = next
        case _ => i += 1
      }
    }
    (sb.toString, i + 1)
  }
}
