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
  * documents carry. CID/Type0 composite fonts (ubiquitous in real
  * court PDFs — the reference's fitz `get_text` handles their embedded
  * CID-keyed fonts, `/root/reference/extract_and_search.py:40-47`) are
  * mapped through their embedded `/ToUnicode` CMap: the page's
  * /Resources → /Font dictionary is resolved, each Type0 font's CMap
  * (`begincodespacerange`/`beginbfchar`/`beginbfrange`, 1- and 2-byte
  * codes, UTF-16BE targets incl. array-form ranges) is parsed once,
  * and `Tf` font selection switches string decoding to the CMap —
  * covering digitally-born Type0 documents without PDFBox. PDF 1.5+
  * object streams (`/Type /ObjStm` — where modern generators compress
  * the Catalog/Pages/Page dictionaries) are decoded and their
  * contained objects joined into the object table before the page
  * walk. Standard-handler ENCRYPTED documents (owner-locked, empty
  * user password — the form court registries publish constantly, which
  * fitz opens transparently) decrypt before any of the above: RC4
  * 40–128 (/V 1–2) and AES-128-CBC (/V 4 /AESV2), file key per
  * ISO 32000-1 Algorithm 2 and per-object keys per Algorithm 1; /V 5
  * (AES-256) is the documented boundary and falls through undecrypted
  * rather than throwing. Scanned (image-only) PDFs correctly produce
  * "" — there is no text.
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
    val objects = expandObjectStreams(decryptObjects(latin, parseObjects(data, latin)))
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

  // ---- /ToUnicode CMap (CID/Type0 composite fonts) -------------------

  /** Minimal embedded `/ToUnicode` CMap: codespace byte-lengths plus
    * bfchar/bfrange mappings. Codes are matched against the declared
    * codespaces (2-byte Identity-H style when none declared), targets
    * are UTF-16BE; unmapped-but-in-codespace codes emit nothing (the
    * glyph has no text meaning). This is the class of CMap
    * digitally-born Type0 court PDFs embed.
    */
  private[sources] final class ToUnicodeCMap(
      codeSpaces: Seq[(Int, Int, Int)], // (byteLen, lo, hi)
      chars: Map[Int, String],
      ranges: Seq[(Int, Int, Either[String, IndexedSeq[String]])]) {

    private def lookup(code: Int): Option[String] =
      chars.get(code).orElse {
        ranges.collectFirst {
          case (lo, hi, dst) if code >= lo && code <= hi => dst match {
            case Right(arr) =>
              if (code - lo < arr.length) arr(code - lo) else ""
            case Left(start) =>
              // increment the last UTF-16 code unit by the offset
              if (start.isEmpty) ""
              else start.substring(0, start.length - 1) +
                (start.charAt(start.length - 1) + (code - lo)).toChar
          }
        }
      }

    /** Decode a raw byte-string (chars 0–255, as produced by the
      * literal/hex string readers) through the CMap.
      */
    def decode(raw: String): String = {
      val spaces = if (codeSpaces.nonEmpty) codeSpaces else Seq((2, 0, 0xFFFF))
      val out = new StringBuilder
      var i = 0
      while (i < raw.length) {
        var used = 0
        spaces.foreach { case (len, lo, hi) =>
          if (used == 0 && i + len <= raw.length) {
            var code = 0
            var k = 0
            while (k < len) { code = (code << 8) | (raw.charAt(i + k) & 0xFF); k += 1 }
            if (code >= lo && code <= hi) {
              lookup(code).foreach(out.append(_))
              used = len
            }
          }
        }
        if (used == 0) { // outside every declared space: one byte, best effort
          lookup(raw.charAt(i) & 0xFF).foreach(out.append(_))
          used = 1
        }
        i += used
      }
      out.toString
    }
  }

  private val cmapHexTok: Regex = """<([0-9A-Fa-f]+)>""".r

  /** UTF-16BE hex → String (whole 4-digit code units; CMap targets are
    * UTF-16BE per the spec).
    */
  private def utf16(hex: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    // a dangling 2-digit tail (non-conformant but seen in the wild):
    // treat as a single byte value
    if (i + 2 <= hex.length) sb.append(Integer.parseInt(hex.substring(i, i + 2), 16).toChar)
    sb.toString
  }

  private[sources] def parseToUnicode(cmap: String): ToUnicodeCMap = {
    def sections(kw: String): Iterator[String] =
      (s"(?s)begin$kw(.*?)end$kw").r.findAllMatchIn(cmap).map(_.group(1))
    val spaces = sections("codespacerange").flatMap { body =>
      cmapHexTok.findAllMatchIn(body).map(_.group(1)).grouped(2).collect {
        case Seq(lo, hi) if lo.length == hi.length =>
          (lo.length / 2, Integer.parseInt(lo, 16), Integer.parseInt(hi, 16))
      }
    }.toSeq
    val chars = sections("bfchar").flatMap { body =>
      cmapHexTok.findAllMatchIn(body).map(_.group(1)).grouped(2).collect {
        case Seq(src, dst) => Integer.parseInt(src, 16) -> utf16(dst)
      }
    }.toMap
    val ranges = sections("bfrange").flatMap { body =>
      val out = mutable.ArrayBuffer[(Int, Int, Either[String, IndexedSeq[String]])]()
      var i = 0
      def skipWs(): Unit =
        while (i < body.length && body.charAt(i).isWhitespace) i += 1
      def readHex(): Option[String] = {
        skipWs()
        if (i < body.length && body.charAt(i) == '<') {
          val j = body.indexOf('>', i)
          if (j < 0) None
          else { val h = body.substring(i + 1, j); i = j + 1; Some(h) }
        } else None
      }
      var ok = true
      while (ok) {
        (readHex(), readHex()) match {
          case (Some(lo), Some(hi)) =>
            val (loI, hiI) = (Integer.parseInt(lo, 16), Integer.parseInt(hi, 16))
            skipWs()
            if (i < body.length && body.charAt(i) == '[') {
              i += 1
              val arr = mutable.ArrayBuffer[String]()
              var h = readHex()
              while (h.isDefined) { arr += utf16(h.get); h = readHex() }
              skipWs()
              if (i < body.length && body.charAt(i) == ']') i += 1
              out += ((loI, hiI, Right(arr.toIndexedSeq)))
            } else readHex() match {
              case Some(d) => out += ((loI, hiI, Left(utf16(d))))
              case None => ok = false
            }
          case _ => ok = false
        }
      }
      out
    }.toSeq
    new ToUnicodeCMap(spaces, chars, ranges)
  }

  /** A balanced `<< … >>` dictionary starting at/after `from`. */
  private def balancedDict(s: String, from: Int): String = {
    val start = s.indexOf("<<", from)
    if (start < 0) return ""
    var depth = 0
    var i = start
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      } else i += 1
    }
    s.substring(start)
  }

  /** Resource-name → CMap for the page's Type0 fonts that carry a
    * /ToUnicode stream (simple fonts keep the Latin-1 path — their
    * bytes ARE the text for the WinAnsi documents this parser targets).
    */
  private def fontCMaps(page: Obj, byNum: Map[Int, Obj]): Map[String, ToUnicodeCMap] = {
    val resDict: String = {
      val inline = page.dict.indexOf("/Resources")
      """/Resources\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(page.dict)
        .flatMap(m => byNum.get(m.group(1).toInt)).map(_.dict)
        .getOrElse(if (inline >= 0) balancedDict(page.dict, inline) else "")
    }
    if (resDict.isEmpty) return Map.empty
    val fi = resDict.indexOf("/Font")
    if (fi < 0) return Map.empty
    val fontDict: String =
      """/Font\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(resDict)
        .flatMap(m => byNum.get(m.group(1).toInt)).map(_.dict)
        .getOrElse(balancedDict(resDict, fi))
    """/([A-Za-z0-9_.]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fontDict)
      .flatMap { m =>
        byNum.get(m.group(2).toInt)
          .filter(f => """/Subtype\s*/Type0\b""".r.findFirstIn(f.dict).isDefined)
          .flatMap { f =>
            """/ToUnicode\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(f.dict)
              .flatMap(r => byNum.get(r.group(1).toInt))
              .flatMap(o => o.stream.map(s => decodeStream(o.dict, s)))
              .map(bytes => m.group(1) ->
                parseToUnicode(new String(bytes, StandardCharsets.ISO_8859_1)))
          }
      }.toMap
  }

  // ---- standard security handler (encrypted PDFs) --------------------

  /** PDF standard encryption (ISO 32000-1 §7.6) for the dominant
    * real-world case: owner-locked documents with an EMPTY user
    * password — court registries publish judgments this way
    * constantly, and fitz (the reference's extractor) opens them
    * transparently. Supports /V 1-2 (RC4 40-128) and /V 4 with
    * /AESV2 (AES-128-CBC): the file key derives from the empty-user-
    * password pad via Algorithm 2 (MD5 of pad ‖ /O ‖ /P-LE32 ‖ ID[0],
    * 50× re-hash for /R ≥ 3), per-object keys via Algorithm 1
    * (MD5 of key ‖ objnum-LE24 ‖ gen-LE16 [‖ "sAlT" for AES]), and
    * every STREAM decrypts before the normal pipeline runs — which
    * covers page text transitively (content strings live inside
    * streams) — and standalone DICTIONARY STRINGS (e.g. /Info values)
    * decrypt in place (re-emitted as plaintext hex strings), so S2
    * metadata of an encrypted file is real text.
    * /V 5 (AES-256, what current-generation producers emit) is
    * supported for /R 5 and /R 6 via the public ISO 32000-2
    * algorithms: the intermediate key comes from Algorithm 2.A's
    * empty-user-password branch (SHA-256 over password ‖ key salt for
    * /R 5; the Algorithm 2.B iterated hardened hash for /R 6), /U is
    * VALIDATED against the validation salt (a non-empty user password
    * means no key exists — the file correctly falls through
    * undecrypted rather than emitting garbage), and the 32-byte file
    * key is the AES-256-CBC decryption of /UE under a zero IV. /V 5
    * uses the file key directly per object (Algorithm 1's per-object
    * derivation applies only to /V ≤ 4).
    * For /V ≤ 4, user-password VALIDATION is deliberately not
    * performed: a data-pipeline extractor either derives the right
    * key (empty user pw) or produces garbage it would anyway.
    */
  private[sources] object PdfCrypt {

    /** The spec's 32-byte password pad (ISO 32000-1 Table 21 area —
      * a published constant).
      */
    val Pad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
      0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
      0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

    def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update)
      d.digest()
    }

    /** RC4 (public algorithm) — hand-rolled so no JCE provider policy
      * can interfere; the key is ≤16 bytes and data per object small.
      */
    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val s = Array.tabulate(256)(_.toByte)
      var j = 0
      for (i <- 0 until 256) {
        j = (j + s(i) + key(i % key.length)) & 0xFF
        val t = s(i); s(i) = s(j); s(j) = t
      }
      val out = new Array[Byte](data.length)
      var i = 0; j = 0
      for (n <- data.indices) {
        i = (i + 1) & 0xFF
        j = (j + s(i)) & 0xFF
        val t = s(i); s(i) = s(j); s(j) = t
        out(n) = (data(n) ^ s((s(i) + s(j)) & 0xFF)).toByte
      }
      out
    }

    def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      if (data.length < 32 || data.length % 16 != 0) return Array.emptyByteArray
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data.drop(16))
        // strip PKCS#7 padding manually (tolerates the broken-padding
        // files real generators emit: invalid pad → keep the bytes)
        val pad = plain.last & 0xFF
        if (pad >= 1 && pad <= 16 && pad <= plain.length &&
          plain.takeRight(pad).forall(b => (b & 0xFF) == pad))
          plain.dropRight(pad)
        else plain
      } catch { case _: Throwable => Array.emptyByteArray }
    }

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    /** Algorithm 2: the file encryption key for the EMPTY user
      * password. `keyLen` in bytes (Length/8; 5 for /V 1).
      */
    def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], keyLen: Int,
                r: Int): Array[Byte] = {
      var h = md5(Pad, o.take(32), le32(p), id0)
      if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(keyLen))
      h.take(keyLen)
    }

    /** Algorithm 1: the per-object key. */
    def objKey(fileKey: Array[Byte], num: Int, gen: Int,
               aes: Boolean): Array[Byte] = {
      val ext = Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte,
        ((gen >> 8) & 0xFF).toByte) ++
        (if (aes) Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)
         else Array.emptyByteArray)
      md5(fileKey ++ ext).take(math.min(fileKey.length + 5, 16))
    }

    def decrypt(objectKey: Array[Byte], data: Array[Byte],
                aes: Boolean): Array[Byte] =
      if (aes) aesCbcDecrypt(objectKey, data) else rc4(objectKey, data)

    // ---- AES-256 (/V 5) — ISO 32000-2 §7.6.4 -------------------------

    def sha256(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      parts.foreach(d.update)
      d.digest()
    }

    /** AES-CBC-encrypt without padding (Algorithm 2.B's inner step —
      * the input is always a multiple of 16).
      */
    def aesCbcEncryptNoPad(key: Array[Byte], iv: Array[Byte],
                           data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    }

    /** ISO 32000-2 Algorithm 2.B (the /R 6 iterated hardened hash),
      * degrading to the single SHA-256 of the deprecated /R 5. `extra`
      * is the 48-byte /U value when deriving owner-password hashes
      * (empty for the user-password case this extractor runs).
      */
    def hash2B(password: Array[Byte], salt: Array[Byte],
               extra: Array[Byte], r: Int): Array[Byte] = {
      var k = sha256(password, salt, extra)
      if (r < 6) return k
      var i = 0
      var lastE = 0
      while (i < 64 || lastE > i - 32) {
        val block = password ++ k ++ extra
        val k1 = new Array[Byte](block.length * 64)
        var j = 0
        while (j < 64) {
          System.arraycopy(block, 0, k1, j * block.length, block.length)
          j += 1
        }
        val e = aesCbcEncryptNoPad(k.take(16), k.slice(16, 32), k1)
        val mod = e.take(16).map(b => b & 0xFF).sum % 3
        k = java.security.MessageDigest.getInstance(mod match {
          case 0 => "SHA-256"
          case 1 => "SHA-384"
          case _ => "SHA-512"
        }).digest(e)
        lastE = e(e.length - 1) & 0xFF
        i += 1
      }
      k.take(32)
    }

    /** Algorithm 2.A, empty-user-password branch: validate /U's hash
      * against its validation salt, then unwrap the 32-byte file key
      * from /UE with the key-salt intermediate key (AES-256-CBC, zero
      * IV, no padding). None when /U does not validate (the user
      * password is not empty — no key exists for us) or the fields are
      * malformed.
      */
    def v5FileKey(u: Array[Byte], ue: Array[Byte], r: Int): Option[Array[Byte]] = {
      if (u.length < 48 || ue.length < 32) return None
      val validation = hash2B(Array.emptyByteArray, u.slice(32, 40),
        Array.emptyByteArray, r)
      if (!java.util.Arrays.equals(validation, u.take(32))) return None
      val ik = hash2B(Array.emptyByteArray, u.slice(40, 48),
        Array.emptyByteArray, r)
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ik, "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        Some(c.doFinal(ue.take(32)))
      } catch { case _: Throwable => None }
    }
  }

  /** Parsed encryption context: file key + cipher choice. `v5` uses
    * the file key directly per object (Algorithm 1's per-object MD5
    * derivation is a /V ≤ 4 construct).
    */
  private final case class Encryption(fileKey: Array[Byte], aes: Boolean,
                                      encryptObjNum: Int,
                                      v5: Boolean = false,
                                      encryptStrings: Boolean = true,
                                      encryptStreams: Boolean = true) {
    def decryptBytes(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (v5) PdfCrypt.aesCbcDecrypt(fileKey, data)
      else PdfCrypt.decrypt(PdfCrypt.objKey(fileKey, num, gen, aes), data, aes)
  }

  /** The top-level entries of a `<< … >>` dictionary with nested
    * dictionaries' CONTENT removed (strings skipped atomically so a
    * hex value ending in `>` cannot desynchronize the depth count).
    * `/Length` in a /V 4 /Encrypt dict is the poster child: the
    * top-level value is the key length in BITS, while the nested
    * crypt-filter dict's /Length is in BYTES — a whole-dict regex can
    * grab the wrong one and silently derive a garbage file key.
    */
  private[sources] def topLevelEntries(dict: String): String = {
    val sb = new StringBuilder
    var depth = 0
    var i = 0
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<') {
        depth += 1; if (depth == 1) sb.append("<<"); i += 2
      } else if (c == '>' && i + 1 < dict.length && dict.charAt(i + 1) == '>') {
        if (depth == 1) sb.append(">>")
        depth -= 1; i += 2
      } else if (c == '<') { // hex string: atomic
        val j = dict.indexOf('>', i)
        val end = if (j < 0) dict.length else j + 1
        if (depth == 1) sb.append(dict.substring(i, end))
        i = end
      } else if (c == '(') { // literal string: atomic, honoring escapes
        var j = i + 1
        var d = 1
        while (j < dict.length && d > 0) {
          val ch = dict.charAt(j)
          if (ch == '\\') j += 2
          else {
            if (ch == '(') d += 1 else if (ch == ')') d -= 1
            j += 1
          }
        }
        if (depth == 1) sb.append(dict.substring(i, math.min(j, dict.length)))
        i = j
      } else {
        if (depth == 1) sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Regex class for one PDF name character: anything but the ISO
    * 32000 whitespace set (NUL HT LF FF CR SP — NOT Java's `\s` or
    * `isWhitespace`, both of which differ) and the delimiters
    * `( ) < > [ ] { } / %` — names may carry hyphens, dots, and `#xx`
    * escapes that `\w` rejects.
    * [[isNameChar]] is the predicate form of the SAME charset; the two
    * must stay character-for-character identical (pinned by a spec
    * sweep over the full char range) or key tokenization in
    * [[nestedDictOf]] diverges from the filter-name matching that
    * references it.
    */
  private[sources] val NameCharset = "[^\\x00\\t\\n\\f\\r /\\[\\]()<>{}%]"

  private[sources] def isNameChar(ch: Char): Boolean =
    "\u0000\t\n\f\r ()<>[]{}/%".indexOf(ch) < 0

  /** Decode `#xx` escapes in a PDF name token (ISO 32000 7.3.5). */
  private[sources] def decodeName(raw: String): String =
    "#([0-9A-Fa-f]{2})".r.replaceAllIn(raw, m =>
      java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))

  /** The balanced `<< … >>` dictionary VALUE of top-level key `/name`
    * (compared after `#xx` decode) inside `dict` — the /CF crypt-filter
    * map lookup. Non-dictionary values and nested occurrences of the
    * key are ignored; strings are skipped atomically like
    * [[topLevelEntries]]. None when absent.
    */
  private[sources] def nestedDictOf(dict: String, name: String): Option[String] = {
    def skipString(from: Int): Int =
      if (dict.charAt(from) == '(') {
        var j = from + 1
        var d = 1
        while (j < dict.length && d > 0) {
          val ch = dict.charAt(j)
          if (ch == '\\') j += 2
          else { if (ch == '(') d += 1 else if (ch == ')') d -= 1; j += 1 }
        }
        j
      } else { // hex string
        val j = dict.indexOf('>', from)
        if (j < 0) dict.length else j + 1
      }
    // index just past the `>>` matching the `<<` at `from`
    def balancedEnd(from: Int): Int = {
      var j = from
      var depth = 0
      while (j < dict.length) {
        val c = dict.charAt(j)
        if (c == '<' && j + 1 < dict.length && dict.charAt(j + 1) == '<') {
          depth += 1; j += 2
        } else if (c == '>' && j + 1 < dict.length && dict.charAt(j + 1) == '>') {
          depth -= 1; j += 2
          if (depth == 0) return j
        } else if (c == '<' || c == '(') j = skipString(j)
        else j += 1
      }
      dict.length
    }
    var i = dict.indexOf("<<")
    if (i < 0) return None
    i += 2
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '>' && i + 1 < dict.length && dict.charAt(i + 1) == '>') return None
      else if (c == '/') {
        var j = i + 1
        while (j < dict.length && isNameChar(dict.charAt(j))) j += 1
        val key = decodeName(dict.substring(i + 1, j))
        var k = j
        while (k < dict.length && dict.charAt(k).isWhitespace) k += 1
        if (k + 1 < dict.length && dict.charAt(k) == '<' && dict.charAt(k + 1) == '<') {
          val e = balancedEnd(k)
          if (key == name) return Some(dict.substring(k, e))
          i = e
        } else if (k < dict.length && dict.charAt(k) == '/') {
          // name-valued entry (`/X /CF`): consume the VALUE name too,
          // or the key scan would re-read it as a key and a following
          // dict (`/X /CF << … >>`) would mis-resolve as /CF's value
          var v = k + 1
          while (v < dict.length && isNameChar(dict.charAt(v))) v += 1
          i = v
        } else i = j
      } else if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<')
        i = balancedEnd(i)
      else if (c == '<' || c == '(') i = skipString(i)
      else i += 1
    }
    None
  }

  /** Detect and parse the standard security handler from the trailer's
    * /Encrypt reference. None for unencrypted files, unsupported
    * versions, or non-Standard filters.
    */
  private def encryptionOf(latin: String,
                           byNum: Map[Int, Obj]): Option[Encryption] = {
    val encNum = """/Encrypt\s+(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(latin).map(_.group(1).toInt)
    encNum.flatMap(byNum.get).flatMap { enc =>
      val d = enc.dict
      // version/revision/length are TOP-LEVEL entries; a whole-dict
      // regex would also match the nested crypt-filter dict's /Length
      // (bytes, not bits — the common AESV2 form)
      val top = topLevelEntries(d)
      def strVal(key: String, from: String): Option[Array[Byte]] =
        (s"/$key\\s*(\\(|<)").r.findFirstMatchIn(from).map { m =>
          val at = m.start(1)
          val (s, _) =
            if (from.charAt(at) == '(') literalString(from, at)
            else hexString(from, at)
          s.toCharArray.map(c => (c & 0xFF).toByte)
        }
      if (!d.contains("/Standard")) None
      else {
        val v = """/V\s+(\d+)""".r.findFirstMatchIn(top)
          .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(0)
        val r = """/R\s+(\d+)""".r.findFirstMatchIn(top)
          .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
          .getOrElse(if (v >= 4) 4 else if (v >= 2) 3 else 2)
        // ISO 32000 7.6.2: for /V >= 4 the string/stream crypt filters
        // default to /Identity when /StrF//StmF are ABSENT — a file may
        // encrypt only its streams and leave strings plaintext (or the
        // reverse); "decrypting" plaintext turns AES strings into empty
        // <> and RC4 into garbage, a regression vs leaving them alone.
        // A NAMED filter resolves through the /CF dictionary to its
        // /CFM: /None means "no decryption" just like Identity (ADVICE
        // r11 — treating any non-Identity name as encrypted garbled
        // /CFM /None files), and name tokens use the full PDF-name
        // charset with #xx escapes, not \w. A name absent from /CF is
        // treated as encrypted — the conservative reading of a file
        // that violates the spec's "shall be present" either way.
        // /V <= 3 has no crypt filters: both are always encrypted.
        def filterActive(key: String): Boolean =
          v <= 3 || {
            (s"/$key\\s*/($NameCharset+)").r.findFirstMatchIn(top)
              .map(m => decodeName(m.group(1))) match {
              case None => false
              case Some("Identity") => false
              case Some(fname) =>
                val cfm = nestedDictOf(d, "CF")
                  .flatMap(cf => nestedDictOf(cf, fname))
                  .flatMap(f => (s"/CFM\\s*/($NameCharset+)").r
                    .findFirstMatchIn(f).map(m => decodeName(m.group(1))))
                !cfm.exists(m => m == "None" || m == "Identity")
            }
          }
        if (v == 5) {
          // AES-256: unwrap the file key from /U + /UE (Algorithm 2.A,
          // empty user password; /R 6 hardened hash or /R 5 SHA-256)
          for {
            u <- strVal("U", top)
            ue <- strVal("UE", top)
            key <- PdfCrypt.v5FileKey(u, ue, r)
          } yield Encryption(key, aes = true, enc.num, v5 = true,
            encryptStrings = filterActive("StrF"),
            encryptStreams = filterActive("StmF"))
        } else if (v < 1 || v > 4) None
        else {
          // hostile digit runs must degrade to defaults, not throw:
          // a 10-digit /Length or 20-digit /P overflows toInt/toLong
          // (the stream-/Length sibling of this guard is r11's)
          val lenBits = """/Length\s+(\d+)""".r.findFirstMatchIn(top)
            .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
            .getOrElse(40)
          val p = """/P\s+(-?\d+)""".r.findFirstMatchIn(top)
            .flatMap(m => scala.util.Try(m.group(1).toLong.toInt).toOption)
            .getOrElse(-1)
          val aes = v == 4 && d.contains("/AESV2")
          val o = strVal("O", d)
          val id0 = """/ID\s*\[\s*<([0-9A-Fa-f]*)>""".r
            .findFirstMatchIn(latin)
            .map(m => m.group(1).grouped(2).filter(_.length == 2)
              .map(Integer.parseInt(_, 16).toByte).toArray)
            .getOrElse(Array.emptyByteArray)
          o.map { ov =>
            // AESV2 is by definition 128-bit; only RC4 (/V 2) honors
            // the declared top-level /Length
            val keyLen =
              if (aes) 16
              else if (v == 1) 5
              else math.max(5, math.min(16, lenBits / 8))
            Encryption(PdfCrypt.fileKey(ov, p, id0, keyLen, r), aes, enc.num,
              encryptStrings = filterActive("StrF"),
              encryptStreams = filterActive("StmF"))
          }
        }
      }
    }
  }

  /** Decrypt every object's stream AND its dictionary strings in place
    * (the /Encrypt dictionary's own object is never encrypted; objects
    * later expanded from an /ObjStm are already covered by that
    * stream's decryption and must not decrypt twice — this runs before
    * expansion). Decrypted dictionary strings are re-emitted as
    * plaintext HEX strings, so every downstream reader (/Info
    * metadata, page-tree regexes) parses them unchanged — S2 metadata
    * of an encrypted file is real text, not ciphertext. No-op for
    * unencrypted files.
    */
  private def decryptObjects(latin: String, objects: Seq[Obj]): Seq[Obj] = {
    val byNum = objects.map(o => o.num -> o).toMap
    encryptionOf(latin, byNum) match {
      case None => objects
      case Some(enc) =>
        objects.map { o =>
          if (o.num == enc.encryptObjNum) o
          else o.copy(
            dict = if (enc.encryptStrings)
              decryptDictStrings(o.dict, raw =>
                enc.decryptBytes(o.num, o.gen, raw))
            else o.dict,
            stream = if (enc.encryptStreams)
              o.stream.map(s => enc.decryptBytes(o.num, o.gen, s))
            else o.stream)
        }
    }
  }

  /** Rewrite every literal/hex string in a dictionary fragment through
    * `dec`, emitting the plaintext as a hex string (a form every
    * downstream string reader already handles and that cannot collide
    * with dict delimiters). Undecryptable strings (dec returns empty
    * for non-empty input) emit `<>`, never a throw — corrupt files are
    * data.
    */
  private def decryptDictStrings(dict: String,
                                 dec: Array[Byte] => Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    def emit(rawStr: String): Unit = {
      val cipher = rawStr.toCharArray.map(c => (c & 0xFF).toByte)
      val plain = if (cipher.isEmpty) cipher else dec(cipher)
      sb.append('<')
      plain.foreach(b => sb.append(f"${b & 0xFF}%02X"))
      sb.append('>')
    }
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '(') {
        val (str, next) = literalString(dict, i)
        emit(str); i = next
      } else if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<') {
        sb.append("<<"); i += 2
      } else if (c == '<') {
        val (str, next) = hexString(dict, i)
        emit(str); i = next
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  // ---- built-in minimal parser ---------------------------------------

  private final case class Obj(num: Int, gen: Int, dict: String,
                               stream: Option[Array[Byte]])

  private val objStart: Regex = """(?s)(\d+)\s+(\d+)\s+obj\b""".r
  private val refPat: Regex = """(\d+)\s+\d+\s+R""".r

  private[sources] def extractBuiltin(data: Array[Byte]): String = {
    val latin = new String(data, StandardCharsets.ISO_8859_1)
    val objects = expandObjectStreams(decryptObjects(latin, parseObjects(data, latin)))
    if (objects.isEmpty) return ""
    val byNum = objects.map(o => o.num -> o).toMap

    // page order: walk /Root → /Pages → /Kids when the tree resolves,
    // else every /Type /Page object (or raw content stream) in
    // document order. The fallback considers only each object number's
    // GLOBALLY-LAST declaration (`byNum(num) eq o`): an incremental-
    // update file (ISO 32000 7.5.6) re-declares updated objects in an
    // appended revision, and the tree path already resolves last-wins
    // through `byNum` — the fallback must not extract a superseded
    // page, including one whose NEWEST revision is no longer a page
    // at all (a page deleted/replaced by the update), so the dedupe
    // runs BEFORE the type filter, not after.
    val current = objects.filter(o => byNum(o.num) eq o)
    val pageObjs: Seq[Obj] = pageTreeOrder(latin, byNum).getOrElse {
      val typed = current.filter(_.dict.contains("/Type"))
        .filter(o => """/Type\s*/Page\b""".r.findFirstIn(o.dict).isDefined)
      if (typed.nonEmpty) typed else current.filter(_.stream.isDefined)
    }

    val pages = pageObjs.flatMap { page =>
      val streams: Seq[Array[Byte]] =
        if (page.dict.matches("(?s).*\\/Contents\\b.*")) contentsOf(page, byNum)
        else page.stream.toSeq.map(s => decodeStream(page.dict, s))
      val fonts = fontCMaps(page, byNum)
      val text = streams.map(s => textFromContent(s, fonts)).mkString
      Some(text)
    }
    pages.mkString("\n")
  }

  /** Expand PDF 1.5+ OBJECT STREAMS (`/Type /ObjStm`): modern
    * generators store most non-stream objects — including the
    * Catalog/Pages/Page dictionaries this parser walks — compressed
    * inside object streams, where a raw byte scan cannot see them (the
    * whole page tree silently vanishes and extraction returns "").
    * Each ObjStm decodes to `N` (objnum, offset) integer pairs
    * followed at `/First + offset` by the object bodies (dict-only by
    * spec — streams cannot live in an ObjStm), which are appended to
    * the object table. Counts and offsets are clamped to the decoded
    * payload: corrupt streams contribute nothing, never throw.
    */
  private def expandObjectStreams(objects: Seq[Obj]): Seq[Obj] = {
    val extra = objects
      .filter(o => """/Type\s*/ObjStm\b""".r.findFirstIn(o.dict).isDefined)
      .flatMap { o =>
        o.stream.toSeq.flatMap { raw =>
          val s = new String(decodeStream(o.dict, raw),
            StandardCharsets.ISO_8859_1)
          val n = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict)
            .map(_.group(1).toInt).getOrElse(0)
          val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict)
            .map(_.group(1).toInt).getOrElse(0)
          if (n <= 0 || first <= 0 || first > s.length) Seq.empty
          else {
            val nums = """\d+""".r.findAllIn(s.substring(0, first))
              .map(_.toLong).toArray
            val pairs = (0 until math.min(n, nums.length / 2))
              .map(i => (nums(2 * i).toInt, nums(2 * i + 1).toInt))
            pairs.zipWithIndex.map { case ((num, off), i) =>
              val start = math.min(math.max(first + off, 0), s.length)
              val end =
                if (i + 1 < pairs.length)
                  math.min(math.max(first + pairs(i + 1)._2, start), s.length)
                else s.length
              Obj(num, 0, s.substring(start, end), None)
            }
          }
        }
      }
    objects ++ extra
  }

  private def parseObjects(data: Array[Byte], latin: String): Seq[Obj] = {
    val out = mutable.ArrayBuffer[Obj]()
    for (m <- objStart.findAllMatchIn(latin)) {
      val num = m.group(1).toInt
      val gen = m.group(2).toInt
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
        // Prefer the declared direct-integer /Length to bound the
        // stream: binary payloads (encrypted, Flate) end in 0x0A/0x0D
        // about 1/128 of the time, and the endstream-scan's EOL trim
        // would silently eat that last byte (AES length%16 then fails
        // → page extracts ""). The declared length is trusted only
        // when "endstream" actually follows it (within the EOL slack
        // the spec allows); otherwise — absent, indirect-ref, or
        // implausible /Length — fall back to the scan.
        // hostile /Length values can exceed Int (or even Long) digits;
        // overflow falls back to the endstream scan, never throws —
        // corrupt files are data (the fuzz spec's contract)
        val declared = """/Length\s+(\d+)(\s+\d+\s+R)?""".r
          .findFirstMatchIn(dict)
          .filter(_.group(2) == null)
          .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
          .filter(n => n >= 0 && n <= data.length.toLong).map(_.toInt)
        val byLen = declared.flatMap { n =>
          val e = s.toLong + n
          if (n >= 0 && e <= data.length) {
            var j = e.toInt
            var slack = 0
            while (j < data.length && slack < 3 &&
              (data(j) == '\r' || data(j) == '\n' || data(j) == ' ')) {
              j += 1; slack += 1
            }
            if (latin.startsWith("endstream", j)) Some(e.toInt) else None
          } else None
        }
        byLen match {
          case Some(e) =>
            out += Obj(num, gen, dict, Some(java.util.Arrays.copyOfRange(data, s, e)))
          case None =>
            val se = latin.indexOf("endstream", s)
            if (se >= 0) {
              var e = se
              // trim the EOL that precedes "endstream"
              if (e > s && data(e - 1) == '\n') e -= 1
              if (e > s && data(e - 1) == '\r') e -= 1
              out += Obj(num, gen, dict, Some(java.util.Arrays.copyOfRange(data, s, e)))
            } else out += Obj(num, gen, dict, None)
        }
      } else out += Obj(num, gen, body, None)
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

  /** Text from one decoded content stream: BT…ET blocks only. Strings
    * shown under a Type0 font (selected via `Tf` against `fonts`)
    * decode through that font's /ToUnicode CMap; all others pass
    * through as Latin-1 bytes.
    */
  private[sources] def textFromContent(
      content: Array[Byte],
      fonts: Map[String, ToUnicodeCMap] = Map.empty): String = {
    val s = new String(content, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')

    var i = 0
    var inText = false
    var cmap: Option[ToUnicodeCMap] = None
    var pendingName = "" // last /Name operand (for Tf font selection)
    def emit(raw: String): Unit =
      sb.append(cmap.map(_.decode(raw)).getOrElse(raw))
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
        case '/' =>
          val start = i + 1
          var j = start
          while (j < s.length && !s.charAt(j).isWhitespace &&
            !"()<>[]{}/%".contains(s.charAt(j))) j += 1
          pendingName = s.substring(start, j); i = j
        case '[' if inText =>
          val (txt, next) = tjArray(s, i, cmap)
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
            case "Tf" => // font selection: switch the string decoder
              cmap = fonts.get(pendingName); pendingStrings = Nil
            case "Tj" if inText =>
              pendingStrings.headOption.foreach(emit); pendingStrings = Nil
            case "'" if inText =>
              newline(); pendingStrings.headOption.foreach(emit); pendingStrings = Nil
            case "\"" if inText =>
              newline(); pendingStrings.headOption.foreach(emit); pendingStrings = Nil
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
      // non-hex bytes mean corrupt data (e.g. an undecryptable
      // stream): drop them — corrupt files are data, not exceptions
      if ((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')) hex.append(c)
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
    * kerning numbers dropped; each element decodes through the active
    * font's CMap (element-level, so code boundaries never straddle
    * array entries). Consumes through the closing `]` (the following
    * `TJ` operator is then a no-op with no operands).
    */
  private def tjArray(s: String, from: Int,
                      cmap: Option[ToUnicodeCMap]): (String, Int) = {
    def dec(raw: String): String = cmap.map(_.decode(raw)).getOrElse(raw)
    val sb = new StringBuilder
    var i = from + 1
    while (i < s.length && s.charAt(i) != ']') {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i); sb.append(dec(str)); i = next
        case '<' =>
          val (str, next) = hexString(s, i); sb.append(dec(str)); i = next
        case _ => i += 1
      }
    }
    (sb.toString, i + 1)
  }
}
