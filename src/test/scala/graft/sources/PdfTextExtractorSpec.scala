package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S1 real path: a minimal two-page PDF is GENERATED here (content
  * streams raw and Flate-compressed) and must extract to its page
  * texts joined by "\n" — the reference's `"\n".join(page.get_text())`
  * contract — through the full binaryFile scan. The stub fallback for
  * non-PDF payloads stays pinned.
  */
class PdfTextExtractorSpec extends AnyFunSuite with SparkSpec {

  // ---- minimal PDF builder -------------------------------------------

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Two pages: page 1 raw content, page 2 FlateDecode. */
  private def buildPdf(content1: String, content2: String): Array[Byte] = {
    val c1 = content1.getBytes(StandardCharsets.ISO_8859_1)
    val c2 = deflate(content2.getBytes(StandardCharsets.ISO_8859_1))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${c1.length} >>\nstream\n")
    out.write(c1)
    w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Length ${c2.length} /Filter /FlateDecode >>\nstream\n")
    out.write(c2)
    w("\nendstream\nendobj\n")
    w("7 0 obj\n<< /Title (State vs. Alpha Corp) /Author <4A75646765> " +
      "/Producer (graft-test) >>\nendobj\n")
    w("trailer\n<< /Root 1 0 R /Info 7 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private val page1 =
    "BT /F1 12 Tf 72 720 Td (Appeal No. 123 of 2023) Tj 0 -14 Td (The appeal is allowed.) Tj ET"
  private val page2 =
    "BT [(Costs ) -250 (follow ) -250 (the event)] TJ T* (So \\(ordered\\): \\101 okay) Tj ET " +
      "BT <48657820737472696E67> Tj ET"

  private val wantPage1 = "Appeal No. 123 of 2023\nThe appeal is allowed."
  private val wantPage2 = "Costs follow the event\nSo (ordered): A okay\nHex string"

  test("two-page PDF extracts page texts joined by newline") {
    val pdf = buildPdf(page1, page2)
    assert(PdfTextExtractor.looksLikePdf(pdf))
    assert(PdfTextExtractor.extract(pdf) == s"$wantPage1\n$wantPage2")
  }

  test("FlateDecode round-trips through the JDK inflater") {
    val payload = "BT (compressed page) Tj ET"
    val round = PdfTextExtractor.inflate(deflate(
      payload.getBytes(StandardCharsets.ISO_8859_1)))
    assert(new String(round, StandardCharsets.ISO_8859_1) == payload)
  }

  test("page order follows the /Kids tree, not object numbering") {
    // swap the Kids order relative to object numbers
    val pdf = new String(buildPdf(page1, page2), StandardCharsets.ISO_8859_1)
      .replace("/Kids [3 0 R 4 0 R]", "/Kids [4 0 R 3 0 R]")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextExtractor.extract(pdf) == s"$wantPage2\n$wantPage1")
  }

  test("/Info dictionary metadata extracts (S2's doc.metadata half)") {
    val pdf = buildPdf(page1, page2)
    val meta = PdfTextExtractor.info(pdf)
    assert(meta("title") == "State vs. Alpha Corp")
    assert(meta("author") == "Judge") // hex-string value
    assert(meta("producer") == "graft-test")
    assert(!meta.contains("subject"), "absent keys stay absent")
    // a PDF with no /Info yields an empty map, not a failure
    val noInfo = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace("/Info 7 0 R", "").getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextExtractor.info(noInfo).isEmpty)
  }

  test("image-only (textless) PDF extracts to empty text") {
    val pdf = buildPdf("q 1 0 0 1 0 0 cm /Im0 Do Q", "q Q")
    assert(PdfTextExtractor.extract(pdf) == "\n") // two pages, both empty
  }

  test("non-PDF payloads keep the deterministic stub path") {
    val fake = Array.fill[Byte](300)(7)
    assert(!PdfTextExtractor.looksLikePdf(fake))
    assert(BinaryDocs.extractText(fake) == BinaryDocs.extractStub(fake))
    // and a real PDF payload does NOT go through the stub
    val pdf = buildPdf(page1, page2)
    assert(BinaryDocs.extractText(pdf) == s"$wantPage1\n$wantPage2")
  }

  test("Type0 font strings decode through the embedded /ToUnicode CMap") {
    // Hand-built CMap covering every mapping form: bfchar (incl. a
    // multi-code-unit ligature target), single-dst bfrange (increment
    // semantics), and array-form bfrange. Codes are deliberately
    // non-identity so a Latin-1 fallback would garble visibly.
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0101> <0020>
        |<0102> <006600660069>
        |endbfchar
        |2 beginbfrange
        |<0200> <0219> <0061>
        |<0300> <0302> [<0058> <0059> <005A>]
        |endbfrange
        |endcmap
        |endcmap
        |end""".stripMargin
    def hex(codes: Int*): String = codes.map(c => f"$c%04X").mkString
    // "o" + ligature-ffi + "ce" = "office"; then space, bfrange-array XYZ
    val word = hex(0x020E, 0x0102, 0x0202, 0x0204) // o ffi c e
    val tail = hex(0x0101, 0x0300, 0x0301, 0x0302) // ' ' X Y Z
    // one Type0 string via Tj, one via TJ array, plus a simple-font
    // string on the SAME page proving Tf switches the decoder back
    val content = s"BT /T0 12 Tf 72 720 Td <$word> Tj " +
      s"0 -14 Td [<$tail> -120 <${hex(0x0200)}>] TJ " +
      "/F1 12 Tf 0 -14 Td (plain latin) Tj ET"
    val c = content.getBytes(StandardCharsets.ISO_8859_1)
    val cm = cmap.getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /T0 5 0 R >> >> >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n"); out.write(c)
    w("\nendstream\nendobj\n")
    w("5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /T /Encoding " +
      "/Identity-H /ToUnicode 6 0 R >>\nendobj\n")
    w(s"6 0 obj\n<< /Length ${cm.length} >>\nstream\n"); out.write(cm)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val got = PdfTextExtractor.extract(out.toByteArray)
    assert(got == "office\n XYZa\nplain latin")
  }

  // ---- shared encrypted-fixture builders (the decrypt tests AND the
  // fuzz corpus's encrypted arms build from these) ----
  // The /O value's provenance is irrelevant to decryption (any 32
  // bytes the encryptor ALSO derived from work), so fixed vectors keep
  // the fixtures deterministic.
  private val encOVal = Array.tabulate(32)(i => ((i * 7 + 3) & 0xFF).toByte)
  private val encId0 = Array.tabulate(16)(i => ((i * 13 + 1) & 0xFF).toByte)
  private val encPerm = -44

  private def aesEncrypt(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val iv = Array.tabulate(16)(i => ((i * 31 + 5) & 0xFF).toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }

  /** Genuinely-encrypted /V2-RC4 or /V4-AESV2 fixture built with the
    * spec's own algorithms: Algorithm 2 file key from the
    * empty-user-password pad, Algorithm 1 per-object keys.
    */
  private def buildEncrypted(aes: Boolean, encStrings: Boolean = true): Array[Byte] = {
    val fileKey = PdfTextExtractor.PdfCrypt.fileKey(encOVal, encPerm, encId0, 16, 3)
    def encFor(num: Int, data: Array[Byte]): Array[Byte] = {
      val k = PdfTextExtractor.PdfCrypt.objKey(fileKey, num, 0, aes)
      if (aes) aesEncrypt(k, data)
      else PdfTextExtractor.PdfCrypt.rc4(k, data)
    }
    // NO trailing-byte nudging: the parser bounds streams by the
    // declared /Length, so ciphertext ending in CR/LF is fine (the
    // 1-in-128 case the endstream scan used to corrupt)
    val c5 = encFor(5, page1.getBytes(StandardCharsets.ISO_8859_1))
    val c6 = encFor(6, deflate(page2.getBytes(StandardCharsets.ISO_8859_1)))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    w("%PDF-1.6\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${c5.length} >>\nstream\n")
    out.write(c5); w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Length ${c6.length} /Filter /FlateDecode >>\nstream\n")
    out.write(c6); w("\nendstream\nendobj\n")
    val filt =
      if (aes && encStrings)
        "/V 4 /R 4 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF"
      else if (aes)
        // streams-only encryption: /StrF ABSENT → spec default
        // /Identity → strings are plaintext (ISO 32000 7.6.2)
        "/V 4 /R 4 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF"
      else "/V 2 /R 3"
    w(s"7 0 obj\n<< /Filter /Standard $filt /Length 128 /P $encPerm " +
      s"/O <${hex(encOVal)}> /U <${hex(encOVal)}> >>\nendobj\n")
    // an ENCRYPTED /Info: dictionary strings are ciphertext in a real
    // encrypted file and must decrypt for S2 metadata to be text —
    // unless the string filter is /Identity, in which case they are
    // plaintext and must be left ALONE
    if (encStrings) {
      val title = encFor(8, "State vs. Cipher Corp".getBytes(StandardCharsets.ISO_8859_1))
      w(s"8 0 obj\n<< /Title <${hex(title)}> >>\nendobj\n")
    } else
      w("8 0 obj\n<< /Title (State vs. Cipher Corp) >>\nendobj\n")
    w(s"trailer\n<< /Root 1 0 R /Encrypt 7 0 R /Info 8 0 R " +
      s"/ID [<${hex(encId0)}> <${hex(encId0)}>] >>\n%%EOF\n")
    out.toByteArray
  }

  test("encrypted PDFs (RC4-128 and AES-128, empty user password) extract") {
    val rc4Pdf = buildEncrypted(aes = false)
    val got = PdfTextExtractor.extract(rc4Pdf)
    assert(got == s"$wantPage1\n$wantPage2",
      s"RC4-128 decryption: got '$got'")
    assert(PdfTextExtractor.info(rc4Pdf)("title") == "State vs. Cipher Corp",
      "RC4 dictionary-string (/Info) decryption")
    val aesPdf = buildEncrypted(aes = true)
    val gotAes = PdfTextExtractor.extract(aesPdf)
    assert(gotAes == s"$wantPage1\n$wantPage2",
      s"AES-128 decryption: got '$gotAes'")
    assert(PdfTextExtractor.info(aesPdf)("title") == "State vs. Cipher Corp",
      "AES-128 dictionary-string (/Info) decryption")
    // streams-only encryption (/StrF absent → /Identity): streams still
    // decrypt, but the PLAINTEXT /Info strings must survive untouched —
    // "decrypting" them would turn the title into <> garbage (ADVICE r10)
    val streamOnly = buildEncrypted(aes = true, encStrings = false)
    assert(PdfTextExtractor.extract(streamOnly) == s"$wantPage1\n$wantPage2",
      "streams-only: content streams still decrypt")
    assert(PdfTextExtractor.info(streamOnly)("title") == "State vs. Cipher Corp",
      "streams-only: plaintext /Info strings must not be 'decrypted'")
    // a /V 5 dict whose /U is malformed (32 bytes, not 48): no key can
    // derive — the file falls through undecrypted, never a throw
    val v5bad = new String(rc4Pdf, StandardCharsets.ISO_8859_1)
      .replace("/V 2 /R 3", "/V 5 /R 6")
      .getBytes(StandardCharsets.ISO_8859_1)
    PdfTextExtractor.extract(v5bad) // must not throw
  }

  test("named crypt filters resolve through /CF: /CFM /None strings stay plaintext; #xx names parse") {
    // ADVICE r11: /StrF naming a filter whose /CFM is /None was wrongly
    // "decrypted" into garbage, and names outside \w (hyphens, #xx
    // escapes) silently fell back to Identity. Streams ride an AESV2
    // /StdCF; strings ride /My#2DFil#74er (= "My-Filter") with /CFM
    // /None — content must decrypt, the plaintext /Info must survive.
    val oVal = Array.tabulate(32)(i => ((i * 7 + 3) & 0xFF).toByte)
    val id0 = Array.tabulate(16)(i => ((i * 13 + 1) & 0xFF).toByte)
    val perm = -44
    val fileKey = PdfTextExtractor.PdfCrypt.fileKey(oVal, perm, id0, 16, 4)
    def aesEnc(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      val iv = Array.tabulate(16)(i => ((i * 31 + 5) & 0xFF).toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(plain)
    }
    val c5 = aesEnc(PdfTextExtractor.PdfCrypt.objKey(fileKey, 5, 0, aes = true),
      page1.getBytes(StandardCharsets.ISO_8859_1))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    w("%PDF-1.6\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${c5.length} >>\nstream\n")
    out.write(c5); w("\nendstream\nendobj\n")
    w(s"7 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> " +
      "/My#2DFil#74er << /CFM /None >> >> " +
      s"/StmF /StdCF /StrF /My#2DFil#74er /P $perm " +
      s"/O <${hex(oVal)}> /U <${hex(oVal)}> >>\nendobj\n")
    w("8 0 obj\n<< /Title (Plain Title Kept) >>\nendobj\n")
    w(s"trailer\n<< /Root 1 0 R /Encrypt 7 0 R /Info 8 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF\n")
    val pdf = out.toByteArray
    assert(PdfTextExtractor.extract(pdf) == wantPage1,
      "streams must still decrypt through the named /StdCF")
    assert(PdfTextExtractor.info(pdf)("title") == "Plain Title Kept",
      "/CFM /None strings must not be 'decrypted'")
  }

  test("nestedDictOf and decodeName: balanced lookup, escapes, strings skipped atomically") {
    assert(PdfTextExtractor.decodeName("My#2DFil#74er") == "My-Filter")
    assert(PdfTextExtractor.decodeName("Identity") == "Identity")
    val d = "<< /A (tricky >> paren) /CF << /X << /CFM /None >> " +
      "/Hex#41 << /CFM /V2 >> >> /B << /CFM /Nested >> >>"
    val cf = PdfTextExtractor.nestedDictOf(d, "CF")
    assert(cf.exists(_.contains("/None")), s"$cf")
    assert(PdfTextExtractor.nestedDictOf(cf.get, "HexA")
      .exists(_.contains("/V2")))
    assert(PdfTextExtractor.nestedDictOf(cf.get, "Missing").isEmpty)
    // a key whose value is not a dict, and nested keys, never match
    assert(PdfTextExtractor.nestedDictOf(d, "A").isEmpty)
    assert(PdfTextExtractor.nestedDictOf(d, "X").isEmpty,
      "nested occurrences must not match at the outer level")
    // a NAME-valued entry must consume its value: in `/X /CF << … >>`
    // the `/CF` is /X's value, not a key — the following dict must not
    // resolve as /CF's (ADVICE r12; impact was /CF crypt-filter
    // misdetection on hostile files)
    assert(PdfTextExtractor.nestedDictOf(
      "<< /X /CF << /StdCF << /CFM /AESV2 >> >> >>", "CF").isEmpty,
      "name value mistaken for a key")
    // …and the real key after a name-valued entry still resolves
    assert(PdfTextExtractor.nestedDictOf(
      "<< /X /CF /CF << /StdCF 1 >> >>", "CF")
      .exists(_.contains("/StdCF")))
    // the charset's regex and predicate forms must agree on EVERY char
    // — nestedDictOf tokenizes keys with the predicate, filterActive
    // matches names with the regex
    val rx = PdfTextExtractor.NameCharset.r
    (0 until 0x10000).map(_.toChar).foreach { ch =>
      assert(rx.matches(ch.toString) == PdfTextExtractor.isNameChar(ch),
        f"name-charset divergence at U+${ch.toInt}%04X")
    }
  }

  /** /V5 /R6 AES-256 fixture, forward-encrypted with the spec's own
    * ISO 32000-2 algorithms for the empty user password: U =
    * hash2B(pwd, validationSalt) ‖ validationSalt ‖ keySalt, UE =
    * AES-256-CBC(intermediateKey, iv=0, fileKey). Returns (pdf,
    * hex(/U), hex(non-validating /U), /R 5 variant) so the decrypt
    * test can also exercise the refuse-the-key and deprecated-R5
    * paths.
    */
  private lazy val aes256Fixture: (Array[Byte], String, String, Array[Byte]) = {
    import PdfTextExtractor.PdfCrypt
    val fileKey = Array.tabulate(32)(i => ((i * 11 + 2) & 0xFF).toByte)
    val valSalt = Array.tabulate(8)(i => ((i * 3 + 1) & 0xFF).toByte)
    val keySalt = Array.tabulate(8)(i => ((i * 5 + 9) & 0xFF).toByte)
    val empty = Array.emptyByteArray
    val uVal = PdfCrypt.hash2B(empty, valSalt, empty, 6) ++ valSalt ++ keySalt
    val badU = PdfCrypt.hash2B(empty, keySalt, empty, 6) ++ valSalt ++ keySalt
    val ik = PdfCrypt.hash2B(empty, keySalt, empty, 6)
    val ue = PdfCrypt.aesCbcEncryptNoPad(ik, new Array[Byte](16), fileKey)
    def aes256(plain: Array[Byte]): Array[Byte] = {
      val iv = Array.tabulate(16)(i => ((i * 29 + 13) & 0xFF).toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(plain)
    }
    val c5 = aes256(page1.getBytes(StandardCharsets.ISO_8859_1))
    val c6 = aes256(deflate(page2.getBytes(StandardCharsets.ISO_8859_1)))
    val title = aes256("AES-256 Judgment".getBytes(StandardCharsets.ISO_8859_1))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    w("%PDF-2.0\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${c5.length} >>\nstream\n")
    out.write(c5); w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Length ${c6.length} /Filter /FlateDecode >>\nstream\n")
    out.write(c6); w("\nendstream\nendobj\n")
    w("7 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/P -44 /O <${hex(Array.fill[Byte](48)(1))}> /OE <${hex(Array.fill[Byte](32)(2))}> " +
      s"/U <${hex(uVal)}> /UE <${hex(ue)}> >>\nendobj\n")
    w(s"8 0 obj\n<< /Title <${hex(title)}> >>\nendobj\n")
    w("trailer\n<< /Root 1 0 R /Encrypt 7 0 R /Info 8 0 R >>\n%%EOF\n")
    // /R 5 variant (deprecated single-SHA-256 derivation): same file
    // key, re-derived /U //UE
    val u5 = PdfCrypt.hash2B(empty, valSalt, empty, 5) ++ valSalt ++ keySalt
    val ik5 = PdfCrypt.hash2B(empty, keySalt, empty, 5)
    val ue5 = PdfCrypt.aesCbcEncryptNoPad(ik5, new Array[Byte](16), fileKey)
    val r5 = new String(out.toByteArray, StandardCharsets.ISO_8859_1)
      .replace("/V 5 /R 6", "/V 5 /R 5")
      .replace(hex(uVal), hex(u5))
      .replace(hex(ue), hex(ue5))
      .getBytes(StandardCharsets.ISO_8859_1)
    (out.toByteArray, hex(uVal), hex(badU), r5)
  }

  test("AES-256 (/V 5 /R 6) encrypted PDFs extract, with /Info metadata") {
    val (pdf, uHex, badUHex, r5) = aes256Fixture
    val got = PdfTextExtractor.extract(pdf)
    assert(got == s"$wantPage1\n$wantPage2", s"AES-256 decryption: got '$got'")
    assert(PdfTextExtractor.info(pdf)("title") == "AES-256 Judgment",
      "AES-256 dictionary-string (/Info) decryption")
    // a WRONG validation salt means the user password is not empty:
    // the extractor must refuse the key (no garbage), not throw
    val bad = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace(uHex, badUHex).getBytes(StandardCharsets.ISO_8859_1)
    PdfTextExtractor.extract(bad) // must not throw
    assert(PdfTextExtractor.extract(bad) != s"$wantPage1\n$wantPage2",
      "non-validating /U must not silently decrypt")
    // /R 5 (deprecated, single-SHA-256 derivation) also decrypts
    assert(PdfTextExtractor.extract(r5) == s"$wantPage1\n$wantPage2",
      "R5 single-hash derivation")
  }

  test("object streams (/ObjStm) holding the page tree still extract") {
    // PDF 1.5+ layout: Catalog/Pages/Page dicts live COMPRESSED inside
    // an object stream — a raw byte scan sees no page tree at all and
    // would extract "". Content streams stay regular objects (streams
    // cannot live in an ObjStm).
    val content = "BT (Packed in an object stream) Tj ET"
    val c = content.getBytes(StandardCharsets.ISO_8859_1)
    // objects 1 (Catalog), 2 (Pages), 3 (Page) packed into ObjStm 10
    val bodies = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val offsets = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = Seq(1, 2, 3).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + " "
    val payload = header + bodies.mkString("\n") + "\n"
    val z = deflate(payload.getBytes(StandardCharsets.ISO_8859_1))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"10 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${z.length} /Filter /FlateDecode >>\nstream\n")
    out.write(z)
    w("\nendstream\nendobj\n")
    w(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n"); out.write(c)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    assert(PdfTextExtractor.extract(out.toByteArray) ==
      "Packed in an object stream")
    // corrupt /First beyond the payload → no objects contributed, no throw
    val corrupt = new String(out.toByteArray, StandardCharsets.ISO_8859_1)
      .replace(s"/First ${header.length}", "/First 99999")
      .getBytes(StandardCharsets.ISO_8859_1)
    PdfTextExtractor.extract(corrupt) // must not throw
  }

  test("fixture corpus Type0 decision pages extract ground-truth text") {
    // The flagship gate is self-consistent (oracle reads the engine's
    // extraction), so the exact sentence is pinned HERE: if the CMap
    // path garbled, the cascade-bearing decision text would differ.
    val dir = PdfFixture.ensure(spark)
    val pdf = Files.readAllBytes(java.nio.file.Paths.get(dir, "case_0a.pdf"))
    assert(PdfTextExtractor.extract(pdf) ==
      "Appeal No. 100 of 2024\nIn the matter of Alpha versus Beta Industries" +
      "\n\nAfter hearing both sides we allow the appeal with costs")
    val pdf1 = Files.readAllBytes(java.nio.file.Paths.get(dir, "case_1b.pdf"))
    assert(PdfTextExtractor.extract(pdf1).endsWith(
      "For the reasons recorded the appeal dismissed as without merit"))
  }

  /** `base` plus an appended incremental-update revision (ISO 32000
    * 7.5.6): re-declares page 1's content stream (obj 5) with
    * `updated`, re-declares /Info (obj 7) with an amended title, and
    * optionally re-declares the PAGE object itself (obj 3) — the case
    * that exercises the fallback path's last-declaration-wins dedupe.
    */
  private def appendRevision(base: Array[Byte], updated: String,
                             redeclarePage: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val u = updated.getBytes(StandardCharsets.ISO_8859_1)
    if (redeclarePage)
      w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${u.length} >>\nstream\n")
    out.write(u)
    w("\nendstream\nendobj\n")
    w("7 0 obj\n<< /Title (Amended Title) >>\nendobj\n")
    w("trailer\n<< /Root 1 0 R /Info 7 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("incremental update: the appended revision wins on the page-tree path") {
    val updated = "BT (Amended: appeal dismissed.) Tj ET"
    val pdf = appendRevision(buildPdf(page1, page2), updated,
      redeclarePage = false)
    // obj 5 declared twice; the tree path resolves /Contents through
    // byNum's last-wins map — page 1 must extract ONLY the revision
    assert(PdfTextExtractor.extract(pdf) ==
      s"Amended: appeal dismissed.\n$wantPage2")
    assert(PdfTextExtractor.info(pdf)("title") == "Amended Title")
  }

  test("incremental update: the fallback path extracts a re-declared page once, last revision") {
    val updated = "BT (Amended fallback text.) Tj ET"
    // break the catalog's /Pages ref so pageTreeOrder cannot resolve
    // (the /Catalog-sniffing root fallback would survive a broken
    // /Root ref): the typed-page fallback walks ALL objects — obj 3 is
    // declared twice and must extract exactly once, from its last
    // declaration (in the position the LAST declaration holds, after
    // the untouched obj 4)
    val pdf = new String(
      appendRevision(buildPdf(page1, page2), updated, redeclarePage = true),
      StandardCharsets.ISO_8859_1)
      .replaceAll("/Pages 2 0 R", "/Pages 99 0 R")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextExtractor.extract(pdf) ==
      s"$wantPage2\nAmended fallback text.")
    // a further revision RETYPES page 4 (page deletion/replacement):
    // its older page-typed declaration must not resurrect through the
    // type filter — the dedupe runs on global last declarations FIRST
    val retyped = (new String(pdf, StandardCharsets.ISO_8859_1) +
      "4 0 obj\n<< /Type /XObject /Subtype /Form >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextExtractor.extract(retyped) == "Amended fallback text.")
  }

  test("fuzz: mutated/truncated/hostile PDFs never throw, never explode output") {
    // Seeded property sweep over the four real-world parser arms
    // (Flate, CMap/Type0, ObjStm, encryption): bit flips, truncations,
    // hostile /Length//N//First lies, and random splices must all be
    // DATA — extract() and info() return something bounded, never
    // throw, never allocate unboundedly (output bounded relative to
    // input; a count-driven allocation bug would blow the cap long
    // before an OOM).
    val rnd = new scala.util.Random(0xC0FFEE)
    val dir = PdfFixture.ensure(spark)
    val corpus: Seq[Array[Byte]] = Seq(
      buildPdf(page1, page2),
      Files.readAllBytes(java.nio.file.Paths.get(dir, "case_0a.pdf")), // 1.4 + Type0
      Files.readAllBytes(java.nio.file.Paths.get(dir, "case_1a.pdf")), // 1.5 ObjStm
      // the decrypt arms (r12): the newest and previously least-fuzzed
      // code paths — RC4-128, AES-128 with crypt filters, AES-256 /V5
      buildEncrypted(aes = false),
      buildEncrypted(aes = true),
      aes256Fixture._1
    )
    // encryption-targeted string rewrites (no-ops on plaintext seeds —
    // a no-op mutation still must not throw)
    def mutateLatin(base: Array[Byte])(f: String => String): Array[Byte] =
      f(new String(base, StandardCharsets.ISO_8859_1))
        .getBytes(StandardCharsets.ISO_8859_1)
    def mutate(base: Array[Byte]): Array[Byte] = rnd.nextInt(10) match {
      case 0 => // truncate anywhere
        base.take(rnd.nextInt(base.length))
      case 1 => // flip 1-16 random bits
        val b = base.clone()
        (0 until 1 + rnd.nextInt(16)).foreach { _ =>
          val i = rnd.nextInt(b.length)
          b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        b
      case 2 => // /Length lies: replace every declared length with a lie
        // (incl. 10+ digit Int overflow and 20-digit Long overflow)
        new String(base, StandardCharsets.ISO_8859_1)
          .replaceAll("/Length \\d+",
            s"/Length ${Seq("0", "1", "999999999", "-5", "9999999999",
              "99999999999999999999")(rnd.nextInt(6))}")
          .getBytes(StandardCharsets.ISO_8859_1)
      case 3 => // hostile ObjStm/encrypt counts
        new String(base, StandardCharsets.ISO_8859_1)
          .replaceAll("/N \\d+", s"/N ${Seq(2147483647, -1, 65535)(rnd.nextInt(3))}")
          .replaceAll("/First \\d+", s"/First ${Seq(2147483647, -7, 0)(rnd.nextInt(3))}")
          .getBytes(StandardCharsets.ISO_8859_1)
      case 4 => // random splice: overwrite a run with random bytes
        val b = base.clone()
        val at = rnd.nextInt(b.length)
        val len = math.min(1 + rnd.nextInt(64), b.length - at)
        (0 until len).foreach(i => b(at + i) = rnd.nextInt(256).toByte)
        b
      case 5 => // duplicate a slice (confuses object/stream scanning)
        val at = rnd.nextInt(base.length)
        val len = math.min(1 + rnd.nextInt(128), base.length - at)
        base.take(at + len) ++ base.slice(at, at + len) ++ base.drop(at + len)
      case 6 => // truncated / oddified key material: /O //U //UE //OE
        // hex strings lose a tail or gain an odd nibble — key
        // derivation must refuse or fail closed, never throw
        val k = Seq("O", "U", "UE", "OE")(rnd.nextInt(4))
        mutateLatin(base) {
          _.replaceAll(s"/$k <([0-9A-Fa-f]{8})[0-9A-Fa-f]*>",
            rnd.nextInt(3) match {
              case 0 => s"/$k <$$1>"  // truncated to 4 bytes
              case 1 => s"/$k <$$1F>" // odd nibble count
              case _ => s"/$k <>"     // empty
            })
        }
      case 7 => // lying crypt-filter names: /StrF//StmF point at a
        // filter that is absent from /CF, at Identity, or at a name
        // needing escape decoding — resolution must fail closed
        mutateLatin(base) {
          _.replaceAll("/(StrF|StmF) /\\w+",
            s"/$$1 ${Seq("/Ghost", "/Identity", "/We#69rd-N#61me",
              "/StdCF /CFM /None")(rnd.nextInt(4))}")
        }
      case 8 => // incremental-update splice: an appended revision
        // re-declares a random object number (possibly the page tree
        // or key material itself) — last-declaration-wins resolution
        // and the fallback dedupe must both stay bounded, never throw
        val num = 1 + rnd.nextInt(8)
        val body = s"BT (rev ${rnd.nextInt(1000)}) Tj ET"
        base ++ (s"$num 0 obj\n<< /Length ${body.length} >>\nstream\n" +
          s"$body\nendstream\nendobj\n" +
          "trailer\n<< /Root 1 0 R >>\n%%EOF\n")
          .getBytes(StandardCharsets.ISO_8859_1)
      case _ => // /V //R lies: unsupported, negative, or mismatched
        // versions over real ciphertext
        mutateLatin(base) {
          _.replaceAll("/V \\d+", s"/V ${Seq("9", "-1", "5", "0")(rnd.nextInt(4))}")
            .replaceAll("/R \\d+", s"/R ${Seq("99", "-3", "6", "2")(rnd.nextInt(4))}")
        }
    }
    (0 until 450).foreach { i =>
      val m = mutate(corpus(i % corpus.length))
      val text = PdfTextExtractor.extract(m)       // must not throw
      val meta = PdfTextExtractor.info(m)          // must not throw
      assert(text.length <= m.length * 8 + 1024,
        s"fuzz case $i: output ${text.length} bytes from ${m.length}-byte " +
          "input — unbounded allocation suspect")
      assert(meta.values.map(_.length).sum <= m.length * 8 + 1024,
        s"fuzz case $i: metadata explosion")
    }
  }

  test("binaryFile scan extracts a generated PDF end to end") {
    val dir: Path = Files.createTempDirectory("graft_pdf_scan")
    try {
      Files.write(dir.resolve("case_a.pdf"), buildPdf(page1, page2))
      Files.write(dir.resolve("notes.txt"), "not a pdf".getBytes)
      val rows = BinaryDocs.scanPdfDir(spark, dir.toString).collect()
      assert(rows.length == 1, "glob must prune the .txt at listing time")
      val doc = rows.head
      assert(doc.file_name == "case_a.pdf")
      assert(doc.text == s"$wantPage1\n$wantPage2")
      // F3 key: sha256 of the file NAME (extract_and_embed.py:95)
      assert(doc.file_id ==
        java.security.MessageDigest.getInstance("SHA-256")
          .digest("case_a.pdf".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
