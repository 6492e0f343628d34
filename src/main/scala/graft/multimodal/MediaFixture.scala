package graft.multimodal

/** Deterministic REAL media fixtures for the oracle gates: per doc id,
  * a byte-exact WAV (integer PCM from a closed-form sample formula)
  * and a spec-conformant MP4 (closed-form duration/dims/sample
  * layout). The Spark side BUILDS the container, PARSES it back
  * through the real [[WavParser]]/[[Mp4Parser]] arms, and emits
  * features/metadata; the DuckDB oracle computes the same quantities
  * straight from the formulas — so a drift anywhere in build → chunk
  * walk → PCM decode → feature arithmetic breaks the hash. This is
  * the `flagship_from_pdfs` move applied to media: the codec path
  * itself sits under the differential gate, not just under specs.
  */
object MediaFixture {

  // ---- WAV ----------------------------------------------------------

  val WavRate = 8000
  val WavBits = 16

  /** Frames for doc `id`: `800 + id % 50` mono samples
    * `s(i) = ((id·31 + i·17) mod 2001) − 1000` — full sign coverage,
    * closed-form RMS/peak/ZCR in SQL.
    */
  def wavFrames(id: Long): Int = (800 + id % 50).toInt

  def wavSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 17) % 2001) - 1000).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** A complete, real RIFF/WAVE file (mono, 8 kHz, 16-bit PCM). */
  def wavBytes(id: Long): Array[Byte] = {
    val n = wavFrames(id)
    val data = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = wavSample(id, i)
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = le16(1) ++ le16(1) ++ le32(WavRate) ++
      le32(WavRate * 2L) ++ le16(2) ++ le16(WavBits)
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(data.length.toLong) ++ data
    "RIFF".getBytes ++ le32(body.length.toLong) ++ body
  }

  // ---- BMP ----------------------------------------------------------

  def bmpWidth(id: Long): Int = (8 + id % 9).toInt // 8..16
  def bmpHeight(id: Long): Int = (6 + id % 7).toInt // 6..12

  /** Closed-form RGB of pixel (x, y) — plain integer arithmetic the
    * oracle replays, full 0..255 coverage across the corpus.
    */
  def bmpR(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 13 + y * 31) % 256).toInt
  def bmpG(id: Long, x: Int, y: Int): Int = ((id * 11 + x * 3 + y * 17) % 256).toInt
  def bmpB(id: Long, x: Int, y: Int): Int = ((id * 5 + x * 29 + y * 23) % 256).toInt

  /** A complete, real 24-bit uncompressed BMP (BITMAPINFOHEADER,
    * BI_RGB, bottom-up rows, 4-byte row padding) whose pixels follow
    * the closed forms above — the input side of the REAL-image resize
    * gate: JDK ImageIO decodes THIS, not a stub.
    */
  def bmpBytes(id: Long): Array[Byte] = {
    val w = bmpWidth(id); val h = bmpHeight(id)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, 54 + dataSize) // file size
    put32(10, 54) // pixel data offset
    put32(14, 40) // BITMAPINFOHEADER size
    put32(18, w); put32(22, h)
    put16(26, 1) // planes
    put16(28, 24) // bpp
    put32(30, 0) // BI_RGB
    put32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val o = rowOff + 3 * x
        out(o) = bmpB(id, x, y).toByte // BGR order on disk
        out(o + 1) = bmpG(id, x, y).toByte
        out(o + 2) = bmpR(id, x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- MP4 ----------------------------------------------------------

  val Mp4Timescale = 600L

  def mp4Duration(id: Long): Long = 1500 + id % 997
  def mp4Width(id: Long): Int = (16 + id % 64).toInt
  def mp4Height(id: Long): Int = (9 + id % 32).toInt
  def mp4Samples(id: Long): Int = (1 + id % 7).toInt

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** A complete, real ISO BMFF file: `ftyp` + `mdat` (sample `i` is
    * `i + 1` bytes of `(id + i) mod 256`) + `moov` with mvhd/tkhd/
    * stsd/stsz/stsc/stco describing exactly that layout (one chunk).
    */
  def mp4Bytes(id: Long): Array[Byte] = {
    val nS = mp4Samples(id)
    val samples = (0 until nS).map(i =>
      Array.fill(i + 1)(((id + i) % 256).toByte))
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayload = ftyp.length + 8L
    val mvhd = box("mvhd", be32(0), be32(0), be32(0),
      be32(Mp4Timescale), be32(mp4Duration(id)), Array.fill(80)(0.toByte))
    val tkhd = box("tkhd", be32(0), be32(0), be32(0), be32(1), be32(0),
      be32(mp4Duration(id)), Array.fill(8)(0.toByte),
      be16(0), be16(0), be16(0), be16(0), Array.fill(36)(0.toByte),
      be32(mp4Width(id).toLong << 16), be32(mp4Height(id).toLong << 16))
    val stsd = box("stsd", be32(0), be32(1),
      box("jpeg", Array.fill(6)(0.toByte), be16(1)))
    val stsz = box("stsz", be32(0), be32(0), be32(nS.toLong),
      samples.flatMap(s => be32(s.length.toLong)).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(nS.toLong), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(mdatPayload))
    val stbl = box("stbl", stsd, stsz, stsc, stco)
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      Array.fill(13)(0.toByte))
    val trak = box("trak", tkhd, box("mdia", hdlr, box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd, trak)
  }
}
