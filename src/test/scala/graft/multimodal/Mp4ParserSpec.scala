package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Real MP4 atom-walk parsing against a spec-conformant container
  * BUILT HERE box by box (ftyp + mdat + moov with mvhd/tkhd/mdia/
  * minf/stbl/stsd/stsz/stsc/stco), with REAL JPEG samples — so
  * duration, dimensions, sample count, and every extracted frame are
  * checked against ground truth, and the extracted frames round-trip
  * through the real image decoder.
  */
class Mp4ParserSpec extends AnyFunSuite with SparkSpec {

  // ---- byte builders -------------------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** isom MP4: 4 MJPEG samples in 2 chunks of 2, timescale 1000,
    * duration 2500 ms, track 32×16. Returns (file, samples).
    */
  private def buildMp4(): (Array[Byte], Seq[Array[Byte]]) = {
    val samples = Seq(
      jpegBytes(8, 6, 0xFF0000), jpegBytes(8, 6, 0x00FF00),
      jpegBytes(8, 6, 0x0000FF), jpegBytes(8, 6, 0x808080))
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayload = ftyp.length + 8L
    val chunk2 = mdatPayload + samples(0).length + samples(1).length

    val mvhd = box("mvhd",
      be32(0),            // version 0 + flags
      be32(0), be32(0),   // ctime, mtime
      be32(1000),         // timescale
      be32(2500),         // duration → 2500 ms
      Array.fill(80)(0.toByte)) // rate/volume/reserved/matrix/next
    val tkhd = box("tkhd",
      be32(0), be32(0), be32(0), be32(1), be32(0), be32(2500),
      Array.fill(8)(0.toByte), be16(0), be16(0), be16(0), be16(0),
      Array.fill(36)(0.toByte),
      be32(32L << 16), be32(16L << 16)) // 16.16 fixed 32×16
    val stsd = box("stsd", be32(0), be32(1),
      box("jpeg", Array.fill(6)(0.toByte), be16(1)))
    val stsz = box("stsz", be32(0), be32(0), be32(4),
      samples.flatMap(s => be32(s.length.toLong)).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(2), be32(1))
    val stco = box("stco", be32(0), be32(2), be32(mdatPayload), be32(chunk2))
    val stbl = box("stbl", stsd, stsz, stsc, stco)
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      Array.fill(13)(0.toByte))
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    (ftyp ++ mdat ++ moov, samples)
  }

  test("probeMp4 reads true brand, codec, duration, dims, sample count") {
    val (file, _) = buildMp4()
    val meta = Mp4Parser.probeMp4(7L, file).get
    assert(meta.brand == "isom")
    assert(meta.codec == "jpeg")
    assert(meta.timescale == 1000L)
    assert(meta.duration_ms == 2500L)
    assert((meta.width, meta.height) == (32, 16))
    assert(meta.n_samples == 4)
    assert(meta.n_bytes == file.length.toLong)
    // non-BMFF payload → None, not a throw
    assert(Mp4Parser.probeMp4(0L, "not a video".getBytes).isEmpty)
  }

  test("stbl sample ranges slice out the exact original JPEGs, decodable") {
    val (file, samples) = buildMp4()
    val ranges = Mp4Parser.sampleRanges(file)
    assert(ranges.length == 4)
    ranges.zip(samples).foreach { case ((off, len), expected) =>
      val got = java.util.Arrays.copyOfRange(file, off.toInt, (off + len).toInt)
      assert(got.sameElements(expected))
    }
    // every extracted sample is a complete, decodable JPEG
    val img = Multimodal.readImage(java.util.Arrays.copyOfRange(file,
      ranges(2)._1.toInt, (ranges(2)._1 + ranges(2)._2).toInt)).get
    assert((img.getWidth, img.getHeight) == (8, 6))
  }

  test("sampleFramesReal: MP4 and raw MJPEG rows through the Spark route") {
    import spark.implicits._
    val (file, samples) = buildMp4()
    val mjpeg = Seq(jpegBytes(4, 4, 0x123456), jpegBytes(4, 4, 0x654321),
      jpegBytes(4, 4, 0xABCDEF))
    val media = Seq((1L, file), (2L, mjpeg.flatten.toArray),
      (3L, "neither".getBytes)).toDF("media_id", "data")
    val frames = Mp4Parser.sampleFramesReal(spark, media, "media_id", "data",
      everyN = 2).collect().sortBy(f => (f.media_id, f.frame_idx))
    // mp4: samples 0, 2 of 4; mjpeg: frames 0, 2 of 3; row 3 dropped
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSeq ==
      Seq((1L, 0), (1L, 2), (2L, 0), (2L, 2)))
    assert(frames(0).frame.sameElements(samples(0)))
    assert(frames(1).frame.sameElements(samples(2)))
    assert(frames(3).frame.sameElements(mjpeg(2)))
    // and the sampled frames decode with the real image arm
    assert(Multimodal.readImage(frames(2).frame).exists(i =>
      (i.getWidth, i.getHeight) == (4, 4)))
  }

  test("decodeVideoMeta surfaces non-containers as brand=none without failing") {
    import spark.implicits._
    val (file, _) = buildMp4()
    val media = Seq((1L, file), (2L, "junk".getBytes)).toDF("media_id", "data")
    val metas = Mp4Parser.decodeVideoMeta(spark, media, "media_id", "data")
      .collect().sortBy(_.media_id)
    assert(metas(0).duration_ms == 2500L && metas(0).width == 32)
    assert(metas(1).brand == "none" && metas(1).n_samples == 0)
  }

  test("jpegFrameRanges tracks nested SOI (EXIF-thumbnail shape)") {
    val inner = jpegBytes(2, 2, 0x111111)
    // synthesize an outer "JPEG" whose body embeds a complete inner
    // JPEG before the EOI — the nested-depth case a naive EOI scan
    // would split in the middle
    val outer = Array(0xFF.toByte, 0xD8.toByte) ++ inner ++
      Array(0xFF.toByte, 0xD9.toByte)
    val follow = jpegBytes(2, 2, 0x222222)
    val ranges = Mp4Parser.jpegFrameRanges(outer ++ follow)
    assert(ranges.length == 2)
    assert(ranges(0) == ((0, outer.length)))
    assert(ranges(1) == ((outer.length, outer.length + follow.length)))
  }

  test("jpegFrameRanges skips marker segments by length (FF D9 in table data)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // COM segment whose PAYLOAD contains the byte pair FF D9 — a naive
    // marker scan reads it as EOI and splits the frame early
    val frame = b(0xFF, 0xD8, 0xFF, 0xFE, 0x00, 0x04, 0xFF, 0xD9,
      0xFF, 0xD9)
    assert(Mp4Parser.jpegFrameRanges(frame).toSeq == Seq((0, frame.length)))
    // FF FF fill byte directly before the real EOI marker: advancing 2
    // per FF would skip the marker entirely
    val filled = b(0xFF, 0xD8, 0xFF, 0xFF, 0xD9)
    assert(Mp4Parser.jpegFrameRanges(filled).toSeq == Seq((0, filled.length)))
    // segment length running past the buffer → frame dropped, no throw
    val truncated = b(0xFF, 0xD8, 0xFF, 0xFE, 0x7F, 0xFF, 0x00)
    assert(Mp4Parser.jpegFrameRanges(truncated).isEmpty)
  }

  test("sampleRanges clamps hostile/corrupt sample-table counts") {
    val (file, samples) = buildMp4()
    // locate the stsz box in the valid file and corrupt its count field
    def corruptAt(marker: String, fieldOff: Int, v: Long): Array[Byte] = {
      val idx = {
        val pat = marker.getBytes("ISO-8859-1")
        (0 until file.length - 4).find(i =>
          file(i) == pat(0) && file(i + 1) == pat(1) &&
          file(i + 2) == pat(2) && file(i + 3) == pat(3)).get
      }
      val copy = file.clone()
      val bytes = be32(v)
      System.arraycopy(bytes, 0, copy, idx + 4 + fieldOff, 4)
      copy
    }
    // stsz sample_count = 0xFFFFFFFF with a 4-entry table: clamped to
    // what fits in the box payload — no huge allocation, no OOB read
    val hostileCount = corruptAt("stsz", 8, 0xFFFFFFFFL)
    val r1 = Mp4Parser.sampleRanges(hostileCount)
    assert(r1.length == samples.length) // payload holds exactly 4 entries
    // uniform-size stsz with a huge count: clamped by file size
    val uniformHuge = {
      val c = corruptAt("stsz", 4, 1024L) // uniform sample size 1 KiB
      val c2 = {
        val idx = (0 until c.length - 4).find(i =>
          c(i) == 's'.toByte && c(i + 1) == 't'.toByte &&
          c(i + 2) == 's'.toByte && c(i + 3) == 'z'.toByte).get
        val bytes = be32(0x7FFFFFFFL)
        System.arraycopy(bytes, 0, c, idx + 4 + 8, 4); c
      }
      c2
    }
    val r2 = Mp4Parser.sampleRanges(uniformHuge)
    assert(r2.length <= uniformHuge.length / 1024 + 1)
    // stco chunk count inflated past its payload: clamped, no throw
    val hostileStco = corruptAt("stco", 4, 0x10000000L)
    Mp4Parser.sampleRanges(hostileStco) // must not throw
  }
}
