package graft.multimodal

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The REAL image arm: generated PNG/JPEG payloads decoded with JDK
  * ImageIO — true dimensions, real resize bounds, deterministic
  * features — plus the unreadable-payload contracts.
  */
class ImageCodecSpec extends AnyFunSuite with SparkSpec {

  /** A deterministic w×h RGB test card (diagonal gradient + quadrant
    * tint) encoded via ImageIO.
    */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255) / math.max(1, w - 1)
        val g = (y * 255) / math.max(1, h - 1)
        val b = if (x < w / 2 ^ y < h / 2) 200 else 40
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def media = {
    import spark.implicits._
    Seq(
      (1L, imageBytes(64, 48, "png")),
      (2L, imageBytes(100, 30, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "data")
  }

  test("decodeImageMeta reads true dimensions from real PNG/JPEG headers") {
    val m = Multimodal.decodeImageMeta(spark, media, "media_id", "data")
      .collect().sortBy(_.media_id)
    assert(m.map(x => (x.media_id, x.format, x.width, x.height)).toSeq ==
      Seq((1L, "png", 64, 48), (2L, "jpeg", 100, 30),
        (3L, "unreadable", 0, 0)))
    assert(m.forall(_.n_bytes > 0))
  }

  test("resizeImages produces decodable PNGs at exactly the target size") {
    val out = Multimodal.resizeImages(spark, media, "media_id", "data",
      targetW = 16, targetH = 12).collect().sortBy(_.media_id)
    // the unreadable payload is dropped, the two real images survive
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    out.foreach { r =>
      assert(r.width == 16 && r.height == 12)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.data))
      assert(img != null, "re-encoded payload must be a decodable PNG")
      assert(img.getWidth == 16 && img.getHeight == 12,
        s"decoded dims ${img.getWidth}x${img.getHeight}")
      // resize-down must actually shrink the payload
      assert(r.data.length < imageBytes(64, 48, "png").length * 2)
    }
  }

  test("box-average resample is exact on a flat image and deterministic") {
    // flat color: every averaged box must reproduce the color exactly
    val img = new BufferedImage(33, 17, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 33) img.setRGB(x, y, 0x6495ED)
    val small = Multimodal.resampleBox(img, 5, 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert((small.getRGB(x, y) & 0xFFFFFF) == 0x6495ED)
    // gradient: two resamples agree bit for bit
    val g = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imageBytes(64, 48, "png")))
    val a = Multimodal.resampleBox(g, 7, 5)
    val b = Multimodal.resampleBox(g, 7, 5)
    for (y <- 0 until 5; x <- 0 until 7)
      assert(a.getRGB(x, y) == b.getRGB(x, y))
  }

  test("BMP fixture roundtrip: ImageIO decodes the built file to the closed-form pixels") {
    import spark.implicits._
    // the mm_resize_real gate's input side: the generated 24-bit BMP
    // must decode — through the REAL JDK reader — to exactly the
    // closed-form pixel values the DuckDB oracle replays
    val ids = Seq(0L, 1L, 7L, 62L)
    val media = ids.map(id => (id, MediaFixture.bmpBytes(id))).toDF("media_id", "data")
    val meta = Multimodal.decodeImageMeta(spark, media, "media_id", "data")
      .collect().sortBy(_.media_id)
    assert(meta.map(m => (m.media_id, m.format, m.width, m.height)).toSeq ==
      ids.map(id => (id, "bmp",
        MediaFixture.bmpWidth(id), MediaFixture.bmpHeight(id))))
    val px = Multimodal.decodePixels(spark, media, "media_id", "data").collect()
    assert(px.length == ids.map(id =>
      MediaFixture.bmpWidth(id) * MediaFixture.bmpHeight(id)).sum)
    px.foreach { p =>
      assert((p.r, p.g, p.b) ==
        (MediaFixture.bmpR(p.media_id, p.x, p.y),
          MediaFixture.bmpG(p.media_id, p.x, p.y),
          MediaFixture.bmpB(p.media_id, p.x, p.y)),
        s"pixel (${p.x},${p.y}) of id ${p.media_id} drifted")
    }
    // and the full gate pipeline (resize -> PNG -> decode back) equals
    // a directly-computed box average
    val resized = Multimodal.resizeImages(spark, media, "media_id", "data",
      targetW = 4, targetH = 3).toDF()
    val got = Multimodal.decodePixels(spark, resized, "media_id", "data")
      .collect().map(p => (p.media_id, p.x, p.y, p.r, p.g, p.b)).toSet
    val want = ids.flatMap { id =>
      val sw = MediaFixture.bmpWidth(id); val sh = MediaFixture.bmpHeight(id)
      for (y <- 0 until 3; x <- 0 until 4) yield {
        val x0 = x * sw / 4; val x1 = math.max(x0 + 1, (x + 1) * sw / 4)
        val y0 = y * sh / 3; val y1 = math.max(y0 + 1, (y + 1) * sh / 3)
        var r = 0L; var g = 0L; var b = 0L; var n = 0L
        for (py <- y0 until y1; px2 <- x0 until x1) {
          r += MediaFixture.bmpR(id, px2, py)
          g += MediaFixture.bmpG(id, px2, py)
          b += MediaFixture.bmpB(id, px2, py); n += 1
        }
        (id, x, y, (r / n).toInt, (g / n).toInt, (b / n).toInt)
      }
    }.toSet
    assert(got == want, "resize gate pipeline drifted from the box-average reference")
  }

  test("extractImageFeatures: fixed dim, [0,1] range, gradient structure") {
    val f = Multimodal.extractImageFeatures(spark, media, "media_id", "data",
      grid = 4).collect().sortBy(_.media_id)
    assert(f.map(_.media_id).toSeq == Seq(1L, 2L)) // unreadable dropped
    f.foreach { r =>
      assert(r.features.length == 48)
      assert(r.features.forall(v => v >= 0.0f && v <= 1.0f))
    }
    // the PNG test card's red channel grows left→right: compare the
    // leftmost and rightmost patch of the top row
    val png = f.find(_.media_id == 1L).get.features
    assert(png(0) < png(3 * 3),
      s"red must increase along x: ${png(0)} vs ${png(3 * 3)}")
    // determinism across runs
    val f2 = Multimodal.extractImageFeatures(spark, media, "media_id", "data",
      grid = 4).collect().sortBy(_.media_id)
    assert(f.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }
}
