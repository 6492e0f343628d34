package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Real WAV/PCM parsing against containers BUILT HERE byte by byte,
  * with ground-truth features (square-wave RMS/ZCR are closed-form)
  * and an independent cross-check against the JDK's own WAV reader
  * (javax.sound.sampled) for the header fields.
  */
class WavParserSpec extends AnyFunSuite with SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def wav(channels: Int, sampleRate: Int, bits: Int,
                  frames: Array[Array[Int]]): Array[Byte] = {
    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val data = frames.flatMap { frame =>
      frame.flatMap { s =>
        val raw = if (bits == 8) s + 128 else s
        (0 until bytesPer).map(k => ((raw >> (8 * k)) & 0xFF).toByte)
      }
    }
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate.toLong * blockAlign) ++ le16(blockAlign) ++ le16(bits)
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(data.length.toLong) ++ data
    "RIFF".getBytes ++ le32(body.length.toLong) ++ body
  }

  /** 1 kHz square at 8 kHz: 4 samples +a, 4 samples −a, repeating. */
  private def square(a: Int, n: Int): Array[Array[Int]] =
    Array.tabulate(n)(i => Array(if ((i / 4) % 2 == 0) a else -a))

  test("probeWav agrees with the JDK's own WAV reader on every header field") {
    val file = wav(2, 44100, 16,
      Array.tabulate(1000)(i => Array(i % 100, -(i % 100))))
    val meta = WavParser.probeWav(5L, file).get
    val jdk = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(file))
    assert(meta.channels == jdk.getFormat.getChannels)
    assert(meta.sample_rate == jdk.getFormat.getSampleRate.toInt)
    assert(meta.bits == jdk.getFormat.getSampleSizeInBits)
    assert(meta.n_frames == jdk.getFrameLength.toLong)
    assert(meta.format == "pcm")
    assert(meta.duration_ms == 1000L * 1000L / 44100L)
    assert(WavParser.probeWav(0L, "not audio".getBytes).isEmpty)
  }

  test("square-wave features are closed-form exact: RMS, peak, crossings") {
    val a = 16384
    val file = wav(1, 8000, 16, square(a, 8000))
    val f = WavParser.featuresOf(9L, file).get
    assert(f.duration_ms == 1000L)
    // |square| is constant → RMS = peak = a/fullScale
    val expected = math.floor(a.toDouble / 32767 * 1e6 + 0.5).toLong
    assert(f.rms_millionths == expected)
    assert(f.peak_millionths == expected)
    // sign flips at every 4-sample boundary: 8000/4 - 1
    assert(f.zero_crossings == 1999L)
  }

  test("8-bit unsigned and stereo mixdown decode correctly") {
    val f8 = WavParser.featuresOf(1L,
      wav(1, 8000, 8, square(100, 800))).get
    assert(f8.rms_millionths == math.floor(100.0 / 127 * 1e6 + 0.5).toLong)
    // stereo L = -R → mono average is silence
    val fst = WavParser.featuresOf(2L,
      wav(2, 8000, 16, Array.fill(800)(Array(1000, -1000)))).get
    assert(fst.rms_millionths == 0L && fst.zero_crossings == 0L)
  }

  test("Spark routes: meta surfaces non-audio, features drop it, windows slice frames") {
    import spark.implicits._
    val file = wav(1, 8000, 16, square(8192, 8000)) // 1 s → 4 windows of 250 ms
    val media = Seq((1L, file), (2L, "junk".getBytes)).toDF("media_id", "data")
    val metas = WavParser.decodeAudioMeta(spark, media, "media_id", "data")
      .collect().sortBy(_.media_id)
    assert(metas(0).format == "pcm" && metas(0).n_frames == 8000L)
    assert(metas(1).format == "none")
    val feats = WavParser.extractAudioFeatures(spark, media, "media_id", "data")
      .collect()
    assert(feats.map(_.media_id).toSeq == Seq(1L))
    val wins = WavParser.sampleWindows(spark, media, "media_id", "data",
      windowMs = 250, everyN = 2).collect().sortBy(_.window_idx)
    assert(wins.map(w => (w.window_idx, w.start_frame)).toSeq ==
      Seq((0, 0L), (2, 4000L)))
    // each window is 2000 frames × 2 bytes of the ORIGINAL payload
    assert(wins.forall(_.pcm.length == 4000))
    val dataStart = file.length - 16000 // 8000 frames × 2 bytes at the tail
    assert(wins(1).pcm.sameElements(
      java.util.Arrays.copyOfRange(file, dataStart + 8000, dataStart + 12000)))
  }
}
