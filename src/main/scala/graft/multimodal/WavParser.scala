package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Real RIFF/WAVE audio parsing and PCM decode — the audio sibling of
  * [[Mp4Parser]], closing the "audio remains a stub" seam for the
  * formats a zero-egress JDK can honestly handle: WAV containers with
  * integer PCM payloads (the archival/dataset-interchange format;
  * 8-bit unsigned and 16/24/32-bit signed little-endian). Pure byte
  * walking — chunk sizes are validated, malformed files surface as
  * `format = "none"` rows, never task failures.
  *
  * == Codec boundary (documented, not hidden) ==
  *
  * Compressed audio (MP3/AAC/Opus/Vorbis) has no JDK decoder and no
  * egress to fetch one; those payloads probe as `none` here. What IS
  * real: container metadata (channels, sample rate, bit depth, frame
  * count, duration), full PCM sample decode, integer-exact feature
  * extraction (RMS, peak, zero crossings — the silence/clipping/
  * activity screens an audio-curation pass runs), and fixed-length
  * window sampling (the audio analog of video frame sampling: one
  * window slice in task memory at a time).
  */
object WavParser {

  final case class AudioMeta(media_id: Long, n_bytes: Long, format: String,
                             channels: Int, sample_rate: Int, bits: Int,
                             n_frames: Long, duration_ms: Long)

  /** Integer-exact per-file features over the mono mixdown (channel
    * average): `rms_millionths`/`peak_millionths` are amplitude
    * relative to full scale ×1e6 (exact integer sum of squares, one
    * final sqrt), `zero_crossings` counts strict sign changes.
    */
  final case class AudioFeatures(media_id: Long, duration_ms: Long,
                                 rms_millionths: Long, peak_millionths: Long,
                                 zero_crossings: Long)

  /** One sampled PCM window (raw little-endian frames, same encoding
    * as the source — decodable standalone given the meta row).
    */
  final case class AudioWindow(media_id: Long, window_idx: Int,
                               start_frame: Long, pcm: Array[Byte])

  @inline private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  @inline private def u32le(b: Array[Byte], o: Int): Long =
    (u16le(b, o).toLong) | (u16le(b, o + 2).toLong << 16)

  /** fmt + data chunk locations: (audioFormat, channels, sampleRate,
    * bits, dataStart, dataLen). None unless a well-formed RIFF/WAVE.
    */
  private def chunks(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, "ISO-8859-1")
      val size = u32le(b, off + 4)
      val payload = off + 8
      if (size < 0 || payload + size > b.length) return fmt.flatMap { f =>
        data.map(d => (f._1, f._2, f._3, f._4, d._1, d._2)) // truncated tail
      }
      if (id == "fmt " && size >= 16)
        fmt = Some((u16le(b, payload), u16le(b, payload + 2),
          u32le(b, payload + 4).toInt, u16le(b, payload + 14)))
      else if (id == "data")
        data = Some((payload, size.toInt))
      off = payload + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((af, ch, sr, bits) <- fmt; (ds, dl) <- data)
      yield (af, ch, sr, bits, ds, dl)
  }

  /** Container metadata; None when the payload is not RIFF/WAVE. */
  def probeWav(id: Long, data: Array[Byte]): Option[AudioMeta] =
    chunks(data).map { case (af, ch, sr, bits, _, dl) =>
      val frameBytes = math.max(1, ch * (bits / 8))
      val frames = dl.toLong / frameBytes
      val fmt =
        if (af == 1 && Set(8, 16, 24, 32).contains(bits)) "pcm"
        else s"unsupported-$af-$bits"
      AudioMeta(id, data.length.toLong, fmt, ch, sr, bits, frames,
        if (sr > 0) frames * 1000L / sr else 0L)
    }

  /** Mono mixdown of the PCM payload: per frame, the channel AVERAGE
    * as a signed value at the source bit depth (exact integer
    * division truncation). None unless integer PCM.
    */
  private[multimodal] def monoPcm(data: Array[Byte]): Option[(AudioMeta, Array[Long])] =
    chunks(data).flatMap { case (af, ch, sr, bits, ds, dl) =>
      if (af != 1 || !Set(8, 16, 24, 32).contains(bits) || ch <= 0) None
      else {
        val bytesPer = bits / 8
        val frameBytes = ch * bytesPer
        val n = dl / frameBytes
        val out = new Array[Long](n)
        var f = 0
        while (f < n) {
          var acc = 0L
          var c = 0
          while (c < ch) {
            val o = ds + f * frameBytes + c * bytesPer
            var v = 0L
            var k = 0
            while (k < bytesPer) { v |= (data(o + k) & 0xFFL) << (8 * k); k += 1 }
            val sv =
              if (bits == 8) v - 128L // 8-bit WAV is unsigned
              else { // sign-extend little-endian
                val shift = 64 - bits
                (v << shift) >> shift
              }
            acc += sv
            c += 1
          }
          out(f) = acc / ch
          f += 1
        }
        Some((AudioMeta(0L, data.length.toLong, "pcm", ch, sr, bits, n.toLong,
          if (sr > 0) n.toLong * 1000L / sr else 0L), out))
      }
    }

  private def fullScale(bits: Int): Long = (1L << (bits - 1)) - 1

  private[multimodal] def featuresOf(id: Long, data: Array[Byte]): Option[AudioFeatures] =
    monoPcm(data).map { case (meta, mono) =>
      val fs = fullScale(meta.bits)
      var sumSq = java.math.BigInteger.ZERO
      var peak = 0L
      var zc = 0L
      var prevSign = 0
      var i = 0
      while (i < mono.length) {
        val v = mono(i)
        sumSq = sumSq.add(java.math.BigInteger.valueOf(v * v))
        if (math.abs(v) > peak) peak = math.abs(v)
        val sign = java.lang.Long.signum(v)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) zc += 1
          prevSign = sign
        }
        i += 1
      }
      val rms =
        if (mono.isEmpty) 0L
        else math.floor(math.sqrt(
          new java.math.BigDecimal(sumSq).doubleValue() / mono.length)
          / fs * 1e6d + 0.5d).toLong
      AudioFeatures(id, meta.duration_ms, rms,
        math.floor(peak.toDouble / fs * 1e6d + 0.5d).toLong, zc)
    }

  // ---- Spark entry points (the image/video arms' plumbing shape) -----

  /** REAL metadata pass: header walk per row, no sample decode. */
  def decodeAudioMeta(spark: SparkSession, media: DataFrame,
                      idCol: String, dataCol: String): Dataset[AudioMeta] = {
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS BIGINT)", dataCol).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        probeWav(id, data).getOrElse(
          AudioMeta(id, data.length.toLong, "none", 0, 0, 0, 0L, 0L))
      })
  }

  /** REAL feature pass: full PCM decode + integer-exact RMS/peak/ZCR —
    * the silence/clipping screens. Non-PCM rows are dropped (pair with
    * [[decodeAudioMeta]] to audit the drop set).
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame,
                           idCol: String, dataCol: String): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS BIGINT)", dataCol).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, data) => featuresOf(id, data) })
  }

  /** REAL window sampling: every `everyN`-th window of `windowMs`
    * milliseconds as a raw PCM byte slice (source encoding, frame-
    * aligned), up to `maxWindows` — one slice in task memory at a
    * time, the audio analog of [[Mp4Parser.sampleFramesReal]].
    */
  def sampleWindows(spark: SparkSession, media: DataFrame,
                    idCol: String, dataCol: String, windowMs: Int,
                    everyN: Int = 1, maxWindows: Int = 16): Dataset[AudioWindow] = {
    require(windowMs > 0 && everyN > 0 && maxWindows > 0,
      "windowMs, everyN, maxWindows must be positive")
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS BIGINT)", dataCol).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, data) =>
        chunks(data) match {
          case Some((1, ch, sr, bits, ds, dl))
              if Set(8, 16, 24, 32).contains(bits) && ch > 0 && sr > 0 =>
            val frameBytes = ch * (bits / 8)
            val nFrames = dl / frameBytes
            val winFrames = math.max(1, (sr.toLong * windowMs / 1000L).toInt)
            val nWins = (nFrames + winFrames - 1) / math.max(1, winFrames)
            Iterator.range(0, nWins, everyN).take(maxWindows).map { w =>
              val startF = w.toLong * winFrames
              val endF = math.min(nFrames.toLong, startF + winFrames)
              val from = ds + startF * frameBytes
              val until = ds + endF * frameBytes
              AudioWindow(id, w, startF,
                java.util.Arrays.copyOfRange(data, from.toInt, until.toInt))
            }
          case _ => Iterator.empty
        }
      })
  }
}
