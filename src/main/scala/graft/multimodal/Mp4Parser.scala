package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Real ISO BMFF (MP4) container parsing and MJPEG frame extraction —
  * pure byte walking, no codec dependency (the
  * [[graft.sources.PdfTextExtractor]] move applied to video): the
  * metadata a 100 TB media-curation pass needs (duration, dimensions,
  * sample count, brand) comes from the `moov` box tree alone, and
  * sample PAYLOADS come from the `stbl` offset tables — neither
  * requires decoding a single pixel.
  *
  * == Codec boundary (documented, not hidden) ==
  *
  * The JDK ships no video decoder and this build is zero-egress, so
  * compressed bitstreams (H.264/H.265/VP9/AV1) cannot be decoded to
  * pixels here. What IS real:
  *  - container metadata: `ftyp` brand, `mvhd` timescale/duration,
  *    `tkhd` track dimensions (16.16 fixed), `stsz` sample count —
  *    spec-exact for version-0 and version-1 boxes, `co64` included;
  *  - sample EXTRACTION: `stsc`/`stco`/`stsz` resolve every sample's
  *    exact byte range, so frames of self-contained-sample codecs
  *    (MJPEG-in-MP4, where each sample is a complete JPEG) round-trip
  *    through the real image arm ([[Multimodal.readImage]]);
  *  - raw MJPEG streams (concatenated JPEGs): marker-scan frame split
  *    with FF-stuffing awareness and nested-SOI depth tracking (EXIF
  *    thumbnails embed whole JPEGs).
  * A compressed-codec sample still extracts byte-exactly — it just
  * is not decodable to pixels on this JVM; callers branch on the
  * `stsd` codec fourcc exposed in [[VideoMeta.codec]].
  */
object Mp4Parser {

  /** Container-level metadata from the moov tree (no pixel decode). */
  final case class VideoMeta(media_id: Long, n_bytes: Long, brand: String,
                             codec: String, timescale: Long,
                             duration_ms: Long, width: Int, height: Int,
                             n_samples: Int)

  // ---- big-endian primitives -----------------------------------------

  @inline private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  @inline private def u16(b: Array[Byte], o: Int): Int =
    (u8(b, o) << 8) | u8(b, o + 1)
  @inline private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong << 16) | u16(b, o + 2)
  @inline private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  @inline private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Top-down box scan of `[start, end)`: (type, payloadStart,
    * payloadEnd) per box, malformed sizes terminate the walk instead
    * of throwing (corrupt files are data, not exceptions).
    */
  private[multimodal] def boxes(b: Array[Byte], start: Int,
                                end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = start
      def hasNext: Boolean = off + 8 <= end
      def next(): (String, Int, Int) = {
        val size0 = u32(b, off)
        val typ = fourcc(b, off + 4)
        val (payload, boxEnd) =
          if (size0 == 1L && off + 16 <= end) {
            val ls = u64(b, off + 8)
            (off + 16, if (ls >= 16 && off + ls <= end) (off + ls).toInt else end)
          } else if (size0 == 0L) (off + 8, end) // box extends to EOF
          else if (size0 >= 8L && off + size0 <= end) (off + 8, (off + size0).toInt)
          else (off + 8, end) // malformed size: consume the rest
        off = boxEnd
        (typ, payload, boxEnd)
      }
    }

  private def findBox(b: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  private def findPath(b: Array[Byte], start: Int, end: Int,
                       path: Seq[String]): Option[(Int, Int)] =
    path.foldLeft(Option((start, end))) {
      case (acc, typ) => acc.flatMap { case (s, e) => findBox(b, s, e, typ) }
    }

  /** The video `trak` (first one whose `tkhd` has nonzero width, else
    * the first trak), as its payload range.
    */
  private def videoTrak(b: Array[Byte], moovS: Int, moovE: Int): Option[(Int, Int)] = {
    val traks = boxes(b, moovS, moovE).collect { case ("trak", s, e) => (s, e) }.toList
    traks.find { case (s, e) =>
      findBox(b, s, e, "tkhd").exists { case (ts, te) => tkhdDims(b, ts, te)._1 > 0 }
    }.orElse(traks.headOption)
  }

  /** (width, height) from a tkhd payload — 16.16 fixed point at the
    * end of the box; version 1 shifts the fixed header by 12 bytes.
    */
  private def tkhdDims(b: Array[Byte], s: Int, e: Int): (Int, Int) = {
    val off = s + (if (u8(b, s) == 1) 88 else 76)
    if (off + 8 > e) (0, 0)
    else ((u32(b, off) >> 16).toInt, (u32(b, off + 4) >> 16).toInt)
  }

  /** Parse the container; None when the payload is not ISO BMFF (no
    * `ftyp`/`moov` at the top level).
    */
  def probeMp4(id: Long, data: Array[Byte]): Option[VideoMeta] = {
    val top = boxes(data, 0, data.length).toList
    val brand = top.collectFirst { case ("ftyp", s, e) if s + 4 <= e =>
      fourcc(data, s).trim }
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
    (brand, moov) match {
      case (Some(br), Some((ms, me))) =>
        val (tsc, durMs) = findBox(data, ms, me, "mvhd").map { case (s, e) =>
          val v = u8(data, s)
          val (t, d) =
            if (v == 1 && s + 32 <= e) (u32(data, s + 20), u64(data, s + 24))
            else if (s + 20 <= e) (u32(data, s + 12), u32(data, s + 16))
            else (0L, 0L)
          (t, if (t > 0) d * 1000L / t else 0L)
        }.getOrElse((0L, 0L))
        val trak = videoTrak(data, ms, me)
        val (w, h) = trak.flatMap { case (s, e) => findBox(data, s, e, "tkhd") }
          .map { case (s, e) => tkhdDims(data, s, e) }.getOrElse((0, 0))
        val stbl = trak.flatMap { case (s, e) =>
          findPath(data, s, e, Seq("mdia", "minf", "stbl")) }
        // stsd payload: ver/flags(4) + entry_count(4) + first
        // SampleEntry box, whose own header is size(4) + format fourcc
        val codec = stbl.flatMap { case (s, e) => findBox(data, s, e, "stsd") }
          .collect { case (s, e) if s + 16 <= e => fourcc(data, s + 12) }
          .getOrElse("none")
        val nSamples = stbl.flatMap { case (s, e) => findBox(data, s, e, "stsz") }
          .collect { case (s, e) if s + 12 <= e => u32(data, s + 8).toInt }
          .getOrElse(0)
        Some(VideoMeta(id, data.length.toLong, br, codec, tsc, durMs, w, h,
          nSamples))
      case _ => None
    }
  }

  /** Every sample's exact (offset, size) byte range, resolved from
    * stsc (samples per chunk) × stco/co64 (chunk offsets) × stsz
    * (sample sizes) — the seek table a frame sampler uses so task
    * memory holds ONE sample, never the file's frame set.
    */
  def sampleRanges(data: Array[Byte]): Array[(Long, Long)] = {
    val stbl = (for {
      (ms, me) <- findBox(data, 0, data.length, "moov")
      (ts, te) <- videoTrak(data, ms, me)
      r <- findPath(data, ts, te, Seq("mdia", "minf", "stbl"))
    } yield r).getOrElse(return Array.empty)
    val (ss, se) = stbl

    // Entry counts are UNTRUSTED u32 fields from the file: clamp each
    // table to what fits in its box payload (and the uniform-size
    // sample count to what fits in the file), so a corrupt or hostile
    // count can neither drive a multi-GB allocation nor read past the
    // box end — corrupt files are data, not exceptions.
    def clamped(declared: Long, payloadCap: Long): Int =
      math.min(declared, math.max(0L, payloadCap)).toInt

    val sizes: Array[Long] = findBox(data, ss, se, "stsz").map { case (s, e) =>
      if (s + 12 > e) Array.empty[Long]
      else {
        val uniform = u32(data, s + 4)
        val declared = u32(data, s + 8)
        if (uniform > 0) {
          // no per-sample table; total bytes can't exceed the file
          Array.fill(clamped(declared, data.length.toLong / uniform))(uniform)
        } else {
          val n = clamped(declared, (e - (s + 12)).toLong / 4)
          Array.tabulate(n)(i => u32(data, s + 12 + 4 * i))
        }
      }
    }.getOrElse(Array.empty)
    if (sizes.isEmpty) return Array.empty

    val chunkOffsets: Array[Long] =
      findBox(data, ss, se, "stco").map { case (s, e) =>
        val n = clamped(u32(data, s + 4), (e - (s + 8)).toLong / 4)
        Array.tabulate(n)(i => u32(data, s + 8 + 4 * i))
      }.orElse(findBox(data, ss, se, "co64").map { case (s, e) =>
        val n = clamped(u32(data, s + 4), (e - (s + 8)).toLong / 8)
        Array.tabulate(n)(i => u64(data, s + 8 + 8 * i))
      }).getOrElse(Array.empty)
    if (chunkOffsets.isEmpty) return Array.empty

    // stsc runs: (first_chunk, samples_per_chunk); absent → 1 per chunk
    val stscRuns: Array[(Int, Int)] = findBox(data, ss, se, "stsc")
      .map { case (s, e) =>
        val n = clamped(u32(data, s + 4), (e - (s + 8)).toLong / 12)
        Array.tabulate(n)(i =>
          (u32(data, s + 8 + 12 * i).toInt, u32(data, s + 12 + 12 * i).toInt))
      }.filter(_.nonEmpty).getOrElse(Array((1, 1)))

    val out = new Array[(Long, Long)](sizes.length)
    var sample = 0
    var run = 0
    var chunk = 1
    while (sample < sizes.length && chunk <= chunkOffsets.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
      val perChunk = stscRuns(run)._2
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample < sizes.length) {
        out(sample) = (off, sizes(sample))
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out.take(sample)
  }

  /** Frame byte-ranges of a raw MJPEG stream (concatenated JPEGs).
    * Length-prefixed marker segments (APPn/DQT/DHT/SOFn/SOS/COM…) are
    * skipped wholesale by their declared length, so an incidental
    * `FF D9` byte pair inside table data is never misread as EOI;
    * consecutive `FF` bytes are JPEG fill (advance one, so the real
    * marker after a fill run is still seen). Bare nested SOI depth is
    * still tracked for EXIF-thumbnail-shaped embeddings that aren't
    * wrapped in a length-prefixed segment.
    */
  def jpegFrameRanges(data: Array[Byte]): Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    val n = data.length
    while (i + 1 < n) {
      if (u8(data, i) == 0xFF && u8(data, i + 1) == 0xD8) {
        val start = i
        var depth = 1
        var broken = false
        i += 2
        while (depth > 0 && !broken && i + 1 < n) {
          if (u8(data, i) != 0xFF) i += 1 // entropy-coded byte
          else {
            val m = u8(data, i + 1)
            if (m == 0xFF) i += 1 // fill byte: the next FF may start a marker
            else if (m == 0xD8) { depth += 1; i += 2 } // bare nested SOI
            else if (m == 0xD9) { depth -= 1; i += 2 } // EOI
            else if (m == 0x00 || m == 0x01 || (m >= 0xD0 && m <= 0xD7))
              i += 2 // stuffing / TEM / RSTn: standalone, no length
            else {
              // length-prefixed segment: skip its payload entirely
              if (i + 3 < n) {
                val len = (u8(data, i + 2) << 8) | u8(data, i + 3)
                if (len < 2 || i + 2 + len > n) broken = true
                else i += 2 + len
              } else broken = true
            }
          }
        }
        if (depth == 0 && !broken) out += ((start, i))
        // truncated/corrupt trailing frame — dropped, not guessed
      } else i += 1
    }
    out.toArray
  }

  // ---- Spark entry points (same plumbing shape as the image arm) -----

  /** REAL container-metadata pass: one header walk per row, no pixel
    * decode. Non-BMFF payloads surface with `brand = "none"` and zero
    * fields — a curation filter downstream, never a task failure.
    */
  def decodeVideoMeta(spark: SparkSession, media: DataFrame,
                      idCol: String, dataCol: String): Dataset[VideoMeta] = {
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS BIGINT)", dataCol).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          probeMp4(id, data).getOrElse(
            VideoMeta(id, data.length.toLong, "none", "none", 0L, 0L, 0, 0, 0))
        }
      }
  }

  /** REAL frame sampling: MP4 payloads emit their stbl-resolved sample
    * slices, raw MJPEG streams their marker-scanned JPEG frames; every
    * `everyN`-th frame up to `maxFrames`, one slice in memory at a
    * time. Rows that are neither are dropped (pair with
    * [[decodeVideoMeta]] to audit the drop set).
    */
  def sampleFramesReal(spark: SparkSession, media: DataFrame,
                       idCol: String, dataCol: String,
                       everyN: Int, maxFrames: Int = 16): Dataset[Multimodal.SampledFrame] = {
    require(everyN > 0, "everyN must be positive")
    require(maxFrames > 0, "maxFrames must be positive")
    import spark.implicits._
    media.selectExpr(s"CAST($idCol AS BIGINT)", dataCol).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, data) =>
          val ranges: Array[(Long, Long)] =
            if (probeMp4(id, data).isDefined) sampleRanges(data)
            else if (data.length > 1 && u8(data, 0) == 0xFF && u8(data, 1) == 0xD8)
              jpegFrameRanges(data).map { case (s, e) => (s.toLong, (e - s).toLong) }
            else Array.empty[(Long, Long)]
          Iterator.range(0, ranges.length, everyN).take(maxFrames).flatMap { idx =>
            val (off, len) = ranges(idx)
            if (off >= 0 && len > 0 && off + len <= data.length)
              Some(Multimodal.SampledFrame(id, idx,
                java.util.Arrays.copyOfRange(data, off.toInt, (off + len).toInt)))
            else None // offset table points outside the file: corrupt
          }
        }
      }
  }
}
