package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in per-partition
  * batches (the Scala analogue of PySpark's mapInPandas batch shape).
  *
  * All three modalities decode for REAL on [[ImageIoDecoder]] (zero extra
  * dependencies): images via `javax.imageio` (PNG/BMP/GIF/JPEG + an 8x8
  * average perceptual hash); audio via `javax.sound.sampled` (PCM
  * WAV/AIFF/AU) plus the structural [[FlacCodec]] (native FLAC) and
  * [[OggStream]] (OGG-FLAC) paths dispatched on container magic; video via
  * raw-MJPEG SOI splitting plus the structural [[AviMjpeg]] / [[IsoBmff]] /
  * [[Matroska]] container demuxers. Codecs the JVM genuinely lacks (e.g.
  * MP3) fail loudly rather than fake a decode. [[StubDecoder]] remains as
  * the deterministic test seam for plumbing-only paths (the 16-byte header
  * convention below). Everything around the decoders is real and tested:
  * schema, Dataset encoders, per-partition decoder lifecycle (expensive
  * init once per partition, not per row), batch iteration, and the
  * downstream feature columns.
  *
  * Scale notes (100 TB of media):
  *  - binary payloads ride in their own column; feature extraction projects
  *    them away immediately after decode, so downstream stages shuffle only
  *    fixed-width features, never media bytes.
  *  - decode is map-only; `spark.sql.files.maxPartitionBytes` (and, for
  *    pathological skew, a repartition on id) bounds per-task memory.
  *
  * Fake header convention (deterministic stand-in for magic bytes):
  * bytes[0..3] = width (BE int), bytes[4..7] = height, bytes[8] = channels,
  * bytes[9] = media kind (0 image, 1 audio, 2 video), rest = payload.
  *
  * The full container x codec x failure-behavior matrix (what decodes for
  * real, what rejects loudly, what falls back to FNV) is documented in
  * `MEDIA.md` at the repo root — read it before pointing a new corpus at
  * this path.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      uri: String,
      media_type: String,
      content: Array[Byte],
      meta: Map[String, String])

  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      size_bytes: Long,
      ahash: Long)

  case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      size_bytes: Long,
      peak: Double,
      rms: Double)

  /** One record out of a SAFE normalization stage: either the processed
    * record (`error` null) or the ORIGINAL record diverted with a stable
    * reason tag (`error` set, exception class preserved in
    * `meta("error_class")`). At crawl scale one undecodable payload must
    * divert, not kill the task — the [[graft.operators.Quality]] quarantine
    * machinery picks the diverted rows up downstream.
    */
  case class MediaOutcome(
      media_id: Long,
      uri: String,
      media_type: String,
      content: Array[Byte],
      meta: Map[String, String],
      error: String)

  /** Decoder interface — the seam where a real codec (javax.imageio,
    * javax.sound, ffmpeg bindings, ...) would plug in. Implementations must
    * be cheap to call per row but may be expensive to construct (model
    * load): construct once per partition via [[decodeImages]].
    */
  trait MediaDecoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): ImageFeatures0
    def decodeAudio(bytes: Array[Byte]): AudioFeatures0
    def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[Long]
  }
  case class ImageFeatures0(width: Int, height: Int, channels: Int, ahash: Long)
  case class AudioFeatures0(
      sampleRate: Int, channels: Int, nFrames: Long, peak: Double, rms: Double)

  /** STUB decoder: deterministic fake parse of the 16-byte header; the
    * "average hash" is an FNV over the payload — NOT a real perceptual hash.
    */
  final class StubDecoder extends MediaDecoder {
    private def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    override def decodeImage(bytes: Array[Byte]): ImageFeatures0 = {
      require(bytes.length >= 10, s"media payload too short: ${bytes.length}")
      var h = 0xcbf29ce484222325L
      var i = 10
      while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      ImageFeatures0(beInt(bytes, 0), beInt(bytes, 4), bytes(8) & 0xff, h)
    }

    override def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[Long] = {
      val payload = bytes.drop(10)
      payload.grouped(math.max(1, everyN)).map { chunk =>
        var h = 0xcbf29ce484222325L
        chunk.foreach { b => h ^= b; h *= 0x100000001b3L }
        h
      }
    }

    /** Fake audio parse of the same 16-byte header convention: width field
      * doubles as sample rate, height as frame count; peak/rms are an FNV
      * artifact of the payload (deterministic, in (0, 1], rms <= peak).
      */
    override def decodeAudio(bytes: Array[Byte]): AudioFeatures0 = {
      require(bytes.length >= 10, s"media payload too short: ${bytes.length}")
      var h = 0xcbf29ce484222325L
      var i = 10
      while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      val frac = ((h >>> 11).toDouble / (1L << 53).toDouble)
      val peak = 0.25 + 0.75 * frac
      AudioFeatures0(beInt(bytes, 0), bytes(8) & 0xff, beInt(bytes, 4).toLong,
        peak, peak * 0.7071)
    }
  }

  /** REAL decoders on the JVM's built-in codecs: images via `javax.imageio`
    * (PNG/BMP/GIF/JPEG — whatever the JVM's registered readers handle),
    * audio via `javax.sound.sampled` (PCM WAV/AIFF/AU). The perceptual hash
    * is the standard 8x8 average hash: downsample luminance to an 8x8 grid,
    * threshold each cell against the grid mean, pack the 64 bits row-major.
    * Audio features are container geometry (rate/channels/frames) plus
    * peak and RMS amplitude over the decoded PCM samples, normalized to
    * [0, 1]. Frame sampling decodes MJPEG (concatenated JPEG frames)
    * through the same image codec; non-JPEG payloads fall back to the stub
    * chunking.
    */
  final class ImageIoDecoder extends MediaDecoder {
    // ImageIO's plugin scan is the expensive part — the per-partition
    // lifecycle in decodeImages amortizes it
    private val stub = new StubDecoder
    Multimodal.disableImageIoDiskCache()

    // `ImageIO.read` walks the IIORegistry on EVERY call (getImageReaders →
    // synchronized ServiceRegistry iteration) — under 32 concurrent tasks the
    // per-frame video path serializes on that lock (the same shape as the
    // AudioSystem probe contention fixed in audio decode). Instead: sniff the
    // container magic, reuse ONE ImageReader per format per decoder instance
    // (decoder is per-partition, so single-threaded use). Unknown magics fall
    // back to the registry path, preserving coverage.
    private val readerCache =
      scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]

    private def sniffFormat(bytes: Array[Byte]): String = {
      if (bytes.length < 8) return null
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      if (b0 == 0xff && b1 == 0xd8) "JPEG"
      else if (b0 == 0x89 && b1 == 0x50 && bytes(2) == 0x4e && bytes(3) == 0x47) "PNG"
      else if (b0 == 'G' && b1 == 'I' && bytes(2) == 'F' && bytes(3) == '8') "GIF"
      else if (b0 == 'B' && b1 == 'M') "BMP"
      else null
    }

    private def readCached(fmt: String, bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val reader = readerCache.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        require(it.hasNext, s"no ImageIO reader for $fmt")
        it.next()
      })
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } catch {
        case e: Throwable =>
          // a failed decode can leave reader state dirty — rebuild next call
          readerCache.remove(fmt).foreach(_.dispose())
          throw e
      } finally iis.close()
    }

    override def decodeImage(bytes: Array[Byte]): ImageFeatures0 = {
      val fmt = sniffFormat(bytes)
      val img =
        if (fmt != null) readCached(fmt, bytes)
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val lum = new Array[Double](64)
      var mean = 0.0
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          // nearest-pixel sample at the cell center (images smaller than
          // 8x8 sample pixels repeatedly — still deterministic)
          val x = math.min(w - 1, (gx * 2 + 1) * w / 16)
          val y = math.min(h - 1, (gy * 2 + 1) * h / 16)
          val rgb = img.getRGB(x, y)
          val l = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          lum(gy * 8 + gx) = l
          mean += l
          gx += 1
        }
        gy += 1
      }
      mean /= 64.0
      var hash = 0L
      var i = 0
      while (i < 64) { if (lum(i) > mean) hash |= (1L << i); i += 1 }
      ImageFeatures0(w, h, img.getColorModel.getNumComponents, hash)
    }

    /** Real frame sampling for video payloads, dispatched on container
      * magic:
      *  - AVI (`RIFF....AVI `): demux the chunk tree via [[AviMjpeg]] and
      *    decode the `##dc`/`##db` frame payloads — the container MJPEG
      *    actually ships in. A frame payload ImageIO cannot decode (e.g. a
      *    raw-DIB `##db` chunk) hashes by FNV instead, so mixed-codec files
      *    still produce a total result.
      *  - MP4 (`....ftyp`): walk the ISO BMFF box tree via [[IsoBmff]] and
      *    extract the video track's sample payloads from its
      *    stsc/stsz/stco tables — what a real crawl mostly contains. Same
      *    FNV fallback for undecodable samples.
      *  - Matroska/WebM (EBML magic `1A45DFA3`): walk the EBML tree via
      *    [[Matroska]] and extract the video track's SimpleBlock/Block
      *    payloads. Same FNV fallback.
      *  - raw MJPEG (concatenated JPEG frames): split at SOI-plus-marker
      *    boundaries (0xFF 0xD8 0xFF then any APPn/DQT/DHT/SOF/COM marker —
      *    JPEG byte-stuffing guarantees a raw SOI cannot occur inside
      *    entropy-coded data, and accepting every post-SOI marker keeps
      *    EXIF-led frames (FF D8 FF E1) on the real-decode path).
      *  - anything else falls back to the stub chunking.
      * Sampled frames decode through ImageIO to the 8x8 average hash.
      */
    // NonFatal, not just IIOException: the JDK JPEG reader throws AIOOBE /
    // NegativeArraySizeException / bare IOException on corrupt entropy-coded
    // data — one bad frame in a crawled file must not fail the whole task,
    // so an undecodable payload hashes by FNV instead
    private def frameHashOrFnv(frame: Array[Byte]): Long =
      try decodeImage(frame).ahash
      catch { case scala.util.control.NonFatal(_) =>
        var h = 0xcbf29ce484222325L
        frame.foreach { b => h ^= b; h *= 0x100000001b3L }
        h
      }

    private def demuxedHashes(
        frames: Iterator[Array[Byte]], everyN: Int): Iterator[Long] = {
      val step = math.max(1, everyN)
      frames.zipWithIndex.filter(_._2 % step == 0)
        .map { case (frame, _) => frameHashOrFnv(frame) }
    }

    override def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[Long] = {
      if (AviMjpeg.isAvi(bytes))
        return demuxedHashes(AviMjpeg.demuxFrames(bytes), everyN)
      if (IsoBmff.isMp4(bytes))
        return demuxedHashes(IsoBmff.demuxFrames(bytes), everyN)
      if (Matroska.isMatroska(bytes))
        return demuxedHashes(Matroska.demuxFrames(bytes), everyN)
      def isSoi(i: Int): Boolean = {
        if (i + 3 >= bytes.length || bytes(i) != 0xff.toByte || bytes(i + 1) != 0xd8.toByte ||
          bytes(i + 2) != 0xff.toByte) return false
        val m = bytes(i + 3) & 0xff
        // APPn (E0-EF), DQT (DB), DHT (C4), SOF0/2 (C0/C2), COM (FE)
        (m >= 0xe0 && m <= 0xef) || m == 0xdb || m == 0xc4 || m == 0xc0 || m == 0xc2 || m == 0xfe
      }
      if (bytes.length < 4 || !isSoi(0)) return stub.sampleFrames(bytes, everyN)
      val offsets = scala.collection.mutable.ArrayBuffer(0)
      var i = 2
      while (i + 3 < bytes.length) {
        if (isSoi(i)) { offsets += i; i += 4 } else i += 1
      }
      offsets += bytes.length
      val step = math.max(1, everyN)
      (0 until offsets.length - 1).iterator
        .filter(_ % step == 0)
        .map { f =>
          val frame = java.util.Arrays.copyOfRange(bytes, offsets(f), offsets(f + 1))
          decodeImage(frame).ahash
        }
    }

    /** Real audio parse: [[Multimodal.decodePcm16]] dispatches on container
      * magic (structural FLAC / OGG-FLAC / canonical WAV; javax.sound for
      * the rest, byte-swapped to LE), then one peak/RMS pass over the
      * decoded 16-bit samples (any channel layout, normalized by 1/32768).
      * Same PCM and feature math on every path, so a clip transcoded
      * losslessly between containers reports bit-identical features.
      */
    override def decodeAudio(bytes: Array[Byte]): AudioFeatures0 = {
      val (rate, channels, pcm) = Multimodal.decodePcm16(bytes)
      var i = 0
      var peak = 0.0
      var sumSq = 0.0
      var n = 0
      while (i + 1 < pcm.length) {
        val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
        val v = math.abs(s.toDouble) / 32768.0
        if (v > peak) peak = v
        sumSq += v * v
        n += 1
        i += 2
      }
      AudioFeatures0(rate, channels, pcm.length.toLong / (2 * channels), peak,
        if (n > 0) math.sqrt(sumSq / n) else 0.0)
    }
  }

  /** Encode the fake header + payload (used by tests / the demo query to
    * fabricate deterministic media bytes from any seed payload).
    */
  def fakeMediaBytes(width: Int, height: Int, channels: Int, kind: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](10 + payload.length)
    out(0) = (width >>> 24).toByte; out(1) = (width >>> 16).toByte
    out(2) = (width >>> 8).toByte; out(3) = width.toByte
    out(4) = (height >>> 24).toByte; out(5) = (height >>> 16).toByte
    out(6) = (height >>> 8).toByte; out(7) = height.toByte
    out(8) = channels.toByte; out(9) = kind.toByte
    System.arraycopy(payload, 0, out, 10, payload.length)
    out
  }

  /** Per-partition batch decode: decoder constructed ONCE per partition
    * (expensive-init lifecycle), then streamed over the rows — the batch
    * shape a real codec/model needs. Projects media bytes away.
    */
  def decodeImages(
      media: Dataset[MediaRecord],
      mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // once per partition, not per row
      rows.map { r =>
        val f = decoder.decodeImage(r.content)
        ImageFeatures(r.media_id, f.width, f.height, f.channels, r.content.length.toLong, f.ahash)
      }
    }
  }

  /** Per-partition batch audio decode, same lifecycle as [[decodeImages]]:
    * decoder constructed once per partition, media bytes projected away.
    */
  def decodeAudioFeatures(
      media: Dataset[MediaRecord],
      mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder()
      rows.map { r =>
        val f = decoder.decodeAudio(r.content)
        AudioFeatures(r.media_id, f.sampleRate, f.channels, f.nFrames,
          r.content.length.toLong, f.peak, f.rms)
      }
    }
  }

  /** Decode any supported audio container to raw interleaved 16-bit LE PCM
    * — the shared front half of feature extraction and resampling.
    * Dispatches exactly like the decoder seam: FLAC / OGG-FLAC take the
    * structural codecs, CANONICAL PCM WAV the structural parser, everything
    * else (AIFF/AU, extensible-fmt WAV) javax.sound — whose native
    * big-endian output is byte-swapped here so callers always see LE.
    */
  def decodePcm16(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (FlacCodec.isFlac(bytes)) {
      val a = FlacCodec.decodeFlac(bytes)
      return (a.sampleRate, a.channels, a.pcmLE)
    }
    if (OggStream.isOggFlac(bytes)) {
      val a = FlacCodec.decodeFlac(OggStream.extractFlac(bytes))
      return (a.sampleRate, a.channels, a.pcmLE)
    }
    if (OggStream.isOgg(bytes)) {
      // identify-then-reject: vorbis/opus/theora/speex have no decoder
      // here, and a crawl quarantine wants the codec NAMED (MEDIA.md),
      // not javax.sound's generic probe failure
      throw new IllegalArgumentException(
        s"decodePcm16: ogg container with ${OggStream.identifyCodec(bytes)} codec — " +
          "no decoder in this engine (supported matrix: MEDIA.md)")
    }
    // non-canonical WAVs (e.g. WAVE_FORMAT_EXTENSIBLE) fall through to
    // javax.sound rather than dying on the fast path's format-1 require
    if (WavePcm.isWav(bytes) && WavePcm.isCanonicalPcm16(bytes)) {
      val a = WavePcm.parseWav16(bytes)
      return (a.sampleRate, a.channels, a.pcmLE)
    }
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"decodePcm16: only 16-bit PCM supported, got $fmt")
      val data = in.readAllBytes()
      if (fmt.isBigEndian) { // AIFF/AU: swap to the LE the callers expect
        var i = 0
        while (i + 1 < data.length) {
          val t = data(i); data(i) = data(i + 1); data(i + 1) = t
          i += 2
        }
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, data)
    } finally in.close()
  }

  /** Per-partition batch audio RESAMPLE to a uniform rate — the
    * normalization pass before audio featurization/tokenization.
    * Nearest-neighbor frame mapping with pure integer source indices
    * (`j = i * srcRate / dstRate`), deterministic across JVMs like
    * [[resizeImages]]; output re-encoded WAV via [[WavePcm]]. A clip
    * already at the target rate passes through byte-identically when it is
    * WAV (other containers are transcoded so the output corpus is
    * uniformly WAV — the point of a normalization pass). Map-only.
    */
  def resampleAudio(media: Dataset[MediaRecord], targetRate: Int): Dataset[MediaRecord] = {
    require(targetRate >= 1, s"resampleAudio: targetRate $targetRate")
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => resampleOne(r, targetRate)))
  }

  /** [[resampleAudio]] with the divert-don't-die policy: an undecodable
    * clip routes to the output with `error = "undecodable_audio"` (original
    * bytes intact, exception class in `meta("error_class")`) instead of
    * killing the task — the corrupt-media behavior a crawl pipeline needs,
    * mirroring the frame-sampler's FNV fallback. Map-only either way.
    */
  def resampleAudioSafe(media: Dataset[MediaRecord], targetRate: Int): Dataset[MediaOutcome] = {
    require(targetRate >= 1, s"resampleAudio: targetRate $targetRate")
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map { r =>
      outcomeOf(r, "undecodable_audio")(resampleOne(r, targetRate))
    })
  }

  private def resampleOne(r: MediaRecord, targetRate: Int): MediaRecord = {
    val (rate, channels, pcm) = decodePcm16(r.content)
    val nIn = pcm.length / (2 * channels)
    val withMeta = r.meta +
      ("orig_rate" -> rate.toString, "orig_frames" -> nIn.toString)
    if (rate == targetRate && WavePcm.isWav(r.content)) {
      r.copy(meta = withMeta)
    } else {
      val nOut = ((nIn.toLong * targetRate) / rate).toInt
      val frameBytes = channels * 2
      val out = new Array[Byte](nOut * frameBytes)
      var i = 0
      while (i < nOut) {
        val j = math.min(nIn - 1, ((i.toLong * rate) / targetRate).toInt)
        System.arraycopy(pcm, j * frameBytes, out, i * frameBytes, frameBytes)
        i += 1
      }
      r.copy(content = WavePcm.writeWav16(out, targetRate, channels),
        media_type = "audio/wav", meta = withMeta)
    }
  }

  /** Run one record through a normalization stage, diverting NonFatal
    * decode failures to a [[MediaOutcome]] with a STABLE reason tag (the
    * oracle-checkable contract) and the exception class in meta (the
    * debugging breadcrumb). StackOverflow/OOM stay fatal by design.
    */
  private def outcomeOf(r: MediaRecord, reason: String)(body: => MediaRecord): MediaOutcome =
    try {
      val out = body
      MediaOutcome(out.media_id, out.uri, out.media_type, out.content, out.meta, null)
    } catch {
      case e: MediaTooLargeException =>
        // its own triage category: the image is (probably) fine, the
        // PIXEL BUDGET rejected it — a resize-at-lower-budget candidate,
        // not a corrupt file
        MediaOutcome(r.media_id, r.uri, r.media_type, r.content,
          r.meta + ("error_class" -> e.getClass.getSimpleName), "media_too_large")
      case scala.util.control.NonFatal(e) =>
        MediaOutcome(r.media_id, r.uri, r.media_type, r.content,
          r.meta + ("error_class" -> e.getClass.getSimpleName), reason)
    }

  /** The surviving records of a safe stage, back in [[MediaRecord]] shape
    * so they compose with every downstream media op.
    */
  def keptRecords(out: Dataset[MediaOutcome]): Dataset[MediaRecord] = {
    import out.sparkSession.implicits._
    out.filter(_.error == null)
      .map(o => MediaRecord(o.media_id, o.uri, o.media_type, o.content, o.meta))
  }

  /** Per-partition batch image RESIZE: aspect-preserving downscale so the
    * longest side is at most `maxDim`, nearest-neighbor sampled with pure
    * integer source coordinates (`x*w/nw`) — deterministic across JVMs,
    * unlike Graphics2D interpolation — then re-encoded PNG. Images already
    * within bounds pass through byte-identically (no re-encode). Output
    * stays a [[MediaRecord]] so the result composes with [[decodeImages]] /
    * any downstream media op; original dims ride in `meta`. Map-only like
    * every codec stage: at 100 TB this is the thumbnail/normalization pass
    * before vision featurization, and it shuffles nothing.
    */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    require(maxDim >= 1, s"resizeImages: maxDim $maxDim")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      disableImageIoDiskCache()
      rows.map(r => resizeOne(r, maxDim))
    }
  }

  /** [[resizeImages]] with the divert-don't-die policy: an undecodable
    * image routes to the output with `error = "undecodable_image"` instead
    * of killing the task. See [[resampleAudioSafe]].
    */
  def resizeImagesSafe(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaOutcome] = {
    require(maxDim >= 1, s"resizeImages: maxDim $maxDim")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      disableImageIoDiskCache()
      rows.map(r => outcomeOf(r, "undecodable_image")(resizeOne(r, maxDim)))
    }
  }

  /** Thrown when an image's DECLARED dimensions exceed the pixel budget —
    * before any pixel decode. Distinct from undecodable so safe stages can
    * tag it separately (`media_too_large`): a decompression bomb is a
    * triage-relevant category, not a corrupt file.
    */
  final class MediaTooLargeException(msg: String) extends IllegalArgumentException(msg)

  /** Header-only dimension probe: asks the format reader for (width,
    * height) WITHOUT decoding pixels. The decompression-bomb guard — a
    * crafted 60000x60000 PNG is a few KB of input but a multi-GB pixel
    * buffer, and at 32 concurrent tasks one bad crawl record per partition
    * is an executor OOM, not a task failure. None if no reader claims the
    * bytes (the subsequent full decode produces the decodable-or-not
    * verdict).
    */
  def probeImageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0)))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Pixel budget for the normalization stages: 64 Mpx ~= a 256 MB int
    * buffer per task — the bound that keeps 32 concurrent decodes inside
    * executor memory. Audio needs no analogue: PCM expands lossless audio
    * by at most ~4x, while image formats expand by 1000x+.
    */
  val DefaultMaxPixels: Long = 64L * 1000 * 1000

  /** Header-only format probe: the claiming ImageIO reader's format name
    * (lowercased: "png", "jpeg", "bmp", "gif", ...) plus declared
    * dimensions, no pixel decode. The general form of [[probeImageDims]].
    */
  def probeImageFormat(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            reader.getWidth(0), reader.getHeight(0)))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** SOI frame-boundary offsets of a raw concatenated-JPEG (MJPEG) buffer
    * — the same boundary rule the frame sampler uses (SOI then any
    * APPn/DQT/DHT/SOF/COM marker; byte-stuffing guarantees no false SOI
    * inside entropy-coded data). One element = a plain JPEG still.
    */
  def mjpegSoiOffsets(bytes: Array[Byte]): IndexedSeq[Int] = {
    def isSoi(i: Int): Boolean = {
      if (i + 3 >= bytes.length || bytes(i) != 0xff.toByte ||
        bytes(i + 1) != 0xd8.toByte || bytes(i + 2) != 0xff.toByte) return false
      val m = bytes(i + 3) & 0xff
      (m >= 0xe0 && m <= 0xef) || m == 0xdb || m == 0xc4 || m == 0xc0 || m == 0xc2 || m == 0xfe
    }
    if (bytes.length < 4 || !isSoi(0)) return IndexedSeq.empty
    val offsets = scala.collection.mutable.ArrayBuffer(0)
    var i = 2
    while (i + 3 < bytes.length) {
      if (isSoi(i)) { offsets += i; i += 4 } else i += 1
    }
    offsets.toIndexedSeq
  }

  /** One structural triage row per media record: container, codec,
    * geometry, frame count, and whether THIS ENGINE can fully decode it
    * (`decodable` — `decodePcm16`/ImageIO/the demuxers would accept it;
    * mp3 and ogg-vorbis/opus probe fine but decode is a loud reject,
    * MEDIA.md). Audio `n_frames` is PCM frames, video `n_frames` is
    * container frames, images have none.
    */
  case class MediaProbe(
      media_id: Long,
      container: String,
      codec: Option[String],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      channels: Option[Int],
      n_frames: Option[Long],
      decodable: Boolean)

  /** The crawl-triage pass: identify every record from HEADERS ONLY — no
    * pixel/sample decode anywhere (the costly full decode then runs only
    * on records triage routed to it). Map-only, never throws: a record
    * whose container sniffs but whose headers are damaged keeps its
    * container label with null detail and `decodable = false`; a record
    * nothing claims is `unknown`.
    */
  def probeMedia(media: Dataset[MediaRecord]): Dataset[MediaProbe] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => probeBytes(r.media_id, r.content)))
  }

  /** Single-record probe behind [[probeMedia]] — public so tests and
    * driver-side triage can call it directly.
    */
  def probeBytes(id: Long, bytes: Array[Byte]): MediaProbe = {
    def bare(container: String) =
      MediaProbe(id, container, None, None, None, None, None, None, decodable = false)
    // sniff first (magic only), then detail-parse; damaged headers keep
    // the sniffed container rather than degrading to "unknown"
    def guarded(container: String)(body: => MediaProbe): MediaProbe =
      try body catch { case scala.util.control.NonFatal(_) => bare(container) }
    def video(container: String, frames: Iterator[Array[Byte]]): MediaProbe = {
      var n = 0L
      var dims: Option[(Int, Int)] = None
      frames.foreach { f =>
        if (n == 0) dims = probeImageDims(f)
        n += 1
      }
      MediaProbe(id, container, if (dims.isDefined) Some("mjpeg") else None,
        dims.map(_._1), dims.map(_._2), None, None, Some(n), decodable = dims.isDefined)
    }
    if (PdfCodec.isPdf(bytes)) guarded("pdf") {
      // structural walk only (xref + page tree) — no stream decompression;
      // encrypted / xref-stream / damaged PDFs keep the container label
      // with decodable = false (the extract pass would divert them)
      val n = PdfCodec.pageCount(bytes)
      MediaProbe(id, "pdf", Some("pdf"), None, None, None, None,
        Some(n.toLong), decodable = true)
    } else if (FlacCodec.isFlac(bytes)) guarded("flac") {
      val si = FlacCodec.readStreamInfo(bytes)
      MediaProbe(id, "flac", Some("flac"), None, None, Some(si.sampleRate),
        Some(si.channels), Some(si.totalFrames), decodable = si.bitsPerSample == 16)
    } else if (OggStream.isOgg(bytes)) guarded("ogg") {
      OggStream.identifyCodec(bytes) match {
        case "flac" =>
          val si = FlacCodec.readStreamInfo(OggStream.extractFlac(bytes))
          MediaProbe(id, "ogg", Some("flac"), None, None, Some(si.sampleRate),
            Some(si.channels), Some(si.totalFrames), decodable = si.bitsPerSample == 16)
        case "vorbis" =>
          val v = OggStream.parseVorbisId(bytes)
          MediaProbe(id, "ogg", Some("vorbis"), None, None, Some(v.sampleRate),
            Some(v.channels), None, decodable = false)
        case "opus" =>
          val o = OggStream.parseOpusHead(bytes)
          MediaProbe(id, "ogg", Some("opus"), None, None, Some(o.inputSampleRate),
            Some(o.channels), None, decodable = false)
        case "unknown" => bare("ogg")
        case named => bare("ogg").copy(codec = Some(named))
      }
    } else if (WavePcm.isWav(bytes)) guarded("wav") {
      if (WavePcm.isCanonicalPcm16(bytes)) {
        val a = WavePcm.parseWav16(bytes)
        MediaProbe(id, "wav", Some("pcm_s16le"), None, None, Some(a.sampleRate),
          Some(a.channels), Some(a.nFrames), decodable = true)
      } else bare("wav") // extensible/float dialects: javax.sound MAY take
                         // them, but a static probe will not promise it
    } else if (Matroska.isMatroska(bytes)) {
      val container = Matroska.readDocType(bytes) match {
        case Some("webm") => "webm"
        case _ => "mkv"
      }
      guarded(container)(video(container, Matroska.demuxFrames(bytes)))
    } else if (AviMjpeg.isAvi(bytes)) {
      guarded("avi")(video("avi", AviMjpeg.demuxFrames(bytes)))
    } else if (IsoBmff.isMp4(bytes)) {
      guarded("mp4")(video("mp4", IsoBmff.demuxFrames(bytes)))
    } else if (Mp3Frames.isMp3(bytes)) guarded("mp3") {
      val m = Mp3Frames.probe(bytes)
      MediaProbe(id, "mp3", Some(s"mpeg${m.version}-layer${m.layer}"), None, None,
        Some(m.sampleRate), Some(m.channels), Some(m.pcmFrames), decodable = false)
    } else if (OfficeCodec.isOle(bytes)) guarded("ole-cfb") {
      // legacy binary Office: Word .doc is decodable (CFB walk + piece
      // table); xls/ppt/encrypted-OOXML are identified by their stream
      // names but not decoded; unknown/damaged containers stay bare
      Cfb.kind(bytes) match {
        case Some("doc") => MediaProbe(id, "doc", Some("ms-doc"), None, None,
          None, None, None, decodable = true)
        case Some("xls") => MediaProbe(id, "xls", Some("biff8"), None, None,
          None, None, None, decodable = true)
        case Some("ppt") => MediaProbe(id, "ppt", Some("ms-ppt"), None, None,
          None, None, None, decodable = true)
        case Some(k) => bare("ole-cfb").copy(codec = Some(k))
        case None => bare("ole-cfb")
      }
    } else if (Rtf.isRtf(bytes)) {
      MediaProbe(id, "rtf", Some("rtf"), None, None, None, None, None,
        decodable = true)
    } else if (Mail.isMbox(bytes)) {
      MediaProbe(id, "mbox", Some("rfc5322"), None, None, None, None, None,
        decodable = true)
    } else if (Zip.isZip(bytes)) guarded("zip") {
      // HEADER-ONLY document routing: central-directory names, no
      // payload decompression (OfficeCodec.sniff's contract)
      OfficeCodec.sniff(bytes) match {
        case Some(fmt) => MediaProbe(id, fmt, Some(fmt), None, None,
          None, None, None, decodable = true)
        case None => bare("zip") // an archive, not a document — ingestZip's lane
      }
    } else {
      guarded("unknown") {
        probeImageFormat(bytes) match {
          case Some(("jpeg", w, h)) =>
            val soi = mjpegSoiOffsets(bytes)
            if (soi.length > 1) // concatenated stills = a raw MJPEG clip
              MediaProbe(id, "mjpeg", Some("mjpeg"), Some(w), Some(h), None, None,
                Some(soi.length.toLong), decodable = true)
            else
              MediaProbe(id, "jpeg", Some("jpeg"), Some(w), Some(h), None, None,
                None, decodable = true)
          case Some((fmt, w, h)) =>
            MediaProbe(id, fmt, Some(fmt), Some(w), Some(h), None, None, None,
              decodable = true)
          case None => bare("unknown")
        }
      }
    }
  }

  private def resizeOne(r: MediaRecord, maxDim: Int,
      maxPixels: Long = DefaultMaxPixels): MediaRecord = {
    probeImageDims(r.content).foreach { case (pw, ph) =>
      if (pw.toLong * ph > maxPixels)
        throw new MediaTooLargeException(
          s"resizeImages: media ${r.media_id} declares ${pw}x$ph = ${pw.toLong * ph} px " +
            s"(> $maxPixels) — refusing to decode (decompression-bomb guard)")
    }
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
    require(img != null, s"resizeImages: media ${r.media_id} is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val m = math.max(w, h)
    val withDims = r.meta + ("orig_width" -> w.toString, "orig_height" -> h.toString)
    if (m <= maxDim) {
      r.copy(meta = withDims)
    } else {
      val nw = math.max(1, w * maxDim / m)
      val nh = math.max(1, h * maxDim / m)
      // keep the channel contract independent of whether the bound
      // triggered: alpha sources resize to an alpha target (pass-through
      // keeps alpha too), opaque sources stay 3-channel
      val outType =
        if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB
      val out = new java.awt.image.BufferedImage(nw, nh, outType)
      // bulk row-buffer transfer: getRGB(x,y,w,1,...) converts a whole row
      // through the color model in one call (the per-pixel getRGB/setRGB
      // form pays that conversion per call — ~10x slower on megapixel
      // sources), and only the nh SAMPLED rows are ever converted, so the
      // work is O(maxDim * w) regardless of source height
      val rowBuf = new Array[Int](w)
      val dstRow = new Array[Int](nw)
      var y = 0
      while (y < nh) {
        img.getRGB(0, y * h / nh, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < nw) { dstRow(x) = rowBuf(x * w / nw); x += 1 }
        out.setRGB(0, y, nw, 1, dstRow, 0, nw)
        y += 1
      }
      r.copy(content = encodeImage(out, "png"), media_type = "image/png", meta = withDims)
    }
  }

  /** Frame sampling (one row per sampled frame), same lifecycle. */
  def sampleFrames(
      media: Dataset[MediaRecord],
      everyN: Int,
      mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder()
      rows.flatMap { r =>
        decoder.sampleFrames(r.content, everyN).zipWithIndex.map {
          case (h, i) => FrameSample(r.media_id, i, h)
        }
      }
    }
  }

  /** ImageIO defaults to a DISK-backed stream cache: every read/write spills
    * through a temp file, which dominates small-image codec time (measured
    * ~4x on the mm_image_features corpus). In-memory cache is strictly
    * better for byte-array round-trips. Global JVM flag, idempotent — safe
    * to set from concurrent executor threads.
    */
  def disableImageIoDiskCache(): Unit = javax.imageio.ImageIO.setUseCache(false)

  /** `ImageIO.write` walks the IIORegistry (a synchronized ServiceRegistry
    * iteration) on EVERY call — under 32 concurrent fabrication tasks the
    * per-frame encode serializes on that lock, the writer-side twin of the
    * `ImageIO.read` contention in [[ImageIoDecoder]]. One cached writer per
    * (thread, format); output bytes are the same JDK plugin's, unchanged.
    */
  private val writerCache =
    new ThreadLocal[scala.collection.mutable.HashMap[String, javax.imageio.ImageWriter]] {
      override def initialValue() =
        scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageWriter]
    }

  def encodeImage(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    disableImageIoDiskCache()
    val writer = writerCache.get().getOrElseUpdate(fmt, {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
      require(it.hasNext, s"no ImageIO writer for $fmt")
      it.next()
    })
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } catch {
      case e: Throwable =>
        // a failed encode can leave writer state dirty — rebuild next call
        writerCache.get().remove(fmt).foreach(_.dispose())
        throw e
    } finally ios.close()
    baos.toByteArray
  }

  /** Deterministic REAL PNG bytes: dims + pixels derived purely from the
    * seed (no RNG), encoded through the JVM's PNG writer — so decode tests
    * and the image contract query exercise a genuine codec path.
    */
  def deterministicPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    disableImageIoDiskCache()
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // direct raster fill — pixel-identical to setRGB for INT_RGB (r14)
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 31 + y * 17 + seed) & 0xff
        val g = (x * 13 + y * 29 + seed * 7) & 0xff
        val b = (x * 7 + y * 11 + seed * 3) & 0xff
        px(y * width + x) = ((r << 16) | (g << 8) | b).toInt
        x += 1
      }
      y += 1
    }
    encodeImage(img, "png")
  }

  /** Deterministic REAL 16-bit PCM WAV bytes: every sample derived purely
    * from the seed (integer triangle-ish wave — no RNG, no transcendentals,
    * so bit-identical across JVMs), encoded through the JVM's WAVE writer.
    * Interleaved channels; frame = one sample per channel.
    */
  def deterministicWav(seed: Long, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] =
    // WavePcm's canonical header is byte-equivalent to AudioSystem's WAVE
    // writer for this format (spec-pinned both ways in the unit suite) but
    // free of its synchronized provider machinery
    WavePcm.writeWav16(deterministicPcm(seed, nFrames, channels), sampleRate, channels)

  /** The shared deterministic PCM generator behind the WAV/FLAC/OGG
    * corpora: interleaved signed 16-bit little-endian, every sample derived
    * purely from the seed (integer triangle-ish wave — no RNG, no
    * transcendentals, so bit-identical across JVMs). Because all three
    * containers carry THIS byte sequence losslessly, their decoded features
    * must match bit-for-bit — the parity the mm_flac/mm_ogg contracts pin.
    */
  def deterministicPcm(seed: Long, nFrames: Int, channels: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * channels * 2)
    val step = (seed % 97 + 3).toInt
    var f = 0
    var o = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        // triangle wave in [-8000, 8016]: loud enough that peak/rms are
        // far from zero, never clipping
        val phase = (f * step + c * 31) % 2003
        val tri = math.abs(phase - 1001) - 500
        val s = (tri * 16).toShort
        pcm(o) = (s & 0xff).toByte
        pcm(o + 1) = ((s >> 8) & 0xff).toByte
        o += 2
        c += 1
      }
      f += 1
    }
    pcm
  }

  /** Deterministic REAL FLAC bytes: the same PCM as [[deterministicWav]],
    * encoded through [[FlacCodec]] (verbatim subframes, full CRC/MD5
    * integrity fields).
    */
  def deterministicFlac(seed: Long, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] =
    FlacCodec.writeFlac(deterministicPcm(seed, nFrames, channels), sampleRate, channels)

  /** Deterministic REAL compressed FLAC bytes: the same PCM, encoded with
    * FIXED predictors + Rice residuals (even seeds) or constant-coefficient
    * LPC subframes (odd seeds), stereo frames auto-decorrelated — the
    * wild-FLAC shapes the decoder must handle, unlike the verbatim corpus.
    */
  def deterministicFlacCompressed(seed: Long, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] = {
    val mode = if (seed % 2 == 0) FlacCodec.Mode.Fixed else FlacCodec.Mode.Lpc
    FlacCodec.writeFlac(deterministicPcm(seed, nFrames, channels), sampleRate, channels,
      blockSize = 1024, mode = mode)
  }

  /** Deterministic REAL OGG-FLAC bytes: the same PCM again, FLAC-encoded
    * and shipped in OGG pages per the xiph mapping by [[OggStream]].
    */
  def deterministicOgg(seed: Long, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] =
    OggStream.writeOggFlac(deterministicPcm(seed, nFrames, channels), sampleRate, channels)

  /** Deterministic REAL PNG with ahash-controllable content: a 32x32 image
    * of uniform bright/dark 4x4 cells driven by an integer bit-mix of
    * (seed, cell), so the decoded 8x8 average hash equals those 64 bits
    * EXACTLY (each hash grid cell samples its cell center; the mean sits
    * strictly between the two levels because cell 0 is forced bright and
    * cell 63 dark). Hashes across seeds are ~iid, and flipping a cell moves
    * the hash by exactly one bit — the handle the media-dedup contract
    * needs: near-duplicates with a KNOWN hamming distance.
    */
  def gridPng(seed: Long, flipCells: Seq[Int] = Nil): Array[Byte] =
    encodeImage(gridImage(seed, flipCells.toSet), "png")

  private def gridImage(seed: Long, flips: Set[Int]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // direct raster fill (r14): TYPE_INT_RGB stores the bare 0xRRGGBB word,
    // so writing the DataBufferInt is pixel-identical to setRGB (values
    // here never carry high bits) without the per-call ColorModel hop
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var cell = 0
    while (cell < 64) {
      val base =
        if (cell == 0) true
        else if (cell == 63) false
        else {
          var h = seed * 0x9e3779b97f4a7c15L + cell * 0xc2b2ae3d27d4eb4fL
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          (h & 1L) == 1L
        }
      val bright = base ^ flips(cell)
      val v = if (bright) 200 else 50
      val rgb = (v << 16) | (v << 8) | v
      val cx = (cell % 8) * 4
      val cy = (cell / 8) * 4
      var y = cy
      while (y < cy + 4) {
        var x = cx
        while (x < cx + 4) { px(y * 32 + x) = rgb; x += 1 }
        y += 1
      }
      cell += 1
    }
    img
  }

  /** JPEG frames of [[gridImage]] patterns (frame f keyed by seed*16 + f,
    * collision-free for < 16 frames per clip) — the video sibling of
    * [[gridPng]]: each frame's average hash is the constructed grid bits
    * (the 50/200 contrast dwarfs JPEG artifacts), so frame-hash SEQUENCES
    * across seeds are ~iid and a video fingerprint can be pinned distinct.
    * The mjpeg/avi/mp4 corpora wrap these SAME bytes, keeping the
    * cross-container bit-parity the demux contracts rely on.
    */
  def gridJpegFrames(seed: Long, nFrames: Int): IndexedSeq[Array[Byte]] = {
    disableImageIoDiskCache()
    require(nFrames < 16, s"gridJpegFrames: $nFrames frames exceeds the seed*16 mix")
    (0 until nFrames).map(f => encodeImage(gridImage(seed * 16 + f, Set.empty), "jpg"))
      .toIndexedSeq
  }

  /** The expected average hash of [[gridPng]] — bit i = cell i bright. */
  def gridPngExpectedHash(seed: Long, flipCells: Seq[Int] = Nil): Long = {
    val flips = flipCells.toSet
    var hash = 0L
    var cell = 0
    while (cell < 64) {
      val base =
        if (cell == 0) true
        else if (cell == 63) false
        else {
          var h = seed * 0x9e3779b97f4a7c15L + cell * 0xc2b2ae3d27d4eb4fL
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          (h & 1L) == 1L
        }
      if (base ^ flips(cell)) hash |= (1L << cell)
      cell += 1
    }
    hash
  }

  /** 64-bit audio fingerprint: the clip is mono-mixed into 65 equal time
    * windows (pure integer |sample| energy sums, so the value is
    * bit-deterministic across JVMs) and bit i says whether window i+1 is
    * louder than window i — the sign-of-energy-delta construction
    * (Haitsma-Kalker-style, radically simplified to one band). Depends only
    * on the decoded PCM, so the same recording fingerprints identically out
    * of WAV, FLAC, or OGG-FLAC — which is exactly what cross-container
    * audio dedup needs.
    */
  def audioFingerprint64(pcmLE: Array[Byte], channels: Int): Long = {
    require(channels >= 1, s"audioFingerprint64: channels $channels")
    val frames = pcmLE.length / (2 * channels)
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val from = (w.toLong * frames / 65).toInt
      val until = ((w + 1).toLong * frames / 65).toInt
      var sum = 0L
      var f = from
      while (f < until) {
        var c = 0
        var o = (f * channels) * 2
        while (c < channels) {
          val s = ((pcmLE(o) & 0xff) | (pcmLE(o + 1) << 8)).toShort
          sum += math.abs(s.toLong)
          o += 2
          c += 1
        }
        f += 1
      }
      e(w) = sum
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** [[deterministicPcm]] with a blockwise amplitude envelope: every
    * 64-frame block is scaled by a level in {1..4} drawn from an integer
    * mix of (seed, block). The plain triangle corpus is near-stationary —
    * its window energies are almost equal, which makes energy-DELTA
    * fingerprints fragile (two unrelated clips can tie on every window).
    * The envelope makes window energy a strong function of the seed, which
    * is what a fingerprint-separation contract needs; still pure integer
    * math, never clipping (max 4 x 8016 < 32768).
    */
  def deterministicPcmMod(seed: Long, nFrames: Int, channels: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * channels * 2)
    val step = (seed % 97 + 3).toInt
    var f = 0
    var o = 0
    while (f < nFrames) {
      var h = seed * 0x9e3779b97f4a7c15L + (f >> 6) * 0xc2b2ae3d27d4eb4fL
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      val level = ((h & 3L) + 1L).toInt
      var c = 0
      while (c < channels) {
        val phase = (f * step + c * 31) % 2003
        val tri = math.abs(phase - 1001) - 500
        val s = (tri * 16 * level).toShort
        pcm(o) = (s & 0xff).toByte
        pcm(o + 1) = ((s >> 8) & 0xff).toByte
        o += 2
        c += 1
      }
      f += 1
    }
    pcm
  }

  /** The `audio_fingerprint` expression as a column (codegen'd projection —
    * no UDF, no object round-trip): decode any supported container, return
    * [[audioFingerprint64]] of the PCM.
    */
  def audioFingerprintCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.AudioFingerprint(
        org.apache.spark.sql.graftshim.GraftShims.expression(content)))

  /** Batch fingerprinting: any supported audio container ->
    * (media_id, fingerprint) — the 8-byte column media dedup shuffles
    * instead of audio bytes. A codegen'd projection on the scan; bytes
    * projected away immediately after.
    */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().select(col("media_id"),
      audioFingerprintCol(col("content")).as("fingerprint"))

  /** Audio-dedup demo corpus: one WAV per document, plus — for every third
    * document — the SAME recording transcoded to OGG-FLAC (identical PCM,
    * media_id offset by 10^9). Geometry uses a 250-way frame-count spread
    * so no two doc_ids below sf=1 scale produce identical PCM (the
    * deterministic generator keys on seed % 97, frames, channels — lcm
    * 48500); `AudioFingerprintSpec` pins the resulting cross-clip
    * fingerprint separation exhaustively over the sf0.1 id range.
    */
  def audioDedupCorpusFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .flatMap { case (id, source) =>
        val rate = 8000 * ((id % 3) + 1).toInt
        val nFrames = ((id % 250) + 1).toInt * 40 + 2600
        val channels = ((id % 2) + 1).toInt
        val pcm = deterministicPcmMod(id, nFrames, channels)
        val orig = MediaRecord(id, s"fake://$source/$id.wav", "audio/wav",
          WavePcm.writeWav16(pcm, rate, channels), Map("source" -> source))
        if (id % 3 == 0)
          Seq(orig, MediaRecord(id + 1000000000L, s"fake://$source/$id-copy.ogg",
            "audio/ogg", OggStream.writeOggFlac(pcm, rate, channels),
            Map("source" -> source)))
        else Seq(orig)
      }
  }

  /** 64-bit video fingerprint: FNV-style fold over the ORDERED per-frame
    * perceptual hashes — container-invariant because AVI/MP4/MKV demux
    * recover the same frame payloads the raw MJPEG carries (the
    * mm_avi/mp4/mkv_frames contracts pin that hash parity), and
    * order-sensitive so a re-cut is not a duplicate. An EXACT key (the
    * fold is not locality-preserving): dedup with maxHamming = 0.
    */
  def videoFingerprint64(frameHashes: Iterator[Long]): Long = {
    var h = 0xcbf29ce484222325L
    frameHashes.foreach { fh => h = (h ^ fh) * 0x100000001b3L }
    h
  }

  /** Per-partition batch video fingerprinting: every frame sampled
    * (everyN = 1), hashed through the real decoder, folded to 8 bytes —
    * media dedup shuffles fingerprints, never video bytes. Map-only.
    */
  def videoFingerprints(
      media: Dataset[MediaRecord],
      mkDecoder: () => MediaDecoder = () => new ImageIoDecoder): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder()
      rows.map(r => (r.media_id, videoFingerprint64(decoder.sampleFrames(r.content, 1))))
    }.toDF("media_id", "fingerprint")
  }

  /** Video-dedup demo corpus: one raw MJPEG clip per document, plus the
    * SAME frames re-containered — AVI for every third document, MP4 for
    * every fifth (media_id offsets 10^9 / 2x10^9). Identical frame bytes
    * -> identical hash sequence -> identical fingerprint, so the oracle
    * predicts every cluster from the doc_id rule;
    * `VideoFingerprintSpec` pins cross-clip distinctness exhaustively
    * over the sf0.1 id range.
    */
  def videoDedupCorpusFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .flatMap { case (id, source) =>
        // grid frames, NOT deterministicMjpeg: the gradient generator's
        // pixel formula wraps mod 256, so seeds 256 apart yield
        // bit-identical clips — fine for frame-count contracts, fatal for
        // a dedup oracle (VideoFingerprintSpec caught it exhaustively)
        val frames = gridJpegFrames(id, ((id % 8) + 2).toInt)
        val mjpeg = {
          val baos = new java.io.ByteArrayOutputStream()
          frames.foreach(baos.write)
          baos.toByteArray
        }
        val out = scala.collection.mutable.ArrayBuffer(
          MediaRecord(id, s"fake://$source/$id.mjpeg", "video/x-motion-jpeg",
            mjpeg, Map("source" -> source)))
        if (id % 3 == 0)
          out += MediaRecord(id + 1000000000L, s"fake://$source/$id-copy.avi",
            "video/avi", AviMjpeg.writeAvi(frames, 32, 32), Map("source" -> source))
        if (id % 5 == 0)
          out += MediaRecord(id + 2000000000L, s"fake://$source/$id-copy.mp4",
            "video/mp4", IsoBmff.writeMp4(frames, 32, 32), Map("source" -> source))
        out.toSeq
      }
  }

  /** Image-dedup demo corpus: one grid PNG per document, plus — for every
    * third document — a NEAR-DUPLICATE clone (two cells flipped, hamming
    * distance exactly 2, media_id offset by 10^9). The oracle predicts the
    * dedup outcome from the doc_id rule alone: each clone clusters with its
    * original (pigeonhole blocking must find it), nothing else clusters
    * (hashes across seeds are ~iid 64-bit values, so a spurious <=3-hamming
    * pair needs a ~2^-48 event).
    */
  def imageDedupCorpusFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .flatMap { case (id, source) =>
        val orig = MediaRecord(id, s"fake://$source/$id.png", "image/png",
          gridPng(id), Map("source" -> source))
        if (id % 3 == 0)
          Seq(orig, MediaRecord(id + 1000000000L, s"fake://$source/$id-copy.png",
            "image/png", gridPng(id, flipCells = Seq(5, 18)), Map("source" -> source)))
        else Seq(orig)
      }
  }

  /** Deterministic REAL MJPEG bytes: `nFrames` JPEG-encoded frames
    * concatenated (the motion-JPEG container), pixels derived purely from
    * (seed, frame index) via the same integer formula as
    * [[deterministicPng]] — no RNG, deterministic across JVMs.
    */
  def deterministicMjpeg(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    disableImageIoDiskCache()
    val baos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // direct raster fill — pixel-identical to setRGB for INT_RGB (r14)
      val px = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val fs = seed + f * 97L
          val r = (x * 31 + y * 17 + fs) & 0xff
          val g = (x * 13 + y * 29 + fs * 7) & 0xff
          val b = (x * 7 + y * 11 + fs * 3) & 0xff
          px(y * width + x) = ((r << 16) | (g << 8) | b).toInt
          x += 1
        }
        y += 1
      }
      baos.write(encodeImage(img, "jpg"))
      f += 1
    }
    baos.toByteArray
  }

  /** Deterministic REAL AVI bytes: the same deterministic JPEG frames as
    * [[deterministicMjpeg]], wrapped in a spec-correct RIFF/AVI container
    * (hdrl + movi + idx1) by [[AviMjpeg.writeAvi]] — so the container
    * demux path is exercised with frames whose hashes are known to match
    * the raw-MJPEG path bit-for-bit.
    */
  def deterministicAvi(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    disableImageIoDiskCache()
    val frames = (0 until nFrames).map(f => deterministicMjpeg(seed + f * 97L, width, height, 1))
    AviMjpeg.writeAvi(frames, width, height)
  }

  /** Deterministic REAL MP4 bytes: the same deterministic JPEG frames as
    * [[deterministicMjpeg]], wrapped in a spec-correct ISO BMFF container
    * (ftyp + moov sample tables + mdat) by [[IsoBmff.writeMp4]] — so the
    * MP4 demux path is exercised with frames whose hashes are known to
    * match the raw-MJPEG path bit-for-bit.
    */
  def deterministicMp4(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    disableImageIoDiskCache()
    val frames = (0 until nFrames).map(f => deterministicMjpeg(seed + f * 97L, width, height, 1))
    IsoBmff.writeMp4(frames, width, height)
  }

  /** Deterministic REAL Matroska/WebM bytes: the same deterministic JPEG
    * frames as [[deterministicMjpeg]], wrapped in a spec-correct EBML
    * container (header + Segment/Info/Tracks/Cluster SimpleBlocks) by
    * [[Matroska.writeMkv]] — so the MKV demux path is exercised with frames
    * whose hashes are known to match the raw-MJPEG path bit-for-bit.
    */
  def deterministicMkv(
      seed: Long, width: Int, height: Int, nFrames: Int,
      docType: String = "matroska"): Array[Byte] = {
    disableImageIoDiskCache()
    val frames = (0 until nFrames).map(f => deterministicMjpeg(seed + f * 97L, width, height, 1))
    Matroska.writeMkv(frames, width, height, docType)
  }

  /** The (doc_id, source) seed rows every synthetic media corpus expands
    * from. The tiny documents parquet reads as ONE split, but each seed row
    * expands ~1000x into media bytes downstream — so spread the seeds
    * across the cluster BEFORE the expansion (a few KB shuffled) or the
    * whole encode+decode pipeline runs in a single task. A real media
    * column arrives pre-sized from thousands of splits and skips this.
    */
  private def docSeeds(spark: SparkSession, dir: String): Dataset[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
  }

  /** MKV/WebM video demo corpus: same per-document geometry as
    * [[mjpegMediaFromDocuments]], shipped in the EBML container —
    * alternating `matroska` and `webm` DocTypes, because the demuxer is
    * structural and must treat both dialects identically.
    */
  def mkvMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        val webm = id % 2 == 1
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.${if (webm) "webm" else "mkv"}",
          media_type = if (webm) "video/webm" else "video/x-matroska",
          content = deterministicMkv(id, 16, 16, ((id % 8) + 2).toInt,
            if (webm) "webm" else "matroska"),
          meta = Map("source" -> source))
      }
  }

  /** MP4 video demo corpus: same per-document geometry as
    * [[mjpegMediaFromDocuments]] (frame count from doc_id, so the oracle
    * predicts sampled-frame counts), but shipped in the ISO BMFF container.
    */
  def mp4MediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.mp4",
          media_type = "video/mp4",
          content = deterministicMp4(id, 16, 16, ((id % 8) + 2).toInt),
          meta = Map("source" -> source))
      }
  }

  /** AVI video demo corpus: same per-document geometry as
    * [[mjpegMediaFromDocuments]] (frame count from doc_id, so the oracle
    * predicts sampled-frame counts), but shipped in the real container.
    */
  def aviMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.avi",
          media_type = "video/avi",
          content = deterministicAvi(id, 16, 16, ((id % 8) + 2).toInt),
          meta = Map("source" -> source))
      }
  }

  /** Video demo corpus: one real MJPEG clip per document, frame count
    * derived from doc_id (so an external oracle can predict how many frames
    * a sampling pass emits), frames from the deterministic generator.
    */
  def mjpegMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.mjpeg",
          media_type = "video/x-motion-jpeg",
          content = deterministicMjpeg(id, 16, 16, ((id % 8) + 2).toInt),
          meta = Map("source" -> source))
      }
  }

  /** Audio demo corpus: one real PCM WAV per document, geometry derived
    * from doc_id (so an external oracle can predict sample rate, channel
    * count, and frame count), samples from the deterministic generator.
    */
  def wavMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.wav",
          media_type = "audio/wav",
          content = deterministicWav(
            seed = id,
            sampleRate = 8000 * ((id % 3) + 1).toInt,
            nFrames = ((id % 25) + 1).toInt * 200,
            channels = ((id % 2) + 1).toInt),
          meta = Map("source" -> source))
      }
  }

  /** FLAC audio demo corpus: IDENTICAL per-document geometry and PCM as
    * [[wavMediaFromDocuments]] (same seed → same samples), so the decoded
    * features of the two paths must match bit-for-bit — the lossless-codec
    * parity the mm_flac_features contract query pins.
    */
  def flacMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.flac",
          media_type = "audio/flac",
          content = deterministicFlac(
            seed = id,
            sampleRate = 8000 * ((id % 3) + 1).toInt,
            nFrames = ((id % 25) + 1).toInt * 200,
            channels = ((id % 2) + 1).toInt),
          meta = Map("source" -> source))
      }
  }

  /** Compressed-FLAC audio demo corpus: the same geometry and PCM as
    * [[wavMediaFromDocuments]], but FIXED+Rice encoded (even doc_ids) or
    * LPC encoded (odd doc_ids) with auto stereo decorrelation — so the
    * mm_flac_fixed contract pins the PREDICTION decode paths (warmup +
    * residual reconstruction + decorrelation, MD5-verified per stream)
    * against the WAV path bit-for-bit, the way mm_flac_features pins the
    * verbatim path.
    */
  def flacCompressedMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.flac",
          media_type = "audio/flac",
          content = deterministicFlacCompressed(
            seed = id,
            sampleRate = 8000 * ((id % 3) + 1).toInt,
            nFrames = ((id % 25) + 1).toInt * 200,
            channels = ((id % 2) + 1).toInt),
          meta = Map("source" -> source))
      }
  }

  /** OGG-FLAC audio demo corpus: the same geometry/PCM once more, shipped
    * in OGG pages — the mm_ogg_features contract pins its parity with the
    * WAV path, proving page demux + packet reassembly + FLAC decode
    * end-to-end.
    */
  def oggMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.ogg",
          media_type = "audio/ogg",
          content = deterministicOgg(
            seed = id,
            sampleRate = 8000 * ((id % 3) + 1).toInt,
            nFrames = ((id % 25) + 1).toInt * 200,
            channels = ((id % 2) + 1).toInt),
          meta = Map("source" -> source))
      }
  }

  /** Image demo corpus: one real PNG per document, dims derived from doc_id
    * (so an external oracle can predict width/height/channels), pixels from
    * the deterministic generator above.
    */
  def pngMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.png",
          media_type = "image/png",
          content = deterministicPng(id, ((id % 16) + 1).toInt * 4, ((id % 12) + 1).toInt * 4),
          meta = Map("source" -> source))
      }
  }

  /** A minimal OGG stream carrying ONLY a Vorbis identification header
    * packet (Vorbis I spec §4.2.2) — the triage fixture for the
    * identify-without-decode path. Deliberately not a playable stream
    * (no comment/setup headers, no audio packets): the probe reads
    * packet 0 and stops, and decode remains a loud reject either way.
    */
  def deterministicVorbisIdOgg(seed: Long, sampleRate: Int, channels: Int): Array[Byte] = {
    val p = new Array[Byte](30)
    p(0) = 0x01
    "vorbis".indices.foreach(i => p(1 + i) = "vorbis".charAt(i).toByte)
    def u32le(off: Int, v: Int): Unit = {
      p(off) = v.toByte; p(off + 1) = (v >>> 8).toByte
      p(off + 2) = (v >>> 16).toByte; p(off + 3) = (v >>> 24).toByte
    }
    u32le(7, 0) // vorbis_version
    p(11) = channels.toByte
    u32le(12, sampleRate)
    u32le(20, 64000 + (seed % 8).toInt * 16000) // bitrate_nominal
    p(28) = 0xb8.toByte // blocksizes 2^8 / 2^11
    p(29) = 0x01 // framing bit
    OggStream.writePages(Seq(p), serial = (seed ^ 0x564f5242L).toInt, granules = Seq(0L))
  }

  /** An MP3 clip with deterministic Layer III framing ([[Mp3Frames
    * .writeMp3]]): MPEG version, rate, channels, frame count, VBR-ness,
    * and an optional ID3v2 tag all derived from the seed — so an oracle
    * predicts every probe output. `seed` here is the PER-BUCKET index
    * (doc_id/10 in the mixed corpus) to keep variation independent of the
    * container-choosing residue.
    */
  def deterministicMp3(seed: Long): Array[Byte] = {
    val mpeg1 = seed % 2 == 0
    val rate = (if (mpeg1) Array(44100, 48000, 32000) else Array(22050, 24000, 16000))(
      (seed % 3).toInt)
    val channels = if (seed % 3 == 0) 1 else 2
    val table = if (mpeg1) Array(112, 128, 160, 192) else Array(64, 80, 96, 112)
    val k = (seed % 10).toInt + 1
    val bitrates =
      if (seed % 5 == 0) (0 until k).map(f => table(((seed + f) % 4).toInt))
      else Seq.fill(k)(table((seed % 4).toInt))
    Mp3Frames.writeMp3(rate, channels, bitrates, seed,
      id3v2Pad = if (seed % 4 == 0) 64 + (seed % 32).toInt else 0)
  }

  /** The triage-probe demo corpus: ten container families chosen by
    * doc_id % 10, every per-file parameter derived from doc_id / 10 (the
    * PER-BUCKET index — a residue-derived parameter would be constant
    * within its bucket). What a crawl actually hands a pipeline: a column
    * of mixed, partly-undecodable media.
    */
  def mixedMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docSeeds(spark, dir)
      .map { case (id, source) =>
        val q = id / 10
        def rec(ext: String, mediaType: String, bytes: Array[Byte]) =
          MediaRecord(id, s"fake://$source/$id.$ext", mediaType, bytes,
            Map("source" -> source))
        val rate = 8000 * ((q % 3) + 1).toInt
        val aFrames = ((q % 25) + 1).toInt * 200
        val aCh = ((q % 2) + 1).toInt
        val vFrames = ((q % 8) + 2).toInt
        (id % 10) match {
          case 0 => rec("png", "image/png",
            deterministicPng(q, ((q % 16) + 1).toInt * 4, ((q % 12) + 1).toInt * 4))
          case 1 => rec("jpg", "image/jpeg",
            deterministicMjpeg(q, ((q % 16) + 1).toInt * 4, ((q % 12) + 1).toInt * 4, 1))
          case 2 => rec("wav", "audio/wav", deterministicWav(q, rate, aFrames, aCh))
          case 3 => rec("flac", "audio/flac", deterministicFlacCompressed(q, rate, aFrames, aCh))
          case 4 => rec("ogg", "audio/ogg", deterministicOgg(q, rate, aFrames, aCh))
          case 5 => rec("mp3", "audio/mpeg", deterministicMp3(q))
          case 6 => rec("ogg", "audio/ogg", deterministicVorbisIdOgg(q, rate, aCh))
          case 7 => rec("avi", "video/avi", deterministicAvi(q, 16, 16, vFrames))
          case 8 => rec("mp4", "video/mp4", deterministicMp4(q, 16, 16, vFrames))
          case _ =>
            val webm = q % 2 == 1
            rec(if (webm) "webm" else "mkv",
              if (webm) "video/webm" else "video/x-matroska",
              deterministicMkv(q, 16, 16, vFrames, if (webm) "webm" else "matroska"))
        }
      }
  }

  /** Demo corpus: deterministic fake media fabricated from the documents
    * table (payload = text bytes; dims derived from doc_id).
    */
  def fakeMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.img",
          media_type = "image/fake",
          content = fakeMediaBytes(
            width = (id % 64 + 1).toInt * 16,
            height = (id % 48 + 1).toInt * 16,
            channels = 3, kind = 0, payload = payload),
          meta = Map("source" -> source))
      }
  }
}
