package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal real Matroska (MKV / WebM) container support for the multimodal
  * video path: a spec-correct writer for MJPEG-frames-in-MKV and a tolerant
  * demuxer that walks the EBML element tree and yields the video-track
  * block payloads.
  *
  * With AVI ([[AviMjpeg]]) and MP4 ([[IsoBmff]]) this completes the
  * container set a real crawl contains: WebM is structurally Matroska with
  * a different DocType, so both dialects take this path. Like its siblings
  * the demuxer is deliberately STRUCTURAL — it follows
  * `Segment` → `Tracks`/`TrackEntry` (collecting video track numbers) and
  * `Segment` → `Cluster` → `SimpleBlock`/`BlockGroup`/`Block`, ignoring
  * everything it does not need (cues, chapters, tags, seek heads, timing) —
  * which is what makes it robust across muxer dialects.
  *
  * EBML primer (all integers big-endian): every element is
  * `ID (1-4 raw bytes), size (vint), payload`. A vint's first byte's
  * leading-zero count gives its total length; the marker bit is kept for
  * IDs and stripped for sizes; an all-ones size means "unknown — runs to
  * the end of the parent" (streamed files use it on Segment/Cluster).
  */
object Matroska {

  /** True if the buffer starts with the EBML magic (0x1A45DFA3) — every
    * Matroska/WebM file opens with the EBML header element.
    */
  def isMatroska(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 0x1a.toByte && bytes(1) == 0x45.toByte &&
      bytes(2) == 0xdf.toByte && bytes(3) == 0xa3.toByte

  // ---- element IDs (raw big-endian value, marker bit included) ----
  private val ID_SEGMENT = 0x18538067L
  private val ID_TRACKS = 0x1654ae6bL
  private val ID_TRACK_ENTRY = 0xaeL
  private val ID_TRACK_NUMBER = 0xd7L
  private val ID_TRACK_TYPE = 0x83L
  private val ID_CLUSTER = 0x1f43b675L
  private val ID_SIMPLE_BLOCK = 0xa3L
  private val ID_BLOCK_GROUP = 0xa0L
  private val ID_BLOCK = 0xa1L

  /** vint length from its first byte (1..8), or -1 if invalid (0x00). */
  @inline private def vintLen(first: Int): Int = {
    if (first == 0) return -1
    java.lang.Integer.numberOfLeadingZeros(first) - 23
  }

  /** Element ID at `off`: (rawValue, lengthBytes), or null on truncation.
    * IDs keep their marker bit — that is how the tables list them.
    */
  private def readId(b: Array[Byte], off: Int, end: Long): (Long, Int) = {
    if (off >= end) return null
    val len = vintLen(b(off) & 0xff)
    if (len < 1 || len > 4 || off + len > end) return null
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** Size vint at `off`: (value, lengthBytes) with the marker stripped;
    * value == -1 encodes "unknown size". Null on truncation/invalid.
    */
  private def readSize(b: Array[Byte], off: Int, end: Long): (Long, Int) = {
    if (off >= end) return null
    val first = b(off) & 0xff
    val len = vintLen(first)
    if (len < 1 || len > 8 || off + len > end) return null
    var v = (first & (0xff >>> len)).toLong
    var allOnes = (first & (0xff >>> len)) == (0xff >>> len)
    var i = 1
    while (i < len) {
      val x = b(off + i) & 0xff
      allOnes &&= x == 0xff
      v = (v << 8) | x
      i += 1
    }
    (if (allOnes) -1L else v, len)
  }

  /** Unsigned big-endian integer payload (TrackNumber, TrackType...). */
  private def uintPayload(b: Array[Byte], start: Long, end: Long): Long = {
    var v = 0L
    var i = start
    while (i < end && i - start < 8) { v = (v << 8) | (b(i.toInt) & 0xffL); i += 1 }
    v
  }

  /** Master elements worth descending into even when truncated: clamping a
    * cut-off Cluster (or Segment) to the available bytes lets the walk
    * recover every COMPLETE block before the cut, while a truncated leaf
    * (a block payload) is dropped rather than emitted as a corrupt frame.
    */
  private val MASTERS = Set(ID_SEGMENT, ID_TRACKS, ID_TRACK_ENTRY,
    ID_CLUSTER, ID_BLOCK_GROUP)

  /** The child elements of `[start, end)` as (id, payloadStart, payloadEnd).
    * Tolerant: a malformed element ends the listing with what parsed so
    * far; a truncated MASTER is emitted clamped to `end` (then the listing
    * stops), a truncated leaf is dropped; unknown-size children run to the
    * end of this parent.
    */
  private def children(b: Array[Byte], start: Long, end: Long): Seq[(Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var p = start
    while (p < end) {
      val id = readId(b, p.toInt, end)
      if (id == null) return out.toSeq
      val sz = readSize(b, p.toInt + id._2, end)
      if (sz == null) return out.toSeq
      val dataStart = p + id._2 + sz._2
      val dataEnd = if (sz._1 < 0) end else dataStart + sz._1
      if (dataEnd < dataStart || dataEnd > end) { // truncated
        if (dataStart <= end && MASTERS(id._1)) out += ((id._1, dataStart, end))
        return out.toSeq
      }
      out += ((id._1, dataStart, dataEnd))
      p = dataEnd
    }
    out.toSeq
  }

  /** The EBML header's DocType string ("matroska" or "webm" in practice) —
    * how a triage probe distinguishes the two dialects of the one
    * container format. None if the header is missing or garbled.
    */
  def readDocType(bytes: Array[Byte]): Option[String] = {
    if (!isMatroska(bytes)) return None
    val sz = readSize(bytes, 4, bytes.length) // size vint after the 4-byte EBML id
    if (sz == null) return None
    val start = 4L + sz._2
    val end = if (sz._1 < 0) bytes.length.toLong
      else math.min(bytes.length.toLong, start + sz._1)
    children(bytes, start, end).collectFirst {
      case (0x4282L, s, e) =>
        new String(bytes, s.toInt, (e - s).toInt, java.nio.charset.StandardCharsets.US_ASCII)
    }
  }

  /** A Block/SimpleBlock payload's frame data: skip the track vint, the
    * 2-byte relative timestamp and the flags byte; laced blocks (video
    * tracks are never laced in practice) are skipped rather than mis-split.
    * Returns (trackNumber, frame) or null.
    */
  private def blockFrame(b: Array[Byte], start: Long, end: Long): (Long, Array[Byte]) = {
    val tn = readSize(b, start.toInt, end) // track number is a plain vint
    if (tn == null || tn._1 < 0) return null
    val headerEnd = start + tn._2 + 3
    if (headerEnd > end) return null
    val flags = b(headerEnd.toInt - 1) & 0xff
    if ((flags & 0x06) != 0) return null // laced: not MJPEG-shaped, skip
    (tn._1, java.util.Arrays.copyOfRange(b, headerEnd.toInt, end.toInt))
  }

  /** Demux the video-track frame payloads out of a Matroska buffer, in
    * file order. Tolerant the same way [[AviMjpeg.demuxFrames]] /
    * [[IsoBmff.demuxFrames]] are: truncated clusters yield the frames that
    * are present; if the Tracks element is missing or garbled (severed
    * header), EVERY block's payload is taken — decode what's there.
    */
  def demuxFrames(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    if (!isMatroska(bytes)) return Iterator.empty
    val top = children(bytes, 0L, bytes.length.toLong)
    val segments = top.filter(_._1 == ID_SEGMENT)
    if (segments.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    segments.foreach { case (_, segS, segE) =>
      val segChildren = children(bytes, segS, segE)
      // video track numbers (TrackType == 1); empty set => accept all
      val videoTracks: Set[Long] = segChildren.filter(_._1 == ID_TRACKS)
        .flatMap { case (_, tS, tE) => children(bytes, tS, tE) }
        .filter(_._1 == ID_TRACK_ENTRY)
        .flatMap { case (_, eS, eE) =>
          val fields = children(bytes, eS, eE)
          val num = fields.find(_._1 == ID_TRACK_NUMBER)
            .map { case (_, s, e) => uintPayload(bytes, s, e) }
          val tpe = fields.find(_._1 == ID_TRACK_TYPE)
            .map { case (_, s, e) => uintPayload(bytes, s, e) }
          if (tpe.contains(1L)) num else None
        }.toSet
      def wanted(track: Long): Boolean = videoTracks.isEmpty || videoTracks(track)
      segChildren.filter(_._1 == ID_CLUSTER).foreach { case (_, cS, cE) =>
        children(bytes, cS, cE).foreach {
          case (ID_SIMPLE_BLOCK, s, e) =>
            val f = blockFrame(bytes, s, e)
            if (f != null && wanted(f._1)) out += f._2
          case (ID_BLOCK_GROUP, gS, gE) =>
            children(bytes, gS, gE).filter(_._1 == ID_BLOCK).foreach { case (_, s, e) =>
              val f = blockFrame(bytes, s, e)
              if (f != null && wanted(f._1)) out += f._2
            }
          case _ => ()
        }
      }
    }
    out.iterator
  }

  // ---- writer ----

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  /** Minimal-length EBML size vint (marker bit set, never all-ones). */
  private def vintSize(v: Long): Array[Byte] = {
    require(v >= 0, s"ebml size must be non-negative, got $v")
    var len = 1
    // all-ones at a given length means "unknown", so the max usable value
    // at length n is 2^(7n) - 2
    while (len <= 8 && v > (1L << (7 * len)) - 2) len += 1
    require(len <= 8, s"ebml size too large: $v")
    val out = beBytes(v, len)
    out(0) = (out(0) | (0x80 >>> (len - 1))).toByte
    out
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val b = new ByteArrayOutputStream(); parts.foreach(b.write); b.toByteArray
  }

  /** `element(idBytes, payload)` with a minimal known size. */
  private def el(id: Long, idLen: Int, payload: Array[Byte]): Array[Byte] =
    cat(beBytes(id, idLen), vintSize(payload.length.toLong), payload)

  private def uintEl(id: Long, idLen: Int, v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    el(id, idLen, beBytes(v, n))
  }

  private def strEl(id: Long, idLen: Int, s: String): Array[Byte] =
    el(id, idLen, s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Write a minimal spec-correct MJPEG Matroska/WebM file: EBML header
    * (with the given DocType), one Segment with Info (TimestampScale),
    * Tracks (one video TrackEntry, `V_MJPEG`, lacing off), and one Cluster
    * of one SimpleBlock per frame (keyframe flag, no lacing). Every
    * element a standard demuxer expects is present with known sizes.
    */
  def writeMkv(
      frames: IndexedSeq[Array[Byte]], width: Int, height: Int,
      docType: String = "matroska"): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val header = el(0x1a45dfa3L, 4, cat(
      uintEl(0x4286L, 2, 1), // EBMLVersion
      uintEl(0x42f7L, 2, 1), // EBMLReadVersion
      uintEl(0x42f2L, 2, 4), // EBMLMaxIDLength
      uintEl(0x42f3L, 2, 8), // EBMLMaxSizeLength
      strEl(0x4282L, 2, docType),
      uintEl(0x4287L, 2, 4), // DocTypeVersion
      uintEl(0x4285L, 2, 2))) // DocTypeReadVersion
    val info = el(0x1549a966L, 4, cat(
      uintEl(0x2ad7b1L, 3, 1000000L), // TimestampScale: 1 ms
      strEl(0x4d80L, 2, "graft"), // MuxingApp
      strEl(0x5741L, 2, "graft"))) // WritingApp
    val trackEntry = el(ID_TRACK_ENTRY, 1, cat(
      uintEl(ID_TRACK_NUMBER, 1, 1),
      uintEl(0x73c5L, 2, 1), // TrackUID
      uintEl(ID_TRACK_TYPE, 1, 1), // video
      uintEl(0x9cL, 1, 0), // FlagLacing off
      strEl(0x86L, 1, "V_MJPEG"),
      el(0xe0L, 1, cat( // Video
        uintEl(0xb0L, 1, width.toLong),
        uintEl(0xbaL, 1, height.toLong)))))
    val tracks = el(ID_TRACKS, 4, trackEntry)
    val blocks = frames.zipWithIndex.map { case (f, i) =>
      // SimpleBlock: track vint 0x81, s16 relative timestamp, flags 0x80
      // (keyframe, no lacing), then the frame bytes
      el(ID_SIMPLE_BLOCK, 1,
        cat(Array(0x81.toByte), beBytes(i.toLong, 2), Array(0x80.toByte), f))
    }
    val cluster = el(ID_CLUSTER, 4,
      cat(uintEl(0xe7L, 1, 0L) +: blocks: _*)) // Timestamp 0
    cat(header, el(ID_SEGMENT, 4, cat(info, tracks, cluster)))
  }
}
