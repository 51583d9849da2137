package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal real AVI (RIFF) container support for the multimodal video path:
  * a spec-correct writer for MJPG-in-AVI and a tolerant demuxer that walks
  * the RIFF chunk tree and yields the video-stream frame payloads.
  *
  * This closes the "non-MJPEG container" seam: raw concatenated-JPEG
  * payloads take the SOI-split path, AVI payloads are demuxed by chunk
  * structure (the container actually used for MJPEG in the wild), and
  * anything else falls back to the stub chunking. The demuxer is
  * deliberately structural — it follows `RIFF('AVI ')` → `LIST('movi')` →
  * `##dc`/`##db` chunks (including nested `LIST('rec ')` groups and the
  * mandatory even-byte chunk padding) and ignores everything it does not
  * need (headers, codec metadata, `idx1`), which is what makes it robust to
  * the many AVI dialect variations.
  *
  * Layout notes (all sizes little-endian): a chunk is `fourcc, u32 size,
  * data, [pad to even]`; a LIST is `'LIST', u32 size, fourcc listType,
  * children` where size covers listType + children.
  */
object AviMjpeg {

  /** True if the buffer is a RIFF AVI file (`RIFF....AVI `). */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Is `bytes[off..off+4)` a video frame chunk id (`##dc` compressed /
    * `##db` uncompressed, any stream number)?
    */
  private def isVideoChunk(b: Array[Byte], off: Int): Boolean = {
    def digit(c: Byte) = c >= '0' && c <= '9'
    digit(b(off)) && digit(b(off + 1)) &&
      b(off + 2) == 'd' && (b(off + 3) == 'c' || b(off + 3) == 'b')
  }

  /** Demux the video frame payloads out of an AVI buffer, in file order.
    * Tolerant: a malformed/truncated tail ends the iteration with the
    * frames parsed so far rather than throwing — a 100 TB media crawl WILL
    * contain truncated files, and "decode what's there" is the useful
    * behavior for feature extraction.
    */
  def demuxFrames(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    if (!isAvi(bytes)) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // The walk cursor is a Long (RIFF sizes are u32) but indexing is Int.
    // Safe because a JVM byte[] is bounded by Int.MaxValue — clamping
    // riffEnd to bytes.length keeps every toInt below that bound; the
    // dataEnd > end check rejects any u32 size that would overshoot.
    val riffEnd = math.min(bytes.length.toLong, 8L + (leInt(bytes, 4) & 0xffffffffL))

    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val off = p.toInt
        val size = leInt(bytes, off + 4) & 0xffffffffL
        val dataStart = p + 8
        val dataEnd = dataStart + size
        if (dataEnd > end) return // truncated chunk: keep what we have
        val isList = bytes(off) == 'L' && bytes(off + 1) == 'I' &&
          bytes(off + 2) == 'S' && bytes(off + 3) == 'T'
        if (isList && size >= 4) {
          val lt = new String(bytes, off + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
          // descend into movi (frames live there) and rec groups; every
          // other list (hdrl, odml, INFO...) holds nothing we need
          if (lt == "movi" || (inMovi && lt == "rec "))
            walk(dataStart + 4, dataEnd, inMovi = true)
        } else if (inMovi && isVideoChunk(bytes, off)) {
          out += java.util.Arrays.copyOfRange(bytes, dataStart.toInt, dataEnd.toInt)
        }
        p = dataEnd + (size & 1L) // chunks pad to even byte boundaries
      }
    }

    walk(12L, riffEnd, inMovi = false)
    out.iterator
  }

  /** Write a minimal spec-correct MJPG AVI: RIFF(AVI ) with an hdrl
    * (avih + one vids/MJPG strl), the movi frame list, and an idx1 index.
    * Every structure a standard player/demuxer expects is present.
    */
  def writeAvi(
      frames: IndexedSeq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(fourcc(id)); b.write(le(data.length)); b.write(data)
      if ((data.length & 1) == 1) b.write(0) // even padding
      b.toByteArray
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(fourcc("LIST")); b.write(le(children.length + 4))
      b.write(fourcc(listType)); b.write(children)
      b.toByteArray
    }
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = {
      val b = new ByteArrayOutputStream()
      b.write(le(1000000 / fps)) // dwMicroSecPerFrame
      b.write(le(maxFrame * fps)) // dwMaxBytesPerSec
      b.write(le(0)) // dwPaddingGranularity
      b.write(le(0x10)) // dwFlags: AVIF_HASINDEX
      b.write(le(frames.length)) // dwTotalFrames
      b.write(le(0)); b.write(le(1)) // dwInitialFrames, dwStreams
      b.write(le(maxFrame)) // dwSuggestedBufferSize
      b.write(le(width)); b.write(le(height))
      (0 until 4).foreach(_ => b.write(le(0))) // dwReserved
      b.toByteArray
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      b.write(le(0)); b.write(le16(0)); b.write(le16(0)) // flags, prio, lang
      b.write(le(0)) // initial frames
      b.write(le(1)); b.write(le(fps)) // scale, rate -> fps frames/sec
      b.write(le(0)); b.write(le(frames.length)) // start, length
      b.write(le(maxFrame)) // suggested buffer
      b.write(le(-1)); b.write(le(0)) // quality, sampleSize
      b.write(le16(0)); b.write(le16(0)) // rcFrame
      b.write(le16(width)); b.write(le16(height))
      b.toByteArray
    }
    val strf = {
      val b = new ByteArrayOutputStream()
      b.write(le(40)) // biSize
      b.write(le(width)); b.write(le(height))
      b.write(le16(1)); b.write(le16(24)) // planes, bitcount
      b.write(fourcc("MJPG")) // biCompression
      b.write(le(width * height * 3)) // biSizeImage
      b.write(le(0)); b.write(le(0)); b.write(le(0)); b.write(le(0))
      b.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChildren = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    var moviOff = 4 // offsets in idx1 count from the movi listType fourcc
    frames.foreach { f =>
      val c = chunk("00dc", f)
      moviChildren.write(c)
      idx.write(fourcc("00dc")); idx.write(le(0x10)) // AVIIF_KEYFRAME
      idx.write(le(moviOff)); idx.write(le(f.length))
      moviOff += c.length
    }
    val movi = list("movi", moviChildren.toByteArray)
    val body = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le(body.length + 4))
    out.write(fourcc("AVI ")); out.write(body)
    out.toByteArray
  }
}
