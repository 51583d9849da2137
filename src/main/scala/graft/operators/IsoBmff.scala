package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal real ISO BMFF (MP4) container support for the multimodal video
  * path: a spec-correct writer for JPEG-samples-in-MP4 and a tolerant
  * demuxer that walks the box tree and yields the video-track sample
  * payloads.
  *
  * This closes the last stubbed codec seam: raw concatenated-JPEG payloads
  * take the SOI-split path, AVI payloads are demuxed via [[AviMjpeg]], MP4
  * payloads (what a real crawl mostly contains) are demuxed here, and only
  * genuinely unknown containers fall back to the stub chunking. Like the
  * AVI demuxer this one is deliberately structural — it follows
  * `moov` → `trak` → `mdia`(`hdlr`='vide') → `minf` → `stbl` and
  * reconstructs sample extents from the three tables that define them
  * (`stsc` sample-to-chunk runs, `stsz` sample sizes, `stco`/`co64` chunk
  * offsets), ignoring everything it does not need (timing, codec config,
  * edit lists) — which is what makes it robust across muxer dialects.
  *
  * Box layout (all integers big-endian): `u32 size, fourcc type, payload`
  * where size covers the header; size==1 means a u64 largesize follows the
  * type; size==0 means the box runs to the end of its container.
  */
object IsoBmff {

  /** True if the buffer starts with an ISO BMFF `ftyp` box — every MP4/MOV
    * family file opens with one.
    */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)

  private def fcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  /** The child boxes of `[start, end)` as (type, payloadStart, payloadEnd).
    * Tolerant: a malformed or truncated box ends the listing with the boxes
    * parsed so far. Indexing stays in Int range because a JVM byte[] is
    * bounded by Int.MaxValue and every offset is clamped to `end`.
    */
  private def boxes(b: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var p = start
    while (p + 8 <= end) {
      val size = beU32(b, p.toInt)
      val tpe = fcc(b, p.toInt + 4)
      var dataStart = p + 8
      val boxEnd =
        if (size == 0L) end // box runs to the end of its container
        else if (size == 1L) {
          if (p + 16 > end) return out.toSeq
          dataStart = p + 16
          p + beU64(b, p.toInt + 8)
        } else p + size
      if (boxEnd < dataStart || boxEnd > end) return out.toSeq // truncated
      out += ((tpe, dataStart, boxEnd))
      p = boxEnd
    }
    out.toSeq
  }

  /** Demux the video-track sample payloads out of an MP4 buffer, in sample
    * order. Tolerant the same way [[AviMjpeg.demuxFrames]] is: a truncated
    * `mdat` yields the samples that are actually present (a 100 TB media
    * crawl WILL contain truncated files and "decode what's there" is the
    * useful behavior); a missing/garbled `moov` yields no samples rather
    * than throwing.
    */
  def demuxFrames(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    if (!isMp4(bytes)) return Iterator.empty
    val fileEnd = bytes.length.toLong
    val top = boxes(bytes, 0L, fileEnd)
    val stblOpt = for {
      (_, moovS, moovE) <- top.find(_._1 == "moov")
      trakBoxes = boxes(bytes, moovS, moovE).filter(_._1 == "trak")
      stbl <- trakBoxes.iterator.map { case (_, tS, tE) =>
        for {
          (_, mdS, mdE) <- boxes(bytes, tS, tE).find(_._1 == "mdia")
          (_, hS, _) <- boxes(bytes, mdS, mdE).find(_._1 == "hdlr")
          // FullBox version/flags u32 + pre_defined u32, then handler_type
          if hS + 12 <= fileEnd && fcc(bytes, hS.toInt + 8) == "vide"
          (_, miS, miE) <- boxes(bytes, mdS, mdE).find(_._1 == "minf")
          s <- boxes(bytes, miS, miE).find(_._1 == "stbl")
        } yield s
      }.collectFirst { case Some(s) => s }
    } yield stbl
    val (_, stblS, stblE) = stblOpt.getOrElse(return Iterator.empty)
    val stbl = boxes(bytes, stblS, stblE)
    def table(t: String): Option[(Long, Long)] =
      stbl.find(_._1 == t).map { case (_, s, e) => (s, e) }

    // stsz: u32 version/flags, u32 fixed sample_size, u32 count[, u32 sizes]
    val sizes: Array[Long] = table("stsz") match {
      case Some((s, e)) if s + 12 <= e =>
        val fixed = beU32(bytes, s.toInt + 4)
        val n = beU32(bytes, s.toInt + 8)
        if (n < 0 || n > Int.MaxValue / 8) return Iterator.empty
        if (fixed != 0L) Array.fill(n.toInt)(fixed)
        else {
          val avail = math.min(n, (e - s - 12) / 4)
          Array.tabulate(avail.toInt)(i => beU32(bytes, (s + 12 + i * 4L).toInt))
        }
      case _ => return Iterator.empty
    }
    // stco (u32) / co64 (u64): u32 version/flags, u32 count, offsets
    val chunkOffsets: Array[Long] = (table("stco"), table("co64")) match {
      case (Some((s, e)), _) if s + 8 <= e =>
        val n = math.min(beU32(bytes, s.toInt + 4), (e - s - 8) / 4)
        Array.tabulate(n.toInt)(i => beU32(bytes, (s + 8 + i * 4L).toInt))
      case (None, Some((s, e))) if s + 8 <= e =>
        val n = math.min(beU32(bytes, s.toInt + 4), (e - s - 8) / 8)
        Array.tabulate(n.toInt)(i => beU64(bytes, (s + 8 + i * 8L).toInt))
      case _ => return Iterator.empty
    }
    // stsc: u32 version/flags, u32 count, (first_chunk, samples_per_chunk,
    // sample_description_index) u32 triples — run-length over chunks
    val stscRuns: Array[(Long, Long)] = table("stsc") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = math.min(beU32(bytes, s.toInt + 4), (e - s - 8) / 12)
        Array.tabulate(n.toInt) { i =>
          val off = (s + 8 + i * 12L).toInt
          (beU32(bytes, off), beU32(bytes, off + 4))
        }
      case _ => return Iterator.empty
    }
    if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty)
      return Iterator.empty

    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var sample = 0
    var run = 0
    while (run < stscRuns.length && sample < sizes.length) {
      val firstChunk = stscRuns(run)._1 - 1 // 1-based in the table
      val perChunk = stscRuns(run)._2
      val lastChunkExcl =
        if (run + 1 < stscRuns.length) stscRuns(run + 1)._1 - 1
        else chunkOffsets.length.toLong
      if (firstChunk < 0 || perChunk <= 0 || lastChunkExcl > chunkOffsets.length)
        return out.iterator // malformed table: keep what we have
      var chunk = firstChunk
      while (chunk < lastChunkExcl && sample < sizes.length) {
        var off = chunkOffsets(chunk.toInt)
        var i = 0L
        while (i < perChunk && sample < sizes.length) {
          val sz = sizes(sample)
          if (off < 0 || sz < 0 || off + sz > fileEnd)
            return out.iterator // truncated mdat: decode what's there
          out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
          off += sz
          sample += 1
          i += 1
        }
        chunk += 1
      }
      run += 1
    }
    out.iterator
  }

  /** Write a minimal spec-correct MP4: `ftyp` + `moov` (mvhd + one video
    * trak with the full tkhd/mdia/minf/stbl chain) + `mdat`. The `moov`
    * comes FIRST ("faststart" layout — what streaming-friendly muxers
    * produce), which also means a truncated file keeps its sample tables
    * and demuxes to a prefix of the frames. Samples are grouped
    * `framesPerChunk` per chunk with a ragged tail so `stsc` carries a real
    * multi-entry run-length, not the degenerate single entry.
    */
  def writeMp4(
      frames: IndexedSeq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25, framesPerChunk: Int = 3): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(framesPerChunk > 0, s"framesPerChunk must be positive, got $framesPerChunk")
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes(US_ASCII)
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val b = new ByteArrayOutputStream(); parts.foreach(b.write); b.toByteArray
    }
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      cat(be(payload.length + 8), fourcc(tpe), payload)
    def fullBox(tpe: String, version: Int, flags: Int, payload: Array[Byte]): Array[Byte] =
      box(tpe, cat(be((version << 24) | flags), payload))

    val unityMatrix = cat(be(0x00010000), be(0), be(0),
      be(0), be(0x00010000), be(0), be(0), be(0), be(0x40000000))
    val ftyp = box("ftyp",
      cat(fourcc("isom"), be(0x200), fourcc("isom"), fourcc("iso2"), fourcc("mp41")))

    val chunks = frames.grouped(framesPerChunk).toIndexedSeq
    // stsc run-length: consecutive chunks with the same samples-per-chunk
    // collapse into one entry (first_chunk is 1-based; sdi always 1)
    val stscEntries = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      chunks.zipWithIndex.foreach { case (c, i) =>
        if (runs.isEmpty || runs.last._2 != c.length) runs += ((i + 1, c.length))
      }
      runs.toSeq
    }
    def moovFor(chunkOffsets: Seq[Int]): Array[Byte] = {
      val stsd = fullBox("stsd", 0, 0, cat(be(1), box("jpeg", cat(
        Array.fill[Byte](6)(0), be16(1), // SampleEntry: reserved, dref index
        be16(0), be16(0), be(0), be(0), be(0), // VisualSampleEntry pre_defined/reserved
        be16(width), be16(height),
        be(0x00480000), be(0x00480000), // 72 dpi horiz/vert
        be(0), be16(1), // reserved, frame_count
        Array.fill[Byte](32)(0), // compressorname (empty pascal string)
        be16(24), be16(0xffff))))) // depth, pre_defined = -1
      val stts = fullBox("stts", 0, 0, cat(be(1), be(frames.length), be(1)))
      val stsc = fullBox("stsc", 0, 0, cat(be(stscEntries.length),
        cat(stscEntries.map { case (fc, n) => cat(be(fc), be(n), be(1)) }: _*)))
      val stsz = fullBox("stsz", 0, 0, cat(be(0), be(frames.length),
        cat(frames.map(f => be(f.length)): _*)))
      val stco = fullBox("stco", 0, 0, cat(be(chunkOffsets.length),
        cat(chunkOffsets.map(be): _*)))
      val stbl = box("stbl", cat(stsd, stts, stsc, stsz, stco))
      val url = fullBox("url ", 0, 1, Array.emptyByteArray) // self-contained
      val dinf = box("dinf", fullBox("dref", 0, 0, cat(be(1), url)))
      val vmhd = fullBox("vmhd", 0, 1, cat(be16(0), be16(0), be16(0), be16(0)))
      val minf = box("minf", cat(vmhd, dinf, stbl))
      val hdlr = fullBox("hdlr", 0, 0, cat(be(0), fourcc("vide"),
        be(0), be(0), be(0), "VideoHandler".getBytes(US_ASCII), Array[Byte](0)))
      val mdhd = fullBox("mdhd", 0, 0, cat(be(0), be(0), be(fps),
        be(frames.length), be16(0x55c4), be16(0))) // language 'und'
      val mdia = box("mdia", cat(mdhd, hdlr, minf))
      val tkhd = fullBox("tkhd", 0, 7, cat(be(0), be(0), be(1), be(0),
        be(frames.length), be(0), be(0), be16(0), be16(0), be16(0), be16(0),
        unityMatrix, be(width << 16), be(height << 16)))
      val trak = box("trak", cat(tkhd, mdia))
      val mvhd = fullBox("mvhd", 0, 0, cat(be(0), be(0), be(fps),
        be(frames.length), be(0x00010000), be16(0x0100), be16(0), be(0), be(0),
        unityMatrix, cat(Seq.fill(6)(be(0)): _*), be(2)))
      box("moov", cat(mvhd, trak))
    }
    // stco holds ABSOLUTE file offsets, which depend on moov's length —
    // but moov's length does not depend on the offset VALUES (u32 fixed
    // width), so build once with placeholders to measure, then rebuild
    val moovLen = moovFor(chunks.map(_ => 0)).length
    val mdatPayloadStart = ftyp.length + moovLen + 8
    val chunkOffsets = chunks.scanLeft(mdatPayloadStart) {
      (off, c) => off + c.map(_.length).sum
    }.init
    val mdat = box("mdat", cat(frames: _*))
    cat(ftyp, moovFor(chunkOffsets), mdat)
  }
}
