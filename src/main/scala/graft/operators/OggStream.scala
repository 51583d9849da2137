package graft.operators

/** Minimal real OGG (RFC 3533) container support for the multimodal audio
  * path: a spec-correct page writer and a structural demuxer that walks
  * pages, verifies every page CRC, and reassembles packets from the lacing
  * values — plus the xiph OGG-FLAC mapping (first packet `0x7F "FLAC"` +
  * version + header count + the native FLAC STREAMINFO, then one packet per
  * FLAC frame), so [[FlacCodec]] decodes the payload exactly as it would a
  * native .flac stream.
  *
  * Layout notes (header fields little-endian): page = "OggS", u8 version 0,
  * u8 flags (0x01 continuation / 0x02 bos / 0x04 eos), u64 granule, u32
  * serial, u32 page sequence, u32 CRC (computed with the field zeroed,
  * polynomial 0x04C11DB7, init 0, no reflection, no final xor), u8 segment
  * count, lacing values, payload. A packet is laced as 255-valued segments
  * plus a final <255 segment (a 0 segment if its length is a multiple of
  * 255); a packet whose lacing does not end on a page continues on the next
  * page with the continuation flag set.
  */
object OggStream {

  def isOgg(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' &&
      bytes(2) == 'g' && bytes(3) == 'S'

  // ---- page CRC (table-driven, the OGG polynomial) ----

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) { r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1; k += 1 }
      t(i) = r
      i += 1
    }
    t
  }

  def crc32(b: Array[Byte], from: Int, until: Int): Int = crc32Acc(0, b, from, until)

  /** Incremental form: thread the accumulator across ranges — lets the
    * demuxer checksum a page as header-before-CRC + four zeros + rest
    * without copying the page.
    */
  private def crc32Acc(crc0: Int, b: Array[Byte], from: Int, until: Int): Int = {
    var crc = crc0
    var i = from
    while (i < until) { crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff); i += 1 }
    crc
  }
  private val fourZeros = new Array[Byte](4)

  // ---- mux ----

  /** Write `packets` as a single logical stream: bos flag on the first
    * page, eos on the last, oversized packets split across continuation
    * pages, ≤255 segments per page. Every packet STARTS a fresh page —
    * spec-legal (packets may share pages but need not), and it satisfies
    * the OGG-FLAC mapping's rule that the identification packet sits alone
    * on the first page. `granules(i)` stamps the page on which packet i
    * COMPLETES (RFC 3533 granule semantics); defaults to the packet index.
    */
  def writePages(packets: Seq[Array[Byte]], serial: Int,
      granules: Seq[Long] = Nil): Array[Byte] = {
    require(packets.nonEmpty, "ogg: no packets")
    val gran = if (granules.nonEmpty) granules else packets.indices.map(_.toLong)
    require(gran.length == packets.length, "ogg: granules/packets length mismatch")
    val out = new java.io.ByteArrayOutputStream()
    var pageSeq = 0
    packets.zipWithIndex.foreach { case (p, pi) =>
      // lacing for this packet: full 255s + a final <255 (0 if len % 255 == 0)
      val lacing = Seq.fill(p.length / 255)(255) :+ (p.length % 255)
      var consumed = 0
      lacing.grouped(255).zipWithIndex.foreach { case (segs, gi) =>
        val segCount = segs.length
        val payloadLen = segs.sum
        val completes = gi == (lacing.length - 1) / 255
        var flags = 0
        if (gi > 0) flags |= 0x01 // continuation of this packet
        if (pageSeq == 0) flags |= 0x02
        if (pi == packets.length - 1 && completes) flags |= 0x04
        // -1 when no packet completes on this page, per spec
        val granule = if (completes) gran(pi) else -1L
        val head = new Array[Byte](27 + segCount)
        head(0) = 'O'; head(1) = 'g'; head(2) = 'g'; head(3) = 'S'
        head(4) = 0; head(5) = flags.toByte
        var i = 0
        while (i < 8) { head(6 + i) = (granule >>> (8 * i)).toByte; i += 1 }
        putLeInt(head, 14, serial)
        putLeInt(head, 18, pageSeq)
        // CRC at 22..25 stays zero for the computation
        head(26) = segCount.toByte
        i = 0
        while (i < segCount) { head(27 + i) = segs(i).toByte; i += 1 }
        val full = new Array[Byte](head.length + payloadLen)
        System.arraycopy(head, 0, full, 0, head.length)
        System.arraycopy(p, consumed, full, head.length, payloadLen)
        consumed += payloadLen
        putLeInt(full, 22, crc32(full, 0, full.length))
        out.write(full)
        pageSeq += 1
      }
    }
    out.toByteArray
  }

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ---- demux ----

  /** Reassemble the packet sequence from an OGG buffer, verifying the
    * capture pattern and CRC of every page. Strict like [[FlacCodec]]: a
    * corrupt page dies in a require rather than yielding scrambled audio.
    */
  def readPackets(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(isOgg(bytes), "ogg: missing OggS capture pattern")
    val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pending = new java.io.ByteArrayOutputStream()
    var pendingOpen = false
    // losing or duplicating a WHOLE page of complete packets passes every
    // per-page check (each page's own CRC is fine) — only the sequence
    // counter and serial make the page STREAM contiguous
    var expectSeq = -1L
    var serial = 0
    var p = 0
    while (p < bytes.length) {
      require(p + 27 <= bytes.length, "ogg: truncated page header")
      require(bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' && bytes(p + 3) == 'S',
        s"ogg: bad capture pattern at byte $p")
      require(bytes(p + 4) == 0, s"ogg: unsupported stream structure version ${bytes(p + 4)}")
      val flags = bytes(p + 5) & 0xff
      val segCount = bytes(p + 26) & 0xff
      require(p + 27 + segCount <= bytes.length, "ogg: truncated segment table")
      var payloadLen = 0
      var i = 0
      while (i < segCount) { payloadLen += bytes(p + 27 + i) & 0xff; i += 1 }
      val pageEnd = p + 27 + segCount + payloadLen
      require(pageEnd <= bytes.length, "ogg: truncated page payload")
      // CRC check: recompute with the CRC field zeroed — incrementally
      // (header-before-CRC + four zeros + rest), no page copy
      val want = leInt(bytes, p + 22)
      val got = crc32Acc(crc32Acc(crc32Acc(0, bytes, p, p + 22),
        fourZeros, 0, 4), bytes, p + 26, pageEnd)
      require(got == want, s"ogg: page CRC mismatch at byte $p")
      val pageSerial = leInt(bytes, p + 14)
      val pageSeq = (leInt(bytes, p + 18) & 0xffffffffL)
      if (expectSeq < 0) {
        serial = pageSerial
        // a beginning-of-stream page is page 0 by spec; a headless capture
        // (no bos flag) may start anywhere but must stay contiguous
        if ((flags & 0x02) != 0)
          require(pageSeq == 0, s"ogg: bos page has sequence $pageSeq, expected 0")
      } else {
        require(pageSerial == serial,
          s"ogg: serial $pageSerial at byte $p, stream started with $serial")
        require(pageSeq == expectSeq,
          s"ogg: page sequence $pageSeq at byte $p, expected $expectSeq — page lost or duplicated")
      }
      expectSeq = pageSeq + 1
      require(((flags & 0x01) != 0) == pendingOpen,
        s"ogg: continuation flag disagrees with packet state at byte $p")
      var off = p + 27 + segCount
      i = 0
      while (i < segCount) {
        val s = bytes(p + 27 + i) & 0xff
        pending.write(bytes, off, s)
        pendingOpen = true
        off += s
        if (s < 255) { // packet completes
          packets += pending.toByteArray
          pending = new java.io.ByteArrayOutputStream()
          pendingOpen = false
        }
        i += 1
      }
      p = pageEnd
    }
    require(!pendingOpen, "ogg: stream ends mid-packet")
    packets.toSeq
  }

  // ---- the OGG-FLAC mapping ----

  /** True if the buffer is an OGG stream whose first packet carries the
    * xiph FLAC mapping.
    */
  def isOggFlac(bytes: Array[Byte]): Boolean = {
    if (!isOgg(bytes) || bytes.length < 28) return false
    val segCount = bytes(26) & 0xff
    val off = 27 + segCount // first payload byte, after the segment table
    bytes.length >= off + 5 && (bytes(off) & 0xff) == 0x7f &&
      bytes(off + 1) == 'F' && bytes(off + 2) == 'L' &&
      bytes(off + 3) == 'A' && bytes(off + 4) == 'C'
  }

  /** Identify the codec an OGG stream carries from its first packet's
    * magic (every xiph mapping puts an identification packet alone on page
    * 0): "flac", "vorbis", "opus", "theora", "speex", or "unknown". Used to
    * reject undecodable OGG with the codec NAMED — a crawl triage wants
    * "ogg/vorbis: no decoder" in its quarantine reasons, not a generic
    * probe failure.
    */
  def identifyCodec(bytes: Array[Byte]): String = {
    if (!isOgg(bytes) || bytes.length < 28) return "unknown"
    val segCount = bytes(26) & 0xff
    val off = 27 + segCount
    def is(sig: String, skip: Int): Boolean =
      bytes.length >= off + skip + sig.length &&
        sig.indices.forall(i => bytes(off + skip + i) == sig.charAt(i).toByte)
    if (bytes.length > off && (bytes(off) & 0xff) == 0x7f && is("FLAC", 1)) "flac"
    else if (bytes.length > off && (bytes(off) & 0xff) == 0x01 && is("vorbis", 1)) "vorbis"
    else if (is("OpusHead", 0)) "opus"
    else if (bytes.length > off && (bytes(off) & 0xff) == 0x80 && is("theora", 1)) "theora"
    else if (is("Speex   ", 0)) "speex"
    else "unknown"
  }

  /** Vorbis identification header fields (Vorbis I spec §4.2.2) — the
    * geometry a triage probe reports for a stream this engine cannot
    * decode. Blocksizes are the DECODED exponents (64..8192 window sizes).
    */
  case class VorbisId(channels: Int, sampleRate: Int, bitrateNominal: Int,
      blocksize0: Int, blocksize1: Int)

  /** Parse the Vorbis identification header out of an OGG buffer's first
    * packet. Structural and strict: wrong magic, version != 0, zero
    * geometry, inverted blocksizes, or a clear framing bit die in a
    * require — the probe wants "valid vorbis, rate X" vs "damaged",
    * decode stays a loud reject either way.
    */
  def parseVorbisId(bytes: Array[Byte]): VorbisId = {
    val p0 = readPackets(bytes).headOption.getOrElse(
      throw new IllegalArgumentException("ogg-vorbis: no packets"))
    require(p0.length >= 30 && (p0(0) & 0xff) == 0x01 &&
        "vorbis".indices.forall(i => p0(1 + i) == "vorbis".charAt(i).toByte),
      "ogg-vorbis: first packet is not a vorbis identification header")
    require(leInt(p0, 7) == 0, s"ogg-vorbis: unsupported vorbis_version ${leInt(p0, 7)}")
    val channels = p0(11) & 0xff
    val rate = leInt(p0, 12)
    require(channels >= 1 && rate >= 1,
      s"ogg-vorbis: invalid geometry ${rate}Hz/${channels}ch")
    val bs0 = 1 << (p0(28) & 0x0f)
    val bs1 = 1 << ((p0(28) & 0xf0) >> 4)
    require(bs0 >= 64 && bs1 <= 8192 && bs0 <= bs1,
      s"ogg-vorbis: invalid blocksizes $bs0/$bs1")
    require((p0(29) & 1) == 1, "ogg-vorbis: framing bit clear")
    VorbisId(channels, rate, leInt(p0, 20), bs0, bs1)
  }

  /** Opus identification header fields (RFC 7845 §5.1). `inputSampleRate`
    * is informational per the RFC (opus always decodes at 48 kHz) — the
    * probe reports it as-is.
    */
  case class OpusHead(channels: Int, preSkip: Int, inputSampleRate: Int,
      mappingFamily: Int)

  /** Parse the OpusHead identification header out of an OGG buffer's
    * first packet — same strictness contract as [[parseVorbisId]].
    */
  def parseOpusHead(bytes: Array[Byte]): OpusHead = {
    val p0 = readPackets(bytes).headOption.getOrElse(
      throw new IllegalArgumentException("ogg-opus: no packets"))
    require(p0.length >= 19 &&
        "OpusHead".indices.forall(i => p0(i) == "OpusHead".charAt(i).toByte),
      "ogg-opus: first packet is not an OpusHead header")
    require((p0(8) & 0xff) >> 4 == 0, s"ogg-opus: unsupported version ${p0(8)}")
    val channels = p0(9) & 0xff
    require(channels >= 1, "ogg-opus: zero channels")
    OpusHead(channels, (p0(10) & 0xff) | ((p0(11) & 0xff) << 8),
      leInt(p0, 12), p0(18) & 0xff)
  }

  /** Encode PCM as FLAC-in-OGG per the xiph mapping. */
  def writeOggFlac(pcmLE: Array[Byte], sampleRate: Int, channels: Int,
      blockSize: Int = 1024, serial: Int = 0x464c4143): Array[Byte] = {
    val (streamInfo, frames) = FlacCodec.encodeParts(pcmLE, sampleRate, channels, blockSize)
    val first = new java.io.ByteArrayOutputStream()
    first.write(0x7f)
    first.write('F'); first.write('L'); first.write('A'); first.write('C')
    first.write(1); first.write(0) // mapping version 1.0
    first.write(0); first.write(0) // u16 BE trailing header packets: none
    first.write('f'); first.write('L'); first.write('a'); first.write('C')
    first.write(streamInfo)
    val packets = first.toByteArray +: frames
    // granule = cumulative sample count at each audio packet, 0 for headers
    var acc = 0L
    val granules = 0L +: frames.map { _ =>
      acc += blockSize; math.min(acc, pcmLE.length.toLong / (2 * channels))
    }
    writePages(packets, serial, granules)
  }

  /** Extract the native FLAC stream back out of an OGG-FLAC buffer (the
    * inverse of [[writeOggFlac]]): packet 0 contributes "fLaC" + the
    * metadata it carries, every later packet is a frame, and the result
    * feeds [[FlacCodec.decodeFlac]] unchanged.
    */
  def extractFlac(bytes: Array[Byte]): Array[Byte] = {
    val packets = readPackets(bytes)
    require(packets.nonEmpty, "ogg-flac: no packets")
    val p0 = packets.head
    require(p0.length >= 13 && (p0(0) & 0xff) == 0x7f &&
        p0(1) == 'F' && p0(2) == 'L' && p0(3) == 'A' && p0(4) == 'C',
      "ogg-flac: first packet lacks the FLAC mapping signature")
    require((p0(5) & 0xff) == 1, s"ogg-flac: unsupported mapping version ${p0(5)}")
    require(p0(9) == 'f' && p0(10) == 'L' && p0(11) == 'a' && p0(12) == 'C',
      "ogg-flac: first packet lacks the native fLaC marker")
    val out = new java.io.ByteArrayOutputStream()
    out.write(p0, 9, p0.length - 9)
    // trailing metadata packets (raw metadata blocks) and frame packets
    // concatenate back into exactly the native stream layout
    packets.drop(1).foreach(pk => out.write(pk, 0, pk.length))
    out.toByteArray
  }
}
