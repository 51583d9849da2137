package graft.operators

/** Minimal real FLAC support for the multimodal audio path: a spec-correct
  * (RFC 9639) encoder restricted to VERBATIM subframes — FLAC's stored,
  * uncompressed representation — and a structural decoder for CONSTANT and
  * VERBATIM subframes with every integrity check the format defines (frame
  * header CRC-8, frame CRC-16, STREAMINFO MD5 over the decoded PCM).
  *
  * This closes the "compressed-audio container" seam the same way AviMjpeg/
  * IsoBmff/Matroska closed the video one: the bytes are genuine FLAC (any
  * external FLAC decoder plays them), the decoder is a genuine bit-level
  * FLAC frame walk, and the one liberty taken — emitting only verbatim
  * subframes — is a choice the spec explicitly allows any encoder to make.
  * Prediction-based subframe types (FIXED/LPC) are rejected loudly, not
  * mis-decoded.
  *
  * Layout notes: FLAC is big-endian and MSB-first at the bit level.
  * Stream = "fLaC", metadata blocks (1-bit last flag, 7-bit type, u24
  * length), then frames. Frame = byte-aligned header (14-bit sync
  * 0b11111111111110, reserved, blocking strategy, 4-bit block-size code,
  * 4-bit sample-rate code, 4-bit channel assignment, 3-bit bit-depth code,
  * reserved, UTF-8-style coded frame number, optional block-size/rate
  * fields, CRC-8) + one subframe per channel (bit-packed) + zero padding to
  * byte alignment + CRC-16.
  */
object FlacCodec {

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  // ---- bit-level input (MSB first, as FLAC packs; the encoder emits only
  // byte-aligned shapes and writes bytes directly) ----

  private final class BitReader(bytes: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0 // 0..7, next bit (MSB-first) within bytes(bytePos)
    def atByteBoundary: Boolean = bitPos == 0
    def remainingBytes: Int = bytes.length - bytePos
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        require(bytePos < bytes.length, "flac: truncated stream")
        v = (v << 1) | ((bytes(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  // ---- the format's three integrity checks ----

  // table-driven CRCs: the frame CRC-16 runs over EVERY byte on both the
  // encode and decode path, so the bitwise form was the codec's hottest loop
  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var crc = i
    var k = 0
    while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; k += 1 }
    crc
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var crc = i << 8
    var k = 0
    while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; k += 1 }
    crc
  }

  /** CRC-8, polynomial 0x07, init 0 (frame header). */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) { crc = crc8Table((crc ^ b(i)) & 0xff); i += 1 }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 (whole frame). */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) { crc = ((crc << 8) ^ crc16Table(((crc >>> 8) ^ (b(i) & 0xff)) & 0xff)) & 0xffff; i += 1 }
    crc
  }

  /** The UTF-8-style variable-length coding FLAC uses for frame numbers. */
  private def encodeFrameNumber(v: Long): Array[Byte] = {
    require(v >= 0, s"flac: negative frame number $v")
    if (v < 0x80) return Array(v.toByte)
    // n continuation bytes; leading byte has n+1 high one-bits
    var n = 1
    while (n < 6 && v >= (1L << (6 - n + 6 * n))) n += 1
    val out = new Array[Byte](n + 1)
    out(0) = (((0xfe << (6 - n)) & 0xff) | (v >>> (6 * n)).toInt).toByte
    var i = 1
    while (i <= n) { out(i) = (0x80 | ((v >>> (6 * (n - i))) & 0x3f)).toInt.toByte; i += 1 }
    out
  }

  private def readFrameNumber(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var n = 0
    var mask = 0x40
    while ((first & mask) != 0 && n < 7) { n += 1; mask >>= 1 }
    require(n >= 1 && n <= 6, s"flac: bad frame-number lead byte $first")
    var v = (first & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val c = r.readBits(8).toInt
      require((c & 0xc0) == 0x80, s"flac: bad frame-number continuation $c")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  // ---- encode ----

  /** STREAMINFO (with metadata-block header, last-block flag set) + the
    * encoded frames, separately — the OGG-FLAC mapping ships them in
    * different packets. `pcmLE` is interleaved signed 16-bit little-endian.
    */
  def encodeParts(pcmLE: Array[Byte], sampleRate: Int, channels: Int,
      blockSize: Int = 1024): (Array[Byte], Seq[Array[Byte]]) = {
    require(channels >= 1 && channels <= 8, s"flac: channels $channels not in [1,8]")
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"flac: sample rate $sampleRate")
    require(blockSize >= 16 && blockSize <= 65535, s"flac: block size $blockSize")
    require(pcmLE.length % (2 * channels) == 0,
      s"flac: ${pcmLE.length} PCM bytes not a whole number of $channels-channel frames")
    val totalFrames = pcmLE.length / (2 * channels)

    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var start = 0
    var frameIdx = 0L
    while (start < totalFrames) {
      val bs = math.min(blockSize, totalFrames - start)
      frames += encodeFrame(pcmLE, start, bs, channels, frameIdx)
      start += bs
      frameIdx += 1
    }

    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcmLE)
    val si = new Array[Byte](4 + 34)
    si(0) = 0x80.toByte // last-metadata-block, type 0 = STREAMINFO
    si(3) = 34
    // min/max block size describe the BLOCKING (the last, possibly short,
    // block is excluded by spec), so both are the nominal block size
    putU16(si, 4, blockSize)
    putU16(si, 6, blockSize)
    // min/max frame size: 0 = unknown (spec-allowed)
    // sampleRate(20) | channels-1(3) | bps-1(5) | totalSamples(36), BE
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      (15L << 36) | totalFrames.toLong
    var i = 0
    while (i < 8) { si(14 + i) = (packed >>> (56 - 8 * i)).toByte; i += 1 }
    System.arraycopy(md5, 0, si, 22, 16)
    (si, frames.toSeq)
  }

  /** A complete FLAC stream: marker + STREAMINFO + frames. */
  def writeFlac(pcmLE: Array[Byte], sampleRate: Int, channels: Int,
      blockSize: Int = 1024): Array[Byte] = {
    val (si, frames) = encodeParts(pcmLE, sampleRate, channels, blockSize)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(si)
    frames.foreach(out.write)
    out.toByteArray
  }

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 8).toByte; b(off + 1) = v.toByte
  }

  private def encodeFrame(pcmLE: Array[Byte], startFrame: Int, bs: Int,
      channels: Int, frameIdx: Long): Array[Byte] = {
    // header: fixed 4 bytes + frame number + explicit u16 (blockSize - 1)
    val num = encodeFrameNumber(frameIdx)
    val hbLen = 6 + num.length
    // everything this encoder emits is byte-aligned (8-bit subframe
    // headers, 16-bit verbatim samples), so the frame is assembled
    // directly as bytes — ~10x the throughput of a per-bit writer
    val out = new Array[Byte](hbLen + 1 + channels * (1 + bs * 2) + 2)
    out(0) = 0xff.toByte; out(1) = 0xf8.toByte // sync, reserved 0, fixed blocking
    out(2) = 0x70 // block size: uncommon-u16 code; rate: from STREAMINFO
    out(3) = (((channels - 1) << 4) | (0x04 << 1)).toByte // independent; 16-bit; reserved
    System.arraycopy(num, 0, out, 4, num.length)
    out(4 + num.length) = (((bs - 1) >>> 8) & 0xff).toByte
    out(5 + num.length) = ((bs - 1) & 0xff).toByte
    out(hbLen) = crc8(out, 0, hbLen).toByte
    var o = hbLen + 1
    var c = 0
    while (c < channels) {
      // subframe header byte = pad(1)=0 | type(6)=000001 VERBATIM | wasted(1)=0
      out(o) = 0x02; o += 1
      var f = 0
      var in = startFrame * channels * 2 + c * 2
      while (f < bs) {
        out(o) = pcmLE(in + 1) // LE in-memory -> BE on the wire
        out(o + 1) = pcmLE(in)
        o += 2
        in += channels * 2
        f += 1
      }
      c += 1
    }
    putU16(out, o, crc16(out, 0, o))
    out
  }

  // ---- decode ----

  case class FlacAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalFrames: Long, pcmLE: Array[Byte])

  private val BlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768) // -8/-16: explicit field

  /** Structural decode of a FLAC stream restricted to CONSTANT/VERBATIM
    * subframes, verifying CRC-8, CRC-16, and the STREAMINFO MD5. Strict:
    * corrupt input dies in a require, never returns silently-wrong PCM —
    * the audio path is a feature-extraction input, not a best-effort
    * playback surface.
    */
  def decodeFlac(bytes: Array[Byte]): FlacAudio = {
    require(isFlac(bytes), "flac: missing fLaC marker")
    var p = 4
    // metadata blocks: need STREAMINFO, skip the rest
    var sampleRate = -1; var channels = -1; var bps = -1
    var totalFrames = -1L
    var md5: Array[Byte] = null
    var last = false
    while (!last) {
      require(p + 4 <= bytes.length, "flac: truncated metadata header")
      val h = bytes(p) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      require(p + 4 + len <= bytes.length, "flac: truncated metadata block")
      if (btype == 0) {
        require(len == 34, s"flac: STREAMINFO length $len != 34")
        val o = p + 4
        var packed = 0L
        var i = 0
        while (i < 8) { packed = (packed << 8) | (bytes(o + 10 + i) & 0xffL); i += 1 }
        sampleRate = (packed >>> 44).toInt
        channels = ((packed >>> 41) & 0x7).toInt + 1
        bps = ((packed >>> 36) & 0x1f).toInt + 1
        totalFrames = packed & ((1L << 36) - 1)
        md5 = java.util.Arrays.copyOfRange(bytes, o + 18, o + 34)
      }
      p += 4 + len
    }
    require(sampleRate > 0, "flac: no STREAMINFO block")
    require(bps == 16, s"flac: only 16-bit supported, got $bps")

    val pcm = new java.io.ByteArrayOutputStream()
    val r = new BitReader(bytes)
    r.bytePos = p
    var expectFrame = 0L
    while (r.remainingBytes >= 2) {
      val frameStart = r.bytePos
      val sync = r.readBits(14)
      require(sync == 0x3ffe, f"flac: bad frame sync $sync%x at byte $frameStart")
      require(r.readBits(1) == 0, "flac: reserved bit set")
      val variableBlocking = r.readBits(1) == 1
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanAssign = r.readBits(4).toInt
      val bpsCode = r.readBits(3).toInt
      require(r.readBits(1) == 0, "flac: reserved bit set")
      require(chanAssign < 8, s"flac: stereo-decorrelation assignment $chanAssign unsupported")
      require(chanAssign + 1 == channels, s"flac: frame channels ${chanAssign + 1} != $channels")
      require(bpsCode == 0 || bpsCode == 4, s"flac: frame bit depth code $bpsCode != 16-bit")
      val num = readFrameNumber(r)
      if (!variableBlocking)
        require(num == expectFrame, s"flac: frame number $num, expected $expectFrame")
      val bs = bsCode match {
        case 0 => throw new IllegalArgumentException("flac: reserved block size code 0")
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => BlockSizes(c)
      }
      srCode match { // only consume the optional field; STREAMINFO is authoritative
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("flac: invalid sample rate code 15")
        case _ => ()
      }
      val headerEnd = r.bytePos
      require(r.atByteBoundary, "flac: frame header not byte-aligned")
      val wantCrc8 = r.readBits(8).toInt
      require(wantCrc8 == crc8(bytes, frameStart, headerEnd),
        s"flac: frame header CRC-8 mismatch at byte $frameStart")

      val chans = Array.ofDim[Short](channels, bs)
      var c = 0
      while (c < channels) {
        require(r.readBits(1) == 0, "flac: subframe pad bit set")
        val stype = r.readBits(6).toInt
        var wasted = 0
        if (r.readBits(1) == 1) { wasted = 1; while (r.readBits(1) == 0) wasted += 1 }
        val width = 16 - wasted
        stype match {
          case 0 => // CONSTANT
            val v = signExtend(r.readBits(width), width) << wasted
            java.util.Arrays.fill(chans(c), v.toShort)
          case 1 => // VERBATIM
            if (wasted == 0 && r.atByteBoundary) {
              // the common byte-aligned 16-bit shape: bulk byte reads,
              // ~10x the per-bit loop (what this encoder always produces)
              var f = 0
              var o = r.bytePos
              require(o + bs * 2 <= bytes.length, "flac: truncated stream")
              while (f < bs) {
                chans(c)(f) = (((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)).toShort
                o += 2
                f += 1
              }
              r.bytePos = o
            } else {
              var f = 0
              while (f < bs) {
                chans(c)(f) = (signExtend(r.readBits(width), width) << wasted).toShort
                f += 1
              }
            }
          case t => throw new IllegalArgumentException(
            s"flac: subframe type $t (FIXED/LPC) not supported by this decoder")
        }
        c += 1
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      val wantCrc16 = r.readBits(16).toInt
      require(wantCrc16 == crc16(bytes, frameStart, bodyEnd),
        s"flac: frame CRC-16 mismatch at byte $frameStart")
      val fb = new Array[Byte](bs * channels * 2)
      var f = 0
      var o = 0
      while (f < bs) {
        var cc = 0
        while (cc < channels) {
          val s = chans(cc)(f)
          fb(o) = (s & 0xff).toByte; fb(o + 1) = ((s >> 8) & 0xff).toByte
          o += 2
          cc += 1
        }
        f += 1
      }
      pcm.write(fb)
      expectFrame += 1
    }
    require(r.remainingBytes == 0, s"flac: ${r.remainingBytes} trailing bytes after last frame")
    val pcmBytes = pcm.toByteArray
    if (totalFrames > 0)
      require(pcmBytes.length.toLong == totalFrames * channels * 2,
        s"flac: decoded ${pcmBytes.length} PCM bytes, STREAMINFO promised ${totalFrames * channels * 2}")
    if (md5 != null && md5.exists(_ != 0)) {
      val got = java.security.MessageDigest.getInstance("MD5").digest(pcmBytes)
      require(java.util.Arrays.equals(got, md5), "flac: STREAMINFO MD5 mismatch on decoded PCM")
    }
    FlacAudio(sampleRate, channels, bps, totalFrames, pcmBytes)
  }

  private def signExtend(v: Long, width: Int): Int =
    ((v << (64 - width)) >> (64 - width)).toInt
}
