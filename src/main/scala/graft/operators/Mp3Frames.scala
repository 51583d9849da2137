package graft.operators

/** Structural MPEG audio (MP3) frame walker — PROBE-grade support, not a
  * decoder. A crawl triage pass needs to answer "what is this file, what
  * geometry, how long" without decoding; MP3 makes that possible from
  * headers alone because every frame carries a self-describing 4-byte
  * header and the frame length is a closed-form function of its fields
  * (ISO/IEC 11172-3 §2.4.1.3 / ISO 13818-3 for the MPEG-2 halved rates —
  * layouts and tables are public and reproduced in every independent MP3
  * header reference).
  *
  * What this gives the engine: [[probe]] walks the whole frame sequence
  * (skipping a leading ID3v2 tag and a trailing ID3v1 block), verifies the
  * stream-level invariants (constant version/layer/rate/channels — bitrate
  * MAY vary per frame, that is what VBR is), and reports geometry +
  * exact PCM duration. Decode stays a loud reject in `decodePcm16`
  * (MEDIA.md) — there is deliberately no MDCT here.
  *
  * Header layout (32 bits, big-endian): 11-bit sync `0x7FF`, 2-bit version
  * (00=MPEG-2.5, 01=reserved, 10=MPEG-2, 11=MPEG-1), 2-bit layer
  * (00=reserved, 01=III, 10=II, 11=I), 1-bit CRC-absent flag, 4-bit
  * bitrate index, 2-bit sample-rate index, 1-bit padding, 1-bit private,
  * 2-bit channel mode (11=mono), 2-bit mode extension, copyright,
  * original, 2-bit emphasis.
  *
  * Frame lengths (bytes, integer division — the truncation IS the spec):
  * Layer I `(12*bitrate/rate + pad) * 4`; Layer II and MPEG-1 Layer III
  * `144*bitrate/rate + pad`; MPEG-2/2.5 Layer III `72*bitrate/rate + pad`.
  * Samples per frame: Layer I 384, Layer II 1152, Layer III 1152 (MPEG-1)
  * or 576 (MPEG-2/2.5).
  *
  * The writer emits Layer III framing (MPEG-1 or MPEG-2) with
  * deterministic filler payloads — VALID headers and frame geometry,
  * non-audio main data. That is exactly the honest fixture for a
  * structural prober: the walk, tables, and duration math are fully
  * exercised; nothing pretends to be decodable audio (and [[probe]] never
  * looks at payload bytes, by construction).
  */
object Mp3Frames {

  /** kbps tables indexed by bitrate-index 1..14 (0 = "free format" and 15
    * are rejected). Rows: MPEG-1 L1/L2/L3, then MPEG-2/2.5 L1/L2+L3.
    */
  private val Br1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val Br1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val Br1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Br2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val Br2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample-rate tables indexed by the 2-bit rate field (3 is invalid). */
  private val Sr1 = Array(44100, 48000, 32000)
  private val Sr2 = Array(22050, 24000, 16000)
  private val Sr25 = Array(11025, 12000, 8000)

  /** One parsed frame header. `version` is "1", "2", or "2.5". */
  case class FrameHeader(
      version: String, layer: Int, crcProtected: Boolean,
      bitrateKbps: Int, sampleRate: Int, padding: Boolean, channels: Int,
      frameLength: Int, samplesPerFrame: Int)

  /** Whole-stream probe result. `pcmFrames` is the exact decoded duration
    * in PCM frames (sum of samples-per-frame); `vbr` iff the per-frame
    * bitrate field is not constant.
    */
  case class Mp3Info(
      version: String, layer: Int, sampleRate: Int, channels: Int,
      frameCount: Int, pcmFrames: Long, avgBitrateKbps: Double, vbr: Boolean,
      id3v2Bytes: Int, id3v1: Boolean)

  /** Parse the 4 header bytes at `off`, or null if they are not a valid
    * frame header (callers use this both to validate and to sync-search).
    */
  def parseHeader(b: Array[Byte], off: Int): FrameHeader = {
    if (off + 4 > b.length) return null
    val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
    val b2 = b(off + 2) & 0xff; val b3 = b(off + 3) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return null
    val versionBits = (b1 >> 3) & 3
    val layerBits = (b1 >> 1) & 3
    if (versionBits == 1 || layerBits == 0) return null // reserved
    val version = versionBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
    val layer = 4 - layerBits // 3->I(1), 2->II(2), 1->III(3)
    val brIndex = (b2 >> 4) & 0xf
    if (brIndex == 0 || brIndex == 15) return null // free-format / invalid
    val srIndex = (b2 >> 2) & 3
    if (srIndex == 3) return null
    if ((b3 & 3) == 2) return null // reserved emphasis
    val mpeg1 = versionBits == 3
    val bitrate = (mpeg1, layer) match {
      case (true, 1) => Br1L1(brIndex)
      case (true, 2) => Br1L2(brIndex)
      case (true, 3) => Br1L3(brIndex)
      case (false, 1) => Br2L1(brIndex)
      case (false, _) => Br2L23(brIndex)
    }
    val sampleRate = versionBits match {
      case 3 => Sr1(srIndex); case 2 => Sr2(srIndex); case _ => Sr25(srIndex)
    }
    val pad = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    val frameLength = layer match {
      case 1 => (12 * bitrate * 1000 / sampleRate + pad) * 4
      case 2 => 144 * bitrate * 1000 / sampleRate + pad
      case 3 => (if (mpeg1) 144 else 72) * bitrate * 1000 / sampleRate + pad
    }
    val samples = layer match {
      case 1 => 384
      case 2 => 1152
      case 3 => if (mpeg1) 1152 else 576
    }
    FrameHeader(version, layer, crcProtected = (b1 & 1) == 0,
      bitrate, sampleRate, pad == 1, channels, frameLength, samples)
  }

  /** Bytes occupied by a leading ID3v2 tag (0 if none): `ID3`, 2 version
    * bytes, flags, 4 SYNCSAFE size bytes (7 bits each, high bit must be 0),
    * plus a 10-byte footer when flag bit 4 is set.
    */
  def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    var size = 0
    var i = 6
    while (i < 10) {
      val x = b(i) & 0xff
      if ((x & 0x80) != 0) return 0 // not syncsafe -> not a v2 tag
      size = (size << 7) | x
      i += 1
    }
    10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
  }

  /** True iff the buffer is MP3-shaped: a valid frame header at the first
    * post-ID3v2 byte. Deliberately strict (no sync-scan): the probe's
    * sniffer must not claim arbitrary binaries that happen to contain
    * 0xFFEx somewhere.
    */
  def isMp3(bytes: Array[Byte]): Boolean = {
    val start = id3v2Length(bytes)
    start < bytes.length && parseHeader(bytes, start) != null
  }

  /** Walk every frame and report stream geometry + exact duration. Strict
    * like the sibling structural parsers: a truncated frame, a mid-stream
    * sync loss, or a frame disagreeing on version/layer/rate/channels dies
    * in a require — triage must distinguish "valid MP3" from "damaged",
    * not paper over the difference.
    */
  def probe(bytes: Array[Byte]): Mp3Info = {
    val id3v2 = id3v2Length(bytes)
    var end = bytes.length
    val id3v1 = end - id3v2 >= 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G'
    if (id3v1) end -= 128
    var p = id3v2
    var first: FrameHeader = null
    var frames = 0
    var pcmFrames = 0L
    var brSum = 0L
    var vbr = false
    while (p < end) {
      val h = parseHeader(bytes, p)
      require(h != null,
        s"mp3: lost frame sync at byte $p (frame ${frames + 1})")
      if (first == null) first = h
      else {
        require(h.version == first.version && h.layer == first.layer,
          s"mp3: frame ${frames + 1} switches to MPEG-${h.version} layer ${h.layer}")
        require(h.sampleRate == first.sampleRate && h.channels == first.channels,
          s"mp3: frame ${frames + 1} geometry ${h.sampleRate}Hz/${h.channels}ch != " +
            s"${first.sampleRate}Hz/${first.channels}ch")
        if (h.bitrateKbps != first.bitrateKbps) vbr = true
      }
      require(p + h.frameLength <= end, s"mp3: truncated final frame at byte $p")
      frames += 1
      pcmFrames += h.samplesPerFrame
      brSum += h.bitrateKbps
      p += h.frameLength
    }
    require(first != null, "mp3: no frames")
    Mp3Info(first.version, first.layer, first.sampleRate, first.channels,
      frames, pcmFrames, brSum.toDouble / frames, vbr, id3v2, id3v1)
  }

  /** Deterministic Layer III framing writer (MPEG-1 or MPEG-2 by sample
    * rate), one frame per `bitratesKbps` entry, CRC-absent, no padding
    * bit; payload bytes from an LCG on (seed, frameIndex) so equal seeds
    * give equal bytes on any JVM. Optionally prepends a minimal ID3v2.3
    * tag of `id3v2Pad` zero bytes — enough structure to exercise the skip.
    */
  def writeMp3(sampleRate: Int, channels: Int, bitratesKbps: Seq[Int],
      seed: Long, id3v2Pad: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 2, s"mp3 writer: channels $channels")
    require(bitratesKbps.nonEmpty, "mp3 writer: no frames")
    val sr1 = Sr1.indexOf(sampleRate); val sr2 = Sr2.indexOf(sampleRate)
    require(sr1 >= 0 || sr2 >= 0,
      s"mp3 writer: rate $sampleRate is not an MPEG-1/2 Layer III rate")
    val mpeg1 = sr1 >= 0
    val srIndex = if (mpeg1) sr1 else sr2
    val brTable = if (mpeg1) Br1L3 else Br2L23
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Pad > 0) {
      val tag = new Array[Byte](10 + id3v2Pad)
      tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'; tag(3) = 3 // v2.3.0
      tag(6) = ((id3v2Pad >> 21) & 0x7f).toByte
      tag(7) = ((id3v2Pad >> 14) & 0x7f).toByte
      tag(8) = ((id3v2Pad >> 7) & 0x7f).toByte
      tag(9) = (id3v2Pad & 0x7f).toByte
      out.write(tag)
    }
    bitratesKbps.zipWithIndex.foreach { case (kbps, f) =>
      val brIndex = brTable.indexOf(kbps)
      require(brIndex >= 1,
        s"mp3 writer: $kbps kbps not in the MPEG-${if (mpeg1) 1 else 2} Layer III table")
      val frameLen = (if (mpeg1) 144 else 72) * kbps * 1000 / sampleRate
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      frame(1) = ((0xe0 | (if (mpeg1) 3 << 3 else 2 << 3) | (1 << 1) | 1)).toByte
      frame(2) = ((brIndex << 4) | (srIndex << 2)).toByte
      frame(3) = (if (channels == 1) 0xc0 else 0x00).toByte
      var x = seed * 0x9e3779b97f4a7c15L + f * 0xbf58476d1ce4e5b9L
      var i = 4
      while (i < frameLen) {
        x = x * 6364136223846793005L + 1442695040888963407L
        frame(i) = (x >>> 56).toByte
        i += 1
      }
      out.write(frame)
    }
    out.toByteArray
  }
}
