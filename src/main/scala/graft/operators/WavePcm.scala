package graft.operators

/** Minimal real RIFF/WAVE support for 16-bit PCM: a canonical-header writer
  * and a structural chunk-walk parser.
  *
  * Exists for CONCURRENCY, not capability: `javax.sound.sampled.AudioSystem`
  * decodes WAV fine, but every `getAudioInputStream` call re-runs a
  * synchronized provider probe — measured 32 parallel decode tasks running
  * ~3x SLOWER than one (the media corpus went parallel in r7 and
  * mm_audio_features regressed 1.4 s → 3.9 s on pure lock contention).
  * Parsing the four-chunk layout directly is lock-free and byte-equivalent;
  * `FlacOggPropertiesSpec` pins both directions against javax.sound (our
  * bytes decode identically through AudioSystem, AudioSystem's bytes parse
  * identically here). AIFF/AU stay on the javax.sound path — rare enough
  * that contention does not matter.
  *
  * Layout (all header integers little-endian): `RIFF` u32(36+dataLen)
  * `WAVE`, then chunks of (fourcc, u32 len, payload, odd-length pad): a
  * 16-byte `fmt ` (u16 format=1 PCM, u16 channels, u32 rate, u32 byteRate,
  * u16 blockAlign, u16 bits) and the `data` chunk; unknown chunks (LIST,
  * fact, ...) are skipped structurally.
  */
object WavePcm {

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  case class WavAudio(sampleRate: Int, channels: Int, nFrames: Long, pcmLE: Array[Byte])

  /** True iff the file's fmt chunk declares plain PCM (format tag 1) at 16
    * bits — the shape [[parseWav16]] handles. Dialects like
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) return false so callers can route
    * them to javax.sound instead of dying on the fast path.
    */
  def isCanonicalPcm16(bytes: Array[Byte]): Boolean = {
    if (!isWav(bytes)) return false
    val riffEnd = math.min(bytes.length.toLong, 8L + (leInt(bytes, 4) & 0xffffffffL))
    var p = 12L
    while (p + 8 <= riffEnd) {
      val off = p.toInt
      val len = leInt(bytes, off + 4) & 0xffffffffL
      if (p + 8 + len > riffEnd) return false
      if (bytes(off) == 'f' && bytes(off + 1) == 'm' && bytes(off + 2) == 't' &&
          bytes(off + 3) == ' ')
        return len >= 16 && leShort(bytes, off + 8) == 1 && leShort(bytes, off + 22) == 16
      p += 8 + len + (len & 1L)
    }
    false
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Canonical 44-byte-header 16-bit PCM WAV (interleaved little-endian
    * samples in, the same layout `AudioSystem.write` emits for this format).
    */
  def writeWav16(pcmLE: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 0xffff, s"wav: channels $channels")
    require(sampleRate >= 1, s"wav: sample rate $sampleRate")
    require(pcmLE.length % (2 * channels) == 0,
      s"wav: ${pcmLE.length} PCM bytes not a whole number of $channels-channel frames")
    val out = new Array[Byte](44 + pcmLE.length)
    def fourcc(off: Int, s: String): Unit = { var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 } }
    def u32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def u16(off: Int, v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte }
    fourcc(0, "RIFF"); u32(4, 36 + pcmLE.length); fourcc(8, "WAVE")
    fourcc(12, "fmt "); u32(16, 16)
    u16(20, 1) // PCM
    u16(22, channels)
    u32(24, sampleRate)
    u32(28, sampleRate * channels * 2)
    u16(32, channels * 2)
    u16(34, 16)
    fourcc(36, "data"); u32(40, pcmLE.length)
    System.arraycopy(pcmLE, 0, out, 44, pcmLE.length)
    out
  }

  /** Structural parse: walk the chunk list, read `fmt ` + `data`, skip the
    * rest. Strict on what it claims (PCM, 16-bit, sane geometry); a
    * truncated or non-PCM file dies in a require.
    */
  def parseWav16(bytes: Array[Byte]): WavAudio = {
    require(isWav(bytes), "wav: missing RIFF/WAVE header")
    val riffEnd = math.min(bytes.length.toLong, 8L + (leInt(bytes, 4) & 0xffffffffL))
    var p = 12L
    var rate = -1; var channels = -1; var blockAlign = -1
    var pcm: Array[Byte] = null
    while (p + 8 <= riffEnd) {
      val off = p.toInt
      val len = leInt(bytes, off + 4) & 0xffffffffL
      val dataStart = p + 8
      require(dataStart + len <= riffEnd, s"wav: truncated chunk at byte $p")
      val cc = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (cc == "fmt ") {
        require(len >= 16, s"wav: fmt chunk too short ($len)")
        val fmt = leShort(bytes, off + 8)
        require(fmt == 1, s"wav: only PCM (format 1) supported, got $fmt")
        channels = leShort(bytes, off + 10)
        rate = leInt(bytes, off + 12)
        blockAlign = leShort(bytes, off + 20)
        val bits = leShort(bytes, off + 22)
        require(bits == 16, s"wav: only 16-bit supported, got $bits")
        require(channels >= 1 && rate >= 1 && blockAlign == channels * 2,
          s"wav: inconsistent fmt (channels=$channels rate=$rate blockAlign=$blockAlign)")
      } else if (cc == "data") {
        require(channels > 0, "wav: data chunk before fmt")
        pcm = java.util.Arrays.copyOfRange(bytes, dataStart.toInt, (dataStart + len).toInt)
      }
      p = dataStart + len + (len & 1L) // chunks pad to even byte boundaries
    }
    require(pcm != null, "wav: no data chunk")
    require(pcm.length % blockAlign == 0,
      s"wav: data length ${pcm.length} not a whole number of frames (blockAlign $blockAlign)")
    WavAudio(rate, channels, pcm.length.toLong / blockAlign, pcm)
  }
}
