package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The audio-fingerprint seam behind mm_audio_dedup: container invariance
  * (the dedup property), exhaustive cross-clip separation over the FULL
  * sf0.1 doc_id range (the no-false-merge property the oracle relies on),
  * and determinism.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private def corpusFp(id: Long): Long = {
    // EXACTLY the mm_audio_dedup corpus geometry
    val nFrames = ((id % 250) + 1).toInt * 40 + 2600
    val channels = ((id % 2) + 1).toInt
    Multimodal.audioFingerprint64(
      Multimodal.deterministicPcmMod(id, nFrames, channels), channels)
  }

  test("fingerprint is container-invariant: WAV, FLAC, OGG-FLAC, FIXED-FLAC agree") {
    for (id <- Seq(0L, 3L, 7L, 12L)) {
      val nFrames = ((id % 250) + 1).toInt * 40 + 2600
      val channels = ((id % 2) + 1).toInt
      val rate = 8000 * ((id % 3) + 1).toInt
      val pcm = Multimodal.deterministicPcmMod(id, nFrames, channels)
      def fpOf(bytes: Array[Byte]): Long = {
        val (_, ch, p) = Multimodal.decodePcm16(bytes)
        Multimodal.audioFingerprint64(p, ch)
      }
      val w = fpOf(WavePcm.writeWav16(pcm, rate, channels))
      assert(w == fpOf(FlacCodec.writeFlac(pcm, rate, channels)))
      assert(w == fpOf(FlacCodec.writeFlacFixed(pcm, rate, channels)))
      assert(w == fpOf(OggStream.writeOggFlac(pcm, rate, channels)))
      assert(w == corpusFp(id))
    }
  }

  test("cross-clip separation holds EXHAUSTIVELY over the sf0.1 id range") {
    // 5000 doc_ids (the sf0.1 documents table) -> 12.5M pairs. The dedup
    // contract uses maxHamming = 2 with 4x16-bit pigeonhole blocking; a
    // false merge needs a cross-clip pair at hamming <= 2. Pin the actual
    // minimum so any future corpus/fingerprint change that breaks the
    // oracle fails HERE, deterministically, not in a driver run.
    val n = 5000
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) { fps(i) = corpusFp(i.toLong); i += 1 }
    var minH = 64
    var at = (0, 0)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
        if (h < minH) { minH = h; at = (i, j) }
        j += 1
      }
      i += 1
    }
    assert(minH > 2, s"cross-clip min hamming $minH at $at — oracle false-merge risk")
  }

  test("fingerprint bits are balanced (not degenerate)") {
    val ones = (0 until 200).map(id => java.lang.Long.bitCount(corpusFp(id.toLong)))
    val mean = ones.sum.toDouble / ones.length
    assert(mean > 20 && mean < 44, s"mean popcount $mean — fingerprint degenerate")
  }
}
