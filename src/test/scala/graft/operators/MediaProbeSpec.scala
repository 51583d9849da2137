package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The triage probe's contract: every container family identified from
  * headers only, damaged files keep their sniffed container with
  * decodable=false, nothing throws, and the vorbis/opus identification
  * headers parse per their public specs.
  */
class MediaProbeSpec extends AnyFunSuite {
  private val mm = Multimodal

  test("flac: STREAMINFO geometry without decoding frames") {
    val p = mm.probeBytes(1L, mm.deterministicFlacCompressed(3L, 16000, 800, 2))
    assert(p == mm.MediaProbe(1L, "flac", Some("flac"), None, None,
      Some(16000), Some(2), Some(800L), decodable = true))
  }

  test("ogg-flac vs ogg-vorbis vs crafted opus all identify with geometry") {
    val pf = mm.probeBytes(2L, mm.deterministicOgg(4L, 24000, 600, 1))
    assert(pf.container == "ogg" && pf.codec.contains("flac") &&
      pf.sample_rate.contains(24000) && pf.n_frames.contains(600L) && pf.decodable)
    val pv = mm.probeBytes(3L, mm.deterministicVorbisIdOgg(5L, 8000, 2))
    assert(pv == mm.MediaProbe(3L, "ogg", Some("vorbis"), None, None,
      Some(8000), Some(2), None, decodable = false))
    // OpusHead per RFC 7845 §5.1: version 1, 2ch, preskip 312, 48 kHz in
    val head = Array[Byte]('O', 'p', 'u', 's', 'H', 'e', 'a', 'd',
      1, 2, 0x38, 0x01, ((48000 >> 0) & 0xff).toByte, ((48000 >> 8) & 0xff).toByte,
      ((48000 >> 16) & 0xff).toByte, 0, 0, 0, 0)
    val po = mm.probeBytes(4L, OggStream.writePages(Seq(head), serial = 9, granules = Seq(0L)))
    assert(po == mm.MediaProbe(4L, "ogg", Some("opus"), None, None,
      Some(48000), Some(2), None, decodable = false))
    val opus = OggStream.parseOpusHead(OggStream.writePages(Seq(head), 9, Seq(0L)))
    assert(opus.preSkip == 312 && opus.mappingFamily == 0)
  }

  test("wav: canonical probes with geometry; extensible-format tag does not overclaim") {
    val p = mm.probeBytes(5L, mm.deterministicWav(6L, 8000, 400, 2))
    assert(p == mm.MediaProbe(5L, "wav", Some("pcm_s16le"), None, None,
      Some(8000), Some(2), Some(400L), decodable = true))
    val ext = mm.deterministicWav(6L, 8000, 400, 2).clone()
    ext(20) = 0xfe.toByte; ext(21) = 0xff.toByte // WAVE_FORMAT_EXTENSIBLE
    val pe = mm.probeBytes(6L, ext)
    assert(pe.container == "wav" && pe.codec.isEmpty && !pe.decodable)
  }

  test("video containers: frame counts + first-frame dims, webm/mkv split by DocType") {
    val avi = mm.probeBytes(7L, mm.deterministicAvi(7L, 16, 16, 5))
    assert(avi == mm.MediaProbe(7L, "avi", Some("mjpeg"), Some(16), Some(16),
      None, None, Some(5L), decodable = true))
    val mp4 = mm.probeBytes(8L, mm.deterministicMp4(7L, 16, 16, 4))
    assert(mp4.container == "mp4" && mp4.n_frames.contains(4L) && mp4.width.contains(16))
    assert(mm.probeBytes(9L, mm.deterministicMkv(7L, 16, 16, 3, "webm")).container == "webm")
    assert(mm.probeBytes(9L, mm.deterministicMkv(7L, 16, 16, 3, "matroska")).container == "mkv")
    assert(Matroska.readDocType(mm.deterministicMkv(1L, 16, 16, 2, "webm")).contains("webm"))
  }

  test("raw MJPEG (multi-SOI) is a clip; single SOI is a jpeg still") {
    val clip = mm.probeBytes(10L, mm.deterministicMjpeg(8L, 16, 16, 3))
    assert(clip == mm.MediaProbe(10L, "mjpeg", Some("mjpeg"), Some(16), Some(16),
      None, None, Some(3L), decodable = true))
    val still = mm.probeBytes(11L, mm.deterministicMjpeg(8L, 20, 12, 1))
    assert(still == mm.MediaProbe(11L, "jpeg", Some("jpeg"), Some(20), Some(12),
      None, None, None, decodable = true))
    assert(mm.mjpegSoiOffsets(mm.deterministicMjpeg(8L, 16, 16, 3)).length == 3)
  }

  test("mp3 probes full geometry but stays decodable=false") {
    val p = mm.probeBytes(12L, mm.deterministicMp3(10L)) // seed 10: mpeg1, stereo, 1 frame
    assert(p.container == "mp3" && p.codec.contains("mpeg1-layer3") && !p.decodable)
    assert(p.sample_rate.contains(48000)) // Sr1(10 % 3 = 1)
    assert(p.n_frames.contains((10 % 10 + 1) * 1152L))
  }

  test("damaged headers keep the sniffed container; alien bytes are unknown; nothing throws") {
    // truncated flac: magic intact, STREAMINFO cut
    val flac = mm.deterministicFlacCompressed(3L, 16000, 800, 2)
    val tf = mm.probeBytes(13L, java.util.Arrays.copyOf(flac, 10))
    assert(tf == mm.MediaProbe(13L, "flac", None, None, None, None, None, None,
      decodable = false))
    // ogg page with a corrupted CRC: container kept, named codec lost
    val ogg = mm.deterministicVorbisIdOgg(5L, 8000, 2).clone()
    ogg(22) = (ogg(22) ^ 0x55).toByte
    val to = mm.probeBytes(14L, ogg)
    assert(to.container == "ogg" && !to.decodable)
    // mp3 with a truncated tail: container kept
    val mp3 = mm.deterministicMp3(11L)
    val tm = mm.probeBytes(15L, java.util.Arrays.copyOf(mp3, mp3.length - 5))
    assert(tm.container == "mp3" && tm.codec.isEmpty && !tm.decodable)
    // text and empty buffers: unknown, no throw
    assert(mm.probeBytes(16L, "just some text".getBytes("UTF-8")).container == "unknown")
    assert(mm.probeBytes(17L, Array.empty[Byte]).container == "unknown")
    assert(mm.probeBytes(18L, mm.fakeMediaBytes(8, 8, 3, 0, Array[Byte](1, 2))).container == "unknown")
  }

  test("png/bmp/gif stills probe dims from headers") {
    val png = mm.probeBytes(19L, mm.deterministicPng(9L, 24, 12))
    assert(png == mm.MediaProbe(19L, "png", Some("png"), Some(24), Some(12),
      None, None, None, decodable = true))
  }
}
