package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MP3 structural walker properties: header-field math against the
  * published tables, ID3v2/v1 skipping, VBR accounting, and the strict
  * failure modes (sync loss, truncation, mid-stream geometry switches)
  * actually biting — the probe must separate "valid MP3" from "damaged",
  * never paper over the difference.
  */
class Mp3FramesSpec extends AnyFunSuite {

  test("writer/prober round-trip across versions, rates, channels, frame counts") {
    for {
      (rate, mpeg1) <- Seq(44100 -> true, 48000 -> true, 32000 -> true,
        22050 -> false, 24000 -> false, 16000 -> false)
      channels <- Seq(1, 2)
      k <- Seq(1, 3, 10)
    } {
      val kbps = if (mpeg1) 128 else 64
      val bytes = Mp3Frames.writeMp3(rate, channels, Seq.fill(k)(kbps), seed = rate + k)
      assert(Mp3Frames.isMp3(bytes))
      val info = Mp3Frames.probe(bytes)
      assert(info.version == (if (mpeg1) "1" else "2"))
      assert(info.layer == 3)
      assert(info.sampleRate == rate && info.channels == channels)
      assert(info.frameCount == k)
      assert(info.pcmFrames == k.toLong * (if (mpeg1) 1152 else 576))
      assert(info.avgBitrateKbps == kbps.toDouble)
      assert(!info.vbr)
    }
  }

  test("frame length math matches the spec formula per frame") {
    // MPEG-1 L3 at 44100/128k: 144*128000/44100 = 417 bytes (truncating)
    val one = Mp3Frames.writeMp3(44100, 2, Seq(128), seed = 1)
    assert(one.length == 417)
    val h = Mp3Frames.parseHeader(one, 0)
    assert(h.frameLength == 417 && h.samplesPerFrame == 1152 && !h.crcProtected)
    // MPEG-2 L3 at 24000/64k: 72*64000/24000 = 192
    val two = Mp3Frames.writeMp3(24000, 1, Seq(64), seed = 2)
    assert(two.length == 192)
    assert(Mp3Frames.parseHeader(two, 0).samplesPerFrame == 576)
  }

  test("VBR streams report per-frame bitrates and exact duration") {
    val bytes = Mp3Frames.writeMp3(44100, 2, Seq(112, 192, 128, 160), seed = 3)
    val info = Mp3Frames.probe(bytes)
    assert(info.vbr)
    assert(info.frameCount == 4 && info.pcmFrames == 4 * 1152L)
    assert(info.avgBitrateKbps == (112 + 192 + 128 + 160) / 4.0)
  }

  test("ID3v2 tag is skipped structurally; ID3v1 trailer is recognized") {
    val pad = 300 // forces a multi-byte syncsafe size
    val bytes = Mp3Frames.writeMp3(32000, 1, Seq(96, 96), seed = 4, id3v2Pad = pad)
    assert(Mp3Frames.id3v2Length(bytes) == 10 + pad)
    assert(Mp3Frames.isMp3(bytes))
    val withV1 = bytes ++ ("TAG" + "x" * 125).getBytes("US-ASCII")
    val info = Mp3Frames.probe(withV1)
    assert(info.frameCount == 2 && info.id3v2Bytes == 10 + pad && info.id3v1)
    // the v1 trailer must NOT be walked as frames
    assert(Mp3Frames.probe(bytes).frameCount == 2)
  }

  test("strictness: truncation, sync loss, and geometry switches die loudly") {
    val good = Mp3Frames.writeMp3(44100, 2, Seq(128, 128), seed = 5)
    intercept[IllegalArgumentException] {
      Mp3Frames.probe(java.util.Arrays.copyOf(good, good.length - 10))
    }
    val desynced = good.clone()
    desynced(417) = 0x00 // kill the second frame's sync byte
    intercept[IllegalArgumentException](Mp3Frames.probe(desynced))
    // splice an MPEG-2 frame after an MPEG-1 frame: valid headers, invalid stream
    val f1 = Mp3Frames.writeMp3(44100, 2, Seq(128), seed = 6)
    val f2 = Mp3Frames.writeMp3(24000, 2, Seq(64), seed = 6)
    val e = intercept[IllegalArgumentException](Mp3Frames.probe(f1 ++ f2))
    assert(e.getMessage.contains("switches"))
    // same version, different rate: the geometry require
    val f3 = Mp3Frames.writeMp3(48000, 2, Seq(128), seed = 6)
    assert(intercept[IllegalArgumentException](
      Mp3Frames.probe(f1 ++ f3)).getMessage.contains("geometry"))
  }

  test("sniffer rejects non-MP3 bytes incl. JPEG SOI and random buffers") {
    assert(!Mp3Frames.isMp3(Array[Byte]()))
    assert(!Mp3Frames.isMp3(Multimodal.deterministicPng(1, 8, 8)))
    assert(!Mp3Frames.isMp3(Multimodal.deterministicMjpeg(1, 16, 16, 1))) // FF D8 FF != FF Ex
    assert(!Mp3Frames.isMp3(Multimodal.deterministicWav(1, 8000, 100, 1)))
    // reserved version (01) and reserved layer (00) must not parse
    assert(Mp3Frames.parseHeader(Array(0xff, 0xeb, 0x92, 0x00).map(_.toByte), 0) == null)
    assert(Mp3Frames.parseHeader(Array(0xff, 0xf9, 0x92, 0x00).map(_.toByte), 0) == null)
    // free-format (bitrate index 0) is a recognized-but-unsupported shape
    assert(Mp3Frames.parseHeader(Array(0xff, 0xfb, 0x02, 0x00).map(_.toByte), 0) == null)
  }
}
