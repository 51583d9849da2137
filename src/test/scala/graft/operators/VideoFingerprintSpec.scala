package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The video-fingerprint seam behind mm_video_dedup: container invariance
  * across the demux paths, ORDER sensitivity (a re-cut is not a dup), and
  * exhaustive cross-clip distinctness over the sf0.1 doc_id range (the
  * no-false-merge property the exact-key oracle relies on).
  */
class VideoFingerprintSpec extends AnyFunSuite {

  private lazy val dec = new Multimodal.ImageIoDecoder

  private def fpOf(bytes: Array[Byte]): Long =
    Multimodal.videoFingerprint64(dec.sampleFrames(bytes, 1))

  private def mjpegOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    frames.foreach(baos.write)
    baos.toByteArray
  }

  test("fingerprint is container-invariant: MJPEG, AVI, MP4, MKV agree") {
    for (id <- Seq(0L, 3L, 5L, 11L)) {
      val frames = Multimodal.gridJpegFrames(id, ((id % 8) + 2).toInt)
      val m = fpOf(mjpegOf(frames))
      assert(m == fpOf(AviMjpeg.writeAvi(frames, 32, 32)), s"avi $id")
      assert(m == fpOf(IsoBmff.writeMp4(frames, 32, 32)), s"mp4 $id")
      assert(m == fpOf(Matroska.writeMkv(frames, 32, 32, "matroska")), s"mkv $id")
    }
  }

  test("fingerprint is ORDER-sensitive: reversed frames differ") {
    val frames = Multimodal.gridJpegFrames(42L, 4)
    val fwdHashes = frames.map(f => dec.sampleFrames(f, 1).next())
    assert(fwdHashes.distinct.length == 4, "frames must hash distinctly for this test")
    val fwd = Multimodal.videoFingerprint64(fwdHashes.iterator)
    val rev = Multimodal.videoFingerprint64(fwdHashes.reverse.iterator)
    assert(fwd != rev)
  }

  test("cross-clip distinctness holds EXHAUSTIVELY over the sf0.1 id range") {
    // the dedup contract keys EXACTLY (maxHamming 0): a false merge needs
    // two doc_ids with equal fingerprints. Pin all 5000 sf0.1 ids against
    // the EXACT corpus generator.
    val n = 5000
    val fps = new java.util.HashSet[java.lang.Long]()
    var dup = -1L
    var i = 0L
    while (i < n && dup < 0) {
      val fp = fpOf(mjpegOf(Multimodal.gridJpegFrames(i, ((i % 8) + 2).toInt)))
      if (!fps.add(fp)) dup = i
      i += 1
    }
    assert(dup < 0, s"fingerprint collision at doc_id $dup — oracle false-merge risk")
    assert(fps.size == n)
  }

  test("the gradient mjpeg generator is NOT a valid dedup corpus (pins the mod-256 wrap)") {
    // deterministicMjpeg's pixel formula wraps mod 256: seeds 256 apart
    // with equal frame counts are bit-identical clips. The dedup corpus
    // must use gridJpegFrames; this pin documents why.
    val a = Multimodal.deterministicMjpeg(0L, 16, 16, 2)
    val b = Multimodal.deterministicMjpeg(256L, 16, 16, 2)
    assert(java.util.Arrays.equals(a, b))
  }
}
