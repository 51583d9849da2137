package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip for the Matroska/WebM container: whatever
  * frame payloads go through [[Matroska.writeMkv]],
  * [[Matroska.demuxFrames]] must recover byte-identically, in order —
  * across frame counts, sizes, DocTypes, and contents (including bytes
  * that look like EBML structure: the magic, Segment/Cluster ids).
  */
class MatroskaPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def findSeq(h: Array[Byte], pat: Array[Byte], from: Int = 0): Int =
    (from to h.length - pat.length)
      .find(i => pat.indices.forall(j => h(i + j) == pat(j))).get

  /** Grow the size vint right after `idPat` by `delta`, re-encoded at the
    * SAME vint length (the grown value must still fit).
    */
  private def patchSize(b: Array[Byte], idPat: Array[Byte], delta: Int): Unit = {
    val szAt = findSeq(b, idPat) + idPat.length
    val len = java.lang.Integer.numberOfLeadingZeros(b(szAt) & 0xff) - 23
    var old = (b(szAt) & (0xff >>> len)).toLong
    (1 until len).foreach(j => old = (old << 8) | (b(szAt + j) & 0xff))
    val nw = old + delta
    assert(nw <= (1L << (7 * len)) - 2, s"grown size $nw overflows $len-byte vint")
    (0 until len).foreach(j =>
      b(szAt + len - 1 - j) = ((nw >>> (8 * j)) & 0xff).toByte)
    b(szAt) = (b(szAt) | (0x80 >>> (len - 1))).toByte
  }

  private val SEG_ID = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67)
  private val CLU_ID = Array[Byte](0x1f, 0x43, 0xb6.toByte, 0x75)

  private val frameGen: Gen[Array[Byte]] = for {
    len <- Gen.chooseNum(0, 300)
    bytes <- Gen.containerOfN[Array, Byte](len, Gen.oneOf(
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue),
      // adversarial content: EBML-structure-shaped bytes inside payloads
      Gen.oneOf(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte,
        0x18, 0x53, 0x80.toByte, 0x67, 0x1f, 0x43, 0xb6.toByte, 0x75,
        0xa3.toByte, 0x81.toByte, 0xff.toByte, 0x00).toSeq)))
  } yield bytes

  private val clipGen: Gen[(List[Array[Byte]], String)] = for {
    n <- Gen.chooseNum(0, 12)
    frames <- Gen.listOfN(n, frameGen)
    docType <- Gen.oneOf("matroska", "webm")
  } yield (frames, docType)

  test("writeMkv -> demuxFrames round-trips any frame payloads byte-identically") {
    forAllSeeded(clipGen) { case (frames, docType) =>
      val mkv = Matroska.writeMkv(frames.toIndexedSeq, 16, 16, docType)
      assert(Matroska.isMatroska(mkv))
      val back = Matroska.demuxFrames(mkv).toList
      assert(back.length == frames.length, s"docType=$docType")
      back.zip(frames).zipWithIndex.foreach { case ((b, f), i) =>
        assert(java.util.Arrays.equals(b, f), s"frame $i diverged")
      }
    }
  }

  test("any truncation demuxes a byte-identical prefix without throwing") {
    forAllSeeded(clipGen.suchThat(_._1.nonEmpty), n = 20) { case (frames, docType) =>
      val mkv = Matroska.writeMkv(frames.toIndexedSeq, 16, 16, docType)
      (0 until mkv.length).foreach { len =>
        val got = Matroska.demuxFrames(java.util.Arrays.copyOfRange(mkv, 0, len)).toList
        assert(got.length <= frames.length)
        got.zip(frames).foreach { case (b, f) =>
          assert(java.util.Arrays.equals(b, f), s"truncation at $len corrupted a frame")
        }
      }
    }
  }

  test("unknown-size Segment and Cluster demux identically (streamed layout)") {
    // live-muxed files write Segment/Cluster with the unknown-size vint and
    // never come back to patch it: rewrite the known sizes to 0x01FF..FF
    // (8-byte unknown) and re-demux. Sizes are replaced in place by
    // re-serializing the same elements with an unknown-size writer.
    val frames = (0 until 5).map(i => Array.fill(40 + i)((i + 1).toByte))
    val known = Matroska.writeMkv(frames, 16, 16)
    val segIdAt = findSeq(known, SEG_ID)
    val segSizeLen = java.lang.Integer.numberOfLeadingZeros(known(segIdAt + 4) & 0xff) - 23
    val unknown = Array[Byte](0x01) ++ Array.fill(7)(0xff.toByte)
    val streamed = known.take(segIdAt + 4) ++ unknown ++ known.drop(segIdAt + 4 + segSizeLen)
    // and the Cluster size vint inside the now-shifted buffer
    val cluIdAt = findSeq(streamed, CLU_ID, segIdAt)
    val cluSizeLen = java.lang.Integer.numberOfLeadingZeros(streamed(cluIdAt + 4) & 0xff) - 23
    val streamed2 = streamed.take(cluIdAt + 4) ++ unknown ++ streamed.drop(cluIdAt + 4 + cluSizeLen)
    val got = Matroska.demuxFrames(streamed2).toList
    assert(got.length == frames.length)
    got.zip(frames).foreach { case (b, f) => assert(java.util.Arrays.equals(b, f)) }
  }

  test("BlockGroup/Block path demuxes like SimpleBlock") {
    // some muxers wrap frames in BlockGroup>Block instead of SimpleBlock:
    // rewrite each SimpleBlock (id 0xA3) into BlockGroup(0xA0){Block(0xA1)}
    val frames = (0 until 3).map(i => Array.fill(25)((i + 7).toByte))
    val mkv = Matroska.writeMkv(frames, 16, 16)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < mkv.length) {
      // SimpleBlock in our writer: A3, 1-byte size (payloads < 127+4), then
      // 0x81 track vint — safe to pattern-match structurally
      if ((mkv(i) & 0xff) == 0xa3 && i + 2 < mkv.length &&
          (mkv(i + 1) & 0x80) == 0x80 && (mkv(i + 2) & 0xff) == 0x81) {
        val sz = mkv(i + 1) & 0x7f
        val inner = 0xa1.toByte +: mkv(i + 1) +: mkv.slice(i + 2, i + 2 + sz)
        out += 0xa0.toByte
        out += (0x80 | inner.length).toByte
        out ++= inner
        i += 2 + sz
      } else { out += mkv(i); i += 1 }
    }
    // group wrapping grew every cluster element by 2 bytes (the A0 id +
    // its size byte): patch the enclosing cluster + segment sizes to match
    val rebuilt = out.toArray
    val delta = frames.length * 2
    patchSize(rebuilt, SEG_ID, delta)
    patchSize(rebuilt, CLU_ID, delta)
    val got = Matroska.demuxFrames(rebuilt).toList
    assert(got.length == frames.length)
    got.zip(frames).foreach { case (b, f) => assert(java.util.Arrays.equals(b, f)) }
  }

  test("non-video tracks are filtered out; laced blocks are skipped") {
    // splice a second, AUDIO track entry and an audio SimpleBlock (track 2)
    // plus a laced block on the video track into a written file — none of
    // them may surface as frames
    val frames = (0 until 4).map(i => Array.fill(30)((i + 1).toByte))
    val mkv = Matroska.writeMkv(frames, 16, 16)
    val audioBlock = Array[Byte](0xa3.toByte, 0x86.toByte, // SimpleBlock, size 6
      0x82.toByte, 0, 0, 0x80.toByte, 0x55, 0x55) // track 2, ts, flags, 2 bytes
    val lacedBlock = Array[Byte](0xa3.toByte, 0x87.toByte, // size 7
      0x81.toByte, 0, 0, 0x86.toByte, // track 1, EBML lacing flag set
      0x01, 0x40, 0x40) // bogus lace header + data
    // append inside the cluster: grow cluster+segment sizes accordingly
    val out = mkv ++ audioBlock ++ lacedBlock
    patchSize(out, SEG_ID, audioBlock.length + lacedBlock.length)
    patchSize(out, CLU_ID, audioBlock.length + lacedBlock.length)
    val got = Matroska.demuxFrames(out).toList
    assert(got.length == frames.length, "audio + laced blocks must be skipped")
    got.zip(frames).foreach { case (b, f) => assert(java.util.Arrays.equals(b, f)) }
  }

  test("random garbage never throws and non-Matroska yields no frames") {
    val junkGen = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    forAllSeeded(junkGen, n = 200) { junk =>
      assert(Matroska.demuxFrames(junk).isEmpty) // no EBML magic -> empty
    }
    // magic-stamped garbage: walker must terminate cleanly, frames optional
    forAllSeeded(junkGen, n = 200) { junk =>
      val magic = Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte, 0x84.toByte, 0, 0, 0, 0)
      Matroska.demuxFrames(magic ++ junk).toList // must not throw
    }
  }
}
