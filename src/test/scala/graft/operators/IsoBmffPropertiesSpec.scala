package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip for the ISO BMFF (MP4) container: whatever
  * sample payloads go through [[IsoBmff.writeMp4]], [[IsoBmff.demuxFrames]]
  * must recover byte-identically, in order — across frame counts, sizes,
  * chunk groupings (ragged tails exercise stsc's run-length encoding), and
  * contents (including bytes that look like box headers: 'moov', 'mdat',
  * 'ftyp').
  */
class IsoBmffPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val frameGen: Gen[Array[Byte]] = for {
    len <- Gen.chooseNum(0, 300)
    bytes <- Gen.containerOfN[Array, Byte](len, Gen.oneOf(
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue),
      // adversarial content: structure-shaped bytes inside payloads
      Gen.oneOf("moovmdatftypstco".getBytes.toSeq)))
  } yield bytes

  private val clipGen: Gen[(List[Array[Byte]], Int)] = for {
    n <- Gen.chooseNum(0, 12)
    frames <- Gen.listOfN(n, frameGen)
    perChunk <- Gen.chooseNum(1, 5)
  } yield (frames, perChunk)

  test("writeMp4 -> demuxFrames round-trips any sample payloads byte-identically") {
    forAllSeeded(clipGen) { case (frames, perChunk) =>
      val mp4 = IsoBmff.writeMp4(frames.toIndexedSeq, 16, 16, framesPerChunk = perChunk)
      assert(IsoBmff.isMp4(mp4))
      val back = IsoBmff.demuxFrames(mp4).toList
      assert(back.length == frames.length)
      back.zip(frames).zipWithIndex.foreach { case ((b, f), i) =>
        assert(java.util.Arrays.equals(b, f), s"sample $i diverged")
      }
    }
  }

  test("any truncation demuxes a prefix of the samples without throwing") {
    // faststart layout (moov first) means a truncated mdat keeps its sample
    // tables: offsets past the cut stop the demux at the last whole sample
    forAllSeeded(clipGen.suchThat(_._1.nonEmpty), n = 30) { case (frames, perChunk) =>
      val mp4 = IsoBmff.writeMp4(frames.toIndexedSeq, 16, 16, framesPerChunk = perChunk)
      (0 until mp4.length).foreach { len =>
        val got = IsoBmff.demuxFrames(java.util.Arrays.copyOfRange(mp4, 0, len)).toList
        assert(got.length <= frames.length)
        got.zip(frames).foreach { case (b, f) =>
          assert(java.util.Arrays.equals(b, f), s"truncation at $len corrupted a sample")
        }
      }
    }
  }

  test("full-file truncation of only the mdat yields every complete sample") {
    val frames = (0 until 7).map(i => Array.fill(40 + i)(i.toByte))
    val mp4 = IsoBmff.writeMp4(frames, 16, 16)
    // cut exactly one byte into the LAST sample: all prior samples survive
    val lastStart = mp4.length - frames.last.length
    val got = IsoBmff.demuxFrames(java.util.Arrays.copyOfRange(mp4, 0, lastStart + 1)).toList
    assert(got.length == frames.length - 1)
    got.zip(frames).foreach { case (b, f) => assert(java.util.Arrays.equals(b, f)) }
  }

  test("random garbage never throws and non-MP4 yields no frames") {
    val junkGen = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    forAllSeeded(junkGen, n = 200) { junk =>
      assert(IsoBmff.demuxFrames(junk).isEmpty) // no ftyp -> empty
    }
    // ftyp-stamped garbage: walker must terminate cleanly, no frames required
    forAllSeeded(junkGen, n = 200) { junk =>
      val header = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 2, 0)
      IsoBmff.demuxFrames(header ++ junk).toList // must not throw
    }
  }

  test("co64 64-bit chunk offsets demux identically to stco") {
    // hand-rewrite the stco table of a written file into co64: the demuxer
    // must read either (real crawls contain both)
    val frames = (0 until 5).map(i => Array.fill(30)(i.toByte))
    val mp4 = IsoBmff.writeMp4(frames, 16, 16)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // locate the stco box byte pattern and rebuild the file around it
    val pat = "stco".getBytes("US-ASCII")
    val at = mp4.indices.find(i => i + 4 <= mp4.length &&
      mp4(i) == pat(0) && mp4(i + 1) == pat(1) && mp4(i + 2) == pat(2) && mp4(i + 3) == pat(3)).get
    val boxStart = at - 4
    val boxLen = ((mp4(boxStart) & 0xff) << 24) | ((mp4(boxStart + 1) & 0xff) << 16) |
      ((mp4(boxStart + 2) & 0xff) << 8) | (mp4(boxStart + 3) & 0xff)
    val nChunks = ((mp4(boxStart + 12) & 0xff) << 24) | ((mp4(boxStart + 13) & 0xff) << 16) |
      ((mp4(boxStart + 14) & 0xff) << 8) | (mp4(boxStart + 15) & 0xff)
    val offs = (0 until nChunks).map { i =>
      val o = boxStart + 16 + i * 4
      ((mp4(o) & 0xff) << 24) | ((mp4(o + 1) & 0xff) << 16) |
        ((mp4(o + 2) & 0xff) << 8) | (mp4(o + 3) & 0xff)
    }
    val delta = 4 * nChunks // co64 is 4 bytes/chunk bigger than stco
    val co64 = be32(16 + 8 * nChunks) ++ "co64".getBytes("US-ASCII") ++
      be32(0) ++ be32(nChunks) ++
      offs.flatMap(o => be32(0) ++ be32(o + delta)).toArray
    // splice: every enclosing box size (moov/trak/mdia/minf/stbl) grows by
    // delta, and all chunk offsets shift by delta because mdat moved
    def patchSize(b: Array[Byte], fcc: String): Unit = {
      val p = fcc.getBytes("US-ASCII")
      val i = b.indices.find(i => i + 4 <= b.length &&
        b(i) == p(0) && b(i + 1) == p(1) && b(i + 2) == p(2) && b(i + 3) == p(3)).get
      val s = i - 4
      val old = ((b(s) & 0xff) << 24) | ((b(s + 1) & 0xff) << 16) |
        ((b(s + 2) & 0xff) << 8) | (b(s + 3) & 0xff)
      val nw = be32(old + delta)
      b(s) = nw(0); b(s + 1) = nw(1); b(s + 2) = nw(2); b(s + 3) = nw(3)
    }
    val rebuilt = mp4.take(boxStart) ++ co64 ++ mp4.drop(boxStart + boxLen)
    Seq("moov", "trak", "mdia", "minf", "stbl").foreach(f => patchSize(rebuilt, f))
    val got = IsoBmff.demuxFrames(rebuilt).toList
    assert(got.length == frames.length)
    got.zip(frames).foreach { case (b, f) => assert(java.util.Arrays.equals(b, f)) }
  }
}
