package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** xz / LZMA2 walk: canonical interop goldens (presets 0/6/9e, all four
  * check types, non-default lc/lp/pb, multistream), writer round-trips,
  * CRC gates, bounds, named rejects.
  */
class XzSpec extends AnyFunSuite {

  private def res(n: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/" + n)
    assert(in != null, s"missing resource $n")
    try in.readAllBytes() finally in.close()
  }

  test("decodes CANONICAL xz output (goldens: text -6 crc32, binary -9e " +
    "sha256, runs -0 crc64, non-default lc=3 lp=1 pb=2)") {
    for (base <- Seq("xz_golden_text", "xz_golden_binary", "xz_golden_runs",
      "xz_golden_lcmix")) {
      assert(Xz.decompress(res(s"$base.xz")).sameElements(res(s"$base.plain")), base)
    }
  }

  test("decodes CANONICAL multistream concatenation (three streams, mixed checks)") {
    assert(Xz.decompress(res("xz_golden_multistream.xz"))
      .sameElements(res("xz_golden_multistream.plain")))
  }

  test("multistream: 4-aligned null stream padding between streams decodes") {
    val a = Xz.compress("first".getBytes(StandardCharsets.US_ASCII))
    val b = Xz.compress("second".getBytes(StandardCharsets.US_ASCII), "crc64")
    val glued = a ++ Array.fill(8)(0.toByte) ++ b
    assert(new String(Xz.decompress(glued), StandardCharsets.US_ASCII) == "firstsecond")
    // misaligned padding is a named reject
    val bad = a ++ Array.fill(3)(0.toByte) ++ b
    val e = intercept[IllegalArgumentException](Xz.decompress(bad))
    assert(e.getMessage.contains("padding"))
  }

  test("writer round-trips every check type and both modes, incl. empty") {
    val data = ("stored xz — café 漢字 " * 500).getBytes(StandardCharsets.UTF_8)
    for (chk <- Seq("none", "crc32", "crc64", "sha256");
         mode <- Seq("fast", "store")) {
      val packed = Xz.compress(data, chk, mode)
      assert(Xz.isXz(packed))
      assert(Xz.decompress(packed).sameElements(data), s"$chk/$mode")
    }
    assert(Xz.decompress(Xz.compress(Array.emptyByteArray)).isEmpty)
    // payloads past one chunk split and rejoin in both modes
    val big = Array.tabulate(200000)(i => (i * 31).toByte)
    assert(Xz.decompress(Xz.compress(big, "crc64")).sameElements(big))
    assert(Xz.decompress(Xz.compress(big, "crc64", "store")).sameElements(big))
  }

  test("the LZMA encoder genuinely compresses (and rep0 carries runs)") {
    val text = ("line of shared prefix content with tokens\n" * 2000)
      .getBytes(StandardCharsets.UTF_8)
    val packed = Xz.compress(text)
    assert(packed.length < text.length / 20, s"ratio ${packed.length}/${text.length}")
    assert(Xz.decompress(packed).sameElements(text))
    val runs = Array.fill(100000)('a'.toByte)
    assert(Xz.compress(runs).length < 1000)
  }

  test("incompressible segments fall back to stored chunks and stay in sync") {
    // deterministic pseudo-random bytes defeat the greedy matcher; the
    // compressible tail after the stored fallback exercises the
    // state-reset-after-uncompressed rule in BOTH the writer and reader
    val rnd = new java.util.Random(7)
    val noise = new Array[Byte](61000)
    rnd.nextBytes(noise)
    val data = noise ++ ("then a compressible tail " * 4000)
      .getBytes(StandardCharsets.UTF_8)
    val packed = Xz.compress(data, "crc64")
    assert(Xz.decompress(packed).sameElements(data))
    assert(packed.length < data.length) // the tail still shrinks
  }

  test("the system xz (when present) decodes OUR writer's files") {
    val bin = Seq("/root/miniconda/bin/xz", "/usr/bin/xz", "/bin/xz")
      .find(p => new java.io.File(p).canExecute)
    assume(bin.isDefined, "no xz binary on this host")
    val rnd = new java.util.Random(3)
    val noise = new Array[Byte](61000)
    rnd.nextBytes(noise)
    val payloads = Seq(
      ("round-trip via canonical xz " * 300).getBytes(StandardCharsets.UTF_8),
      noise ++ ("stored-then-lzma tail " * 2000).getBytes(StandardCharsets.UTF_8))
    for (data <- payloads; chk <- Seq("crc32", "crc64", "sha256");
         mode <- Seq("fast", "store")) {
      val f = java.io.File.createTempFile("graft", ".xz")
      try {
        java.nio.file.Files.write(f.toPath, Xz.compress(data, chk, mode))
        val p = new ProcessBuilder(bin.get, "-dc", f.getAbsolutePath).start()
        val got = p.getInputStream.readAllBytes()
        assert(p.waitFor() == 0, s"xz -dc exit for $chk/$mode")
        assert(got.sameElements(data), s"$chk/$mode")
      } finally f.delete()
    }
  }

  test("every check is verified, not decorative (flip a payload bit)") {
    for (chk <- Seq("crc32", "crc64", "sha256")) {
      val packed = Xz.compress("verify me please, every byte".getBytes, chk, "store")
      // corrupt one byte inside the stored chunk (past header+block header)
      val broken = packed.clone()
      broken(30) = (broken(30) ^ 0x10).toByte
      val e = intercept[IllegalArgumentException](Xz.decompress(broken))
      assert(e.getMessage.contains("mismatch"), chk)
    }
  }

  test("header/index/footer CRCs and the backward pointer are gated") {
    val packed = Xz.compress("structural integrity".getBytes, "crc32", "store")
    // stream-header CRC
    val h = packed.clone(); h(8) = (h(8) ^ 1).toByte
    assert(intercept[IllegalArgumentException](Xz.decompress(h))
      .getMessage.contains("header CRC"))
    // footer magic
    val f = packed.clone(); f(f.length - 1) = 'Q'.toByte
    assert(intercept[IllegalArgumentException](Xz.decompress(f))
      .getMessage.contains("footer"))
  }

  test("named rejects: magic, truncation, trailing garbage, output cap") {
    intercept[IllegalArgumentException](Xz.decompress("not xz at all".getBytes))
    val packed = Xz.compress(("x" * 1000).getBytes)
    intercept[IllegalArgumentException](Xz.decompress(packed.take(40)))
    val e = intercept[IllegalArgumentException](
      Xz.decompress(packed ++ "junk".getBytes))
    assert(e.getMessage.contains("trailing garbage") || e.getMessage.contains("padding"))
    val e2 = intercept[IllegalArgumentException](Xz.decompress(packed, maxOut = 10))
    assert(e2.getMessage.contains("cap"))
  }

  test("unsupported filter chains reject by name (delta+lzma2)") {
    // canonical xz with a delta filter prepended would carry two filters;
    // emulate by patching OUR block header's filter id and re-CRCing
    val packed = Xz.compress("filter probe".getBytes, "crc32", "store")
    val broken = packed.clone()
    broken(14) = 0x03 // filter id: delta
    // fix the block-header CRC so the filter check itself is what fires
    val c = new java.util.zip.CRC32()
    c.update(broken, 12, 8)
    val v = c.getValue
    (0 until 4).foreach(i => broken(20 + i) = ((v >>> (8 * i)) & 0xff).toByte)
    val e = intercept[IllegalArgumentException](Xz.decompress(broken))
    assert(e.getMessage.contains("unsupported"))
  }

  test("LZMA2 dictionary-size byte > 40 rejects by name (spec §5.3.1)") {
    // same patch-and-re-CRC shape as the filter-id test: dict byte is the
    // props byte at offset 16 of our 12-byte block header
    def withDictByte(v: Int): Array[Byte] = {
      val packed = Xz.compress("dict probe".getBytes, "crc32", "store")
      val out = packed.clone()
      out(16) = v.toByte
      val c = new java.util.zip.CRC32()
      c.update(out, 12, 8)
      val crc = c.getValue
      (0 until 4).foreach(i => out(20 + i) = ((crc >>> (8 * i)) & 0xff).toByte)
      out
    }
    val e = intercept[IllegalArgumentException](Xz.decompress(withDictByte(41)))
    assert(e.getMessage.contains("dictionary-size"))
    // 40 (the spec maximum, 4 GiB dict) stays decodable — the value is
    // unused here, only its validity is gated
    assert(Xz.decompress(withDictByte(40)).sameElements("dict probe".getBytes))
  }

  test("LZMA chunk without a state reset after an uncompressed chunk " +
      "rejects by name (liblzma parity)") {
    val data = "reset probe".getBytes
    val packed = Xz.compress(data, "crc32", "store")
    // store mode emits ONE uncompressed chunk (0x01 hi lo data) at the
    // payload start (offset 24); splice a reset=0 LZMA chunk header right
    // after it, before the end marker — invalid per spec, and the decoder
    // must not silently repair the state continuity
    val insertAt = 24 + 3 + data.length
    val broken = packed.take(insertAt) ++
      Array[Byte](0x80.toByte, 0, 0, 0, 0) ++ packed.drop(insertAt)
    val e = intercept[IllegalArgumentException](Xz.decompress(broken))
    assert(e.getMessage.contains("without state reset"))
  }

  test("fuzz: mutations reject BY NAME or decode to the exact original") {
    // the committed slice of the 16k-case dev sweep (graft.XzFuzzDev):
    // single-byte mutations, truncations, and magic-prefixed garbage
    // must throw IllegalArgumentException (named) or — when the mutated
    // byte is semantically dead — decode to the ORIGINAL payload. Any
    // other exception is an unguarded read; any other output is a
    // silently-wrong acceptance.
    val rnd = new java.util.Random(99)
    val want = ("fuzz payload — café " * 200).getBytes(StandardCharsets.UTF_8)
    val seed = Xz.compress(want, "crc32")
    def hit(b: Array[Byte]): Unit =
      try {
        val got = Xz.decompress(b, maxOut = 1 << 20)
        assert(got.sameElements(want), "mutated file decoded to DIFFERENT bytes")
      } catch { case _: IllegalArgumentException => () }
    (0 until 400).foreach { _ =>
      val b = seed.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      hit(b)
    }
    (0 until 100).foreach(_ => hit(java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length))))
    (0 until 100).foreach { _ =>
      val b = new Array[Byte](16 + rnd.nextInt(200))
      rnd.nextBytes(b)
      System.arraycopy(Xz.Magic, 0, b, 0, 6)
      hit(b)
    }
  }

  test("CRC-64/XZ matches the published check vector") {
    // the standard CRC-64/XZ test vector: "123456789" -> 0x995DC9BBDF1939FA
    val got = Xz.crc64("123456789".getBytes(StandardCharsets.US_ASCII), 0, 9)
    assert(got == 0x995DC9BBDF1939FAL)
  }
}

/** Legacy .lzma (LZMA_ALONE): canonical goldens both producers, writer
  * interop, named rejects.
  */
class LzmaAloneSpec extends AnyFunSuite {
  private def res(n: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/" + n)
    assert(in != null, s"missing resource $n")
    try in.readAllBytes() finally in.close()
  }

  test("decodes CANONICAL .lzma (xz --format=lzma, liblzma one-shot, " +
    "and non-default lc=0 lp=2 pb=0)") {
    for (base <- Seq("lzma_golden_xz", "lzma_golden_py", "lzma_golden_wide")) {
      assert(Xz.decompressLzmaAlone(res(s"$base.lzma"))
        .sameElements(res(s"$base.plain")), base)
    }
  }

  test("writer round-trips and the system xz (when present) decodes it") {
    val data = ("alone round-trip — café 漢字 " * 800).getBytes("UTF-8")
    val packed = Xz.compressLzmaAlone(data)
    assert(packed.length < data.length / 5)
    assert(Xz.decompressLzmaAlone(packed).sameElements(data))
    val bin = Seq("/root/miniconda/bin/xz", "/usr/bin/xz", "/bin/xz")
      .find(p => new java.io.File(p).canExecute)
    assume(bin.isDefined, "no xz binary on this host")
    val f = java.io.File.createTempFile("graft", ".lzma")
    try {
      java.nio.file.Files.write(f.toPath, packed)
      val p = new ProcessBuilder(bin.get, "-dc", "--format=lzma",
        f.getAbsolutePath).start()
      val got = p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, "xz -dc --format=lzma exit")
      assert(got.sameElements(data))
    } finally f.delete()
  }

  test("named rejects: truncation, trailing garbage, size cap, bad props") {
    val packed = Xz.compressLzmaAlone("reject lanes".getBytes)
    intercept[IllegalArgumentException](Xz.decompressLzmaAlone(packed.take(16)))
    val e = intercept[IllegalArgumentException](
      Xz.decompressLzmaAlone(packed ++ Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("trailing garbage"))
    val big = Xz.compressLzmaAlone(Array.fill(50000)('q'.toByte))
    val e2 = intercept[IllegalArgumentException](
      Xz.decompressLzmaAlone(big, maxOut = 100))
    assert(e2.getMessage.contains("cap"))
    val bad = packed.clone(); bad(0) = 0xE1.toByte // 225: out of range
    intercept[IllegalArgumentException](Xz.decompressLzmaAlone(bad))
  }
}
