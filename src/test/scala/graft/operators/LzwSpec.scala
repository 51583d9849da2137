package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** .Z compress walk: canonical interop both directions — the committed
  * `.tar.Z` golden written by `bsdtar -cZf` (libarchive's LZW encoder)
  * must decode byte-identically to `gzip -dc`'s output of the same
  * file, and our compressor's streams are decoded live by gzip and
  * bsdcat.
  */
class LzwSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the canonical bsdtar .tar.Z golden byte-identically to gzip") {
    val z = res("z_golden_bsdtar.tar.Z")
    assert(Lzw.isZ(z))
    val plain = Lzw.decompressZ(z)
    assert(plain.sameElements(res("z_golden_bsdtar.tar.plain")),
      "decode drift vs gzip -dc")
    // and the payload is a real tar that walks
    val names = Tar.readEntries(plain).filter(_.typeflag == '0').map(_.name)
    assert(names == Seq("doc.txt", "runs.txt", "noise.bin"))
  }

  test("round-trip across shapes: text, runs, noise, width growth") {
    val cases = Seq(
      "tiny".getBytes(StandardCharsets.UTF_8),
      ("the quick brown fox " * 500).getBytes(StandardCharsets.UTF_8),
      Array.tabulate(40000)(i => (i % 7).toByte), // heavy runs, many widths
      { val r = new scala.util.Random(3); val a = new Array[Byte](30000); r.nextBytes(a); a },
      Array[Byte](0), Array.emptyByteArray,
      // enough distinct pairs to drive the width all the way to 16 bits
      Array.tabulate(300000)(i => ((i * 131) ^ (i >> 3)).toByte))
    cases.zipWithIndex.foreach { case (c, i) =>
      val z = Lzw.compressZ(c)
      val back = Lzw.decompressZ(z)
      assert(back.sameElements(c), s"round-trip drift on case $i (${c.length} bytes)")
    }
    // smaller max widths round-trip too (pre-16-bit encoders exist)
    for (mb <- Seq(9, 12, 13)) {
      val c = ("abcdef" * 4000).getBytes(StandardCharsets.UTF_8)
      assert(Lzw.decompressZ(Lzw.compressZ(c, maxBits = mb)).sameElements(c), s"maxBits=$mb")
    }
  }

  test("gzip and bsdcat decode our compressor's output (live interop)") {
    val gz = new java.io.File("/usr/bin/gzip")
    assume(gz.canExecute, "gzip not present")
    val payloads = Seq(
      ("text", ("lzw on the wire — café " * 300).getBytes(StandardCharsets.UTF_8)),
      ("runs", Array.tabulate(50000)(i => (i % 5).toByte)),
      ("noise", { val r = new scala.util.Random(9); val a = new Array[Byte](20000); r.nextBytes(a); a }),
      ("wide", Array.tabulate(400000)(i => ((i * 37) ^ (i >> 5)).toByte)))
    for ((label, data) <- payloads) {
      val tmp = java.nio.file.Files.createTempFile("lzwspec", ".Z")
      java.nio.file.Files.write(tmp, Lzw.compressZ(data))
      for (tool <- Seq(Seq("/usr/bin/gzip", "-dc", tmp.toString),
        Seq("/root/miniconda/bin/bsdcat", tmp.toString))
          if new java.io.File(tool.head).canExecute) {
        val p = new ProcessBuilder(tool: _*).start()
        val got = p.getInputStream.readAllBytes()
        val err = new String(p.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
        assert(p.waitFor() == 0, s"${tool.head} failed on $label: $err")
        assert(got.sameElements(data), s"${tool.head} decode drift on $label")
      }
      java.nio.file.Files.delete(tmp)
    }
  }

  test("CLEAR-code streams decode exactly as gzip decodes them (referee)") {
    // our encoder never emits CLEAR, so pin the post-CLEAR semantics
    // (group-pad with the OLD width, free re-seeding at the wasted 256
    // slot) against the canonical decoder: hand-pack code streams with
    // CLEARs and require byte-identical output from gzip -dc and us
    val gz = new java.io.File("/usr/bin/gzip")
    assume(gz.canExecute, "gzip not present")
    def pack(segments: Seq[Seq[Int]]): Array[Byte] = {
      // 9-bit codes throughout (all cases stay under 255 entries);
      // a CLEAR (256) ends each non-final segment, then pad to the
      // 72-bit group boundary measured from the segment origin
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x1F); out.write(0x9D); out.write(0x80 | 16)
      var bitBuf = 0L
      var bitCnt = 0
      var emitted = 0
      def put(c: Int): Unit = {
        bitBuf |= c.toLong << bitCnt; bitCnt += 9; emitted += 9
        while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      }
      def pad(): Unit = {
        val rem = emitted % 72
        if (rem != 0) {
          var padBits = 72 - rem
          if (bitCnt > 0) { out.write((bitBuf & 0xff).toInt); padBits -= 8 - bitCnt; bitBuf = 0; bitCnt = 0 }
          while (padBits > 0) { out.write(0); padBits -= 8 }
        }
        emitted = 0
      }
      segments.init.foreach { seg => seg.foreach(put); put(256); pad() }
      segments.last.foreach(put)
      if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
      out.toByteArray
    }
    val cases: Seq[Seq[Seq[Int]]] = Seq(
      // plain restart
      Seq(Seq('h', 'e', 'l', 'l', 'o'), Seq('w', 'o', 'r', 'l', 'd')),
      // post-clear dictionary USE: 'a','b','a' seeds 256(wasted)+257; 257="ba"
      Seq(Seq('x', 'y'), Seq('a', 'b', 'a', 257, 'c')),
      // two clears in a row, then use
      Seq(Seq('q'), Seq('r'), Seq('s', 't', 's', 257)),
      // clear exactly at a group boundary (8 codes -> rem 0, no pad)
      Seq(Seq('a', 'b', 'c', 'd', 'e', 'f', 'g', 'h'), Seq('z')))
    cases.zipWithIndex.foreach { case (segs, i) =>
      val z = pack(segs)
      val tmp = java.nio.file.Files.createTempFile("lzwclear", ".Z")
      java.nio.file.Files.write(tmp, z)
      val p = new ProcessBuilder("/usr/bin/gzip", "-dc", tmp.toString).start()
      val want = p.getInputStream.readAllBytes()
      val err = new String(p.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(p.waitFor() == 0, s"gzip rejected referee case $i: $err")
      val got = Lzw.decompressZ(z)
      assert(got.sameElements(want),
        s"case $i drift: ours='${new String(got)}' gzip='${new String(want)}'")
      java.nio.file.Files.delete(tmp)
    }
  }

  test("damage rejects by name, truncation yields only clean prefixes") {
    val data = ("prefix safety " * 1000).getBytes(StandardCharsets.UTF_8)
    val z = Lzw.compressZ(data)
    // bad magic / reserved flags / width out of range
    val m = z.clone(); m(1) = 0x00
    intercept[IllegalArgumentException](Lzw.decompressZ(m))
    val f = z.clone(); f(2) = (f(2) | 0x40).toByte
    val e1 = intercept[IllegalArgumentException](Lzw.decompressZ(f))
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val w = z.clone(); w(2) = (0x80 | 17).toByte
    val e2 = intercept[IllegalArgumentException](Lzw.decompressZ(w))
    assert(e2.getMessage.contains("out of range"), e2.getMessage)
    // truncation: decode either rejects or yields a clean PREFIX of the
    // original (a cut mid-code drops that code), never altered bytes
    for (cut <- Seq(3, 10, z.length / 2, z.length - 1)) {
      try {
        val got = Lzw.decompressZ(java.util.Arrays.copyOf(z, cut))
        assert(got.length <= data.length &&
          got.sameElements(java.util.Arrays.copyOf(data, got.length)),
          s"silent-wrong decode at cut=$cut")
      } catch { case e: IllegalArgumentException => assert(e.getMessage.contains("lzw")) }
    }
    // a code pointing past the dictionary is a named reject (flip a
    // high byte early in the stream until one trips)
    var tripped = false
    (3 until math.min(40, z.length)).foreach { at =>
      val c = z.clone(); c(at) = (c(at) ^ 0x80).toByte
      try { Lzw.decompressZ(c); () }
      catch { case e: IllegalArgumentException =>
        tripped = true
        assert(e.getMessage.contains("lzw"), e.getMessage)
      }
    }
    assert(tripped, "no corruption was ever detected in the first 37 bytes")
  }
}
