package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** xar walk: canonical interop both directions — a committed golden
  * built by `bsdtar --format xar` decodes to the exact source files
  * (TOC checksum + both member checksums verified live), and bsdtar
  * lists/extracts our writer's archives.
  */
class XarSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the canonical bsdtar xar golden") {
    val b = res("xar_golden_bsdtar.xar")
    assert(Xar.isXar(b))
    val es = Xar.readEntries(b)
    assert(es.map(_.name) == Seq("one.txt", "sub/two.bin"))
    assert(es(0).payload.sameElements(res("xar_member_one.txt")))
    assert(es(1).payload.sameElements(res("xar_member_two.bin")))
  }

  test("every declared checksum is actually checked") {
    val b = res("xar_golden_bsdtar.xar")
    // flip a byte in the compressed TOC -> TOC checksum (or inflate) fails
    val t = b.clone(); t(40) = (t(40) ^ 1).toByte
    val e1 = intercept[IllegalArgumentException](Xar.readEntries(t))
    assert(e1.getMessage.contains("xar:"), e1.getMessage)
    // flip a byte in a member's heap region -> archived-checksum fails
    val heapStart = {
      var v = 0L; (0 until 8).foreach(i => v = (v << 8) | (b(8 + i) & 0xffL))
      28 + v.toInt
    }
    val m = b.clone()
    m(heapStart + 25) = (m(heapStart + 25) ^ 1).toByte // inside member 1
    val e2 = intercept[IllegalArgumentException](Xar.readEntries(m))
    assert(e2.getMessage.contains("checksum mismatch") || e2.getMessage.contains("corrupt"),
      e2.getMessage)
  }

  test("writer round-trips, nested directories included") {
    val in = Seq(
      "top.txt" -> "alpha — café".getBytes(StandardCharsets.UTF_8),
      "a/b/deep.bin" -> Array.tabulate(2000)(i => (i * 17).toByte),
      "a/side.txt" -> "beta".getBytes(StandardCharsets.UTF_8))
    val bytes = Xar.write(in)
    assert(Xar.isXar(bytes))
    val out = Xar.readEntries(bytes)
    assert(out.map(_.name).toSet == in.map(_._1).toSet)
    val byName = out.map(e => e.name -> e).toMap
    in.foreach { case (n, w) => assert(byName(n).payload.sameElements(w), n) }
  }

  test("bsdtar lists and extracts our writer's archives (live interop)") {
    val bin = new java.io.File("/root/miniconda/bin/bsdtar")
    assume(bin.canExecute, "bsdtar not present")
    val in = Seq(
      "readme.txt" -> "xar payload\n".getBytes(StandardCharsets.UTF_8),
      "docs/inner.bin" -> Array.tabulate(900)(i => (i * 23).toByte))
    val tmp = java.nio.file.Files.createTempFile("xarspec", ".xar")
    java.nio.file.Files.write(tmp, Xar.write(in))
    val t = new ProcessBuilder(bin.getPath, "-tf", tmp.toString).start()
    val listing = new String(t.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val terr = new String(t.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(t.waitFor() == 0, s"bsdtar -tf failed: $terr")
    val listed = listing.linesIterator.toSet
    assert(listed.contains("readme.txt") && listed.contains("docs/inner.bin"), listing)
    val x = new ProcessBuilder(bin.getPath, "-xOf", tmp.toString, "docs/inner.bin").start()
    val body = x.getInputStream.readAllBytes()
    assert(x.waitFor() == 0 && body.sameElements(in(1)._2), "extraction drift")
    java.nio.file.Files.delete(tmp)
  }

  test("hostile input: truncation and unknown encodings reject by name") {
    val bytes = Xar.write(Seq("f.txt" -> "body".getBytes))
    for (cut <- Seq(3, 27, 40, bytes.length - 5)) {
      val e = intercept[IllegalArgumentException](
        Xar.readEntries(java.util.Arrays.copyOf(bytes, cut)))
      assert(e.getMessage.contains("xar:"), s"cut=$cut: ${e.getMessage}")
    }
  }
}
