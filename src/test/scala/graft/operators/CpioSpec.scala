package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** cpio walk: canonical interop both directions — committed goldens
  * produced by `bsdcpio -o --format {newc,odc}` decode to the exact
  * source files, and `bsdcpio -it` lists our writer's output live for
  * every format (the binary is present: /root/miniconda/bin/bsdcpio).
  */
class CpioSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  for (fmt <- Seq("newc", "odc")) {
    test(s"decodes the canonical bsdcpio golden ($fmt)") {
      val es = Cpio.readEntries(res(s"cpio_golden_$fmt.cpio"))
      val byName = es.map(e => e.name.stripPrefix("./") -> e).toMap
      assert(byName.keySet == Set("file1.txt", "deep/file2.txt", "odd.bin"))
      assert(byName("file1.txt").payload.sameElements(res("cpio_member_file1.txt")))
      assert(byName("deep/file2.txt").payload.sameElements(res("cpio_member_file2.txt")))
      assert(byName("odd.bin").payload.sameElements(res("cpio_member_odd.bin")))
      assert(es.forall(_.isFile))
      assert(byName("odd.bin").size == 511L) // exercises the 4-byte pad path
    }
  }

  for (fmt <- Seq("newc", "crc", "odc")) {
    test(s"writer round-trips ($fmt)") {
      val in = Seq(
        "a/b/one.txt" -> "payload one — café".getBytes(StandardCharsets.UTF_8),
        "two.bin" -> Array.tabulate(513)(i => (i * 7).toByte),
        "empty.txt" -> Array.emptyByteArray)
      val bytes = Cpio.writeCpio(in, format = fmt)
      assert(Cpio.isCpio(bytes))
      val out = Cpio.readEntries(bytes)
      assert(out.map(_.name) == in.map(_._1))
      assert(out.zip(in).forall { case (g, (_, w)) => g.payload.sameElements(w) })
    }
  }

  test("the crc format actually verifies: a flipped payload byte rejects") {
    val bytes = Cpio.writeCpio(Seq("f.txt" -> "checksummed body".getBytes), format = "crc")
    assert(Cpio.readEntries(bytes).head.payload.length == 16)
    // locate the payload start robustly instead of guessing offsets
    val payloadAt = new String(bytes, StandardCharsets.ISO_8859_1)
      .indexOf("checksummed body")
    assert(payloadAt > 0)
    val c = bytes.clone()
    c(payloadAt) = (c(payloadAt) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Cpio.readEntries(c))
    assert(e.getMessage.contains("crc mismatch"), e.getMessage)
  }

  test("bsdcpio lists our writer's output (live interop, all formats)") {
    val bin = new java.io.File("/root/miniconda/bin/bsdcpio")
    assume(bin.canExecute, "bsdcpio not present")
    for (fmt <- Seq("newc", "crc", "odc")) {
      val bytes = Cpio.writeCpio(Seq(
        "usr/share/one.txt" -> s"via $fmt\n".getBytes(StandardCharsets.UTF_8),
        "two.bin" -> Array[Byte](1, 2, 3, 4, 5)), format = fmt)
      val tmp = java.nio.file.Files.createTempFile("cpiospec", ".cpio")
      java.nio.file.Files.write(tmp, bytes)
      val p = new ProcessBuilder("/bin/sh", "-c",
        s"/root/miniconda/bin/bsdcpio -it < ${tmp.toString}").start()
      val listing = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      val err = new String(p.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(p.waitFor() == 0, s"bsdcpio -it failed for $fmt: $err")
      assert(listing.linesIterator.toSeq == Seq("usr/share/one.txt", "two.bin"),
        s"listing drift for $fmt: $listing")
      java.nio.file.Files.delete(tmp)
    }
  }

  test("truncation, bad magic and trailing garbage reject by name") {
    val bytes = Cpio.writeCpio(Seq("x.txt" -> "body".getBytes))
    for (cut <- Seq(3, 80, 115, bytes.length - 8)) {
      val e = intercept[IllegalArgumentException](
        Cpio.readEntries(java.util.Arrays.copyOf(bytes, cut)))
      assert(e.getMessage.contains("cpio:"), s"cut=$cut: ${e.getMessage}")
    }
    val garbage = bytes ++ Array[Byte](0, 0, 7)
    val e = intercept[IllegalArgumentException](Cpio.readEntries(garbage))
    assert(e.getMessage.contains("trailing garbage"))
    // block padding with NULs (what real writers do) is accepted
    val padded = bytes ++ new Array[Byte](512 - bytes.length % 512)
    assert(Cpio.readEntries(padded).length == 1)
    val bad = bytes.clone(); bad(0) = '9'
    val e2 = intercept[IllegalArgumentException](Cpio.readEntries(bad))
    assert(e2.getMessage.contains("unknown magic") || e2.getMessage.contains("cpio:"))
  }
}
