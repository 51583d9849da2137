package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** ar(5) walk: canonical interop both directions — committed goldens
  * produced by GNU `ar rc` (binutils) decode to the exact source files,
  * and our writer's output is listed/extracted by the system `ar` when
  * the binary is present (it is, in this sandbox: /usr/bin/ar).
  */
class ArSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the canonical GNU ar golden (common names)") {
    val es = Ar.readEntries(res("ar_golden_common.a"))
    assert(es.map(_.name) == Seq("one.txt", "two.bin"))
    assert(es(0).payload.sameElements(res("ar_member_one.txt")))
    assert(es(1).payload.sameElements(res("ar_member_two.bin")))
    assert(es.map(_.size) == Seq(24L, 213L))
  }

  test("decodes the canonical GNU ar golden with a // long-name table") {
    val es = Ar.readEntries(res("ar_golden_long.a"))
    assert(es.map(_.name) ==
      Seq("one.txt", "a-very-long-member-name-past-fifteen.txt"))
    assert(es(0).payload.sameElements(res("ar_member_one.txt")))
    assert(es(1).payload.sameElements(res("ar_member_long.txt")))
  }

  test("writer round-trips, including long names and odd sizes") {
    val in = Seq(
      Ar.ArEntry("a.txt", 5L, "hello".getBytes(StandardCharsets.UTF_8)),
      Ar.ArEntry("an-extremely-long-member-name.bin", 3L, Array[Byte](1, 2, 3)),
      Ar.ArEntry("b", 1L, Array[Byte](9)))
    val bytes = Ar.writeAr(in)
    assert(Ar.isAr(bytes))
    val out = Ar.readEntries(bytes)
    assert(out.map(_.name) == in.map(_.name))
    assert(out.zip(in).forall { case (g, w) => g.payload.sameElements(w.payload) })
  }

  test("writer output is byte-identical to deterministic GNU ar rc") {
    // same member set as the committed golden: if the system ar is
    // present, rebuild it live and compare whole archives; always
    // compare against the committed golden bytes
    val one = res("ar_member_one.txt")
    val two = res("ar_member_two.bin")
    val ours = Ar.writeAr(Seq(
      Ar.ArEntry("one.txt", one.length.toLong, one),
      Ar.ArEntry("two.bin", two.length.toLong, two)))
    assert(ours.sameElements(res("ar_golden_common.a")),
      "writer drifted from the canonical GNU ar bytes")
    val long = res("ar_member_long.txt")
    val ours2 = Ar.writeAr(Seq(
      Ar.ArEntry("one.txt", one.length.toLong, one),
      Ar.ArEntry("a-very-long-member-name-past-fifteen.txt", long.length.toLong, long)))
    assert(ours2.sameElements(res("ar_golden_long.a")),
      "long-name writer drifted from the canonical GNU ar bytes")
  }

  test("system ar lists and extracts our writer's output (live interop)") {
    val bin = new java.io.File("/usr/bin/ar")
    assume(bin.canExecute, "system ar not present")
    val tmp = java.nio.file.Files.createTempDirectory("arspec")
    val f = tmp.resolve("ours.a")
    java.nio.file.Files.write(f, Ar.writeAr(Seq(
      Ar.ArEntry("x.txt", 7L, "payload".getBytes(StandardCharsets.UTF_8)),
      Ar.ArEntry("quite-a-long-name-indeed.txt", 4L, "data".getBytes(StandardCharsets.UTF_8)))))
    val p = new ProcessBuilder("/usr/bin/ar", "t", f.toString).start()
    val listing = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, "ar t exit")
    assert(listing.linesIterator.toSeq == Seq("x.txt", "quite-a-long-name-indeed.txt"))
    val px = new ProcessBuilder("/usr/bin/ar", "p", f.toString, "quite-a-long-name-indeed.txt").start()
    val body = new String(px.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(px.waitFor() == 0 && body == "data")
  }

  test("BSD inline names (#1/len) parse") {
    // hand-built per ar(5): BSD stores the name at the head of the data
    val name = "bsd-style-long-name.txt"
    val payload = "bsd body".getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    out.write("!<arch>\n".getBytes(StandardCharsets.US_ASCII))
    val hdr = (s"#1/${name.length}".padTo(16, ' ') + "0".padTo(12, ' ') +
      "0".padTo(6, ' ') + "0".padTo(6, ' ') + "644".padTo(8, ' ') +
      (name.length + payload.length).toString.padTo(10, ' ') + "`\n")
    out.write(hdr.getBytes(StandardCharsets.US_ASCII))
    out.write(name.getBytes(StandardCharsets.US_ASCII))
    out.write(payload)
    if (out.size() % 2 == 1) out.write('\n')
    val es = Ar.readEntries(out.toByteArray)
    assert(es.map(_.name) == Seq(name))
    assert(es.head.payload.sameElements(payload))
  }

  test("truncation and header corruption reject by name") {
    val bytes = res("ar_golden_common.a")
    // (8 bytes of bare magic is a LEGITIMATE empty archive, and dropping
    // only the final even-alignment '\n' pad still parses — not listed)
    for (cut <- Seq(4, 40, 70, bytes.length - 2)) {
      val e = intercept[IllegalArgumentException](
        Ar.readEntries(java.util.Arrays.copyOf(bytes, cut)))
      assert(e.getMessage.contains("ar:"), s"cut=$cut: ${e.getMessage}")
    }
    val c = bytes.clone()
    c(8 + 58) = 'X' // member header magic
    val e = intercept[IllegalArgumentException](Ar.readEntries(c))
    assert(e.getMessage.contains("header magic"))
    val s = bytes.clone()
    s(8 + 48) = 'q' // size field
    val e2 = intercept[IllegalArgumentException](Ar.readEntries(s))
    assert(e2.getMessage.contains("non-numeric"))
  }
}
