package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** ISO 9660 walk: canonical interop both directions — committed goldens
  * built by libarchive's `bsdtar --format iso9660` in all three naming
  * regimes (Rock Ridge, plain 9660, Joliet) decode to the exact source
  * files, and bsdtar lists/extracts our writer's images live. Goldens
  * ride in xz-compressed (an ISO is mostly sector padding); the xz
  * decoder has its own canonical gate.
  */
class Iso9660Spec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def iso(name: String): Array[Byte] = Xz.decompress(res(name))

  test("decodes the canonical bsdtar image with Rock Ridge names") {
    val b = iso("iso_golden_rr.iso.xz")
    assert(Iso9660.isIso(b))
    val es = Iso9660.readEntries(b)
    val byName = es.map(e => e.name -> e).toMap
    assert(byName.keySet == Set("readme-with-a-long-name.txt",
      "docs/nested-file.md", "docs/blob.bin"))
    assert(byName("readme-with-a-long-name.txt").payload.sameElements(res("iso_member_readme.txt")))
    assert(byName("docs/nested-file.md").payload.sameElements(res("iso_member_nested.md")))
    assert(byName("docs/blob.bin").payload.sameElements(res("iso_member_blob.bin")))
    assert(byName("docs/blob.bin").size == 4100L) // crosses a sector boundary
  }

  test("decodes the plain-9660 image (8.3 uppercase identifiers)") {
    val es = Iso9660.readEntries(iso("iso_golden_plain.iso.xz"))
    // without Rock Ridge the recorded identifiers are the truth: mangled
    // uppercase 8.3 — payloads must still be exact
    assert(es.size == 3)
    val readme = es.find(_.size == res("iso_member_readme.txt").length.toLong)
    assert(readme.isDefined && readme.get.payload.sameElements(res("iso_member_readme.txt")))
    assert(es.forall(e => e.name.toUpperCase == e.name))
    val blob = es.find(_.name.endsWith("BLOB.BIN")).getOrElse(fail("no BLOB.BIN"))
    assert(blob.payload.sameElements(res("iso_member_blob.bin")))
  }

  test("decodes the Joliet image (UCS-2 names, no Rock Ridge)") {
    val es = Iso9660.readEntries(iso("iso_golden_joliet.iso.xz"))
    val byName = es.map(e => e.name -> e).toMap
    assert(byName.keySet == Set("readme-with-a-long-name.txt",
      "docs/nested-file.md", "docs/blob.bin"), es.map(_.name))
    assert(byName("docs/blob.bin").payload.sameElements(res("iso_member_blob.bin")))
  }

  test("writer round-trips with exact names through Rock Ridge") {
    val in = Seq(
      "top-level-file.txt" -> "alpha — café".getBytes(StandardCharsets.UTF_8),
      "a/nested/deep-file.md" -> "beta".getBytes(StandardCharsets.UTF_8),
      "a/sector-crosser.bin" -> Array.tabulate(5000)(i => (i * 13).toByte),
      "a/nested/more.txt" -> "gamma".getBytes(StandardCharsets.UTF_8))
    val img = Iso9660.write(in)
    assert(img.length % 2048 == 0)
    assert(Iso9660.isIso(img))
    val out = Iso9660.readEntries(img)
    assert(out.map(_.name).toSet == in.map(_._1).toSet)
    val byName = out.map(e => e.name -> e).toMap
    in.foreach { case (n, w) =>
      assert(byName(n).payload.sameElements(w), s"payload drift in $n")
    }
  }

  test("bsdtar lists and extracts our writer's images (live interop)") {
    val bin = new java.io.File("/root/miniconda/bin/bsdtar")
    assume(bin.canExecute, "bsdtar not present")
    val in = Seq(
      "readme-long-name.txt" -> "payload one\n".getBytes(StandardCharsets.UTF_8),
      "docs/inner-file.bin" -> Array.tabulate(3000)(i => (i * 31).toByte))
    val tmp = java.nio.file.Files.createTempFile("isospec", ".iso")
    java.nio.file.Files.write(tmp, Iso9660.write(in))
    val t = new ProcessBuilder(bin.getPath, "-tf", tmp.toString).start()
    val listing = new String(t.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val terr = new String(t.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(t.waitFor() == 0, s"bsdtar -tf failed: $terr")
    val listed = listing.linesIterator.toSet
    assert(listed.contains("readme-long-name.txt") && listed.contains("docs/inner-file.bin"),
      s"listing drift: $listing")
    val x = new ProcessBuilder(bin.getPath, "-xOf", tmp.toString, "docs/inner-file.bin").start()
    val body = x.getInputStream.readAllBytes()
    assert(x.waitFor() == 0 && body.sameElements(in(1)._2), "extraction drift")
    java.nio.file.Files.delete(tmp)
  }

  test("damage rejects by name: descriptors, both-endian drift, extents") {
    val img = Iso9660.write(Seq("f.txt" -> "body".getBytes))
    // no terminator / bad descriptor id
    val noId = img.clone(); noId(16 * 2048 + 1) = 'X'
    val e1 = intercept[IllegalArgumentException](Iso9660.readEntries(noId))
    assert(e1.getMessage.contains("descriptor id"))
    // flip one byte of the BE copy of the root extent in the PVD record
    val bent = img.clone()
    bent(16 * 2048 + 156 + 6) = (bent(16 * 2048 + 156 + 6) ^ 1).toByte
    val e2 = intercept[IllegalArgumentException](Iso9660.readEntries(bent))
    assert(e2.getMessage.contains("both-endian"))
    // truncate inside the file extent
    val e3 = intercept[IllegalArgumentException](
      Iso9660.readEntries(java.util.Arrays.copyOf(img, img.length - 2048)))
    assert(e3.getMessage.contains("iso:"))
    // truncation inside the descriptor area
    val e4 = intercept[IllegalArgumentException](
      Iso9660.readEntries(java.util.Arrays.copyOf(img, 17 * 2048)))
    assert(e4.getMessage.contains("iso:"))
  }
}
