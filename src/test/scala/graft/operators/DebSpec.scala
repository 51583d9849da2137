package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** deb(5) walk: canonical interop both directions — committed goldens
  * built by the system `dpkg-deb` (gz / xz / zstd / uncompressed)
  * decode to the exact control fields and payload files, and our
  * writer's packages pass `dpkg-deb --info/--contents/--fsys-tarfile`
  * live when the binary is present (it is: /usr/bin/dpkg-deb).
  */
class DebSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val goldenReadme = "deb payload one — café\n"
  private val goldenNotes = "second file body\n"

  for ((rsrc, comp) <- Seq(
      ("deb_golden_xz.deb", "xz"), ("deb_golden_gz.deb", "gzip"),
      ("deb_golden_zst.deb", "zstd"), ("deb_golden_none.deb", "none"))) {
    test(s"decodes the canonical dpkg-deb golden ($comp)") {
      val p = Deb.readPackage(res(rsrc))
      assert(p.formatVersion == "2.0")
      assert(p.compression == comp)
      assert(p.control("Package") == "graft-demo")
      assert(p.control("Version") == "1.4-2")
      assert(p.control("Architecture") == "all")
      assert(p.control("Description").startsWith("demo package for the deb ingest lane"))
      // multiline description: the continuation line survives
      assert(p.control("Description").contains("tiny fixture package"))
      val files = p.dataMembers.filter(_.typeflag == '0')
      val byName = files.map(e => e.name.stripPrefix("./") -> e).toMap
      assert(new String(byName("usr/share/doc/graft/readme.txt").payload,
        StandardCharsets.UTF_8) == goldenReadme)
      assert(new String(byName("usr/share/doc/graft/notes.md").payload,
        StandardCharsets.UTF_8) == goldenNotes)
    }
  }

  test("isDeb discriminates deb from plain ar") {
    assert(Deb.isDeb(res("deb_golden_xz.deb")))
    assert(!Deb.isDeb(res("ar_golden_common.a")))
  }

  for (comp <- Seq("xz", "gzip", "zstd", "none")) {
    test(s"writer round-trips ($comp)") {
      val bytes = Deb.write(
        Map("Package" -> "own-pkg", "Version" -> "0.1", "Architecture" -> "all",
          "Description" -> "first line\nsecond line"),
        Seq("usr/share/doc/own/a.txt" -> "alpha".getBytes(StandardCharsets.UTF_8),
          "usr/share/doc/own/b.txt" -> "beta".getBytes(StandardCharsets.UTF_8)),
        compression = comp)
      val p = Deb.readPackage(bytes)
      assert(p.control("Package") == "own-pkg")
      assert(p.control("Description") == "first line\nsecond line")
      assert(p.compression == (if (comp == "gzip") "gzip" else comp))
      val names = p.dataMembers.map(_.name.stripPrefix("./"))
      assert(names.contains("usr/share/doc/own/a.txt"))
    }
  }

  test("dpkg-deb reads our writer's packages (live interop, all codecs)") {
    val bin = new java.io.File("/usr/bin/dpkg-deb")
    assume(bin.canExecute, "dpkg-deb not present")
    for (comp <- Seq("xz", "gzip", "zstd", "none")) {
      val bytes = Deb.write(
        Map("Package" -> "graft-own", "Version" -> "2.7-1", "Architecture" -> "all",
          "Maintainer" -> "Corpus Builder <builder@corpus.invalid>",
          "Description" -> "own-writer package\nbody line"),
        Seq("usr/share/doc/graft-own/file.txt" ->
          s"payload via $comp\n".getBytes(StandardCharsets.UTF_8)),
        compression = comp)
      val tmp = java.nio.file.Files.createTempFile("debspec", ".deb")
      java.nio.file.Files.write(tmp, bytes)
      val info = new ProcessBuilder("/usr/bin/dpkg-deb", "--info", tmp.toString).start()
      val infoOut = new String(info.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      val infoErr = new String(info.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(info.waitFor() == 0, s"dpkg-deb --info failed for $comp: $infoErr")
      assert(infoOut.contains("Package: graft-own") && infoOut.contains("Version: 2.7-1"))
      val cont = new ProcessBuilder("/usr/bin/dpkg-deb", "--contents", tmp.toString).start()
      val contOut = new String(cont.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(cont.waitFor() == 0, s"dpkg-deb --contents failed for $comp")
      assert(contOut.contains("usr/share/doc/graft-own/file.txt"))
      java.nio.file.Files.delete(tmp)
    }
  }

  test("missing members and bad layout reject by name") {
    val okTar = Tar.writeTar(Seq(Tar.TarEntry("./control",
      "Package: x\n".length.toLong, '0', "Package: x\n".getBytes)))
    // no debian-binary first
    val noDb = Ar.writeAr(Seq(
      Ar.ArEntry("control.tar", okTar.length.toLong, okTar),
      Ar.ArEntry("data.tar", Tar.writeTar(Nil).length.toLong, Tar.writeTar(Nil))))
    val e1 = intercept[IllegalArgumentException](Deb.readPackage(noDb))
    assert(e1.getMessage.contains("debian-binary"))
    // data before control
    val db = Ar.ArEntry("debian-binary", 4L, "2.0\n".getBytes)
    val swapped = Ar.writeAr(Seq(db,
      Ar.ArEntry("data.tar", Tar.writeTar(Nil).length.toLong, Tar.writeTar(Nil)),
      Ar.ArEntry("control.tar", okTar.length.toLong, okTar)))
    val e2 = intercept[IllegalArgumentException](Deb.readPackage(swapped))
    assert(e2.getMessage.contains("precede"))
    // unknown compression extension
    val weird = Ar.writeAr(Seq(db,
      Ar.ArEntry("control.tar.br", 3L, Array[Byte](1, 2, 3)),
      Ar.ArEntry("data.tar", Tar.writeTar(Nil).length.toLong, Tar.writeTar(Nil))))
    val e3 = intercept[IllegalArgumentException](Deb.readPackage(weird))
    assert(e3.getMessage.contains("unsupported member compression"))
    // future format version
    val v3 = Ar.writeAr(Seq(Ar.ArEntry("debian-binary", 4L, "3.0\n".getBytes),
      Ar.ArEntry("control.tar", okTar.length.toLong, okTar),
      Ar.ArEntry("data.tar", Tar.writeTar(Nil).length.toLong, Tar.writeTar(Nil))))
    val e4 = intercept[IllegalArgumentException](Deb.readPackage(v3))
    assert(e4.getMessage.contains("format version"))
  }

  test("control parser: continuations, duplicates, malformed lines") {
    val m = Deb.parseControl("A: one\nB: two\n extra\n more\nC: three\n")
    assert(m("A") == "one")
    assert(m("B") == "two\nextra\nmore")
    assert(m("C") == "three")
    val e = intercept[IllegalArgumentException](Deb.parseControl("A: x\nA: y\n"))
    assert(e.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException](Deb.parseControl("no colon here\n"))
    assert(e2.getMessage.contains("malformed"))
  }
}
