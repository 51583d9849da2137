package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP structural properties: store + deflate round-trips, JDK interop
  * in BOTH directions (our archives read by `ZipInputStream`, JDK
  * `ZipOutputStream` archives read by our central-directory walk —
  * including the data-descriptor entries the JDK emits for deflate),
  * and the strict failure modes: truncation, CRC damage, encryption,
  * multi-disk, unsupported methods. The zip sibling of
  * ArchiveIngestSpec's WARC/tar coverage.
  */
class ZipPropertiesSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def corpus: Seq[(String, Array[Byte])] = Seq(
    "a/one.txt" -> utf8("first member"),
    "a/two.txt" -> utf8("second member " * 40), // compressible
    "b/empty.bin" -> Array.emptyByteArray,
    "b/bytes.bin" -> Array.tabulate(1000)(i => (i * 31).toByte))

  test("store and deflate round-trip, sizes/CRC/method verified") {
    for (deflate <- Seq(false, true)) {
      val bytes = Zip.writeZip(corpus, deflate)
      assert(Zip.isZip(bytes))
      val back = Zip.readMembers(bytes)
      assert(back.map(_.name) == corpus.map(_._1))
      back.zip(corpus).foreach { case (m, (_, payload)) =>
        assert(java.util.Arrays.equals(m.payload, payload))
        assert(m.size == payload.length)
        assert(m.method == (if (deflate) 8 else 0))
        if (!deflate) assert(m.compressedSize == m.size)
      }
      // the compressible member must actually compress under deflate
      if (deflate) assert(back(1).compressedSize < back(1).size)
    }
  }

  test("a THIRD implementation's archive parses exactly (Info-ZIP golden)") {
    // committed golden from `zip -X` — cross-tool bytes beyond the JDK
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/$name")
      require(in != null, s"missing test resource $name")
      try in.readAllBytes() finally in.close()
    }
    val ms = Zip.readMembers(res("zip_golden_infozip.zip"))
    assert(ms.map(_.name) == Seq("one.txt", "sub/two.bin"))
    assert(ms(0).payload.sameElements(res("zip_member_one.txt")))
    assert(ms(1).payload.sameElements(res("zip_member_two.bin")))
  }

  test("Info-ZIP unzip verifies our archives (live interop, both methods)") {
    val bin = new java.io.File("/usr/bin/unzip")
    assume(bin.canExecute, "unzip not present")
    for (deflate <- Seq(false, true)) {
      val tmp = java.nio.file.Files.createTempFile("zipspec", ".zip")
      java.nio.file.Files.write(tmp, Zip.writeZip(corpus, deflate))
      // -t decompresses every member and checks its CRC
      val p = new ProcessBuilder("/usr/bin/unzip", "-t", tmp.toString).start()
      val outp = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"unzip -t failed (deflate=$deflate): $outp")
      assert(outp.contains("No errors detected"), outp)
      java.nio.file.Files.delete(tmp)
    }
  }

  test("zip64: a 70,000-member archive walks through the zip64 EOCD") {
    // python-zipfile golden (committed xz-compressed): EOCD counts carry
    // the 0xFFFF sentinel, the locator + zip64 EOCD hold the real bounds
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/$name")
      require(in != null, s"missing test resource $name")
      try in.readAllBytes() finally in.close()
    }
    val b = Xz.decompress(res("zip64_golden_many.zip.xz"), maxOut = 32 << 20)
    val names = Zip.memberNames(b)
    assert(names.length == 70000)
    assert(names.head == "m/00000.txt" && names.last == "m/69999.txt")
    val ms = Zip.readMembers(b)
    assert(ms.length == 70000)
    assert(new String(ms(12345).payload, "UTF-8") == "member 12345\n")
    assert(new String(ms.last.payload, "UTF-8") == "member 69999\n")
  }

  test("zip64: forced per-entry zip64 extras and 8-byte descriptors read") {
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/$name")
      require(in != null, s"missing test resource $name")
      try in.readAllBytes() finally in.close()
    }
    val ms = Zip.readMembers(res("zip64_golden_force.zip"))
    assert(ms.map(_.name) == Seq("forced.txt", "plain.txt"))
    assert(new String(ms(0).payload, "UTF-8") == "zip64-forced payload — café\n")
    assert(new String(ms(1).payload, "UTF-8") == "ordinary member\n")
  }

  test("zip64: a sentinel without the promised structures rejects by name") {
    // EOCD claiming 0xFFFF entries but no locator before it
    val bytes = Zip.writeZip(corpus.take(2), deflate = false).clone()
    val eocdAt = bytes.length - 22
    bytes(eocdAt + 8) = 0xff.toByte; bytes(eocdAt + 9) = 0xff.toByte
    bytes(eocdAt + 10) = 0xff.toByte; bytes(eocdAt + 11) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Zip.readMembers(bytes))
    assert(e.getMessage.contains("zip64"), e.getMessage)
  }

  test("JDK ZipInputStream reads our archives (both methods)") {
    for (deflate <- Seq(false, true)) {
      val in = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(Zip.writeZip(corpus, deflate)))
      val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .map(e => e.getName -> in.readAllBytes()).toSeq
      in.close()
      assert(got.map(_._1) == corpus.map(_._1))
      got.zip(corpus).foreach { case ((_, g), (_, p)) =>
        assert(java.util.Arrays.equals(g, p))
      }
    }
  }

  test("our walk reads JDK ZipOutputStream archives, incl. data-descriptor deflate") {
    for (stored <- Seq(true, false)) {
      val buf = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.ZipOutputStream(buf)
      corpus.foreach { case (name, payload) =>
        val e = new java.util.zip.ZipEntry(name)
        if (stored) {
          out.setMethod(java.util.zip.ZipOutputStream.STORED)
          e.setSize(payload.length.toLong)
          e.setCompressedSize(payload.length.toLong)
          val c = new java.util.zip.CRC32; c.update(payload); e.setCrc(c.getValue)
        } else out.setMethod(java.util.zip.ZipOutputStream.DEFLATED)
        out.putNextEntry(e)
        out.write(payload)
        out.closeEntry()
      }
      out.close()
      val back = Zip.readMembers(buf.toByteArray)
      assert(back.map(_.name) == corpus.map(_._1))
      back.zip(corpus).foreach { case (m, (_, p)) =>
        assert(java.util.Arrays.equals(m.payload, p))
      }
    }
  }

  test("truncation, payload damage, and hostile headers die loudly") {
    val bytes = Zip.writeZip(corpus, deflate = true)
    // truncated anywhere: EOCD gone or central directory overruns
    intercept[IllegalArgumentException](
      Zip.readMembers(java.util.Arrays.copyOf(bytes, bytes.length - 5)))
    intercept[IllegalArgumentException](
      Zip.readMembers(java.util.Arrays.copyOf(bytes, 10)))
    // a damaged payload byte must fail the CRC verify, not yield bad bytes
    val stored = Zip.writeZip(corpus, deflate = false)
    val members = Zip.readMembers(stored) // locate a payload via the clean walk
    val damaged = stored.clone()
    val victim = new String(stored, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("first member")
    damaged(victim) = 'X'
    val e = intercept[IllegalArgumentException](Zip.readMembers(damaged))
    assert(e.getMessage.contains("CRC"))
    assert(members.length == corpus.length) // clean walk was fine
    // flip the encrypted bit in the first central-directory entry
    val eocdAt = stored.length - 22
    def u32(b: Array[Byte], off: Int) =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val cdOff = u32(stored, eocdAt + 16).toInt
    val enc = stored.clone(); enc(cdOff + 8) = (enc(cdOff + 8) | 0x1).toByte
    assert(intercept[IllegalArgumentException](Zip.readMembers(enc))
      .getMessage.contains("encrypted"))
    // unsupported compression method (bzip2 = 12)
    val meth = stored.clone(); meth(cdOff + 10) = 12
    assert(intercept[IllegalArgumentException](Zip.readMembers(meth))
      .getMessage.contains("method"))
    // multi-disk
    val disk = stored.clone(); disk(eocdAt + 4) = 1
    assert(intercept[IllegalArgumentException](Zip.readMembers(disk))
      .getMessage.contains("multi-disk"))
  }

  test("hostile central directory: claimed usize past the member cap rejects BEFORE allocating") {
    val stored = Zip.writeZip(Seq("a.txt" -> "hi".getBytes("UTF-8")), deflate = false)
    def u32at(b: Array[Byte], off: Int) =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val cdOff = u32at(stored, stored.length - 22 + 16).toInt
    def patchUsize(v: Long): Array[Byte] = {
      val b = stored.clone()
      b(cdOff + 24) = (v & 0xff).toByte; b(cdOff + 25) = ((v >> 8) & 0xff).toByte
      b(cdOff + 26) = ((v >> 16) & 0xff).toByte; b(cdOff + 27) = ((v >> 24) & 0xff).toByte
      b
    }
    // just under 2^31: must hit the cap require, not a 2 GB allocation
    val e1 = intercept[IllegalArgumentException](Zip.readMembers(patchUsize(0x7ffffff0L)))
    assert(e1.getMessage.contains("member cap"))
    // in (2^31, 2^32-2): previously wrapped toInt negative (NegativeArraySizeException)
    val e2 = intercept[IllegalArgumentException](Zip.readMembers(patchUsize(0xfffffff0L)))
    assert(e2.getMessage.contains("member cap"))
    // a tighter caller-chosen cap fires on honest sizes too
    val e3 = intercept[IllegalArgumentException](Zip.readMembers(stored, maxMemberBytes = 1))
    assert(e3.getMessage.contains("member cap"))
  }

  test("hostile central directory: lying nameLen cannot read past the directory region") {
    val stored = Zip.writeZip(Seq("a.txt" -> "hi".getBytes("UTF-8")), deflate = false)
    def u32at(b: Array[Byte], off: Int) =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val cdOff = u32at(stored, stored.length - 22 + 16).toInt
    // nameLen inflated so name/extra/comment overrun the directory: must be
    // a named reject, never EOCD bytes silently read into the member name
    val lying = stored.clone()
    lying(cdOff + 28) = 0xff.toByte; lying(cdOff + 29) = 0x0f.toByte
    val e = intercept[IllegalArgumentException](Zip.readMembers(lying))
    assert(e.getMessage.contains("overrun the central directory"))
  }

  test("empty archive (bare EOCD) lists zero members") {
    val empty = Zip.writeZip(Seq.empty)
    assert(Zip.isZip(empty) && empty.length == 22)
    assert(Zip.readMembers(empty).isEmpty)
  }
}
