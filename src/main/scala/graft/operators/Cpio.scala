package graft.operators

import java.nio.charset.StandardCharsets

/** cpio archives — the initramfs / RPM-payload container (formats per
  * the POSIX pax spec's cpio appendix and the GNU cpio manual; the
  * reference engine ships no archive readers, cf.
  * /root/reference/README.md — training-data ingest surface).
  *
  * Reads the two ASCII layouts that cover the wild population:
  *
  *   - `newc` ("070701", SVR4): 110-char hex header, name and data
  *     each 4-byte aligned from the archive start; the `crc` variant
  *     ("070702") is the same layout with c_check = the 32-bit sum of
  *     the data bytes, VERIFIED here;
  *   - `odc` ("070707", portable ASCII): 76-char octal header, no
  *     alignment.
  *
  * The binary ("\x71\xc7") layout predates portability and stays a
  * named reject, as does anything else. The walk ends at the
  * `TRAILER!!!` record; trailing NUL block padding (cpio writers pad to
  * 512) is accepted, any other trailing bytes reject. The writer emits
  * deterministic `newc` (mtime/uid/gid 0) or `crc` records.
  *
  * Canonical interop both directions via the sandbox's `bsdcpio`:
  * committed goldens in both formats decode byte-identically, and
  * `bsdcpio -it` lists our writer's output live in CpioSpec.
  *
  * Scale shape: per-record byte walk inside archive-explode lanes,
  * total output bounded by `maxOut`.
  */
object Cpio {

  final case class CpioEntry(name: String, mode: Int, size: Long,
      payload: Array[Byte]) {
    def isFile: Boolean = (mode & 0xF000) == 0x8000
    def isDir: Boolean = (mode & 0xF000) == 0x4000
  }

  def isCpio(b: Array[Byte]): Boolean =
    b.length >= 6 && {
      val m = new String(b, 0, 6, StandardCharsets.US_ASCII)
      m == "070701" || m == "070702" || m == "070707"
    }

  private def ascii(b: Array[Byte], at: Int, len: Int): String =
    new String(b, at, len, StandardCharsets.US_ASCII)

  private def hex8(b: Array[Byte], at: Int, what: String): Long = {
    val s = ascii(b, at, 8)
    require(s.forall(c => c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')),
      s"cpio: non-hex $what field '$s'")
    java.lang.Long.parseLong(s, 16)
  }

  private def oct(b: Array[Byte], at: Int, len: Int, what: String): Long = {
    val s = ascii(b, at, len)
    require(s.forall(c => c >= '0' && c <= '7'), s"cpio: non-octal $what field '$s'")
    java.lang.Long.parseLong(s, 8)
  }

  /** Every record up to the trailer. `maxOut` bounds TOTAL payload. */
  def readEntries(b: Array[Byte], maxOut: Int = 256 << 20): Seq[CpioEntry] = {
    require(b.length >= 6, "cpio: truncated before the magic")
    require(!(b.length >= 2 && (b(0) & 0xff) == 0xC7 && (b(1) & 0xff) == 0x71) &&
      !((b(0) & 0xff) == 0x71 && (b(1) & 0xff) == 0xC7),
      "cpio: pre-POSIX binary layout unsupported")
    val out = Seq.newBuilder[CpioEntry]
    var budget = maxOut.toLong
    var p = 0
    var done = false
    while (!done) {
      require(p + 6 <= b.length, "cpio: header truncated")
      val magic = ascii(b, p, 6)
      magic match {
        case "070701" | "070702" =>
          require(p + 110 <= b.length, "cpio: newc header truncated")
          val mode = hex8(b, p + 6 + 8, "mode")
          val fileSize = hex8(b, p + 6 + 8 * 6, "filesize")
          val nameSize = hex8(b, p + 6 + 8 * 11, "namesize")
          val check = hex8(b, p + 6 + 8 * 12, "check")
          require(nameSize >= 2 && nameSize <= (1 << 16), s"cpio: name size $nameSize out of range")
          var q = p + 110
          require(q + nameSize <= b.length, "cpio: name truncated")
          require(b((q + nameSize - 1).toInt) == 0, "cpio: name not NUL-terminated")
          val name = new String(b, q, nameSize.toInt - 1, StandardCharsets.UTF_8)
          q = (q + nameSize).toInt
          q = p + ((q - p + 3) & ~3) // name block pads to 4 from header start
          require(fileSize >= 0 && fileSize <= budget, "cpio: payload past the cap")
          require(q + fileSize <= b.length, "cpio: payload truncated")
          if (name == "TRAILER!!!") {
            require(fileSize == 0, "cpio: trailer with a payload")
            p = q
            done = true
          } else {
            val payload = java.util.Arrays.copyOfRange(b, q, (q + fileSize).toInt)
            if (magic == "070702") {
              var sum = 0L
              payload.foreach(x => sum = (sum + (x & 0xff)) & 0xFFFFFFFFL)
              require(sum == check, s"cpio: crc mismatch on '$name'")
            }
            budget -= fileSize
            out += CpioEntry(name, mode.toInt, fileSize, payload)
            q = (q + fileSize).toInt
            p = ((q + 3) & ~3)
          }
        case "070707" =>
          require(p + 76 <= b.length, "cpio: odc header truncated")
          val mode = oct(b, p + 6 + 6 * 2, 6, "mode")
          val nameSize = oct(b, p + 6 + 6 * 7 + 11, 6, "namesize")
          val fileSize = oct(b, p + 6 + 6 * 8 + 11, 11, "filesize")
          require(nameSize >= 2 && nameSize <= (1 << 16), s"cpio: name size $nameSize out of range")
          var q = p + 76
          require(q + nameSize <= b.length, "cpio: name truncated")
          require(b((q + nameSize - 1).toInt) == 0, "cpio: name not NUL-terminated")
          val name = new String(b, q, nameSize.toInt - 1, StandardCharsets.UTF_8)
          q = (q + nameSize).toInt
          require(fileSize >= 0 && fileSize <= budget, "cpio: payload past the cap")
          require(q + fileSize <= b.length, "cpio: payload truncated")
          if (name == "TRAILER!!!") {
            require(fileSize == 0, "cpio: trailer with a payload")
            p = q
            done = true
          } else {
            budget -= fileSize
            out += CpioEntry(name, mode.toInt,
              fileSize, java.util.Arrays.copyOfRange(b, q, (q + fileSize).toInt))
            p = (q + fileSize).toInt
          }
        case other =>
          throw new IllegalArgumentException(s"cpio: unknown magic '$other'")
      }
    }
    // writers block-pad the whole archive with NULs; anything else rejects
    while (p < b.length) {
      require(b(p) == 0, s"cpio: trailing garbage after the trailer (offset $p)")
      p += 1
    }
    out.result()
  }

  /** Deterministic writer: `format` ∈ newc | crc | odc. Files only
    * (mode 0100644), mtime/uid/gid 0, ino counting up — the
    * reproducible-build shape.
    */
  def writeCpio(entries: Seq[(String, Array[Byte])],
      format: String = "newc"): Array[Byte] = {
    require(Seq("newc", "crc", "odc").contains(format),
      s"cpio write: unknown format '$format'")
    val out = new java.io.ByteArrayOutputStream()
    def pad4(): Unit = while (out.size() % 4 != 0) out.write(0)
    def hexField(v: Long): String = f"$v%08x"
    def writeNewc(name: String, mode: Int, data: Array[Byte], ino: Int): Unit = {
      val check =
        if (format == "crc") data.foldLeft(0L)((a, x) => (a + (x & 0xff)) & 0xFFFFFFFFL)
        else 0L
      val h = new StringBuilder
      h.append(if (format == "crc") "070702" else "070701")
      h.append(hexField(ino.toLong)) // ino
      h.append(hexField(mode.toLong))
      h.append(hexField(0)) // uid
      h.append(hexField(0)) // gid
      h.append(hexField(1)) // nlink
      h.append(hexField(0)) // mtime
      h.append(hexField(data.length.toLong))
      h.append(hexField(0)); h.append(hexField(0)) // dev
      h.append(hexField(0)); h.append(hexField(0)) // rdev
      h.append(hexField(name.length + 1L))
      h.append(hexField(check))
      out.write(h.result().getBytes(StandardCharsets.US_ASCII))
      out.write(name.getBytes(StandardCharsets.UTF_8)); out.write(0)
      pad4()
      out.write(data)
      pad4()
    }
    def octField(v: Long, len: Int): String = {
      val s = java.lang.Long.toOctalString(v)
      require(s.length <= len, s"cpio write: field overflow $v")
      ("0" * (len - s.length)) + s
    }
    def writeOdc(name: String, mode: Int, data: Array[Byte], ino: Int): Unit = {
      val h = new StringBuilder
      h.append("070707")
      h.append(octField(0, 6)) // dev
      h.append(octField(ino.toLong, 6))
      h.append(octField(mode.toLong, 6))
      h.append(octField(0, 6)); h.append(octField(0, 6)) // uid gid
      h.append(octField(1, 6)) // nlink
      h.append(octField(0, 6)) // rdev
      h.append(octField(0, 11)) // mtime
      h.append(octField(name.length + 1L, 6))
      h.append(octField(data.length.toLong, 11))
      out.write(h.result().getBytes(StandardCharsets.US_ASCII))
      out.write(name.getBytes(StandardCharsets.UTF_8)); out.write(0)
      out.write(data)
    }
    var ino = 1
    entries.foreach { case (n, d) =>
      if (format == "odc") writeOdc(n, 0x81A4, d, ino) else writeNewc(n, 0x81A4, d, ino)
      ino += 1
    }
    if (format == "odc") writeOdc("TRAILER!!!", 0, Array.emptyByteArray, 0)
    else writeNewc("TRAILER!!!", 0, Array.emptyByteArray, 0)
    out.toByteArray
  }
}
