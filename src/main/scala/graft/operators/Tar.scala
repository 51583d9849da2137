package graft.operators

/** Structural POSIX ustar (tar) support — the archive format training
  * corpora actually ship in. A crawl-scale pipeline ingests tarballs as
  * opaque binary payloads and explodes them to member records inside the
  * partition (map-only; the archive bytes never cross a shuffle), so the
  * walk here is strict and allocation-light: 512-byte header blocks,
  * octal size fields, the spec's checksum verified per header (sum of
  * header bytes with the checksum field read as spaces), payloads padded
  * to block boundaries, end-of-archive = two zero blocks (or EOF —
  * truncated archives die loudly, never yield a silently-short listing).
  *
  * Format reference: POSIX.1-1988 ustar layout (public; reproduced in
  * every tar(5) man page). GNU extensions (longname 'L'/'K' records,
  * sparse files, PAX 'x' headers) are NOT silently skipped — they carry
  * member data a listing would misreport, so they reject loudly by
  * typeflag until genuinely needed.
  */
object Tar {

  /** One archive member. `typeflag` '0' (or NUL) = regular file, '5' =
    * directory, '1'/'2' = links — the walk returns them all; callers
    * filter. Payload is the exact `size` bytes (directories: empty).
    */
  case class TarEntry(name: String, size: Long, typeflag: Char, payload: Array[Byte])

  /** True iff a plausible ustar header sits at offset 0: the "ustar"
    * magic at byte 257 (both the POSIX "ustar\0" and historic "ustar "
    * forms) AND a valid header checksum — magic alone collides with any
    * text file containing "ustar" at the right offset.
    */
  def isTar(bytes: Array[Byte]): Boolean =
    bytes.length >= 512 &&
      bytes(257) == 'u' && bytes(258) == 's' && bytes(259) == 't' &&
      bytes(260) == 'a' && bytes(261) == 'r' &&
      checksumOk(bytes, 0)

  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) 32 else b(off + i) & 0xff)
      i += 1
    }
    sum == octal(b, off + 148, 8)
  }

  /** Parse a NUL/space-terminated octal field; -1 if empty/garbled.
    * STRICT: a byte that is neither an octal digit nor a terminator
    * (space/NUL) anywhere before the terminator is -1, not a partially
    * parsed prefix — a garbled size field under a still-valid checksum
    * must fire `readEntries`' loud reject, never slice a silently wrong
    * payload (e.g. '12X45678' must not parse as 10).
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = -1L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') { v = (if (v < 0) 0L else v) * 8 + (c - '0'); i += 1 }
      else if (c == ' ' && v < 0) i += 1 // leading spaces
      else if (c == ' ' || c == 0) i = end // terminator after digits (or empty field)
      else return -1L // garbled byte mid-field
    }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Walk the archive strictly: verified checksum per header, size within
    * bounds, loud reject of GNU/PAX special records. Stops at the
    * end-of-archive zero block; a truncated header or payload is an
    * error, not a short listing.
    */
  def readEntries(bytes: Array[Byte]): Seq[TarEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var p = 0
    while (p + 512 <= bytes.length) {
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (bytes(p + i) != 0) allZero = false; i += 1 }
      if (allZero) return out.toSeq // end-of-archive marker
      require(checksumOk(bytes, p), s"tar: header checksum mismatch at byte $p")
      val size = octal(bytes, p + 124, 12)
      require(size >= 0, s"tar: unparseable size field at byte $p")
      val tfRaw = bytes(p + 156) & 0xff
      val typeflag = if (tfRaw == 0) '0' else tfRaw.toChar
      require(typeflag != 'L' && typeflag != 'K' && typeflag != 'x' && typeflag != 'g',
        s"tar: GNU/PAX extension record '$typeflag' at byte $p — not supported")
      val prefix = str(bytes, p + 345, 155)
      val name0 = str(bytes, p, 100)
      val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
      require(name.nonEmpty, s"tar: empty member name at byte $p")
      val dataStart = p + 512
      require(dataStart + size <= bytes.length, s"tar: truncated payload for '$name'")
      out += TarEntry(name, size, typeflag,
        java.util.Arrays.copyOfRange(bytes, dataStart, (dataStart + size).toInt))
      p = dataStart + ((size + 511) / 512 * 512).toInt
    }
    require(p >= bytes.length, s"tar: truncated header at byte $p")
    out.toSeq
  }

  /** Write a POSIX ustar archive: spec checksums, octal fields, 512-byte
    * padding, two-zero-block trailer — readable by any tar implementation
    * (and by [[readEntries]], which [[TarPropertiesSpec]] pins both ways).
    * Member names must fit the 100-byte name field (+155 prefix split at a
    * '/'); this writer keeps it simple and requires name.length <= 100.
    */
  def writeTar(entries: Seq[TarEntry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { e =>
      val nameBytes = e.name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nameBytes.length <= 100, s"tar writer: name '${e.name}' exceeds 100 bytes")
      require(e.size == e.payload.length, s"tar writer: size ${e.size} != payload ${e.payload.length}")
      val h = new Array[Byte](512)
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
      def oct(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        var i = 0
        while (i < len - 1) { h(off + i) = padded.charAt(i).toByte; i += 1 }
        h(off + len - 1) = 0
      }
      oct(100, 8, 420) // mode 0644
      oct(108, 8, 0); oct(116, 8, 0) // uid/gid
      oct(124, 12, e.size)
      oct(136, 12, 0) // mtime: fixed 0 for determinism across runs
      h(156) = e.typeflag.toByte
      h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'; h(262) = 0
      h(263) = '0'; h(264) = '0' // version
      var i = 0
      while (i < 8) { h(148 + i) = ' '; i += 1 } // checksum field as spaces
      var sum = 0L
      i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      oct(148, 7, sum); h(155) = ' '
      out.write(h)
      out.write(e.payload)
      val pad = ((e.size + 511) / 512 * 512 - e.size).toInt
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
    out.toByteArray
  }
}
