package graft.operators

import java.nio.charset.StandardCharsets

/** xar archives — the macOS package/installer container (.pkg, .xip,
  * Safari extensions; format per the public xar project documentation).
  * A big-endian 28-byte header, a zlib-compressed XML table of
  * contents, then a heap the TOC indexes by offset/length.
  *
  * Reader: header parsed and bounds-checked, TOC inflated (bounded)
  * and walked with the in-house hardened XML parser (DOCTYPE rejected),
  * the TOC checksum at heap offset 0 VERIFIED (sha1/md5/sha256 of the
  * compressed TOC per the header's algorithm field), every member's
  * archived-checksum (over heap bytes) AND extracted-checksum (over
  * decompressed bytes) verified when declared, member encodings
  * `application/x-gzip` (zlib, despite the name), `x-bzip2` and
  * `octet-stream` decoded in-house. Unknown encodings and checksum
  * styles are NAMED rejects; directories recurse through nested
  * `<file>` elements.
  *
  * Writer (fixtures + interop): zlib-encoded members, sha1 checksums,
  * same layout bsdtar produces. Canonical interop both directions via
  * libarchive (`bsdtar --format xar`): a committed bsdtar golden
  * decodes byte-identically and bsdtar lists/extracts our output live
  * in XarSpec.
  *
  * Scale shape: per-record byte walk inside the archive-explode lanes;
  * TOC first, then exact heap reads — ranged-fetch friendly like the
  * WARC/CDX and ISO paths. Total output bounded by `maxOut`.
  */
object Xar {

  final case class XarEntry(name: String, size: Long, payload: Array[Byte])

  def isXar(b: Array[Byte]): Boolean =
    b.length >= 28 && b(0) == 'x' && b(1) == 'a' && b(2) == 'r' && b(3) == '!'

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u64be(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  private def sha1(b: Array[Byte], from: Int, until: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(b, from, until - from)
    md.digest().map(x => f"$x%02x").mkString
  }

  private def digestName(alg: Long): String = alg match {
    case 1 => "SHA-1"
    case 2 => "MD5"
    case 3 => "SHA-256"
    case 4 => "SHA-512"
    case other => throw new IllegalArgumentException(
      s"xar: unknown TOC checksum algorithm $other")
  }

  private def inflateZlib(b: Array[Byte], from: Int, until: Int,
      maxOut: Long, what: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, from, until - from)
      val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 16).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(s"xar: corrupt $what stream: ${e.getMessage}")
          }
        require(n > 0 || inf.finished(), s"xar: truncated $what stream")
        require(out.size().toLong + n <= maxOut, s"xar: $what past the cap")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** Every file member, depth-first, paths '/'-joined. */
  def readEntries(b: Array[Byte], maxOut: Int = 256 << 20): Seq[XarEntry] = {
    require(isXar(b), "xar: bad magic")
    val headerSize = u16be(b, 4)
    require(headerSize >= 28 && headerSize <= b.length, "xar: bad header size")
    require(u16be(b, 6) == 1, s"xar: unsupported version ${u16be(b, 6)}")
    val tocZ = u64be(b, 8)
    val tocU = u64be(b, 16)
    val cksAlg = (b(24).toLong << 24) | ((b(25) & 0xffL) << 16) |
      ((b(26) & 0xffL) << 8) | (b(27) & 0xffL)
    require(tocZ > 0 && headerSize + tocZ <= b.length, "xar: TOC out of range")
    require(tocU <= (64 << 20), "xar: declared TOC size past the cap")
    val heap = (headerSize + tocZ).toInt
    val toc = inflateZlib(b, headerSize, heap, tocU, "TOC")
    require(toc.length == tocU, "xar: TOC size drift")
    val doc = XmlWalk.parse(toc)
    require(doc.getDocumentElement.getTagName == "xar", "xar: TOC root is not <xar>")

    def children(e: org.w3c.dom.Element, name: String): Seq[org.w3c.dom.Element] = {
      val kids = e.getChildNodes
      (0 until kids.getLength).flatMap { i =>
        kids.item(i) match {
          case el: org.w3c.dom.Element if el.getTagName == name => Some(el)
          case _ => None
        }
      }
    }
    def child(e: org.w3c.dom.Element, name: String): Option[org.w3c.dom.Element] =
      children(e, name).headOption
    def text(e: org.w3c.dom.Element): String = e.getTextContent.trim
    def num(s: String, what: String): Long =
      try s.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"xar: non-numeric $what '$s'")
      }

    val tocEl = child(doc.getDocumentElement, "toc")
      .getOrElse(throw new IllegalArgumentException("xar: TOC without <toc>"))

    // the TOC's own checksum lives at the declared heap offset
    child(tocEl, "checksum").foreach { ck =>
      val style = ck.getAttribute("style").toLowerCase
      val off = num(child(ck, "offset").map(text).getOrElse("0"), "TOC checksum offset")
      val sz = num(child(ck, "size").map(text).getOrElse("0"), "TOC checksum size")
      require(heap + off + sz <= b.length, "xar: TOC checksum out of range")
      val want = b.slice((heap + off).toInt, (heap + off + sz).toInt)
        .map(x => f"$x%02x").mkString
      val alg = style match {
        case "sha1" => "SHA-1"
        case "md5" => "MD5"
        case "sha256" => "SHA-256"
        case "sha512" => "SHA-512"
        case other => throw new IllegalArgumentException(s"xar: unknown checksum style '$other'")
      }
      require(alg == digestName(cksAlg),
        s"xar: TOC checksum style '$style' disagrees with the header")
      val md = java.security.MessageDigest.getInstance(alg)
      md.update(b, headerSize, tocZ.toInt)
      require(md.digest().map(x => f"$x%02x").mkString == want,
        "xar: TOC checksum mismatch")
    }

    var budget = maxOut.toLong
    val out = Seq.newBuilder[XarEntry]
    def walk(e: org.w3c.dom.Element, prefix: String): Unit = {
      children(e, "file").foreach { f =>
        val name = child(f, "name").map(text)
          .getOrElse(throw new IllegalArgumentException("xar: <file> without a name"))
        val path = if (prefix.isEmpty) name else s"$prefix/$name"
        val ftype = child(f, "type").map(text).getOrElse("file")
        ftype match {
          case "directory" => walk(f, path)
          case "file" =>
            val data = child(f, "data")
            val payload = data match {
              case None => Array.emptyByteArray
              case Some(d) =>
                val off = num(child(d, "offset").map(text).getOrElse("0"), "member offset")
                val len = num(child(d, "length").map(text).getOrElse("0"), "member length")
                val size = num(child(d, "size").map(text).getOrElse("0"), "member size")
                require(off >= 0 && len >= 0 && heap + off + len <= b.length,
                  "xar: member data out of range")
                require(size >= 0 && size <= budget, "xar: unpacked size past the cap")
                val from = (heap + off).toInt
                val until = (from + len).toInt
                def verify(which: String, over: => String): Unit =
                  child(d, which).foreach { ce =>
                    val style = ce.getAttribute("style").toLowerCase
                    require(style == "sha1", s"xar: unsupported $which style '$style'")
                    require(over == text(ce), s"xar: $which mismatch on '$path'")
                  }
                verify("archived-checksum", sha1(b, from, until))
                val enc = child(d, "encoding").map(_.getAttribute("style"))
                  .getOrElse("application/octet-stream")
                val dec = enc match {
                  case "application/octet-stream" =>
                    require(len == size, "xar: stored member size drift")
                    java.util.Arrays.copyOfRange(b, from, until)
                  case "application/x-gzip" => // xar's name for plain zlib
                    inflateZlib(b, from, until, size, s"member '$path'")
                  case "application/x-bzip2" =>
                    Bzip2.decompress(java.util.Arrays.copyOfRange(b, from, until),
                      maxOut = size.toInt)
                  case other => throw new IllegalArgumentException(
                    s"xar: unsupported member encoding '$other'")
                }
                require(dec.length == size, s"xar: member '$path' size drift")
                verify("extracted-checksum", sha1(dec, 0, dec.length))
                dec
            }
            budget -= payload.length
            out += XarEntry(path, payload.length.toLong, payload)
          case other => throw new IllegalArgumentException(
            s"xar: unsupported file type '$other'")
        }
      }
    }
    walk(tocEl, "")
    out.result()
  }

  /** Fixture writer, the layout bsdtar emits: sha1 TOC checksum at heap
    * offset 0, zlib-encoded members with both member checksums.
    */
  def write(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    // build heap: TOC checksum placeholder (20 bytes) then members
    val heap = new java.io.ByteArrayOutputStream()
    heap.write(new Array[Byte](20))
    final case class M(path: String, off: Long, len: Long, size: Long,
        arch: String, extr: String)
    val members = entries.map { case (path, data) =>
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val buf = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      val packed = buf.toByteArray
      val off = heap.size().toLong
      heap.write(packed)
      M(path, off, packed.length.toLong, data.length.toLong,
        sha1(packed, 0, packed.length), sha1(data, 0, data.length))
    }

    // nest members under directory <file> elements by path
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<xar>\n <toc>\n")
    sb.append("  <checksum style=\"sha1\">\n   <offset>0</offset>\n   <size>20</size>\n  </checksum>\n")
    var nextId = 1
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def emit(prefix: String, depth: Int): Unit = {
      val here = members.filter { m =>
        m.path.startsWith(prefix) && !m.path.drop(prefix.length).contains('/')
      }
      val dirs = members.flatMap { m =>
        val rest = m.path.drop(prefix.length)
        if (m.path.startsWith(prefix) && rest.contains('/'))
          Some(rest.takeWhile(_ != '/')) else None
      }.distinct
      val pad = " " * (depth + 2)
      here.foreach { m =>
        sb.append(s"$pad<file id=\"$nextId\">\n"); nextId += 1
        sb.append(s"$pad <name>${esc(m.path.drop(prefix.length))}</name>\n")
        sb.append(s"$pad <type>file</type>\n")
        sb.append(s"$pad <data>\n")
        sb.append(s"$pad  <length>${m.len}</length>\n")
        sb.append(s"$pad  <offset>${m.off}</offset>\n")
        sb.append(s"$pad  <size>${m.size}</size>\n")
        sb.append(s"$pad  <encoding style=\"application/x-gzip\"/>\n")
        sb.append(s"$pad  <archived-checksum style=\"sha1\">${m.arch}</archived-checksum>\n")
        sb.append(s"$pad  <extracted-checksum style=\"sha1\">${m.extr}</extracted-checksum>\n")
        sb.append(s"$pad </data>\n")
        sb.append(s"$pad</file>\n")
      }
      dirs.foreach { d =>
        sb.append(s"$pad<file id=\"$nextId\">\n"); nextId += 1
        sb.append(s"$pad <name>${esc(d)}</name>\n")
        sb.append(s"$pad <type>directory</type>\n")
        emit(s"$prefix$d/", depth + 1)
        sb.append(s"$pad</file>\n")
      }
    }
    emit("", 0)
    sb.append(" </toc>\n</xar>\n")
    val toc = sb.result().getBytes(StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater()
    d.setInput(toc); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val tocZ = zbuf.toByteArray

    val heapBytes = heap.toByteArray
    val md = java.security.MessageDigest.getInstance("SHA-1")
    System.arraycopy(md.digest(tocZ), 0, heapBytes, 0, 20)

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('x', 'a', 'r', '!'))
    out.write(Array[Byte](0, 28, 0, 1))
    (7 to 0 by -1).foreach(i => out.write(((tocZ.length.toLong >>> (8 * i)) & 0xff).toInt))
    (7 to 0 by -1).foreach(i => out.write(((toc.length.toLong >>> (8 * i)) & 0xff).toInt))
    out.write(Array[Byte](0, 0, 0, 1)) // checksum alg: sha1
    out.write(tocZ)
    out.write(heapBytes)
    out.toByteArray
  }
}
