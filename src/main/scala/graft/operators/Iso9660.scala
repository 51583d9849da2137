package graft.operators

import java.nio.charset.StandardCharsets

/** ISO 9660 disc images — the optical-media / software-preservation
  * corpus format (ECMA-119, the freely-published twin of ISO 9660;
  * SUSP/Rock Ridge per IEEE P1282; Joliet per the Microsoft spec).
  * Archive collections ship OS releases, shareware CDs and document
  * discs this way — a major ingest surface the reference engine (a
  * sketch library, /root/reference/README.md) never touches.
  *
  * Reader: volume-descriptor walk from sector 16 (primary + optional
  * Joliet supplementary, terminator required), recursive directory-
  * record walk with both-endian fields cross-checked, Rock Ridge NM
  * long names (SUSP entries walked, CE continuations within the
  * record's own area), and Joliet UCS-2 names as the fallback when no
  * Rock Ridge is present. Multi-extent files, interleaved files and
  * extended-attribute records stay NAMED rejects; depth and total
  * output are capped. File payloads come straight off the extent LBAs.
  *
  * Writer (fixtures + the their-read interop direction): a minimal
  * conforming level-2 image — system area, PVD, terminator, one sector
  * per directory, L + M path tables, Rock Ridge SP/PX/NM so exact
  * member names survive, sorted records, both-endian fields. bsdtar
  * (libarchive) lists and extracts our images live in Iso9660Spec, and
  * committed bsdtar-built goldens decode byte-identically here.
  *
  * Scale shape: per-record byte walk inside the archive-explode lanes;
  * an image decodes in one pass over its directory sectors plus exact
  * extent reads, bounded by `maxOut`.
  */
object Iso9660 {

  final case class IsoEntry(name: String, size: Long, payload: Array[Byte])

  private final val Sector = 2048
  private final val MaxDepth = 32

  def isIso(b: Array[Byte]): Boolean =
    b.length > 16 * Sector + 6 &&
      new String(b, 16 * Sector + 1, 5, StandardCharsets.US_ASCII) == "CD001"

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def u32be(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  /** Both-endian 32-bit field (ECMA-119 §7.3.3): LE copy then BE copy —
    * cross-checked, a mismatch is structural damage.
    */
  private def both32(b: Array[Byte], o: Int, what: String): Long = {
    val le = u32le(b, o)
    val be = u32be(b, o + 4)
    require(le == be, s"iso: both-endian $what mismatch ($le vs $be)")
    le
  }

  private final case class Rec(name: Array[Byte], su: Array[Byte],
      extent: Long, size: Long, isDir: Boolean)

  /** Parse one directory record at `o`; returns (record, nextOffset) or
    * None when the length byte is 0 (sector-boundary padding).
    */
  private def record(b: Array[Byte], o: Int): Option[(Rec, Int)] = {
    val len = b(o) & 0xff
    if (len == 0) return None
    require(len >= 34 && o + len <= b.length, "iso: directory record truncated")
    require((b(o + 1) & 0xff) == 0, "iso: extended-attribute records unsupported")
    val extent = both32(b, o + 2, "extent")
    val size = both32(b, o + 10, "data length")
    val flags = b(o + 25) & 0xff
    require((flags & 0x80) == 0, "iso: multi-extent files unsupported")
    require((b(o + 26) & 0xff) == 0 && (b(o + 27) & 0xff) == 0,
      "iso: interleaved files unsupported")
    val nameLen = b(o + 32) & 0xff
    require(33 + nameLen <= len, "iso: name overruns its record")
    val name = java.util.Arrays.copyOfRange(b, o + 33, o + 33 + nameLen)
    var suAt = 33 + nameLen
    if (suAt % 2 == 1) suAt += 1 // pad byte after even-length names
    val su = java.util.Arrays.copyOfRange(b, o + suAt, o + len)
    Some((Rec(name, su, extent, size, (flags & 0x02) != 0), o + len))
  }

  /** Rock Ridge NM name from a record's system-use area, if present.
    * SUSP entries are (sig2, len1, ver1, payload); NM payload is
    * (flags1, name). CONTINUE-flagged pieces concatenate.
    */
  private def rockRidgeName(su: Array[Byte]): Option[String] = {
    val sb = new StringBuilder
    var found = false
    var p = 0
    var continue = true
    while (continue && p + 4 <= su.length) {
      val len = su(p + 2) & 0xff
      if (len < 4 || p + len > su.length) continue = false
      else {
        if (su(p) == 'N' && su(p + 1) == 'M') {
          require(len >= 5, "iso: NM entry truncated")
          val flags = su(p + 4) & 0xff // NM: sig(2) len(1) ver(1) flags(1) name
          require((flags & 0x06) == 0, "iso: NM current/parent flags out of place")
          sb.append(new String(su, p + 5, len - 5, StandardCharsets.UTF_8))
          found = true
          if ((flags & 0x01) == 0) continue = false // no CONTINUE bit: done
        }
        p += len
      }
    }
    if (found) Some(sb.result()) else None
  }

  private def baseName(raw: Array[Byte], joliet: Boolean): String = {
    val s =
      if (joliet) { // UCS-2 big-endian
        require(raw.length % 2 == 0, "iso: odd Joliet name length")
        new String(raw, StandardCharsets.UTF_16BE)
      } else new String(raw, StandardCharsets.US_ASCII)
    val semi = s.indexOf(';') // strip the ";1" version suffix
    val noVer = if (semi >= 0) s.substring(0, semi) else s
    if (noVer.endsWith(".")) noVer.dropRight(1) else noVer
  }

  /** All files in the image, paths '/'-joined from the chosen name
    * source: Rock Ridge NM when present, Joliet when a supplementary
    * descriptor exists and the primary tree carries no Rock Ridge,
    * plain 9660 identifiers otherwise.
    */
  def readEntries(b: Array[Byte], maxOut: Int = 256 << 20): Seq[IsoEntry] = {
    require(b.length >= 18 * Sector, "iso: image shorter than the descriptor area")
    var pvdRoot: Array[Byte] = null
    var svdRoot: Array[Byte] = null
    var sector = 16
    var sawTerminator = false
    while (!sawTerminator) {
      val o = sector * Sector
      require(o + Sector <= b.length, "iso: descriptor area truncated")
      require(new String(b, o + 1, 5, StandardCharsets.US_ASCII) == "CD001",
        "iso: bad volume descriptor id")
      (b(o) & 0xff) match {
        case 1 =>
          require(pvdRoot == null, "iso: duplicate primary volume descriptor")
          pvdRoot = java.util.Arrays.copyOfRange(b, o + 156, o + 156 + 34)
        case 2 =>
          // Joliet announces itself with a UCS-2 escape sequence (25 2F 40/43/45)
          val esc = java.util.Arrays.copyOfRange(b, o + 88, o + 91)
          if (esc(0) == 0x25 && esc(1) == 0x2F &&
            (esc(2) == 0x40 || esc(2) == 0x43 || esc(2) == 0x45))
            svdRoot = java.util.Arrays.copyOfRange(b, o + 156, o + 156 + 34)
        case 255 => sawTerminator = true
        case _ => () // boot record / partition descriptors: metadata, skipped
      }
      sector += 1
      require(sector < 64, "iso: descriptor walk past the cap")
    }
    require(pvdRoot != null, "iso: no primary volume descriptor")

    var budget = maxOut.toLong
    var sawRockRidge = false

    def walk(rootRec: Array[Byte], joliet: Boolean): Seq[IsoEntry] = {
      val out = Seq.newBuilder[IsoEntry]
      def dir(extent: Long, size: Long, prefix: String, depth: Int): Unit = {
        require(depth <= MaxDepth, "iso: directory tree past the depth cap")
        require(extent * Sector + size <= b.length, "iso: directory extent out of range")
        var o = (extent * Sector).toInt
        val end = o + size.toInt
        var first = true
        while (o < end) {
          record(b, o) match {
            case None => o = ((o / Sector) + 1) * Sector // rest of sector is pad
            case Some((r, next)) =>
              val selfOrParent = r.name.length == 1 && (r.name(0) == 0 || r.name(0) == 1)
              if (!selfOrParent) {
                val rr = if (joliet) None else rockRidgeName(r.su)
                if (rr.isDefined) sawRockRidge = true
                val nm = rr.getOrElse(baseName(r.name, joliet))
                val path = if (prefix.isEmpty) nm else s"$prefix/$nm"
                if (r.isDir) dir(r.extent, r.size, path, depth + 1)
                else {
                  require(r.size <= budget, "iso: unpacked size past the cap")
                  require(r.extent * Sector + r.size <= b.length,
                    "iso: file extent out of range")
                  budget -= r.size
                  val at = (r.extent * Sector).toInt
                  out += IsoEntry(path, r.size,
                    java.util.Arrays.copyOfRange(b, at, at + r.size.toInt))
                }
              } else if (first) {
                require(r.name.length == 1 && r.name(0) == 0,
                  "iso: directory does not start with its self record")
              }
              first = false
              o = next
          }
        }
      }
      val (rext, rsize) = (both32(rootRec, 2, "root extent"), both32(rootRec, 10, "root size"))
      dir(rext, rsize, "", 0)
      out.result()
    }

    val primary = walk(pvdRoot, joliet = false)
    if (!sawRockRidge && svdRoot != null) {
      budget = maxOut.toLong
      walk(svdRoot, joliet = true)
    } else primary
  }

  // ------------------------------------------------------------- writer

  private final case class WDir(path: String,
      subdirs: scala.collection.mutable.LinkedHashMap[String, WDir],
      files: scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]) {
    var number = 0 // path-table directory number
    var extent = 0L
    var parent: WDir = null
  }

  /** Minimal conforming image: PVD + terminator, one 2048-byte sector
    * per directory (entry counts must fit — enforced), L and M path
    * tables, Rock Ridge SP/PX/NM names. File payloads sector-aligned.
    */
  def write(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty, "iso write: no entries")
    val root = WDir("", scala.collection.mutable.LinkedHashMap.empty,
      scala.collection.mutable.ArrayBuffer.empty)
    entries.foreach { case (path, data) =>
      val parts = path.split("/").toSeq
      require(parts.forall(_.nonEmpty), s"iso write: bad path '$path'")
      var d = root
      parts.init.foreach { seg =>
        d = d.subdirs.getOrElseUpdate(seg, {
          val nd = WDir(seg, scala.collection.mutable.LinkedHashMap.empty,
            scala.collection.mutable.ArrayBuffer.empty)
          nd.parent = d
          nd
        })
      }
      d.files += ((parts.last, data))
    }

    // breadth-first directory numbering (path tables want parents first)
    val dirs = scala.collection.mutable.ArrayBuffer.empty[WDir]
    root.parent = root
    val queue = scala.collection.mutable.Queue(root)
    while (queue.nonEmpty) {
      val d = queue.dequeue()
      d.number = dirs.length + 1
      dirs += d
      d.subdirs.values.foreach(queue.enqueue)
    }

    // ---- layout: [0..15 system] [16 PVD] [17 term] [path L] [path M]
    //      [dir sectors] [file extents]
    def pathTable(be: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      dirs.foreach { d =>
        val nm = if (d.number == 1) Array[Byte](0) else isoDirName(d)
        out.write(nm.length)
        out.write(0)
        val ext = d.extent
        if (be) (3 to 0 by -1).foreach(i => out.write(((ext >>> (8 * i)) & 0xff).toInt))
        else (0 until 4).foreach(i => out.write(((ext >>> (8 * i)) & 0xff).toInt))
        val pn = d.parent.number
        if (be) { out.write((pn >> 8) & 0xff); out.write(pn & 0xff) }
        else { out.write(pn & 0xff); out.write((pn >> 8) & 0xff) }
        out.write(nm)
        if (out.size() % 2 == 1) out.write(0)
      }
      out.toByteArray
    }

    // synthetic unique 9660 identifiers; Rock Ridge NM carries the truth
    def isoDirName(d: WDir): Array[Byte] = {
      val i = d.parent.subdirs.values.toSeq.indexWhere(_ eq d)
      s"D$i".getBytes(StandardCharsets.US_ASCII)
    }
    def isoFileName(i: Int): Array[Byte] =
      s"F$i.DAT;1".getBytes(StandardCharsets.US_ASCII)

    // assign extents: dirs first (one sector each), then files
    val pathL = pathTable(be = false)
    require(pathL.length <= Sector, "iso write: path table past one sector")
    val pathLSector = 18L
    val pathMSector = 19L
    var nextSector = 20L
    dirs.foreach { d => d.extent = nextSector; nextSector += 1 }
    val fileExtents = scala.collection.mutable.HashMap.empty[(String, Int), Long]
    dirs.foreach { d =>
      d.files.zipWithIndex.foreach { case ((_, data), i) =>
        fileExtents((d.path + "/" + d.number, i)) = nextSector
        nextSector += math.max(1L, (data.length + Sector - 1) / Sector)
      }
    }
    val totalSectors = nextSector

    def both32b(v: Long): Array[Byte] = {
      val a = new Array[Byte](8)
      (0 until 4).foreach(i => a(i) = ((v >>> (8 * i)) & 0xff).toByte)
      (0 until 4).foreach(i => a(4 + i) = ((v >>> (8 * (3 - i))) & 0xff).toByte)
      a
    }
    def both16b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    def dirRecord(nameField: Array[Byte], extent: Long, size: Long,
        isDir: Boolean, su: Array[Byte]): Array[Byte] = {
      val pad = (33 + nameField.length) % 2
      val len = 33 + nameField.length + pad + su.length
      require(len <= 255, "iso write: directory record past 255 bytes")
      val r = new Array[Byte](len)
      r(0) = len.toByte
      System.arraycopy(both32b(extent), 0, r, 2, 8)
      System.arraycopy(both32b(size), 0, r, 10, 8)
      // recording date: all zeros is tolerated; keep deterministic
      r(25) = (if (isDir) 0x02 else 0x00).toByte
      System.arraycopy(both16b(1), 0, r, 28, 4) // volume sequence number
      r(32) = nameField.length.toByte
      System.arraycopy(nameField, 0, r, 33, nameField.length)
      System.arraycopy(su, 0, r, 33 + nameField.length + pad, su.length)
      r
    }

    def suEntry(sig: String, payload: Array[Byte]): Array[Byte] = {
      val e = new Array[Byte](4 + payload.length)
      e(0) = sig(0).toByte; e(1) = sig(1).toByte
      e(2) = (4 + payload.length).toByte; e(3) = 1
      System.arraycopy(payload, 0, e, 4, payload.length)
      e
    }
    def px(mode: Long): Array[Byte] = // RR 1.09 PX: mode/links/uid/gid
      suEntry("PX", both32b(mode) ++ both32b(1) ++ both32b(0) ++ both32b(0))
    def nm(name: String): Array[Byte] =
      suEntry("NM", 0.toByte +: name.getBytes(StandardCharsets.UTF_8))
    val spEntry = suEntry("SP", Array(0xBE.toByte, 0xEF.toByte, 0))

    val img = new java.io.ByteArrayOutputStream()
    def padToSector(): Unit = while (img.size() % Sector != 0) img.write(0)
    img.write(new Array[Byte](16 * Sector)) // system area

    // ---- PVD (sector 16)
    val pvd = new Array[Byte](Sector)
    pvd(0) = 1
    "CD001".getBytes(StandardCharsets.US_ASCII).copyToArray(pvd, 1)
    pvd(6) = 1
    "GRAFT_CORPUS".padTo(32, ' ').getBytes(StandardCharsets.US_ASCII).copyToArray(pvd, 8) // system id
    "GRAFT_VOLUME".padTo(32, ' ').getBytes(StandardCharsets.US_ASCII).copyToArray(pvd, 40)
    System.arraycopy(both32b(totalSectors), 0, pvd, 80, 8) // volume space size
    System.arraycopy(both16b(1), 0, pvd, 120, 4) // volume set size
    System.arraycopy(both16b(1), 0, pvd, 124, 4) // volume sequence number
    System.arraycopy(both16b(Sector), 0, pvd, 128, 4) // logical block size
    System.arraycopy(both32b(pathL.length.toLong), 0, pvd, 132, 8) // path table size
    (0 until 4).foreach(i => pvd(140 + i) = ((pathLSector >>> (8 * i)) & 0xff).toByte)
    (0 until 4).foreach(i => pvd(148 + i) = ((pathMSector >>> (8 * (3 - i))) & 0xff).toByte)
    dirRecord(Array[Byte](0), dirs.head.extent, Sector, isDir = true,
      Array.emptyByteArray).copyToArray(pvd, 156)
    (190 until 813).foreach(i => pvd(i) = ' ') // volume set/publisher/app ids
    // the four 17-byte dates: 16 '0' digits + binary zone 0 = unspecified
    Seq(813, 830, 847, 864).foreach { o =>
      (o until o + 16).foreach(i => pvd(i) = '0')
      pvd(o + 16) = 0
    }
    pvd(881) = 1 // file structure version
    img.write(pvd)

    // ---- terminator (sector 17)
    val term = new Array[Byte](Sector)
    term(0) = 255.toByte
    "CD001".getBytes(StandardCharsets.US_ASCII).copyToArray(term, 1)
    term(6) = 1
    img.write(term)

    // ---- path tables
    img.write(pathL); padToSector()
    img.write(pathTable(be = true)); padToSector()

    // ---- directory sectors
    dirs.foreach { d =>
      val sec = new java.io.ByteArrayOutputStream()
      val selfSu = if (d eq root) spEntry ++ px(0x41ED) else px(0x41ED)
      sec.write(dirRecord(Array[Byte](0), d.extent, Sector, isDir = true, selfSu))
      sec.write(dirRecord(Array[Byte](1), d.parent.extent, Sector, isDir = true,
        px(0x41ED)))
      d.subdirs.values.foreach { c =>
        sec.write(dirRecord(isoDirName(c), c.extent, Sector, isDir = true,
          px(0x41ED) ++ nm(c.path)))
      }
      d.files.zipWithIndex.foreach { case ((name, data), i) =>
        sec.write(dirRecord(isoFileName(i), fileExtents((d.path + "/" + d.number, i)),
          data.length.toLong, isDir = false, px(0x81A4) ++ nm(name)))
      }
      require(sec.size() <= Sector,
        s"iso write: directory '${d.path}' overflows one sector")
      img.write(sec.toByteArray)
      padToSector()
    }

    // ---- file extents
    dirs.foreach { d =>
      d.files.foreach { case (_, data) =>
        img.write(data)
        padToSector()
        if (data.isEmpty) img.write(new Array[Byte](Sector))
      }
    }
    require(img.size() == totalSectors * Sector,
      s"iso write: layout drift (${img.size()} vs ${totalSectors * Sector})")
    img.toByteArray
  }
}
