package graft.operators

import java.nio.charset.StandardCharsets

/** OLE/CFB compound file binary format — the container two decades of
  * legacy Office shipped in (.doc/.xls/.ppt, and encrypted OOXML).
  * Public spec: [MS-CFB] (Microsoft Open Specifications). Structural
  * byte-walk in the house style: header → DIFAT → FAT → directory tree
  * → per-stream sector chains (regular or mini), every chain bounded
  * and cycle-checked; nothing is executed.
  *
  * Reader supports version 3 (512-byte sectors) and version 4 (4096);
  * the writer emits the version-3 layout wild files actually use. Small
  * streams (< 4096 bytes) live in the MINI stream per spec — the writer
  * produces them and the reader chases miniFAT chains, so the fixture
  * half exercises the same path wild .doc files take.
  *
  * Scale shape: per-record scalar walk inside the archive explode, the
  * PDF/office distribution story.
  */
object Cfb {

  final val MaxSectors = 1 << 20 // 512 MB of v3 sectors — far past any doc
  final val MaxStreamBytes = 64 << 20
  final val MaxDirEntries = 4096

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect = 0xFFFFFFFF

  def isCfb(b: Array[Byte]): Boolean = OfficeCodec.isOle(b)

  /** One directory entry: its (case-preserved) name, object type, and
    * resolved stream bytes (empty for storages).
    */
  final case class Entry(name: String, objectType: Int, size: Long,
      bytes: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  /** Walk the container and return every STREAM entry (type 2), by
    * name. Throws a named `IllegalArgumentException` for anything out
    * of profile.
    */
  def streams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(isCfb(bytes), "cfb: missing D0CF11E0 signature")
    require(bytes.length >= 512, "cfb: truncated header")
    val major = u16(bytes, 26)
    require(major == 3 || major == 4, s"cfb: unsupported major version $major")
    val sectorShift = u16(bytes, 30)
    require(sectorShift == (if (major == 3) 9 else 12),
      s"cfb: sector shift $sectorShift does not match version $major")
    val ssz = 1 << sectorShift
    val miniShift = u16(bytes, 32)
    require(miniShift == 6, s"cfb: mini sector shift $miniShift (spec: 6)")
    val miniCutoff = u32(bytes, 56)
    require(miniCutoff == 4096, s"cfb: mini stream cutoff $miniCutoff (spec: 4096)")
    val nSectors = (bytes.length - ssz) / ssz // header occupies one v3 sector slot
    def sector(i: Int): Array[Byte] = {
      require(i >= 0 && i < MaxSectors, s"cfb: sector $i out of range")
      val off = ssz * (i + 1)
      require(off + ssz <= bytes.length, s"cfb: sector $i past the buffer")
      java.util.Arrays.copyOfRange(bytes, off, off + ssz)
    }
    // ---- DIFAT: 109 header entries + chained DIFAT sectors
    val nFat = u32(bytes, 44).toInt
    require(nFat >= 0 && nFat <= MaxSectors, s"cfb: FAT sector count $nFat")
    val fatSectors = Vector.newBuilder[Int]
    var taken = 0
    var hi = 76
    while (taken < nFat && hi < 512) {
      val e = i32(bytes, hi)
      if (e != FreeSect) { fatSectors += e; taken += 1 }
      hi += 4
    }
    var difat = i32(bytes, 68)
    var difatHops = 0
    while (taken < nFat && difat != EndOfChain && difat != FreeSect) {
      require(difatHops < MaxSectors, "cfb: DIFAT chain cycle")
      val s = sector(difat)
      var o = 0
      while (taken < nFat && o < ssz - 4) {
        val e = i32(s, o)
        if (e != FreeSect) { fatSectors += e; taken += 1 }
        o += 4
      }
      difat = i32(s, ssz - 4)
      difatHops += 1
    }
    require(taken == nFat, s"cfb: DIFAT lists $taken of $nFat FAT sectors")
    // ---- FAT: concatenated entries of the FAT sectors
    val fat: Array[Int] = fatSectors.result().iterator.flatMap { fs =>
      val s = sector(fs)
      (0 until ssz by 4).iterator.map(o => i32(s, o))
    }.toArray
    def chain(start: Int, maxLen: Int): Vector[Int] = {
      val out = Vector.newBuilder[Int]
      var cur = start
      var n = 0
      while (cur != EndOfChain && cur != FreeSect) {
        require(cur >= 0 && cur < fat.length, s"cfb: chain hits sector $cur outside the FAT")
        require(n < maxLen, "cfb: sector chain longer than its stream (cycle?)")
        out += cur
        cur = fat(cur)
        n += 1
      }
      out.result()
    }
    def readChain(start: Int, size: Long): Array[Byte] = {
      require(size >= 0 && size <= MaxStreamBytes, s"cfb: stream size $size")
      val need = ((size + ssz - 1) / ssz).toInt
      val secs = chain(start, need + 1)
      require(secs.length >= need, s"cfb: chain has ${secs.length} sectors, stream needs $need")
      val out = new Array[Byte](size.toInt)
      var done = 0
      var i = 0
      while (done < size && i < secs.length) {
        val s = sector(secs(i))
        val take = math.min(ssz, size.toInt - done)
        System.arraycopy(s, 0, out, done, take)
        done += take
        i += 1
      }
      out
    }
    // ---- directory
    val dirBytes = {
      // directory stream size is not recorded in v3: read the whole chain
      val secs = chain(i32(bytes, 48), MaxDirEntries * 128 / ssz + 2)
      val out = new Array[Byte](secs.length * ssz)
      secs.zipWithIndex.foreach { case (sc, i) =>
        System.arraycopy(sector(sc), 0, out, i * ssz, ssz)
      }
      out
    }
    val nEntries = dirBytes.length / 128
    require(nEntries >= 1 && nEntries <= MaxDirEntries,
      s"cfb: $nEntries directory entries")
    def entryAt(i: Int): (String, Int, Int, Long) = {
      val o = i * 128
      val nameLen = u16(dirBytes, o + 64)
      val name =
        if (nameLen < 2 || nameLen > 64) ""
        else new String(dirBytes, o, nameLen - 2, StandardCharsets.UTF_16LE)
      val objType = dirBytes(o + 66) & 0xff
      val startSec = i32(dirBytes, o + 116)
      val size =
        if (major == 3) u32(dirBytes, o + 120) // v3: only the low 32 bits count
        else u32(dirBytes, o + 120) | (u32(dirBytes, o + 124) << 32)
      (name, objType, startSec, size)
    }
    val (_, rootType, rootStart, rootSize) = entryAt(0)
    require(rootType == 5, "cfb: first directory entry is not the root storage")
    // ---- mini FAT + mini stream (the root entry's chain)
    lazy val miniStream: Array[Byte] = readChain(rootStart, rootSize)
    lazy val miniFat: Array[Int] = {
      val n = u32(bytes, 64).toInt
      require(n >= 0 && n <= MaxSectors, s"cfb: miniFAT sector count $n")
      if (n == 0) Array.emptyIntArray
      else {
        val secs = chain(i32(bytes, 60), n + 1)
        secs.iterator.flatMap { fs =>
          val s = sector(fs)
          (0 until ssz by 4).iterator.map(o => i32(s, o))
        }.toArray
      }
    }
    def readMini(start: Int, size: Long): Array[Byte] = {
      require(size >= 0 && size <= MaxStreamBytes, s"cfb: mini stream size $size")
      val out = new Array[Byte](size.toInt)
      var cur = start
      var done = 0
      var hops = 0
      while (done < size) {
        require(cur >= 0 && cur < miniFat.length,
          s"cfb: mini chain hits sector $cur outside the miniFAT")
        require(hops <= miniFat.length, "cfb: mini chain cycle")
        val off = cur * 64
        require(off + 64 <= miniStream.length || off < miniStream.length,
          s"cfb: mini sector $cur past the mini stream")
        val take = math.min(64, size.toInt - done)
        require(off + take <= miniStream.length,
          s"cfb: mini sector $cur truncated")
        System.arraycopy(miniStream, off, out, done, take)
        done += take
        cur = miniFat(cur)
        hops += 1
      }
      out
    }
    // ---- collect stream entries (type 2); tree order is irrelevant for
    // extraction, so a linear scan over the directory sectors suffices
    // (and survives the broken sibling pointers wild files carry)
    val out = Map.newBuilder[String, Array[Byte]]
    var i = 1
    while (i < nEntries) {
      val (name, objType, startSec, size) = entryAt(i)
      if (objType == 2 && name.nonEmpty && size >= 0) {
        val data =
          if (size < miniCutoff) readMini(startSec, size)
          else readChain(startSec, size)
        out += name -> data
      }
      i += 1
    }
    out.result()
  }

  /** Header-grain triage: what kind of legacy Office file is this?
    * Returns "doc" / "xls" / "ppt" / "encrypted-ooxml" / None (an OLE
    * container that is none of them). Cost: the directory walk only —
    * stream names, no stream bytes.
    */
  def kind(bytes: Array[Byte]): Option[String] =
    try {
      val names = streams(bytes).keySet
      if (names.contains("WordDocument")) Some("doc")
      else if (names.contains("Workbook") || names.contains("Book")) Some("xls")
      else if (names.contains("PowerPoint Document")) Some("ppt")
      else if (names.contains("EncryptedPackage")) Some("encrypted-ooxml")
      else None
    } catch { case _: IllegalArgumentException => None }

  // ----------------------------------------------------------------- writer

  /** Version-3 writer — the fixture/oracle half. Streams smaller than
    * the 4096-byte cutoff go to the MINI stream exactly as the spec
    * demands, so reading them back exercises the miniFAT path.
    */
  def write(streamsIn: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streamsIn.nonEmpty, "cfb write: at least one stream")
    streamsIn.foreach { case (n, _) =>
      require(n.nonEmpty && n.length <= 31, s"cfb write: bad stream name '$n'")
    }
    val ssz = 512
    // ---- mini stream assembly (64-byte mini sectors) + miniFAT
    val mini = streamsIn.filter(_._2.length < 4096)
    val regular = streamsIn.filter(_._2.length >= 4096)
    val miniStartOf = scala.collection.mutable.Map.empty[String, Int]
    val miniBuf = new java.io.ByteArrayOutputStream()
    val miniFat = Vector.newBuilder[Int]
    var miniSec = 0
    mini.foreach { case (name, data) =>
      val n = math.max(1, (data.length + 63) / 64)
      miniStartOf(name) = if (data.length == 0) EndOfChain else miniSec
      miniBuf.write(data)
      val pad = n * 64 - data.length
      miniBuf.write(new Array[Byte](pad))
      (0 until n).foreach { k =>
        miniFat += (if (k == n - 1) EndOfChain else miniSec + k + 1)
      }
      miniSec += n
    }
    val miniStream = miniBuf.toByteArray
    val miniFatEntries = miniFat.result()
    // ---- sector plan: [FAT][directory][miniFAT][ministream][regular...]
    val dirCount = 1 + streamsIn.length
    val dirSectors = (dirCount * 128 + ssz - 1) / ssz
    val miniFatSectors = if (miniFatEntries.isEmpty) 0
      else (miniFatEntries.length * 4 + ssz - 1) / ssz
    val miniStreamSectors = (miniStream.length + ssz - 1) / ssz
    val regularSectors = regular.map { case (_, d) => (d.length + ssz - 1) / ssz }
    val dataSectors = dirSectors + miniFatSectors + miniStreamSectors +
      regularSectors.sum
    var nFat = 1
    while (nFat * (ssz / 4) < dataSectors + nFat) nFat += 1
    require(nFat <= 109, "cfb write: file too large for header-DIFAT layout")
    val total = nFat + dataSectors
    val fat = Array.fill(nFat * (ssz / 4))(FreeSect)
    var next = 0
    def alloc(n: Int): Int = {
      val start = next
      var i = 0
      while (i < n) {
        fat(start + i) = if (i == n - 1) EndOfChain else start + i + 1
        i += 1
      }
      next += n
      start
    }
    val fatStart = alloc(nFat)
    (0 until nFat).foreach(i => fat(fatStart + i) = 0xFFFFFFFD) // FATSECT
    val dirStart = alloc(dirSectors)
    val miniFatStart = if (miniFatSectors == 0) EndOfChain else alloc(miniFatSectors)
    val miniStreamStart = if (miniStreamSectors == 0) EndOfChain
      else alloc(miniStreamSectors)
    val regularStart = regular.zip(regularSectors).map { case ((name, _), n) =>
      name -> alloc(n)
    }.toMap
    // ---- directory entries: root(child=first stream), streams chained
    // via right-sibling pointers (a degenerate but well-formed tree)
    val dir = new Array[Byte](dirSectors * ssz)
    java.util.Arrays.fill(dir, 0.toByte)
    def putU16(o: Int, v: Int): Unit = {
      dir(o) = (v & 0xff).toByte; dir(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(o: Int, v: Int): Unit = {
      dir(o) = (v & 0xff).toByte; dir(o + 1) = ((v >> 8) & 0xff).toByte
      dir(o + 2) = ((v >> 16) & 0xff).toByte; dir(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def entry(i: Int, name: String, objType: Int, left: Int, right: Int,
        child: Int, start: Int, size: Long): Unit = {
      val o = i * 128
      val nb = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, dir, o, nb.length)
      putU16(o + 64, nb.length + 2)
      dir(o + 66) = objType.toByte
      dir(o + 67) = 1 // black
      putU32(o + 68, left); putU32(o + 72, right); putU32(o + 76, child)
      putU32(o + 116, start)
      putU32(o + 120, (size & 0xFFFFFFFFL).toInt)
    }
    entry(0, "Root Entry", 5, FreeSect, FreeSect,
      if (streamsIn.isEmpty) FreeSect else 1,
      if (miniStreamSectors == 0) EndOfChain else miniStreamStart,
      miniStream.length.toLong)
    streamsIn.zipWithIndex.foreach { case ((name, data), idx) =>
      val i = idx + 1
      val right = if (idx == streamsIn.length - 1) FreeSect else i + 1
      val start =
        if (data.length >= 4096) regularStart(name)
        else miniStartOf(name)
      entry(i, name, 2, FreeSect, right, FreeSect, start, data.length.toLong)
    }
    // unused tail entries in the last directory sector stay type 0 (zeroed)
    // ---- emit
    val out = new java.io.ByteArrayOutputStream((total + 1) * ssz)
    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    magic.zipWithIndex.foreach { case (b, i) => header(i) = b.toByte }
    def hU16(o: Int, v: Int): Unit = {
      header(o) = (v & 0xff).toByte; header(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def hU32(o: Int, v: Int): Unit = {
      header(o) = (v & 0xff).toByte; header(o + 1) = ((v >> 8) & 0xff).toByte
      header(o + 2) = ((v >> 16) & 0xff).toByte
      header(o + 3) = ((v >> 24) & 0xff).toByte
    }
    hU16(24, 0x003E); hU16(26, 3); hU16(28, 0xFFFE)
    hU16(30, 9); hU16(32, 6)
    hU32(44, nFat)
    hU32(48, dirStart)
    hU32(56, 4096)
    hU32(60, if (miniFatSectors == 0) EndOfChain else miniFatStart)
    hU32(64, miniFatSectors)
    hU32(68, EndOfChain); hU32(72, 0)
    (0 until 109).foreach(i => hU32(76 + 4 * i,
      if (i < nFat) fatStart + i else FreeSect))
    out.write(header)
    val body = new Array[Byte](total * ssz)
    // FAT sectors
    fat.zipWithIndex.foreach { case (e, i) =>
      val o = (fatStart * ssz) + i * 4
      body(o) = (e & 0xff).toByte; body(o + 1) = ((e >> 8) & 0xff).toByte
      body(o + 2) = ((e >> 16) & 0xff).toByte; body(o + 3) = ((e >> 24) & 0xff).toByte
    }
    System.arraycopy(dir, 0, body, dirStart * ssz, dir.length)
    if (miniFatSectors > 0) {
      miniFatEntries.zipWithIndex.foreach { case (e, i) =>
        val o = miniFatStart * ssz + i * 4
        body(o) = (e & 0xff).toByte; body(o + 1) = ((e >> 8) & 0xff).toByte
        body(o + 2) = ((e >> 16) & 0xff).toByte
        body(o + 3) = ((e >> 24) & 0xff).toByte
      }
      // pad rest of the miniFAT sector(s) with FREESECT
      var o = miniFatStart * ssz + miniFatEntries.length * 4
      while (o < (miniFatStart + miniFatSectors) * ssz) {
        body(o) = 0xFF.toByte; o += 1
      }
    }
    if (miniStreamSectors > 0)
      System.arraycopy(miniStream, 0, body, miniStreamStart * ssz, miniStream.length)
    regular.foreach { case (name, data) =>
      System.arraycopy(data, 0, body, regularStart(name) * ssz, data.length)
    }
    out.write(body)
    out.toByteArray
  }
}
