package graft.operators

/** Structural ZIP support — the third archive format a crawl/training
  * corpus ships in (alongside WARC and tar). Same design as [[Tar]]:
  * archives are opaque binary payloads exploded to member records inside
  * the partition, map-only, so the walk is strict and verification-heavy
  * rather than permissive.
  *
  * The read path is the scale-correct one: find the End-Of-Central-
  * Directory record from the tail, walk the CENTRAL directory (the
  * authoritative index — local headers can lie under data-descriptor
  * streaming), then slice each member at its recorded local-header
  * offset. That is O(members) with no scan of the member data itself,
  * which is what makes (offset, length) random access possible on a
  * 100 TB object store — the same reason the CDX path exists for WARC.
  *
  * Per member: local-header signature cross-checked, payload inflated
  * (method 8) or sliced (method 0), CRC-32 and uncompressed size both
  * verified against the central directory. Zip64 reads natively (the
  * EOCD locator/record walk and the 0x0001 extra field — the
  * >65535-member and >4 GB shapes big corpora ship); encryption,
  * multi-disk and exotic compression methods reject loudly — a listing
  * that silently misreports members is worse than a dead task.
  *
  * Format reference: PKWARE APPNOTE.TXT (public; mirrored in every zip
  * implementation and in RFC 1951 for the deflate payloads).
  */
object Zip {

  /** One archive member, already decompressed and CRC-verified.
    * `method` is the spec's compression method id (0 = store,
    * 8 = deflate). Directories arrive as zero-length members with a
    * trailing '/' in the name, as the format convention has it.
    */
  case class ZipMember(name: String, method: Int, compressedSize: Long,
      size: Long, crc32: Long, payload: Array[Byte])

  private final val LocalSig = 0x04034b50L
  private final val CentralSig = 0x02014b50L
  private final val EocdSig = 0x06054b50L
  private final val Zip64EocdSig = 0x06064b50L
  private final val Zip64LocatorSig = 0x07064b50L

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** EOCD → (total entries, cd offset, cd size), following the zip64
    * locator when any classic field carries its 0xFFFF/0xFFFFFFFF
    * sentinel (APPNOTE 4.3.14/4.3.15) — the >65535-member and >4 GB
    * shapes large corpora actually ship. Multi-disk stays rejected.
    */
  private def directoryBounds(b: Array[Byte], eocd: Int): (Long, Long, Long) = {
    require(u16(b, eocd + 4) == 0 && u16(b, eocd + 6) == 0,
      "zip: multi-disk archives not supported")
    val total16 = u16(b, eocd + 10)
    require(u16(b, eocd + 8) == total16, "zip: this-disk entry count != total entry count")
    val cdSize32 = u32(b, eocd + 12)
    val cdOff32 = u32(b, eocd + 16)
    if (total16 != 0xffff && cdSize32 != 0xffffffffL && cdOff32 != 0xffffffffL)
      (total16.toLong, cdOff32, cdSize32)
    else {
      // the 20-byte zip64 EOCD locator sits directly before the EOCD
      require(eocd >= 20 && u32(b, eocd - 20) == Zip64LocatorSig,
        "zip: zip64 sentinel without a zip64 EOCD locator")
      require(u32(b, eocd - 16) == 0 && u32(b, eocd - 4) == 1,
        "zip: multi-disk zip64 archives not supported")
      val z = u64(b, eocd - 12)
      require(z >= 0 && z + 56 <= eocd - 20 && u32(b, z.toInt) == Zip64EocdSig,
        "zip: zip64 EOCD record missing at its declared offset")
      val zp = z.toInt
      require(u32(b, zp + 16) == 0 && u32(b, zp + 20) == 0,
        "zip: multi-disk zip64 archives not supported")
      val onDisk = u64(b, zp + 24)
      val total = u64(b, zp + 32)
      require(onDisk == total, "zip: zip64 this-disk entry count != total entry count")
      require(total >= 0 && total <= Int.MaxValue, "zip: zip64 entry count past the cap")
      require(total16 == 0xffff || total16.toLong == total,
        "zip: EOCD and zip64 EOCD disagree on the entry count")
      (total, u64(b, zp + 48), u64(b, zp + 40))
    }
  }

  /** Resolve a central-directory entry's (csize, usize, local-header
    * offset), reading the zip64 extra field (id 0x0001) for any field
    * that carries its 32-bit sentinel — fields appear there in spec
    * order, only the masked ones present.
    */
  private def entryBounds(b: Array[Byte], p: Int, nameLen: Int, extraLen: Int,
      csize0: Long, usize0: Long, lho0: Long): (Long, Long, Long) = {
    if (csize0 != 0xffffffffL && usize0 != 0xffffffffL && lho0 != 0xffffffffL)
      return (csize0, usize0, lho0)
    var csize = csize0
    var usize = usize0
    var lho = lho0
    var q = p + 46 + nameLen
    val qEnd = q + extraLen
    var found = false
    while (!found && q + 4 <= qEnd) {
      val id = u16(b, q)
      val sz = u16(b, q + 2)
      require(q + 4 + sz <= qEnd, "zip: extra field overruns its region")
      if (id == 0x0001) {
        var r = q + 4
        def take8(what: String): Long = {
          require(r + 8 <= q + 4 + sz, s"zip: zip64 extra field missing the $what")
          val v = u64(b, r); r += 8; v
        }
        if (usize == 0xffffffffL) usize = take8("uncompressed size")
        if (csize == 0xffffffffL) csize = take8("compressed size")
        if (lho == 0xffffffffL) lho = take8("local header offset")
        found = true
      }
      q += 4 + sz
    }
    require(found, "zip: zip64 sentinel without a zip64 extra field")
    (csize, usize, lho)
  }

  /** True iff the buffer starts with a local-file-header signature (or is
    * an empty archive: a bare EOCD). Header-only — pair with
    * [[readMembers]]'s full verification before trusting the contents.
    */
  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (u32(bytes, 0) == LocalSig || u32(bytes, 0) == EocdSig)

  /** Scan backwards for the EOCD signature (it sits at `length - 22`
    * when there is no archive comment; the comment can push it up to
    * 64 KiB earlier). Returns its offset.
    */
  private def findEocd(b: Array[Byte]): Int = {
    require(b.length >= 22, s"zip: ${b.length} bytes is too short for an EOCD record")
    var p = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xffff)
    while (p >= floor) {
      if (u32(b, p) == EocdSig &&
          p + 22 + u16(b, p + 20) == b.length) return p // comment-length must land at EOF
      p -= 1
    }
    throw new IllegalArgumentException("zip: no end-of-central-directory record — truncated or not a zip")
  }

  private def inflateRaw(raw: Array[Byte], expectedSize: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: zip stores bare RFC 1951 streams
    try {
      inf.setInput(raw)
      val out = new Array[Byte](expectedSize.toInt)
      var done = 0
      while (done < out.length && !inf.finished()) {
        val n = inf.inflate(out, done, out.length - done)
        if (n == 0) {
          require(!inf.needsInput(), "zip: truncated deflate stream")
          require(!inf.needsDictionary(), "zip: preset-dictionary deflate not supported")
        }
        done += n
      }
      require(done == out.length,
        s"zip: deflate stream ended at $done of ${out.length} expected bytes")
      // the stream must end EXACTLY at the expected size — one probe byte
      // consumes the final-block trailer (and catches oversized streams)
      val probe = new Array[Byte](1)
      require(inf.finished() || (inf.inflate(probe) == 0 && inf.finished()),
        s"zip: deflate stream continues past the ${out.length} expected bytes")
      out
    } finally inf.end()
  }

  /** Walk the central directory and return every member, decompressed and
    * verified (CRC-32 + size against the directory entry, local-header
    * signature at the recorded offset). Strict: any inconsistency —
    * truncation, encryption, an unsupported method, a CRC mismatch — is
    * an error, never a silently short or wrong listing.
    */
  /** Per-member decompressed-size cap: the central directory's claimed
    * `usize` drives the output allocation, so a few-KB hostile archive
    * claiming usize near 2^31 would otherwise force a 2 GB allocation per
    * member (executor OOM) before a single byte inflates. Validated with a
    * `require` BEFORE allocating — same policy as [[Gunzip.bounded]] and
    * the image pixel-budget guard.
    */
  final val DefaultMaxMemberBytes: Long = 1L << 30

  def readMembers(bytes: Array[Byte]): Seq[ZipMember] =
    readMembers(bytes, DefaultMaxMemberBytes)

  /** Header-only listing: the central directory's member NAMES without
    * touching a single payload byte — the triage pass ([[Multimodal]]'s
    * container probe, `OfficeCodec.sniff`) and the planner's
    * prune-by-name both run on this, so classifying a million archives
    * costs directory reads, never decompression. Structural checks are
    * the directory-level subset of [[readMembers]]' (EOCD, entry
    * signatures, field bounds); payload-level verification still
    * happens when a member is actually read.
    */
  def memberNames(bytes: Array[Byte]): Seq[String] = {
    val eocd = findEocd(bytes)
    val (total, cdOff, cdSize) = directoryBounds(bytes, eocd)
    require(cdOff + cdSize <= eocd, "zip: central directory overruns the EOCD record")
    val cdEnd = (cdOff + cdSize).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = cdOff.toInt
    var i = 0L
    while (i < total) {
      require(p + 46 <= cdEnd && u32(bytes, p) == CentralSig,
        s"zip: bad central-directory entry $i at byte $p")
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      require(p + 46 + nameLen + extraLen + commentLen <= cdEnd,
        s"zip: entry $i variable-length fields overrun the central directory")
      out += new String(bytes, p + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.toSeq
  }

  def readMembers(bytes: Array[Byte], maxMemberBytes: Long): Seq[ZipMember] = {
    val eocd = findEocd(bytes)
    val (total, cdOff, cdSize) = directoryBounds(bytes, eocd)
    require(cdOff + cdSize <= eocd, "zip: central directory overruns the EOCD record")
    val cdEnd = (cdOff + cdSize).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipMember]
    var p = cdOff.toInt
    var i = 0L
    while (i < total) {
      require(p + 46 <= cdEnd && u32(bytes, p) == CentralSig,
        s"zip: bad central-directory entry $i at byte $p")
      val flags = u16(bytes, p + 8)
      require((flags & 0x1) == 0, s"zip: entry $i is encrypted — not supported")
      // data-descriptor streaming (flag bit 3) is fine HERE: this walk
      // slices by the central directory's sizes, never the local header's,
      // and the descriptor bytes sit between payloads where nothing reads
      // them. (JDK ZipOutputStream sets the bit on every deflated entry.)
      val method = u16(bytes, p + 10)
      val crc = u32(bytes, p + 16)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      // variable-length fields must stay inside the directory region — a
      // lying nameLen must not read EOCD/comment bytes into a member name
      // (silently wrong listing) or index past the buffer
      require(p + 46 + nameLen + extraLen + commentLen <= cdEnd,
        s"zip: entry $i variable-length fields overrun the central directory")
      val (csize, usize, lho) = entryBounds(bytes, p, nameLen, extraLen,
        u32(bytes, p + 20), u32(bytes, p + 24), u32(bytes, p + 42))
      require(usize >= 0 && usize <= maxMemberBytes && usize <= Int.MaxValue - 8,
        s"zip: entry $i claims $usize uncompressed bytes — past the $maxMemberBytes-byte member cap")
      val name = new String(bytes, p + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      require(name.nonEmpty, s"zip: entry $i has an empty name")
      require(lho + 30 <= bytes.length && u32(bytes, lho.toInt) == LocalSig,
        s"zip: entry '$name' points at byte $lho which is not a local header")
      val lp = lho.toInt
      val dataOff = lp + 30 + u16(bytes, lp + 26) + u16(bytes, lp + 28)
      require(dataOff + csize <= bytes.length, s"zip: truncated payload for '$name'")
      val raw = java.util.Arrays.copyOfRange(bytes, dataOff, (dataOff + csize).toInt)
      val payload = method match {
        case 0 =>
          require(csize == usize, s"zip: stored entry '$name' has csize $csize != usize $usize")
          raw
        case 8 => inflateRaw(raw, usize)
        case m => throw new IllegalArgumentException(
          s"zip: entry '$name' uses compression method $m — only store(0)/deflate(8) supported")
      }
      val c = new java.util.zip.CRC32
      c.update(payload)
      require(c.getValue == crc,
        s"zip: CRC mismatch on '$name' (directory ${crc.toHexString}, data ${c.getValue.toHexString})")
      out += ZipMember(name, method, csize, usize.toLong, crc, payload)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    require(p == cdEnd,
      s"zip: central-directory walk ended at byte $p, expected $cdEnd — directory size lies")
    out.toSeq
  }

  /** Write an archive readable by any zip implementation (JDK
    * `ZipInputStream` interop is pinned by `ZipPropertiesSpec`).
    * `deflate = true` compresses members with bare RFC 1951 deflate;
    * false stores them. All timestamps are the fixed DOS epoch so output
    * is byte-deterministic across runs and JVMs.
    */
  def writeZip(members: Seq[(String, Array[Byte])], deflate: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    require(members.length <= 0xfffe, "zip writer: zip64 member counts not emitted")
    case class Written(name: Array[Byte], method: Int, crc: Long, csize: Int, usize: Int, off: Int)
    val written = members.map { case (name, payload) =>
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nameBytes.length <= 0xffff, s"zip writer: name '$name' too long")
      val c = new java.util.zip.CRC32
      c.update(payload)
      val compressed = if (deflate) {
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        try {
          d.setInput(payload); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          buf.toByteArray
        } finally d.end()
      } else payload
      val method = if (deflate) 8 else 0
      val off = out.size()
      w32(LocalSig); w16(20); w16(0); w16(method); w16(0); w16(0x21) // version, flags, method, DOS time/date
      w32(c.getValue); w32(compressed.length.toLong); w32(payload.length.toLong)
      w16(nameBytes.length); w16(0)
      out.write(nameBytes); out.write(compressed)
      Written(nameBytes, method, c.getValue, compressed.length, payload.length, off)
    }
    val cdOff = out.size()
    written.foreach { e =>
      w32(CentralSig); w16(20); w16(20); w16(0); w16(e.method); w16(0); w16(0x21)
      w32(e.crc); w32(e.csize.toLong); w32(e.usize.toLong)
      w16(e.name.length); w16(0); w16(0) // name/extra/comment lengths
      w16(0); w16(0); w32(0) // disk, internal attrs, external attrs
      w32(e.off.toLong)
      out.write(e.name)
    }
    val cdSize = out.size() - cdOff
    w32(EocdSig); w16(0); w16(0); w16(written.length); w16(written.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }
}
