package graft.operators

/** 7z container — the LZMA-family archive format (7zFormat.txt in the
  * 7-Zip source distribution; the reference engine ships no archive
  * readers at all, cf. /root/reference/README.md — this is part of the
  * training-data ingest surface).
  *
  * Decode support: signature + start header (both CRC32s verified),
  * plain and ENCODED (LZMA-compressed) next headers, the property-tree
  * walk (PackInfo / UnpackInfo / SubStreamsInfo / FilesInfo), solid
  * folders split into substreams, per-substream CRC32 verification, and
  * single-coder folders over the coders a 100 TB text pipeline meets:
  *
  *   - Copy            (id 00)
  *   - LZMA1           (id 03 01 01 — props byte + LE32 dict size)
  *   - LZMA2           (id 21 — dict-size props byte)
  *   - Deflate         (id 04 01 08 — raw deflate)
  *   - BZip2           (id 04 02 02 — a standard bzip2 stream)
  *   - Zstd            (id 04 F7 11 01 — the 7-Zip-zstd/libarchive id)
  *
  * Everything else stays a NAMED reject: AES-256 encrypted archives,
  * BCJ/BCJ2 branch-filter chains, PPMd, Delta, multi-coder folders,
  * external (out-of-header) structures, anti-files. No silent-wrong:
  * every size is cross-checked against the container's declaration and
  * every declared CRC is verified.
  *
  * VERIFICATION — canonical interop both directions via libarchive's
  * `bsdtar --format 7zip` (the sandbox's second implementation, the
  * same gate the codecs get from bzip2/xz/lz4): committed bsdtar-built
  * goldens across the full compression matrix (including LZMA1-encoded
  * headers, which libarchive emits by default) decode byte-identically,
  * and bsdtar lists/extracts our writer's archives live in SevenzSpec.
  * A HAND-BUILT byte-literal fixture written straight from 7zFormat.txt
  * additionally pins the framing independent of any tool.
  *
  * Scale shape: a pure byte-level codec driven per record inside the
  * archive-explode lanes — map-only, bounded by `maxOut`, nothing
  * crosses an exchange.
  */
object Sevenz {

  /** One extracted member (directories are not materialized). */
  final case class SzEntry(name: String, size: Long, payload: Array[Byte])

  private val Sig = Array[Byte]('7', 'z', 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C)

  def isSevenz(b: Array[Byte]): Boolean =
    b.length >= 6 && (0 until 6).forall(i => b(i) == Sig(i))

  // property ids (7zFormat.txt)
  private final val KEnd = 0x00
  private final val KHeader = 0x01
  private final val KArchiveProperties = 0x02
  private final val KAdditionalStreamsInfo = 0x03
  private final val KMainStreamsInfo = 0x04
  private final val KFilesInfo = 0x05
  private final val KPackInfo = 0x06
  private final val KUnpackInfo = 0x07
  private final val KSubStreamsInfo = 0x08
  private final val KSize = 0x09
  private final val KCRC = 0x0A
  private final val KFolder = 0x0B
  private final val KCodersUnpackSize = 0x0C
  private final val KNumUnpackStream = 0x0D
  private final val KEmptyStream = 0x0E
  private final val KEmptyFile = 0x0F
  private final val KAnti = 0x10
  private final val KName = 0x11
  private final val KEncodedHeader = 0x17

  private final val MaxHeaderBytes = 64 << 20
  private final val MaxEntries = 1 << 20

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, from, until - from)
    c.getValue
  }

  private def leU32(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def leU64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  // --------------------------------------------------- header byte walk

  private final class Rd(val b: Array[Byte], var p: Int, val end: Int) {
    def u8: Int = {
      require(p < end, "7z: header truncated")
      val v = b(p) & 0xff; p += 1; v
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && p + n <= end, "7z: header truncated")
      val v = java.util.Arrays.copyOfRange(b, p, p + n); p += n; v
    }
    /** The spec's variable-length REAL_UINT64: the first byte's leading
      * one-bits count the extra little-endian bytes; its remaining low
      * bits are the value's HIGH part.
      */
    def num: Long = {
      val first = u8
      var mask = 0x80
      var value = 0L
      var i = 0
      while (i < 8) {
        if ((first & mask) == 0)
          return value | ((first & (mask - 1)).toLong << (8 * i))
        value |= u8.toLong << (8 * i)
        mask >>= 1
        i += 1
      }
      value
    }
    def numInt(what: String, cap: Int): Int = {
      val v = num
      require(v >= 0 && v <= cap, s"7z: $what $v past the cap $cap")
      v.toInt
    }
    /** MSB-first packed bit vector. */
    def bits(n: Int): Array[Boolean] = {
      val out = new Array[Boolean](n)
      var i = 0
      var cur = 0
      var mask = 0
      while (i < n) {
        if (mask == 0) { cur = u8; mask = 0x80 }
        out(i) = (cur & mask) != 0
        mask >>= 1
        i += 1
      }
      out
    }
    /** allAreDefined byte, then a bit vector only when it is 0. */
    def optBits(n: Int): Array[Boolean] =
      if (u8 != 0) Array.fill(n)(true) else bits(n)
  }

  private final case class Coder(id: String, props: Array[Byte])

  private final case class Folder(coder: Coder, unpackSize: Long, crc: Option[Long])

  private final case class StreamsInfo(
      packPos: Long,
      packSizes: Seq[Long],
      packCrcs: Seq[Option[Long]],
      folders: Seq[Folder],
      // per folder: substream sizes and (optional) CRCs; defaults to the
      // folder itself when no SubStreamsInfo block is present
      subSizes: Seq[Seq[Long]],
      subCrcs: Seq[Seq[Option[Long]]])

  private def readDigests(rd: Rd, n: Int): Seq[Option[Long]] = {
    val defined = rd.optBits(n)
    defined.toSeq.map(d => if (d) Some(leU32(rd.bytes(4), 0)) else None)
  }

  private def readFolder(rd: Rd): Coder = {
    val numCoders = rd.numInt("folder coder count", 64)
    require(numCoders == 1,
      "7z: multi-coder folders (filter chains) unsupported")
    val flag = rd.u8
    require((flag & 0x80) == 0, "7z: alternative coder methods unsupported")
    val idSize = flag & 0x0F
    val id = rd.bytes(idSize).map(x => f"$x%02x").mkString
    if ((flag & 0x10) != 0) {
      val nIn = rd.num; val nOut = rd.num
      require(nIn == 1 && nOut == 1,
        "7z: multi-stream coders (BCJ2) unsupported")
    }
    val props = if ((flag & 0x20) != 0) rd.bytes(rd.numInt("coder props size", 1 << 16))
      else Array.emptyByteArray
    Coder(id, props)
  }

  private def readStreamsInfo(rd: Rd): StreamsInfo = {
    var packPos = 0L
    var packSizes: Seq[Long] = Nil
    var packCrcs: Seq[Option[Long]] = Nil
    var folders: Seq[Folder] = Nil
    var numUnpack: Seq[Int] = Nil
    var subSizes: Seq[Seq[Long]] = Nil
    var subCrcs: Seq[Seq[Option[Long]]] = Nil

    var id = rd.numInt("property id", 0xFF)
    if (id == KPackInfo) {
      packPos = rd.num
      val n = rd.numInt("pack stream count", MaxEntries)
      var t = rd.numInt("property id", 0xFF)
      while (t != KEnd) {
        t match {
          case KSize => packSizes = (0 until n).map(_ => rd.num)
          case KCRC => packCrcs = readDigests(rd, n)
          case other => throw new IllegalArgumentException(
            f"7z: unexpected property 0x$other%02X in PackInfo")
        }
        t = rd.numInt("property id", 0xFF)
      }
      require(packSizes.length == n, "7z: PackInfo without sizes")
      if (packCrcs.isEmpty) packCrcs = Seq.fill(n)(None)
      id = rd.numInt("property id", 0xFF)
    }
    if (id == KUnpackInfo) {
      require(rd.numInt("property id", 0xFF) == KFolder, "7z: UnpackInfo without folders")
      val n = rd.numInt("folder count", MaxEntries)
      require(rd.u8 == 0, "7z: external folder definitions unsupported")
      val coders = (0 until n).map(_ => readFolder(rd))
      require(rd.numInt("property id", 0xFF) == KCodersUnpackSize,
        "7z: UnpackInfo without coder unpack sizes")
      val sizes = (0 until n).map(_ => rd.num)
      var crcs: Seq[Option[Long]] = Seq.fill(n)(None)
      var t = rd.numInt("property id", 0xFF)
      while (t != KEnd) {
        t match {
          case KCRC => crcs = readDigests(rd, n)
          case other => throw new IllegalArgumentException(
            f"7z: unexpected property 0x$other%02X in UnpackInfo")
        }
        t = rd.numInt("property id", 0xFF)
      }
      folders = (0 until n).map(i => Folder(coders(i), sizes(i), crcs(i)))
      // single-coder folders consume pack streams in order, one each
      require(packSizes.length == n,
        s"7z: ${packSizes.length} pack streams for $n single-coder folders")
      id = rd.numInt("property id", 0xFF)
    }
    if (id == KSubStreamsInfo) {
      numUnpack = Seq.fill(folders.length)(1)
      var sizesRead = false
      var t = rd.numInt("property id", 0xFF)
      while (t != KEnd) {
        t match {
          case KNumUnpackStream =>
            numUnpack = folders.indices.map(_ => rd.numInt("substream count", MaxEntries))
          case KSize =>
            // all but each folder's LAST substream are listed; the last
            // is the remainder of the folder's unpack size
            subSizes = folders.indices.map { i =>
              val k = numUnpack(i)
              val head = (0 until k - 1).map(_ => rd.num)
              val rest = folders(i).unpackSize - head.sum
              require(rest >= 0, "7z: substream sizes exceed their folder")
              if (k == 0) Seq.empty else head :+ rest
            }
            sizesRead = true
          case KCRC =>
            // digests only for substreams whose CRC is not already known
            // from a single-substream folder's own digest
            if (!sizesRead) {
              require(numUnpack.forall(_ == 1), "7z: substream counts without sizes")
              subSizes = folders.indices.map(i => Seq(folders(i).unpackSize))
              sizesRead = true
            }
            val unknown = folders.indices.flatMap { i =>
              if (numUnpack(i) == 1 && folders(i).crc.isDefined) Nil
              else (0 until numUnpack(i)).map(j => (i, j))
            }
            val ds = readDigests(rd, unknown.length)
            val m = unknown.zip(ds).toMap
            subCrcs = folders.indices.map { i =>
              (0 until numUnpack(i)).map { j =>
                if (numUnpack(i) == 1 && folders(i).crc.isDefined) folders(i).crc
                else m.getOrElse((i, j), None)
              }
            }
          case other => throw new IllegalArgumentException(
            f"7z: unexpected property 0x$other%02X in SubStreamsInfo")
        }
        t = rd.numInt("property id", 0xFF)
      }
      if (!sizesRead)
        subSizes = folders.indices.map { i =>
          require(numUnpack(i) == 1, "7z: substream counts without sizes")
          Seq(folders(i).unpackSize)
        }
      id = rd.numInt("property id", 0xFF)
    } else {
      numUnpack = Seq.fill(folders.length)(1)
      subSizes = folders.map(f => Seq(f.unpackSize))
      subCrcs = folders.map(f => Seq(f.crc))
    }
    if (subCrcs.isEmpty) subCrcs = folders.indices.map(i => Seq.fill(numUnpack(i))(None))
    require(id == KEnd, f"7z: unexpected property 0x$id%02X after StreamsInfo")
    StreamsInfo(packPos, packSizes, packCrcs, folders, subSizes, subCrcs)
  }

  // ------------------------------------------------------ folder decode

  private def inflateRaw(b: Array[Byte], from: Int, until: Int,
      unpackSize: Long, maxOut: Int): Array[Byte] = {
    require(unpackSize >= 0 && unpackSize <= maxOut,
      s"7z: declared size $unpackSize past the cap")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, from, until - from)
      val out = new Array[Byte](unpackSize.toInt)
      var n = 0
      while (n < out.length && !inf.finished()) {
        val got = inf.inflate(out, n, out.length - n)
        require(got > 0 || inf.finished(),
          "7z: deflate stream truncated or needs a dictionary")
        n += got
      }
      require(n == out.length, "7z: deflate size drift")
      // drain: a longer stream than declared is a named reject
      val probe = new Array[Byte](1)
      require(inf.finished() || inf.inflate(probe) == 0,
        "7z: deflate stream longer than its declared size")
      out
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"7z: bad deflate stream: ${e.getMessage}")
    } finally inf.end()
  }

  private def decodeFolder(b: Array[Byte], from: Int, until: Int,
      f: Folder, maxOut: Int): Array[Byte] = {
    require(from >= 0 && from <= until && until <= b.length,
      "7z: pack stream out of range")
    val out = f.coder.id match {
      case "00" => // copy
        require(until - from == f.unpackSize, "7z: copy coder size drift")
        java.util.Arrays.copyOfRange(b, from, until)
      case "030101" => // LZMA1: props byte + LE32 dictionary size
        require(f.coder.props.length == 5, "7z: LZMA coder props malformed")
        Xz.decodeRawLzma1(b, from, until, f.coder.props(0) & 0xff,
          f.unpackSize, maxOut)
      case "21" => // LZMA2: dictionary-size byte
        require(f.coder.props.length == 1, "7z: LZMA2 coder props malformed")
        require((f.coder.props(0) & 0xff) <= 40, "7z: bad LZMA2 dictionary-size byte")
        Xz.decodeRawLzma2(b, from, until, f.unpackSize, maxOut)
      case "040108" => // raw deflate
        inflateRaw(b, from, until, f.unpackSize, maxOut)
      case "040202" => // a standard bzip2 stream
        val dec = Bzip2.decompress(java.util.Arrays.copyOfRange(b, from, until),
          maxOut = maxOut)
        require(dec.length == f.unpackSize, "7z: bzip2 member size drift")
        dec
      case "04f71101" => // zstd (the 7-Zip-zstd / libarchive extension id)
        val dec = Zstandard.decompressBounded(
          java.util.Arrays.copyOfRange(b, from, until), maxOut.toLong, "7z")
        require(dec.length == f.unpackSize, "7z: zstd member size drift")
        dec
      case "06f10701" => throw new IllegalArgumentException(
        "7z: encrypted archive (AES-256) unsupported — password-protected archives quarantine by name")
      case id if id.startsWith("0303") => throw new IllegalArgumentException(
        s"7z: branch-filter coder $id (BCJ family) unsupported")
      case "030401" => throw new IllegalArgumentException("7z: PPMd coder unsupported")
      case "03" => throw new IllegalArgumentException("7z: Delta coder unsupported")
      case other => throw new IllegalArgumentException(s"7z: coder $other unsupported")
    }
    f.crc.foreach(c => require(crc32(out, 0, out.length) == c,
      "7z: folder CRC mismatch"))
    out
  }

  /** The distinct coder names an archive's MAIN folders use, sorted and
    * '+'-joined — header-only parse, nothing is decompressed except an
    * encoded header.
    */
  def coderNames(b: Array[Byte], maxOut: Int = 256 << 20): String = {
    val (si, _) = parseHeader(b, maxOut)
    si.folders.map(f => f.coder.id match {
      case "00" => "copy"
      case "030101" => "lzma"
      case "21" => "lzma2"
      case "040108" => "deflate"
      case "040202" => "bzip2"
      case "04f71101" => "zstd"
      case other => other
    }).distinct.sorted.mkString("+")
  }

  // ------------------------------------------------------- archive walk

  private def parseHeader(b: Array[Byte], maxOut: Int): (StreamsInfo, Rd) = {
    require(b.length >= 32, "7z: signature header truncated")
    require(isSevenz(b), "7z: bad signature")
    require((b(6) & 0xff) == 0, s"7z: unsupported major version ${b(6) & 0xff}")
    require(crc32(b, 12, 32) == leU32(b, 8), "7z: start header CRC mismatch")
    val nhOff = leU64(b, 12)
    val nhSize = leU64(b, 20)
    require(nhOff >= 0 && nhSize >= 0 && nhSize <= MaxHeaderBytes &&
      32 + nhOff + nhSize <= b.length, "7z: next header out of range")
    if (nhSize == 0) // a legitimately EMPTY archive (all members deleted)
      return (StreamsInfo(0, Nil, Nil, Nil, Nil, Nil),
        new Rd(Array[Byte](KEnd.toByte), 0, 1))
    val hs = (32 + nhOff).toInt
    val he = (32 + nhOff + nhSize).toInt
    require(crc32(b, hs, he) == leU32(b, 28), "7z: next header CRC mismatch")

    var rd = new Rd(b, hs, he)
    var id = rd.numInt("property id", 0xFF)
    if (id == KEncodedHeader) {
      // the header itself rides a (usually single-folder) streams info
      val si = readStreamsInfo(rd)
      require(rd.p == rd.end, "7z: trailing bytes after the encoded header info")
      require(si.folders.length == 1, "7z: multi-folder encoded header unsupported")
      val start = (32 + si.packPos).toInt
      val sz = si.packSizes.head
      require(si.packPos >= 0 && sz >= 0 && start + sz <= b.length,
        "7z: encoded header pack stream out of range")
      require(si.folders.head.unpackSize <= MaxHeaderBytes, "7z: decoded header past the cap")
      val hdr = decodeFolder(b, start, (start + sz).toInt, si.folders.head, MaxHeaderBytes)
      rd = new Rd(hdr, 0, hdr.length)
      id = rd.numInt("property id", 0xFF)
    }
    require(id == KHeader, f"7z: unexpected root property 0x$id%02X")
    id = rd.numInt("property id", 0xFF)
    if (id == KArchiveProperties) {
      var t = rd.numInt("property id", 0xFF)
      while (t != KEnd) {
        rd.bytes(rd.numInt("archive property size", MaxHeaderBytes))
        t = rd.numInt("property id", 0xFF)
      }
      id = rd.numInt("property id", 0xFF)
    }
    require(id != KAdditionalStreamsInfo, "7z: additional streams unsupported")
    val si = if (id == KMainStreamsInfo) {
      val s = readStreamsInfo(rd)
      id = rd.numInt("property id", 0xFF)
      s
    } else StreamsInfo(0, Nil, Nil, Nil, Nil, Nil)
    // rd now sits at kFilesInfo (or kEnd); hand it back with the id re-wound
    rd.p -= 1 // property ids in this archive family fit one byte
    require((rd.b(rd.p) & 0xff) == id, "7z: internal header walk error")
    (si, rd)
  }

  /** Extract every file member (directories and anti-files are not
    * materialized; empty files come back with empty payloads). Every
    * declared CRC is verified; `maxOut` bounds the TOTAL unpacked size.
    */
  def readEntries(b: Array[Byte], maxOut: Int = 256 << 20): Seq[SzEntry] = {
    val (si, rd) = parseHeader(b, maxOut)

    // decode folders → substreams, in folder order
    var budget = maxOut.toLong
    var packOff = 32L + si.packPos
    val streams = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var fi = 0
    while (fi < si.folders.length) {
      val f = si.folders(fi)
      val sz = si.packSizes(fi)
      require(packOff >= 0 && sz >= 0 && packOff + sz <= b.length,
        "7z: pack stream out of range")
      require(f.unpackSize <= budget, "7z: unpacked size past the cap")
      val out = decodeFolder(b, packOff.toInt, (packOff + sz).toInt, f,
        budget.toInt)
      budget -= out.length
      si.packCrcs(fi).foreach(c => require(crc32(b, packOff.toInt,
        (packOff + sz).toInt) == c, "7z: pack stream CRC mismatch"))
      // split into substreams
      var at = 0L
      val sizes = si.subSizes(fi)
      val crcs = si.subCrcs(fi)
      var j = 0
      while (j < sizes.length) {
        val n = sizes(j)
        require(n >= 0 && at + n <= out.length, "7z: substream past its folder")
        val sub = java.util.Arrays.copyOfRange(out, at.toInt, (at + n).toInt)
        crcs(j).foreach(c => require(crc32(sub, 0, sub.length) == c,
          "7z: substream CRC mismatch"))
        streams += sub
        at += n
        j += 1
      }
      require(at == out.length, "7z: folder not fully covered by its substreams")
      packOff += sz
      fi += 1
    }

    // FilesInfo: names + empty-stream/empty-file partitioning
    var id = rd.numInt("property id", 0xFF)
    if (id == KEnd) {
      require(streams.isEmpty, "7z: streams without a files table")
      return Nil
    }
    require(id == KFilesInfo, f"7z: unexpected property 0x$id%02X (want FilesInfo)")
    val numFiles = rd.numInt("file count", MaxEntries)
    var emptyStream = new Array[Boolean](numFiles)
    var emptyFile: Array[Boolean] = Array.emptyBooleanArray
    var names: Seq[String] = Nil
    var t = rd.numInt("property id", 0xFF)
    while (t != KEnd) {
      val size = rd.numInt("files property size", MaxHeaderBytes)
      val after = rd.p + size
      require(after <= rd.end, "7z: files property past the header")
      t match {
        case KEmptyStream => emptyStream = rd.bits(numFiles)
        case KEmptyFile => emptyFile = rd.bits(emptyStream.count(identity))
        case KAnti => throw new IllegalArgumentException("7z: anti-files unsupported")
        case KName =>
          require(rd.u8 == 0, "7z: external names unsupported")
          val buf = new StringBuilder
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          while (rd.p < after) {
            val lo = rd.u8; val hi = rd.u8
            val c = (lo | (hi << 8)).toChar
            if (c == '\u0000') { acc += buf.result(); buf.clear() }
            else buf.append(c)
          }
          require(buf.isEmpty, "7z: unterminated file name")
          names = acc.toSeq
        case _ => () // mtime/attributes/dummy padding: metadata, skipped
      }
      rd.p = after
      t = rd.numInt("property id", 0xFF)
    }
    require(names.length == numFiles, "7z: file names missing or miscounted")
    require(rd.numInt("property id", 0xFF) == KEnd, "7z: trailing header properties")

    val nonEmpty = emptyStream.count(!_)
    require(nonEmpty == streams.length,
      s"7z: $nonEmpty stream-bearing files but ${streams.length} substreams")
    var si2 = 0 // substream cursor
    var ei = 0 // empty-stream cursor
    val out = Seq.newBuilder[SzEntry]
    var i = 0
    while (i < numFiles) {
      if (!emptyStream(i)) {
        val payload = streams(si2)
        out += SzEntry(names(i), payload.length.toLong, payload)
        si2 += 1
      } else {
        // empty stream: a directory unless flagged an (empty) FILE
        val isFile = ei < emptyFile.length && emptyFile(ei)
        if (isFile) out += SzEntry(names(i), 0L, Array.emptyByteArray)
        ei += 1
      }
      i += 1
    }
    out.result()
  }

  // ------------------------------------------------------------- writer

  /** Fixture writer: `coder` ∈ copy | lzma | lzma2 | deflate | bzip2.
    * `solid` packs every member into ONE folder with substream sizes +
    * CRCs (the 7z default); otherwise one folder per member.
    * `encodedHeader` LZMA2-compresses the header the way real archives
    * above trivial size ship. Members must be non-empty (the lanes'
    * fixtures are); empty-file/directory bits are read, not written.
    */
  def write(entries: Seq[(String, Array[Byte])], coder: String = "lzma2",
      solid: Boolean = true, encodedHeader: Boolean = false): Array[Byte] = {
    require(entries.nonEmpty && entries.forall(_._2.nonEmpty),
      "7z write: non-empty members only")

    def pack(data: Array[Byte]): (Coder, Array[Byte]) = coder match {
      case "copy" => (Coder("00", Array.emptyByteArray), data)
      case "lzma" =>
        val (props, packed) = Xz.compressRawLzma1(data)
        val dict = math.max(4096, math.min(data.length, 1 << 26)).toLong
        val p = new Array[Byte](5)
        p(0) = props.toByte
        (0 until 4).foreach(i => p(1 + i) = ((dict >>> (8 * i)) & 0xff).toByte)
        (Coder("030101", p), packed)
      case "lzma2" =>
        (Coder("21", Array(Xz.lzma2DictByte(data.length).toByte)),
          Xz.lzma2Payload(data, "fast"))
      case "deflate" =>
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        (Coder("040108", Array.emptyByteArray), buf.toByteArray)
      case "bzip2" =>
        (Coder("040202", Array.emptyByteArray), Bzip2.compress(data))
      case "zstd" =>
        (Coder("04f71101", Array.emptyByteArray), Zstandard.compressFrame(data))
      case other => throw new IllegalArgumentException(s"7z write: unknown coder '$other'")
    }

    val payloads = entries.map(_._2)
    val folders: Seq[(Coder, Array[Byte], Long, Long)] = // coder, packed, unpackSize, crc
      if (solid) {
        val all = payloads.reduce(_ ++ _)
        val (c, packed) = pack(all)
        Seq((c, packed, all.length.toLong, crc32(all, 0, all.length)))
      } else payloads.map { d =>
        val (c, packed) = pack(d)
        (c, packed, d.length.toLong, crc32(d, 0, d.length))
      }

    val hdr = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = hdr.write(v & 0xff)
    def wnum(v: Long): Unit = {
      var i = 0
      while (i < 8 && java.lang.Long.compareUnsigned(v, 1L << (7 * (i + 1))) >= 0) i += 1
      if (i == 8) {
        w8(0xFF)
        (0 until 8).foreach(j => w8(((v >>> (8 * j)) & 0xff).toInt))
      } else {
        val ones = (0xFF00 >> i) & 0xFF
        w8(ones | (v >>> (8 * i)).toInt)
        (0 until i).foreach(j => w8(((v >>> (8 * j)) & 0xff).toInt))
      }
    }
    def wcrc(v: Long): Unit = (0 until 4).foreach(i => w8(((v >>> (8 * i)) & 0xff).toInt))

    def writeStreamsInfo(packPos: Long, fs: Seq[(Coder, Array[Byte], Long, Long)],
        withSub: Boolean): Unit = {
      wnum(KPackInfo); wnum(packPos); wnum(fs.length)
      wnum(KSize); fs.foreach(f => wnum(f._2.length.toLong))
      wnum(KEnd)
      wnum(KUnpackInfo)
      wnum(KFolder); wnum(fs.length); w8(0)
      fs.foreach { case (c, _, _, _) =>
        wnum(1) // one coder
        val idBytes = c.id.grouped(2).map(Integer.parseInt(_, 16)).toArray
        w8(idBytes.length | (if (c.props.nonEmpty) 0x20 else 0))
        idBytes.foreach(w8)
        if (c.props.nonEmpty) { wnum(c.props.length.toLong); c.props.foreach(x => w8(x & 0xff)) }
      }
      wnum(KCodersUnpackSize); fs.foreach(f => wnum(f._3))
      if (!withSub) { wnum(KCRC); w8(1); fs.foreach(f => wcrc(f._4)) }
      wnum(KEnd)
      if (withSub) {
        wnum(KSubStreamsInfo)
        wnum(KNumUnpackStream); wnum(payloads.length.toLong)
        wnum(KSize); payloads.init.foreach(p => wnum(p.length.toLong))
        wnum(KCRC); w8(1)
        payloads.foreach(p => wcrc(crc32(p, 0, p.length)))
        wnum(KEnd)
      }
      wnum(KEnd)
    }

    wnum(KHeader)
    wnum(KMainStreamsInfo)
    writeStreamsInfo(0L, folders, withSub = solid)
    wnum(KFilesInfo); wnum(entries.length.toLong)
    val nameBytes = new java.io.ByteArrayOutputStream()
    nameBytes.write(0) // external = 0
    entries.foreach { case (n, _) =>
      n.foreach { c => nameBytes.write(c & 0xff); nameBytes.write((c >> 8) & 0xff) }
      nameBytes.write(0); nameBytes.write(0)
    }
    wnum(KName); wnum(nameBytes.size.toLong); hdr.write(nameBytes.toByteArray)
    wnum(KEnd)
    wnum(KEnd)
    val header = hdr.toByteArray

    val mainPacked = folders.map(_._2)
    val mainPackedLen = mainPacked.map(_.length.toLong).sum

    // optionally compress the header and point at a kEncodedHeader stub
    val (tailBlobs, nextHeader) =
      if (!encodedHeader) (Nil, header)
      else {
        val packedHdr = Xz.lzma2Payload(header, "fast")
        val eh = new java.io.ByteArrayOutputStream()
        def e8(v: Int): Unit = eh.write(v & 0xff)
        def enum(v: Long): Unit = {
          var i = 0
          while (i < 8 && java.lang.Long.compareUnsigned(v, 1L << (7 * (i + 1))) >= 0) i += 1
          if (i == 8) { e8(0xFF); (0 until 8).foreach(j => e8(((v >>> (8 * j)) & 0xff).toInt)) }
          else {
            val ones = (0xFF00 >> i) & 0xFF
            e8(ones | (v >>> (8 * i)).toInt)
            (0 until i).foreach(j => e8(((v >>> (8 * j)) & 0xff).toInt))
          }
        }
        enum(KEncodedHeader)
        enum(KPackInfo); enum(mainPackedLen); enum(1)
        enum(KSize); enum(packedHdr.length.toLong); enum(KEnd)
        enum(KUnpackInfo)
        enum(KFolder); enum(1); e8(0)
        enum(1); e8(1 | 0x20); e8(0x21)
        enum(1); e8(Xz.lzma2DictByte(header.length))
        enum(KCodersUnpackSize); enum(header.length.toLong)
        enum(KCRC); e8(1)
        val hc = crc32(header, 0, header.length)
        (0 until 4).foreach(i => e8(((hc >>> (8 * i)) & 0xff).toInt))
        enum(KEnd)
        enum(KEnd)
        (Seq(packedHdr), eh.toByteArray)
      }

    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(0); out.write(4) // format version 0.4
    val nhOff = mainPackedLen + tailBlobs.map(_.length.toLong).sum
    val start = new Array[Byte](20)
    (0 until 8).foreach(i => start(i) = ((nhOff >>> (8 * i)) & 0xff).toByte)
    (0 until 8).foreach(i => start(8 + i) = ((nextHeader.length.toLong >>> (8 * i)) & 0xff).toByte)
    val nhc = crc32(nextHeader, 0, nextHeader.length)
    (0 until 4).foreach(i => start(16 + i) = ((nhc >>> (8 * i)) & 0xff).toByte)
    val sc = crc32(start, 0, start.length)
    (0 until 4).foreach(i => out.write(((sc >>> (8 * i)) & 0xff).toInt))
    out.write(start)
    mainPacked.foreach(out.write)
    tailBlobs.foreach(out.write)
    out.write(nextHeader)
    out.toByteArray
  }
}
