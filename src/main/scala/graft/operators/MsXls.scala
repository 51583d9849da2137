package graft.operators

import java.nio.charset.StandardCharsets

/** Legacy Excel binary (.xls) text extraction — [MS-XLS] BIFF8 over
  * the [MS-CFB] container ([[Cfb]]). Profile:
  *
  *  - `Workbook` stream as a BIFF record walk (2-byte id, 2-byte size);
  *    the globals substream yields BOUNDSHEET sheet names + absolute
  *    substream offsets and the SST shared-string table — INCLUDING the
  *    infamous CONTINUE-record string splits, where a string resumes in
  *    the next record behind a FRESH flags byte that may switch the
  *    character width mid-string (§2.5.293);
  *  - per-sheet cell records: LABELSST (SST index), LABEL (inline
  *    string), NUMBER (IEEE 754), RK (packed 30-bit int/x100 float),
  *    BOOLERR, MULRK runs; FORMULA results are skipped (cached values
  *    are a fidelity trap — a mining pass wants literal content);
  *  - BIFF5 (`Book` stream, Excel 5.0/95) reads through the same walk
  *    with inline LABEL byte strings instead of the SST;
  *  - encrypted BIFF8 workbooks (FILEPASS, [MS-XLS] §2.2.10) decrypt
  *    through [MS-OFFCRYPTO]'s RC4 handlers ([[OffCrypto]]) when the
  *    password is Excel's documented default (`VelvetSweatshop`, tried
  *    transparently on open — the owner-locked analog of the
  *    empty-user-password PDF class): both the 97/2000 MD5 handler and
  *    RC4 CryptoAPI, per-1024-byte-block rekeying, record headers and
  *    exempt payloads plaintext-but-keystream-advancing, BoundSheet8
  *    lbPlyPos never encrypted. A real password stays a NAMED reject
  *    ("password required"), as do XOR obfuscation (§2.3.7 — its data
  *    transform cannot be validated offline, see [[OffCrypto]]) and
  *    BIFF5 FILEPASS;
  *  - rich-text runs and ExtRst phonetics are SKIPPED BY LENGTH.
  *
  * The writer is the deterministic oracle half and takes a
  * `maxRecordBytes` knob so specs can force real CONTINUE splits with
  * small corpora.
  *
  * Scale shape: per-record scalar walk, the document-family story.
  */
object MsXls {

  final val MaxStrings = 1 << 20
  final val MaxCells = 1 << 20

  /** One extracted cell. `text` is the rendered value: string content,
    * integer-rendered-when-integral numbers, TRUE/FALSE, #ERR.
    */
  final case class Cell(sheet: Int, row: Int, col: Int, text: String)
  final case class XlsText(sheetNames: Seq[String], cells: Seq[Cell]) {
    /** Tab-joined cells, newline-joined rows, sheet blocks in order. */
    def text: String = sheetNames.indices.map { s =>
      cells.filter(_.sheet == s)
        .groupBy(_.row).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.col).map(_.text).mkString("\t"))
        .mkString("\n")
    }.mkString("\n")
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** BIFF record ids in the profile. */
  private final val RBof = 0x0809
  private final val REof = 0x000A
  private final val RContinue = 0x003C
  private final val RSst = 0x00FC
  private final val RBoundSheet = 0x0085
  private final val RLabelSst = 0x00FD
  private final val RLabel = 0x0204
  private final val RNumber = 0x0203
  private final val RRk = 0x027E
  private final val RMulRk = 0x00BD
  private final val RBoolErr = 0x0205
  private final val RFilePass = 0x002F

  private final case class Rec(id: Int, at: Int, data: Array[Byte])

  private def records(b: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var o = 0
    while (o + 4 <= b.length) {
      val id = u16(b, o)
      val len = u16(b, o + 2)
      require(o + 4 + len <= b.length, f"xls: record 0x$id%04X truncated at $o")
      out += Rec(id, o, java.util.Arrays.copyOfRange(b, o + 4, o + 4 + len))
      o += 4 + len
    }
    out.result()
  }

  /** Cursor over an SST payload + its CONTINUE payloads that knows
    * where the record boundaries are — strings that split across them
    * resume behind a fresh flags byte (the width can CHANGE mid-string).
    */
  private final class SstCursor(chunks: IndexedSeq[Array[Byte]]) {
    private var ci = 0
    private var off = 0
    private def ensure(): Unit = {
      while (ci < chunks.length && off == chunks(ci).length) { ci += 1; off = 0 }
      require(ci < chunks.length, "xls: SST runs past its CONTINUE chain")
    }
    def u8(): Int = { ensure(); val v = chunks(ci)(off) & 0xff; off += 1; v }
    def u16v(): Int = u8() | (u8() << 8)
    def u32v(): Long = u16v().toLong | (u16v().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, (chunks(ci).length - off).toLong).toInt
        off += take
        left -= take
      }
    }
    /** Read one XLUnicodeRichExtendedString (§2.5.293). */
    def string(): String = {
      val cch = u16v()
      var flags = u8()
      var wide = (flags & 0x01) != 0
      val fExt = (flags & 0x04) != 0
      val fRich = (flags & 0x08) != 0
      val cRun = if (fRich) u16v() else 0
      val cbExt = if (fExt) u32v() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        ensure()
        if (off == 0 && read > 0) {
          // a split: the continuation opens with a fresh width flag
          flags = u8()
          wide = (flags & 0x01) != 0
          ensure()
        }
        val avail = chunks(ci).length - off
        val perChar = if (wide) 2 else 1
        val take = math.min((cch - read).toLong, (avail / perChar).toLong).toInt
        require(take > 0 || avail == 0,
          "xls: SST string stalls (odd byte before a wide split)")
        if (take == 0) { off = chunks(ci).length } // dangling byte: spec forbids; skip
        else {
          if (wide) {
            sb.append(new String(chunks(ci), off, take * 2, StandardCharsets.UTF_16LE))
          } else {
            var i = 0
            while (i < take) {
              sb.append(((chunks(ci)(off + i) & 0xff)).toChar)
              i += 1
            }
          }
          off += take * perChar
          read += take
        }
      }
      skip(4L * cRun)
      skip(cbExt)
      sb.toString
    }
  }

  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def rkValue(rk: Long): Double = {
    val fX100 = (rk & 1) != 0
    val fInt = (rk & 2) != 0
    val v =
      if (fInt) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk >>> 2) << 34)
    if (fX100) v / 100 else v
  }

  /** Extract sheets + cells from a .xls container. Named
    * `IllegalArgumentException`s for anything out of profile.
    */
  def extract(bytes: Array[Byte]): XlsText = {
    val strs = Cfb.streams(bytes)
    // BIFF8 ships in `Workbook`; the Excel 5.0/95 era used `Book` with
    // BIFF5 — same record framing, byte strings instead of the SST
    val (wb0, biff5) = strs.get("Workbook").map((_, false))
      .orElse(strs.get("Book").map((_, true)))
      .getOrElse(throw new IllegalArgumentException(
        "xls: OLE container has no Workbook stream"))
    val wb = if (biff5) wb0 else decryptIfNeeded(wb0)
    val recs = records(wb)
    require(recs.nonEmpty && recs.head.id == RBof, "xls: Workbook stream has no BOF")
    val bofVer = u16(recs.head.data, 0)
    if (biff5) require(bofVer == 0x0500, f"xls: Book stream BOF version 0x$bofVer%04X is not BIFF5")
    else require(bofVer == 0x0600, "xls: not BIFF8 (BOF version)")
    // ---- globals: FILEPASS check, BOUNDSHEETs, SST (+CONTINUEs)
    val globalsEnd = recs.indexWhere(_.id == REof)
    require(globalsEnd > 0, "xls: globals substream has no EOF")
    val globals = recs.take(globalsEnd)
    // BIFF8 FILEPASS was handled (or named-rejected) by decryptIfNeeded;
    // the BIFF5-era encryption is out of profile
    if (biff5) require(!globals.exists(_.id == RFilePass),
      "xls: encrypted workbook (FILEPASS) unsupported in BIFF5")
    val sheets = globals.filter(_.id == RBoundSheet).map { r =>
      val at = u32(r.data, 0)
      val cch = r.data(6) & 0xff
      val name =
        if (biff5) new String(r.data, 7, cch,
          java.nio.charset.Charset.forName("windows-1252"))
        else if ((r.data(7) & 1) != 0)
          new String(r.data, 8, cch * 2, StandardCharsets.UTF_16LE)
        else new String(r.data, 8, cch, StandardCharsets.ISO_8859_1)
      (name, at.toInt)
    }
    val sst: IndexedSeq[String] = globals.indexWhere(_.id == RSst) match {
      case -1 => IndexedSeq.empty
      case si =>
        val conts = globals.drop(si + 1).takeWhile(_.id == RContinue)
        val cur = new SstCursor((globals(si) +: conts).map(_.data).toIndexedSeq)
        cur.skip(4) // cstTotal
        val unique = cur.u32v()
        require(unique >= 0 && unique <= MaxStrings, s"xls: SST claims $unique strings")
        (0L until unique).map(_ => cur.string())
    }
    // ---- per-sheet cell walks
    val cells = Vector.newBuilder[Cell]
    var total = 0
    sheets.zipWithIndex.foreach { case ((_, at), si) =>
      require(at >= 0 && at < wb.length, s"xls: sheet $si BOF offset $at out of range")
      val start = recs.indexWhere(_.at == at)
      require(start >= 0 && recs(start).id == RBof,
        s"xls: sheet $si offset $at is not at a BOF record")
      var i = start + 1
      def add(row: Int, col: Int, text: String): Unit = {
        total += 1
        require(total <= MaxCells, "xls: more cells than the cap")
        cells += Cell(si, row, col, text)
      }
      while (i < recs.length && recs(i).id != REof) {
        val r = recs(i)
        r.id match {
          case RLabelSst =>
            require(!biff5, "xls: LABELSST record in a BIFF5 stream")
            val isst = u32(r.data, 6).toInt
            require(isst >= 0 && isst < sst.length, s"xls: LABELSST index $isst")
            add(u16(r.data, 0), u16(r.data, 2), sst(isst))
          case RLabel if biff5 =>
            // BIFF5 inline byte string: cch(2) then codepage bytes
            // (cp1252, the Western default the era's files carry)
            val cch = u16(r.data, 6)
            require(8 + cch <= r.data.length, "xls: BIFF5 LABEL truncated")
            add(u16(r.data, 0), u16(r.data, 2), new String(r.data, 8, cch,
              java.nio.charset.Charset.forName("windows-1252")))
          case RLabel =>
            val cur = new SstCursor(IndexedSeq(
              java.util.Arrays.copyOfRange(r.data, 6, r.data.length)))
            add(u16(r.data, 0), u16(r.data, 2), cur.string())
          case RNumber =>
            val bits = u32(r.data, 6) | (u32(r.data, 10) << 32)
            add(u16(r.data, 0), u16(r.data, 2),
              renderNum(java.lang.Double.longBitsToDouble(bits)))
          case RRk =>
            add(u16(r.data, 0), u16(r.data, 2), renderNum(rkValue(u32(r.data, 6))))
          case RMulRk =>
            val row = u16(r.data, 0)
            val colFirst = u16(r.data, 2)
            val n = (r.data.length - 6) / 6
            (0 until n).foreach { k =>
              add(row, colFirst + k, renderNum(rkValue(u32(r.data, 4 + 6 * k + 2))))
            }
          case RBoolErr =>
            val isErr = (r.data(7) & 0xff) != 0
            val v = r.data(6) & 0xff
            add(u16(r.data, 0), u16(r.data, 2),
              if (isErr) "#ERR" else if (v != 0) "TRUE" else "FALSE")
          case _ => () // formatting, formulas, index records: not content
        }
        i += 1
      }
    }
    XlsText(sheets.map(_._1), cells.result())
  }

  // ------------------------------------------------------------ encryption

  /** Records whose payloads are never encrypted ([MS-XLS] §2.2.10):
    * BOF, FilePass, InterfaceHdr, RRDHead, UsrExcl, FileLock, RRDInfo —
    * the keystream still advances over them.
    */
  private final val PlaintextRecords =
    Set(RBof, RFilePass, 0x00E1, 0x0138, 0x0194, 0x0195, 0x0196)

  /** If the BIFF8 globals carry a FILEPASS, authenticate Excel's
    * documented default password and return the DECRYPTED stream;
    * anything password-gated or out of profile is a named reject.
    */
  private def decryptIfNeeded(wb: Array[Byte]): Array[Byte] = {
    var o = 0
    var fp: Array[Byte] = null
    var done = false
    while (!done && fp == null && o + 4 <= wb.length) {
      val id = u16(wb, o)
      val len = u16(wb, o + 2)
      require(o + 4 + len <= wb.length, f"xls: record 0x$id%04X truncated at $o")
      if (id == RFilePass) fp = java.util.Arrays.copyOfRange(wb, o + 4, o + 4 + len)
      if (id == REof) done = true // FILEPASS lives in the globals substream
      o += 4 + len
    }
    if (fp == null) wb else cryptStream(wb, filePassKey(fp))
  }

  /** Parse a BIFF8 FILEPASS ([MS-XLS] §2.4.117), authenticate the
    * default password, and return the per-block key function.
    */
  private def filePassKey(fp: Array[Byte]): Int => Array[Byte] = {
    require(fp.length >= 6, "xls: FILEPASS truncated")
    val pw = OffCrypto.DefaultXlsPassword
    u16(fp, 0) match {
      case 0x0000 =>
        // XOR obfuscation: [MS-OFFCRYPTO] §2.3.7 — see OffCrypto scaladoc
        throw new IllegalArgumentException(
          "xls: XOR-obfuscated workbook unsupported (data transform out of profile)")
      case 0x0001 =>
        val vMajor = u16(fp, 2)
        val vMinor = u16(fp, 4)
        if (vMajor == 1 && vMinor == 1) {
          // Office binary RC4 (97/2000): salt + MD5 verifier pair
          require(fp.length >= 54, "xls: RC4 FILEPASS truncated")
          val salt = java.util.Arrays.copyOfRange(fp, 6, 22)
          val ev = java.util.Arrays.copyOfRange(fp, 22, 38)
          val evh = java.util.Arrays.copyOfRange(fp, 38, 54)
          if (!OffCrypto.binaryRc4Verify(pw, salt, ev, evh))
            throw new IllegalArgumentException(
              "xls: encrypted workbook (password required)")
          b => OffCrypto.binaryRc4Key(pw, salt, b)
        } else if (vMinor == 2 && vMajor >= 2 && vMajor <= 4) {
          // RC4 CryptoAPI ([MS-OFFCRYPTO] §2.3.5): Flags(4) HeaderSize(4)
          // EncryptionHeader EncryptionVerifier
          require(fp.length >= 14, "xls: CryptoAPI FILEPASS truncated")
          val hs = u32(fp, 10).toInt
          val vo = 14 + hs
          require(hs >= 32 && vo + 60 <= fp.length,
            "xls: CryptoAPI FILEPASS truncated")
          val algId = u32(fp, 14 + 8)
          val algHash = u32(fp, 14 + 12)
          require(algId == 0x6801L, f"xls: CryptoAPI AlgID 0x$algId%04X is not RC4")
          require(algHash == 0x8004L, "xls: CryptoAPI hash is not SHA-1")
          val keyBits = u32(fp, 14 + 16).toInt match {
            case 0 => 40 // [MS-OFFCRYPTO] §2.3.5.1: zero means 40-bit
            case k => k
          }
          require(u32(fp, vo) == 16L, "xls: CryptoAPI salt size")
          val salt = java.util.Arrays.copyOfRange(fp, vo + 4, vo + 20)
          val ev = java.util.Arrays.copyOfRange(fp, vo + 20, vo + 36)
          require(u32(fp, vo + 36) == 20L, "xls: CryptoAPI verifier hash size")
          val evh = java.util.Arrays.copyOfRange(fp, vo + 40, vo + 60)
          if (!OffCrypto.cryptoApiVerify(pw, salt, ev, evh, keyBits))
            throw new IllegalArgumentException(
              "xls: encrypted workbook (password required)")
          b => OffCrypto.cryptoApiKey(pw, salt, b, keyBits)
        } else throw new IllegalArgumentException(
          s"xls: FILEPASS version $vMajor.$vMinor unsupported")
      case other => throw new IllegalArgumentException(
        f"xls: FILEPASS encryption type 0x$other%04X unsupported")
    }
  }

  /** XOR the Workbook stream against the per-1024-byte-block RC4
    * keystream ([MS-XLS] §2.2.10): a fresh RC4 instance keys each
    * 1024-byte block of the STREAM's byte space; record headers and
    * [[PlaintextRecords]] payloads stay plaintext but still advance the
    * keystream; BoundSheet8 keeps its lbPlyPos (first 4 payload bytes)
    * plaintext. Symmetric — the writer encrypts with the same walk.
    */
  private def cryptStream(wb: Array[Byte],
      keyForBlock: Int => Array[Byte]): Array[Byte] = {
    val out = wb.clone()
    var block = -1
    var rc4: OffCrypto.Rc4 = null
    var pos = 0
    def advance(n: Int, apply: Boolean): Unit = {
      var i = 0
      while (i < n) {
        val b = pos >>> 10
        if (b != block) { block = b; rc4 = new OffCrypto.Rc4(keyForBlock(b)) }
        val k = rc4.next()
        if (apply) out(pos) = (out(pos) ^ k).toByte
        pos += 1
        i += 1
      }
    }
    while (pos + 4 <= wb.length) {
      val id = u16(wb, pos)
      val len = u16(wb, pos + 2)
      require(pos + 4 + len <= wb.length, f"xls: record 0x$id%04X truncated at $pos")
      advance(4, apply = false)
      if (PlaintextRecords(id)) advance(len, apply = false)
      else if (id == RBoundSheet && len >= 4) {
        advance(4, apply = false)
        advance(len - 4, apply = true)
      } else advance(len, apply = true)
    }
    out
  }

  // ----------------------------------------------------------------- writer

  /** Deterministic BIFF5 (.xls, Excel 5.0/95 `Book` stream) writer —
    * the fixture half of the BIFF5 read path. Strings are inline LABEL
    * byte strings (no SST), so every char must fit one byte.
    */
  def write5(sheets: Seq[(String, Seq[Seq[Any]])]): Array[Byte] = {
    require(sheets.nonEmpty, "xls write5: at least one sheet")
    def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](4 + payload.length)
      out(0) = (id & 0xff).toByte; out(1) = ((id >> 8) & 0xff).toByte
      out(2) = (payload.length & 0xff).toByte
      out(3) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def bof(dt: Int) = rec(RBof, le16(0x0500) ++ le16(dt) ++ le16(0x0DBB) ++
      le16(0x07CC))
    val sheetBytes = sheets.map { case (_, rows) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      rows.zipWithIndex.foreach { case (cols, r) =>
        cols.zipWithIndex.foreach { case (v, c) =>
          v match {
            case str: String =>
              val cs = java.nio.charset.Charset.forName("windows-1252")
              require(cs.newEncoder().canEncode(str),
                s"xls write5: BIFF5 byte strings cannot carry wide chars")
              val nb = str.getBytes(cs)
              out.write(rec(RLabel, le16(r) ++ le16(c) ++ le16(0) ++
                le16(nb.length) ++ nb))
            case n: Long =>
              require(n >= -(1L << 29) && n < (1L << 29),
                s"xls write5: RK integer $n out of range")
              out.write(rec(RRk, le16(r) ++ le16(c) ++ le16(0) ++
                le32((n << 2) | 2)))
            case d: Double =>
              val bits = java.lang.Double.doubleToLongBits(d)
              out.write(rec(RNumber, le16(r) ++ le16(c) ++ le16(0) ++
                le32(bits & 0xFFFFFFFFL) ++ le32(bits >>> 32)))
            case other => throw new IllegalArgumentException(
              s"xls write5: unsupported cell ${other.getClass.getSimpleName}")
          }
        }
      }
      out.write(rec(REof, Array.emptyByteArray))
      out.toByteArray
    }
    def boundSheets(offsets: Seq[Int]): Array[Byte] =
      sheets.zip(offsets).map { case ((name, _), at) =>
        val nb = name.getBytes(StandardCharsets.ISO_8859_1)
        require(nb.length <= 31 && name.forall(_ <= 0xFF),
          s"xls write5: bad sheet name '$name'")
        rec(RBoundSheet, le32(at.toLong) ++ Array[Byte](0, 0) ++
          Array(nb.length.toByte) ++ nb)
      }.reduce(_ ++ _)
    val globalsLen = bof(0x0005).length +
      boundSheets(sheets.map(_ => 0)).length + 4
    val offsets = sheetBytes.scanLeft(globalsLen)(_ + _.length).init
    val wb = bof(0x0005) ++ boundSheets(offsets) ++
      rec(REof, Array.emptyByteArray) ++
      sheetBytes.fold(Array.emptyByteArray)(_ ++ _)
    Cfb.write(Seq("Book" -> wb))
  }

  /** Deterministic BIFF8 writer — the oracle half. Cells are strings
    * (via SST LABELSST), `Long` (RK), or `Double` (NUMBER) per the
    * runtime class of the value. `maxRecordBytes` (spec: 8224) is a
    * knob so tests can force SST CONTINUE splits. `encryption` wires
    * a FILEPASS + the matching whole-stream RC4 transform: "rc4"
    * (97/2000 MD5 handler), "rc4capi" (CryptoAPI, SHA-1, 128-bit) —
    * `password` defaults to Excel's transparent default, the
    * owner-locked shape [[extract]] reads back without a secret.
    */
  def write(sheets: Seq[(String, Seq[Seq[Any]])],
      maxRecordBytes: Int = 8224, encryption: String = "none",
      password: String = OffCrypto.DefaultXlsPassword): Array[Byte] = {
    require(sheets.nonEmpty, "xls write: at least one sheet")
    require(maxRecordBytes >= 16, "xls write: record cap too small")
    val strings = sheets.flatMap(_._2.flatten).collect { case s: String => s }.distinct
    val sstIndex = strings.zipWithIndex.toMap
    def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length <= 8224, f"xls write: record 0x$id%04X too long")
      val out = new Array[Byte](4 + payload.length)
      out(0) = (id & 0xff).toByte; out(1) = ((id >> 8) & 0xff).toByte
      out(2) = (payload.length & 0xff).toByte
      out(3) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def bof(dt: Int) = rec(RBof, le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++
      le16(0x07CC) ++ le32(0L) ++ le32(0L))
    // ---- SST payload with honest CONTINUE splits
    val sstChunks = Vector.newBuilder[Array[Byte]]
    locally {
      val cur = new java.io.ByteArrayOutputStream()
      def roll(): Unit = { sstChunks += cur.toByteArray; cur.reset() }
      def room: Int = maxRecordBytes - cur.size()
      cur.write(le32(strings.length.toLong)); cur.write(le32(strings.length.toLong))
      strings.foreach { s =>
        val wide = s.exists(_ > 0xFF)
        // header must not split: cch + flags = 3 bytes
        if (room < 4) roll()
        cur.write(le16(s.length))
        cur.write(if (wide) 1 else 0)
        var i = 0
        var w = wide
        while (i < s.length) {
          val perChar = if (w) 2 else 1
          if (room < perChar) {
            roll()
            // continuation re-states the width flag
            cur.write(if (w) 1 else 0)
          }
          val take = math.min(s.length - i, room / perChar)
          val part = s.substring(i, i + take)
          if (w) cur.write(part.getBytes(StandardCharsets.UTF_16LE))
          else part.foreach(c => cur.write(c.toInt & 0xff))
          i += take
        }
      }
      roll()
    }
    val chunks = sstChunks.result().filter(_.nonEmpty)
    val sstRecs: Array[Byte] = chunks.zipWithIndex.map { case (c, i) =>
      rec(if (i == 0) RSst else RContinue, c)
    }.reduce(_ ++ _)
    // ---- sheet substreams (built first; BOUNDSHEET needs their offsets)
    val sheetBytes = sheets.map { case (_, rows) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      rows.zipWithIndex.foreach { case (cols, r) =>
        cols.zipWithIndex.foreach { case (v, c) =>
          v match {
            case s: String =>
              out.write(rec(RLabelSst, le16(r) ++ le16(c) ++ le16(0) ++
                le32(sstIndex(s).toLong)))
            case n: Long =>
              // RK integer when it fits the signed 30-bit field
              require(n >= -(1L << 29) && n < (1L << 29),
                s"xls write: RK integer $n out of range")
              out.write(rec(RRk, le16(r) ++ le16(c) ++ le16(0) ++
                le32((n << 2) | 2)))
            case d: Double =>
              val bits = java.lang.Double.doubleToLongBits(d)
              out.write(rec(RNumber, le16(r) ++ le16(c) ++ le16(0) ++
                le32(bits & 0xFFFFFFFFL) ++ le32(bits >>> 32)))
            case b: Boolean =>
              out.write(rec(RBoolErr, le16(r) ++ le16(c) ++ le16(0) ++
                Array[Byte](if (b) 1 else 0, 0)))
            case other => throw new IllegalArgumentException(
              s"xls write: unsupported cell ${other.getClass.getSimpleName}")
          }
        }
      }
      out.write(rec(REof, Array.emptyByteArray))
      out.toByteArray
    }
    // ---- globals (two passes: BOUNDSHEET lengths are offset-independent)
    def boundSheets(offsets: Seq[Int]): Array[Byte] =
      sheets.zip(offsets).map { case ((name, _), at) =>
        val nb = name.getBytes(StandardCharsets.ISO_8859_1)
        require(nb.length <= 31 && name.forall(_ <= 0xFF),
          s"xls write: bad sheet name '$name'")
        rec(RBoundSheet, le32(at.toLong) ++ Array[Byte](0, 0) ++
          Array(nb.length.toByte, 0.toByte) ++ nb)
      }.reduce(_ ++ _)
    // ---- optional FILEPASS + whole-stream encryption
    def md5of(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
    val (filePass, keyForBlock): (Array[Byte], Option[Int => Array[Byte]]) =
      encryption match {
        case "none" => (Array.emptyByteArray, None)
        case "rc4" =>
          // deterministic salt/verifier so oracles can replay fixtures
          val salt = md5of(s"graft-xls-salt:rc4:$password")
          val verifier = md5of(s"graft-xls-verifier:rc4:$password")
          val (ev, evh) = OffCrypto.binaryRc4MakeVerifier(password, salt, verifier)
          (rec(RFilePass, le16(1) ++ le16(1) ++ le16(1) ++ salt ++ ev ++ evh),
            Some(b => OffCrypto.binaryRc4Key(password, salt, b)))
        case "rc4capi" =>
          val salt = md5of(s"graft-xls-salt:capi:$password")
          val verifier = md5of(s"graft-xls-verifier:capi:$password")
          val keyBits = 128
          val (ev, evh) =
            OffCrypto.cryptoApiMakeVerifier(password, salt, verifier, keyBits)
          val csp = "Microsoft Enhanced Cryptographic Provider v1.0"
            .getBytes(StandardCharsets.UTF_16LE) ++ Array[Byte](0, 0)
          // ProviderType 0x01 = PROV_RSA_FULL — what real Excel records
          // for RC4 CryptoAPI ([MS-OFFCRYPTO] §2.3.5.1); 0x18 is the AES
          // provider and external validators may balk at the mismatch
          val hdr = le32(4L) ++ le32(0L) ++ le32(0x6801L) ++ le32(0x8004L) ++
            le32(keyBits.toLong) ++ le32(1L) ++ le32(0L) ++ le32(0L) ++ csp
          (rec(RFilePass, le16(1) ++ le16(4) ++ le16(2) ++ le32(4L) ++
            le32(hdr.length.toLong) ++ hdr ++
            le32(16L) ++ salt ++ ev ++ le32(20L) ++ evh),
            Some(b => OffCrypto.cryptoApiKey(password, salt, b, keyBits)))
        case other => throw new IllegalArgumentException(
          s"xls write: unknown encryption '$other'")
      }
    val globalsLen = bof(0x0005).length + filePass.length +
      boundSheets(sheets.map(_ => 0)).length + sstRecs.length + 4 // + EOF
    val offsets = sheetBytes.scanLeft(globalsLen)(_ + _.length).init
    val wb = bof(0x0005) ++ filePass ++ boundSheets(offsets) ++ sstRecs ++
      rec(REof, Array.emptyByteArray) ++ sheetBytes.fold(Array.emptyByteArray)(_ ++ _)
    val stored = keyForBlock.fold(wb)(cryptStream(wb, _))
    Cfb.write(Seq("Workbook" -> stored))
  }
}
