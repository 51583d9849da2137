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
  *    with inline LABEL byte strings instead of the SST; encrypted
  *    workbooks (FILEPASS) are NAMED rejects — never silently-wrong
  *    text;
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
    val (wb, biff5) = strs.get("Workbook").map((_, false))
      .orElse(strs.get("Book").map((_, true)))
      .getOrElse(throw new IllegalArgumentException(
        "xls: OLE container has no Workbook stream"))
    val recs = records(wb)
    require(recs.nonEmpty && recs.head.id == RBof, "xls: Workbook stream has no BOF")
    val bofVer = u16(recs.head.data, 0)
    if (biff5) require(bofVer == 0x0500, f"xls: Book stream BOF version 0x$bofVer%04X is not BIFF5")
    else require(bofVer == 0x0600, "xls: not BIFF8 (BOF version)")
    // ---- globals: FILEPASS check, BOUNDSHEETs, SST (+CONTINUEs)
    val globalsEnd = recs.indexWhere(_.id == REof)
    require(globalsEnd > 0, "xls: globals substream has no EOF")
    val globals = recs.take(globalsEnd)
    require(!globals.exists(_.id == RFilePass),
      "xls: encrypted workbook (FILEPASS) unsupported")
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
    * knob so tests can force SST CONTINUE splits.
    */
  def write(sheets: Seq[(String, Seq[Seq[Any]])],
      maxRecordBytes: Int = 8224): Array[Byte] = {
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
    val globalsLen = bof(0x0005).length + boundSheets(sheets.map(_ => 0)).length +
      sstRecs.length + 4 // + EOF
    val offsets = sheetBytes.scanLeft(globalsLen)(_ + _.length).init
    val wb = bof(0x0005) ++ boundSheets(offsets) ++ sstRecs ++
      rec(REof, Array.emptyByteArray) ++ sheetBytes.fold(Array.emptyByteArray)(_ ++ _)
    Cfb.write(Seq("Workbook" -> wb))
  }
}
