package graft.operators

import java.nio.charset.StandardCharsets

/** Legacy Word binary (.doc) text extraction — the [MS-DOC] piece
  * table over the [MS-CFB] container ([[Cfb]]). Profile (Word 97+,
  * nFib >= 0x00C1):
  *
  *  - FIB header in the `WordDocument` stream: wIdent 0xA5EC, the
  *    fWhichTblStm flag (FIB base offset 0x0A, bit 9) picking the
  *    `1Table`/`0Table` stream, fcClx/lcbClx in FibRgFcLcb97 (stream
  *    offsets 0x01A2/0x01A6) locating the Clx;
  *  - Clx in the table stream: Prc blocks (0x01, skipped by size) then
  *    the Pcdt (0x02) holding the PlcPcd — n+1 character positions and
  *    n piece descriptors;
  *  - each PCD's fc has bit 30 = fCompressed: set → 8-bit cp1252 text
  *    at fc/2, clear → UTF-16LE at fc, both offsets into the
  *    `WordDocument` stream (§2.9.177);
  *  - control chars map like every extractor here: 0x0D (paragraph
  *    mark) and 0x0B/0x0C → '\n', 0x07 (cell mark) → '\t', the field
  *    delimiters 0x13/0x14/0x15 and the embedded-object anchor 0x01
  *    are dropped; ONE trailing break is document framing (the final
  *    paragraph mark every writer emits);
  *  - pre-Word-97 files (nFib < 0x00C1: no FibRgFcLcb97) read through
  *    the [[extractPre97]] non-complex path ([fcMin, fcMac) cp1252 run);
  *    fast-saved pre-97 files and FIBs without a Clx are NAMED
  *    rejects — never silently-wrong text.
  *
  * Scale shape: per-record scalar walk, the document-family story.
  */
object MsDoc {

  final val MaxPieces = 1 << 16
  final val MaxChars = 16 << 20

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def isDoc(bytes: Array[Byte]): Boolean =
    Cfb.isCfb(bytes) && Cfb.kind(bytes).contains("doc")

  /** Extract the text from a .doc container. Throws a named
    * `IllegalArgumentException` (`doc: ...` / `cfb: ...`) for anything
    * out of profile.
    */
  def extractText(bytes: Array[Byte]): String = {
    val strs = Cfb.streams(bytes)
    val word = strs.getOrElse("WordDocument", throw new IllegalArgumentException(
      "doc: OLE container has no WordDocument stream"))
    require(word.length >= 0x01AA, "doc: WordDocument stream shorter than the FIB")
    require(u16(word, 0) == 0xA5EC, "doc: FIB wIdent is not A5EC")
    val nFib = u16(word, 2)
    if (nFib < 0x00C1) return extractPre97(word, nFib)
    val flags = u16(word, 0x0A)
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = strs.getOrElse(tableName, throw new IllegalArgumentException(
      s"doc: FIB names table stream '$tableName' but the container lacks it"))
    val fcClx = u32(word, 0x01A2)
    val lcbClx = u32(word, 0x01A6)
    require(lcbClx > 0, "doc: FIB has no Clx (empty piece table)")
    require(fcClx >= 0 && fcClx + lcbClx <= table.length,
      s"doc: Clx [$fcClx,+$lcbClx) outside the $tableName stream")
    // ---- Clx walk: RgPrc blocks then the Pcdt
    var pos = fcClx.toInt
    val end = (fcClx + lcbClx).toInt
    while (pos < end && (table(pos) & 0xff) == 0x01) {
      require(pos + 3 <= end, "doc: truncated Prc in Clx")
      pos += 3 + u16(table, pos + 1) // clxt + cbGrpprl + grpprl
    }
    require(pos < end && (table(pos) & 0xff) == 0x02,
      "doc: Clx has no Pcdt piece table")
    val lcb = u32(table, pos + 1)
    pos += 5
    require(lcb >= 16 && (lcb - 4) % 12 == 0 && pos + lcb <= end,
      s"doc: Pcdt size $lcb malformed")
    val n = ((lcb - 4) / 12).toInt
    require(n >= 1 && n <= MaxPieces, s"doc: $n pieces")
    val cps = (0 to n).map(i => u32(table, pos + 4 * i))
    val pcdBase = pos + 4 * (n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    var total = 0L
    while (i < n) {
      val len = cps(i + 1) - cps(i)
      require(len >= 0, s"doc: piece $i has negative length")
      total += len
      require(total <= MaxChars, "doc: text longer than the cap")
      val fcRaw = u32(table, pcdBase + 8 * i + 2)
      val compressed = (fcRaw & 0x40000000L) != 0
      val off = (fcRaw & 0x3FFFFFFFL) / (if (compressed) 2 else 1)
      val byteLen = len * (if (compressed) 1 else 2)
      require(off >= 0 && off + byteLen <= word.length,
        s"doc: piece $i [$off,+$byteLen) outside the WordDocument stream")
      val raw = java.util.Arrays.copyOfRange(word, off.toInt, (off + byteLen).toInt)
      val text =
        if (compressed) new String(raw, java.nio.charset.Charset.forName("windows-1252"))
        else new String(raw, StandardCharsets.UTF_16LE)
      text.foreach {
        case '\r' | '\u000B' | '\u000C' => sb.append('\n')
        case '\u0007' => sb.append('\t')
        case '\u0013' | '\u0014' | '\u0015' | '\u0001' => () // field/object marks
        case c => sb.append(c)
      }
      i += 1
    }
    // the final paragraph mark every writer emits is framing, not text
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
      sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Word 6/95 (nFib < 0x00C1): no FibRgFcLcb97, but a NON-complex
    * (fully-saved) document's text is simply the cp1252 byte run
    * [fcMin, fcMac) of the WordDocument stream (FIB base offsets
    * 0x18/0x1C) — the overwhelmingly common shape for files that old.
    * Fast-saved documents (fComplex, FIB flag bit 2) interleave
    * revision pieces and NEED the era's piece table — a NAMED reject,
    * never interleaved garbage text.
    */
  private def extractPre97(word: Array[Byte], nFib: Int): String = {
    require(word.length >= 0x20, "doc: pre-97 FIB truncated")
    val flags = u16(word, 0x0A)
    require((flags & 0x0004) == 0,
      f"doc: fast-saved pre-Word-97 binary (nFib 0x$nFib%04X, fComplex) unsupported")
    val fcMin = u32(word, 0x18)
    val fcMac = u32(word, 0x1C)
    require(fcMin >= 0 && fcMac >= fcMin && fcMac <= word.length,
      s"doc: pre-97 text run [$fcMin,$fcMac) outside the WordDocument stream")
    require(fcMac - fcMin <= MaxChars, "doc: text longer than the cap")
    val raw = java.util.Arrays.copyOfRange(word, fcMin.toInt, fcMac.toInt)
    val text = new String(raw, java.nio.charset.Charset.forName("windows-1252"))
    val sb = new java.lang.StringBuilder(text.length)
    text.foreach {
      case '\r' | '\u000B' | '\u000C' => sb.append('\n')
      case '\u0007' => sb.append('\t')
      case '\u0013' | '\u0014' | '\u0015' | '\u0001' => ()
      case c => sb.append(c)
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
      sb.setLength(sb.length - 1)
    sb.toString
  }

  // ----------------------------------------------------------------- writer

  /** Deterministic .doc writer — the oracle half. Paragraphs joined by
    * paragraph marks (plus the final mark Word always emits). The text
    * is stored as TWO pieces when it splits cleanly and any char needs
    * UTF-16 (piece 0 compressed cp1252 up to the first non-cp1252
    * char, piece 1 UTF-16LE) — exercising both PCD lanes — else one
    * piece in whichever encoding fits.
    */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    require(paragraphs.nonEmpty, "doc write: at least one paragraph")
    require(paragraphs.last.nonEmpty && !paragraphs.last.endsWith("\n"),
      "doc write: final paragraph must not be empty or end with a line break")
    val text = paragraphs.mkString("\r") + "\r"
    def cp1252able(c: Char): Boolean =
      c == '\r' || c == '\t' || Cp1252.encode.contains(c)
    // split: longest cp1252 prefix, rest UTF-16 (if any)
    val firstWide = text.indexWhere(!cp1252able(_))
    val pieces: Seq[(String, Boolean)] = // (text, compressed)
      if (firstWide < 0) Seq((text, true))
      else if (firstWide == 0) Seq((text, false))
      else Seq((text.substring(0, firstWide), true),
        (text.substring(firstWide), false))
    // ---- WordDocument stream: FIB (padded to 1024) + piece bytes
    val fibLen = 1024
    val pieceBytes = pieces.map { case (t, comp) =>
      if (comp) t.map(c =>
        if (c == '\r' || c == '\t') c.toByte else Cp1252.encode(c).toByte).toArray
      else t.getBytes(StandardCharsets.UTF_16LE)
    }
    val word = new java.io.ByteArrayOutputStream()
    val fib = new Array[Byte](fibLen)
    def fU16(o: Int, v: Int): Unit = {
      fib(o) = (v & 0xff).toByte; fib(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def fU32(o: Int, v: Long): Unit = {
      fib(o) = (v & 0xff).toByte; fib(o + 1) = ((v >> 8) & 0xff).toByte
      fib(o + 2) = ((v >> 16) & 0xff).toByte; fib(o + 3) = ((v >> 24) & 0xff).toByte
    }
    fU16(0, 0xA5EC) // wIdent
    fU16(2, 0x00C1) // nFib: Word 97
    fU16(6, 0x0409) // lid: en-US
    fU16(0x0A, 0x0200) // fWhichTblStm: 1Table
    fU16(0x0C, 0x00BF) // nFibBack
    fU16(32, 0x000E) // csw
    fU16(62, 0x0016) // cslw
    fU32(64 + 12, text.length.toLong) // fibRgLw97.ccpText
    fU16(152, 0x005D) // cbRgFcLcb for nFib 00C1
    // fcClx/lcbClx: the Clx sits at offset 0 of 1Table
    val nPieces = pieces.length
    val lcbPlcPcd = 4L * (nPieces + 1) + 8L * nPieces
    fU32(0x01A2, 0L)
    fU32(0x01A6, 1 + 4 + lcbPlcPcd) // clxt + lcb + PlcPcd
    word.write(fib)
    pieceBytes.foreach(word.write)
    val wordStream = word.toByteArray
    // ---- 1Table stream: the Clx (Pcdt only, no Prc blocks)
    val tbl = new java.io.ByteArrayOutputStream()
    def tU32(v: Long): Unit = {
      tbl.write((v & 0xff).toInt); tbl.write(((v >> 8) & 0xff).toInt)
      tbl.write(((v >> 16) & 0xff).toInt); tbl.write(((v >> 24) & 0xff).toInt)
    }
    tbl.write(0x02)
    tU32(lcbPlcPcd)
    var cp = 0L
    tU32(0)
    pieces.foreach { case (t, _) => cp += t.length; tU32(cp) }
    var fc = fibLen.toLong
    pieces.zip(pieceBytes).foreach { case ((_, comp), pb) =>
      tbl.write(0); tbl.write(0) // PCD flags
      tU32(if (comp) (fc * 2) | 0x40000000L else fc)
      tbl.write(0); tbl.write(0) // prm
      fc += pb.length
    }
    Cfb.write(Seq("WordDocument" -> wordStream, "1Table" -> tbl.toByteArray))
  }

  /** Deterministic Word-95 writer (nFib 0x0068, non-complex): FIB base
    * only, text as one cp1252 run at [fcMin, fcMac). The fixture half
    * of [[extractPre97]]; every char must be cp1252-encodable.
    */
  def write95(paragraphs: Seq[String]): Array[Byte] = {
    require(paragraphs.nonEmpty, "doc write: at least one paragraph")
    require(paragraphs.last.nonEmpty && !paragraphs.last.endsWith("\n"),
      "doc write: final paragraph must not be empty or end with a line break")
    val text = paragraphs.mkString("\r") + "\r"
    val body = text.map { c =>
      require(c == '\r' || c == '\t' || Cp1252.encode.contains(c),
        s"doc write95: char U+" + f"${c.toInt}%04X" + " not cp1252-encodable")
      if (c == '\r' || c == '\t') c.toByte else Cp1252.encode(c).toByte
    }.toArray
    val fcMin = 1024
    val word = new Array[Byte](fcMin + body.length)
    def wU16(o: Int, v: Int): Unit = {
      word(o) = (v & 0xff).toByte; word(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def wU32(o: Int, v: Long): Unit = {
      word(o) = (v & 0xff).toByte; word(o + 1) = ((v >> 8) & 0xff).toByte
      word(o + 2) = ((v >> 16) & 0xff).toByte; word(o + 3) = ((v >> 24) & 0xff).toByte
    }
    wU16(0, 0xA5EC); wU16(2, 0x0068) // wIdent, nFib: Word 95
    wU16(0x0A, 0x0000) // flags: NOT fComplex
    wU32(0x18, fcMin.toLong); wU32(0x1C, (fcMin + body.length).toLong)
    System.arraycopy(body, 0, word, fcMin, body.length)
    Cfb.write(Seq("WordDocument" -> word))
  }

  /** Shared cp1252 encode table (the Rtf/WinAnsi lineage). */
  private object Cp1252 {
    private val decode: Array[Char] = {
      val cs = java.nio.charset.Charset.forName("windows-1252")
      (0 until 256).map { b =>
        val s = new String(Array(b.toByte), cs)
        if (s.isEmpty) b.toChar else s.charAt(0)
      }.toArray
    }
    val encode: Map[Char, Int] =
      decode.zipWithIndex.collect {
        case (c, i) if c != '\uFFFD' && c >= ' ' => c -> i
      }.toMap
  }
}
