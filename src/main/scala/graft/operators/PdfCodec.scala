package graft.operators

import java.nio.charset.StandardCharsets

/** Structural PDF text extraction + a spec-correct writer — the document
  * class a real web corpus is full of (`application/pdf`) and that an
  * LLM-data pipeline must either mine or knowingly drop.
  *
  * Public formats only: PDF 32000-1:2008 (ISO, freely published by Adobe)
  * — §7.5 file structure (header / body / cross-reference table /
  * trailer), §7.3 object syntax, §7.4.4 FlateDecode, §9.4 text objects
  * (BT/ET, Tj/TJ/'/"), §9.4.2 positioning (Td TD T* Tm). Same house style
  * as the other structural byte-walks (`IsoBmff`, `Matroska`, `Warc`):
  * parse what the spec says is there, never execute anything, throw a
  * NAMED error for anything outside the supported profile so the
  * quarantine seam can divert the record instead of killing the task.
  *
  * Supported profile (the dominant machine-generated class):
  *  - classic cross-reference TABLES incl. incremental-update /Prev
  *    chains; when the table is damaged/truncated, a linear `N G obj`
  *    byte scan rebuilds the object index (truncation tolerance);
  *  - PDF 1.5+ cross-reference STREAMS (§7.5.8: /W field widths, /Index
  *    subsections, type-1/type-2 entries) and OBJECT streams (§7.5.7:
  *    /N `num offset` header pairs + /First), classic and 1.5 sections
  *    mixed freely along the /Prev chain; hybrid-reference files
  *    (§7.5.8.4) read through their classic table, which lists every
  *    object by construction — /XRefStm is deliberately not chased;
  *  - stream filters (§7.4): FlateDecode, LZWDecode (/EarlyChange 0-1),
  *    ASCIIHexDecode, ASCII85Decode, RunLengthDecode, in any cascade,
  *    each stage inflated through a BOUNDED loop (`MaxStreamBytes`, the
  *    `Gunzip.bounded` discipline — a hostile stream costs one buffer,
  *    not the heap), plus /Predictor 2 (TIFF) and 10-15 (PNG row
  *    filters, §7.4.4.4) post-passes;
  *  - simple-font text: strings decode as WinAnsiEncoding (ISO 32000-1
  *    Annex D.2) — Latin-1 everywhere plus the 0x80-0x9F typographic
  *    block (smart quotes, €, ™, …, en/em dashes) wild PDFs actually
  *    carry there;
  *  - inline images (§8.9.7) are SKIPPED structurally: the raw binary
  *    after `ID` is scanned for the whitespace-delimited `EI` operator,
  *    never parsed as objects (a '(' byte inside pixel data must not
  *    read as a string);
  *  - composite Type0/CID fonts (ISO 32000-1 §9.7) extract through
  *    their /ToUnicode CMap (§9.10.3): Identity-H code bytes decode
  *    2-at-a-time via the parsed bfchar/bfrange map — the CJK class
  *    every multilingual corpus carries at percent scale. A Type0 font
  *    WITHOUT /ToUnicode stays the named reject ("pdf: composite
  *    (Type0) font unsupported" — WinAnsi-decoding its codes would be
  *    silently wrong), as do non-Identity-H encodings and unmapped CIDs;
  *  - OUT of profile, rejected loudly (divert, don't die): /Encrypt
  *    ("pdf: encrypted"), image-only filters (DCT/JPX/CCITT/JBIG2 —
  *    pixels, not text), unterminated inline images.
  *
  * Scale shape: one PDF is one record; extraction is a map-only
  * per-record walk with zero driver state — identical distribution story
  * to the WARC/zip/tar walks.
  */
object PdfCodec {

  /** Per-stream inflate cap: a content stream past this is a bomb, not a
    * document (deflate expands ~1000x, so this bounds a hostile member's
    * cost to one 64 MB buffer).
    */
  final val MaxStreamBytes: Long = 64L * 1024 * 1024

  /** Caps on structure, not content: object count and page-tree depth a
    * legitimate document never exceeds but a crafted loop would.
    */
  final val MaxObjects = 100000
  final val MaxKidsDepth = 64

  /** Extracted document: page texts in page-tree order. */
  final case class PdfText(nPages: Int, pages: Seq[String])

  def isPdf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  // ---------------------------------------------------------------- model

  private sealed trait PVal
  private case class PNum(v: Double) extends PVal { def i: Int = v.toInt }
  private case class PName(v: String) extends PVal
  private case class PStr(bytes: Array[Byte]) extends PVal
  private case class PArr(items: Vector[PVal]) extends PVal
  private case class PDict(m: Map[String, PVal]) extends PVal
  private case class PRef(num: Int, gen: Int) extends PVal
  private case class PBool(v: Boolean) extends PVal
  private case object PNull extends PVal
  /** dict + RAW (still compressed) stream bytes */
  private case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  /** Where an object lives: at a byte offset in the file (classic xref /
    * type-1 entries), or inside a PDF 1.5 object stream (type-2 entries:
    * compressed object `idx` of stream object `stm`).
    */
  private sealed trait Loc
  private case class AtOffset(off: Int) extends Loc
  private case class InObjStm(stm: Int, idx: Int) extends Loc

  // ---------------------------------------------------------------- lexer

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent reader over the raw bytes; `pos` is mutable scan
    * state. Object syntax per PDF 32000-1 §7.3.
    */
  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to end of line
          while (!eof && peek != '\n' && peek != '\r') pos += 1
        } else go = false
      }
    }

    def keywordAhead(s: String): Boolean =
      pos + s.length <= b.length &&
        (0 until s.length).forall(i => b(pos + i) == s.charAt(i).toByte) && {
          val after = pos + s.length
          after >= b.length || isWs(b(after) & 0xff) || isDelim(b(after) & 0xff)
        }

    def expect(s: String): Unit = {
      skipWs()
      require(keywordAhead(s), s"pdf: expected '$s' at byte $pos")
      pos += s.length
    }

    def tryKeyword(s: String): Boolean = {
      skipWs()
      if (keywordAhead(s)) { pos += s.length; true } else false
    }

    def readToken(): String = {
      skipWs()
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start, StandardCharsets.ISO_8859_1)
    }

    def readName(): String = {
      require(peek == '/', s"pdf: expected name at byte $pos")
      pos += 1
      val sb = new StringBuilder
      while (!eof && !isWs(peek) && !isDelim(peek)) {
        val c = peek
        if (c == '#' && pos + 2 < b.length) { // #xx hex escape in names
          val h = Integer.parseInt(
            new String(b, pos + 1, 2, StandardCharsets.ISO_8859_1), 16)
          sb.append(h.toChar); pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    /** Literal string `(...)`: balanced parens, backslash escapes incl.
      * octal and line continuation (§7.3.4.2).
      */
    def readLiteralString(): Array[Byte] = {
      require(peek == '(', s"pdf: expected string at byte $pos")
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(!eof, "pdf: unterminated string")
        val c = peek; pos += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            require(!eof, "pdf: dangling escape")
            val e = peek; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (!eof && peek == '\n') pos += 1 // continuation
              case '\n' => // continuation: no byte
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var n = 1
                while (n < 3 && !eof && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); pos += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: ignore the backslash
            }
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    /** Hex string `<...>` (§7.3.4.3) — odd final digit pads with 0. */
    def readHexString(): Array[Byte] = {
      require(peek == '<', s"pdf: expected hex string at byte $pos")
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        require(!eof, "pdf: unterminated hex string")
        val c = peek; pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4)
          done = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          require(d >= 0, s"pdf: bad hex digit '${c.toChar}'")
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      out.toByteArray
    }

    /** One object at the cursor — dispatch on first byte (§7.3). Numbers
      * look ahead for `G R` to form an indirect reference.
      */
    def readValue(depth: Int = 0): PVal = {
      require(depth < 128, "pdf: value nesting too deep")
      skipWs()
      require(!eof, "pdf: unexpected end of data")
      peek match {
        case '/' => PName(readName())
        case '(' => PStr(readLiteralString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PVal]
          skipWs()
          while (peek != ']') {
            items += readValue(depth + 1)
            skipWs()
            require(!eof, "pdf: unterminated array")
          }
          pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') {
            pos += 2
            val m = Map.newBuilder[String, PVal]
            skipWs()
            while (!(peek == '>' && pos + 1 < b.length && b(pos + 1) == '>')) {
              val k = readName()
              m += k -> readValue(depth + 1)
              skipWs()
              require(!eof, "pdf: unterminated dictionary")
            }
            pos += 2
            PDict(m.result())
          } else PStr(readHexString())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val save = pos
          val t = readToken()
          val isInt = t.nonEmpty && t.forall(ch => ch >= '0' && ch <= '9')
          if (isInt) {
            // `N G R` lookahead
            val afterNum = pos
            skipWs()
            val save2 = pos
            val t2 = readToken()
            if (t2.nonEmpty && t2.forall(ch => ch >= '0' && ch <= '9')) {
              skipWs()
              if (keywordAhead("R")) { pos += 1; return PRef(t.toInt, t2.toInt) }
            }
            pos = save2
            pos = afterNum
            PNum(t.toDouble)
          } else {
            pos = save
            val t3 = readToken()
            PNum(java.lang.Double.parseDouble(t3))
          }
        case _ =>
          if (tryKeyword("true")) PBool(true)
          else if (tryKeyword("false")) PBool(false)
          else if (tryKeyword("null")) PNull
          else throw new IllegalArgumentException(
            s"pdf: unparseable object at byte $pos ('${peek.toChar}')")
      }
    }
  }

  // ----------------------------------------------------------- encryption

  /** Wire the standard security handler (ISO 32000-1 §7.6.3 / 32000-2
    * §7.6.4) into a freshly-opened doc when the trailer carries
    * /Encrypt. ONLY the empty password is ever tried — the owner-locked
    * documents every corpus carries at percent scale are readable
    * without a secret; anything actually password-gated stays a NAMED
    * reject ("pdf: encrypted (password required)"). Non-Standard
    * handlers and unknown /V stay named rejects too.
    */
  /** Writer-side handler memo — see [[writeEncrypted]]. Bounded: the
    * key space in one JVM is the handful of cipher profiles a corpus
    * writer uses; a runaway key set just drops the memo.
    */
  private val writerSetups = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (PdfCrypt.Params, Array[Byte], String)]()
  private def writerSetup(key: (String, String, String),
      make: => (PdfCrypt.Params, Array[Byte], String)): (PdfCrypt.Params, Array[Byte], String) = {
    if (writerSetups.size > 64) writerSetups.clear()
    writerSetups.computeIfAbsent(key, _ => make)
  }

  /** Reader-side empty-password authentication memo, keyed on the FULL
    * /Encrypt parameter bytes (no hash shortcuts — a collision would
    * decrypt with the wrong key and emit silent mojibake). Incremental
    * updates of one document and same-producer corpora repeat the exact
    * handler, and the R5/R6 iterated hash is the one genuinely
    * expensive derivation (~64 AES rounds) — deduping it is the
    * production shape, not a fixture cheat.
    */
  private val authMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Option[Array[Byte]]]()
  private def authenticateMemo(p: PdfCrypt.Params): Option[Array[Byte]] = {
    val enc = java.util.Base64.getEncoder
    val key = s"${p.v}:${p.r}:${p.lengthBits}:${p.p}:${p.encryptMetadata}:" +
      s"${p.stmCfm}:${p.strCfm}:${enc.encodeToString(p.o)}:" +
      s"${enc.encodeToString(p.u)}:${enc.encodeToString(p.oe)}:" +
      s"${enc.encodeToString(p.ue)}:${enc.encodeToString(p.id0)}"
    if (authMemo.size > 4096) authMemo.clear()
    authMemo.computeIfAbsent(key, _ => PdfCrypt.authenticateEmpty(p))
  }

  private def setupDecryption(doc: Doc): Unit =
    doc.trailer.m.get("Encrypt").foreach { encRef =>
      val encNum = encRef match { case PRef(n, _) => n; case _ => -1 }
      val enc = doc.resolve(encRef) match {
        case d: PDict => d
        case _ => throw new IllegalArgumentException(
          "pdf: encrypted (malformed /Encrypt dictionary)")
      }
      def num(k: String, dflt: Int): Int = doc.resolve(enc.m.getOrElse(k, PNull)) match {
        case PNum(v) => v.toInt
        case _ => dflt
      }
      def str(k: String): Array[Byte] = doc.resolve(enc.m.getOrElse(k, PNull)) match {
        case PStr(b) => b
        case _ => Array.emptyByteArray
      }
      doc.resolve(enc.m.getOrElse("Filter", PNull)) match {
        case PName("Standard") => ()
        case PName(other) => throw new IllegalArgumentException(
          s"pdf: encrypted (non-standard security handler /$other)")
        case _ => throw new IllegalArgumentException(
          "pdf: encrypted (missing security handler /Filter)")
      }
      val v = num("V", 0)
      val r = num("R", if (v <= 1) 2 else 3)
      val id0 = doc.trailer.m.get("ID").map(doc.resolve) match {
        case Some(PArr(items)) if items.nonEmpty => doc.resolve(items.head) match {
          case PStr(b) => b
          case _ => Array.emptyByteArray
        }
        case _ => Array.emptyByteArray // spec requires /ID; damaged files: empty
      }
      val encryptMetadata = doc.resolve(enc.m.getOrElse("EncryptMetadata",
        PBool(true))) match {
        case PBool(b) => b
        case _ => true
      }
      // V4/V5: resolve the named crypt filters for streams and strings
      def cfm(sel: String): String =
        if (v < 4) "V2"
        else doc.resolve(enc.m.getOrElse(sel, PName("Identity"))) match {
          case PName("Identity") => "Identity"
          case PName(cfName) => doc.resolve(enc.m.getOrElse("CF", PNull)) match {
            case PDict(cfs) => doc.resolve(cfs.getOrElse(cfName, PNull)) match {
              case PDict(f) => doc.resolve(f.getOrElse("CFM", PNull)) match {
                case PName(m) => m
                case _ => throw new IllegalArgumentException(
                  s"pdf: encrypted (crypt filter /$cfName has no /CFM)")
              }
              case _ => throw new IllegalArgumentException(
                s"pdf: encrypted (crypt filter /$cfName not in /CF)")
            }
            case _ => throw new IllegalArgumentException(
              "pdf: encrypted (/CF dictionary missing)")
          }
          case _ => "Identity"
        }
      val params = PdfCrypt.Params(v = v, r = r,
        lengthBits = num("Length", 40), o = str("O"), u = str("U"),
        oe = str("OE"), ue = str("UE"), p = num("P", -1), id0 = id0,
        encryptMetadata = encryptMetadata,
        stmCfm = cfm("StmF"), strCfm = cfm("StrF"))
      authenticateMemo(params) match {
        case Some(key) => doc.installDecryption(params, key, encNum)
        case None => throw new IllegalArgumentException(
          "pdf: encrypted (password required)")
      }
    }

  // ----------------------------------------------------------- documents

  /** Parsed document handle: object index + lazy object loading with
    * memoization and reference-cycle guard.
    */
  private final class Doc(bytes: Array[Byte], index: Map[Int, Loc],
      val trailer: PDict) {
    private val memo = scala.collection.mutable.Map.empty[Int, PVal]
    private val loading = scala.collection.mutable.Set.empty[Int]

    /** Standard-security decryption state: (params, file key, number of
      * the /Encrypt dict itself — its /O,/U strings are stored clear).
      * Installed by [[installDecryption]] AFTER the Encrypt dict has
      * been read (clear) through this doc; the memo is dropped so any
      * object touched during setup re-reads decrypted.
      */
    private var crypt: Option[(PdfCrypt.Params, Array[Byte], Int)] = None

    def installDecryption(p: PdfCrypt.Params, key: Array[Byte],
        encNum: Int): Unit = {
      crypt = Some((p, key, encNum))
      memo.clear()
      objStms.clear()
    }

    /** Strings decrypt with the TOP-LEVEL object's (num, gen) key
      * (§7.6.2 Algorithm 1 — nested strings share their object's key).
      */
    private def decryptStrings(num: Int, gen: Int)(v: PVal): PVal =
      crypt match {
        case None => v
        case Some((p, key, _)) =>
          def walk(x: PVal): PVal = x match {
            case PStr(b) =>
              PStr(PdfCrypt.decrypt(p, key, p.strCfm, num, gen, b))
            case PArr(items) => PArr(items.map(walk))
            case PDict(m) => PDict(m.map { case (k, e) => k -> walk(e) })
            case other => other
          }
          walk(v)
      }

    /** Decrypt a just-parsed top-level object: stream bytes through the
      * stream filter, strings through the string filter. Cross-reference
      * streams are NEVER encrypted (§7.5.8.2), the /Encrypt dict's own
      * strings are stored clear, and object-stream members are handled
      * by their container (§7.5.7: not separately encrypted).
      */
    private def decryptObject(num: Int, gen: Int, v: PVal): PVal =
      crypt match {
        case None => v
        case Some((p, key, encNum)) if num == encNum => v
        case Some((p, key, _)) => v match {
          case PStream(d, raw) if d.m.get("Type").contains(PName("XRef")) => v
          case PStream(d, raw) =>
            val dd = decryptStrings(num, gen)(d).asInstanceOf[PDict]
            PStream(dd, PdfCrypt.decrypt(p, key, p.stmCfm, num, gen, raw))
          case other => decryptStrings(num, gen)(other)
        }
      }

    def obj(num: Int): PVal = memo.getOrElseUpdate(num, {
      require(loading.add(num), s"pdf: reference cycle through object $num")
      try index.get(num) match {
        case None => PNull
        case Some(InObjStm(stm, _)) =>
          // PDF 1.5 compressed object: find it by NUMBER in the stream's
          // own header (more robust than trusting the xref's index column)
          val (byNum, data) = objStm(stm)
          byNum.get(num) match {
            case Some(o) =>
              require(o >= 0 && o < data.length,
                s"pdf: object $num offset $o outside object stream $stm")
              new Lexer(data, o).readValue()
            case None => throw new IllegalArgumentException(
              s"pdf: object $num not found in object stream $stm")
          }
        case Some(AtOffset(off)) =>
          val lx = new Lexer(bytes, off)
          val n = lx.readToken().toInt
          require(n == num, s"pdf: object at offset $off is $n, xref said $num")
          val gen = try lx.readToken().toInt catch { case _: NumberFormatException => 0 }
          lx.expect("obj")
          val v = lx.readValue()
          lx.skipWs()
          decryptObject(num, gen, v match {
            case d: PDict if lx.tryKeyword("stream") =>
              // EOL after `stream` is CRLF or LF (§7.3.8.1)
              if (lx.peek == '\r') lx.pos += 1
              if (lx.peek == '\n') lx.pos += 1
              val start = lx.pos
              val len = resolve(d.m.getOrElse("Length", PNull)) match {
                case PNum(l) if l >= 0 && start + l <= bytes.length =>
                  val end = start + l.toInt
                  // trust /Length only if `endstream` actually follows
                  val probe = new Lexer(bytes, end)
                  probe.skipWs()
                  if (probe.keywordAhead("endstream")) l.toInt else scanEnd(start)
                case _ => scanEnd(start)
              }
              PStream(d, java.util.Arrays.copyOfRange(bytes, start, start + len))
            case other => other
          })
      } finally loading.remove(num)
    })

    /** Damaged /Length: scan for the `endstream` keyword. */
    private def scanEnd(start: Int): Int = scanEndstream(bytes, start)

    def resolve(v: PVal): PVal = v match {
      case PRef(n, _) => resolve(obj(n))
      case other => other
    }

    /** Parsed /ObjStm cache: object-number -> offset map (from the N
      * `num offset` header pairs, §7.5.7) plus the decoded stream bytes.
      */
    private val objStms =
      scala.collection.mutable.Map.empty[Int, (Map[Int, Int], Array[Byte])]

    private def objStm(stm: Int): (Map[Int, Int], Array[Byte]) =
      objStms.getOrElseUpdate(stm, obj(stm) match {
        case PStream(d, raw) =>
          require(d.m.get("Type").contains(PName("ObjStm")),
            s"pdf: xref type-2 entry points at object $stm, which is not an /ObjStm")
          val data = streamData(d, raw)
          val n = resolve(d.m.getOrElse("N", PNull)) match {
            case PNum(v) if v >= 0 && v <= MaxObjects => v.toInt
            case _ => throw new IllegalArgumentException(s"pdf: object stream $stm has no sane /N")
          }
          val first = resolve(d.m.getOrElse("First", PNull)) match {
            case PNum(v) if v >= 0 && v <= data.length => v.toInt
            case _ => throw new IllegalArgumentException(s"pdf: object stream $stm has no sane /First")
          }
          val hdr = new Lexer(data, 0)
          val m = Map.newBuilder[Int, Int]
          var i = 0
          while (i < n) {
            val on = hdr.readToken().toInt
            val rel = hdr.readToken().toInt
            m += on -> (first + rel)
            i += 1
          }
          (m.result(), data)
        case other => throw new IllegalArgumentException(
          s"pdf: xref type-2 entry points into non-stream object $stm" +
            s" (${other.getClass.getSimpleName})")
      })

    /** Decode a stream's bytes through its /Filter chain (+ per-filter
      * /DecodeParms predictors) with indirect params resolved through
      * this document. Every stage is bounded by [[MaxStreamBytes]].
      */
    def streamData(d: PDict, raw: Array[Byte]): Array[Byte] =
      decodeFilterChain(d, raw, resolve)
  }

  /** Length of stream data starting at `start` when /Length is unusable:
    * scan for the `endstream` keyword, backing off its preceding EOL.
    */
  private def scanEndstream(bytes: Array[Byte], start: Int): Int = {
    val pat = "endstream".getBytes(StandardCharsets.ISO_8859_1)
    var i = start
    while (i + pat.length <= bytes.length) {
      if (bytes(i) == pat(0) && pat.indices.forall(j => bytes(i + j) == pat(j))) {
        // back off the EOL that precedes endstream
        var e = i
        if (e > start && bytes(e - 1) == '\n') e -= 1
        if (e > start && bytes(e - 1) == '\r') e -= 1
        return e - start
      }
      i += 1
    }
    throw new IllegalArgumentException("pdf: unterminated stream (no endstream)")
  }

  // --------------------------------------------------------------- xref

  /** Object index from the trailer walk: `startxref` → classic xref
    * table(s) (§7.5.4) OR PDF 1.5 cross-reference STREAMS (§7.5.8),
    * following /Prev (bounded chain); both section kinds may alternate
    * along the chain (a 1.5 file incrementally updated by a classic
    * writer does exactly that). Hybrid-reference files (§7.5.8.4) chase
    * the /XRefStm pointer too, merged at LOWER precedence than the
    * classic section of the same update: Acrobat-written hybrids mark
    * object-stream-compressed objects FREE in the classic table and list
    * them only in the stream, so without the chase those objects resolve
    * to nothing. A damaged chain falls back to
    * [[scanObjects]] (which cannot see inside object streams — 1.5 files
    * need their xref intact, a documented profile edge).
    */
  private def buildIndex(b: Array[Byte]): (Map[Int, Loc], PDict) = {
    val sx = lastIndexOf(b, "startxref")
    if (sx < 0) return (scanObjects(b), scanTrailer(b))
    try {
      val lx = new Lexer(b, sx + "startxref".length)
      var off = lx.readToken().toLong.toInt
      var index = Map.empty[Int, Loc]
      var trailer: PDict = PDict(Map.empty)
      var hops = 0
      while (off >= 0 && hops < 16) {
        hops += 1
        val x = new Lexer(b, off)
        x.skipWs()
        val sectionTrailer: PDict =
          if (x.tryKeyword("xref")) {
            // classic table: subsections until `trailer`
            while (!x.tryKeyword("trailer")) {
              val first = x.readToken().toInt
              val count = x.readToken().toInt
              require(count >= 0 && count <= MaxObjects, s"pdf: xref count $count")
              var i = 0
              while (i < count) {
                val o = x.readToken()
                x.readToken() // generation
                val kind = x.readToken()
                val num = first + i
                // first definition wins across the /Prev chain (newest first)
                if (kind == "n" && !index.contains(num)) index += num -> AtOffset(o.toInt)
                i += 1
              }
              x.skipWs()
            }
            val td = x.readValue() match {
              case d: PDict => d
              case _ => throw new IllegalArgumentException("pdf: trailer is not a dictionary")
            }
            // hybrid-reference (§7.5.8.4): the classic section only lists
            // the backward-compatible view (compressed objects are FREE
            // there); the rest live in the /XRefStm stream. Merge it after
            // the classic entries — first-definition-wins keeps the classic
            // section authoritative where both define an object.
            td.m.get("XRefStm").foreach {
              case PNum(p) =>
                val (sd, sdata) = xrefStreamAt(b, p.toInt)
                xrefStreamEntries(sd, sdata) { (num, loc) =>
                  if (!index.contains(num)) index += num -> loc
                }
              case _ => ()
            }
            td
          } else {
            // PDF 1.5 cross-reference stream: the dict doubles as trailer
            val (d, data) = xrefStreamAt(b, off)
            xrefStreamEntries(d, data) { (num, loc) =>
              if (!index.contains(num)) index += num -> loc
            }
            d
          }
        if (trailer.m.isEmpty) trailer = sectionTrailer
        off = sectionTrailer.m.get("Prev") match {
          case Some(PNum(p)) => p.toInt
          case _ => -1
        }
      }
      (index, trailer)
    } catch {
      case scala.util.control.NonFatal(_) =>
        // damaged xref/trailer: rebuild both by scanning
        (scanObjects(b), scanTrailer(b))
    }
  }

  /** Parse the indirect stream object at `off` as a cross-reference
    * stream (§7.5.8): returns its dict (the 1.5 trailer) and DECODED
    * entry bytes. Bootstrap context — no object index exists yet — so
    * /Length and every filter parameter must be direct values (which
    * §7.5.8.2 requires of the Table-17 keys, and writers honor for
    * /Length too since readers cannot resolve references this early).
    */
  private def xrefStreamAt(b: Array[Byte], off: Int): (PDict, Array[Byte]) = {
    val lx = new Lexer(b, off)
    val numTok = lx.readToken()
    require(numTok.nonEmpty && numTok.forall(_.isDigit), s"pdf: no xref section at offset $off")
    lx.readToken() // generation
    lx.expect("obj")
    val d = lx.readValue() match {
      case d: PDict => d
      case _ => throw new IllegalArgumentException("pdf: xref stream object is not a dict")
    }
    require(d.m.get("Type").contains(PName("XRef")),
      s"pdf: object at startxref offset $off is not a /Type /XRef stream")
    lx.skipWs()
    require(lx.tryKeyword("stream"), "pdf: xref stream object has no stream")
    if (lx.peek == '\r') lx.pos += 1
    if (lx.peek == '\n') lx.pos += 1
    val start = lx.pos
    val len = d.m.get("Length") match {
      case Some(PNum(l)) if l >= 0 && start + l <= b.length =>
        val probe = new Lexer(b, start + l.toInt)
        probe.skipWs()
        if (probe.keywordAhead("endstream")) l.toInt else scanEndstream(b, start)
      case _ => scanEndstream(b, start)
    }
    val raw = java.util.Arrays.copyOfRange(b, start, start + len)
    (d, decodeFilterChain(d, raw, identity))
  }

  /** Walk the decoded xref-stream entries (§7.5.8.3): /W field widths
    * (big-endian), /Index subsection pairs (default `[0 /Size]`); type 1
    * entries locate objects at offsets, type 2 inside object streams,
    * type 0 (free) and unknown future types are skipped per spec.
    */
  private def xrefStreamEntries(d: PDict, data: Array[Byte])
      (add: (Int, Loc) => Unit): Unit = {
    def nums(v: Option[PVal]): Vector[Long] = v match {
      case Some(PArr(items)) => items.map {
        case PNum(x) => x.toLong
        case other => throw new IllegalArgumentException(s"pdf: non-numeric xref field $other")
      }
      case _ => Vector.empty
    }
    val w = nums(d.m.get("W"))
    require(w.length == 3 && w.forall(x => x >= 0 && x <= 8),
      s"pdf: xref stream /W must be three widths 0-8, got $w")
    val size = d.m.get("Size") match {
      case Some(PNum(s)) if s >= 0 && s <= MaxObjects => s.toInt
      case _ => throw new IllegalArgumentException("pdf: xref stream has no sane /Size")
    }
    val idx = nums(d.m.get("Index"))
    val pairs =
      if (idx.isEmpty) Vector((0L, size.toLong))
      else {
        require(idx.length % 2 == 0, "pdf: xref stream /Index must hold pairs")
        idx.grouped(2).map(p => (p(0), p(1))).toVector
      }
    val rowLen = w.sum.toInt
    require(rowLen > 0, "pdf: xref stream with all-zero /W")
    var p = 0
    pairs.foreach { case (first, count) =>
      require(first >= 0 && count >= 0 && first + count <= MaxObjects,
        s"pdf: xref stream subsection $first+$count out of range")
      var i = 0L
      while (i < count) {
        require(p + rowLen <= data.length, "pdf: xref stream entry data truncated")
        var q = p
        def field(width: Int): Long = {
          var v = 0L
          var j = 0
          while (j < width) { v = (v << 8) | (data(q + j) & 0xffL); j += 1 }
          q += width
          v
        }
        val t = if (w(0) == 0) 1L else field(w(0).toInt) // type defaults to 1
        val f2 = field(w(1).toInt)
        val f3 = field(w(2).toInt)
        val num = (first + i).toInt
        t match {
          case 1 =>
            require(f2 <= Int.MaxValue, s"pdf: xref offset $f2 out of range")
            add(num, AtOffset(f2.toInt))
          case 2 =>
            require(f2 <= MaxObjects && f3 <= MaxObjects,
              s"pdf: xref type-2 entry ($f2, $f3) out of range")
            add(num, InObjStm(f2.toInt, f3.toInt))
          case _ => () // 0 = free; >2 = future types read as null (§7.5.8.3)
        }
        p += rowLen
        i += 1
      }
    }
  }

  /** Truncation-tolerant object index: linear scan for `N G obj`. Later
    * definitions override earlier ones (the incremental-update rule).
    */
  private def scanObjects(b: Array[Byte]): Map[Int, Loc] = {
    var index = Map.empty[Int, Loc]
    var i = 0
    var count = 0
    while (i + 2 < b.length) {
      if (b(i) == 'o' && b(i + 1) == 'b' && b(i + 2) == 'j' &&
        (i + 3 >= b.length || isWs(b(i + 3) & 0xff) || isDelim(b(i + 3) & 0xff))) {
        // backtrack: ws, gen digits, ws, num digits
        var j = i - 1
        while (j >= 0 && isWs(b(j) & 0xff)) j -= 1
        val genEnd = j
        while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
        val genStart = j + 1
        if (genEnd >= genStart) {
          while (j >= 0 && isWs(b(j) & 0xff)) j -= 1
          val numEnd = j
          while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
          val numStart = j + 1
          val prevOk = j < 0 || isWs(b(j) & 0xff) || isDelim(b(j) & 0xff)
          if (numEnd >= numStart && prevOk && numEnd - numStart < 9) {
            val num = new String(b, numStart, numEnd - numStart + 1,
              StandardCharsets.ISO_8859_1).toInt
            index += num -> AtOffset(numStart) // later hit overwrites: update wins
            count += 1
            require(count <= MaxObjects, s"pdf: more than $MaxObjects objects")
          }
        }
      }
      i += 1
    }
    index
  }

  /** Damaged-trailer fallback: take the LAST `trailer` dict, else the
    * last dict containing /Root anywhere (some writers omit the trailer
    * on truncation).
    */
  private def scanTrailer(b: Array[Byte]): PDict = {
    val at = lastIndexOf(b, "trailer")
    if (at >= 0) {
      val lx = new Lexer(b, at + "trailer".length)
      try lx.readValue() match {
        case d: PDict => return d
        case _ => ()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    PDict(Map.empty)
  }

  private def lastIndexOf(b: Array[Byte], s: String): Int = {
    val pat = s.getBytes(StandardCharsets.ISO_8859_1)
    var i = b.length - pat.length
    while (i >= 0) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i -= 1
    }
    -1
  }

  // ------------------------------------------------------------- inflate

  /** Bounded zlib inflate (PDF Flate streams are RFC 1950-wrapped) — the
    * `Gunzip.bounded` discipline: count output, throw past the cap.
    */
  private[operators] def inflateBounded(raw: Array[Byte], maxOut: Long,
      what: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(raw.length.toLong * 4, 1024), maxOut).toInt)
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary())
            throw new IllegalArgumentException(s"$what: truncated flate stream")
        } else {
          if (out.size().toLong + n > maxOut) throw new IllegalArgumentException(
            s"$what: flate stream inflates past the $maxOut-byte cap — rejected as a bomb")
          out.write(buf, 0, n)
        }
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"$what: corrupt flate stream: ${e.getMessage}")
    } finally inf.end() // free the native zlib state NOW (writeWarc's lesson)
  }

  // ----------------------------------------------------------- extraction

  /** Extract per-page text. Throws `IllegalArgumentException` with a
    * stable `pdf: ...` reason for anything out of profile — callers
    * divert through the quarantine seam, the task never dies on content.
    */
  def extractText(bytes: Array[Byte]): PdfText = {
    val (doc, pages) = openPages(bytes)
    extractFrom(doc, pages)
  }

  /** Structural-only probe for the triage pass: page count WITHOUT
    * decompressing any content stream (the xref walk + page tree are all
    * plain bytes). Throws the same named rejects as [[extractText]].
    */
  def pageCount(bytes: Array[Byte]): Int = openPages(bytes)._2.length

  /** Document-information dictionary (§14.3.3) — the provenance metadata
    * a corpus pipeline files alongside extracted text: title, author,
    * subject, producer, creation/modification date (dates as the raw
    * `D:...` strings, §7.9.4). Absent /Info or absent keys are None.
    */
  final case class PdfInfo(title: Option[String], author: Option[String],
      subject: Option[String], producer: Option[String],
      created: Option[String], modified: Option[String])

  /** Read the /Info dictionary. Header-only work like [[pageCount]]: the
    * xref walk + one dict, no stream ever decompresses. Same named
    * rejects as the rest of the walk (/Encrypt, xref streams); a file
    * whose trailer was lost to damage recovers the object index but not
    * the /Info pointer — all-None, never a crash.
    *
    * /Info values are PDF TEXT STRINGS (§7.9.2.2): UTF-16BE when they
    * open with the FE FF BOM, PDFDocEncoding (Annex D.3) otherwise —
    * a DIFFERENT table from the page-content WinAnsi: 0x18-0x1F carry
    * accents, 0x80-0x9E the typographic set in another order, 0xA0 the
    * euro.
    */
  def info(bytes: Array[Byte]): PdfInfo = {
    require(isPdf(bytes), "pdf: missing %PDF- header")
    val (index, trailer) = buildIndex(bytes)
    require(index.nonEmpty, "pdf: no objects found")
    val doc = new Doc(bytes, index, trailer)
    setupDecryption(doc)
    val m = trailer.m.get("Info").map(doc.resolve) match {
      case Some(PDict(d)) => d
      case _ => Map.empty[String, PVal]
    }
    def str(k: String): Option[String] = m.get(k).map(doc.resolve).collect {
      case PStr(b) => decodeTextString(b)
    }
    PdfInfo(str("Title"), str("Author"), str("Subject"), str("Producer"),
      str("CreationDate"), str("ModDate"))
  }

  /** PDF text-string decode (§7.9.2.2): UTF-16BE behind a FE FF BOM,
    * PDFDocEncoding otherwise.
    */
  private[operators] def decodeTextString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else pdfDocDecode(b)

  /** PDFDocEncoding (ISO 32000-1 Annex D.3): Latin-1 identity except
    * 0x18-0x1F (spacing accents), 0x80-0x9E (the typographic set — in a
    * DIFFERENT order from WinAnsi), and 0xA0 (euro). The undefined slots
    * (0x7F, 0x9F, 0xAD) pass through unchanged, the same graceful rule as
    * WinAnsi's unassigned five.
    */
  private final val PdfDoc: Array[Char] = {
    val a = (0 until 256).map(_.toChar).toArray
    val accents = "˘ˇˆ˙˝˛˚˜"
    accents.zipWithIndex.foreach { case (c, i) => a(0x18 + i) = c }
    val high = "•†‡…—–ƒ⁄" +
      "‹›−‰„“”‘" +
      "’‚™ﬁﬂŁŒŠ" +
      "ŸŽıłœšž"
    high.zipWithIndex.foreach { case (c, i) => a(0x80 + i) = c }
    a(0xA0) = '€'
    a
  }

  /** Char -> PDFDocEncoding byte for every representable char — the
    * writer's reverse map.
    */
  private final val PdfDocEncode: Map[Char, Int] =
    PdfDoc.zipWithIndex.map { case (c, i) => c -> i }.toMap

  private[operators] def pdfDocDecode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) { sb.append(PdfDoc(b(i) & 0xFF)); i += 1 }
    sb.toString
  }

  private def openPages(bytes: Array[Byte]): (Doc, Vector[PDict]) = {
    require(isPdf(bytes), "pdf: missing %PDF- header")
    val (index, trailer) = buildIndex(bytes)
    require(index.nonEmpty, "pdf: no objects found")
    val doc = new Doc(bytes, index, trailer)
    setupDecryption(doc)
    val rootRef = trailer.m.getOrElse("Root",
      // trailer lost to truncation: find the catalog by scanning objects
      // (individual damaged objects are skipped, not fatal)
      index.keys.toSeq.sorted.collectFirst(Function.unlift { n =>
        try doc.obj(n) match {
          case PDict(m) if m.get("Type").contains(PName("Catalog")) => Some(PRef(n, 0))
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      }).getOrElse(throw new IllegalArgumentException("pdf: no /Root catalog")))
    val catalog = doc.resolve(rootRef) match {
      case d: PDict => d
      case _ => throw new IllegalArgumentException("pdf: /Root is not a dictionary")
    }
    val pagesRoot = doc.resolve(catalog.m.getOrElse(
      "Pages", throw new IllegalArgumentException("pdf: catalog has no /Pages")))
    val pageDicts = Vector.newBuilder[PDict]
    def walk(node: PVal, depth: Int): Unit = {
      require(depth < MaxKidsDepth, "pdf: page tree too deep")
      doc.resolve(node) match {
        case d @ PDict(m) => m.get("Type") match {
          case Some(PName("Pages")) =>
            doc.resolve(m.getOrElse("Kids", PArr(Vector.empty))) match {
              case PArr(kids) => kids.foreach(walk(_, depth + 1))
              case _ => ()
            }
          case Some(PName("Page")) => pageDicts += d
          case _ => ()
        }
        case _ => ()
      }
    }
    walk(pagesRoot, 0)
    (doc, pageDicts.result())
  }

  /** /Resources is an inheritable page attribute (ISO 32000-1 §7.7.3.4):
    * wild PDFs routinely hang it on the /Pages node and let every page
    * inherit. The Type0 guard must see the INHERITED dict, or a CJK
    * document with tree-level fonts bypasses the named reject and its
    * multi-byte codes get decoded as WinAnsi mojibake. Follow /Parent up
    * the tree; the depth cap doubles as the cycle guard.
    */
  private def inheritedResources(doc: Doc, page: PDict): PVal = {
    var cur = page
    var depth = 0
    while (depth < MaxKidsDepth) {
      cur.m.get("Resources") match {
        case Some(r) => return doc.resolve(r)
        case None => doc.resolve(cur.m.getOrElse("Parent", PNull)) match {
          case d: PDict => cur = d; depth += 1
          case _ => return PNull
        }
      }
    }
    PNull
  }

  private def extractFrom(doc: Doc, pages: Vector[PDict]): PdfText = {
    // ToUnicode CMaps are font-grain, shared across pages — parse each
    // stream once per document (identity-keyed: resolve returns the same
    // PStream instance for the same object)
    val cmapCache = new java.util.IdentityHashMap[AnyRef, Array[Byte] => String]()
    // composite (Type0/CID) fonts carry multi-byte codes that only a
    // ToUnicode CMap can decode (§9.10.3) — wire the parsed CMap as the
    // font's string decoder; a Type0 WITHOUT /ToUnicode (or with a
    // non-Identity-H encoding) is a NAMED reject, because extracting its
    // strings as WinAnsi would be silently wrong
    def fontDecoder(fm: Map[String, PVal]): Array[Byte] => String =
      if (fm.get("Subtype").contains(PName("Type0"))) {
        doc.resolve(fm.getOrElse("Encoding", PNull)) match {
          case PName("Identity-H") => ()
          case PName(other) => throw new IllegalArgumentException(
            s"pdf: Type0 /Encoding /$other unsupported (Identity-H only)")
          case _ => throw new IllegalArgumentException(
            "pdf: Type0 without a named /Encoding")
        }
        doc.resolve(fm.getOrElse("ToUnicode", PNull)) match {
          case ps @ PStream(d, raw) =>
            val cached = cmapCache.get(ps)
            if (cached != null) cached
            else {
              val dec = parseToUnicode(decodeStream(doc, d, raw))
              cmapCache.put(ps, dec)
              dec
            }
          case _ => throw new IllegalArgumentException(
            "pdf: composite (Type0) font unsupported — needs a ToUnicode CMap")
        }
      } else winAnsiDecode _
    val texts = pages.map { p =>
      // font decoders off the page's EFFECTIVE resources (own or
      // inherited via /Parent)
      val fonts: Map[String, Array[Byte] => String] =
        inheritedResources(doc, p) match {
          case PDict(res) => doc.resolve(res.getOrElse("Font", PNull)) match {
            case PDict(fdict) => fdict.map { case (name, fv) =>
              doc.resolve(fv) match {
                case PDict(fm) => name -> fontDecoder(fm)
                case _ => name -> (winAnsiDecode _)
              }
            }
            case _ => Map.empty[String, Array[Byte] => String]
          }
          case _ => Map.empty[String, Array[Byte] => String]
        }
      val content = doc.resolve(p.m.getOrElse("Contents", PNull))
      val streams: Seq[PVal] = content match {
        case PArr(items) => items.map(doc.resolve)
        case PNull => Nil
        case one => Seq(one)
      }
      val data = streams.map {
        case PStream(d, raw) => decodeStream(doc, d, raw)
        case PNull => Array.empty[Byte]
        case other => throw new IllegalArgumentException(
          s"pdf: page /Contents is ${other.getClass.getSimpleName}, not a stream")
      }
      // content streams concatenate with intervening whitespace (§7.8.2)
      val joined =
        if (data.isEmpty) Array.empty[Byte]
        else data.reduce((a, b) => a ++ Array[Byte]('\n') ++ b)
      pageText(joined, fonts)
    }
    PdfText(texts.length, texts)
  }

  private def decodeStream(doc: Doc, d: PDict, raw: Array[Byte]): Array[Byte] =
    doc.streamData(d, raw)

  /** Decode stream data through its /Filter chain (§7.4): filters apply
    * in array order, each with its positional /DecodeParms entry (alias
    * /DP), each output bounded by [[MaxStreamBytes]]. Supported: Flate,
    * LZW (with /EarlyChange), ASCIIHex, ASCII85, RunLength — plus the
    * /Predictor 2 / 10-15 post-pass (§7.4.4.4) on Flate and LZW. The
    * image-only filters (DCT, JPX, CCITT, JBIG2) stay NAMED rejects:
    * they decode pixels, not text, and a text extractor that "handled"
    * them would be the silently-wrong listing this profile refuses.
    */
  private def decodeFilterChain(d: PDict, raw: Array[Byte],
      resolve: PVal => PVal): Array[Byte] = {
    val filters: Vector[PVal] = resolve(d.m.getOrElse("Filter", PNull)) match {
      case PNull => Vector.empty
      case n: PName => Vector(n)
      case PArr(fs) => fs.map(resolve)
      case f => throw new IllegalArgumentException(s"pdf: unsupported filter $f")
    }
    val parms: Vector[PVal] = resolve(
      d.m.get("DecodeParms").orElse(d.m.get("DP")).getOrElse(PNull)) match {
      case PNull => Vector.empty
      case one: PDict => Vector(one)
      case PArr(ps) => ps.map(resolve)
      case other => throw new IllegalArgumentException(s"pdf: bad /DecodeParms $other")
    }
    filters.zipWithIndex.foldLeft(raw) { case (acc, (f, i)) =>
      val parm: Map[String, PVal] = parms.lift(i).map(resolve) match {
        case Some(PDict(m)) => m
        case _ => Map.empty
      }
      def ip(k: String, dflt: Int): Int = parm.get(k).map(resolve) match {
        case Some(PNum(v)) => v.toInt
        case _ => dflt
      }
      val name = f match {
        case PName(n) => n
        case other => throw new IllegalArgumentException(s"pdf: unsupported filter $other")
      }
      val decoded = name match {
        case "FlateDecode" | "Fl" => inflateBounded(acc, MaxStreamBytes, "pdf")
        case "LZWDecode" | "LZW" => lzwDecode(acc, ip("EarlyChange", 1), MaxStreamBytes)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(acc)
        case "ASCII85Decode" | "A85" => ascii85Decode(acc)
        case "RunLengthDecode" | "RL" => runLengthDecode(acc, MaxStreamBytes)
        case other => throw new IllegalArgumentException(s"pdf: unsupported filter /$other")
      }
      val predictor = ip("Predictor", 1)
      if (predictor == 1) decoded
      else unpredict(decoded, predictor, ip("Columns", 1), ip("Colors", 1),
        ip("BitsPerComponent", 8))
    }
  }

  // ------------------------------------------------------------- filters

  /** LZW per §7.4.4.2 (the TIFF variant): MSB-first codes, width 9-12,
    * 256 = ClearTable, 257 = EOD, /EarlyChange (default 1) widens the
    * code one entry early. Bounded like every other decode.
    */
  private[operators] def lzwDecode(data: Array[Byte], earlyChange: Int,
      maxOut: Long): Array[Byte] = {
    require(earlyChange == 0 || earlyChange == 1,
      s"pdf: /EarlyChange must be 0 or 1, got $earlyChange")
    val out = new java.io.ByteArrayOutputStream(math.max(data.length * 2, 64))
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      (0 until 256).foreach(i => table += Array(i.toByte))
      table += Array.emptyByteArray // 256 clear
      table += Array.emptyByteArray // 257 eod
    }
    resetTable()
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xffL); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) {
        done = true // data exhausted without EOD: tolerate (writers truncate pads)
      } else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { resetTable(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < table.length && code != 256 && code != 257) table(code)
            else if (code == table.length && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(
              s"pdf: LZW code $code outside table of ${table.length}")
          if (out.size().toLong + entry.length > maxOut)
            throw new IllegalArgumentException(
              s"pdf: LZW stream expands past the $maxOut-byte cap — rejected as a bomb")
          out.write(entry, 0, entry.length)
          if (prev != null && table.length < 4096) table += (prev :+ entry(0))
          prev = entry
          if (width < 12 && table.length + earlyChange >= (1 << width)) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** LZW encoder (the writer/oracle half): greedy longest-match with the
    * same width schedule as [[lzwDecode]]; emits ClearTable when the
    * table fills, EOD at the end.
    */
  private[operators] def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var next = 258
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code.toLong; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = scala.collection.mutable.Map.empty[(Int, Byte), Int]
    emit(256)
    var cur = -1
    var i = 0
    while (i < data.length) {
      val b = data(i)
      if (cur < 0) cur = b & 0xff
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          emit(cur)
          dict((cur, b)) = next; next += 1
          // the decoder's table runs ONE entry behind mid-stream (it makes
          // no entry for the first code after a clear), so its size when
          // about to read our next code is `next - 1` — mirror its bump
          if (width < 12 && (next - 1) + earlyChange >= (1 << width)) width += 1
          if (next >= 4095) { // table nearly full: clear, like reference encoders
            emit(256); dict.clear(); next = 258; width = 9
          }
          cur = b & 0xff
      }
      i += 1
    }
    if (cur >= 0) emit(cur)
    // the final code got no table entry on our side (data ended), so here
    // the decoder's size equals `next` exactly — its bump before reading
    // EOD uses the un-shifted condition
    if (width < 12 && next + earlyChange >= (1 << width)) width += 1
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` ends,
    * odd final digit pads with 0.
    */
  private[operators] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 8)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') { if (hi >= 0) out.write(hi << 4); done = true }
      else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        require(d >= 0, s"pdf: bad hex digit '${c.toChar}' in ASCIIHex stream")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    require(done, "pdf: ASCIIHex stream missing the '>' terminator")
    out.toByteArray
  }

  private[operators] def asciiHexEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 2 + 1)
    data.foreach(b => sb.append(f"${b & 0xff}%02X"))
    sb.append('>')
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  /** ASCII85Decode (§7.4.3): base-85 groups `!`..`u`, `z` = four zero
    * bytes, `~>` terminates; a trailing group of n chars yields n-1 bytes.
    */
  private[operators] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 8)
    val group = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      require(chars >= 2, "pdf: ASCII85 trailing group of one char")
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < chars) group(j) else 84); j += 1 }
      require(v <= 0xFFFFFFFFL, "pdf: ASCII85 group overflows 32 bits")
      var k = 0
      while (k < chars - 1) { out.write(((v >> (24 - 8 * k)) & 0xff).toInt); k += 1 }
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') {
        require(i + 1 < data.length && data(i + 1) == '>',
          "pdf: ASCII85 stream missing the '~>' terminator")
        if (n > 0) flush(n)
        n = 0
        done = true
      } else if (c == 'z') {
        require(n == 0, "pdf: ASCII85 'z' inside a group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!isWs(c)) {
        require(c >= '!' && c <= 'u', s"pdf: bad ASCII85 char '${c.toChar}'")
        group(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      }
      i += 1
    }
    require(done, "pdf: ASCII85 stream missing the '~>' terminator")
    out.toByteArray
  }

  private[operators] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 5 / 4 + 4)
    var i = 0
    while (i < data.length) {
      val chars = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < chars) data(i + j) & 0xffL else 0L); j += 1
      }
      if (v == 0 && chars == 4) sb.append('z')
      else {
        val digits = new Array[Char](5)
        var k = 4
        while (k >= 0) { digits(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        var m = 0
        while (m < chars + 1) { sb.append(digits(m)); m += 1 }
      }
      i += chars
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  /** RunLengthDecode (§7.4.5): length byte 0-127 copies the next L+1
    * bytes, 129-255 repeats the next byte 257-L times, 128 is EOD.
    */
  private[operators] def runLengthDecode(data: Array[Byte], maxOut: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 8)
    var i = 0
    var done = false
    while (!done) {
      require(i < data.length, "pdf: RunLength stream missing the EOD byte")
      val l = data(i) & 0xff; i += 1
      if (l == 128) done = true
      else {
        val n = if (l < 128) l + 1 else 257 - l
        if (out.size().toLong + n > maxOut) throw new IllegalArgumentException(
          s"pdf: RunLength stream expands past the $maxOut-byte cap — rejected as a bomb")
        if (l < 128) {
          require(i + n <= data.length, "pdf: RunLength literal run truncated")
          out.write(data, i, n); i += n
        } else {
          require(i < data.length, "pdf: RunLength repeat run truncated")
          var k = 0
          while (k < n) { out.write(data(i)); k += 1 }
          i += 1
        }
      }
    }
    out.toByteArray
  }

  private[operators] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 127 + 8)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (run < 128 && i + run < data.length && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i)); i += run
      } else {
        var lit = 1 // literal up to the next >=3 run or 128 bytes
        while (lit < 128 && i + lit < data.length &&
          !(i + lit + 2 < data.length && data(i + lit) == data(i + lit + 1) &&
            data(i + lit) == data(i + lit + 2))) lit += 1
        out.write(lit - 1); out.write(data, i, lit); i += lit
      }
    }
    out.write(128)
    out.toByteArray
  }

  // ----------------------------------------------------------- predictors

  /** Undo a /Predictor post-pass (§7.4.4.4): 2 = TIFF horizontal
    * differencing (8-bit samples), 10-15 = PNG row filters (RFC 2083
    * §6.1 — each stored row opens with its filter-type byte; None / Sub /
    * Up / Average / Paeth all accepted regardless of the declared
    * predictor, as the spec requires).
    */
  private[operators] def unpredict(data: Array[Byte], predictor: Int,
      columns: Int, colors: Int, bpc: Int): Array[Byte] = {
    require(columns >= 1 && colors >= 1 && bpc >= 1,
      s"pdf: bad predictor geometry columns=$columns colors=$colors bpc=$bpc")
    predictor match {
      case 1 => data
      case 2 =>
        require(bpc == 8, s"pdf: TIFF predictor with $bpc-bit samples unsupported")
        val rowBytes = columns * colors
        require(rowBytes > 0 && data.length % rowBytes == 0,
          s"pdf: predictor data ${data.length} not a multiple of row size $rowBytes")
        val out = data.clone()
        var r = 0
        while (r < out.length) {
          var i = colors
          while (i < rowBytes) {
            out(r + i) = (out(r + i) + out(r + i - colors)).toByte
            i += 1
          }
          r += rowBytes
        }
        out
      case p if p >= 10 && p <= 15 =>
        val bpp = math.max(1, colors * bpc / 8)
        val rowBytes = (columns * colors * bpc + 7) / 8
        val stride = rowBytes + 1
        require(stride > 1 && data.length % stride == 0,
          s"pdf: PNG-predicted data ${data.length} not a multiple of row stride $stride")
        val rows = data.length / stride
        val out = new Array[Byte](rows * rowBytes)
        val prior = new Array[Byte](rowBytes)
        var r = 0
        while (r < rows) {
          val ft = data(r * stride) & 0xff
          val src = r * stride + 1
          val dst = r * rowBytes
          var i = 0
          while (i < rowBytes) {
            val raw = data(src + i) & 0xff
            val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
            val up = prior(i) & 0xff
            val upLeft = if (i >= bpp) prior(i - bpp) & 0xff else 0
            val v = ft match {
              case 0 => raw
              case 1 => raw + left
              case 2 => raw + up
              case 3 => raw + ((left + up) / 2)
              case 4 => raw + paeth(left, up, upLeft)
              case other => throw new IllegalArgumentException(
                s"pdf: unknown PNG filter type $other in row $r")
            }
            out(dst + i) = (v & 0xff).toByte
            i += 1
          }
          System.arraycopy(out, dst, prior, 0, rowBytes)
          r += 1
        }
        out
      case other =>
        throw new IllegalArgumentException(s"pdf: unsupported /Predictor $other")
    }
  }

  /** PNG Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Apply ONE PNG row filter to unfiltered rows — the writer half of
    * [[unpredict]] (used by [[write15]]'s Up-predicted xref stream and
    * by tests to build every-filter fixtures). `filterType` 0-4.
    */
  private[operators] def predictPng(data: Array[Byte], filterType: Int,
      columns: Int, colors: Int = 1, bpc: Int = 8): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowBytes = (columns * colors * bpc + 7) / 8
    require(rowBytes > 0 && data.length % rowBytes == 0,
      s"pdf: cannot PNG-filter ${data.length} bytes into $rowBytes-byte rows")
    val rows = data.length / rowBytes
    val out = new Array[Byte](rows * (rowBytes + 1))
    val prior = new Array[Byte](rowBytes)
    var r = 0
    while (r < rows) {
      val src = r * rowBytes
      val dst = r * (rowBytes + 1)
      out(dst) = filterType.toByte
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) data(src + i - bpp) & 0xff else 0
        val up = prior(i) & 0xff
        val upLeft = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val v = filterType match {
          case 0 => raw
          case 1 => raw - left
          case 2 => raw - up
          case 3 => raw - ((left + up) / 2)
          case 4 => raw - paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(s"pdf: bad PNG filter type $other")
        }
        out(dst + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      System.arraycopy(data, src, prior, 0, rowBytes)
      r += 1
    }
    out
  }

  /** TJ position adjustments more negative than this (thousandths of an
    * em, §9.4.3) read as an inter-word gap — the standard extractor
    * heuristic, pinned to one deterministic threshold.
    */
  final val TjSpaceThreshold = -180.0

  /** WinAnsiEncoding's 0x80-0x9F block (ISO 32000-1 Annex D.2; byte-
    * identical to Windows code page 1252): Latin-1 reads these bytes as C1
    * controls, but in WinAnsi they are the typographic set real PDFs put
    * there — smart quotes, €, ™, …, en/em dashes. The five unassigned
    * slots (0x81 0x8D 0x8F 0x90 0x9D) pass through unchanged.
    */
  private final val WinAnsiHigh: Array[Char] = {
    val a = (0x80 to 0x9F).map(_.toChar).toArray
    Seq(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ'
    ).foreach { case (b, c) => a(b - 0x80) = c }
    a
  }

  /** Char -> WinAnsi byte (as a Latin-1 char) for the typographic block —
    * the writer's reverse map, so `write` can emit text the extractor
    * decodes back identically.
    */
  private final val WinAnsiEncode: Map[Char, Char] =
    WinAnsiHigh.zipWithIndex.collect {
      case (c, i) if c != (0x80 + i).toChar => c -> (0x80 + i).toChar
    }.toMap

  /** Decode simple-font string bytes as WinAnsiEncoding. */
  private[operators] def winAnsiDecode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val u = b(i) & 0xFF
      sb.append(if (u >= 0x80 && u <= 0x9F) WinAnsiHigh(u - 0x80) else u.toChar)
      i += 1
    }
    sb.toString
  }

  // ------------------------------------------------- Type0 / ToUnicode

  /** Materialized-CMap bound: a legitimate ToUnicode covers at most the
    * BMP; a range crafted past this is a bomb, not a font.
    */
  final val MaxCMapEntries = 1 << 16

  /** Parse a /ToUnicode CMap stream (ISO 32000-1 §9.10.3; Adobe CMap
    * syntax) into a decoder for the font's code bytes. The codespace
    * ranges give the code byte-widths (plus any width seen in a
    * bfchar/bfrange source, for wild CMaps that omit the ranges);
    * bfchar pairs map one code to UTF-16BE text, bfrange spans either
    * increment the destination's LAST UTF-16 unit or list destinations
    * in an array. Decoding walks the string shortest-width-first and
    * rejects unmapped codes BY NAME — emitting anything for them would
    * be the silently-wrong mojibake this profile refuses.
    */
  private[operators] def parseToUnicode(bytes: Array[Byte]): Array[Byte] => String = {
    // --- lean CMap tokenizer: hex strings, [ ], names/words; % comments
    // and ( ) literals (CIDSystemInfo values) skipped; << >> skipped
    sealed trait Tok
    final case class Hex(b: Array[Byte]) extends Tok
    final case class Word(w: String) extends Tok
    case object ArrOpen extends Tok
    case object ArrClose extends Tok
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val n = bytes.length
    def ws(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
      c == '\f' || c == 0
    var i = 0
    while (i < n) {
      val c = bytes(i) & 0xFF
      if (ws(c)) i += 1
      else if (c == '%') { while (i < n && bytes(i) != '\n' && bytes(i) != '\r') i += 1 }
      else if (c == '<' && i + 1 < n && (bytes(i + 1) & 0xFF) == '<') i += 2
      else if (c == '>' && i + 1 < n && (bytes(i + 1) & 0xFF) == '>') i += 2
      else if (c == '<') {
        val sb = new StringBuilder
        i += 1
        while (i < n && bytes(i) != '>') {
          if (!ws(bytes(i) & 0xFF)) sb.append((bytes(i) & 0xFF).toChar)
          i += 1
        }
        require(i < n, "pdf: unterminated hex string in CMap")
        i += 1
        require(sb.forall(ch => Character.digit(ch, 16) >= 0),
          "pdf: bad hex string in CMap")
        if (sb.length % 2 == 1) sb.append('0')
        toks += Hex(sb.toString.grouped(2)
          .map(x => Integer.parseInt(x, 16).toByte).toArray)
      }
      else if (c == '[') { toks += ArrOpen; i += 1 }
      else if (c == ']') { toks += ArrClose; i += 1 }
      else if (c == '(') {
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val b0 = bytes(i)
          if (b0 == '\\') i += 1
          else if (b0 == '(') depth += 1
          else if (b0 == ')') depth -= 1
          i += 1
        }
      }
      else {
        val st = i
        i += 1 // first char may be '/' (a name) — one token either way
        while (i < n && !ws(bytes(i) & 0xFF) &&
          "<>[]()%/".indexOf((bytes(i) & 0xFF).toChar) < 0) i += 1
        toks += Word(new String(bytes, st, i - st, StandardCharsets.ISO_8859_1))
      }
    }
    // --- walk the block structure
    val widths = scala.collection.mutable.SortedSet.empty[Int]
    val map = new java.util.HashMap[Long, String]()
    def key(len: Int, code: Int): Long = (len.toLong << 32) | (code.toLong & 0xFFFFFFFFL)
    def codeOf(h: Array[Byte]): Int = {
      require(h.length >= 1 && h.length <= 4, s"pdf: CMap code ${h.length} bytes wide")
      var v = 0; h.foreach(b => v = (v << 8) | (b & 0xFF)); v
    }
    def utf16(h: Array[Byte]): String = new String(h, StandardCharsets.UTF_16BE)
    var entries = 0
    def addEntry(len: Int, code: Int, dst: String): Unit = {
      entries += 1
      require(entries <= MaxCMapEntries, "pdf: ToUnicode CMap past the entry cap")
      widths += len
      map.put(key(len, code), dst)
    }
    var t = 0
    val tn = toks.length
    def hexAt(j: Int): Option[Array[Byte]] =
      if (j < tn) toks(j) match { case Hex(b) => Some(b); case _ => None }
      else None
    while (t < tn) {
      toks(t) match {
        case Word("begincodespacerange") =>
          t += 1
          while (hexAt(t).isDefined && hexAt(t + 1).isDefined) {
            widths += hexAt(t).get.length
            t += 2
          }
        case Word("beginbfchar") =>
          t += 1
          while (hexAt(t).isDefined && hexAt(t + 1).isDefined) {
            val src = hexAt(t).get
            addEntry(src.length, codeOf(src), utf16(hexAt(t + 1).get))
            t += 2
          }
        case Word("beginbfrange") =>
          t += 1
          var more = true
          while (more && hexAt(t).isDefined && hexAt(t + 1).isDefined) {
            val lo = hexAt(t).get
            val hi = hexAt(t + 1).get
            require(lo.length == hi.length, "pdf: bfrange endpoints differ in width")
            val loC = codeOf(lo)
            val hiC = codeOf(hi)
            require(hiC >= loC, "pdf: bfrange hi below lo")
            require(hiC - loC < MaxCMapEntries, "pdf: ToUnicode CMap past the entry cap")
            (if (t + 2 < tn) toks(t + 2) else Word("")) match {
              case Hex(dstH) =>
                val base = utf16(dstH).toCharArray
                require(base.nonEmpty, "pdf: empty bfrange destination")
                // only the LAST UTF-16 unit increments (Adobe CMap spec);
                // a range whose destination crosses the BMP boundary would
                // wrap the Char silently — named reject, not mojibake
                require(base(base.length - 1) + (hiC - loC) <= 0xFFFF,
                  "pdf: bfrange destination overflows the BMP")
                var c = loC
                while (c <= hiC) {
                  val d = base.clone()
                  d(d.length - 1) = (d(d.length - 1) + (c - loC)).toChar
                  addEntry(lo.length, c, new String(d))
                  c += 1
                }
                t += 3
              case ArrOpen =>
                var c = loC
                t += 3
                while (t < tn && toks(t) != ArrClose) {
                  toks(t) match {
                    case Hex(dstH) =>
                      require(c <= hiC, "pdf: bfrange array longer than its range")
                      addEntry(lo.length, c, utf16(dstH))
                      c += 1
                    case _ => throw new IllegalArgumentException(
                      "pdf: bfrange array holds a non-hex entry")
                  }
                  t += 1
                }
                require(t < tn, "pdf: unterminated bfrange array")
                t += 1 // past ]
              case _ => more = false
            }
          }
        case _ => t += 1
      }
    }
    require(!map.isEmpty, "pdf: ToUnicode CMap has no mappings")
    val lens = widths.toArray // ascending: shortest match wins, per spec
    (b: Array[Byte]) => {
      val sb = new java.lang.StringBuilder(b.length)
      var p = 0
      while (p < b.length) {
        var hit: String = null
        var used = 0
        var li = 0
        while (hit == null && li < lens.length) {
          val len = lens(li)
          if (p + len <= b.length) {
            var code = 0
            var k = 0
            while (k < len) { code = (code << 8) | (b(p + k) & 0xFF); k += 1 }
            val v = map.get(key(len, code))
            if (v != null) { hit = v; used = len }
          }
          li += 1
        }
        require(hit != null, s"pdf: CID without ToUnicode mapping at byte $p")
        sb.append(hit)
        p += used
      }
      sb.toString
    }
  }

  /** Interpret ONE page's (decoded, concatenated) content stream: text
    * shows inside BT/ET; Td TD T* Tm apostrophe/quote line moves become '\n',
    * TJ gaps below [[TjSpaceThreshold]] become ' '. Graphics operators
    * are skipped by construction (operands are parsed, non-text
    * operators discarded); inline images (`BI … ID <binary> EI`, §8.9.7)
    * are skipped as raw bytes so binary pixel data never reaches the
    * object lexer. Strings decode through the CURRENT font's decoder
    * (tracked via `Tf`): WinAnsiEncoding for simple fonts, the parsed
    * ToUnicode CMap for Type0 — see the object scaladoc.
    */
  private[operators] def pageText(content: Array[Byte],
      fonts: Map[String, Array[Byte] => String] = Map.empty): String = {
    val lx = new Lexer(content, 0)
    val sb = new StringBuilder
    var inText = false
    var lineHasText = false
    var dec: Array[Byte] => String = winAnsiDecode _
    // the text font is part of the graphics state (ISO 32000-1 §8.4.2,
    // Table 52) — q pushes it, Q restores it. Without this, a page that
    // selects a Type0 font, switches to a simple font inside q…Q, then
    // shows CID codes after Q would decode 2-byte CIDs through WinAnsi
    // (silent mojibake). Underflowing Q (wild PDFs do it) leaves the
    // current font, matching viewer leniency.
    val gsFonts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte] => String]
    val operands = scala.collection.mutable.ArrayBuffer.empty[PVal]
    def str(v: PVal): String = v match {
      case PStr(b) => dec(b)
      case _ => ""
    }
    def newline(): Unit = {
      if (lineHasText) { sb.append('\n'); lineHasText = false }
    }
    def show(s: String): Unit = if (s.nonEmpty) { sb.append(s); lineHasText = true }
    while ({ lx.skipWs(); !lx.eof }) {
      lx.peek match {
        case c if c == '/' || c == '(' || c == '[' || c == '<' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          operands += lx.readValue()
        case _ =>
          val op = lx.readToken()
          if (op.isEmpty) lx.pos += 1 // defensive: skip an unparseable byte
          else if (op == "BI") lx.pos = skipInlineImage(content, lx.pos)
          else if (op == "Tf") {
            // `/Fn size Tf` — switch the string decoder to that font's
            // (a name not in /Resources keeps the simple-font default)
            if (operands.length >= 2) operands(operands.length - 2) match {
              case PName(n) => dec = fonts.getOrElse(n, winAnsiDecode _)
              case _ => ()
            }
          }
          else if (op == "q") gsFonts += dec
          else if (op == "Q") {
            if (gsFonts.nonEmpty) dec = gsFonts.remove(gsFonts.length - 1)
          }
          else if (inText) op match {
            case "Tj" => show(str(operands.lastOption.getOrElse(PNull)))
            case "'" =>
              newline(); show(str(operands.lastOption.getOrElse(PNull)))
            case "\"" =>
              newline(); show(str(operands.lastOption.getOrElse(PNull)))
            case "TJ" => operands.lastOption match {
              case Some(PArr(items)) =>
                items.foreach {
                  case s: PStr => show(str(s))
                  case PNum(adj) if adj <= TjSpaceThreshold =>
                    if (lineHasText && sb.nonEmpty && sb.last != ' ') sb.append(' ')
                  case _ => ()
                }
              case _ => ()
            }
            case "Td" | "TD" | "Tm" =>
              // a vertical move is a line break; horizontal-only moves are
              // kerning/indent, not structure
              val ty = operands.lastOption match {
                case Some(PNum(v)) => v
                case _ => 0.0
              }
              if (ty != 0.0) newline()
            case "T*" => newline()
            case "ET" => inText = false; newline()
            case _ => () // Tf, Tc, Tw, colors, ... — styling, no text
          } else if (op == "BT") { inText = true; lineHasText = false }
          operands.clear()
      }
    }
    if (sb.nonEmpty && sb.last == '\n') sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Skip an inline image (§8.9.7) starting just after its `BI` token:
    * scan forward to the `ID` token (the image dict entries are names /
    * numbers / arrays — scanned as bytes, never interpreted), step over
    * the single whitespace byte that follows it, then scan the RAW binary
    * for the `EI` operator delimited by whitespace on both sides. Returns
    * the position just past `EI`. A missing delimiter is a NAMED reject —
    * binary data containing '(' or '<' must never reach the object lexer.
    */
  private def skipInlineImage(b: Array[Byte], from: Int): Int = {
    def ws(c: Byte): Boolean = c == ' ' || c == '\n' || c == '\r' ||
      c == '\t' || c == '\f' || c == 0
    // a token boundary before ID/EI: whitespace or a closing delimiter
    def boundary(c: Byte): Boolean = ws(c) || c == ']' || c == '>' || c == ')'
    var i = from
    var afterId = -1
    while (afterId < 0 && i + 1 < b.length) {
      if (b(i) == 'I' && b(i + 1) == 'D' &&
        (i == 0 || boundary(b(i - 1))) &&
        (i + 2 >= b.length || ws(b(i + 2)))) afterId = i + 2
      i += 1
    }
    require(afterId >= 0, "pdf: inline image without ID")
    // one whitespace byte separates ID from the binary data (§8.9.7)
    var j = math.min(afterId + 1, b.length)
    while (j + 1 < b.length) {
      if (ws(b(j - 1)) && b(j) == 'E' && b(j + 1) == 'I' &&
        (j + 2 >= b.length || ws(b(j + 2)))) return j + 2
      j += 1
    }
    throw new IllegalArgumentException("pdf: unterminated inline image")
  }

  // --------------------------------------------------------------- writer

  /** Spec-correct single-font writer — the oracle half: every byte
    * deterministic, so `extractText(write(pages)) == pages` by
    * construction and a SQL engine can predict the round-trip. The
    * round-trip contract is scoped to pages WITHOUT empty lines (no
    * leading / interior / trailing '\n\n' or final '\n'): an empty line
    * emits a `() Tj` that shows nothing, so the extractor — which only
    * breaks after visible text — would collapse it; such pages are a
    * caller error, rejected loudly below rather than silently narrowed.
    *
    * Layout: classic PDF 1.4 — catalog, one /Pages node, one Helvetica
    * /WinAnsiEncoding font shared by every page, one content stream per
    * page (`(line) Tj` + `0 -14 Td` per line break), classic xref table,
    * trailer. `compress = true` Flate-encodes the content streams.
    * Page text must be WinAnsi-representable: Latin-1 minus the
    * 0x80-0x9F C1 controls, plus the typographic block ([[WinAnsiHigh]]
    * — smart quotes, €, ™, … encode to their WinAnsi bytes and decode
    * back identically). Anything else is a caller error, rejected loudly.
    */
  def write(pages: Seq[String], compress: Boolean = false,
      info: Seq[(String, String)] = Nil): Array[Byte] =
    writeBody(pages, info, plain =>
      if (compress) (deflate(plain), " /Filter /FlateDecode") else (plain, ""),
      version = "1.4")

  /** [[write]] with the content streams stored through an arbitrary
    * supported filter cascade — the every-filter fixture half of
    * [[decodeFilterChain]]. `filters` is the /Filter array in DECODE
    * order (first filter applied first when reading), so encoding runs
    * right-to-left: `Seq("ASCII85Decode", "FlateDecode")` stores
    * a85(deflate(plain)). Same round-trip contract as [[write]].
    */
  def writeWithFilters(pages: Seq[String], filters: Seq[String],
      info: Seq[(String, String)] = Nil): Array[Byte] = {
    require(filters.nonEmpty, "pdf write: empty filter cascade — use write()")
    val encoded = writeEncoder(filters)
    val filterArr =
      if (filters.length == 1) s" /Filter /${filters.head}"
      else s" /Filter [${filters.map("/" + _).mkString(" ")}]"
    writeBody(pages, info, plain => (encoded(plain), filterArr), version = "1.4")
  }

  /** Spec-correct Type0/CID writer — the CJK fixture half (ISO 32000-1
    * §9.7 composite fonts + §9.10.3 ToUnicode): one /Type0 font with
    * /Encoding /Identity-H and a CIDFontType2 descendant, content
    * strings as hex-encoded 2-byte codes, and a /ToUnicode CMap built
    * from the pages' characters with CID = Unicode code point — an
    * identity map the extractor must still GENUINELY parse (ASCII
    * digits/letters ride three bfrange blocks, everything else bfchar
    * pairs, ≤100 entries per block per the CMap convention).
    * `toUnicode = false` omits the CMap: the truly-undecodable shape
    * that must quarantine by name. Page text: BMP only (no surrogate
    * pairs), no control chars, no empty lines — same round-trip
    * contract as [[write]].
    */
  def writeCjk(pages: Seq[String], toUnicode: Boolean = true,
      info: Seq[(String, String)] = Nil): Array[Byte] = {
    require(pages.nonEmpty, "pdf write: at least one page")
    pages.foreach { p =>
      require(p.forall(c => (!c.isSurrogate && c >= ' ') || c == '\n'),
        "pdf write: CJK pages must be BMP text without control chars")
      require(p.isEmpty || p.split("\n", -1).forall(_.nonEmpty),
        "pdf write: empty lines do not round-trip (see scaladoc)")
    }
    info.foreach { case (k, _) =>
      require(k.nonEmpty && k.forall(_.isLetterOrDigit),
        s"pdf write: bad /Info key '$k'")
    }
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    out.write(ascii("%PDF-1.4\n%âãÏÓ\n"))
    val n = pages.length
    val nFontObjs = if (toUnicode) 3 else 2 // Type0 + descendant (+ CMap)
    val firstPage = 3 + nFontObjs
    val total = 2 + nFontObjs + 2 * n + (if (info.nonEmpty) 1 else 0)
    val offsets = new Array[Int](total + 1)
    def obj(num: Int, body: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n"))
      out.write(body)
      out.write(ascii("\nendobj\n"))
    }
    def streamObj(num: Int, data: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n<< /Length ${data.length} >>\nstream\n"))
      out.write(data)
      out.write(ascii("\nendstream\nendobj\n"))
    }
    val kids = (0 until n).map(i => s"${firstPage + 2 * i} 0 R").mkString(" ")
    obj(1, ascii("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, ascii(s"<< /Type /Pages /Kids [$kids] /Count $n >>"))
    val toUniRef = if (toUnicode) " /ToUnicode 5 0 R" else ""
    obj(3, ascii("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCJK" +
      s" /Encoding /Identity-H /DescendantFonts [4 0 R]$toUniRef >>"))
    obj(4, ascii("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCJK" +
      " /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)" +
      " /Supplement 0 >> /CIDToGIDMap /Identity /DW 1000 >>"))
    if (toUnicode) streamObj(5, toUnicodeCMapBytes(pages))
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = firstPage + 2 * i
      obj(pageNum, ascii(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 3 0 R >> >> /Contents ${pageNum + 1} 0 R >>"))
      streamObj(pageNum + 1, cjkContentOps(text))
    }
    if (info.nonEmpty) {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(ascii("<<"))
      info.foreach { case (k, v) =>
        bo.write(ascii(s" /$k "))
        bo.write(textStringBytes(v))
      }
      bo.write(ascii(" >>"))
      obj(total, bo.toByteArray)
    }
    val xrefAt = out.size()
    out.write(ascii(s"xref\n0 ${total + 1}\n"))
    out.write(ascii("0000000000 65535 f \n"))
    (1 to total).foreach(i => out.write(ascii(f"${offsets(i)}%010d 00000 n \n")))
    val infoRef = if (info.nonEmpty) s" /Info $total 0 R" else ""
    out.write(ascii(s"trailer\n<< /Size ${total + 1} /Root 1 0 R$infoRef >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  /** Content ops for a Type0 page: Identity-H strings are hex-encoded
    * 2-byte codes (CID = code point), same line layout as [[contentOps]].
    */
  private def cjkContentOps(text: String): Array[Byte] = {
    val ops = new StringBuilder
    ops.append("BT\n/F1 12 Tf\n72 720 Td\n")
    text.split("\n", -1).zipWithIndex.foreach { case (line, li) =>
      if (li > 0) ops.append("0 -14 Td\n")
      ops.append('<')
      line.foreach(c => ops.append(f"${c.toInt}%04X"))
      ops.append("> Tj\n")
    }
    ops.append("ET")
    ops.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** The identity ToUnicode CMap over the pages' character set: ASCII
    * digits and letters via bfrange, the rest via ≤100-entry bfchar
    * blocks — both constructs present so the parser is exercised end
    * to end by every fixture.
    */
  private def toUnicodeCMapBytes(pages: Seq[String]): Array[Byte] = {
    def ranged(c: Char): Boolean = (c >= '0' && c <= '9') ||
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    val chars = pages.flatMap(_.filter(_ != '\n')).toSet
      .filterNot(ranged).toSeq.sorted
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS)" +
      " /Supplement 0 >> def\n")
    sb.append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    sb.append("3 beginbfrange\n<0030> <0039> <0030>\n<0041> <005A> <0041>\n")
    sb.append("<0061> <007A> <0061>\nendbfrange\n")
    chars.grouped(100).foreach { grp =>
      sb.append(s"${grp.length} beginbfchar\n")
      grp.foreach(c => sb.append(f"<${c.toInt}%04X> <${c.toInt}%04X>\n"))
      sb.append("endbfchar\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def writeEncoder(filters: Seq[String]): Array[Byte] => Array[Byte] = {
    val stages: Seq[Array[Byte] => Array[Byte]] = filters.map {
      case "FlateDecode" => deflate _
      case "LZWDecode" => (d: Array[Byte]) => lzwEncode(d)
      case "ASCIIHexDecode" => asciiHexEncode _
      case "ASCII85Decode" => ascii85Encode _
      case "RunLengthDecode" => runLengthEncode _
      case other => throw new IllegalArgumentException(
        s"pdf write: no encoder for filter /$other")
    }
    plain => stages.foldRight(plain)((enc, acc) => enc(acc))
  }

  /** The page/content/xref body shared by [[write]] variants: classic
    * layout, content streams transformed by `encode` (returns the stored
    * bytes and the /Filter clause).
    */
  private def writeBody(pages: Seq[String], info: Seq[(String, String)],
      encode: Array[Byte] => (Array[Byte], String), version: String): Array[Byte] = {
    require(pages.nonEmpty, "pdf write: at least one page")
    pages.foreach { p =>
      require(p.forall(encodableChar),
        "pdf write: page text must be WinAnsi-representable")
      require(p.isEmpty || p.split("\n", -1).forall(_.nonEmpty),
        "pdf write: empty lines do not round-trip (see scaladoc)")
    }
    info.foreach { case (k, _) =>
      require(k.nonEmpty && k.forall(_.isLetterOrDigit),
        s"pdf write: bad /Info key '$k'")
    }
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    out.write(ascii(s"%PDF-$version\n%âãÏÓ\n"))
    val n = pages.length
    val total = 3 + 2 * n + (if (info.nonEmpty) 1 else 0)
    val offsets = new Array[Int](total + 1)
    def obj(num: Int, body: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n"))
      out.write(body)
      out.write(ascii("\nendobj\n"))
    }
    val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(1, ascii("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, ascii(s"<< /Type /Pages /Kids [$kids] /Count $n >>"))
    obj(3, ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>"))
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 4 + 2 * i
      val streamNum = pageNum + 1
      obj(pageNum, ascii(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 3 0 R >> >> /Contents $streamNum 0 R >>"))
      val (data, filter) = encode(contentOps(text))
      offsets(streamNum) = out.size()
      out.write(ascii(s"$streamNum 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"))
      out.write(data)
      out.write(ascii("\nendstream\nendobj\n"))
    }
    if (info.nonEmpty) {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(ascii("<<"))
      info.foreach { case (k, v) =>
        bo.write(ascii(s" /$k "))
        bo.write(textStringBytes(v))
      }
      bo.write(ascii(" >>"))
      obj(total, bo.toByteArray)
    }
    val xrefAt = out.size()
    out.write(ascii(s"xref\n0 ${total + 1}\n"))
    out.write(ascii("0000000000 65535 f \n"))
    (1 to total).foreach(i => out.write(ascii(f"${offsets(i)}%010d 00000 n \n")))
    val infoRef = if (info.nonEmpty) s" /Info $total 0 R" else ""
    out.write(ascii(s"trailer\n<< /Size ${total + 1} /Root 1 0 R$infoRef >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  /** Encrypting writer — the fixture/oracle half of the standard
    * security handler. `method` picks the profile:
    *
    *   - `rc4-40`: /V 1 /R 2 (the 40-bit legacy class)
    *   - `rc4-128`: /V 2 /R 3 /Length 128
    *   - `aes-128`: /V 4 /R 4, /StdCF /CFM /AESV2
    *   - `aes-256`: /V 5 /R 6 (ISO 32000-2), /CFM /AESV3
    *
    * `userPw` defaults to "" — the owner-locked shape [[extractText]]
    * reads back without a secret; pass a real user password to fabricate
    * the password-gated reject lane. Deterministic: AES IVs and the
    * /ID derive from the content, so oracles can predict round-trips.
    * Same page-text contract as [[write]].
    */
  def writeEncrypted(pages: Seq[String], method: String,
      ownerPw: String = "owner", userPw: String = "",
      info: Seq[(String, String)] = Nil): Array[Byte] = {
    require(pages.nonEmpty, "pdf write: at least one page")
    pages.foreach { p =>
      require(p.forall(encodableChar),
        "pdf write: page text must be WinAnsi-representable")
      require(p.isEmpty || p.split("\n", -1).forall(_.nonEmpty),
        "pdf write: empty lines do not round-trip (see scaladoc)")
    }
    val (v, r, lengthBits, cfmName) = method match {
      case "rc4-40" => (1, 2, 40, "V2")
      case "rc4-128" => (2, 3, 128, "V2")
      case "aes-128" => (4, 4, 128, "AESV2")
      case "aes-256" => (5, 6, 256, "AESV3")
      case other => throw new IllegalArgumentException(
        s"pdf write: unknown encryption method '$other'")
    }
    def hex(b: Array[Byte]): String =
      b.map(x => f"${x & 0xff}%02x").mkString("<", "", ">")
    // ---- handler setup: O/U (+OE/UE for V5) and the file key. The
    // derivation is MEMOIZED per (method, passwords): it depends only on
    // the passwords, /P and the /ID, and the writer pins a per-profile
    // /ID + salts, so a corpus writer pays the 50xMD5 / R6 iterated
    // hash ONCE per cipher profile instead of per document (the R6 hash
    // alone is ~64 AES rounds - per-record it dominated the fixture).
    val (params, fileKey, extraEnc) = writerSetup((method, ownerPw, userPw), {
      val permissions = -44 // print allowed, modify/copy denied: owner-locked
      val id0 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-id:$method:$ownerPw:$userPw"
          .getBytes(StandardCharsets.UTF_8))
      val base = PdfCrypt.Params(v = v, r = r, lengthBits = lengthBits,
        o = Array.emptyByteArray, u = Array.emptyByteArray,
        oe = Array.emptyByteArray, ue = Array.emptyByteArray,
        p = permissions, id0 = id0, encryptMetadata = true,
        stmCfm = cfmName, strCfm = cfmName)
      if (v < 5) {
        val (o, u) = PdfCrypt.makeOU(base, ownerPw, userPw)
        val p2 = base.copy(o = o, u = u)
        (p2, PdfCrypt.deriveKey(p2, userPw), "")
      } else {
        // deterministic 32-byte file key + salts, fixed per profile
        val fk = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"graft-filekey:$method:$ownerPw:$userPw"
            .getBytes(StandardCharsets.UTF_8))
        val salts = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"graft-salts:$method:$ownerPw:$userPw"
            .getBytes(StandardCharsets.UTF_8))
        val (u, ue, o, oe) = PdfCrypt.makeV5(r, ownerPw, userPw, fk, salts)
        val p2 = base.copy(o = o, u = u, oe = oe, ue = ue)
        (p2, fk, s" /OE ${hex(oe)} /UE ${hex(ue)}" +
          " /Perms <00000000000000000000000000000000>")
      }
    })
    val id0 = params.id0
    def iv(num: Int): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"iv:$num:${pages.length}".getBytes(StandardCharsets.UTF_8))
    def encStream(num: Int, data: Array[Byte]): Array[Byte] =
      PdfCrypt.encrypt(params, fileKey, params.stmCfm, num, 0, iv(num), data)
    def encString(num: Int, data: Array[Byte]): Array[Byte] =
      PdfCrypt.encrypt(params, fileKey, params.strCfm, num, 0, iv(num * 7919 + 1), data)
    // ---- classic body layout (the write() shape) + /Encrypt + /ID
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    out.write(ascii("%PDF-1.6\n%âãÏÓ\n"))
    val n = pages.length
    val infoNum = if (info.nonEmpty) 4 + 2 * n else 0
    val encNum = 4 + 2 * n + (if (info.nonEmpty) 1 else 0)
    val offsets = new Array[Int](encNum + 1)
    def obj(num: Int, body: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n"))
      out.write(body)
      out.write(ascii("\nendobj\n"))
    }
    val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(1, ascii("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, ascii(s"<< /Type /Pages /Kids [$kids] /Count $n >>"))
    obj(3, ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>"))
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 4 + 2 * i
      val streamNum = pageNum + 1
      obj(pageNum, ascii(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 3 0 R >> >> /Contents $streamNum 0 R >>"))
      // stored bytes = Encrypt(filterEncode(plain)): readers decrypt
      // FIRST, then run /Filter (§7.6.2 ordering)
      val data = encStream(streamNum, deflate(contentOps(text)))
      offsets(streamNum) = out.size()
      out.write(ascii(s"$streamNum 0 obj\n<< /Length ${data.length}" +
        " /Filter /FlateDecode >>\nstream\n"))
      out.write(data)
      out.write(ascii("\nendstream\nendobj\n"))
    }
    if (info.nonEmpty) {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(ascii("<<"))
      info.foreach { case (k, v2) =>
        bo.write(ascii(s" /$k "))
        bo.write(ascii(hex(encString(infoNum, textStringRaw(v2)))))
      }
      bo.write(ascii(" >>"))
      obj(infoNum, bo.toByteArray)
    }
    val cfClause =
      if (v < 4) ""
      else s" /CF << /StdCF << /CFM /$cfmName /AuthEvent /DocOpen" +
        s" /Length ${lengthBits / 8} >> >> /StmF /StdCF /StrF /StdCF"
    obj(encNum, ascii(s"<< /Filter /Standard /V $v /R $r" +
      s" /Length $lengthBits /P ${params.p}" +
      s" /O ${hex(params.o)} /U ${hex(params.u)}$extraEnc$cfClause >>"))
    val xrefAt = out.size()
    out.write(ascii(s"xref\n0 ${encNum + 1}\n"))
    out.write(ascii("0000000000 65535 f \n"))
    (1 to encNum).foreach(i => out.write(ascii(f"${offsets(i)}%010d 00000 n \n")))
    val infoRef = if (info.nonEmpty) s" /Info $infoNum 0 R" else ""
    out.write(ascii(s"trailer\n<< /Size ${encNum + 1} /Root 1 0 R$infoRef" +
      s" /Encrypt $encNum 0 R /ID [${hex(id0)} ${hex(id0)}] >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  /** One page's content-stream operators (shared by every writer). */
  private def contentOps(text: String): Array[Byte] = {
    val ops = new StringBuilder
    ops.append("BT\n/F1 12 Tf\n72 720 Td\n")
    text.split("\n", -1).zipWithIndex.foreach { case (line, li) =>
      if (li > 0) ops.append("0 -14 Td\n")
      ops.append('(')
        .append(escapeString(line.map(c => WinAnsiEncode.getOrElse(c, c))))
        .append(") Tj\n")
    }
    ops.append("ET")
    ops.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Spec-correct PDF 1.5 writer: the same page model as [[write]] laid
    * out the modern way — catalog / pages node / font / page dicts /
    * /Info packed into ONE compressed object stream (§7.5.7), content
    * streams as regular Flate objects, and a cross-reference STREAM
    * (§7.5.8) with `/W [1 4 2]`, FlateDecode and the PNG Up predictor
    * (/Predictor 12) — i.e. every 1.5 structure [[extractText]] must
    * walk, byte-deterministic so oracles can predict the round-trip.
    * Same page-text contract as [[write]].
    */
  def write15(pages: Seq[String], info: Seq[(String, String)] = Nil): Array[Byte] = {
    require(pages.nonEmpty, "pdf write: at least one page")
    pages.foreach { p =>
      require(p.forall(encodableChar),
        "pdf write: page text must be WinAnsi-representable")
      require(p.isEmpty || p.split("\n", -1).forall(_.nonEmpty),
        "pdf write: empty lines do not round-trip (see scaladoc)")
    }
    info.foreach { case (k, _) =>
      require(k.nonEmpty && k.forall(_.isLetterOrDigit),
        s"pdf write: bad /Info key '$k'")
    }
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    out.write(ascii("%PDF-1.5\n%âãÏÓ\n"))
    val n = pages.length
    // numbering: 1 = ObjStm; in-stream: 2 catalog, 3 pages, 4 font,
    // 5..4+n page dicts, 5+2n info (when present); regular: 5+n..4+2n
    // content streams; LAST = the xref stream itself
    val infoNum = 5 + 2 * n
    val xrefNum = if (info.nonEmpty) 6 + 2 * n else 5 + 2 * n
    val offsets = new Array[Int](xrefNum + 1)
    // content streams first (their offsets are plain file positions)
    pages.zipWithIndex.foreach { case (text, i) =>
      val streamNum = 5 + n + i
      val data = deflate(contentOps(text))
      offsets(streamNum) = out.size()
      out.write(ascii(s"$streamNum 0 obj\n<< /Length ${data.length}" +
        " /Filter /FlateDecode >>\nstream\n"))
      out.write(data)
      out.write(ascii("\nendstream\nendobj\n"))
    }
    // the object stream: header pairs then the packed dicts
    val kids = (0 until n).map(i => s"${5 + i} 0 R").mkString(" ")
    val packed = Vector(
      2 -> s"<< /Type /Catalog /Pages 3 0 R >>",
      3 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>",
      4 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding /WinAnsiEncoding >>")) ++
      (0 until n).map { i =>
        (5 + i) -> (s"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 4 0 R >> >> /Contents ${5 + n + i} 0 R >>")
      } ++ (if (info.isEmpty) Vector.empty else {
        val bo = new java.lang.StringBuilder("<<")
        info.foreach { case (k, v) =>
          bo.append(s" /$k ").append(new String(textStringBytes(v),
            StandardCharsets.ISO_8859_1))
        }
        bo.append(" >>")
        Vector(infoNum -> bo.toString)
      })
    val bodies = packed.map(_._2 + "\n")
    val rels = bodies.scanLeft(0)(_ + _.length)
    val header = packed.zip(rels).map { case ((num, _), rel) => s"$num $rel" }
      .mkString("", " ", "\n")
    val stmPlain = ascii(header ++ bodies.mkString)
    val stmData = deflate(stmPlain)
    offsets(1) = out.size()
    out.write(ascii(s"1 0 obj\n<< /Type /ObjStm /N ${packed.length}" +
      s" /First ${header.length} /Length ${stmData.length}" +
      " /Filter /FlateDecode >>\nstream\n"))
    out.write(stmData)
    out.write(ascii("\nendstream\nendobj\n"))
    // the cross-reference stream: /W [1 4 2], PNG Up predictor rows
    offsets(xrefNum) = out.size()
    val rowBytes = 7
    val rows = new Array[Byte]((xrefNum + 1) * rowBytes)
    def row(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val p = num * rowBytes
      rows(p) = t.toByte
      rows(p + 1) = ((f2 >> 24) & 0xff).toByte
      rows(p + 2) = ((f2 >> 16) & 0xff).toByte
      rows(p + 3) = ((f2 >> 8) & 0xff).toByte
      rows(p + 4) = (f2 & 0xff).toByte
      rows(p + 5) = ((f3 >> 8) & 0xff).toByte
      rows(p + 6) = (f3 & 0xff).toByte
    }
    row(0, 0, 0L, 0xFFFF) // the free-list head
    row(1, 1, offsets(1).toLong, 0)
    packed.zipWithIndex.foreach { case ((num, _), idx) => row(num, 2, 1L, idx) }
    (0 until n).foreach(i => row(5 + n + i, 1, offsets(5 + n + i).toLong, 0))
    row(xrefNum, 1, offsets(xrefNum).toLong, 0)
    val xrefData = deflate(predictPng(rows, 2, columns = rowBytes))
    val infoRef = if (info.nonEmpty) s" /Info $infoNum 0 R" else ""
    out.write(ascii(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1}" +
      s" /W [1 4 2] /Root 2 0 R$infoRef /Length ${xrefData.length}" +
      " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns" +
      s" $rowBytes >> >>\nstream\n"))
    out.write(xrefData)
    out.write(ascii(s"\nendstream\nendobj\nstartxref\n${offsets(xrefNum)}\n%%EOF\n"))
    out.toByteArray
  }

  /** Serialize a text string (§7.9.2.2) as a literal string object:
    * PDFDocEncoding when every char is representable, else UTF-16BE with
    * the FE FF BOM. BYTE-level escaping — a '(' / ')' / '\' / CR byte
    * inside UTF-16 code units would otherwise unbalance the literal.
    */
  private def textStringBytes(value: String): Array[Byte] = {
    val enc = textStringRaw(value)
    val out = new java.io.ByteArrayOutputStream(enc.length + 8)
    out.write('(')
    enc.foreach { b =>
      if (b == '(' || b == ')' || b == '\\') { out.write('\\'); out.write(b) }
      else if (b == 0x0D) { out.write('\\'); out.write('r') }
      else out.write(b)
    }
    out.write(')')
    out.toByteArray
  }

  /** The UNSERIALIZED text-string bytes (encoding choice only, no
    * literal framing) — what the encrypting writer ciphers before
    * storing as a hex string.
    */
  private def textStringRaw(value: String): Array[Byte] =
    if (value.forall(PdfDocEncode.contains))
      value.map(c => PdfDocEncode(c).toByte).toArray
    else Array(0xFE.toByte, 0xFF.toByte) ++
      value.getBytes(StandardCharsets.UTF_16BE)

  /** A char the writer can emit AND the extractor decodes back to itself:
    * the WinAnsi typographic set, or Latin-1 outside the 0x80-0x9F block
    * (whose ASSIGNED slots decode as typographic chars, so the C1
    * controls they shadow cannot round-trip; the five unassigned slots
    * pass through and are fine).
    */
  private def encodableChar(c: Char): Boolean =
    WinAnsiEncode.contains(c) ||
      (c <= 'ÿ' && (c < 0x80 || c > 0x9F || WinAnsiHigh(c - 0x80) == c))

  private[operators] def escapeString(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](64 * 1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end() // free the native zlib state NOW
  }
}
