package graft.operators

/** RTF text extraction — the word-processor interchange format two
  * decades of the web exported (`.rtf` attachments, legacy CMS exports).
  * Public spec: the Rich Text Format Specification 1.9.1 (Microsoft,
  * freely published). A structural byte-walk in the house style: groups,
  * control words, and escapes are interpreted; styling is skipped by
  * construction; nothing is executed.
  *
  * Profile:
  *  - control words `\par` `\line` -> '\n', `\tab` -> '\t'; `\uN`
  *    unicode (with `\ucN` fallback-skip honored, default 1); `\'xx`
  *    byte escapes decode as Windows-1252 (the `\ansicpg1252` default —
  *    byte-identical to PDF's WinAnsiEncoding, same shared table);
  *  - skipped destinations: `{\*\...}` starred groups, `fonttbl`,
  *    `colortbl`, `stylesheet`, `info`, `pict`, headers/footers,
  *    `\fldinst` field instructions (the `\fldrslt` TEXT is kept — what
  *    a reader sees);
  *  - `\binN` raw-byte runs are skipped BY LENGTH (binary never reaches
  *    the text walk), and group nesting is capped — a crafted file costs
  *    one pass, never a hang;
  *  - not RTF (`{\rtf` header missing) is a named reject.
  *
  * Scale shape: per-record scalar walk, the PDF/office distribution
  * story.
  */
object Rtf {

  final val MaxGroupDepth = 128

  def isRtf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '{' && b(1) == '\\' && b(2) == 'r' &&
      b(3) == 't' && b(4) == 'f'

  /** The destinations whose content is formatting/metadata, not text. */
  private val SkipDests = Set("fonttbl", "colortbl", "stylesheet", "info",
    "pict", "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "fldinst")

  /** Extract the visible text. Throws a NAMED
    * `IllegalArgumentException` for non-RTF bytes or unbalanced groups.
    */
  def extractText(bytes: Array[Byte]): String = {
    require(isRtf(bytes), "rtf: missing {\\rtf header")
    val sb = new java.lang.StringBuilder
    // group state: (skipping, ucSkip) saved on '{' and restored on '}'
    var depth = 0
    var skipping = false
    var ucSkip = 1
    val stack = new Array[(Boolean, Int)](MaxGroupDepth)
    var i = 0
    var pendingUcSkip = 0 // fallback chars to swallow after \uN
    // Only LITERAL text counts toward the \uN fallback skip (RTF 1.9.1:
    // the fallback is the \ansi rendering — plain chars, \'xx, and the
    // escaped literals). Control-word OUTPUT (\par, \tab, \emdash, ...)
    // is not fallback text: "荤\par" must keep its paragraph break,
    // so emit() resets the pending skip instead of consuming it; group
    // boundaries reset it too.
    def append(c: Char): Unit =
      if (!skipping) {
        if (pendingUcSkip > 0) pendingUcSkip -= 1
        else sb.append(c)
      }
    def emit(c: Char): Unit = {
      pendingUcSkip = 0
      if (!skipping) sb.append(c)
    }
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      c match {
        case '{' =>
          require(depth < MaxGroupDepth, "rtf: groups nested past the cap")
          stack(depth) = (skipping, ucSkip)
          pendingUcSkip = 0
          depth += 1
          i += 1
          // a starred destination `{\*\word ...}` is skipped wholesale
          if (i + 1 < bytes.length && bytes(i) == '\\' && bytes(i + 1) == '*')
            skipping = true
        case '}' =>
          require(depth > 0, "rtf: unbalanced '}'")
          pendingUcSkip = 0
          depth -= 1
          val (s, u) = stack(depth)
          skipping = s; ucSkip = u
          i += 1
        case '\\' =>
          i += 1
          require(i < bytes.length, "rtf: dangling backslash")
          val d = bytes(i) & 0xff
          if (d == '\'') { // \'xx — a Windows-1252 byte
            require(i + 2 < bytes.length, "rtf: truncated \\'xx escape")
            val hi = Character.digit(bytes(i + 1), 16)
            val lo = Character.digit(bytes(i + 2), 16)
            require(hi >= 0 && lo >= 0, "rtf: bad hex in \\'xx escape")
            append(cp1252((hi << 4) | lo))
            i += 3
          } else if (d == '\\' || d == '{' || d == '}') {
            append(d.toChar); i += 1
          } else if (d == '~') { emit('\u00A0'); i += 1 } // nbsp
          else if (d == '-' || d == '_' || d == ':') i += 1 // soft hyphen etc.
          else if (d == '\n' || d == '\r') { emit('\n'); i += 1 } // \<eol> = \par
          else if (d == '*') i += 1 // handled at '{'; stray \* is styling
          else if (Character.isLetter(d)) {
            // control word: letters, optional signed parameter, optional space
            val start = i
            while (i < bytes.length && Character.isLetter(bytes(i) & 0xff)) i += 1
            val word = new String(bytes, start, i - start,
              java.nio.charset.StandardCharsets.US_ASCII)
            var param = 0L
            var hasParam = false
            var neg = false
            if (i < bytes.length && bytes(i) == '-') { neg = true; i += 1 }
            while (i < bytes.length && Character.isDigit(bytes(i) & 0xff)) {
              hasParam = true
              param = math.min(param * 10 + (bytes(i) - '0'), Int.MaxValue.toLong)
              i += 1
            }
            if (neg) param = -param
            if (i < bytes.length && bytes(i) == ' ') i += 1 // delimiter space
            word match {
              case "par" | "line" | "sect" | "page" => emit('\n')
              case "tab" => emit('\t')
              case "emdash" => emit('—')
              case "endash" => emit('–')
              case "lquote" => emit('‘')
              case "rquote" => emit('’')
              case "ldblquote" => emit('“')
              case "rdblquote" => emit('”')
              case "bullet" => emit('•')
              case "uc" => ucSkip = math.max(0, param.toInt)
              case "u" =>
                // \uN: signed 16-bit code unit; negative N means N+65536
                val cp = (if (param < 0) param + 65536 else param).toInt & 0xffff
                if (!skipping) {
                  sb.append(cp.toChar)
                  pendingUcSkip = ucSkip
                }
              case "bin" =>
                require(param >= 0 && i + param <= bytes.length,
                  "rtf: \\bin run past the buffer")
                i += param.toInt // raw bytes: skipped by length, never parsed
              case w if SkipDests(w) => skipping = true
              case _ => () // styling: \b, \fs24, \f0, \ansicpg1252, ...
            }
          } else i += 1 // unknown control symbol: ignored
        case '\r' | '\n' => i += 1 // raw EOLs are NOT text in RTF
        case _ =>
          append(c.toChar); i += 1
      }
    }
    require(depth == 0, "rtf: unbalanced '{'")
    // writers end the document with a final \par; one trailing break is framing
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
      sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Windows-1252 byte -> char (byte-identical to PDF's WinAnsi table —
    * decoded through the JDK's own cp1252 charset, one 256-entry table
    * built once).
    */
  private val cp1252: Array[Char] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    (0 until 256).map { b =>
      val s = new String(Array(b.toByte), cs)
      if (s.isEmpty) b.toChar else s.charAt(0)
    }.toArray
  }

  private val cp1252Encode: Map[Char, Int] =
    cp1252.zipWithIndex.collect {
      case (c, i) if c != '\uFFFD' => c -> i
    }.toMap

  /** Deterministic writer — the oracle half: paragraphs joined by \par,
    * ASCII literal (RTF specials escaped), 0x80-0xFF cp1252 bytes as
    * `\'xx`, anything else as `\uN` with `\uc0` declared once. '\t'
    * emits `\tab`, '\n' inside a paragraph `\line`.
    */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    require(paragraphs.nonEmpty, "rtf write: at least one paragraph")
    // the extractor treats ONE trailing break as document framing, so a
    // final empty paragraph / trailing '\n' cannot round-trip
    require(paragraphs.last.nonEmpty && !paragraphs.last.endsWith("\n"),
      "rtf write: final paragraph must not be empty or end with a line break")
    val sb = new java.lang.StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\uc0{\\fonttbl{\\f0 Helvetica;}}\\f0 ")
    paragraphs.zipWithIndex.foreach { case (p, pi) =>
      if (pi > 0) sb.append("\\par\n")
      p.foreach {
        case '\\' => sb.append("\\\\")
        case '{' => sb.append("\\{")
        case '}' => sb.append("\\}")
        case '\t' => sb.append("\\tab ")
        case '\n' => sb.append("\\line ")
        case c if c < 0x80 => sb.append(c)
        case c => cp1252Encode.get(c) match {
          case Some(b) if b >= 0x80 => sb.append(f"\\'$b%02x")
          case _ => sb.append(s"\\u${c.toInt} ")
        }
      }
    }
    sb.append("}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
