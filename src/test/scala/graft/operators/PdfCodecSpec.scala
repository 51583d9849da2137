package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class PdfCodecSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  // ------------------------------------------------------------ roundtrip

  test("roundtrip: one page, one line, uncompressed") {
    val got = PdfCodec.extractText(PdfCodec.write(Seq("Hello world")))
    assert(got == PdfCodec.PdfText(1, Seq("Hello world")))
  }

  test("roundtrip: multi-line pages, Flate-compressed") {
    val pages = Seq("line one\nline two\nline three", "second page\nhere")
    val bytes = PdfCodec.write(pages, compress = true)
    // compressed streams must not contain the plaintext
    assert(!new String(bytes, StandardCharsets.ISO_8859_1).contains("line one"))
    assert(PdfCodec.extractText(bytes) == PdfCodec.PdfText(2, pages))
  }

  test("roundtrip: WinAnsi text outside ASCII (café) survives") {
    val pages = Seq("un café crème\nà 3€?".replace("€", "E")) // Latin-1 only
    assert(PdfCodec.extractText(PdfCodec.write(pages, compress = true)).pages == pages)
  }

  test("roundtrip: parens and backslashes escape correctly") {
    val pages = Seq("f(x) = (a \\ b) ((nested))\nend)")
    assert(PdfCodec.extractText(PdfCodec.write(pages)).pages == pages)
    assert(PdfCodec.extractText(PdfCodec.write(pages, compress = true)).pages == pages)
  }

  test("roundtrip: ten pages keep page-tree order") {
    val pages = (0 until 10).map(i => s"page $i\nbody $i")
    assert(PdfCodec.extractText(PdfCodec.write(pages)).pages == pages)
  }

  test("pageCount probes without decoding streams") {
    val bytes = PdfCodec.write(Seq("a", "b", "c"), compress = true)
    assert(PdfCodec.pageCount(bytes) == 3)
  }

  test("writer validates input") {
    intercept[IllegalArgumentException](PdfCodec.write(Nil))
    intercept[IllegalArgumentException](PdfCodec.write(Seq("中文")))
  }

  test("roundtrip: WinAnsi 0x80-0x9F typographic block survives") {
    val pages = Seq("\u2018caf\u00e9\u2019 \u2014 \u201cfancy\u201d \u2026 3\u20ac \u2122 \u2022 \u0153 \u0178 \u017e \u0160\n\u201alow\u2019")
    val bytes = PdfCodec.write(pages)
    // the file carries WinAnsi BYTES, not UTF-8: \u20ac is ONE byte, 0x80
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains('\u0080') && !s.contains("\u20ac"))
    assert(PdfCodec.extractText(bytes).pages == pages)
    assert(PdfCodec.extractText(PdfCodec.write(pages, compress = true)).pages == pages)
  }

  test("writer rejects chars that cannot round-trip through WinAnsi") {
    // assigned 0x80-0x9F slots decode as typographic chars, so the C1
    // controls they shadow are a caller error...
    intercept[IllegalArgumentException](PdfCodec.write(Seq("\u0080")))
    intercept[IllegalArgumentException](PdfCodec.write(Seq("\u0093x\u0094")))
    // ...but the five UNASSIGNED slots pass through both ways
    val odd = "\u0081\u008d\u008f\u0090\u009d"
    assert(PdfCodec.extractText(PdfCodec.write(Seq(odd))).pages == Seq(odd))
  }

  test("/Info roundtrips through BOTH text-string encodings") {
    val title = "Report 7 \u2014 \u2018r\u00e9sum\u00e9\u2019 \u2116 42" // № forces UTF-16BE
    val author = "Author 3 (unit\u2026)" // PDFDocEncoding at 0x83, parens escaped
    val bytes = PdfCodec.write(Seq("body"), compress = true,
      info = Seq("Title" -> title, "Author" -> author,
        "Producer" -> "graft 1.0", "CreationDate" -> "D:20260101000000Z"))
    val m = PdfCodec.info(bytes)
    assert(m.title.contains(title) && m.author.contains(author))
    assert(m.producer.contains("graft 1.0"))
    assert(m.created.contains("D:20260101000000Z"))
    assert(m.subject.isEmpty && m.modified.isEmpty)
    // the wire proves the encoding split: the title string carries the
    // FE FF BOM, the author has NO BOM and its ellipsis is ONE byte, 0x83
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Title (\u00fe\u00ff"))
    assert(s.contains("/Author (Author 3 \\(unit\u0083\\))"))
    // the extract path is untouched, and files without /Info say None
    assert(PdfCodec.extractText(bytes).pages == Seq("body"))
    assert(PdfCodec.info(PdfCodec.write(Seq("x"))) ==
      PdfCodec.PdfInfo(None, None, None, None, None, None))
  }

  test("/Info text strings survive hostile byte patterns") {
    // UTF-16 code units whose LOW bytes are '(' ')' '\' CR — unescaped
    // they would unbalance or corrupt the literal string
    val nasty = "A\u0128B\u0129C\u015cD\u010dE" // low bytes 0x28 0x29 0x5c 0x0d
    val forced = nasty + "\u2116" // keep it on the UTF-16 path
    val m = PdfCodec.info(PdfCodec.write(Seq("x"),
      info = Seq("Title" -> forced)))
    assert(m.title.contains(forced))
    // PDFDocEncoding path: parens + backslash escape at the byte level too
    val doc = "a(b)c\\d \u2022\u20ac\u02d8"
    val m2 = PdfCodec.info(PdfCodec.write(Seq("x"), info = Seq("Title" -> doc)))
    assert(m2.title.contains(doc))
  }

  test("PDFDocEncoding and WinAnsi are pinned apart") {
    // the SAME byte decodes differently per table: 0x85 is … in WinAnsi
    // page text but EN DASH in a PDFDocEncoding info string
    assert(PdfCodec.pdfDocDecode(Array(0x85.toByte)) == "\u2013")
    assert(PdfCodec.winAnsiDecode(Array(0x85.toByte)) == "\u2026")
    // euro: 0x80 in WinAnsi, 0xA0 in PDFDocEncoding
    assert(PdfCodec.pdfDocDecode(Array(0xA0.toByte)) == "\u20ac")
    assert(PdfCodec.winAnsiDecode(Array(0x80.toByte)) == "\u20ac")
    // accents live at 0x18-0x1F only in PDFDocEncoding
    assert(PdfCodec.pdfDocDecode(Array(0x18.toByte)) == "\u02d8")
  }

  test("encrypted files reject info() too; /Info rides incremental updates") {
    val bytes = PdfCodec.write(Seq("x"), info = Seq("Title" -> "t"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
    val e = intercept[IllegalArgumentException](
      PdfCodec.info(enc.getBytes(StandardCharsets.ISO_8859_1)))
    assert(e.getMessage.contains("encrypted"))
  }

  test("writer rejects empty lines (outside the round-trip contract)") {
    intercept[IllegalArgumentException](PdfCodec.write(Seq("a\n\nb")))
    intercept[IllegalArgumentException](PdfCodec.write(Seq("a\n")))
    intercept[IllegalArgumentException](PdfCodec.write(Seq("\nb")))
    // the fully-empty page is fine: () Tj shows nothing, extracts ""
    assert(PdfCodec.extractText(PdfCodec.write(Seq(""))).pages == Seq(""))
  }

  // --------------------------------------------------- content interpreter

  private def text(content: String): String = PdfCodec.pageText(ascii(content))

  test("Tj shows text; Td with vertical move breaks the line") {
    assert(text("BT /F1 12 Tf 72 720 Td (a) Tj 0 -14 Td (b) Tj ET") == "a\nb")
    // horizontal-only Td is kerning/indent, not a line break
    assert(text("BT (a) Tj 10 0 Td (b) Tj ET") == "ab")
  }

  test("TJ inserts a space only below the kerning threshold") {
    assert(text("BT (Hello) Tj [(wo) -50 (rld) -200 (x)] TJ ET") == "Helloworld x")
  }

  test("quote operators start a new line before showing") {
    assert(text("BT (a) Tj (b) ' ET") == "a\nb")
    assert(text("BT (a) Tj 2 3 (c) \" ET") == "a\nc")
  }

  test("T* and Tm break lines; text outside BT/ET is ignored") {
    assert(text("BT (x) Tj T* (y) Tj ET") == "x\ny")
    assert(text("BT (x) Tj 1 0 0 1 72 600 Tm (y) Tj ET") == "x\ny")
    assert(text("(never) Tj BT (shown) Tj ET (also never) Tj") == "shown")
  }

  test("octal and special escapes, hex strings, line continuation") {
    assert(text("BT (\\101\\102\\060) Tj ET") == "AB0")
    assert(text("BT (a\\(b\\)c\\\\d) Tj ET") == "a(b)c\\d")
    assert(text("BT <414243> Tj ET") == "ABC")
    assert(text("BT <48 49 4> Tj ET") == "HI@") // odd digit pads with 0
    assert(text("BT (a\\\nb) Tj ET") == "ab")   // backslash-newline joins
  }

  test("graphics operators and inline dictionaries are skipped") {
    val c = "q 1 0 0 1 0 0 cm /P <</MCID 0>> BDC BT (kept) Tj ET EMC Q"
    assert(text(c) == "kept")
  }

  test("inline images are skipped as raw bytes (binary never hits the lexer)") {
    // §8.9.7: the pixel data after ID may contain '(' and '<' — bytes
    // that would throw in the object lexer if interpreted
    val img = "BI /W 2 /H 2 /BPC 8 /CS /RGB ID  ( < )  EI"
    assert(text(s"BT (a) Tj ET $img BT (b) Tj ET") == "a\nb")
    // image dict values ending in array/name delimiters before ID
    val img2 = "BI /W 1 /D [1 0] ID  (  EI"
    assert(text(s"$img2 BT (c) Tj ET") == "c")
  }

  test("unterminated inline image is a named reject") {
    val e = intercept[IllegalArgumentException](
      text("BT (a) Tj ET BI /W 1 ID  ( "))
    assert(e.getMessage.contains("inline image"))
  }

  // ------------------------------------------------------- damage / bombs

  test("damaged startxref falls back to the object scan") {
    val bytes = PdfCodec.write(Seq("rescued text"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val broken = s.replaceAll("startxref\n\\d+", "startxref\n999999999")
    val got = PdfCodec.extractText(broken.getBytes(StandardCharsets.ISO_8859_1))
    assert(got.pages == Seq("rescued text"))
  }

  test("corrupted xref table falls back to the object scan") {
    val bytes = PdfCodec.write(Seq("still here", "me too"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val broken = s.replace("xref\n0 ", "xrEF\n0 ") // keyword destroyed
    val got = PdfCodec.extractText(broken.getBytes(StandardCharsets.ISO_8859_1))
    assert(got.pages == Seq("still here", "me too"))
  }

  test("truncation after the last page still extracts (no trailer at all)") {
    val bytes = PdfCodec.write(Seq("survives truncation"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val cut = s.substring(0, s.indexOf("xref\n0 ")) // drop xref + trailer
    val got = PdfCodec.extractText(cut.getBytes(StandardCharsets.ISO_8859_1))
    assert(got.pages == Seq("survives truncation"))
  }

  test("encrypted PDFs are a named reject") {
    val bytes = PdfCodec.write(Seq("secret"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(enc.getBytes(StandardCharsets.ISO_8859_1)))
    assert(e.getMessage.contains("encrypted"))
  }

  test("a damaged xref stream falls back to the scan, then rejects namedly") {
    // startxref points at a /Type /XRef object with no /W — the 1.5 parse
    // fails, the linear scan recovers the one object, and the absence of
    // any catalog is the named reject (not a crash)
    val body = "%PDF-1.5\n7 0 obj\n<< /Type /XRef /Length 0 >>\nstream\n\nendstream\nendobj\n"
    val pdf = body + s"startxref\n${"%PDF-1.5\n".length}\n%%EOF\n"
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(ascii(pdf)))
    assert(e.getMessage.contains("no /Root catalog"))
  }

  test("incremental update: newest definition of an object wins") {
    val bytes = PdfCodec.write(Seq("old text"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val oldXref = s.lastIndexOf("xref\n0 ")
    // replacement content stream for object 5 (the page's /Contents)
    val stream = "BT (new text) Tj ET"
    val updBody = s"5 0 obj\n<< /Length ${stream.length} >>\nstream\n$stream\nendstream\nendobj\n"
    val objAt = bytes.length
    val upd = updBody +
      f"xref\n5 1\n$objAt%010d 00000 n \n" +
      s"trailer\n<< /Size 6 /Root 1 0 R /Prev $oldXref >>\n" +
      s"startxref\n${bytes.length + updBody.length}\n%%EOF\n"
    val full = bytes ++ ascii(upd)
    assert(PdfCodec.extractText(full).pages == Seq("new text"))
  }

  test("flate bombs hit the cap, truncated flate is a named reject") {
    val big = new Array[Byte](1 << 20) // 1 MiB of zeros compresses tiny
    val d = new java.util.zip.Deflater()
    d.setInput(big); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val packed = out.toByteArray
    val e = intercept[IllegalArgumentException](
      PdfCodec.inflateBounded(packed, 4096, "test"))
    assert(e.getMessage.contains("cap"))
    // truncated stream: named reject, not a hang or a crash
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.inflateBounded(java.util.Arrays.copyOf(packed, 8), 1 << 22, "test"))
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("corrupt"))
  }

  test("contents may be an ARRAY of streams — concatenated in order") {
    // hand-build: page with /Contents [5 0 R 6 0 R]
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n",
      "4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [5 0 R 6 0 R] >>\nendobj\n",
      "5 0 obj\n<< /Length 14 >>\nstream\nBT (one) Tj ET\nendstream\nendobj\n",
      "6 0 obj\n<< /Length 14 >>\nstream\nBT (two) Tj ET\nendstream\nendobj\n")
    val header = "%PDF-1.4\n"
    val sb = new StringBuilder(header)
    val offsets = objs.map { o => val at = sb.length; sb.append(o); at }
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val got = PdfCodec.extractText(ascii(sb.toString))
    // two text OBJECTS (BT..ET each) — a line break separates them
    assert(got == PdfCodec.PdfText(1, Seq("one\ntwo")))
  }

  test("reference cycle in the page tree is a named reject, not a hang") {
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val at = sb.length; sb.append(o); at }
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(ascii(sb.toString)))
    assert(e.getMessage.contains("too deep"))
  }

  // ----------------------------------------------------------- probe row

  test("probeBytes: pdf container, page count, decodable flags") {
    val ok = Multimodal.probeBytes(7L, PdfCodec.write(Seq("a", "b")))
    assert(ok == Multimodal.MediaProbe(7L, "pdf", Some("pdf"),
      None, None, None, None, Some(2L), decodable = true))
    val s = new String(PdfCodec.write(Seq("x")), StandardCharsets.ISO_8859_1)
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    val bad = Multimodal.probeBytes(8L, enc.getBytes(StandardCharsets.ISO_8859_1))
    assert(bad.container == "pdf" && !bad.decodable && bad.n_frames.isEmpty)
  }

  // ------------------------------ inherited resources + hybrid xref (r11 advice)

  test("Type0 fonts inherited from the /Pages node are still a named reject") {
    // /Resources is inheritable (ISO 32000-1 \u00a77.7.3.4): wild CJK PDFs
    // hang the composite font on the page TREE; the guard must see it.
    // No xref on purpose: the scan fallback indexes the objects.
    val doc =
      "%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1" +
        " /Resources << /Font << /F1 4 0 R >> >> >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n" +
        "4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Any >> endobj\n" +
        "5 0 obj << /Length 19 >>\nstream\nBT (mojibake) Tj ET\nendstream\nendobj\n"
    val e = intercept[IllegalArgumentException](PdfCodec.extractText(ascii(doc)))
    assert(e.getMessage.contains("Type0"))
    // a page-level /Resources OVERRIDES the inherited one: same tree, but
    // the page carries its own simple font - extraction succeeds
    val own = doc.replace(
      "/Parent 2 0 R /Contents 5 0 R",
      "/Parent 2 0 R /Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R") +
      "6 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >> endobj\n"
    assert(PdfCodec.extractText(ascii(own)).pages == Seq("mojibake"))
  }

  test("hybrid-reference: objects listed only in /XRefStm resolve (Acrobat shape)") {
    // Acrobat-written hybrids mark object-stream-compressed objects FREE
    // in the classic table and list them only in the /XRefStm stream; a
    // reader that ignores the pointer loses the catalog itself.
    val pages = Seq("hybrid text survives")
    val base = PdfCodec.write15(pages)
    val s = new String(base, StandardCharsets.ISO_8859_1)
    val tail = s.substring(s.lastIndexOf("startxref"))
    val xrefStmOff = tail.split("\\s+")(1).toInt
    def off(num: Int): Int = {
      val i = s.indexOf(s"\n$num 0 obj"); require(i >= 0, s"obj $num not found"); i + 1
    }
    // classic update: only the DIRECT objects (objstm 1, content 6, xref
    // stream 7) are listed; compressed 2..5 appear nowhere here
    val classic = new StringBuilder
    val tableOff = base.length
    classic.append("xref\n0 2\n")
    classic.append(f"${0}%010d 65535 f \n")
    classic.append(f"${off(1)}%010d 00000 n \n")
    classic.append("6 2\n")
    classic.append(f"${off(6)}%010d 00000 n \n")
    classic.append(f"$xrefStmOff%010d 00000 n \n")
    classic.append(s"trailer\n<< /Size 8 /Root 2 0 R /XRefStm $xrefStmOff >>\n")
    classic.append(s"startxref\n$tableOff\n%%EOF\n")
    val hybrid = base ++ classic.toString.getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extractText(hybrid).pages == pages)
    assert(PdfCodec.pageCount(hybrid) == 1)
  }
}
