package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class OfficeCodecSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("docx roundtrip: paragraphs, tabs, breaks, escapes, unicode") {
    val paras = Seq(
      "Plain paragraph",
      "tabs\there\tand here",
      "break\nwithin one paragraph",
      "escapes: a < b && c > d \"quoted\"",
      "unicode: café € Žofia — …")
    val bytes = OfficeCodec.writeDocx(paras)
    assert(Zip.isZip(bytes))
    assert(OfficeCodec.sniff(bytes).contains("docx"))
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "docx" && got.nParagraphs == 5)
    assert(got.text == paras.mkString("\n"))
  }

  test("odt roundtrip: paragraphs, tabs, breaks, mimetype-first layout") {
    val paras = Seq("First ¶", "with\ttab", "and\nline break", "€nd")
    val bytes = OfficeCodec.writeOdt(paras)
    assert(OfficeCodec.sniff(bytes).contains("odt"))
    // OpenDocument magic rule: member 0 is the STORED mimetype, so the
    // media type is readable at fixed offset 38 without unzipping
    assert(new String(bytes, 30, 8, StandardCharsets.US_ASCII) == "mimetype")
    assert(new String(bytes, 38, 39, StandardCharsets.US_ASCII) ==
      "application/vnd.oasis.opendocument.text")
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "odt" && got.nParagraphs == 4)
    assert(got.text == paras.mkString("\n"))
  }

  test("docx: table-cell and textbox paragraphs extract once, in order") {
    val documentXml =
      """<?xml version="1.0"?><w:document xmlns:w="x"><w:body>""" +
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>" +
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc></w:tr></w:tbl>" +
        "<w:p><w:r><w:drawing><w:txbxContent>" +
        "<w:p><w:r><w:t>boxed</w:t></w:r></w:p>" +
        "</w:txbxContent></w:drawing><w:t>after</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    val bytes = Zip.writeZip(Seq(
      "word/document.xml" -> utf8(documentXml)), deflate = true)
    val got = OfficeCodec.extractText(bytes)
    assert(got.nParagraphs == 5)
    // flat DOCUMENT order: the outer paragraph (whose text is "after")
    // STARTS before its nested textbox paragraph, so it lists first
    assert(got.text == "before\ncell one\ncell two\nafter\nboxed")
  }

  test("odt: text:s expands, table-cell paragraphs count once") {
    val contentXml =
      """<?xml version="1.0"?><office:document-content xmlns:office="o" xmlns:text="t">""" +
        "<office:body><office:text>" +
        "<text:p>a<text:s text:c=\"3\"/>b</text:p>" +
        "<table:table xmlns:table=\"tb\"><table:table-row><table:table-cell>" +
        "<text:p>cell</text:p></table:table-cell></table:table-row></table:table>" +
        "<text:h>heading</text:h>" +
        "</office:text></office:body></office:document-content>"
    val bytes = Zip.writeZip(Seq("content.xml" -> utf8(contentXml)))
    val got = OfficeCodec.extractText(bytes)
    assert(got.nParagraphs == 3)
    assert(got.text == "a   b\ncell\nheading")
  }

  test("OLE/CFB containers are a named reject (legacy .doc, encrypted OOXML)") {
    val ole = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte,
      0xA1.toByte, 0xB1.toByte, 0x1A, 0xE1.toByte) ++ new Array[Byte](64)
    assert(OfficeCodec.isOle(ole))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(ole))
    assert(e.getMessage.contains("OLE/CFB"))
  }

  test("zip without a document member and non-zip bytes reject namedly") {
    val stray = Zip.writeZip(Seq("readme.txt" -> utf8("nope")))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(stray))
    assert(e.getMessage.contains("no document member"))
    assert(OfficeCodec.sniff(stray).isEmpty)
    intercept[IllegalArgumentException](
      OfficeCodec.extractText(utf8("just some text")))
  }

  test("malformed XML and DOCTYPE (XXE guard) are named rejects") {
    val bad = Zip.writeZip(Seq("word/document.xml" -> utf8("<w:document><unclosed")))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(bad))
    assert(e.getMessage.contains("malformed"))
    // a doctype declaration — the XXE/entity-bomb vector — is a parse error
    val xxe = Zip.writeZip(Seq("word/document.xml" -> utf8(
      """<?xml version="1.0"?><!DOCTYPE d [<!ENTITY x SYSTEM "file:///etc/passwd">]>""" +
        "<w:document><w:body><w:p><w:r><w:t>&x;</w:t></w:r></w:p></w:body></w:document>")))
    val e2 = intercept[IllegalArgumentException](OfficeCodec.extractText(xxe))
    assert(e2.getMessage.contains("malformed"))
  }

  test("damaged zip passes through the Zip walk's own named reject") {
    val good = OfficeCodec.writeDocx(Seq("content"))
    val cut = java.util.Arrays.copyOf(good, good.length - 7)
    intercept[IllegalArgumentException](OfficeCodec.extractText(cut))
  }

  test("writers validate CR input") {
    intercept[IllegalArgumentException](OfficeCodec.writeDocx(Seq("a\rb")))
    intercept[IllegalArgumentException](OfficeCodec.writeOdt(Seq("a\rb")))
    intercept[IllegalArgumentException](OfficeCodec.writeDocx(Nil))
  }

  test("xlsx roundtrip: shared strings dedup, numerics, multi-sheet order") {
    val sheets = Seq(
      Seq(Seq("name", "count", "note"),
        Seq("alpha", "42", "café …"),
        Seq("alpha", "7", "")), // "alpha" and "" exercise dedup + empty
      Seq(Seq("second sheet", "99")))
    val bytes = OfficeCodec.writeXlsx(sheets)
    assert(OfficeCodec.sniff(bytes).contains("xlsx"))
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "xlsx" && got.nParagraphs == 4)
    assert(got.text ==
      "name\tcount\tnote\nalpha\t42\tcafé …\nalpha\t7\t\nsecond sheet\t99")
    // the writer really deduplicates: one <si> per distinct string
    val ss = new String(Zip.readMembers(bytes)
      .find(_.name == "xl/sharedStrings.xml").get.payload, StandardCharsets.UTF_8)
    // name,count,note,alpha,café …,"",second sheet — numerics excluded
    assert("<si>".r.findAllIn(ss).length == 7)
  }

  test("xlsx: inline strings, rich shared runs, booleans, sheet10 after sheet9") {
    val shared =
      """<?xml version="1.0"?><sst><si><t>plain</t></si>""" +
        "<si><r><t>rich </t></r><r><t>run</t></r></si></sst>"
    def sheet(cell: String) =
      s"""<?xml version="1.0"?><worksheet><sheetData><row r="1">$cell</row></sheetData></worksheet>"""
    val bytes = Zip.writeZip(Seq(
      "xl/workbook.xml" -> utf8("""<?xml version="1.0"?><workbook/>"""),
      "xl/sharedStrings.xml" -> utf8(shared),
      "xl/worksheets/sheet9.xml" -> utf8(sheet(
        """<c t="s"><v>1</v></c><c t="b"><v>1</v></c>""")),
      "xl/worksheets/sheet10.xml" -> utf8(sheet(
        """<c t="inlineStr"><is><t>inline</t></is></c><c><v>3.25</v></c>"""))))
    val got = OfficeCodec.extractText(bytes)
    assert(got.text == "rich run\tTRUE\ninline\t3.25")
    // out-of-range shared index is a named reject
    val bad = Zip.writeZip(Seq(
      "xl/workbook.xml" -> utf8("""<?xml version="1.0"?><workbook/>"""),
      "xl/worksheets/sheet1.xml" -> utf8(sheet("""<c t="s"><v>0</v></c>"""))))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(bad))
    assert(e.getMessage.contains("shared-string index"))
  }

  test("pptx roundtrip: slides in order, breaks inside paragraphs") {
    val slides = Seq(
      Seq("Title slide", "subtitle\nsecond line"),
      Seq("Bullet one", "Bullet two — …"))
    val bytes = OfficeCodec.writePptx(slides)
    assert(OfficeCodec.sniff(bytes).contains("pptx"))
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "pptx" && got.nParagraphs == 4)
    assert(got.text == slides.flatten.mkString("\n"))
  }

  test("epub roundtrip: OCF layout, spine order, block text") {
    val chapters = Seq(
      Seq("Chapter one opens.", "Second paragraph — with café."),
      Seq("Chapter two."))
    val bytes = OfficeCodec.writeEpub(chapters)
    assert(OfficeCodec.sniff(bytes).contains("epub"))
    // OCF magic: stored mimetype first, readable at fixed offset 38
    assert(new String(bytes, 38, 20, StandardCharsets.US_ASCII) ==
      "application/epub+zip")
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "epub" && got.nParagraphs == 3)
    assert(got.text == chapters.flatten.mkString("\n"))
  }

  test("epub: spine reorders chapters; script/style and br handled") {
    val container = """<?xml version="1.0"?><container><rootfiles>""" +
      """<rootfile full-path="book/pkg.opf"/></rootfiles></container>"""
    val opf = """<?xml version="1.0"?><package><manifest>""" +
      """<item id="a" href="one.xhtml"/><item id="b" href="two.xhtml"/>""" +
      """</manifest><spine><itemref idref="b"/><itemref idref="a"/></spine></package>"""
    val one = """<?xml version="1.0"?><html><body><p>FIRST file</p></body></html>"""
    val two = """<?xml version="1.0"?><html><body>""" +
      """<script>ignore();</script><style>p{}</style>""" +
      """<h1>Title</h1><p>line one<br/>line two</p></body></html>"""
    val bytes = Zip.writeZip(Seq(
      "mimetype" -> utf8("application/epub+zip"),
      "META-INF/container.xml" -> utf8(container),
      "book/pkg.opf" -> utf8(opf),
      "book/one.xhtml" -> utf8(one),
      "book/two.xhtml" -> utf8(two)))
    val got = OfficeCodec.extractText(bytes)
    assert(got.text == "Title\nline one\nline two\nFIRST file")
  }

  test("epub: missing rootfile / chapter / idref are named rejects") {
    val bytes = Zip.writeZip(Seq(
      "mimetype" -> utf8("application/epub+zip"),
      "META-INF/container.xml" -> utf8(
        """<?xml version="1.0"?><container><rootfiles>""" +
          """<rootfile full-path="gone.opf"/></rootfiles></container>""")))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(bytes))
    assert(e.getMessage.contains("rootfile 'gone.opf' not in the archive"))
  }

  test("empty paragraphs and whitespace-preserving runs survive") {
    val paras = Seq("", "  leading and trailing  ", "")
    val got = OfficeCodec.extractText(OfficeCodec.writeDocx(paras))
    assert(got.nParagraphs == 3)
    assert(got.text == paras.mkString("\n"))
    val gotOdt = OfficeCodec.extractText(OfficeCodec.writeOdt(paras))
    assert(gotOdt.text == paras.mkString("\n"))
  }

  // ------------------------------------- sniff/extract agreement (r11 advice)

  test("a zip with only a mimetype member is not promised as decodable") {
    // e.g. a malformed EPUB missing container.xml: sniff must NOT say
    // "odt" when extractText would throw "no document member" — triage
    // and extraction have to agree on decodability
    val stray = Zip.writeZip(Seq(
      "mimetype" -> "application/epub+zip".getBytes(StandardCharsets.US_ASCII)))
    assert(OfficeCodec.sniff(stray).isEmpty)
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(stray))
    assert(e.getMessage.contains("no document member"))
  }
}
