package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Type0/CID extraction through ToUnicode CMaps (ISO 32000-1 §9.7 +
  * §9.10.3): round-trips over CJK text, CMap parser coverage
  * (bfchar, bfrange incl. the array form, codespace widths), and the
  * named-reject lanes (no ToUnicode, non-Identity-H, unmapped CIDs).
  */
class PdfCjkSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  test("CJK round-trip: hiragana/han/hangul pages extract exactly") {
    val pages = Seq(
      "文書 42 — 日本語テキスト\n行 3 内容 café",
      "中文文本 처리 — mixed ASCII 123")
    val got = PdfCodec.extractText(PdfCodec.writeCjk(pages))
    assert(got.nPages == 2)
    assert(got.pages == pages)
  }

  test("ASCII in a Type0 font rides the bfrange blocks, not WinAnsi") {
    // digits and letters are ONLY reachable via the three bfrange spans
    // in the fixture CMap — a parser that skipped bfrange would reject
    val pages = Seq("ABC xyz 0189")
    assert(PdfCodec.extractText(PdfCodec.writeCjk(pages)).pages == pages)
  }

  test("multi-line + TJ semantics survive the CID decoder") {
    val pages = Seq("第一行\n第二行\n第三行 33")
    assert(PdfCodec.extractText(PdfCodec.writeCjk(pages)).pages == pages)
  }

  test("Type0 WITHOUT /ToUnicode stays the named reject") {
    val bytes = PdfCodec.writeCjk(Seq("漢字"), toUnicode = false)
    val e = intercept[IllegalArgumentException](PdfCodec.extractText(bytes))
    assert(e.getMessage.contains("needs a ToUnicode CMap"))
  }

  test("non-Identity-H encodings are a named reject") {
    val s = new String(PdfCodec.writeCjk(Seq("漢字")), StandardCharsets.ISO_8859_1)
    val v = s.replace("/Identity-H", "/Identity-V") // same length: xref intact
    val e = intercept[IllegalArgumentException](PdfCodec.extractText(ascii(v)))
    assert(e.getMessage.contains("Identity-H only"))
  }

  test("an unmapped CID is a named reject, not mojibake") {
    // patch one content hex code to a code point absent from the CMap
    // (also absent from the page text, so same-length replace is safe)
    val s = new String(PdfCodec.writeCjk(Seq("漢字")), StandardCharsets.ISO_8859_1)
    val code = f"${'漢'.toInt}%04X"
    val idx = s.lastIndexOf(code) // the content stream copy, not the CMap
    val patched = s.substring(0, idx) + "4E01" + s.substring(idx + 4)
    val e = intercept[IllegalArgumentException](PdfCodec.extractText(ascii(patched)))
    assert(e.getMessage.contains("without ToUnicode mapping"))
  }

  test("parseToUnicode: bfrange array form and multi-char (ligature) dsts") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0010> <0012> [<0041> <00660066> <0043>]
        |endbfrange
        |1 beginbfchar
        |<0020> <00460069>
        |endbfchar
        |endcmap
        |end""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val dec = PdfCodec.parseToUnicode(cmap)
    assert(dec(Array[Byte](0, 0x10)) == "A")
    assert(dec(Array[Byte](0, 0x11)) == "ff") // ligature expansion
    assert(dec(Array[Byte](0, 0x12)) == "C")
    assert(dec(Array[Byte](0, 0x20)) == "Fi")
    assert(dec(Array[Byte](0, 0x10, 0, 0x20, 0, 0x12)) == "AFiC")
  }

  test("parseToUnicode: 1-byte codespace widths decode byte-at-a-time") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfrange
        |<41> <5A> <0061>
        |endbfrange
        |endcmap""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val dec = PdfCodec.parseToUnicode(cmap)
    assert(dec("AZ".getBytes(StandardCharsets.US_ASCII)) == "az")
  }

  test("parseToUnicode named rejects: empty map, entry bomb, bad hex") {
    val none = "begincmap endcmap".getBytes(StandardCharsets.ISO_8859_1)
    val e1 = intercept[IllegalArgumentException](PdfCodec.parseToUnicode(none))
    assert(e1.getMessage.contains("no mappings"))
    val bomb = ("begincmap 1 beginbfrange <00000000> <7FFFFFFF> <0041> " +
      "endbfrange endcmap").getBytes(StandardCharsets.ISO_8859_1)
    val e2 = intercept[IllegalArgumentException](PdfCodec.parseToUnicode(bomb))
    assert(e2.getMessage.contains("entry cap"))
    val bad = "begincmap 1 beginbfchar <00ZZ> <0041> endbfchar endcmap"
      .getBytes(StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](PdfCodec.parseToUnicode(bad))
  }

  test("writer rejects non-BMP (surrogate) and control-char pages loudly") {
    intercept[IllegalArgumentException](PdfCodec.writeCjk(Seq("ok😀")))
    intercept[IllegalArgumentException](PdfCodec.writeCjk(Seq("tab\there")))
    intercept[IllegalArgumentException](PdfCodec.writeCjk(Seq("a\n\nb")))
  }

  test("a simple-font page and a Type0 page coexist in one corpus pass") {
    val simple = PdfCodec.extractText(PdfCodec.write(Seq("plain ‘café’")))
    val cjk = PdfCodec.extractText(PdfCodec.writeCjk(Seq("複合 font")))
    assert(simple.pages == Seq("plain ‘café’"))
    assert(cjk.pages == Seq("複合 font"))
  }

  test("q/Q restores the selected font (ISO 32000-1 §8.4.2 Table 52)") {
    // F0 is a 2-byte CID decoder, F1 rides the WinAnsi default. After a
    // q…Q bracket that switched to F1, shown codes MUST decode through F0
    // again — the un-stacked bug fed 2-byte CIDs to WinAnsi (mojibake).
    val cid: Array[Byte] => String = b =>
      b.grouped(2).map(p => (((p(0) & 0xff) << 8) | (p(1) & 0xff)).toChar).mkString
    val content = ("BT /F0 1 Tf <00580059> Tj ET\n" +
      "q\nBT /F1 1 Tf (ok) Tj ET\nQ\n" +
      "BT <005A0057> Tj ET").getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.pageText(content, Map("F0" -> cid)) == "XY\nok\nZW")
    // underflowing Q keeps the current font (viewer leniency, no crash)
    val under = ("Q\nBT /F0 1 Tf <0041> Tj ET")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.pageText(under, Map("F0" -> cid)) == "A")
  }

  test("bfrange destination crossing the BMP boundary is a named reject") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0010> <0013> <FFFD>
        |endbfrange
        |endcmap""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val e = intercept[IllegalArgumentException](PdfCodec.parseToUnicode(cmap))
    assert(e.getMessage.contains("overflows the BMP"))
    // the boundary-exact case (last dst lands ON 0xFFFF) stays legal
    val ok =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0010> <0012> <FFFD>
        |endbfrange
        |endcmap""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val dec = PdfCodec.parseToUnicode(ok)
    assert(dec(Array[Byte](0, 0x12)) == "￿")
  }
}
