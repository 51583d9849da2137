package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [MS-PPT] record-tree walk: both text atoms, nesting, named rejects. */
class MsPptSpec extends AnyFunSuite {

  test("slides round-trip through BOTH text atom lanes") {
    val slides = Seq(
      Seq("Title slide", "subtitle — café"), // cp1252-able: TextBytesAtom
      Seq("wide 日本語 slide"), // forces TextCharsAtom
      Seq("bullets", "more", "last"))
    val bytes = MsPpt.write(slides)
    assert(Cfb.kind(bytes).contains("ppt"))
    assert(MsPpt.extractTexts(bytes) == slides.map(_.mkString("\n")))
    assert(MsPpt.extractText(bytes) ==
      "Title slide\nsubtitle — café\nwide 日本語 slide\nbullets\nmore\nlast")
  }

  test("office routing + probe triage take .ppt through the walk") {
    val bytes = MsPpt.write(Seq(Seq("routed")))
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "ppt" && got.text == "routed" && got.nParagraphs == 1)
    val p = Multimodal.probeBytes(1L, bytes)
    assert(p.container == "ppt" && p.decodable)
  }

  test("named rejects: no document stream, truncated record, encrypted deck") {
    val other = Cfb.write(Seq("Workbook" -> new Array[Byte](16)))
    val e1 = intercept[IllegalArgumentException](MsPpt.extractTexts(other))
    assert(e1.getMessage.contains("no PowerPoint Document stream"))
    // truncate the stream mid-record
    val good = MsPpt.write(Seq(Seq("x")))
    val doc = Cfb.streams(good)("PowerPoint Document")
    val cut = Cfb.write(Seq("PowerPoint Document" -> doc.dropRight(1)))
    val e2 = intercept[IllegalArgumentException](MsPpt.extractTexts(cut))
    assert(e2.getMessage.contains("runs past its container"))
    // splice a CryptSession10Container record at the top level
    val crypt = Array[Byte](0x0F, 0x00, 0x14, 0x2F, 0, 0, 0, 0) ++ doc
    val enc = Cfb.write(Seq("PowerPoint Document" -> crypt))
    val e3 = intercept[IllegalArgumentException](MsPpt.extractTexts(enc))
    assert(e3.getMessage.contains("encrypted presentation"))
  }
}
