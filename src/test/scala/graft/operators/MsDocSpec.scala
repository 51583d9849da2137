package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** [MS-CFB] container walk + [MS-DOC] piece-table extraction. */
class MsDocSpec extends AnyFunSuite {

  test("cfb: streams round-trip through mini AND regular sectors") {
    val small = "tiny stream".getBytes(StandardCharsets.US_ASCII)
    val big = Array.tabulate(5000)(i => (i % 251).toByte) // >= 4096: regular
    val bytes = Cfb.write(Seq("Small" -> small, "BigStream" -> big))
    assert(Cfb.isCfb(bytes))
    val back = Cfb.streams(bytes)
    assert(back.keySet == Set("Small", "BigStream"))
    assert(back("Small").sameElements(small))
    assert(back("BigStream").sameElements(big))
  }

  test("cfb: kind() routes doc/xls/ppt/encrypted-ooxml on stream names") {
    def withStream(n: String) = Cfb.write(Seq(n -> Array[Byte](1, 2, 3)))
    assert(Cfb.kind(withStream("WordDocument")).contains("doc"))
    assert(Cfb.kind(withStream("Workbook")).contains("xls"))
    assert(Cfb.kind(withStream("PowerPoint Document")).contains("ppt"))
    assert(Cfb.kind(withStream("EncryptedPackage")).contains("encrypted-ooxml"))
    assert(Cfb.kind(withStream("Whatever")).isEmpty)
    // a bare header (the old fixture shape) is damaged, not a kind
    val bare = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte,
      0xA1.toByte, 0xB1.toByte, 0x1A, 0xE1.toByte) ++ new Array[Byte](64)
    assert(Cfb.kind(bare).isEmpty)
    intercept[IllegalArgumentException](Cfb.streams(bare))
  }

  test("doc: ascii-only text round-trips through one compressed piece") {
    val paras = Seq("Hello legacy Word", "tab\there", "last para (plain)")
    val bytes = MsDoc.write(paras)
    assert(MsDoc.isDoc(bytes))
    assert(MsDoc.extractText(bytes) == paras.mkString("\n"))
  }

  test("doc: cp1252 + wide chars round-trip through BOTH piece lanes") {
    // em dash and café are cp1252; the CJK char forces the UTF-16 piece
    val paras = Seq("Mixed doc 7 — café 3", "unicode tail: 日本語 end")
    val bytes = MsDoc.write(paras)
    assert(MsDoc.extractText(bytes) == paras.mkString("\n"))
    // and a pure-cp1252 doc stays one compressed piece
    val pure = MsDoc.write(Seq("Mixed doc 7 — café 3"))
    assert(MsDoc.extractText(pure) == "Mixed doc 7 — café 3")
  }

  test("doc: wide-only text round-trips through one UTF-16 piece") {
    val paras = Seq("Ж начало", "日本語テキスト")
    // first char of the TEXT is wide -> single uncompressed piece
    assert(MsDoc.extractText(MsDoc.write(paras)) == paras.mkString("\n"))
  }

  test("doc: named rejects for non-doc OLE, bad FIB, pre-Word-97") {
    val noWord = Cfb.write(Seq("Workbook" -> new Array[Byte](16)))
    val e1 = intercept[IllegalArgumentException](MsDoc.extractText(noWord))
    assert(e1.getMessage.contains("no WordDocument stream"))
    val good = MsDoc.write(Seq("x"))
    // corrupt nFib to a pre-97 value AND point fcMac past the stream:
    // the non-complex pre-97 path must bounds-reject, not read garbage
    val strs = Cfb.streams(good)
    val wd = strs("WordDocument").clone()
    wd(2) = 0x65; wd(3) = 0x00 // nFib 0x0065: Word 6
    wd(0x1C) = 0xFF.toByte; wd(0x1D) = 0xFF.toByte // fcMac >> stream length
    val old = Cfb.write(Seq("WordDocument" -> wd, "1Table" -> strs("1Table")))
    val e2 = intercept[IllegalArgumentException](MsDoc.extractText(old))
    assert(e2.getMessage.contains("outside the WordDocument stream"))
  }

  test("office: extractText routes real .doc through the CFB walk") {
    val doc = MsDoc.write(Seq("Routed through OfficeCodec"))
    val got = OfficeCodec.extractText(doc)
    assert(got.format == "doc")
    assert(got.text == "Routed through OfficeCodec")
    assert(got.nParagraphs == 1)
    // a damaged xls routes to the BIFF walk and rejects namedly there
    val xls = Cfb.write(Seq("Workbook" -> new Array[Byte](16)))
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(xls))
    assert(e.getMessage.contains("xls: Workbook stream has no BOF"))
    // an OLE container with no known document stream keeps the office reject
    val alien = Cfb.write(Seq("Mystery" -> new Array[Byte](16)))
    val e2 = intercept[IllegalArgumentException](OfficeCodec.extractText(alien))
    assert(e2.getMessage.startsWith("office:"))
  }

  test("word 6/95 non-complex: cp1252 run at [fcMin, fcMac) round-trips") {
    val paras = Seq("Ancient Word file", "tab\there — café", "done (1995)")
    val bytes = MsDoc.write95(paras)
    assert(MsDoc.isDoc(bytes))
    assert(MsDoc.extractText(bytes) == paras.mkString("\n"))
    // wide chars cannot ride the 8-bit run
    intercept[IllegalArgumentException](MsDoc.write95(Seq("\u65e5")))
  }

  test("word 6/95 fast-saved (fComplex) is a named reject") {
    val good = MsDoc.write95(Seq("x"))
    val wd = Cfb.streams(good)("WordDocument").clone()
    wd(0x0A) = (wd(0x0A) | 0x04).toByte // set fComplex
    val bad = Cfb.write(Seq("WordDocument" -> wd))
    val e = intercept[IllegalArgumentException](MsDoc.extractText(bad))
    assert(e.getMessage.contains("fast-saved"))
  }
}
