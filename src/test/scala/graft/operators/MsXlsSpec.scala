package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [MS-XLS] BIFF8 extraction: SST (with CONTINUE splits), cell record
  * family, sheet routing, named rejects.
  */
class MsXlsSpec extends AnyFunSuite {

  test("one sheet of strings + numbers round-trips") {
    val rows: Seq[Seq[Any]] = Seq(
      Seq("alpha", 42L, "beta"),
      Seq(3.5, "gamma — café", -7L))
    val bytes = MsXls.write(Seq("Sheet1" -> rows))
    assert(Cfb.kind(bytes).contains("xls"))
    val got = MsXls.extract(bytes)
    assert(got.sheetNames == Seq("Sheet1"))
    assert(got.text == "alpha\t42\tbeta\n3.5\tgamma — café\t-7")
  }

  test("multiple sheets keep BOUNDSHEET order and offsets") {
    val bytes = MsXls.write(Seq(
      "First" -> Seq(Seq[Any]("a", 1L)),
      "Second" -> Seq(Seq[Any]("b"), Seq[Any](2L)),
      "Third" -> Seq(Seq[Any](true, false))))
    val got = MsXls.extract(bytes)
    assert(got.sheetNames == Seq("First", "Second", "Third"))
    assert(got.text == "a\t1\nb\n2\nTRUE\tFALSE")
  }

  test("SST CONTINUE split resumes mid-string behind a fresh width flag") {
    // force tiny records so strings split across several CONTINUEs,
    // including a narrow->narrow split and a wide string split
    val long1 = "n" * 50 + " end of narrow"
    val wide = "日" * 30 + "語 tail"
    val mixed = "ascii-head-" + "漢" * 20
    val bytes = MsXls.write(
      Seq("S" -> Seq(Seq[Any](long1, wide, mixed))), maxRecordBytes = 32)
    val got = MsXls.extract(bytes)
    assert(got.cells.map(_.text) == Seq(long1, wide, mixed))
  }

  test("shared strings dedup through the SST (two cells, one entry)") {
    val bytes = MsXls.write(Seq("S" -> Seq(
      Seq[Any]("same", "same"), Seq[Any]("same"))))
    val got = MsXls.extract(bytes)
    assert(got.cells.map(_.text) == Seq("same", "same", "same"))
  }

  test("RK lanes: integers, x100 floats via NUMBER fallback") {
    val bytes = MsXls.write(Seq("S" -> Seq(
      Seq[Any](0L, -1L, 536870911L, -536870912L, 2.25, 1e20))))
    val got = MsXls.extract(bytes)
    assert(got.cells.map(_.text) ==
      Seq("0", "-1", "536870911", "-536870912", "2.25", "1.0E20"))
  }

  test("BIFF5 Book stream: inline byte-string labels round-trip") {
    val rows: Seq[Seq[Any]] = Seq(Seq("legacy95", 7L), Seq(2.5, "café"))
    val bytes = MsXls.write5(Seq("Old" -> rows, "Two" -> Seq(Seq[Any](1L))))
    assert(Cfb.kind(bytes).contains("xls"))
    val got = MsXls.extract(bytes)
    assert(got.sheetNames == Seq("Old", "Two"))
    assert(got.text == "legacy95\t7\n2.5\tcafé\n1")
    // wide chars cannot ride BIFF5 byte strings
    intercept[IllegalArgumentException](
      MsXls.write5(Seq("S" -> Seq(Seq[Any]("日本")))))
  }

  test("named rejects: no Workbook stream, damaged BIFF5, FILEPASS, non-xls OLE") {
    val doc = MsDoc.write(Seq("not a workbook"))
    val e1 = intercept[IllegalArgumentException](MsXls.extract(doc))
    assert(e1.getMessage.contains("no Workbook stream"))
    val damaged5 = Cfb.write(Seq("Book" -> new Array[Byte](16)))
    val e2 = intercept[IllegalArgumentException](MsXls.extract(damaged5))
    assert(e2.getMessage.contains("no BOF"))
    // splice a FILEPASS record right after the globals BOF
    val good = MsXls.write(Seq("S" -> Seq(Seq[Any]("x"))))
    val wb = Cfb.streams(good)("Workbook")
    val bofLen = 4 + (((wb(2) & 0xff) | ((wb(3) & 0xff) << 8)))
    val filepass = Array[Byte](0x2F, 0x00, 0x02, 0x00, 0x01, 0x00)
    val spliced = wb.take(bofLen) ++ filepass ++ wb.drop(bofLen)
    val e3 = intercept[IllegalArgumentException](
      MsXls.extract(Cfb.write(Seq("Workbook" -> spliced))))
    assert(e3.getMessage.contains("FILEPASS"))
  }

  test("office routing: extractText takes .xls through the BIFF walk") {
    val bytes = MsXls.write(Seq("S" -> Seq(Seq[Any]("routed", 9L))))
    val got = OfficeCodec.extractText(bytes)
    assert(got.format == "xls")
    assert(got.text == "routed\t9")
  }
}
