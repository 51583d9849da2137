package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class CharsetsSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("BOMs win and are stripped: utf-8, utf-16le, utf-16be") {
    val t = "héllo wörld"
    val u8 = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ utf8(t)
    assert(Charsets.decode(u8, "text/html; charset=iso-8859-1") == // BOM beats the lie
      Charsets.Decoded("utf-8", true, t))
    val le = Array(0xff, 0xfe).map(_.toByte) ++ t.getBytes("UTF-16LE")
    assert(Charsets.decode(le, "") == Charsets.Decoded("utf-16le", true, t))
    val be = Array(0xfe, 0xff).map(_.toByte) ++ t.getBytes("UTF-16BE")
    assert(Charsets.decode(be, null) == Charsets.Decoded("utf-16be", true, t))
  }

  test("declared charset: aliases resolve, quotes/params tolerated, bogus ignored") {
    assert(Charsets.declaredCharset("text/html; charset=UTF-8").contains("utf-8"))
    assert(Charsets.declaredCharset("text/html; charset=\"latin1\"").contains("iso-8859-1"))
    assert(Charsets.declaredCharset("text/html;charset=ISO-8859-1; boundary=x")
      .contains("iso-8859-1"))
    assert(Charsets.declaredCharset("text/html; charset=definitely-not-a-charset").isEmpty)
    assert(Charsets.declaredCharset("text/html").isEmpty)
    assert(Charsets.declaredCharset(null).isEmpty)
    // high-byte latin-1 under its declaration decodes cleanly and exactly
    val bytes = Array(0xe9, 0x20, 0xfc).map(_.toByte) // é ü in latin-1
    assert(Charsets.decode(bytes, "text/plain; charset=iso-8859-1") ==
      Charsets.Decoded("iso-8859-1", true, "é ü"))
  }

  test("no declaration: valid utf-8 sniffs as utf-8, invalid falls back dirty") {
    val t = "plain ascii and ünïcödé"
    assert(Charsets.decode(utf8(t), "text/html") == Charsets.Decoded("utf-8", true, t))
    // invalid utf-8: 0x80 continuation byte with no lead
    val bad = utf8("abc") ++ Array(0x80, 0x81, 0x9c).map(_.toByte)
    val d = Charsets.decode(bad, "")
    assert(d.charset == "windows-1252" && !d.clean)
    // exact windows-1252 mapping: 0x80 = euro, 0x81 = U+0081, 0x9c = oe
    assert(d.text == "abc€œ")
  }

  test("a lying declaration reports dirty instead of smuggling U+FFFD") {
    val bad = utf8("ok") ++ Array(0xc3).map(_.toByte) // truncated utf-8 sequence
    val d = Charsets.decode(bad, "text/plain; charset=utf-8")
    assert(d.charset == "windows-1252" && !d.clean)
    assert(!d.text.contains('�'))
    assert(d.text == "okÃ")
  }

  test("empty body decodes clean and empty") {
    assert(Charsets.decode(Array.empty[Byte], "") == Charsets.Decoded("utf-8", true, ""))
  }
}
