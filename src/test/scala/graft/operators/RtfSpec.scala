package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class RtfSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  test("roundtrip: paragraphs, tabs, inner breaks, specials, cp1252, unicode") {
    val paras = Seq(
      "Plain text",
      "specials: \\ { } and more",
      "tab\there\nbreak there",
      "cp1252: café — ‘quotes’ €",
      "beyond: Ж日本語")
    val bytes = Rtf.write(paras)
    assert(Rtf.isRtf(bytes))
    assert(Rtf.extractText(bytes) == paras.mkString("\n"))
  }

  test("fonttbl/colortbl/stylesheet/info and starred destinations are skipped") {
    val doc = "{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red0;}" +
      "{\\stylesheet{\\s0 Normal;}}{\\info{\\author Nobody}}" +
      "{\\*\\generator Ghost 1.0;}visible\\par also visible}"
    assert(Rtf.extractText(ascii(doc)) == "visible\nalso visible")
  }

  test("field results are kept, field instructions are not") {
    val doc = "{\\rtf1 before {\\field{\\*\\fldinst HYPERLINK \"http://x\"}" +
      "{\\fldrslt the link text}} after}"
    assert(Rtf.extractText(ascii(doc)) == "before the link text after")
  }

  test("\\uN with \\ucN fallback skipping; typographic control words") {
    // \uc1: one fallback char after each \u to swallow
    assert(Rtf.extractText(ascii("{\\rtf1\\uc1 a\\u8364 ?b}")) == "a€b")
    // \uc2 swallows two
    assert(Rtf.extractText(ascii("{\\rtf1\\uc2 \\u26085 ??x}")) == "日x")
    // negative N wraps per the signed-16-bit rule
    assert(Rtf.extractText(ascii("{\\rtf1\\uc0 \\u-3977 }")) == "")
    assert(Rtf.extractText(ascii("{\\rtf1 x\\emdash y\\rquote z\\bullet w}")) ==
      "x—y’z•w")
  }

  test("\\bin raw runs are skipped by length (binary never parses)") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii("{\\rtf1 pre\\bin5 "))
    out.write(Array[Byte]('{', '\\', 'x', 0, '}')) // hostile raw bytes
    out.write(ascii("post}"))
    assert(Rtf.extractText(out.toByteArray) == "prepost")
  }

  test("pict destination and raw EOLs contribute no text") {
    val doc = "{\\rtf1 a{\\pict\\wmetafile8 0102abcd}\r\nb}"
    assert(Rtf.extractText(ascii(doc)) == "ab")
  }

  test("named rejects: not rtf, unbalanced groups, bad escapes, deep nesting") {
    intercept[IllegalArgumentException](Rtf.extractText(ascii("plain text")))
    intercept[IllegalArgumentException](Rtf.extractText(ascii("{\\rtf1 a")))
    intercept[IllegalArgumentException](Rtf.extractText(ascii("{\\rtf1 a}}")))
    intercept[IllegalArgumentException](Rtf.extractText(ascii("{\\rtf1 \\'zq}")))
    intercept[IllegalArgumentException](Rtf.extractText(ascii("{\\rtf1 \\bin99 x}")))
    val bomb = "{" * 200 + "\\rtf1" // also not-rtf, but nesting trips first on real prefix
    intercept[IllegalArgumentException](
      Rtf.extractText(ascii("{\\rtf1 " + "{" * 200 + "}" * 200 + "}")))
  }

  test("property sweep: deterministic pseudo-random text roundtrips") {
    // full cp1252 range + BMP unicode, seeds varied — every writer escape
    // path (literal, \{}, \tab, \line, \'xx, \uN) exercised in one sweep
    val interesting = "aZ09 \\{}\ttab\nà€‘—ƒ™ŽüЖ日本語…§¶\u2028e"
    for (seed <- 0 until 24) {
      val len = 1 + (seed * 7) % 40
      val text = (0 until len).map { i =>
        interesting(((seed + 3) * 31 + i * 17) % interesting.length)
      }.mkString.replace("\n", "x") // paragraph bodies: \n tested separately
      val paras = Seq(text + "end", s"p2 of $seed")
      assert(Rtf.extractText(Rtf.write(paras)) == paras.mkString("\n"), s"seed=$seed")
    }
  }

  test("writer validates the framing contract") {
    intercept[IllegalArgumentException](Rtf.write(Nil))
    intercept[IllegalArgumentException](Rtf.write(Seq("ok", "")))
    intercept[IllegalArgumentException](Rtf.write(Seq("trailing\n")))
  }

  // ---------------------------------------------- \uN fallback-skip (r11 advice)

  test("\\uN fallback skip consumes only literal text and \\'xx, not control output") {
    // '\u8364\par b': no fallback char was written — the \par break must
    // survive, not be swallowed as the pending fallback
    assert(Rtf.extractText(ascii("{\\rtf1 a\\u8364\\par b}")) == "a€\nb")
    // a literal fallback char IS swallowed
    assert(Rtf.extractText(ascii("{\\rtf1 \\u8364 ?x}")) == "€x")
    // a \'xx fallback byte is swallowed too
    assert(Rtf.extractText(ascii("{\\rtf1 \\u8364\\'80y}")) == "€y")
    // styling control words neither consume nor reset: the fallback after
    // them is still skipped
    assert(Rtf.extractText(ascii("{\\rtf1 \\u8364\\f1 ?z}")) == "€z")
  }

  test("\\uN fallback skip resets at group boundaries") {
    // the skip cannot leak out of the group where \uN appeared
    assert(Rtf.extractText(ascii("{\\rtf1 {\\u8364}? end}")) == "€? end")
    assert(Rtf.extractText(ascii("{\\rtf1 \\u8364{?} end}")) == "€? end")
  }
}
