package graft.operators

import graft.functions.HtmlToText
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: on GENERATED well-formed pages (the shapes a
  * serializer emits — balanced tags, terminated comments/scripts, escaped
  * body text), the single-pass state machine must agree byte-for-byte with
  * the regex/REPLACE chain the DuckDB oracle runs. Fixed seeds, pure JVM
  * (no session) — hundreds of pages per run.
  */
class HtmlPropertySpec extends AnyFunSuite {

  private val words = Array("the", "quick", "brown", "fox", "café", "中文",
    "1", "<", ">", "&", "\"", "'", "magpie", "footer", "x&y", "a<b")
  private val entities = Array("&amp;", "&lt;", "&gt;", "&quot;", "&apos;",
    "&nbsp;", "&#65;", "&#x42;", "&ndash;", "&mdash;", "&hellip;",
    "&eacute;", "&copy;", "&euro;", "&frac12;", "&bogus;", "&nosuchone;")
  private val ws = Array(" ", "  ", "\t", "\n", "\r\n", "\f", "")
  private val tagPool = Array("p", "div", "span", "h1", "li", "em", "br")

  /** Escaped text run: raw & and < replaced exactly like the contract
    * query's serializer (& first, then <).
    */
  private def textRun(r: scala.util.Random): String = {
    val n = 1 + r.nextInt(6)
    val raw = Seq.fill(n)(words(r.nextInt(words.length)))
      .mkString(ws(r.nextInt(ws.length)))
    raw.replace("&", "&amp;").replace("<", "&lt;")
  }

  private def page(r: scala.util.Random): String = {
    val sb = new StringBuilder("<html><body>")
    val parts = 3 + r.nextInt(10)
    for (_ <- 0 until parts) r.nextInt(7) match {
      case 0 =>
        val t = tagPool(r.nextInt(tagPool.length))
        sb.append(s"<$t>").append(textRun(r)).append(s"</$t>")
      case 1 => sb.append("<!-- ").append(textRun(r)).append(" -->")
      case 2 => sb.append("<script type=\"a\">var x = 1 < 2 && \"</p>\";</script>")
      case 3 => sb.append("<style>p { c: '>'; }</style>")
      case 4 => sb.append(entities(r.nextInt(entities.length)))
      case 5 => sb.append(textRun(r))
      case 6 => sb.append("<br/>").append(ws(r.nextInt(ws.length)))
    }
    sb.append("</body></html>").toString
  }

  /** The oracle's regex/REPLACE chain, executed with Java regex (the spec
    * already pins Java-vs-DuckDB parity on the contract query's shape).
    */
  private def chain(html: String): String = {
    var t = html
    t = t.replaceAll("(?s)<script[^>]*>.*?</script>", " ")
    t = t.replaceAll("(?s)<style[^>]*>.*?</style>", " ")
    t = t.replaceAll("(?s)<!--.*?-->", " ")
    t = t.replaceAll("<[^>]*>", " ")
    for ((e, d) <- Seq("&#65;" -> "A", "&#x42;" -> "B", "&ndash;" -> "\u2013",
        "&mdash;" -> "\u2014", "&hellip;" -> "\u2026", "&eacute;" -> "\u00E9",
        "&copy;" -> "\u00A9", "&euro;" -> "\u20AC", "&frac12;" -> "\u00BD",
        "&lt;" -> "<",
        "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'", "&nbsp;" -> " ",
        "&amp;" -> "&"))
      t = t.replace(e, d)
    t.replaceAll("[ \t\n\r\f]+", " ").trim
  }

  test("native == regex chain on 500 generated well-formed pages") {
    for (seed <- 0 until 500) {
      val r = new scala.util.Random(seed)
      val html = page(r)
      val native = HtmlToText.extract(html)
      val viaChain = chain(html)
      assert(native == viaChain,
        s"seed=$seed\nhtml=$html\nnative=$native\nchain=$viaChain")
    }
  }

  test("adversarial '<' floods stay linear (no quadratic tail rescans)") {
    val junk = "<" * 1000000 // binary-blob shape: no '>' anywhere
    val t0 = System.nanoTime()
    assert(HtmlToText.extract(junk) == junk)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000, s"1MB of '<' took $ms ms — quadratic rescans are back")
    // mixed: a real page followed by a gt-less tail
    val mixed = "<p>ok</p>" + "<" * 200000
    val t1 = System.nanoTime()
    assert(HtmlToText.extract(mixed) == "ok " + "<" * 200000)
    assert((System.nanoTime() - t1) / 1e6 < 1000)
  }

  test("extraction never emits markup or collapsible whitespace runs") {
    for (seed <- 500 until 700) {
      val r = new scala.util.Random(seed)
      val out = HtmlToText.extract(page(r))
      assert(!out.contains("  "), s"seed=$seed: double space in '$out'")
      assert(!out.exists(c => c == '\t' || c == '\n' || c == '\r' || c == '\f'),
        s"seed=$seed: raw whitespace in '$out'")
      assert(!out.startsWith(" ") && !out.endsWith(" "), s"seed=$seed: untrimmed '$out'")
      assert(!out.toLowerCase.contains("<script"), s"seed=$seed: script leaked '$out'")
    }
  }
}
