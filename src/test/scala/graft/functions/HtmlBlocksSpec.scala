package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HtmlBlocksSpec extends AnyFunSuite {

  private def blocks(html: String) = HtmlBlocks.extract(html)

  test("block-level opens and closes both flush; empty blocks drop") {
    val html = "<div>alpha beta</div>\n<p>gamma</p><p></p><div>  </div><h2>delta</h2>"
    val bs = blocks(html)
    assert(bs.map(b => (b.idx, b.tag, b.text)) == Seq(
      (0, "div", "alpha beta"), (1, "p", "gamma"), (2, "h2", "delta")))
  }

  test("tag is the block element in effect at the first char; body outside") {
    val bs = blocks("loose text<p>para</p>trailing")
    assert(bs.map(b => (b.tag, b.text)) == Seq(
      ("body", "loose text"), ("p", "para"), ("body", "trailing")))
  }

  test("non-block tags are word boundaries inside one block") {
    val bs = blocks("<p>a<b>b</b>c<br>d</p>")
    assert(bs.map(_.text) == Seq("a b c d"))
    assert(bs.head.nChars == 7)
  }

  test("link chars count non-space code points inside <a> only") {
    val bs = blocks("""<p><a href="/x">menu link</a> plain</p>""")
    assert(bs.map(b => (b.text, b.nChars, b.nLinkChars)) ==
      Seq(("menu link plain", 15, 8)))
  }

  test("comments and script/style bodies produce no blocks") {
    val html = "<!-- <p>no</p> --><script>var p = '<p>no</p>';</script><p>yes</p>"
    assert(blocks(html).map(_.text) == Seq("yes"))
  }

  test("entities decode; n_chars counts code points not UTF-16 units") {
    val bs = blocks("<p>a&amp;b</p><p>😀x</p>")
    assert(bs.map(b => (b.text, b.nChars)) == Seq(("a&b", 3), ("😀x", 2)))
  }

  test("anchor state does not leak across blocks") {
    // unterminated <a> in one block must not mark the next block as linked
    val bs = blocks("""<p><a href="/x">all link</p><p>free text</p>""")
    assert(bs.map(b => (b.text, b.nLinkChars)) ==
      Seq(("all link", 7), ("free text", 0)))
  }

  test("blocks are a PARTITION of html_to_text: space-join reconstructs it") {
    // block tags are word boundaries to html_to_text and flush points to
    // html_blocks — so the block texts joined on single spaces must be
    // exactly the html_to_text extraction, on any input. This coherence
    // holds by construction (same scanner semantics) and pins the two
    // expressions against each other the way the oracles pin both.
    val rnd = new scala.util.Random(86420)
    val alphabet = "<>\"'=&#;/?:.%abAB09 \t\n-_pdivh12a中!"
    def junk(n: Int): String =
      (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    val crafted = Seq(
      "", "plain", "<p>a</p><div>b</div>", "a<p>b", "<table><tr><td>x</td></tr></table>",
      "<h1>t</h1>body<script>s</script><p>p</p>", "<!-- c --><p>x</p>",
      "&amp;<p>&lt;</p>", "<" * 500, "<p" + " " * 100 + ">deep</p>")
    for (s <- crafted ++ (0 until 2000).map(_ => junk(rnd.nextInt(300)))) {
      val joined = HtmlBlocks.extract(s).map(_.text).mkString(" ")
      assert(joined == HtmlToText.extract(s), s"diverged on: ${s.take(120)}")
    }
  }

  test("total on hostile junk: measurements consistent, never throws") {
    val rnd = new scala.util.Random(3049)
    val alphabet = "<>\"'=&#;/?:.%abAB09 \t\n-_pdivh1a中😀!"
    def junk(n: Int): String =
      (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 2000) {
      val bs = HtmlBlocks.extract(junk(rnd.nextInt(300)))
      bs.zipWithIndex.foreach { case (b, i) =>
        assert(b.idx == i)
        assert(b.text.nonEmpty)
        assert(b.nChars == b.text.codePointCount(0, b.text.length))
        assert(b.nLinkChars >= 0 && b.nLinkChars <= b.nChars)
      }
    }
  }
}
