package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HtmlMetaSpec extends AnyFunSuite {

  private val base = "http://h.invalid/dir/page.html"
  private def meta(html: String) = HtmlMeta.extract(html, base)

  test("title: first wins, entities decode, whitespace collapses, markup is a boundary") {
    val m = meta("<title> Hello &amp;\n <b>world</b> </title><title>second</title>")
    assert(m.title == "Hello & world")
    assert(meta("<p>no title here</p>").title == null)
    assert(meta("<title>   </title>").title == null) // empty after collapse
  }

  test("description: first ci name=description, content decoded + collapsed") {
    val m = meta(
      """<meta NAME="Description" CONTENT=" a&nbsp;&amp;  b ">
        |<meta name="description" content="second">""".stripMargin)
    assert(m.description == "a & b")
    assert(meta("""<meta name="keywords" content="x">""").description == null)
    assert(meta("""<meta content="orphan">""").description == null)
  }

  test("robots: tokens ci + trimmed, none implies both, directives accumulate") {
    assert(meta("""<meta name="robots" content="noindex, follow">""")
      == HtmlMeta.Meta(null, null, null, true, false))
    assert(meta("""<meta name="ROBOTS" content=" NOFOLLOW ">""").nofollow)
    val both = meta("""<meta name="robots" content="none">""")
    assert(both.noindex && both.nofollow)
    val acc = meta(
      """<meta name="robots" content="noindex"><meta name="robots" content="nofollow">""")
    assert(acc.noindex && acc.nofollow)
  }

  test("canonical: rel token list, base rebase applies to LATER links only") {
    assert(meta("""<link rel="alternate canonical" href="c.html">""").canonical
      == "http://h.invalid/dir/c.html")
    assert(meta("""<link rel=CANONICAL href=/canon/1>""").canonical
      == "http://h.invalid/canon/1")
    assert(meta("""<link rel="stylesheet" href="s.css">""").canonical == null)
    // before the base: resolves against the page url; after: rebased
    assert(meta("""<link rel="canonical" href="c"><base href="/other/">""").canonical
      == "http://h.invalid/dir/c")
    assert(meta("""<base href="/other/"><link rel="canonical" href="c">""").canonical
      == "http://h.invalid/other/c")
    // non-fetchable canonical drops
    assert(meta("""<link rel="canonical" href="javascript:void(0)">""").canonical == null)
  }

  test("comments and script/style bodies are invisible to every signal") {
    val m = meta(
      """<!-- <title>no</title><meta name="robots" content="noindex"> -->
        |<script>var x = '<link rel="canonical" href="/no">';</script>
        |<title>real</title>""".stripMargin)
    assert(m == HtmlMeta.Meta("real", null, null, false, false))
  }

  test("caps: title 512 / description 1024 code points") {
    val m = meta(s"<title>${"t" * 2000}</title><meta name=description content=${"d" * 2000}>")
    assert(m.title.length == 512 && m.description.length == 1024)
  }

  test("the tx_meta_gate demo page extracts exactly as the oracle predicts") {
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 11L)) {
      val (_, html) = graft.operators.Ingest.metaPage(id)
      val m = HtmlMeta.extract(html, s"http://src${id % 20}.invalid/page/$id")
      assert(m.title == s"Doc $id — title")
      assert(m.description == s"summary $id & more")
      assert(m.canonical == (if (id % 3 == 0)
        s"http://base${id % 10}.invalid/canon/${id % 50}" else null))
      assert(m.noindex == (id % 4 == 0 || id % 4 == 2))
      assert(m.nofollow == (id % 4 == 1 || id % 4 == 2))
    }
  }

  test("total on hostile junk (never throws; caps hold)") {
    val rnd = new scala.util.Random(9091)
    val alphabet = "<>\"'=&#;/?:.%ab09 \t\nmetalinkrobots中"
    def junk(n: Int): String =
      (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 2000) {
      val m = HtmlMeta.extract(junk(rnd.nextInt(300)), base)
      if (m.title != null) assert(m.title.codePointCount(0, m.title.length) <= 512)
      if (m.canonical != null)
        assert(m.canonical.startsWith("http://") || m.canonical.startsWith("https://"))
    }
  }
}
