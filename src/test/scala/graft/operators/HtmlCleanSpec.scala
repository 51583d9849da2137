package graft.operators

import graft.functions.HtmlToText
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** html_to_text + nfc_normalize/unicodeClean: the native single-pass
  * expressions against (a) hand-written goldens that define the edge-case
  * semantics and (b) the builtin-composed regex-chain formulation the DuckDB
  * oracle mirrors — on well-formed pages the two must agree byte-for-byte.
  */
class HtmlCleanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def x(html: String): String = HtmlToText.extract(html)

  // ---- golden semantics ----

  test("tags become word boundaries; whitespace collapses; ends trimmed") {
    assert(x("<p>a</p><p>b</p>") == "a b")
    assert(x("a<br>b") == "a b")
    assert(x("  <div> hello \n\t world </div> ") == "hello world")
    assert(x("<em>in</em>line") == "in line") // boundary is a documented choice
  }

  test("comments and script/style bodies removed, including markup inside") {
    assert(x("a<!-- <b>hidden</b> -->c") == "a c")
    assert(x("""a<script>var s = "</p>" && 1 < 2;</script>b""") == "a b")
    assert(x("a<style>p { content: '>'; }</style>b") == "a b")
    assert(x("a<SCRIPT TYPE=\"x\">s</SCRIPT>b") == "a b") // ci tag names
    assert(x("a<scripting>b</scripting>c") == "a b c")    // not a script tag
    assert(x("a<script src=\"x\"/>b</script>c") == "a c") // attrs on open tag
  }

  test("HTML5 EOF rules: unterminated constructs") {
    assert(x("a<!-- never closed") == "a")
    assert(x("a<script>var x = 1;") == "a")
    assert(x("a<style>p{}") == "a")
    assert(x("a<div never closed") == "a<div never closed") // '<' w/o '>': literal
    assert(x("1 < 2 but > ok") == "1 ok") // '< 2 but >' parses as a tag, same as the oracle regex
  }

  test("entities: named, numeric, unknown, no re-scan of decoded markup") {
    assert(x("&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;") == "<tag> & \"q\" 'a'")
    assert(x("x&nbsp;y") == "x y")              // nbsp folds to plain space
    assert(x("&#65;&#x42;&#x1F600;") == "AB" + new String(Character.toChars(0x1F600)))
    assert(x("&ndash; &unknown; &amp") == "\u2013 &unknown; &amp")
    assert(x("&eacute;&hellip;&copy;") == "\u00E9\u2026\u00A9") // crawl-set names
    assert(x("&amp;lt;") == "&lt;")             // single decode, no cascade
    assert(x("&lt;script&gt;alert(1)&lt;/script&gt;") == "<script>alert(1)</script>")
    assert(x("&#0;&#xD800;&#1114112;") == "&#0;&#xD800;&#1114112;") // invalid cps literal
  }

  test("unicode text passes through; only ASCII whitespace collapses") {
    assert(x("<p>café 中文</p>") == "café 中文")
    assert(x("a\u00A0b") == "a\u00A0b") // U+00A0 is not in the collapse class
  }

  // ---- equivalence with the regex-chain formulation (= the DuckDB oracle) ----

  private def chain(html: org.apache.spark.sql.Column) = {
    val t0 = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val t1 = regexp_replace(t0, "(?s)<style[^>]*>.*?</style>", " ")
    val t2 = regexp_replace(t1, "(?s)<!--.*?-->", " ")
    val t3 = regexp_replace(t2, "<[^>]*>", " ")
    val d = Seq("&#8212;" -> "—", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(t3) { case (c, (e, r)) => regexp_replace(c, java.util.regex.Pattern.quote(e), r) }
    trim(regexp_replace(d, "[ \t\n\r\f\u000B]+", " "))
  }

  test("native expression == regex chain on the contract query's page shape") {
    import spark.implicits._
    val texts = Seq(
      "plain words only",
      "with & ampersand < less-than > greater",
      "unicode café 中文 and tabs\there",
      "entity-looking strings &amp; &#8212; &lt;b&gt; inside text",
      "multi\n\nline\r\nwith   runs\u000Band\ffeeds",
      "")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"src$i") }
      .toDF("doc_id", "text", "source")
    val esc = regexp_replace(regexp_replace(col("text"), "&", "&amp;"), "<", "&lt;")
    val html = concat(
      lit("<html><head><title>doc</title><style type=\"text/css\">p { color: #333; }</style></head><body><!-- id "),
      col("doc_id").cast("string"),
      lit(" --><h1>"), col("source"),
      lit("</h1>\n<p>"), esc,
      lit("</p><script type=\"text/javascript\">var n = 1 < 2 && \"</p>\";</script><div>&quot;fin&quot;&nbsp;&#8212;&nbsp;ok</div></body></html>"))
    val rows = d.select(
        TextAnalysis.htmlToText(html).as("native"), chain(html).as("chain"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // and the visible text actually survived extraction
    val first = d.orderBy("doc_id").select(TextAnalysis.htmlToText(html)).head.getString(0)
    assert(first == "doc src0 plain words only \"fin\" — ok")
  }

  test("null propagates; non-string input rejected at analysis") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("h")
      .select(TextAnalysis.htmlToText(col("h"))).head
    assert(r.isNullAt(0))
    intercept[Exception] {
      Seq(1).toDF("h").select(TextAnalysis.htmlToText(col("h"))).head
    }
  }

  // ---- nfc_normalize / unicodeClean ----

  test("NFC: composition, singletons, idempotence, fast path") {
    import spark.implicits._
    val decomposed = "Cafe\u0301 \u212B A\u030A"
    val got = Seq(decomposed).toDF("t")
      .select(TextAnalysis.nfcNormalize(col("t"))).head.getString(0)
    assert(got == "Café Å Å")
    val again = Seq(got).toDF("t")
      .select(TextAnalysis.nfcNormalize(col("t"))).head.getString(0)
    assert(again == got)
    assert(java.text.Normalizer.isNormalized(got, java.text.Normalizer.Form.NFC))
  }

  test("unicodeClean strips C0/DEL but keeps tab, newline, CR") {
    import spark.implicits._
    val messy = "a\u0000b\u0007c\td\ne\rf\u007Fg\u001Fh"
    val got = Seq(messy).toDF("t")
      .select(TextAnalysis.unicodeClean(col("t"))).head.getString(0)
    assert(got == "abc\td\ne\rfgh")
  }
}
