package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_blocks(html)` -> ARRAY<STRUCT<idx INT, tag STRING, text STRING,
  * n_chars INT, n_link_chars INT>>: block segmentation of an HTML capture —
  * the measurement half of jusText-style boilerplate removal (Pomikálek
  * 2011, the algorithm behind the standard crawl content extractors).
  * The expression only SEGMENTS and MEASURES; the classification policy
  * (link-density/length thresholds, neighbor smoothing) stays declarative
  * Spark SQL in [[graft.operators.TextAnalysis.extractMainText]], where
  * Catalyst can see and the DuckDB oracle can replay it.
  *
  * Segmentation rules (deterministic, one pass, crawl-grade — tag
  * boundaries follow the same `<[^>]*>` regex semantics as
  * [[HtmlToText]], not a browser DOM):
  *
  *  1. Text accumulates with [[HtmlToText]] semantics: comments and
  *     `<script>`/`<style>` bodies dropped, any non-block tag is a word
  *     boundary, entities decode, ASCII whitespace runs collapse, ends
  *     trimmed.
  *  2. An open OR close tag of a BLOCK-LEVEL element (p, div, h1-h6,
  *     ul/ol/li, dl/dt/dd, table/thead/tbody/tr/td/th, blockquote, pre,
  *     article, section, header, footer, nav, aside, main, figure,
  *     figcaption, form, fieldset, hr, title, body, html) flushes the
  *     accumulated text as one block. Empty blocks are dropped.
  *  3. A block's `tag` is the block-level element in effect when its first
  *     character was emitted ("body" before any block tag, and again after
  *     a block-level close — no DOM stack, same flat model as jusText's
  *     paragraph maker).
  *  4. `n_chars` counts the block text's code points (collapse spaces
  *     included); `n_link_chars` counts non-space code points emitted
  *     while inside an `<a>` element — `1000 * n_link_chars / n_chars`
  *     is the jusText link-density permille, exact integer arithmetic
  *     any engine replays. Anchor state resets at every block boundary
  *     (link density is a per-block measure, and an unterminated `<a>`
  *     on a malformed page must not mark the rest of the page linked).
  *
  * Scale shape: map-only scalar; a page explodes into blocks totaling the
  * page's text (same output volume as `html_to_text`), and the downstream
  * filter drops boilerplate blocks before anything shuffles.
  */
case class HtmlBlocks(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(HtmlBlocks.elementType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val blocks = HtmlBlocks.extract(v.asInstanceOf[UTF8String].toString)
    new GenericArrayData(blocks.map { b =>
      InternalRow(b.idx, UTF8String.fromString(b.tag),
        UTF8String.fromString(b.text), b.nChars, b.nLinkChars)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): HtmlBlocks = copy(child = c)
  override def prettyName: String = "html_blocks"
}

object HtmlBlocks {

  import HtmlToText.{entityAt, isAsciiSpace, isOpenTag, closeTagEnd}

  val elementType: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_link_chars", IntegerType, nullable = false)))

  final case class Block(idx: Int, tag: String, text: String, nChars: Int, nLinkChars: Int)

  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tr", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer",
    "nav", "aside", "main", "figure", "figcaption", "form", "fieldset",
    "hr", "title", "body", "html")

  def extract(html: String): Seq[Block] = {
    val s = html
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sb = new java.lang.StringBuilder(256)
    var pendingSpace = false
    var linkChars = 0
    var inAnchor = false
    var inEffectTag = "body" // block element currently in effect
    var blockTag = "body"    // inEffectTag captured at the block's first char
    var idx = 0
    val lastGt = s.lastIndexOf('>') // see HtmlToText: keeps hostile '<' runs linear

    def emit(cp: Int): Unit = {
      if (cp < 0x80 && isAsciiSpace(cp.toChar)) pendingSpace = true
      else {
        if (sb.length == 0) blockTag = inEffectTag
        else if (pendingSpace) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
        if (inAnchor) linkChars += 1
      }
    }

    def flush(): Unit = {
      if (sb.length > 0) {
        val text = sb.toString
        out += Block(idx, blockTag, text, text.codePointCount(0, text.length), linkChars)
        idx += 1
        sb.setLength(0)
      }
      linkChars = 0
      pendingSpace = false
      // anchors do not span blocks: link density is measured per block
      // (jusText's per-paragraph model), and an unterminated `<a>` on a
      // malformed page must not mark everything after it as linked
      inAnchor = false
    }

    /** Lowercased element name at a tag start, or null when `<` is not
      * followed by `[/]?[A-Za-z][A-Za-z0-9]*` (ASCII only — h1-h6 carry a
      * digit; Unicode letters never start a real HTML element).
      */
    def tagName(at: Int): String = {
      def letter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      def digit(c: Char) = c >= '0' && c <= '9'
      var j = at + 1
      if (j < n && s.charAt(j) == '/') j += 1
      val ns = j
      if (j >= n || !letter(s.charAt(j))) return null
      j += 1
      while (j < n && (letter(s.charAt(j)) || digit(s.charAt(j))) && j - ns < 12) j += 1
      s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 3 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingSpace = true
        } else if (isOpenTag(s, i, "script")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else { val e = closeTagEnd(s, gt + 1, "script"); i = if (e < 0) n else e }
          pendingSpace = true
        } else if (isOpenTag(s, i, "style")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else { val e = closeTagEnd(s, gt + 1, "style"); i = if (e < 0) n else e }
          pendingSpace = true
        } else if (i > lastGt) {
          emit('<'); i += 1 // no '>' remains: literal text, regex semantics
        } else {
          val name = tagName(i)
          val isClose = i + 1 < n && s.charAt(i + 1) == '/'
          val gt = s.indexOf('>', i) // exists — i <= lastGt
          if (name != null && blockTags.contains(name)) {
            flush()
            inEffectTag = if (isClose) "body" else name
          } else if (name == "a") {
            inAnchor = !isClose
          }
          i = gt + 1
          pendingSpace = true
        }
      } else if (c == '&') {
        val e = entityAt(s, i)
        if (e == null) { emit('&'); i += 1 }
        else { emit(e._1); i += e._2 }
      } else {
        val cp = s.codePointAt(i)
        emit(cp)
        i += Character.charCount(cp)
      }
    }
    flush()
    out.toSeq
  }
}
