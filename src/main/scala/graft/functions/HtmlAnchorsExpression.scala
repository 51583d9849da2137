package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_anchors(html, base_url)` -> ARRAY<STRUCT<url STRING, text STRING>>:
  * the `<a href>` targets of an HTML capture WITH their anchor text — the
  * input of an anchor-text index (per-target aggregation of what OTHER
  * pages call a URL), the classic web-corpus relevance/quality signal the
  * plain outlink edge list cannot provide.
  *
  * URL rules are [[HtmlOutlinks]]'s verbatim (same scanner helpers: comment/
  * script/style skip, first-href attribute grammar, entity decode + WHATWG
  * cleanup, first-`<base href>` rebase, RFC 3986 resolution, http/https
  * only) — `transform(html_anchors(h, b), a -> a.url)` is exactly
  * `html_outlinks(h, b)`, and `HtmlAnchorsSpec` pins that equivalence.
  *
  * Anchor TEXT rules (deterministic, single forward look from the open
  * tag's `>`; the main scan does not move, so links nested in a
  * malformed anchor region are still found):
  *
  *  1. The text region ends at the first `</a>` close tag, or at the next
  *     `<a>` open tag (HTML can't nest anchors — a new `<a>` implicitly
  *     closes the current one), or at end of input.
  *  2. Within the region, [[HtmlToText]] semantics apply: comments and
  *     `<script>`/`<style>` bodies are dropped, any other tag is a word
  *     boundary, entities decode (`&nbsp;` -> space), ASCII whitespace
  *     runs collapse to one space, ends trimmed.
  *  3. The text is capped at [[HtmlAnchors.MaxTextChars]] code points —
  *     a page-sized run of text inside an unterminated `<a>` must not
  *     turn an edge row into a page row (the edge shuffle stays tens of
  *     bytes per link at 100 TB).
  *
  * Scale shape: map-only scalar over the capture scan, one pass + bounded
  * per-anchor lookahead; output carries URLs and short labels only, never
  * the HTML.
  */
case class HtmlAnchors(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING html, STRING base_url), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(HtmlAnchors.elementType, containsNull = false)

  override def nullSafeEval(html: Any, base: Any): Any = {
    val anchors = HtmlAnchors.extract(
      html.asInstanceOf[UTF8String].toString,
      base.asInstanceOf[UTF8String].toString)
    new GenericArrayData(anchors.map { case (u, t) =>
      InternalRow(UTF8String.fromString(u), UTF8String.fromString(t))
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HtmlAnchors =
    copy(left = l, right = r)
  override def prettyName: String = "html_anchors"
}

object HtmlAnchors {

  import HtmlToText.{entityAt, isAsciiSpace, isOpenTag, isCloseName, closeTagEnd}

  val elementType: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Anchor-text cap, in appended code points. 256 covers real labels
    * (median anchor text is a few words); anything longer is a markup
    * accident, not a label.
    */
  val MaxTextChars: Int = 256

  /** Extract (url, text) pairs; see the expression scaladoc for the rules. */
  def extract(html: String, baseUrl: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val s = html
    val n = s.length
    var base = baseUrl
    var baseSet = false
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (i + 3 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (isOpenTag(s, i, "script")) {
          i = HtmlOutlinks.skipElement(s, i, "script")
        } else if (isOpenTag(s, i, "style")) {
          i = HtmlOutlinks.skipElement(s, i, "style")
        } else if (isOpenTag(s, i, "a")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val href = HtmlOutlinks.findHref(s, i + 2, gt)
            if (href != null) {
              val resolved = HtmlOutlinks.cleanResolve(href, base)
              if (resolved != null) out += ((resolved, textAt(s, gt + 1)))
            }
            i = gt + 1
          }
        } else if (isOpenTag(s, i, "base")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val href = HtmlOutlinks.findHref(s, i + 5, gt)
            if (href != null && !baseSet) {
              base = UrlResolve.resolve(baseUrl, HtmlOutlinks.clean(href))
              baseSet = true
            }
            i = gt + 1
          }
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
        }
      } else i += 1
    }
    out.toSeq
  }

  /** [[HtmlToText]]-semantics text of the anchor region starting at `from`
    * (just past the open tag's `>`), ending at `</a>` / next `<a>` / EOF /
    * the [[MaxTextChars]] cap.
    */
  private def textAt(s: String, from: Int): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(64)
    var pendingSpace = false
    var appended = 0
    def emit(cp: Int): Boolean = {
      if (cp < 0x80 && isAsciiSpace(cp.toChar)) { pendingSpace = true; true }
      else if (appended >= MaxTextChars) false
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.appendCodePoint(cp)
        appended += 1
        true
      }
    }
    var i = from
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 1 < n && s.charAt(i + 1) == '/' && isCloseName(s, i + 2, "a")) {
          done = true
        } else if (isOpenTag(s, i, "a")) {
          done = true // a new anchor implicitly closes this one
        } else if (i + 3 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
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
        } else {
          val gt = s.indexOf('>', i)
          if (gt < 0) { // literal '<' to EOF region end (regex semantics)
            if (!emit('<')) done = true
            i += 1
          } else { i = gt + 1; pendingSpace = true }
        }
      } else if (c == '&') {
        val e = entityAt(s, i)
        if (e == null) { if (!emit('&')) done = true; i += 1 }
        else { if (!emit(e._1)) done = true; i += e._2 }
      } else {
        val cp = s.codePointAt(i)
        if (!emit(cp)) done = true
        i += Character.charCount(cp)
      }
    }
    out.toString
  }
}
