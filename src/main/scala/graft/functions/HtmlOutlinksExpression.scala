package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_outlinks(html, base_url)` -> ARRAY<STRING>: the `<a href>` targets
  * of an HTML capture, in document order, resolved to absolute URIs — the
  * extraction half of WAT derivation and the ONLY source of frontier
  * GROWTH a crawl has (robots + sitemaps + the scheduler can all only
  * reorder URLs something else discovered; this is what discovers them).
  *
  * Rules (deterministic, single pass — shares the scanner semantics of
  * [[HtmlToText]], so what one drops as markup the other drops as links):
  *
  *  1. `<!-- -->` comment blocks and `<script>`/`<style>` element bodies
  *     are skipped entirely — a link inside them is not a link.
  *  2. An `<a>` open tag (case-insensitive) contributes its FIRST
  *     `href` attribute; names are matched case-insensitively, values may
  *     be double-quoted, single-quoted, or unquoted (to whitespace/`>`).
  *  3. The raw value is entity-decoded ([[HtmlToText.entityAt]]'s table —
  *     `&amp;` inside URLs is pervasive), then cleaned per the HTML URL
  *     rule: TAB/CR/LF removed anywhere, C0/space trimmed at both ends.
  *  4. The FIRST `<base href>` in the document (HTML5: only the first
  *     counts) rebases every LATER link; it itself resolves against the
  *     capture URL.
  *  5. The value resolves against the in-effect base via RFC 3986 §5
  *     ([[UrlResolve.resolve]]); only http/https results are kept —
  *     empty values, fragment-only refs, and non-fetchable schemes
  *     (`javascript:`, `mailto:`, `data:`, ...) yield nothing.
  *
  * Like [[HtmlToText]], tag boundaries follow the `<[^>]*>` regex
  * semantics the oracles replay (a quoted `>` inside an attribute ends
  * the tag) — crawl-grade, not a browser DOM.
  *
  * Scale shape: map-only scalar over the capture scan; the output is
  * URLs only (never the HTML), so the downstream edge shuffle carries
  * tens of bytes per link, not page bodies.
  */
case class HtmlOutlinks(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING html, STRING base_url), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(html: Any, base: Any): Any = {
    val links = HtmlOutlinks.extract(
      html.asInstanceOf[UTF8String].toString,
      base.asInstanceOf[UTF8String].toString)
    new GenericArrayData(links.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HtmlOutlinks =
    copy(left = l, right = r)
  override def prettyName: String = "html_outlinks"
}

object HtmlOutlinks {

  import HtmlToText.{entityAt, isAsciiSpace, isOpenTag, closeTagEnd}

  /** Extract + resolve; see the expression scaladoc for the exact rules. */
  def extract(html: String, baseUrl: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
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
          i = skipElement(s, i, "script")
        } else if (isOpenTag(s, i, "style")) {
          i = skipElement(s, i, "style")
        } else if (isOpenTag(s, i, "a")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n // unterminated: not a tag (regex semantics)
          else {
            val href = findHref(s, i + 2, gt)
            if (href != null) {
              val resolved = cleanResolve(href, base)
              if (resolved != null) out += resolved
            }
            i = gt + 1
          }
        } else if (isOpenTag(s, i, "base")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val href = findHref(s, i + 5, gt)
            if (href != null && !baseSet) {
              base = UrlResolve.resolve(baseUrl, clean(href))
              baseSet = true
            }
            i = gt + 1
          }
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) n else gt + 1 // '<' with no '>' left: no tag can follow
        }
      } else i += 1
    }
    out.toSeq
  }

  private[functions] def skipElement(s: String, from: Int, name: String): Int = {
    val n = s.length
    val gt = s.indexOf('>', from)
    if (gt < 0) n
    else {
      val end = closeTagEnd(s, gt + 1, name)
      if (end < 0) n else end
    }
  }

  /** First href attribute value inside tag content [from, end), or null.
    * Attribute grammar: name [= value], value quoted (either quote) or
    * unquoted to whitespace; '/' between attributes is skipped (self-close
    * slashes, XHTML).
    */
  private[functions] def findHref(s: String, from: Int, end: Int): String = {
    var i = from
    while (i < end) {
      val c = s.charAt(i)
      if (isAsciiSpace(c) || c == '/') i += 1
      else {
        val ns = i
        while (i < end && !isAsciiSpace(s.charAt(i)) && s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
        val name = s.substring(ns, i)
        while (i < end && isAsciiSpace(s.charAt(i))) i += 1
        var value: String = null
        if (i < end && s.charAt(i) == '=') {
          i += 1
          while (i < end && isAsciiSpace(s.charAt(i))) i += 1
          if (i < end && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            val vs = i
            while (i < end && s.charAt(i) != q) i += 1
            value = s.substring(vs, i)
            if (i < end) i += 1
          } else {
            val vs = i
            while (i < end && !isAsciiSpace(s.charAt(i))) i += 1
            value = s.substring(vs, i)
          }
        }
        if (name.equalsIgnoreCase("href") && value != null) return value
      }
    }
    null
  }

  /** Entity-decode, drop TAB/CR/LF anywhere, trim C0/space both ends —
    * the WHATWG URL pre-parse cleanup on attribute values.
    */
  private[functions] def clean(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    val n = raw.length
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '&') {
        val e = entityAt(raw, i)
        if (e == null) { sb.append('&'); i += 1 }
        else {
          val cp = e._1
          if (cp != '\t' && cp != '\r' && cp != '\n') sb.appendCodePoint(cp)
          i += e._2
        }
      } else {
        if (c != '\t' && c != '\r' && c != '\n') sb.append(c)
        i += 1
      }
    }
    sb.toString.trim
  }

  /** null when the link is not a fetchable http/https target. */
  private[functions] def cleanResolve(raw: String, base: String): String = {
    val v = clean(raw)
    if (v.isEmpty || v.charAt(0) == '#') return null
    val abs = UrlResolve.resolve(base, v)
    if (abs.startsWith("http://") || abs.startsWith("https://")) abs else null
  }
}
