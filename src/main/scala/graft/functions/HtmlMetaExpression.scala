package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_meta(html, base_url)` -> STRUCT<title STRING, description STRING,
  * canonical STRING, noindex BOOLEAN, nofollow BOOLEAN>: the ON-PAGE half
  * of the crawl politeness + dedup stack — `robots.txt` (the
  * `robots_allowed` gate) cannot see a page's own `<meta name="robots">`
  * directives, and `<link rel="canonical">` is the page-declared dedup
  * key every serious crawl curation honors before content hashing.
  *
  * Rules (deterministic, one pass, same scanner semantics as the sibling
  * expressions — comments and script/style bodies skipped, tag grammar is
  * the `<[^>]*>` regex cut):
  *
  *  1. `title`: the FIRST `<title>` element's text, [[HtmlToText]]
  *     semantics (entities decode, whitespace collapses, ends trimmed),
  *     capped at 512 code points; null when absent/empty.
  *  2. `description`: the FIRST `<meta>` whose `name` attribute is
  *     `description` (ci) — its `content` value, entity-decoded and
  *     collapsed, capped at 1024 code points; null when absent.
  *  3. `canonical`: the FIRST `<link>` whose `rel` list (ci,
  *     whitespace-separated) contains `canonical` — its `href`, cleaned
  *     and resolved like an outlink (WHATWG cleanup + RFC 3986 §5 against
  *     the in-effect base; the first `<base href>` rebases later links);
  *     only http/https results kept; null otherwise.
  *  4. `noindex` / `nofollow`: true when ANY `<meta name="robots">`
  *     (ci) lists that token in its comma-separated `content` (ci,
  *     trimmed) — `none` implies both, per the de-facto standard.
  *
  * Scale shape: map-only scalar on the capture scan; output is a few
  * short strings + two booleans per page, never the HTML.
  */
case class HtmlMeta(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING html, STRING base_url), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = HtmlMeta.schema

  override def nullSafeEval(html: Any, base: Any): Any = {
    val m = HtmlMeta.extract(
      html.asInstanceOf[UTF8String].toString,
      base.asInstanceOf[UTF8String].toString)
    InternalRow(
      if (m.title == null) null else UTF8String.fromString(m.title),
      if (m.description == null) null else UTF8String.fromString(m.description),
      if (m.canonical == null) null else UTF8String.fromString(m.canonical),
      m.noindex, m.nofollow)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HtmlMeta =
    copy(left = l, right = r)
  override def prettyName: String = "html_meta"
}

object HtmlMeta {

  import HtmlToText.{entityAt, isAsciiSpace, isOpenTag, isCloseName}

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("noindex", BooleanType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  final case class Meta(title: String, description: String, canonical: String,
      noindex: Boolean, nofollow: Boolean)

  private val MaxTitle = 512
  private val MaxDescription = 1024

  def extract(html: String, baseUrl: String): Meta = {
    val s = html
    val n = s.length
    var base = baseUrl
    var baseSet = false
    var title: String = null
    var description: String = null
    var canonical: String = null
    var noindex = false
    var nofollow = false
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
        } else if (isOpenTag(s, i, "title")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            if (title == null) {
              val t = textUntilClose(s, gt + 1, "title", MaxTitle)
              if (t.nonEmpty) title = t
            }
            i = gt + 1
          }
        } else if (isOpenTag(s, i, "meta")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val name = attr(s, i + 5, gt, "name")
            val content = attr(s, i + 5, gt, "content")
            if (name != null && content != null) {
              if (name.equalsIgnoreCase("description")) {
                if (description == null) {
                  val d = collapse(decodeValue(content), MaxDescription)
                  if (d.nonEmpty) description = d
                }
              } else if (name.equalsIgnoreCase("robots")) {
                decodeValue(content).split(',').foreach { tok =>
                  val t = tok.trim.toLowerCase(java.util.Locale.ROOT)
                  if (t == "noindex" || t == "none") noindex = true
                  if (t == "nofollow" || t == "none") nofollow = true
                }
              }
            }
            i = gt + 1
          }
        } else if (isOpenTag(s, i, "link")) {
          val gt = s.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val rel = attr(s, i + 5, gt, "rel")
            if (canonical == null && rel != null && hasToken(rel, "canonical")) {
              val href = attr(s, i + 5, gt, "href")
              if (href != null) {
                val resolved = HtmlOutlinks.cleanResolve(href, base)
                if (resolved != null) canonical = resolved
              }
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
    Meta(title, description, canonical, noindex, nofollow)
  }

  /** Whitespace-separated ci token membership (the `rel` grammar). */
  private def hasToken(list: String, token: String): Boolean =
    list.split(Array(' ', '\t', '\n', '\r', '\f'))
      .exists(_.equalsIgnoreCase(token))

  /** Named attribute value inside tag content [from, end), or null — the
    * [[HtmlOutlinks.findHref]] grammar generalized to any name.
    */
  private def attr(s: String, from: Int, end: Int, want: String): String = {
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
        if (name.equalsIgnoreCase(want) && value != null) return value
      }
    }
    null
  }

  /** Entity-decode an attribute value (raw, no whitespace policy). */
  private def decodeValue(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    val n = raw.length
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '&') {
        val e = entityAt(raw, i)
        if (e == null) { sb.append('&'); i += 1 }
        else { sb.appendCodePoint(e._1); i += e._2 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Collapse ASCII whitespace runs, trim, cap at `max` code points. */
  private def collapse(raw: String, max: Int): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var appended = 0
    var i = 0
    val n = raw.length
    while (i < n && appended < max) {
      val cp = raw.codePointAt(i)
      if (cp < 0x80 && isAsciiSpace(cp.toChar)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
        appended += 1
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** [[HtmlToText]]-semantics text up to `</name>` (or EOF), capped. */
  private def textUntilClose(s: String, from: Int, name: String, max: Int): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(64)
    var pendingSpace = false
    var appended = 0
    var i = from
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 1 < n && s.charAt(i + 1) == '/' && isCloseName(s, i + 2, name)) done = true
        else if (i + 3 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingSpace = true
        } else {
          val gt = s.indexOf('>', i)
          if (gt < 0) { // literal '<' (regex semantics)
            if (appended < max) {
              if (pendingSpace && out.length > 0) out.append(' ')
              pendingSpace = false
              out.append('<'); appended += 1
            } else done = true
            i += 1
          } else { i = gt + 1; pendingSpace = true }
        }
      } else if (c == '&') {
        val e = entityAt(s, i)
        val (cp, len) = if (e == null) ('&'.toInt, 1) else e
        if (cp < 0x80 && isAsciiSpace(cp.toChar)) pendingSpace = true
        else if (appended < max) {
          if (pendingSpace && out.length > 0) out.append(' ')
          pendingSpace = false
          out.appendCodePoint(cp); appended += 1
        } else done = true
        i += len
      } else {
        val cp = s.codePointAt(i)
        if (cp < 0x80 && isAsciiSpace(cp.toChar)) pendingSpace = true
        else if (appended < max) {
          if (pendingSpace && out.length > 0) out.append(' ')
          pendingSpace = false
          out.appendCodePoint(cp); appended += 1
        } else done = true
        i += Character.charCount(cp)
      }
    }
    out.toString
  }
}
