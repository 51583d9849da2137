package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `url_normalize(url)` -> STRING: RFC 3986 syntax-based normalization
  * plus the crawl-curation extras every dedup-by-URL stage applies. The
  * canonical URL is THE join/dedup key of a crawl pipeline — two captures
  * of `HTTP://Example.COM:80/a?b=2&a=1#top` and `http://example.com/a?a=1&b=2`
  * are the same page, and at 100 TB the difference between keying on raw
  * vs canonical URLs is a corpus full of duplicates.
  *
  * Rules, in order (deterministic, single pass over the string — the
  * DuckDB oracle predicts outputs by constructing inputs with known
  * canonical forms):
  *
  *  1. scheme and host lowercase (RFC 3986 §6.2.2.1); userinfo untouched.
  *  2. default port dropped: `:80` for http, `:443` for https (§6.2.3).
  *  3. fragment removed (never sent to the server; `#` ends the URL).
  *  4. percent-encoding hex digits uppercased (`%2f` -> `%2F`, §6.2.2.1);
  *     a `%` not followed by two hex digits is left as-is (parse, don't
  *     reject — crawls are full of malformed URLs).
  *  5. empty path with an authority becomes `/` (§6.2.3).
  *  6. query parameters: tracking params dropped (`utm_*`, `fbclid`,
  *     `gclid`, `msclkid`, `mc_eid`, `igshid`), the rest sorted by
  *     (name, value) byte order and rejoined with `&`; an emptied query
  *     loses its `?`. Parameter names/values are otherwise untouched.
  *
  * Strings without a `://` are returned unchanged (relative refs are not
  * this expression's job). Scale shape: map-only scalar, one output
  * buffer — safe directly on a 100 TB scan, codegen'd via the static-call
  * pattern (same as `hrw_shard`).
  */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlNormalize.normalize(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UrlNormalize$$.MODULE$$.normalize($c.toString()));")

  override protected def withNewChildInternal(c: Expression): UrlNormalize = copy(child = c)
  override def prettyName: String = "url_normalize"
}

object UrlNormalize {

  private val trackingExact = Set("fbclid", "gclid", "msclkid", "mc_eid", "igshid")

  private def isTracking(name: String): Boolean =
    name.startsWith("utm_") || trackingExact.contains(name)

  private def hexUpper(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s)
    while (i >= 0 && i + 2 < b.length()) {
      val h1 = b.charAt(i + 1); val h2 = b.charAt(i + 2)
      if (Character.digit(h1, 16) >= 0 && Character.digit(h2, 16) >= 0) {
        b.setCharAt(i + 1, Character.toUpperCase(h1))
        b.setCharAt(i + 2, Character.toUpperCase(h2))
      }
      i = b.indexOf("%", i + 1)
    }
    b.toString
  }

  def normalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    // authority runs to the first '/', '?', or '#'
    val authStart = schemeEnd + 3
    var authEnd = authStart
    while (authEnd < url.length && url.charAt(authEnd) != '/' &&
      url.charAt(authEnd) != '?' && url.charAt(authEnd) != '#') authEnd += 1
    val authority = url.substring(authStart, authEnd)
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    var hostPort = authority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    val defaultPort = scheme match {
      case "http" => ":80"; case "https" => ":443"; case _ => null
    }
    if (defaultPort != null && hostPort.endsWith(defaultPort))
      hostPort = hostPort.substring(0, hostPort.length - defaultPort.length)

    // split the rest into path / query, dropping any fragment
    val hashAt = url.indexOf('#', authEnd)
    val end = if (hashAt >= 0) hashAt else url.length
    val qAt = {
      val i = url.indexOf('?', authEnd); if (i >= 0 && i < end) i else -1
    }
    val rawPath = url.substring(authEnd, if (qAt >= 0) qAt else end)
    val path = hexUpper(if (rawPath.isEmpty) "/" else rawPath)
    val query =
      if (qAt < 0) ""
      else {
        val params = url.substring(qAt + 1, end).split("&", -1).toSeq
          .filter(_.nonEmpty)
          .map { p =>
            val eq = p.indexOf('=')
            if (eq < 0) (p, null: String) else (p.substring(0, eq), p.substring(eq + 1))
          }
          .filterNot { case (n, _) => isTracking(n) }
          .sortBy { case (n, v) => (n, if (v == null) "" else v) }
          .map { case (n, v) => if (v == null) n else s"$n=$v" }
        if (params.isEmpty) "" else "?" + hexUpper(params.mkString("&"))
      }
    scheme + "://" + userinfo + hostPort + path + query
  }
}

/** `url_resolve(base, ref)` -> STRING: RFC 3986 §5 reference resolution —
  * turn the relative refs a crawl's HTML is full of (`../a`, `/a`, `a.html`,
  * `//host/a`, `?q`, absolute URIs) into absolute URIs against the page (or
  * `<base href>`) base. The transform-relative-reference algorithm of
  * §5.2.2 verbatim, including `remove_dot_segments` (§5.2.4) and path merge
  * (§5.2.3); RFC 3986 §5.4's worked examples (normal AND abnormal) are
  * pinned by `HtmlOutlinksSpec`. Map-only scalar; composes with
  * `html_outlinks` (extraction) and `url_normalize` (canonicalization) into
  * the frontier-growth chain.
  */
case class UrlResolveExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING base, STRING ref), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = StringType

  override def nullSafeEval(b: Any, r: Any): Any =
    UTF8String.fromString(UrlResolve.resolve(
      b.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UrlResolve$$.MODULE$$.resolve($b.toString(), $r.toString()));")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlResolveExpr =
    copy(left = l, right = r)
  override def prettyName: String = "url_resolve"
}

object UrlResolve {

  /** URI components per RFC 3986 §3: null = component absent, "" =
    * present-but-empty (the distinction §5.2.2 depends on: `?` keeps an
    * empty query, a bare path drops it).
    */
  private final case class Parts(scheme: String, authority: String,
      path: String, query: String, fragment: String)

  private def parse(u: String): Parts = {
    var rest = u
    var scheme: String = null
    // scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":", and the ':'
    // must come before any '/', '?', '#' — otherwise it's a path char
    val ci = rest.indexOf(':')
    if (ci > 0) {
      var ok = rest.charAt(0).isLetter && rest.charAt(0) < 0x80
      var k = 1
      while (ok && k < ci) {
        val c = rest.charAt(k)
        ok = (c.isLetterOrDigit && c < 0x80) || c == '+' || c == '-' || c == '.'
        k += 1
      }
      if (ok) {
        var stop = -1
        var j = 0
        while (stop < 0 && j < rest.length) {
          val c = rest.charAt(j)
          if (c == '/' || c == '?' || c == '#') stop = j
          j += 1
        }
        if (stop < 0 || ci < stop) {
          scheme = rest.substring(0, ci).toLowerCase(java.util.Locale.ROOT)
          rest = rest.substring(ci + 1)
        }
      }
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      var e = 2
      while (e < rest.length && rest.charAt(e) != '/' &&
        rest.charAt(e) != '?' && rest.charAt(e) != '#') e += 1
      authority = rest.substring(2, e)
      rest = rest.substring(e)
    }
    var fragment: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { fragment = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** §5.2.3 merge: base with authority and empty path -> "/" + ref path,
    * else ref path appended to base path minus its last segment.
    */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val sl = base.path.lastIndexOf('/')
      if (sl < 0) refPath else base.path.substring(0, sl + 1) + refPath
    }

  /** §5.2.4 remove_dot_segments, the five-case loop verbatim. */
  private def removeDotSegments(p: String): String = {
    val out = new java.lang.StringBuilder(p.length)
    def popSegment(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out.charAt(i) != '/') i -= 1
      out.setLength(math.max(i, 0))
    }
    var in = p
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); popSegment() }
      else if (in == "/..") { in = "/"; popSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        var e = in.indexOf('/', start)
        if (e < 0) e = in.length
        out.append(in, 0, e)
        in = in.substring(e)
      }
    }
    out.toString
  }

  /** §5.2.2 transform: resolve `ref` against `baseUri`. Total function —
    * malformed inputs resolve by the same syntax rules (parse, don't
    * reject; crawls are full of junk hrefs).
    */
  def resolve(baseUri: String, ref: String): String = {
    val base = parse(baseUri)
    val r = parse(ref)
    val t =
      if (r.scheme != null)
        r.copy(path = removeDotSegments(r.path))
      else if (r.authority != null)
        Parts(base.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Parts(base.scheme, base.authority, base.path,
          if (r.query != null) r.query else base.query, r.fragment)
      else if (r.path.charAt(0) == '/')
        Parts(base.scheme, base.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Parts(base.scheme, base.authority,
          removeDotSegments(merge(base, r.path)), r.query, r.fragment)
    val sb = new java.lang.StringBuilder(baseUri.length + ref.length)
    if (t.scheme != null) sb.append(t.scheme).append(':')
    if (t.authority != null) sb.append("//").append(t.authority)
    sb.append(t.path)
    if (t.query != null) sb.append('?').append(t.query)
    if (t.fragment != null) sb.append('#').append(t.fragment)
    sb.toString
  }
}
