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
