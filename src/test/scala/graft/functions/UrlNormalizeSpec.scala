package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit edge cases for `url_normalize` beyond the six oracle-replayed
  * shapes in `tx_url_canonical`: idempotence, malformed inputs passing
  * through unharmed, and each rule in isolation.
  */
class UrlNormalizeSpec extends AnyFunSuite {

  private def n(s: String) = UrlNormalize.normalize(s)

  test("scheme/host case, default ports, fragments") {
    assert(n("HTTP://EXAMPLE.com/Path") == "http://example.com/Path") // path case KEPT
    assert(n("http://example.com:80/a") == "http://example.com/a")
    assert(n("https://example.com:443/a") == "https://example.com/a")
    assert(n("http://example.com:443/a") == "http://example.com:443/a") // not its default
    assert(n("ftp://Example.Com:21/a") == "ftp://example.com:21/a") // unknown default
    assert(n("http://example.com/a#b#c") == "http://example.com/a")
    assert(n("http://example.com") == "http://example.com/")
    assert(n("http://example.com?x=1") == "http://example.com/?x=1")
  }

  test("query sort, tracking strip, valueless and empty params") {
    assert(n("http://e.com/?z=1&y=2&y=1") == "http://e.com/?y=1&y=2&z=1")
    assert(n("http://e.com/?utm_campaign=c&q=1&gclid=g") == "http://e.com/?q=1")
    assert(n("http://e.com/?utm_source=s") == "http://e.com/")
    assert(n("http://e.com/?flag&a=1") == "http://e.com/?a=1&flag")
    assert(n("http://e.com/?&&a=1&&") == "http://e.com/?a=1") // empty segments dropped
    // tracking names must match the WHOLE name, not a prefix of the value
    assert(n("http://e.com/?q=utm_source") == "http://e.com/?q=utm_source")
  }

  test("percent-encoding uppercase, malformed escapes untouched") {
    assert(n("http://e.com/a%2fb%3Dc") == "http://e.com/a%2Fb%3Dc")
    assert(n("http://e.com/100%valid") == "http://e.com/100%valid") // not hex
    assert(n("http://e.com/cut%2") == "http://e.com/cut%2") // truncated escape
    assert(n("http://e.com/?k=%ff") == "http://e.com/?k=%FF")
  }

  test("non-URLs and relative refs pass through unchanged") {
    for (s <- Seq("", "not a url", "/relative/path?b=1&a=2", "mailto:x@y.invalid",
        "://missing-scheme", "doc_42"))
      assert(n(s) == s)
  }

  test("idempotent: normalize(normalize(u)) == normalize(u)") {
    val urls = Seq(
      "HTTP://A.B:80/p%2f?utm_source=x&b=2&a=1#f",
      "https://U:p@Host.Tld:443?z&y=%aa",
      "http://e.com/a//b/../c?x=1&x=1")
    urls.foreach(u => assert(n(n(u)) == n(u)))
  }

  test("userinfo preserved case-sensitively, host after last @ lowercased") {
    assert(n("http://User@Example.COM/x") == "http://User@example.com/x")
    assert(n("http://a@b@C.d/x") == "http://a@b@c.d/x")
  }
}
