package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {

  test("urlset round-trip: locs, optional lastmod, xml escaping, gzip") {
    val entries = Seq(
      "http://h.invalid/a?x=1&y=2" -> Some("2026-01-03"),
      "http://h.invalid/b" -> None,
      "http://h.invalid/<odd>" -> Some("2026-02-01"))
    for (gz <- Seq(false, true)) {
      val got = Sitemaps.parse(Sitemaps.write(entries, gzipped = gz))
      assert(got == entries.map { case (l, m) => Sitemaps.SitemapEntry("url", l, m) })
    }
  }

  test("sitemapindex round-trip and kind tagging") {
    val subs = Seq("http://h.invalid/s1.xml.gz" -> None, "http://h.invalid/s2.xml.gz" -> None)
    val got = Sitemaps.parse(Sitemaps.write(subs, index = true))
    assert(got.forall(_.kind == "sitemap") && got.map(_.loc) == subs.map(_._1))
  }

  test("hostile input: DOCTYPE (XXE / entity-bomb vector) rejects outright") {
    val evil = """<?xml version="1.0"?>
      |<!DOCTYPE urlset [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
      |<urlset><url><loc>&xxe;</loc></url></urlset>""".stripMargin.getBytes("UTF-8")
    intercept[Exception](Sitemaps.parse(evil))
    // unknown root rejects with a named message
    val wrong = "<rss><item/></rss>".getBytes("UTF-8")
    val e = intercept[IllegalArgumentException](Sitemaps.parse(wrong))
    assert(e.getMessage.contains("neither urlset nor sitemapindex"))
  }

  test("entries without a loc are dropped, empty locs too") {
    val xml = ("<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>  </loc></url>" +
      "<url><loc>http://h.invalid/ok</loc></url></urlset>").getBytes("UTF-8")
    assert(Sitemaps.parse(xml) ==
      Seq(Sitemaps.SitemapEntry("url", "http://h.invalid/ok", None)))
  }
}
