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

  test("hostile input: gzip decompression bomb rejects at the 50 MB cap") {
    // ~60 MB of zeros gzips to ~60 KB — without the cap this inflates per
    // record; with it, parse must reject BEFORE buffering past 50 MB
    val buf = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(buf)
    val chunk = new Array[Byte](1 << 20)
    for (_ <- 0 until 60) gz.write(chunk)
    gz.close()
    val bomb = buf.toByteArray
    assert(bomb.length < 200 * 1024, s"bomb should be tiny, was ${bomb.length}")
    val e = intercept[IllegalArgumentException](Sitemaps.parse(bomb))
    assert(e.getMessage.contains("decompression bomb"))
    // a legitimately-sized gzip sitemap still parses (cap is on OUTPUT)
    val ok = Sitemaps.parse(Sitemaps.write(Seq("http://h.invalid/p" -> None), gzipped = true))
    assert(ok.map(_.loc) == Seq("http://h.invalid/p"))
  }

  test("entries without a loc are dropped, empty locs too") {
    val xml = ("<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>  </loc></url>" +
      "<url><loc>http://h.invalid/ok</loc></url></urlset>").getBytes("UTF-8")
    assert(Sitemaps.parse(xml) ==
      Seq(Sitemaps.SitemapEntry("url", "http://h.invalid/ok", None)))
  }
}
