package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class FeedsSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private val entries = Seq(
    ("http://a.invalid/1", "First — post", "Mon, 01 Jan 2026 00:00:00 GMT", "g1"),
    ("http://a.invalid/2", "Second & <escaped>", "Tue, 02 Jan 2026 00:00:00 GMT", "g2"))

  test("rss roundtrip, plain and gzipped") {
    for (gz <- Seq(false, true)) {
      val bytes = Feeds.writeRss("Chan \"X\"", entries, gzipped = gz)
      val got = Feeds.parse(bytes)
      assert(got.length == 2)
      got.zip(entries).foreach { case (e, (link, title, pub, guid)) =>
        assert(e.kind == "rss" && e.link == link && e.title == title)
        assert(e.published == pub && e.guid == guid)
      }
    }
  }

  test("atom roundtrip; rel=alternate link preferred; updated over published") {
    val bytes = Feeds.writeAtom("Feed", entries)
    val got = Feeds.parse(bytes)
    assert(got.forall(_.kind == "atom"))
    assert(got.map(_.link) == entries.map(_._1))
    // hand-built entry: self link first, alternate second, published only
    val hand = utf8("""<?xml version="1.0"?><feed>
      |<entry><link rel="self" href="http://x/self"/>
      |<link rel="alternate" href="http://x/alt"/>
      |<published>2026-01-03T00:00:00Z</published>
      |<id>h1</id><title>t</title></entry>
      |<entry><title>no link, skipped</title></entry>
      |</feed>""".stripMargin)
    val g2 = Feeds.parse(hand)
    assert(g2.length == 1)
    assert(g2.head.link == "http://x/alt" && g2.head.published == "2026-01-03T00:00:00Z")
  }

  test("rss items without a link are skipped; nested channel text ignored") {
    val xml = utf8("""<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>c</title><link>http://site.invalid/</link>
      |<item><title>linkless</title></item>
      |<item><link>http://site.invalid/p</link><title>ok</title></item>
      |</channel></rss>""".stripMargin)
    val got = Feeds.parse(xml)
    assert(got.length == 1 && got.head.link == "http://site.invalid/p")
  }

  test("doctype, malformed XML, and non-feed roots are named rejects") {
    val xxe = utf8("""<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x "y">]><rss/>""")
    assert(intercept[IllegalArgumentException](
      Feeds.parse(xxe)).getMessage.contains("malformed"))
    assert(intercept[IllegalArgumentException](
      Feeds.parse(utf8("<rss><unclosed"))).getMessage.contains("malformed"))
    assert(intercept[IllegalArgumentException](
      Feeds.parse(utf8("<html></html>"))).getMessage.contains("neither rss nor feed"))
  }

  test("gzip bomb hits the bounded cap") {
    val huge = Feeds.writeRss("c",
      (0 until 200000).map(i => (s"http://x/$i", "t" * 64, "d", s"g$i")), gzipped = true)
    // cap far below the expanded size: the bounded gunzip rejects
    intercept[IllegalArgumentException](
      Gunzip.bounded(huge, 64 * 1024, "feed"))
  }
}
