package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki export parse + wikitext cleanup + the bz2 shard seam. */
class MediaWikiSpec extends AnyFunSuite {

  test("export round-trip: fields and wikitext survive the writer/parser") {
    val pages = Seq(Ingest.wikiPage(3L), Ingest.wikiPage(9L))
    val back = MediaWiki.parseDump(MediaWiki.writeDump(pages))
    assert(back == pages)
    assert(back(1).ns == 1) // the talk-namespace lane
  }

  test("<siteinfo> namespaces parse: id -> name, key 0 unnamed, " +
      "headerless shards yield the empty map") {
    val pages = Seq(Ingest.wikiPage(3L))
    val (ns, back) = MediaWiki.parseDumpWithSiteinfo(MediaWiki.writeDump(pages))
    assert(back == pages)
    assert(ns(0) == "") // the article space is self-closed/unnamed
    assert(ns(1) == "Talk" && ns(14) == "Category" && ns(-1) == "Special")
    // a ranged mid-dump read has no <siteinfo>: empty map, pages intact
    val bare = ("<mediawiki>" + ("<page><title>T</title><ns>0</ns>" +
      "<id>7</id><revision><text>x</text></revision></page>") +
      "</mediawiki>").getBytes("UTF-8")
    val (ns2, back2) = MediaWiki.parseDumpWithSiteinfo(bare)
    assert(ns2.isEmpty && back2.length == 1 && back2.head.pageId == 7L)
  }

  test("a bz2 shard decodes end-to-end (the dump's real shipping shape)") {
    val pages = Seq(Ingest.wikiPage(0L), Ingest.wikiPage(1L))
    val shard = Bzip2.compress(MediaWiki.writeDump(pages))
    assert(MediaWiki.parseDump(Bzip2.decompress(shard)) == pages)
  }

  test("cleanWikitext: every rule, including the oracle template") {
    val cleaned = MediaWiki.cleanWikitext(Ingest.wikiPage(5L).wikitext)
    assert(cleaned ==
      "Article 5 is about subject 5.\n" +
        "Body of article 5 links Plain 0 and notes café.\n" +
        "Section 2\n" +
        "Final line 5 — done.")
    // nested templates drop as one span; File/Category links drop whole;
    // inline spaces stay (only LINES trim in the collapse)
    assert(MediaWiki.cleanWikitext(
      "a {{outer|{{inner}}}} b [[File:x.png|thumb|cap]] c [[Category:Y]] d")
      == "a  b  c  d")
    // comments and self-closed refs
    assert(MediaWiki.cleanWikitext("x<!-- hidden -->y<ref name=\"a\"/>z") == "xyz")
    // unterminated ref eats to the end, never hangs
    assert(MediaWiki.cleanWikitext("keep<ref>dangling forever") == "keep")
  }

  test("redirect pages round-trip the <redirect title=.../> element") {
    val pages = Seq(Ingest.wikiRedirectPage(0L), Ingest.wikiRedirectPage(1L),
      Ingest.wikiRedirectPage(5L),
      MediaWiki.WikiPage(99L, "Q", 0, "U", "2026-01-01T00:00:00Z",
        "#REDIRECT [[A \"quoted\" & <odd> title]]",
        Some("A \"quoted\" & <odd> title")))
    val back = MediaWiki.parseDump(MediaWiki.writeDump(pages))
    assert(back == pages)
    assert(back(0).redirect.isEmpty)
    assert(back(1).redirect.contains("Article 0"))
    assert(back(2).redirect.contains("Missing 5")) // the dangling lane
    assert(back(3).redirect.contains("A \"quoted\" & <odd> title"))
  }

  test("multistream writer: concatenation decompresses to EXACTLY writeDump's XML") {
    val pages = (0L until 11L).map(Ingest.wikiPage)
    val (dump, index) = MediaWiki.writeMultistreamDump(pages, pagesPerStream = 4)
    assert(Bzip2.decompress(dump).sameElements(MediaWiki.writeDump(pages)))
    assert(MediaWiki.parseDump(Bzip2.decompress(dump)) == pages)
    // 11 pages / 4 per stream -> header + 3 page streams + footer
    assert(index.map(_.offset).distinct.size == 3)
    assert(index.size == 11)
  }

  test("index round-trip incl. titles carrying ':' (first-two-colons rule)") {
    val entries = Seq(MediaWiki.IndexEntry(613L, 42L, "Category:Topic: deep"),
      MediaWiki.IndexEntry(1200L, 43L, "Plain"))
    assert(MediaWiki.parseIndexText(MediaWiki.writeIndexText(entries)) == entries)
    intercept[IllegalArgumentException](MediaWiki.parseIndexText("nocolons"))
  }

  test("ranged read: pagesAt decodes ONLY the indexed stream's batch") {
    val pages = (0L until 10L).map(Ingest.wikiPage)
    val (dump, index) = MediaWiki.writeMultistreamDump(pages, pagesPerStream = 4)
    val byOffset = index.groupBy(_.offset)
    byOffset.foreach { case (off, entries) =>
      val batch = MediaWiki.pagesAt(dump, off)
      assert(batch.map(_.pageId) == entries.map(_.pageId))
      assert(batch.map(_.title) == entries.map(_.title))
      assert(batch.size <= 4)
    }
    // an offset into the middle of a stream is a named reject, not garbage
    intercept[IllegalArgumentException](
      MediaWiki.pagesAt(dump, index.head.offset + 1))
  }

  test("named rejects: malformed XML, wrong root, runaway template nesting") {
    val e1 = intercept[IllegalArgumentException](
      MediaWiki.parseDump("<mediawiki><page>".getBytes("UTF-8")))
    assert(e1.getMessage.contains("malformed export XML"))
    val e2 = intercept[IllegalArgumentException](
      MediaWiki.parseDump("<notwiki/>".getBytes("UTF-8")))
    assert(e2.getMessage.contains("not <mediawiki>"))
    val bomb = "{{" * 64 + "x" + "}}" * 64
    val e3 = intercept[IllegalArgumentException](MediaWiki.cleanWikitext(bomb))
    assert(e3.getMessage.contains("nested past the cap"))
    // doctype (XXE shape) is a parse error through the shared walk
    val xxe = ("<?xml version=\"1.0\"?><!DOCTYPE m [<!ENTITY x \"y\">]>" +
      "<mediawiki/>").getBytes("UTF-8")
    val e4 = intercept[IllegalArgumentException](MediaWiki.parseDump(xxe))
    assert(e4.getMessage.contains("malformed export XML"))
  }
}
