package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# corpus robots
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/open/
      |Disallow: /*.tmp$
      |Crawl-delay: 10
      |
      |User-agent: otherbot
      |User-agent: thirdbot
      |Disallow: /other/
      |
      |User-agent: *
      |Disallow: /
      |Allow: /$
      |""".stripMargin

  test("parse: groups, comments, unknown fields, multi-agent groups") {
    val gs = Robots.parse(txt)
    assert(gs.length == 3)
    assert(gs(0).agents == Seq("graftbot"))
    assert(gs(0).rules == Seq(Robots.Rule(false, "/private/"),
      Robots.Rule(true, "/private/open/"), Robots.Rule(false, "/*.tmp$")))
    assert(gs(1).agents == Seq("otherbot", "thirdbot")) // consecutive UA lines
    assert(gs(2).agents == Seq("*"))
  }

  test("parse: rules before any user-agent line are ignored") {
    val gs = Robots.parse("Disallow: /x\nUser-agent: a\nDisallow: /y\n")
    assert(gs.length == 1 && gs.head.rules == Seq(Robots.Rule(false, "/y")))
  }

  test("group selection: exact token beats *, merges same-token groups, case-insensitive") {
    val multi = txt + "\nUser-agent: GRAFTBOT\nDisallow: /extra/\n"
    val rules = Robots.rulesFor(Robots.parse(multi), "GraftBot")
    assert(rules.contains(Robots.Rule(false, "/private/")))
    assert(rules.contains(Robots.Rule(false, "/extra/"))) // both groups merged
    assert(!rules.contains(Robots.Rule(false, "/"))) // the * group does NOT apply
    // unknown agent falls back to the * group
    assert(Robots.rulesFor(Robots.parse(txt), "nobody") == Seq(
      Robots.Rule(false, "/"), Robots.Rule(true, "/$")))
    // no groups at all = allow everything
    assert(Robots.rulesFor(Robots.parse("# empty\n"), "x").isEmpty)
    assert(Robots.isAllowed(Nil, "/anything"))
  }

  test("evaluation: longest match wins, Allow wins ties, empty Disallow allows") {
    val rules = Robots.rulesFor(Robots.parse(txt), "graftbot")
    assert(Robots.isAllowed(rules, "/public/x")) // nothing matches
    assert(!Robots.isAllowed(rules, "/private/x")) // Disallow /private/
    assert(Robots.isAllowed(rules, "/private/open/x")) // longer Allow wins
    assert(!Robots.isAllowed(rules, "/files/a.tmp")) // wildcard + $ anchor
    assert(Robots.isAllowed(rules, "/files/a.tmp.bak")) // $ anchor misses
    assert(Robots.isAllowed(rules, "/files/a.txt"))
    // Allow wins an exact-length tie (same pattern length, both match)
    val tie = Seq(Robots.Rule(false, "/p/"), Robots.Rule(true, "/p/"))
    assert(Robots.isAllowed(tie, "/p/x"))
    // empty Disallow matches nothing
    assert(Robots.isAllowed(Seq(Robots.Rule(false, "")), "/x"))
  }

  test("evaluation: the * fallback group disallows all but the exact root") {
    val rules = Robots.rulesFor(Robots.parse(txt), "unknownbot")
    assert(Robots.isAllowed(rules, "/")) // Allow /$ (len 2) beats Disallow / (len 1)
    assert(!Robots.isAllowed(rules, "/x"))
  }

  test("wildcards: mid-pattern *, multiple *, anchored and unanchored") {
    assert(Robots.matchLength("/a/*/c", "/a/b/c") == 6)
    assert(Robots.matchLength("/a/*/c", "/a/x/y/cz") == 6) // prefix semantics
    assert(Robots.matchLength("/a/*/c$", "/a/x/y/cz") == -1) // anchored
    assert(Robots.matchLength("/a/*/c$", "/a/x/y/c") == 7)
    assert(Robots.matchLength("/*a*b$", "/xxaYYb") == 6)
    assert(Robots.matchLength("/*a*b$", "/xxaYY") == -1)
    assert(Robots.matchLength("/p", "/p") == 2)
    assert(Robots.matchLength("/p$", "/p") == 3) // anchor counts toward specificity
    assert(Robots.matchLength("/q", "/p") == -1)
  }

  test("500 KiB cap: rules past the cap are ignored") {
    val pad = "# " + "x" * Robots.MaxChars + "\n"
    val t = "User-agent: *\nDisallow: /a/\n" + pad + "Disallow: /b/\n"
    val rules = Robots.rulesFor(Robots.parse(t), "any")
    assert(!Robots.isAllowed(rules, "/a/x"))
    assert(Robots.isAllowed(rules, "/b/x")) // the post-cap rule never parsed
  }

  test("crawl-delay: per-group, same selection as rules, largest wins, junk ignored") {
    val gs = Robots.parse(txt) // graftbot group declares Crawl-delay: 10
    assert(Robots.crawlDelay(gs, "graftbot").contains(10.0))
    assert(Robots.crawlDelay(gs, "nobody").isEmpty) // the * group declares none
    val multi = txt + "\nUser-agent: graftbot\nCrawl-delay: 2.5\n"
    assert(Robots.crawlDelay(Robots.parse(multi), "graftbot").contains(10.0)) // max
    val junk = "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -3\n"
    assert(Robots.crawlDelay(Robots.parse(junk), "x").isEmpty)
    val first = "User-agent: *\nCrawl-delay: 4\nCrawl-delay: 9\n"
    assert(Robots.crawlDelay(Robots.parse(first), "x").contains(4.0)) // first in group
  }

  test("sitemaps: collected from anywhere in the file, agent-independent") {
    val t = "Sitemap: http://h.invalid/a.xml\n" + txt +
      "\nSITEMAP: http://h.invalid/b.xml # trailing comment\nSitemap:\n"
    assert(Robots.sitemaps(t) ==
      Seq("http://h.invalid/a.xml", "http://h.invalid/b.xml"))
    assert(Robots.sitemaps("User-agent: *\nDisallow: /\n").isEmpty)
  }

  test("memo: alternating robots texts on one thread stay correct") {
    val t1 = "User-agent: *\nDisallow: /a/\n"
    val t2 = "User-agent: *\nDisallow: /b/\n"
    (0 until 3).foreach { _ =>
      assert(!Robots.allowed(t1, "bot", "/a/x") && Robots.allowed(t1, "bot", "/b/x"))
      assert(Robots.allowed(t2, "bot", "/a/x") && !Robots.allowed(t2, "bot", "/b/x"))
    }
  }

  test("memo LRU: an un-clustered URL stream parses each robots once, not per row") {
    // 10 hosts interleaved over 200 rows — the single-entry memo of old
    // reparsed per row; the LRU must parse each (txt, agent) once
    val texts = (0 until 10).map(h => s"User-agent: *\nDisallow: /h$h/\n")
    val before = Robots.parseCount.get()
    (0 until 200).foreach { i =>
      val h = i % 10
      assert(!Robots.allowed(texts(h), "bot", s"/h$h/x"))
      assert(Robots.allowed(texts(h), "bot", "/open/x"))
    }
    val parses = Robots.parseCount.get() - before
    assert(parses <= 10, s"expected <= 10 parses for 10 interleaved hosts, got $parses")
  }
}
