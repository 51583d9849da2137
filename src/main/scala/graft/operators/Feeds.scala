package graft.operators

/** RSS / Atom feed parsing — the crawl-discovery seam sitemaps don't
  * cover: feeds announce NEW urls hours before sitemaps and link graphs
  * see them, so a freshness-aware crawler polls feeds first. Public
  * formats only: RSS 2.0 (the RSS Advisory Board spec) and Atom 1.0
  * (RFC 4287). Parsing is the same hardened DOM walk as [[Sitemaps]] /
  * [[OfficeCodec]]: doctype declarations are a parse error (no XXE, no
  * entity bombs), XInclude off, entity expansion off; gzip-compressed
  * feeds (the common `Content-Encoding` on feed endpoints) decompress
  * BOUNDED first.
  *
  * Extraction profile per entry: `link` (RSS `<link>` text; Atom
  * `<link href>` preferring `rel="alternate"` or unset rel), `title`,
  * `published` (RSS `<pubDate>`; Atom `<updated>` falling back to
  * `<published>`), `guid` (RSS `<guid>`; Atom `<id>`) — the four fields
  * discovery needs. Entries missing a link are skipped (they cannot be
  * fetched); everything else absent is "".
  *
  * Scale shape: one feed is one record — a map-only per-record parse
  * like the sitemap walk; feeds are host-grain dims (KBs each), so the
  * discovery anti-join against the known frontier broadcasts feed
  * entries, never the frontier.
  */
object Feeds {

  /** One feed entry. `kind` is "rss" or "atom" (the root element). */
  final case class FeedEntry(kind: String, link: String, title: String,
      published: String, guid: String)

  /** Decompressed-size cap for a gzipped feed (the sitemap discipline). */
  final val MaxFeedBytes: Long = 64L * 1024 * 1024

  private val Gzip = Array[Byte](0x1f, 0x8b.toByte)

  /** Parse a feed buffer (gzip-transparent). Throws a NAMED
    * `IllegalArgumentException` for non-feed XML, malformed XML, or a
    * doctype declaration.
    */
  def parse(bytes: Array[Byte]): Seq[FeedEntry] = {
    val xml = if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1))
      Gunzip.bounded(bytes, MaxFeedBytes, "feed")
    else bytes
    val doc =
      try XmlWalk.parse(xml)
      catch {
        case e: org.xml.sax.SAXException =>
          throw new IllegalArgumentException(s"feed: malformed XML (${e.getMessage})")
      }
    val root = doc.getDocumentElement
    root.getTagName match {
      case "rss" => parseRss(root)
      case "feed" => parseAtom(root)
      case other => throw new IllegalArgumentException(
        s"feed: root element '$other' is neither rss nor feed")
    }
  }

  private def childText(e: org.w3c.dom.Element, tag: String): String = {
    val kids = e.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val k = kids.item(i)
      if (k.getNodeType == org.w3c.dom.Node.ELEMENT_NODE && k.getNodeName == tag)
        return Option(k.getTextContent).map(_.trim).getOrElse("")
      i += 1
    }
    ""
  }

  private def parseRss(root: org.w3c.dom.Element): Seq[FeedEntry] = {
    val items = root.getElementsByTagName("item")
    (0 until items.getLength).flatMap { i =>
      val e = items.item(i).asInstanceOf[org.w3c.dom.Element]
      val link = childText(e, "link")
      if (link.isEmpty) None
      else Some(FeedEntry("rss", link, childText(e, "title"),
        childText(e, "pubDate"), childText(e, "guid")))
    }
  }

  private def parseAtom(root: org.w3c.dom.Element): Seq[FeedEntry] = {
    val entries = root.getElementsByTagName("entry")
    (0 until entries.getLength).flatMap { i =>
      val e = entries.item(i).asInstanceOf[org.w3c.dom.Element]
      // <link href> with rel="alternate" (or no rel) wins; first such
      val links = e.getElementsByTagName("link")
      var href = ""
      var j = 0
      while (href.isEmpty && j < links.getLength) {
        val l = links.item(j).asInstanceOf[org.w3c.dom.Element]
        val rel = l.getAttribute("rel")
        if (rel.isEmpty || rel == "alternate") href = l.getAttribute("href").trim
        j += 1
      }
      if (href.isEmpty) None
      else {
        val published = childText(e, "updated") match {
          case "" => childText(e, "published")
          case u => u
        }
        Some(FeedEntry("atom", href, childText(e, "title"), published,
          childText(e, "id")))
      }
    }
  }

  // --------------------------------------------------------------- writers

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Deterministic RSS 2.0 writer — the oracle half. */
  def writeRss(channelTitle: String,
      entries: Seq[(String, String, String, String)], // (link, title, pubDate, guid)
      gzipped: Boolean = false): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<rss version=\"2.0\"><channel><title>")
      .append(esc(channelTitle)).append("</title>\n")
    entries.foreach { case (link, title, pubDate, guid) =>
      sb.append("<item><title>").append(esc(title)).append("</title>")
        .append("<link>").append(esc(link)).append("</link>")
        .append("<pubDate>").append(esc(pubDate)).append("</pubDate>")
        .append("<guid>").append(esc(guid)).append("</guid></item>\n")
    }
    sb.append("</channel></rss>\n")
    finish(sb.toString, gzipped)
  }

  /** Deterministic Atom 1.0 writer. */
  def writeAtom(feedTitle: String,
      entries: Seq[(String, String, String, String)], // (href, title, updated, id)
      gzipped: Boolean = false): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>")
      .append(esc(feedTitle)).append("</title>\n")
    entries.foreach { case (href, title, updated, id) =>
      sb.append("<entry><title>").append(esc(title)).append("</title>")
        .append("<link rel=\"alternate\" href=\"").append(esc(href)).append("\"/>")
        .append("<updated>").append(esc(updated)).append("</updated>")
        .append("<id>").append(esc(id)).append("</id></entry>\n")
    }
    sb.append("</feed>\n")
    finish(sb.toString, gzipped)
  }

  private def finish(xml: String, gzipped: Boolean): Array[Byte] = {
    val bytes = xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!gzipped) bytes
    else {
      val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(bytes)
      gz.close() // frees the native Deflater NOW (writeWarc's lesson)
      out.toByteArray
    }
  }
}
