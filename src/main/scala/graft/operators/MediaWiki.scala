package graft.operators

import java.nio.charset.StandardCharsets

/** MediaWiki XML export mining — THE classic public training-data
  * source (Wikipedia dumps ship as `pages-articles.xml.bz2`). Public
  * format: the MediaWiki export schema (Special:Export /
  * dumps.wikimedia.org): `<mediawiki>` → `<page>` (title, ns, id) →
  * `<revision>` (id, timestamp, contributor/username, `<text>`).
  * Parsed through the ONE hardened XML walk every structural codec
  * shares (doctype = parse error, bounded input), after the bounded
  * [[Bzip2]]/gzip-transparent decompress.
  *
  * [[cleanWikitext]] is the light, deterministic markup strip a
  * corpus pass wants BEFORE tokenization: `{{templates}}` dropped
  * (nested, depth-capped), `[[target|label]]` → label / `[[target]]`
  * → target (File:/Category: links dropped entirely), `'''bold''' /
  * ''italic''` quotes unwrapped, `<ref>...</ref>` and HTML comments
  * removed, heading `== x ==` bars stripped. It is NOT a renderer —
  * it is the normalization step, and everything it does is
  * deterministic so oracles can replay expected outputs exactly.
  *
  * Scale shape: one dump SHARD is one record (the real dumps are
  * multistream exactly so readers can explode shards in parallel);
  * page extraction is a map-only per-record walk.
  */
object MediaWiki {

  final val MaxDumpBytes = 256 << 20
  final val MaxPages = 1 << 20
  final val MaxTemplateDepth = 32

  /** `redirect` carries the `<redirect title="..."/>` target the real
    * dumps ship on redirect pages (their wikitext is `#REDIRECT
    * [[Target]]`, but the element is the machine-readable field).
    */
  final case class WikiPage(pageId: Long, title: String, ns: Int,
      username: String, timestamp: String, wikitext: String,
      redirect: Option[String] = None)

  /** Parse one export shard (raw XML bytes, NOT compressed). */
  def parseDump(xml: Array[Byte]): Seq[WikiPage] =
    parseDumpWithSiteinfo(xml)._2

  /** The real dumps lead with `<siteinfo>` carrying the namespace
    * id → name map (`<namespaces><namespace key="1">Talk</namespace>`,
    * key 0 self-closed = the unnamed article space) — the lookup that
    * canonicalizes `ns` integers and prefixed titles. Returns it
    * alongside the pages; a shard without one (ranged mid-dump reads)
    * yields an empty map.
    */
  def parseDumpWithSiteinfo(xml: Array[Byte]): (Map[Int, String], Seq[WikiPage]) = {
    require(xml.length <= MaxDumpBytes, "wiki: dump shard past the cap")
    val doc =
      try XmlWalk.parse(xml)
      catch { case e: org.xml.sax.SAXException =>
        throw new IllegalArgumentException(s"wiki: malformed export XML (${e.getMessage})")
      }
    require(doc.getDocumentElement.getTagName == "mediawiki",
      s"wiki: root element '${doc.getDocumentElement.getTagName}' is not <mediawiki>")
    val nsNodes = doc.getElementsByTagName("namespace")
    val namespaces = (0 until nsNodes.getLength).flatMap { i =>
      val e = nsNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      e.getAttribute("key").trim.toIntOption.map(_ -> e.getTextContent)
    }.toMap
    val pages = doc.getElementsByTagName("page")
    require(pages.getLength <= MaxPages, "wiki: more pages than the cap")
    val parsed = (0 until pages.getLength).map { i =>
      val p = pages.item(i).asInstanceOf[org.w3c.dom.Element]
      def child(e: org.w3c.dom.Element, name: String): Option[org.w3c.dom.Element] = {
        val kids = e.getChildNodes
        (0 until kids.getLength).iterator.map(kids.item)
          .collectFirst { case el: org.w3c.dom.Element if el.getTagName == name => el }
      }
      def textOf(e: Option[org.w3c.dom.Element]): String =
        e.map(_.getTextContent).getOrElse("")
      val rev = child(p, "revision")
      val contributor = rev.flatMap(child(_, "contributor"))
      WikiPage(
        pageId = textOf(child(p, "id")).trim.toLongOption.getOrElse(-1L),
        title = textOf(child(p, "title")),
        ns = textOf(child(p, "ns")).trim.toIntOption.getOrElse(0),
        username = textOf(contributor.flatMap(child(_, "username"))),
        timestamp = textOf(rev.flatMap(child(_, "timestamp"))),
        wikitext = textOf(rev.flatMap(child(_, "text"))),
        redirect = child(p, "redirect").map(_.getAttribute("title")))
    }
    (namespaces, parsed)
  }

  /** Light deterministic wikitext → plain text (see object doc). */
  def cleanWikitext(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    val n = w.length
    def startsAt(s: String, at: Int): Boolean = w.regionMatches(at, s, 0, s.length)
    while (i < n) {
      if (startsAt("{{", i)) {
        // drop the template span, tracking nesting
        var depth = 1
        i += 2
        while (i < n && depth > 0) {
          if (startsAt("{{", i)) { depth += 1; i += 2 }
          else if (startsAt("}}", i)) { depth -= 1; i += 2 }
          else i += 1
          require(depth <= MaxTemplateDepth, "wiki: templates nested past the cap")
        }
      } else if (startsAt("<!--", i)) {
        val end = w.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (startsAt("<ref", i)) {
        // <ref .../> self-closed, or <ref ...>...</ref>
        val close = w.indexOf('>', i + 4)
        if (close < 0) i = n
        else if (w.charAt(close - 1) == '/') i = close + 1
        else {
          val end = w.indexOf("</ref>", close + 1)
          i = if (end < 0) n else end + 6
        }
      } else if (startsAt("[[", i)) {
        val end = w.indexOf("]]", i + 2)
        if (end < 0) { sb.append("[["); i += 2 }
        else {
          val inner = w.substring(i + 2, end)
          val colon = inner.indexOf(':')
          val prefix = if (colon > 0) inner.substring(0, colon) else ""
          if (prefix == "File" || prefix == "Image" || prefix == "Category") ()
          else {
            val bar = inner.lastIndexOf('|')
            sb.append(if (bar >= 0) inner.substring(bar + 1) else inner)
          }
          i = end + 2
        }
      } else if (startsAt("'''", i)) { i += 3 }
      else if (startsAt("''", i)) { i += 2 }
      else if (startsAt("==", i)) {
        // heading bars (any run of '=') strip; the title text stays
        while (i < n && w.charAt(i) == '=') i += 1
      } else {
        sb.append(w.charAt(i))
        i += 1
      }
    }
    // collapse the whitespace the stripping leaves behind
    sb.toString.split("\n").map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  // ------------------------------------------------------------- writer

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val headerXml =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<mediawiki version=\"0.10\" xml:lang=\"en\">\n" +
      "  <siteinfo>\n" +
      "    <sitename>Graftpedia</sitename>\n" +
      "    <namespaces>\n" +
      "      <namespace key=\"-1\" case=\"first-letter\">Special</namespace>\n" +
      "      <namespace key=\"0\" case=\"first-letter\" />\n" +
      "      <namespace key=\"1\" case=\"first-letter\">Talk</namespace>\n" +
      "      <namespace key=\"2\" case=\"first-letter\">User</namespace>\n" +
      "      <namespace key=\"6\" case=\"first-letter\">File</namespace>\n" +
      "      <namespace key=\"10\" case=\"first-letter\">Template</namespace>\n" +
      "      <namespace key=\"14\" case=\"first-letter\">Category</namespace>\n" +
      "    </namespaces>\n" +
      "  </siteinfo>\n"
  private val footerXml = "</mediawiki>\n"

  private def pageXml(p: WikiPage): String = {
    val sb = new StringBuilder
    sb.append("  <page>\n")
    sb.append(s"    <title>${esc(p.title)}</title>\n")
    sb.append(s"    <ns>${p.ns}</ns>\n")
    sb.append(s"    <id>${p.pageId}</id>\n")
    p.redirect.foreach(t =>
      sb.append(s"    <redirect title=\"${esc(t).replace("\"", "&quot;")}\" />\n"))
    sb.append("    <revision>\n")
    sb.append(s"      <id>${p.pageId * 10}</id>\n")
    sb.append(s"      <timestamp>${esc(p.timestamp)}</timestamp>\n")
    sb.append("      <contributor><username>")
    sb.append(esc(p.username))
    sb.append("</username></contributor>\n")
    sb.append("      <text xml:space=\"preserve\">")
    sb.append(esc(p.wikitext))
    sb.append("</text>\n")
    sb.append("    </revision>\n")
    sb.append("  </page>\n")
    sb.toString
  }

  /** Deterministic export-shard writer — the fixture half. */
  def writeDump(pages: Seq[WikiPage]): Array[Byte] = {
    require(pages.nonEmpty, "wiki write: at least one page")
    (headerXml + pages.map(pageXml).mkString + footerXml)
      .getBytes(StandardCharsets.UTF_8)
  }

  /** One multistream-index line, exactly the published format:
    * `offset:pageId:title` where offset is the byte position of the
    * bz2 stream the page lives in.
    */
  final case class IndexEntry(offset: Long, pageId: Long, title: String)

  /** The REAL dump layout (`pages-articles-multistream.xml.bz2` +
    * `…-multistream-index.txt.bz2`): independent bz2 streams
    * concatenated byte-to-byte — stream 0 carries the header through
    * `<siteinfo>`, then batches of `pagesPerStream` `<page>` elements
    * per stream, then a final stream with `</mediawiki>`. The full
    * concatenation decompresses to EXACTLY [[writeDump]]'s XML, while
    * the index enables ranged reads of one page batch without touching
    * the rest of the dump. Returns (dump bytes, index entries).
    */
  def writeMultistreamDump(pages: Seq[WikiPage],
      pagesPerStream: Int = 4): (Array[Byte], Seq[IndexEntry]) = {
    require(pages.nonEmpty, "wiki write: at least one page")
    require(pagesPerStream >= 1, "wiki write: pagesPerStream >= 1")
    val out = new java.io.ByteArrayOutputStream()
    val index = Seq.newBuilder[IndexEntry]
    out.write(Bzip2.compress(headerXml.getBytes(StandardCharsets.UTF_8)))
    pages.grouped(pagesPerStream).foreach { grp =>
      val off = out.size().toLong
      grp.foreach(p => index += IndexEntry(off, p.pageId, p.title))
      out.write(Bzip2.compress(
        grp.map(pageXml).mkString.getBytes(StandardCharsets.UTF_8)))
    }
    out.write(Bzip2.compress(footerXml.getBytes(StandardCharsets.UTF_8)))
    (out.toByteArray, index.result())
  }

  /** Render index entries as the shipped `multistream-index.txt` text
    * (one `offset:pageId:title` line per page).
    */
  def writeIndexText(entries: Seq[IndexEntry]): String =
    entries.map(e => s"${e.offset}:${e.pageId}:${e.title}").mkString("", "\n", "\n")

  /** Parse a `multistream-index.txt`. Titles may contain ':', so split
    * on the FIRST TWO colons only — the published format's rule.
    */
  def parseIndexText(text: String): Seq[IndexEntry] =
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val c1 = line.indexOf(':')
      val c2 = line.indexOf(':', c1 + 1)
      require(c1 > 0 && c2 > c1, s"wiki index: malformed line '$line'")
      IndexEntry(line.substring(0, c1).toLong,
        line.substring(c1 + 1, c2).toLong, line.substring(c2 + 1))
    }.toSeq

  /** Ranged read: decode ONLY the bz2 stream at `offset` of a
    * multistream dump and parse its `<page>` batch (the page-batch
    * streams carry bare `<page>` fragments, so wrap them in a root for
    * the hardened walk). This is the access path the index buys: at
    * production scale `offset .. next-offset` is the ONLY byte range
    * fetched.
    */
  def pagesAt(dump: Array[Byte], offset: Long): Seq[WikiPage] = {
    require(offset >= 0 && offset < dump.length, s"wiki: index offset $offset out of range")
    val (fragment, _) = Bzip2.decompressOne(dump, offset.toInt, MaxDumpBytes)
    val wrapped = ("<mediawiki>\n" +
      new String(fragment, StandardCharsets.UTF_8) +
      "</mediawiki>\n").getBytes(StandardCharsets.UTF_8)
    parseDump(wrapped)
  }
}
