package graft.operators

/** Sitemap parsing (sitemaps.org XML protocol) — the frontier-seeding
  * half of the robots surface: `Robots.sitemaps` says where a host's
  * sitemaps live, this reads them. Both document kinds are handled:
  * `<urlset>` (page entries with optional `<lastmod>`, the recrawl
  * scheduling signal) and `<sitemapindex>` (pointers to more sitemaps —
  * large sites shard their sitemaps exactly like we shard everything
  * else). Gzip-compressed sitemaps (`sitemap.xml.gz`, the common form)
  * are transparently decompressed.
  *
  * Parsing uses the JDK's DOM parser LOCKED DOWN for hostile input:
  * DOCTYPE declarations are disallowed outright, so a crawl cannot be
  * made to fetch external entities (XXE) or expand entity bombs — a
  * sitemap is attacker-controlled bytes and must be treated like every
  * other crawl payload: strict, bounded, never a vector.
  *
  * Scale shape: one sitemap is one record; parsing is a map-only
  * per-record walk, and the sitemap-index indirection is one more
  * flatMap round (bounded by the protocol: an index may not point at
  * another index).
  */
object Sitemaps {

  /** One entry: `kind` is "url" (page) or "sitemap" (index pointer). */
  final case class SitemapEntry(kind: String, loc: String, lastmod: Option[String])

  private val Gzip = Array[Byte](0x1f, 0x8b.toByte)

  /** sitemaps.org caps an uncompressed sitemap at 50 MB — enforce it on
    * the DECOMPRESSED bytes so a hostile tiny .xml.gz cannot inflate to
    * gigabytes per record (see [[Gunzip.bounded]]).
    */
  final val MaxUncompressedBytes: Long = 50L * 1024 * 1024

  def parse(bytes: Array[Byte]): Seq[SitemapEntry] = {
    val xml = if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1))
      Gunzip.bounded(bytes, MaxUncompressedBytes, "sitemap")
    else bytes
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(false)
    val doc = f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(xml))
    val root = doc.getDocumentElement
    val (entryTag, kind) = root.getTagName match {
      case "urlset" => ("url", "url")
      case "sitemapindex" => ("sitemap", "sitemap")
      case other => throw new IllegalArgumentException(
        s"sitemap: root element '$other' is neither urlset nor sitemapindex")
    }
    val nodes = root.getElementsByTagName(entryTag)
    (0 until nodes.getLength).flatMap { i =>
      val e = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      def child(tag: String): Option[String] = {
        val ns = e.getElementsByTagName(tag)
        if (ns.getLength == 0) None
        else Option(ns.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
      }
      child("loc").map(loc => SitemapEntry(kind, loc, child("lastmod")))
    }
  }

  /** Write a urlset (or, with `index = true`, a sitemapindex) — the demo
    * corpus builder and the round-trip half of the spec. Deterministic
    * output bytes.
    */
  def write(entries: Seq[(String, Option[String])], index: Boolean = false,
      gzipped: Boolean = false): Array[Byte] = {
    val (root, tag) = if (index) ("sitemapindex", "sitemap") else ("urlset", "url")
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"<$root>\n")
    entries.foreach { case (loc, lastmod) =>
      sb.append(s"  <$tag><loc>").append(escape(loc)).append("</loc>")
      lastmod.foreach(lm => sb.append("<lastmod>").append(escape(lm)).append("</lastmod>"))
      sb.append(s"</$tag>\n")
    }
    sb.append(s"</$root>\n")
    val xml = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!gzipped) xml
    else {
      val buf = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(buf)
      gz.write(xml)
      gz.close() // frees the native Deflater NOW (see writeWarc's lesson)
      buf.toByteArray
    }
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
