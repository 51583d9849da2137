package graft.operators

import java.nio.charset.StandardCharsets

/** Structural text extraction for ZIP-packaged office documents — the
  * second-biggest document class a web corpus carries after PDF: DOCX /
  * XLSX / PPTX (ISO/IEC 29500 OOXML — zips holding `word/document.xml`,
  * `xl/workbook.xml`, `ppt/presentation.xml`) and ODT (OASIS
  * OpenDocument 1.2 — a zip holding `content.xml`). All pure structure:
  * unzip (the existing CRC-verified, bounded [[Zip]] walk), then walk
  * the XML for paragraph / cell / slide text. No rendering, no styles,
  * no embedded media — the TEXT a training pipeline mines.
  *
  * Parser hardening matches [[Sitemaps]]: doctype declarations are
  * DISALLOWED (no XXE, no entity bombs — `disallow-doctype-decl` makes
  * a DTD a parse error), XInclude off, entity expansion off; only the
  * five predefined XML entities ever expand. Member decompression is
  * bounded by [[Zip.readMembers]]' cap.
  *
  * Extraction profile:
  *  - DOCX: `<w:p>` paragraphs in document order (table cells' paragraphs
  *    arrive in order too — they are `w:p` elements); within a paragraph,
  *    `<w:t>` runs concatenate, `<w:tab/>` becomes '\t' and `<w:br/>`/
  *    `<w:cr/>` '\n'. Headers/footers/footnotes live in OTHER zip members
  *    and are deliberately out of scope (body text only).
  *  - ODT: `<text:p>` and `<text:h>` paragraphs; `<text:tab/>` '\t',
  *    `<text:line-break/>` '\n', `<text:s text:c="N"/>` N spaces.
  *  - XLSX: worksheet rows in numeric sheet order, cells '\t'-joined —
  *    shared strings (incl. rich runs), inline strings, formula strings,
  *    booleans, raw numeric text.
  *  - PPTX: `<a:p>` paragraphs of every slide in numeric order, `<a:t>`
  *    runs concatenated, `<a:br/>` as '\n'.
  *  - OLE/CFB containers route through [[Cfb.kind]]: legacy `.doc` /
  *    `.xls` / `.ppt` extract via [[MsDoc]]/[[MsXls]]/[[MsPpt]];
  *    password-protected OOXML (the zip re-wrapped in CFB) is a NAMED
  *    reject. OUT of profile, rejected loudly (divert, don't die):
  *    archives missing the document member, malformed XML, zip damage
  *    (the Zip walk's own named rejects pass through).
  *
  * Scale shape: one document is one record; extraction is a map-only
  * per-record walk with zero driver state — identical distribution story
  * to the PDF/WARC walks.
  */
object OfficeCodec {

  /** Extracted document: paragraphs joined with '\n'. */
  final case class OfficeText(format: String, nParagraphs: Int, text: String)

  /** OLE/CFB compound-file magic (D0 CF 11 E0 A1 B1 1A E1) — legacy
    * binary Office AND encrypted OOXML both ship in it.
    */
  def isOle(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0xD0 && (b(1) & 0xff) == 0xCF &&
      (b(2) & 0xff) == 0x11 && (b(3) & 0xff) == 0xE0 &&
      (b(4) & 0xff) == 0xA1 && (b(5) & 0xff) == 0xB1 &&
      (b(6) & 0xff) == 0x1A && (b(7) & 0xff) == 0xE1

  /** Route on container + key member names — HEADER-ONLY (the zip
    * central directory, no payload decompression), so triage can
    * classify archives at scan cost. OLE routes through `Cfb.kind`
    * inside the extractors (doc/xls/ppt extract; encrypted OOXML is
    * the named reject), not here.
    */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (!Zip.isZip(bytes)) None
    else {
      val names = Zip.memberNames(bytes).toSet
      if (names.contains("word/document.xml")) Some("docx")
      else if (names.contains("xl/workbook.xml")) Some("xlsx")
      else if (names.contains("ppt/presentation.xml")) Some("pptx")
      else if (names.contains("META-INF/container.xml")) Some("epub")
      // content.xml is what the ODT extractor actually reads — a zip with
      // only a `mimetype` member (e.g. a malformed EPUB missing
      // container.xml) must NOT be promised as decodable, or triage says
      // "odt" and extractText throws "zip has no document member"
      else if (names.contains("content.xml")) Some("odt")
      else None
    }

  /** Extract body text from a DOCX or ODT, routing on the zip's members.
    * Throws `IllegalArgumentException` with a stable `office: ...` (or
    * `zip: ...`) reason for anything out of profile.
    */
  def extractText(bytes: Array[Byte]): OfficeText = {
    if (isOle(bytes)) {
      // legacy binary Office over the [MS-CFB] walk: .doc ([MS-DOC]
      // piece table), .xls ([MS-XLS] BIFF8/BIFF5), .ppt ([MS-PPT]
      // record tree); encrypted OOXML stays a NAMED reject
      Cfb.kind(bytes) match {
        case Some("doc") =>
          val text = MsDoc.extractText(bytes)
          val paras = text.split("\n", -1)
          return OfficeText("doc", paras.count(_.nonEmpty), text)
        case Some("xls") =>
          val x = MsXls.extract(bytes)
          return OfficeText("xls", x.cells.length, x.text)
        case Some("ppt") =>
          val texts = MsPpt.extractTexts(bytes)
          return OfficeText("ppt", texts.length, MsPpt.extractText(bytes))
        case Some("encrypted-ooxml") =>
          // modern password protection ([MS-OFFCRYPTO] §2.3.4): decrypt
          // under Office's transparent-open default password and recurse
          // into the OPC zip; a REAL password stays the named reject
          // ("ooxml-crypto: password required ...") — never a guess
          return extractText(OoxmlCrypto.decrypt(bytes))
        case Some(k) => throw new IllegalArgumentException(
          s"office: OLE/CFB container holds '$k' (no extractor yet)")
        case None => throw new IllegalArgumentException(
          "office: OLE/CFB container without a known document stream")
      }
    }
    require(Zip.isZip(bytes), "office: not a zip container")
    val members = Zip.readMembers(bytes)
    val byName = members.map(m => m.name -> m).toMap
    if (byName.contains("word/document.xml"))
      extractDocxXml(byName("word/document.xml").payload)
    else if (byName.contains("xl/workbook.xml"))
      extractXlsx(members)
    else if (byName.contains("ppt/presentation.xml"))
      extractPptx(members)
    else if (byName.contains("META-INF/container.xml"))
      extractEpub(members)
    else if (byName.contains("content.xml"))
      extractOdtXml(byName("content.xml").payload)
    else throw new IllegalArgumentException(
      "office: zip has no document member (word/document.xml, " +
        "xl/workbook.xml, ppt/presentation.xml, META-INF/container.xml," +
        " or content.xml)")
  }

  /** EPUB (OCF + OPF, the EPUB 3 / IDPF profile): container.xml names
    * the OPF rootfile, the OPF's `<spine>` orders `<manifest>` items,
    * and each XHTML chapter contributes its block text — text nodes
    * concatenated, a '\n' after every p / h1-h6 / li / tr / blockquote /
    * div close and `<br/>`, `script`/`style` subtrees skipped. XHTML
    * carrying DTD-entity references (`&nbsp;`) rejects with the doctype
    * rule like every other XML here — real EPUB 3 is entity-free UTF-8;
    * paragraph counts are the nonempty block count.
    */
  private def extractEpub(members: Seq[Zip.ZipMember]): OfficeText = {
    val byName = members.map(m => m.name -> m).toMap
    val container = parseXml(byName("META-INF/container.xml").payload,
      "META-INF/container.xml")
    val rootfiles = container.getElementsByTagName("rootfile")
    require(rootfiles.getLength > 0, "office: epub container has no rootfile")
    val opfPath = rootfiles.item(0).asInstanceOf[org.w3c.dom.Element]
      .getAttribute("full-path")
    val opfMember = byName.getOrElse(opfPath, throw new IllegalArgumentException(
      s"office: epub rootfile '$opfPath' not in the archive"))
    val opf = parseXml(opfMember.payload, opfPath)
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    val hrefById = {
      val items = opf.getElementsByTagName("item")
      (0 until items.getLength).map { i =>
        val e = items.item(i).asInstanceOf[org.w3c.dom.Element]
        e.getAttribute("id") -> e.getAttribute("href")
      }.toMap
    }
    val refs = opf.getElementsByTagName("itemref")
    val chapters = (0 until refs.getLength).map { i =>
      val idref = refs.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("idref")
      val href = hrefById.getOrElse(idref, throw new IllegalArgumentException(
        s"office: epub spine idref '$idref' not in the manifest"))
      opfDir + href
    }
    var nBlocks = 0
    val texts = chapters.map { path =>
      val m = byName.getOrElse(path, throw new IllegalArgumentException(
        s"office: epub chapter '$path' not in the archive"))
      val doc = parseXml(m.payload, path)
      val sb = new java.lang.StringBuilder
      val bodies = doc.getElementsByTagName("body")
      (0 until bodies.getLength).foreach(i => walkXhtml(bodies.item(i), sb))
      val t = sb.toString
      val trimmed = if (t.endsWith("\n")) t.substring(0, t.length - 1) else t
      nBlocks += trimmed.split("\n", -1).count(_.nonEmpty)
      trimmed
    }.filter(_.nonEmpty)
    OfficeText("epub", nBlocks, texts.mkString("\n"))
  }

  private val XhtmlBlocks = Set("p", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "blockquote", "div")

  private def walkXhtml(n: org.w3c.dom.Node, sb: java.lang.StringBuilder): Unit = {
    val kids = n.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val k = kids.item(i)
      k.getNodeType match {
        case org.w3c.dom.Node.TEXT_NODE => sb.append(k.getNodeValue)
        case org.w3c.dom.Node.ELEMENT_NODE =>
          val name = k.getNodeName.toLowerCase(java.util.Locale.ROOT)
          if (name == "script" || name == "style") () // never text
          else if (name == "br") sb.append('\n')
          else {
            walkXhtml(k, sb)
            if (XhtmlBlocks(name) && sb.length > 0 &&
              sb.charAt(sb.length - 1) != '\n') sb.append('\n')
          }
        case _ => ()
      }
      i += 1
    }
  }

  /** Minimal spec-correct EPUB 3 writer: OCF layout (stored `mimetype`
    * first), container.xml -> OEBPS/content.opf -> one XHTML chapter
    * per outer Seq entry, each inner string a `<p>`.
    */
  def writeEpub(chapters: Seq[Seq[String]]): Array[Byte] = {
    require(chapters.nonEmpty && chapters.forall(_.nonEmpty),
      "epub write: at least one chapter with at least one paragraph")
    chapters.flatten.foreach(p => require(!p.contains('\r') && !p.contains('\n'),
      "epub write: paragraph text must be single-line (CR/LF are block framing)"))
    val container =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "\n<container version=\"1.0\" xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\"" +
        " media-type=\"application/oebps-package+xml\"/></rootfiles></container>"
    val manifest = chapters.indices.map(i =>
      s"""<item id="c${i + 1}" href="chapter${i + 1}.xhtml" media-type="application/xhtml+xml"/>""").mkString
    val spine = chapters.indices.map(i => s"""<itemref idref="c${i + 1}"/>""").mkString
    val opf =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "\n<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\" unique-identifier=\"id\">" +
        "<metadata><dc:identifier xmlns:dc=\"http://purl.org/dc/elements/1.1/\" id=\"id\">graft</dc:identifier></metadata>" +
        s"<manifest>$manifest</manifest><spine>$spine</spine></package>"
    val chapterXmls = chapters.map { paras =>
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "\n<html xmlns=\"http://www.w3.org/1999/xhtml\"><head><title>c</title></head><body>" +
        paras.map(p => s"<p>${xmlEscape(p)}</p>").mkString +
        "</body></html>"
    }
    Zip.writeZip(
      Seq("mimetype" -> "application/epub+zip".getBytes(StandardCharsets.US_ASCII),
        "META-INF/container.xml" -> container.getBytes(StandardCharsets.UTF_8),
        "OEBPS/content.opf" -> opf.getBytes(StandardCharsets.UTF_8)) ++
        chapterXmls.zipWithIndex.map { case (x, i) =>
          s"OEBPS/chapter${i + 1}.xhtml" -> x.getBytes(StandardCharsets.UTF_8)
        },
      deflate = false) // stored keeps the OCF mimetype-first magic readable
  }

  /** Numeric-aware member order: `sheet10.xml` AFTER `sheet9.xml` — plain
    * string order would interleave them.
    */
  private def partOrder(name: String): (String, Long) = {
    val stem = name.takeWhile(c => !c.isDigit)
    val num = name.drop(stem.length).takeWhile(_.isDigit)
    (stem, if (num.isEmpty) -1L else num.toLong)
  }

  /** XLSX (SpreadsheetML): worksheet cells row-wise — shared strings
    * (`t="s"`, rich runs concatenated), inline strings (`t="inlineStr"`),
    * formula strings (`t="str"`), booleans, and raw numeric `<v>` text.
    * One extracted "paragraph" per row: cells joined with '\t', sheets
    * separated like any other paragraph break.
    */
  private def extractXlsx(members: Seq[Zip.ZipMember]): OfficeText = {
    val byName = members.map(m => m.name -> m).toMap
    val shared: Vector[String] = byName.get("xl/sharedStrings.xml") match {
      case None => Vector.empty
      case Some(m) =>
        val doc = parseXml(m.payload, "xl/sharedStrings.xml")
        val sis = doc.getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          // a shared string is one <t> or rich <r><t> runs — textContent
          // of the <si> concatenates exactly those
          sis.item(i).getTextContent
        }.toVector
    }
    val sheets = members.map(_.name)
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .sortBy(partOrder)
    val rows = Vector.newBuilder[String]
    sheets.foreach { name =>
      val doc = parseXml(byName(name).payload, name)
      val rs = doc.getElementsByTagName("row")
      (0 until rs.getLength).foreach { i =>
        val r = rs.item(i).asInstanceOf[org.w3c.dom.Element]
        val cs = r.getElementsByTagName("c")
        val cells = (0 until cs.getLength).map { j =>
          val c = cs.item(j).asInstanceOf[org.w3c.dom.Element]
          val t = c.getAttribute("t")
          t match {
            case "s" =>
              val idx = c.getTextContent.trim.toInt
              require(idx >= 0 && idx < shared.length,
                s"office: shared-string index $idx out of ${shared.length}")
              shared(idx)
            case "inlineStr" => c.getTextContent
            case "b" => if (c.getTextContent.trim == "1") "TRUE" else "FALSE"
            case _ => c.getTextContent.trim // "str", numeric, dates-as-serials
          }
        }
        rows += cells.mkString("\t")
      }
    }
    val texts = rows.result()
    OfficeText("xlsx", texts.length, texts.mkString("\n"))
  }

  /** PPTX (PresentationML): slide text — `<a:p>` paragraphs with their
    * `<a:t>` runs concatenated and `<a:br/>` as '\n', slides in numeric
    * order.
    */
  private def extractPptx(members: Seq[Zip.ZipMember]): OfficeText = {
    val byName = members.map(m => m.name -> m).toMap
    val slides = members.map(_.name)
      .filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
      .sortBy(partOrder)
    val paras = Vector.newBuilder[String]
    slides.foreach { name =>
      val doc = parseXml(byName(name).payload, name)
      val ps = doc.getElementsByTagName("a:p")
      (0 until ps.getLength).foreach { i =>
        val sb = new java.lang.StringBuilder
        walkPptx(ps.item(i), sb)
        paras += sb.toString
      }
    }
    val texts = paras.result()
    OfficeText("pptx", texts.length, texts.mkString("\n"))
  }

  private def walkPptx(n: org.w3c.dom.Node, sb: java.lang.StringBuilder): Unit = {
    val kids = n.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val k = kids.item(i)
      k.getNodeName match {
        case "a:t" => sb.append(k.getTextContent)
        case "a:br" => sb.append('\n')
        case "a:p" => () // nested paragraph: its own entry
        case _ => walkPptx(k, sb)
      }
      i += 1
    }
  }

  private def parseXml(bytes: Array[Byte], what: String): org.w3c.dom.Document =
    try XmlWalk.parse(bytes)
    catch {
      case e: org.xml.sax.SAXException =>
        throw new IllegalArgumentException(s"office: malformed $what XML (${e.getMessage})")
    }

  /** DOCX body walk (namespace prefixes are matched literally — `w:` is
    * the universal convention and non-`w:` producers fall outside the
    * profile loudly via the no-paragraph result, never silently).
    */
  private def extractDocxXml(xml: Array[Byte]): OfficeText = {
    val doc = parseXml(xml, "word/document.xml")
    val paras = doc.getElementsByTagName("w:p")
    val texts = (0 until paras.getLength).map { i =>
      val sb = new java.lang.StringBuilder
      walkDocx(paras.item(i), sb)
      sb.toString
    }
    OfficeText("docx", texts.length, texts.mkString("\n"))
  }

  private def walkDocx(n: org.w3c.dom.Node, sb: java.lang.StringBuilder): Unit = {
    val kids = n.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val k = kids.item(i)
      k.getNodeName match {
        case "w:t" => sb.append(k.getTextContent)
        case "w:tab" => sb.append('\t')
        case "w:br" | "w:cr" => sb.append('\n')
        case "w:p" => () // a nested paragraph is its own entry in the flat list
        case _ => walkDocx(k, sb)
      }
      i += 1
    }
  }

  /** ODT content walk: text:p / text:h paragraphs (flat, document
    * order — getElementsByTagName returns nested table-cell paragraphs
    * too, which we skip when revisited inside a parent to avoid
    * double-counting).
    */
  private def extractOdtXml(xml: Array[Byte]): OfficeText = {
    val doc = parseXml(xml, "content.xml")
    val all = doc.getElementsByTagName("*")
    val paras = Vector.newBuilder[org.w3c.dom.Node]
    var i = 0
    while (i < all.getLength) {
      val n = all.item(i)
      val name = n.getNodeName
      if ((name == "text:p" || name == "text:h") && !hasParaAncestor(n))
        paras += n
      i += 1
    }
    val texts = paras.result().map { p =>
      val sb = new java.lang.StringBuilder
      walkOdt(p, sb)
      sb.toString
    }
    OfficeText("odt", texts.length, texts.mkString("\n"))
  }

  private def hasParaAncestor(n: org.w3c.dom.Node): Boolean = {
    var p = n.getParentNode
    while (p != null) {
      val nm = p.getNodeName
      if (nm == "text:p" || nm == "text:h") return true
      p = p.getParentNode
    }
    false
  }

  private def walkOdt(n: org.w3c.dom.Node, sb: java.lang.StringBuilder): Unit = {
    val kids = n.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val k = kids.item(i)
      k.getNodeType match {
        case org.w3c.dom.Node.TEXT_NODE => sb.append(k.getNodeValue)
        case org.w3c.dom.Node.ELEMENT_NODE => k.getNodeName match {
          case "text:tab" => sb.append('\t')
          case "text:line-break" => sb.append('\n')
          case "text:s" =>
            val c = Option(k.getAttributes.getNamedItem("text:c"))
              .map(_.getNodeValue.toInt).getOrElse(1)
            require(c >= 0 && c <= (1 << 20), s"office: text:s count $c out of range")
            var j = 0
            while (j < c) { sb.append(' '); j += 1 }
          case "text:p" | "text:h" => () // nested paragraph: own entry
          case _ => walkOdt(k, sb)
        }
        case _ => ()
      }
      i += 1
    }
  }

  // --------------------------------------------------------------- writers

  private def xmlEscape(s: String): String = {
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

  /** Paragraph text -> the `w:r`/`w:t` run sequence: '\t' emits
    * `<w:tab/>`, '\n' `<w:br/>`, text runs carry `xml:space="preserve"`
    * so leading/trailing spaces survive real readers.
    */
  private def docxRuns(p: String): String = {
    val sb = new java.lang.StringBuilder("<w:r>")
    var text = new java.lang.StringBuilder
    def flush(): Unit = {
      if (text.length > 0) {
        sb.append("<w:t xml:space=\"preserve\">")
          .append(xmlEscape(text.toString)).append("</w:t>")
        text = new java.lang.StringBuilder
      }
    }
    p.foreach {
      case '\t' => flush(); sb.append("<w:tab/>")
      case '\n' => flush(); sb.append("<w:br/>")
      case c => text.append(c)
    }
    flush()
    sb.append("</w:r>").toString
  }

  /** Minimal spec-correct DOCX writer — the oracle half: deterministic
    * bytes, `extractText(writeDocx(paras)).text == paras.mkString("\n")`
    * for paragraphs free of '\r' (CR normalizes to LF in XML parsing, so
    * it is a caller error here).
    */
  def writeDocx(paragraphs: Seq[String]): Array[Byte] = {
    require(paragraphs.nonEmpty, "docx write: at least one paragraph")
    paragraphs.foreach(p => require(!p.contains('\r'),
      "docx write: CR does not round-trip through XML"))
    val body = paragraphs.map(p => s"<w:p>${docxRuns(p)}</w:p>").mkString
    val documentXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        s"<w:body>$body</w:body></w:document>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/word/document.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml\"/>" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"word/document.xml\"/>" +
        "</Relationships>"
    Zip.writeZip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(StandardCharsets.UTF_8),
      "_rels/.rels" -> rels.getBytes(StandardCharsets.UTF_8),
      "word/document.xml" -> documentXml.getBytes(StandardCharsets.UTF_8)),
      deflate = true)
  }

  /** Minimal spec-correct XLSX writer: one worksheet per outer Seq
    * entry; string cells go through a DEDUPLICATED sharedStrings table
    * (`t="s"`, the layout real producers emit), integer-looking cells
    * as numeric `<v>`. `extractText(writeXlsx(sheets))` equals the rows
    * tab-joined, sheets concatenated.
    */
  def writeXlsx(sheets: Seq[Seq[Seq[String]]]): Array[Byte] = {
    require(sheets.nonEmpty && sheets.forall(_.nonEmpty),
      "xlsx write: at least one sheet with at least one row")
    val flat = sheets.flatten.flatten
    flat.foreach(c => require(!c.contains('\r') && !c.contains('\n') && !c.contains('\t'),
      "xlsx write: cell text must be free of CR/LF/TAB (they are row/cell framing)"))
    def isNum(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    flat.filterNot(isNum).foreach(s =>
      if (!sharedIdx.contains(s)) sharedIdx(s) = sharedIdx.size)
    val sharedXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"" +
        s" count=\"${sharedIdx.size}\" uniqueCount=\"${sharedIdx.size}\">" +
        sharedIdx.keys.map(s => s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>").mkString +
        "</sst>"
    def colName(j: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA ...
      var n = j + 1; val sb = new java.lang.StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXmls = sheets.map { rows =>
      val body = rows.zipWithIndex.map { case (cells, i) =>
        val cs = cells.zipWithIndex.map { case (cell, j) =>
          val ref = s"${colName(j)}${i + 1}"
          if (isNum(cell)) s"""<c r="$ref"><v>$cell</v></c>"""
          else s"""<c r="$ref" t="s"><v>${sharedIdx(cell)}</v></c>"""
        }.mkString
        s"""<row r="${i + 1}">$cs</row>"""
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        s"<sheetData>$body</sheetData></worksheet>"
    }
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"" +
        " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
        sheets.indices.map(i =>
          s"""<sheet name="Sheet${i + 1}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""").mkString +
        "</sheets></workbook>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
        "</Types>"
    Zip.writeZip(
      Seq("[Content_Types].xml" -> contentTypes.getBytes(StandardCharsets.UTF_8),
        "xl/workbook.xml" -> workbook.getBytes(StandardCharsets.UTF_8),
        "xl/sharedStrings.xml" -> sharedXml.getBytes(StandardCharsets.UTF_8)) ++
        sheetXmls.zipWithIndex.map { case (x, i) =>
          s"xl/worksheets/sheet${i + 1}.xml" -> x.getBytes(StandardCharsets.UTF_8)
        },
      deflate = true)
  }

  /** Minimal spec-correct PPTX writer: one slide per outer Seq entry,
    * paragraphs as `<a:p>` with '\n' inside a paragraph as `<a:br/>`.
    */
  def writePptx(slides: Seq[Seq[String]]): Array[Byte] = {
    require(slides.nonEmpty && slides.forall(_.nonEmpty),
      "pptx write: at least one slide with at least one paragraph")
    slides.flatten.foreach(p => require(!p.contains('\r'),
      "pptx write: CR does not round-trip through XML"))
    val slideXmls = slides.map { paras =>
      val body = paras.map { p =>
        val runs = p.split("\n", -1).map(seg =>
          s"<a:r><a:t>${xmlEscape(seg)}</a:t></a:r>").mkString("<a:br/>")
        s"<a:p>$runs</a:p>"
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\"" +
        " xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">" +
        "<p:cSld><p:spTree><p:sp><p:txBody>" + body +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    }
    val presentation =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\"/>"
    Zip.writeZip(
      Seq("ppt/presentation.xml" -> presentation.getBytes(StandardCharsets.UTF_8)) ++
        slideXmls.zipWithIndex.map { case (x, i) =>
          s"ppt/slides/slide${i + 1}.xml" -> x.getBytes(StandardCharsets.UTF_8)
        },
      deflate = true)
  }

  /** Minimal spec-correct ODT writer (OpenDocument 1.2 §2.2.1: the
    * `mimetype` member first and STORED, as the format requires).
    */
  def writeOdt(paragraphs: Seq[String]): Array[Byte] = {
    require(paragraphs.nonEmpty, "odt write: at least one paragraph")
    paragraphs.foreach(p => require(!p.contains('\r'),
      "odt write: CR does not round-trip through XML"))
    val body = paragraphs.map { p =>
      val runs = p.split("\n", -1).map { seg =>
        seg.split("\t", -1).map(xmlEscape).mkString("<text:tab/>")
      }.mkString("<text:line-break/>")
      s"<text:p>$runs</text:p>"
    }.mkString
    val contentXml =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "\n<office:document-content" +
        " xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\"" +
        " xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\"" +
        " office:version=\"1.2\"><office:body><office:text>" +
        body + "</office:text></office:body></office:document-content>"
    val manifest =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "\n<manifest:manifest xmlns:manifest=\"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0\" manifest:version=\"1.2\">" +
        "<manifest:file-entry manifest:full-path=\"/\" manifest:media-type=\"application/vnd.oasis.opendocument.text\"/>" +
        "<manifest:file-entry manifest:full-path=\"content.xml\" manifest:media-type=\"text/xml\"/>" +
        "</manifest:manifest>"
    // mimetype FIRST and STORED (uncompressed), per the spec's magic rule
    val mimetype = "application/vnd.oasis.opendocument.text"
    Zip.writeZip(Seq(
      "mimetype" -> mimetype.getBytes(StandardCharsets.US_ASCII),
      "content.xml" -> contentXml.getBytes(StandardCharsets.UTF_8),
      "META-INF/manifest.xml" -> manifest.getBytes(StandardCharsets.UTF_8)),
      deflate = false)
  }
}
