package graft.operators

import java.nio.charset.StandardCharsets

/** Legacy PowerPoint binary (.ppt) text extraction — [MS-PPT] over the
  * [MS-CFB] container ([[Cfb]]). The `PowerPoint Document` stream is a
  * tree of 8-byte-headed records (recVer/recInstance, recType,
  * recLen); containers have recVer 0xF and nest. Text lives in two
  * atoms — TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
  * one byte per char, the low bytes of UTF-16) — and a mining pass
  * wants exactly those in STREAM ORDER, which is the documented layout
  * order of the SlideListWithText/Slide containers. CStrings (0x0FBA,
  * UTF-16 names) are skipped: they are editor metadata, not slide
  * text. Paragraph marks (0x0D) inside atoms map to '\n' like every
  * extractor here.
  *
  * Encrypted decks (a CryptSession10Container, recType 0x2F14) are a
  * NAMED reject; so are truncated record trees — never a hang (depth
  * and total-size caps).
  *
  * Scale shape: per-record scalar walk, the document-family story.
  */
object MsPpt {

  final val MaxDepth = 64
  final val MaxTextBytes = 64 << 20

  private final val TextCharsAtom = 0x0FA0
  private final val TextBytesAtom = 0x0FA8
  private final val CryptSession = 0x2F14

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Extract all slide text (one string per text atom, in stream
    * order). Throws named `IllegalArgumentException`s out of profile.
    */
  def extractTexts(bytes: Array[Byte]): Seq[String] = {
    val strs = Cfb.streams(bytes)
    val doc = strs.getOrElse("PowerPoint Document",
      throw new IllegalArgumentException(
        "ppt: OLE container has no PowerPoint Document stream"))
    val out = Vector.newBuilder[String]
    var total = 0L
    def clean(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length)
      s.foreach {
        case '\r' | '\u000B' => sb.append('\n')
        case c => sb.append(c)
      }
      // trailing paragraph mark is framing
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
        sb.setLength(sb.length - 1)
      sb.toString
    }
    def walk(lo: Int, hi: Int, depth: Int): Unit = {
      require(depth < MaxDepth, "ppt: record tree deeper than the cap")
      var o = lo
      while (o + 8 <= hi) {
        val verInst = u16(doc, o)
        val recType = u16(doc, o + 2)
        val len = u32(doc, o + 4)
        require(len >= 0 && o + 8 + len <= hi,
          f"ppt: record 0x$recType%04X at $o runs past its container")
        val body = o + 8
        val end = (body + len).toInt
        if (recType == CryptSession)
          throw new IllegalArgumentException(
            "ppt: encrypted presentation (CryptSession10) unsupported")
        if ((verInst & 0x0F) == 0x0F) walk(body, end, depth + 1)
        else if (recType == TextCharsAtom) {
          total += len
          require(total <= MaxTextBytes, "ppt: more text than the cap")
          out += clean(new String(doc, body, len.toInt, StandardCharsets.UTF_16LE))
        } else if (recType == TextBytesAtom) {
          total += len
          require(total <= MaxTextBytes, "ppt: more text than the cap")
          val sb = new java.lang.StringBuilder(len.toInt)
          var i = body
          while (i < end) { sb.append((doc(i) & 0xff).toChar); i += 1 }
          out += clean(sb.toString)
        }
        o = end
      }
    }
    walk(0, doc.length, 0)
    out.result()
  }

  /** Joined text, blocks separated by '\n' — the OfficeCodec shape. */
  def extractText(bytes: Array[Byte]): String =
    extractTexts(bytes).filter(_.nonEmpty).mkString("\n")

  // ----------------------------------------------------------------- writer

  /** Deterministic .ppt writer — the oracle half. Each slide's
    * paragraphs become ONE text atom inside a slide container:
    * TextBytesAtom when every char fits one byte, TextCharsAtom
    * otherwise — both atom lanes ride any mixed corpus.
    */
  def write(slides: Seq[Seq[String]]): Array[Byte] = {
    require(slides.nonEmpty && slides.forall(_.nonEmpty),
      "ppt write: at least one slide, none empty")
    slides.foreach(_.foreach(p => require(!p.contains('\n') || p.split("\n", -1)
      .forall(_.nonEmpty), "ppt write: empty lines do not round-trip")))
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def atom(verInst: Int, recType: Int, body: Array[Byte]): Array[Byte] =
      le16(verInst) ++ le16(recType) ++ le32(body.length.toLong) ++ body
    def container(recType: Int, kids: Array[Byte]): Array[Byte] =
      atom(0x000F, recType, kids)
    val slideBytes = slides.map { paras =>
      val text = paras.mkString("\r") + "\r" // Word-family framing mark
      val wide = text.exists(_ > 0xFF)
      val body =
        if (wide) text.getBytes(StandardCharsets.UTF_16LE)
        else text.map(c => (c.toInt & 0xff).toByte).toArray
      // a Slide container (0x03EE) holding one text atom
      container(0x03EE,
        atom(0x0000, if (wide) TextCharsAtom else TextBytesAtom, body))
    }
    // Document container (0x03E8) wrapping a SlideListWithText (0x0FF0)
    val doc = container(0x03E8,
      container(0x0FF0, slideBytes.fold(Array.emptyByteArray)(_ ++ _)))
    Cfb.write(Seq("PowerPoint Document" -> doc,
      "Current User" -> new Array[Byte](8)))
  }
}
