package graft.operators

/** Charset detection + decoding for crawl bodies — the step between
  * "HTTP gave us bytes" and every text operator in the engine, which all
  * assume a decoded String. Real crawls are messy here: BOMs, declared
  * charsets that lie, no declaration at all, and bytes that are valid in
  * no declared encoding. The contract:
  *
  *  1. A Unicode BOM wins over everything (it is byte-level ground
  *     truth): UTF-8 `EF BB BF`, UTF-16LE `FF FE`, UTF-16BE `FE FF` —
  *     the BOM is stripped from the decoded text.
  *  2. Else the `charset=` parameter of the HTTP Content-Type (any
  *     charset this JVM knows, resolved through `Charset.forName`'s
  *     alias table, so `latin1`/`ISO-8859-1`/`l1` agree).
  *  3. Else strict UTF-8 sniffing: if the bytes validate as UTF-8
  *     (CodingErrorAction.REPORT, no replacement characters smuggled
  *     in), they are UTF-8 — the overwhelmingly common modern case, and
  *     UTF-8 validation has essentially no false positives on real text.
  *  4. Anything that fails its decoder falls back to windows-1252 with
  *     `clean = false` — every byte maps in windows-1252 (the WHATWG
  *     default for undeclared legacy content), so decode NEVER throws;
  *     the flag routes the row to quarantine/review instead of killing
  *     a task at crawl scale.
  *
  * Map-only scalar work — charset detection rides the ingest scan like
  * `url_normalize` does; no shuffle, no state.
  */
object Charsets {

  /** One decoded body: the charset actually used (canonical lower-case
    * JVM name), whether it decoded without any fallback, and the text.
    */
  final case class Decoded(charset: String, clean: Boolean, text: String)

  /** Decode `bytes` under the rules above. `contentType` is the raw
    * HTTP Content-Type header value ("" or null when absent).
    */
  def decode(bytes: Array[Byte], contentType: String): Decoded = {
    // 1. BOM
    if (bytes.length >= 3 && bytes(0) == 0xef.toByte && bytes(1) == 0xbb.toByte &&
        bytes(2) == 0xbf.toByte)
      return strictOrFallback(bytes, 3, "utf-8")
    if (bytes.length >= 2 && bytes(0) == 0xff.toByte && bytes(1) == 0xfe.toByte)
      return strictOrFallback(bytes, 2, "utf-16le")
    if (bytes.length >= 2 && bytes(0) == 0xfe.toByte && bytes(1) == 0xff.toByte)
      return strictOrFallback(bytes, 2, "utf-16be")
    // 2. declared charset
    declaredCharset(contentType) match {
      case Some(cs) => strictOrFallback(bytes, 0, cs)
      // 3. UTF-8 sniff, 4. fallback
      case None => strictOrFallback(bytes, 0, "utf-8")
    }
  }

  /** The `charset=` parameter of a Content-Type header, resolved to a
    * canonical lower-case JVM charset name; None when absent, unknown to
    * this JVM, or syntactically hopeless (the caller then sniffs).
    */
  def declaredCharset(contentType: String): Option[String] = {
    if (contentType == null) return None
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf("charset=")
    if (at < 0) return None
    var v = lower.substring(at + "charset=".length).trim
    val semi = v.indexOf(';')
    if (semi >= 0) v = v.substring(0, semi).trim
    v = v.stripPrefix("\"").stripSuffix("\"").trim
    if (v.isEmpty) None
    else
      try Some(java.nio.charset.Charset.forName(v).name.toLowerCase(java.util.Locale.ROOT))
      catch { case _: Exception => None }
  }

  private def strictOrFallback(bytes: Array[Byte], offset: Int, cs: String): Decoded =
    strictDecode(bytes, offset, cs) match {
      case Some(text) => Decoded(cs, clean = true, text)
      case None => Decoded("windows-1252", clean = false, fallback1252(bytes, offset))
    }

  // WHATWG Encoding Standard windows-1252 row 0x80-0x9F. The JVM's own
  // windows-1252 decoder REPLACES the five bytes the vendor table leaves
  // undefined (0x81 0x8D 0x8F 0x90 0x9D) with U+FFFD; the WHATWG table —
  // what every browser implements — maps them to the matching C1
  // controls, which keeps the fallback total AND byte-reversible.
  private val W1252: Array[Char] = Array(
    '€', '', '‚', 'ƒ', '„', '…', '†', '‡',
    'ˆ', '‰', 'Š', '‹', 'Œ', '', 'Ž', '',
    '', '‘', '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', '', 'ž', 'Ÿ')

  /** Total windows-1252 decode (WHATWG table): every byte maps, so this
    * can never fail — outside 0x80-0x9F windows-1252 IS ISO-8859-1
    * (char = byte value).
    */
  private def fallback1252(bytes: Array[Byte], offset: Int): String = {
    val out = new Array[Char](bytes.length - offset)
    var i = 0
    while (i < out.length) {
      val b = bytes(offset + i) & 0xff
      out(i) = if (b >= 0x80 && b <= 0x9f) W1252(b - 0x80) else b.toChar
      i += 1
    }
    new String(out)
  }

  /** Strict decode (malformed input and unmappable characters REPORT,
    * never replace): None on any error, so a lying declaration cannot
    * silently corrupt text with U+FFFD.
    */
  private def strictDecode(bytes: Array[Byte], offset: Int, cs: String): Option[String] =
    try {
      val dec = java.nio.charset.Charset.forName(cs).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }
}
