package graft.operators

import java.nio.charset.StandardCharsets

/** Structural email mining — mbox mailboxes and MIME messages, the
  * archive class public corpora ship as mailing-list dumps (every major
  * FOSS project publishes decades of them). Public formats only:
  * RFC 5322 (message framing / header folding), RFC 2045-2046 (MIME,
  * multipart boundaries, transfer encodings), RFC 2047 (encoded-word
  * headers), RFC 4155 + the mboxrd convention (`From ` postmarks,
  * `>From ` quoting). Same house discipline as the WARC/zip/tar walks:
  * parse what the spec says, bounded everywhere, NAMED rejects for
  * out-of-profile content.
  *
  * Extraction profile:
  *  - transfer encodings: 7bit / 8bit / binary (identity),
  *    quoted-printable (incl. soft breaks), base64 — all exact;
  *  - multipart containers: parts split on the dash-boundary per
  *    RFC 2046 §5.1.1, recursively (depth-capped); the FIRST `text/plain`
  *    leaf wins, then the first text-family leaf; a message with neither
  *    yields empty text and `text_found = false` rather than a reject
  *    (real digests are sometimes pure attachment);
  *  - charsets: the Content-Type `charset` parameter through the JDK's
  *    table (UTF-8 / ISO-8859-* / US-ASCII / windows-125x all covered);
  *    unknown charsets are a named reject, never mojibake;
  *  - RFC 2047 encoded-words in From/Subject: `=?charset?B|Q?...?=`
  *    decoded (B = base64, Q = quoted-printable-for-headers with `_` as
  *    space), adjacent encoded-words joined per §6.2.
  *
  * Scale shape: one mailbox is one record; [[splitMbox]] is a per-record
  * linear walk and each message parse is map-only scalar work — the WARC
  * explode's distribution story exactly.
  */
object Mail {

  /** Cap on one decoded body part — the `Gunzip.bounded` discipline. */
  final val MaxPartBytes: Long = 64L * 1024 * 1024
  /** Multipart nesting cap: real mail nests 2-3 deep; a bomb nests more. */
  final val MaxMimeDepth = 8

  /** One parsed message: the curation headers plus the extracted text. */
  final case class MailText(
      from: String,
      subject: String,
      date: String,
      messageId: String,
      contentType: String,
      textFound: Boolean,
      nParts: Int,
      text: String)

  def isMbox(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 'F' && b(1) == 'r' && b(2) == 'o' &&
      b(3) == 'm' && b(4) == ' '

  /** Split an mbox buffer into messages: `From ` postmark lines delimit
    * (RFC 4155), `>From ` quoting is UNDONE per the mboxrd convention.
    * Returns raw RFC 5322 message bytes, postmarks stripped.
    */
  def splitMbox(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(isMbox(bytes), "mbox: missing the leading 'From ' postmark")
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val all = s.split("\n", -1)
    // a buffer ending in '\n' yields a final empty ARTIFACT element from
    // split — it is not a line of the mailbox
    val lines = if (s.endsWith("\n")) all.dropRight(1) else all
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.lang.StringBuilder
    var open = false
    def flush(): Unit = if (open) {
      // strip the final line's framing newline AND the blank separator
      // line before the next postmark (both are mbox framing, not message
      // bytes); a truncated mailbox without the separator loses neither
      var body = cur.toString
      if (body.endsWith("\n")) body = body.substring(0, body.length - 1)
      if (body.endsWith("\n")) body = body.substring(0, body.length - 1)
      out += body.getBytes(StandardCharsets.ISO_8859_1)
      cur.setLength(0)
    }
    // RFC 4155: a postmark is a 'From ' line FOLLOWING a blank line (or
    // at start-of-buffer). Wild mboxes from non-mboxrd producers carry
    // unquoted body 'From ' lines mid-paragraph — gating on the blank
    // separator keeps those as message text instead of silently
    // splitting the message.
    var prevBlank = true
    lines.foreach { raw =>
      val line = if (raw.endsWith("\r")) raw.substring(0, raw.length - 1) else raw
      if (prevBlank && line.startsWith("From ")) { flush(); open = true }
      else if (open) {
        // mboxrd: any number of '>' before 'From ' loses ONE '>'
        val unquoted =
          if (line.matches("^>+From .*")) line.substring(1) else line
        cur.append(unquoted).append('\n')
      }
      prevBlank = line.isEmpty
    }
    flush()
    out.toSeq
  }

  /** Write messages as an mboxrd mailbox — the oracle half. Message
    * bytes must be LF-framed RFC 5322 text.
    */
  def writeMbox(messages: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    messages.zipWithIndex.foreach { case (m, i) =>
      out.write(s"From graft@invalid Sat Jan  1 00:00:0$i 2026\n"
        .getBytes(StandardCharsets.ISO_8859_1))
      val s = new String(m, StandardCharsets.ISO_8859_1)
      s.split("\n", -1).foreach { line =>
        val quoted =
          if (line.matches("^>*From .*")) ">" + line else line
        out.write(quoted.getBytes(StandardCharsets.ISO_8859_1))
        out.write('\n')
      }
      out.write('\n') // blank separator
    }
    out.toByteArray
  }

  /** Parse one RFC 5322 message: headers + the first text/plain (else
    * first text-family) leaf through the MIME walk, decoded exactly.
    */
  def parseMessage(bytes: Array[Byte]): MailText = {
    val (headers, body) = headerBlock(bytes)
    def h(name: String): String = headers.getOrElse(name, "")
    val ct = h("content-type")
    val leaves = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    collectTextLeaves(ct, h("content-transfer-encoding"), body, 0, leaves)
    val text = leaves.find(_._1 == "text/plain").orElse(leaves.headOption)
    MailText(
      from = decodeWords(h("from")),
      subject = decodeWords(h("subject")),
      date = h("date"),
      messageId = h("message-id"),
      contentType = mediaType(ct, "text/plain"),
      textFound = text.nonEmpty,
      nParts = math.max(1, leaves.length),
      text = text.map(_._2).getOrElse(""))
  }

  /** Headers (lower-cased names, folded lines unfolded per RFC 5322
    * §2.2.3) and the body after the blank line. Tolerates both CRLF and
    * bare-LF framing — mbox archives in the wild carry both.
    */
  private def headerBlock(b: Array[Byte]): (Map[String, String], Array[Byte]) = {
    val s = new String(b, StandardCharsets.ISO_8859_1)
    val headerEnd = {
      val crlf = s.indexOf("\r\n\r\n")
      val lf = s.indexOf("\n\n")
      if (crlf >= 0 && (lf < 0 || crlf < lf)) (crlf, 4)
      else if (lf >= 0) (lf, 2)
      else (s.length, 0)
    }
    val head = s.substring(0, headerEnd._1)
    val body = java.util.Arrays.copyOfRange(b,
      math.min(headerEnd._1 + headerEnd._2, b.length), b.length)
    val m = Map.newBuilder[String, String]
    var name: String = null
    val value = new java.lang.StringBuilder
    def flush(): Unit = if (name != null) {
      m += name -> value.toString.trim
      name = null; value.setLength(0)
    }
    head.split("\r?\n", -1).foreach { line =>
      if (line.nonEmpty && (line(0) == ' ' || line(0) == '\t')) {
        // folded continuation: unfold to a single space
        if (name != null) value.append(' ').append(line.trim)
      } else {
        flush()
        val colon = line.indexOf(':')
        if (colon > 0) {
          name = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          value.append(line.substring(colon + 1).trim)
        }
      }
    }
    flush()
    (m.result(), body)
  }

  /** The media type of a Content-Type value ("" header -> the default). */
  private def mediaType(ct: String, dflt: String): String = {
    val t = ct.split(";", 2)(0).trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) dflt else t
  }

  /** A parameter out of a Content-Type value (quoted or token form). */
  private[operators] def ctParam(ct: String, key: String): Option[String] = {
    val lower = ct.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf(key + "=")
    if (at < 0) None
    else {
      val rest = ct.substring(at + key.length + 1)
      Some(if (rest.startsWith("\"")) rest.substring(1).takeWhile(_ != '"')
      else rest.takeWhile(c => c != ';' && !c.isWhitespace)).filter(_.nonEmpty)
    }
  }

  /** Recursive MIME walk: multipart containers split on the boundary,
    * text leaves decode (transfer encoding, then charset) into the
    * accumulator; non-text leaves are skipped structurally.
    */
  /** One non-text MIME leaf: the decoded bytes plus the name the
    * sender gave it (Content-Disposition `filename`, else Content-Type
    * `name`, else "").
    */
  final case class Attachment(filename: String, contentType: String,
      bytes: Array[Byte])

  /** Collect every NON-text leaf of a message — the attachment side of
    * the MIME walk [[parseMessage]] structurally skips. Same bounds
    * (depth cap, per-part size cap) and the same named rejects.
    */
  def attachments(message: Array[Byte]): Seq[Attachment] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Attachment]
    def walk(ct: String, cte: String, disp: String, body: Array[Byte],
        depth: Int): Unit = {
      require(depth <= MaxMimeDepth,
        s"mail: multipart nested past $MaxMimeDepth — rejected as a bomb")
      val mt = mediaType(ct, "text/plain")
      if (mt.startsWith("multipart/")) {
        val boundary = ctParam(ct, "boundary").getOrElse(
          throw new IllegalArgumentException("mail: multipart without a boundary parameter"))
        splitParts(body, boundary).foreach { part =>
          val (ph, pb) = headerBlock(part)
          walk(ph.getOrElse("content-type", ""),
            ph.getOrElse("content-transfer-encoding", ""),
            ph.getOrElse("content-disposition", ""), pb, depth + 1)
        }
      } else if (mt == "message/rfc822") {
        val (ih, ib) = headerBlock(decodeTransferEnc(body, cte))
        walk(ih.getOrElse("content-type", ""),
          ih.getOrElse("content-transfer-encoding", ""),
          ih.getOrElse("content-disposition", ""), ib, depth + 1)
      } else if (!mt.startsWith("text/")) {
        val name = ctParam(disp, "filename").orElse(ctParam(ct, "name"))
          .map(decodeWords).getOrElse("")
        out += Attachment(name, mt, decodeTransferEnc(body, cte))
      }
    }
    val (headers, body) = headerBlock(message)
    walk(headers.getOrElse("content-type", ""),
      headers.getOrElse("content-transfer-encoding", ""),
      headers.getOrElse("content-disposition", ""), body, 0)
    out.toSeq
  }

  private def collectTextLeaves(ct: String, cte: String, body: Array[Byte],
      depth: Int, out: scala.collection.mutable.ArrayBuffer[(String, String)]): Unit = {
    require(depth <= MaxMimeDepth, s"mail: multipart nested past $MaxMimeDepth — rejected as a bomb")
    val mt = mediaType(ct, "text/plain")
    if (mt.startsWith("multipart/")) {
      val boundary = ctParam(ct, "boundary").getOrElse(
        throw new IllegalArgumentException("mail: multipart without a boundary parameter"))
      splitParts(body, boundary).foreach { part =>
        val (ph, pb) = headerBlock(part)
        collectTextLeaves(ph.getOrElse("content-type", ""),
          ph.getOrElse("content-transfer-encoding", ""), pb, depth + 1, out)
      }
    } else if (mt == "message/rfc822") {
      val (ih, ib) = headerBlock(decodeTransferEnc(body, cte))
      collectTextLeaves(ih.getOrElse("content-type", ""),
        ih.getOrElse("content-transfer-encoding", ""), ib, depth + 1, out)
    } else if (mt.startsWith("text/")) {
      val decoded = decodeTransferEnc(body, cte)
      val charset = ctParam(ct, "charset").getOrElse("us-ascii")
      val cs =
        try java.nio.charset.Charset.forName(charset)
        catch {
          case _: java.nio.charset.IllegalCharsetNameException |
               _: java.nio.charset.UnsupportedCharsetException =>
            throw new IllegalArgumentException(s"mail: unknown charset '$charset'")
        }
      out += mt -> new String(decoded, cs)
    } // else: non-text leaf (attachment) — structural skip
  }

  /** Split a multipart body on its dash-boundary lines (RFC 2046
    * §5.1.1): preamble before the first boundary and epilogue after the
    * `--` close are dropped; each part keeps its bytes exactly (the CRLF
    * or LF before a boundary belongs to the boundary).
    */
  private[operators] def splitParts(body: Array[Byte], boundary: String): Seq[Array[Byte]] = {
    val s = new String(body, StandardCharsets.ISO_8859_1)
    val lines = s.split("\n", -1)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.lang.StringBuilder
    var inPart = false
    var closed = false
    def flush(): Unit = if (inPart) {
      var p = cur.toString
      // the EOL preceding a boundary is boundary framing, not part bytes
      if (p.endsWith("\n")) p = p.substring(0, p.length - 1)
      if (p.endsWith("\r")) p = p.substring(0, p.length - 1)
      parts += p.getBytes(StandardCharsets.ISO_8859_1)
      cur.setLength(0)
    }
    val open = "--" + boundary
    val close = "--" + boundary + "--"
    lines.foreach { raw =>
      val line = if (raw.endsWith("\r")) raw.substring(0, raw.length - 1) else raw
      if (!closed && line == close) { flush(); inPart = false; closed = true }
      else if (!closed && line == open) { flush(); inPart = true }
      else if (inPart) cur.append(raw).append('\n')
    }
    // tolerate a missing close delimiter (truncated digests): flush the tail
    if (inPart && !closed) flush()
    require(parts.nonEmpty, s"mail: no parts found for boundary '$boundary'")
    parts.toSeq
  }

  /** Content-Transfer-Encoding decode: identity families pass through,
    * quoted-printable and base64 decode exactly, anything else is a
    * named reject.
    */
  private[operators] def decodeTransferEnc(body: Array[Byte], cte: String): Array[Byte] =
    cte.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "" | "7bit" | "8bit" | "binary" => body
      case "quoted-printable" => qpDecode(body, header = false)
      case "base64" =>
        val compact = body.filter(b => !isWsB(b))
        try {
          val out = java.util.Base64.getMimeDecoder.decode(compact)
          require(out.length <= MaxPartBytes, "mail: part past the size cap")
          out
        } catch {
          case e: IllegalArgumentException if e.getMessage != null &&
            !e.getMessage.contains("size cap") =>
            throw new IllegalArgumentException(s"mail: corrupt base64 part (${e.getMessage})")
        }
      case other =>
        throw new IllegalArgumentException(s"mail: unsupported transfer encoding '$other'")
    }

  private def isWsB(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Quoted-printable decode (RFC 2045 §6.7). `header = true` applies
    * the RFC 2047 §4.2 Q variant: `_` is a space.
    */
  private[operators] def qpDecode(body: Array[Byte], header: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (i < body.length) {
      val c = body(i) & 0xff
      if (c == '=') {
        if (i + 1 < body.length && (body(i + 1) == '\n' ||
          (body(i + 1) == '\r' && i + 2 < body.length && body(i + 2) == '\n'))) {
          i += (if (body(i + 1) == '\n') 2 else 3) // soft line break
        } else if (i + 2 < body.length) {
          val hi = Character.digit(body(i + 1), 16)
          val lo = Character.digit(body(i + 2), 16)
          require(hi >= 0 && lo >= 0,
            s"mail: bad quoted-printable escape at byte $i")
          out.write((hi << 4) | lo)
          i += 3
        } else throw new IllegalArgumentException(
          "mail: truncated quoted-printable escape")
      } else {
        if (header && c == '_') out.write(' ') else out.write(c)
        i += 1
      }
    }
    out.toByteArray
  }

  /** Quoted-printable ENCODE (the writer/fixture half): UTF-8 bytes,
    * `=`/non-printables escaped, soft line breaks keep lines ≤ 76 chars
    * per RFC 2045 §6.7. `qpDecode(qpEncode(s)) == utf8(s)` exactly.
    */
  private[operators] def qpEncode(text: String): Array[Byte] = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length + 16)
    var lineLen = 0
    bytes.foreach { b =>
      val c = b & 0xff
      val tok =
        if (c == '\n') "\n"
        else if (c >= 33 && c <= 126 && c != '=') c.toChar.toString
        else if (c == ' ' || c == '\t') c.toChar.toString
        else f"=$c%02X"
      if (tok == "\n") { sb.append('\n'); lineLen = 0 }
      else {
        if (lineLen + tok.length > 72) { sb.append("=\n"); lineLen = 0 }
        sb.append(tok); lineLen += tok.length
      }
    }
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** RFC 2047 encoded-word decode for header values:
    * `=?charset?B|Q?payload?=`, adjacent encoded-words joined with the
    * whitespace between them dropped (§6.2); unknown charsets reject.
    */
  private[operators] def decodeWords(value: String): String = {
    val re = "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r
    val sb = new java.lang.StringBuilder
    var last = 0
    var prevWasWord = false
    var prevEnd = -1
    re.findAllMatchIn(value).foreach { m =>
      val between = value.substring(last, m.start)
      // whitespace BETWEEN two encoded-words is transparent (§6.2)
      if (!(prevWasWord && between.forall(_.isWhitespace))) sb.append(between)
      val cs =
        try java.nio.charset.Charset.forName(m.group(1))
        catch {
          case _: java.nio.charset.IllegalCharsetNameException |
               _: java.nio.charset.UnsupportedCharsetException =>
            throw new IllegalArgumentException(
              s"mail: unknown charset '${m.group(1)}' in encoded-word")
        }
      val payload = m.group(3).getBytes(StandardCharsets.ISO_8859_1)
      val decoded = m.group(2).toUpperCase match {
        case "B" => java.util.Base64.getDecoder.decode(payload)
        case _ => qpDecode(payload, header = true)
      }
      sb.append(new String(decoded, cs))
      last = m.end
      prevWasWord = true
      prevEnd = m.end
    }
    sb.append(value.substring(last))
    sb.toString
  }
}
