package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class MailSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  private def msg(headers: String, body: String): Array[Byte] =
    ascii(headers + "\n\n" + body)

  test("plain 7bit message: headers, body, defaults") {
    val m = Mail.parseMessage(msg(
      "From: Alice <alice@example.org>\nSubject: hello\n" +
        "Date: Sat, 16 Aug 2026 00:00:00 +0000\nMessage-ID: <1@x>",
      "plain body\nline two"))
    assert(m.from == "Alice <alice@example.org>")
    assert(m.subject == "hello" && m.messageId == "<1@x>")
    assert(m.contentType == "text/plain" && m.textFound && m.nParts == 1)
    assert(m.text == "plain body\nline two")
  }

  test("folded headers unfold; CRLF framing tolerated") {
    val m = Mail.parseMessage(ascii(
      "Subject: a very\r\n  long folded\r\n\tsubject line\r\n" +
        "From: x@y\r\n\r\nbody"))
    assert(m.subject == "a very long folded subject line")
    assert(m.text == "body")
  }

  test("quoted-printable body decodes exactly (soft breaks, escapes)") {
    val m = Mail.parseMessage(msg(
      "Content-Type: text/plain; charset=utf-8\n" +
        "Content-Transfer-Encoding: quoted-printable",
      "caf=C3=A9 co=\nntinued =3D equals"))
    assert(m.text == "café continued = equals")
    intercept[IllegalArgumentException](Mail.qpDecode(ascii("bad =Zx"), header = false))
  }

  test("base64 body decodes; corrupt base64 and unknown CTE reject namedly") {
    val payload = "Grüße aus dem Archiv\n"
    val b64 = java.util.Base64.getMimeEncoder.encodeToString(
      payload.getBytes(StandardCharsets.UTF_8))
    val m = Mail.parseMessage(msg(
      "Content-Type: text/plain; charset=UTF-8\nContent-Transfer-Encoding: base64",
      b64))
    assert(m.text == payload)
    val e = intercept[IllegalArgumentException](Mail.parseMessage(msg(
      "Content-Transfer-Encoding: uuencode", "whatever")))
    assert(e.getMessage.contains("unsupported transfer encoding"))
  }

  test("charset parameter honored; unknown charsets reject namedly") {
    val latin = msg(
      "Content-Type: text/plain; charset=\"iso-8859-1\"", "")
    val m = Mail.parseMessage(latin.dropRight(0) ++ Array(0xE9.toByte))
    assert(m.text == "é")
    val e = intercept[IllegalArgumentException](Mail.parseMessage(msg(
      "Content-Type: text/plain; charset=klingon", "x")))
    assert(e.getMessage.contains("unknown charset"))
  }

  test("multipart/alternative: the text/plain leaf wins over text/html") {
    val body =
      """preamble is dropped
        |--BOUND
        |Content-Type: text/html
        |
        |<b>html part</b>
        |--BOUND
        |Content-Type: text/plain
        |
        |plain part
        |--BOUND--
        |epilogue is dropped""".stripMargin
    val m = Mail.parseMessage(msg(
      "Content-Type: multipart/alternative; boundary=BOUND", body))
    assert(m.nParts == 2 && m.textFound)
    assert(m.text == "plain part")
    assert(m.contentType == "multipart/alternative")
  }

  test("nested multipart + message/rfc822 recurse; attachments skip") {
    val inner =
      "Content-Type: text/plain\n\ninner forwarded text"
    val body =
      s"""--A
         |Content-Type: multipart/mixed; boundary=B
         |
         |--B
         |Content-Type: application/octet-stream
         |Content-Transfer-Encoding: base64
         |
         |AAAA
         |--B
         |Content-Type: message/rfc822
         |
         |$inner
         |--B--
         |--A--""".stripMargin
    val m = Mail.parseMessage(msg(
      "Content-Type: multipart/mixed; boundary=A", body))
    assert(m.text == "inner forwarded text")
    assert(m.nParts == 1) // the octet-stream leaf is skipped structurally
  }

  test("multipart bombs and missing boundaries are named rejects") {
    val e = intercept[IllegalArgumentException](Mail.parseMessage(msg(
      "Content-Type: multipart/mixed", "--x\n\nbody\n--x--")))
    assert(e.getMessage.contains("without a boundary"))
    // nesting bomb: each level declares another multipart
    def nest(depth: Int): String =
      if (depth == 0) "Content-Type: text/plain\n\ndeep"
      else s"Content-Type: multipart/mixed; boundary=B$depth\n\n--B$depth\n${nest(depth - 1)}\n--B$depth--"
    val bomb = nest(12)
    val hdrEnd = bomb.indexOf("\n\n")
    val e2 = intercept[IllegalArgumentException](Mail.parseMessage(ascii(bomb)))
    assert(e2.getMessage.contains("nested past"))
  }

  test("RFC 2047 encoded words: B and Q, joined adjacency, unknown charset") {
    assert(Mail.decodeWords("=?UTF-8?B?Y2Fmw6k=?=") == "café")
    assert(Mail.decodeWords("=?ISO-8859-1?Q?caf=E9_au_lait?=") == "café au lait")
    // whitespace between two encoded-words is transparent
    assert(Mail.decodeWords("=?UTF-8?Q?one?= =?UTF-8?Q?two?=") == "onetwo")
    // but ordinary text keeps its spacing
    assert(Mail.decodeWords("plain =?UTF-8?Q?mid?= tail") == "plain mid tail")
    intercept[IllegalArgumentException](Mail.decodeWords("=?nope?B?QQ==?="))
  }

  test("mbox roundtrip: postmark split, mboxrd From-quoting undone") {
    val m1 = msg("From: a@x\nSubject: first", "body one\nFrom the start it was so")
    val m2 = msg("From: b@y\nSubject: second", ">From quoted line\nplain")
    val mbox = Mail.writeMbox(Seq(m1, m2))
    assert(Mail.isMbox(mbox))
    val back = Mail.splitMbox(mbox)
    assert(back.length == 2)
    assert(back(0) sameElements m1)
    assert(back(1) sameElements m2)
    val p1 = Mail.parseMessage(back(0))
    assert(p1.subject == "first" && p1.text == "body one\nFrom the start it was so")
    intercept[IllegalArgumentException](Mail.splitMbox(ascii("not a mailbox")))
  }

  test("qpEncode/qpDecode roundtrip exactly, soft breaks keep lines short") {
    val texts = Seq(
      "Mail 7 von Nutzer 0 — Grüße à 2€\nZeile zwei (§7)",
      "x" * 300, // forces soft breaks
      "equals = and più unicode ü ß")
    texts.foreach { t =>
      val enc = Mail.qpEncode(t)
      new String(enc, StandardCharsets.ISO_8859_1).split("\n", -1)
        .foreach(l => assert(l.length <= 76, s"QP line too long: ${l.length}"))
      assert(Mail.qpDecode(enc, header = false) sameElements
        t.getBytes(StandardCharsets.UTF_8))
    }
  }

  test("message with only non-text leaves: empty text, text_found=false") {
    val body =
      """--X
        |Content-Type: image/png
        |Content-Transfer-Encoding: base64
        |
        |AAAA
        |--X--""".stripMargin
    val m = Mail.parseMessage(msg(
      "Content-Type: multipart/mixed; boundary=X", body))
    assert(!m.textFound && m.text == "" && m.nParts == 1)
  }

  // -------------------------------------- RFC 4155 postmark gating (r11 advice)

  test("body 'From ' lines without a preceding blank line do not split the message") {
    // wild non-mboxrd producer: the body line is NOT >-quoted; only the
    // blank-line-preceded postmark delimits (RFC 4155)
    val wild = ascii(
      "From a@x Thu Jan  1 00:00:00 2026\n" +
        "From: a@x\nSubject: wild\n\n" +
        "line one\n" +
        "From the start, this held firm\n" +
        "line three\n" +
        "\n" +
        "From b@y Thu Jan  1 00:00:01 2026\n" +
        "From: b@y\nSubject: second\n\n" +
        "ok\n")
    val msgs = Mail.splitMbox(wild)
    assert(msgs.length == 2)
    val first = Mail.parseMessage(msgs(0))
    assert(first.text == "line one\nFrom the start, this held firm\nline three")
    assert(Mail.parseMessage(msgs(1)).text == "ok")
  }

  // --------------------------------------------- attachment walk (r12)

  test("attachments: base64 document leaves decode with their filenames") {
    val m = Ingest.attachmentMessage(6L) // rtf lane
    val atts = Mail.attachments(m)
    assert(atts.map(_.filename) == Seq("doc6.rtf"))
    assert(atts.head.contentType == "application/octet-stream")
    assert(Rtf.extractText(atts.head.bytes) == "Attached doc 6 — café 6")
    // the text walk still finds the cover note, unchanged
    assert(Mail.parseMessage(m).text == "Cover note 6")
  }

  test("attachments: text-only messages yield none; nested rfc822 recurses") {
    assert(Mail.attachments(Ingest.mailMessage(1L)).isEmpty)
    val inner = Ingest.attachmentMessage(0L)
    val outer = ("Subject: fwd\nMessage-ID: <x@y>\n" +
      "Content-Type: message/rfc822\n\n").getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1) ++ inner
    val atts = Mail.attachments(outer)
    assert(atts.map(_.filename) == Seq("doc0.pdf"))
    assert(PdfCodec.extractText(atts.head.bytes).pages ==
      Seq("Attached doc 0 — café 0"))
  }
}
