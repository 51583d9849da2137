package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Standard security handler (ISO 32000-1 §7.6.3 / 32000-2 §7.6.4):
  * the owner-locked documents every corpus carries decrypt with the
  * EMPTY password; real passwords stay named rejects.
  */
class PdfCryptSpec extends AnyFunSuite {

  private val pages = Seq(
    "Doc 1 page 0 ‘café’\ntokens 3 — (p0)",
    "second page (parens) and \\backslash")

  for (method <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256")) {
    test(s"$method: owner-locked file (empty user password) round-trips") {
      val bytes = PdfCodec.writeEncrypted(pages, method)
      // it really is encrypted: the plaintext operators never appear raw
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      assert(!raw.contains("tokens 3"))
      assert(raw.contains("/Filter /Standard"))
      val got = PdfCodec.extractText(bytes)
      assert(got.pages == pages)
      assert(PdfCodec.pageCount(bytes) == 2)
    }

    test(s"$method: a real user password is a named reject, not a guess") {
      val locked = PdfCodec.writeEncrypted(pages, method, userPw = "secret")
      val e = intercept[IllegalArgumentException](PdfCodec.extractText(locked))
      assert(e.getMessage == "pdf: encrypted (password required)")
      val e2 = intercept[IllegalArgumentException](PdfCodec.info(locked))
      assert(e2.getMessage == "pdf: encrypted (password required)")
    }
  }

  test("encrypted /Info strings decrypt through the string filter") {
    for (method <- Seq("rc4-128", "aes-128", "aes-256")) {
      val bytes = PdfCodec.writeEncrypted(pages, method,
        info = Seq("Title" -> "Annual Report — café", "Author" -> "Nobody"))
      val i = PdfCodec.info(bytes)
      assert(i.title.contains("Annual Report — café"), method)
      assert(i.author.contains("Nobody"), method)
    }
  }

  test("rc4-40 uses a 5-byte key, rc4-128 a 16-byte key (R-dependent derivation)") {
    // indirectly: the two methods must produce different ciphertext for
    // the same content, and each must round-trip independently
    val a = PdfCodec.writeEncrypted(pages, "rc4-40")
    val b = PdfCodec.writeEncrypted(pages, "rc4-128")
    assert(!a.sameElements(b))
    assert(PdfCodec.extractText(a).pages == pages)
    assert(PdfCodec.extractText(b).pages == pages)
  }

  test("non-standard security handlers stay a named reject") {
    val bytes = PdfCodec.writeEncrypted(pages, "rc4-128")
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val mut = s.replace("/Filter /Standard", "/Filter /AcmeCrypt")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(mut.getBytes(StandardCharsets.ISO_8859_1)))
    assert(e.getMessage.contains("non-standard security handler"))
  }

  test("a dangling /Encrypt reference is still a named encrypted reject") {
    val bytes = PdfCodec.write(Seq("x"))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val mut = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(mut.getBytes(StandardCharsets.ISO_8859_1)))
    assert(e.getMessage.contains("encrypted"))
  }

  test("tampering with /U defeats empty-password authentication") {
    val bytes = PdfCodec.writeEncrypted(pages, "rc4-128")
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val uAt = s.indexOf("/U <")
    assert(uAt > 0)
    // flip one nibble of the stored /U
    val c = s.charAt(uAt + 4)
    val mut = s.substring(0, uAt + 4) + (if (c == 'f') 'e' else 'f') +
      s.substring(uAt + 5)
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractText(mut.getBytes(StandardCharsets.ISO_8859_1)))
    assert(e.getMessage == "pdf: encrypted (password required)")
  }

  test("rc4 is self-inverse and matches its published structure") {
    val key = "Key".getBytes(StandardCharsets.US_ASCII)
    val plain = "Plaintext".getBytes(StandardCharsets.US_ASCII)
    val ct = PdfCrypt.rc4(key, plain)
    // the classic published RC4 test vector: RC4("Key","Plaintext")
    assert(ct.map(b => f"${b & 0xff}%02x").mkString == "bbf316e8d940af0ad3")
    assert(PdfCrypt.rc4(key, ct).sameElements(plain))
  }
}
