package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Office binary-document encryption primitives — [MS-OFFCRYPTO]
  * (Microsoft Open Specifications), the legacy-Office analog of the
  * PDF standard security handler ([[PdfCrypt]]):
  *
  *  - §2.3.6 "Office Binary Document RC4 Encryption" (Excel 97/2000):
  *    MD5 password hash → 336-byte (trunc5‖salt)×16 digest → per-block
  *    key MD5(trunc5 ‖ block LE32), RC4, MD5 verifier pair;
  *  - §2.3.5 "RC4 CryptoAPI Encryption" (XP/2003): SHA-1(salt ‖
  *    password UTF-16LE) → per-block key SHA-1(H0 ‖ block LE32)
  *    truncated to the header's key size (40-bit keys zero-pad to 16
  *    bytes per §2.3.5.2), RC4, SHA-1 verifier pair;
  *  - §2.3.7.1 XOR-obfuscation password VERIFIER (the table-free
  *    16-bit checksum Excel stores alongside the XOR key). The XOR
  *    DATA transformation itself (§2.3.7.3) is deliberately absent:
  *    its rotation/index conventions cannot be validated offline in
  *    this sandbox, and a plausible-but-wrong transform would
  *    round-trip our own fixtures while silently mis-decrypting real
  *    files — the exact failure class this codebase rejects by name
  *    instead.
  *
  * Like the rest of the document family these run per record inside a
  * map-side walk: pure JVM, no native resources, nothing crosses an
  * exchange.
  */
object OffCrypto {

  /** Plain RC4 (the public stream cipher; no JCE dependency so key
    * sizes below export thresholds work everywhere).
    */
  final class Rc4(key: Array[Byte]) {
    require(key.nonEmpty && key.length <= 256, "rc4: bad key length")
    private val s = Array.tabulate(256)(_.toByte)
    private var x = 0
    private var y = 0
    locally {
      var j = 0
      var i = 0
      while (i < 256) {
        j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        i += 1
      }
    }
    /** Next keystream byte (0..255). */
    def next(): Int = {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      s((s(x) & 0xff) + (s(y) & 0xff) & 0xff) & 0xff
    }
    /** XOR `b` in place with the keystream; returns `b`. */
    def crypt(b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < b.length) { b(i) = (b(i) ^ next()).toByte; i += 1 }
      b
    }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }
  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("SHA-1")
    parts.foreach(d.update)
    d.digest()
  }
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def utf16le(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_16LE)

  // ---------------- §2.3.6: Office binary RC4 (Excel 97/2000)

  /** Per-block key for the 97/2000 handler: MD5(password)[0..4] ‖ salt,
    * repeated 16×, MD5'd; then MD5(that[0..4] ‖ block LE32) — 16 bytes.
    */
  def binaryRc4Key(password: String, salt: Array[Byte], block: Int): Array[Byte] = {
    require(salt.length == 16, "offcrypto: rc4 salt must be 16 bytes")
    val trunc = md5(utf16le(password)).take(5)
    val buf = new java.io.ByteArrayOutputStream(336)
    (0 until 16).foreach { _ => buf.write(trunc); buf.write(salt) }
    val h1 = md5(buf.toByteArray)
    md5(h1.take(5), le32(block))
  }

  /** §2.3.6.4: decrypt the verifier pair with one block-0 RC4 instance;
    * the password checks iff MD5(verifier) matches the decrypted hash.
    */
  def binaryRc4Verify(password: String, salt: Array[Byte],
      encVerifier: Array[Byte], encVerifierHash: Array[Byte]): Boolean = {
    require(encVerifier.length == 16 && encVerifierHash.length == 16,
      "offcrypto: rc4 verifier fields must be 16 bytes")
    val rc4 = new Rc4(binaryRc4Key(password, salt, 0))
    val v = rc4.crypt(encVerifier.clone())
    val h = rc4.crypt(encVerifierHash.clone())
    java.util.Arrays.equals(md5(v), h)
  }

  /** The writer half of §2.3.6.4: (encVerifier, encVerifierHash) for a
    * chosen plaintext verifier.
    */
  def binaryRc4MakeVerifier(password: String, salt: Array[Byte],
      verifier: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(verifier.length == 16, "offcrypto: verifier must be 16 bytes")
    val rc4 = new Rc4(binaryRc4Key(password, salt, 0))
    (rc4.crypt(verifier.clone()), rc4.crypt(md5(verifier)))
  }

  // ---------------- §2.3.5: RC4 CryptoAPI (Office XP/2003)

  /** Per-block CryptoAPI key: H0 = SHA-1(salt ‖ password UTF-16LE);
    * Hb = SHA-1(H0 ‖ block LE32); key = Hb[0, keyBits/8] — except
    * 40-bit keys, which zero-pad to 16 bytes (§2.3.5.2).
    */
  def cryptoApiKey(password: String, salt: Array[Byte], block: Int,
      keyBits: Int): Array[Byte] = {
    require(salt.length == 16, "offcrypto: cryptoapi salt must be 16 bytes")
    require(keyBits == 40 || (keyBits >= 40 && keyBits <= 128 && keyBits % 8 == 0),
      s"offcrypto: cryptoapi key size $keyBits")
    val h0 = sha1(salt, utf16le(password))
    val hb = sha1(h0, le32(block))
    if (keyBits == 40) hb.take(5) ++ new Array[Byte](11)
    else hb.take(keyBits / 8)
  }

  /** §2.3.5.1 verifier: one block-0 RC4 instance over verifier(16) then
    * hash(20); checks iff SHA-1(verifier) matches.
    */
  def cryptoApiVerify(password: String, salt: Array[Byte],
      encVerifier: Array[Byte], encVerifierHash: Array[Byte],
      keyBits: Int): Boolean = {
    require(encVerifier.length == 16 && encVerifierHash.length == 20,
      "offcrypto: cryptoapi verifier fields must be 16/20 bytes")
    val rc4 = new Rc4(cryptoApiKey(password, salt, 0, keyBits))
    val v = rc4.crypt(encVerifier.clone())
    val h = rc4.crypt(encVerifierHash.clone())
    java.util.Arrays.equals(sha1(v), h)
  }

  /** The writer half of §2.3.5.1. */
  def cryptoApiMakeVerifier(password: String, salt: Array[Byte],
      verifier: Array[Byte], keyBits: Int): (Array[Byte], Array[Byte]) = {
    require(verifier.length == 16, "offcrypto: verifier must be 16 bytes")
    val rc4 = new Rc4(cryptoApiKey(password, salt, 0, keyBits))
    (rc4.crypt(verifier.clone()), rc4.crypt(sha1(verifier)))
  }

  // ---------------- §2.3.7.1: XOR obfuscation verifier (table-free)

  /** The 16-bit password verifier Excel stores with an XOR-obfuscated
    * workbook (CreatePasswordVerifier_Method1): bit-15-rotate + XOR per
    * byte in reverse, then the length byte, then the 0xCE4B constant.
    * Password is the ANSI (single-byte) form, as the era's files store.
    */
  def xorVerifier(password: String): Int = {
    require(password.nonEmpty && password.length <= 255,
      "offcrypto: xor password length out of range")
    var v = 0
    def step(b: Int): Unit = {
      v = (((v >> 14) & 1) | ((v << 1) & 0x7fff)) ^ (b & 0xff)
    }
    password.reverseIterator.foreach(c => step(c.toInt))
    step(password.length)
    v ^ 0xCE4B
  }

  /** Excel's documented default password — tried transparently on open
    * ([MS-OFFCRYPTO] references it for the default-encryption case), so
    * workbooks encrypted with it are readable WITHOUT any secret: the
    * legacy-Office analog of the PDF empty-user-password class.
    */
  final val DefaultXlsPassword = "VelvetSweatshop"
}
