package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Modern encrypted OOXML ([MS-OFFCRYPTO] §2.3.4): Standard (AES-ECB,
  * 50k SHA-1 KDF) and Agile (AES-CBC, XML descriptor, HMAC integrity)
  * round-trips, every gate proven non-decorative, the OfficeCodec
  * routing, and the independent-python interop check (the sandbox has
  * no canonical encrypted-OOXML producer; `tools/check_ooxml_crypto.py`
  * is a from-the-spec second implementation in another language).
  */
class OoxmlCryptoSpec extends AnyFunSuite {

  private val pkg = OfficeCodec.writeDocx(Seq(
    "encrypted body paragraph one — café 漢字",
    "second paragraph with enough text to cross an AES block boundary",
    "third — final"))

  test("Standard encryption round-trips (AES-128/192/256)") {
    for (bits <- Seq(128, 192, 256)) {
      val enc = OoxmlCrypto.writeStandard(pkg, OoxmlCrypto.DefaultPassword, bits)
      assert(Cfb.kind(enc).contains("encrypted-ooxml"))
      assert(OoxmlCrypto.decrypt(enc).sameElements(pkg), s"AES-$bits")
      // genuinely ciphered: the zip magic is gone from the CFB payload
      val s = new String(Cfb.streams(enc)("EncryptedPackage"),
        StandardCharsets.ISO_8859_1)
      assert(!s.contains("word/document.xml"))
    }
  }

  test("Agile encryption round-trips (SHA512/256, SHA1/128, multi-segment)") {
    for ((alg, bits) <- Seq(("SHA512", 256), ("SHA1", 128), ("SHA256", 256))) {
      val enc = OoxmlCrypto.writeAgile(pkg, OoxmlCrypto.DefaultPassword, alg, bits)
      assert(OoxmlCrypto.decrypt(enc).sameElements(pkg), s"$alg/$bits")
    }
    // > 1 segment (4096) and a non-block-aligned tail
    val big = Array.tabulate(13000)(i => (i * 31 + 7).toByte)
    val enc = OoxmlCrypto.writeAgile(big, "pw", spinCount = 1000)
    assert(OoxmlCrypto.decrypt(enc, "pw").sameElements(big))
  }

  test("a REAL password stays the named reject — never a guess") {
    val std = OoxmlCrypto.writeStandard(pkg, "actual-secret")
    val e1 = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(std))
    assert(e1.getMessage.contains("password required"))
    val agile = OoxmlCrypto.writeAgile(pkg, "actual-secret", spinCount = 1000)
    val e2 = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(agile))
    assert(e2.getMessage.contains("password required"))
  }

  test("the Agile dataIntegrity HMAC is verified, not decorative") {
    val enc = OoxmlCrypto.writeAgile(pkg, OoxmlCrypto.DefaultPassword,
      spinCount = 1000)
    val streams = Cfb.streams(enc)
    val tampered = streams("EncryptedPackage").clone()
    tampered(tampered.length - 1) = (tampered(tampered.length - 1) ^ 1).toByte
    val rebuilt = Cfb.write(Seq(
      "EncryptionInfo" -> streams("EncryptionInfo"),
      "EncryptedPackage" -> tampered))
    val e = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(rebuilt))
    assert(e.getMessage.contains("HMAC mismatch"))
  }

  test("the Standard verifier is verified (corrupt encryptedVerifier)") {
    val enc = OoxmlCrypto.writeStandard(pkg, OoxmlCrypto.DefaultPassword)
    val streams = Cfb.streams(enc)
    val info = streams("EncryptionInfo").clone()
    // salt starts right after 12 + headerSize + 4; flip a verifier byte
    val headerSize = (info(8) & 0xff) | ((info(9) & 0xff) << 8) |
      ((info(10) & 0xff) << 16) | ((info(11) & 0xff) << 24)
    val vOff = 12 + headerSize + 4 + 16
    info(vOff) = (info(vOff) ^ 1).toByte
    val rebuilt = Cfb.write(Seq(
      "EncryptionInfo" -> info,
      "EncryptedPackage" -> streams("EncryptedPackage")))
    val e = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(rebuilt))
    assert(e.getMessage.contains("password required"))
  }

  test("named rejects: extensible version, missing streams, bad cipher") {
    val ext = Cfb.write(Seq(
      "EncryptionInfo" -> Array[Byte](3, 0, 3, 0, 0, 0, 0, 0),
      "EncryptedPackage" -> new Array[Byte](16)))
    val e = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(ext))
    assert(e.getMessage.contains("extensible"))
    val noInfo = Cfb.write(Seq("EncryptedPackage" -> new Array[Byte](16)))
    val e2 = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(noInfo))
    assert(e2.getMessage.contains("EncryptionInfo"))
  }

  test("OfficeCodec routes encrypted OOXML through the default password") {
    val plain = OfficeCodec.extractText(pkg)
    for (enc <- Seq(
      OoxmlCrypto.writeStandard(pkg, OoxmlCrypto.DefaultPassword),
      OoxmlCrypto.writeAgile(pkg, OoxmlCrypto.DefaultPassword, spinCount = 1000))) {
      val got = OfficeCodec.extractText(enc)
      assert(got.text == plain.text && got.format == plain.format)
    }
    // a real password bubbles the named reject through the router
    val locked = OoxmlCrypto.writeStandard(pkg, "actual-secret")
    val e = intercept[IllegalArgumentException](OfficeCodec.extractText(locked))
    assert(e.getMessage.contains("password required"))
  }

  test("independent python implementation decrypts OUR writer's output") {
    val py = Seq("/usr/bin/python3", "/root/miniconda/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(py.isDefined, "no python3 on this host")
    val tool = new java.io.File("tools/check_ooxml_crypto.py")
    assume(tool.exists, "tool not found (cwd not repo root?)")
    val dir = java.nio.file.Files.createTempDirectory("ooxmlcrypto").toFile
    try {
      val password = OoxmlCrypto.DefaultPassword
      def put(n: String, b: Array[Byte]): Unit =
        java.nio.file.Files.write(new java.io.File(dir, n).toPath, b)
      val std = Cfb.streams(OoxmlCrypto.writeStandard(pkg, password))
      val agile = Cfb.streams(OoxmlCrypto.writeAgile(pkg, password))
      put("std_info.bin", std("EncryptionInfo"))
      put("std_pkg.bin", std("EncryptedPackage"))
      put("agile_info.bin", agile("EncryptionInfo"))
      put("agile_pkg.bin", agile("EncryptedPackage"))
      put("password.txt", password.getBytes(StandardCharsets.UTF_8))
      put("expected.bin", pkg)
      val p = new ProcessBuilder(py.get, tool.getAbsolutePath,
        dir.getAbsolutePath).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      assume(!out.contains("ModuleNotFoundError"), "python cryptography absent")
      assert(p.waitFor() == 0, s"python check failed:\n$out")
      assert(out.contains("STD_OK") && out.contains("AGILE_OK"), out)
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }
}
