package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [MS-OFFCRYPTO] handlers + the encrypted-.xls seam: RC4 97/2000,
  * RC4 CryptoAPI, the XOR verifier, and the FILEPASS lanes.
  */
class OffCryptoSpec extends AnyFunSuite {

  test("RC4 keystream matches the published test vector") {
    // the classic RC4 vector: key "Key", plaintext "Plaintext" →
    // BBF316E8D940AF0AD3 (public algorithm literature)
    val rc4 = new OffCrypto.Rc4("Key".getBytes("ASCII"))
    val got = rc4.crypt("Plaintext".getBytes("ASCII"))
    assert(got.map(b => f"$b%02X").mkString == "BBF316E8D940AF0AD3")
  }

  test("binary RC4 verifier round-trips and rejects wrong passwords") {
    val salt = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    val verifier = Array.tabulate(16)(i => (i * 13 + 1).toByte)
    val (ev, evh) = OffCrypto.binaryRc4MakeVerifier("VelvetSweatshop", salt, verifier)
    assert(OffCrypto.binaryRc4Verify("VelvetSweatshop", salt, ev, evh))
    assert(!OffCrypto.binaryRc4Verify("wrong", salt, ev, evh))
  }

  test("CryptoAPI verifier round-trips at 40 and 128 bits") {
    val salt = Array.tabulate(16)(i => (i * 11 + 5).toByte)
    val verifier = Array.tabulate(16)(i => (i * 3 + 9).toByte)
    for (bits <- Seq(40, 128)) {
      val (ev, evh) = OffCrypto.cryptoApiMakeVerifier("secret", salt, verifier, bits)
      assert(OffCrypto.cryptoApiVerify("secret", salt, ev, evh, bits), s"$bits bits")
      assert(!OffCrypto.cryptoApiVerify("other", salt, ev, evh, bits), s"$bits bits")
    }
    // 40-bit keys zero-pad to 16 bytes (§2.3.5.2) — the key is NOT 5 bytes
    assert(OffCrypto.cryptoApiKey("p", salt, 0, 40).length == 16)
    assert(OffCrypto.cryptoApiKey("p", salt, 0, 40).drop(5).forall(_ == 0))
  }

  test("per-block keys differ (the 1024-byte rekey has teeth)") {
    val salt = Array.tabulate(16)(_.toByte)
    assert(!OffCrypto.binaryRc4Key("pw", salt, 0)
      .sameElements(OffCrypto.binaryRc4Key("pw", salt, 1)))
    assert(!OffCrypto.cryptoApiKey("pw", salt, 0, 128)
      .sameElements(OffCrypto.cryptoApiKey("pw", salt, 1, 128)))
  }

  test("XOR verifier matches the published 16-bit hash semantics") {
    // deterministic + password-sensitive; the classic algorithm is
    // rotate-bit15 + xor per char reversed, length, then 0xCE4B
    val a = OffCrypto.xorVerifier("VelvetSweatshop")
    val b = OffCrypto.xorVerifier("velvetsweatshop")
    assert(a != b && (a & 0xFFFF) == a && a != 0)
    intercept[IllegalArgumentException](OffCrypto.xorVerifier(""))
  }

  // ------------------------------------------------ the .xls FILEPASS seam

  private val sheets = Seq(
    "S0" -> Seq(Seq[Any]("hello café", 42L), Seq[Any](3.5, "wide 日本 text")),
    "S1" -> Seq(Seq[Any]("second sheet", true)))

  test("rc4-encrypted workbook (default password) extracts identically") {
    val plain = MsXls.extract(MsXls.write(sheets))
    val enc = MsXls.write(sheets, encryption = "rc4")
    assert(MsXls.extract(enc) == plain)
    // the stored stream is genuinely ciphered: the SST text is gone
    assert(!new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("hello caf"))
  }

  test("rc4capi-encrypted workbook (default password) extracts identically") {
    val plain = MsXls.extract(MsXls.write(sheets))
    val enc = MsXls.write(sheets, encryption = "rc4capi")
    assert(MsXls.extract(enc) == plain)
    assert(!new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("second sheet"))
  }

  test("CryptoAPI EncryptionHeader records ProviderType PROV_RSA_FULL (1)") {
    // real Excel writes 0x01 for RC4 CryptoAPI ([MS-OFFCRYPTO] §2.3.5.1);
    // 0x18 is the AES provider and external validators balk. The header
    // sits in the FILEPASS record: find the AlgID 0x6801 LE marker and
    // read the ProviderType two u32 fields later.
    val enc = MsXls.write(sheets, encryption = "rc4capi")
    val algId = Array[Byte](0x01, 0x68, 0, 0)
    val at = enc.indices.find(i => i + 12 <= enc.length &&
      algId.indices.forall(j => enc(i + j) == algId(j)))
    assert(at.isDefined, "AlgID 0x6801 not found in the FILEPASS header")
    val pt = at.get + 12 // AlgID, AlgIDHash, KeySize, then ProviderType
    val providerType = (0 until 4).map(j => (enc(pt + j) & 0xffL) << (8 * j)).sum
    assert(providerType == 1L, s"ProviderType $providerType, want PROV_RSA_FULL")
  }

  test("a REAL password stays the named reject — never a guess") {
    for (m <- Seq("rc4", "rc4capi")) {
      val enc = MsXls.write(sheets, encryption = m, password = "actual-secret")
      val e = intercept[IllegalArgumentException](MsXls.extract(enc))
      assert(e.getMessage.contains("password required"), m)
    }
  }

  test("encryption survives forced CONTINUE splits (the cursor seam)") {
    val wide = Seq("W" -> Seq(Seq[Any]("x" * 300, "日" * 200, "mix 漢 end")))
    val plain = MsXls.extract(MsXls.write(wide, maxRecordBytes = 64))
    val enc = MsXls.write(wide, maxRecordBytes = 64, encryption = "rc4capi")
    assert(MsXls.extract(enc) == plain)
  }

  test("multi-block streams rekey correctly across the 1024-byte boundary") {
    // enough cells to push the Workbook stream well past several blocks
    val big = Seq("B" -> (0 until 200).map(r =>
      Seq[Any](s"row $r content with some padding text", r.toLong, r * 1.5)))
    for (m <- Seq("rc4", "rc4capi")) {
      val plain = MsXls.extract(MsXls.write(big))
      assert(MsXls.extract(MsXls.write(big, encryption = m)) == plain, m)
    }
  }

  test("XOR obfuscation and unknown FILEPASS shapes are named rejects") {
    // hand-build a workbook whose FILEPASS says XOR (type 0)
    val enc = MsXls.write(sheets, encryption = "rc4")
    // find the FILEPASS payload inside the Workbook stream and flip its
    // wEncryptionType to 0 — reject must name XOR, not mis-decrypt
    val strs = Cfb.streams(enc)
    val wb = strs("Workbook").clone()
    var o = 0
    var patched = false
    while (!patched && o + 4 < wb.length) {
      val id = (wb(o) & 0xff) | ((wb(o + 1) & 0xff) << 8)
      val len = (wb(o + 2) & 0xff) | ((wb(o + 3) & 0xff) << 8)
      if (id == 0x002F) { wb(o + 4) = 0; wb(o + 5) = 0; patched = true }
      o += 4 + len
    }
    assert(patched, "fixture must contain a FILEPASS")
    val e = intercept[IllegalArgumentException](
      MsXls.extract(Cfb.write(Seq("Workbook" -> wb))))
    assert(e.getMessage.contains("XOR-obfuscated"))
  }
}
