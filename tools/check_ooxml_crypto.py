#!/usr/bin/env python3
"""Independent [MS-OFFCRYPTO] §2.3.4 implementation (python hashlib +
cryptography) used as the interop oracle for graft.operators.OoxmlCrypto:
no canonical encrypted-OOXML producer exists in this sandbox, so the
Scala writer's output is decrypted HERE, by code written against the
spec in a different language sharing nothing but the published
algorithm — the same both-directions discipline the codec specs get
from the xz/lz4 binaries.

Usage: check_ooxml_crypto.py <dir>
  <dir>/std_info.bin    EncryptionInfo stream (Standard, version x.2)
  <dir>/std_pkg.bin     EncryptedPackage stream (Standard)
  <dir>/agile_info.bin  EncryptionInfo stream (Agile, version 4.4)
  <dir>/agile_pkg.bin   EncryptedPackage stream (Agile)
  <dir>/password.txt    the password (UTF-8)
  <dir>/expected.bin    the plaintext OPC package both must decrypt to

Prints "STD_OK"/"AGILE_OK" per scheme and exits nonzero on mismatch.
"""
import hashlib
import hmac as hmac_mod
import struct
import sys
import base64
import xml.etree.ElementTree as ET

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def aes_ecb_dec(key, data):
    c = Cipher(algorithms.AES(key), modes.ECB()).decryptor()
    return c.update(data) + c.finalize()


def aes_cbc_dec(key, iv, data):
    c = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    return c.update(data) + c.finalize()


def std_key(password, salt, key_bits):
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    hfinal = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    x1 = hashlib.sha1(bytes(0x36 ^ (hfinal[i] if i < 20 else 0)
                            for i in range(64))).digest()
    x2 = hashlib.sha1(bytes(0x5C ^ (hfinal[i] if i < 20 else 0)
                            for i in range(64))).digest()
    return (x1 + x2)[: key_bits // 8]


def check_standard(info, pkg, password, expected):
    vmaj, vmin = struct.unpack_from("<HH", info, 0)
    assert vmin == 2, (vmaj, vmin)
    header_size = struct.unpack_from("<I", info, 8)[0]
    alg_id, alg_hash, key_bits = struct.unpack_from("<III", info, 12 + 8)
    assert alg_id in (0x660E, 0x660F, 0x6610), hex(alg_id)
    p = 12 + header_size
    salt_size = struct.unpack_from("<I", info, p)[0]
    assert salt_size == 16
    salt = info[p + 4: p + 20]
    enc_verifier = info[p + 20: p + 36]
    vh_size = struct.unpack_from("<I", info, p + 36)[0]
    assert vh_size == 20
    enc_vh = info[p + 40: p + 72]
    key = std_key(password, salt, key_bits)
    verifier = aes_ecb_dec(key, enc_verifier)
    vh = aes_ecb_dec(key, enc_vh)[:20]
    assert hashlib.sha1(verifier).digest() == vh, "std verifier mismatch"
    size = struct.unpack_from("<Q", pkg, 0)[0]
    plain = aes_ecb_dec(key, pkg[8:])[:size]
    assert plain == expected, "std package mismatch"


HASHES = {"SHA1": hashlib.sha1, "SHA256": hashlib.sha256,
          "SHA384": hashlib.sha384, "SHA512": hashlib.sha512}
BK_VI = bytes([0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79])
BK_VV = bytes([0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E])
BK_KV = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])
BK_HK = bytes([0x5F, 0xB2, 0xAD, 0x01, 0x0C, 0xB9, 0xE1, 0xF6])
BK_HV = bytes([0xA0, 0x67, 0x7F, 0x02, 0xB2, 0x2C, 0x84, 0x33])


def fit(b, n, pad=0x36):
    return b[:n] if len(b) >= n else b + bytes([pad]) * (n - len(b))


def check_agile(info, pkg, password, expected):
    vmaj, vmin = struct.unpack_from("<HH", info, 0)
    assert (vmaj, vmin) == (4, 4)
    root = ET.fromstring(info[8:].decode("utf-8"))
    ns = {"e": "http://schemas.microsoft.com/office/2006/encryption",
          "p": "http://schemas.microsoft.com/office/2006/keyEncryptor/password"}
    kd = root.find("e:keyData", ns)
    ek = root.find(".//p:encryptedKey", ns)
    di = root.find("e:dataIntegrity", ns)
    kd_alg, kd_bits = kd.get("hashAlgorithm"), int(kd.get("keyBits"))
    kd_block = int(kd.get("blockSize"))
    kd_salt = base64.b64decode(kd.get("saltValue"))
    ke_alg, ke_bits = ek.get("hashAlgorithm"), int(ek.get("keyBits"))
    ke_salt = base64.b64decode(ek.get("saltValue"))
    spin = int(ek.get("spinCount"))
    H = HASHES[ke_alg]
    h = H(ke_salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = H(struct.pack("<I", i) + h).digest()

    def dk(bk, nbytes, alg=ke_alg):
        return fit(HASHES[alg](h + bk).digest(), nbytes)

    iv_ke = fit(ke_salt, int(ek.get("blockSize")))
    vi = aes_cbc_dec(dk(BK_VI, ke_bits // 8), iv_ke,
                     base64.b64decode(ek.get("encryptedVerifierHashInput")))[:16]
    hs = H().digest_size
    vv = aes_cbc_dec(dk(BK_VV, ke_bits // 8), iv_ke,
                     base64.b64decode(ek.get("encryptedVerifierHashValue")))[:hs]
    assert H(vi).digest() == vv, "agile verifier mismatch"
    secret = aes_cbc_dec(dk(BK_KV, ke_bits // 8), iv_ke,
                         base64.b64decode(ek.get("encryptedKeyValue")))[: kd_bits // 8]

    def iv_kd(bk):
        return fit(HASHES[kd_alg](kd_salt + bk).digest(), kd_block)

    if di is not None:
        kd_hs = HASHES[kd_alg]().digest_size
        hk = aes_cbc_dec(secret, iv_kd(BK_HK),
                         base64.b64decode(di.get("encryptedHmacKey")))[:kd_hs]
        want = aes_cbc_dec(secret, iv_kd(BK_HV),
                           base64.b64decode(di.get("encryptedHmacValue")))[:kd_hs]
        got = hmac_mod.new(hk, pkg, HASHES[kd_alg]).digest()
        assert got == want, "agile HMAC mismatch"
    size = struct.unpack_from("<Q", pkg, 0)[0]
    out = bytearray()
    p, seg = 8, 0
    remaining = size
    while remaining > 0:
        take = min(4096, remaining)
        ctake = ((take + 15) // 16) * 16
        iv = fit(HASHES[kd_alg](kd_salt + struct.pack("<I", seg)).digest(), kd_block)
        out += aes_cbc_dec(secret, iv, pkg[p: p + ctake])[:take]
        p += ctake
        remaining -= take
        seg += 1
    assert bytes(out) == expected, "agile package mismatch"


def main():
    d = sys.argv[1]

    def rd(n):
        with open(f"{d}/{n}", "rb") as f:
            return f.read()

    password = rd("password.txt").decode("utf-8").strip()
    expected = rd("expected.bin")
    check_standard(rd("std_info.bin"), rd("std_pkg.bin"), password, expected)
    print("STD_OK")
    check_agile(rd("agile_info.bin"), rd("agile_pkg.bin"), password, expected)
    print("AGILE_OK")


if __name__ == "__main__":
    main()
