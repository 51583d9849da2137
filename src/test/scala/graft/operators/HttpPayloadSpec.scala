package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class HttpPayloadSpec extends AnyFunSuite {

  private val text = "payload 42 café\n" * 3
  private val raw = text.getBytes(StandardCharsets.UTF_8)

  private def decoded(mode: String): HttpPayload.TransferDecoded = {
    val (token, wire) = HttpPayload.encodeTransfer(raw, mode)
    HttpPayload.decodeTransfer(wire, token)
  }

  test("identity and absent header pass through") {
    val d = HttpPayload.decodeTransfer(raw, "")
    assert(d.clean && d.reason.isEmpty && (d.body sameElements raw))
    val d2 = HttpPayload.decodeTransfer(raw, "identity")
    assert(d2.clean && (d2.body sameElements raw))
  }

  test("gzip roundtrips (and the wire is actually compressed framing)") {
    val (token, wire) = HttpPayload.encodeTransfer(raw, "gzip")
    assert(token == "gzip" && wire(0) == 0x1f.toByte && wire(1) == 0x8b.toByte)
    val d = HttpPayload.decodeTransfer(wire, "gzip")
    assert(d.clean && (d.body sameElements raw))
  }

  test("x-gzip and case-insensitive tokens decode like gzip") {
    val (_, wire) = HttpPayload.encodeTransfer(raw, "gzip")
    assert(HttpPayload.decodeTransfer(wire, "x-gzip").clean)
    assert(HttpPayload.decodeTransfer(wire, " GZip ").clean)
  }

  test("deflate decodes both the zlib-wrapped and the RAW wild-server wire") {
    val z = decoded("deflate")
    assert(z.clean && (z.body sameElements raw))
    // the server bug: token `deflate`, unwrapped deflate bytes
    val r = decoded("deflate-raw")
    assert(r.clean && (r.body sameElements raw))
  }

  test("xz roundtrips through the transfer seam (every container CRC live)") {
    val body = ("xz on the wire — café " * 50).getBytes("UTF-8")
    val (token, wire) = HttpPayload.encodeTransfer(body, "xz")
    assert(token == "xz" && Xz.isXz(wire))
    val d = HttpPayload.decodeTransfer(wire, "xz")
    assert(d.clean && d.body.sameElements(body))
    assert(HttpPayload.decodeTransfer(wire, "x-xz").clean)
    // corrupt wire diverts with the named reason, bytes kept
    val broken = wire.clone(); broken(20) = (broken(20) ^ 1).toByte
    val bad = HttpPayload.decodeTransfer(broken, "xz")
    assert(!bad.clean && bad.reason.contains("xz:"))
  }

  test("lz4 roundtrips through the transfer seam (frame checksums live)") {
    val body = ("lz4 on the wire — café " * 50).getBytes("UTF-8")
    val (token, wire) = HttpPayload.encodeTransfer(body, "lz4")
    assert(token == "lz4" && Lz4.isLz4(wire))
    val d = HttpPayload.decodeTransfer(wire, "lz4")
    assert(d.clean && d.body.sameElements(body))
    assert(HttpPayload.decodeTransfer(wire, "x-lz4").clean)
    // corrupt wire diverts with the named reason, bytes kept
    val broken = wire.clone(); broken(20) = (broken(20) ^ 1).toByte
    val bad = HttpPayload.decodeTransfer(broken, "lz4")
    assert(!bad.clean && bad.reason.contains("lz4"), bad.reason)
    assert(bad.body.sameElements(broken))
  }

  test("compress (LZW) roundtrips through the transfer seam") {
    val body = ("compress on the wire " * 60).getBytes("UTF-8")
    val (token, wire) = HttpPayload.encodeTransfer(body, "compress")
    assert(token == "compress" && Lzw.isZ(wire))
    val d = HttpPayload.decodeTransfer(wire, "compress")
    assert(d.clean && d.body.sameElements(body))
    assert(HttpPayload.decodeTransfer(wire, "x-compress").clean)
    // structural damage diverts with the named reason, bytes kept
    val broken = wire.clone(); broken(2) = (broken(2) | 0x40).toByte
    val bad = HttpPayload.decodeTransfer(broken, "compress")
    assert(!bad.clean && bad.reason.contains("lzw"), bad.reason)
  }

  test("unsupported tokens divert with the original bytes kept") {
    // ("compress" left this list in r14 — it decodes via Lzw now)
    for (tok <- Seq("br", "sdch", "gzip, br")) {
      val d = HttpPayload.decodeTransfer(raw, tok)
      assert(!d.clean && (d.body sameElements raw))
      assert(d.reason.contains("unsupported content-encoding"))
    }
  }

  test("truncated and corrupt streams divert, never throw") {
    val (_, gz) = HttpPayload.encodeTransfer(raw, "gzip")
    val cut = HttpPayload.decodeTransfer(java.util.Arrays.copyOf(gz, 8), "gzip")
    assert(!cut.clean && (cut.body.length == 8))
    val junk = HttpPayload.decodeTransfer(
      "not deflate at all".getBytes(StandardCharsets.US_ASCII), "deflate")
    assert(!junk.clean)
    val (_, zl) = HttpPayload.encodeTransfer(raw, "deflate")
    val zcut = HttpPayload.decodeTransfer(java.util.Arrays.copyOf(zl, 4), "deflate")
    assert(!zcut.clean)
  }

  test("decompression bombs hit the cap and divert with the reason named") {
    val big = new Array[Byte](1 << 20) // 1 MiB of zeros compresses tiny
    val (_, gz) = HttpPayload.encodeTransfer(big, "gzip")
    val d = HttpPayload.decodeTransfer(gz, "gzip", maxOut = 4096)
    assert(!d.clean && d.reason.contains("cap"))
    val (_, zl) = HttpPayload.encodeTransfer(big, "deflate")
    val d2 = HttpPayload.decodeTransfer(zl, "deflate", maxOut = 4096)
    assert(!d2.clean && d2.reason.contains("cap"))
  }

  test("Warc.httpResponseEncoded carries the token and wire-length framing") {
    val payload = Warc.httpResponseEncoded(200, "text/plain", raw, "gzip")
    val (status, headers, body) = Warc.parseHttpResponse(payload)
    assert(status == 200 && headers("content-encoding") == "gzip")
    assert(headers("content-length").toInt == body.length)
    val d = HttpPayload.decodeTransfer(body, headers("content-encoding"))
    assert(d.clean && (d.body sameElements raw))
    // plain httpResponse emits no Content-Encoding header at all
    val (_, h2, _) = Warc.parseHttpResponse(Warc.httpResponse(200, "t/p", raw))
    assert(!h2.contains("content-encoding"))
  }
}
