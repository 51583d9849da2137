package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class ZstandardSpec extends AnyFunSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("one frame roundtrips and the manual walk matches the native sizer") {
    val data = utf8("zstd frame payload 42 café " * 20)
    val frame = Zstandard.compressFrame(data)
    assert(Zstandard.isZstd(frame))
    val fs = Zstandard.frames(frame)
    assert(fs.length == 1 && !fs.head.skippable && fs.head.offset == 0)
    // the spec-direct block walk must agree with libzstd's own frame sizer
    val native = com.github.luben.zstd.Zstd.findFrameCompressedSize(frame)
    assert(fs.head.length.toLong == native)
    val back = Zstandard.decompressBounded(frame, 1 << 20, "t")
    assert(back sameElements data)
  }

  test("concatenated frames walk to exact boundaries and decompress in order") {
    val a = utf8("first frame " * 10)
    val b = utf8("second frame " * 10)
    val buf = Zstandard.compressFrame(a) ++ Zstandard.compressFrame(b)
    val fs = Zstandard.frames(buf)
    assert(fs.length == 2)
    assert(fs(0).offset == 0 && fs(1).offset == fs(0).length)
    assert(fs(1).offset + fs(1).length == buf.length)
    assert(Zstandard.decompressBounded(buf, 1 << 20, "t") sameElements (a ++ b))
    // per-frame decompression respects the span
    assert(Zstandard.decompressFrame(buf, fs(1), 1 << 20, "t") sameElements b)
  }

  test("skippable frames are framed, skipped by decompress, and carry payload") {
    val payload = utf8("side-channel metadata")
    val skip = Zstandard.skippableFrame(Zstandard.DictFrameMagic, payload)
    val data = utf8("real data")
    val buf = skip ++ Zstandard.compressFrame(data)
    val fs = Zstandard.frames(buf)
    assert(fs.length == 2 && fs(0).skippable && fs(0).magic == Zstandard.DictFrameMagic)
    assert(fs(0).length == payload.length + 8)
    assert(Zstandard.decompressBounded(buf, 1 << 20, "t") sameElements data)
  }

  test("bomb cap is a named reject enforced mid-stream") {
    val bomb = Zstandard.compressFrame(new Array[Byte](4 << 20)) // 4 MiB of zeros
    assert(bomb.length < 16 * 1024) // it really is a bomb shape
    val e = intercept[IllegalArgumentException](
      Zstandard.decompressBounded(bomb, 64 * 1024, "t"))
    assert(e.getMessage.contains("cap"))
  }

  test("truncation and unknown magic are named rejects") {
    val frame = Zstandard.compressFrame(utf8("data " * 50))
    val truncated = frame.take(frame.length - 3)
    intercept[IllegalArgumentException](Zstandard.frames(truncated))
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val e = intercept[IllegalArgumentException](Zstandard.frames(junk))
    assert(e.getMessage.contains("unknown frame magic"))
    // corrupt interior bytes: framing may still walk, decompress must reject
    val corrupt = frame.clone()
    corrupt(frame.length / 2) = (corrupt(frame.length / 2) ^ 0x5A).toByte
    intercept[IllegalArgumentException] {
      val fs = Zstandard.frames(corrupt)
      fs.filterNot(_.skippable)
        .foreach(Zstandard.decompressFrame(corrupt, _, 1 << 20, "t"))
    }
  }

  test("dictionary-compressed frames need the dict and roundtrip with it") {
    val samples = (0 until 64).map(i => utf8(
      s"WARC/1.0 http://host-${i % 7}.example/path/$i text/html response record body $i " * 4))
    val dict = Zstandard.trainDict(samples, 8 * 1024)
    assert(dict.nonEmpty, "trainer should produce a dict from 64 repetitive samples")
    val data = samples(3)
    val framed = Zstandard.compressFrame(data, dict = dict)
    // with the dict: exact roundtrip
    assert(Zstandard.decompressFrame(framed, Zstandard.frames(framed).head,
      1 << 20, "t", dict) sameElements data)
    // without it: a named reject, never silent garbage
    intercept[IllegalArgumentException](
      Zstandard.decompressFrame(framed, Zstandard.frames(framed).head, 1 << 20, "t"))
  }

  test("warc.zst: leading dict frame is honored in both raw and compressed form") {
    val samples = (0 until 64).map(i => utf8(
      s"WARC/1.0 http://host-${i % 7}.example/path/$i text/html response record body $i " * 4))
    val dict = Zstandard.trainDict(samples, 8 * 1024).get
    val data = utf8("record payload under dict")
    // compressed-dict layout (what writeWarcZstd emits)
    val buf1 = Zstandard.skippableFrame(Zstandard.DictFrameMagic,
      Zstandard.compressFrame(dict)) ++ Zstandard.compressFrame(data, dict = Some(dict))
    val (d1, rest1) = Zstandard.warcDict(buf1, 1 << 20)
    assert(d1.exists(_ sameElements dict) && rest1.length == 1)
    assert(Zstandard.decompressFrame(buf1, rest1.head, 1 << 20, "t", d1) sameElements data)
    // raw-dict layout
    val buf2 = Zstandard.skippableFrame(Zstandard.DictFrameMagic, dict) ++
      Zstandard.compressFrame(data, dict = Some(dict))
    val (d2, rest2) = Zstandard.warcDict(buf2, 1 << 20)
    assert(d2.exists(_ sameElements dict))
    assert(Zstandard.decompressFrame(buf2, rest2.head, 1 << 20, "t", d2) sameElements data)
    // no dict frame: None, all frames returned
    val (d3, rest3) = Zstandard.warcDict(Zstandard.compressFrame(data), 1 << 20)
    assert(d3.isEmpty && rest3.length == 1)
  }

  private def warcRecs(n: Int): Seq[(Map[String, String], Array[Byte])] =
    (0 until n).map { i =>
      Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.org/p$i",
        "WARC-Record-ID" -> s"<urn:uuid:$i>",
        "WARC-Date" -> "2026-08-16T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=response") ->
        Warc.httpResponse(200, "text/html", utf8(s"<html>page $i body ${"x" * 64}</html>"))
    }

  test("writeWarcZstd/readRecords roundtrip, with and without a dictionary") {
    val recs = warcRecs(9)
    for (dict <- Seq(None, Zstandard.trainDict(
      (0 until 64).flatMap(_ => recs.map(_._2)), 8 * 1024))) {
      val bytes = Warc.writeWarcZstd(recs, dict)
      assert(Warc.isWarc(bytes))
      val back = Warc.readRecords(bytes)
      assert(back.length == 9)
      back.zipWithIndex.foreach { case (r, i) =>
        assert(r.targetUri == s"http://example.org/p$i")
        assert(r.content sameElements recs(i)._2)
      }
    }
  }

  test("zstd located records carry self-contained frame spans (the CDX property)") {
    val recs = warcRecs(5)
    val dict = Zstandard.trainDict((0 until 64).flatMap(_ => recs.map(_._2)), 8 * 1024)
    val bytes = Warc.writeWarcZstd(recs, dict)
    val located = Warc.readRecordsLocated(bytes)
    assert(located.length == 5)
    located.foreach { lr =>
      // NOTE: with a dict, a ranged GET needs the dict frame too — the span
      // alone re-parses only for dict-less archives; assert framing exactness
      val span = java.util.Arrays.copyOfRange(bytes,
        lr.offset.toInt, (lr.offset + lr.length).toInt)
      val fs = Zstandard.frames(span)
      assert(fs.length == 1 && !fs.head.skippable)
    }
    // dict-less archives: the span alone is a complete archive slice
    val plain = Warc.writeWarcZstd(recs, None)
    Warc.readRecordsLocated(plain).zipWithIndex.foreach { case (lr, i) =>
      val slice = java.util.Arrays.copyOfRange(plain,
        lr.offset.toInt, (lr.offset + lr.length).toInt)
      val re = Warc.readRecords(slice)
      assert(re.length == 1 && re.head.targetUri == s"http://example.org/p$i")
    }
  }

  test("multi-record zstd frame is a named reject for the located walk") {
    val recs = warcRecs(2)
    val plainPair = Warc.writeWarc(recs) // both records, uncompressed
    val oneFrame = Zstandard.compressFrame(plainPair)
    assert(Warc.readRecords(oneFrame).length == 2) // linear read is fine
    val e = intercept[IllegalArgumentException](Warc.readRecordsLocated(oneFrame))
    assert(e.getMessage.contains("one per frame"))
  }

  test("content-encoding zstd decodes and failures divert") {
    val body = utf8("compressed response body café " * 8)
    val (token, wire) = HttpPayload.encodeTransfer(body, "zstd")
    assert(token == "zstd" && Zstandard.isZstd(wire))
    val d = HttpPayload.decodeTransfer(wire, "zstd")
    assert(d.clean && (d.body sameElements body))
    assert(HttpPayload.decodeTransfer(wire, " ZSTD ").clean) // case-insensitive
    // corrupt stream: divert with the original bytes, reason named
    val bad = wire.clone(); bad(wire.length - 2) = (bad(wire.length - 2) ^ 0x77).toByte
    val dv = HttpPayload.decodeTransfer(bad, "zstd")
    assert(!dv.clean && (dv.body sameElements bad) && dv.reason.nonEmpty)
    // bomb: capped, diverted (explicit cap below the 4 MiB expansion)
    val bomb = Zstandard.compressFrame(new Array[Byte](4 << 20))
    val db = HttpPayload.decodeTransfer(bomb, "zstd", maxOut = 64 * 1024)
    assert(!db.clean && db.reason.contains("cap"))
  }
}
