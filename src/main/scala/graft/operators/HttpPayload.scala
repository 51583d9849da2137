package graft.operators

/** HTTP `Content-Encoding` transfer decoding (RFC 9110 §8.4.1) — the seam
  * between the archive walk and every downstream byte consumer: wild WARC
  * captures store response bodies exactly as the server sent them, so a
  * `Content-Encoding: gzip` page reaches the charset/boilerplate/PDF
  * stages as compressed bytes unless something undoes the transfer coding
  * first. (Common Crawl's own WARCs mostly store decoded bodies, but raw
  * captures, mirrored archives, and many in-house crawlers do not.)
  *
  * Decode policy, same discipline as every other untrusted-bytes stage:
  *
  *  - `""` / `identity`: pass-through;
  *  - `gzip` / `x-gzip`: [[Gunzip.bounded]] (multi-member, CRC-32 + ISIZE
  *    verified, decompression-bomb cap);
  *  - `deflate`: zlib-wrapped per the RFC, with a RAW-deflate retry — the
  *    server bug documented since the HTTP/1.1 era (token named after the
  *    raw format, so a large server class ships it unwrapped); both paths
  *    bounded;
  *  - `zstd`: RFC 9659 / RFC 8878 via [[Zstandard.decompressBounded]]
  *    (concatenated frames allowed, skippable frames skipped, bounded);
  *  - `compress` / `x-compress`: the REGISTERED HTTP/1.0-era LZW coding
  *    (RFC 9110 §8.4.1.1) — ancient-server captures still carry it;
  *  - `bzip2` / `xz` / `lz4` (+ `x-` forms): non-registry tokens some
  *    servers emit anyway — each rides its in-house canonical-interop
  *    decoder with every declared checksum verified, bounded;
  *  - anything else (`br`, chains like `gzip, br`) and any
  *    truncated / corrupt / over-cap stream: DIVERT, don't die — the
  *    original stored bytes come back with `clean = false` and a reason
  *    that names the reject, so the quarantine seam files the record and
  *    the archive scan never fails.
  *
  * Scale shape: per-record scalar work inside the archive explode's
  * partition — bodies never shuffle to be decoded.
  */
object HttpPayload {

  /** Per-body decompression cap — same bomb arithmetic as the WARC member
    * and PDF stream caps (deflate expands ~1000x; a hostile body costs
    * one buffer, not the heap).
    */
  final val MaxBodyBytes: Long = 64L * 1024 * 1024

  /** Decode outcome: `body` is the decoded payload when `clean`, the
    * ORIGINAL stored bytes otherwise; `reason` names the reject ("" when
    * clean).
    */
  final case class TransferDecoded(body: Array[Byte], clean: Boolean,
      reason: String)

  /** Undo `Content-Encoding` on a stored response body. `encoding` is the
    * raw header value ("" when the header was absent); matching is
    * case-insensitive per RFC 9110 §8.4.
    */
  def decodeTransfer(body: Array[Byte], encoding: String,
      maxOut: Long = MaxBodyBytes): TransferDecoded = {
    val enc = encoding.trim.toLowerCase(java.util.Locale.ROOT)
    try enc match {
      case "" | "identity" => TransferDecoded(body, clean = true, "")
      case "gzip" | "x-gzip" =>
        TransferDecoded(Gunzip.bounded(body, maxOut, "http"), clean = true, "")
      case "deflate" =>
        val decoded =
          try inflate(body, maxOut, nowrap = false)
          catch {
            // retry ONLY on a format failure (the raw wire fails the zlib
            // header check immediately) — a bomb-cap reject must surface
            // as the cap, never be laundered through the raw retry
            case e: IllegalArgumentException
                if e.getMessage.contains("corrupt deflate stream") =>
              inflate(body, maxOut, nowrap = true)
          }
        TransferDecoded(decoded, clean = true, "")
      case "zstd" =>
        // RFC 9659: the payload is one or more zstd frames (RFC 8878);
        // skippable frames are skipped, the cap is enforced mid-stream
        TransferDecoded(
          Zstandard.decompressBounded(body, maxOut, "http"), clean = true, "")
      case "bzip2" | "x-bzip2" =>
        // a non-registry token some servers emit anyway; both CRCs verify
        TransferDecoded(Bzip2.decompress(body,
          math.min(maxOut, Int.MaxValue.toLong).toInt), clean = true, "")
      case "xz" | "x-xz" =>
        // same non-registry class as bzip2; every container CRC verifies
        TransferDecoded(Xz.decompress(body,
          math.min(maxOut, Int.MaxValue.toLong).toInt), clean = true, "")
      case "lz4" | "x-lz4" =>
        // same non-registry class; frame checksums verify (Lz4Spec
        // interops the decoder against the canonical CLI both ways)
        TransferDecoded(Lz4.decompress(body,
          math.min(maxOut, Int.MaxValue.toLong).toInt), clean = true, "")
      case "compress" | "x-compress" =>
        // a REGISTERED coding since HTTP/1.0 (RFC 9110 §8.4.1.1) that
        // predates integrity checks; ancient-server captures carry it
        TransferDecoded(Lzw.decompressZ(body,
          math.min(maxOut, Int.MaxValue.toLong).toInt), clean = true, "")
      case other =>
        TransferDecoded(body, clean = false,
          s"http: unsupported content-encoding '$other'")
    } catch {
      case e: IllegalArgumentException =>
        TransferDecoded(body, clean = false, e.getMessage)
      case e: java.io.IOException => // truncated/corrupt gzip framing
        TransferDecoded(body, clean = false,
          s"http: corrupt gzip stream (${e.getMessage})")
    }
  }

  /** Bounded zlib (`nowrap = false`) or raw (`nowrap = true`) inflate —
    * the deflate twin of [[Gunzip.bounded]].
    */
  private def inflate(data: Array[Byte], maxOut: Long,
      nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64L, data.length.toLong * 4), maxOut).toInt)
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"http: corrupt deflate stream (${e.getMessage})")
          }
        if (n == 0) {
          if (inf.finished()) ()
          else if (inf.needsInput() || inf.needsDictionary())
            throw new IllegalArgumentException("http: truncated deflate stream")
        } else {
          if (out.size().toLong + n > maxOut)
            throw new IllegalArgumentException(
              s"http: deflate payload decompresses past the $maxOut-byte cap" +
                " — rejected as a decompression bomb")
          out.write(buf, 0, n)
        }
      }
      out.toByteArray
    } finally inf.end() // free the native zlib state NOW
  }

  /** Transfer-ENCODE a body for the writer half (demo corpora + tests).
    * `mode`: "" (no header), "gzip", "deflate" (zlib-wrapped per the RFC),
    * "deflate-raw" (the wild-server bug: header token `deflate`, raw
    * wire), "zstd" (one RFC 8878 frame), or any other token (bytes pass
    * through UNTOUCHED under that
    * token — the fixture shape for unsupported-encoding rejects). Returns
    * (headerValue, wireBytes); headerValue "" means omit the header.
    */
  def encodeTransfer(body: Array[Byte], mode: String): (String, Array[Byte]) =
    mode match {
      case "" => ("", body)
      case "gzip" =>
        val out = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(body)
        gz.close() // close(), not finish(): frees the native Deflater NOW
        ("gzip", out.toByteArray)
      case "deflate" => ("deflate", deflate(body, nowrap = false))
      case "deflate-raw" => ("deflate", deflate(body, nowrap = true))
      case "zstd" => ("zstd", Zstandard.compressFrame(body))
      case "bzip2" => ("bzip2", Bzip2.compress(body))
      case "xz" => ("xz", Xz.compress(body))
      case "lz4" => ("lz4", Lz4.compress(body))
      case "compress" => ("compress", Lzw.compressZ(body))
      case other => (other, body)
    }

  private def deflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](64 * 1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
