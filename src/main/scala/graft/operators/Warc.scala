package graft.operators

/** Structural WARC 1.0 support (ISO 28500 — the format web crawls ship
  * in; the public Common Crawl corpus is WARC files). A training-data
  * pipeline's first batch step is exploding archives into per-capture
  * records, so this is the ingest seam: strict record framing, header
  * parse, HTTP response splitting, and whole-buffer gzip transparency
  * (JDK `GZIPInputStream` reads the concatenated per-record members the
  * WARC spec recommends).
  *
  * Record framing: `WARC/1.0` CRLF, `Name: value` header lines, CRLF
  * blank line, exactly `Content-Length` payload bytes, CRLF CRLF
  * trailer. `warc-type: response` records carry an HTTP response
  * (status line + headers + body) as their payload; [[parseHttpResponse]]
  * splits it the same structural way.
  */
object Warc {

  /** One WARC record: the headers that matter for curation plus the raw
    * payload. `headers` keys are lower-cased (header names are
    * case-insensitive per spec).
    */
  case class WarcRecord(
      warcType: String,
      targetUri: String,
      recordId: String,
      date: String,
      contentType: String,
      headers: Map[String, String],
      content: Array[Byte])

  private val Gzip = Array[Byte](0x1f, 0x8b.toByte)

  def isWarc(bytes: Array[Byte]): Boolean = {
    if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1)) return true
    if (Zstandard.isZstd(bytes)) return true
    bytes.length >= 8 && new String(bytes, 0, 8,
      java.nio.charset.StandardCharsets.US_ASCII) == "WARC/1.0"
  }

  /** Decompressed-size cap for one gunzip unit (a per-record gzip member,
    * or a whole non-member-framed archive). Generous — real WARC members
    * are single captures — but bounded: a hostile member cannot inflate
    * past it (see [[Gunzip.bounded]]).
    */
  final val MaxGunzipBytes: Long = 1L << 30

  private def gunzip(bytes: Array[Byte]): Array[Byte] =
    Gunzip.bounded(bytes, MaxGunzipBytes, "warc")

  /** Parse every record in the buffer — gunzipping first if the buffer is
    * gzip (including concatenated per-record members), or walking zstd
    * frames per the IIPC `.warc.zst` layout (leading dictionary frame
    * honored, each data frame decompressed against it — see
    * [[Zstandard.warcDict]]). Strict: a bad version line, a missing
    * Content-Length, a truncated payload, or a missing CRLF CRLF trailer
    * dies in a require — crawl triage must not silently drop the tail of
    * an archive.
    */
  def readRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (Zstandard.isZstd(bytes)) return zstdSpans(bytes).flatMap {
      case (plain, _, _) => walkPlain(plain).map(_._1)
    }
    val b = if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1))
      gunzip(bytes) else bytes
    walkPlain(b).map(_._1)
  }

  /** Decompress each zstd DATA frame of a `.warc.zst` buffer:
    * (plain bytes, archive offset, compressed length) per frame.
    */
  private def zstdSpans(bytes: Array[Byte]): Seq[(Array[Byte], Long, Long)] = {
    val (dict, spans) = Zstandard.warcDict(bytes, MaxGunzipBytes)
    spans.collect {
      case f if !f.skippable =>
        (Zstandard.decompressFrame(bytes, f, MaxGunzipBytes, "warc", dict),
          f.offset.toLong, f.length.toLong)
    }
  }

  /** The plain-framing walk: every record plus its [start, end) byte
    * span in `b`.
    */
  private def walkPlain(b: Array[Byte]): Seq[(WarcRecord, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(WarcRecord, Int, Int)]
    var p = 0
    while (p < b.length) {
      val (headers, bodyStart) = parseHeaderBlock(b, p, "WARC/1.0")
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(s"warc: record at byte $p lacks Content-Length")).toLong
      require(bodyStart + len + 4 <= b.length, s"warc: truncated record payload at byte $p")
      val content = java.util.Arrays.copyOfRange(b, bodyStart, (bodyStart + len).toInt)
      val trailer = (bodyStart + len).toInt
      require(b(trailer) == '\r' && b(trailer + 1) == '\n' &&
        b(trailer + 2) == '\r' && b(trailer + 3) == '\n',
        s"warc: record at byte $p missing CRLF CRLF trailer")
      out += ((WarcRecord(
        warcType = headers.getOrElse("warc-type", ""),
        targetUri = headers.getOrElse("warc-target-uri", ""),
        recordId = headers.getOrElse("warc-record-id", ""),
        date = headers.getOrElse("warc-date", ""),
        contentType = headers.getOrElse("content-type", ""),
        headers = headers,
        content = content), p, trailer + 4))
      p = trailer + 4
    }
    out.toSeq
  }

  /** One record plus its [offset, offset+length) span in the ARCHIVE
    * byte space — compressed space for per-member-gzipped archives. The
    * span is self-contained: `readRecords(bytes.slice(offset,
    * offset+length))` re-parses exactly this record, which is what makes
    * a CDX index work (record-level ranged GETs against a 100 TB object
    * store, no archive scan).
    */
  case class LocatedRecord(record: WarcRecord, offset: Long, length: Long)

  /** [[readRecords]] with archive-space offsets. Plain archives locate
    * records by the framing walk; gzipped archives walk RFC 1952 member
    * boundaries (header fields + raw-inflate + CRC32/ISIZE trailer, each
    * member verified) and require the spec-recommended one-record-per-
    * member layout — a multi-record member has no per-record compressed
    * span, so it rejects loudly rather than emit an index that lies.
    */
  def readRecordsLocated(bytes: Array[Byte]): Seq[LocatedRecord] = {
    if (Zstandard.isZstd(bytes)) return zstdSpans(bytes).map {
      case (plain, off, len) =>
        val recs = walkPlain(plain)
        require(recs.length == 1,
          s"warc: zstd frame at byte $off holds ${recs.length} records — CDX needs one per frame")
        LocatedRecord(recs.head._1, off, len)
    }
    if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1)) {
      val out = scala.collection.mutable.ArrayBuffer.empty[LocatedRecord]
      var p = 0
      while (p < bytes.length) {
        val end = gzipMemberEnd(bytes, p)
        val recs = walkPlain(gunzip(java.util.Arrays.copyOfRange(bytes, p, end)))
        require(recs.length == 1,
          s"warc: gzip member at byte $p holds ${recs.length} records — CDX needs one per member")
        out += LocatedRecord(recs.head._1, p.toLong, (end - p).toLong)
        p = end
      }
      out.toSeq
    } else
      walkPlain(bytes).map { case (r, s, e) => LocatedRecord(r, s.toLong, (e - s).toLong) }
  }

  /** End offset (exclusive) of the RFC 1952 gzip member starting at
    * `off`: parse the fixed header + optional FEXTRA/FNAME/FCOMMENT/FHCRC
    * fields, raw-inflate to the deflate stream's end, then verify the
    * CRC-32 + ISIZE trailer against the inflated bytes.
    */
  private def gzipMemberEnd(b: Array[Byte], off: Int): Int = {
    require(off + 10 <= b.length && b(off) == Gzip(0) && b(off + 1) == Gzip(1),
      s"gzip: no member magic at byte $off")
    require(b(off + 2) == 8, s"gzip: unsupported compression method ${b(off + 2)} at byte $off")
    val flg = b(off + 3) & 0xff
    var p = off + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8); p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 0x10) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) require(!inf.needsInput() && !inf.needsDictionary(),
          s"gzip: truncated deflate stream in member at byte $off")
        crc.update(buf, 0, n)
        total += n
      }
      val trailerAt = p + (b.length - p - inf.getRemaining)
      require(trailerAt + 8 <= b.length, s"gzip: member at byte $off truncated before trailer")
      def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      require(u32(trailerAt) == crc.getValue,
        s"gzip: CRC mismatch in member at byte $off")
      require(u32(trailerAt + 4) == (total & 0xffffffffL),
        s"gzip: ISIZE mismatch in member at byte $off")
      trailerAt + 8
    } finally inf.end()
  }

  /** Split an HTTP response payload: (status code, lower-cased headers,
    * body). The structural mirror of the WARC record parse — response
    * records nest one protocol inside the other.
    */
  def parseHttpResponse(payload: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    val (headers, bodyStart) = parseHeaderBlock(payload, 0, "HTTP/")
    val firstLineEnd = indexOfCrlf(payload, 0)
    val statusLine = new String(payload, 0, firstLineEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2, s"http: malformed status line '$statusLine'")
    (parts(1).toInt, headers,
      java.util.Arrays.copyOfRange(payload, bodyStart, payload.length))
  }

  /** Parse a `Version` line + `Name: value` lines up to the CRLF blank
    * line; returns (lower-cased headers, offset past the blank line).
    */
  private def parseHeaderBlock(b: Array[Byte], start: Int,
      versionPrefix: String): (Map[String, String], Int) = {
    var p = start
    var lineEnd = indexOfCrlf(b, p)
    val version = new String(b, p, lineEnd - p, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(version.startsWith(versionPrefix),
      s"warc: expected a $versionPrefix* line at byte $p, got '${version.take(32)}'")
    p = lineEnd + 2
    val headers = Map.newBuilder[String, String]
    while ({
      lineEnd = indexOfCrlf(b, p)
      lineEnd > p
    }) {
      val line = new String(b, p, lineEnd - p, java.nio.charset.StandardCharsets.ISO_8859_1)
      val colon = line.indexOf(':')
      require(colon > 0, s"warc: malformed header line '${line.take(64)}' at byte $p")
      headers += line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) ->
        line.substring(colon + 1).trim
      p = lineEnd + 2
    }
    (headers.result(), lineEnd + 2)
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    throw new IllegalArgumentException(s"warc: no CRLF after byte $from — truncated header block")
  }

  /** Write records in spec framing. `gzipped = true` emits one gzip
    * member PER RECORD and concatenates them — the layout the WARC spec
    * recommends so readers can split archives without decompressing
    * (and which [[readRecords]]' multi-member gunzip consumes).
    */
  def writeWarc(records: Seq[(Map[String, String], Array[Byte])],
      gzipped: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (headers, content) =>
      val rec = new java.io.ByteArrayOutputStream()
      val sb = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
      sb.append("Content-Length: ").append(content.length).append("\r\n\r\n")
      rec.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      rec.write(content)
      rec.write('\r'); rec.write('\n'); rec.write('\r'); rec.write('\n')
      if (gzipped) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec.toByteArray)
        // close(), not just finish(): close frees the native zlib Deflater
        // NOW. finish() alone leaked one native stream per member until
        // the Cleaner ran — ~100k un-ended Deflaters per bench query, which
        // throttled every later zlib user in the JVM 4-7x (closing the
        // underlying ByteArrayOutputStream is a no-op, so reuse is safe).
        gz.close()
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** Write records in the IIPC `.warc.zst` layout: one zstd frame PER
    * RECORD (the random-access property CDX indexing needs), preceded —
    * when `dict` is supplied — by a 0x184D2A5D skippable frame holding
    * the dictionary zstd-compressed, with every record frame compressed
    * against it. `dict = None` writes plain concatenated frames, which
    * [[readRecords]] consumes identically.
    */
  def writeWarcZstd(records: Seq[(Map[String, String], Array[Byte])],
      dict: Option[Array[Byte]] = None, level: Int = 3): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    dict.foreach { d =>
      out.write(Zstandard.skippableFrame(Zstandard.DictFrameMagic,
        Zstandard.compressFrame(d, level)))
    }
    records.foreach { case (headers, content) =>
      val rec = new java.io.ByteArrayOutputStream()
      val sb = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
      sb.append("Content-Length: ").append(content.length).append("\r\n\r\n")
      rec.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      rec.write(content)
      rec.write('\r'); rec.write('\n'); rec.write('\r'); rec.write('\n')
      out.write(Zstandard.compressFrame(rec.toByteArray, level, dict))
    }
    out.toByteArray
  }

  /** Build the HTTP response payload for a `response` record. */
  def httpResponse(status: Int, contentType: String, body: Array[Byte]): Array[Byte] =
    httpResponseEncoded(status, contentType, body, mode = "")

  /** [[httpResponse]] with the body transfer-encoded per
    * [[HttpPayload.encodeTransfer]] — the writer half of the
    * Content-Encoding seam (`mode` "" omits the header; "gzip" /
    * "deflate" / "deflate-raw" compress the wire bytes; any other token
    * is emitted over the raw bytes, the unsupported-encoding fixture
    * shape). Content-Length counts the WIRE bytes, as on the real wire.
    */
  def httpResponseEncoded(status: Int, contentType: String, body: Array[Byte],
      mode: String): Array[Byte] = {
    val (token, wire) = HttpPayload.encodeTransfer(body, mode)
    val reason = status match {
      case 200 => "OK"; case 404 => "Not Found"; case 301 => "Moved Permanently"
      case _ => "Status"
    }
    val encHdr = if (token.isEmpty) "" else s"Content-Encoding: $token\r\n"
    val head = s"HTTP/1.1 $status $reason\r\nContent-Type: $contentType\r\n" +
      encHdr + s"Content-Length: ${wire.length}\r\n\r\n"
    head.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ wire
  }
}
