package graft.operators

/** Structural image metadata — the typed-metadata side of the multimodal
  * seam. Training pipelines need image metadata WITHOUT pixel decode:
  * EXIF orientation decides whether width/height are transposed before
  * resize, embedded text rides provenance (PNG tEXt keys, EXIF
  * ImageDescription), and all of it must come from a header walk that
  * costs bytes-read, not megapixels-decoded.
  *
  * PNG (ISO/IEC 15948): 8-byte signature then length/type/data/CRC
  * chunks; IHDR carries dimensions + bit depth + color type, tEXt
  * carries latin-1 key NUL value. Every chunk CRC is verified — same
  * strictness contract as the archive walks.
  *
  * JPEG/EXIF (ITU T.81 + CIPA DC-008): FF-marker segments up to SOS;
  * SOF0/1/2 carry dimensions; APP1 "Exif\0\0" wraps a TIFF structure
  * (II/MM byte order, IFD0 entries of tag/type/count/value) from which
  * Orientation (0x0112, SHORT 1-8) and ImageDescription (0x010E, ASCII)
  * are read. Unknown tags, unknown chunks, and missing EXIF are all
  * fine — absent metadata is None, never an error; structural damage
  * (bad CRC, truncated segment) rejects loudly.
  */
object ImageMetadata {

  /** Extracted metadata: `format` is "png" or "jpeg"; `texts` holds PNG
    * tEXt key->value pairs; `orientation`/`description` come from EXIF.
    */
  final case class ImageMeta(
      format: String,
      width: Int,
      height: Int,
      bitDepth: Option[Int],
      colorType: Option[Int],
      orientation: Option[Int],
      description: Option[String],
      texts: Map[String, String])

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(java.util.Arrays.copyOf(b, 8), PngSig)

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte

  /** Parse metadata from a PNG or JPEG buffer. Header-only: no pixel
    * decode, cost is linear in header bytes (entropy-coded data is never
    * touched for JPEG; PNG walks chunk FRAMES, skipping IDAT payloads).
    */
  def parse(bytes: Array[Byte]): ImageMeta =
    if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else throw new IllegalArgumentException(
      "image metadata: neither a PNG signature nor a JPEG SOI")

  private def u16be(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  // ---- PNG ----

  private def parsePng(b: Array[Byte]): ImageMeta = {
    var p = 8
    var width = -1; var height = -1
    var bitDepth: Option[Int] = None; var colorType: Option[Int] = None
    val texts = Map.newBuilder[String, String]
    var seenIend = false
    while (p < b.length && !seenIend) {
      require(p + 12 <= b.length, s"png: truncated chunk header at byte $p")
      val len = u32be(b, p)
      require(len <= Int.MaxValue - 12 && p + 12 + len <= b.length,
        s"png: chunk at byte $p overruns the buffer")
      val dataOff = p + 8
      val name = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(b, p + 4, 4 + len.toInt)
      require(crc.getValue == u32be(b, dataOff + len.toInt),
        s"png: CRC mismatch on chunk '$name' at byte $p")
      name match {
        case "IHDR" =>
          require(len == 13, s"png: IHDR length $len != 13")
          width = u32be(b, dataOff).toInt; height = u32be(b, dataOff + 4).toInt
          bitDepth = Some(b(dataOff + 8) & 0xff); colorType = Some(b(dataOff + 9) & 0xff)
        case "tEXt" =>
          val data = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len.toInt)
          val nul = data.indexOf(0.toByte)
          require(nul > 0, "png: tEXt chunk without a key separator")
          texts += new String(data, 0, nul, java.nio.charset.StandardCharsets.ISO_8859_1) ->
            new String(data, nul + 1, data.length - nul - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
        case "IEND" => seenIend = true
        case _ => // unknown/pixel chunks: frame-walked, payload untouched
      }
      p = dataOff + len.toInt + 4
    }
    require(width >= 0, "png: no IHDR chunk")
    require(seenIend, "png: no IEND chunk — truncated file")
    ImageMeta("png", width, height, bitDepth, colorType, None, None, texts.result())
  }

  /** Splice a tEXt chunk (latin-1 key NUL value, correct CRC) into a PNG
    * immediately after IHDR — bytes in, bytes out, pixel data untouched.
    */
  def addPngText(png: Array[Byte], key: String, value: String): Array[Byte] = {
    require(isPng(png), "addPngText: not a PNG")
    val ihdrEnd = 8 + 12 + 13 // sig + IHDR frame
    val data = key.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      Array[Byte](0) ++ value.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, ihdrEnd)
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    w32(data.length.toLong)
    val typeAndData = "tEXt".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ data
    out.write(typeAndData)
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData)
    w32(crc.getValue)
    out.write(png, ihdrEnd, png.length - ihdrEnd)
    out.toByteArray
  }

  // ---- JPEG / EXIF ----

  private def parseJpeg(b: Array[Byte]): ImageMeta = {
    var p = 2
    var width = -1; var height = -1
    var orientation: Option[Int] = None
    var description: Option[String] = None
    var done = false
    while (!done && p + 4 <= b.length) {
      require(b(p) == 0xff.toByte, s"jpeg: expected a marker at byte $p")
      val marker = b(p + 1) & 0xff
      val len = u16be(b, p + 2)
      require(len >= 2 && p + 2 + len <= b.length, s"jpeg: truncated segment at byte $p")
      marker match {
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1/2: precision(1) height(2) width(2)
          height = u16be(b, p + 5); width = u16be(b, p + 7)
        case 0xe1 if len >= 8 + 6 && b(p + 8) == 0 && b(p + 9) == 0 &&
            new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "Exif" =>
          val (o, d) = parseTiff(b, p + 10, len - 2 - 6)
          orientation = o.orElse(orientation); description = d.orElse(description)
        case 0xda => done = true // SOS: entropy-coded data starts, stop
        case _ => // other APPn/DQT/DHT/COM: skipped by frame
      }
      p += 2 + len
    }
    require(width >= 0, "jpeg: no SOF segment before SOS")
    ImageMeta("jpeg", width, height, None, None, orientation, description, Map.empty)
  }

  /** IFD0 of a TIFF structure at `off` (length `n`): Orientation and
    * ImageDescription if present.
    */
  private def parseTiff(b: Array[Byte], off: Int, n: Int): (Option[Int], Option[String]) = {
    require(n >= 8, "exif: TIFF header truncated")
    val le = b(off) == 'I'.toByte && b(off + 1) == 'I'.toByte
    val be = b(off) == 'M'.toByte && b(off + 1) == 'M'.toByte
    require(le || be, "exif: TIFF byte-order mark is neither II nor MM")
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) else u16be(b, o)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else u32be(b, o)
    require(u16(off + 2) == 42, "exif: TIFF magic != 42")
    val ifd0 = off + u32(off + 4).toInt
    require(ifd0 + 2 <= off + n, "exif: IFD0 offset past the segment")
    val count = u16(ifd0)
    var orientation: Option[Int] = None
    var description: Option[String] = None
    var i = 0
    while (i < count) {
      val e = ifd0 + 2 + i * 12
      require(e + 12 <= off + n, s"exif: IFD0 entry $i truncated")
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      tag match {
        case 0x0112 if typ == 3 && cnt == 1 => // Orientation, SHORT
          orientation = Some(u16(e + 8))
        case 0x010e if typ == 2 => // ImageDescription, ASCII (count incl NUL)
          val strLen = cnt.toInt
          val at = if (strLen <= 4) e + 8 else off + u32(e + 8).toInt
          require(at + strLen <= off + n, "exif: ImageDescription past the segment")
          val raw = new String(b, at, strLen, java.nio.charset.StandardCharsets.US_ASCII)
          val cut = raw.indexOf(0.toChar)
          description = Some(if (cut >= 0) raw.substring(0, cut) else raw)
        case _ =>
      }
      i += 1
    }
    (orientation, description)
  }

  /** Splice an APP1 Exif segment (little-endian TIFF, IFD0 with
    * ImageDescription + Orientation) right after SOI. Deterministic
    * bytes for a given (orientation, description).
    */
  def addJpegExif(jpeg: Array[Byte], orientation: Int, description: String): Array[Byte] = {
    require(isJpeg(jpeg), "addJpegExif: not a JPEG")
    require(orientation >= 1 && orientation <= 8,
      s"addJpegExif: orientation must be 1-8, got $orientation")
    val desc = description.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0) // ASCII values are NUL-terminated; count includes it
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      tiff.write((v & 0xff).toInt); tiff.write(((v >> 8) & 0xff).toInt)
      tiff.write(((v >> 16) & 0xff).toInt); tiff.write(((v >> 24) & 0xff).toInt)
    }
    tiff.write('I'); tiff.write('I'); w16(42); w32(8L) // II, magic, IFD0 at 8
    w16(2) // two entries, ascending tag order
    val dataArea = 8 + 2 + 2 * 12 + 4 // after count, entries, next-IFD pointer
    // 0x010E ImageDescription, ASCII
    w16(0x010e); w16(2); w32(desc.length.toLong)
    if (desc.length <= 4) { tiff.write(desc); (desc.length until 4).foreach(_ => tiff.write(0)) }
    else w32(dataArea.toLong)
    // 0x0112 Orientation, SHORT, inline value
    w16(0x0112); w16(3); w32(1L); w16(orientation); w16(0)
    w32(0L) // no IFD1
    if (desc.length > 4) tiff.write(desc)
    val payload = "Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0) ++ tiff.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2) // SOI
    out.write(0xff); out.write(0xe1)
    out.write(((payload.length + 2) >> 8) & 0xff); out.write((payload.length + 2) & 0xff)
    out.write(payload)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
