package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ImageMetadataSpec extends AnyFunSuite {

  test("png: tEXt splice round-trips, IHDR fields read, ImageIO still decodes") {
    val png = Multimodal.deterministicPng(7L, 20, 12)
    val tagged = ImageMetadata.addPngText(png, "source", "src7/archive")
    val m = ImageMetadata.parse(tagged)
    assert(m.format == "png" && m.width == 20 && m.height == 12)
    assert(m.bitDepth.contains(8) && m.colorType.nonEmpty)
    assert(m.texts == Map("source" -> "src7/archive"))
    assert(m.orientation.isEmpty && m.description.isEmpty)
    // interop: a standard decoder accepts the spliced file
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tagged))
    assert(img != null && img.getWidth == 20 && img.getHeight == 12)
    // plain PNG parses with no texts
    assert(ImageMetadata.parse(png).texts.isEmpty)
  }

  test("png: chunk CRC damage rejects loudly") {
    val tagged = ImageMetadata.addPngText(
      Multimodal.deterministicPng(1L, 8, 8), "k", "v")
    val bad = tagged.clone()
    bad(8 + 12 + 13 + 9) = (bad(8 + 12 + 13 + 9) ^ 0x40).toByte // inside the tEXt data
    val e = intercept[IllegalArgumentException](ImageMetadata.parse(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("jpeg: exif splice round-trips, dims from SOF survive, ImageIO decodes") {
    val jpeg = Multimodal.deterministicMjpeg(3L, 24, 16, 1)
    val tagged = ImageMetadata.addJpegExif(jpeg, orientation = 6,
      description = "doc 3 from src3")
    val m = ImageMetadata.parse(tagged)
    assert(m.format == "jpeg" && m.width == 24 && m.height == 16)
    assert(m.orientation.contains(6))
    assert(m.description.contains("doc 3 from src3"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tagged))
    assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    // short description takes the inline-value path (count <= 4 incl NUL)
    val short = ImageMetadata.parse(ImageMetadata.addJpegExif(jpeg, 1, "abc"))
    assert(short.description.contains("abc") && short.orientation.contains(1))
    // plain JPEG: dims only, no exif
    val plain = ImageMetadata.parse(jpeg)
    assert(plain.width == 24 && plain.orientation.isEmpty && plain.description.isEmpty)
  }

  test("exif: big-endian (MM) TIFF parses too") {
    // hand-built APP1: MM TIFF, IFD0 with one Orientation entry
    val tiff = Array[Int](
      'M', 'M', 0, 42, 0, 0, 0, 8, // header, IFD0 at 8
      0, 1, // one entry
      0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 5, 0, 0, // Orientation = 5
      0, 0, 0, 0 // no IFD1
    ).map(_.toByte)
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val jpeg = Multimodal.deterministicMjpeg(4L, 8, 8, 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    out.write(((payload.length + 2) >> 8) & 0xff); out.write((payload.length + 2) & 0xff)
    out.write(payload)
    out.write(jpeg, 2, jpeg.length - 2)
    val m = ImageMetadata.parse(out.toByteArray)
    assert(m.orientation.contains(5) && m.description.isEmpty)
  }

  test("jpeg: truncated segment rejects; non-image rejects") {
    val tagged = ImageMetadata.addJpegExif(Multimodal.deterministicMjpeg(5L, 8, 8, 1), 3, "x")
    intercept[IllegalArgumentException](
      ImageMetadata.parse(java.util.Arrays.copyOf(tagged, 20)))
    intercept[IllegalArgumentException](
      ImageMetadata.parse("not an image".getBytes("UTF-8")))
  }
}
