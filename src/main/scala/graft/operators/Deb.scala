package graft.operators

import java.nio.charset.StandardCharsets

/** Debian `.deb` packages (deb(5)): an `ar` archive carrying exactly
  * `debian-binary` (the format version, "2.0\n"), `control.tar.*` (the
  * package metadata) and `data.tar.*` (the installed files) — one of
  * the big distributable-corpus formats (distro archives ship millions
  * of documentation/source/text payloads this way).
  *
  * The ar walk rides [[Ar]], the tar members ride [[Tar]], and the
  * per-member compression dispatches on the canonical extensions deb(5)
  * allows: `.tar.xz` (the modern default), `.tar.gz`, `.tar.zst`,
  * `.tar.bz2`, `.tar.lzma` and plain `.tar` — every one through an
  * in-house decoder with its own canonical interop gate. Unknown
  * extensions, missing members and bad ordering are NAMED rejects.
  * `DebSpec` pins committed goldens built by the system `dpkg-deb`
  * (gz / xz / zstd / none) and round-trips our own writer through
  * `dpkg-deb --info`/`--contents` when the binary is present.
  *
  * The control file parses RFC822-style: `Field: value` with leading-
  * space continuation lines (the `Description` long form).
  *
  * Scale shape: per-record byte walk inside the archive-explode lanes;
  * decode bounded by `maxOut` end to end.
  */
object Deb {

  final case class DebPackage(
      formatVersion: String,
      compression: String, // of data.tar
      control: Map[String, String],
      controlMembers: Seq[Tar.TarEntry],
      dataMembers: Seq[Tar.TarEntry])

  private def decompressMember(name: String, bytes: Array[Byte],
      maxOut: Int): (String, Array[Byte]) = {
    val dot = name.lastIndexOf('.')
    val ext = if (dot < 0) "" else name.substring(dot + 1)
    ext match {
      case "tar" => ("none", bytes)
      case "gz" => ("gzip", Gunzip.bounded(bytes, maxOut.toLong, s"deb $name"))
      case "xz" => ("xz", Xz.decompress(bytes, maxOut))
      case "zst" => ("zstd", Zstandard.decompressBounded(bytes, maxOut.toLong, s"deb $name"))
      case "bz2" => ("bzip2", Bzip2.decompress(bytes, maxOut = maxOut))
      case "lzma" => ("lzma", Xz.decompressLzmaAlone(bytes, maxOut))
      case other => throw new IllegalArgumentException(
        s"deb: unsupported member compression '.$other' ($name)")
    }
  }

  /** Parse the RFC822-style control file: `Field: value`, continuation
    * lines start with space/tab and append with the newline kept (the
    * deb(5) multiline form; the literal-dot blank line stays verbatim).
    */
  def parseControl(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    text.split("\n", -1).foreach { line =>
      if (line.nonEmpty) {
        if (line(0) == ' ' || line(0) == '\t') {
          require(last != null, "deb: control continuation before any field")
          out(last) = out(last) + "\n" + line.drop(1)
        } else {
          val i = line.indexOf(':')
          require(i > 0, s"deb: malformed control line '$line'")
          val k = line.substring(0, i)
          require(!out.contains(k), s"deb: duplicate control field '$k'")
          out(k) = line.substring(i + 1).trim
          last = k
        }
      }
    }
    out.toMap
  }

  def isDeb(b: Array[Byte]): Boolean =
    Ar.isAr(b) && {
      try Ar.readEntries(b, maxOut = 1 << 20).headOption.exists(_.name == "debian-binary")
      catch { case _: IllegalArgumentException => false }
    }

  /** Full package walk: format version, control fields, control + data
    * tar members (directories included, as tar reports them).
    */
  def readPackage(b: Array[Byte], maxOut: Int = 256 << 20): DebPackage = {
    val members = Ar.readEntries(b, maxOut)
    require(members.nonEmpty && members.head.name == "debian-binary",
      "deb: first ar member must be debian-binary")
    val version = new String(members.head.payload, StandardCharsets.US_ASCII)
    require(version.startsWith("2."), s"deb: unsupported format version '${version.trim}'")
    val controlM = members.find(_.name.startsWith("control.tar"))
      .getOrElse(throw new IllegalArgumentException("deb: control.tar member missing"))
    val dataM = members.find(_.name.startsWith("data.tar"))
      .getOrElse(throw new IllegalArgumentException("deb: data.tar member missing"))
    require(members.indexWhere(_.name.startsWith("control.tar")) <
      members.indexWhere(_.name.startsWith("data.tar")),
      "deb: control.tar must precede data.tar")
    val (_, controlTar) = decompressMember(controlM.name, controlM.payload, maxOut)
    val (comp, dataTar) = decompressMember(dataM.name, dataM.payload, maxOut)
    val controlEntries = Tar.readEntries(controlTar)
    val controlFile = controlEntries
      .find(e => e.name == "control" || e.name == "./control")
      .getOrElse(throw new IllegalArgumentException("deb: control file missing"))
    val fields = parseControl(new String(controlFile.payload, StandardCharsets.UTF_8))
    require(fields.contains("Package"), "deb: control without a Package field")
    DebPackage(version.trim, comp, fields, controlEntries, Tar.readEntries(dataTar))
  }

  /** Fixture writer: the dpkg-deb layout with our own codecs.
    * `compression` ∈ xz | gzip | zstd | none.
    */
  def write(control: Map[String, String],
      dataFiles: Seq[(String, Array[Byte])],
      compression: String = "xz"): Array[Byte] = {
    require(control.contains("Package"), "deb write: Package field required")
    val controlText = control.map { case (k, v) =>
      s"$k: ${v.replace("\n", "\n ")}"
    }.mkString("", "\n", "\n")
    val controlTar = Tar.writeTar(Seq(Tar.TarEntry("./control",
      controlText.getBytes(StandardCharsets.UTF_8).length.toLong, '0',
      controlText.getBytes(StandardCharsets.UTF_8))))
    val dataTar = Tar.writeTar(dataFiles.map { case (n, p) =>
      Tar.TarEntry(if (n.startsWith("./")) n else s"./$n", p.length.toLong, '0', p)
    })
    val (ext, pack) = compression match {
      case "xz" => ("xz", (d: Array[Byte]) => Xz.compress(d, check = "crc32"))
      case "gzip" => ("gz", (d: Array[Byte]) => {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(d); g.close()
        bos.toByteArray
      })
      case "zstd" => ("zst", (d: Array[Byte]) => Zstandard.compressFrame(d))
      case "none" => ("tar", identity[Array[Byte]] _)
      case other => throw new IllegalArgumentException(s"deb write: unknown compression '$other'")
    }
    def member(base: String, tar: Array[Byte]): Ar.ArEntry = {
      val packed = pack(tar)
      val name = if (ext == "tar") s"$base.tar" else s"$base.tar.$ext"
      Ar.ArEntry(name, packed.length.toLong, packed)
    }
    Ar.writeAr(Seq(
      Ar.ArEntry("debian-binary", 4L, "2.0\n".getBytes(StandardCharsets.US_ASCII)),
      member("control", controlTar),
      member("data", dataTar)))
  }
}
