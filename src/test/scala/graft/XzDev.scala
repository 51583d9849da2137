package graft

/** Dev-loop driver for the Xz decoder: decode every canonical-xz case
  * under /tmp/xzdev/cases and compare with its .plain twin. Not a CI
  * test — the committed interop coverage lives in XzSpec.
  */
object XzDev {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse("/tmp/xzdev/cases"))
    val files = dir.listFiles().filter(_.getName.endsWith(".xz")).sortBy(_.getName)
    var ok = 0
    var bad = 0
    files.foreach { f =>
      val base = f.getName.replaceAll("(-[0-9]e?)?\\.(crc32|crc64|sha256|none)\\.xz$", "")
        .replaceAll("\\.xz$", "")
      val plainFile = new java.io.File(dir, base + ".plain")
      val packed = java.nio.file.Files.readAllBytes(f.toPath)
      val plain = java.nio.file.Files.readAllBytes(plainFile.toPath)
      try {
        val got = graft.operators.Xz.decompress(packed)
        if (got.sameElements(plain)) ok += 1
        else { bad += 1; println(s"MISMATCH ${f.getName}: got ${got.length} want ${plain.length}") }
      } catch {
        case e: Throwable => bad += 1; println(s"THROW ${f.getName}: ${e.getMessage}")
      }
    }
    println(s"XZDEV ok=$ok bad=$bad")
    // writer side: canonical xz decodes ours (checked via round-trip here;
    // the binary check runs in XzSpec when available)
    val data = ("writer payload — café 漢" * 1000).getBytes("UTF-8")
    Seq("none", "crc32", "crc64", "sha256").foreach { chk =>
      val mine = graft.operators.Xz.compress(data, chk)
      assert(graft.operators.Xz.decompress(mine).sameElements(data), s"self $chk")
    }
    println("WRITER_SELF_OK")
  }
}
