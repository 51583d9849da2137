package graft

/** Dev-loop driver for the Lz4 decoder: decode every canonical-lz4 case
  * under /tmp/lz4dev/cases and compare with its .plain twin. Not a CI
  * test — the committed interop coverage lives in Lz4Spec.
  */
object Lz4Dev {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse("/tmp/lz4dev/cases"))
    val files = dir.listFiles().filter(_.getName.endsWith(".lz4")).sortBy(_.getName)
    var ok = 0
    var bad = 0
    files.foreach { f =>
      val base = f.getName
        .replaceAll("-(1|9|9bd|b4xcs|legacy|b5dbx)\\.lz4$", "")
        .replaceAll("\\.lz4$", "")
      val plainFile = new java.io.File(dir, base + ".plain")
      val packed = java.nio.file.Files.readAllBytes(f.toPath)
      val plain = java.nio.file.Files.readAllBytes(plainFile.toPath)
      try {
        val got = graft.operators.Lz4.decompress(packed)
        if (got.sameElements(plain)) ok += 1
        else { bad += 1; println(s"MISMATCH ${f.getName}: got ${got.length} want ${plain.length}") }
      } catch {
        case e: Throwable => bad += 1; println(s"THROW ${f.getName}: ${e.getMessage}")
      }
    }
    println(s"LZ4DEV ok=$ok bad=$bad")
    // writer self-check; the canonical-binary cross-check runs in Lz4Spec
    val data = ("writer payload — café 漢 " * 4000).getBytes("UTF-8")
    val mine = graft.operators.Lz4.compress(data)
    assert(graft.operators.Lz4.decompress(mine).sameElements(data), "self")
    println(s"WRITER_SELF_OK ratio=${mine.length.toDouble / data.length}")
    // emit enc-*.lz4 next to the cases for `lz4 -dc` cross-checks
    files.map(f => f.getName.replaceAll("-[^-.]+\\.lz4$", ""))
      .distinct.foreach { base =>
        val plainFile = new java.io.File(dir, base + ".plain")
        if (plainFile.exists()) {
          val plain = java.nio.file.Files.readAllBytes(plainFile.toPath)
          java.nio.file.Files.write(
            new java.io.File(dir.getParentFile, s"enc-$base.lz4").toPath,
            graft.operators.Lz4.compress(plain))
        }
      }
    println("ENC_WRITTEN")
  }
}
