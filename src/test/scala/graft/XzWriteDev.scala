package graft
object XzWriteDev {
  def main(args: Array[String]): Unit = {
    val data = ("interop payload — café 漢字 " * 2000).getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/xzdev/ours.plain"), data)
    Seq("none", "crc32", "crc64", "sha256").foreach { chk =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/xzdev/ours-$chk.xz"),
        graft.operators.Xz.compress(data, chk))
    }
    // empty payload too
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/xzdev/ours-empty.xz"),
      graft.operators.Xz.compress(Array.emptyByteArray, "crc32"))
    println("WROTE")
  }
}
