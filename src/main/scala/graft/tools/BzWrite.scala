package graft.tools
/** One-shot cross-check: emit a graft-compressed bzip2 stream for an
  * external canonical decoder to verify. Scratch tool, not a surface. */
object BzWrite {
  def main(args: Array[String]): Unit = {
    val data = ("cross-check: graft wrote this bzip2 stream — café\n" * 40)
      .getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_out.bz2"),
      graft.operators.Bzip2.compress(data, 1))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_out.plain"), data)
    println("wrote /tmp/graft_out.bz2")
  }
}
