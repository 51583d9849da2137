package graft
import graft.operators.Bzip2
object BzFuzzDev {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(77)
    val want = ("bz fuzz payload — café " * 300).getBytes("UTF-8")
    val single = Bzip2.compress(want)
    val multi = Bzip2.compress(want.take(2000)) ++ Bzip2.compress(want.drop(2000))
    val canon = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/bzip2_golden_multistream.bz2"))
    var named = 0; var ok = 0; var other = 0; var wrong = 0
    val wants = Seq(want, java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/bzip2_golden_multistream.plain")))
    def hit(b: Array[Byte]): Unit =
      try {
        val got = Bzip2.decompress(b, maxOut = 1 << 20)
        ok += 1
        if (!wants.exists(w => java.util.Arrays.equals(got, w))) {
          wrong += 1
          if (wrong <= 3) println(s"SILENT-WRONG bz decode (${got.length} bytes)")
        }
      } catch {
        case _: IllegalArgumentException => named += 1
        case e: Throwable => other += 1
          if (other <= 5) println(s"UNNAMED ${e.getClass.getName}: ${e.getMessage}")
      }
    for (base <- Seq(single, multi, canon); _ <- 0 until 3000) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      hit(b)
    }
    for (base <- Seq(single, multi, canon); _ <- 0 until 800)
      hit(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    for (_ <- 0 until 1000) {
      val b = new Array[Byte](8 + rnd.nextInt(300)); rnd.nextBytes(b)
      b(0) = 'B'; b(1) = 'Z'; b(2) = 'h'; b(3) = ('1' + rnd.nextInt(9)).toByte
      hit(b)
    }
    println(s"BZFUZZ named=$named ok=$ok OTHER=$other WRONG=$wrong")
  }
}
