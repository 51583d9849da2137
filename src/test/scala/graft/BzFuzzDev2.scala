package graft
import graft.operators.Bzip2
object BzFuzzDev2 {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(77)
    val want = ("bz fuzz payload — café " * 300).getBytes("UTF-8")
    val single = Bzip2.compress(want)
    val multi = Bzip2.compress(want.take(2000)) ++ Bzip2.compress(want.drop(2000))
    val canon = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/bzip2_golden_multistream.bz2"))
    val canonPlain = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/bzip2_golden_multistream.plain"))
    def analyze(tag: String, base: Array[Byte], wantFull: Array[Byte]): Unit = {
      // mutations
      (0 until 3000).foreach { i =>
        val b = base.clone()
        val at = rnd.nextInt(b.length)
        val v = rnd.nextInt(256).toByte
        val old = b(at); b(at) = v
        try {
          val got = Bzip2.decompress(b, maxOut = 1 << 20)
          if (!java.util.Arrays.equals(got, wantFull))
            println(s"MUT-WRONG $tag at=$at old=$old new=$v gotLen=${got.length}")
        } catch { case _: Throwable => () }
      }
      // truncations: legitimate iff the truncation point is a prefix of
      // streams AND output equals the corresponding plain prefix
      (0 until 800).foreach { _ =>
        val n = rnd.nextInt(base.length)
        try {
          val got = Bzip2.decompress(java.util.Arrays.copyOf(base, n), maxOut = 1 << 20)
          val isPrefix = got.length <= wantFull.length &&
            java.util.Arrays.equals(got, java.util.Arrays.copyOf(wantFull, got.length))
          if (!isPrefix) println(s"TRUNC-WRONG $tag n=$n gotLen=${got.length}")
          else println(s"TRUNC-PREFIX $tag n=$n gotLen=${got.length} (stream-boundary cut)")
        } catch { case _: Throwable => () }
      }
    }
    analyze("single", single, want)
    analyze("multi", multi, want)
    analyze("canon", canon, canonPlain)
    println("DONE")
  }
}
