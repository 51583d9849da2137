package graft
import graft.operators.Xz
object XzFuzzDev {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(1234)
    val seed = Xz.compress(("fuzz seed payload — café " * 400).getBytes("UTF-8"), "crc32")
    val seedCanon = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/xz_golden_lcmix.xz"))
    var named = 0
    var okDecode = 0
    var other = 0
    var wrong = 0
    val want = Seq(("fuzz seed payload — café " * 400).getBytes("UTF-8"),
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/test/resources/xz_golden_lcmix.plain")))
    def hit(b: Array[Byte]): Unit =
      try {
        val got = Xz.decompress(b, maxOut = 16 << 20)
        okDecode += 1
        // a mutation that still decodes must decode to the ORIGINAL
        // payload (same-value writes, don't-care container bytes) —
        // anything else is a silently-wrong acceptance
        if (!want.exists(w => java.util.Arrays.equals(got, w))) {
          wrong += 1
          println(s"SILENT-WRONG decode of a mutated file (${got.length} bytes)")
        }
      }
      catch {
        case _: IllegalArgumentException => named += 1
        case e: Throwable =>
          other += 1
          if (other <= 5) println(s"UNNAMED ${e.getClass.getName}: ${e.getMessage}")
      }
    // 1) single-byte mutations of our file and a canonical file
    for (base <- Seq(seed, seedCanon); _ <- 0 until 4000) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      hit(b)
    }
    // 2) truncations
    for (base <- Seq(seed, seedCanon); _ <- 0 until 1000)
      hit(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    // 3) random garbage behind a valid magic
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](16 + rnd.nextInt(400))
      rnd.nextBytes(b)
      System.arraycopy(Xz.Magic, 0, b, 0, 6)
      hit(b)
    }
    // 4) pure garbage
    for (_ <- 0 until 1000) { val b = new Array[Byte](rnd.nextInt(100)); rnd.nextBytes(b); hit(b) }
    println(s"FUZZ named=$named okDecode=$okDecode OTHER=$other WRONG=$wrong")
    // ALONE fuzz too
    var named2 = 0; var ok2 = 0; var other2 = 0
    val aseed = Xz.compressLzmaAlone(("alone fuzz " * 300).getBytes)
    for (_ <- 0 until 4000) {
      val b = aseed.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Xz.decompressLzmaAlone(b, maxOut = 16 << 20); ok2 += 1 }
      catch {
        case _: IllegalArgumentException => named2 += 1
        case e: Throwable => other2 += 1
          if (other2 <= 5) println(s"ALONE UNNAMED ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    println(s"ALONEFUZZ named=$named2 okDecode=$ok2 OTHER=$other2")
  }
}
