package graft
import graft.operators.Xz
object XzEncDev {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    def randBytes(n: Int) = { val a = new Array[Byte](n); rnd.nextBytes(a); a }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "one" -> Array[Byte](7),
      "text" -> ("the quick brown fox — café né 漢字\n" * 3000).getBytes("UTF-8"),
      "runs" -> Array.fill(150000)('a'.toByte),
      "binary" -> Array.tabulate(70000)(i => ((i * 131) % 251).toByte),
      "random" -> randBytes(130000), // forces the stored fallback
      "mixed" -> (randBytes(65000) ++ ("compressible tail " * 5000).getBytes("UTF-8")),
      "storedfirst" -> (randBytes(61000) ++ ("then text " * 8000).getBytes("UTF-8")),
      "lines" -> (0 until 30000).map(i => s"line $i with shared prefix content\n").mkString.getBytes("UTF-8"))
    var failed = 0
    cases.foreach { case (name, data) =>
      for (chk <- Seq("crc32", "crc64", "sha256", "none")) {
        val packed = try Xz.compress(data, chk) catch {
          case e: Throwable => println(s"ENCFAIL $name/$chk: ${e.getMessage}"); failed += 1; null
        }
        if (packed != null) {
          val back = try Xz.decompress(packed) catch {
            case e: Throwable => println(s"DECFAIL $name/$chk: ${e.getMessage}"); failed += 1; null
          }
          if (back != null && !back.sameElements(data)) { println(s"MISMATCH $name/$chk"); failed += 1 }
        }
      }
      val packed = Xz.compress(data)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xzdev/enc-$name.xz"), packed)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xzdev/enc-$name.plain"), data)
      println(f"RATIO $name: ${data.length} -> ${packed.length} (${if (data.length==0) 1.0 else packed.length.toDouble/data.length}%.3f)")
    }
    // random property sweep
    (0 until 200).foreach { i =>
      val n = rnd.nextInt(200000)
      val style = i % 4
      val data = style match {
        case 0 => randBytes(n)
        case 1 => Array.fill(n)((rnd.nextInt(4) + 'a').toByte)
        case 2 => { val a = new Array[Byte](n); var j=0; while (j<n) { a(j) = ((j/17)%7 + 'A').toByte; j+=1 }; a }
        case 3 => ("tok" + i + " ").getBytes.padTo(math.max(1,n), 'x'.toByte)
      }
      val back = Xz.decompress(Xz.compress(data, Seq("none","crc32","crc64","sha256")(i % 4)))
      if (!back.sameElements(data)) { println(s"SWEEPFAIL $i n=$n style=$style"); failed += 1 }
    }
    println(s"XZENCDEV failed=$failed")
  }
}
