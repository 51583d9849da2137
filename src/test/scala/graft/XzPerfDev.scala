package graft
import graft.operators.{Xz, Bzip2}
object XzPerfDev {
  def main(args: Array[String]): Unit = {
    // a representative text corpus ~48 MB
    val sb = new StringBuilder
    (0 until 400000).foreach(i => sb.append(
      s"record $i | host src${i % 20}.invalid | the quick brown fox $i — café ${i % 97}\n"))
    val data = sb.toString.getBytes("UTF-8")
    def time[A](what: String, bytes: Long)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$what: $s%.2f s, ${bytes / s / 1e6}%.1f MB/s")
      r
    }
    println(s"corpus ${data.length / 1024 / 1024} MiB")
    // warm
    Xz.decompress(Xz.compress(data.take(4 << 20)))
    val packed = time("xz encode (greedy)", data.length)(Xz.compress(data, "crc64"))
    println(f"ratio ${packed.length.toDouble / data.length}%.4f (${packed.length / 1024} KiB)")
    time("xz decode", data.length)(Xz.decompress(packed))
    val bz = time("bzip2 encode (plain)", data.length)(Bzip2.compress(data.take(8 << 20)))
    time("bzip2 decode", (8 << 20).toLong)(Bzip2.decompress(bz))
  }
}
