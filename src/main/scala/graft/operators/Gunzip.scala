package graft.operators

/** Bounded gzip decompression for attacker-controlled crawl payloads.
  *
  * `GZIPInputStream.readAllBytes()` with no cap is a decompression bomb:
  * deflate expands up to ~1030x, so a ~1 MB hostile member inflates to
  * ~1 GB per record — across 32 concurrent tasks that is an executor OOM,
  * not a clean per-record reject. Every gunzip of untrusted bytes in the
  * engine goes through [[bounded]], which inflates through a counting loop
  * and throws the moment output would exceed the caller's cap — the same
  * probe-before-pay policy as the image pixel-budget guard
  * (`Multimodal.scala`'s decompression-bomb check).
  */
object Gunzip {

  /** Decompress `bytes` (a gzip stream, possibly multi-member) enforcing
    * `maxOut` on the DECOMPRESSED size. Throws `IllegalArgumentException`
    * naming `what` once the cap is crossed — by construction at most
    * `maxOut + 64 KiB` is ever buffered, so a bomb costs one buffer, not
    * the heap.
    */
  def bounded(bytes: Array[Byte], maxOut: Long, what: String): Array[Byte] = {
    require(maxOut > 0 && maxOut <= Int.MaxValue - 8,
      s"gunzip: cap $maxOut out of range")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4, maxOut).toInt)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > maxOut) throw new IllegalArgumentException(
          s"$what: gzip payload decompresses past the $maxOut-byte cap — rejected as a decompression bomb")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }
}
