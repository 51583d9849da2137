package graft.operators

/** Classic `.Z` compress — LZW with the ncompress wire quirks (the
  * format gzip's `unlzw.c` documents publicly; `.tar.Z` still rides a
  * large slice of FTP/Usenet-era preservation corpora). Magic
  * 0x1F 0x9D, a flags byte (low 5 bits = max code width 9..16, bit 7 =
  * block mode with a CLEAR code at 256), then LSB-first bit-packed
  * codes whose width grows 9 → maxbits — with the infamous GROUP
  * ALIGNMENT: codes travel in groups of eight (n_bits bytes each), and
  * on every width change or CLEAR the stream skips to the next group
  * boundary (measured from the PREVIOUS boundary), remainder discarded.
  * After a CLEAR the free counter re-seeds at 256 — unreachable as a
  * code (256 IS clear) yet counted toward the width-bump points — and
  * the pairing chain continues across the boundary (oldcode survives,
  * so the first post-clear entry pairs pre-clear context). Both warts
  * are wire-visible; the gzip-refereed CLEAR cases in LzwSpec pin them.
  *
  * Canonical interop both directions: the committed `.tar.Z` golden is
  * written by `bsdtar -cZf` (libarchive's own LZW encoder) and must
  * decode byte-identically to `gzip -dc`'s output of the same file;
  * our compressor's streams are decoded live by `gzip -dc` and
  * `bsdcat` in LzwSpec. Truncation mid-code, codes past the
  * dictionary, non-literal restarts and over-cap output are named
  * rejects.
  *
  * Scale shape: per-record scalar codec inside the archive explode,
  * output bounded by `maxOut` — like every transfer codec here.
  */
object Lzw {

  private final val Clear = 256

  def isZ(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0x1F && (b(1) & 0xff) == 0x9D

  /** Decode a `.Z` stream (both block and pre-block modes). */
  def decompressZ(b: Array[Byte], maxOut: Int = 256 << 20): Array[Byte] = {
    require(isZ(b), "lzw: bad magic")
    val flags = b(2) & 0xff
    val maxBits = flags & 0x1F
    require(maxBits >= 9 && maxBits <= 16, s"lzw: max code width $maxBits out of range")
    require((flags & 0x60) == 0, "lzw: reserved flag bits set")
    val block = (flags & 0x80) != 0

    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, b.length * 3))
    val prefix = new Array[Int](1 << maxBits)
    val suffix = new Array[Byte](1 << maxBits)

    var nBits = 9
    def maxcodeFor(n: Int): Int = if (n == maxBits) 1 << n else (1 << n) - 1
    var maxcode = maxcodeFor(nBits)
    var free = if (block) Clear + 1 else 256
    var oldcode = -1
    var finchar = 0
    var posBits = 3 * 8 // bit cursor from the stream start
    // group alignment is relative to the PREVIOUS width-change/CLEAR
    // boundary (unlzw's resetbuf moves its buffer origin there), not to
    // the stream start — segments are not themselves group-multiples
    var groupOrigin = posBits
    val endBits = b.length * 8

    def roundToGroup(): Unit = {
      val group = nBits << 3
      val rem = (posBits - groupOrigin) % group
      if (rem != 0) posBits += group - rem
      groupOrigin = posBits
    }

    def readCode(): Int = {
      if (posBits + nBits > endBits) return -1
      var v = 0L
      var got = 0
      var ba = posBits >> 3
      val bitOff = posBits & 7
      while (got < bitOff + nBits) {
        v |= (b(ba) & 0xffL) << got
        got += 8
        ba += 1
      }
      posBits += nBits
      ((v >>> bitOff) & ((1 << nBits) - 1)).toInt
    }

    val stack = new Array[Byte](1 << maxBits)
    var done = false
    while (!done) {
      if (free > maxcode && nBits < maxBits) {
        roundToGroup()
        nBits += 1
        maxcode = maxcodeFor(nBits)
      }
      val code = readCode()
      if (code == -1) done = true
      else if (oldcode == -1) {
        // the stream (re)starts with a bare literal
        require(code < 256, s"lzw: restart code $code is not a literal")
        finchar = code
        oldcode = code
        require(out.size() < maxOut, "lzw: output past the cap")
        out.write(code)
      } else if (block && code == Clear) {
        roundToGroup()
        nBits = 9
        maxcode = maxcodeFor(nBits)
        // unlzw semantics, gzip-refereed: free_ent re-seeds at 256 (the
        // slot is unreachable as a code — 256 IS CLEAR — but it still
        // counts toward the width-bump points) and oldcode is NOT
        // reset: the first post-clear entry pairs the pre-clear oldcode
        // with the next code's first character
        free = Clear
      } else {
        val incode = code
        var sp = 0
        var c = code
        if (c >= free) { // the KwKwK case: only exactly `free` is legal
          require(c == free, s"lzw: code $c past the dictionary (free $free)")
          stack(sp) = finchar.toByte; sp += 1
          c = oldcode
        }
        while (c >= 256) {
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
          require(sp < stack.length, "lzw: corrupt prefix chain")
        }
        finchar = c & 0xff
        stack(sp) = finchar.toByte; sp += 1
        require(out.size() + sp <= maxOut, "lzw: output past the cap")
        while (sp > 0) { sp -= 1; out.write(stack(sp)) }
        if (free < (1 << maxBits)) {
          prefix(free) = oldcode
          suffix(free) = finchar.toByte
          free += 1
        }
        oldcode = incode
      }
    }
    out.toByteArray
  }

  /** Encode a `.Z` stream (block mode, the ncompress default widths;
    * CLEAR is never emitted — the dictionary just stops growing, which
    * every decoder accepts).
    */
  def compressZ(data: Array[Byte], maxBits: Int = 16): Array[Byte] = {
    require(maxBits >= 9 && maxBits <= 16, s"lzw: max code width $maxBits out of range")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    out.write(0x1F); out.write(0x9D); out.write(0x80 | maxBits)
    if (data.isEmpty) return out.toByteArray

    var nBits = 9
    def maxcodeFor(n: Int): Int = if (n == maxBits) 1 << n else (1 << n) - 1
    var maxcode = maxcodeFor(nBits)
    var free = Clear + 1
    val dict = new java.util.HashMap[Integer, Integer](1 << 17)

    var bitBuf = 0L
    var bitCnt = 0 // bits pending in bitBuf (< 8)
    var emitted = 0 // bits since the last group boundary
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += nBits
      emitted += nBits
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def padGroup(): Unit = {
      val group = nBits << 3
      val rem = emitted % group
      if (rem != 0) {
        var padBits = group - rem
        if (bitCnt > 0) {
          out.write((bitBuf & 0xff).toInt)
          padBits -= 8 - bitCnt
          bitBuf = 0; bitCnt = 0
        }
        require(padBits >= 0 && padBits % 8 == 0, "lzw: internal pad misalignment")
        while (padBits > 0) { out.write(0); padBits -= 8 }
      }
      emitted = 0
    }

    var prev = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = Integer.valueOf((prev << 16) | c)
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        putCode(prev)
        // the canonical bump point: checked BEFORE this step's entry is
        // added (compress.c checks inside output(); the decoder's
        // mirror-image add happens one code later) — moving it after
        // would shift every width change one code early
        if (free > maxcode && nBits < maxBits) {
          padGroup()
          nBits += 1
          maxcode = maxcodeFor(nBits)
        }
        if (free < (1 << maxBits)) {
          dict.put(key, Integer.valueOf(free))
          free += 1
        }
        prev = c
      }
      i += 1
    }
    putCode(prev)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }
}
