package graft.operators

/** xz / LZMA2 decode from scratch — the OTHER compression the big
  * public corpora ship in (kernel/source tarballs as `.tar.xz`,
  * Wikimedia mirrors, many dataset mirrors). Public formats:
  *
  *  - the .xz container ("The .xz File Format", tukaani.org spec):
  *    stream header (magic, check-type flags, CRC32), blocks (CRC32'd
  *    variable-size header with a filter chain — this profile supports
  *    the one real-world chain, a single LZMA2 filter — compressed
  *    data, 4-byte alignment padding, then a CRC32 / CRC64 / SHA-256 /
  *    none check of the UNCOMPRESSED bytes), an index of (unpadded,
  *    uncompressed) size records cross-checked against the blocks
  *    actually read, and a footer whose backward-size must point back
  *    at the index. MULTISTREAM concatenations (with 4-aligned null
  *    stream padding) decode end-to-end like [[Bzip2]]; trailing
  *    garbage is a named reject.
  *  - LZMA2 (chunked LZMA1): control byte per chunk — uncompressed
  *    chunks (0x01/0x02), LZMA chunks (0x80+) carrying reset bits for
  *    state / props / dictionary; sizes are explicit so no end marker
  *    is needed.
  *  - LZMA1 (Pavlov's public-domain LZMA specification): 11-bit
  *    adaptive binary range coder, literal coder with (lc, lp) context
  *    and matched-byte mode, length coders, 6-bit position-slot trees +
  *    reverse-decoded align bits, 4 rep distances, 12-state machine.
  *
  * Every CRC (header, index, footer, block check) is verified — a
  * mismatch is a NAMED reject, as are unsupported filter chains,
  * truncation, size-record drift, and output past the caller's cap.
  * The writer half emits valid-but-STORED xz (LZMA2 uncompressed
  * chunks) — deterministic fixtures any xz implementation decodes —
  * while canonical-tool goldens pin the real LZMA decode path
  * (`XzSpec`), the same split the bzip2 codec uses.
  *
  * Scale shape: identical to gzip/zstd/bzip2 — one member per record,
  * bounded per-record decode inside the archive explode, no native
  * resources, nothing crosses an exchange.
  */
object Xz {

  final val Magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)

  def isXz(b: Array[Byte]): Boolean =
    b.length >= 12 && (0 until 6).forall(i => b(i) == Magic(i))

  // ------------------------------------------------------------- CRC64

  /** CRC-64/XZ (ECMA-182 polynomial, reflected, init/final ~0). */
  private val crc64Table: Array[Long] = {
    val poly = 0xC96C5795D7870F42L
    Array.tabulate(256) { n =>
      var c = n.toLong
      var k = 0
      while (k < 8) { c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1; k += 1 }
      c
    }
  }

  private[operators] def crc64(b: Array[Byte], from: Int, until: Int): Long = {
    var c = ~0L
    var i = from
    while (i < until) { c = crc64Table(((c ^ b(i)) & 0xff).toInt) ^ (c >>> 8); i += 1 }
    ~c
  }

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, from, until - from)
    c.getValue
  }

  // ------------------------------------------------------ LZMA1 decoder

  private final val ProbInit: Short = 1024 // (1 << 11) / 2

  /** The binary range decoder (LZMA spec): 32-bit range/code, 11-bit
    * adaptive probabilities, 5-bit adaptation shift.
    */
  private final class RangeDec(b: Array[Byte], var pos: Int, val end: Int) {
    var range: Int = -1 // 0xFFFFFFFF
    var code: Int = 0
    require(end - pos >= 5, "xz: LZMA chunk shorter than the range-coder header")
    require(b(pos) == 0, "xz: LZMA range coder must start with a zero byte")
    pos += 1
    (0 until 4).foreach { _ => code = (code << 8) | (b(pos) & 0xff); pos += 1 }
    def normalize(): Unit =
      if ((range & 0xFF000000) == 0) {
        range <<= 8
        require(pos < end, "xz: LZMA chunk truncated mid-symbol")
        code = (code << 8) | (b(pos) & 0xff)
        pos += 1
      }
    def decodeBit(probs: Array[Short], i: Int): Int = {
      val p = probs(i)
      val bound = (range >>> 11) * p
      var bit = 0
      if (java.lang.Integer.compareUnsigned(code, bound) < 0) {
        probs(i) = (p + ((2048 - p) >>> 5)).toShort
        range = bound
      } else {
        probs(i) = (p - (p >>> 5)).toShort
        range -= bound
        code -= bound
        bit = 1
      }
      normalize()
      bit
    }
    def decodeDirect(n: Int): Int = {
      var res = 0
      var i = n
      while (i > 0) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31)
        code += range & t
        normalize()
        res = (res << 1) + t + 1
        i -= 1
      }
      res
    }
    def bitTree(probs: Array[Short], off: Int, nBits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nBits) { m = (m << 1) + decodeBit(probs, off + m); i += 1 }
      m - (1 << nBits)
    }
    def bitTreeReverse(probs: Array[Short], off: Int, nBits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nBits) {
        val bit = decodeBit(probs, off + m)
        m = (m << 1) + bit
        sym |= bit << i
        i += 1
      }
      sym
    }
    def finishedProperly: Boolean = code == 0
  }

  /** LZMA decode state that survives across LZMA2 chunks (until a state
    * reset): probability models, the 12-state machine, rep distances.
    */
  private final class LzmaState {
    var lc = 0
    var lp = 0
    var pb = 0
    var state = 0
    var rep0 = 0
    var rep1 = 0
    var rep2 = 0
    var rep3 = 0
    var lit: Array[Short] = null
    val isMatch = new Array[Short](12 << 4)
    val isRep = new Array[Short](12)
    val isRepG0 = new Array[Short](12)
    val isRepG1 = new Array[Short](12)
    val isRepG2 = new Array[Short](12)
    val isRep0Long = new Array[Short](12 << 4)
    val posSlot = new Array[Short](4 << 6)
    val specPos = new Array[Short](115)
    val align = new Array[Short](16)
    // len coders: [choice, choice2, low 16*8, mid 16*8, high 256]
    val len = new Array[Short](2 + 16 * 8 + 16 * 8 + 256)
    val repLen = new Array[Short](2 + 16 * 8 + 16 * 8 + 256)

    def setProps(prop: Int, lzma2: Boolean = true): Unit = {
      require(prop < 225, s"xz: bad LZMA props byte $prop")
      lc = prop % 9
      val rest = prop / 9
      lp = rest % 5
      pb = rest / 5
      // the lc+lp cap is an LZMA2 rule; the legacy ALONE format allows more
      if (lzma2) require(lc + lp <= 4, s"xz: LZMA2 requires lc+lp<=4 (lc=$lc lp=$lp)")
      lit = new Array[Short](0x300 << (lc + lp))
      resetState()
    }
    def resetState(): Unit = {
      state = 0
      rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
      java.util.Arrays.fill(isMatch, ProbInit)
      java.util.Arrays.fill(isRep, ProbInit)
      java.util.Arrays.fill(isRepG0, ProbInit)
      java.util.Arrays.fill(isRepG1, ProbInit)
      java.util.Arrays.fill(isRepG2, ProbInit)
      java.util.Arrays.fill(isRep0Long, ProbInit)
      java.util.Arrays.fill(posSlot, ProbInit)
      java.util.Arrays.fill(specPos, ProbInit)
      java.util.Arrays.fill(align, ProbInit)
      java.util.Arrays.fill(len, ProbInit)
      java.util.Arrays.fill(repLen, ProbInit)
      if (lit != null) java.util.Arrays.fill(lit, ProbInit)
    }
  }

  /** Output window: the whole (bounded) output doubles as the LZMA
    * dictionary. `dictStart` marks the last dictionary reset — matches
    * must not reach across it.
    */
  private final class OutWindow(maxOut: Int) {
    val buf = new java.io.ByteArrayOutputStream()
    private var bytes = new Array[Byte](1 << 16)
    private var n = 0
    var dictStart = 0
    def size: Int = n
    def put(b: Byte): Unit = {
      require(n < maxOut, "xz: output past the cap")
      if (n == bytes.length) bytes = java.util.Arrays.copyOf(bytes, bytes.length * 2)
      bytes(n) = b
      n += 1
    }
    def byteBack(dist: Int): Byte = {
      require(dist >= 1 && n - dist >= dictStart, s"xz: match distance $dist past the dictionary")
      bytes(n - dist)
    }
    def copyMatch(dist: Int, len: Int): Unit = {
      var i = 0
      while (i < len) { put(byteBack(dist)); i += 1 }
    }
    /** Internal buffer (valid through `size`) — lets the container walk
      * checksum block ranges without copying the whole output per block.
      */
    def raw: Array[Byte] = bytes
    def result(): Array[Byte] = java.util.Arrays.copyOf(bytes, n)
  }

  private def decodeLen(rc: RangeDec, probs: Array[Short], posState: Int): Int =
    if (rc.decodeBit(probs, 0) == 0) rc.bitTree(probs, 2 + posState * 8, 3)
    else if (rc.decodeBit(probs, 1) == 0) 8 + rc.bitTree(probs, 2 + 128 + posState * 8, 3)
    else 16 + rc.bitTree(probs, 2 + 256, 8)

  /** Decode one LZMA stream: exactly `unpackSize` bytes (an LZMA2
    * chunk), or until the end marker when `allowEnd` (the legacy ALONE
    * format, where `unpackSize` may be Long.MaxValue for size-unknown).
    * Returns the byte offset just past the consumed input.
    */
  private def lzmaChunk(b: Array[Byte], from: Int, until: Int,
      st: LzmaState, out: OutWindow, unpackSize: Long,
      allowEnd: Boolean = false): Int = {
    val rc = new RangeDec(b, from, until)
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    var remaining = unpackSize
    var endHit = false
    // Some encoders (liblzma's raw/alone paths — e.g. the LZMA1 streams
    // inside libarchive-built 7z headers) write an explicit end marker
    // even when the size is recorded externally. A marker-less stream
    // leaves at most the 5 range-coder flush bytes unread; more than
    // that after the declared size means a marker follows — decode
    // EXACTLY one more symbol and require it to be the marker (any data
    // symbol trips the guards below as a named reject).
    var markTries = if (allowEnd) 1 else 0
    def wantMark: Boolean = {
      val w = remaining == 0 && markTries > 0 && until - rc.pos > 5
      if (w) markTries -= 1
      w
    }
    while (!endHit && (remaining > 0 || wantMark)) {
      val total = out.size - out.dictStart
      val posState = total & pbMask
      if (rc.decodeBit(st.isMatch, (st.state << 4) + posState) == 0) {
        // ---- literal
        val prevByte = if (total == 0) 0 else out.byteBack(1) & 0xff
        val litState = ((total & lpMask) << st.lc) + (prevByte >>> (8 - st.lc))
        val off = 0x300 * litState
        var symbol = 1
        if (st.state >= 7) {
          var matchByte = out.byteBack(st.rep0 + 1) & 0xff
          var break = false
          while (!break && symbol < 0x100) {
            val matchBit = (matchByte >> 7) & 1
            matchByte = (matchByte << 1) & 0xff
            val bit = rc.decodeBit(st.lit, off + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | bit
            if (matchBit != bit) break = true
          }
        }
        while (symbol < 0x100) symbol = (symbol << 1) | rc.decodeBit(st.lit, off + symbol)
        require(remaining > 0, "lzma: literal past the declared size")
        out.put((symbol & 0xff).toByte)
        remaining -= 1
        st.state = if (st.state < 4) 0 else if (st.state < 10) st.state - 3 else st.state - 6
      } else if (rc.decodeBit(st.isRep, st.state) != 0) {
        // ---- rep match
        require(total > 0 || out.size > out.dictStart, "xz: rep match with empty dictionary")
        if (rc.decodeBit(st.isRepG0, st.state) == 0) {
          if (rc.decodeBit(st.isRep0Long, (st.state << 4) + posState) == 0) {
            // short rep: one byte at rep0
            st.state = if (st.state < 7) 9 else 11
            require(remaining > 0, "lzma: short rep past the declared size")
            out.put(out.byteBack(st.rep0 + 1))
            remaining -= 1
          } else {
            val len = 2 + decodeLen(rc, st.repLen, posState)
            st.state = if (st.state < 7) 8 else 11
            require(len <= remaining, "xz: LZMA2 chunk overruns its declared size")
            out.copyMatch(st.rep0 + 1, len)
            remaining -= len
          }
        } else {
          val dist =
            if (rc.decodeBit(st.isRepG1, st.state) == 0) st.rep1
            else {
              val d = if (rc.decodeBit(st.isRepG2, st.state) == 0) st.rep2
              else { val t = st.rep3; st.rep3 = st.rep2; t }
              st.rep2 = st.rep1
              d
            }
          st.rep1 = st.rep0
          st.rep0 = dist
          val len = 2 + decodeLen(rc, st.repLen, posState)
          st.state = if (st.state < 7) 8 else 11
          require(len <= remaining, "xz: LZMA2 chunk overruns its declared size")
          out.copyMatch(st.rep0 + 1, len)
          remaining -= len
        }
      } else {
        // ---- simple match
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
        val rawLen = decodeLen(rc, st.len, posState)
        st.state = if (st.state < 7) 7 else 10
        // distance
        val lenState = math.min(rawLen, 3)
        val slot = rc.bitTree(st.posSlot, lenState << 6, 6)
        val dist =
          if (slot < 4) slot
          else {
            val directBits = (slot >> 1) - 1
            var d = (2 | (slot & 1)) << directBits
            if (slot < 14)
              // spec: PosDecoders + dist - posSlot, indexed from m=1
              d += rc.bitTreeReverse(st.specPos, d - slot, directBits)
            else {
              d += rc.decodeDirect(directBits - 4) << 4
              d += rc.bitTreeReverse(st.align, 0, 4)
            }
            d
          }
        if (dist == -1) {
          require(allowEnd, "xz: LZMA end marker inside a sized LZMA2 chunk")
          require(unpackSize == Long.MaxValue || remaining == 0,
            "lzma: end marker before the declared size")
          require(rc.finishedProperly, "lzma: range coder not finished at the end marker")
          endHit = true
        } else {
        st.rep0 = dist
        val len = 2 + rawLen
        require(len <= remaining, "xz: LZMA2 chunk overruns its declared size")
        out.copyMatch(st.rep0 + 1, len)
        remaining -= len
        }
      }
    }
    require(endHit || remaining == 0,
      "lzma: stream ended before the declared size")
    if (!allowEnd)
      require(rc.pos == until, "xz: LZMA chunk did not consume its declared packed size")
    rc.pos
  }

  // ------------------------------------------------------ LZMA2 walker

  /** Decode one LZMA2 stream (the payload of an xz block). */
  private def lzma2(b: Array[Byte], from: Int, until: Int, out: OutWindow): Int = {
    // every xz block is an independent dictionary: matches and the
    // position counters must never reach into a previous block's output
    out.dictStart = out.size
    val st = new LzmaState
    var havePropsEver = false
    // liblzma rejects an LZMA chunk with reset=0 right after an
    // uncompressed chunk (state continuity was broken) — match it,
    // rather than silently repairing the state ourselves
    var needsReset = false
    var p = from
    var done = false
    while (!done) {
      require(p < until, "xz: LZMA2 stream missing its end marker")
      val control = b(p) & 0xff
      p += 1
      if (control == 0x00) done = true
      else if (control <= 0x02) {
        // uncompressed chunk; 0x01 resets the dictionary
        require(p + 2 <= until, "xz: LZMA2 uncompressed chunk header truncated")
        val size = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
        p += 2
        require(p + size <= until, "xz: LZMA2 uncompressed chunk truncated")
        if (control == 0x01) out.dictStart = out.size
        var i = 0
        while (i < size) { out.put(b(p + i)); i += 1 }
        p += size
        // an uncompressed chunk invalidates LZMA state continuity
        if (havePropsEver) st.resetState()
        needsReset = true
      } else {
        require(control >= 0x80, f"xz: bad LZMA2 control byte 0x$control%02X")
        require(p + 4 <= until, "xz: LZMA2 chunk header truncated")
        val unpack = (((control & 0x1f) << 16) |
          ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
        val packed = (((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)) + 1
        p += 4
        val reset = (control >> 5) & 0x3
        require(!needsReset || reset >= 1,
          "xz: LZMA chunk without state reset after an uncompressed chunk")
        needsReset = false
        if (reset >= 2) {
          require(p < until, "xz: LZMA2 props byte truncated")
          st.setProps(b(p) & 0xff)
          p += 1
          havePropsEver = true
        } else require(havePropsEver,
          "xz: LZMA2 chunk reuses props before any were set")
        if (reset == 3) out.dictStart = out.size
        if (reset >= 1 && reset < 2) st.resetState()
        require(p + packed <= until, "xz: LZMA2 chunk truncated")
        lzmaChunk(b, p, p + packed, st, out, unpack.toLong)
        p += packed
      }
    }
    p
  }

  // -------------------------------------------------------- xz container

  private def varint(b: Array[Byte], at: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = at
    while ({
      require(p < end && shift < 63, "xz: bad multibyte integer")
      val x = b(p) & 0xff
      p += 1
      v |= (x & 0x7fL) << shift
      shift += 7
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

  private final val CheckSizes = Map(0 -> 0, 1 -> 4, 4 -> 8, 10 -> 32)
  private final val CheckNames = Map(0 -> "none", 1 -> "crc32", 4 -> "crc64", 10 -> "sha256")

  /** The stream's declared check type, read off the header flags — the
    * observable a listing query reports (and an oracle predicts).
    */
  def checkName(b: Array[Byte]): String = {
    require(isXz(b), "xz: missing stream header magic")
    CheckNames.getOrElse(b(7) & 0xff, f"0x${b(7) & 0xff}%02X")
  }

  /** Decompress a whole xz payload (multistream supported; total output
    * capped at `maxOut`). Named rejects for every out-of-profile shape.
    */
  def decompress(b: Array[Byte], maxOut: Int = 256 << 20): Array[Byte] = {
    require(isXz(b), "xz: missing stream header magic")
    val out = new OutWindow(maxOut)
    var p = 0
    while (p < b.length) {
      // stream padding between concatenated streams: null bytes, 4-aligned
      if (b(p) == 0) {
        val st = p
        while (p < b.length && b(p) == 0) p += 1
        require((p - st) % 4 == 0, "xz: stream padding not 4-byte aligned")
      }
      if (p < b.length) {
        require(b.length - p >= 12 && (0 until 6).forall(i => b(p + i) == Magic(i)),
          s"xz: trailing garbage after stream end (offset $p)")
        p = decodeStream(b, p, out)
      }
    }
    out.result()
  }

  /** Decode one xz stream starting at `p`; returns the offset past its
    * footer. Verifies every CRC, the index against the blocks read, and
    * the footer's backward pointer.
    */
  private def decodeStream(b: Array[Byte], start: Int, out: OutWindow): Int = {
    var p = start + 6
    require(b(p) == 0, "xz: reserved stream-flag byte set")
    val checkType = b(p + 1) & 0xff
    require(CheckSizes.contains(checkType), f"xz: unsupported check type 0x$checkType%02X")
    val flagsCrc = crc32(b, p, p + 2)
    p += 2
    require(leU32(b, p) == flagsCrc, "xz: stream header CRC mismatch")
    p += 4
    // ---- blocks until the index indicator
    val records = Seq.newBuilder[(Long, Long)]
    var nBlocks = 0
    var indexAt = -1
    while (indexAt < 0) {
      require(p < b.length, "xz: truncated before the index")
      val sizeByte = b(p) & 0xff
      if (sizeByte == 0) indexAt = p
      else {
        val blockStart = p
        val headerSize = (sizeByte + 1) * 4
        require(p + headerSize <= b.length, "xz: block header truncated")
        require(crc32(b, p, p + headerSize - 4) == leU32(b, p + headerSize - 4),
          "xz: block header CRC mismatch")
        val flags = b(p + 1) & 0xff
        require((flags & 0x3c) == 0, "xz: reserved block-flag bits set")
        val numFilters = (flags & 0x03) + 1
        var q = p + 2
        var declaredCompressed = -1L
        var declaredUncompressed = -1L
        if ((flags & 0x40) != 0) { val (v, np) = varint(b, q, p + headerSize); declaredCompressed = v; q = np }
        if ((flags & 0x80) != 0) { val (v, np) = varint(b, q, p + headerSize); declaredUncompressed = v; q = np }
        require(numFilters == 1, s"xz: $numFilters-filter chains unsupported (LZMA2 only)")
        val (fid, q2) = varint(b, q, p + headerSize)
        require(fid == 0x21, f"xz: filter id 0x$fid%02X unsupported (LZMA2 only)")
        val (propsSize, q3) = varint(b, q2, p + headerSize)
        require(propsSize == 1, s"xz: LZMA2 props size $propsSize")
        // the value itself is unused (output is bounded by maxOut), but
        // >40 is invalid per the .xz spec §5.3.1 — reject like liblzma
        require((b(q3) & 0xff) <= 40, "xz: bad LZMA2 dictionary-size byte")
        q = q3 + 1
        while (q < p + headerSize - 4) {
          require(b(q) == 0, "xz: nonzero block-header padding")
          q += 1
        }
        p += headerSize
        // ---- LZMA2 payload
        val outBefore = out.size
        val dataEnd = lzma2(b, p, b.length, out)
        val unpacked = (out.size - outBefore).toLong
        val compressed = (dataEnd - p).toLong
        if (declaredCompressed >= 0)
          require(compressed == declaredCompressed, "xz: compressed-size record drift")
        if (declaredUncompressed >= 0)
          require(unpacked == declaredUncompressed, "xz: uncompressed-size record drift")
        p = dataEnd
        while ((p - blockStart) % 4 != 0) {
          require(p < b.length && b(p) == 0, "xz: nonzero block padding")
          p += 1
        }
        // ---- check of the uncompressed bytes
        val checkSize = CheckSizes(checkType)
        require(p + checkSize <= b.length, "xz: block check truncated")
        checkType match {
          case 0 => ()
          case 1 =>
            val c = new java.util.zip.CRC32()
            c.update(out.raw, outBefore, out.size - outBefore)
            require(c.getValue == leU32(b, p), "xz: block CRC32 mismatch")
          case 4 =>
            val got = crc64(out.raw, outBefore, out.size)
            require(got == leU64(b, p), "xz: block CRC64 mismatch")
          case 10 =>
            val d = java.security.MessageDigest.getInstance("SHA-256")
            d.update(out.raw, outBefore, out.size - outBefore)
            require(d.digest().sameElements(
              java.util.Arrays.copyOfRange(b, p, p + 32)), "xz: block SHA-256 mismatch")
        }
        p += checkSize
        val unpaddedSize = headerSize.toLong + compressed + checkSize
        records += ((unpaddedSize, unpacked))
        nBlocks += 1
        require(nBlocks <= MaxBlocks, "xz: more blocks than the cap")
      }
    }
    // ---- index: must agree with what was just decoded
    val indexStart = p
    p += 1
    val (count, p1) = varint(b, p, b.length)
    p = p1
    val recs = records.result()
    require(count == recs.length, s"xz: index claims $count blocks, read ${recs.length}")
    recs.foreach { case (unpadded, unpacked) =>
      val (u1, np1) = varint(b, p, b.length)
      val (u2, np2) = varint(b, np1, b.length)
      require(u1 == unpadded && u2 == unpacked, "xz: index record drift")
      p = np2
    }
    while ((p - indexStart) % 4 != 0) {
      require(p < b.length && b(p) == 0, "xz: nonzero index padding")
      p += 1
    }
    require(p + 4 <= b.length, "xz: index CRC truncated")
    require(crc32(b, indexStart, p) == leU32(b, p), "xz: index CRC mismatch")
    p += 4
    val indexSize = p - indexStart
    // ---- footer
    require(p + 12 <= b.length, "xz: stream footer truncated")
    require(crc32(b, p + 4, p + 10) == leU32(b, p), "xz: stream footer CRC mismatch")
    val backward = (leU32(b, p + 4) + 1) * 4
    require(backward == indexSize, "xz: footer backward size does not point at the index")
    require(b(p + 8) == 0 && (b(p + 9) & 0xff) == checkType,
      "xz: footer stream flags disagree with the header")
    require(b(p + 10) == 'Y' && b(p + 11) == 'Z', "xz: bad footer magic")
    p + 12
  }

  final val MaxBlocks = 1 << 20

  private def crc64Range(b: Array[Byte], from: Int, until: Int): Long =
    crc64(b, from, until)

  private def leU32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  private def leU64(b: Array[Byte], at: Int): Long =
    leU32(b, at) | (leU32(b, at + 4) << 32)

  // ------------------------------------------------------ LZMA1 encoder

  /** The carry-correct binary range ENCODER (LZMA SDK semantics): 33-bit
    * low with byte cache for carry propagation; the initial cache emits
    * the mandatory leading zero byte of every LZMA stream.
    */
  private final class RangeEnc(out: java.io.ByteArrayOutputStream) {
    private var low = 0L
    private var range = -1 // 0xFFFFFFFF
    private var cache = 0
    private var cacheSize = 1L
    private def shiftLow(): Unit = {
      if (low < 0xFF000000L || low > 0xFFFFFFFFL) {
        var c = cache
        var n = cacheSize
        while (n != 0) {
          out.write(((c + (low >>> 32)) & 0xff).toInt)
          c = 0xFF
          n -= 1
        }
        cacheSize = 0
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xFFFFFFFFL
    }
    def encodeBit(probs: Array[Short], i: Int, bit: Int): Unit = {
      val p = probs(i)
      val bound = (range >>> 11) * p
      if (bit == 0) {
        range = bound
        probs(i) = (p + ((2048 - p) >>> 5)).toShort
      } else {
        low += bound & 0xFFFFFFFFL
        range -= bound
        probs(i) = (p - (p >>> 5)).toShort
      }
      while ((range & 0xFF000000) == 0) { range <<= 8; shiftLow() }
    }
    def encodeDirect(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        range = range >>> 1
        if (((v >>> i) & 1) != 0) low += range & 0xFFFFFFFFL
        while ((range & 0xFF000000) == 0) { range <<= 8; shiftLow() }
        i -= 1
      }
    }
    def bitTree(probs: Array[Short], off: Int, nBits: Int, sym: Int): Unit = {
      var m = 1
      var i = nBits - 1
      while (i >= 0) {
        val bit = (sym >>> i) & 1
        encodeBit(probs, off + m, bit)
        m = (m << 1) | bit
        i -= 1
      }
    }
    def bitTreeReverse(probs: Array[Short], off: Int, nBits: Int, sym: Int): Unit = {
      var m = 1
      var i = 0
      while (i < nBits) {
        val bit = (sym >>> i) & 1
        encodeBit(probs, off + m, bit)
        m = (m << 1) + bit
        i += 1
      }
    }
    def flush(): Unit = (0 until 5).foreach(_ => shiftLow())
  }

  private def encodeLen(re: RangeEnc, probs: Array[Short], posState: Int,
      rawLen: Int): Unit =
    if (rawLen < 8) {
      re.encodeBit(probs, 0, 0)
      re.bitTree(probs, 2 + posState * 8, 3, rawLen)
    } else if (rawLen < 16) {
      re.encodeBit(probs, 0, 1)
      re.encodeBit(probs, 1, 0)
      re.bitTree(probs, 2 + 128 + posState * 8, 3, rawLen - 8)
    } else {
      re.encodeBit(probs, 0, 1)
      re.encodeBit(probs, 1, 1)
      re.bitTree(probs, 2 + 256, 8, rawLen - 16)
    }

  /** Greedy LZMA1 encoder over one input segment, mutating the shared
    * probability/state model (LZMA2 chunks with reset=0 continue it).
    * Emits literals (matched-byte mode after matches, mirroring the
    * decoder), rep0 matches for runs, and hash-chain normal matches.
    */
  private final class LzmaEnc(data: Array[Byte]) {
    val st = new LzmaState
    st.setProps((2 * 5 + 0) * 9 + 3) // lc=3 lp=0 pb=2, the default profile
    private val pbMask = 3
    // hash-chain match finder over the WHOLE input (dict continuity
    // across chunks comes free: positions are absolute)
    private val hashBits = 16
    private val head = Array.fill(1 << hashBits)(-1)
    private val prev = new Array[Int](data.length)
    private final val MaxTries = 32
    private final val MaxLen = 273
    private def hash4(p: Int): Int = {
      val h = (data(p) & 0xff) * 506832829 + (data(p + 1) & 0xff) * 65599 +
        (data(p + 2) & 0xff) * 257 + (data(p + 3) & 0xff)
      (h ^ (h >>> 15)) & ((1 << hashBits) - 1)
    }
    private def matchLen(a: Int, b: Int, limit: Int): Int = {
      var l = 0
      while (l < limit && data(a + l) == data(b + l)) l += 1
      l
    }
    /** Encode data[from, until) as one LZMA chunk body; returns the
      * packed bytes (range coder flushed).
      */
    def encodeChunk(from: Int, until: Int, endMark: Boolean = false): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val re = new RangeEnc(out)
      var pos = from
      while (pos < until) {
        val posState = pos & pbMask
        val lenLimit = math.min(MaxLen, until - pos)
        // rep0 candidate (cheap, carries runs), then hash-chain search
        var repLen = 0
        if (pos > st.rep0 && lenLimit >= 2) {
          repLen = matchLen(pos - st.rep0 - 1, pos, lenLimit)
        }
        var bestLen = 0
        var bestDist = 0
        if (lenLimit >= 4 && pos + 4 <= data.length) {
          val h = hash4(pos)
          var cand = head(h)
          var tries = MaxTries
          while (cand >= 0 && tries > 0) {
            val l = matchLen(cand, pos, lenLimit)
            if (l > bestLen) { bestLen = l; bestDist = pos - cand - 1 }
            cand = prev(cand)
            tries -= 1
          }
          prev(pos) = head(h)
          head(h) = pos
        }
        // choose: rep0 wins ties (cheaper code), normal match needs len>=3
        if (repLen >= 2 && repLen + 1 >= bestLen) {
          // rep0 match
          re.encodeBit(st.isMatch, (st.state << 4) + posState, 1)
          re.encodeBit(st.isRep, st.state, 1)
          re.encodeBit(st.isRepG0, st.state, 0)
          re.encodeBit(st.isRep0Long, (st.state << 4) + posState, 1)
          encodeLen(re, st.repLen, posState, repLen - 2)
          st.state = if (st.state < 7) 8 else 11
          insertHashes(pos, repLen, until)
          pos += repLen
        } else if (bestLen >= 3) {
          re.encodeBit(st.isMatch, (st.state << 4) + posState, 1)
          re.encodeBit(st.isRep, st.state, 0)
          val rawLen = bestLen - 2
          encodeLen(re, st.len, posState, rawLen)
          st.state = if (st.state < 7) 7 else 10
          encodeDistance(re, math.min(rawLen, 3), bestDist)
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
          st.rep0 = bestDist
          insertHashes(pos, bestLen, until)
          pos += bestLen
        } else {
          // literal
          re.encodeBit(st.isMatch, (st.state << 4) + posState, 0)
          val prevByte = if (pos == 0) 0 else data(pos - 1) & 0xff
          val litState = prevByte >>> (8 - st.lc) // lp=0
          val off = 0x300 * litState
          val sym = data(pos) & 0xff
          if (st.state >= 7) {
            var matchByte = data(pos - st.rep0 - 1) & 0xff
            var m = 1
            var i = 7
            var matched = true
            while (i >= 0) {
              val bit = (sym >>> i) & 1
              if (matched) {
                val matchBit = (matchByte >> 7) & 1
                matchByte = (matchByte << 1) & 0xff
                re.encodeBit(st.lit, off + ((1 + matchBit) << 8) + m, bit)
                if (matchBit != bit) matched = false
              } else re.encodeBit(st.lit, off + m, bit)
              m = (m << 1) | bit
              i -= 1
            }
          } else re.bitTree(st.lit, off, 8, sym)
          st.state = if (st.state < 4) 0 else if (st.state < 10) st.state - 3
          else st.state - 6
          pos += 1
        }
      }
      if (endMark) {
        // the LZMA end marker: a normal match with dist 0xFFFFFFFF
        val posState = until & pbMask
        re.encodeBit(st.isMatch, (st.state << 4) + posState, 1)
        re.encodeBit(st.isRep, st.state, 0)
        encodeLen(re, st.len, posState, 0)
        st.state = if (st.state < 7) 7 else 10
        encodeDistance(re, 0, -1)
      }
      re.flush()
      out.toByteArray
    }
    /** Register match-finder hashes for the skipped positions of a match
      * (position 0 of the span was registered during the search).
      */
    private def insertHashes(pos: Int, len: Int, until: Int): Unit = {
      var p = pos + 1
      val end = math.min(pos + len, math.min(until, data.length - 3))
      while (p < end) {
        val h = hash4(p)
        prev(p) = head(h)
        head(h) = p
        p += 1
      }
    }
    private def encodeDistance(re: RangeEnc, lenState: Int, dist: Int): Unit = {
      // unsigned: the end marker encodes dist 0xFFFFFFFF through slot 63
      val slot =
        if (java.lang.Integer.compareUnsigned(dist, 4) < 0) dist
        else {
          val nb = 32 - java.lang.Integer.numberOfLeadingZeros(dist)
          ((nb - 1) << 1) | ((dist >>> (nb - 2)) & 1)
        }
      re.bitTree(st.posSlot, lenState << 6, 6, slot)
      if (slot >= 4) {
        val directBits = (slot >> 1) - 1
        val base = (2 | (slot & 1)) << directBits
        val rem = dist - base
        if (slot < 14) re.bitTreeReverse(st.specPos, base - slot, directBits, rem)
        else {
          re.encodeDirect(rem >>> 4, directBits - 4)
          re.bitTreeReverse(st.align, 0, 4, rem & 15)
        }
      }
    }
  }

  /** The dict-size prop byte: smallest spec size ≥ `need` (sizes are
    * 2^(b/2+12) and 3·2^(b/2+11), per the LZMA2 filter spec).
    */
  private def dictByteFor(need: Int): Int = {
    var b = 0
    while (b < 40 && {
      val size = (2L | (b & 1)) << (b / 2 + 11)
      size < need
    }) b += 1
    b
  }

  // ------------------------------------------------- legacy .lzma (ALONE)

  /** Decode the legacy LZMA_ALONE (.lzma) format: 1-byte props, LE32
    * dictionary size, LE64 uncompressed size (-1 = unknown, terminated
    * by the end marker — what both `xz --format=lzma` and liblzma
    * one-shot compression emit). No integrity check exists in this
    * format (its successor .xz added them); truncation, trailing bytes,
    * size drift and an unfinished range coder are still named rejects.
    */
  def decompressLzmaAlone(b: Array[Byte], maxOut: Int = 256 << 20): Array[Byte] = {
    require(b.length >= 18, "lzma: header truncated")
    val out = new OutWindow(maxOut)
    val st = new LzmaState
    st.setProps(b(0) & 0xff, lzma2 = false)
    var size = 0L
    (0 until 8).foreach(i => size |= (b(5 + i) & 0xffL) << (8 * i))
    require(size == -1L || (size >= 0 && size <= maxOut),
      s"lzma: declared size $size past the cap")
    val end = lzmaChunk(b, 13, b.length, st, out,
      if (size == -1L) Long.MaxValue else size, allowEnd = true)
    require(end == b.length, s"lzma: trailing garbage after stream end (offset $end)")
    require(size == -1L || out.size == size, "lzma: size drift")
    out.result()
  }

  /** The ALONE writer: unknown-size header + end marker (the canonical
    * producers' shape), greedy-LZMA compressed.
    */
  def compressLzmaAlone(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((2 * 5 + 0) * 9 + 3) // lc=3 lp=0 pb=2
    val dictSize = (2L | (dictByteFor(math.max(4096,
      math.min(data.length, 1 << 26))) & 1)) <<
      (dictByteFor(math.max(4096, math.min(data.length, 1 << 26))) / 2 + 11)
    (0 until 4).foreach(i => out.write(((dictSize >>> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(_ => out.write(0xFF)) // size unknown: end marker
    val enc = new LzmaEnc(data)
    out.write(enc.encodeChunk(0, data.length, endMark = true))
    out.toByteArray
  }

  // ---------------------------------------------- raw streams (7z coders)

  /** Raw LZMA1 stream as 7z folders carry it: the props byte and the
    * dictionary size live in the coder attributes, the stream is bare
    * and normally has NO end marker (the container records both sizes).
    * Decodes exactly `unpackSize` bytes from `b[from, until)`; an end
    * marker at exactly the declared size is accepted. The range-coder
    * flush leaves up to 5 unread tail bytes — more is a named reject.
    */
  private[operators] def decodeRawLzma1(b: Array[Byte], from: Int, until: Int,
      props: Int, unpackSize: Long, maxOut: Int): Array[Byte] = {
    require(unpackSize >= 0 && unpackSize <= maxOut,
      s"lzma: declared size $unpackSize past the cap")
    val out = new OutWindow(maxOut)
    val st = new LzmaState
    st.setProps(props, lzma2 = false)
    val end = lzmaChunk(b, from, until, st, out, unpackSize, allowEnd = true)
    require(out.size == unpackSize, "lzma: size drift")
    require(end <= until && until - end <= 5,
      "lzma: trailing garbage after the declared stream")
    out.result()
  }

  /** Raw LZMA2 chunk stream (7z's LZMA2 coder payload — the same walk
    * as an xz block body, 0x00 end marker included).
    */
  private[operators] def decodeRawLzma2(b: Array[Byte], from: Int, until: Int,
      unpackSize: Long, maxOut: Int): Array[Byte] = {
    require(unpackSize >= 0 && unpackSize <= maxOut,
      s"lzma2: declared size $unpackSize past the cap")
    val out = new OutWindow(maxOut)
    val end = lzma2(b, from, until, out)
    require(end == until, "lzma2: trailing garbage after the end marker")
    require(out.size == unpackSize, "lzma2: size drift")
    out.result()
  }

  /** Raw LZMA1 encode (the 7z coder shape): `(propsByte, packed)` with
    * lc=3 lp=0 pb=2 and no end marker — the container carries the sizes.
    */
  private[operators] def compressRawLzma1(data: Array[Byte]): (Int, Array[Byte]) = {
    val enc = new LzmaEnc(data)
    ((2 * 5 + 0) * 9 + 3, enc.encodeChunk(0, data.length))
  }

  /** One LZMA2 chunk stream over `data`, end marker included — an xz
    * block body, and byte-identically 7z's LZMA2 coder payload. `mode`
    * as in [[compress]]: `"fast"` greedy LZMA with stored fallback,
    * `"store"` uncompressed chunks only.
    */
  private[operators] def lzma2Payload(data: Array[Byte], mode: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (mode == "store") {
      // uncompressed chunks (dict reset on the first)
      var off = 0
      var first = true
      while (off < data.length) {
        val take = math.min(1 << 16, data.length - off)
        out.write(if (first) 0x01 else 0x02)
        out.write(((take - 1) >> 8) & 0xff)
        out.write((take - 1) & 0xff)
        out.write(data, off, take)
        off += take
        first = false
      }
    } else {
      // greedy LZMA, one model across the block, stored fallback
      val enc = new LzmaEnc(data)
      val Seg = 60000 // stored fallback must fit one uncompressed chunk
      var off = 0
      var first = true
      var propsSent = false
      var needStateReset = false
      while (off < data.length) {
        val until = math.min(off + Seg, data.length)
        if (needStateReset) enc.st.resetState()
        val packed = enc.encodeChunk(off, until)
        val usize = until - off
        if (packed.length < usize && packed.length <= (1 << 16)) {
          val reset =
            if (first) 3 // the block's first chunk resets the dictionary
            else if (!propsSent) 2 // stored chunks came first: send props
            else if (needStateReset) 1
            else 0
          out.write(0x80 | (reset << 5) | ((usize - 1) >>> 16))
          out.write(((usize - 1) >>> 8) & 0xff)
          out.write((usize - 1) & 0xff)
          out.write(((packed.length - 1) >>> 8) & 0xff)
          out.write((packed.length - 1) & 0xff)
          if (reset >= 2) out.write((2 * 5 + 0) * 9 + 3) // lc=3 lp=0 pb=2
          out.write(packed)
          propsSent = true
          needStateReset = false
        } else {
          // incompressible segment: store it; LZMA2 requires a state
          // reset on the next LZMA chunk (and the decoder's model never
          // saw this trial encoding, so resetting keeps both in sync)
          out.write(if (first) 0x01 else 0x02)
          out.write(((usize - 1) >>> 8) & 0xff)
          out.write((usize - 1) & 0xff)
          out.write(data, off, usize)
          needStateReset = true
        }
        off = until
        first = false
      }
    }
    out.write(0x00) // LZMA2 end
    out.toByteArray
  }

  /** The LZMA2 dictionary-size props byte the writers advertise for a
    * payload of `n` bytes (smallest spec dictionary covering it).
    */
  private[operators] def lzma2DictByte(n: Int): Int =
    dictByteFor(math.max(4096, math.min(n, 1 << 26)))

  // --------------------------------------------------------------- writer

  /** Deterministic xz writer any xz implementation decodes: one block,
    * a single LZMA2 filter, correct padding, the chosen check, a
    * faithful index and footer. `check` ∈ none | crc32 | crc64 | sha256.
    * `mode` picks the LZMA2 payload:
    *
    *   - `"fast"` (default): REAL greedy LZMA compression — hash-chain
    *     match finder, rep0 runs, matched-byte literals — chunked with
    *     reset=0 continuation (one model across the block); a segment
    *     the encoder cannot shrink falls back to an uncompressed chunk
    *     (with the state reset LZMA2 requires after one);
    *   - `"store"`: uncompressed chunks only — the trivially-inspectable
    *     fixture shape.
    */
  def compress(data: Array[Byte], check: String = "crc32",
      mode: String = "fast"): Array[Byte] = {
    require(mode == "fast" || mode == "store", s"xz write: unknown mode '$mode'")
    val checkType = check match {
      case "none" => 0
      case "crc32" => 1
      case "crc64" => 4
      case "sha256" => 10
      case other => throw new IllegalArgumentException(s"xz write: unknown check '$other'")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u32le(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    // ---- stream header
    out.write(Magic)
    out.write(0)
    out.write(checkType)
    u32le(crc32(Array[Byte](0, checkType.toByte), 0, 2))
    // ---- one block (an EMPTY payload is a zero-block stream, like xz's)
    var unpadded = -1L
    if (data.nonEmpty) {
      val blockStart = out.size()
      // 12-byte block header: sizeByte=(12/4)-1, flags=one filter/no size
      // fields, LZMA2 id, 1-byte props (smallest spec dict covering the
      // payload — match distances never exceed it), 3 pad, CRC32
      val dictByte = dictByteFor(math.max(4096, math.min(data.length, 1 << 26)))
      val body = Array[Byte](2, 0, 0x21, 1, dictByte.toByte, 0, 0, 0)
      out.write(body)
      u32le(crc32(body, 0, body.length))
      val headerSize = body.length + 4
      val payload = lzma2Payload(data, mode)
      out.write(payload)
      val compressed = payload.length
      while ((out.size() - blockStart) % 4 != 0) out.write(0)
      checkType match {
        case 0 => ()
        case 1 => u32le(crc32(data, 0, data.length))
        case 4 =>
          val c = crc64(data, 0, data.length)
          (0 until 8).foreach(i => out.write(((c >>> (8 * i)) & 0xff).toInt))
        case 10 =>
          out.write(java.security.MessageDigest.getInstance("SHA-256").digest(data))
      }
      unpadded = headerSize.toLong + compressed + CheckSizes(checkType)
    }
    // ---- index
    def varintBytes(v: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var x = v
      while ({ val b7 = (x & 0x7f).toInt; x >>>= 7
        if (x != 0) o.write(b7 | 0x80) else o.write(b7); x != 0 }) ()
      o.toByteArray
    }
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(0)
    if (data.nonEmpty) {
      idx.write(varintBytes(1L))
      idx.write(varintBytes(unpadded))
      idx.write(varintBytes(data.length.toLong))
    } else idx.write(varintBytes(0L))
    while (idx.size() % 4 != 0) idx.write(0)
    val idxb = idx.toByteArray
    out.write(idxb)
    u32le(crc32(idxb, 0, idxb.length))
    val indexSize = idxb.length + 4
    // ---- footer
    val tail = new Array[Byte](6)
    val bw = (indexSize / 4) - 1
    (0 until 4).foreach(i => tail(i) = ((bw >>> (8 * i)) & 0xff).toByte)
    tail(4) = 0
    tail(5) = checkType.toByte
    u32le(crc32(tail, 0, 6))
    out.write(tail)
    out.write('Y')
    out.write('Z')
    out.toByteArray
  }
}
